package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM alternated A/B for the round-16 `Similarity.spread`
  * explicit-count fix (the RankAb/CrossSfAb protocol: B,A,B,A…
  * min-of-reps in ONE JVM so host drift lands on both variants):
  * `graft.spread=off` replays the pre-round-16 effective shape
  * (scan splits / AQE-coalesced), `on` the explicit-count spread.
  * Each (entry, variant) block runs in a FRESH `spark.newSession()`
  * because several entries stage per-(session, dir) parquet whose
  * FILE LAYOUT is itself under test (the RAG embedding staging) —
  * a shared session would freeze the first variant's layout into
  * the other's readings. Per block: one untimed staging/warm rep,
  * then min of `reps` timed noop-sink runs. Run:
  *   SPARK_GRAFT_SF_DIR=.data/sf1 sbt "runMain graft.tools.SpreadAb q_sim_knn_label ..."
  */
object SpreadAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", ".data/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "2").toInt
    val blocks = sys.env.getOrElse("SPARK_GRAFT_AB_BLOCKS", "2").toInt
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_sim_knn_label", "q_sim_ivfpq_topk", "q_sim_ivf_topk",
      "q_sim_pq_topk", "q_rag_retrieve_ivf", "q_rag_retrieve",
      "q_emb_near_dups_lsh", "q_semdedup", "q_sim_jacc", "q_dedup_jaccard")
    val root = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    root.sparkContext.setLogLevel("WARN")
    val results = scala.collection.mutable.Map
      .empty[(String, String), List[Double]].withDefaultValue(Nil)
    for (b <- 1 to blocks; variant <- Seq("off", "on"); name <- names) {
      sys.props("graft.spread") = variant
      val s = root.newSession()
      val fn = graft.SparkEntry.queries(name)
      try {
        // untimed: staging + JIT (the bench's warm-up role)
        fn(s, sfDir).write.format("noop").mode("overwrite").save()
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(s, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        results((name, variant)) = results((name, variant)) ++ ts
        println(f"[spreadab] block$b $name%-22s $variant%-3s " +
          ts.map(t => f"$t%6.2f").mkString(" "))
      } catch { case e: Throwable =>
        println(s"[spreadab] block$b $name $variant FAILED: ${e.getMessage}")
      } finally {
        try {
          s.sharedState.cacheManager.clearCache()
          s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        } catch { case _: Throwable => () }
      }
    }
    println("[spreadab] ===== min per (entry, variant) =====")
    names.foreach { n =>
      val off = results((n, "off")); val on = results((n, "on"))
      if (off.nonEmpty && on.nonEmpty)
        println(f"[spreadab] $n%-22s off=${off.min}%6.2f  on=${on.min}%6.2f  " +
          f"speedup=${off.min / on.min}%5.2fx")
    }
    root.stop()
  }
}
