package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM alternated A/B (RankAb protocol) for the round-16 rank-loop
  * small-regime laziness: `graft.rank.lazy=off` replays the eager
  * per-iteration localCheckpoint, `on` the lazy unrolled chain (both
  * with the symmetric dangling-skip). B,A,B,A… min-of-reps. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.RankLazyAb"
  */
object RankLazyAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val blocks = sys.env.getOrElse("SPARK_GRAFT_AB_BLOCKS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq
                else Seq("q_pagerank", "q_pagerank_ppr")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // stage the edge tables + JIT once, outside the timed alternation
    names.foreach(n =>
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    val results = scala.collection.mutable.Map
      .empty[(String, String), List[Double]].withDefaultValue(Nil)
    // which knob to alternate: default the laziness experiment; set
    // SPARK_GRAFT_AB_PROP/OFF/ON to A/B any other plan property
    // (e.g. PROP=graft.rank.dangling OFF=keep ON=skip)
    val prop = sys.env.getOrElse("SPARK_GRAFT_AB_PROP", "graft.rank.lazy")
    val offV = sys.env.getOrElse("SPARK_GRAFT_AB_OFF", "off")
    val onV = sys.env.getOrElse("SPARK_GRAFT_AB_ON", "on")
    for (b <- 1 to blocks; variant <- Seq("off", "on"); name <- names) {
      sys.props(prop) = if (variant == "off") offV else onV
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      results((name, variant)) = dt :: results((name, variant))
      println(f"[ranklazy] block$b $name%-16s $variant%-3s $dt%6.2f")
    }
    sys.props.remove(prop)
    println("[ranklazy] ===== min per (entry, variant) =====")
    names.foreach { n =>
      val off = results((n, "off")); val on = results((n, "on"))
      if (off.nonEmpty && on.nonEmpty)
        println(f"[ranklazy] $n%-16s off=${off.min}%6.2f  on=${on.min}%6.2f  " +
          f"lazy-speedup=${off.min / on.min}%5.2fx")
    }
    spark.stop()
  }
}
