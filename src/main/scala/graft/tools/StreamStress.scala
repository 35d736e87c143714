package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{DriftMonitor, MaintenanceCoRun}

/** One-shot stress runner for the COMPOSED maintenance job
  * ([[graft.streaming.MaintenanceCoRun]]: drift monitor + incremental
  * text dedup + incremental embedding dedup over one stream) at scale
  * — the evidence that the three state stores co-run batch after
  * batch without compounding: per-batch wall time stays flat-ish and
  * the ledger's rows/ids columns stay inside the compaction slack
  * even through a forced replay.
  *
  * Env: SPARK_GRAFT_STRESS_DIR (fixture dir with documents.parquet +
  * embeddings.parquet, default .data/sf1), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_STRESS_BATCHES (default 5), SPARK_GRAFT_STRESS_REPLAY
  * (batch index replayed once to simulate a foreachBatch crash-replay,
  * default 2, -1 = none). Prints one JSON line: per-batch seconds +
  * the full maintenance ledger + the post-compaction store shape.
  */
object StreamStress {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_STRESS_DIR", ".data/sf1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STRESS_BATCHES", "5").toInt
    val replayIdx = sys.env.getOrElse("SPARK_GRAFT_STRESS_REPLAY", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    require(nBatches >= 1, "batches >= 1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the feed: documents (all) left-joined to their embeddings where
    // one exists (the fixture embeds a subset — exactly the lazy-
    // embedding regime the vacuous-pass path exists for), token count
    // as the monitored quality signal, one synthetic window. Staged
    // once so per-batch reads are columnar slices, not re-joins.
    val feedDir = java.nio.file.Files
      .createTempDirectory("graft_streamstress_feed").toString
    val root = java.nio.file.Files
      .createTempDirectory("graft_streamstress_state").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"),
        timestamp_seconds(lit(1767225600L)).as("ts"),
        size(split(trim(col("text")), "\\s+")).cast("double").as("value"))
      .join(spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id").as("doc_id"),
            col("embedding").cast("array<double>").as("embedding")),
        Seq("doc_id"), "left")
      .withColumn("batch", pmod(xxhash64(col("doc_id")), lit(nBatches)))
      .write.mode("overwrite").parquet(feedDir)
    val feed = spark.read.parquet(feedDir)

    // frozen offline reference = the whole corpus's value distribution
    // (so per-batch psi measures batch-composition drift only)
    val (cuts, refShares) = DriftMonitor.freezeReference(feed, "value")
    val co = new MaintenanceCoRun(spark, root, cuts, refShares)

    val secs = scala.collection.mutable.ListBuffer.empty[(Long, Double)]
    def runOne(b: Int, batchId: Long): Unit = {
      val t0 = System.nanoTime()
      co.processBatch(feed.filter(col("batch") === b), batchId)
      val dt = (System.nanoTime() - t0) / 1e9
      secs += batchId -> dt
      System.err.println(f"[stream-stress] batch $batchId (slice $b): $dt%.1f s")
    }
    var id = 0L
    (0 until nBatches).foreach { b =>
      runOne(b, id); id += 1
      if (b == replayIdx) { runOne(b, id); id += 1 } // crash-replay
    }
    co.dedup.compactStore(); co.ann.compactStore()
    val (dr, di) = co.dedup.storeStats()
    val (ar, ai) = co.ann.storeStats()

    def f(v: Double, dp: Int) = String.format(java.util.Locale.ROOT,
      s"%.${dp}f", java.lang.Double.valueOf(v))
    val ledger = co.ledgerRows.zip(secs).map { case (r, (bid, s)) =>
      s"""{"batch":$bid,"sec":${f(s, 1)},"n_in":${r.n_in},""" +
        s""""text_kept":${r.n_after_text_dedup},"vec_checked":${r.n_vec_checked},""" +
        s""""kept":${r.n_kept},"psi":${f(r.psi, 4)},""" +
        s""""dedup_rows":${r.dedup_store_rows},"dedup_ids":${r.dedup_store_ids},""" +
        s""""ann_rows":${r.ann_store_rows},"ann_ids":${r.ann_store_ids}}"""
    }.mkString("[", ",", "]")
    println(s"""{"fixture":"$dir","batches":$nBatches,"replay":$replayIdx,""" +
      s""""ledger":$ledger,""" +
      s""""compacted":{"dedup_rows":$dr,"dedup_ids":$di,"ann_rows":$ar,"ann_ids":$ai}}""")
    spark.stop()
  }
}
