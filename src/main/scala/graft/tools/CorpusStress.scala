package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.ops.Corpus

/** One-shot stress runner for the corpus-intake family at shapes the
  * unit specs don't reach:
  *
  *  - `token_budget_skew`: [[Corpus.takeTokenBudget]]'s 256-bucket
  *    distributed prefix sum on the WORST skew shape — every document
  *    in ONE source — vs the natural multi-source shape on the same
  *    corpus. A naive `PARTITION BY source` window funnels the whole
  *    corpus through one partition on this shape; the bucketed form
  *    must stay within a small constant of the multi-source run.
  *  - `incremental_entities`: [[graft.streaming.IncrementalEntities]]
  *    over a growing dirty-name stream (typo'd twins of earlier
  *    batches force cross-batch matches through the persisted variant
  *    index). Reports per-batch seconds as the store grows, then one
  *    timed full [[graft.streaming.IncrementalEntities.resolve]].
  *
  * Env: SPARK_GRAFT_STRESS_DOCS (documents parquet, token-budget op),
  * SPARK_GRAFT_STRESS_CUSTOMER (customer parquet, entities op),
  * SPARK_GRAFT_STRESS_BATCHES (default 5), SPARK_GRAFT_CPUS. Optional
  * op-name args restrict the run. Prints one JSON line of per-op
  * seconds (+ per-batch arrays), each part echoed to stderr as it
  * lands.
  */
object CorpusStress {
  val AllOps: Set[String] = Set("token_budget_skew", "incremental_entities")

  def main(args: Array[String]): Unit = {
    val only = args.toSet
    val unknown = only.diff(AllOps)
    require(unknown.isEmpty,
      s"unknown ops ${unknown.toSeq.sorted.mkString(", ")}; " +
        s"known: ${AllOps.toSeq.sorted.mkString(", ")}")
    def picked(name: String): Boolean = only.isEmpty || only(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fmt(dt: Double): String = String.format(java.util.Locale.ROOT,
      "%.2f", java.lang.Double.valueOf(dt))
    val parts = collection.mutable.ArrayBuffer[String]()
    def emit(part: String): Unit = {
      System.err.println(s"[stress] $part")
      parts += part
    }

    if (picked("token_budget_skew")) {
      val docs = spark.read.parquet(sys.env.getOrElse(
        "SPARK_GRAFT_STRESS_DOCS", ".data/sf1/documents.parquet"))
        .localCheckpoint()
      val totalTokens = docs
        .agg(sum(size(split(trim(col("text")), "\\s+"))).cast("long"))
        .first().getLong(0)
      def run(d: org.apache.spark.sql.DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val kept = Corpus.takeTokenBudget(d, "source", "doc_id", "text",
            budgets = Map.empty, defaultBudget = totalTokens / 2)
          .filter(col("kept")).count()
        ((System.nanoTime() - t0) / 1e9, kept)
      }
      val (mSec, mKept) = run(docs) // natural multi-source shape
      // worst skew: the ENTIRE corpus is one source — the shape where
      // a per-source window would single-partition everything
      val (gSec, gKept) = run(docs.withColumn("source", lit("giant")))
      emit(s""""token_budget_multi":{"sec":${fmt(mSec)},"kept":$mKept}""")
      emit(s""""token_budget_giant":{"sec":${fmt(gSec)},"kept":$gKept}""")
      docs.unpersist()
    }

    if (picked("incremental_entities")) {
      // name modes: "hash" (default) gives every record a distinctive
      // 12-hex name, so the ONLY d<=1 matches are the planted typo
      // twins — the realistic sparse-match economics; "raw" keeps the
      // TPC-H digit-string names, where nearly every pair of keys is
      // within one digit edit — a maximally DENSE adversarial graph
      // (~100 matches per record, one giant entity)
      val nameMode = sys.env.getOrElse("SPARK_GRAFT_STRESS_NAMEMODE", "hash")
      val rawCustomer = spark.read.parquet(sys.env.getOrElse(
        "SPARK_GRAFT_STRESS_CUSTOMER", ".data/sf1/customer.parquet"))
        .select(col("c_custkey").cast("long").as("id"),
          col("c_name").cast("string").as("name"))
      val customer = (if (nameMode == "hash")
          rawCustomer.withColumn("name",
            substring(md5(col("id").cast("string")), 1, 12))
        else rawCustomer)
        .localCheckpoint()
      val nBatches = sys.env.getOrElse("SPARK_GRAFT_STRESS_BATCHES", "5").toInt
      val nRecs = customer.count()
      val per = nRecs / nBatches
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft_entity_stress").toString
      val store = new graft.streaming.IncrementalEntities(spark, storeDir)
      val batchSecs = collection.mutable.ArrayBuffer[String]()
      for (b <- 0 until nBatches) {
        // batch b = its clean slice + typo'd twins of every 3rd record
        // of the PREVIOUS batch (id offset keeps keys unique) — each
        // batch must link new dirt to names indexed in earlier batches
        // through the persisted variant index, the cross-batch path
        val slice = customer
          .filter(col("id") % nBatches === b)
        val dirty =
          if (b == 0) slice.limit(0)
          else customer.filter(col("id") % nBatches === (b - 1) &&
              col("id") % 3 === 0)
            .select((col("id") + 1000000000L).as("id"),
              concat(substring(col("name"), 1, 8),
                substring(col("name"), 10, 18)).as("name"))
        val batch = slice.union(dirty).localCheckpoint()
        val t0 = System.nanoTime()
        store.indexBatch(batch, "id", "name")
        val dt = (System.nanoTime() - t0) / 1e9
        val (nr, ne) = store.storeStats()
        System.err.println(
          s"[stress] entities batch $b: ${fmt(dt)} s, store=($nr recs, $ne edges)")
        batchSecs += fmt(dt)
      }
      val t0 = System.nanoTime()
      val nEntities = store.resolve()
        .agg(countDistinct(col("entity_id"))).first().getLong(0)
      val rSec = (System.nanoTime() - t0) / 1e9
      emit(s""""incremental_entities":{"batch_secs":[${batchSecs.mkString(",")}],""" +
        s""""resolve_sec":${fmt(rSec)},"n_records":$nRecs,"n_entities":$nEntities}""")
    }

    println(parts.mkString("{", ",", "}"))
    spark.stop()
  }
}
