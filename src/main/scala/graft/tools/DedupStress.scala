package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Dedup

/** One-shot stress runner for the ExactSubstr/MinHash dedup family on
  * an arbitrary documents parquet (e.g. the ScaleGen dup-heavy fixture
  * or an sf3 scale-up) — evidence that the family completes and stays
  * equi-join-shaped on corpora where duplication is NOT rare, at
  * scales the unit specs don't reach.
  *
  * Env: SPARK_GRAFT_STRESS_DOCS (parquet path, default the sf1
  * dup-heavy fixture), SPARK_GRAFT_CPUS. Prints one JSON line of
  * per-op seconds + output rows.
  */
object DedupStress {
  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("SPARK_GRAFT_STRESS_DOCS",
      ".data/sf1/documents_dupheavy.parquet")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(docs)
    def timed(name: String)(f: => Long): String = {
      val t0 = System.nanoTime()
      val rows = f
      val dt = (System.nanoTime() - t0) / 1e9
      // Locale.ROOT: the bare f-interpolator formats with the JVM
      // default locale — a comma-decimal locale would emit invalid JSON
      val sec = String.format(java.util.Locale.ROOT, "%.2f",
        java.lang.Double.valueOf(dt))
      s""""$name":{"sec":$sec,"rows":$rows}"""
    }
    val parts = Seq(
      timed("dedup_spans") {
        Dedup.duplicateSpans(df, "text", "doc_id", k = 8).count()
      },
      timed("dedup_rm") {
        Dedup.removeDuplicateSpans(df, "text", "doc_id", k = 8).count()
      },
      timed("minhash_near_dups") {
        Dedup.minhashNearDups(df, "text", "doc_id",
          threshold = 0.5, shingleK = 3, numHashes = 16, bands = 4).count()
      },
      timed("simhash_candidates") {
        Dedup.simhashCandidates(df, "text", "doc_id",
          maxHamming = 3, nBlocks = 4).count()
      })
    println(s"""{"docs":"$docs","n_docs":${df.count()},${parts.mkString(",")}}""")
    spark.stop()
  }
}
