package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Curation

/** Composition e2e: a streaming corpus-curation pipeline — per batch,
  * the declarative quality/dedup gate (ops.Curation) feeds the
  * cross-batch incremental near-dup store (IncrementalDedup) inside
  * foreachBatch, exactly the shape a 100-TB continuous-ingest pipeline
  * runs: batch-local work is declarative, only the signature store
  * carries state forward.
  */
class StreamingCurationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val good1 =
    "the quick brown fox jumps over the lazy dog with energy and the speed of light"
  private val good2 =
    "a completely different article about the economy of scale in modern data systems"
  // near-dup of good1: only the FINAL token differs, which perturbs a
  // single 3-shingle -> J = 13/15 = 0.87 (a mid-sentence edit touches
  // 3 shingles and would dilute J below the 0.7 store threshold)
  private val nearDup1 =
    "the quick brown fox jumps over the lazy dog with energy and the speed of sound"
  private val fresh =
    "the third subject is about the migration of birds across the southern hemisphere"

  test("streaming curation gates quality per batch and dedups across batches") {
    val root = java.nio.file.Files.createTempDirectory("graft_stream_cur_").toString
    val in = s"$root/in"
    val store = s"$root/store"
    val outDir = s"$root/out"

    // batch 1 lands before the stream starts; batch 2 arrives "later"
    Seq((1L, good1), (2L, good2), (3L, good2))                 // 3 = exact dup of 2
      .toDF("doc_id", "text").write.parquet(s"$in/b1")

    val dedup = new IncrementalDedup(spark, store, threshold = 0.7)
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    val src = spark.readStream.schema(schema).parquet(s"$in/*")
    def run(): Unit = {
      val q = src.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val curated = Curation.curate(batch, "text", "doc_id",
            minQuality = 0.6)
          val kept = dedup.processBatch(curated, "text", "doc_id")
          kept.select(col("doc_id"))
            .write.mode("append").parquet(outDir)
          ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(outDir).select("doc_id").as[Long].collect()
      .sorted.toSeq == Seq(1L, 2L), "batch 1: exact dup dropped, both texts kept")

    Seq((4L, nearDup1), (5L, "x"), (6L, fresh))
      .toDF("doc_id", "text").write.parquet(s"$in/b2")
    run()
    val finalIds = spark.read.parquet(outDir).select("doc_id").as[Long]
      .collect().sorted.toSeq
    assert(finalIds == Seq(1L, 2L, 6L),
      s"near-dup of batch-1 doc and low-quality doc must be gone: $finalIds")
  }
}
