package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class IncrementalDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the green hills tonight again"
  private val nearDup = base.replace("green", "blue")
  private val other = "a completely different corpus row about distributed query engines and shuffle partitioning strategies"

  test("near-dups are dropped across batches and within a batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_incdedup_").toString
    val dedup = new IncrementalDedup(spark, dir, threshold = 0.5)

    // batch 1: base accepted; in-batch near-dup (id 2) dropped
    val b1 = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val kept1 = dedup.processBatch(b1, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept1.toSeq == Seq(1L, 3L), s"in-batch near-dup must drop: ${kept1.toSeq}")

    // batch 2: exact dup of batch-1 row dropped, fresh row kept
    val fresh = "entirely new content discussing watermark semantics in stateful stream processing pipelines"
    val b2 = Seq((10L, base), (11L, fresh)).toDF("doc_id", "text")
    val kept2 = dedup.processBatch(b2, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept2.toSeq == Seq(11L), s"cross-batch dup must drop: ${kept2.toSeq}")

    // batch 3: near-dup of batch-2 survivor also dropped
    val b3 = Seq((20L, fresh.replace("semantics", "rules"))).toDF("doc_id", "text")
    val kept3 = dedup.processBatch(b3, "text", "doc_id")
      .select("doc_id").as[Long].collect()
    assert(kept3.isEmpty, s"near-dup of accepted row must drop: ${kept3.toSeq}")
  }

  test("replaying a crashed batch keeps its survivors (no self-match drop)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_incdedup_rp_").toString
    val dedup = new IncrementalDedup(spark, dir, threshold = 0.5)
    val b = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    val first = dedup.processBatch(b, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(first.toSeq == Seq(1L, 2L))
    // foreachBatch replay after a crash between persist and commit:
    // the same rows arrive again with their signatures already stored —
    // they must NOT be dropped as duplicates of themselves
    val replay = dedup.processBatch(b, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(replay.toSeq == Seq(1L, 2L),
      s"replayed survivors must survive again: ${replay.toSeq}")
  }

  test("compactStore removes replay duplicates and preserves matching") {
    val dir = java.nio.file.Files.createTempDirectory("graft_incdedup_cp_").toString
    val dedup = new IncrementalDedup(spark, dir, threshold = 0.5)
    val b = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    dedup.processBatch(b, "text", "doc_id")
    val clean = spark.read.parquet(s"$dir/signatures").count()
    // a crash replay re-appends the survivors' signatures...
    dedup.processBatch(b, "text", "doc_id")
    assert(spark.read.parquet(s"$dir/signatures").count() == 2 * clean)
    // ...and compaction restores exactly the pre-replay row count
    dedup.compactStore()
    assert(spark.read.parquet(s"$dir/signatures").count() == clean,
      "replayed batch must leave the compacted store row count unchanged")
    // the compacted store still matches: a near-dup of an accepted row drops
    val b2 = Seq((10L, nearDup)).toDF("doc_id", "text")
    val kept = dedup.processBatch(b2, "text", "doc_id")
      .select("doc_id").as[Long].collect()
    assert(kept.isEmpty, s"compacted store must still catch near-dups: ${kept.toSeq}")
    // compacting an already-clean store is a no-op
    dedup.compactStore()
    dedup.compactStore()
    assert(spark.read.parquet(s"$dir/signatures").count() == clean,
      "double compaction of a clean store must change nothing")
  }

  test("reopening a store with different hyperparameters fails fast") {
    val dir = java.nio.file.Files.createTempDirectory("graft_incdedup_hp_").toString
    val dedup = new IncrementalDedup(spark, dir, threshold = 0.5)
    dedup.processBatch(Seq((1L, base)).toDF("doc_id", "text"), "text", "doc_id")
    // same params: reopens fine
    new IncrementalDedup(spark, dir, threshold = 0.5)
    // different banding: bucket values are incomparable -> must throw,
    // not silently lose every future match
    val e = intercept[IllegalArgumentException] {
      new IncrementalDedup(spark, dir, numHashes = 32, bands = 16)
    }
    assert(e.getMessage.contains("bucket format"))
  }
}
