package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental lexical (BM25) index for a growing corpus — the
  * persisted-index sibling of the dedup/ANN/boilerplate/winnow
  * stores: each batch appends its POSTINGS (id, term, tf) and doc
  * LENGTHS (id, len), and [[search]] scores queries against
  * everything indexed so far WITHOUT rescanning any text — the
  * inverted-index economics that make keyword search feasible over a
  * corpus far larger than a per-query scan.
  *
  * Replay idempotency (the family's foreachBatch contract): a crashed
  * batch re-appends identical posting/length rows, and reads
  * deduplicate by (term, id) / (id) — tf and len are pure functions
  * of the doc text, so duplicates are bit-identical and results can
  * never drift. Replay bloat is storage-only; [[compactStore]] dedups
  * via the same crash-safe bak-swap as the other stores.
  *
  * Search work is posting-bounded: the term filter prunes the posting
  * scan to the query slice (PushedFilters on `term`), corpus stats
  * come from the lengths table (id-width rows), and the scoring core
  * is [[graft.ops.TextAnalysis.bm25FromPostings]] — bit-identical to
  * the corpus-scan [[graft.ops.TextAnalysis.bm25TopK]], which is the
  * parity oracle the spec pins.
  */
final class IncrementalTextIndex(spark: SparkSession, storeDir: String) {

  private val formatVersion = "1:ws-lower-tf"
  locally {
    StoreSwap.recover(Paths.get(postingsPath))
    StoreSwap.recover(Paths.get(lensPath))
    val marker = Paths.get(s"$storeDir/_FORMAT")
    if (Files.exists(Paths.get(postingsPath)) || Files.exists(marker)) {
      val v = if (Files.exists(marker)) Files.readString(marker).trim else "?"
      require(v == formatVersion,
        s"text index at $storeDir uses tokenization format [$v], this build " +
          s"writes [$formatVersion] — rebuild the index")
    } else {
      Files.createDirectories(Paths.get(storeDir))
      Files.writeString(marker, formatVersion)
    }
  }

  private def postingsPath = s"$storeDir/postings"
  private def lensPath = s"$storeDir/lens"

  private val postingsSchema = StructType(Seq(
    StructField("term", StringType), StructField("id", LongType),
    StructField("tf", DoubleType)))
  private val lensSchema = StructType(Seq(
    StructField("id", LongType), StructField("len", DoubleType)))

  private def read(path: String, schema: StructType): DataFrame =
    if (Files.exists(Paths.get(path)))
      spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  /** Tokenize one batch and append its postings + lengths. The batch
    * is pinned with localCheckpoint before the two write jobs: a
    * non-deterministic source (sample/limit upstream) would otherwise
    * recompute between them and persist postings and lengths that
    * disagree about which rows the batch contained.
    */
  def indexBatch(batch: DataFrame, textCol: String, idCol: String): Unit = {
    val toks = batch.select(col(idCol).cast("long").as("id"),
      split(lower(trim(col(textCol))), "\\s+").as("__toks"))
      .localCheckpoint(true)
    try {
      toks.select(col("id"), explode(col("__toks")).as("term"))
        .groupBy(col("term"), col("id"))
        .agg(count(lit(1)).cast("double").as("tf"))
        .write.mode(SaveMode.Append).parquet(postingsPath)
      toks.select(col("id"), size(col("__toks")).cast("double").as("len"))
        .write.mode(SaveMode.Append).parquet(lensPath)
    } finally toks.unpersist()
  }

  /** BM25 top-k over everything indexed so far — no text scan. */
  def search(query: Seq[String], k: Int,
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "empty query")
    val tf = read(postingsPath, postingsSchema)
      .filter(col("term").isin(query: _*))
      .dropDuplicates("term", "id")
    val lens = read(lensPath, lensSchema).dropDuplicates("id")
    graft.ops.TextAnalysis.bm25FromPostings(tf, lens, k, k1, b)
  }

  /** Storage-only maintenance: dedup replay-duplicated rows. Results
    * never depend on it (reads deduplicate).
    */
  def compactStore(): Unit = {
    val p = Paths.get(postingsPath)
    if (Files.exists(p)) {
      read(postingsPath, postingsSchema).dropDuplicates("term", "id")
        .write.mode(SaveMode.Overwrite).parquet(StoreSwap.stagePath(p).toString)
      StoreSwap.swapIn(p)
    }
    val l = Paths.get(lensPath)
    if (Files.exists(l)) {
      read(lensPath, lensSchema).dropDuplicates("id")
        .write.mode(SaveMode.Overwrite).parquet(StoreSwap.stagePath(l).toString)
      StoreSwap.swapIn(l)
    }
  }

  /** (posting rows, distinct postings) — the replay-bloat probe. */
  def storeStats(): (Long, Long) = {
    val p = read(postingsPath, postingsSchema)
    (p.count(), p.dropDuplicates("term", "id").count())
  }
}
