package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around its shuffle profile at 100 TB:
  *
  *  - exact:        1 shuffle on a 16-byte hash (not the full text).
  *  - minhash LSH:  shingle -> K minhashes -> B bands; candidate pairs
  *                  come from an equi-join on (band, bandHash) — a plain
  *                  hash shuffle, never an O(n^2) cross join. Only
  *                  candidates pay the exact-Jaccard verification.
  *  - simhash:      64-bit signature; near-dups = signatures equal on
  *                  rotated 16-bit blocks (Hamming<=k via block equality)
  *                  — again equi-join-shaped.
  *  - ngram-jaccard: exact verification kernel, used standalone on small
  *                  candidate sets or downstream of LSH.
  *
  * Everything is built-in column expressions (codegen) + equi-joins, so
  * Catalyst/AQE handle skew, partial aggregation, and broadcast choices.
  */
object Dedup {

  // ---- exact ----

  /** Exact dedup: keep the row with min(idCol) per identical text.
    * Hashing first keeps the shuffle narrow (hash, id) instead of
    * shuffling full document bodies.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keepers = df
      .select(md5(col(textCol)).as("__h"), col(idCol))
      .groupBy(col("__h")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    df.join(keepers, Seq(idCol), "left_semi")
  }

  /** Exact duplicate-group stats: one row per duplicated text. */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  // ---- shingles / n-grams ----

  /** Word k-shingles of a text column as an array of strings. */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val n = size(toks)
    // transform over 0..n-k producing joined k-grams; empty when n<k
    when(n >= k,
      transform(sequence(lit(0), n - lit(k)),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))
      .otherwise(array(array_join(toks, " ")))
  }

  // ---- MinHash + LSH ----

  /** K minhash values per row: min over shingles under K independent
    * hash functions h_i(s) = xxhash64(seed=i, s) (seeded-hash family
    * rather than linear permutations — no arithmetic, so it is safe
    * under ANSI overflow checking and stays pure codegen: transform +
    * aggregate over the shingle array; no UDF, no UDAF).
    */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column = {
    val base = array_distinct(shingles(text, k))
    val hashes = (0 until numHashes).map { i =>
      aggregate(base, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(lit(i), s)))
    }
    array(hashes: _*)
  }

  /** Candidate near-dup pairs via banded LSH over minhash signatures:
    * rows agreeing on any band land in the same bucket; the bucket
    * equi-join yields candidates. `bands` must divide numHashes.
    * Returns (idCol_a, idCol_b) with a < b, distinct.
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 3, numHashes: Int = 16,
                        bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sig = df.select(col(idCol),
      minhashSignature(col(textCol), shingleK, numHashes).as("__sig"))
    val banded = sig.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_",
          b.cast("string"),
          array_join(transform(slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            _.cast("string")), ","))))).as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact n-gram Jaccard between two text columns (verification
    * kernel): |A ∩ B| / |A ∪ B| over distinct k-shingles.
    */
  def jaccard(textA: Column, textB: Column, k: Int): Column = {
    val sa = array_distinct(shingles(textA, k))
    val sb = array_distinct(shingles(textB, k))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(array_union(sa, sb)).cast("double")
    round(when(uni > 0, inter / uni).otherwise(lit(0.0)), 4)
  }

  /** Full MinHash-LSH near-dup pipeline: candidates -> exact-Jaccard
    * verify -> pairs above threshold. The join back to texts broadcasts
    * only when small; at scale it is a hash join on the id columns.
    */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      threshold: Double, shingleK: Int = 3,
                      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val cands = minhashCandidates(df, textCol, idCol, shingleK, numHashes, bands)
    val texts = df.select(col(idCol), col(textCol))
    cands
      .join(texts.withColumnRenamed(idCol, "id_a").withColumnRenamed(textCol, "__ta"), Seq("id_a"))
      .join(texts.withColumnRenamed(idCol, "id_b").withColumnRenamed(textCol, "__tb"), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("__ta"), col("__tb"), shingleK))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---- SimHash ----

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of
    * token hashes. Implemented as 64 codegen bit-count expressions via
    * aggregate() — no UDF.
    */
  def simhash64(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val hashes = transform(toks, t => xxhash64(t))
    // For each bit i: count tokens with bit set, majority => bit set.
    val n = size(hashes)
    (0 until 64).map { i =>
      val cnt = aggregate(hashes, lit(0),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(lit(1L)).cast("int"))
      when(cnt * 2 >= n, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup candidates with Hamming distance <= 3 via the
    * 4-block pigeonhole trick: split the 64-bit signature into 4
    * 16-bit blocks; any pair within distance 3 must agree on >=1 block,
    * so an equi-join per block finds all candidates — no cross join.
    */
  def simhashCandidates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val sig = df.select(col(idCol), simhash64(col(textCol)).as("__sig"))
    val blocked = sig.select(col(idCol), col("__sig"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("__sig"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("block", "block_val")))
    val a = blocked.select(col("block"), col("block_val"),
      col(idCol).as("id_a"), col("__sig").as("sig_a"))
    val b = blocked.select(col("block"), col("block_val"),
      col(idCol).as("id_b"), col("__sig").as("sig_b"))
    a.join(b, Seq("block", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= 3)
      .select(col("id_a"), col("id_b"), col("hamming")).distinct()
  }
}
