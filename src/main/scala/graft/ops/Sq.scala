package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization ANN — the memory-bound middle rung of
  * the compression ladder between raw floats and PQ: one byte per
  * dimension (4x smaller than float32), two-flop decode, no codebook
  * to train or look up. The production shape (faiss
  * ScalarQuantizer/QT_8bit; Milvus "SQ8"): quantize the corpus ONCE
  * at ingest into a binary code table, then every search scans codes
  * instead of floats — the scan is bandwidth-bound, so 4x smaller IS
  * 4x faster, and a 100 TB float corpus becomes a 25 TB code table.
  *
  * Scale shape: `train` is one whole-corpus min/max aggregate (one
  * row, broadcast by construction); `encode` is a map-side codegen
  * pass ([[graft.functions.VectorExpressions.SqEncode]]); `search`
  * streams the code table once against broadcast probes with the
  * fused dequant-dot kernel ([[...VectorExpressions.SqDot]]), then
  * per-probe top-k — identical plan shape to bruteForceTopK but on
  * 1/4 the bytes. Compose with IVF for sub-linear candidate
  * generation exactly as [[Pq.searchIvfPq]] does.
  *
  * Determinism: codes are HALF_UP level indices of (lo, step), and
  * scoring dequantizes codes — both pure arithmetic any engine
  * replays bit-for-bit, so ranking (unlike PQ's trained codebooks)
  * is exactly reproducible from (lo, hi) alone.
  */
object Sq {

  /** (lo, hi) quantization range = global min/max over every
    * component of every corpus vector (per-tensor quantization).
    */
  case class SqRange(lo: Double, hi: Double) {
    require(hi > lo, s"degenerate range [$lo, $hi]")
    def step: Double = (hi - lo) / 255.0
  }

  /** One aggregate over array_min/array_max — a single map-side
    * partial reduce to one row.
    */
  def train(corpus: DataFrame, vecCol: String = "embedding"): SqRange = {
    val r = corpus.agg(
      min(array_min(col(vecCol))).cast("double").as("lo"),
      max(array_max(col(vecCol))).cast("double").as("hi")).head()
    SqRange(r.getDouble(0), r.getDouble(1))
  }

  /** (idCol, sq_code: binary) — the persistent code table. */
  def encode(corpus: DataFrame, range: SqRange,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol),
      graft.functions.VectorExpressions
        .sq_encode(col(vecCol), range.lo, range.step).as("sq_code"))

  /** Top-k by dequantized inner product over a pre-encoded code
    * table. Scores surface as `score` (4dp); ranking ties break on
    * corpus id like every other search entry.
    */
  def searchFromCodes(codes: DataFrame, probes: DataFrame, k: Int,
                      range: SqRange, idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    // explicit-count spread (see Similarity.spread): AQE re-coalesces a
    // count-less repartition of byte-small codes to ~one task, which
    // would serialize the O(n × probes) ADC stage below
    val c = Similarity.spread(
      codes.select(col(idCol).as("corpus_id"), col("sq_code")), col("corpus_id"))
    val p = probes.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__pv"))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("score", graft.functions.VectorExpressions
        .sq_dot(col("sq_code"), col("__pv"), range.lo, range.step))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("rank"),
        round(col("score"), 4).as("score"))
  }

  /** Convenience end-to-end: train + encode + search. */
  def search(corpus: DataFrame, probes: DataFrame, k: Int,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val range = train(corpus, vecCol)
    searchFromCodes(encode(corpus, range, idCol, vecCol), probes, k,
      range, idCol, vecCol)
  }
}
