package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave keys for multi-dimensional data
  * clustering — the layout that makes parquet row-group min/max stats
  * prune for filters on EITHER of two dimensions, where a plain sort
  * prunes only its leading column (Catalog.cluster). Same idea as
  * Delta/Iceberg OPTIMIZE ZORDER.
  *
  * Everything is closed-form column arithmetic (shift/mask ladders —
  * codegen builtins, no UDF, no custom Expression): each dimension is
  * min/max-normalized to a 16-bit rank, ranks are bit-spread and
  * interleaved into one 32-bit key, and the rewrite is an ordinary
  * repartitionByRange + sortWithinPartitions on that key.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i
    * (the classic mask-shift ladder, 4 steps).
    */
  private[ops] def spread(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Min/max-normalize a numeric column to a 16-bit rank. Degenerate
    * (constant) dimensions map to 0.
    */
  private[ops] def rank16(x: Column, mn: Column, mx: Column): Column =
    when(mx <= mn, lit(0L)).otherwise(
      least(lit(65535L),
        floor((x.cast("double") - mn.cast("double")) /
          (mx.cast("double") - mn.cast("double")) * 65536.0).cast("long")))

  /** The 32-bit two-dimension Morton key: bits of `a` at even
    * positions, bits of `b` at odd ones. Rows close in z-key are close
    * in BOTH normalized dimensions.
    */
  def zkey(a: Column, aMin: Column, aMax: Column,
           b: Column, bMin: Column, bMax: Column): Column =
    spread(rank16(a, aMin, aMax))
      .bitwiseOR(shiftleft(spread(rank16(b, bMin, bMax)), 1))

  /** Z-cluster a frame on two numeric dimensions: one narrow min/max
    * scan to fix the normalization (a maintenance command, like
    * compaction — the eager agg is deliberate and tiny), then a range
    * repartition + in-partition sort on the interleaved key. Every
    * output file then spans roughly a square in (dimA, dimB) space, so
    * row-group stats prune selective filters on either column.
    */
  def cluster(df: org.apache.spark.sql.DataFrame, dimA: String, dimB: String,
              numFiles: Int): org.apache.spark.sql.DataFrame = {
    require(numFiles > 0, "need a positive target file count")
    val r = df.agg(min(col(dimA)), max(col(dimA)),
      min(col(dimB)), max(col(dimB))).collect()(0)
    val key = zkey(
      col(dimA), lit(r.get(0)), lit(r.get(1)),
      col(dimB), lit(r.get(2)), lit(r.get(3)))
    df.withColumn("__z", key)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
