package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row
  * with rightTime <= leftTime within the same key group — the lookup
  * every feature-store / backfill pipeline needs.
  *
  * Implementation is the scalable union-tag formulation, NOT a range
  * join: tag both sides, union, sort within key by (time, side) and
  * carry the last right-row payload forward with
  * last(ignoreNulls).over(window) — exactly ONE shuffle on the key
  * columns and a per-partition sort, independent of how many right
  * rows precede each left row. (A naive range join explodes to
  * candidate pairs; Spark has no native ASOF.) The payload travels as
  * one struct so all right columns come atomically from the same
  * matched row. Equal timestamps match (right sorts before left),
  * mirroring DuckDB's inclusive ASOF semantics used by the oracle.
  */
object AsOf {

  /** Left as-of join. Right payload columns are emitted with a prefix.
    * Both frames must contain `keys` and their respective time column.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payloadPrefix: String = "right_"): DataFrame = {
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val leftDataCols = left.columns.filterNot(keys.contains).toSeq

    val payloadStruct = struct(payloadCols.map(col): _*)
    val taggedRight = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(1).as("__side"),
        payloadStruct.as("__p")) ++
        leftDataCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(payloadCols.map(c => right.schema(c))))
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(2).as("__side"),
        nullPayload.as("__p")) ++
        leftDataCols.map(c => col(c).as(s"__l_$c")): _*)

    // right (side=1) sorts before left (side=2) at equal __t => inclusive
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 2)
      .select(
        keys.map(col) ++
          leftDataCols.map(c => col(s"__l_$c").as(c)) ++
          payloadCols.map(c => col("__match").getField(c).as(s"$payloadPrefix$c")): _*)
  }
}
