package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over an event log: bucket each key's
  * observations onto a fixed step grid, materialize the MISSING
  * buckets between the key's first and last observation, and
  * forward-fill values — the resample/ffill step every downstream
  * window model assumes (uniform spacing) and raw event logs never
  * provide. Integer epoch-bucket arithmetic (floor of epoch-micros
  * over step-micros) keeps the grid a pure function any engine
  * reproduces exactly.
  *
  * Scale shape: one (key, bucket) aggregation, one per-key min/max
  * aggregation whose `sequence` explode materializes only grid rows
  * (bounded by time-span / step per key — pick the step so a key's
  * retention window is thousands of buckets, not millions), and one
  * per-key ordered window for the forward fill — the only sort, on
  * (key, bucket) rows of three numeric columns.
  */
object Resample {

  /** (keyCol, bucket, value_filled, observed) for every step bucket in
    * each key's observed span: `value_filled` = this bucket's mean
    * observation, or the most recent earlier bucket's when absent
    * (`observed` = false). Means are rounded to 4dp BEFORE the fill so
    * filled copies equal their source bit-for-bit.
    */
  def fillGaps(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, "step must be positive")
    val stepUs = stepSeconds * 1000000L
    val obs = df
      .groupBy(col(keyCol),
        floor(unix_micros(col(tsCol)) / stepUs).as("bucket"))
      .agg(round(avg(col(valueCol)), 4).as("__v"))
    val grid = obs.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col(keyCol), explode(sequence(col("__b0"), col("__b1"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(obs, Seq(keyCol, "bucket"), "left")
      .withColumn("observed", col("__v").isNotNull)
      .withColumn("value_filled", last(col("__v"), ignoreNulls = true).over(w))
      .select(col(keyCol), col("bucket"), col("value_filled"), col("observed"))
  }

  /** Like [[fillGaps]] but gap buckets get LINEAR interpolation
    * between the surrounding observed buckets instead of a carried-
    * forward constant — the fill a rate-like series wants. The grid
    * spans each key's [first, last] observed bucket, so every gap has
    * both a previous and a next observation by construction. Two
    * window frames (carry-back and carry-forward) over the SAME
    * (key, bucket) sort — one exchange, one sort, two in-memory
    * passes. Endpoint means round to 4dp before interpolating and the
    * result rounds to 4dp, so the fill is a pure rational function of
    * replayable inputs.
    */
  def fillInterpolate(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, "step must be positive")
    val stepUs = stepSeconds * 1000000L
    val obs = df
      .groupBy(col(keyCol),
        floor(unix_micros(col(tsCol)) / stepUs).as("bucket"))
      .agg(round(avg(col(valueCol)), 4).as("__v"))
    val grid = obs.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col(keyCol), explode(sequence(col("__b0"), col("__b1"))).as("bucket"))
    val back = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(0, Window.unboundedFollowing)
    val obsBucket = when(col("__v").isNotNull, col("bucket"))
    grid.join(obs, Seq(keyCol, "bucket"), "left")
      .withColumn("observed", col("__v").isNotNull)
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__pb", last(obsBucket, ignoreNulls = true).over(back))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__nb", first(obsBucket, ignoreNulls = true).over(fwd))
      // HALF_UP via floor(x*1e4 + 0.5): lerp at even gaps lands on
      // EXACT .xxxx5 midpoints, where decimal-string round (Spark)
      // and binary round (DuckDB) disagree; floor of the bit-identical
      // double is deterministic on every engine replaying the same
      // arithmetic
      .withColumn("value_filled",
        floor(when(col("observed"), col("__v")).otherwise(
          col("__pv") + (col("__nv") - col("__pv")) *
            (col("bucket") - col("__pb")) / (col("__nb") - col("__pb")))
          * 10000 + 0.5) / 10000)
      .select(col(keyCol), col("bucket"), col("value_filled"), col("observed"))
  }
}
