package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series primitives over an event log — the smoothing
  * and self-correlation layer of a metrics pipeline (trend lines for
  * dashboards, burstiness / periodicity diagnostics before anomaly
  * thresholds are set).
  *
  * Both ops are WINDOW shapes: one hash exchange on the key, one
  * in-partition sort, then codegen frame evaluation — no self-joins,
  * no row explosion, so they scale like any ranked-window query
  * (the per-key state is a bounded frame, never the whole series).
  * Ordering is total — (ts, idCol) — so same-timestamp events can't
  * make two engines disagree about frame contents.
  */
object TimeSeries {

  /** Windowed exponentially-weighted moving average: for each event,
    * the EWMA of the last `window` values of `valCol` within its key,
    * y_i = sum_j w^(i-j) x_j / sum_j w^(i-j) with w = 1 - alpha over
    * the trailing frame — the bounded-memory form of exponential
    * smoothing (the infinite-history recurrence is a sequential scan;
    * the trailing-window form is frame-local, embarrassingly
    * parallel, and within w^window of it, which for the default
    * 8-row frame at alpha 0.3 is a <6% tail). The weight SUM is the
    * closed-form geometric series (1 - w^n) / (1 - w) — cheaper and
    * bit-identical across engines vs re-summing powers.
    *
    * Output: every input row's ids plus `ewma` (6dp). Scale shape:
    * one exchange on the key, one sort, a size-`window` sliding
    * collect evaluated by codegen higher-order functions — state per
    * row is the bounded frame, so a 10^9-event key streams through
    * without materializing the series.
    */
  def windowedEwma(df: DataFrame, keyCol: String, tsCol: String,
                   idCol: String, valCol: String, alpha: Double,
                   window: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0, 1)")
    require(window >= 1 && window <= 1024, "window in [1, 1024]")
    val w = 1.0 - alpha
    val frame = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    // trailing values oldest -> newest; weight for position i in an
    // n-array is w^(n-1-i)
    val vals = collect_list(col(valCol).cast("double")).over(frame)
    val n = size(col("__vals"))
    val weighted = aggregate(
      zip_with(col("__vals"),
        sequence(n - 1, lit(0), lit(-1)), // exponents n-1 .. 0
        (v: Column, e: Column) => v * pow(lit(w), e.cast("double"))),
      lit(0.0), (acc: Column, x: Column) => acc + x)
    df.select(col(keyCol), col(tsCol), col(idCol), vals.as("__vals"))
      .select(col(keyCol), col(tsCol), col(idCol),
        round(weighted /
          ((lit(1.0) - pow(lit(w), n.cast("double"))) / (1.0 - w)), 6)
          .as("ewma"))
  }

  /** Per-key lag-`lag` autocorrelation of `valCol` ordered by
    * (tsCol, idCol): the Pearson correlation between the series and
    * its `lag`-shifted self — THE periodicity/burstiness one-number
    * diagnostic (near 1: trending/bursty; near 0: memoryless; < 0:
    * oscillating). Keys with fewer than `minPairs` (x_t, x_{t-lag})
    * pairs are dropped; zero-variance series yield NULL, not NaN
    * (the [[Profile.groupCorr]] convention). Output:
    * (key, n_pairs, acf) with acf at 4dp.
    *
    * Scale shape: one exchange on the key + one sort feeds BOTH the
    * lag window and the downstream aggregate (same partitioning);
    * the correlation is the explicit covar_pop/sqrt(var·var) form —
    * a map-side partial aggregate per key.
    */
  /** CUSUM change-point score (Page 1954): per key, the cumulative
    * sum of deviations from the key's mean, S_i = sum_{j<=i}(x_j - m),
    * peaks where the series' level shifts — the classic
    * "did this metric change regime, and WHEN" detector. Output per
    * key: (key, n_events, cusum_max, <id at the peak>) where
    * cusum_max = max_i |S_i| (6dp) and the peak position is the
    * FIRST (ts, id) attaining it (deterministic under ties). A flat
    * series scores ~0; a single level shift scores ~|shift|·n/4 at
    * the shift point.
    *
    * Scale shape: ONE hash exchange on the key serves the mean
    * window, the ordered cumulative window and the arg-max rank —
    * three window passes over co-partitioned data, no joins, no
    * row explosion. The cumulative sum rounds to 6dp BEFORE the
    * arg-max so engines agreeing to ~1e-10 (sum-order wobble in the
    * mean) pick the same peak.
    */
  def cusumChangePoint(df: DataFrame, keyCol: String, tsCol: String,
                       idCol: String, valCol: String): DataFrame = {
    val wAll = Window.partitionBy(col(keyCol))
    val wOrd = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = df.select(col(keyCol), col(tsCol), col(idCol),
        col(valCol).cast("double").as("__v"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__dev", col("__v") - avg(col("__v")).over(wAll))
      // midpoint-safe 6dp (floor(x*1e6 + 0.5)/1e6, the winsorize
      // convention) — decimal-vs-binary round() divergence on a
      // cumsum that grazes a midpoint would flip the arg-max
      .withColumn("__s",
        floor(sum(col("__dev")).over(wOrd) * 1e6 + 0.5) / 1e6)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(abs(col("__s")).desc, col(tsCol), col(idCol))))
    ranked.filter(col("__rn") === 1)
      .select(col(keyCol), col("__n").as("n_events"),
        abs(col("__s")).as("cusum_max"),
        col(idCol).as("change_point_id"))
  }

  /** Hour-of-day seasonal profile per series key: for every
    * (key, hour) cell, the event count, mean value, and the seasonal
    * index mean_hour / mean_key — the multiplicative seasonality
    * table a capacity planner or anomaly thresholder reads (index
    * 2.0 = "this hour runs twice the series' average"). Keys whose
    * overall mean is 0 yield NULL indices rather than a division
    * blow-up.
    *
    * Scale shape: ONE groupBy(key, hour) sum/count aggregate touches
    * the raw table; the per-key overall mean RE-AGGREGATES from the
    * (keys × 24)-row hourly table and broadcasts back — the
    * marginal-from-joint economics of [[Stats.mutualInformation]].
    */
  def seasonalProfile(df: DataFrame, keyCol: String,
                      tsCol: String, valCol: String): DataFrame = {
    val hourly = df.groupBy(col(keyCol),
        hour(col(tsCol)).cast("long").as("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valCol).cast("double")).as("__sv"))
      .localCheckpoint() // consumed twice: cells + per-key roll-up
    val overall = hourly.groupBy(col(keyCol))
      .agg((sum(col("__sv")) / sum(col("n_events"))).as("__ma"))
    hourly.join(broadcast(overall), Seq(keyCol))
      .select(col(keyCol), col("hour"), col("n_events"),
        round(col("__sv") / col("n_events"), 4).as("mean_value"),
        round(when(abs(col("__ma")) > 0,
          (col("__sv") / col("n_events")) / col("__ma")), 4)
          .as("seasonal_index"))
  }

  def lagAutocorr(df: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, valCol: String, lagK: Int,
                  minPairs: Int = 3): DataFrame = {
    require(lagK >= 1, "lagK >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    df.select(col(keyCol), col(valCol).cast("double").as("__x"),
        lag(col(valCol).cast("double"), lagK).over(w).as("__xl"))
      .filter(col("__xl").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        round(when(var_pop(col("__x")) > 0 && var_pop(col("__xl")) > 0,
          covar_pop(col("__x"), col("__xl")) /
            (sqrt(var_pop(col("__x"))) * sqrt(var_pop(col("__xl"))))), 4)
          .as("acf"))
      .filter(col("n_pairs") >= minPairs)
  }
}
