package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection — the monitoring side of a
  * training-data pipeline: is today's crawl / the new shard / the
  * post-filter corpus distributed like the reference slice the model
  * was validated on? Four standard detectors, each reduced to ONE
  * per-side categorical (or binned) count aggregate joined on the
  * category — counts shuffle, rows never do, so every detector's
  * exchange is bounded by the number of distinct categories/bins, not
  * by data volume.
  *
  * All detectors take (ref, cur) frames and surface one row (or one
  * row per category for the contribution breakdowns), rounded so
  * parallel sum order cannot leak into a compare.
  */
object Drift {

  /** Per-side category shares, full-outer joined: (category, p_ref,
    * p_cur) with absent categories at share 0. The common prefix of
    * every categorical detector.
    */
  private def shares(ref: DataFrame, cur: DataFrame,
                     catCol: String): DataFrame = {
    def side(df: DataFrame, n: String) =
      df.filter(col(catCol).isNotNull)
        .groupBy(col(catCol).as("category"))
        .agg(count(lit(1)).as(s"__n_$n"))
    val r = side(ref, "ref")
    val c = side(cur, "cur")
    val j = r.join(c, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("__n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("__n_cur"), lit(0L)).as("n_cur"))
    val tot = j.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    j.crossJoin(broadcast(tot)) // one-row totals broadcast
      .select(col("category"), col("n_ref"), col("n_cur"),
        when(col("__tr") > 0, col("n_ref").cast("double") / col("__tr"))
          .otherwise(lit(0.0)).as("p_ref"),
        when(col("__tc") > 0, col("n_cur").cast("double") / col("__tc"))
          .otherwise(lit(0.0)).as("p_cur"))
  }

  /** Population Stability Index over a categorical column:
    * PSI = sum_c (p_cur - p_ref) * ln(p_cur / p_ref), with both
    * shares floored at `eps` so categories present on only one side
    * contribute a large-but-finite term (the standard industry
    * convention; PSI > 0.25 is the usual "significant shift" bar).
    * Output: one row (n_categories, psi).
    */
  def psiCategorical(ref: DataFrame, cur: DataFrame, catCol: String,
                     eps: Double = 1e-6): DataFrame = {
    require(eps > 0, "eps > 0")
    val s = shares(ref, cur, catCol)
    val p = greatest(col("p_cur"), lit(eps))
    val q = greatest(col("p_ref"), lit(eps))
    s.agg(count(lit(1)).as("n_categories"),
      round(sum((p - q) * log(p / q)), 4).as("psi"))
  }

  /** PSI over a numeric column, binned by the REFERENCE side's
    * `k`-quantile cutoffs (the scorecard-monitoring formulation: the
    * bins are fixed from the baseline, then both populations are
    * dropped into them). Cutoffs round midpoint-safe to 6dp
    * (floor(c*1e6 + 0.5)/1e6, the [[Profile.equiDepthBins]]
    * convention) so any engine replays the same boundaries. Output:
    * one row per bin (bin, n_ref, n_cur, psi_term) plus the summary
    * is just sum(psi_term) — surfacing terms makes the shifted bin
    * visible, not just the headline number.
    *
    * Scale shape: cutoffs are one aggregate over ref (k-1 doubles to
    * the driver, the equiDepthBins pattern); binning is a codegen
    * CASE on each scan; the only exchange is the k-row bin count.
    */
  def psiBinned(ref: DataFrame, cur: DataFrame, valueCol: String,
                k: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(k >= 2 && k <= 1000, "k in [2, 1000]")
    val cuts = ref.agg(percentile(col(valueCol).cast("double"),
        typedLit((1 until k).map(_.toDouble / k))).as("__c"))
      .head().getSeq[Double](0)
      .map(Quantize.qd(_, 6))
    val bin = Quantize.binByCuts(col(valueCol), cuts)
    def binned(df: DataFrame) = df.filter(col(valueCol).isNotNull)
      .groupBy(bin.cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
    val j = binned(ref).withColumnRenamed("n", "__nr")
      .join(binned(cur).withColumnRenamed("n", "__nc"),
        Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("__nr"), lit(0L)).as("n_ref"),
        coalesce(col("__nc"), lit(0L)).as("n_cur"))
    val tot = j.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val p = greatest(col("n_cur") / col("__tc"), lit(eps))
    val q = greatest(col("n_ref") / col("__tr"), lit(eps))
    j.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round((p - q) * log(p / q), 6).as("psi_term"))
  }

  /** Two-sample chi-square statistic of homogeneity over a
    * categorical column: for each (category, side) cell, expected =
    * row_total * side_total / grand_total; the statistic sums
    * (obs - exp)^2 / exp over both sides' cells. Output: one row
    * (n_categories, dof = n_categories - 1, chi2). Categories seen on
    * neither side can't occur; categories on one side only contribute
    * through both cells as usual (expected > 0 whenever the category
    * has any row at all, so no division guard can trip).
    */
  def chiSquare(ref: DataFrame, cur: DataFrame, catCol: String): DataFrame = {
    val s = shares(ref, cur, catCol)
    val withTot = s.crossJoin(broadcast(
      s.agg(sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"))))
    val rowTot = (col("n_ref") + col("n_cur")).cast("double")
    val grand = (col("__tr") + col("__tc")).cast("double")
    val expRef = rowTot * col("__tr") / grand
    val expCur = rowTot * col("__tc") / grand
    val cell = (o: Column, e: Column) =>
      when(e > 0, (o - e) * (o - e) / e).otherwise(lit(0.0))
    withTot.agg(
      count(lit(1)).as("n_categories"),
      (count(lit(1)) - 1).as("dof"),
      round(sum(cell(col("n_ref").cast("double"), expRef) +
        cell(col("n_cur").cast("double"), expCur)), 4).as("chi2"))
  }

  /** Jensen-Shannon divergence (base 2, so the value lives in [0, 1])
    * between the two sides' categorical distributions:
    * JS = (KL(p||m) + KL(q||m)) / 2 with m = (p+q)/2 and the usual
    * 0·log(0/x) = 0 convention — symmetric and finite even for
    * categories present on one side only, which is why it's the
    * standard corpus-vocabulary drift measure (no eps floor needed,
    * unlike PSI/KL). Output: one row (n_categories, js_divergence).
    */
  def jsDivergence(ref: DataFrame, cur: DataFrame,
                   catCol: String): DataFrame = {
    val s = shares(ref, cur, catCol)
    val m = (col("p_ref") + col("p_cur")) / 2
    val term = (p: Column) => when(p > 0, p * log2(p / m)).otherwise(lit(0.0))
    s.agg(count(lit(1)).as("n_categories"),
      round(sum((term(col("p_ref")) + term(col("p_cur"))) / 2), 4)
        .as("js_divergence"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic over a numeric column:
    * D = max over observed values of |F_ref(x) - F_cur(x)|, exact
    * (every tie handled by grouping per distinct value before the
    * CDF). Output: one row (n_ref, n_cur, ks).
    *
    * Scale shape: the per-value count aggregate shuffles only
    * (value, n_ref, n_cur) rows, so the cumulative window runs over
    * the DISTINCT-VALUE table, not the data — fine for discrete or
    * fixed-precision columns (prices, scores rounded upstream). For
    * an unbounded continuous column at corpus scale, round to fixed
    * precision first (bounding distinct values) or reach for
    * [[psiBinned]]; the global-order window is inherently a total
    * order and no engine escapes that.
    */
  def ksStatistic(ref: DataFrame, cur: DataFrame,
                  valueCol: String): DataFrame = {
    def side(df: DataFrame, n: String) =
      df.filter(col(valueCol).isNotNull)
        .groupBy(col(valueCol).cast("double").as("__v"))
        .agg(count(lit(1)).as(s"__n_$n"))
    val j = side(ref, "ref").join(side(cur, "cur"), Seq("__v"), "full_outer")
      .select(col("__v"),
        coalesce(col("__n_ref"), lit(0L)).as("__nr"),
        coalesce(col("__n_cur"), lit(0L)).as("__nc"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = j.select(
      sum(col("__nr")).over(w).as("__cr"),
      sum(col("__nc")).over(w).as("__cc"),
      sum(col("__nr")).over(wAll).as("__tr"),
      sum(col("__nc")).over(wAll).as("__tc"))
    cum.agg(
      max(col("__tr")).as("n_ref"),
      max(col("__tc")).as("n_cur"),
      round(max(when(col("__tr") > 0 && col("__tc") > 0,
        abs(col("__cr").cast("double") / col("__tr") -
          col("__cc").cast("double") / col("__tc")))), 6).as("ks"))
  }
}
