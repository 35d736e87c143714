package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped statistical modeling primitives — the "fit a cheap model
  * per segment" layer a curation pipeline uses to score, compare and
  * gate slices of a corpus (does quality predict engagement in THIS
  * language? did the A/B arms actually differ? how entangled are
  * these two categorical facets?).
  *
  * All three ops are single-aggregate shapes: one map-side partial
  * aggregate per group (or per table) flowing into one reduce — no
  * joins on the data path, no row explosion, so each scales exactly
  * like COUNT(*) at 100 TB. Outputs are rounded so parallel
  * sum-order wobble (~1e-15) can't leak into a hash-gated compare.
  */
object Stats {

  /** Per-group ordinary-least-squares fit of y on x: n, slope,
    * intercept and R² — the one-pass closed form (slope =
    * cov_pop(x,y)/var_pop(x)), which is what `REGR_SLOPE` /
    * `REGR_INTERCEPT` / `REGR_R2` compute in every ANSI engine.
    * Rows where either side is NULL are excluded pairwise (the
    * REGR_* contract). Groups with zero x-variance yield NULL slope
    * (vertical fit), matching the SQL aggregates.
    *
    * Scale shape: ONE partial aggregate — Spark's native
    * `regr_slope`/`regr_intercept`/`regr_r2` are declarative
    * aggregates with map-side partials, so the full-table cost is a
    * scan plus a groups-sized exchange.
    */
  def groupedOls(df: DataFrame, groupCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    df.groupBy(col(groupCol)).agg(
      regr_count(y, x).cast("long").as("n_pairs"),
      round(regr_slope(y, x), 5).as("slope"),
      round(regr_intercept(y, x), 5).as("intercept"),
      round(regr_r2(y, x), 5).as("r2"))
  }

  /** Mutual information (in nats) between two categorical columns,
    * plus the normalized variant NMI = MI / sqrt(H(x)·H(y)) — the
    * standard "how redundant are these two facets" diagnostic before
    * stratifying or deduplicating on both (MI ≈ H means one facet
    * determines the other; ≈ 0 means independent strata).
    * NULL categories count as their own level (they stratify like
    * any other value). Output: one row
    * (n_rows, mi_nats, h_x, h_y, nmi).
    *
    * Scale shape: one groupBy(x, y) count — the joint table, at most
    * |X|·|Y| rows — from which BOTH marginals re-aggregate
    * driver-free; the three entropy sums reduce the (small) joint
    * table to one row. The raw table is scanned ONCE.
    */
  def mutualInformation(df: DataFrame, xCol: String,
                        yCol: String): DataFrame = {
    // joint counts: the only aggregate that touches the raw table.
    // NULL levels are sentinel-encoded BEFORE the marginal joins —
    // an equi-join never matches NULL keys, which would silently drop
    // the NULL stratum from the MI sum (the NUL-sentinel prefix can't
    // collide with a real category).
    val lvl: String => org.apache.spark.sql.Column =
      c => coalesce(col(c).cast("string"), lit("\u0000NULL"))
    val joint = df.groupBy(lvl(xCol).as("__x"), lvl(yCol).as("__y"))
      .agg(count(lit(1)).cast("double").as("__nxy"))
      .localCheckpoint() // consumed 4x below; tiny (|X|*|Y| rows)
    val total = joint.agg(sum(col("__nxy")).as("__n"))
    val mx = joint.groupBy(col("__x")).agg(sum(col("__nxy")).as("__nx"))
    val my = joint.groupBy(col("__y")).agg(sum(col("__nxy")).as("__ny"))
    joint
      .join(broadcast(mx), Seq("__x"))
      .join(broadcast(my), Seq("__y"))
      .crossJoin(broadcast(total))
      .agg(
        max(col("__n")).cast("long").as("n_rows"),
        round(sum((col("__nxy") / col("__n")) *
          log(col("__nxy") * col("__n") / (col("__nx") * col("__ny")))), 6)
          .as("mi_nats"))
      // entropies reduce the (tiny) marginal tables, each to one row,
      // broadcast onto the one-row MI result
      .crossJoin(broadcast(
        mx.crossJoin(broadcast(total))
          .agg(round(-sum((col("__nx") / col("__n")) *
            log(col("__nx") / col("__n"))), 6).as("h_x"))))
      .crossJoin(broadcast(
        my.crossJoin(broadcast(total))
          .agg(round(-sum((col("__ny") / col("__n")) *
            log(col("__ny") / col("__n"))), 6).as("h_y"))))
      .select(col("n_rows"), col("mi_nats"), col("h_x"), col("h_y"),
        round(when(col("h_x") > 0 && col("h_y") > 0,
          col("mi_nats") / sqrt(col("h_x") * col("h_y"))), 6).as("nmi"))
  }

  /** Welch's unequal-variance t statistic between two groups of a
    * numeric column: per-group n/mean/sample-variance, the t value
    * (mean_a - mean_b) / sqrt(s²_a/n_a + s²_b/n_b) and the
    * Welch–Satterthwaite degrees of freedom — the two-sample test a
    * pipeline runs to decide whether a filter/mix change actually
    * moved a metric. Output: one row
    * (n_a, n_b, mean_a, mean_b, t_stat, df_welch).
    * Requires both groups to have n ≥ 2 and positive variance —
    * otherwise t/df are NULL rather than a NaN that poisons a hash.
    *
    * Scale shape: one conditional aggregate over the scan — each
    * group's moments are SUM(CASE...)-shaped partials, so the whole
    * test is map-side work reducing to one row.
    */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String,
                 groupA: String, groupB: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val isA = col(groupCol) === lit(groupA)
    val isB = col(groupCol) === lit(groupB)
    val agg = df.filter((isA || isB) && v.isNotNull).agg(
      count(when(isA, 1)).as("n_a"),
      count(when(isB, 1)).as("n_b"),
      avg(when(isA, v)).as("__ma"),
      avg(when(isB, v)).as("__mb"),
      var_samp(when(isA, v)).as("__va"),
      var_samp(when(isB, v)).as("__vb"))
    // se² per group — NULL-guarded so a degenerate group yields NULL
    // t rather than NaN/div-zero
    val sa = col("__va") / col("n_a")
    val sb = col("__vb") / col("n_b")
    agg.select(
      col("n_a"), col("n_b"),
      round(col("__ma"), 5).as("mean_a"),
      round(col("__mb"), 5).as("mean_b"),
      round(when(col("n_a") >= 2 && col("n_b") >= 2 && (sa + sb) > 0,
        (col("__ma") - col("__mb")) / sqrt(sa + sb)), 4).as("t_stat"),
      round(when(col("n_a") >= 2 && col("n_b") >= 2 && (sa + sb) > 0,
        pow(sa + sb, 2) /
          (pow(sa, 2) / (col("n_a") - 1) + pow(sb, 2) / (col("n_b") - 1))),
        4).as("df_welch"))
  }

  /** Benford's-law expected share of leading digit d: log10(1 + 1/d),
    * pinned as 6dp literals so both engines compare against the SAME
    * constants (libm log10 is not guaranteed identically rounded
    * across implementations).
    */
  private[graft] val benfordExpected: Seq[(Int, Double)] = Seq(
    1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.096910,
    5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
    9 -> 0.045757)

  /** Benford leading-digit screen (Benford 1938; Nigrini 2012's
    * fraud/data-anomaly test): per group, the observed distribution
    * of leading significant digits of a positive numeric column vs
    * the log10(1+1/d) law — the classic cheap detector of fabricated,
    * truncated, capped or unit-mixed numeric feeds, run per source/
    * partition before numbers enter training features. Output: one
    * row per (group, digit 1-9) with observed count, share, expected
    * share and |deviation| (6dp), plus the group's total-variation
    * distance repeated per row — zero-count digits are present with
    * share 0 (they still contribute to TVD).
    *
    * Leading digit via the STRING form (first [1-9] of the value's
    * decimal print): both engines print round-trip representations of
    * the same double, and any two round-trip decimal forms of one
    * double share their leading significant digit — no log10/floor
    * boundary hazards. Non-positive, null and non-finite values are
    * excluded — including from the group totals, so shares always
    * sum to 1 (a NaN/Infinity row prints no [1-9] digit and must not
    * inflate the denominator).
    *
    * Scale shape: one map-side digit extraction, one (group, digit)
    * count aggregate (partial), one tiny cross-join scaffold
    * (groups × 9 literal digits) so absent digits surface, one
    * 9-row-frame window for the TVD — the data path scales like
    * COUNT(*).
    */
  def benfordScreen(df: DataFrame, groupCol: String,
                    valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val obs = df
      .filter(col(valCol).isNotNull && col(valCol) > 0)
      .select(col(groupCol).as("grp"),
        regexp_extract(col(valCol).cast("string"), "[1-9]", 0).as("__d"))
      // non-finite values print no significant digit ("Infinity";
      // NaN passes the > 0 filter under Spark's NaN-greatest
      // ordering) — drop them HERE, BEFORE the int cast (empty
      // string → ANSI cast error), so the group total __n counts
      // only values that contribute a digit row and per-digit
      // shares always sum to 1 (TVD would otherwise skew silently)
      .filter(col("__d") =!= "")
      .select(col("grp"), col("__d").cast("int").as("digit"))
      .groupBy(col("grp"), col("digit"))
      .agg(count(lit(1)).as("n_digit"))
    val totals = obs.groupBy(col("grp")).agg(sum(col("n_digit")).as("__n"))
    val scaffold = totals.crossJoin(
      broadcast(benfordExpected.toDF("digit", "expected")))
    val w = Window.partitionBy(col("grp"))
    scaffold.join(obs, Seq("grp", "digit"), "left")
      .withColumn("n_digit", coalesce(col("n_digit"), lit(0L)))
      .withColumn("share",
        Quantize.q(col("n_digit").cast("double") / col("__n"), 6))
      .withColumn("abs_dev", Quantize.q(abs(col("share") - col("expected")), 6))
      // quantize the dev sum BEFORE halving: abs_dev values sit ON the
      // 6dp grid, so sum/2 lands exactly on a quantization midpoint
      // whenever the sum is an odd multiple of 1e-6 and sum-order
      // wobble could flip the floor cross-engine; q6(sum)/2 quantizes
      // near-grid values (safe) and division by 2 is exact in binary
      .withColumn("tvd", Quantize.q(sum(col("abs_dev")).over(w), 6) / 2)
      .select(col("grp").as(groupCol), col("digit"),
        col("n_digit"), col("share"), col("expected"), col("abs_dev"),
        col("tvd"))
  }
}
