package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators — the corpus-QA step of a training-data
  * pipeline (null audit, cardinality, ranges, length distributions)
  * expressed as single-pass declarative aggregations.
  */
object Profile {

  /** Per-column profile: null count, distinct count, min/max (as
    * strings so heterogeneous column types share one output schema).
    *
    * `approx = true` (the 100-TB default posture): everything is ONE
    * aggregation pass — HLL ndv sketches have fixed-size buffers, so
    * the whole profile stays a map-side-partial HashAggregate.
    *
    * Exact mode runs TWO cheap passes instead of one expensive one:
    * mixing min/max(string) into the multi-distinct rewrite drags
    * var-length buffers through Catalyst's Expand and forces
    * SortAggregate over a (cols..., gid) key — measured 3x slower than
    * scanning twice. Pass 1 folds nulls/min/max with no Expand; pass 2
    * is the multi-distinct Expand with pure count buffers, which stays
    * hash-based. The two one-row results broadcast-join for free.
    */
  def columnProfile(df: DataFrame, cols: Seq[String],
                    approx: Boolean = false, rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val basicAggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val ndvAggs = cols.map { c =>
      (if (approx) approx_count_distinct(col(c), rsd) else count_distinct(col(c)))
        .as(s"__nd_$c")
    }
    val wide =
      if (approx)
        df.agg((basicAggs ++ ndvAggs).head, (basicAggs ++ ndvAggs).tail: _*)
      else
        df.agg(basicAggs.head, basicAggs.tail: _*)
          .crossJoin(broadcast(df.agg(ndvAggs.head, ndvAggs.tail: _*)))
    // unpivot the one wide row into a row per column (stack is a
    // generator — stays in the same whole-stage-codegen projection)
    val stackArgs = cols
      .map(c => s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_nulls, n_distinct, min_val, max_val)")
  }

  /** Heavy hitters via Spark's one-pass frequent-items sketch
    * (stat.freqItems, the Karp/Misra-Gries family): every value with
    * frequency > support * N is GUARANTEED present (no false
    * negatives); false positives are possible and callers re-verify
    * exactly if they need precision — the same superset-then-verify
    * shape as the LSH dedup paths. One map-side pass with ~1/support
    * state per partition vs. the exact groupBy's full-vocab shuffle.
    * Returns one row per candidate value.
    */
  def heavyHitters(df: DataFrame, valueCol: String,
                   support: Double = 0.01): DataFrame =
    df.stat.freqItems(Seq(valueCol), support)
      .select(explode(col(s"${valueCol}_freqItems")).as(valueCol))

  /** Grouped quantile contract: exact interpolated percentiles plus a
    * boolean asserting the approximate sketch (percentile_approx, a
    * positional variant of Greenwald-Khanna) lands within `relTol`
    * relative error (+1 absolute slack for integer-valued data) of the
    * exact answer. The exact side is the small-data oracle; the sketch
    * is the 100-TB path — mergeable partial aggregation, no sort, one
    * pass — and the contract is what keeps it honest.
    */
  def quantileContract(df: DataFrame, groupCol: String, valueCol: String,
                       ps: Seq[Double], accuracy: Int = 1000,
                       relTol: Double = 0.05): DataFrame = {
    val v = col(valueCol).cast("double")
    // index-keyed aliases: a percentile like 0.5 in a name would parse
    // as a nested-field reference (`__e0`.`5`)
    val pi = ps.zipWithIndex
    val exact = pi.map { case (p, i) => percentile(v, lit(p)).as(s"__e$i") }
    val approx = pi.map { case (p, i) =>
      percentile_approx(v, lit(p), lit(accuracy)).as(s"__a$i") }
    val out = pi.map { case (p, i) =>
      round(col(s"__e$i"), 4).as(s"p${(p * 100).toInt}") } :+
      pi.map { case (_, i) => abs(col(s"__a$i") - col(s"__e$i")) <=
        abs(col(s"__e$i")) * relTol + 1.0 }.reduce(_ && _).as("approx_ok")
    df.groupBy(col(groupCol))
      .agg((exact ++ approx).head, (exact ++ approx).tail: _*)
      .select(col(groupCol) +: out: _*)
  }

  /** Equal-width histogram of an integer-valued column — the length /
    * token-count distribution view every corpus report leads with.
    * Two-phase distributed shape: a one-row min/max aggregate
    * broadcasts onto the stream (never an eager collect), bucket
    * assignment is pure INTEGER arithmetic
    * (`(v - lo) * nBuckets / (hi - lo + 1)` in BIGINT, so any engine
    * replays it bit-for-bit — float log/width math draws engine-
    * dependent boundaries), and the histogram itself is one hash
    * aggregation on the bucket id. Empty buckets are absent by
    * design (a 100-TB histogram materializes observed buckets only).
    * Caller contract: (max - lo) * nBuckets must fit in a long —
    * holds for any length/count-like column with sane bucket counts.
    */
  def histogram(df: DataFrame, valueCol: String,
                nBuckets: Int = 16): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val v = col(valueCol).cast("long")
    val bounds = df.agg(min(v).as("__lo"), max(v).as("__hi"))
    df.select(v.as("__v"))
      .crossJoin(broadcast(bounds))
      // SQL `div` = exact BIGINT division (Column./ would be double)
      .withColumn("bucket",
        expr(s"((__v - __lo) * $nBuckets) div (__hi - __lo + 1)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__v")).as("bucket_min"),
        max(col("__v")).as("bucket_max"))
  }

  /** Equi-DEPTH histogram (quantile binning): k bins holding ~equal
    * row counts — the binning that stays informative on skewed
    * distributions where equi-width ([[histogram]]) collapses into
    * one hot bucket. Cutoffs are the (i/k)-quantiles from ONE
    * aggregate (rounded to 6dp so any engine replays the same
    * boundaries), broadcast back as a codegen CASE — binning itself
    * is map-side; the only exchange is the final per-bin count.
    * Bin i (1-based) holds values in (cutoff_{i-1}, cutoff_i], bin 1
    * is unbounded below, bin k unbounded above.
    */
  def equiDepthBins(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 1000, "k in [2, 1000]")
    val cuts = df.agg(percentile(col(valueCol).cast("double"),
        typedLit((1 until k).map(_.toDouble / k))).as("__c"))
      .head().getSeq[Double](0)
      // midpoint-safe 6dp ([[Quantize.qd]]): the same binary double
      // arithmetic any SQL engine replays with
      // floor(c*1000000 + 0.5)/1000000, unlike decimal-string
      // HALF_UP which can disagree within ~1 ulp of a midpoint
      .map(Quantize.qd(_, 6))
    val bin = Quantize.binByCuts(col(valueCol), cuts)
    df.filter(col(valueCol).isNotNull)
      .groupBy(bin.cast("long").as("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("bin_min"), max(col(valueCol)).as("bin_max"))
  }

  /** Per-group Pearson correlation between two numeric columns —
    * the relationship screen of a profiling pass. One groupBy
    * aggregate; the explicit covar/sqrt(var) form (not `corr`) so a
    * zero-variance group yields NULL on every engine instead of
    * Spark NaN vs SQL NULL.
    */
  def groupCorr(df: DataFrame, groupCol: String, colA: String,
                colB: String): DataFrame =
    df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_rows"),
      round(when(var_pop(col(colA)) > 0 && var_pop(col(colB)) > 0,
        covar_pop(col(colA), col(colB)) /
          (sqrt(var_pop(col(colA))) * sqrt(var_pop(col(colB))))), 4)
        .as("pearson_r"))

  /** Per-group winsorization: clamp each value into its group's
    * [loQ, hiQ] quantile band — the standard heavy-tail taming step
    * before a mean/variance-based model sees the column (z-score
    * [[outliers]] FLAGS the tail; winsorize KEEPS the row with the
    * tail pulled in, the right call when dropping rows would bias the
    * sample). Output: every input row plus `value_w` (the clamped
    * value) and `clamped` (whether it moved).
    *
    * Scale shape: one groupBy aggregate computes both cutoffs per
    * group (a groups-sized frame), broadcast back onto the scan; the
    * clamp itself is a codegen row expression. Cutoffs round
    * midpoint-safe to 6dp (floor(c*1e6 + 0.5)/1e6) so any engine
    * replays the same boundaries.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                loQ: Double, hiQ: Double): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ, "0 <= loQ < hiQ <= 1")
    val cuts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol)).agg(
        Quantize.q(percentile(col(valueCol).cast("double"), lit(loQ)), 6)
          .as("__lo"),
        Quantize.q(percentile(col(valueCol).cast("double"), lit(hiQ)), 6)
          .as("__hi"))
    // NULL values stay NULL (greatest/least SKIP nulls, so an
    // unguarded clamp would silently impute missing values at lo)
    df.join(broadcast(cuts), Seq(groupCol))
      .withColumn("value_w",
        when(col(valueCol).isNotNull,
          least(greatest(col(valueCol).cast("double"), col("__lo")),
            col("__hi"))))
      .withColumn("clamped",
        coalesce(col("value_w") =!= col(valueCol).cast("double"),
          lit(false)))
      .drop("__lo", "__hi")
  }

  /** Per-group z-score outliers: rows whose value sits more than
    * `zThreshold` population standard deviations from their group's
    * mean. Two exchanges total: one groupBy for the (mean, stddev)
    * stats — a groups-sized frame joined back onto the rows (broadcast
    * when groups are few, which is the profiling norm) — then the
    * z-score filter is codegen row-local. Zero-variance groups
    * produce no outliers (every value IS the mean). Stats round to
    * 6dp before the compare so any engine replays the same boundary.
    */
  def outliers(df: DataFrame, groupCol: String, valueCol: String,
               zThreshold: Double): DataFrame = {
    require(zThreshold > 0, "threshold must be positive")
    val stats = df.groupBy(col(groupCol)).agg(
      round(avg(col(valueCol)), 6).as("__mu"),
      round(stddev_pop(col(valueCol)), 6).as("__sigma"))
    df.join(broadcast(stats), Seq(groupCol))
      .filter(col("__sigma") > 0 &&
        abs(col(valueCol) - col("__mu")) > lit(zThreshold) * col("__sigma"))
      .withColumn("z",
        round((col(valueCol) - col("__mu")) / col("__sigma"), 4))
      .drop("__mu", "__sigma")
  }

  /** Per-group robust outliers by modified z-score (Iglewicz &
    * Hoaglin 1993): 0.6745 * (x - median) / MAD, flagged beyond
    * `threshold` (their recommended 3.5). Where [[outliers]]' mean/
    * stddev are themselves dragged by the tail they're hunting (one
    * huge value inflates sigma until nothing else flags), median and
    * MAD have a 50% breakdown point — the right detector when the
    * contamination isn't rare.
    *
    * Scale shape: TWO group aggregates (median; then median absolute
    * deviation, which needs the median on the row first), each
    * broadcast back onto the scan — groups-sized frames, the
    * [[winsorize]] economics. Both cutoffs round midpoint-safe to
    * 6dp; the modified z floor-quantizes to 4dp (the MMR convention:
    * z values land on exact .xxxx5 midpoints where decimal-string
    * HALF_UP and binary round() disagree — floor(x*1e4+0.5) doesn't).
    * Zero-MAD groups (over half the values identical) yield no
    * outliers by convention — the score is undefined there.
    */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     threshold: Double = 3.5): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val v = col(valueCol).cast("double")
    val med = df.filter(v.isNotNull).groupBy(col(groupCol))
      .agg(Quantize.q(percentile(v, lit(0.5)), 6).as("__med"))
    val withMed = df.join(broadcast(med), Seq(groupCol))
    val mad = withMed.filter(v.isNotNull).groupBy(col(groupCol))
      .agg(Quantize.q(percentile(abs(v - col("__med")), lit(0.5)), 6)
        .as("__mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .filter(col("__mad") > 0 &&
        lit(0.6745) * abs(v - col("__med")) > lit(threshold) * col("__mad"))
      .withColumn("modified_z",
        Quantize.q(lit(0.6745) * (v - col("__med")) / col("__mad"), 4))
      .drop("__med", "__mad")
  }

  /** Join profile: predict an equi-join's output size and skew
    * WITHOUT materializing the join — the planning dry-run for a
    * 100-TB join. Exact arithmetic: per-side key-count tables join on
    * the key and the output size is sum(n_left * n_right) over shared
    * keys, so the "estimate" is exact while the work is two count
    * aggregates plus a keys-sized equi-join (never the |output| rows
    * the real join would shuffle). max-frequency columns expose the
    * hot keys that decide whether [[graft.ops.Skew]] salting or an
    * AQE skew split is warranted before anyone pays for the real
    * thing. Null keys never match an equi-join and are excluded.
    * Output: one row (n_left, n_right, ndv_left, ndv_right,
    * n_shared_keys, join_rows, max_freq_left, max_freq_right).
    */
  def joinProfile(left: DataFrame, leftKey: String,
                  right: DataFrame, rightKey: String): DataFrame = {
    def side(df: DataFrame, k: String) =
      df.filter(col(k).isNotNull)
        .groupBy(col(k).as("__k")).agg(count(lit(1)).as("__n"))
    val l = side(left, leftKey)
    val r = side(right, rightKey)
    val lStats = l.agg(sum(col("__n")).as("n_left"),
      count(lit(1)).as("ndv_left"), max(col("__n")).as("max_freq_left"))
    val rStats = r.agg(sum(col("__n")).as("n_right"),
      count(lit(1)).as("ndv_right"), max(col("__n")).as("max_freq_right"))
    val shared = l.join(r.select(col("__k"), col("__n").as("__m")), Seq("__k"))
      .agg(count(lit(1)).as("n_shared_keys"),
        coalesce(sum(col("__n") * col("__m")), lit(0L)).as("join_rows"))
    lStats.crossJoin(rStats).crossJoin(shared) // three one-row frames
      .select(col("n_left"), col("n_right"), col("ndv_left"),
        col("ndv_right"), col("n_shared_keys"), col("join_rows"),
        col("max_freq_left"), col("max_freq_right"))
  }

  /** Gini coefficient of the per-key row-count distribution — the
    * one-number "how skewed is this join/grouping key" diagnostic
    * (0 = perfectly even, → 1 = one key owns everything), the
    * planning signal that decides whether [[graft.ops.Skew]]-style
    * salting is worth its overhead. Computed by the sorted-rank
    * formula G = sum_i (2i - n - 1) x_(i) / (n * sum x); ties in x
    * contribute identically under any tie order, so the result is
    * deterministic and (integer-valued terms, exact in doubles below
    * 2^53) replays bit-for-bit on any engine.
    *
    * Scale shape: the per-key count aggregate shuffles (key, count)
    * rows only; the rank window then runs over the KEYS table, not
    * the data — same bounded-cardinality posture as
    * [[Drift.ksStatistic]]. Output: one row (n_keys, n_rows, gini).
    */
  def giniConcentration(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("__x"))
    val wRank = Window.orderBy(col("__x"), col(keyCol))
    val wAll = Window.orderBy(col("__x"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = c.select(col("__x"),
      row_number().over(wRank).as("__i"),
      count(lit(1)).over(wAll).as("__n"))
    ranked.agg(
      max(col("__n")).as("n_keys"),
      sum(col("__x")).as("n_rows"),
      round(sum((lit(2.0) * col("__i") - col("__n") - 1) * col("__x")) /
        (max(col("__n")).cast("double") * sum(col("__x")).cast("double")), 6)
        .as("gini"))
  }
}
