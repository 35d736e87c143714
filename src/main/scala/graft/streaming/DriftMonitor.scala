package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming drift monitoring — [[graft.ops.Drift]]'s PSI carried
  * into the continuous-ingest world: is the stream of values arriving
  * THIS window distributed like the reference corpus the pipeline was
  * validated on? The reference side is frozen offline (its quantile
  * cutoffs and bin shares computed once by the [[graft.ops.Drift.psiBinned]]
  * machinery and passed here as literals — nothing joins against the
  * reference at stream time), so the streaming side stays a plain
  * watermarked windowed count.
  *
  * Two-stage shape, because Spark (correctly) refuses a second
  * aggregation inside one streaming plan: [[binCounts]] is the
  * streaming stage — a codegen bin CASE on the scan plus ONE
  * (window, bin) count whose state is bounded by windows-in-flight ×
  * k bins; [[psiOf]] is the k-rows-per-window batch fold applied in
  * `foreachBatch` (or over the sink table) where a second aggregation
  * is legal. Append mode + the watermark means a window's counts
  * surface exactly once, finalized.
  */
object DriftMonitor {

  /** First-match decile CASE ([[graft.ops.Quantize.binByCuts]] — the
    * SAME expression psiBinned bins with, so batch reference and
    * streaming monitor can never disagree on a boundary). Cuts must
    * be the midpoint-safe 6dp-rounded reference quantiles.
    */
  private def binExpr(valueCol: String, cuts: Seq[Double]): Column =
    graft.ops.Quantize.binByCuts(col(valueCol), cuts).cast("long")

  /** Streaming stage: per (tumbling window, reference bin) value
    * counts. Works identically on a batch frame (backfill parity —
    * the spec pins it). Output: (window_start, bin, n).
    */
  def binCounts(events: DataFrame, tsCol: String, valueCol: String,
                cuts: Seq[Double], window_ : String,
                watermark: String = "2 hours"): DataFrame = {
    require(cuts.nonEmpty, "need at least one reference cutoff")
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermark)
              else events
    src.filter(col(valueCol).isNotNull)
      .groupBy(window(col(tsCol), window_).as("__w"),
        binExpr(valueCol, cuts).as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("__w.start").as("window_start"), col("bin"), col("n"))
  }

  /** Freeze a reference distribution for the monitor — the OFFLINE
    * step: midpoint-safe 6dp k-quantile cutoffs (the same rounding
    * [[graft.ops.Drift.psiBinned]] bins with) plus the reference's
    * per-bin shares in [[psiOf]]'s 1-indexed layout (bins the
    * reference never hits enter as share 0 and are eps-floored at
    * monitor time). Returns (cuts, refShares) to pass as literals —
    * nothing joins against the reference at stream time.
    */
  def freezeReference(ref: DataFrame, valueCol: String,
                      k: Int = 10): (Seq[Double], Seq[Double]) = {
    require(k >= 2 && k <= 1000, "k in [2, 1000]")
    val cuts = ref.agg(percentile(col(valueCol).cast("double"),
        typedLit((1 until k).map(_.toDouble / k))).as("__c"))
      .head().getSeq[Double](0)
      .map(graft.ops.Quantize.qd(_, 6))
    val counts = ref.filter(col(valueCol).isNotNull)
      .groupBy(binExpr(valueCol, cuts).as("bin"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val tot = counts.values.sum.toDouble
    require(tot > 0, "empty reference")
    (cuts, (1 to k).map(b => counts.getOrElse(b, 0L) / tot))
  }

  /** Batch fold: one PSI row per window from the bin-count table.
    * `refShares` is 1-indexed by bin (refShares(i-1) = the reference
    * share of bin i, k = refShares.size); bins absent from a window
    * enter at the eps floor, exactly like the batch detector's
    * one-sided categories. Output: (window_start, n_events, psi)
    * with psi floor-quantized at 6dp.
    *
    * Absent bins never materialize: their eps-floored terms are a
    * per-bin CONSTANT, so psi folds as
    * sum_present[term(p,q) - term(eps,q)] + sum_all term(eps,q) —
    * one aggregate over the rows that exist, no windows×bins slot
    * frame, no self-join (which is also what keeps this legal over a
    * streaming sink table whose lineage can't be referenced twice).
    */
  def psiOf(binned: DataFrame, refShares: Seq[Double],
            eps: Double = 1e-6): DataFrame = {
    require(refShares.nonEmpty && eps > 0, "refShares nonempty, eps > 0")
    def termD(p: Double, q: Double) = (p - q) * math.log(p / q)
    val allAbsent = refShares.map(q0 => termD(eps, math.max(q0, eps))).sum
    val k = refShares.size
    // a bin outside refShares' range is a caller contract violation
    // (k vs k-1 cutoffs off-by-one) — fail LOUDLY instead of letting
    // element_at's NULL floor to eps and masquerade as massive drift
    val inRange = col("bin").between(1, k)
    val q = greatest(
      when(inRange,
        element_at(typedLit(refShares), col("bin").cast("int")))
        .otherwise(raise_error(concat(
          lit(s"psiOf: bin out of refShares range 1..$k: "),
          col("bin").cast("string")))),
      lit(eps))
    // window total via an analytic window, NOT a join back onto the
    // same frame: psiOf must stay legal over a streaming sink table,
    // whose lineage cannot appear on both sides of a join
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
    val p = greatest(col("n") / col("__tot"), lit(eps))
    val term = (x: Column) => (x - q) * log(x / q)
    binned.withColumn("__tot", sum(col("n")).over(w))
      .groupBy(col("window_start"))
      .agg(max(col("__tot")).as("n_events"),
        graft.ops.Quantize.q(
          sum(term(p) - term(lit(eps))) + lit(allAbsent), 6).as("psi"))
  }
}
