package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The repo's cross-engine numeric conventions, in ONE place so a
  * future convention change cannot drift the copies apart (every
  * oracle hash-gate depends on Spark and DuckDB replaying these
  * bit-for-bit):
  *
  *  - midpoint-safe quantization `floor(x * 10^dp + 0.5) / 10^dp` —
  *    identical IEEE arithmetic on any engine, unlike `round(x, dp)`
  *    whose Spark side HALF_UPs a decimal string and diverges from
  *    SQL's binary rounding within ~1 ulp of a midpoint (bit
  *    q_cdc_apply / q_outliers_robust at sf0.1 in round 9);
  *  - first-match quantile binning `1 + #cuts below the value` — the
  *    CASE shape every SQL engine replays as
  *    `1 + len(list_filter(cuts, c -> v > c))`.
  */
private[graft] object Quantize {

  /** Midpoint-safe dp-digit quantizer (column form). */
  def q(c: Column, dp: Int): Column = {
    val s = math.pow(10, dp)
    floor(c * s + 0.5d) / s
  }

  /** Midpoint-safe dp-digit quantizer (driver-side form — e.g. for
    * quantile cutoffs collected before broadcast).
    */
  def qd(x: Double, dp: Int): Double = {
    val s = math.pow(10, dp)
    math.floor(x * s + 0.5) / s
  }

  /** First-match bin over ascending `cuts`: bin i+1 when
    * value <= cuts(i), else cuts.size + 1. Codegen CASE — map-side.
    */
  def binByCuts(value: Column, cuts: Seq[Double]): Column = {
    require(cuts.nonEmpty, "need at least one cutoff")
    cuts.zipWithIndex.foldRight(lit(cuts.size + 1): Column) {
      case ((c, i), acc) => when(value <= c, i + 1).otherwise(acc)
    }
  }
}
