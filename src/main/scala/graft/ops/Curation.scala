package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation — the composed training-data pipeline the individual
  * operators exist for: quality gate -> language gate -> exact dedup
  * (-> optional near-dup removal). One declarative plan: the gates are
  * codegen column predicates evaluated in the scan stage, the dedup is
  * one narrow shuffle on a 16-byte hash, so the whole pass is
  * scan-bound at 100 TB.
  */
object Curation {

  /** Per-document curation annotations (no filtering). */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("quality", TextAnalysis.qualityScore(t))
      .withColumn("lang_pred", TextAnalysis.langId(t))
      .withColumn("n_tokens", TextAnalysis.tokenCountWs(t).cast("long"))
  }

  /** Keep predicate for [[curate]] — exposed so SQL oracles can mirror
    * it exactly.
    */
  def keepPredicate(minQuality: Double, langs: Seq[String]): Column = {
    val langOk = if (langs.isEmpty) lit(true) else col("lang_pred").isin(langs: _*)
    col("quality") >= minQuality && langOk
  }

  /** Full curation: annotate -> gate -> exact-dedup (keep min id per
    * identical text). Returns the curated rows with annotations.
    */
  def curate(df: DataFrame, textCol: String, idCol: String,
             minQuality: Double = 0.6, langs: Seq[String] = Nil,
             nearDupJaccard: Option[Double] = None): DataFrame = {
    val gated = annotate(df, textCol).filter(keepPredicate(minQuality, langs))
    val exact = Dedup.exactDedup(gated, textCol, idCol)
    nearDupJaccard.fold(exact) { thr =>
      // drop the higher-id member of each verified near-dup pair
      val losers = Dedup.minhashNearDups(exact, textCol, idCol, thr)
        .select(col("id_b").as(idCol)).distinct()
      exact.join(losers, Seq(idCol), "left_anti")
    }
  }
}
