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

  /** Per-document curation annotations (no filtering) — the one-pass
    * tokenize-once path; values identical to the scalar helpers.
    */
  def annotate(df: DataFrame, textCol: String): DataFrame =
    TextAnalysis.annotateStats(df, textCol)
      .drop("n_chars", "mean_word_len", "punct_ratio", "stopword_ratio")

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

  /** Annotation-only curation (text column not in the output):
    * annotate once, gate, project down to (id, md5(text), annotations),
    * then keep min-id per hash via a window over that narrow frame.
    * Same rows as [[curate]] minus the text body — but the expensive
    * annotation runs exactly once (curate's semi-join evaluates its
    * input on both sides) and the only shuffle moves ~50-byte rows,
    * never documents. The right shape when the consumer wants curation
    * decisions/stats rather than the curated corpus itself.
    */
  def curateStats(df: DataFrame, textCol: String, idCol: String,
                  minQuality: Double = 0.6, langs: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gated = annotate(df, textCol)
      .filter(keepPredicate(minQuality, langs))
      .withColumn("__h", md5(col(textCol)))
      .drop(textCol)
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol))
    gated.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__h", "__rn")
  }
}
