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

  /** Corpus-attrition funnel: documents surviving each curation stage
    * (raw -> quality gate -> exact dedup -> decontamination), as the
    * per-stage report every curation run should publish — attrition
    * is where silent data loss hides, and a number per stage makes it
    * reviewable.
    *
    * ONE annotation pass computes every stage flag per document
    * (quality gate; min-id-keeper rank over the text hash — survivors
    * rank before non-survivors so the keeper is the min-id SURVIVOR;
    * eval-set membership via the [[Corpus.decontaminate]] normalized
    * hash against a broadcast eval sketch), then a single aggregate
    * folds the flags into the four stage counts — documents are
    * scanned once, the only shuffle is the (hash, id) dedup window on
    * ~50-byte rows.
    */
  def funnelReport(df: DataFrame, textCol: String, idCol: String,
                   evalDf: DataFrame, evalTextCol: String,
                   minQuality: Double = 0.6,
                   langs: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val norm: Column => Column =
      c => md5(regexp_replace(lower(trim(c)), "\\s+", " "))
    val evalHashes = evalDf
      .select(norm(col(evalTextCol)).as("__nh")).distinct()
      .withColumn("__in_eval", lit(1))
    val w = Window.partitionBy(col("__eh"))
      .orderBy(when(col("__qok"), 0).otherwise(1), col(idCol))
    val flags = annotate(df, textCol)
      .withColumn("__qok", keepPredicate(minQuality, langs))
      .withColumn("__eh", md5(col(textCol)))
      .withColumn("__nh", norm(col(textCol)))
      .select(col(idCol), col("__qok"), col("__eh"), col("__nh"))
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(evalHashes), Seq("__nh"), "left")
      .agg(count(lit(1)).as("n1"),
        sum(when(col("__qok"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("__qok") && col("__rn") === 1, 1L).otherwise(0L)).as("n3"),
        sum(when(col("__qok") && col("__rn") === 1 &&
          col("__in_eval").isNull, 1L).otherwise(0L)).as("n4"))
    flags.select(expr(
      "stack(4, CAST(1 AS BIGINT), 'raw', n1, " +
        "CAST(2 AS BIGINT), 'quality_gate', n2, " +
        "CAST(3 AS BIGINT), 'exact_dedup', n3, " +
        "CAST(4 AS BIGINT), 'decontaminated', n4) " +
        "AS (stage_id, stage, n_docs)"),
      col("n1").as("__raw"))
      .select(col("stage_id"), col("stage"), col("n_docs"),
        round(col("n_docs") / col("__raw"), 4).as("pct_of_raw"))
  }

  /** Dataset card: the one-page numeric datasheet (Gebru et al.,
    * "Datasheets for Datasets", 2018) a corpus release ships with —
    * size, token volume, language/source diversity, concentration of
    * the top language, and the exact-duplicate rate. Output:
    * (metric, value) rows, values as doubles (counts exact,
    * ratios 6dp).
    *
    * Scale shape: ONE aggregate over the scan computes every count
    * (distinct counts included — Spark expands multi-distinct into
    * one expand + partial-agg pass), so the card costs a single
    * table pass regardless of corpus size; the top-language share is
    * a groups-sized second aggregate. Nothing wide ever shuffles —
    * text contributes only its md5 and its whitespace token count.
    */
  def datasetCard(df: DataFrame, textCol: String,
                  langCol: String, sourceCol: String): DataFrame = {
    val tokCount = size(split(trim(col(textCol)), "\\s+"))
      .cast("double")
    val base = df.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(length(col(textCol))).cast("double").as("total_chars"),
      sum(tokCount).as("total_tokens"),
      round(avg(tokCount), 6).as("mean_tokens"),
      countDistinct(col(langCol)).cast("double").as("n_langs"),
      countDistinct(col(sourceCol)).cast("double").as("n_sources"),
      countDistinct(md5(col(textCol))).cast("double").as("__uniq"))
    val topLang = df.groupBy(col(langCol))
      .agg(count(lit(1)).cast("double").as("__n"))
      .agg(max(col("__n")).as("__top"),
        sum(col("__n")).as("__all"))
    base.crossJoin(broadcast(topLang)).select(expr(
      "stack(8, 'n_docs', n_docs, 'total_chars', total_chars, " +
        "'total_tokens', total_tokens, 'mean_tokens', mean_tokens, " +
        "'n_langs', n_langs, 'n_sources', n_sources, " +
        "'top_lang_share', round(__top / __all, 6), " +
        "'exact_dup_rate', round(1.0 - __uniq / n_docs, 6)) " +
        "AS (metric, value)"))
  }
}
