package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evaluation metrics — the scoring half of a training-data pipeline:
  * every classifier/labeler/retriever the engine runs (langid,
  * quality LR, ANN variants) needs its quality MEASURED against gold
  * labels or an exact baseline, and the metrics themselves are just
  * count arithmetic, so they gate exactly like any other query.
  *
  * Scale shape: classification metrics reduce the pair stream to a
  * (gold, pred) confusion matrix — classes² rows from ONE aggregate —
  * and every derived metric (accuracy, per-class P/R/F1, Cohen's
  * kappa) is arithmetic on that tiny frame. Ranking metrics join two
  * rank lists on (query, item) — top-k-sized inputs, never corpora.
  */
object Eval {

  /** (gold, pred, n) — one count aggregate over the labeled rows.
    * Null labels on either side are excluded (un-scorable).
    */
  def confusionMatrix(df: DataFrame, goldCol: String,
                      predCol: String): DataFrame =
    df.filter(col(goldCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(goldCol).as("gold"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))

  /** Per-class precision / recall / F1 over the label union, plus
    * support (gold count). Degenerate denominators (class never
    * predicted / never gold) yield NULL, not NaN. 4dp surfaces.
    */
  def classificationReport(df: DataFrame, goldCol: String,
                           predCol: String): DataFrame = {
    val cm = confusionMatrix(df, goldCol, predCol).localCheckpoint()
    val labels = cm.select(col("gold").as("label"))
      .union(cm.select(col("pred"))).distinct()
    val tp = cm.filter(col("gold") === col("pred"))
      .select(col("gold").as("label"), col("n").as("__tp"))
    val goldN = cm.groupBy(col("gold").as("label"))
      .agg(sum(col("n")).as("__g"))
    val predN = cm.groupBy(col("pred").as("label"))
      .agg(sum(col("n")).as("__p"))
    labels
      .join(tp, Seq("label"), "left")
      .join(goldN, Seq("label"), "left")
      .join(predN, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("__g"), lit(0L)).as("support"),
        round(when(col("__p") > 0,
          coalesce(col("__tp"), lit(0L)) / col("__p")), 4).as("precision"),
        round(when(col("__g") > 0,
          coalesce(col("__tp"), lit(0L)) / col("__g")), 4).as("recall"),
        round(when(col("__p") > 0 && col("__g") > 0 &&
            coalesce(col("__tp"), lit(0L)) > 0,
          lit(2.0) * col("__tp") / (col("__p") + col("__g"))), 4).as("f1"))
  }

  /** One-row (n, accuracy, kappa): Cohen's kappa corrects observed
    * agreement for the agreement two labelers would reach by chance
    * from their marginal distributions — THE standard "better than
    * chance?" gate for a heuristic labeler. Pure count arithmetic on
    * the confusion matrix.
    */
  def cohenKappa(df: DataFrame, goldCol: String,
                 predCol: String): DataFrame = {
    val cm = confusionMatrix(df, goldCol, predCol).localCheckpoint()
    val total = cm.agg(sum(col("n")).as("__n"))
    val agree = cm.filter(col("gold") === col("pred"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("__a"))
    // chance agreement: sum over labels of goldShare * predShare
    val chance = cm.groupBy(col("gold").as("label"))
      .agg(sum(col("n")).as("__g"))
      .join(cm.groupBy(col("pred").as("label"))
        .agg(sum(col("n")).as("__p")), Seq("label"), "inner")
      .agg(coalesce(sum(col("__g") * col("__p")), lit(0L)).as("__gp"))
    total.crossJoin(agree).crossJoin(chance)
      .select(col("__n").as("n"),
        round(col("__a") / col("__n"), 4).as("accuracy"),
        round(
          when(lit(1.0) - col("__gp") / (col("__n") * col("__n")) > 0,
            (col("__a") / col("__n") - col("__gp") / (col("__n") * col("__n"))) /
              (lit(1.0) - col("__gp") / (col("__n") * col("__n")))), 4)
          .as("kappa"))
  }

  /** Per-query ranking quality of `found` against the exact `truth`
    * list (both (queryCol, itemCol, rankCol) frames, rank 1-based):
    * recall@k (found top-k ∩ truth top-k / |truth top-k|) and MRR@k
    * (reciprocal rank of the FIRST found item that is the truth's
    * #1). The recall denominator is the query's ACTUAL truth-list
    * size, so a query with fewer than k true neighbors (small or
    * filtered corpus) can still reach recall 1; a query appearing
    * only on the found side (no truth rows at all) falls back to /k,
    * yielding 0 rather than 0/0. One (query, item) equi-join of two
    * top-k-sized lists.
    */
  def rankingMetrics(found: DataFrame, truth: DataFrame, k: Int,
                     queryCol: String = "query_id",
                     itemCol: String = "corpus_id",
                     rankCol: String = "rank"): DataFrame = {
    require(k >= 1, "k >= 1")
    val f = found.filter(col(rankCol) <= k)
      .select(col(queryCol).as("__q"), col(itemCol).as("__i"),
        col(rankCol).cast("long").as("__fr"))
    val tr = truth.filter(col(rankCol) <= k)
      .select(col(queryCol).as("__q"), col(itemCol).as("__i"),
        col(rankCol).cast("long").as("__tr"))
    f.join(tr, Seq("__q", "__i"), "full_outer")
      .groupBy(col("__q").as(queryCol))
      .agg(
        round(sum(when(col("__fr").isNotNull && col("__tr").isNotNull, 1.0)
          .otherwise(0.0)) /
          coalesce(
            when(sum(when(col("__tr").isNotNull, 1L).otherwise(0L)) > 0,
              sum(when(col("__tr").isNotNull, 1L).otherwise(0L))),
            lit(k.toLong)), 4).as(s"recall_at_$k"),
        round(coalesce(
          max(when(col("__tr") === 1, lit(1.0) / col("__fr"))),
          lit(0.0)), 4).as("mrr"))
  }

  /** Per-query nDCG@k (Järvelin & Kekäläinen 2002) — the
    * position-weighted ranking metric [[rankingMetrics]]'s recall
    * deliberately isn't: a found list that puts the truth's #1 first
    * scores higher than one that buries it at rank k. Relevance is
    * graded from the truth ranking (rel = k+1-truth_rank for items in
    * the truth top-k, 0 otherwise), DCG discounts by log2(rank+1),
    * and the ideal DCG re-ranks the query's OWN truth list, so a
    * query with fewer than k true neighbors can still reach 1.
    * Queries with no truth rows score 0. One (query, item) equi-join
    * of two top-k lists plus one truth-side aggregate; 4dp rounding
    * so parallel sum order can't leak into the compare.
    */
  def ndcg(found: DataFrame, truth: DataFrame, k: Int,
           queryCol: String = "query_id",
           itemCol: String = "corpus_id",
           rankCol: String = "rank"): DataFrame = {
    require(k >= 1, "k >= 1")
    val f = found.filter(col(rankCol) <= k)
      .select(col(queryCol).as("__q"), col(itemCol).as("__i"),
        col(rankCol).cast("long").as("__fr"))
    val tr = truth.filter(col(rankCol) <= k)
      .select(col(queryCol).as("__q"), col(itemCol).as("__i"),
        col(rankCol).cast("long").as("__tr"))
    val dcg = f.join(tr, Seq("__q", "__i"), "left")
      .groupBy(col("__q"))
      .agg(sum(coalesce(lit(k + 1) - col("__tr"), lit(0L)) /
        log2(col("__fr") + 1)).as("__dcg"))
    // ideal DCG: the truth relevances RE-PACKED to positions 1..n
    // (row_number over the truth order), not the raw truth ranks — a
    // caller passing a filtered ranking whose ranks don't start at 1
    // would otherwise get idcg < dcg and nDCG > 1. For contiguous
    // 1-based truth ranks (the gated entry) this is the identity.
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__q")).orderBy(col("__tr"))
    val idcg = tr.withColumn("__pos", row_number().over(wq))
      .groupBy(col("__q"))
      .agg(sum((lit(k + 1) - col("__tr")) /
        log2(col("__pos") + 1)).as("__idcg"))
    dcg.join(idcg, Seq("__q"), "full_outer")
      .select(col("__q").as(queryCol),
        round(when(col("__idcg") > 0,
          coalesce(col("__dcg"), lit(0.0)) / col("__idcg"))
          .otherwise(lit(0.0)), 4).as(s"ndcg_at_$k"))
  }
}
