package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact all-pairs similarity join with prefix filtering (Bayardo,
  * Ma & Srikant, "Scaling Up All Pairs Similarity Search", WWW 2007;
  * the PPJoin family, Xiao et al. 2008) — EVERY document pair whose
  * token-set Jaccard meets a threshold, exactly, without an all-pairs
  * product and without LSH's probabilistic recall.
  *
  * The filter: order each document's tokens by ascending global
  * document frequency (rarest first, ties by token) and keep only the
  * first |d| - ceil(tau*|d|) + 1 as its PREFIX. Two sets with
  * Jaccard >= tau must overlap by >= tau/(1+tau)*(|a|+|b|) elements,
  * so they MUST share at least one prefix token — any pair sharing
  * none can be skipped with zero recall loss. Rarest-first ordering
  * makes prefixes collide as little as possible (a stopword in every
  * prefix would regenerate the all-pairs product; a hapax generates
  * one candidate). The size filter (tau*|a| <= |b| <= |a|/tau,
  * applied inside the join) prunes length-incompatible pairs before
  * verification.
  *
  * Scale shape: candidate generation is an EQUI-JOIN on prefix
  * tokens carrying only (id, token, set size) — text never enters
  * the exchange; verification joins the (id -> distinct-token set)
  * table back onto the deduped candidate pairs and evaluates exact
  * Jaccard as a codegen row expression. Everything shuffles on
  * token/id keys; no cartesian anywhere (plan-guarded). This is the
  * exact-threshold sibling of the MinHash/SimHash family in
  * [[Dedup]]: LSH bounds WORK at a recall cost, prefix filtering
  * bounds work at ZERO recall cost whenever token frequencies are
  * skewed (they always are in text).
  */
object AllPairs {

  /** All (id_a < id_b, jaccard) pairs with token-set Jaccard >= tau.
    * Tokens are whitespace-split lowercase distinct (the [[Dedup]]
    * convention). Empty documents (no tokens) never match.
    */
  def jaccardThresholdJoin(docs: DataFrame, idCol: String,
                           textCol: String, tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, "tau in (0, 1]")
    // empty/whitespace-only docs are dropped BEFORE tokenizing:
    // split("") yields [""], a phantom one-token set that would match
    // other empty docs at J = 1
    val toks = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("__id"),
        array_distinct(split(lower(trim(col(textCol))), "\\s+")).as("__toks"))
      .localCheckpoint() // consumed 3x: df counts, prefixes, verify
    // global document frequency per token — the prefix ordering key
    val tokDf = toks.select(col("__id"), explode(col("__toks")).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    // per-doc token rank by (df asc, token asc): rarest first,
    // deterministic under ties
    val ranked = toks
      .select(col("__id"), size(col("__toks")).as("__sz"),
        explode(col("__toks")).as("__tok"))
      .join(tokDf, Seq("__tok"))
      .withColumn("__pos", row_number().over(
        Window.partitionBy(col("__id")).orderBy(col("__df"), col("__tok"))))
    // prefix length |d| - ceil(tau*|d|) + 1
    val prefixes = ranked
      .filter(col("__pos") <= col("__sz") - ceil(lit(tau) * col("__sz")) + 1)
      .select(col("__id"), col("__tok"), col("__sz"))
    // candidates: prefix-token equi-join + size filter, deduped on ids
    val right = prefixes.select(col("__id").as("__id2"),
      col("__tok"), col("__sz").as("__sz2"))
    val cands = prefixes.join(right,
        prefixes("__tok") === right("__tok") &&
          prefixes("__id") < right("__id2") &&
          right("__sz2") >= ceil(lit(tau) * prefixes("__sz")) &&
          prefixes("__sz") >= ceil(lit(tau) * right("__sz2")))
      .select(col("__id"), col("__id2")).distinct()
    // verify: exact Jaccard over the full distinct-token sets
    val setsA = toks.select(col("__id"), col("__toks").as("__ta"))
    val setsB = toks.select(col("__id").as("__id2"), col("__toks").as("__tb"))
    cands.join(setsA, Seq("__id")).join(setsB, Seq("__id2"))
      .select(col("__id").as("id_a"), col("__id2").as("id_b"),
        round(size(array_intersect(col("__ta"), col("__tb"))).cast("double") /
          size(array_union(col("__ta"), col("__tb"))), 4).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }
}
