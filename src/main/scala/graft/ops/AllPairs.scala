package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact all-pairs similarity join with prefix + positional filtering
  * (Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
  * WWW 2007; PPJoin, Xiao et al., WWW 2008; the MapReduce set-at-a-
  * time formulation follows Vernica, Carey & Li, SIGMOD 2010) — EVERY
  * document pair whose token-set Jaccard meets a threshold, exactly,
  * without an all-pairs product and without LSH's probabilistic
  * recall.
  *
  * The prefix filter: order each document's tokens by ascending
  * global document frequency (rarest first, ties by token) and keep
  * only the first |d| - ceil(tau*|d|) + 1 as its PREFIX. Two sets
  * with Jaccard >= tau must overlap by >= tau/(1+tau)*(|a|+|b|)
  * elements, so they MUST share at least one prefix token — any pair
  * sharing none can be skipped with zero recall loss. Rarest-first
  * ordering makes prefixes collide as little as possible.
  *
  * The positional filter (PPJoin): because BOTH documents are sorted
  * by the same global order, every shared token beyond the ones seen
  * in both prefixes must come strictly AFTER the last both-prefix
  * shared token in each document. So for a candidate pair,
  * overlap <= shared_prefix_count + min(|a| - last_pos_a,
  * |b| - last_pos_b); pairs whose bound is below the required
  * overlap alpha = ceil(tau/(1+tau)*(|a|+|b|)) are dropped BEFORE the
  * token sets are ever joined back. The same grouped aggregate is
  * also the candidate dedup — one exchange replaces the old
  * distinct-then-verify, and only bound-surviving pairs pull their
  * arrays.
  *
  * Verification filters on the EXACT integer form
  * |a∩b| >= tau * |a∪b| (no rounding): prefix filtering guarantees
  * recall for true Jaccard >= tau, so a rounded filter could admit
  * pairs in [tau - 5e-5, tau) that share no prefix token and diverge
  * from a brute-force oracle. Rounding is display-only.
  *
  * KNOW YOUR ANSWER SIZE: prefix filtering bounds WORK, never the
  * OUTPUT. At tau low enough that most pairs qualify (e.g. unigram
  * tokens at tau = 0.5 over template-generated text, where >70% of
  * all N^2/2 pairs are true results), the answer itself is quadratic
  * and no exact algorithm can be sub-quadratic. Run this operator in
  * the sparse-answer regime it is designed for — shingled tokens
  * (`shingle` = 3) at a near-dup threshold (tau >= 0.7-0.8), where
  * true pairs are O(N) and rarest-first prefixes prune almost
  * everything.
  *
  * Scale shape: candidate generation is an EQUI-JOIN on prefix
  * tokens carrying only (id, token, size, position) — text never
  * enters the exchange; the grouped positional filter reduces pairs
  * before verification joins the (id -> distinct-token set) table
  * onto the survivors and evaluates exact Jaccard as a codegen row
  * expression. Everything shuffles on token/id keys; no cartesian
  * anywhere (plan-guarded). This is the exact-threshold sibling of
  * the MinHash/SimHash family in [[Dedup]]: LSH bounds WORK at a
  * recall cost, prefix filtering bounds work at ZERO recall cost
  * whenever token frequencies are skewed (they always are in text).
  */
object AllPairs {

  /** All (id_a < id_b, jaccard) pairs with token-set Jaccard >= tau.
    *
    * @param shingle token granularity: 1 (default) = whitespace-split
    *   lowercase distinct words (the [[Dedup]] convention); k > 1 =
    *   distinct k-word shingles via [[Dedup.shingles]] (short docs
    *   with < k words collapse to one whole-text shingle). Shingling
    *   is the sparse-answer regime — prefer it for corpus-scale runs.
    *
    * Empty documents (no tokens) never match.
    */
  def jaccardThresholdJoin(docs: DataFrame, idCol: String,
                           textCol: String, tau: Double,
                           shingle: Int = 1): DataFrame = {
    // validate BEFORE the tokenize/localCheckpoint job — a bad tau
    // must fail instantly, not after materializing the corpus
    require(tau > 0 && tau <= 1, "tau in (0, 1]")
    val toks = tokenSets(docs, idCol, textCol, shingle)
    val cands = candidatePairs(toks, tau)
    // verify: exact Jaccard over the full distinct-token sets; the
    // threshold test is the integer form |a∩b| >= tau*|a∪b| — rounding
    // happens AFTER the filter, display-only
    val setsA = toks.select(col("__id"), col("__toks").as("__ta"))
    val setsB = toks.select(col("__id").as("__id2"), col("__toks").as("__tb"))
    cands.join(setsA, Seq("__id")).join(setsB, Seq("__id2"))
      .withColumn("__i", size(array_intersect(col("__ta"), col("__tb"))))
      .withColumn("__u", size(array_union(col("__ta"), col("__tb"))))
      .filter(col("__i").cast("double") >= lit(tau) * col("__u"))
      .select(col("__id").as("id_a"), col("__id2").as("id_b"),
        round(col("__i").cast("double") / col("__u"), 4).as("jaccard"))
  }

  /** (__id, __toks) distinct-token sets — the join's tokenization
    * stage, factored out so candidate economics are testable.
    */
  private[graft] def tokenSets(docs: DataFrame, idCol: String,
                               textCol: String, shingle: Int): DataFrame = {
    require(shingle >= 1, "shingle >= 1")
    // empty/whitespace-only docs are dropped BEFORE tokenizing:
    // split("") yields [""], a phantom one-token set that would match
    // other empty docs at J = 1
    val tokExpr =
      if (shingle == 1) array_distinct(split(lower(trim(col(textCol))), "\\s+"))
      else Dedup.shingles(col(textCol), shingle)
    docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("__id"), tokExpr.as("__toks"))
      .localCheckpoint() // consumed 3x: df counts, prefixes, verify
  }

  /** Deduped (__id, __id2) candidate pairs surviving prefix, size and
    * positional filtering — everything BEFORE the token-set verify
    * join. Exposed (package-private) so AllPairsSpec can assert the
    * candidate-multiplicity economics (candidates <= c*n on sparse-
    * answer corpora) that no plan-shape guard can see: "no
    * CartesianProduct" cannot catch a quadratic equi-join.
    */
  private[graft] def candidatePairs(toks: DataFrame, tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, "tau in (0, 1]")
    // global document frequency per token — the prefix ordering key
    val tokDf = toks.select(col("__id"), explode(col("__toks")).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    // per-doc token rank by (df asc, token asc): rarest first,
    // deterministic under ties — the SAME total order in every doc,
    // which is what makes the positional bound below sound
    val ranked = toks
      .select(col("__id"), size(col("__toks")).as("__sz"),
        explode(col("__toks")).as("__tok"))
      .join(tokDf, Seq("__tok"))
      .withColumn("__pos", row_number().over(
        Window.partitionBy(col("__id")).orderBy(col("__df"), col("__tok"))))
    // prefix length |d| - ceil(tau*|d|) + 1. Every pruning ceil below
    // subtracts a 1e-9 slack first: tau is not binary-exact (0.8 parses
    // ABOVE 4/5), so tau*|d| can land an ulp above an exact integer and
    // ceil would over-prune — losing recall. The slack can only loosen
    // a bound (admit a few more candidates), never drop a true pair.
    val prefixes = ranked
      .filter(col("__pos") <=
        col("__sz") - ceil(lit(tau) * col("__sz") - 1e-9) + 1)
      .select(col("__id"), col("__tok"), col("__sz"), col("__pos"))
    // candidates: prefix-token equi-join + size filter; the groupBy is
    // both the pair dedup AND the PPJoin positional filter — shared
    // prefix hits plus the post-last-shared-token headroom bound the
    // achievable overlap, and pairs below alpha never reach verify
    val right = prefixes.select(col("__id").as("__id2"),
      col("__tok").as("__tok2"), col("__sz").as("__sz2"),
      col("__pos").as("__pos2"))
    val alpha =
      ceil(lit(tau) / (1 + tau) * (col("__sza") + col("__szb")) - 1e-9)
    val cands = prefixes.join(right,
        col("__tok") === col("__tok2") &&
          col("__id") < col("__id2") &&
          col("__sz2") >= ceil(lit(tau) * col("__sz") - 1e-9) &&
          col("__sz") >= ceil(lit(tau) * col("__sz2") - 1e-9))
      .groupBy(col("__id"), col("__id2"))
      .agg(count(lit(1)).as("__shared"),
        min(col("__sz")).as("__sza"), min(col("__sz2")).as("__szb"),
        max(col("__pos")).as("__lpa"), max(col("__pos2")).as("__lpb"))
      .filter(col("__shared") +
        least(col("__sza") - col("__lpa"), col("__szb") - col("__lpb")) >= alpha)
      .select(col("__id"), col("__id2"))
    cands
  }
}
