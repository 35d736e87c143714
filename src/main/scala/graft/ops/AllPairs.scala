package graft.ops

import org.apache.spark.sql.DataFrame
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
    // happens AFTER the filter, display-only. Token arrays are SORTED
    // (tokenSets), so the intersection size is one native merge scan
    // (no per-pair hash set, no materialized intersection array) and
    // the union size is pure arithmetic |a| + |b| − |a∩b| (both sizes
    // already ride the candidate row) — array_union built and hashed
    // a fresh array per pair for a number arithmetic already knew.
    val setsA = toks.select(col("__id"), col("__toks").as("__ta"))
    val setsB = toks.select(col("__id").as("__id2"), col("__toks").as("__tb"))
    val u = (col("__sza") + col("__szb") - col("__i")).cast("double")
    cands.join(setsA, Seq("__id")).join(setsB, Seq("__id2"))
      .withColumn("__i", graft.functions.TextHashExpressions
        .sorted_intersect_size(col("__ta"), col("__tb")))
      .filter(col("__i").cast("double") >= lit(tau) * u)
      .select(col("__id").as("id_a"), col("__id2").as("id_b"),
        round(col("__i").cast("double") / u, 4).as("jaccard"))
  }

  /** (__id, __toks) distinct-token-HASH sets (ascending array<long>
    * of per-token xxhash64) — the join's tokenization stage, factored
    * out so candidate economics are testable.
    *
    * Round 15: token sets travel as sorted 8-byte hashes end to end —
    * the tokenize scan is the LAST place token strings exist. The
    * verify stage's sort-merge joins were sorting/spilling gigabytes
    * of shingle-string array payload at sf30 (142 s of a 249 s
    * standalone run); hash arrays shrink that payload ~8× and make
    * the merge intersect a primitive compare. Equivalence posture:
    * a cross-token collision (2^-64 per pair of distinct tokens)
    * merges two tokens into one set element CONSISTENTLY on every doc
    * containing either, so both |a∩b| and |a|/|b| shift together;
    * AllPairsSpec pins the output equal to the string-form brute
    * force on every generated corpus.
    */
  private[graft] def tokenSets(docs: DataFrame, idCol: String,
                               textCol: String, shingle: Int): DataFrame = {
    require(shingle >= 1, "shingle >= 1")
    // empty/whitespace-only docs are dropped BEFORE tokenizing:
    // split("") yields [""], a phantom one-token set that would match
    // other empty docs at J = 1. sorted_token_hashes dedups, so the
    // word path needs no array_distinct of its own.
    val tokExpr = graft.functions.TextHashExpressions.sorted_token_hashes(
      if (shingle == 1) split(lower(trim(col(textCol))), "\\s+")
      else Dedup.shingles(col(textCol), shingle))
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
    // (per-doc tokens are distinct, so count(1) IS document frequency).
    // The WHOLE candidate stage runs on xxhash64(token) — 8-byte keys
    // instead of shingle strings in the df aggregate, the per-doc
    // sort, the prefix rows, and the candidate equi-join (round-15:
    // the string-carrying sort+slice was the dominant phase at sf10,
    // 13.4 s of 35 standalone; hashing the df join alone measured
    // ~25% off it, dropping strings from the sort/prefix/join takes
    // the rest). SOUND because the filters may only ever ADD
    // candidates under collision, never lose one: a doc's token reads
    // as its hash for candidate purposes, so two distinct tokens
    // colliding (a) merge their df in the rarest-first heuristic —
    // order stays TOTAL and identical in every doc, which is what the
    // positional bound needs; (b) match in the prefix equi-join — a
    // FALSE candidate the exact verify (true token sets, merge
    // intersect) rejects; (c) overcount `__shared` in the positional
    // bound — the bound is an upper bound on achievable overlap, so
    // overcounting only loosens it. True pairs share true tokens,
    // whose hashes are equal by construction — recall is unconditional.
    // __toks elements ARE the hashes (tokenSets) — no re-hashing
    val tokDf = toks.select(explode(col("__toks")).as("__h"))
      .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
    // per-doc token rank by (df asc, token asc): rarest first,
    // deterministic under ties — the SAME total order in every doc,
    // which is what makes the positional bound below sound. The rank
    // is a PER-DOC array sort (collect, sort_array on (df, tok)
    // structs, slice to the prefix, posexplode), not a corpus-wide
    // window: row_number over (id, df, tok) range-sorted the ENTIRE
    // token stream globally — measured 16 s of the 32 s sf10 total —
    // where only |doc|-sized orders are ever needed, and the slice
    // means only PREFIX rows leave the aggregation.
    //
    // Prefix length |d| - ceil(tau*|d|) + 1. Every pruning ceil below
    // subtracts a 1e-9 slack first: tau is not binary-exact (0.8 parses
    // ABOVE 4/5), so tau*|d| can land an ulp above an exact integer and
    // ceil would over-prune — losing recall. The slack can only loosen
    // a bound (admit a few more candidates), never drop a true pair.
    val prefixLen =
      (col("__sz") - ceil(lit(tau) * col("__sz") - 1e-9) + 1).cast("int")
    val prefixes = toks
      .select(col("__id"), size(col("__toks")).as("__sz"),
        explode(col("__toks")).as("__h"))
      .join(tokDf, Seq("__h"))
      .groupBy(col("__id"))
      .agg(min(col("__sz")).as("__sz"),
        sort_array(collect_list(struct(col("__df"), col("__h"))))
          .as("__st"))
      .select(col("__id"), col("__sz"),
        posexplode(slice(col("__st"), lit(1), prefixLen)))
      .select(col("__id"), col("col.__h").as("__tok"), col("__sz"),
        (col("pos") + 1).as("__pos"))
    // candidates: prefix-hash equi-join + size filter; the groupBy is
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
      // sizes ride along: verify computes |a∪b| = |a| + |b| − |a∩b|
      // from them instead of materializing a union array per pair
      .select(col("__id"), col("__id2"), col("__sza"), col("__szb"))
    cands
  }
}
