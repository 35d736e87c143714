package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lint over [[SparkEntry.oracleSql]]: every SURFACED integer SUM must
  * be BIGINT-cast.
  *
  * Why: DuckDB types SUM(integer) as HUGEINT (int128); the driver's
  * hash compare reads the parquet dumps of both sides, and a HUGEINT
  * column never hash-matches Spark's BIGINT even when the values are
  * identical. The repo convention is `CAST(SUM(...) AS BIGINT)` at
  * every surfaced integer-aggregate site — this failure class cost
  * round 7 two queries (q_corpus_token_budget, q_partitioned_roundtrip)
  * and is otherwise only enforced by hand across 20+ sites.
  *
  * A SUM site is conforming when any of:
  *  - an enclosing call is CAST or ROUND (both fix the surfaced type);
  *  - its argument contains `/` (a double-typed ratio summed);
  *  - the sum itself feeds a division or a comparison (double result /
  *    boolean gate, never a surfaced integer);
  *  - its alias is later re-surfaced through `CAST(alias AS ...)`, or
  *    used only as a GROUP BY key.
  * Sites exempt for reasons the text rules can't see (doubles by
  * construction, intermediates re-aggregated inside a cast) are pinned
  * in an explicit per-query allowlist COUNT — adding a new uncast SUM
  * to one of those queries changes the count and fails the lint.
  */
class OracleSqlLintSpec extends AnyFunSuite {

  /** Blank the CONTENT of single-quoted SQL string literals (keeping
    * length, so indices stay aligned) before any paren scanning — a
    * parenthesis inside a quoted regex ('([^/]+)$', '[(]') would
    * otherwise corrupt the bracket matching and could silently pass
    * an uncast SUM. Handles '' escapes by treating them as two
    * adjacent literals (the blanked result is identical).
    */
  private def stripLiterals(sql: String): String = {
    val out = sql.toCharArray
    var i = 0
    var inLit = false
    while (i < out.length) {
      if (out(i) == '\'') inLit = !inLit
      else if (inLit) out(i) = ' '
      i += 1
    }
    new String(out)
  }

  /** Names of the function calls enclosing position `idx`. */
  private def enclosingStack(sql: String, idx: Int): List[String] = {
    var stack = List.empty[String]
    var i = 0
    while (i < idx) {
      sql.charAt(i) match {
        case '(' =>
          val before = sql.substring(0, i)
          val m = "([A-Za-z_][A-Za-z_0-9]*)\\s*$".r.findFirstMatchIn(before)
          stack = m.map(_.group(1).toLowerCase).getOrElse("") :: stack
        case ')' => if (stack.nonEmpty) stack = stack.tail
        case _ =>
      }
      i += 1
    }
    stack
  }

  private def matchingParen(sql: String, openIdx: Int): Int = {
    var depth = 0
    var i = openIdx
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Non-conforming SUM sites in one SQL string (argument prefixes). */
  private def sumViolations(rawSql: String): Seq[String] = {
    val sql = stripLiterals(rawSql)
    val sumRe = "(?i)\\bsum\\s*\\(".r
    sumRe.findAllMatchIn(sql).toSeq.flatMap { m =>
      val openIdx = m.end - 1
      val stack = enclosingStack(sql, m.start)
      if (stack.contains("cast") || stack.contains("round")) None
      else {
        val close = matchingParen(sql, openIdx)
        val arg = sql.substring(openIdx + 1, close)
        var rest = sql.substring(close + 1)
        // skip a window clause: the OVER (...) rides the sum's type
        "(?i)^\\s*over\\s*\\(".r.findFirstMatchIn(rest).foreach { mo =>
          val c2 = matchingParen(rest, mo.end - 1)
          rest = rest.substring(c2 + 1)
        }
        val aliased = "(?i)^\\s*as\\s+([a-z_][a-z_0-9]*)".r
          .findFirstMatchIn(rest).map(_.group(1))
        val castLater = aliased.exists(a =>
          ("(?i)cast\\s*\\(\\s*" + a + "\\s+as\\s+").r
            .findFirstIn(sql).isDefined)
        val groupKey = aliased.exists(a =>
          ("(?i)group\\s+by\\s+[^)]*\\b" + a + "\\b").r
            .findFirstIn(sql).isDefined)
        val ok =
          arg.contains("/") ||                 // double ratio summed
          rest.matches("(?s)\\s*/.*") ||       // sum feeds a division
          rest.matches("(?s)\\s*[=<>].*") ||   // boolean gate
          castLater || groupKey
        if (ok) None else Some(arg.take(50))
      }
    }
  }

  /** Sites that are exempt for reasons the text rules can't prove,
    * pinned by COUNT per query; every entry is justified here:
    *  - q_corpus_temperature (1): SUM(wt) — wt = sqrt(share), a double
    *    by construction, consumed only as the wt/wsum ratio.
    *  - q_dedup_savings (1): SUM(n_chars) AS b — an intermediate
    *    re-aggregated inside CAST(SUM(b - kb) AS BIGINT).
    *  - q_eval_kappa (2) / q_eval_langid (3): SUM(n) marginal counts,
    *    consumed only inside CAST(... AS DOUBLE) products.
    *  - q_hybrid_search (5) / q_rag_retrieve (5): hash-sign embedding
    *    components and dot products, consumed in double similarity
    *    arithmetic / ORDER BY, never surfaced as integers.
    *  - q_validate (1): COALESCE(SUM(n), 0) compared `= 0` through a
    *    subquery paren the comparison rule can't see across.
    *  - q_stat_mi (3): SUM(nxy) marginal/total sums — nxy is
    *    CAST(COUNT(*) AS DOUBLE) by construction, consumed only in
    *    probability ratios.
    *  - q_corpus_card (1): SUM(n) AS al — n is CAST(COUNT(*) AS
    *    DOUBLE), consumed only in the top/al share ratio.
    *  - q_emb_pca (26): every SUM in the unrolled power iteration is
    *    pure double linear algebra (x is CAST(... AS DOUBLE) at the
    *    unnest; v/w/m/c derive from it); nothing integer surfaces —
    *    the count changes with `iters`, which is the point: touching
    *    the recurrence forces a re-audit here.
    *  - q_emb_pca_top3 (86) / q_emb_abtt (60): the same recurrence
    *    unrolled per deflated component (plus the deflation dots and
    *    the ABTT projection/correction sums) — all double linear
    *    algebra over the same CAST(... AS DOUBLE) unnest.
    *  - q_graph_hits (12): SUM(h.s)/SUM(a.s) matvecs and SUM(v*v)
    *    norms per unrolled half-step — s/v are doubles by the 8dp
    *    floor-quantized construction; nothing integer surfaces.
    *  - q_pagerank_weighted (5): SUM(CAST(qty AS DOUBLE)) edge
    *    weights, the COALESCE'd out-weight sum, and 3 dangling-mass
    *    SUM(rank) — all doubles by construction, consumed inside the
    *    rounded recurrence, never surfaced as integers.
    *  - q_ts_cusum (1): SUM(value - mu) cumulative window — doubles,
    *    floor-quantized downstream.
    *  - q_ts_seasonal (2): SUM(value) (double) and SUM(n_events)
    *    consumed only as the mean's divisor, never surfaced.
    */
  private val allowedCounts = Map(
    "q_corpus_temperature" -> 1,
    "q_dedup_savings" -> 1,
    "q_eval_kappa" -> 2,
    "q_eval_langid" -> 3,
    "q_hybrid_search" -> 5,
    "q_rag_retrieve" -> 5,
    "q_validate" -> 1,
    "q_stat_mi" -> 3,
    "q_corpus_card" -> 1,
    "q_emb_pca" -> 26,
    "q_emb_pca_top3" -> 86,
    "q_emb_abtt" -> 60,
    "q_graph_hits" -> 12,
    "q_pagerank_weighted" -> 5,
    // SUM(abs_dev) OVER — abs_dev is a 6dp-quantized double by
    // construction; consumed inside floor(...)/1e6/2, never an integer
    "q_stat_benford" -> 1,
    "q_ts_cusum" -> 1,
    "q_ts_seasonal" -> 2)

  test("every surfaced integer SUM in oracle SQL is BIGINT-cast") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val v = sumViolations(sql)
        val allowed = allowedCounts.getOrElse(name, 0)
        if (v.size == allowed) None
        else Some(s"$name: ${v.size} non-conforming SUM sites " +
          s"(allowlist pins $allowed): ${v.mkString(" | ")}")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("the lint catches an uncast surfaced SUM (round-7 failure class)") {
    // exactly the two shapes that cost round 7 its green
    assert(sumViolations(
      "SELECT source, SUM(n_chars) AS sum_chars FROM documents GROUP BY source")
      .nonEmpty)
    assert(sumViolations(
      "WITH c AS (SELECT SUM(n_tokens) OVER (PARTITION BY source ORDER BY r) " +
        "AS cum_tokens FROM tk) SELECT cum_tokens FROM c").nonEmpty)
    // and accepts the fixed forms
    assert(sumViolations(
      "SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sum_chars " +
        "FROM documents GROUP BY source").isEmpty)
    assert(sumViolations(
      "WITH c AS (SELECT CAST(SUM(n_tokens) OVER (PARTITION BY source " +
        "ORDER BY r) AS BIGINT) AS cum_tokens FROM tk) " +
        "SELECT cum_tokens FROM c").isEmpty)
  }

  test("parens inside string literals cannot corrupt the scan") {
    // the unbalanced '(' in the regex literal would desync
    // matchingParen and hide the uncast SUM without stripLiterals
    assert(sumViolations(
      "SELECT split_part(name, '(', 1) AS g, SUM(n) AS total " +
        "FROM t GROUP BY g").nonEmpty)
    // and a cast site with a parenthesized literal still conforms
    assert(sumViolations(
      "SELECT regexp_extract(p, '([^/]+)$', 1) AS f, " +
        "CAST(SUM(n) AS BIGINT) AS total FROM t GROUP BY f").isEmpty)
  }
}
