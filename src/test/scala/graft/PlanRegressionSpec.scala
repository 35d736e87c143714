package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the scale properties COVERAGE.md
  * claims (pushdown, partial aggregation, window group limits,
  * broadcast placement) asserted against the actual physical plans, so
  * a future refactor that silently de-optimizes a path fails here
  * rather than in a 100 TB run.
  */
class PlanRegressionSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("dynamic predicates reach the parquet scan (P6)") {
    val p = plan("q_p6_dynamic_where")
    assert(p.contains("PushedFilters: [IsNotNull("), p)
    assert(p.contains("GreaterThanOrEqual(p_size,10)"), p)
  }

  test("scan prunes to referenced columns only (Agg1)") {
    val p = plan("q_agg1_pricing_summary")
    assert(p.contains("ReadSchema: struct<l_quantity:double"), p)
    assert(!p.contains("l_orderkey"), "unreferenced columns must not be read")
  }

  test("aggregation is partial/final (map-side combine)") {
    val p = plan("q_agg1_pricing_summary")
    assert(p.contains("partial_sum"), p)
  }

  test("window dedup uses partial WindowGroupLimit before the shuffle (W1)") {
    val p = plan("q_w1_dedup_latest")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("decorrelated aggregate broadcasts to the fact side (J1)") {
    val p = plan("q_j1_correlated_max")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("similarity top-k broadcasts the probe side and keeps codegen dot (topk)") {
    val p = plan("q_sim_topk")
    assert(p.contains("vector_dot"), p)
    assert(p.contains("Broadcast"), p)
  }

  test("as-of join plans exactly one exchange for the union-window (J7)") {
    val p = plan("q_j7_asof_join")
    // one hash exchange for the window partitioning + the final sort's
    // range exchange; crucially no join-related exchanges or nested loops
    assert(!p.contains("NestedLoop"), p)
    val hashExchanges = "hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges <= 2, s"expected at most 2 hash exchanges, plan:\n$p")
  }
}
