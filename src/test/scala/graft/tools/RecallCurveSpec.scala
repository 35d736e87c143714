package graft.tools

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Ivf

/** Pins docs/RECALL.md's headline measurements to the build: the doc's
  * tables were produced by `RecallCurve.main` on /root/testdata/sf0.1,
  * and these tests recompute the load-bearing grid points so the
  * documented numbers fail loudly if the operators (hyperplane seeds,
  * init, ranking tie-breaks) drift.
  *
  * SRP-LSH is bit-for-bit deterministic → exact equality. IVF's Lloyd
  * means average doubles in shuffle order → a narrow tolerance band.
  */
class RecallCurveSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.1"
  private lazy val exact = {
    val e = RecallCurve.exactTop5(spark, dir).cache()
    e.count()
    Some(e)
  }

  test("SRP-LSH recall@5 matches the documented grid points exactly") {
    // the q_sim_lsh_topk contract cell and its half-tables neighbor
    assert(RecallCurve.lshRecall(spark, dir, nBits = 4, nTables = 32,
      exact = exact) == 1.0)
    assert(RecallCurve.lshRecall(spark, dir, nBits = 4, nTables = 16,
      exact = exact) == 0.896)
    // curve shape: one more bit halves-ish recall at fixed tables
    assert(RecallCurve.lshRecall(spark, dir, nBits = 6, nTables = 16,
      exact = exact) == 0.612)
  }

  test("LSH candidate-fraction matches the documented cost column") {
    assert(RecallCurve.lshCandidateFrac(spark, dir, nBits = 4, nTables = 16)
      == 0.638)
    assert(RecallCurve.lshCandidateFrac(spark, dir, nBits = 8, nTables = 4)
      == 0.017)
  }

  test("planted near-dup pair recall at the contract config is the documented 0.998") {
    assert(RecallCurve.nearDupPairRecall(spark, dir, nBits = 4, nTables = 32)
      == 0.998)
  }

  test("IVF recall@5 at the contract point stays in the documented band") {
    val idx = Ivf.build(RecallCurve.emb(spark, dir), k = 16)
    val r12 = RecallCurve.ivfRecall(spark, dir, idx, nProbe = 12, exact = exact)
    assert(math.abs(r12 - 0.944) <= 0.05, s"documented 0.944, got $r12")
    val r8 = RecallCurve.ivfRecall(spark, dir, idx, nProbe = 8, exact = exact)
    assert(math.abs(r8 - 0.816) <= 0.05, s"documented 0.816, got $r8")
    assert(r12 >= r8, "recall must be monotone in nProbe")
  }

  test("PQ recall@5 matches the documented grid points exactly") {
    // deterministic end to end (md5-ordered training sample, driver
    // Lloyd, id tie-breaks) -> exact pins like SRP-LSH
    assert(RecallCurve.pqRecall(spark, dir, m = 16, shortlist = 80,
      exact = exact) == 0.856)
    assert(RecallCurve.pqRecall(spark, dir, m = 8, shortlist = 80,
      exact = exact) == 0.576)
  }

  test("IVF-PQ recall@5 at the contract point stays in the documented band") {
    // Ivf.build's Lloyd means average in shuffle order -> narrow band
    val r12 = RecallCurve.ivfPqRecall(spark, dir, kCells = 16, nProbe = 12,
      exact = exact)
    assert(math.abs(r12 - 0.84) <= 0.05, s"documented 0.84, got $r12")
    val r8 = RecallCurve.ivfPqRecall(spark, dir, kCells = 16, nProbe = 8,
      exact = exact)
    assert(r12 >= r8, "recall must be monotone in nProbe")
  }

  test("SemDeDup pair recall rises with multi-assign m as documented") {
    val idx = Ivf.build(
      RecallCurve.emb(spark, dir)
        .filter(col("vec_id") < graft.SparkEntry.EmbAuditCap), k = 16)
    val m1 = RecallCurve.pairRecall(spark, dir, idx, m = 1)
    val m3 = RecallCurve.pairRecall(spark, dir, idx, m = 3)
    assert(math.abs(m1 - 0.264) <= 0.05, s"documented 0.264, got $m1")
    assert(math.abs(m3 - 0.846) <= 0.05, s"documented 0.846, got $m3")
    assert(m3 > m1 + 0.3, "multi-assignment must buy substantial pair recall")
  }
}
