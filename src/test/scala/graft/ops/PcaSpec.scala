package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PcaSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def run(vecs: Seq[Array[Float]], dim: Int, iters: Int = 4) =
    Pca.dominantComponent(vecs.map(Tuple1(_)).toDF("embedding"),
        "embedding", dim, iters)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)

  test("one-dimensional data: the axis is recovered, ratio 1") {
    // all variance along e1 (0-indexed dim 1), mean zero
    val vecs = Seq(-2f, -1f, 1f, 2f).map(t =>
      Array(0f, t, 0f, 0f))
    val r = run(vecs, dim = 4)
    val loadings = r.map(_._2)
    assert(math.abs(loadings(1)) == 1.0, loadings.toSeq.toString)
    assert(loadings(0) == 0.0 && loadings(2) == 0.0 && loadings(3) == 0.0)
    // var_pop along the axis = (4+1+1+4)/4 = 2.5; all variance explained
    assert(r.head._3 == 2.5, s"eigenvalue ${r.head._3}")
    assert(r.head._4 == 1.0, s"explained ${r.head._4}")
  }

  test("nonzero mean is centered out: a constant offset changes nothing") {
    val base = Seq(-2f, -1f, 1f, 2f).map(t => Array(0f, t, 0f, 0f))
    val shifted = base.map(v => v.zipWithIndex.map {
      case (x, i) => x + (if (i == 2) 7f else 0f) })
    assert(run(base, 4).toSeq == run(shifted, 4).toSeq)
  }

  test("dominant of two axes wins; loadings are unit norm") {
    // dim 0 spread +-3 (var 9), dim 2 spread +-1 (var 1)
    val vecs = Seq(
      Array(3f, 0f, 1f, 0f), Array(-3f, 0f, -1f, 0f),
      Array(3f, 0f, -1f, 0f), Array(-3f, 0f, 1f, 0f))
    // 8 iterations: the e2 residual decays as (1/9)^t — at t=4 it
    // would still sit at ~1.5e-4 and the eigenvalue at 8.99998
    val r = run(vecs, 4, iters = 8)
    val l = r.map(_._2)
    assert(math.abs(l(0)) == 1.0, l.toSeq.toString)
    assert(math.abs(l(2)) < 1e-4, l.toSeq.toString)
    assert(math.abs(math.sqrt(l.map(x => x * x).sum) - 1.0) < 1e-5)
    // eigenvalue 9 of total 10
    assert(r.head._3 == 9.0 && r.head._4 == 0.9, r.head.toString)
  }

  test("deterministic across runs; degenerate constant input rejected") {
    val vecs = (1 to 20).map(i =>
      Array(i.toFloat, (i % 3).toFloat, (i % 7).toFloat, 1f))
    assert(run(vecs, 4).toSeq == run(vecs, 4).toSeq)
    intercept[Exception] {
      run(Seq.fill(3)(Array(1f, 1f, 1f, 1f)), 4)
    }
  }
}
