package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DriftSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def cats(xs: (String, Int)*) =
    xs.flatMap { case (c, n) => Seq.fill(n)(c) }.toDF("c")

  test("psiCategorical: identical distributions score 0") {
    val d = cats("a" -> 30, "b" -> 70)
    val Array(r) = Drift.psiCategorical(d, d, "c").collect()
    assert(r.getLong(0) == 2 && r.getDouble(1) == 0.0, r.toString)
  }

  test("psiCategorical: hand-computed shift, one-sided category finite") {
    // ref: a .5 b .5; cur: a .25 b .25 c .5
    val ref = cats("a" -> 2, "b" -> 2)
    val cur = cats("a" -> 1, "b" -> 1, "c" -> 2)
    val Array(r) = Drift.psiCategorical(ref, cur, "c").collect()
    val expected =
      2 * (0.25 - 0.5) * math.log(0.25 / 0.5) +
        (0.5 - 1e-6) * math.log(0.5 / 1e-6)
    assert(r.getLong(0) == 3, r.toString)
    assert(math.abs(r.getDouble(1) - expected) < 1e-3, r.toString)
  }

  test("chiSquare: identical sides 0, hand-computed 2x2 statistic") {
    val same = cats("a" -> 10, "b" -> 20)
    assert(Drift.chiSquare(same, same, "c").collect()(0).getDouble(2) == 0.0)
    // ref: 30 a, 10 b; cur: 10 a, 30 b -> classic 2x2, chi2 = 20
    val ref = cats("a" -> 30, "b" -> 10)
    val cur = cats("a" -> 10, "b" -> 30)
    val Array(r) = Drift.chiSquare(ref, cur, "c").collect()
    assert(r.getLong(0) == 2 && r.getLong(1) == 1, r.toString)
    assert(r.getDouble(2) == 20.0, r.toString)
  }

  test("jsDivergence: 0 on identical, 1 on disjoint, symmetric") {
    val x = cats("a" -> 5, "b" -> 5)
    val y = cats("c" -> 3, "d" -> 7)
    assert(Drift.jsDivergence(x, x, "c").collect()(0).getDouble(1) == 0.0)
    assert(Drift.jsDivergence(x, y, "c").collect()(0).getDouble(1) == 1.0)
    val xy = Drift.jsDivergence(x, y.union(x), "c").collect()(0).getDouble(1)
    val yx = Drift.jsDivergence(y.union(x), x, "c").collect()(0).getDouble(1)
    assert(xy == yx && xy > 0 && xy < 1, s"$xy vs $yx")
  }

  test("psiBinned: ref deciles, terms sum to ~0 on identical sides") {
    val d = (1 to 1000).map(_.toDouble).toDF("v")
    val rows = Drift.psiBinned(d, d, "v", k = 10).collect()
    assert(rows.length == 10, rows.length.toString)
    assert(rows.forall(r => r.getLong(1) == 100 && r.getLong(2) == 100))
    assert(math.abs(rows.map(_.getDouble(3)).sum) < 1e-9)
  }

  test("psiBinned: a shifted population loads the tail bins") {
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    val cur = (501 to 1500).map(_.toDouble).toDF("v")
    val rows = Drift.psiBinned(ref, cur, "v", k = 10).collect()
    val psi = rows.map(_.getDouble(3)).sum
    assert(psi > 0.25, s"psi=$psi should flag a half-range shift")
    // the top ref bin (>900) now holds 600 of cur's 1000 rows
    val top = rows.find(_.getLong(0) == 10).get
    assert(top.getLong(2) == 600, top.toString)
  }

  test("ksStatistic: 0 on identical, 1 on disjoint, hand value on shift") {
    val a = (1 to 100).map(_.toDouble).toDF("v")
    val b = (101 to 200).map(_.toDouble).toDF("v")
    assert(Drift.ksStatistic(a, a, "v").collect()(0).getDouble(2) == 0.0)
    val Array(d) = Drift.ksStatistic(a, b, "v").collect()
    assert(d.getLong(0) == 100 && d.getLong(1) == 100 &&
      d.getDouble(2) == 1.0, d.toString)
    // half-overlap: F_a(100) = 1, F_b(100) = 0.5 -> D = 0.5
    val c = (51 to 150).map(_.toDouble).toDF("v")
    assert(Drift.ksStatistic(a, c, "v").collect()(0).getDouble(2) == 0.5)
  }

  test("ksStatistic: ties collapse per distinct value") {
    val a = Seq(1.0, 1.0, 2.0, 2.0).toDF("v")
    val b = Seq(1.0, 2.0, 2.0, 2.0).toDF("v")
    // F_a(1)=.5 F_b(1)=.25 -> .25; F(2)=1 both -> D = .25
    assert(Drift.ksStatistic(a, b, "v").collect()(0).getDouble(2) == 0.25)
  }
}
