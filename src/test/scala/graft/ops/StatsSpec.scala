package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // --- groupedOls ---

  test("OLS recovers an exact line: slope/intercept exact, r2 = 1") {
    val df = Seq(("g", 1.0, 5.0), ("g", 2.0, 7.0), ("g", 3.0, 9.0))
      .toDF("k", "x", "y")
    val r = Stats.groupedOls(df, "k", "x", "y")
      .as[(String, Long, Double, Double, Double)].collect().head
    assert(r == (("g", 3L, 2.0, 3.0, 1.0)), r.toString)
  }

  test("OLS: zero x-variance yields NULL slope, NULL pairs excluded") {
    val df = Seq(("v", Some(2.0), Some(1.0)), ("v", Some(2.0), Some(5.0)),
        ("v", None, Some(9.0)), ("v", Some(2.0), None))
      .toDF("k", "x", "y")
    val row = Stats.groupedOls(df, "k", "x", "y").collect().head
    assert(row.getLong(1) == 2L, row.toString) // only complete pairs
    assert(row.isNullAt(2), "vertical fit must be NULL, not NaN")
  }

  test("OLS groups independently: two groups, two fits") {
    val df = Seq(("a", 0.0, 0.0), ("a", 1.0, 2.0),
        ("b", 0.0, 10.0), ("b", 1.0, 9.0)).toDF("k", "x", "y")
    val m = Stats.groupedOls(df, "k", "x", "y").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m == Map("a" -> 2.0, "b" -> -1.0), m.toString)
  }

  // --- mutualInformation ---

  test("MI of independent columns is 0, NMI 0") {
    // uniform 2x2 product distribution: every cell n=1
    val df = Seq(("x1", "y1"), ("x1", "y2"), ("x2", "y1"), ("x2", "y2"))
      .toDF("x", "y")
    val r = Stats.mutualInformation(df, "x", "y").collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 0.0, s"MI: ${r.getDouble(1)}")
    assert(r.getDouble(4) == 0.0, s"NMI: ${r.getDouble(4)}")
  }

  test("MI of a deterministic relation equals the entropy; NMI 1") {
    // y = f(x), both uniform over 2 levels: MI = H = ln 2
    val df = Seq(("a", "A"), ("a", "A"), ("b", "B"), ("b", "B"))
      .toDF("x", "y")
    val r = Stats.mutualInformation(df, "x", "y").collect().head
    val ln2 = math.rint(math.log(2) * 1e6) / 1e6
    assert(r.getDouble(1) == ln2, s"MI: ${r.getDouble(1)} vs $ln2")
    assert(r.getDouble(2) == ln2 && r.getDouble(3) == ln2)
    assert(r.getDouble(4) == 1.0, s"NMI: ${r.getDouble(4)}")
  }

  test("MI: NULL categories stratify as their own level") {
    val df = Seq((Some("a"), "A"), (None, "B"), (Some("a"), "A"),
      (None, "B")).toDF("x", "y")
    val r = Stats.mutualInformation(df, "x", "y").collect().head
    // null-vs-a perfectly determines y: MI = ln 2
    assert(r.getDouble(4) == 1.0, r.toString)
  }

  // --- welchTTest ---

  test("Welch t: identical groups give t = 0, symmetric sign flip") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
        ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val r = Stats.welchTTest(df, "g", "v", "a", "b").collect().head
    assert(r.getDouble(4) == 0.0, r.toString)
    // equal n and equal variance: df = n_a + n_b - 2
    assert(r.getDouble(5) == 4.0, r.toString)
  }

  test("Welch t: hand-computed unequal-variance example") {
    // a: {1, 3} mean 2, var 2, n 2; b: {10} -> n_b < 2: NULL t/df
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("g", "v")
    val r = Stats.welchTTest(df, "g", "v", "a", "b").collect().head
    assert(r.isNullAt(4) && r.isNullAt(5), r.toString)
    // a: {1,3} vs b: {4,8}: t = (2-6)/sqrt(1 + 4) = -1.7889
    val df2 = Seq(("a", 1.0), ("a", 3.0), ("b", 4.0), ("b", 8.0))
      .toDF("g", "v")
    val r2 = Stats.welchTTest(df2, "g", "v", "a", "b").collect().head
    assert(r2.getDouble(4) == math.rint(-4.0 / math.sqrt(5) * 1e4) / 1e4,
      r2.toString)
    // df = 25 / (1 + 16) = 1.4706
    assert(r2.getDouble(5) == math.rint(25.0 / 17 * 1e4) / 1e4, r2.toString)
  }

  test("Welch t: rows outside the two groups and NULL values ignored") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
        ("c", Some(99.0)), ("b", Some(4.0)), ("b", Some(8.0)))
      .toDF("g", "v")
    val r = Stats.welchTTest(df, "g", "v", "a", "b").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, r.toString)
  }

  test("benfordScreen: digit extraction, scaffold zeros, TVD, exclusions") {
    // group 'x': 5 values leading 1, 3 leading 2, 2 leading 9 — from
    // magnitudes spanning decades plus sub-1 values and decimals
    val vals = Seq(1.5, 0.013, 100.0, 1999.0, 0.1, // digit 1 x5
        2.5, 0.29, 234.0,                          // digit 2 x3
        0.0009, 9.1)                               // digit 9 x2
    val df = (vals.map(("x", _)) ++
        // excluded: non-positive, AND non-finite — NaN passes > 0
        // under Spark's NaN-greatest ordering and Infinity prints no
        // [1-9] digit; neither may inflate the group total __n
        Seq(("x", -5.0), ("x", 0.0),
          ("x", Double.NaN), ("x", Double.PositiveInfinity)) ++
        Seq(("y", 1.0)))
      .toDF("g", "v")
    val out = Stats.benfordScreen(df, "g", "v")
      .as[(String, Int, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(out.size == 18, out.toString) // 2 groups x 9 digits
    val x = out.filter(_._1 == "x").sortBy(_._2)
    assert(x.map(_._3) == Seq(5L, 3L, 0L, 0L, 0L, 0L, 0L, 0L, 2L),
      x.toString)
    assert(x.head._4 == 0.5, x.head.toString) // share of digit 1
    // expected shares are the pinned Benford constants
    assert(x.head._5 == 0.301030 && x(8)._5 == 0.045757, x.toString)
    // TVD repeated on every row of the group, = half the dev sum
    val devSum = x.map(_._6).sum
    assert(x.forall(r => math.abs(r._7 - devSum / 2) < 1e-6), x.toString)
    // a group with one value: share 1 on its digit, zeros elsewhere
    val y = out.filter(_._1 == "y").sortBy(_._2)
    assert(y.head._4 == 1.0 && y.map(_._3).sum == 1L, y.toString)
  }
}
