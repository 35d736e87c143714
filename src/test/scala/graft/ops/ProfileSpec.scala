package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ProfileSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("columnProfile audits nulls, cardinality, and ranges per column") {
    val df = Seq(
      (Some("b"), Some(3L)), (Some("a"), Some(1L)),
      (None, Some(3L)), (Some("c"), None))
      .toDF("s", "n")
    val prof = Profile.columnProfile(df, Seq("s", "n"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(prof("s") == (("s", 1L, 3L, "a", "c")))
    assert(prof("n") == (("n", 1L, 2L, "1", "3")))
  }

  test("columnProfile approx mode keeps the schema and lands near exact") {
    val df = (1 to 1000).map(i => (i % 97).toLong).toDF("v")
    val Array(row) = Profile.columnProfile(df, Seq("v"), approx = true)
      .as[(String, Long, Long, String, String)].collect()
    assert(row._1 == "v" && row._2 == 0L)
    assert(math.abs(row._3 - 97L) <= 5, s"approx ndv ${row._3}")
    assert(row._4 == "0" && row._5 == "96")
  }

  test("heavyHitters finds every value above the support threshold") {
    // "hot" is 30% of the stream, "warm" 12%; the tail is all-distinct
    val vals = Seq.fill(300)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 580).map(i => s"cold$i")
    val df = vals.toDF("v")
    val cand = Profile.heavyHitters(df, "v", support = 0.1)
      .as[String].collect().toSet
    assert(cand.contains("hot") && cand.contains("warm"),
      s"guaranteed hitters missing from $cand")
  }

  test("histogram buckets with exact integer arithmetic") {
    // values 0..99, 10 buckets over width 100 -> bucket = v div 10
    val df = (0L to 99L).toDF("v")
    val rows = Profile.histogram(df, "v", nBuckets = 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 10)
    rows.zipWithIndex.foreach { case ((b, n, lo, hi), i) =>
      assert(b == i && n == 10L && lo == i * 10L && hi == i * 10L + 9L,
        s"bucket $i got ($b, $n, $lo, $hi)")
    }
  }

  test("histogram max value lands in the last bucket, not one past it") {
    val df = Seq(5L, 7L, 20L).toDF("v")
    val rows = Profile.histogram(df, "v", nBuckets = 4)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // width = 16, buckets: (5-5)*4/16=0, (7-5)*4/16=0, (20-5)*4/16=3
    assert(rows.toSeq == Seq((0L, 2L, 5L, 7L), (3L, 1L, 20L, 20L)))
  }

  test("histogram degenerate constant column yields one bucket") {
    val df = Seq(42L, 42L, 42L).toDF("v")
    val rows = Profile.histogram(df, "v", nBuckets = 8)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.toSeq == Seq((0L, 3L, 42L, 42L)))
  }

  test("quantileContract: exact percentiles interpolate, sketch bound holds") {
    // 1..101 per group: p50 = 51 exactly, p95 = 96 exactly
    val df = (for (g <- Seq("x", "y"); v <- 1 to 101) yield (g, v)).toDF("g", "v")
    val rows = Profile.quantileContract(df, "g", "v", Seq(0.5, 0.95))
      .as[(String, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("x", "y"))
    rows.foreach { case (_, p50, p95, ok) =>
      assert(p50 == 51.0 && p95 == 96.0 && ok)
    }
  }

  test("quantileContract interpolates between values like quantile_cont") {
    // values 1,2,3,4: p50 = 2.5 under linear interpolation
    val df = Seq(("g", 1), ("g", 2), ("g", 3), ("g", 4)).toDF("g", "v")
    val Array(row) = Profile.quantileContract(df, "g", "v", Seq(0.5))
      .as[(String, Double, Boolean)].collect()
    assert(row._2 == 2.5 && row._3)
  }

  test("equiDepthBins splits a skewed column into near-equal counts") {
    // heavy skew: 900 small values + 100 large — equi-width would put
    // ~90% in one bucket; equi-depth must keep every bin near n/k
    val rows = ((1 to 900).map(_.toDouble / 100) ++
      (1 to 100).map(i => 1000.0 + i)).map(("g", _))
    val bins = Profile.equiDepthBins(rows.toDF("g", "v"), "v", k = 4)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(bins.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    bins.foreach { case (b, n, _, _) =>
      assert(n >= 200 && n <= 300, s"bin $b holds $n of 1000") }
    // bins are ordered and non-overlapping
    bins.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"bins overlap: $a vs $b") }
  }

  test("equiDepthBins ignores nulls and validates k") {
    val df = Seq(Some(1.0), None, Some(2.0), Some(3.0), Some(4.0))
      .toDF("v")
    val total = Profile.equiDepthBins(df, "v", 2)
      .agg(org.apache.spark.sql.functions.sum("n_rows")).as[Long].head()
    assert(total == 4L)
    intercept[IllegalArgumentException](Profile.equiDepthBins(df, "v", 1))
  }

  test("groupCorr matches hand-computed Pearson; degenerate groups are NULL") {
    val rows = Seq(
      ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),   // perfect +1
      ("b", 1.0, 3.0), ("b", 2.0, 1.0), ("b", 3.0, -1.0),  // perfect -1
      ("c", 5.0, 1.0), ("c", 5.0, 9.0))                    // zero variance in x
    val got = Profile.groupCorr(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got("a").contains(1.0) && got("b").contains(-1.0), got.toString)
    assert(got("c").isEmpty, "zero-variance group must be NULL, not NaN")
  }

  test("outliers flags far values per group, skips zero-variance groups") {
    // group a: 20 values at 1.0 plus one at 100 — huge z for the spike;
    // group b: constant (sigma 0) — must produce nothing even though
    // a z-division would explode
    val rows = (1 to 20).map(i => ("a", i.toLong, 1.0)) ++
      Seq(("a", 99L, 100.0)) ++ (1 to 5).map(i => ("b", 200L + i, 7.0))
    val out = Profile.outliers(rows.toDF("g", "id", "v"), "g", "v", 2.5)
      .select("id", "z").as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(99L), out.toString)
    assert(out(99L) > 4.0, s"spike z should be extreme: ${out(99L)}")
  }

  test("outliers threshold is strict and uses population stddev") {
    // values 0,0,0,0,10: mu=2, sigma_pop=4 -> z(10)=2.0 exactly; at
    // threshold 2.0 (strict >) nothing flags, at 1.9 the spike does
    val df = (Seq.fill(4)(0.0) :+ 10.0).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("g", "id", "v")
    assert(Profile.outliers(df, "g", "v", 2.0).count() == 0)
    val hits = Profile.outliers(df, "g", "v", 1.9)
      .select("id").as[Long].collect().toSeq
    assert(hits == Seq(4L))
  }
  test("winsorize clamps into the per-group quantile band") {
    val df = (1 to 100).map(i => ("g", i.toDouble))
      .toDF("grp", "v")
    val out = Profile.winsorize(df, "grp", "v", 0.05, 0.95)
    // p5 of 1..100 = 5.95, p95 = 95.05 (linear interpolation)
    val clamped = out.filter($"clamped")
      .select("v", "value_w").as[(Double, Double)].collect().toMap
    assert(clamped.keySet == (1 to 5).map(_.toDouble).toSet ++
      (96 to 100).map(_.toDouble).toSet, clamped.toString)
    assert(clamped(1.0) == 5.95 && clamped(100.0) == 95.05, clamped.toString)
    // untouched rows keep their value and clamped = false
    assert(out.filter(!$"clamped").count() == 90)
    intercept[IllegalArgumentException](
      Profile.winsorize(df, "grp", "v", 0.9, 0.1))
  }

  test("winsorize: NULL values stay NULL, never imputed at the cutoff") {
    val df = ((1 to 10).map(i => ("g", Option(i.toDouble))) :+
      (("g", Option.empty[Double]))).toDF("grp", "v")
    val out = Profile.winsorize(df, "grp", "v", 0.1, 0.9)
    val nullRow = out.filter($"v".isNull).collect()
    assert(nullRow.length == 1)
    // greatest/least skip NULLs: an unguarded clamp would return lo
    assert(nullRow(0).isNullAt(out.columns.indexOf("value_w")),
      nullRow(0).toString)
    assert(nullRow(0).getBoolean(out.columns.indexOf("clamped")) == false)
  }

  test("robustOutliers: median/MAD immune where mean/stddev saturates") {
    // 20 values at 10 +/- small noise, one at 1000: the spike's
    // modified z is ~1100 while the worst inlier sits near 1.2 —
    // with mean/stddev the spike inflates sigma to ~216 and its own
    // z to only ~4.4, barely over the line
    val rows = ((1 to 10).map(i => ("g", 10.0 - i * 0.1)) ++
      (1 to 10).map(i => ("g", 10.0 + i * 0.1)) :+ (("g", 1000.0)))
      .toDF("grp", "v")
    val got = Profile.robustOutliers(rows, "grp", "v", threshold = 3.5)
      .select("v", "modified_z").as[(Double, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1000.0), got.mkString(","))
  }

  test("robustOutliers: zero-MAD groups flag nothing; nulls drop") {
    val rows = (Seq.fill(5)(("a", Option(1.0))) :+ (("a", Option(99.0))) :+
      (("a", Option.empty[Double]))).toDF("grp", "v")
    // over half the values identical -> MAD 0 -> undefined score
    assert(Profile.robustOutliers(rows, "grp", "v").isEmpty)
  }

  test("joinProfile: exact join size without the join; hot keys surface") {
    val l = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")          // key 1 hot x3
    val r = Seq(1L, 1L, 2L, 4L).toDF("k2")
    val Array(p) = Profile.joinProfile(l, "k", r, "k2").collect()
    // shared keys {1, 2}: join rows = 3*2 + 1*1 = 7
    assert(p.getLong(0) == 5 && p.getLong(1) == 4, p.toString)
    assert(p.getLong(2) == 3 && p.getLong(3) == 3, p.toString)
    assert(p.getLong(4) == 2 && p.getLong(5) == 7, p.toString)
    assert(p.getLong(6) == 3 && p.getLong(7) == 2, p.toString)
    // prediction equals the real join's count
    assert(l.join(r, col("k") === col("k2")).count() == 7)
    // disjoint keys: zero shared, zero rows (COALESCE, not NULL)
    val Array(z) = Profile.joinProfile(l, "k",
      Seq(9L).toDF("k2"), "k2").collect()
    assert(z.getLong(4) == 0 && z.getLong(5) == 0, z.toString)
  }

  test("giniConcentration: 0 on uniform keys, hand value on skew, ~1 on a hog") {
    val uniform = (1 to 40).map(i => (i % 4).toString).toDF("k")
    val Array(u) = Profile.giniConcentration(uniform, "k").collect()
    assert(u.getLong(0) == 4 && u.getLong(1) == 40 && u.getDouble(2) == 0.0)
    // counts (1, 3): G = ((2*1-3)*1 + (2*2-3)*3) / (2 * 4) = 2/8
    val skew = (Seq("a") ++ Seq.fill(3)("b")).toDF("k")
    assert(Profile.giniConcentration(skew, "k").collect()(0)
      .getDouble(2) == 0.25)
    // one key owns 1000 of 1009 rows -> Gini approaches 1
    val hog = (Seq.fill(1000)("h") ++ (1 to 9).map(_.toString)).toDF("k")
    val g = Profile.giniConcentration(hog, "k").collect()(0).getDouble(2)
    assert(g > 0.85, g.toString)
  }
}
