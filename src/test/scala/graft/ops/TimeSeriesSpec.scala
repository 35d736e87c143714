package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TimeSeriesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // (key, ts, id, value)
  private def ewma(rows: Seq[(String, Long, Long, Double)], alpha: Double,
                   window: Int): Map[Long, Double] =
    TimeSeries.windowedEwma(rows.toDF("k", "ts", "id", "v"),
        "k", "ts", "id", "v", alpha, window)
      .select("id", "ewma").as[(Long, Double)].collect().toMap

  test("EWMA: first row is the value itself; constant series stays put") {
    val r = ewma(Seq(("u", 1L, 1L, 5.0), ("u", 2L, 2L, 5.0),
      ("u", 3L, 3L, 5.0)), alpha = 0.5, window = 4)
    assert(r == Map(1L -> 5.0, 2L -> 5.0, 3L -> 5.0), r.toString)
  }

  test("EWMA: hand-computed two-step recurrence (alpha .5, dyadic exact)") {
    // x = [0, 1]: ewma_2 = (0*w + 1) / (w + 1) with w = .5 -> 2/3
    val r = ewma(Seq(("u", 1L, 1L, 0.0), ("u", 2L, 2L, 1.0)),
      alpha = 0.5, window = 4)
    assert(r(1L) == 0.0)
    assert(r(2L) == math.rint(2.0 / 3 * 1e6) / 1e6, r.toString)
  }

  test("EWMA: the frame is BOUNDED — history beyond `window` is forgotten") {
    // a huge spike 3 rows back must vanish once it leaves a 2-row frame
    val rows = Seq(("u", 1L, 1L, 1000.0), ("u", 2L, 2L, 2.0),
      ("u", 3L, 3L, 2.0), ("u", 4L, 4L, 2.0))
    val r = ewma(rows, alpha = 0.5, window = 2)
    assert(r(3L) == 2.0 && r(4L) == 2.0, r.toString)
    // while the spike IS in frame it dominates
    assert(r(2L) > 300, r.toString)
  }

  test("EWMA: keys are independent; same-ts ties break on id") {
    val rows = Seq(("a", 1L, 1L, 1.0), ("b", 1L, 2L, 9.0),
      ("a", 1L, 3L, 3.0)) // a has two ts=1 rows: order by (ts, id)
    val r = ewma(rows, alpha = 0.5, window = 4)
    assert(r(2L) == 9.0)
    // key a, row id=3 is SECOND: (1*.5 + 3) / 1.5 = 7/3
    assert(r(3L) == math.rint(7.0 / 3 * 1e6) / 1e6, r.toString)
  }

  private def acf(rows: Seq[(String, Long, Long, Double)], lagK: Int,
                  minPairs: Int): Map[String, (Long, Option[Double])] =
    TimeSeries.lagAutocorr(rows.toDF("k", "ts", "id", "v"),
        "k", "ts", "id", "v", lagK, minPairs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("ACF: perfectly alternating series has lag-1 autocorrelation -1") {
    val rows = (1L to 8L).map(i => ("u", i, i, if (i % 2 == 0) 1.0 else -1.0))
    val r = acf(rows, lagK = 1, minPairs = 3)
    assert(r("u") == ((7L, Some(-1.0))), r.toString)
  }

  test("ACF: linear trend has lag-1 autocorrelation 1; lag-2 likewise") {
    val rows = (1L to 10L).map(i => ("u", i, i, i.toDouble))
    assert(acf(rows, 1, 3)("u")._2.contains(1.0))
    assert(acf(rows, 2, 3)("u")._2.contains(1.0))
  }

  test("ACF: constant series yields NULL (zero variance), not NaN") {
    val rows = (1L to 6L).map(i => ("u", i, i, 7.0))
    val r = acf(rows, 1, 3)
    assert(r("u") == ((5L, None)), r.toString)
  }

  test("ACF: keys under minPairs are dropped") {
    val rows = Seq(("short", 1L, 1L, 1.0), ("short", 2L, 2L, 2.0)) ++
      (1L to 6L).map(i => ("long", i, i + 10, i.toDouble * 2))
    val r = acf(rows, 1, 3)
    assert(!r.contains("short") && r.contains("long"), r.toString)
  }

  private def cusum(rows: Seq[(String, Long, Long, Double)]): Map[String, (Long, Double, Long)] =
    TimeSeries.cusumChangePoint(rows.toDF("k", "ts", "id", "v"),
        "k", "ts", "id", "v")
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("CUSUM: level shift peaks exactly at the last pre-shift event") {
    // 4 events at 0, then 4 at 10: mean 5; S walks -5,-10,-15,-20
    // then back up — peak |S| = 20 at the 4th event
    val rows = (1L to 8L).map(i => ("u", i, i, if (i <= 4) 0.0 else 10.0))
    val r = cusum(rows)
    assert(r("u") == ((8L, 20.0, 4L)), r.toString)
  }

  test("CUSUM: flat series scores 0 at the first event (deterministic tie)") {
    val rows = (1L to 5L).map(i => ("u", i, i, 3.0))
    assert(cusum(rows) == Map("u" -> ((5L, 0.0, 1L))))
  }

  test("CUSUM: keys independent; single-event key scores 0") {
    val rows = Seq(("a", 1L, 1L, 9.0)) ++
      (1L to 6L).map(i => ("b", i, i + 10, if (i <= 3) 1.0 else 5.0))
    val r = cusum(rows)
    assert(r("a") == ((1L, 0.0, 1L)), r.toString)
    // b: mean 3; S = -2,-4,-6,-4,-2,0 — peak 6 at the 3rd event
    assert(r("b") == ((6L, 6.0, 13L)), r.toString)
  }

  test("seasonal profile: hand cells, index against the key mean") {
    // key x: hour 0 mean 2 (n=2), hour 1 mean 6 (n=2) -> overall 4,
    // indices 0.5 / 1.5
    val base = 1704067200000000L // 2024-01-01T00:00Z in micros
    val hour = 3600000000L
    val rows = Seq(
      ("x", base, 1.0), ("x", base + 1, 3.0),
      ("x", base + hour, 5.0), ("x", base + hour + 1, 7.0))
    val df = rows.toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val got = TimeSeries.seasonalProfile(df, "k", "ts", "v")
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(got == Set(("x", 0L, 2L, 2.0, 0.5), ("x", 1L, 2L, 6.0, 1.5)),
      got.toString)
  }

  test("seasonal profile: zero-mean key yields NULL index, not a blow-up") {
    val base = 1704067200000000L
    val df = Seq(("z", base, -1.0), ("z", base + 1, 1.0))
      .toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val row = TimeSeries.seasonalProfile(df, "k", "ts", "v").collect().head
    assert(row.isNullAt(4), row.toString)
  }
}
