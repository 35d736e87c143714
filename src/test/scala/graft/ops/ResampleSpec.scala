package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ResampleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(hour: Int, min: Int = 0) =
    new Timestamp((hour * 3600L + min * 60L) * 1000L)

  test("fillGaps materializes missing buckets and forward-fills") {
    val rows = Seq(
      (1L, ts(0), 2.0), (1L, ts(0, 30), 4.0), // bucket 0: mean 3.0
      (1L, ts(3), 5.0),                       // buckets 1,2 missing
      (2L, ts(7), 9.0))                       // single-bucket key
      .toDF("user_id", "ts", "value")
    val got = Resample.fillGaps(rows, "user_id", "ts", "value", 3600L)
      .orderBy("user_id", "bucket")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 3.0, true), (1L, 1L, 3.0, false), (1L, 2L, 3.0, false),
      (1L, 3L, 5.0, true),
      (2L, 7L, 9.0, true)), got.toString)
  }

  test("property: grid is complete, observed values preserved, fills carry forward") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 6).flatMap { k =>
      (0 until 1 + rnd.nextInt(20)).map { _ =>
        (k.toLong, ts(rnd.nextInt(48)), rnd.nextInt(10).toDouble)
      }
    }.toDF("user_id", "ts", "value")
    val out = Resample.fillGaps(rows, "user_id", "ts", "value", 3600L)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    val byKey = out.groupBy(_._1)
    byKey.foreach { case (k, g) =>
      val buckets = g.map(_._2).sorted
      // complete contiguous span
      assert(buckets == (buckets.min to buckets.max).toSeq, s"gap in grid for $k")
      // first bucket is observed; every filled value equals the nearest
      // earlier observed value
      val sorted = g.sortBy(_._2)
      assert(sorted.head._4, s"span must start at an observation for $k")
      var lastObs = sorted.head._3
      sorted.foreach { r =>
        if (r._4) lastObs = r._3
        else assert(r._3 == lastObs, s"fill must carry forward for $k: $r")
      }
    }
  }

  test("fillGaps leading buckets are observed by construction (span starts at first obs)") {
    val rows = Seq((1L, ts(5), 1.5)).toDF("user_id", "ts", "value")
    val got = Resample.fillGaps(rows, "user_id", "ts", "value", 3600L)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq((1L, 5L, 1.5, true)))
  }

  test("fillInterpolate lerps interior gaps, keeps observations") {
    val rows = Seq(
      (1L, ts(0), 2.0),                  // bucket 0
      (1L, ts(3), 8.0),                  // buckets 1,2 missing: 4.0, 6.0
      (1L, ts(5), 7.0))                  // bucket 4 missing: 7.5
      .toDF("user_id", "ts", "value")
    val got = Resample.fillInterpolate(rows, "user_id", "ts", "value", 3600L)
      .orderBy("user_id", "bucket")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 2.0, true), (1L, 1L, 4.0, false), (1L, 2L, 6.0, false),
      (1L, 3L, 8.0, true), (1L, 4L, 7.5, false), (1L, 5L, 7.0, true)),
      got.toString)
  }

  test("fillInterpolate exact-midpoint rounding is HALF_UP") {
    // endpoints 1.0001 and 1.0002 one gap apart: midpoint 1.00015
    // must surface as 1.0002 (HALF_UP), not banker's/binary-down
    val rows = Seq((1L, ts(0), 1.0001), (1L, ts(2), 1.0002))
      .toDF("user_id", "ts", "value")
    val got = Resample.fillInterpolate(rows, "user_id", "ts", "value", 3600L)
      .orderBy("bucket").as[(Long, Long, Double, Boolean)].collect()
    assert(got(1) == ((1L, 1L, 1.0002, false)), got.mkString(","))
  }

  test("property: fillInterpolate agrees with fillGaps on observed rows and grid shape") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 5).flatMap { k =>
      (0 until 2 + rnd.nextInt(15)).map { _ =>
        (k.toLong, ts(rnd.nextInt(48)), rnd.nextInt(100).toDouble)
      }
    }.toDF("user_id", "ts", "value")
    val ff = Resample.fillGaps(rows, "user_id", "ts", "value", 3600L)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    val li = Resample.fillInterpolate(rows, "user_id", "ts", "value", 3600L)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(ff.map(r => (r._1, r._2, r._4)).sorted ==
      li.map(r => (r._1, r._2, r._4)).sorted, "same grid + observed flags")
    val obsF = ff.filter(_._4).sortBy(r => (r._1, r._2))
    val obsL = li.filter(_._4).sortBy(r => (r._1, r._2))
    assert(obsF == obsL, "observed values identical")
    // every interpolated value sits within [min, max] of its key's
    // observations (lerp can't overshoot)
    val bounds = li.filter(_._4).groupBy(_._1)
      .map { case (k, g) => k -> (g.map(_._3).min, g.map(_._3).max) }
    li.filterNot(_._4).foreach { r =>
      val (lo, hi) = bounds(r._1)
      assert(r._3 >= lo - 1e-9 && r._3 <= hi + 1e-9, r.toString)
    }
  }
}
