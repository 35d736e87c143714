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

  test("fillGaps leading buckets are observed by construction (span starts at first obs)") {
    val rows = Seq((1L, ts(5), 1.5)).toDF("user_id", "ts", "value")
    val got = Resample.fillGaps(rows, "user_id", "ts", "value", 3600L)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq((1L, 5L, 1.5, true)))
  }
}
