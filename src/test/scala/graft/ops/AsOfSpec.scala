package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AsOfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before each left row per key") {
    val quotes = Seq( // (key, t, price)
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0))
      .toDF("k", "qt", "price")
    val trades = Seq( // (key, t, trade_id)
      (1L, ts("2024-01-01 10:30:00"), "a"), // matches 10:00 quote
      (1L, ts("2024-01-01 11:00:00"), "b"), // equal ts: inclusive match
      (1L, ts("2024-01-01 09:00:00"), "c"), // before any quote -> null
      (2L, ts("2024-01-01 12:00:00"), "d"), // matches key-2 quote
      (3L, ts("2024-01-01 12:00:00"), "e")) // no right rows for key
      .toDF("k", "tt", "trade_id")
    val out = AsOf.asofJoin(trades, quotes, Seq("k"), "tt", "qt")
      .select("trade_id", "right_price")
      .as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "a" -> Some(100.0), "b" -> Some(110.0), "c" -> None,
      "d" -> Some(200.0), "e" -> None))
  }

  test("asofJoin payload struct is atomic (all columns from one matched row)") {
    val right = Seq((1L, ts("2024-01-01 10:00:00"), "r1", 1.0),
                    (1L, ts("2024-01-01 11:00:00"), "r2", 2.0))
      .toDF("k", "rt", "tag", "v")
    val left = Seq((1L, ts("2024-01-01 11:30:00"), "x")).toDF("k", "lt", "name")
    val row = AsOf.asofJoin(left, right, Seq("k"), "lt", "rt").collect()(0)
    assert(row.getAs[String]("right_tag") == "r2")
    assert(row.getAs[Double]("right_v") == 2.0)
  }
}
