package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class FunnelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("funnelReach counts ordered completion, strictly-later steps") {
    val events = Seq(
      // user 1: full ordered funnel
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(9), "purchase"),
      // user 2: purchase BEFORE click — reaches step 2 only
      (2L, ts(0), "view"), (2L, ts(3), "purchase"), (2L, ts(6), "click"),
      // user 3: click only, never viewed — reaches nothing
      (3L, ts(1), "click"),
      // user 4: view twice, then click at the same instant as the
      // SECOND view — still after the FIRST view, so it counts
      (4L, ts(0), "view"), (4L, ts(2), "view"), (4L, ts(2), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelReach(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "view", 3L), (2L, "click", 3L), (3L, "purchase", 1L)),
      got.toString)
  }

  test("funnelReach horizon bounds the whole funnel from step 1") {
    val events = Seq(
      (1L, ts(0), "view"), (1L, ts(5), "click"),   // click within 6 min
      (2L, ts(0), "view"), (2L, ts(10), "click"))  // click too late
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelReach(events, "user_id", "ts", "event_type",
        Seq("view", "click"), horizonSeconds = Some(360L))
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "view", 2L), (2L, "click", 1L)), got.toString)
  }

  test("retentionMatrix cohorts by first-event week, counts distinct returners") {
    val week = 7 * 24 * 60
    val events = Seq(
      // cohort week 0: users 1 and 2; user 1 returns in weeks 1 and 2,
      // user 2 only in week 2 (twice — must count once)
      (1L, ts(10), "view"), (1L, ts(week + 5), "view"), (1L, ts(2 * week + 1), "view"),
      (2L, ts(20), "view"), (2L, ts(2 * week + 2), "view"), (2L, ts(2 * week + 9), "view"),
      // cohort week 1: user 3, never returns
      (3L, ts(week + 30), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.retentionMatrix(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 2L),
      (1L, 0L, 1L)), got.toString)
  }

  test("funnelReach single-step funnel and empty input are total") {
    val events = Seq((1L, ts(0), "view")).toDF("user_id", "ts", "event_type")
    val one = Funnel.funnelReach(events, "user_id", "ts", "event_type", Seq("view"))
      .as[(Long, String, Long)].collect().toSeq
    assert(one == Seq((1L, "view", 1L)))
    val none = Funnel.funnelReach(events.filter(lit(false)), "user_id", "ts",
        "event_type", Seq("view", "click"))
      .as[(Long, String, Long)].collect().toSeq
    assert(none == Seq((1L, "view", 0L), (2L, "click", 0L)))
  }

  test("transitionMatrix: per-user adjacency, row-normalized, tie by id") {
    // user 1: a,b,a,b -> (a,b)x2, (b,a)x1; user 2: a,c -> (a,c)x1;
    // user 3: single event contributes nothing
    val rows = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"),
      (1L, 3L, 30L, "a"), (1L, 4L, 40L, "b"),
      (2L, 5L, 10L, "a"), (2L, 6L, 20L, "c"),
      (3L, 7L, 10L, "b"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Funnel.transitionMatrix(rows, "user_id", "ts",
        "event_type", "event_id")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val twoThirds = math.floor(2.0 / 3 * 1e6 + 0.5) / 1e6
    val third = math.floor(1.0 / 3 * 1e6 + 0.5) / 1e6
    assert(got == Map(
      ("a", "b") -> ((2L, twoThirds)), ("a", "c") -> ((1L, third)),
      ("b", "a") -> ((1L, 1.0))), got.toString)
    // equal timestamps: the tie column decides the sequence
    val tied = Seq((1L, 1L, 10L, "x"), (1L, 2L, 10L, "y"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val t = Funnel.transitionMatrix(tied, "user_id", "ts",
        "event_type", "event_id")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(t == Seq(("x", "y", 1L, 1.0)), t.toString)
  }
}
