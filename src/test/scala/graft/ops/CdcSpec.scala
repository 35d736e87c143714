package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CdcSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val base = Seq((1L, "one", 10.0), (2L, "two", 20.0),
    (3L, "three", 30.0)).toDF("id", "name", "bal")

  private def apply(changes: Seq[(Long, String, Double, Long, String)]) =
    Cdc.applyChangeLog(base,
        changes.toDF("id", "name", "bal", "version", "op"),
        keyCols = Seq("id"), versionCol = "version", opCol = "op")
      .as[(Long, String, Double)].collect().toSet

  test("highest version wins; D deletes; untouched rows pass through") {
    val got = apply(Seq(
      (1L, "one-v5", 11.0, 5L, "U"),
      (1L, "one-v9", 12.0, 9L, "U"),   // later update wins
      (2L, "gone", 0.0, 3L, "D"),      // delete drops key 2
      (4L, "four", 40.0, 1L, "I")))    // insert brand-new key
    assert(got == Set((1L, "one-v9", 12.0), (3L, "three", 30.0),
      (4L, "four", 40.0)), got.toString)
  }

  test("delete then re-insert: the later insert resurrects the key") {
    val got = apply(Seq(
      (2L, "x", 0.0, 1L, "D"),
      (2L, "back", 21.0, 2L, "I")))
    assert(got.contains((2L, "back", 21.0)), got.toString)
  }

  test("a winning delete beats the base even for never-inserted keys") {
    val got = apply(Seq((9L, "ghost", 0.0, 1L, "D")))
    assert(got == Set((1L, "one", 10.0), (2L, "two", 20.0),
      (3L, "three", 30.0)), got.toString)
  }

  test("out-of-order arrival is idempotent: same result any log order") {
    val log = Seq(
      (1L, "a", 1.0, 3L, "U"), (1L, "b", 2.0, 1L, "U"),
      (2L, "c", 3.0, 2L, "D"), (2L, "d", 4.0, 1L, "U"))
    assert(apply(log) == apply(log.reverse))
    assert(apply(log ++ log) == apply(log), "replayed log changes nothing")
  }

  test("changes missing a base column are rejected") {
    val bad = Seq((1L, 5L, "U")).toDF("id", "version", "op")
    val e = intercept[IllegalArgumentException] {
      Cdc.applyChangeLog(base, bad, Seq("id"), "version", "op")
    }
    assert(e.getMessage.contains("missing"), e.getMessage)
  }
}
