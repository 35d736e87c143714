package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("token counts") {
    val df = Seq("the quick brown fox", "a, b! c?").toDF("t")
    val r = df.select(
      TextAnalysis.tokenCountWs(col("t")),
      TextAnalysis.tokenCountBpe(col("t"))).collect()
    assert(r(0).getInt(0) == 4)
    assert(r(1).getInt(0) == 3)
    assert(r(1).getInt(1) == 6) // a , b ! c ?
  }

  test("stopword ratio and quality bounds") {
    val df = Seq("the cat sat on the mat with a hat and a bat").toDF("t")
    val r = df.select(
      TextAnalysis.stopwordRatio(col("t")),
      TextAnalysis.qualityScore(col("t"))).collect()(0)
    assert(r.getDouble(0) > 0.2 && r.getDouble(0) < 0.8)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
  }

  test("fingerprint is invariant to word order and duplication") {
    val df = Seq(("b a c a", "a b c"), ("x y", "y x")).toDF("t1", "t2")
    val r = df.select(
      TextAnalysis.fingerprint(col("t1")) === TextAnalysis.fingerprint(col("t2")))
      .as[Boolean].collect()
    assert(r.forall(identity))
  }

  test("rollingHash is order-sensitive") {
    val df = Seq(("a b c", "c b a")).toDF("t1", "t2")
    val r = df.select(
      TextAnalysis.rollingHash(col("t1")) === TextAnalysis.rollingHash(col("t2")))
      .as[Boolean].collect()
    assert(!r(0))
  }

  test("langId picks the language with most marker hits") {
    val df = Seq(
      ("the cat and the dog is with of", "en"),
      ("el que la los de", "es"),
      ("der und die das ist", "de"),
      ("xyzzy plugh", "und")).toDF("t", "expected")
    val r = df.select(TextAnalysis.langId(col("t")), col("expected"))
      .as[(String, String)].collect()
    r.foreach { case (got, exp) => assert(got == exp, s"got $got want $exp") }
  }
}
