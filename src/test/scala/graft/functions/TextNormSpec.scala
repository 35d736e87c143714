package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TextNormSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import TextNormExpressions.{nfc_normalize, strip_control}

  test("NFC composes decomposed accents to precomposed form") {
    val decomposed = "cafe\u0301 and A\u030A" // e+acute, A+ring
    val out = Seq(decomposed).toDF("t")
      .select(nfc_normalize(col("t"))).as[String].head()
    assert(out == "café and Å")
  }

  test("ASCII fast path returns the input UTF8String object untouched") {
    val u = UTF8String.fromString("plain ascii, no work to do")
    assert(TextNormCore.nfc(u) eq u)
  }

  test("already-NFC non-ASCII text is returned unchanged (no re-encode)") {
    val u = UTF8String.fromString("déjà vu") // precomposed
    assert(TextNormCore.nfc(u) eq u)
  }

  test("normalization changes the codepoint count, not the rendered text") {
    val df = Seq("a\u0301e\u0301").toDF("t")
      .select(length(col("t")).as("before"),
        length(nfc_normalize(col("t"))).as("after"))
    assert(df.as[(Int, Int)].head() == ((4, 2)))
  }

  test("nfc_normalize is null-safe and survives both eval paths") {
    val df = Seq(Some("e\u0301"), None).toDF("t")
      .select(nfc_normalize(col("t")).as("n"))
    assert(df.as[Option[String]].collect().toSeq ==
      Seq(Some("é"), None))
    // interpreted path (nullSafeEval) must agree with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.as[Option[String]].collect().toSeq ==
      Seq(Some("é"), None))
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("strip_control drops C0 controls and DEL but keeps tab/newline/CR") {
    val dirty = "a\u0000b\u0007c\td\ne\rf\u007Fg"
    val out = Seq(dirty).toDF("t")
      .select(strip_control(col("t"))).as[String].head()
    assert(out == "abc\td\ne\rfg")
  }
}
