package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.ops.TextAnalysis

/** The native one-pass Gopher counter vs the composed-builtin
  * formulation it replaced: full-row parity of gopherRules against
  * gopherRulesComposed on hand-built warts and random unicode corpora
  * (covering BOTH the ASCII fast path and the exact fallback).
  */
class GopherStatsExpressionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def both(texts: Seq[String],
                   minStop: Int = 2): (Array[Row], Array[Row]) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = TextAnalysis.gopherRules(df, "text", "doc_id", minStop = minStop)
      .orderBy("doc_id").collect()
    val b = TextAnalysis.gopherRulesComposed(df, "text", "doc_id",
        minStop = minStop)
      .orderBy("doc_id").collect()
    (a, b)
  }

  private def assertParity(texts: Seq[String]): Unit = {
    val (a, b) = both(texts)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x == y, s"native $x vs composed $y")
    }
  }

  test("plain prose and the rule columns") {
    val doc = "The quick brown fox jumps over the lazy dog. " +
      "It was the best of times and that was that, with more to be said."
    val (a, _) = both(Seq(doc))
    assertParity(Seq(doc))
    val r = a.head
    assert(r.getAs[Long]("n_words") == 24L)
    assert(r.getAs[Long]("n_stop") >= 5L)
  }

  test("split warts: leading/trailing whitespace tokens, tabs, empty text") {
    assertParity(Seq(
      "", " ", "  ", "\t", "\n", "\ta b\n", "a\t\tb", " a b ",
      "a\n", "\na", "word", "a  b   c", "\t \t", "x \t\n y"))
  }

  test("symbol counting: hashes and non-overlapping ellipsis runs") {
    assertParity(Seq(
      "# ## ###", "a...b", "......", ".....", "....", "...",
      "..", "a ... b ... c", "#...#", "... ...", "…", "a…"))
  }

  test("line stats: bullets, ellipsis endings, blank lines") {
    assertParity(Seq(
      "- item one\n* item two\n• dot item\nplain",
      "  - spaced bullet\n\n\n   \nend...",
      "line one...\nline two… \n-\n*",
      "...\n- ...\nall done"))
  }

  test("stop-word membership is exact, not substring") {
    assertParity(Seq(
      "the them theater of offs to too and android",
      "THE BE TO OF AND THAT HAVE WITH",
      "be with", "nothing here matches"))
  }

  test("unicode fallback path agrees (case mapping, NBSP, emoji, CJK)") {
    assertParity(Seq(
      "Grüße aus München... mit Maß und Ziel",
      "ÇÖĞÜŞİI İstanbul", // dotted capital I lowercases to 2 codepoints
      "日本語のテキスト…\n- 項目",
      "a b the of", "😀 the fox 😀...",
      "İ", "ẞ", "ǅungla")) // titlecase digraph exercises toLowerCase
  }

  test("random unicode corpora: full-row parity (fixed seeds)") {
    val charGen = Gen.frequency(
      8 -> Gen.alphaChar,
      2 -> Gen.numChar,
      4 -> Gen.oneOf(' ', ' ', '\t', '\n', '\n'),
      2 -> Gen.oneOf('.', '#', '-', '*', '•', '…', '!'),
      1 -> Gen.oneOf('é', 'İ', '日', ' '))
    val docGen = for {
      n <- Gen.choose(0, 120)
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    (1 to 40).foreach { i =>
      val texts = Gen.listOfN(12, docGen)(
        Gen.Parameters.default, Seed(i.toLong)).get
      val (a, b) = both(texts)
      a.zip(b).zipWithIndex.foreach { case ((x, y), j) =>
        assert(x == y,
          s"seed=$i doc=$j text=${texts(j).getBytes("UTF-8").toSeq}\n$x\n$y")
      }
    }
  }

  test("null text propagates like the composed form") {
    val df = Seq((0L, Option("a b the of and")), (1L, None))
      .toDF("doc_id", "text")
    val a = TextAnalysis.gopherRules(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    val b = TextAnalysis.gopherRulesComposed(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
    assert(!a(1).getAs[Boolean]("keep"))
  }

  test("interpreted and codegen paths agree") {
    val df = Seq("the quick fox...", "# \n- b").toDF("text")
    def run() = df.select(
      GopherStatsExpression.gopher_stats(col("text"))).collect().toSeq
    val on = run()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == on)
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
