package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.ops.TextAnalysis

/** The native BPE-ish token counter that replaced the
  * size(regexp_extract_all(...)) hot path: scanner unit coverage plus
  * parity against the Java-regex formulation it stands in for, on
  * hand-picked edges and on random unicode.
  */
class TextStatExpressionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val pattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]".r

  private def regexCount(s: String): Long =
    pattern.findAllIn(s).size.toLong

  private def native(s: String): Long =
    TextStatExpressions.countBpeTokens(UTF8String.fromString(s))

  test("letter runs, digits, symbols, whitespace") {
    assert(native("hello world") == 2L)
    assert(native("abc123") == 4L) // 1 run + 3 single digits
    assert(native("a.b,c") == 5L)
    assert(native("  \t\n ") == 0L)
    assert(native("") == 0L)
    assert(native("don't stop") == 4L) // don / ' / t / stop
    assert(native("3.14") == 4L)
  }

  test("Java \\s semantics: vertical tab is whitespace, U+00A0 is not") {
    assert(native("a\u000Bb") == regexCount("a\u000Bb")) // VT splits
    assert(native("a\u000Bb") == 2L)
    assert(native("a\u00A0b") == regexCount("a\u00A0b")) // NBSP counts
    assert(native("a\u00A0b") == 3L)
  }

  test("multibyte codepoints count one match each") {
    assert(native("日本語") == 3L)
    assert(native("héllo") == regexCount("héllo")) // h + é + llo
    assert(native("héllo") == 3L)
    // 4-byte supplementary codepoint (emoji) = ONE match, not two
    assert(native("a😀b") == regexCount("a😀b"))
    assert(native("a😀b") == 3L)
  }

  test("parity with the regex formulation on random unicode") {
    val charGen = Gen.frequency(
      6 -> Gen.alphaChar,
      2 -> Gen.numChar,
      3 -> Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r'),
      2 -> Gen.oneOf('.', ',', '!', '#', '-', '\'', '"', '{', '…'),
      2 -> Gen.oneOf('é', 'ü', '日', '本', '\u00A0', ' '),
      1 -> Gen.oneOf("😀", "🎉").map(_.charAt(0)))
    val strGen = for {
      n <- Gen.choose(0, 200)
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    // deterministic gen (fixed seeds) — the house scalacheck pattern
    (1 to 300).foreach { i =>
      val s = strGen(Gen.Parameters.default, Seed(i.toLong)).get
      assert(native(s) == regexCount(s),
        s"seed=$i input: ${s.getBytes("UTF-8").toSeq}")
    }
  }

  test("DataFrame path: native column equals regex column, codegen on and off") {
    val docs = Seq("hello, world!", "a1b2c3", "  ", "", "déjà vu…",
      "x".*(5000) + " " + "123#", "\u00A0\u000B").toDF("text")
    def run(): Seq[(Long, Long)] = docs.select(
        TextAnalysis.tokenCountBpe(col("text")).as("native"),
        TextAnalysis.tokenCountBpeRegex(col("text")).cast("long").as("regex"))
      .as[(Long, Long)].collect().toSeq
    run().foreach { case (n, r) => assert(n == r) }
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try run().foreach { case (n, r) => assert(n == r) }
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("line_chunks parity with the composed lineChunks(split) form") {
    import graft.ops.TextAnalysis
    val texts = Seq(
      "a b c d e f g h i j k l m n o p q", // 17 words -> 3 chunks
      "one two", "", " ", "  leading", "trailing  ", "\ta\tb\n",
      "exactly eight tokens in this very line here",
      "日本 語 テキスト with mixed ünïcode words in it too yes",
      "x") ++ (1 to 5).map(i => ("w" * i + " ") * (8 * i + 3))
    val df = texts.toDF("text")
    val out = df.select(
        TextAnalysis.lineChunksText(col("text"), 8).as("native"),
        TextAnalysis.lineChunks(split(col("text"), "\\s+"), 8).as("composed"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native ${r.getSeq[String](0)} vs composed ${r.getSeq[String](1)}")
    }
    // random token streams with messy whitespace (fixed seeds)
    val gen = for {
      n <- Gen.choose(0, 60)
      ws <- Gen.listOfN(n, Gen.frequency(
        5 -> Gen.alphaStr.map(_.take(6)),
        2 -> Gen.oneOf(" ", "\t", "\n", "  ", " \t "),
        1 -> Gen.oneOf("é日", "...", "#")))
    } yield ws.mkString
    (1 to 100).foreach { i =>
      val s = gen(Gen.Parameters.default, Seed(i.toLong)).get
      val r = Seq(s).toDF("text").select(
        TextAnalysis.lineChunksText(col("text"), 8).as("a"),
        TextAnalysis.lineChunks(split(col("text"), "\\s+"), 8).as("b"))
        .head()
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"seed=$i input=$s")
    }
  }

  test("hash_embedding parity with the composed md5 pipeline") {
    import graft.ops.TextAnalysis
    val texts = Seq(
      "the quick brown fox", "", " ", "\ta b\n", "hash join scan",
      "dup dup dup dup", "x y z " * 40,
      "Grüße aus München", "日本語 テキスト ünïcode", "a b")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val nat = TextAnalysis.hashEmbedding(df, "text", "doc_id", dim = 16)
      .orderBy("doc_id").as[(Long, Seq[Double])].collect().toSeq
    val comp = TextAnalysis.hashEmbeddingComposed(df, "text", "doc_id", dim = 16)
      .orderBy("doc_id").as[(Long, Seq[Double])].collect().toSeq
    assert(nat == comp)
    // null text: the composed form's explode DROPPED the doc — the
    // native filter must match
    val withNull = Seq((0L, Option("a b")), (1L, None)).toDF("doc_id", "text")
    assert(TextAnalysis.hashEmbedding(withNull, "text", "doc_id", 8).count() == 1)
    // random messy strings, fixed seeds
    val gen = for {
      n <- Gen.choose(0, 80)
      cs <- Gen.listOfN(n, Gen.frequency(
        6 -> Gen.alphaChar, 3 -> Gen.oneOf(' ', '\t', '\n'),
        1 -> Gen.oneOf('é', '日', '#', '.')))
    } yield cs.mkString
    val rand = (1 to 60).map(i =>
      (i.toLong, gen(Gen.Parameters.default, Seed(i.toLong)).get))
    val rdf = rand.toDF("doc_id", "text")
    val a = TextAnalysis.hashEmbedding(rdf, "text", "doc_id", 16)
      .orderBy("doc_id").as[(Long, Seq[Double])].collect().toSeq
    val b = TextAnalysis.hashEmbeddingComposed(rdf, "text", "doc_id", 16)
      .orderBy("doc_id").as[(Long, Seq[Double])].collect().toSeq
    assert(a == b)
  }

  test("null text → null count") {
    val out = Seq(Some("a b"), None).toDF("text")
      .select(TextStatExpressions.bpe_token_count(col("text"))).collect()
    assert(out(0).getLong(0) == 2L && out(1).isNullAt(0))
  }
}
