package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The native single-field JSON long extractor that replaced the
  * parse_json→variant_get hot path in q_f9_variant: scanner unit
  * coverage plus bit-parity against BOTH alternatives it stands in
  * for (variant_get typed access and get_json_object+cast).
  */
class JsonScalarExpressionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import JsonScalarExpressions.json_get_long

  private def get(json: String, key: String = "k"): Option[Long] =
    Option(JsonScalarExpressions.getLongBoxed(
      UTF8String.fromString(json), UTF8String.fromString(key)))
      .map(_.longValue())

  test("plain integer field") {
    assert(get("""{"k": 69}""") == Some(69L))
    assert(get("""{"k":0}""") == Some(0L))
    assert(get("""{ "k" : 42 }""") == Some(42L))
  }

  test("negative values and numeric strings parse; cast contract") {
    assert(get("""{"k": -7}""") == Some(-7L))
    assert(get("""{"k": "123"}""") == Some(123L))
    assert(get("""{"k": "-5"}""") == Some(-5L))
  }

  test("missing key, null, bool, float syntax, nested → null") {
    assert(get("""{"x": 1}""").isEmpty)
    assert(get("""{"k": null}""").isEmpty)
    assert(get("""{"k": true}""").isEmpty)
    assert(get("""{"k": 1.5}""").isEmpty)
    assert(get("""{"k": 1e3}""").isEmpty)
    assert(get("""{"k": {"v": 1}}""").isEmpty)
    assert(get("""{"k": [1]}""").isEmpty)
    assert(get("""{"k": "abc"}""").isEmpty)
    assert(get("""{}""").isEmpty)
    assert(get("not json").isEmpty)
    assert(get("").isEmpty)
  }

  test("key prefix/suffix collisions never match") {
    assert(get("""{"kk": 1, "k": 2}""") == Some(2L))
    assert(get("""{"k2": 1}""").isEmpty)
    assert(get("""{"ak": 1}""").isEmpty)
  }

  test("target key found past skipped values of every JSON type") {
    val j = """{"s": "tex,t}", "n": 1.25, "b": false, "z": null,""" +
      """ "o": {"in": [1, "}"]}, "a": [{"x": 2}, 3], "k": 99}"""
    assert(get(j) == Some(99L))
  }

  test("escaped quotes inside skipped strings don't derail the scan") {
    assert(get("""{"s": "a\"b,}", "k": 7}""") == Some(7L))
  }

  // Edge semantics are pinned to the ORACLE form (DuckDB
  // CAST(json_extract_string(j,'$.k') AS BIGINT), both behaviors
  // measured) because Spark's variant path disagrees with ITSELF
  // here: parse_json rejects duplicate-key objects by default
  // (try_parse_json → null, so no last-wins to match) while its
  // lenient Jackson ACCEPTS trailing garbage. The scaladoc documents
  // both divergences.
  test("duplicate keys: FIRST occurrence wins (oracle parity)") {
    assert(get("""{"k":1,"k":2}""") == Some(1L))
    assert(get("""{"k":2,"k":1}""") == Some(2L))
    // first occurrence non-long → null, even with a later long
    assert(get("""{"k":"x","k":1}""").isEmpty)
    assert(get("""{"k":1,"x":5,"k":3}""") == Some(1L))
    // Spark's variant path yields null on duplicates — divergence
    // asserted so a Spark behavior change surfaces here
    val out = Seq("""{"k":1,"k":2}""").toDF("j")
      .select(variant_get(try_parse_json(col("j")), "$.k", "long"))
      .collect()
    assert(out(0).isNullAt(0))
  }

  test("trailing garbage after a valid object → null (oracle parity)") {
    assert(get("""{"k":1}junk""").isEmpty)
    assert(get("""{"k":1}{"k":2}""").isEmpty)
    assert(get("""{"k":1},""").isEmpty)
    // trailing whitespace is NOT garbage
    assert(get("{\"k\":1}  \n\t") == Some(1L))
    assert(get("""{"k":1} """) == Some(1L))
  }

  test("long overflow → null, Long.MaxValue parses") {
    assert(get(s"""{"k": ${Long.MaxValue}}""") == Some(Long.MaxValue))
    assert(get("""{"k": 9223372036854775808}""").isEmpty)
  }

  test("bit-parity with variant_get AND get_json_object+cast on a corpus") {
    val rows = (0 until 500).map { i =>
      val v = i match {
        case x if x % 7 == 0 => "null"
        case x if x % 11 == 0 => s""""${x * 3}""""
        case x if x % 13 == 0 => "1.5"
        case x => (x * 1000003L - 250000).toString
      }
      (i.toLong, s"""{"pad": "v$i", "k": $v, "tail": [$i]}""")
    }
    val df = rows.toDF("id", "props")
    // float-syntax rows diverge BY CONTRACT (gjo's cast truncates 1.5
    // → 1, variant_get may refuse under ANSI, native returns null per
    // the integral-syntax rule) — parity is asserted on the rest
    def isFloatRow(i: Long) = i % 13 == 0 && i % 7 != 0 && i % 11 != 0
    val out = df.filter(!col("id").isin(
        rows.map(_._1).filter(isFloatRow).map(Long.box): _*))
      .select(col("id"),
        json_get_long(col("props"), "k").as("native"),
        variant_get(parse_json(col("props")), "$.k", "long").as("variant"),
        get_json_object(col("props"), "$.k").cast("long").as("gjo"))
      .collect()
    assert(out.length == rows.count(r => !isFloatRow(r._1)))
    out.foreach { r =>
      def v(i: Int): Option[Long] = if (r.isNullAt(i)) None else Some(r.getLong(i))
      assert(v(1) == v(2) && v(1) == v(3), s"row $r")
    }
  }

  test("whole-stage codegen path and interpreted path agree") {
    val df = (0 until 100).map(i => s"""{"k": $i}""").toDF("j")
    val a = df.select(json_get_long(col("j"), "k")).as[Long].collect().toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val b = df.select(json_get_long(col("j"), "k")).as[Long].collect().toSeq
      assert(a == b && a == (0L until 100L))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null input column → null out") {
    val df = Seq(Some("""{"k": 1}"""), None).toDF("j")
    val out = df.select(json_get_long(col("j"), "k")).collect()
    assert(out(0).getLong(0) == 1L && out(1).isNullAt(0))
  }

  // ---- json_get_string (the q_f7 string-field twin) ----

  import JsonScalarExpressions.json_get_string

  private def getS(json: String, key: String = "k"): Option[String] =
    Option(JsonScalarExpressions.getStringBoxed(
      UTF8String.fromString(json), UTF8String.fromString(key)))
      .map(_.toString)

  test("string form: numbers/bools keep literal text, strings unescape") {
    assert(getS("""{"k": 69}""") == Some("69"))
    assert(getS("""{"k": -7}""") == Some("-7"))
    assert(getS("""{"k": true}""") == Some("true"))
    assert(getS("""{"k": false}""") == Some("false"))
    assert(getS("""{"k": "abc"}""") == Some("abc"))
    assert(getS("""{"k": " x "}""") == Some(" x "))
    assert(getS("""{"k": ""}""") == Some(""))
    // raw-text contract on float syntax (DuckDB re-canonicalizes
    // through a double — divergence documented in the scaladoc; the
    // oracle only extracts integer fields)
    assert(getS("""{"k": 1.5e3}""") == Some("1.5e3"))
  }

  test("string form: null literal, missing key, malformed → null") {
    assert(getS("""{"k": null}""").isEmpty)
    assert(getS("""{"x": 1}""").isEmpty)
    assert(getS("""{"k":1}junk""").isEmpty)
    assert(getS("""not json""").isEmpty)
    assert(getS("""{"k": "unterminated""").isEmpty)
    assert(getS("").isEmpty)
  }

  test("string form: duplicate keys first-wins; trailing ws ok") {
    assert(getS("""{"k":"a","k":"b"}""") == Some("a"))
    assert(getS("{\"k\": \"v\"}  \n") == Some("v"))
  }

  test("string form: escapes decode per RFC 8259") {
    assert(getS("""{"k": "a\nb"}""") == Some("a\nb"))
    assert(getS("""{"k": "q\"q"}""") == Some("q\"q"))
    assert(getS("""{"k": "s\\t\/u"}""") == Some("s\\t/u"))
    assert(getS("""{"k": "Aé"}""") == Some("Aé"))
    // surrogate pair reassembles
    assert(getS("""{"k": "😀"}""") == Some("😀"))
    // invalid escape → malformed value → null (the \u sequences are
    // spelled via runtime concat — scalac pre-parses \u even inside
    // triple quotes)
    assert(getS("{\"k\": \"" + "\\q" + "\"}").isEmpty)
    assert(getS("{\"k\": \"" + "\\" + "u12g4" + "\"}").isEmpty)
    // valid \u escape decodes
    assert(getS("{\"k\": \"" + "\\" + "u0041" + "\"}") == Some("A"))
  }

  test("string form: nested values return the raw source span") {
    assert(getS("""{"k": {"a":1}}""") == Some("""{"a":1}"""))
    assert(getS("""{"k": [1,2]}""") == Some("[1,2]"))
    // the raw span keeps interior whitespace (get_json_object and
    // DuckDB re-emit minified — the parity corpus below generates
    // minified nested values; machine-written payloads are minified)
    assert(getS("""{"k": [1, 2]}""") == Some("[1, 2]"))
  }

  test("string form: bit-parity with get_json_object on a generated corpus") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val strBody = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf(" ", "é", "日", "😀", ","),
      1 -> Gen.oneOf("\n", "\t", "\"", "\\"))).map(_.mkString)
    val scalarGen: Gen[String] = Gen.frequency(
      4 -> Gen.choose(Long.MinValue / 2, Long.MaxValue / 2).map(_.toString),
      1 -> Gen.const("true"), 1 -> Gen.const("false"),
      1 -> Gen.const("null"),
      4 -> strBody.map(s => jsonQuote(s)),
      1 -> Gen.choose(0, 99).map(i => s"""{"in":$i}"""),
      1 -> Gen.choose(0, 99).map(i => s"[$i,[$i]]"))
    val objGen: Gen[String] = for {
      kVal <- scalarGen
      pre <- Gen.choose(0, 2)
      post <- Gen.choose(0, 2)
      other <- scalarGen
    } yield {
      val preF = (0 until pre).map(i => s""""p$i": ${other}""")
      val postF = (0 until post).map(i => s""""q$i": ${other}""")
      (preF ++ Seq(s""""k": $kVal""") ++ postF).mkString("{", ", ", "}")
    }
    (1 to 40).foreach { i =>
      val docs = Gen.listOfN(25, objGen)(
        Gen.Parameters.default, Seed(i.toLong)).get
      val out = docs.toDF("j")
        .select(json_get_string(col("j"), "k").as("native"),
          get_json_object(col("j"), "$.k").as("gjo"))
        .collect()
      out.zipWithIndex.foreach { case (r, d) =>
        def v(c: Int) = if (r.isNullAt(c)) None else Some(r.getString(c))
        assert(v(0) == v(1), s"seed=$i doc=$d json=${docs(d)}")
      }
    }
  }

  private def jsonQuote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\t' => sb.append("\\t")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  test("string form: codegen and interpreted paths agree") {
    val df = (0 until 50).map(i => s"""{"k": "v$i", "n": $i}""").toDF("j")
    val a = df.select(json_get_string(col("j"), "k")).as[String].collect().toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val b = df.select(json_get_string(col("j"), "k")).as[String].collect().toSeq
      assert(a == b && a == (0 until 50).map(i => s"v$i"))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("string form: null input column → null out") {
    val df = Seq(Some("""{"k": "x"}"""), None).toDF("j")
    val out = df.select(json_get_string(col("j"), "k")).collect()
    assert(out(0).getString(0) == "x" && out(1).isNullAt(0))
  }
}
