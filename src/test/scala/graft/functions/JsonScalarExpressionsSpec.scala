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
}
