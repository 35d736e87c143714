package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The hash-carry token-set representation (round 15): tokens travel
  * through the all-pairs join as ascending distinct xxhash64 arrays.
  * Pins (a) the expression against the composed builtin form it
  * replaced (sort_array ∘ array_distinct ∘ per-element xxhash64), (b)
  * the long branch of sorted_intersect_size against the string branch
  * on the same corpora, (c) edge totality.
  */
class SortedTokenHashesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import TextHashExpressions.{sorted_token_hashes, sorted_intersect_size}

  private val docGen: Gen[Seq[String]] = for {
    n <- Gen.choose(0, 40)
    toks <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.oneOf("the", "fox", "über", "日本", "a", "b", "tok1", "tok2"),
      2 -> Gen.listOf(Gen.alphaNumChar).map(_.mkString),
      1 -> Gen.const("")))
  } yield toks

  test("parity with the composed builtin form on generated corpora") {
    (1 to 30).foreach { i =>
      val docs = Gen.listOfN(10, docGen)(
        Gen.Parameters.default, Seed(i.toLong)).get
      val df = docs.map(d => Tuple1(d)).toDF("toks")
      val out = df.select(
          sorted_token_hashes(col("toks")).as("native"),
          sort_array(array_distinct(
            transform(col("toks"), t => xxhash64(t)))).as("composed"))
        .collect()
      out.zipWithIndex.foreach { case (r, d) =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"seed=$i doc=$d toks=${docs(d)}")
      }
    }
  }

  test("dedups, sorts, ignores nulls, total on empty") {
    val df = Seq(
      (0L, Seq("b", "a", "b", "a")),
      (1L, Seq.empty[String]),
      (2L, Seq("only"))).toDF("id", "toks")
    val out = df.orderBy("id")
      .select(sorted_token_hashes(col("toks"))).collect()
    val s0 = out(0).getSeq[Long](0)
    assert(s0.length == 2 && s0 == s0.sorted && s0.distinct == s0)
    assert(out(1).getSeq[Long](0).isEmpty)
    assert(out(2).getSeq[Long](0).length == 1)
    // null array column -> null out
    val n = Seq((0L, Option.empty[Seq[String]])).toDF("id", "toks")
      .select(sorted_token_hashes(col("toks"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("long-branch intersect ≡ string-branch intersect on hashed sets") {
    (1 to 20).foreach { i =>
      val pair = Gen.zip(docGen, docGen)(
        Gen.Parameters.default, Seed(100L + i)).get
      val df = Seq(pair).toDF("a", "b")
      val viaStrings = df.select(sorted_intersect_size(
          sort_array(array_distinct(col("a"))),
          sort_array(array_distinct(col("b"))))).as[Long].head()
      val viaHashes = df.select(sorted_intersect_size(
          sorted_token_hashes(col("a")),
          sorted_token_hashes(col("b")))).as[Long].head()
      assert(viaStrings == viaHashes, s"seed=$i pair=$pair")
    }
  }

  test("mismatched element types fail analysis, never compute garbage") {
    // array<long> vs array<string> used to pass analysis (left-only
    // dispatch) and merge getLong reads over string bytes — the
    // round-15 ADVICE find; checkInputDataTypes now rejects it
    val df = Seq((Seq(1L, 2L), Seq("a", "b"))).toDF("l", "s")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(sorted_intersect_size(col("l"), col("s"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("sorted_intersect_size"))
    // unsupported element type (ints) also rejected on BOTH sides
    val di = Seq((Seq(1, 2), Seq(2, 3))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      di.select(sorted_intersect_size(col("a"), col("b"))).collect()
    }
  }

  test("hash values match Spark's xxhash64 (seed 42) per token") {
    val toks = Seq("the", "über", "")
    val expected = toks.map(t =>
      Seq(Tuple1(t)).toDF("t").select(xxhash64(col("t"))).as[Long].head())
    val got = TextHashExpressions.sortedTokenHashes(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        toks.map(UTF8String.fromString).toArray))
    assert(got.toLongArray().toSeq == expected.sorted.distinct)
  }
}
