package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** The two-seed chained window hasher that replaced per-window
  * slice+join+md5 in the span operators: the duplicated-window SET it
  * induces must be IDENTICAL to the md5 formulation's on any corpus —
  * that is the exact property the ExactSubstr family depends on.
  */
class WindowHashes128Spec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** (id, start, key) via the native hasher. */
  private def native(docs: Seq[(Long, String)], k: Int) =
    docs.toDF("id", "text")
      .select(col("id"),
        split(lower(trim(col("text"))), "\\s+").as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col("id"), posexplode(
        TextHashExpressions.window_hashes128(col("__toks"), k)))
      .select(col("id"), (col("pos") + 1).as("start"),
        hex(col("col")).as("key"))

  /** (id, start, key) via the replaced md5-of-joined-slice form. */
  private def composed(docs: Seq[(Long, String)], k: Int) =
    docs.toDF("id", "text")
      .select(col("id"),
        split(lower(trim(col("text"))), "\\s+").as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col("id"), col("__toks"),
        explode(sequence(lit(1), size(col("__toks")) - (k - 1))).as("start"))
      .select(col("id"), col("start"),
        md5(array_join(slice(col("__toks"), col("start"), lit(k)), " "))
          .as("key"))

  /** The semantic contract: two (id, start) windows carry equal keys
    * under the native hasher IFF they do under md5.
    */
  private def assertSameEquivalence(docs: Seq[(Long, String)], k: Int): Unit = {
    def classes(rows: Seq[(Long, Long, String)]): Set[Set[(Long, Long)]] =
      rows.groupBy(_._3).values
        .map(_.map(r => (r._1, r._2)).toSet).filter(_.size > 1).toSet
    val n = native(docs, k).as[(Long, Long, String)].collect().toSeq
    val c = composed(docs, k).as[(Long, Long, String)].collect().toSeq
    assert(n.map(r => (r._1, r._2)).sorted == c.map(r => (r._1, r._2)).sorted,
      "window positions must agree")
    assert(classes(n) == classes(c),
      s"duplicate-window equivalence classes diverged:\n${classes(n)}\nvs\n${classes(c)}")
  }

  test("hand-built corpus: planted duplicate spans, boundary shifts") {
    assertSameEquivalence(Seq(
      0L -> "a b c d e f g h i j",
      1L -> "x y a b c d e f g h q",       // shares the 8-gram a..h
      2L -> "a b c d e f g hh i j",        // token boundary differs
      3L -> "a b c d e f g h i j",         // exact dup of doc 0
      4L -> "ab c d e f g h i jk",         // same chars, different split
      5L -> "short doc"), k = 8)
  }

  test("separator bijection: 'a b' vs 'a  b' vs tab-joined tokens agree") {
    assertSameEquivalence(Seq(
      0L -> "w1 w2 w3 w4",
      1L -> "w1  w2\tw3 \t w4",  // same token sequence, messier ws
      2L -> "w1 w2w3 w4 pad"),   // different tokens
      k = 3)
  }

  test("random corpora over a tiny vocabulary (forced collisions of content)") {
    val vocab = Vector("a", "b", "ab", "ba", "aa", "x")
    val docGen = for {
      n <- Gen.choose(0, 20)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    (1 to 8).foreach { i =>
      val docs = Gen.listOfN(15, docGen)(Gen.Parameters.default,
        Seed(i.toLong)).get.zipWithIndex.map { case (t, j) => (j.toLong, t) }
      assertSameEquivalence(docs, k = 3)
    }
  }

  test("short docs (< k tokens) produce zero windows on both paths") {
    val docs = Seq(0L -> "a b", 1L -> "", 2L -> "one")
    assert(native(docs, 3).count() == 0)
    assert(composed(docs, 3).count() == 0)
  }

  test("interpreted and codegen paths agree") {
    val df = Seq("a b c d e", "x y z w v u").toDF("t")
      .select(TextHashExpressions.window_hashes128(split(col("t"), " "), 3))
    val on = df.collect().map(_.getSeq[Array[Byte]](0).map(_.toSeq)).toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.collect().map(_.getSeq[Array[Byte]](0).map(_.toSeq)).toSeq
      assert(on == off)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
