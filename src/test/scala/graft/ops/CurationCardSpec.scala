package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CurationCardSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def card(rows: Seq[(Long, String, String, String)]): Map[String, Double] =
    Curation.datasetCard(rows.toDF("id", "text", "lang", "source"),
        "text", "lang", "source")
      .as[(String, Double)].collect().toMap

  test("hand-computed card over a tiny corpus") {
    val rows = Seq(
      (1L, "one two three", "en", "web"),
      (2L, "one two three", "en", "web"),   // exact dup of 1
      (3L, "quatre cinq", "fr", "books"),
      (4L, "six", "en", "web"))
    val c = card(rows)
    assert(c("n_docs") == 4.0)
    assert(c("total_chars") == (13 + 13 + 11 + 3).toDouble, c.toString)
    assert(c("total_tokens") == 9.0, c.toString)
    assert(c("mean_tokens") == 2.25)
    assert(c("n_langs") == 2.0 && c("n_sources") == 2.0)
    assert(c("top_lang_share") == 0.75, c.toString)
    assert(c("exact_dup_rate") == 0.25, c.toString)
    assert(c.size == 8, c.keys.toString)
  }

  test("no duplicates: dup rate 0; single language: share 1") {
    val c = card(Seq((1L, "a b", "en", "s1"), (2L, "c d", "en", "s2")))
    assert(c("exact_dup_rate") == 0.0 && c("top_lang_share") == 1.0)
  }
}
