package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AllPairsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)], tau: Double): Set[(Long, Long, Double)] =
    AllPairs.jaccardThresholdJoin(docs.toDF("id", "text"), "id", "text", tau)
      .as[(Long, Long, Double)].collect().toSet

  /** Brute-force reference: exact distinct-token Jaccard over ALL
    * pairs — the completeness bar the prefix filter must meet.
    */
  private def brute(docs: Seq[(Long, String)], tau: Double): Set[(Long, Long, Double)] = {
    val sets = docs.filter(_._2.trim.nonEmpty)
      .map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSet }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= tau
    } yield (ia, ib, math.rint(j * 1e4) / 1e4)).toSet
  }

  test("hand example: exact pairs at the threshold, near-miss excluded") {
    val docs = Seq(
      1L -> "the quick brown fox",
      2L -> "the quick brown wolf",  // J(1,2) = 3/5 = 0.6
      3L -> "the quick red wolf",    // J(2,3) = 3/5, J(1,3) = 2/6
      4L -> "entirely different words here")
    val got = pairs(docs, 0.6)
    assert(got == Set((1L, 2L, 0.6), (2L, 3L, 0.6)), got.toString)
  }

  test("completeness vs brute force on a mixed corpus (the zero-recall-loss claim)") {
    // skewed vocabulary: shared stopwords + doc-specific rares —
    // exactly the regime prefix filtering prunes hardest in
    val docs = (1L to 40L).map { i =>
      val shared = "the of and to in"
      val fam = s"family${i % 7} group${i % 5}"
      val own = s"tok${i}a tok${i}b"
      i -> s"$shared $fam $own"
    }
    for (tau <- Seq(0.4, 0.5, 0.7, 0.9)) {
      val got = pairs(docs, tau)
      val want = brute(docs, tau)
      assert(got == want, s"tau=$tau: got ${got.size}, want ${want.size}; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("identical docs pair at J = 1; tau = 1 keeps only exact-set matches") {
    val docs = Seq(1L -> "alpha beta gamma", 2L -> "alpha beta gamma",
      3L -> "gamma beta alpha extra")
    val got = pairs(docs, 1.0)
    assert(got == Set((1L, 2L, 1.0)), got.toString)
  }

  test("duplicate tokens inside a doc are SET semantics, order irrelevant") {
    val docs = Seq(1L -> "a b b b a", 2L -> "b a")
    val got = pairs(docs, 0.9)
    assert(got == Set((1L, 2L, 1.0)), got.toString)
  }

  test("empty and whitespace-only docs never match anything") {
    val docs = Seq(1L -> "", 2L -> "   ", 3L -> "real content")
    assert(pairs(docs, 0.1).isEmpty)
  }

  test("bad tau rejected") {
    intercept[IllegalArgumentException] {
      AllPairs.jaccardThresholdJoin(
        Seq((1L, "x")).toDF("id", "text"), "id", "text", 0.0)
    }
  }
}
