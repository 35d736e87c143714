package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class EvalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val labeled = Seq(
    ("en", "en"), ("en", "en"), ("en", "es"),   // en: 2 right, 1 -> es
    ("es", "es"),                               // es: right
    ("fr", "en"),                               // fr: never predicted right
    (null, "en"), ("en", null))                 // unscorable rows drop
    .toDF("gold", "pred")

  test("confusionMatrix counts pairs, drops null labels") {
    val cm = Eval.confusionMatrix(labeled, "gold", "pred")
      .as[(String, String, Long)].collect().toSet
    assert(cm == Set(("en", "en", 2L), ("en", "es", 1L),
      ("es", "es", 1L), ("fr", "en", 1L)), cm.toString)
  }

  test("classificationReport hand-computed; degenerate classes are NULL") {
    val rep = Eval.classificationReport(labeled, "gold", "pred")
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    // en: tp=2, pred 3 times, gold 3 times -> p=r=f1=0.6667
    assert(rep("en") == ((3L, Some(0.6667), Some(0.6667), Some(0.6667))),
      rep.toString)
    // es: tp=1, predicted twice, gold once -> p=0.5 r=1 f1=2/3
    assert(rep("es") == ((1L, Some(0.5), Some(1.0), Some(0.6667))))
    // fr: gold once, never predicted -> precision NULL, recall 0, f1 NULL
    assert(rep("fr") == ((1L, None, Some(0.0), None)), rep.toString)
  }

  test("cohenKappa: 1 on perfect agreement, 0 on one-sided constant") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("g", "p")
    val Array(r1) = Eval.cohenKappa(perfect, "g", "p").collect()
    assert(r1.getLong(0) == 3 && r1.getDouble(1) == 1.0 &&
      r1.getDouble(2) == 1.0)
    // constant prediction: chance agreement equals observed -> kappa
    // denominator 0 -> NULL (not NaN), accuracy still reported
    val const = Seq(("a", "a"), ("b", "a")).toDF("g", "p")
    val Array(r2) = Eval.cohenKappa(const, "g", "p").collect()
    assert(r2.getDouble(1) == 0.5 && !r2.isNullAt(1))
    // gold a,b vs pred a,a: pe = (1*2 + 0)/4 = 0.5, po = 0.5 -> 0/0.5 = 0
    assert(r2.getDouble(2) == 0.0, r2.toString)
  }

  test("rankingMetrics: recall@k and MRR hand-computed, missing queries zero") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 21L, 2))
      .toDF("query_id", "corpus_id", "rank")
    // q1: finds truth#1 at rank 2 and truth#2 at rank 1 -> recall 1,
    // mrr 1/2; q2: finds neither -> recall 0, mrr 0
    val found = Seq((1L, 11L, 1), (1L, 10L, 2), (2L, 99L, 1), (2L, 98L, 2))
      .toDF("query_id", "corpus_id", "rank")
    val got = Eval.rankingMetrics(found, truth, k = 2)
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((1.0, 0.5)), 2L -> ((0.0, 0.0))), got.toString)
  }
  test("rankingMetrics divides recall by the actual truth-list size") {
    // q1 has only ONE true neighbor (|truth| < k): finding it must be
    // recall 1.0, not 1/k; q2 appears only on the found side, so the
    // denominator falls back to k and recall is 0 (not 0/0)
    val truth = Seq((1L, 10L, 1)).toDF("query_id", "corpus_id", "rank")
    val found = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
      .toDF("query_id", "corpus_id", "rank")
    val got = Eval.rankingMetrics(found, truth, k = 3)
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((1.0, 1.0)), 2L -> ((0.0, 0.0))), got.toString)
  }

  test("ndcg: perfect order 1.0, position swaps discount, misses score 0") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2),
      (2L, 20L, 1), (2L, 21L, 2),
      (3L, 30L, 1)).toDF("query_id", "corpus_id", "rank")
    val found = Seq(
      (1L, 10L, 1), (1L, 11L, 2),   // q1: truth order exactly -> 1.0
      (2L, 21L, 1), (2L, 20L, 2),   // q2: swapped -> < 1.0
      (3L, 99L, 1)                  // q3: nothing relevant -> 0.0
    ).toDF("query_id", "corpus_id", "rank")
    val got = Eval.ndcg(found, truth, k = 2)
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 1.0, got.toString)
    // q2: rel(21)=1 at pos 1, rel(20)=2 at pos 2
    //   dcg  = 1/log2(2) + 2/log2(3); idcg = 2/log2(2) + 1/log2(3)
    val dcg = 1.0 / 1.0 + 2.0 / (math.log(3) / math.log(2))
    val idcg = 2.0 / 1.0 + 1.0 / (math.log(3) / math.log(2))
    assert(got(2L) == math.rint(dcg / idcg * 1e4) / 1e4, got.toString)
    assert(got(3L) == 0.0, got.toString)
  }

  test("ndcg stays in [0,1] when truth ranks are non-contiguous") {
    // a filtered truth ranking whose ranks don't start at 1: the
    // ideal re-packs relevance to positions 1..n, so finding the only
    // true item first is STILL 1.0 (raw-rank idcg would yield 2.0)
    val truth = Seq((1L, 10L, 3)).toDF("query_id", "corpus_id", "rank")
    val found = Seq((1L, 10L, 1)).toDF("query_id", "corpus_id", "rank")
    val got = Eval.ndcg(found, truth, k = 5)
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0), got.toString)
  }

  test("ndcg: short truth list can still reach 1; empty truth scores 0") {
    // q1 has ONE true neighbor; finding it first is ideal -> 1.0 even
    // though k=3. q2 exists only on the found side -> idcg 0 -> 0.0.
    val truth = Seq((1L, 10L, 1)).toDF("query_id", "corpus_id", "rank")
    val found = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
      .toDF("query_id", "corpus_id", "rank")
    val got = Eval.ndcg(found, truth, k = 3)
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 0.0), got.toString)
  }
}
