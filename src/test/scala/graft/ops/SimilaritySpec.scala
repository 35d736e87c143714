package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // deterministic corpus: vec 0 and 10 identical, 1 close to 0, rest spread
  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    val v0 = Array.fill(16)(rnd.nextGaussian().toFloat)
    val v1 = v0.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    val rest = (2 until 10).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    (Seq((0L, v0), (1L, v1), (10L, v0.clone())) ++ rest)
      .map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  test("dot/norm/cosine expressions agree with manual computation") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(
      Similarity.dot(col("a"), col("b")),
      Similarity.norm(col("a")),
      Similarity.cosine(col("a"), col("b"))).collect()(0)
    assert(math.abs(r.getDouble(0) - 32.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-9)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-9)
  }

  test("vector expressions handle double arrays too") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b")
    assert(df.select(Similarity.dot(col("a"), col("b"))).as[Double].collect()(0) == 0.0)
  }

  test("bruteForceTopK: identical vector is rank 1 with cosine 1") {
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), 3)
      .orderBy("rank").as[(Long, Long, Int, Double)].collect()
    assert(top(0)._2 == 10L && math.abs(top(0)._4 - 1.0) < 1e-6)
    assert(top(1)._2 == 1L, "perturbed copy should be 2nd")
  }

  test("filteredTopK searches survivors only: the excluded twin cannot rank") {
    val labeled = vecs.withColumn("label",
      when($"vec_id" === 10L, 1).otherwise(3))
    // exclude label=1 (the identical twin of probe 0): it must vanish
    // from the ranking; the perturbed copy (id 1, label 3) becomes #1
    val top = Similarity.filteredTopK(labeled, $"label" === 3,
        labeled.filter($"vec_id" === 0), 3)
      .orderBy("rank")
      .select("corpus_id").as[Long].collect()
    assert(!top.contains(10L), s"filtered-out twin leaked into $top")
    assert(top.head == 1L, s"perturbed copy should lead after the filter: $top")
    // parity with brute force over the pre-filtered frame
    val manual = Similarity.bruteForceTopK(
        labeled.filter($"label" === 3), labeled.filter($"vec_id" === 0), 3)
      .orderBy("rank").select("corpus_id").as[Long].collect()
    assert(top.toSeq == manual.toSeq)
  }

  test("exactNearDupPairs finds the planted identical pair") {
    val pairs = Similarity.exactNearDupPairs(vecs, 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 10L)))
  }

  test("lshTopK finds the identical vector (recall on the easy case)") {
    val top = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 0), 3,
        nBits = 8, nTables = 4)
      .filter($"rank" === 1).as[(Long, Long, Int, Double)].collect()
    assert(top.nonEmpty && top(0)._2 == 10L,
      s"identical vector shares every bucket; got ${top.toSeq}")
  }

  test("cosineNearDups (LSH) finds the planted pair") {
    val pairs = Similarity.cosineNearDups(vecs, 0.99, nBits = 8, nTables = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 10L)))
  }

  // ---- adversarial inputs (round-6 brief: degenerate-corpus hazards) ----

  test("adversarial: zero-norm vectors never out-rank or near-dup-match anything") {
    // 0/0 cosine is NaN, and Spark orders NaN above every number — an
    // unguarded plan ranks the zero vector first and emits it from every
    // >= threshold gate. safeCosine pins direction-less vectors to 0.
    val withZero = vecs.unionByName(
      Seq((99L, Seq.fill(16)(0.0f))).toDF("vec_id", "embedding"))
    val top = Similarity.bruteForceTopK(withZero, withZero.filter($"vec_id" === 0), 3)
      .orderBy("rank").as[(Long, Long, Int, Double)].collect()
    assert(top.take(2).map(_._2).toSeq == Seq(10L, 1L),
      s"zero vector must not out-rank genuine neighbors: ${top.toSeq}")
    assert(top.forall(r => !r._4.isNaN), s"NaN cosine leaked: ${top.toSeq}")
    val pairs = Similarity.exactNearDupPairs(withZero, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(!pairs.exists(p => p._1 == 99L || p._2 == 99L),
      s"zero vector emitted as near-dup: ${pairs.toSeq}")
    val lshPairs = Similarity.cosineNearDups(withZero, 0.4, nBits = 8, nTables = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(!lshPairs.exists(p => p._1 == 99L || p._2 == 99L))
    // a zero-vector PROBE gets answers (all cosine 0), never NaN
    val zp = Similarity.bruteForceTopK(withZero, withZero.filter($"vec_id" === 99L), 2)
      .as[(Long, Long, Int, Double)].collect()
    assert(zp.length == 2 && zp.forall(r => r._4 == 0.0), zp.toSeq.toString)
  }

  test("adversarial: all-zero corpus yields no near-dup pairs anywhere") {
    val zeros = (0L until 8L).map(i => (i, Seq.fill(8)(0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.exactNearDupPairs(zeros, 0.1).count() == 0)
    assert(Similarity.cosineNearDups(zeros, 0.1, nBits = 8, nTables = 2).count() == 0)
    assert(SemDedup.nearDupPairs(zeros, 0.1, k = 2, iters = 1).count() == 0)
  }

  test("adversarial: knnClassify with zero-norm and duplicate vectors stays total") {
    val seed = Seq(
      (0L, 1, Seq(1f, 0f)), (1L, 1, Seq(1f, 0f)),      // duplicate seeds
      (2L, 2, Seq(0f, 1f)), (3L, 2, Seq(0f, 0f)))      // zero-norm seed
      .toDF("vec_id", "label", "embedding")
    val pool = Seq((10L, Seq(1f, 0.1f)), (11L, Seq(0f, 0f)))  // zero-norm probe
      .toDF("vec_id", "embedding")
    val out = Similarity.knnClassify(seed, pool, k = 3)
      .select("vec_id", "pred_label").as[(Long, Int)].collect().toMap
    // probe 10: neighbors 0,1 (cos~1, label 1) + 2 -> majority 1
    assert(out(10L) == 1, out.toString)
    // zero-norm probe: all cosines 0, rank ties by seed id -> seeds
    // 0,1,2 vote -> label 1 majority; must not throw
    assert(out(11L) == 1, out.toString)
  }

  test("rrfFuse rewards presence in both lists; ties break by id") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rank")
    val b = Seq((11L, 1L), (13L, 2L)).toDF("id", "rank")
    val got = Similarity.rrfFuse(Seq(a, b), "id", k = 10)
      .select("id", "n_lists", "rank").as[(Long, Long, Long)].collect().toSeq
    // 11 appears in both lists (1/62 + 1/61) and must rank first;
    // 10 (1/61) beats 13 (1/62) beats 12 (1/63)
    assert(got == Seq((11L, 2L, 1L), (10L, 1L, 2L), (13L, 1L, 3L), (12L, 1L, 4L)),
      got.toString)
    // identical contributions tie-break by id
    val t1 = Seq((5L, 1L)).toDF("id", "rank")
    val t2 = Seq((3L, 1L)).toDF("id", "rank")
    val tied = Similarity.rrfFuse(Seq(t1, t2), "id", k = 2)
      .select("id", "rank").as[(Long, Long)].collect().toSeq
    assert(tied == Seq((3L, 1L), (5L, 2L)), tied.toString)
  }

  test("truncatedTopK with full shortlist reproduces brute force exactly") {
    // shortlist = corpus size makes stage 1 lossless, so the two-stage
    // result must equal single-stage brute force rank for rank
    val probes = vecs.filter($"vec_id" < 3)
    val twoStage = Similarity.truncatedTopK(vecs, probes, k = 4,
        dPrefix = 8, shortlist = 100)
      .as[(Long, Long, Int)].collect().toSet
    val oneStage = Similarity.bruteForceTopK(vecs, probes, 4)
      .select($"query_id", $"corpus_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(twoStage == oneStage, s"lossless shortlist must agree")
    // identical vector survives any truncation: rank 1 via prefix too
    val top = Similarity.truncatedTopK(vecs, vecs.filter($"vec_id" === 0),
        k = 1, dPrefix = 4, shortlist = 3)
      .as[(Long, Long, Int)].collect()
    assert(top.length == 1 && top.head._3 == 1)
  }

  test("knnClassify transfers the majority seed label, deterministic ties") {
    // two clean clusters on orthogonal axes: label 1 along e1, label 2
    // along e2; pool points near an axis must adopt that axis's label
    def v(x: Float, y: Float, z: Float) = Seq(x, y, z)
    val seed = Seq(
      (0L, 1, v(1f, 0f, 0f)), (1L, 1, v(0.9f, 0.1f, 0f)), (2L, 1, v(1f, 0.05f, 0f)),
      (3L, 2, v(0f, 1f, 0f)), (4L, 2, v(0.1f, 0.9f, 0f)), (5L, 2, v(0f, 1f, 0.05f)))
      .toDF("vec_id", "label", "embedding")
    val pool = Seq(
      (10L, v(0.95f, 0.02f, 0f)),  // clearly label 1
      (11L, v(0.03f, 0.97f, 0f)))  // clearly label 2
      .toDF("vec_id", "embedding")
    val out = Similarity.knnClassify(seed, pool, k = 3)
      .select("vec_id", "pred_label", "votes", "vote_frac")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => r._1 -> r._2).toSeq == Seq(10L -> 1, 11L -> 2), out.toSeq)
    assert(out.forall(r => r._3 == 3L && r._4 == 1.0), out.toSeq)
    // vote tie at k=2 (one neighbor per cluster): smallest label wins
    val mid = Seq((20L, v(0.7f, 0.7f, 0f))).toDF("vec_id", "embedding")
    val tied = Similarity.knnClassify(seed, mid, k = 2)
      .select("pred_label", "votes").as[(Int, Long)].head()
    assert(tied == ((1, 1L)), tied.toString)
  }

  test("knnClassify plan: seed broadcasts, rank is group-limited before the exchange") {
    val seed = vecs.withColumn("label", (col("vec_id") % 3).cast("int"))
    val out = Similarity.knnClassify(seed, vecs.withColumn("vec_id", col("vec_id") + 100L), k = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
    // the rank window is the measured-best shape (typed-aggregator and
    // rowwise-HOF alternatives both lost — see the operator's note);
    // WindowGroupLimit trimming to k pre-exchange is what makes it so
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("adversarial: SemDedup on an all-identical corpus (one semantic cluster)") {
    // the documented degenerate case: every vector lands in one cluster,
    // so the intra-cluster stage IS the global quadratic — it must stay
    // total and exact, and dedup must keep exactly one representative
    val one = Seq.fill(16)(0.5f)
    val same = (0L until 12L).map(i => (i, one)).toDF("vec_id", "embedding")
    val pairs = SemDedup.nearDupPairs(same, 0.9, k = 4, iters = 1)
      .as[(Long, Long, Double)].collect()
    assert(pairs.length == 12 * 11 / 2, s"all pairs expected, got ${pairs.length}")
    assert(pairs.forall(_._3 == 1.0))
    val kept = SemDedup.dedup(same, 0.9, k = 4, iters = 1)
      .select("vec_id").as[Long].collect().toSeq
    assert(kept == Seq(0L), s"one representative must survive: $kept")
  }

  test("adversarial: NULL embeddings rank below every real candidate, not at 0") {
    // null norms must stay NULL through safeCosine — desc ordering puts
    // NULLS LAST; pinning them to 0.0 would out-rank genuinely
    // negative-cosine neighbors with a row that has no embedding at all
    val withNull = vecs.unionByName(
      Seq((98L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val k = withNull.count().toInt // ask for everything: null must be last
    val top = Similarity.bruteForceTopK(withNull, withNull.filter($"vec_id" === 0), k)
      .orderBy("rank").collect() // Row-typed: the null cosine is the point
    assert(top.map(_.getLong(1)).contains(98L), "null row still appears when k covers all")
    assert(top.last.getLong(1) == 98L, s"null embedding must rank last: ${top.toSeq}")
    assert(top.last.isNullAt(3), s"its cosine must be NULL, not 0: ${top.last}")
    val pairs = Similarity.exactNearDupPairs(withNull, -1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(!pairs.exists(p => p._1 == 98L || p._2 == 98L),
      "NULL cosine must not satisfy any threshold gate")
  }

  test("adversarial: single-row and empty corpora are total everywhere") {
    val single = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val empty = single.filter($"vec_id" < 0)
    assert(Similarity.exactNearDupPairs(single, 0.1).count() == 0)
    assert(Similarity.bruteForceTopK(single, single, 3).count() == 0,
      "self-match excluded, no other candidates")
    assert(Similarity.exactNearDupPairs(empty, 0.1).count() == 0)
    assert(Similarity.lshTopK(empty, single, 3).count() == 0)
    assert(Similarity.cosineNearDups(empty, 0.1).count() == 0)
  }

  test("meanPool averages element-wise per group in double precision") {
    val df = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)),
      (0L, Array(3.0f, 2.0f, 1.0f)),
      (1L, Array(10.0f, 0.0f, -4.0f)))
      .toDF("label", "embedding")
    val got = Similarity.meanPool(df, "label", "embedding", dim = 3)
      .as[(Long, Array[Double])].collect().map(r => r._1 -> r._2.toSeq).toMap
    assert(got(0L) == Seq(2.0, 2.0, 2.0))
    assert(got(1L) == Seq(10.0, 0.0, -4.0))
  }

  test("meanPool drops null keys/vectors instead of aborting the job") {
    val rows: Seq[(java.lang.Long, Array[Float])] = Seq(
      (1L: java.lang.Long, Array(2.0f, 4.0f)),
      (1L: java.lang.Long, null),              // null vector: skipped
      (null, Array(9.0f, 9.0f)))               // null key: dropped
    val df = rows.toDF("label", "embedding")
    val got = Similarity.meanPool(df, "label", "embedding", dim = 2)
      .as[(Long, Array[Double])].collect().map(r => r._1 -> r._2.toSeq).toMap
    assert(got == Map(1L -> Seq(2.0, 4.0)), s"got $got")
  }

  test("mmrRerank demotes a near-duplicate of the top result") {
    // candidate 2 is almost identical to top-scored candidate 1 —
    // plain score order would rank it second; MMR must prefer the
    // orthogonal candidate 3 at rank 2
    val cands = Seq(
      (7L, 1L, 0.99, Array(1.0, 0.0, 0.0)),
      (7L, 2L, 0.98, Array(0.999, 0.04, 0.0)),
      (7L, 3L, 0.60, Array(0.0, 1.0, 0.0)))
      .toDF("query_id", "corpus_id", "score", "embedding")
    val got = Similarity.mmrRerank(cands, lambda = 0.5, k = 3)
      .orderBy("rank").select("corpus_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L, 2L), got.toString)
  }

  test("mmrRerank: lambda=1 is pure score order; truncates at the candidate count") {
    val cands = Seq(
      (1L, 10L, 0.5, Array(1.0, 0.0)),
      (1L, 11L, 0.9, Array(1.0, 0.0)))
      .toDF("query_id", "corpus_id", "score", "embedding")
    val got = Similarity.mmrRerank(cands, lambda = 1.0, k = 5)
      .orderBy("rank").select("corpus_id", "rank")
      .as[(Long, Int)].collect().toSeq
    assert(got == Seq((11L, 1), (10L, 2)), got.toString)
  }

  test("mmrRerank ties break on corpus id, groups stay independent") {
    val cands = Seq(
      (1L, 5L, 0.8, Array(1.0, 0.0)), (1L, 3L, 0.8, Array(0.0, 1.0)),
      (2L, 9L, 0.7, Array(1.0, 0.0)))
      .toDF("query_id", "corpus_id", "score", "embedding")
    val got = Similarity.mmrRerank(cands, lambda = 0.7, k = 2)
      .orderBy("query_id", "rank")
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 3L, 1), (1L, 5L, 2), (2L, 9L, 1)), got.toString)
  }

  test("meanPool is partition-invariant (partial aggregation merges)") {
    val df = (1 to 100)
      .map(i => ((i % 4).toLong, Array(i.toFloat, (i * 2).toFloat)))
      .toDF("label", "embedding")
    val a = Similarity.meanPool(df, "label", "embedding", dim = 2)
      .as[(Long, Array[Double])].collect().map(r => r._1 -> r._2.toSeq).toMap
    val b = Similarity.meanPool(df.repartition(13), "label", "embedding", dim = 2)
      .as[(Long, Array[Double])].collect().map(r => r._1 -> r._2.toSeq).toMap
    // integer-valued floats sum exactly in double: bit-equal means
    assert(a == b)
  }

  test("hardNegatives excludes self and same-label, ranks by similarity") {
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f), 0),      // anchor
      (2L, Seq(1.0f, 0.01f), 0),     // most similar but SAME label
      (3L, Seq(0.9f, 0.1f), 1),      // closest negative -> rank 1
      (4L, Seq(0.0f, 1.0f), 1),      // orthogonal negative -> rank 2
      (5L, Seq(1.0f, 0.0f), 1))      // identical vector, different id
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(rows,
        rows.filter(col("vec_id") === 1), k = 3)
      .as[(Long, Int, Long, Int, Int)].collect().toSeq
    // 5 is cosine 1.0 (rank 1), then 3, then 4; 2 never appears
    assert(got == Seq((1L, 0, 5L, 1, 1), (1L, 0, 3L, 1, 2),
      (1L, 0, 4L, 1, 3)), got.toString)
  }

  test("corpusStats: hand norms; colinear corpus anisotropy 1, opposed 0") {
    val colinear = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(6.0f, 8.0f)))
      .toDF("vec_id", "embedding")
    val Array(r) = Similarity.corpusStats(colinear, "embedding", dim = 2)
      .collect()
    // norms 5 and 10; centroid (4.5, 6) has norm 7.5 = mean norm
    assert(r.getLong(0) == 2 && r.getLong(1) == 2, r.toString)
    assert(r.getDouble(2) == 7.5 && r.getDouble(3) == 5.0 &&
      r.getDouble(4) == 10.0, r.toString)
    assert(r.getDouble(5) == 7.5 && r.getDouble(6) == 1.0, r.toString)
    val opposed = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val Array(o) = Similarity.corpusStats(opposed, "embedding", dim = 2)
      .collect()
    assert(o.getDouble(5) == 0.0 && o.getDouble(6) == 0.0, o.toString)
  }
}
