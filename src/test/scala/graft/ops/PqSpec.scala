package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PqSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // deterministic corpus with planted structure: 0 and 50 identical,
  // 1 a small perturbation of 0, the rest independent gaussians
  private lazy val vecs = {
    val rnd = new scala.util.Random(13)
    val v0 = Array.fill(32)(rnd.nextGaussian().toFloat)
    val v1 = v0.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    val rest = (2 until 50).map(i => (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat)))
    (Seq((0L, v0), (1L, v1), (50L, v0.clone())) ++ rest)
      .map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  private lazy val model = Pq.train(vecs, m = 8, k = 16, iters = 8)

  test("codes are m bytes and encoding is deterministic") {
    val enc = Pq.encode(vecs, model)
    val codes = enc.select($"vec_id", $"pq_code").as[(Long, Array[Byte])]
      .collect().toMap
    assert(codes.values.forall(_.length == 8))
    assert(codes(0L).sameElements(codes(50L)), "identical vectors share a code")
    val again = Pq.encode(vecs, Pq.train(vecs, m = 8, k = 16, iters = 8))
      .select($"vec_id", $"pq_code").as[(Long, Array[Byte])].collect().toMap
    assert(codes.keySet == again.keySet &&
      codes.forall { case (id, c) => c.sameElements(again(id)) },
      "train+encode must be run-to-run deterministic")
  }

  test("ADC inner product equals dot against the reconstruction") {
    val probe = vecs.filter($"vec_id" === 3L)
      .select(transform($"embedding", x => x.cast("double")))
      .as[Seq[Double]].collect()(0).toArray
    val lut = model.adcTable(probe)
    val enc = Pq.encode(vecs, model)
      .select($"vec_id", $"pq_code").as[(Long, Array[Byte])].collect()
    // Spark-side codegen expression vs driver-side reconstruction math
    val sparkAdc = Pq.encode(vecs, model)
      .withColumn("__lut", lit(lut))
      .select($"vec_id", graft.functions.VectorExpressions
        .pq_adc_ip($"pq_code", $"__lut", model.k).as("ip"))
      .as[(Long, Double)].collect().toMap
    enc.foreach { case (id, code) =>
      val rec = model.reconstruct(code)
      val expect = rec.zip(probe).map { case (a, b) => a * b }.sum
      assert(math.abs(sparkAdc(id) - expect) < 1e-9,
        s"ADC mismatch for vec $id")
    }
  }

  test("search ranks the identical vector first with cosine 1") {
    val top = Pq.search(vecs, vecs.filter($"vec_id" === 0L), topK = 3,
        m = 8, k = 16)
      .orderBy("rank").as[(Long, Long, Int, Double)].collect()
    assert(top(0)._2 == 50L && math.abs(top(0)._4 - 1.0) < 1e-6)
    assert(top(1)._2 == 1L, "perturbed copy should be 2nd after exact re-rank")
  }

  test("full-shortlist search reproduces brute force exactly") {
    // shortlist >= corpus makes the ADC stage a no-op filter; the
    // exact re-rank must then equal bruteForceTopK bit for bit
    val probes = vecs.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(vecs, probes, 5)
      .as[(Long, Long, Int, Double)].collect().toSet
    val pq = Pq.search(vecs, probes, topK = 5, m = 8, k = 16, shortlist = 1000)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(pq == exact)
  }

  test("recall@5 against brute force on gaussian data meets the bench gate") {
    val probes = vecs.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(vecs, probes, 5)
      .groupBy($"query_id").agg(min($"cosine").as("kth"))
      .as[(Long, Double)].collect().toMap
    val got = Pq.search(vecs, probes, topK = 5, m = 16, k = 16)
      .as[(Long, Long, Int, Double)].collect()
    val good = got.count { case (q, _, _, cos) => cos >= exact(q) - 1e-6 }
    assert(good.toDouble / (exact.size * 5) >= 0.8,
      s"aggregate recall@5 $good/${exact.size * 5} below 0.8")
  }

  test("IVF-PQ finds the planted duplicate and meets the recall gate") {
    val probes = vecs.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(vecs, probes, 5)
      .groupBy($"query_id").agg(min($"cosine").as("kth"))
      .as[(Long, Double)].collect().toMap
    val got = Pq.searchIvfPq(vecs, probes, topK = 5,
        kCells = 4, nProbe = 3, m = 16, k = 16, iters = 2)
      .as[(Long, Long, Int, Double)].collect()
    // probe 0's identical twin (50) must surface through the composed
    // path with exact cosine 1 after the re-rank
    val p0 = got.filter(_._1 == 0L).sortBy(_._3)
    assert(p0.head._2 == 50L && math.abs(p0.head._4 - 1.0) < 1e-6,
      s"planted dup must rank first: ${p0.toSeq}")
    val good = got.count { case (q, _, _, cos) => cos >= exact(q) - 1e-6 }
    assert(good.toDouble / (exact.size * 5) >= 0.8,
      s"aggregate recall@5 $good/${exact.size * 5} below 0.8")
  }

  test("null and zero-norm embeddings neither crash nor outrank real ones") {
    val weird = vecs.unionByName(Seq(
      (98L, Seq.fill(32)(0.0f)),
      (99L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val top = Pq.search(weird, weird.filter($"vec_id" === 0L), topK = 3,
        m = 8, k = 16)
      .as[(Long, Long, Int, Double)].collect()
    assert(top.length == 3)
    assert(!top.map(_._2).contains(98L) && !top.map(_._2).contains(99L))
  }
}
