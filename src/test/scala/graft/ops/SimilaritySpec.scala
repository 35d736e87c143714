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
}
