package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class IvfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // two well-separated clusters + an identical pair inside cluster A
  private lazy val vecs = {
    val rnd = new scala.util.Random(11)
    def around(center: Array[Double], jitter: Double) =
      center.map(c => (c + jitter * rnd.nextGaussian()).toFloat).toSeq
    val a = Array.fill(8)(rnd.nextGaussian() + 5.0)
    val b = Array.fill(8)(rnd.nextGaussian() - 5.0)
    val rows =
      (0L until 10L).map(i => (i, around(a, 0.2))) ++
      (10L until 20L).map(i => (i, around(b, 0.2))) :+
      (99L, around(a, 0.0)) // another A-cluster member
    rows.toDF("vec_id", "embedding")
  }

  test("build produces k centroids and assigns every vector") {
    val idx = Ivf.build(vecs, k = 2, iters = 4)
    assert(idx.centroids.count() == 2)
    assert(idx.assignments.count() == vecs.count())
    // the two planted clusters must separate
    val byCluster = idx.assignments
      .withColumn("expected", when(col("vec_id") < 10 || col("vec_id") === 99, "A").otherwise("B"))
      .groupBy("expected").agg(countDistinct("centroid_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(byCluster("A") == 1 && byCluster("B") == 1,
      s"each planted cluster should map to exactly one centroid: $byCluster")
  }

  test("codegen ranker matches the closure (CentroidTopIds parity)") {
    // the round-16 codegen E-step must reproduce the reference closure
    // BIT-FOR-BIT: same dots, same hoisted centroid norms, same
    // (cos desc, id asc) tie-breaks — on awkward inputs too (zero
    // vector, duplicate centroids that force ties)
    val rnd = new scala.util.Random(7)
    val cen: Ivf.Cen = Array.tabulate(5)(i =>
      (i, if (i == 4) Array.fill(8)(0.25) // duplicate of nothing; ties via zero vec
          else Array.fill(8)(rnd.nextDouble() - 0.5)))
    val dupCen: Ivf.Cen = cen.updated(3, (3, cen(1)._2.clone())) // exact tie 1 vs 3
    val rows = (0 until 50).map(i =>
      (i.toLong, if (i == 13) Seq.fill(8)(0.0) // zero-norm row
                 else Seq.fill(8)(rnd.nextDouble() - 0.5))) :+
      (50L, Seq.fill(8)(0.25)) // exact cosine-1 hit on centroid 4
    val df = rows.toDF("vec_id", "embedding")
    for (c <- Seq(cen, dupCen); m <- Seq(1, 3, 5)) {
      val ranker = Ivf.rankedCentroids(c)
      val expected = rows.map { case (id, v) => id -> ranker(v).take(m).toSeq }.toMap
      val cents = c.sortBy(_._1).map(_._2)
      val got = df.select(col("vec_id"),
          graft.functions.VectorExpressions.centroid_top_ids(
            col("embedding").cast("array<double>"), cents, m).as("ids"))
        .as[(Long, Seq[Int])].collect().toMap
      rows.foreach { case (id, _) =>
        assert(got(id) == expected(id), s"m=$m id=$id: ${got(id)} vs ${expected(id)}")
      }
    }
  }

  test("search finds same-cluster neighbors and matches brute force on top-1") {
    val idx = Ivf.build(vecs, k = 2, iters = 4)
    val probes = vecs.filter($"vec_id" === 0)
    val ivfTop = Ivf.search(idx, probes, topK = 3, nProbe = 1)
      .orderBy("rank").as[(Long, Long, Int, Double)].collect()
    val bruteTop = Similarity.bruteForceTopK(vecs, probes, 3)
      .orderBy("rank").as[(Long, Long, Int, Double)].collect()
    assert(ivfTop.nonEmpty)
    // nProbe=1 still searches the probe's own cluster, which contains
    // all true nearest neighbors in this construction
    assert(ivfTop.map(_._2).toSeq == bruteTop.map(_._2).toSeq,
      s"ivf=${ivfTop.toSeq} brute=${bruteTop.toSeq}")
  }
}
