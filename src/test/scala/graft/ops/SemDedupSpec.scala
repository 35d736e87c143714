package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SemDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Planted semantic-duplicate corpus — SemDeDup's intended regime:
    * 4 tight clusters of near-identical vectors (cosine ~0.999 within,
    * ~orthogonal-ish across) in 8 dims.
    */
  private def planted = {
    val rnd = new scala.util.Random(7)
    val bases = Seq.fill(4)(Array.fill(8)(rnd.nextGaussian()))
    val rows = for {
      (base, c) <- bases.zipWithIndex
      i <- 0 until 5
    } yield {
      val v = base.map(x => x + rnd.nextGaussian() * 0.01)
      ((c * 5 + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("recall is total on clustered data (the intended regime)") {
    val emb = planted
    val exact = Similarity.exactNearDupPairs(emb, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size == 4 * (5 * 4 / 2), s"fixture: ${exact.size} true pairs")
    val found = SemDedup.nearDupPairs(emb, threshold = 0.95, k = 4, iters = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found == exact) // recall 1 AND precision 1
  }

  test("found pairs are always a subset of the exact pair set") {
    val emb = planted
    val exact = Similarity.exactNearDupPairs(emb, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // deliberately bad clustering (k too high for the data) may lose
    // recall but can never emit a pair below the threshold
    val found = SemDedup.nearDupPairs(emb, threshold = 0.9, k = 8, iters = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found.subsetOf(exact))
  }

  test("multi-probe assignment widens candidates, never duplicates pairs") {
    val emb = planted
    val found = SemDedup.nearDupPairs(emb, threshold = 0.95, k = 4, iters = 3,
      assignM = 2)
    assert(found.count() == found.select("id_a", "id_b").distinct().count())
    val exact = Similarity.exactNearDupPairs(emb, threshold = 0.95)
    assert(found.count() == exact.count())
  }

  test("dedup keeps exactly one representative (the min id) per cluster") {
    val emb = planted
    val kept = SemDedup.dedup(emb, threshold = 0.95, k = 4, iters = 3)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 5L, 10L, 15L))
  }
}
