package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SqSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val dim = 8
  private val corpus = (0L until 50L).map(i =>
    (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
  private val corpusDf = corpus.toDF("vec_id", "embedding")

  test("train finds the global component range") {
    val r = Sq.train(Seq((1L, Array(0.25f, -0.5f)),
      (2L, Array(0.75f, 0.0f))).toDF("vec_id", "embedding"))
    assert(r.lo == -0.5 && r.hi == 0.75)
    assert(math.abs(r.step - 1.25 / 255.0) < 1e-12)
  }

  test("degenerate (constant) corpus rejected with a clear error") {
    intercept[IllegalArgumentException](
      Sq.train(Seq((1L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")))
  }

  test("codes are one byte per dimension; dequantization error <= step/2") {
    val range = Sq.train(corpusDf)
    val codes = Sq.encode(corpusDf, range).as[(Long, Array[Byte])]
      .collect().toMap
    assert(codes.values.forall(_.length == dim))
    corpus.foreach { case (id, vec) =>
      val c = codes(id)
      vec.zipWithIndex.foreach { case (x, i) =>
        val deq = range.lo + (c(i) & 0xff) * range.step
        assert(math.abs(deq - x) <= range.step / 2 + 1e-9,
          s"vec $id dim $i: $x vs $deq")
      }
    }
  }

  test("search ranking equals brute force over dequantized vectors") {
    val range = Sq.train(corpusDf)
    val probes = corpusDf.filter(col("vec_id") < 3)
    val got = Sq.search(corpusDf, probes, k = 4)
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    // reference: quantize in Scala with the same HALF_UP rule
    def deq(v: Array[Float]): Array[Double] = v.map { x =>
      val c = math.max(range.lo, math.min(range.hi, x.toDouble))
      range.lo + Math.round((c - range.lo) / range.step) * range.step
    }
    val want = (0L until 3L).flatMap { q =>
      val p = corpus(q.toInt)._2.map(_.toDouble)
      corpus.filter(_._1 != q)
        .map { case (id, v) =>
          (id, deq(v).zip(p).map { case (a, b) => a * b }.sum) }
        .sortBy { case (id, s) => (-s, id) }
        .take(4).zipWithIndex
        .map { case ((id, _), r) => (q, id, r + 1) }
    }.toSet
    assert(got == want)
  }

  test("self-matches excluded; probe side broadcast, codes stay binary") {
    val range = Sq.train(corpusDf)
    val codes = Sq.encode(corpusDf, range)
    val out = Sq.searchFromCodes(codes, corpusDf.filter(col("vec_id") === 0), 5, range)
    assert(!out.select("corpus_id").as[Long].collect().contains(0L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(plan.contains("sq_dot"), plan)
  }
}
