package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TopKAggregatorSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("grouped top-k keeps the k best with deterministic tie-break") {
    val rows = Seq( // (group, (id, score))
      ("a", (1L, 0.5)), ("a", (2L, 0.9)), ("a", (3L, 0.7)), ("a", (4L, 0.9)),
      ("b", (5L, 0.1)))
      .toDF("g", "row").as[(String, (Long, Double))]
    val topk = new TopKAggregator(2).toColumn
    val out = rows.groupByKey(_._1).mapValues(_._2).agg(topk)
      .collect().toMap
    // score desc, id asc on ties: (2, .9) before (4, .9)
    assert(out("a") == Seq((2L, 0.9), (4L, 0.9)))
    assert(out("b") == Seq((5L, 0.1)))
  }

  test("merge across many partitions preserves global top-k") {
    val n = 10000
    val data = (1 to n).map(i => ("g", (i.toLong, (i % 997).toDouble))).toDF("g", "row")
      .repartition(8).as[(String, (Long, Double))]
    val out = data.groupByKey(_._1).mapValues(_._2)
      .agg(new TopKAggregator(3).toColumn).collect().head._2
    assert(out.map(_._2) == Seq(996.0, 996.0, 996.0))
    // ids ascending among the tied top scores
    assert(out.map(_._1) == out.map(_._1).sorted)
  }
}
