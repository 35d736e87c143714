package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (the engine's UDAF surface, SURVEY §2.11):
  * keeps the k highest-scoring (id, score) pairs per group with a
  * bounded buffer, so a grouped top-k is one partial-aggregating
  * shuffle of at most k rows per group per map task — no per-group
  * sort of the full candidate set, unlike the window-rank formulation
  * (though Spark's WindowGroupLimit closes most of that gap).
  *
  * Usage:
  * {{{
  * val topk = new TopKAggregator(5).toColumn
  * ds.groupByKey(_.queryId).agg(topk)
  * }}}
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  require(k > 0)

  override def zero: Seq[(Long, Double)] = Vector.empty

  private def trim(buf: Seq[(Long, Double)]): Seq[(Long, Double)] =
    // descending score, ascending id tie-break — total order for
    // deterministic results
    buf.sortBy { case (id, s) => (-s, id) }.take(k)

  override def reduce(buf: Seq[(Long, Double)], row: (Long, Double)): Seq[(Long, Double)] = {
    val appended = buf :+ row
    // amortize: only sort-trim when the buffer doubles past k
    if (appended.length >= 2 * k) trim(appended) else appended
  }

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufferEncoder
}
