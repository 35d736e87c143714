package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed element-wise mean aggregator over embedding vectors — the
  * pooling step of embedding pipelines (chunk embeddings → document
  * embedding, member embeddings → cluster centroid, class prototype
  * construction).
  *
  * Why an Aggregator and not posexplode + groupBy(group, dim) + avg:
  * the explode shape shuffles `dim` rows PER VECTOR (a 64-dim corpus
  * shuffles 64× its row count) and regroups them; this aggregator
  * partially aggregates map-side into one (sums[dim], count) buffer
  * per group per task, so the shuffle carries one buffer per
  * group-task pair — the same bounded-buffer story as
  * [[TopKAggregator]]. Accumulation is double regardless of the
  * input's float width.
  *
  * Usage:
  * {{{
  * val pool = new VectorMeanAggregator(64).toColumn
  * ds.groupByKey(_.label).agg(pool)   // (label, Array[Double])
  * }}}
  */
class VectorMeanAggregator(dim: Int)
  extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  require(dim > 0)

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long),
                      v: Array[Float]): (Array[Double], Long) = {
    // null vectors are SKIPPED (avg-over-present semantics, matching
    // SQL avg's null handling) rather than aborting the job; a
    // wrong-WIDTH vector still fails loudly — silent truncation or
    // padding would corrupt every mean in the group
    if (v == null) return b
    require(v.length == dim, s"expected dim $dim, got ${v.length}")
    var i = 0
    while (i < dim) { b._1(i) += v(i); i += 1 }
    (b._1, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long),
                     b: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(b: (Array[Double], Long)): Array[Double] =
    if (b._2 == 0L) null
    else {
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) { out(i) = b._1(i) / b._2; i += 1 }
      out
    }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
