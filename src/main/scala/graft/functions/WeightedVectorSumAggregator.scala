package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed weighted vector sum: given (vector, weight) rows, accumulate
  * (sum_i w_i * x_i, sum_i w_i) in ONE pass — the kernel of every
  * "combine rows scaled by a per-row scalar" reduction (power-iteration
  * matvec against a covariance the data never materializes, weighted
  * centroids, attention-style pooling).
  *
  * Same bounded-buffer economics as [[VectorMeanAggregator]]: partial
  * aggregation map-side into one (dim doubles + 1) buffer per task, so
  * the shuffle carries buffers, never row vectors — a posexplode +
  * groupBy(dim) formulation would shuffle dim rows per input vector.
  * Null vectors are skipped (their weight doesn't count); a
  * wrong-width vector fails loudly.
  */
class WeightedVectorSumAggregator(dim: Int)
  extends Aggregator[(Array[Float], Double), (Array[Double], Double),
    (Array[Double], Double)] {

  require(dim > 0)

  override def zero: (Array[Double], Double) = (new Array[Double](dim), 0.0)

  override def reduce(b: (Array[Double], Double),
                      in: (Array[Float], Double)): (Array[Double], Double) = {
    val (v, w) = in
    if (v == null) return b
    require(v.length == dim, s"expected dim $dim, got ${v.length}")
    var i = 0
    while (i < dim) { b._1(i) += v(i) * w; i += 1 }
    (b._1, b._2 + w)
  }

  override def merge(a: (Array[Double], Double),
                     b: (Array[Double], Double)): (Array[Double], Double) = {
    var i = 0
    while (i < dim) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(b: (Array[Double], Double)): (Array[Double], Double) = b

  override def bufferEncoder: Encoder[(Array[Double], Double)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Double)]()

  override def outputEncoder: Encoder[(Array[Double], Double)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Double)]()
}
