package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.vector_dot
import graft.functions.WeightedVectorSumAggregator

/** Distributed dominant principal component by power iteration — the
  * embedding-pipeline diagnostic/repair primitive (anisotropy removal
  * per Mu & Viswanath 2018 "All-but-the-Top", collapse detection,
  * whitening) computed WITHOUT ever materializing the d×d covariance
  * or shuffling per-dimension rows.
  *
  * The matvec trick: C·v for the (uncentered-data, centered-mean)
  * covariance C = (1/n) Σ (x_i - μ)(x_i - μ)ᵀ needs only
  *   Σ_i x_i·c_i  -  μ·(Σ_i c_i),   c_i = x_i·v - μ·v
  * i.e. ONE scan computing a per-row scalar (codegen `vector_dot`
  * against the broadcast iterate) and one (dim+1)-double aggregation
  * buffer ([[WeightedVectorSumAggregator]]) — per iteration the
  * cluster moves O(dim) bytes per task, never O(n·dim). The iterate
  * itself is O(dim) driver state, the same driver-scalar posture as
  * the PQ codebook Lloyd loop.
  *
  * Determinism (the [[Graph.pageRank]] recurrence contract): v₀ =
  * 1/sqrt(dim) on every coordinate (exactly representable for
  * power-of-two dims), μ and each normalized iterate round to 8dp —
  * any engine replaying the same rounded recurrence agrees to well
  * beyond the 6dp surface. Power iteration converges to the dominant
  * eigenvector at rate (λ₂/λ₁)^t; `iters` is fixed (bounded
  * supersteps), so the result is "the t-step power-iteration
  * estimate", exactly replayable, converged or not.
  */
object Pca {

  /** One row per dimension: (dim_idx, loading 6dp) of the dominant
    * component after `iters` rounds, plus the (repeated) eigenvalue
    * estimate λ = Σc²/n and explained-variance ratio λ/tr(C), 6dp.
    */
  def dominantComponent(emb: DataFrame, vecCol: String, dim: Int,
                        iters: Int): DataFrame = {
    require(dim > 0 && iters >= 1 && iters <= 64, "dim > 0, iters in [1,64]")
    val spark = emb.sparkSession
    import spark.implicits._
    def r8(x: Double): Double = math.floor(x * 1e8 + 0.5) / 1e8

    // vectors only, pinned: consumed iters + 2 times
    val xs = emb.select(col(vecCol).as("__v")).localCheckpoint()
    val n = xs.count()
    require(n > 0, "empty embedding table")

    // μ (8dp) and tr(C) = Σ|x|²/n − |μ|² from one stats pass each
    val mu: Array[Double] = xs.as[Array[Float]]
      .select(new graft.functions.VectorMeanAggregator(dim).toColumn)
      .head().map(r8)
    val sumSq = xs.agg(sum(vector_dot(col("__v"), col("__v"))))
      .head().getDouble(0)
    val muSq = mu.map(m => m * m).sum
    val totalVar = sumSq / n - muSq

    val agg = new WeightedVectorSumAggregator(dim).toColumn
    def matvec(v: Array[Double]): (Array[Double], Double) = {
      val vLit = array(v.map(lit): _*)
      val mv = mu.zip(v).map { case (m, c) => m * c }.sum
      xs.select(col("__v"), (vector_dot(col("__v"), vLit) - mv).as("__c"))
        .as[(Array[Float], Double)]
        .select(agg).head()
    }

    var v = Array.fill(dim)(1.0 / math.sqrt(dim))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val (xc, sc) = matvec(v)
      val w = xc.indices.map(d => (xc(d) - mu(d) * sc) / n).toArray
      val nrm = math.sqrt(w.map(x => x * x).sum)
      require(nrm > 0, "zero matvec — degenerate (constant) embeddings")
      // Rayleigh quotient of the PREVIOUS unit iterate: vᵀCv = |Cv|·cos,
      // but the standard estimate λ = vᵀ(Cv) is the dot below
      lambda = v.zip(w).map { case (a, b) => a * b }.sum
      v = w.map(x => r8(x / nrm))
    }

    val loadings = v.zipWithIndex.map { case (x, d) =>
      (d.toLong, math.floor(x * 1e6 + 0.5) / 1e6)
    }
    val lam6 = math.floor(lambda * 1e6 + 0.5) / 1e6
    val ratio6 =
      if (totalVar > 0) math.floor(lambda / totalVar * 1e6 + 0.5) / 1e6
      else Double.NaN
    spark.createDataset(loadings.toSeq).toDF("dim_idx", "loading")
      .select(col("dim_idx"), col("loading"),
        lit(lam6).as("eigenvalue"),
        (if (totalVar > 0) lit(ratio6)
         else lit(null).cast("double")).as("explained_ratio"))
  }
}
