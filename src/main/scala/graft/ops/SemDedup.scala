package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Similarity.{dot, norm}

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication"): cluster the embedding space with k-means, then
  * look for near-duplicate pairs ONLY inside each cluster.
  *
  * Where SRP-LSH ([[Similarity.cosineNearDups]]) buckets by random
  * hyperplanes, SemDeDup buckets by learned cluster structure — the
  * pair space per cluster is (n/k)^2, so the global quadratic never
  * materializes. Cross-cluster pairs are forgone by design (the
  * paper's stated trade-off); callers that need a recall floor gate it
  * explicitly, as q_semdedup does.
  *
  * Scale shape: the k-means build is [[Ivf.build]] (corpus never
  * shuffles by content; k x dim centroid rows move per Lloyd pass).
  * The pair stage is a self-equi-join on centroid_id — with balanced
  * clusters each row meets n/k candidates, and AQE handles the skewed
  * ones. Vector math is the codegen dot/norm expressions.
  *
  * Sizing rule: k should grow with the corpus (k ~ n / desired cluster
  * size, the paper uses ~11k clusters for 100M+ docs) so the per-
  * cluster quadratic stays bounded. A pathologically self-similar
  * corpus (everything in one semantic cluster) degrades toward the
  * global quadratic regardless of k — route such corpora through
  * [[Similarity.cosineNearDups]], whose SRP buckets split even
  * identical regions across hash tables.
  */
object SemDedup {

  /** Intra-cluster near-duplicate pairs with exact cosine >= threshold.
    * Found pairs are a SUBSET of the exact all-pairs result by
    * construction (every emitted pair is exactly re-scored); what the
    * clustering costs is recall, never precision.
    */
  /** `assignM` > 1 places each vector in its m nearest lists
    * (multi-probe): candidate volume grows ~m^2/k-fold, recall rises —
    * the paper's single-assignment is assignM = 1.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double, k: Int = 16,
                   iters: Int = 2, assignM: Int = 1, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val idx = Ivf.build(emb, k, iters, idCol, vecCol)
    val asg =
      if (assignM <= 1) idx.assignments
      else Ivf.multiAssign(emb, idx, assignM, idCol, vecCol)
    // candidate id pairs first (multi-assignment makes the same pair
    // meet in up to m shared lists — distinct() on bare 16-byte ids,
    // never on rows carrying vectors), then re-join vectors once
    val a = asg.select(col("centroid_id"), col(idCol).as("id_a"))
    val b = asg.select(col("centroid_id"), col(idCol).as("id_b"))
    val cands = a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val va = emb.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
      .withColumn("__na", norm(col("__va")))
    val vb = emb.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
      .withColumn("__nb", norm(col("__vb")))
    cands.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cosine",
        round(Similarity.safeCosine(
          dot(col("__va"), col("__vb")), col("__na"), col("__nb")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** The dedup half: resolve the intra-cluster pairs into duplicate
    * groups (min-label connected components, shared with the MinHash
    * pipeline) and keep one representative per group — the lowest id,
    * the deterministic stand-in for the paper's keep-lowest-similarity-
    * to-centroid rule. Returns the surviving rows of `emb`.
    */
  def dedup(emb: DataFrame, threshold: Double, k: Int = 16, iters: Int = 2,
            assignM: Int = 1, idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame = {
    val pairs = nearDupPairs(emb, threshold, k, iters, assignM, idCol, vecCol)
    // clusterPairs labels every member with its component's min id —
    // that min member IS the keeper; everyone else is dropped
    val dropped = Dedup.clusterPairs(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    emb.join(dropped, Seq(idCol), "left_anti")
  }
}
