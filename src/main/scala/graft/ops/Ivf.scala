package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.{dot, norm}

/** IVF (inverted-file) approximate nearest neighbor — the coarse-
  * quantizer scale path for similarity search, complementing SRP-LSH:
  *
  *  1. build: Lloyd's k-means over the corpus (centroid set broadcast
  *     each iteration — k x dim doubles, tiny), producing per-vector
  *     centroid assignments = the inverted lists.
  *  2. search: each probe scores only the k centroids (broadcast),
  *     keeps the nProbe nearest lists, and re-ranks exactly within
  *     those lists via an equi-join on centroid_id.
  *
  * Shuffle profile at 100 TB: build is `iters` passes of
  * broadcast-join + groupBy(centroid) mean — the corpus itself never
  * shuffles by content, only the (centroid_id, pos, val) aggregation
  * rows do. Search joins candidates on centroid_id — a plain hash
  * join; with balanced lists each probe touches corpus/k * nProbe
  * vectors instead of the whole corpus.
  *
  * Deterministic: initial centroids are the lowest-id vectors.
  */
object Ivf {

  /** (vec_id, embedding, centroid_id) assignments + (centroid_id,
    * centroid) table. `assignments` is the inverted index.
    */
  case class IvfIndex(centroids: DataFrame, assignments: DataFrame)

  private def assignToNearest(vecs: DataFrame, centroids: DataFrame,
                              idCol: String, vecCol: String): DataFrame = {
    val scored = vecs.select(col(idCol), col(vecCol))
      .withColumn("__vn", norm(col(vecCol)))
      .crossJoin(broadcast(centroids
        .select(col("centroid_id"), col("centroid"),
          norm(col("centroid")).as("__cn"))))
      .withColumn("__cos", dot(col(vecCol), col("centroid")) / (col("__vn") * col("__cn")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__cos").desc, col("centroid_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** Build the index with `iters` Lloyd iterations. */
  def build(corpus: DataFrame, k: Int, iters: Int = 5,
            idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    // deterministic init: the k lowest-id vectors, cast to double arrays
    var centroids = Relational.dedupFirst(
        corpus.select(col(idCol), col(vecCol)), Seq(idCol), Seq(col(idCol)))
      .orderBy(col(idCol)).limit(k)
      .select(
        (row_number().over(Window.orderBy(col(idCol))) - 1).as("centroid_id"),
        transform(col(vecCol), x => x.cast("double")).as("centroid"))
      .cache()
    centroids.count()

    for (_ <- 0 until iters) {
      val assigned = assignToNearest(corpus, centroids, idCol, vecCol)
      // new centroid = element-wise mean of members: explode to
      // (centroid_id, pos, val), aggregate, re-assemble ordered by pos
      val means = assigned
        .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
      // keep centroids whose cluster went empty (groupBy drops them) —
      // otherwise k silently shrinks across iterations
      val next = means.unionByName(
        centroids.join(means.select("centroid_id"), Seq("centroid_id"), "left_anti"))
      val old = centroids
      centroids = next.cache()
      centroids.count()
      old.unpersist()
    }
    IvfIndex(centroids, assignToNearest(corpus, centroids, idCol, vecCol))
  }

  /** ANN top-k: nProbe nearest lists per probe, exact re-rank within. */
  def search(index: IvfIndex, probes: DataFrame, topK: Int, nProbe: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("__pv"))
      .withColumn("__pn", norm(col("__pv")))
    // score the k centroids per probe (k is small: broadcast)
    val probeLists = p.crossJoin(broadcast(index.centroids
        .select(col("centroid_id"), col("centroid"), norm(col("centroid")).as("__cn"))))
      .withColumn("__cos", dot(col("__pv"), col("centroid")) / (col("__pn") * col("__cn")))
    val wl = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("centroid_id"))
    val chosen = probeLists.withColumn("__rn", row_number().over(wl))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("__pv"), col("__pn"), col("centroid_id"))
    // candidates: equi-join on centroid_id, then exact cosine re-rank
    val cands = chosen.join(
      index.assignments.select(col(idCol).as("corpus_id"),
        col(vecCol).as("__cv"), col("centroid_id")),
      Seq("centroid_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("__cv"), col("__pv")) / (norm(col("__cv")) * col("__pn")))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    cands.withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("corpus_id"), col("rank"),
        round(col("cosine"), 4).as("cosine"))
  }
}
