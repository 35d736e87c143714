package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.{dot, norm}

/** IVF (inverted-file) approximate nearest neighbor — the coarse-
  * quantizer scale path for similarity search, complementing SRP-LSH:
  *
  *  1. build: Lloyd's k-means over the corpus. The centroid set is
  *     k x dim doubles — small by construction — so it lives on the
  *     driver and ships inside the task closure (MLlib-style). Each
  *     Lloyd pass is then a map-only projection over the corpus (no
  *     crossJoin, no window, no shuffle of the corpus) followed by
  *     one (centroid_id, pos) mean aggregation whose k x dim result
  *     rows return to the driver.
  *  2. search: each probe ranks the k closure centroids in the same
  *     map-only way, explodes its nProbe nearest list ids, and
  *     re-ranks exactly within those lists via an equi-join on
  *     centroid_id.
  *
  * Shuffle profile at 100 TB: the corpus never shuffles by content —
  * per Lloyd pass only (centroid_id, pos, mean-fragment) aggregation
  * rows move, and at search time only probe x nProbe list keys join
  * against the inverted lists (AQE broadcasts whichever side is
  * small). With balanced lists each probe touches corpus/k * nProbe
  * vectors instead of the whole corpus.
  *
  * Deterministic: initial centroids are the lowest-id vectors; all
  * argmax tie-breaks prefer the lowest centroid_id.
  */
object Ivf {

  /** (vec_id, embedding, centroid_id) assignments + (centroid_id,
    * centroid) table. `assignments` is the inverted index.
    */
  case class IvfIndex(centroids: DataFrame, assignments: DataFrame)

  /** Driver-side centroid set: (centroid_id, vector). */
  private[graft] type Cen = Array[(Int, Array[Double])]

  /** Cosine of `emb` against every centroid, best-first by
    * (cos desc, id asc); shared by assignment and probe-list choice.
    * A plain Scala closure over the driver-side centroid array keeps
    * the expression tree tiny (no k x dim literal tree to optimize)
    * and ships with the task closure exactly like MLlib's k-means.
    */
  // retained as the REFERENCE semantics the codegen CentroidTopIds
  // expression is parity-tested against (IvfSpec); no runtime caller
  private[graft] def rankedCentroids(cen: Cen): Seq[Double] => Array[Int] = {
    // sort once at closure build, NOT per row (cen is driver-side and
    // already id-ordered from build; this just makes that a guarantee)
    val sorted = cen.sortBy(_._1)
    emb => {
      val e = emb.toArray
      var vn = 0.0
      var j = 0
      while (j < e.length) { vn += e(j) * e(j); j += 1 }
      vn = math.sqrt(vn)
      sorted.map { case (id, cv) =>
        var d = 0.0
        var cn = 0.0
        var i = 0
        while (i < cv.length) { d += cv(i) * e(i); cn += cv(i) * cv(i); i += 1 }
        val den = vn * math.sqrt(cn)
        // zero-norm vector (degenerate input): define cosine as 0.0 so
        // ordering stays total — NaN would sort unpredictably vs Spark
        (id, if (den == 0.0) 0.0 else d / den)
      }.sortBy { case (id, cos) => (-cos, id) }.map(_._1)
    }
  }

  /** Driver-side centroid matrix for the codegen ranker: `(c)` is the
    * centroid with id c — ids are 0..k-1 contiguous by construction
    * (build tabulates them; required here so the expression can return
    * ARRAY INDEXES as ids).
    */
  private def centMatrix(cen: Cen): Array[Array[Double]] = {
    val sorted = cen.sortBy(_._1)
    require(sorted.map(_._1).sameElements(sorted.indices),
      "centroid ids must be 0..k-1")
    sorted.map(_._2)
  }

  /** Map-side nearest-centroid assignment (the k-means E-step) — the
    * codegen [[graft.functions.VectorExpressions.CentroidTopIds]]
    * ranker (round 16): the boxed Seq[Double] closure UDF paid a Seq
    * allocation + k boxed tuples + a sortBy PER ROW, the dominant
    * per-task term of every Lloyd pass and probe-list selection at
    * corpus scale; the expression is arithmetic-identical (parity
    * spec: IvfSpec "codegen ranker matches the closure").
    */
  private def assign(corpus: DataFrame, cen: Cen,
                     idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol), col(vecCol),
      element_at(graft.functions.VectorExpressions.centroid_top_ids(
        col(vecCol).cast("array<double>"), centMatrix(cen), 1), 1)
        .as("centroid_id"))

  /** Build the index with `iters` Lloyd iterations. */
  def build(corpus: DataFrame, k: Int, iters: Int = 5,
            idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val spark = corpus.sparkSession
    // cache the corpus for the duration of the EAGER Lloyd jobs
    // (init + one scan per iteration) — MLlib k-means does the same;
    // released before returning, so the lazy inverted index underneath
    // the caller's plan reads the source directly. Only touch the
    // storage level we set OURSELVES: persist() returns the same
    // Dataset, so unpersisting a corpus the caller had already cached
    // would silently evict THEIR cache
    // NOT spread (round-16 measured negative, SpreadAb): real corpora
    // and the scaled fixtures arrive as multiple scan splits, so the
    // Lloyd passes already parallelize; an explicit repartition here
    // costs an extra exchange per build and lost 20–35% on the
    // ivf/ivfpq entries at sf1. The one genuinely-serial input — a
    // staged single-file table — is fixed at its WRITE side instead
    // (SparkEntry.stagedRagEmbeddings spreads the stored layout).
    val weCached = corpus.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val c =
      if (weCached) corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else corpus
    try {
      // deterministic farthest-point init on a deterministic sample:
      // take the md5(id)-lowest ~4k vectors (one TakeOrdered job — a
      // pseudo-random but reproducible sample, no global sort), then
      // greedily pick k centers driver-side, each the sample vector
      // least similar to the centers chosen so far (ties by sample
      // order). Lowest-id init — the obvious deterministic choice —
      // seeds all k centers inside whatever cluster owns the low ids
      // and Lloyd then splits it while merging real clusters.
      val sampleN = math.max(4 * k, 64)
      val sample: Array[Array[Double]] = c
        .select(col(idCol), transform(col(vecCol), x => x.cast("double")).as("v"))
        .orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(sampleN)
        .collect()
        .map(_.getSeq[Double](1).toArray)
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        val den = math.sqrt(na) * math.sqrt(nb)
        if (den == 0.0) 0.0 else d / den
      }
      val chosen = scala.collection.mutable.ArrayBuffer(0)
      while (chosen.size < math.min(k, sample.length)) {
        // farthest point: maximize the minimum dissimilarity (= minimize
        // the maximum cosine) to the already-chosen centers
        val next = sample.indices.filterNot(chosen.contains)
          .minBy(i => chosen.map(j => cos(sample(i), sample(j))).max)
        chosen += next
      }
      var cen: Cen = chosen.toArray.zipWithIndex
        .map { case (si, i) => (i, sample(si)) }

      for (_ <- 0 until iters) {
        // M-step: element-wise member means come back as k x dim rows
        // (tiny); clusters that went empty keep their old centroid so k
        // never silently shrinks across iterations
        val means = assign(c, cen, idCol, vecCol)
          .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
          .groupBy(col("centroid_id"), col("pos"))
          .agg(avg(col("v").cast("double")).as("m"))
          .collect()
          .groupBy(_.getInt(0))
        cen = cen.map { case (id, old) =>
          means.get(id) match {
            case Some(rows) => (id, rows.sortBy(_.getInt(1)).map(_.getDouble(2)))
            case None       => (id, old)
          }
        }
      }
      import spark.implicits._
      val centroids = cen.toSeq.toDF("centroid_id", "centroid")
      IvfIndex(centroids, assign(corpus, cen, idCol, vecCol))
    } finally if (weCached) c.unpersist(false)
  }

  /** Top-m nearest-centroid multi-assignment: one row per (id, vec,
    * centroid_id) with each vector in its m nearest lists — the
    * index-side analogue of search's nProbe, used by SemDedup to trade
    * candidate volume for recall. Map-only, like assign.
    */
  def multiAssign(corpus: DataFrame, index: IvfIndex, m: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cen: Cen = index.centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    corpus.select(col(idCol), col(vecCol),
      explode(graft.functions.VectorExpressions.centroid_top_ids(
        col(vecCol).cast("array<double>"), centMatrix(cen),
        math.min(m, cen.length))).as("centroid_id"))
  }

  /** Per-probe inverted-list selection — the probe half of [[search]],
    * exposed so compositions (IVF-PQ in [[Pq.searchIvfPq]]) can reuse
    * it: one row per (query_id, centroid_id) with the probe vector and
    * norm riding along, centroid ranking done map-side in the closure.
    */
  def probeLists(index: IvfIndex, probes: DataFrame, nProbe: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cen: Cen = index.centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    // per-probe list selection is a projection: rank the k centroids
    // map-side (codegen, see assign), keep nProbe ids, explode
    probes
      .select(col(idCol).as("query_id"), col(vecCol).as("__pv"))
      .withColumn("__pn", norm(col("__pv")))
      .select(col("query_id"), col("__pv"), col("__pn"),
        explode(graft.functions.VectorExpressions.centroid_top_ids(
          col("__pv").cast("array<double>"), centMatrix(cen),
          math.min(nProbe, cen.length))).as("centroid_id"))
  }

  /** ANN top-k: nProbe nearest lists per probe, exact re-rank within. */
  def search(index: IvfIndex, probes: DataFrame, topK: Int, nProbe: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val chosen = probeLists(index, probes, nProbe, idCol, vecCol)
    // candidates: equi-join on centroid_id, then exact cosine re-rank
    val cands = chosen.join(
      index.assignments.select(col(idCol).as("corpus_id"),
        col(vecCol).as("__cv"), col("centroid_id")),
      Seq("centroid_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", Similarity.safeCosine(
        dot(col("__cv"), col("__pv")), norm(col("__cv")), col("__pn")))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    cands.withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("corpus_id"), col("rank"),
        round(col("cosine"), 4).as("cosine"))
  }
}
