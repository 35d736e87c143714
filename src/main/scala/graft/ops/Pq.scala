package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.{dot, norm, safeCosine}

/** Product quantization (PQ) for embedding similarity — the memory-
  * bound scale path for ANN (Jegou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search"; the engine behind FAISS's IVF-PQ).
  *
  * Where SRP-LSH ([[Similarity.lshTopK]]) and IVF ([[Ivf]]) prune the
  * CANDIDATE SET, PQ compresses the VECTORS: each embedding is split
  * into `m` subspaces, each subspace vector-quantized against its own
  * k-centroid codebook, and the vector stored as m bytes of centroid
  * ids. At 100 TB of 64-dim float32 embeddings (256 B/vector), the
  * m=16 k=16 code is 16 B/vector — a 16x footprint cut that turns a
  * disk-bound exact scan into a RAM-resident code scan, which is the
  * difference between "brute force is impossible" and "brute force
  * over codes is the fastest baseline" at the billion-vector scale.
  *
  * Search is asymmetric distance computation (ADC): the probe stays
  * exact; per subspace it precomputes inner products against all k
  * centroids (an m x k lookup table, built once per probe), and each
  * corpus code scores with m table lookups instead of `dim` float
  * multiplies — the codegen [[graft.functions.VectorExpressions.PqAdcIp]]
  * loop. The ADC scan keeps a per-probe shortlist, and only the
  * shortlist is re-ranked exactly against the full-precision vectors.
  *
  * Shuffle profile at 100 TB: training reads a driver-side sample (one
  * TakeOrdered job); encoding is map-only (codebook ships in the task
  * closure like [[Ivf]]'s centroids); the ADC scan streams the code
  * table against broadcast probes with NO corpus shuffle (only
  * probe x shortlist survivor rows reach the rank window); the exact
  * re-rank touches shortlist x probes full vectors via one equi-join.
  * Compose with IVF list pruning (encode each inverted list) when even
  * the code scan is too large — the shapes are orthogonal.
  *
  * Deterministic end to end: the training sample is md5-ordered, Lloyd
  * runs driver-side from farthest-point init, and all argmin
  * tie-breaks prefer the lowest centroid id.
  */
object Pq {

  /** Per-subspace codebooks: `codebook(s)(c)` is centroid `c` of
    * subspace `s`, covering dims [s*subDim, min((s+1)*subDim, dim)).
    * m x k x subDim doubles — e.g. 16 x 16 x 4 = 8 KiB for 64-dim —
    * small by construction, lives on the driver, ships in closures.
    */
  case class PqModel(m: Int, k: Int, dim: Int, subDim: Int,
                     codebook: Array[Array[Array[Double]]]) {
    require(codebook.length == m, "codebook must have one entry per subspace")

    /** Encode one vector to its m-byte code (lowest-id argmin). */
    def encodeOne(v: Array[Double]): Array[Byte] = {
      val out = new Array[Byte](m)
      var s = 0
      while (s < m) {
        val lo = s * subDim
        val hi = math.min(lo + subDim, dim)
        val cents = codebook(s)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          var d = 0.0
          var i = lo
          while (i < hi) {
            val diff = v(i) - cents(c)(i - lo)
            d += diff * diff
            i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(s) = best.toByte
        s += 1
      }
      out
    }

    /** Flattened m x k ADC table for one probe: lut(s*k + c) =
      * <probe sub-vector s, centroid c of subspace s>. Summing the
      * entries selected by a corpus code approximates <probe, corpus>.
      */
    def adcTable(v: Array[Double]): Array[Double] = {
      val lut = new Array[Double](m * k)
      var s = 0
      while (s < m) {
        val lo = s * subDim
        val hi = math.min(lo + subDim, dim)
        val cents = codebook(s)
        var c = 0
        while (c < cents.length) {
          var d = 0.0
          var i = lo
          while (i < hi) { d += v(i) * cents(c)(i - lo); i += 1 }
          lut(s * k + c) = d
          c += 1
        }
        s += 1
      }
      lut
    }

    /** Centroid-reconstructed vector of a code — the decoded
      * approximation ADC scores against (test/debug aid: for any probe
      * p and code c, pq_adc_ip(c, adcTable(p)) == <p, reconstruct(c)>).
      */
    def reconstruct(code: Array[Byte]): Array[Double] = {
      val out = new Array[Double](dim)
      var s = 0
      while (s < m) {
        val lo = s * subDim
        val hi = math.min(lo + subDim, dim)
        val cent = codebook(s)(code(s) & 0xff)
        var i = lo
        while (i < hi) { out(i) = cent(i - lo); i += 1 }
        s += 1
      }
      out
    }
  }

  /** Train per-subspace codebooks with driver-side Lloyd k-means on a
    * deterministic sample (md5-ordered ids — same pseudo-random-but-
    * reproducible trick as [[Ivf.build]]; PQ training on a sample is
    * standard practice, the codebook only has m*k*subDim parameters).
    * `k` <= 256 so a code fits one byte per subspace. Corpora smaller
    * than k get duplicated centroids (harmless: lowest-id argmin never
    * selects the copies).
    */
  def train(corpus: DataFrame, m: Int, k: Int, iters: Int = 8,
            idCol: String = "vec_id", vecCol: String = "embedding",
            sampleN: Int = 2048): PqModel = {
    require(m > 0, "m must be positive")
    require(k > 1 && k <= 256, "k must be in [2, 256] to fit one byte")
    require(iters >= 0, "iters must be non-negative")
    val sample: Array[Array[Double]] = corpus
      .select(col(idCol), transform(col(vecCol), x => x.cast("double")).as("v"))
      .filter(col("v").isNotNull)
      .orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(math.max(sampleN, 4 * k))
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "cannot train PQ on an empty corpus")
    val dim = sample.head.length
    val subDim = (dim + m - 1) / m
    val codebook = Array.tabulate(m) { s =>
      val lo = s * subDim
      val hi = math.min(lo + subDim, dim)
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, lo, hi))
      kmeans(subs, k, iters)
    }
    PqModel(m, k, dim, subDim, codebook)
  }

  /** Deterministic driver-side Lloyd: farthest-point init (L2, ties by
    * sample order — [[Ivf.build]]'s init adapted to euclidean), then
    * `iters` assign/mean rounds; empty clusters keep their centroid.
    */
  private def kmeans(points: Array[Array[Double]], k: Int,
                     iters: Int): Array[Array[Double]] = {
    val d = points.head.length
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer(0)
    while (chosen.size < math.min(k, points.length)) {
      val next = points.indices.filterNot(chosen.contains)
        .maxBy(i => chosen.map(j => dist2(points(i), points(j))).min)
      chosen += next
    }
    // pad to k by repeating the first pick: argmin with a strict < never
    // re-selects a duplicate, so codes stay stable
    var cents = Array.tabulate(k)(c => points(chosen(c % chosen.size)).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, d)(0.0)
      val counts = new Array[Int](k)
      points.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val dd = dist2(p, cents(c))
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < d) { sums(best)(i) += p(i); i += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(d)(i => sums(c)(i) / counts(c))
      }
    }
    cents
  }

  /** Map-only encode: (idCol, code binary(m), norm double). This is the
    * compressed index a caller stores instead of the float vectors —
    * the true norm rides along (8 bytes) so ADC scores can rank as
    * approximate COSINE, not just inner product. NULL embeddings
    * encode to NULL and rank last, like the exact paths.
    */
  def encode(corpus: DataFrame, model: PqModel,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val enc = udf((v: Seq[Double]) => if (v == null) null else model.encodeOne(v.toArray))
    corpus.select(col(idCol),
      enc(col(vecCol).cast("array<double>")).as("pq_code"),
      norm(col(vecCol)).as("pq_norm"))
  }

  /** ADC top-k over a pre-encoded code table: per probe, scan codes
    * with the codegen lookup loop, keep the `shortlist` best by
    * approximate cosine, exact-re-rank only those against the full
    * vectors, return topK. `shortlist` is the recall/compute dial
    * (FAISS convention: a small multiple of topK; default 16x).
    */
  def searchFromCodes(encoded: DataFrame, corpus: DataFrame, probes: DataFrame,
                      model: PqModel, topK: Int, shortlist: Int = 0,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(topK > 0, "topK must be positive")
    val sl = if (shortlist > 0) shortlist else 16 * topK
    require(sl >= topK, "shortlist must cover topK")
    val lutUdf = udf((v: Seq[Double]) => if (v == null) null else model.adcTable(v.toArray))
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("__pv"))
      .withColumn("__pn", norm(col("__pv")))
      .withColumn("__lut", lutUdf(col("__pv").cast("array<double>")))
    // spread the code scan before the quadratic stage (see
    // bruteForceTopK): one narrow O(n) shuffle of 16-byte codes vs the
    // O(n x probes) ADC stage it parallelizes — explicit count via
    // Similarity.spread so AQE can't re-serialize the byte-small codes
    val c = Similarity.spread(encoded.select(col(idCol).as("corpus_id"),
        col("pq_code"), col("pq_norm")), col("corpus_id"))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("__approx").desc, col("corpus_id"))
    val short = c.crossJoin(broadcast(p.select(col("query_id"), col("__pn"), col("__lut"))))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("__approx", safeCosine(
        graft.functions.VectorExpressions.pq_adc_ip(col("pq_code"), col("__lut"), model.k),
        col("pq_norm"), col("__pn")))
      .withColumn("__arank", row_number().over(wa))
      .filter(col("__arank") <= sl)
      .select(col("query_id"), col("corpus_id"))
    exactRerank(short, corpus, p, topK, idCol, vecCol)
  }

  /** Exact re-rank of a (query_id, corpus_id) shortlist: equi-join back
    * to the full vectors (shortlist x probes rows — tiny), recompute
    * true cosine, keep topK. Shared by [[searchFromCodes]] and
    * [[searchIvfPq]]. `p` must carry one (query_id, __pv, __pn) row per
    * probe.
    */
  private def exactRerank(short: DataFrame, corpus: DataFrame, p: DataFrame,
                          topK: Int, idCol: String, vecCol: String): DataFrame = {
    val cv = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    short.join(cv, Seq("corpus_id"))
      .join(broadcast(p.select(col("query_id"), col("__pv"), col("__pn"))), Seq("query_id"))
      .withColumn("cosine",
        safeCosine(dot(col("__cv"), col("__pv")), col("__cn"), col("__pn")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("corpus_id"), col("rank"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** IVF-PQ (the FAISS IVFPQ architecture): both scale axes composed —
    * IVF prunes the CANDIDATE SET (each probe touches ~corpus/kCells x
    * nProbe vectors via the centroid equi-join), PQ compresses what
    * those candidates COST (each is an m-lookup ADC score over a
    * 16-byte code, not a dim-float dot). The compressed inverted index
    * is (centroid_id, corpus_id, code, norm) rows — at 100 TB the only
    * full-precision vector reads are the per-probe shortlist re-ranks.
    *
    * Shuffle profile: one narrow code-table shuffle onto centroid_id at
    * index build; per search, probe x nProbe LUT rows broadcast against
    * it (an equi-join, never a corpus-wide cross join), and only
    * shortlist survivors reach the full vectors.
    */
  def searchIvfPq(corpus: DataFrame, probes: DataFrame, topK: Int,
                  kCells: Int = 16, nProbe: Int = 4, m: Int = 16, k: Int = 16,
                  iters: Int = 5, shortlist: Int = 0,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(topK > 0, "topK must be positive")
    val sl = if (shortlist > 0) shortlist else 16 * topK
    require(sl >= topK, "shortlist must cover topK")
    val idx = Ivf.build(corpus, kCells, iters, idCol, vecCol)
    val model = train(corpus, m, k, idCol = idCol, vecCol = vecCol)
    // compressed inverted index: codes keyed by their IVF list
    val codes = encode(corpus, model, idCol, vecCol)
      .join(idx.assignments.select(col(idCol), col("centroid_id")), Seq(idCol))
      .select(col(idCol).as("corpus_id"), col("centroid_id"),
        col("pq_code"), col("pq_norm"))
    val lutUdf = udf((v: Seq[Double]) => if (v == null) null else model.adcTable(v.toArray))
    val chosen = Ivf.probeLists(idx, probes, nProbe, idCol, vecCol)
      .withColumn("__lut", lutUdf(col("__pv").cast("array<double>")))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("__approx").desc, col("corpus_id"))
    val short = codes
      .join(broadcast(chosen.select(col("centroid_id"), col("query_id"),
        col("__pn"), col("__lut"))), Seq("centroid_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("__approx", safeCosine(
        graft.functions.VectorExpressions.pq_adc_ip(col("pq_code"), col("__lut"), model.k),
        col("pq_norm"), col("__pn")))
      .withColumn("__arank", row_number().over(wa))
      .filter(col("__arank") <= sl)
      .select(col("query_id"), col("corpus_id"))
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("__pv"))
      .withColumn("__pn", norm(col("__pv")))
    exactRerank(short, corpus, p, topK, idCol, vecCol)
  }

  /** Train + encode + search in one call (the common small-probe-set
    * shape; at scale, train/encode once and reuse the code table).
    */
  def search(corpus: DataFrame, probes: DataFrame, topK: Int,
             m: Int = 16, k: Int = 16, shortlist: Int = 0,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val model = train(corpus, m, k, idCol = idCol, vecCol = vecCol)
    searchFromCodes(encode(corpus, model, idCol, vecCol), corpus, probes,
      model, topK, shortlist, idCol, vecCol)
  }
}
