package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale a driver-generated testdata directory by an integer factor to
  * produce BENCH_SF1-class inputs (the driver only materializes up to
  * sf0.1; scale evidence needs 10x that).
  *
  * Design goals, in order:
  *
  *  1. **Work must scale linearly in the factor** — every fact table is
  *     replicated `factor` times with all int64 join keys shifted by
  *     `replica * KEY_OFFSET`, so per-replica join fan-out, group
  *     cardinality and skew shape are IDENTICAL to the source sf and the
  *     global totals are exactly `factor` times larger. Fixed dimensions
  *     (region, nation) are copied verbatim, as TPC-H itself scales them.
  *  2. **No cross-replica dedup/ANN artifacts.** Naive replication would
  *     give every document 9 exact clones and every embedding 9 perfect
  *     neighbors, inflating candidate-pair counts ~factor^2 — a
  *     super-linear blowup the real corpus does not have. Instead:
  *     - `documents.text`: each token is deterministically renamed per
  *       replica (`hash(token, replica)` decides; replica 0 is identity).
  *       Because the rename is a pure function of (token, replica), two
  *       near-duplicate docs in the same replica transform identically —
  *       intra-replica Jaccard/MinHash/SimHash structure is preserved
  *       EXACTLY — while cross-replica shingle overlap collapses to the
  *       ~12% of 3-grams whose three tokens all kept their names, far
  *       below every near-dup threshold in the suite.
  *     - `embeddings.embedding`: per-replica Rademacher sign flip
  *       (`hash(dim, replica)` picks the sign; replica 0 is identity).
  *       A coordinate reflection is orthogonal, so intra-replica dot
  *       products, norms and cosines are preserved EXACTLY, while
  *       cross-replica cosines become sums of random-sign terms with
  *       expectation 0 — no spurious near-neighbors across replicas.
  *  3. **Readable by the same loaders.** `events.ts` varies by fixture
  *     vintage (legacy TIMESTAMP(NANOS) read as raw int64 under
  *     `legacy.parquet.nanosAsLong`, vs native timestamp[us]); the
  *     copy passes whichever physical type the source has straight
  *     through, and the engine's loader normalizes both
  *     (EventStreams.normalizeEventTs).
  *
  * Output files are repartitioned (round-robin, then sorted within
  * partitions by primary key) so the scaled tables arrive as multiple
  * scan splits — a single 10x parquet file would serialize every
  * downstream stage onto one core and measure the file layout, not the
  * engine.
  */
object ScaleGen {
  /** Per-replica key shift: far above any source key, far below 2^63/factor. */
  val KeyOffset = 100000000L

  /** Dup-HEAVY adversarial variant of a documents table: a deterministic
    * `frac` of docs get one of `nTemplates` shared boilerplate
    * paragraphs (`tokensPerTemplate` distinctive tokens) prepended —
    * the navbar/license-header corpus shape where duplicated k-token
    * windows are NOT rare. ExactSubstr's "dup side is small, AQE
    * broadcasts it" argument and LSH candidate volumes both degrade
    * gracefully or break loudly on this shape, so the dedup family is
    * spec'd against it (DedupSpec / ScaleGenSpec).
    *
    * Deterministic pure-column construction (hash of doc id picks both
    * membership and template), so replays and oracles agree. Template
    * tokens are lowercase + synthetic (`tmpl<t>q<i>`) so they never
    * collide with natural corpus tokens and survive the normalized
    * (lowercased) tokenization unchanged.
    */
  def withBoilerplate(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", frac: Double = 0.3,
                      nTemplates: Int = 3,
                      tokensPerTemplate: Int = 24): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0,1]")
    require(nTemplates > 0 && tokensPerTemplate > 0)
    val hit = pmod(xxhash64(col(idCol), lit("dupheavy")), lit(1000)) <
      lit((frac * 1000).round)
    val tmpl = pmod(xxhash64(col(idCol), lit("tmplpick")), lit(nTemplates))
    val para = array_join(
      transform(sequence(lit(0), lit(tokensPerTemplate - 1)),
        i => concat(lit("tmpl"), tmpl, lit("q"), i)), " ")
    val mutated = when(hit, concat(para, lit(" "), col(textCol)))
      .otherwise(col(textCol))
    val out = docs.withColumn(textCol, mutated)
    if (out.columns.contains("n_chars"))
      out.withColumn("n_chars", length(col(textCol)).cast("long"))
    else out
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SCALE_DST", ".data/sf1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    // optional comma-separated subset (e.g. "documents" for a 100x
    // dedup-only fixture without paying for 100x lineitem)
    val tables = sys.env.get("SPARK_GRAFT_SCALE_TABLES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(AllTables)
    require(tables.subsetOf(AllTables), s"unknown tables: ${tables -- AllTables}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalegen")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, dst, factor, tables)
    // optional adversarial fixture: documents_dupheavy.parquet with
    // SPARK_GRAFT_SCALE_DUPFRAC of docs sharing boilerplate paragraphs
    val dupFrac = sys.env.getOrElse("SPARK_GRAFT_SCALE_DUPFRAC", "0").toDouble
    if (dupFrac > 0 && tables("documents")) {
      withBoilerplate(spark.read.parquet(s"$dst/documents.parquet"), frac = dupFrac)
        .repartition(32).sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(s"$dst/documents_dupheavy.parquet")
      println(s"[scalegen] wrote documents_dupheavy (frac=$dupFrac) -> $dst")
    }
    spark.stop()
  }

  /** Every table the generator knows how to scale. */
  val AllTables: Set[String] = Set("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def scale(spark: SparkSession, src: String, dst: String, factor: Int,
            tables: Set[String] = AllTables): Unit = {
    def rd(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def wr(df: => DataFrame, name: String, files: Int, sortKey: String): Unit =
      if (tables(name)) {
        val parts = df.repartition(files)
        (if (sortKey.isEmpty) parts else parts.sortWithinPartitions(sortKey))
          .write.mode("overwrite").parquet(s"$dst/$name.parquet")
        println(s"[scalegen] wrote $name x$factor -> $dst/$name.parquet ($files files)")
      }
    /** Union of `factor` transformed replicas of one source table. */
    def reps(base: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(base, i)).reduce(_ unionByName _)
    def shift(d: DataFrame, i: Int, keys: String*): DataFrame =
      keys.foldLeft(d)((acc, k) => acc.withColumn(k, col(k) + lit(i * KeyOffset)))

    wr(rd("region"), "region", 1, "r_regionkey")
    wr(rd("nation"), "nation", 1, "n_nationkey")
    wr(reps(rd("customer"))(shift(_, _, "c_custkey")), "customer", 8, "c_custkey")
    wr(reps(rd("supplier"))(shift(_, _, "s_suppkey")), "supplier", 2, "s_suppkey")
    wr(reps(rd("part"))(shift(_, _, "p_partkey")), "part", 4, "p_partkey")
    wr(reps(rd("orders"))(shift(_, _, "o_orderkey", "o_custkey")),
      "orders", 16, "o_orderkey")
    wr(reps(rd("lineitem"))(shift(_, _, "l_orderkey", "l_partkey", "l_suppkey")),
      "lineitem", 32, "l_orderkey")

    // events: pass ts through in the source's physical type (see
    // scaladoc) — the legacy flag only engages on TIMESTAMP(NANOS)
    // sources, where it keeps the column a raw long as the loader expects.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    wr(reps(rd("events"))(shift(_, _, "event_id", "user_id")),
      "events", 16, "event_id")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")

    // def, not val: wr's parameter is by-name precisely so excluded
    // tables never touch their source parquet (a subset dst reused as
    // src lacks them); an eager val would spark.read before the
    // tables(name) check.
    def mutDoc = reps(rd("documents")) { (d, i) =>
      val text =
        if (i == 0) col("text")
        else array_join(
          transform(split(col("text"), " "),
            w => when(pmod(xxhash64(w, lit(i)), lit(2)) === 0, w)
              .otherwise(concat(w, lit(s"x$i")))), " ")
      shift(d, i, "doc_id")
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    wr(mutDoc, "documents", 32, "doc_id")

    def mutEmb = reps(rd("embeddings")) { (d, i) =>
      val vec =
        if (i == 0) col("embedding")
        else transform(col("embedding"),
          (x, idx) => when(pmod(xxhash64(idx, lit(i)), lit(2)) === 0, x).otherwise(-x))
      shift(d, i, "vec_id").withColumn("embedding", vec)
    }
    wr(mutEmb, "embeddings", 8, "vec_id")
  }
}
