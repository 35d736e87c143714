package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{array_join, col, count, countDistinct, length, lit, pmod, split, sum}

import graft.ops.Dedup

/** One-shot stress runner for the ExactSubstr/MinHash dedup family on
  * an arbitrary documents parquet (e.g. the ScaleGen dup-heavy fixture
  * or an sf3/sf10 scale-up) — evidence that the family completes and
  * stays equi-join-shaped on corpora where duplication is NOT rare, at
  * scales the unit specs don't reach.
  *
  * Env: SPARK_GRAFT_STRESS_DOCS (parquet path, default the sf1
  * dup-heavy fixture), SPARK_GRAFT_CPUS. Optional op-name args
  * restrict the run to those ops (isolation experiments). Prints one
  * JSON line of per-op seconds + output rows (each op also echoed to
  * stderr as it lands, so long runs show progress). The uncapped
  * MinHash baseline runs LAST and is skippable: on THIS fixture the
  * boilerplate is a minority of each doc's shingles, so band minima
  * stay doc-specific and the uncapped baseline is cheap (sf3: ~3 s,
  * 41.6k pairs); the hot-bucket hazard the maxBucket guard exists for
  * is the template-DOMINANT shape (near-identical docs), pinned by
  * DedupSpec's "maxBucket drops hot buckets whole" unit test.
  */
object DedupStress {
  /** Every op stage the runner knows. */
  val AllOps: Set[String] = Set("dedup_spans", "dedup_rm",
    "rm_then_minhash", "minhash_capped", "containment_capped",
    "cluster_capped_pairs",
    "simhash_candidates", "simhash_capped", "incremental_batches",
    "incremental_ann_batches", "minhash_near_dups", "boilerplate_rm",
    "incremental_boiler_batches", "decon_fuzzy", "rm_then_decon_fuzzy",
    "decon_spans")

  /** Depth-first delete; closes the walk stream (Files.walk holds a
    * directory handle until closed — see its javadoc).
    */
  private def deleteRecursively(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(dir)
    try walk.iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }

  def main(args: Array[String]): Unit = {
    // optional op-name args restrict the run (isolation experiments);
    // a typo'd op name would otherwise "succeed" having measured nothing
    val only = args.toSet
    val unknown = only.diff(AllOps)
    require(unknown.isEmpty,
      s"unknown ops ${unknown.toSeq.sorted.mkString(", ")}; " +
        s"known: ${AllOps.toSeq.sorted.mkString(", ")}")
    def picked(name: String): Boolean = only.isEmpty || only(name)
    val docs = sys.env.getOrElse("SPARK_GRAFT_STRESS_DOCS",
      ".data/sf1/documents_dupheavy.parquet")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(docs)
    def timed(name: String)(f: => Long): String = {
      val t0 = System.nanoTime()
      val rows = f
      val dt = (System.nanoTime() - t0) / 1e9
      // Locale.ROOT: the bare f-interpolator formats with the JVM
      // default locale — a comma-decimal locale would emit invalid JSON
      val sec = String.format(java.util.Locale.ROOT, "%.2f",
        java.lang.Double.valueOf(dt))
      val part = s""""$name":{"sec":$sec,"rows":$rows}"""
      System.err.println(s"[stress] $part")
      part
    }
    /** rows + force clean_text: a bare count() would let Spark prune
      * the reassembly projection and under-report the operator.
      */
    def countWithText(d: org.apache.spark.sql.DataFrame): Long =
      d.select(count(lit(1)).as("n"), sum(length(col("clean_text"))))
        .first().getLong(0)

    val parts = collection.mutable.ArrayBuffer[String]()
    if (picked("dedup_spans")) parts += timed("dedup_spans") {
      Dedup.duplicateSpans(df, "text", "doc_id", k = 8).count()
    }
    if (picked("dedup_rm")) parts += timed("dedup_rm") {
      countWithText(Dedup.removeDuplicateSpans(df, "text", "doc_id", k = 8))
    }
    // the 100-TB pipeline order for boilerplate corpora: ExactSubstr
    // removal FIRST, then a MIN-LENGTH filter, then MinHash on cleaned
    // text — shared templates never reach the banding (no hot buckets),
    // and the length filter drops docs the removal reduced to stubs
    // (the C4/Gopher step; without it the near-empty residues have
    // tiny shingle sets and pair all-to-all at J≈1 — measured 35.8M
    // bogus pairs on the sf3 fixture). The cleaned corpus is
    // materialized between the stages (as a real pipeline would persist
    // it); the measured time INCLUDES that materialization.
    if (picked("rm_then_minhash")) parts += timed("rm_then_minhash") {
      val cleaned = Dedup.removeDuplicateSpans(df, "text", "doc_id", k = 8)
        .filter(col("n_tokens") - col("n_removed") >= 20)
        .select(col("doc_id"), col("clean_text").as("text"))
        .localCheckpoint()
      try Dedup.minhashNearDups(cleaned, "text", "doc_id",
        threshold = 0.5, shingleK = 3, numHashes = 16, bands = 4).count()
      finally cleaned.unpersist()
    }
    // residual guard rail: uncleaned text, hot buckets dropped whole
    if (picked("minhash_capped")) parts += timed("minhash_capped") {
      Dedup.minhashNearDups(df, "text", "doc_id",
        threshold = 0.5, shingleK = 3, numHashes = 16, bands = 4,
        maxBucket = 64).count()
    }
    // containment under adversarial duplication: the boilerplate
    // template is a shared verbatim run in 30% of docs, so its
    // winnowing fingerprints are population-hot — uncapped candidates
    // would be Θ(population²), exactly minhash's hot-bucket shape; the
    // maxFpDocs guard drops hot fingerprints whole, leaving the
    // doc-specific fingerprint space (the short-in-long pairs the
    // operator exists for) intact
    if (picked("containment_capped")) parts += timed("containment_capped") {
      Dedup.containmentNearDups(df, "text", "doc_id",
        threshold = 0.8, maxFpDocs = 64).count()
    }
    // end-to-end near-dup GROUP resolution at stress scale: capped
    // banding's pair stream -> pointer-jumped min-label components ->
    // one keeper per cluster (rows = resolved cluster count). The
    // boilerplate population forms giant components, so this is the
    // worst case for the O(log diameter) propagation loop.
    if (picked("cluster_capped_pairs")) parts += timed("cluster_capped_pairs") {
      val pairs = Dedup.minhashNearDups(df, "text", "doc_id",
          threshold = 0.5, shingleK = 3, numHashes = 16, bands = 4,
          maxBucket = 64)
        .select(col("id_a"), col("id_b")).localCheckpoint()
      try Dedup.clusterPairs(pairs)
        .select(countDistinct(col("cluster_id"))).first().getLong(0)
      finally pairs.unpersist()
    }
    // line-level boilerplate removal under adversarial duplication:
    // shape each doc into 8-token lines, so the prepended 24-token
    // template becomes 3 IDENTICAL lines shared by the whole 30%
    // boilerplate population — the worst case for the "boilerplate set
    // is small" argument (huge doc frequency, tiny distinct-line set;
    // the dropIdx join must broadcast, never degenerate)
    if (picked("boilerplate_rm")) parts += timed("boilerplate_rm") {
      val lined = df.select(col("doc_id"), array_join(
        graft.ops.TextAnalysis.lineChunksText(col("text"), 8),
        "\n").as("text"))
      countWithText(graft.ops.TextAnalysis.removeBoilerplateLines(
        lined, "text", "doc_id", minDocs = 10))
    }
    // streaming form of the above: the (line-md5, id) sighting store
    // accumulates the full corpus's line inventory; per-batch cost must
    // stay ~flat even though the doc-frequency aggregate reads
    // store + batch every time (hash-keyed rows only)
    if (picked("incremental_boiler_batches")) parts += timed("incremental_boiler_batches") {
      val lined = df.select(col("doc_id"), array_join(
        graft.ops.TextAnalysis.lineChunksText(col("text"), 8),
        "\n").as("text"))
      val dir = java.nio.file.Files.createTempDirectory("graft_boilstress")
      try {
        val inc = new graft.streaming.IncrementalBoilerplate(spark,
          dir.toString, minDocs = 10)
        val nB = 5
        var keptLines = 0L
        for (i <- 0 until nB) {
          val t0 = System.nanoTime()
          val batch = lined.filter(pmod(col("doc_id"), lit(nB)) === i)
          keptLines += inc.processBatch(batch, "text", "doc_id")
            .agg(sum(col("n_kept"))).first().getLong(0)
          System.err.println(String.format(java.util.Locale.ROOT,
            "[stress]   boiler batch %d: %.2f s", Integer.valueOf(i),
            java.lang.Double.valueOf((System.nanoTime() - t0) / 1e9)))
        }
        keptLines
      } finally deleteRecursively(dir)
    }
    // fuzzy decontamination under adversarial duplication: the eval
    // slice inherits the corpus's 30% boilerplate, so template-min
    // minhash slots put ~12% of each template's carriers on ONE
    // (slot, value) key on BOTH sides — the candidate join is then
    // train-carriers x eval-carriers per template per slot, the
    // worst case for the "candidates ~ eval-sized" argument. Measured
    // raw on purpose; the pipeline-order stage below is the answer.
    if (picked("decon_fuzzy")) parts += timed("decon_fuzzy") {
      val eval_ = df.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(col("text"))
      graft.ops.Corpus.decontaminateFuzzy(df, eval_, "text", "text",
        "doc_id", threshold = 0.5, k = 5, numHashes = 20).count()
    }
    // the 100-TB pipeline order (same story as rm_then_minhash):
    // ExactSubstr removal strips the shared templates FIRST, so the
    // fuzzy decon's slot join sees doc-specific minima only
    if (picked("rm_then_decon_fuzzy")) parts += timed("rm_then_decon_fuzzy") {
      val cleaned = Dedup.removeDuplicateSpans(df, "text", "doc_id", k = 8)
        .filter(col("n_tokens") - col("n_removed") >= 20)
        .select(col("doc_id"), col("clean_text").as("text"))
        .localCheckpoint()
      try {
        val eval_ = cleaned.filter(pmod(col("doc_id"), lit(97)) === 0)
          .select(col("text"))
        graft.ops.Corpus.decontaminateFuzzy(cleaned, eval_, "text", "text",
          "doc_id", threshold = 0.5, k = 5, numHashes = 20).count()
      } finally cleaned.unpersist()
    }
    // span-level decontamination on the same adversarial shape: the
    // eval slice's template windows cover ~30% of the corpus, so the
    // covered-start volume is O(corpus), never pairwise — this stage
    // is the evidence the excision path stays linear when the leak is
    // NOT rare
    if (picked("decon_spans")) parts += timed("decon_spans") {
      val eval_ = df.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(col("text"))
      val out = graft.ops.Corpus.decontaminateSpans(
        df.filter(pmod(col("doc_id"), lit(97)) =!= 0), eval_,
        "text", "text", "doc_id", k = 8)
      out.select(count(lit(1)).as("n"), sum(length(col("clean_text"))))
        .first().getLong(0)
    }
    if (picked("simhash_candidates")) parts += timed("simhash_candidates") {
      Dedup.simhashCandidates(df, "text", "doc_id",
        maxHamming = 3, nBlocks = 4).count()
    }
    // wide radius (q=1 probe expansion) under adversarial duplication,
    // hot signature buckets dropped whole — the simhash guard rail
    if (picked("simhash_capped")) parts += timed("simhash_capped") {
      Dedup.simhashCandidates(df, "text", "doc_id",
        maxHamming = 7, nBlocks = 4, maxBucket = 64).count()
    }
    // the 100-TB ingestion story under adversarial duplication: stream
    // the corpus through the incremental store in batches and watch
    // per-batch cost. Template-DOMINANT docs self-limit (only the
    // first survives, so its bucket never grows); what grows the store
    // is boilerplate-MINORITY carriers that bucket-collide but fail
    // J>=threshold — each batch then verifies against an ever-larger
    // partner set, which is the growth curve this measures (rows =
    // total kept).
    if (picked("incremental_batches")) parts += timed("incremental_batches") {
      val dir = java.nio.file.Files.createTempDirectory("graft_incstress")
      try {
        // SPARK_GRAFT_STRESS_STORE_CAP exercises maxStoreBucket (the
        // hot-store-bucket guard); unset = exact/uncapped
        val cap = sys.env.get("SPARK_GRAFT_STRESS_STORE_CAP")
          .map(_.toInt).getOrElse(Int.MaxValue)
        val inc = new graft.streaming.IncrementalDedup(spark, dir.toString,
          maxStoreBucket = cap)
        val nB = 5
        var keptTotal = 0L
        for (i <- 0 until nB) {
          val t0 = System.nanoTime()
          val batch = df.filter(pmod(col("doc_id"), lit(nB)) === i)
          keptTotal += inc.processBatch(batch, "text", "doc_id").count()
          System.err.println(String.format(java.util.Locale.ROOT,
            "[stress]   incremental batch %d: %.2f s", Integer.valueOf(i),
            java.lang.Double.valueOf((System.nanoTime() - t0) / 1e9)))
        }
        keptTotal
      } finally deleteRecursively(dir)
    }
    // same curve for the vector store: stream an embeddings fixture
    // through IncrementalAnn in batches. SRP tables have only 2^nBits
    // buckets, so candidate-pair volume grows ~ batch x corpus per
    // batch; this stage is the evidence that the one-pass
    // payload-carrying join stays flat there (and that the staged
    // narrow-pair alternative does not — see the decision note in
    // IncrementalAnn.processBatch).
    if (picked("incremental_ann_batches")) parts += timed("incremental_ann_batches") {
      // SPARK_GRAFT_STRESS_EMB_REPEAT=r synthesizes realistic payload
      // width from the dim-64 fixture by concatenating each vector
      // with itself r times: dots scale by r and norms by sqrt(r), so
      // every cosine — and therefore the kept/dropped decision set —
      // is preserved EXACTLY while payload bytes grow r x.
      val rep = sys.env.get("SPARK_GRAFT_STRESS_EMB_REPEAT")
        .map(_.toInt).getOrElse(1)
      val emb0 = spark.read.parquet(sys.env.getOrElse(
        "SPARK_GRAFT_STRESS_EMB", ".data/sf3/embeddings.parquet"))
      val emb = if (rep == 1) emb0
        else emb0.withColumn("embedding",
          org.apache.spark.sql.functions.flatten(
            org.apache.spark.sql.functions.array_repeat(col("embedding"), rep)))
      val dir = java.nio.file.Files.createTempDirectory("graft_annstress")
      try {
        val inc = new graft.streaming.IncrementalAnn(spark, dir.toString)
        val nB = 5
        var keptTotal = 0L
        for (i <- 0 until nB) {
          val t0 = System.nanoTime()
          val batch = emb.filter(pmod(col("vec_id"), lit(nB)) === i)
          keptTotal += inc.processBatch(batch, "embedding", "vec_id").count()
          System.err.println(String.format(java.util.Locale.ROOT,
            "[stress]   ann batch %d: %.2f s", Integer.valueOf(i),
            java.lang.Double.valueOf((System.nanoTime() - t0) / 1e9)))
        }
        keptTotal
      } finally deleteRecursively(dir)
    }
    // hot-bucket blowup baseline — last, and skippable for huge runs
    if (picked("minhash_near_dups") &&
        !sys.env.get("SPARK_GRAFT_STRESS_SKIP_UNCAPPED").exists(_ == "1"))
      parts += timed("minhash_near_dups") {
        Dedup.minhashNearDups(df, "text", "doc_id",
          threshold = 0.5, shingleK = 3, numHashes = 16, bands = 4).count()
      }
    // header fields prepended as parts so an empty op selection still
    // emits valid JSON (no dangling comma)
    val header = Seq(s""""docs":"$docs"""", s""""n_docs":${df.count()}""")
    println((header ++ parts).mkString("{", ",", "}"))
    spark.stop()
  }
}
