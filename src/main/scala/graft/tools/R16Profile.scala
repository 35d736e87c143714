package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 phase profiler for the sf0.1 top-absolute queries that
  * never had one: the capped ANN/embedding contract entries
  * (q_emb_near_dups_lsh, q_semdedup, q_sim_ivfpq_topk,
  * q_rag_retrieve_ivf) and the catalog e2e entry
  * (q_pipeline_interactive). These are CONSTANT-SIZE at every SF
  * (EmbAuditCap / fixed probe sets / fixed doc counts), so their cost
  * is pure machinery — the profile prints wall seconds AND
  * jobs/stages/tasks per phase, because for overhead-bound phases the
  * job count, not the byte count, is the term to cut. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.R16Profile [family...]"
  */
object R16Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(); () }
    })
    def t[A](name: String)(f: => A): A = {
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat before reading
      Thread.sleep(200)
      println(f"[r16] $name%-46s ${dt}%7.2f s  jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val families = if (args.isEmpty) Set("lsh", "semdedup", "ivfpq", "ragivf", "cat")
                   else args.toSet

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 2000L)

    // ---- q_emb_near_dups_lsh ----
    if (families("lsh")) {
      val exactRows = t("lsh: exact all-pairs truth (collect)") {
        graft.ops.Similarity.exactNearDupPairs(emb, threshold = 0.4)
          .select(col("id_a"), col("id_b")).collect()
      }
      println(s"[r16]   exact pairs = ${exactRows.length}")
      val cands = t("lsh: SRP candidates distinct (count)") {
        val a = emb.select(col("vec_id").as("id_a"),
          posexplode(graft.functions.VectorExpressions
            .srp_signatures(col("embedding"), 4, 32)).as(Seq("table", "bucket")))
        val b = emb.select(col("vec_id").as("id_b"),
          posexplode(graft.functions.VectorExpressions
            .srp_signatures(col("embedding"), 4, 32)).as(Seq("table", "bucket")))
        a.join(b, Seq("table", "bucket")).filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct().count()
      }
      println(s"[r16]   lsh candidate pairs = $cands (of ${2000L * 1999 / 2} possible)")
      t("lsh: cosineNearDups full (noop)") {
        noop(graft.ops.Similarity.cosineNearDups(emb, threshold = 0.4,
          nBits = 4, nTables = 32))
      }
      t("lsh: full entry shape (2nd rep, noop)") {
        val exact = spark.createDataFrame(
          java.util.Arrays.asList(exactRows: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id_a", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("id_b", org.apache.spark.sql.types.LongType))))
        val lsh = graft.ops.Similarity.cosineNearDups(emb, threshold = 0.4,
          nBits = 4, nTables = 32).select(col("id_a"), col("id_b"))
        noop(exact.join(lsh.withColumn("__hit", lit(1)), Seq("id_a", "id_b"), "left")
          .agg(count(lit(1)).as("n_exact"),
            coalesce(sum(coalesce(col("__hit"), lit(0))).cast("double") /
              count(lit(1)) >= 0.9, lit(true)).as("recall_ok")))
      }
    }

    // ---- q_semdedup ----
    if (families("semdedup")) {
      t("semdedup: Ivf.build k=8 iters=2") {
        graft.ops.Ivf.build(emb, k = 8, iters = 2)
      }
      t("semdedup: nearDupPairs full (noop)") {
        noop(graft.ops.SemDedup.nearDupPairs(emb, threshold = 0.4,
          k = 8, iters = 2, assignM = 3))
      }
      t("semdedup: nearDupPairs 2nd rep (noop)") {
        noop(graft.ops.SemDedup.nearDupPairs(emb, threshold = 0.4,
          k = 8, iters = 2, assignM = 3))
      }
    }

    // ---- q_sim_ivfpq_topk ----
    if (families("ivfpq")) {
      val probes = emb.filter(col("vec_id") < 10)
      t("ivfpq: bruteForceTopK exact side (noop)") {
        noop(graft.ops.Similarity.bruteForceTopK(emb, probes, 5))
      }
      t("ivfpq: searchIvfPq (noop)") {
        noop(graft.ops.Pq.searchIvfPq(emb, probes, topK = 5,
          kCells = 16, nProbe = 12, m = 16, k = 16, iters = 2))
      }
      t("ivfpq: searchIvfPq 2nd rep (noop)") {
        noop(graft.ops.Pq.searchIvfPq(emb, probes, topK = 5,
          kCells = 16, nProbe = 12, m = 16, k = 16, iters = 2))
      }
    }

    // ---- q_rag_retrieve_ivf ----
    if (families("ragivf")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val chunks = graft.ops.Corpus.chunk(docs, "text", "doc_id",
          chunkSize = 8, overlap = 0)
        .select((col("doc_id") * 10000 + col("chunk_id") + 1000000).as("vec_id"),
          col("chunk_text"))
      val stagedDir = java.nio.file.Files.createTempDirectory("r16_rag").toString
      t("ragivf: stage chunk embeddings (write parquet)") {
        graft.ops.TextAnalysis.hashEmbedding(chunks, "chunk_text", "vec_id", dim = 32)
          .write.mode("overwrite").parquet(stagedDir)
      }
      val cemb = spark.read.parquet(stagedDir)
      println(s"[r16]   chunk embeddings = ${cemb.count()}")
      val qemb = graft.ops.TextAnalysis.hashEmbedding(
        docs.filter(col("doc_id").isin(7L, 107L, 207L, 307L, 407L))
          .select(col("doc_id").as("vec_id"), col("text")), "text", "vec_id", dim = 32)
      val idx = t("ragivf: Ivf.build k=16 iters=2") {
        graft.ops.Ivf.build(cemb, k = 16, iters = 2)
      }
      t("ragivf: Ivf.search nProbe=12 (noop)") {
        noop(graft.ops.Ivf.search(idx, qemb, topK = 3, nProbe = 12))
      }
      val idx2 = t("ragivf: Ivf.build 2nd rep") {
        graft.ops.Ivf.build(cemb, k = 16, iters = 2)
      }
      t("ragivf: Ivf.search 2nd rep (noop)") {
        noop(graft.ops.Ivf.search(idx2, qemb, topK = 3, nProbe = 12))
      }
    }

    // ---- q_pipeline_interactive ----
    if (families("cat")) {
      val docsSrc = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") < 3)
        .select(col("doc_id"), col("text")).collect()
      (1 to 2).foreach { rep =>
        val root = java.nio.file.Files.createTempDirectory("r16_wh").toString
        val cat = new graft.engine.Catalog(spark, root)
        t(s"cat[$rep]: ensureTables") { cat.ensureTables() }
        t(s"cat[$rep]: putFile x3") {
          docsSrc.foreach(r => cat.putFile("docs", f"doc_${r.getLong(0)}%05d.txt",
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }
        t(s"cat[$rep]: interactive x3") {
          (0 until 3).foreach(i =>
            graft.pipelines.Pipelines.interactive(cat, "docs", f"doc_$i%05d.txt"))
        }
        t(s"cat[$rep]: history query (collect)") {
          graft.pipelines.HistoryQueries.documents(cat)
            .select(col("file_ref"), col("class_name"),
              col("fields_extracted"), col("has_ocr"))
            .orderBy(col("file_ref")).collect()
        }
        t(s"cat[$rep]: deleteTree") {
          val p = java.nio.file.Paths.get(root)
          val walk = java.nio.file.Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(x => { java.nio.file.Files.delete(x); () })
          finally walk.close()
        }
      }
    }

    spark.stop()
  }
}
