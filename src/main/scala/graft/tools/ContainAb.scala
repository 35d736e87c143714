package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Same-JVM A/B for the round-16 containment-family hash carries
  * (fingerprint ids and shingle sets as xxhash64 longs, overlap
  * boundary keys as xxhash64-over-slice): alternates the OLD
  * string-keyed formulations (inlined verbatim below) against the NEW
  * operators on the same corpus — the BigramAb protocol, immune to
  * the host's co-tenant drift that poisoned two profiler windows.
  *
  * Run: SPARK_GRAFT_SF_DIR=.data/sf10full sbt "runMain graft.tools.ContainAb [reps]"
  */
object ContainAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the entries' planted-excerpt corpus
    val tk = split(trim(col("text")), "\\s+")
    val corpus = docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(pmod(col("doc_id"), lit(11)) === 3 && size(tk) >= 16)
        .select((col("doc_id") + 100000L).as("doc_id"),
          array_join(slice(tk, 5, 12), " ").as("text")))

    // pre-round-16 containmentNearDups, verbatim: string fp pin,
    // string-keyed candidate join, string shingle sets + array_intersect
    def oldContainment(): DataFrame = {
      val fps = Dedup.winnowFingerprints(corpus, "text", "doc_id", 5, 4)
        .localCheckpoint()
      val cands = fps.select(col("__fp"), col("doc_id").as("id_a"))
        .join(fps.select(col("__fp"), col("doc_id").as("id_b")), Seq("__fp"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      val sets = Dedup.shingleTable(corpus, "text", "doc_id", 3)
      cands
        .join(sets.select(col("doc_id").as("id_a"),
          col("shingle_set").as("__sa")), Seq("id_a"))
        .join(sets.select(col("doc_id").as("id_b"),
          col("shingle_set").as("__sb")), Seq("id_b"))
        .withColumn("__inter",
          size(array_intersect(col("__sa"), col("__sb"))).cast("double"))
        .select(explode(array(
          struct(col("id_a").as("id_in"), col("id_b").as("id_of"),
            round(col("__inter") / size(col("__sa")), 4).as("containment")),
          struct(col("id_b").as("id_in"), col("id_a").as("id_of"),
            round(col("__inter") / size(col("__sb")), 4).as("containment"))))
          .as("__r"))
        .select(col("__r.id_in").as("id_in"), col("__r.id_of").as("id_of"),
          col("__r.containment").as("containment"))
        .filter(col("containment") >= 0.8)
    }

    // pre-round-16 overlapPairs, verbatim: md5(array_join) boundaries
    def oldOverlap(pages: DataFrame): DataFrame = {
      val toks = split(lower(trim(col("text"))), "\\s+")
      val v = pages
        .select(col("page_id"), toks.as("__toks"))
        .filter(size(col("__toks")) >= 8)
        .select(col("page_id"),
          md5(array_join(slice(col("__toks"), 1, 8), " ")).as("__pre"),
          md5(array_join(slice(col("__toks"), -8, 8), " ")).as("__suf"))
      v.select(col("page_id").as("id_a"), col("__suf"))
        .join(v.select(col("page_id").as("id_b"), col("__pre")),
          col("__suf") === col("__pre"))
        .filter(col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b"))
    }

    val base = docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("ws"))
      .filter(size(col("ws")) >= 24)
      .withColumn("h", floor(size(col("ws")) / 2).cast("int"))
    val pages = base.select((col("doc_id") * 2).as("page_id"),
        array_join(slice(col("ws"), lit(1), col("h") + 8), " ").as("text"))
      .unionAll(base.select((col("doc_id") * 2 + 1).as("page_id"),
        array_join(slice(col("ws"), col("h") + 1, size(col("ws"))), " ").as("text")))

    def timed(f: => DataFrame, sortCols: Seq[String]): Double = {
      val t0 = System.nanoTime()
      f.orderBy(sortCols.map(col): _*)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      dt
    }
    def ab(name: String, old: => DataFrame, nu: => DataFrame,
           sortCols: Seq[String]): Unit = {
      timed(old, sortCols); timed(nu, sortCols) // warm both paths
      val olds = scala.collection.mutable.ArrayBuffer[Double]()
      val news = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to reps).foreach { _ =>
        olds += timed(old, sortCols)
        news += timed(nu, sortCols)
      }
      def show(xs: Seq[Double]) =
        xs.map(x => f"$x%.2f").mkString(" ") + f"  min=${xs.min}%.2f"
      println(s"[containab] $name  B string-keyed (r15): ${show(olds.toSeq)}")
      println(s"[containab] $name  A hash-carried (r16): ${show(news.toSeq)}")
    }

    ab("containment",
      oldContainment(),
      Dedup.containmentNearDups(corpus, "text", "doc_id", threshold = 0.8),
      Seq("id_in", "id_of"))
    ab("overlap",
      oldOverlap(pages),
      Dedup.overlapPairs(pages, "text", "page_id", k = 8),
      Seq("id_a", "id_b"))
    spark.stop()
  }
}
