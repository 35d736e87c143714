package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, parquet footer cache, JIT) on tiny
    // slices of each expression family so no timed query is charged
    // for session init / first-JIT of its machinery
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/region.parquet")
        .write.format("noop").mode("overwrite").save()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
      graft.ops.TextAnalysis.annotateStats(docs, "text")
        .write.format("noop").mode("overwrite").save()
      val sh = graft.ops.Dedup.shingleTable(docs.limit(8), "text", "doc_id", 3)
      sh.crossJoin(sh.select(col("shingle_set").as("__b")))
        .select(graft.ops.Dedup.jaccardFromSets(col("shingle_set"), col("__b")))
        .write.format("noop").mode("overwrite").save()
      docs.limit(8)
        .select(graft.ai.AiFunctions.ai_classify(col("text")),
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(lit(1)).orderBy(col("doc_id"))))
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    val only = args.toSet // optional query-name filter for local runs
    val results = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink forces FULL evaluation of every output column —
      // count() would let Spark prune the expensive projections and
      // under-report compute-heavy queries
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        // keep timing the rest, but a failed query must be VISIBLE —
        // a swallowed error would read as a suspiciously fast pass
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // keep the JSON line SHORT (3dp, basename sf) so the driver's
    // output-tail capture holds the whole line — r2's full-precision
    // doubles overflowed it and truncated the total. Also mirror the
    // JSON to a file so the numbers survive any stdout capture limit.
    // Locale.ROOT: a comma-decimal default locale would emit 0,787 and
    // break every JSON consumer of this line
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f",
      java.lang.Double.valueOf(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val sfName = sfDir.split('/').last
    val json =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfName"}"""
    // mirror beside the build (cwd), not a hardcoded absolute path; a
    // failed write must be visible, not silently absent
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json").toAbsolutePath, json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_LOCAL.json write failed: ${e.getMessage}")
    }
    println(json)
    spark.stop()
  }
}
