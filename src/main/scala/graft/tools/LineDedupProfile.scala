package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Phase attribution for q_text_line_dedup: how much of the cost is
  * the pagination FIXTURE (lineChunks reshaping) vs the operator
  * under test (dedupLinesWithinDoc)? Run:
  *   SPARK_GRAFT_SF_DIR=.data/sf10full sbt "runMain graft.tools.LineDedupProfile"
  */
object LineDedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ldprofile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    t("scan only (count)") { docs.count() }
    def fixtureOf(content: org.apache.spark.sql.Column) = array_join(
      concat(content, array(element_at(content, 1)),
        array(lit("sponsored content"), lit("sponsored content"))), "\n")
    val composed = fixtureOf(
      TextAnalysis.lineChunks(split(col("text"), "\\s+"), 8))
    val fixture = fixtureOf(TextAnalysis.lineChunksText(col("text"), 8))
    t("fixture build COMPOSED (sum length)") {
      println("[ldprofile]   chars = " + docs.select(composed.as("t"))
        .agg(sum(length(col("t")))).head().getLong(0))
    }
    t("fixture build NATIVE (sum length)") {
      println("[ldprofile]   chars = " + docs.select(fixture.as("t"))
        .agg(sum(length(col("t")))).head().getLong(0))
    }
    t("dedup on RAW text (sum n_kept)") {
      println("[ldprofile]   kept = " + TextAnalysis
        .dedupLinesWithinDoc(docs, "text", "doc_id")
        .agg(sum(col("n_kept"))).head().getLong(0))
    }
    t("fixture + dedup (sum n_kept)") {
      println("[ldprofile]   kept = " + TextAnalysis
        .dedupLinesWithinDoc(
          docs.select(col("doc_id"), fixture.as("text")), "text", "doc_id")
        .agg(sum(col("n_kept"))).head().getLong(0))
    }
    t("fixture + dedup + orderBy (noop write)") {
      TextAnalysis.dedupLinesWithinDoc(
          docs.select(col("doc_id"), fixture.as("text")), "text", "doc_id")
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
