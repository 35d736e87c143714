package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for the round-16-touched queries to
  * plans/r16/<query>_<suffix>.txt — the before/after plan evidence the
  * optimization round commits alongside OPTIMIZATION_r16.md. Run:
  *   sbt "runMain graft.tools.R16Plans after q_pagerank ..."
  * (suffix first, then query names; default = the round's touched set)
  */
object R16Plans {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_pagerank", "q_pagerank_ppr", "q_sim_knn_label",
      "q_emb_near_dups", "q_rag_retrieve", "q_sim_pq_topk",
      "q_sim_sq_topk", "q_sim_hard_negatives", "q_sim_jacc")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get("plans/r16")
    Files.createDirectories(dir)
    names.foreach { q =>
      try {
        val txt = graft.SparkEntry.queries(q)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(dir.resolve(s"${q}_$suffix.txt"), txt)
        println(s"[r16plans] wrote ${q}_$suffix.txt (${txt.length} chars)")
      } catch { case e: Throwable =>
        println(s"[r16plans] $q FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
