package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B adjudicator for the round-15 PageRank regression flag (VERDICT
  * r15 "what's wrong" #1): the trio's committed sf10 in-suite readings
  * (20.2/17.7/14.2 s) broke the round-13 ≤4×/decade gate on code whose
  * only round-15 graph-path change was the catalog sizing-hint
  * plumbing. This tool rules that plumbing in or out with a measured
  * pre/post: variant A calls [[graft.ops.Graph.pageRank]] exactly as
  * the round-15 entry does (sizingHint precomputed once — the staged
  * catalog metadata), variant B as the round-14 entry did (no hint;
  * the loop pays its own sizingOf pass per call). Reps ALTERNATE
  * B,A,B,A,... in one JVM so host drift lands on both variants
  * equally; the per-variant min is the steady-state estimator
  * (Bench's convention). The same alternation runs the personalized
  * variant (shares the plumbing) as a second witness.
  *
  * Run: SPARK_GRAFT_SF_DIR=.data/sf10full sbt "runMain graft.tools.RankAb [reps]"
  */
object RankAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the co-purchase edge table exactly as SparkEntry does
    // (build once, write, re-read stored — the materialized contract)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_rankab").toString
    val e0 = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + 1000000000000L).as("dst"))
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().write.mode("overwrite").parquet(dir)
    val staged = spark.read.parquet(dir)
    val hint = graft.ops.Graph.sizingOf(staged, "src", "dst")
    println(s"[rankab] staged |E|=${hint.edgeRows} " +
      s"src~${hint.srcNodesApprox} dst~${hint.dstNodesApprox}")

    def runOnce(hinted: Boolean, ppr: Boolean): Double = {
      val t0 = System.nanoTime()
      val h = if (hinted) Some(hint) else None
      val out: DataFrame =
        if (ppr)
          graft.ops.Graph.personalizedPageRank(staged, "src", "dst",
              seeds = Seq(1L, 2L, 3L), iters = 3, materialized = true,
              symmetric = true, sizingHint = h)
            .filter(col("rank") > 0)
        else
          graft.ops.Graph.pageRank(staged, "src", "dst", iters = 3,
            materialized = true, symmetric = true, sizingHint = h)
      out.select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("node"))
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // Bench's releaseState contract: no cross-rep block accumulation
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      dt
    }

    def show(xs: Seq[Double]) =
      xs.map(x => f"$x%.2f").mkString(" ") + f"  min=${xs.min}%.2f"
    if (args.contains("regimes")) {
      // round-16 sf30 mode: the iteration-REGIME A/B (broadcast-share
      // vs co-partitioned shuffle), alternated in one JVM via the
      // graft.rank.regime system property — the third-decade run read
      // the smallV broadcast regime at 10-16x on 3x data (three
      // |V|-row broadcast relations contending with the edge cache in
      // an 8 GB heap), and this measures the alternative on the same
      // staged graph under the same drift.
      runOnce(hinted = true, ppr = false) // warm
      val bc = scala.collection.mutable.ArrayBuffer[Double]()
      val sh = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to reps).foreach { _ =>
        sys.props("graft.rank.regime") = "shuffle"
        sh += runOnce(hinted = true, ppr = false)
        sys.props("graft.rank.regime") = "broadcast"
        bc += runOnce(hinted = true, ppr = false)
      }
      sys.props.remove("graft.rank.regime")
      println(s"[rankab] pagerank  SHUFFLE regime:   ${show(sh.toSeq)}")
      println(s"[rankab] pagerank  BROADCAST regime: ${show(bc.toSeq)}")
    } else Seq(false, true).foreach { ppr =>
      val name = if (ppr) "ppr" else "pagerank"
      runOnce(hinted = false, ppr) // warm: JIT/codegen off the clock
      val noHint = scala.collection.mutable.ArrayBuffer[Double]()
      val withHint = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to reps).foreach { _ =>
        noHint += runOnce(hinted = false, ppr)
        withHint += runOnce(hinted = true, ppr)
      }
      println(s"[rankab] $name  B no-hint (r14 path): ${show(noHint.toSeq)}")
      println(s"[rankab] $name  A hinted  (r15 path): ${show(withHint.toSeq)}")
    }
    spark.stop()
  }
}
