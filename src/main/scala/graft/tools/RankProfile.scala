package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profile of the staged-PageRank cost at a given SF dir —
  * the measurement tool behind the rank-family scale work (SCALE.md):
  * prints per-phase wall seconds so "which pass dominates" is data,
  * not a guess. Run:
  *   SPARK_GRAFT_SF_DIR=.data/sf10full sbt "runMain graft.tools.RankProfile"
  */
object RankProfile {
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
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[rankprofile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // stage the co-purchase edge table exactly like the entry does
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_prof").toString
    t("stage: build+write") {
      val e0 = orders.select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000000000L).as("dst"))
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().write.mode("overwrite").parquet(dir)
    }
    val e = spark.read.parquet(dir)
    val sizing = t("sizing agg (count+2xHLL)") {
      e.agg(count(lit(1)), approx_count_distinct(col("src")),
        approx_count_distinct(col("dst"))).head()
    }
    val eRows = sizing.getLong(0)
    val p = math.min(65536L, math.max(cpus.toLong, (eRows + 1999999L) / 2000000L)).toInt
    println(s"[rankprofile] |E|=$eRows vApprox=${sizing.getLong(1) + sizing.getLong(2)} p=$p")
    spark.conf.set("spark.sql.shuffle.partitions", p.toString)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    val cached = t("repartition(dst)+cache") {
      val c = e.repartition(p, col("dst")).persist()
      c.count()
      c
    }
    val outdeg = t("outdeg groupBy(src)") {
      val o = cached.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      o.localCheckpoint()
    }
    val deg = t("deg full-outer+repart+pin") {
      val dstN = cached.select(col("dst")).distinct()
      dstN.join(outdeg, dstN("dst") === outdeg("src"), "full_outer")
        .select(coalesce(col("dst"), col("src")).as("node"),
          coalesce(col("outdeg"), lit(0L)).as("outdeg"))
        .repartition(p, col("node")).localCheckpoint()
    }
    val n = t("deg.count")(deg.count())
    var ranks = t("rank init") {
      deg.select(col("node"), col("outdeg"),
        round(lit(1.0 / n), 8).as("rank")).localCheckpoint()
    }
    for (i <- 1 to 3) {
      ranks = t(s"iteration $i") {
        val dangling = ranks.filter(col("outdeg") === 0)
          .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
        val rhs = broadcast(ranks)
        val contribs = cached.join(rhs, cached("src") === rhs("node"))
          .groupBy(col("dst"))
          .agg(sum(col("rank") / col("outdeg")).as("__in"))
        deg.join(contribs, deg("node") === contribs("dst"), "left")
          .crossJoin(broadcast(dangling))
          .select(col("node"), col("outdeg"),
            round(lit(0.15) * lit(1.0 / n) + lit(0.85) *
              (coalesce(col("__in"), lit(0.0)) + col("__dm") * lit(1.0 / n)), 8)
              .as("rank")).localCheckpoint()
      }
    }
    t("final noop write") {
      ranks.select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("node"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
