package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Variant timing for the q_j1/q_j2/q_history join-agg shape (the
  * round-15 ≥4×-per-decade tail): lineitem groupBy(orderkey) →
  * orders left join → full-order sort → formatted output. Each
  * variant isolates one term (join strategy, final sort, timestamp
  * formatting) so the per-decade growth gets a named owner. Run:
  *   SPARK_GRAFT_SF_DIR=.data/sf10full sbt "runMain graft.tools.JoinAggProfile"
  */
object JoinAggProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val TS = "yyyy-MM-dd HH:mm:ss"
    def t(name: String)(df: => DataFrame): Unit = {
      // warm once, then min of 2 timed runs (the Bench posture)
      def run(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val best = math.min(run(), run())
      println(f"[japrofile] $name%-42s $best%8.2f s")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def lastShip = li.groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("__max_ship"))
    def joined(hint: Boolean) = orders.join(
      if (hint) lastShip.hint("shuffle_hash") else lastShip,
      col("o_orderkey") === col("l_orderkey"), "left")
    t("agg only (60M groupBy)") {
      lastShip
    }
    t("agg+join SMJ (status quo, no sort)") {
      joined(false).select(col("o_orderkey"),
        coalesce(date_format(col("__max_ship"), TS), lit("")).as("last_ship"))
    }
    t("agg+join SHJ hint (no sort)") {
      joined(true).select(col("o_orderkey"),
        coalesce(date_format(col("__max_ship"), TS), lit("")).as("last_ship"))
    }
    t("q_j1 full SMJ (status quo)") {
      joined(false).select(col("o_orderkey"),
        coalesce(date_format(col("__max_ship"), TS), lit("")).as("last_ship"))
        .orderBy(col("o_orderkey"))
    }
    t("q_j1 full SHJ hint") {
      joined(true).select(col("o_orderkey"),
        coalesce(date_format(col("__max_ship"), TS), lit("")).as("last_ship"))
        .orderBy(col("o_orderkey"))
    }
    t("q_j1 full SHJ, no date_format") {
      joined(true).select(col("o_orderkey"), col("__max_ship"))
        .orderBy(col("o_orderkey"))
    }
    spark.stop()
  }
}
