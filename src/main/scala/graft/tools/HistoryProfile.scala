package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Variant timing for q_history_composite's winner-pick stage: the
  * row_number window (dedupFirst) vs a max_by hash-aggregate argmax
  * (the Cdc.applyChangeLog shape) over the same (order_date desc,
  * o_orderkey desc) total order. Run:
  *   SPARK_GRAFT_SF_DIR=.data/sf10full sbt "runMain graft.tools.HistoryProfile"
  */
object HistoryProfile {
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
      def run(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val best = math.min(run(), run())
      println(f"[histprofile] $name%-40s $best%8.2f s")
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def enriched = {
      val stats = li.groupBy(col("l_orderkey")).agg(
        date_format(max(col("l_shipdate")), TS).as("last_ship"),
        count(lit(1)).as("n_items"))
      orders.join(stats, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), TS).as("order_date"),
          coalesce(col("last_ship"), lit("")).as("last_ship"),
          coalesce(col("n_items"), lit(0L)).as("n_items"),
          col("n_items").isNotNull.as("has_items"))
    }
    t("status quo: row_number window") {
      graft.ops.Relational.dedupFirst(enriched, Seq("o_custkey"),
          Seq(col("order_date").desc, col("o_orderkey").desc))
        .orderBy(col("o_custkey"))
    }
    t("argmax: max_by hash aggregate") {
      val payload = struct(col("o_custkey"), col("o_orderkey"),
        col("order_date"), col("last_ship"), col("n_items"),
        col("has_items"))
      val ord = struct(col("order_date"), col("o_orderkey"))
      enriched.groupBy(col("o_custkey").as("__k"))
        .agg(max_by(payload, ord).as("__w"))
        .select(col("__w.*"))
        .orderBy(col("o_custkey"))
    }
    spark.stop()
  }
}
