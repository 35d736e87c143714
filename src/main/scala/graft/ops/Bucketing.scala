package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins: two tables bucketed by
  * the same key into the same bucket count join WITHOUT an exchange —
  * the shuffle is paid once at write time and amortized over every
  * subsequent join. At 100 TB this converts the recurring
  * fact-to-fact join (e.g. DOCUMENTS_PROCESSED x
  * DOCUMENTS_EXTRACTED_FIELDS on file_ref) from a 2-sided shuffle
  * into a zipped scan.
  *
  * Uses Spark's session catalog (saveAsTable) because bucketing
  * metadata lives in the catalog, not in parquet files.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (overwriting). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys — planner
    * sees compatible output partitioning and skips both exchanges.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)
}
