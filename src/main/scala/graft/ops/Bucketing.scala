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

  /** Hive-style partitioned parquet layout — the OTHER write-time
    * pruning axis (bucketing prunes joins; directory partitioning
    * prunes SCANS): rows land under `path/col=value/` directories, so
    * a reader filtering on a partition column touches only the
    * matching directories — at 100 TB, a per-source/per-date query
    * reads that slice's bytes, not the corpus. Filters on partition
    * columns appear as `PartitionFilters` in the scan (plan-guarded in
    * PlanRegressionSpec), pruned at PLANNING time from directory
    * listings — no row ever deserializes from a pruned partition.
    * Choose low-cardinality columns (source, date, lang): each value
    * is a directory, and tiny-file explosion is the failure mode of
    * high-cardinality keys.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
