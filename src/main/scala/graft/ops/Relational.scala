package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core of the engine: the set-based algorithms the reference
  * expresses via Snowflake SQL (MERGE, NOT-EXISTS-guarded insert, QUALIFY
  * dedup, unpivot/pivot), re-expressed as composable DataFrame transforms.
  *
  * Reference behaviors (cited file:line against
  * /root/reference/app/Auto-Magic Document AI.py = app,
  * /root/reference/database/setup_database.sql = setup):
  *  - MERGE upsert: app:188-194, app:548-554, app:920-926
  *  - NOT-EXISTS guarded insert: app:481-489, setup:129-142
  *  - QUALIFY ROW_NUMBER dedup-latest: app:717, app:735
  *  - dict->rows unpivot: app:531-538, app:868-875
  *  - dynamic conjunctive WHERE: app:662-674
  *
  * All operators are shuffle-aware: merges/dedups hash-partition on their
  * keys (one shuffle each), and the small side of every lookup join is
  * expected to be broadcast by Catalyst/AQE at real scale.
  */
object Relational {

  /** MERGE INTO target USING source ON keys: last-writer-wins upsert
    * (app:188-194). Set-based: any source cardinality, though the
    * reference only ever merges a single literal row. Equi-join on the
    * key columns only; source rows replace matching target rows wholesale.
    *
    * Scale note: the anti-join shuffles both sides on the key columns
    * (or broadcasts the source when it is small, the common case here);
    * the union is shuffle-free.
    */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    // Dedup source on keys (last-writer-wins needs one row per key; pick
    // deterministically by the remaining columns to keep tests stable).
    val srcCols = source.columns
    val ordCols = srcCols.filterNot(keys.contains).map(col)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((if (ordCols.nonEmpty) ordCols else Array(lit(1))).map(_.desc): _*)
    val dedupedSrc = source
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val aligned = dedupedSrc.select(target.columns.map(col): _*)
    target.join(dedupedSrc.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(aligned)
  }

  /** INSERT ... WHERE NOT EXISTS (app:481-489): append only the source
    * rows whose key is absent from the target. Idempotent.
    */
  def insertIfAbsent(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val fresh = source.join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")
    target.unionByName(fresh.select(target.columns.map(col): _*))
  }

  /** QUALIFY ROW_NUMBER() OVER (PARTITION BY keys ORDER BY ord) = 1
    * (app:717): one row per key group, first by `ord`. Spark has no
    * QUALIFY; the canonical rewrite is window + filter. One shuffle on
    * `keys`; the sort is per-partition only.
    */
  def dedupFirst(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Dynamic conjunctive predicate builder (app:662-674). The reference
    * assembles `WHERE 1=1 AND ...` strings; the Column algebra needs no
    * `1=1` fallback or string surgery.
    */
  def conjunction(preds: Seq[Column]): Column =
    preds.reduceOption(_ && _).getOrElse(lit(true))

  /** Unpivot a MapType column into (key, value) rows — the dict->rows
    * flatten of app:531-538, expressed with the built-in explode
    * Generator (no custom UDTF).
    */
  def unpivotMap(df: DataFrame, mapCol: String, keyName: String, valName: String): DataFrame =
    df.select(
      df.columns.filterNot(_ == mapCol).map(col) :+
        explode(col(mapCol)).as(Seq(keyName, valName)): _*)

  /** Widen field rows into one row per id with a column per field name —
    * the dynamic-schema union of app:888-899 done set-based via pivot
    * (X3/X5). The pivot is the presentation edge; upstream state stays
    * MapType so 100 TB of drifting schemas never trigger DDL churn.
    */
  def widen(df: DataFrame, idCols: Seq[String], keyCol: String, valCol: String,
            knownKeys: Seq[String] = Nil): DataFrame = {
    val grouped = df.groupBy(idCols.map(col): _*)
    // explicit pivot values skip the extra distinct-values pass over the
    // input — at scale that pass would re-run everything upstream
    // (including AI extraction) a second time
    val pivoted = if (knownKeys.nonEmpty) grouped.pivot(keyCol, knownKeys)
                  else grouped.pivot(keyCol)
    pivoted.agg(first(col(valCol), ignoreNulls = true))
  }
}
