package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold an out-of-order changelog of
  * full-row images (insert / update / delete, each stamped with a
  * monotone version) onto a base snapshot and produce the final table
  * state — the batch-side complement of [[Relational]]'s MERGE (J5
  * applies ONE delta; this collapses a whole log where the same key
  * may be inserted, updated, and deleted many times, in any arrival
  * order).
  *
  * Semantics: per key, the highest-version change wins (the standard
  * row-image CDC contract — later images fully supersede earlier
  * ones, so replays and late arrivals are idempotent). A winning
  * 'D' removes the key (whether or not the base had it); a winning
  * 'I'/'U' upserts the winner's payload; keys with no change pass
  * through from base untouched.
  *
  * Scale shape: one key-partitioned window picks the winner per key
  * (WindowGroupLimit pushes the rank filter into the sort, the W1
  * dedup-latest shape), then base anti-joins the touched-key set and
  * unions the upserts — key-hash exchanges only, no payload ever
  * shuffles twice, nothing driver-side.
  */
object Cdc {

  /** Apply `changes` to `base`. `changes` must carry every `base`
    * column (the row image) plus `versionCol` and `opCol`
    * ('I' | 'U' | 'D'). Version ties within a key are broken by op
    * descending ('U' > 'I' > 'D') then deterministically by the
    * payload, so the result is stable under any log order.
    */
  def applyChangeLog(base: DataFrame, changes: DataFrame,
                     keyCols: Seq[String], versionCol: String,
                     opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val missing = base.columns.toSet --
      changes.columns.toSet
    require(missing.isEmpty,
      s"changes must carry every base column (row images); missing: $missing")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col(opCol).desc,
        struct(base.columns.map(col): _*).desc)
    val winners = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((base.columns.map(col) :+ col(opCol).as("__op")): _*)
    val untouched = base.join(
      winners.select(keyCols.map(col): _*), keyCols, "left_anti")
    untouched.union(
      winners.filter(col("__op") =!= "D").drop("__op"))
  }
}
