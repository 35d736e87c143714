package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality expectation checks over a table, Great-Expectations
  * style: each check reduces a full scan to ONE summary row
  * (check, column, n_rows, n_violations, pass), and a validation
  * suite is the union of those rows — the quality gate a training-data
  * pipeline runs before admitting a new drop of data.
  *
  * Scale shape: every check is a single whole-table aggregate (count
  * of violations — map-side partial, one exchange to one row);
  * `unique` adds one group-by on the key; `fkOrphans` is a key-level
  * count join (aggregate child keys FIRST, then left-anti against
  * parent keys — the join carries distinct keys, not rows). The
  * report union is a union of one-row frames: no data movement.
  */
object Validate {

  private def summary(df: DataFrame, check: String, column: String,
                      violations: org.apache.spark.sql.Column): DataFrame =
    // coalesce: SUM over zero rows is NULL — an EMPTY table must
    // report (n_rows=0, n_violations=0, pass=true), not NULL gates
    df.agg(
      count(lit(1)).as("n_rows"),
      coalesce(sum(when(violations, 1L).otherwise(0L)), lit(0L))
        .as("n_violations"))
      .select(lit(check).as("check"), lit(column).as("col_name"),
        col("n_rows"), col("n_violations"),
        (col("n_violations") === 0).as("pass"))

  /** Violation: NULL value. */
  def notNull(df: DataFrame, column: String): DataFrame =
    summary(df, "not_null", column, col(column).isNull)

  /** Violation: any row whose key value occurs more than once
    * (every row of a duplicated key counts, so n_violations is the
    * number of rows you'd have to inspect, not the number of keys).
    */
  def unique(df: DataFrame, column: String): DataFrame = {
    val dups = df.groupBy(col(column))
      .agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(when(col("__n") > 1, col("__n")).otherwise(0L)),
        lit(0L)).as("n_violations"))
    df.agg(count(lit(1)).as("n_rows")).crossJoin(dups)
      .select(lit("unique").as("check"), lit(column).as("col_name"),
        col("n_rows"), col("n_violations"),
        (col("n_violations") === 0).as("pass"))
  }

  /** Violation: a child row whose FK value has no parent row.
    * NULL FKs are not orphans (SQL FK semantics). The child is
    * aggregated to (key, count) before the anti-join so the join side
    * is distinct keys.
    */
  def fkOrphans(child: DataFrame, childCol: String,
                parent: DataFrame, parentCol: String): DataFrame = {
    val childKeys = child.filter(col(childCol).isNotNull)
      .groupBy(col(childCol)).agg(count(lit(1)).as("__n"))
    val orphanRows = childKeys
      .join(parent.select(col(parentCol)).distinct(),
        childKeys(childCol) === col(parentCol), "left_anti")
      .agg(coalesce(sum(col("__n")), lit(0L)).as("n_violations"))
    child.agg(count(lit(1)).as("n_rows")).crossJoin(orphanRows)
      .select(lit("fk_orphans").as("check"), lit(childCol).as("col_name"),
        col("n_rows"), col("n_violations"),
        (col("n_violations") === 0).as("pass"))
  }

  /** Violation: non-null value outside [lo, hi]. */
  def inRange(df: DataFrame, column: String,
              lo: Double, hi: Double): DataFrame =
    summary(df, "in_range", column,
      col(column).isNotNull &&
        (col(column) < lo || col(column) > hi))

  /** Violation: non-null value not fully matching the regex. */
  def matchesRegex(df: DataFrame, column: String,
                   pattern: String): DataFrame =
    summary(df, "matches_regex", column,
      col(column).isNotNull && !col(column).rlike(pattern))

  /** Union the one-row check frames into the suite report. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "empty validation suite")
    checks.reduce(_ unionAll _)
  }
}
