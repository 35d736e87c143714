package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ValidateSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    (1L, Some(10L), 5.0, "Customer#000000001"),
    (2L, Some(10L), -1.0, "Customer#000000002"),
    (2L, None, 50.0, "bogus"),
    (3L, Some(99L), 200.0, "Customer#000000003"))
    .toDF("id", "fk", "v", "name")

  private val parent = Seq(10L, 11L).toDF("pk")

  private def row(df: org.apache.spark.sql.DataFrame) = {
    val r = df.head()
    (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getBoolean(4))
  }

  test("notNull counts nulls") {
    assert(row(Validate.notNull(rows, "fk")) ==
      ("not_null", "fk", 4L, 1L, false))
    assert(row(Validate.notNull(rows, "id")) ==
      ("not_null", "id", 4L, 0L, true))
  }

  test("unique counts every row of a duplicated key") {
    assert(row(Validate.unique(rows, "id")) ==
      ("unique", "id", 4L, 2L, false))
    assert(row(Validate.unique(rows, "name")) ==
      ("unique", "name", 4L, 0L, true))
  }

  test("fkOrphans counts child rows with no parent; nulls are not orphans") {
    assert(row(Validate.fkOrphans(rows, "fk", parent, "pk")) ==
      ("fk_orphans", "fk", 4L, 1L, false))
  }

  test("inRange treats bounds as inclusive and ignores nulls") {
    assert(row(Validate.inRange(rows, "v", 0.0, 200.0)) ==
      ("in_range", "v", 4L, 1L, false))
    assert(row(Validate.inRange(rows, "v", -1.0, 200.0)) ==
      ("in_range", "v", 4L, 0L, true))
  }

  test("matchesRegex flags non-conforming values") {
    assert(row(Validate.matchesRegex(rows, "name",
      "^Customer#[0-9]{9}$")) ==
      ("matches_regex", "name", 4L, 1L, false))
  }

  test("report unions checks; empty suite rejected") {
    val rep = Validate.report(Seq(
      Validate.notNull(rows, "id"), Validate.unique(rows, "id")))
    assert(rep.count() == 2)
    assert(rep.columns.toSeq ==
      Seq("check", "col_name", "n_rows", "n_violations", "pass"))
    intercept[IllegalArgumentException](Validate.report(Nil))
  }
  test("empty table passes every check with zero violations, not NULL gates") {
    val empty = rows.filter($"id" < 0)
    assert(row(Validate.notNull(empty, "fk")) ==
      ("not_null", "fk", 0L, 0L, true))
    assert(row(Validate.unique(empty, "id")) ==
      ("unique", "id", 0L, 0L, true))
    assert(row(Validate.inRange(empty, "v", 0, 1)) ==
      ("in_range", "v", 0L, 0L, true))
    assert(row(Validate.matchesRegex(empty, "name", "^x$")) ==
      ("matches_regex", "name", 0L, 0L, true))
    assert(row(Validate.fkOrphans(empty, "fk", parent, "pk")) ==
      ("fk_orphans", "fk", 0L, 0L, true))
  }
}
