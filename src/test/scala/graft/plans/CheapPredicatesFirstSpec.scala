package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CheapPredicatesFirstSpec extends AnyFunSuite {

  // needs its own session: the rule is injected via GraftExtensions
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.GraftExtensions)
    .appName("cheap-predicates-first")
    .getOrCreate()

  test("UDF conjunct moves after the cheap conjunct; results unchanged") {
    graft.Graft.init(spark)
    // parquet-backed (a LocalRelation would be eagerly folded away)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val filtered = docs.filter(
      graft.ai.AiFunctions.ai_classify(col("text")) === "invoice" && col("doc_id") < 100)
    val optimized = filtered.queryExecution.optimizedPlan.toString
    val udfAt = optimized.indexOf("UDF")
    val cheapAt = optimized.indexOf("doc_id")
    assert(udfAt >= 0 && cheapAt >= 0, optimized)
    assert(cheapAt < udfAt,
      s"cheap predicate must precede the UDF call:\n$optimized")
    // semantics preserved vs the unoptimized predicate order
    val expected = docs.collect().filter { r =>
      graft.ai.DeterministicLocalBackend.classify(r.getString(1)) == "invoice" &&
        r.getLong(0) < 100
    }.map(_.getLong(0)).toSet
    assert(filtered.collect().map(_.getLong(0)).toSet == expected)
  }

  test("filters without UDFs are left untouched") {
    import spark.implicits._
    val df = Seq((1L, "a"), (200L, "b")).toDF("id", "s")
    val plan = df.filter(col("id") < 100 && col("s") =!= "b")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Filter") || plan.contains("LocalRelation"), plan)
  }
}
