package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BucketingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("joining two same-bucketed tables plans no exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 1000).map(i => (i.toLong, s"f$i")).toDF("k", "v")
      val dims = (1 to 1000).map(i => (i.toLong, s"d$i")).toDF("k", "w")
      Bucketing.writeBucketed(facts, "bkt_left", 4, Seq("k"))
      Bucketing.writeBucketed(dims, "bkt_right", 4, Seq("k"))
      val joined = Bucketing.bucketedJoin(spark, "bkt_left", "bkt_right", Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
