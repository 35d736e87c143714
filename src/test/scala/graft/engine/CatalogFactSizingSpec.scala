package graft.engine

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Skew

/** Fact-table sizing + measured salt advice (round-15 task 8): the
  * edge-table sizing machinery generalized to (rows, key HLL,
  * hottest-key count), feeding [[Skew.adviseSalts]].
  *
  * Honest calibration note: the COMMITTED q_skew_salted_join entry
  * passes `salts = 8` against the events⋈customer join as a
  * mechanism demonstration — the driver fixture's events table is
  * NOT actually skewed (measured at sf10: 10M rows over 150k users,
  * hottest key 99 rows), and the advice on its recorded stats is 1
  * ("don't salt"), which is the correct call there (AQE handles that
  * shape unaided). The hand-tuned 8 corresponds to the shape the
  * operator's cost model describes — a hot key of ~400k rows over a
  * 50k-row cell granule — and THAT calibration is what the first
  * test pins.
  */
class CatalogFactSizingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val factSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType)))

  private def freshCat() = {
    val root = java.nio.file.Files.createTempDirectory("graft_fact_test_").toString
    val cat = new Catalog(spark, root)
    cat.ensureTables()
    cat
  }

  test("adviseSalts pins the hand-tuned calibration and its boundaries") {
    // the 60M-row / 150-hot-key shape the saltedJoin scaladoc's cost
    // model describes: hottest key 400k rows / 50k cell granule = 8 —
    // the hand-tuned q_skew_salted_join value
    assert(Skew.adviseSalts(60000000L, 150L, 400000L) == 8)
    // uniform floor dominates when per-batch maxes under-count: same
    // advice with maxKeyRows unrecorded (rows/keys = 400k)
    assert(Skew.adviseSalts(60000000L, 150L, 0L) == 8)
    // un-skewed data advises 1 = don't salt (the REAL events fixture:
    // hottest user 99 rows)
    assert(Skew.adviseSalts(10000000L, 150000L, 99L) == 1)
    // pow2 rounding and the 256 cap
    assert(Skew.adviseSalts(1000000L, 1L, 1000000L) == 32) // 20 -> 32
    assert(Skew.adviseSalts(100000000L, 1L, 100000000L) == 256)
    // degenerate inputs stay sane
    assert(Skew.adviseSalts(0L, 0L, 0L) == 1)
  }

  test("declared fact table accumulates stats across appends; advice flows") {
    val cat = freshCat()
    cat.declareFactTable("FACTS", "user_id", factSchema)
    assert(cat.factSizing("FACTS").contains(Catalog.FactSizing(0L, 0L, 0L)))
    // batch 1: key 7 is hot (300 rows); batch 2: 100 uniform rows
    cat.append("FACTS", (0 until 300).map(_ => (7L, "hot")).toDF("user_id", "event_type"))
    cat.append("FACTS", (0 until 100).map(i => (i.toLong, "cold")).toDF("user_id", "event_type"))
    val s = cat.factSizing("FACTS").get
    assert(s.rows == 400L)
    assert(s.maxKeyRows == 300L)
    assert(math.abs(s.keysApprox - 101L) <= 10L) // HLL on a small set
    // a 50-row cell granule splits the 300-row hot key 8 ways (pow2 of 6)
    assert(cat.saltAdvice("FACTS", hotCellRows = 50L).contains(8))
    // at the default granule this table is trivially unsalted
    assert(cat.saltAdvice("FACTS").contains(1))
    // undeclared table: no advice
    assert(cat.saltAdvice("NOPE").isEmpty)
  }

  test("null-key rows are excluded from rows, sketch, and hot-key count") {
    // null keys can never match in saltedJoin's equi-join, so a
    // null-heavy batch must not read as a hot key (the round-15
    // ADVICE find: the null group inflated rows vs the null-ignoring
    // sketch and over-advised salting)
    val cat = freshCat()
    cat.declareFactTable("FACTS", "user_id", factSchema)
    cat.append("FACTS",
      ((0 until 500).map(_ => (Option.empty[Long], "null_key")) ++
        (0 until 20).map(i => (Some(i.toLong), "real")))
        .toDF("user_id", "event_type"))
    val s = cat.factSizing("FACTS").get
    assert(s.rows == 20L, "rows counts join-participating rows only")
    assert(s.maxKeyRows == 1L, "the 500-row null group is not a key")
    assert(math.abs(s.keysApprox - 20L) <= 3L)
    // refreshSizing (full-table recompute) applies the same exclusion
    cat.refreshSizing("FACTS")
    assert(cat.factSizing("FACTS").get.maxKeyRows == 1L)
  }

  test("append streams: batch stats come from the written files, not a pin") {
    // non-deterministic batch lineage (rand-filtered) — the stats
    // must describe exactly the rows that landed in the files, which
    // the read-back-the-batch design guarantees by construction
    val cat = freshCat()
    cat.declareFactTable("FACTS", "user_id", factSchema)
    cat.append("FACTS",
      spark.range(1000)
        .select(col("id").as("user_id"), lit("e").as("event_type"))
        .filter(rand(42) < 0.5))
    val s = cat.factSizing("FACTS").get
    val stored = cat.table("FACTS").count()
    assert(s.rows == stored, s"stats rows ${s.rows} != stored $stored")
  }

  test("fact stats persist across re-open; rewrite turns the max exact") {
    val root = java.nio.file.Files.createTempDirectory("graft_fact_test_").toString
    val cat = new Catalog(spark, root)
    cat.ensureTables()
    cat.declareFactTable("FACTS", "user_id", factSchema)
    // the SAME key split across two batches: accumulated max is the
    // documented lower bound (60), refreshSizing recovers exact (120)
    cat.append("FACTS", (0 until 60).map(_ => (1L, "a")).toDF("user_id", "event_type"))
    cat.append("FACTS", (0 until 60).map(_ => (1L, "b")).toDF("user_id", "event_type"))
    assert(cat.factSizing("FACTS").get.maxKeyRows == 60L)
    cat.refreshSizing("FACTS")
    assert(cat.factSizing("FACTS").get.maxKeyRows == 120L)
    val reopened = new Catalog(spark, root)
    reopened.ensureTables()
    reopened.declareFactTable("FACTS", "user_id", factSchema)
    val s = reopened.factSizing("FACTS").get
    assert(s.rows == 120L && s.maxKeyRows == 120L)
  }
}
