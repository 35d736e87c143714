package graft.engine

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Graph

/** Catalog-maintained GraphSizing for declared edge tables (the
  * round-13 sizing hints promoted from bench staging metadata to the
  * catalog surface): stats accumulate across appends, survive
  * re-opening the warehouse, refresh on rewrites, and feed a rank
  * loop that then skips its own sizing scan with unchanged results.
  */
class CatalogEdgeSizingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val edgeSchema = StructType(Seq(
    StructField("src", LongType),
    StructField("dst", LongType)))

  private def freshCat() = {
    val root = java.nio.file.Files.createTempDirectory("graft_edge_test_").toString
    val cat = new Catalog(spark, root)
    cat.ensureTables()
    (cat, root)
  }

  private def edges(n: Int, offset: Long = 0L) =
    (0 until n).map(i => (offset + i % 40, offset + 1000 + i % 25))
      .toDF("src", "dst")

  test("append accumulates rows exactly and node counts within HLL error") {
    val (cat, _) = freshCat()
    cat.declareEdgeTable("EDGES", "src", "dst", edgeSchema)
    assert(cat.sizingHint("EDGES").contains(Graph.GraphSizing(0L, 0L, 0L)))
    cat.append("EDGES", edges(200))
    cat.append("EDGES", edges(100, offset = 7))
    val hint = cat.sizingHint("EDGES").get
    assert(hint.edgeRows == 300L)
    val truth = Graph.sizingOf(cat.table("EDGES"), "src", "dst")
    // HLL estimates on both sides: small sets, so they must be close
    assert(math.abs(hint.srcNodesApprox - truth.srcNodesApprox) <=
      math.max(2L, truth.srcNodesApprox / 10))
    assert(math.abs(hint.dstNodesApprox - truth.dstNodesApprox) <=
      math.max(2L, truth.dstNodesApprox / 10))
  }

  test("stats persist across a warehouse re-open; re-declare is idempotent") {
    val (cat, root) = freshCat()
    cat.declareEdgeTable("EDGES", "src", "dst", edgeSchema)
    cat.append("EDGES", edges(150))
    val before = cat.sizingHint("EDGES").get
    val reopened = new Catalog(spark, root)
    reopened.ensureTables()
    reopened.declareEdgeTable("EDGES", "src", "dst", edgeSchema)
    assert(reopened.sizingHint("EDGES").contains(before))
    assert(reopened.table("EDGES").count() == 150L)
  }

  test("declaring over pre-existing data seeds stats from the table") {
    val (cat, root) = freshCat()
    cat.declareEdgeTable("EDGES", "src", "dst", edgeSchema)
    cat.append("EDGES", edges(120))
    // a second catalog instance that never saw the appends, with the
    // sizing store deleted: declaration must rebuild from stored data
    val p = java.nio.file.Paths.get(s"$root/tables/.sizing_EDGES")
    java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => java.nio.file.Files.deleteIfExists(f))
    val reopened = new Catalog(spark, root)
    reopened.declareEdgeTable("EDGES", "src", "dst", edgeSchema)
    assert(reopened.sizingHint("EDGES").get.edgeRows == 120L)
  }

  test("a rewrite (cluster) refreshes rather than double-counts") {
    val (cat, _) = freshCat()
    cat.declareEdgeTable("EDGES", "src", "dst", edgeSchema)
    cat.append("EDGES", edges(80))
    cat.cluster("EDGES", Seq("src"), numFiles = 2)
    assert(cat.sizingHint("EDGES").get.edgeRows == 80L)
  }

  test("rank loop consumes the catalog hint with unchanged results") {
    val (cat, _) = freshCat()
    cat.declareEdgeTable("EDGES", "src", "dst", edgeSchema)
    cat.append("EDGES", edges(300))
    val stored = cat.table("EDGES")
    val hinted = Graph.pageRank(stored, "src", "dst", iters = 3,
        sizingHint = cat.sizingHint("EDGES"))
      .orderBy("node").collect().toSeq
    val scanned = Graph.pageRank(stored, "src", "dst", iters = 3)
      .orderBy("node").collect().toSeq
    assert(hinted == scanned)
  }

  test("undeclared tables report no hint; sizing store hides from listTables") {
    val (cat, _) = freshCat()
    assert(cat.sizingHint("NOPE").isEmpty)
    cat.declareEdgeTable("EDGES", "src", "dst", edgeSchema)
    cat.append("EDGES", edges(10))
    assert(cat.listTables().contains("EDGES"))
    assert(!cat.listTables().exists(_.contains("sizing")))
  }
}
