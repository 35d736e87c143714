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

  test("interrupted sizing swap: the .bak fallback serves the old stats; " +
    "refreshSizing repairs from stored rows") {
    val (cat, root) = freshCat()
    cat.declareEdgeTable("EDGES", "src", "dst", edgeSchema)
    cat.append("EDGES", edges(90))
    val before = cat.sizingHint("EDGES").get
    // simulate a crash mid-swap: live moved to .bak, replacement never
    // arrived (the exact window the old delete-then-move left empty)
    val live = java.nio.file.Paths.get(s"$root/tables/.sizing_EDGES")
    val bak = java.nio.file.Paths.get(s"$root/tables/.bak_sizing_EDGES")
    java.nio.file.Files.move(live, bak)
    assert(cat.sizingHint("EDGES").contains(before), "bak fallback")
    // the repair hook re-derives stats exactly from the stored rows
    cat.refreshSizing("EDGES")
    assert(java.nio.file.Files.exists(live.resolve("_SUCCESS")))
    assert(cat.sizingHint("EDGES").get.edgeRows == 90L)
  }

  test("append records stats of ONE batch materialization (localCheckpoint " +
    "pins non-deterministic lineage)") {
    val (cat, _) = freshCat()
    cat.declareEdgeTable("EDGES", "src", "dst", edgeSchema)
    // rand()-gated lineage would count differently on every evaluation;
    // the pin forces stats and written rows to agree exactly
    val nondet = edges(400).filter(rand() < 0.5)
    cat.append("EDGES", nondet)
    val hint = cat.sizingHint("EDGES").get
    assert(hint.edgeRows == cat.table("EDGES").count(),
      s"stats ${hint.edgeRows} must match written rows")
  }

  test("triangles / clustering-coef / k-core consume the catalog hint " +
    "with unchanged results (task-7 parity, mirrors the rank-loop test)") {
    val (cat, _) = freshCat()
    cat.declareEdgeTable("EDGES", "src", "dst", edgeSchema)
    // a graph with real triangles: ring + chords over 60 nodes
    val tri = (0L until 60L).flatMap(i => Seq(
      (i, (i + 1) % 60), (i, (i + 2) % 60))).toDF("src", "dst")
    cat.append("EDGES", tri)
    val stored = cat.table("EDGES")
    val hint = cat.sizingHint("EDGES")
    assert(hint.exists(_.edgeRows == 120L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("node").collect().toSeq
    assert(rows(Graph.triangleCounts(stored, "src", "dst", sizingHint = hint)) ==
      rows(Graph.triangleCounts(stored, "src", "dst")))
    assert(rows(Graph.clusteringCoefficient(stored, "src", "dst", sizingHint = hint)) ==
      rows(Graph.clusteringCoefficient(stored, "src", "dst")))
    assert(rows(Graph.kCorePeel(stored, "src", "dst", k = 3, rounds = 4,
        sizingHint = hint)) ==
      rows(Graph.kCorePeel(stored, "src", "dst", k = 3, rounds = 4)))
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
