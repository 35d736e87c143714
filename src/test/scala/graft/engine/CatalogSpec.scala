package graft.engine

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CatalogSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def freshCat(): Catalog = {
    val root = java.nio.file.Files.createTempDirectory("graft_cat_test_").toString
    val cat = new Catalog(spark, root)
    cat.ensureTables()
    cat
  }

  test("ensureTables creates all five empty tables with canonical schemas") {
    val cat = freshCat()
    Catalog.schemas.foreach { case (name, schema) =>
      val t = cat.table(name)
      assert(t.count() == 0)
      assert(t.schema.fieldNames.toSeq == schema.fieldNames.toSeq)
    }
  }

  test("append stamps timestamp defaults and fills missing columns") {
    val cat = freshCat()
    cat.append("NEW_UPLOADS",
      Seq(("a.pdf", "stage/a.pdf", "stage", true)).toDF(
        "file_name", "file_ref", "stage_name", "processed"))
    val row = cat.table("NEW_UPLOADS").collect()(0)
    assert(row.getAs[String]("file_name") == "a.pdf")
    assert(row.getAs[java.sql.Timestamp]("uploaded_at") != null)
  }

  test("merge persists an upsert (update + insert)") {
    val cat = freshCat()
    cat.append("CLASS_PROMPTS", Seq(("invoice", "{}")).toDF("class_name", "prompts"))
    cat.merge("CLASS_PROMPTS",
      cat.table("CLASS_PROMPTS").limit(0) // empty with right schema
        .unionByName(Seq(("invoice", """{"a":"b"}"""), ("report", "{}"))
          .toDF("class_name", "prompts")
          .withColumn("created_at", current_timestamp())
          .withColumn("updated_at", current_timestamp())),
      Seq("class_name"))
    val rows = cat.table("CLASS_PROMPTS")
      .select("class_name", "prompts").as[(String, String)].collect().toMap
    assert(rows.keySet == Set("invoice", "report"))
    assert(rows("invoice") == """{"a":"b"}""")
  }

  test("deleteWhere removes matching rows only") {
    val cat = freshCat()
    cat.append("CLASS_PROMPTS",
      Seq(("a", "{}"), ("b", "{}")).toDF("class_name", "prompts"))
    cat.deleteWhere("CLASS_PROMPTS", col("class_name") === "a")
    assert(cat.table("CLASS_PROMPTS").select("class_name")
      .as[String].collect().toSeq == Seq("b"))
  }

  test("putFile + directory scan lists staged files with content") {
    val cat = freshCat()
    cat.putFile("mystage", "x.txt", "hello".getBytes(StandardCharsets.UTF_8))
    cat.putFile("mystage", "sub/y.txt", "world".getBytes(StandardCharsets.UTF_8))
    val rows = cat.directory("mystage")
      .select("relative_path", "file_url", "length")
      .orderBy("relative_path")
      .as[(String, String, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq("sub/y.txt", "x.txt"))
    assert(rows(1)._2 == "@mystage/x.txt")
    assert(rows(1)._3 == 5L)
    val content = cat.directory("mystage")
      .filter(col("relative_path") === "x.txt")
      .select(col("content").cast("string")).as[String].collect()(0)
    assert(content == "hello")
  }

  test("directory scan handles stage names containing regex metacharacters") {
    val cat = freshCat()
    cat.putFile("v1.2+x", "doc.txt", "hi".getBytes(StandardCharsets.UTF_8))
    val rows = cat.directory("v1.2+x")
      .select("relative_path", "file_url").as[(String, String)].collect()
    assert(rows.toSeq == Seq(("doc.txt", "@v1.2+x/doc.txt")))
  }

  test("listStages unions filesystem stages with NEW_UPLOADS references") {
    val cat = freshCat()
    cat.putFile("fs_stage", "a.txt", "x".getBytes(StandardCharsets.UTF_8))
    cat.append("NEW_UPLOADS",
      Seq(("f", "ref_stage/f", "ref_stage", false)).toDF(
        "file_name", "file_ref", "stage_name", "processed"))
    assert(cat.listStages() == Seq("fs_stage", "ref_stage"))
  }

  test("fields table is written partitioned by class_name and prunes on read") {
    val cat = freshCat()
    cat.append("DOCUMENTS_EXTRACTED_FIELDS",
      Seq(("u1", "f1", "invoice", "total", "\"100\""),
          ("u2", "f2", "report", "title", "\"t\""))
        .toDF("file_url", "file_ref", "class_name", "field_name", "field_value"))
    // physical layout: one dir per class
    val dirs = java.nio.file.Files.list(
      java.nio.file.Paths.get(cat.root, "tables", "DOCUMENTS_EXTRACTED_FIELDS"))
      .iterator()
    var names = List.empty[String]
    while (dirs.hasNext) names ::= dirs.next().getFileName.toString
    assert(names.exists(_.startsWith("class_name=invoice")), names.toString)
    // read back: full schema, and a class filter becomes a PartitionFilter
    val t = cat.table("DOCUMENTS_EXTRACTED_FIELDS")
    assert(t.count() == 2)
    val plan = t.filter(col("class_name") === "invoice")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(class_name"), plan)
    assert(t.filter(col("class_name") === "invoice").count() == 1)
  }

  test("compact collapses many small append files into few") {
    val cat = freshCat()
    (1 to 8).foreach { i =>
      cat.append("DOCUMENT_OCR",
        Seq((s"f$i", s"f$i", "{}", "s")).toDF("file_name", "file_ref", "ocr", "summary"))
    }
    def fileCount = {
      val s = java.nio.file.Files.walk(
        java.nio.file.Paths.get(cat.root, "tables", "DOCUMENT_OCR"))
      try s.filter(p => p.toString.endsWith(".parquet")).count() finally s.close()
    }
    assert(fileCount >= 8, "each append writes its own file(s)")
    cat.compact("DOCUMENT_OCR")
    assert(fileCount == 1, s"compaction should leave one file, got $fileCount")
    assert(cat.table("DOCUMENT_OCR").count() == 8)
  }

  test("dropTable removes the table directory") {
    val cat = freshCat()
    cat.dropTable("DOCUMENT_OCR")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(cat.root, "tables", "DOCUMENT_OCR")))
  }

  test("dropStage removes the stage directory") {
    val cat = freshCat()
    cat.putFile("gone", "a.txt", "x".getBytes(StandardCharsets.UTF_8))
    assert(cat.listStages().contains("gone"))
    cat.dropStage("gone")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(cat.root, "stages", "gone")))
    assert(!cat.listStages().contains("gone"))
  }

  test("listTables + introspect report S10 object counts") {
    val cat = freshCat()
    assert(cat.listTables() == Catalog.schemas.keys.toSeq.sorted)
    cat.putFile("s1", "a.txt", "x".getBytes(StandardCharsets.UTF_8))
    val counts = cat.introspect().as[(String, Long)].collect().toMap
    assert(counts("tables") == Catalog.schemas.size.toLong)
    assert(counts("stages") == 1L)
    cat.dropTable("DOCUMENT_OCR")
    assert(cat.listTables() == Catalog.schemas.keys.toSeq.filter(_ != "DOCUMENT_OCR").sorted)
  }

  test("overwrite never has a window with no table data (bak-swap + recover)") {
    val cat = freshCat()
    cat.append("CLASS_PROMPTS", Seq(("a", "{}"), ("b", "{}")).toDF("class_name", "prompts"))
    // normal swap: data replaced, no .bak/.tmp residue
    cat.deleteWhere("CLASS_PROMPTS", col("class_name") === "a")
    assert(cat.table("CLASS_PROMPTS").select("class_name").as[String].collect().toSeq == Seq("b"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(cat.root, "tables", ".bak_CLASS_PROMPTS")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(cat.root, "tables", ".tmp_CLASS_PROMPTS")))
    // simulate a crash between live->bak and tmp->live: live dir gone,
    // fresh data stranded in .tmp_ — recover() must restore it
    val live = java.nio.file.Paths.get(cat.root, "tables", "CLASS_PROMPTS")
    val tmp = java.nio.file.Paths.get(cat.root, "tables", ".tmp_CLASS_PROMPTS")
    java.nio.file.Files.move(live, tmp)
    cat.recover("CLASS_PROMPTS")
    assert(cat.table("CLASS_PROMPTS").count() == 1)
    // simulate a crash where only .bak_ survived (tmp write incomplete
    // and discarded): recover() must restore the previous data
    val bak = java.nio.file.Paths.get(cat.root, "tables", ".bak_CLASS_PROMPTS")
    java.nio.file.Files.move(live, bak)
    cat.recover("CLASS_PROMPTS")
    assert(cat.table("CLASS_PROMPTS").count() == 1)
  }

  test("cluster rewrites the table range-partitioned and sorted within files") {
    val cat = freshCat()
    // append in shuffled id order across several files
    Seq(Seq(7, 2), Seq(9, 1), Seq(4, 8), Seq(3, 6)).foreach { ids =>
      cat.append("DOCUMENT_OCR",
        ids.map(i => (f"f$i%02d", f"f$i%02d", "{}", "s"))
          .toDF("file_name", "file_ref", "ocr", "summary"))
    }
    cat.cluster("DOCUMENT_OCR", Seq("file_name"), numFiles = 2)
    assert(cat.table("DOCUMENT_OCR").count() == 8)
    // every data file individually sorted on the cluster key, and the
    // key ranges of different files must not interleave (range layout)
    val files = {
      val s = java.nio.file.Files.walk(
        java.nio.file.Paths.get(cat.root, "tables", "DOCUMENT_OCR"))
      try {
        val it = s.filter(p => p.toString.endsWith(".parquet")).iterator()
        val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next().toString
        b.result()
      } finally s.close()
    }
    assert(files.size == 2, files.toString)
    val perFile = files.map { f =>
      val names = spark.read.parquet(f).select("file_name").as[String].collect()
      assert(names.sameElements(names.sorted), s"$f not sorted: ${names.toSeq}")
      (names.min, names.max)
    }.sortBy(_._1)
    assert(perFile.sliding(2).forall {
      case Seq((_, maxA), (minB, _)) => maxA <= minB
      case _ => true
    }, s"file ranges interleave: $perFile")
  }

  test("appendBatch is idempotent under replay of the same token") {
    val cat = freshCat()
    val rows = Seq(("u1", "f1", "invoice", "{}"), ("u2", "f2", "report", "{}"))
      .toDF("file_url", "file_ref", "class_name", "extraction_result")
    cat.appendBatch("DOCUMENTS_PROCESSED", rows, "7")
    cat.appendBatch("DOCUMENTS_PROCESSED", rows, "7") // crash-replay
    assert(cat.table("DOCUMENTS_PROCESSED").count() == 2)
    cat.appendBatch("DOCUMENTS_PROCESSED", rows, "8") // next batch appends
    assert(cat.table("DOCUMENTS_PROCESSED").count() == 4)
    // partitioned table path: subdirs preserved, same idempotence
    val fields = Seq(("u1", "f1", "invoice", "total", "\"1\""))
      .toDF("file_url", "file_ref", "class_name", "field_name", "field_value")
    cat.appendBatch("DOCUMENTS_EXTRACTED_FIELDS", fields, "0")
    cat.appendBatch("DOCUMENTS_EXTRACTED_FIELDS", fields, "0")
    assert(cat.table("DOCUMENTS_EXTRACTED_FIELDS").count() == 1)
    assert(cat.table("DOCUMENTS_EXTRACTED_FIELDS")
      .filter(col("class_name") === "invoice").count() == 1)
  }
}
