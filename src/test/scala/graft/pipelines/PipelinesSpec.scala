package graft.pipelines

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.engine.Catalog

/** End-to-end pipeline tests (SURVEY §5 item 4): run the three modes on
  * a temp warehouse with planted documents, assert the five tables and
  * the History read path.
  */
class PipelinesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docA = "Invoice INV-7 from Acme. The total is $250. Due on 2024-03-01."
  private val docB = "Contract between Foo and Bar. Effective date 2023-12-31. Term two years."

  private def stagedCat(): Catalog = {
    val root = java.nio.file.Files.createTempDirectory("graft_pipe_test_").toString
    val cat = new Catalog(spark, root)
    cat.ensureTables()
    cat.putFile("docs", "a.txt", docA.getBytes(StandardCharsets.UTF_8))
    cat.putFile("docs", "b.txt", docB.getBytes(StandardCharsets.UTF_8))
    cat
  }

  test("interactive pipeline persists to all four tables and History reads back") {
    val cat = stagedCat()
    val out = Pipelines.interactive(cat, "docs", "a.txt")
    assert(out.count() == 1)

    assert(cat.table("DOCUMENTS_PROCESSED").count() == 1)
    val dp = cat.table("DOCUMENTS_PROCESSED").collect()(0)
    assert(dp.getAs[String]("file_url") == "@docs/a.txt")
    assert(dp.getAs[String]("extraction_result").startsWith("""{"response": {"""))

    assert(cat.table("DOCUMENTS_EXTRACTED_FIELDS").count() >= 1)
    assert(cat.table("DOCUMENT_OCR").count() == 1)
    val ocr = cat.table("DOCUMENT_OCR").collect()(0)
    assert(ocr.getAs[String]("summary").startsWith("Summary: "))
    assert(get_json_object(lit(ocr.getAs[String]("ocr")), "$.content") != null)

    val uploads = cat.table("NEW_UPLOADS").collect()
    assert(uploads.length == 1 && uploads(0).getAs[Boolean]("processed"))

    // prompts were generated for the doc's class
    assert(cat.table("CLASS_PROMPTS").count() >= 1)

    // History read path
    val hist = HistoryQueries.documents(cat).collect()
    assert(hist.length == 1)
    assert(hist(0).getAs[String]("file_ref") == "a.txt")
    assert(hist(0).getAs[Boolean]("has_ocr"))
    assert(hist(0).getAs[String]("stage") == "docs")
    assert(HistoryQueries.classSummary(cat).collect()(0).getAs[Long]("docs") == 1L)
  }

  test("batchSql pipeline produces one wide row per staged file") {
    val cat = stagedCat()
    val wide = Pipelines.batchSql(cat, "docs",
      Map("title" -> "What is the title?", "date" -> "What is the date?"))
    val rows = wide.orderBy("relative_path").collect()
    assert(rows.length == 2)
    assert(wide.columns.toSeq == Seq("relative_path", "file_url", "date", "title"))
    assert(rows.map(_.getAs[String]("relative_path")).toSeq == Seq("a.txt", "b.txt"))
  }

  test("streaming pipeline persists per micro-batch and is restart-safe") {
    val cat = stagedCat()
    val checkpoint = cat.root + "/cp"
    val q1 = Pipelines.stream(cat, "docs", Map("t" -> "What is the title?"), checkpoint)
    try q1.processAllAvailable() finally q1.stop()
    assert(cat.table("DOCUMENTS_PROCESSED").count() == 2)
    assert(cat.table("DOCUMENTS_EXTRACTED_FIELDS").count() == 2)

    // new file arrives; restart from the same checkpoint processes ONLY it
    cat.putFile("docs", "c.txt", "New doc. About nothing.".getBytes(StandardCharsets.UTF_8))
    val q2 = Pipelines.stream(cat, "docs", Map("t" -> "What is the title?"), checkpoint)
    try q2.processAllAvailable() finally q2.stop()
    assert(cat.table("DOCUMENTS_PROCESSED").count() == 3,
      "checkpoint must prevent reprocessing of a.txt/b.txt")
  }

  test("a stream restarted with a FRESH checkpoint never clobbers prior data") {
    val cat = stagedCat()
    val q1 = Pipelines.stream(cat, "docs", Map("t" -> "What is the title?"),
      cat.root + "/cp1")
    try q1.processAllAvailable() finally q1.stop()
    val n1 = cat.table("DOCUMENTS_PROCESSED").count()
    assert(n1 == 2)
    // operator error / checkpoint loss: the stream comes back with a NEW
    // checkpoint against the SAME warehouse. batchIds restart at 0 and
    // every file is rediscovered — the batch-0 append must land under a
    // new run token and APPEND, not replay-delete the first run's
    // batch-0 files (which held ALL of its data)
    val q2 = Pipelines.stream(cat, "docs", Map("t" -> "What is the title?"),
      cat.root + "/cp2")
    try q2.processAllAvailable() finally q2.stop()
    assert(cat.table("DOCUMENTS_PROCESSED").count() == 2 * n1,
      "fresh-checkpoint restart must append, never destroy committed rows")
  }

  test("streaming persists are exactly-once under foreachBatch replay") {
    val cat = stagedCat()
    val batch = cat.directory("docs")
      .withColumn("relative_path", col("relative_path"))
      .withColumn("file_url", concat(lit("@docs/"), col("relative_path")))
      .withColumn("text", graft.ai.AiFunctions.parse_document(col("content")))
      .withColumn("class_name", graft.ai.AiFunctions.ai_classify(col("text")))
      .withColumn("extraction_result",
        graft.ai.AiFunctions.ai_extract_json(col("text"),
          map(lit("t"), lit("What is the title?"))))
      .withColumn("result_map",
        graft.ai.AiFunctions.ai_extract(col("text"),
          map(lit("t"), lit("What is the title?"))))
    // a crash between the append and the checkpoint commit replays the
    // SAME (run, batchId): row counts must not change on the second run
    Pipelines.persistBatch(cat, batch, run = "runA", batchId = 0L)
    val n1 = cat.table("DOCUMENTS_PROCESSED").count()
    val f1 = cat.table("DOCUMENTS_EXTRACTED_FIELDS").count()
    Pipelines.persistBatch(cat, batch, run = "runA", batchId = 0L)
    assert(cat.table("DOCUMENTS_PROCESSED").count() == n1,
      "batchId replay must not double-append DOCUMENTS_PROCESSED")
    assert(cat.table("DOCUMENTS_EXTRACTED_FIELDS").count() == f1,
      "batchId replay must not double-append DOCUMENTS_EXTRACTED_FIELDS")
    // a genuinely new batch still appends
    Pipelines.persistBatch(cat, batch, run = "runA", batchId = 1L)
    assert(cat.table("DOCUMENTS_PROCESSED").count() == 2 * n1)
    // a RESTARTED stream with a fresh checkpoint restarts batchIds at 0
    // under a NEW run token: it must append, never delete the previous
    // run's batch-0 data (the bare-batchId hazard)
    Pipelines.persistBatch(cat, batch, run = "runB", batchId = 0L)
    assert(cat.table("DOCUMENTS_PROCESSED").count() == 3 * n1,
      "fresh-checkpoint batch 0 must not clobber the previous run's batch 0")
    // run tokens are write-once per checkpoint dir: stable across
    // restarts from the same checkpoint, fresh for a new checkpoint
    val ck1 = cat.root + "/checkpoints/t1"
    val ck2 = cat.root + "/checkpoints/t2"
    val t1 = Pipelines.runToken(ck1)
    assert(Pipelines.runToken(ck1) == t1, "same checkpoint must reuse its token")
    assert(Pipelines.runToken(ck2) != t1, "new checkpoint must mint a new token")
  }

  test("interactive pipeline canonicalizes non-flat prompt schemas on read") {
    val cat = stagedCat()
    // pre-seed prompts for every class in the backend's class set using
    // the ['q', text] list shape (app:161-183); ensurePrompts will not
    // overwrite them (anti-join guard), so extraction must canonicalize
    import org.apache.spark.sql.functions.current_timestamp
    val seeded = Seq("invoice", "contract", "report", "letter", "form")
      .map(c => (c, """["q", "What is this about?"]"""))
      .toDF("class_name", "prompts")
      .withColumn("created_at", current_timestamp())
      .withColumn("updated_at", current_timestamp())
    cat.merge("CLASS_PROMPTS", seeded, Seq("class_name"))
    Pipelines.interactive(cat, "docs", "a.txt")
    val fields = cat.table("DOCUMENTS_EXTRACTED_FIELDS")
      .select("field_name").as[String].collect().toSeq
    assert(fields == Seq("q"), s"list-shaped schema must canonicalize to {'q': ...}: $fields")
  }

  test("HistoryQueries.fields flattens with derived stage and filters compose") {
    val cat = stagedCat()
    Pipelines.interactive(cat, "docs", "a.txt")
    Pipelines.interactive(cat, "docs", "b.txt")
    val all = HistoryQueries.fields(cat)
    assert(all.count() >= 2)
    assert(all.select("stage").distinct().as[String].collect().toSeq == Seq("docs"))
    // filename filter narrows to one document's fields
    val filtered = HistoryQueries.fields(cat,
      HistoryQueries.docFilters(Nil, None, Some("a.txt")))
    assert(filtered.select("file_ref").distinct().as[String].collect().toSeq == Seq("a.txt"))
    // class filter with a non-existent class yields nothing
    assert(HistoryQueries.fields(cat,
      HistoryQueries.docFilters(Seq("no_such_class"), None, None)).count() == 0)
  }

  test("documentsFrom probes schema and falls back to stable ordering (app:696-741)") {
    // timestamp-less shapes (the app's reduced runtime DDL)
    val fields = Seq(("@docs/a.txt", "a.txt", "invoice", "total", "\"1\""))
      .toDF("file_url", "file_ref", "class_name", "field_name", "field_value")
    val processed = Seq(("@docs/a.txt", "a.txt", "invoice", "{}"))
      .toDF("file_url", "file_ref", "class_name", "extraction_result")
    val ocr = Seq(("a.txt", "a.txt")).toDF("file_name", "file_ref")
    val out = HistoryQueries.documentsFrom(fields, processed, ocr).collect()
    assert(out.length == 1)
    assert(out(0).getAs[java.sql.Timestamp]("processed_at") == null)
    assert(out(0).getAs[Long]("fields_extracted") == 1L)
    assert(out(0).getAs[Boolean]("has_ocr"))
  }

  test("ensurePrompts is idempotent (anti-join guard)") {
    val cat = stagedCat()
    val classes = Seq("invoice").toDF("class_name")
    Pipelines.ensurePrompts(cat, classes)
    val first = cat.table("CLASS_PROMPTS").select("prompts").as[String].collect()(0)
    Pipelines.ensurePrompts(cat, classes)
    assert(cat.table("CLASS_PROMPTS").count() == 1)
    assert(cat.table("CLASS_PROMPTS").select("prompts").as[String].collect()(0) == first)
  }
}
