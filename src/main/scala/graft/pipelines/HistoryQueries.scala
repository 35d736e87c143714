package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.ops.Relational

/** The History page's 3-query fan (app:649-790) — the reference's widest
  * read path: class summary (A1), document dedup+enrich (W1+J1+J2+J3),
  * and field flatten (F1/F2/F8). Filters arrive as composable Columns
  * (P6), not SQL-string surgery.
  */
object HistoryQueries {

  /** Stage name derived from a file_url:
    * REGEXP_REPLACE(SPLIT_PART(file_url,'/',1),'^@','') (app:707).
    */
  def derivedStage(fileUrl: Column): Column =
    regexp_replace(split_part(fileUrl, lit("/"), lit(1)), "^@", "")

  /** Dynamic WHERE over the documents view (app:662-674): class IN-list,
    * stage ILIKE, filename LOWER-LIKE.
    */
  def docFilters(classes: Seq[String], stageLike: Option[String],
                 fileLike: Option[String]): Seq[Column] = {
    val cs = if (classes.nonEmpty)
      Seq(col("class_name").isin(classes: _*)) else Seq.empty
    val st = stageLike.map(s =>
      lower(coalesce(derivedStage(col("file_url")), lit("")))
        .contains(s.toLowerCase)).toSeq
    val fn = fileLike.map(s =>
      lower(col("file_ref")).contains(s.toLowerCase)).toSeq
    cs ++ st ++ fn
  }

  /** Class summary (A1, app:678-688): docs per class. */
  def classSummary(cat: Catalog, filters: Seq[Column] = Nil): DataFrame =
    cat.table("DOCUMENTS_EXTRACTED_FIELDS")
      .filter(Relational.conjunction(filters))
      .groupBy(col("class_name"))
      .agg(countDistinct(col("file_ref")).as("docs"))
      .orderBy(col("docs").desc, col("class_name"))

  /** Document list (app:696-741): one row per (file_ref, class_name),
    * latest first, enriched with processing time (J1), field count (J2),
    * and OCR flag (J3). The correlated subqueries of the reference are
    * decorrelated by hand into aggregations + a left join — one shuffle
    * per aggregate, all on the same (file_ref, class_name) key so AQE
    * can reuse the exchange.
    */
  def documents(cat: Catalog, filters: Seq[Column] = Nil): DataFrame =
    documentsFrom(cat.table("DOCUMENTS_EXTRACTED_FIELDS"),
      cat.table("DOCUMENTS_PROCESSED"), cat.table("DOCUMENT_OCR"), filters)

  /** DataFrame-based form with the reference's schema-drift tolerance
    * (app:696-741): the app's runtime DDL omits the timestamp columns
    * that setup DDL includes, and the History page falls back from a
    * timestamp-aware query to a stable-ordered one. Here that is a
    * STATIC schema probe (`columns.contains`) choosing the plan up
    * front — no try/except query rewriting (SURVEY §1.3).
    */
  def documentsFrom(fields0: DataFrame, processed0: DataFrame, ocr: DataFrame,
                    filters: Seq[Column] = Nil): DataFrame = {
    val hasFieldsTs = fields0.columns.contains("extracted_at")
    val hasProcTs = processed0.columns.contains("processed_at")
    val fields = fields0.filter(Relational.conjunction(filters))
    val processed = processed0
      .groupBy(col("file_ref"), col("class_name"))
      .agg(
        (if (hasProcTs) max(col("processed_at"))
         else lit(null).cast("timestamp")).as("last_processed_at"))
    val perDoc = fields
      .groupBy(col("file_ref"), col("class_name"))
      .agg(
        first(col("file_url"), ignoreNulls = true).as("file_url"),
        count(lit(1)).as("fields_extracted"),
        (if (hasFieldsTs) max(col("extracted_at"))
         else lit(null).cast("timestamp")).as("extracted_at"))
    val ocrRefs = ocr.select(col("file_ref")).distinct()
      .withColumn("has_ocr_flag", lit(true))
    val enriched = perDoc
      .join(processed, Seq("file_ref", "class_name"), "left")
      .join(ocrRefs, Seq("file_ref"), "left")
      .withColumn("processed_at",
        coalesce(col("last_processed_at"), col("extracted_at")))
      .withColumn("has_ocr", coalesce(col("has_ocr_flag"), lit(false)))
      .withColumn("stage", derivedStage(col("file_url")))
      .select("file_ref", "class_name", "file_url", "stage",
        "processed_at", "fields_extracted", "has_ocr")
    // W1 ordering when timestamps exist; W2 stable fallback otherwise
    if (hasFieldsTs || hasProcTs)
      enriched.orderBy(col("processed_at").desc_nulls_last, col("file_ref"))
    else enriched.orderBy(col("file_ref"))
  }

  /** Field flatten (app:745-754): all extracted fields, filtered. */
  def fields(cat: Catalog, filters: Seq[Column] = Nil): DataFrame =
    cat.table("DOCUMENTS_EXTRACTED_FIELDS")
      .filter(Relational.conjunction(filters))
      .select(
        col("file_ref"), col("class_name"), col("field_name"),
        col("field_value"),
        derivedStage(col("file_url")).as("stage"),
        col("extracted_at"))
      .orderBy(col("extracted_at").desc_nulls_last, col("file_ref"), col("field_name"))
}
