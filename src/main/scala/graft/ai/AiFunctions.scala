package graft.ai

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Spark surface for the Doc-AI backend: four scalar functions, exposed
  * both as Column helpers and as registered SQL UDFs. Marked
  * non-deterministic-safe by usage convention: we never place them below
  * user filters (SURVEY §4 item 1) — plan construction order keeps cheap
  * predicates (file-name filters, class filters) under the AI projection.
  *
  * UDFs (not codegen Expressions) are the right call here: each call is
  * "model-inference" priced, so per-row JVM dispatch overhead is noise
  * (SURVEY §2.9). The rest of the plan stays whole-stage-codegen.
  */
object AiFunctions {

  // The backend is a serializable singleton closed over by the UDF
  // lambdas, so executors get it via closure serialization — no
  // driver-side state, works on a real cluster.
  private val backend: DocAiBackend = DeterministicLocalBackend

  /** AI_EXTRACT (app:202-210): map of {field -> question} in, map of
    * {field -> answer} out. The {"response": ...} envelope of the
    * reference is applied by `ai_extract_json` below when the raw
    * payload shape matters.
    */
  private val extractUdf = udf { (text: String, prompts: Map[String, String]) =>
    if (text == null || prompts == null) null
    else try backend.answerAll(text, prompts)
    catch { // error-as-row (X9, app:855-856): keep the batch alive
      case e: Exception => Map("error" -> String.valueOf(e.getMessage))
    }
  }

  /** RFC-8259-complete JSON string escape: backslash, quote, and ALL
    * control chars — answers are raw document sentences, which can
    * embed newlines/tabs that would otherwise corrupt the envelope.
    */
  private def jsonEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** AI_EXTRACT returning the reference's exact JSON envelope
    * {"response": {field: answer}} (app:503, app:854, app:962).
    */
  private val extractJsonUdf = udf { (text: String, prompts: Map[String, String]) =>
    if (text == null || prompts == null) null
    else try {
      val answers = backend.answerAll(text, prompts)
      val fields = answers.toSeq.sortBy(_._1).map { case (f, a) =>
        s""""${jsonEscape(f)}": "${jsonEscape(a)}""""
      }
      s"""{"response": {${fields.mkString(", ")}}}"""
    } catch { // error-as-row (X9): {"error": msg} like app:855-856
      case e: Exception =>
        s"""{"error": "${jsonEscape(String.valueOf(e.getMessage))}"}"""
    }
  }

  private val classifyUdf = udf { (text: String) =>
    if (text == null) null else backend.classify(text)
  }

  private val parseDocumentUdf = udf { (content: Array[Byte]) =>
    if (content == null) null else backend.parse(content)
  }

  private val completeUdf = udf { (model: String, prompt: String) =>
    if (prompt == null) null else backend.complete(model, prompt)
  }

  /** Canonicalize a stored prompt-schema VARIANT (any of the accepted
    * shapes, app:162-183) into the flat {field -> question} map the
    * extract functions take. Pure Scala core, exposed as a UDF so the
    * pipeline can apply it in-plan when reading CLASS_PROMPTS (app:490).
    */
  private val canonicalizeUdf = udf { (promptsJson: String, className: String) =>
    graft.ops.Canonicalize(
      if (promptsJson == null) "" else promptsJson,
      if (className == null) "document" else className)
  }

  def ai_extract(text: Column, prompts: Column): Column = extractUdf(text, prompts)
  def canonicalize_prompts(promptsJson: Column, className: Column): Column =
    canonicalizeUdf(promptsJson, className)
  def ai_extract_json(text: Column, prompts: Column): Column = extractJsonUdf(text, prompts)
  def ai_classify(text: Column): Column = classifyUdf(text)
  def parse_document(content: Column): Column = parseDocumentUdf(content)
  def ai_complete(model: Column, prompt: Column): Column = completeUdf(model, prompt)

  /** Register all AI functions for spark.sql use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("ai_extract", extractUdf)
    spark.udf.register("ai_extract_json", extractJsonUdf)
    spark.udf.register("ai_classify", classifyUdf)
    spark.udf.register("parse_document", parseDocumentUdf)
    spark.udf.register("ai_complete", completeUdf)
    spark.udf.register("canonicalize_prompts", canonicalizeUdf)
  }
}
