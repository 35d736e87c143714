package graft.ops

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.util.Try
import scala.jdk.CollectionConverters._

/** Prompt-schema canonicalization (app:162-183): the reference accepts
  * several user-authored prompt shapes and normalizes them to a flat
  * {field -> question} map:
  *
  *   - flat dict        {"field": "question", ...}        -> as-is
  *   - question list    ["q", "free question"]            -> {"q": question}
  *   - nested dict      {"f": {"question"|"prompt"|"q"|"text": "..."}}
  *                                                        -> {"f": inner}
  *   - anything else    -> fallback {"q": "Extract key facts for class <name>."}
  *
  * Pure, total, idempotent (property-tested in CanonicalizeSpec).
  */
object Canonicalize {

  private val mapper = new ObjectMapper()
  private val innerKeys = Seq("question", "prompt", "q", "text")

  def fallback(className: String): Map[String, String] =
    Map("q" -> s"Extract key facts for class $className.")

  def apply(promptsJson: String, className: String): Map[String, String] = {
    val parsed = Try(mapper.readTree(promptsJson)).toOption
    parsed match {
      case Some(node) if node.isObject =>
        val fields = node.properties().asScala.toSeq.map(e => e.getKey -> e.getValue)
        val out = fields.flatMap { case (k, v) =>
          if (v.isTextual) Some(k -> v.asText())
          else if (v.isObject) innerKeys.collectFirst {
            case ik if v.hasNonNull(ik) && v.get(ik).isTextual => k -> v.get(ik).asText()
          }
          else if (v.isNumber || v.isBoolean) Some(k -> v.asText())
          else None
        }.toMap
        if (out.nonEmpty) out else fallback(className)
      case Some(node) if node.isArray && node.size() >= 2 &&
          node.get(0).isTextual && node.get(1).isTextual =>
        Map(node.get(0).asText() -> node.get(1).asText())
      case _ => fallback(className)
    }
  }

  /** Canonical JSON form (sorted keys) for VARIANT storage. */
  def toJson(prompts: Map[String, String]): String = {
    val node = mapper.createObjectNode()
    prompts.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    mapper.writeValueAsString(node)
  }
}
