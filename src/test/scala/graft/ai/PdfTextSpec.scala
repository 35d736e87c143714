package graft.ai

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

class PdfTextSpec extends AnyFunSuite {

  /** Hand-authored minimal single-page PDF whose content stream is the
    * given bytes (uncompressed or pre-deflated with /FlateDecode).
    */
  private def tinyPdf(stream: Array[Byte], flate: Boolean): Array[Byte] = {
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val head =
      s"""%PDF-1.4
         |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
         |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
         |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
         |4 0 obj << /Length ${stream.length}$filter >> stream
         |""".stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    val tail = "\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF"
      .getBytes(StandardCharsets.ISO_8859_1)
    head ++ stream ++ tail
  }

  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes(StandardCharsets.ISO_8859_1)); d.finish()
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  test("extracts Tj text from an uncompressed content stream") {
    val content = "BT /F1 12 Tf 72 712 Td (Hello graft) Tj 0 -14 Td (second line) Tj ET"
    val pdf = tinyPdf(content.getBytes(StandardCharsets.ISO_8859_1), flate = false)
    assert(PdfText.looksLikePdf(pdf))
    assert(PdfText.extract(pdf) == "Hello graft second line")
  }

  test("extracts TJ-array text from a FlateDecode stream with escapes") {
    val content =
      "BT [(kerned) -120 (pa\\(ren\\)s)] TJ ET BT (block \\164wo) Tj ET"
    val pdf = tinyPdf(deflate(content), flate = true)
    val text = PdfText.extract(pdf)
    // \164 octal = 't'; BT..ET blocks join with a newline
    assert(text == "kerned pa(ren)s\nblock two", s"got [$text]")
  }

  test("an unrelated earlier /FlateDecode dict does not poison an uncompressed stream") {
    // object 5's dict mentions /FlateDecode but has no stream; the
    // regex's lazy dict group spans from object 5's '<<' to the content
    // stream's '>>' — only the innermost dict may decide the filter
    val content = "BT (clean text) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "5 0 obj << /Name /SomeFilterNote /F /FlateDecode >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >> stream\n" +
      content +
      "\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfText.extract(pdf) == "clean text")
  }

  test("non-PDF and corrupt inputs degrade safely") {
    assert(!PdfText.looksLikePdf("plain text".getBytes))
    assert(PdfText.extract("plain text".getBytes) == "")
    // declared Flate but garbage bytes: harvest nothing, throw nothing
    val pdf = tinyPdf(Array[Byte](1, 2, 3, 4), flate = true)
    assert(PdfText.extract(pdf) == "")
  }

  test("PdfAwareBackend parses PDFs, delegates everything else") {
    val be = new PdfAwareBackend()
    val content = "BT (Invoice number 42.) Tj ET"
    val pdf = tinyPdf(content.getBytes(StandardCharsets.ISO_8859_1), flate = false)
    assert(be.parse(pdf) == "Invoice number 42.")
    // non-PDF bytes: UTF-8 identity exactly like the deterministic backend
    val txt = "ordinary fixture text".getBytes(StandardCharsets.UTF_8)
    assert(be.parse(txt) == DeterministicLocalBackend.parse(txt))
    // a PDF with no harvestable text falls back to the inner parse
    val empty = tinyPdf("q Q".getBytes(StandardCharsets.ISO_8859_1), flate = false)
    assert(be.parse(empty) == DeterministicLocalBackend.parse(empty))
    assert(be.classify("some text") == DeterministicLocalBackend.classify("some text"))
  }
}
