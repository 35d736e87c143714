package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Canonicalization semantics from app:162-183 (see FIXTURES.md A2). */
class CanonicalizeSpec extends AnyFunSuite {

  // minimal deterministic property driver (the scalatest-scalacheck
  // bridge artifact is not in the offline cache)
  private def forAll[A](gen: Gen[A], n: Int = 200)(check: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(a => check(a))
    }

  test("flat dict passes through") {
    val in = """{"invoice_number": "What is the invoice number?", "total": "What is the total?"}"""
    assert(Canonicalize(in, "invoice") == Map(
      "invoice_number" -> "What is the invoice number?",
      "total" -> "What is the total?"))
  }

  test("['q', text] list becomes single-entry map") {
    assert(Canonicalize("""["q", "Summarize this."]""", "c") ==
      Map("q" -> "Summarize this."))
  }

  test("nested dict unwraps question/prompt/q/text inner keys") {
    val in = """{"f1": {"question": "Q1?"}, "f2": {"prompt": "Q2?"},
                 "f3": {"q": "Q3?"}, "f4": {"text": "Q4?"}}"""
    assert(Canonicalize(in, "c") ==
      Map("f1" -> "Q1?", "f2" -> "Q2?", "f3" -> "Q3?", "f4" -> "Q4?"))
  }

  test("junk falls back to the default prompt") {
    for (junk <- Seq("not json", "42", "[]", "null", """{"a": []}""", ""))
      assert(Canonicalize(junk, "invoice") ==
        Map("q" -> "Extract key facts for class invoice."),
        s"for input: $junk")
  }

  test("canonicalize is total over arbitrary strings (never throws)") {
    forAll(Gen.asciiPrintableStr) { s =>
      val out = Canonicalize(s, "c")
      assert(out.nonEmpty)
    }
  }

  test("canonicalize is idempotent: canon(toJson(canon(x))) == canon(x)") {
    forAll(Gen.oneOf(
      Gen.const("""{"a": "b"}"""),
      Gen.const("""["q", "hello"]"""),
      Gen.const("""{"f": {"question": "inner"}}"""),
      Gen.asciiPrintableStr)) { s =>
      val once = Canonicalize(s, "c")
      val twice = Canonicalize(Canonicalize.toJson(once), "c")
      assert(twice == once)
    }
  }
}
