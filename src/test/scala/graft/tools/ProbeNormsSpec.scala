package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The PROBE_NORMS.json watermark schema (round-16 task 8): run-shape
  * keying so a filtered run can never poison the full-suite watermark
  * (the commit-9d647ae hand-restore), exact-key matching so `sf0.1`'s
  * dot can't read `sf0x1`'s entry, and the monotone min-merge.
  */
class ProbeNormsSpec extends AnyFunSuite {
  test("normKey separates full-suite and filtered run shapes") {
    assert(ProbeNorms.normKey("sf10full", filtered = false) == "sf10full")
    assert(ProbeNorms.normKey("sf10full", filtered = true) == "sf10full|filtered")
  }

  test("read matches keys exactly — regex metacharacters inert") {
    val txt = """{"sf0.1":0.184,"sf0x1":0.9,"sf1":0.56}"""
    assert(ProbeNorms.read(txt, "sf0.1").contains(0.184))
    assert(ProbeNorms.read(txt, "sf0x1").contains(0.9))
    assert(ProbeNorms.read(txt, "sf0.2").isEmpty)
    // pre-round-16 keys (no suffix) read as full-suite watermarks —
    // the existing artifact needs no rewrite
    assert(ProbeNorms.read(txt, ProbeNorms.normKey("sf1", filtered = false))
      .contains(0.56))
    assert(ProbeNorms.read(txt, ProbeNorms.normKey("sf1", filtered = true))
      .isEmpty)
  }

  test("merged is a monotone min on its own key only") {
    val t0 = ProbeNorms.merged(None, "sf1", 0.5)
    assert(ProbeNorms.read(t0, "sf1").contains(0.5))
    // a lower reading lowers the watermark, a higher one cannot raise it
    val t1 = ProbeNorms.merged(Some(t0), "sf1", 0.4)
    assert(ProbeNorms.read(t1, "sf1").contains(0.4))
    val t2 = ProbeNorms.merged(Some(t1), "sf1", 0.9)
    assert(ProbeNorms.read(t2, "sf1").contains(0.4))
  }

  test("a filtered run's low median cannot undercut the full-suite key") {
    val full = ProbeNorms.merged(None, "sf10full", 0.627)
    val after = ProbeNorms.merged(Some(full),
      ProbeNorms.normKey("sf10full", filtered = true), 0.31)
    assert(ProbeNorms.read(after, "sf10full").contains(0.627),
      "full-suite watermark untouched by the filtered run")
    assert(ProbeNorms.read(after, "sf10full|filtered").contains(0.31))
    // and vice versa: a full run leaves the filtered key alone
    val again = ProbeNorms.merged(Some(after), "sf10full", 0.6)
    assert(ProbeNorms.read(again, "sf10full|filtered").contains(0.31))
    assert(ProbeNorms.read(again, "sf10full").contains(0.6))
  }

  test("merged preserves other fixtures and emits sorted keys") {
    val txt = """{"sf0.1":0.184,"sf1":0.56,"sf10full":0.627}"""
    val out = ProbeNorms.merged(Some(txt), "sf3", 1.2)
    assert(ProbeNorms.read(out, "sf0.1").contains(0.184))
    assert(ProbeNorms.read(out, "sf1").contains(0.56))
    assert(ProbeNorms.read(out, "sf10full").contains(0.627))
    assert(ProbeNorms.read(out, "sf3").contains(1.2))
    val keys = ProbeNorms.entries(out).map(_._1)
    assert(keys == keys.sorted)
    assert(out.endsWith("}\n"))
  }

  test("anchorDir finds the build root from a nested cwd") {
    val repo = java.nio.file.Paths.get("").toAbsolutePath
    assume(java.nio.file.Files.exists(repo.resolve("build.sbt")))
    assert(ProbeNorms.anchorDir(repo) == repo)
    assert(ProbeNorms.anchorDir(repo.resolve("src/main/scala")) == repo)
  }
}
