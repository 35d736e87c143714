package graft.tools

/** The drift-probe watermark store (PROBE_NORMS.json) — the pure core
  * of [[graft.Bench]]'s window-adjudication protocol, extracted so the
  * schema rules are spec-testable without running a bench.
  *
  * Schema: one flat JSON object, key → best (lowest) probe MEDIAN ever
  * read for that run shape. Keys come from [[normKey]]:
  *   - `"sf10full"`          — a FULL-suite run on fixture sf10full
  *   - `"sf10full|filtered"` — any FILTERED (query-subset) run there
  * The two shapes get SEPARATE watermarks because a filtered run
  * carries less mid-suite co-run pressure than a full suite on the
  * same host: its probe medians read lower, and without the keying a
  * single filtered run could undercut the full-suite watermark and
  * flag every later honest full window as degraded (the hand restore
  * of commit 9d647ae — exactly the manual surgery the monotone-min
  * protocol was supposed to make unnecessary). Keys WITHOUT the
  * `|filtered` suffix are full-suite watermarks — every entry written
  * before round 16 is that shape, so the existing artifact needs no
  * rewrite. Filtered watermarks are advisory only (different query
  * subsets load the host differently); the full-suite keys remain
  * the load-bearing ones cross-round claims normalize by.
  *
  * Keys are matched by STRING EQUALITY over parsed entries, never by
  * interpolating the key into a regex — fixture names like `sf0.1`
  * contain regex metacharacters, and the pre-round-16 interpolated
  * pattern could read (and via the min-merge, collide with) another
  * fixture's watermark.
  */
object ProbeNorms {
  /** Watermark key for a (fixture, run-shape) pair. */
  def normKey(sfKey: String, filtered: Boolean): String =
    if (filtered) s"$sfKey|filtered" else sfKey

  private val entryRe = """"([^"]+)"\s*:\s*([0-9][0-9.eE+-]*)""".r

  /** All (key, watermark) entries in a norms-file body. */
  def entries(txt: String): Seq[(String, Double)] =
    entryRe.findAllMatchIn(txt)
      .flatMap(m => m.group(2).toDoubleOption.map(m.group(1) -> _)).toSeq

  /** The recorded watermark for `key`, if any. */
  def read(txt: String, key: String): Option[Double] =
    entries(txt).collectFirst { case (k, v) if k == key => v }

  /** New file body after a healthy run read `median` under `key`:
    * monotone min-merge on that key alone, every other key preserved
    * verbatim-valued, keys sorted for diff-stable artifacts.
    */
  def merged(txt: Option[String], key: String, median: Double): String = {
    val prior = txt.map(entries).getOrElse(Seq.empty).toMap
    val next = prior + (key ->
      math.min(prior.getOrElse(key, Double.MaxValue), median))
    next.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}\n")
  }

  private def fmt(v: Double): String = {
    val s = String.format(java.util.Locale.ROOT, "%.3f",
      java.lang.Double.valueOf(v))
    if (s.contains('.'))
      s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
    else s
  }

  /** The norms file lives BESIDE THE BUILD, not the process CWD: a
    * bench launched from another directory must see the same
    * watermarks the in-repo runs maintain. Walk up from `start` to
    * the nearest directory holding build.sbt; fall back to `start`
    * when no build root exists (bare deployment).
    */
  def anchorDir(start: java.nio.file.Path): java.nio.file.Path = {
    var d = start.toAbsolutePath
    while (d != null && !java.nio.file.Files.exists(d.resolve("build.sbt")))
      d = d.getParent
    if (d == null) start.toAbsolutePath else d
  }
}
