package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // one JVM runs 193 queries x reps: the AppStatus/SQL status
      // stores run even with the UI off and their DEFAULT retention
      // (1000 executions, 100k tasks) holds per-stage metric maps for
      // the whole suite — part of the accumulated heap pressure that
      // made the sf10 run need a 16 GB driver (SCALE.md). The bench
      // needs none of that history.
      .config("spark.sql.ui.retainedExecutions", "5")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "500")
      .config("spark.worker.ui.retainedExecutors", "5")
      .config("spark.worker.ui.retainedDrivers", "5")
      // engine extensions at builder time: all timed entries see ONE
      // uniform optimizer — plans can't depend on run order (the
      // q_ai_filter_pushdown attach becomes a no-op here)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.toSet // optional query-name filter for local runs
    val picked = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .toSeq.sortBy(_._1) // deterministic run order round over round
    // Warm-up: run every picked query once at the SMALLEST sf so each
    // timed query's exact machinery (codegen, JIT, UDF paths, parquet
    // footer cache, streaming/foreachBatch setup) is hot before its
    // timed run — r3 showed untouched trivial queries drifting 2x+
    // between rounds purely from first-JIT charges landing on whichever
    // query ran a family first. Warm-up time is NOT part of the metric.
    val warmDir = {
      val d = new java.io.File(sfDir).getParentFile
      val tiny = new java.io.File(d, "sf0.001")
      // scaled fixtures (.data/sf1, .data/sf3) have no tiny sibling —
      // warm on the driver's sf0.001 testdata instead of paying a
      // full-scale untimed pass per query
      val fallback = new java.io.File("/root/testdata/sf0.001")
      if (tiny.isDirectory) tiny.getPath
      else if (fallback.isDirectory) fallback.getPath else sfDir
    }
    // warm-up failures are EXPECTED to re-surface in the timed pass
    // (same query, same data path), but count them so a warm-up-only
    // anomaly is visible in the JSON instead of silently swallowed
    var warmFailed = 0
    picked.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => warmFailed += 1 }
      releaseState(spark)
    }
    // Host-drift probe: ONE fixed trivial scan-agg, timed at suite
    // start / middle / end. Cross-round totals on this host drift
    // ±20-40% on byte-identical code (the r12→r13 133→162 s scare was
    // adjudicated as pure environment); the probe gives any reader a
    // code-independent yardstick — divide two rounds' totals by the
    // ratio of their probe medians before calling a delta a
    // regression. Probe cost is NOT part of the metric.
    def driftProbe(): Double = {
      import org.apache.spark.sql.functions.{count, lit, sum, col}
      val t0 = System.nanoTime()
      // a bench dataset without the probe table degrades the probe to
      // -1 markers (and probe_status "unknown") instead of aborting a
      // suite whose every timed query is individually guarded
      try {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] drift probe FAILED: ${e.getMessage}")
        -1.0
      }
    }
    driftProbe() // untimed: absorb the probe's own first-JIT charge
    val probeStart = driftProbe()
    // steady-state latency = min over `reps` timed runs: sub-second
    // queries are GC/scheduling-noise-bound in a single shot, and the
    // min is the standard microbenchmark estimator of the code's actual
    // cost (the max measures the JVM's mood, not the plan)
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    def timedRun(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      // noop sink forces FULL evaluation of every output column —
      // count() would let Spark prune the expensive projections and
      // under-report compute-heavy queries
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          // keep timing the rest, but a failed query must be VISIBLE —
          // a swallowed error would read as a suspiciously fast pass
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // untimed gap: drop cache/checkpoint blocks the query left
      // behind so 77 queries don't accumulate memory pressure (GC
      // pauses were billed to whoever ran late in the r3 run)
      releaseState(spark)
      (dt, ok)
    }
    // a rep that FAILED cannot contribute a timing: an exception after
    // 10 ms would otherwise masquerade as a 100x speedup (this exact
    // shape confused the round-10 snapshot). A query with zero
    // successful reps surfaces as -1 plus a "failed" list entry.
    def minOk(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, n: Int): Double = {
      val oks = (0 until n).map(_ => timedRun(name, fn)).collect { case (dt, true) => dt }
      if (oks.isEmpty) -1.0 else oks.min
    }
    val mid = picked.size / 2
    var probeMid = -1.0
    val firstPass = picked.zipWithIndex.map { case ((name, fn), i) =>
      if (i == mid) probeMid = driftProbe()
      (name, fn, minOk(name, fn, reps))
    }
    if (probeMid < 0) probeMid = driftProbe() // tiny filtered runs
    // headline stability: the slowest queries carry the round-over-round
    // signal, and a single extra shot on just those is cheap relative to
    // their own runtime — min-of-(reps+1) there keeps the ~±10% per-run
    // harness noise (r4->r5 drifted 55->60 s on byte-identical source)
    // from masquerading as a code regression
    val headline = firstPass.sortBy(-_._3).take(10).map(_._1).toSet
    val results = firstPass.map { case (name, fn, t) =>
      if (headline(name) && t >= 0) {
        val extra = timedRun(name, fn)
        name -> (if (extra._2) math.min(t, extra._1) else t)
      } else name -> t
    }
    val probeEnd = driftProbe()
    // Machine-readable window adjudication (the round-14 R14B lesson,
    // promoted from SCALE.md prose to protocol): compare this run's
    // MEDIAN probe reading against the best median ever recorded for
    // this fixture on this host (PROBE_NORMS.json beside the build —
    // the probe code never changes, so the watermark is the host's
    // demonstrated speed on this data size). "degraded" = median >
    // 1.3× the norm: cross-window TOTAL comparisons against this run
    // are unsound (same-window per-query deltas remain valid). The
    // median, not the min, carries the signal — R14B's min probe
    // matched the healthy window's while its mid/end readings ran
    // 1.4× hot, exactly the mid-suite co-tenancy a degraded host
    // shows. A healthy run lowers the watermark monotonically.
    val probes = Seq(probeStart, probeMid, probeEnd)
    val probeMedian = probes.sorted.apply(1)
    val normsPath = java.nio.file.Paths.get("PROBE_NORMS.json").toAbsolutePath
    val sfKey = sfDir.split('/').last
    def readNorm(): Option[Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(normsPath), "UTF-8")
        s""""$sfKey"\\s*:\\s*([0-9.]+)""".r.findFirstMatchIn(txt)
          .map(_.group(1).toDouble)
      } catch { case _: Throwable => None }
    val norm = readNorm()
    val probeStatus =
      if (probes.exists(_ < 0)) "unknown"
      else if (norm.exists(n => probeMedian > 1.3 * n)) "degraded"
      else "ok" // no recorded norm yet = this run seeds the watermark
    // persist min(norm, median) — only from FULL-SUITE runs whose
    // probes all succeeded: a broken probe can't poison the watermark,
    // and a FILTERED run can't lower it either (short runs carry less
    // mid-suite co-run pressure, so their medians undercut what a
    // healthy full suite can read and would flag honest windows)
    if (only.isEmpty && probes.forall(_ >= 0)) {
      val newNorm = math.min(norm.getOrElse(Double.MaxValue), probeMedian)
      val others =
        try {
          val txt = new String(java.nio.file.Files.readAllBytes(normsPath), "UTF-8")
          """"([^"]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2)).filterNot(_._1 == sfKey).toSeq
        } catch { case _: Throwable => Seq.empty }
      val body = (others :+ (sfKey -> f"$newNorm%.3f"))
        .sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}\n")
      try java.nio.file.Files.write(normsPath, body.getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] PROBE_NORMS.json write failed: ${e.getMessage}")
      }
    }
    val failed = results.collect { case (n, t) if t < 0 => n }
    // totals must stay comparable round-over-round: a failed query
    // contributes 0 to the sum (its -1 marker stays in the map)
    def cleanTotal = results.collect { case (_, t) if t >= 0 => t }.sum
    // keep the JSON line SHORT (trimmed decimals, basename sf) so the
    // driver's 2000-char output-tail capture holds the whole line —
    // r3's 3dp line was 1998 chars and still got truncated by the sbt
    // prefix. Full precision is mirrored to BENCH_LOCAL.json.
    // Locale.ROOT: a comma-decimal default locale would emit 0,787 and
    // break every JSON consumer of this line
    def fmt(v: Double, dp: Int): String = {
      val s = String.format(java.util.Locale.ROOT, s"%.${dp}f",
        java.lang.Double.valueOf(v))
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
    }
    def failedJson: String =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    // start/middle/end readings of the fixed probe — the host-speed
    // yardstick cross-round comparisons normalize by (see README)
    def probeJson: String =
      s""","drift_probe":[${fmt(probeStart, 3)},${fmt(probeMid, 3)},${fmt(probeEnd, 3)}]""" +
        s""","probe_status":"$probeStatus"""" +
        norm.map(n => s""","probe_norm":${fmt(n, 3)}""").getOrElse("") +
        (if (warmFailed > 0) s""","warm_failed":$warmFailed""" else "")
    def line(dp: Int): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v, dp) }
        .mkString("{", ",", "}")
      val sfName = sfDir.split('/').last
      s"""{"metric":"total","value":${fmt(cleanTotal, 3)},"unit":"sec","queries":$qs,"sf":"$sfName"$probeJson$failedJson}"""
    }
    // mirror full precision beside the build (cwd), not a hardcoded
    // absolute path; a failed write must be visible, not silently absent
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json").toAbsolutePath, line(3) + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_LOCAL.json write failed: ${e.getMessage}")
    }
    // last-resort compaction: collapse entries under a threshold into
    // "_rest" (their sum) so the line keeps fitting as the query count
    // grows — the slow queries are the ones the per-query signal is
    // for, and the full map is always mirrored to BENCH_LOCAL.json.
    // The threshold adapts: smallest cut that fits the budget.
    def lineCompact(thresh: Double): String = {
      val (kept, rest) = results.partition(_._2 >= thresh)
      val qs = (kept.map { case (k, v) => "\"" + k + "\":" + fmt(v, 1) } :+
        ("\"_rest\":" + fmt(rest.collect { case (_, t) if t >= 0 => t }.sum, 1)))
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(cleanTotal, 3)},"unit":"sec","queries":$qs,"sf":"${sfDir.split('/').last}"$probeJson$failedJson}"""
    }
    println(
      if (line(2).length <= 1900) line(2)
      else if (line(1).length <= 1960) line(1)
      else Seq(0.15, 0.25, 0.5, 1.0).view.map(lineCompact)
        .find(_.length <= 1960).getOrElse(lineCompact(10.0)))
    spark.stop()
  }

  /** Unpersist every cached/localCheckpoint'd block and nudge the
    * ContextCleaner so per-query leftovers don't compound across the run.
    */
  private def releaseState(spark: SparkSession): Unit = {
    try {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    } catch { case _: Throwable => () }
  }
}
