package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.AllPairs

/** Phase-level profile of the exact all-pairs join (q_sim_allpairs
  * configuration: 3-shingles, tau = 0.8) — the measurement tool behind
  * the round-14 allpairs work, same methodology as [[RankProfile]].
  * Prints per-phase wall seconds. Run:
  *   SPARK_GRAFT_SF_DIR=.data/sf10full sbt "runMain graft.tools.AllPairsProfile"
  */
object AllPairsProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tau = 0.8
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[approfile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = t("tokenSets (shingle+localCkpt)") {
      val x = AllPairs.tokenSets(docs, "doc_id", "text", shingle = 3)
      x.count(); x
    }
    val tokDf = t("token df aggregate (hashed keys)") {
      val x = toks.select(explode(col("__toks")).as("__h"))
        .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
        .localCheckpoint()
      x.count(); x
    }
    val prefixes = t("per-doc sort + prefix slice (hash-carry)") {
      val prefixLen =
        (col("__sz") - ceil(lit(tau) * col("__sz") - 1e-9) + 1).cast("int")
      val p = toks
        .select(col("__id"), size(col("__toks")).as("__sz"),
          explode(col("__toks")).as("__h"))
        .join(tokDf, Seq("__h"))
        .groupBy(col("__id"))
        .agg(min(col("__sz")).as("__sz"),
          sort_array(collect_list(struct(col("__df"), col("__h"))))
            .as("__st"))
        .select(col("__id"), col("__sz"),
          posexplode(slice(col("__st"), lit(1), prefixLen)))
        .select(col("__id"), col("col.__h").as("__tok"), col("__sz"),
          (col("pos") + 1).as("__pos"))
        .localCheckpoint()
      println(s"[approfile]   prefix rows = ${p.count()}")
      p
    }
    val cands = t("prefix join + positional groupBy") {
      val right = prefixes.select(col("__id").as("__id2"),
        col("__tok").as("__tok2"), col("__sz").as("__sz2"),
        col("__pos").as("__pos2"))
      val alpha =
        ceil(lit(tau) / (1 + tau) * (col("__sza") + col("__szb")) - 1e-9)
      val c = prefixes.join(right,
          col("__tok") === col("__tok2") &&
            col("__id") < col("__id2") &&
            col("__sz2") >= ceil(lit(tau) * col("__sz") - 1e-9) &&
            col("__sz") >= ceil(lit(tau) * col("__sz2") - 1e-9))
        .groupBy(col("__id"), col("__id2"))
        .agg(count(lit(1)).as("__shared"),
          min(col("__sz")).as("__sza"), min(col("__sz2")).as("__szb"),
          max(col("__pos")).as("__lpa"), max(col("__pos2")).as("__lpb"))
        .filter(col("__shared") +
          least(col("__sza") - col("__lpa"), col("__szb") - col("__lpb")) >= alpha)
        .select(col("__id"), col("__id2"), col("__sza"), col("__szb"))
        .localCheckpoint()
      println(s"[approfile]   candidate pairs = ${c.count()}")
      c
    }
    t("verify join (merge intersect)") {
      val setsA = toks.select(col("__id"), col("__toks").as("__ta"))
      val setsB = toks.select(col("__id").as("__id2"), col("__toks").as("__tb"))
      val u = (col("__sza") + col("__szb") - col("__i")).cast("double")
      val n = cands.join(setsA, Seq("__id")).join(setsB, Seq("__id2"))
        .withColumn("__i", graft.functions.TextHashExpressions
          .sorted_intersect_size(col("__ta"), col("__tb")))
        .filter(col("__i").cast("double") >= lit(tau) * u)
        .count()
      println(s"[approfile]   true pairs = $n")
    }
    // ---- round-16 task 6: suffix-filter economics ----
    // (1) the array JOIN alone (trivial per-pair compute): any pruner
    // that runs AFTER the arrays arrive can only save the difference
    // between the verify phase and this — the merge-intersect CPU.
    t("verify-join floor (arrays, no merge)") {
      val setsA = toks.select(col("__id"), col("__toks").as("__ta"))
      val setsB = toks.select(col("__id").as("__id2"), col("__toks").as("__tb"))
      val n = cands.join(setsA, Seq("__id")).join(setsB, Seq("__id2"))
        .filter(element_at(col("__ta"), 1) <= element_at(col("__tb"), -1))
        .count()
      println(s"[approfile]   floor rows = $n")
    }
    // (2) a PRE-verify pruner must beat this economics: join a narrow
    // fixed-width sketch (64-bucket token-count histogram — overlap
    // <= sum_b min(cntA_b, cntB_b), the set-at-a-time stand-in for
    // PPJoin+'s suffix filter) onto the candidates and measure how
    // many pairs it eliminates before the array join.
    val histo = udf((toks: Seq[Long]) => {
      val h = new Array[Int](64)
      toks.foreach(t => h(((t >>> 58) & 63L).toInt) += 1)
      h
    })
    val sketches = t("sketch table (64-bucket histograms)") {
      val s = toks.select(col("__id"), histo(col("__toks")).as("__hist"))
        .localCheckpoint()
      s.count(); s
    }
    t("sketch-bound prune (pre-array candidate cut)") {
      val alpha =
        ceil(lit(tau) / (1 + tau) * (col("__sza") + col("__szb")) - 1e-9)
      val bound = udf((a: Seq[Int], b: Seq[Int]) => {
        var s = 0; var i = 0
        while (i < 64) { s += math.min(a(i), b(i)); i += 1 }
        s
      })
      val kept = cands
        .join(sketches.select(col("__id"), col("__hist").as("__ha")), Seq("__id"))
        .join(sketches.select(col("__id").as("__id2"),
          col("__hist").as("__hb")), Seq("__id2"))
        .filter(bound(col("__ha"), col("__hb")) >= alpha)
        .count()
      println(s"[approfile]   sketch-surviving pairs = $kept")
    }
    t("END-TO-END jaccardThresholdJoin") {
      println("[approfile]   pairs = " + AllPairs
        .jaccardThresholdJoin(docs, "doc_id", "text", tau, 3).count())
    }
    // (the round-14 hashed-df experiment and its round-15 extension —
    // carrying hashes through the sort/prefix/candidate join — are
    // MERGED into the operator; the phases above replicate it)
    spark.stop()
  }
}
