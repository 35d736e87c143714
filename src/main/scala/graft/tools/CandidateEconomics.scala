package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{AllPairs, Dedup, FuzzyJoin}

/** Candidate-multiplicity economics for the pair-generating families
  * (exact all-pairs prefix join, MinHash-LSH banding, SymSpell fuzzy
  * blocking) on real fixtures — the number a plan-shape guard cannot
  * see. "No CartesianProduct" proved nothing in round 10: the
  * all-pairs prefix EQUI-join was quadratic in candidate multiplicity
  * (112.6M candidate rows for 12.5M possible pairs at sf0.1) because
  * the configured answer was itself quadratic. The scale contract for
  * these operators is candidates = O(n), and this tool measures it.
  *
  * Args: one or more fixture dirs (default /root/testdata/sf0.1).
  * Env: SPARK_GRAFT_CPUS. Prints one JSON line per fixture:
  * per-family candidate pairs, verified (true) pairs, candidates/doc,
  * and seconds — the SCALE.md economics table is generated from this.
  */
object CandidateEconomics {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-candidate-economics")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, math.rint((System.nanoTime() - t0) / 1e7) / 100)
    }

    for (dir <- dirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()

      // exact all-pairs, the q_sim_allpairs configuration (3-shingle,
      // tau=0.8): candidates after prefix+size+positional filtering
      val toks = AllPairs.tokenSets(docs, "doc_id", "text", shingle = 3)
      val (apCand, apCandS) = timed(AllPairs.candidatePairs(toks, 0.8).count())
      val (apTrue, apTrueS) = timed(
        AllPairs.jaccardThresholdJoin(docs, "doc_id", "text", 0.8, 3).count())

      // MinHash-LSH banding, the q_dedup_minhash configuration
      val (mhCand, mhCandS) = timed(Dedup.minhashCandidates(
        docs, "text", "doc_id", shingleK = 3, numHashes = 32, bands = 16).count())
      val (mhTrue, mhTrueS) = timed(Dedup.minhashNearDups(
        docs, "text", "doc_id", threshold = 0.5,
        shingleK = 3, numHashes = 32, bands = 16).count())

      // SymSpell fuzzy blocking, the q_fuzzy_join configuration:
      // 100-row dirty batch against the full clean customer table.
      // Documents-only fixtures (the sf10 100x corpus) have no
      // customer table — report the family as absent, not a crash.
      val hasCustomer =
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/customer.parquet"))
      val fuzzyJson = if (!hasCustomer) "null" else {
        val cust = spark.read.parquet(s"$dir/customer.parquet")
      val clean = cust.select(col("c_custkey"), col("c_name"))
      val dirty = cust.filter(col("c_custkey") <= 100)
        .select(col("c_custkey").as("dirty_id"),
          concat(
            expr("substring(c_name, 1, cast(c_custkey % 18 as int))"),
            expr("substring(c_name, cast(c_custkey % 18 + 2 as int), 18)"))
            .as("dirty_name"))
        val (fzCand, fzCandS) = timed(FuzzyJoin.candidateKeyPairs(
          dirty, clean, "dirty_name", "c_name", maxDist = 1).count())
        val (fzTrue, fzTrueS) = timed(FuzzyJoin.editDistanceJoin(
          dirty, clean, "dirty_name", "c_name", maxDist = 1).count())
        s"""{"candidates":$fzCand,"true_pairs":$fzTrue,"cand_sec":$fzCandS,"full_sec":$fzTrueS}"""
      }

      def ratio(c: Long) = math.rint(c.toDouble / nDocs * 100) / 100
      println(
        s"""{"fixture":"$dir","n_docs":$nDocs,""" +
          s""""allpairs":{"candidates":$apCand,"true_pairs":$apTrue,"cand_per_doc":${ratio(apCand)},"cand_sec":$apCandS,"full_sec":$apTrueS},""" +
          s""""minhash_lsh":{"candidates":$mhCand,"true_pairs":$mhTrue,"cand_per_doc":${ratio(mhCand)},"cand_sec":$mhCandS,"full_sec":$mhTrueS},""" +
          s""""fuzzy_join":$fuzzyJson}""")
    }
    spark.stop()
  }
}
