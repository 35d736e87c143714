package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AllPairsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)], tau: Double,
                    shingle: Int = 1): Set[(Long, Long, Double)] =
    AllPairs.jaccardThresholdJoin(docs.toDF("id", "text"), "id", "text",
        tau, shingle)
      .as[(Long, Long, Double)].collect().toSet

  /** word_shingles semantics: lowercase whitespace tokens; < k words
    * collapse to ONE whole-text shingle; else distinct k-grams.
    */
  private def shingleSet(t: String, k: Int): Set[String] = {
    val w = t.trim.toLowerCase.split("\\s+").toSeq
    if (w.length < k) Set(w.mkString(" "))
    else w.sliding(k).map(_.mkString(" ")).toSet
  }

  /** Brute-force reference: exact distinct-token Jaccard over ALL
    * pairs — the completeness bar the prefix filter must meet. The
    * threshold test is the SAME exact integer-vs-product form the
    * engine uses (i >= tau * u), so borderline pairs can't diverge
    * on a rounding artifact.
    */
  private def brute(docs: Seq[(Long, String)], tau: Double,
                    shingle: Int = 1): Set[(Long, Long, Double)] = {
    val sets = docs.filter(_._2.trim.nonEmpty).map { case (id, t) =>
      id -> (if (shingle == 1) t.trim.toLowerCase.split("\\s+").toSet
             else shingleSet(t, shingle))
    }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      i = sa.intersect(sb).size; u = sa.union(sb).size
      if i.toDouble >= tau * u
    } yield (ia, ib, math.rint(i.toDouble / u * 1e4) / 1e4)).toSet
  }

  test("hand example: exact pairs at the threshold, near-miss excluded") {
    val docs = Seq(
      1L -> "the quick brown fox",
      2L -> "the quick brown wolf",  // J(1,2) = 3/5 = 0.6
      3L -> "the quick red wolf",    // J(2,3) = 3/5, J(1,3) = 2/6
      4L -> "entirely different words here")
    val got = pairs(docs, 0.6)
    assert(got == Set((1L, 2L, 0.6), (2L, 3L, 0.6)), got.toString)
  }

  test("completeness vs brute force on a mixed corpus (the zero-recall-loss claim)") {
    // skewed vocabulary: shared stopwords + doc-specific rares —
    // exactly the regime prefix filtering prunes hardest in
    val docs = (1L to 40L).map { i =>
      val shared = "the of and to in"
      val fam = s"family${i % 7} group${i % 5}"
      val own = s"tok${i}a tok${i}b"
      i -> s"$shared $fam $own"
    }
    for (tau <- Seq(0.4, 0.5, 0.7, 0.9)) {
      val got = pairs(docs, tau)
      val want = brute(docs, tau)
      assert(got == want, s"tau=$tau: got ${got.size}, want ${want.size}; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("completeness in shingle mode, including the short-doc collapse rule") {
    val docs = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta",
      2L -> "alpha beta gamma delta epsilon zeta theta", // high 3-gram overlap
      3L -> "alpha beta gamma one two three four five",
      4L -> "tiny doc",                                  // < 3 words: one shingle
      5L -> "tiny doc",                                  // exact short-doc dup
      6L -> "completely unrelated content right here now")
    for (tau <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val got = pairs(docs, tau, shingle = 3)
      val want = brute(docs, tau, shingle = 3)
      assert(got == want, s"tau=$tau: got $got, want $want")
    }
  }

  test("borderline pair exactly AT tau survives (fp-slack in the pruning ceils)") {
    // J = 4/5 = 0.8 exactly: 0.8 parses ABOVE 4/5 in binary, so a
    // slack-free ceil(tau*|d|) would over-shrink the prefix and the
    // exact filter i >= tau*u sits right on the boundary
    val docs = Seq(
      1L -> "a b c d",
      2L -> "a b c d e") // i=4, u=5
    assert(pairs(docs, 0.8) == Set((1L, 2L, 0.8)))
    assert(brute(docs, 0.8) == Set((1L, 2L, 0.8)))
  }

  test("identical docs pair at J = 1; tau = 1 keeps only exact-set matches") {
    val docs = Seq(1L -> "alpha beta gamma", 2L -> "alpha beta gamma",
      3L -> "gamma beta alpha extra")
    val got = pairs(docs, 1.0)
    assert(got == Set((1L, 2L, 1.0)), got.toString)
  }

  test("duplicate tokens inside a doc are SET semantics, order irrelevant") {
    val docs = Seq(1L -> "a b b b a", 2L -> "b a")
    val got = pairs(docs, 0.9)
    assert(got == Set((1L, 2L, 1.0)), got.toString)
  }

  test("empty and whitespace-only docs never match anything") {
    val docs = Seq(1L -> "", 2L -> "   ", 3L -> "real content")
    assert(pairs(docs, 0.1).isEmpty)
  }

  test("candidate multiplicity is linear on a sparse-answer corpus (the economics " +
      "a plan guard can't see)") {
    // 200 template docs sharing a common frame (the q_sim_allpairs
    // regime: template text, planted near-dups) + 20 planted near-dup
    // partners. In 3-shingle space at tau=0.8, prefixes are doc-
    // specific shingles, so candidates must stay O(n) — a quadratic
    // candidate set here is exactly the round-10 regression.
    val base = (1L to 200L).map { i =>
      i -> (s"the shared frame of document number $i talks about topic${i % 11} " +
        s"and subtopic${i % 7} with unique trailer tok${i}x tok${i}y tok${i}z")
    }
    // one extra word: 17 shingles sharing 16 of the base's 16+1 —
    // J = 16/17 ≈ 0.94, comfortably above tau
    val dups = (1L to 20L).map { i =>
      (1000L + i) -> (base((i - 1).toInt)._2 + " extended")
    }
    val docs = base ++ dups
    val n = docs.size
    val toks = AllPairs.tokenSets(docs.toDF("id", "text"), "id", "text", 3)
    val nCands = AllPairs.candidatePairs(toks, 0.8).count()
    // contract: candidates <= 2*n (observed well below; bound leaves
    // headroom for ordering ties). n^2/2 here would be 24k.
    assert(nCands <= 2L * n, s"candidate blow-up: $nCands pairs for $n docs")
    // and completeness still holds against brute force
    val got = pairs(docs, 0.8, shingle = 3)
    val want = brute(docs, 0.8, shingle = 3)
    assert(got == want, s"got ${got.size}, want ${want.size}")
  }

  test("positional filter prunes candidates the prefix filter alone admits") {
    // 10-token docs: 5 doc-unique + 5 all-shared tokens. At tau=0.5
    // the prefix is the 6 rarest = 5 uniques + the FIRST shared token
    // — identical in every doc, so the prefix equi-join matches all
    // 435 pairs (which the old distinct() kept for verify). The
    // positional bound sees 1 shared hit at position 6 of 10 in both
    // docs: 1 + min(4, 4) = 5 < alpha = ceil(20/3) = 7 — all pruned.
    val docs = (1L to 30L).map { i =>
      i -> s"u${i}a u${i}b u${i}c u${i}d u${i}e zs1 zs2 zs3 zs4 zs5"
    }
    val toks = AllPairs.tokenSets(docs.toDF("id", "text"), "id", "text", 1)
    val nCands = AllPairs.candidatePairs(toks, 0.5).count()
    assert(nCands == 0, s"positional filter missed: $nCands candidates")
    // true J = 5 shared / 15 union = 0.33 < 0.5: the empty answer is right
    assert(pairs(docs, 0.5).isEmpty)
  }

  test("property: exact pair set matches brute force on random corpora " +
      "(tau x shingle sweep)") {
    // the zero-recall-loss theorem, exercised beyond hand-built shapes:
    // random docs over a small vocabulary (guaranteeing collisions),
    // random sizes, several thresholds, unigram AND shingle modes.
    // Deterministic gen (fixed seeds) — the house scalacheck pattern.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Vector("the", "of", "data", "graft", "spark", "joins",
      "alpha", "beta", "gamma", "delta")
    val docGen = for {
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val corpusGen = Gen.choose(5, 25).flatMap(Gen.listOfN(_, docGen))
    (1 to 6).foreach { i =>
      val docs = corpusGen(Gen.Parameters.default, Seed(i.toLong)).get
        .zipWithIndex.map { case (t, j) => (j.toLong, t) }
      for (tau <- Seq(0.34, 0.5, 0.8); k <- Seq(1, 3)) {
        val got = pairs(docs, tau, k)
        val want = brute(docs, tau, k)
        assert(got == want, s"seed=$i tau=$tau shingle=$k: " +
          s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      }
    }
  }

  test("bad tau rejected") {
    intercept[IllegalArgumentException] {
      AllPairs.jaccardThresholdJoin(
        Seq((1L, "x")).toDF("id", "text"), "id", "text", 0.0)
    }
  }
}
