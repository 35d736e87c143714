package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the green hills tonight"
  private val nearDup = base.replace("green", "blue") // 1-word edit
  private val other = "completely different content about database engines and query optimization at massive scale"

  private lazy val docs = Seq(
    (0L, base), (1L, base), // exact dups
    (2L, nearDup),          // near dup of 0/1
    (3L, other))
    .toDF("doc_id", "text")

  test("exactDedup keeps one row per identical text (min id)") {
    val kept = Dedup.exactDedup(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 2L, 3L))
  }

  test("exactDupGroups reports duplicate groups only") {
    val g = Dedup.exactDupGroups(docs, "text", "doc_id").collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("keeper_id") == 0L)
    assert(g(0).getAs[Long]("n_copies") == 2L)
  }

  test("overlapPairs links suffix-to-prefix chains, directional, short docs omitted") {
    val pages = Seq(
      (1L, "p q r A B C"),      // suffix "a b c" (normalized)
      (2L, "a b c x y z"),      // prefix "a b c" -> 1 chains into 2
      (3L, "a b c u v w"),      // same prefix -> 1 chains into 3 too
      (4L, "n o p q r s"),      // unrelated
      (5L, "a b")).toDF("doc_id", "text") // < k tokens: no anchor
    val pairs = Dedup.overlapPairs(pages, "text", "doc_id", k = 3)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L)), pairs.toString)
    // directional: nothing chains INTO doc 1, and 2-3 share a prefix
    // but no suffix matches it
    assert(!pairs.exists(_._2 == 1L))
  }

  test("overlapPairs: a doc whose prefix equals its own suffix never self-pairs") {
    val d = Seq((7L, "a b c x a b c")).toDF("doc_id", "text")
    assert(Dedup.overlapPairs(d, "text", "doc_id", k = 3).count() == 0)
  }

  test("shingles produce n-k+1 k-grams") {
    val sh = Seq("a b c d").toDF("t")
      .select(Dedup.shingles(col("t"), 2).as("s"))
      .as[Seq[String]].collect().head
    assert(sh == Seq("a b", "b c", "c d"))
  }

  test("jaccardFromSets: identical=1, disjoint=0") {
    val df = Seq((Seq("a", "b"), Seq("a", "b"), Seq("x", "y")))
      .toDF("s1", "s2", "s3")
    val r = df.select(
      Dedup.jaccardFromSets(col("s1"), col("s2")),
      Dedup.jaccardFromSets(col("s1"), col("s3"))).collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("jaccardFromSets dedupes non-distinct inputs (true set semantics)") {
    // {a,b} vs {a,b,c} = 2/3 regardless of element multiplicity
    val df = Seq((Seq("a", "a", "b"), Seq("b", "c", "a", "c", "c")))
      .toDF("s1", "s2")
    val j = df.select(Dedup.jaccardFromSets(col("s1"), col("s2")))
      .collect()(0).getDouble(0)
    assert(j == 0.6667, s"expected |{a,b} ∩ {a,b,c}| / |∪| = 2/3, got $j")
  }

  test("minhashNearDups finds exact and near duplicates, not unrelated") {
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id",
        threshold = 0.5, shingleK = 3, numHashes = 16, bands = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "exact dup pair must be found")
    assert(pairs.subsetOf(Set((0L, 1L), (0L, 2L), (1L, 2L))),
      s"no pair may involve the unrelated doc: $pairs")
  }

  test("bandBuckets: equal band slices bucket together, different ones apart") {
    // sigs share band 0 (values 1,2) and differ in band 1 (3,4 vs 3,5)
    val df = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 5L))).toDF("s1", "s2")
      .select(Dedup.bandBuckets(col("s1"), 2, 2).as("b1"),
        Dedup.bandBuckets(col("s2"), 2, 2).as("b2"))
    val r = df.as[(Seq[Long], Seq[Long])].collect()(0)
    assert(r._1.size == 2 && r._2.size == 2)
    assert(r._1(0) == r._2(0), "identical band slice must share a bucket")
    assert(r._1(1) != r._2(1), "different band slice must (whp) split buckets")
    // band index is part of the bucket: identical values in different
    // bands must not collide into one bucket
    assert(r._1(0) != r._1(1) || r._1 == Seq(r._1(0), r._1(0)))
  }

  test("minhash signatures of identical texts are identical") {
    val sigs = Dedup.shingleTable(docs.filter($"doc_id" < 2), "text", "doc_id", 3)
      .select(Dedup.minhashSignature(col("shingle_set"), 16).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
  }

  test("simhash: identical texts same signature; near dup within small hamming") {
    val sigs = Dedup.simhashTable(docs, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long)].collect().map(_._2)
    assert(sigs(0) == sigs(1))
    val hammingNear = java.lang.Long.bitCount(sigs(0) ^ sigs(2))
    val hammingFar = java.lang.Long.bitCount(sigs(0) ^ sigs(3))
    assert(hammingNear < hammingFar,
      s"near-dup hamming $hammingNear should be < unrelated $hammingFar")
  }

  test("Curation.curate with near-dup removal drops the perturbed copy too") {
    val kept = Curation.curate(docs, "text", "doc_id",
        minQuality = 0.0, langs = Nil, nearDupJaccard = Some(0.5))
      .select("doc_id").as[Long].collect().sorted
    // 1 is an exact dup of 0; 2 is a near-dup of 0 -> both dropped
    assert(kept.toSeq == Seq(0L, 3L))
  }

  test("simhashCandidates finds hamming<=3 pairs via block join") {
    val pairs = Dedup.simhashCandidates(docs, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("simhashCandidates maxBucket caps hot buckets to a deterministic subset") {
    // 40 identical template docs (one signature -> every block bucket
    // hot) + one genuinely distinct near-dup pair that must survive
    val template = (0 until 40).map(i =>
      (100L + i, "the same boilerplate navigation header text repeated verbatim"))
    // identical pair (hamming 0, bucket of 2) — survival must not
    // depend on per-token hash margins, only on the cap
    val corpus = (template ++ Seq(
      (1L, "completely original research about deep sea creatures and habitats"),
      (2L, "completely original research about deep sea creatures and habitats")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.simhashCandidates(corpus, "text", "doc_id",
        maxHamming = 7, nBlocks = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.simhashCandidates(corpus, "text", "doc_id",
        maxHamming = 7, nBlocks = 4, maxBucket = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped), "cap must only REMOVE candidates")
    assert(capped.contains((1L, 2L)),
      s"distinct near-dup pair lost to the cap: $capped")
    // the 40-doc template bucket (780 pairs) was dropped wholesale
    assert(!capped.exists(p => p._1 >= 100L && p._2 >= 100L),
      s"hot template bucket must be capped out: ${capped.size} pairs")
    assert(uncapped.count(p => p._1 >= 100L && p._2 >= 100L) == 780,
      "uncapped must still see the full template clique")
  }

  test("removeDuplicateSpans cuts the shared window, keeps unique text") {
    val shared = (1 to 8).map(i => s"dup$i").mkString(" ") // one 8-token window
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"other words here $shared more tail words"),
      (3L, "entirely unique content with no repeats at all")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "text", "doc_id", k = 8)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, "alpha beta gamma delta", 12L, 8L)))
    assert(out(1) == ((2L, "other words here more tail words", 14L, 8L)))
    assert(out(2)._2 == "entirely unique content with no repeats at all")
    assert(out(2)._4 == 0L)
  }

  test("removeDuplicateSpans: NULL text yields '' clean_text, NULL counts") {
    // oracle parity: DuckDB side COALESCEs clean_text to '' while
    // n_tokens/n_removed stay NULL (len(NULL) arithmetic)
    val shared = (1 to 8).map(i => s"dup$i").mkString(" ")
    val docs = Seq((1L, s"a $shared b"), (2L, s"c $shared d"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "text", "doc_id", k = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "a b")
    assert(out(2).getString(1) == "", "NULL text -> empty clean_text")
    assert(out(2).isNullAt(2) && out(2).isNullAt(3),
      "counts stay NULL for NULL text on both engine and oracle sides")
  }

  test("removeDuplicateSpans: short docs pass through; overlap cuts union of spans") {
    // docs 1/2 share the 10-token prefix "r1..r9 ending": its three
    // overlapping duplicated 8-windows cover the UNION of positions
    // 1..10 — each token is cut once, not once per window
    val run = (1 to 9).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run ending one"),
      (2L, s"$run ending two"),
      (3L, "tiny doc")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "text", "doc_id", k = 8)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, "one", 11L, 10L)), out(0).toString)
    assert(out(1) == ((2L, "two", 11L, 10L)))
    assert(out(2) == ((3L, "tiny doc", 2L, 0L)), "below-k docs untouched")
  }

  test("removeDuplicateSpans: disjoint segments stay split; adjacent windows merge") {
    // k=3; "a1 a2 a3" and "b1 b2 b3" repeat corpus-wide. doc 1/3 carry
    // them with one unique token between (two DISJOINT covered
    // segments — the gap token must survive); in doc 2 they are exactly
    // adjacent (next start = prev start + k, the merge boundary: one
    // contiguous segment, whole doc cut); doc 3 repeats "a1 a2 a3"
    // again -> THREE segments, two gap tokens kept
    val docs = Seq(
      (1L, "u1 a1 a2 a3 x b1 b2 b3 u2"),
      (2L, "a1 a2 a3 b1 b2 b3"),
      (3L, "e1 a1 a2 a3 e2 b1 b2 b3 e3 a1 a2 a3 e4")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "text", "doc_id", k = 3)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, "u1 x u2", 9L, 6L)), out(0).toString)
    assert(out(1) == ((2L, "", 6L, 6L)), "adjacent segments must merge: " + out(1))
    assert(out(2) == ((3L, "e1 e2 e3 e4", 13L, 9L)), out(2).toString)
  }

  test("pipeline order: boilerplate stubs drop, shingle-level near-dups survive") {
    // the 100-TB curation order SCALE.md measures: ExactSubstr removal
    // -> min-length filter -> MinHash on cleaned text. Five docs are a
    // shared 20-token boilerplate block + 2 unique tokens: removal
    // reduces them to stubs the length filter drops, so they never
    // reach banding. Docs 11/12 are near-dups at the SHINGLE level
    // only — every 7th token differs, so no 8-token run is shared and
    // ExactSubstr leaves them intact — and must still pair after
    // cleaning.
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
    def varied(tag: String) = (1 to 40).map(i =>
      if (i % 7 == 0) s"$tag$i" else s"w$i").mkString(" ")
    val docs = ((1L to 5L).map(i => (i, s"$boiler u${i}a u${i}b")) ++
      Seq((11L, varied("x")), (12L, varied("y")))).toDF("doc_id", "text")
    val cleaned = Dedup.removeDuplicateSpans(docs, "text", "doc_id", k = 8)
      .filter(col("n_tokens") - col("n_removed") >= 10)
      .select(col("doc_id"), col("clean_text").as("text"))
    val survivors = cleaned.as[(Long, String)].collect().toMap
    assert(survivors.keySet == Set(11L, 12L),
      s"only the shingle-level pair survives the length filter: $survivors")
    assert(survivors(11L) == varied("x"),
      "no shared 8-token run -> removal must not touch the pair docs")
    val pairs = Dedup.minhashNearDups(cleaned, "text", "doc_id",
        threshold = 0.35, shingleK = 3, numHashes = 16, bands = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((11L, 12L)), s"cleaned near-dup pair: $pairs")
  }

  test("minhash maxBucket drops hot buckets whole, keeps small-bucket pairs") {
    // ten identical "template" docs put all ten ids in ONE bucket per
    // band (size 10 > cap 4 -> dropped wholesale); the unrelated
    // near-dup pair (11, 12) buckets alone (size 2 <= cap) and survives
    val tmpl = (1 to 20).map(i => s"t$i").mkString(" ")
    val pairBase = (100 to 120).map(i => s"p$i").mkString(" ")
    val docs = ((1L to 10L).map(i => (i, tmpl)) ++
      Seq((11L, pairBase), (12L, pairBase + " extra"))).toDF("doc_id", "text")
    val uncapped = Dedup.minhashNearDups(docs, "text", "doc_id",
        threshold = 0.5, shingleK = 3, numHashes = 16, bands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 45 + 1, s"45 template pairs + (11,12): $uncapped")
    val capped = Dedup.minhashNearDups(docs, "text", "doc_id",
        threshold = 0.5, shingleK = 3, numHashes = 16, bands = 4,
        maxBucket = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((11L, 12L)),
      s"cap must drop the hot bucket whole and keep the small one: $capped")
  }

  test("jaccardTopK surfaces the planted near-dup as top-1, exact-ranked") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = (1 to 29).map(i => s"w$i").mkString(" ") + " zz" // J = 28/31-ish
    val other = (100 to 130).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, other), (4L, base + " tail"))
      .toDF("doc_id", "text")
    val probes = docs.filter($"doc_id" === 1L)
    val top = Dedup.jaccardTopK(docs, probes, "text", "doc_id", k = 2)
      .orderBy("rank").as[(Long, Long, Long, Double)].collect()
    assert(top.nonEmpty && top.head._1 == 1L)
    // doc 4 (one appended token, J = 28/29) outranks doc 2 (changed
    // token, lower J); doc 3 shares no shingle and must never appear
    assert(top.map(_._2).toSeq == Seq(4L, 2L), top.toSeq.toString)
    assert(top.map(_._4).toSeq == top.map(_._4).toSeq.sorted.reverse)
    assert(!top.map(_._2).contains(3L))
  }

  test("clusterPairs resolves transitive chains to min-id components") {
    // chain 1-2-3 (2~1, 3~2 but 3!~1), separate pair 7-9, long chain 10..14
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("id_a", "id_b")
    val labels = Dedup.clusterPairs(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L), labels.toString)
  }

  test("clusterPairs converges on a worst-case-diameter path graph (lineage bounded)") {
    // a single path 0-1-2-...-25: diameter 25, the pathological case for
    // label propagation — checkpointed lineage must keep plans shallow
    // enough to converge without deep-plan/stack blowups
    val pairs = (0L until 25L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.clusterPairs(pairs, localEdgeCap = 0)
      .as[(Long, Long)].collect()
    assert(labels.length == 26)
    assert(labels.forall(_._2 == 0L), labels.mkString(","))
  }

  test("clusterPairs: 512-node chain converges within the O(log d) round bound") {
    // a 512-node path is the adversarial high-diameter graph the round
    // guard exists for: plain min-label propagation needs ~511 rounds
    // (511 driver round-trips); with pointer jumping it must finish in
    // O(log2 511) ~ 9 + change-detection rounds. maxRounds = 16 makes
    // the bound an ASSERTION — exceeding it throws, failing this test.
    val pairs = (0L until 511L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.clusterPairs(pairs, maxRounds = 16, localEdgeCap = 0)
      .as[(Long, Long)].collect()
    assert(labels.length == 512)
    assert(labels.forall(_._2 == 0L))
  }

  test("clusterPairs: exceeding maxRounds fails loudly instead of spinning") {
    val pairs = (0L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.clusterPairs(pairs, maxRounds = 1, localEdgeCap = 0).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("property: clusterPairs local union-find equals the distributed loop") {
    val rnd = new scala.util.Random(41)
    val pairs = (1 to 120)
      .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    val local = Dedup.clusterPairs(pairs)
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.clusterPairs(pairs, localEdgeCap = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist, s"paths diverge: $local vs $dist")
  }

  test("clusterPairs non-long ids always take the distributed loop") {
    // string ids can't enter the LongMap union-find; result must still
    // be the min-label closure (lexicographic least here)
    val pairs = Seq(("b", "c"), ("a", "b")).toDF("id_a", "id_b")
    val labels = Dedup.clusterPairs(pairs)
      .as[(String, String)].collect().toMap
    assert(labels == Map("a" -> "a", "b" -> "a", "c" -> "a"), labels.toString)
  }

  test("clusterPairs result is not left registered in the CacheManager") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.clusterPairs(pairs)
    out.collect()
    // the returned frame must be checkpoint-backed, not a cached entry a
    // caller would have to unpersist (repeat-call cache-leak hygiene)
    assert(out.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "clusterPairs must hand back an unregistered (checkpointed) frame")
  }

  test("property: jaccardFromSets equals scala Set computation on random arrays") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val arrGen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "aa", "bb"))
    val cases = (0 until 60).flatMap { i =>
      for {
        x <- arrGen.apply(Gen.Parameters.default, Seed(i.toLong))
        y <- arrGen.apply(Gen.Parameters.default, Seed(1000L + i))
      } yield (i.toLong, x, y)
    }
    val df = cases.toDF("i", "xs", "ys")
      .select(col("i"), Dedup.jaccardFromSets(col("xs"), col("ys")).as("j"))
    val got = df.as[(Long, Double)].collect().toMap
    cases.foreach { case (i, x, y) =>
      val (sx, sy) = (x.toSet, y.toSet)
      val expected =
        if ((sx ++ sy).isEmpty) 0.0
        else BigDecimal(sx.intersect(sy).size.toDouble / sx.union(sy).size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(i) == expected, s"case $i: $x vs $y")
    }
  }

  test("property: 8-block pigeonhole finds EVERY pair within hamming<=7") {
    // random-ish corpus of word permutations/edits: brute-force all-pair
    // hamming over the signatures, then assert the block join's recall
    // is exactly 1.0 within its guaranteed radius
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val corpus = (0 until 60).map { i =>
      val n = 6 + i % 5
      (i.toLong, (0 until n).map(k => words((i * 7 + k * 3) % words.size)).mkString(" "))
    }.toDF("doc_id", "text")
    val sig = Dedup.simhashTable(corpus, "text", "doc_id")
    val a = sig.select(col("doc_id").as("id_a"), col("simhash").as("sa"))
    val b = sig.select(col("doc_id").as("id_b"), col("simhash").as("sb"))
    val want = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("h", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("h") <= 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val got = Dedup.simhashCandidates(corpus, "text", "doc_id",
      maxHamming = 7, nBlocks = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(want.subsetOf(got), s"missed: ${want -- got}")
    assert(got == want, s"extra pairs beyond the radius: ${got -- want}")
    // the q=1 probe-expansion path (4x16-bit blocks, single-bit-flip
    // probes) must find the EXACT same hamming<=7 set
    val expanded = Dedup.simhashCandidates(corpus, "text", "doc_id",
      maxHamming = 7, nBlocks = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(expanded == want,
      s"q=1 path diverged: missed ${want -- expanded}, extra ${expanded -- want}")
  }

  test("simhashCandidates widens the radius: q=0 via 8 blocks, q=1 via flips") {
    val pairs = Dedup.simhashCandidates(docs, "text", "doc_id",
      maxHamming = 7, nBlocks = 8).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    val pairs4 = Dedup.simhashCandidates(docs, "text", "doc_id",
      maxHamming = 7, nBlocks = 4).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs4 == pairs, s"block layouts disagree: $pairs4 vs $pairs")
    // per-block radii beyond 1 are rejected, not silently wrong
    intercept[IllegalArgumentException] {
      Dedup.simhashCandidates(docs, "text", "doc_id", maxHamming = 7, nBlocks = 2)
    }
  }

  // ---- adversarial totality (round-6 brief: empty docs, single tokens,
  //      all-identical corpora) ----

  private lazy val degenerate = Seq(
    (1L, ""), (2L, "   "), (3L, "\t \n"), (4L, "solo"),
    (5L, "two words"), (6L, "solo"), (7L, "x y z w v u t s")
  ).toDF("doc_id", "text")

  test("adversarial: span operators are total on empty/blank/short docs") {
    // every doc but 7 is below the k=4 window: audit omits them, removal
    // passes them through byte-identically (modulo normalization)
    val spans = Dedup.duplicateSpans(degenerate, "text", "doc_id", k = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(spans == Seq(7L), s"only the 8-token doc has windows: $spans")
    val rm = Dedup.removeDuplicateSpans(degenerate, "text", "doc_id", k = 4)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(rm.length == 7, "no doc may be dropped by span removal")
    assert(rm.forall(_._4 == 0L), s"nothing repeats corpus-wide: ${rm.toSeq}")
  }

  test("adversarial: winnowing/loop-collapse are total on degenerate docs") {
    // winnowing needs k+w-1 = 5 tokens: only doc 7 qualifies
    val fps = Dedup.winnowFingerprints(degenerate, "text", "doc_id",
      k = 3, w = 3).select("doc_id").as[Long].collect().toSet
    assert(fps == Set(7L), s"got $fps")
    // loop collapse passes every doc through (nothing loops, and
    // below-k docs must survive byte-identically modulo normalization)
    val lc = Dedup.collapseLoops(degenerate, "text", "doc_id", k = 2)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(lc.length == 7 && lc.forall(_._4 == 0L), s"got ${lc.toSeq}")
    // all-identical corpus: an all-loop doc collapses to its phrase
    val loop = Seq((1L, Seq.fill(6)("ha").mkString(" "))).toDF("doc_id", "text")
    val Array(r) = Dedup.collapseLoops(loop, "text", "doc_id", k = 1)
      .as[(Long, String, Long, Long)].collect()
    assert(r == ((1L, "ha", 6L, 5L)), s"got $r")
  }

  test("adversarial: span decontamination is total on degenerate inputs") {
    val eval_ = Seq(Tuple1("x y z w")).toDF("text")
    val out = graft.ops.Corpus.decontaminateSpans(degenerate, eval_,
      "text", "text", "doc_id", k = 4)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out.length == 7, "no doc may be dropped")
    // doc 7 contains the eval 4-gram at its head -> those 4 tokens go
    assert(out(6) == ((7L, "v u t s", 8L, 4L)), s"got ${out(6)}")
    assert(out.take(6).forall(_._4 == 0L))
    // empty eval set: everything passes through untouched
    val emptyEval = eval_.filter(col("text").isNull)
    val none = graft.ops.Corpus.decontaminateSpans(degenerate, emptyEval,
      "text", "text", "doc_id", k = 4)
      .as[(Long, String, Long, Long)].collect()
    assert(none.length == 7 && none.forall(_._4 == 0L))
  }

  test("adversarial: minhash/simhash families are total on degenerate docs") {
    // empty and blank docs all shingle to the same whole-text [""] under
    // the short-doc rule -> they ARE mutual exact dups, as are the two
    // "solo" docs; nothing else may pair with the unrelated doc 7
    val pairs = Dedup.minhashNearDups(degenerate, "text", "doc_id",
        threshold = 0.99, shingleK = 3, numHashes = 16, bands = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((4L, 6L)), s"identical single-token docs must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 7L || p._2 == 7L),
      s"unrelated doc paired: $pairs")
    val sim = Dedup.simhashCandidates(degenerate, "text", "doc_id",
        maxHamming = 0, nBlocks = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sim.contains((4L, 6L)))
    assert(!sim.exists(p => p._1 == 7L || p._2 == 7L))
  }

  test("adversarial: jaccardTopK is total on empty probes and degenerate corpora") {
    val noProbes = degenerate.filter($"doc_id" < 0)
    assert(Dedup.jaccardTopK(degenerate, noProbes, "text", "doc_id", k = 3).count() == 0)
    // probing WITH an empty-text doc: its whole-text shingle [""] matches
    // the other blank docs exactly and nothing else
    val top = Dedup.jaccardTopK(degenerate, degenerate.filter($"doc_id" === 1L),
        "text", "doc_id", k = 5)
      .as[(Long, Long, Long, Double)].collect()
    assert(top.forall(_._4 == 1.0), s"blank docs only match blank docs: ${top.toSeq}")
    assert(top.map(_._2).toSet.subsetOf(Set(2L, 3L)), top.toSeq.toString)
  }

  test("adversarial: all-identical corpus collapses to one cluster, one keeper") {
    val same = (0L until 10L).map(i => (i, "the same exact sentence repeated verbatim"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(same, "text", "doc_id", threshold = 0.9)
    assert(pairs.count() == 10L * 9 / 2, "every pair is an exact dup")
    val clusters = Dedup.clusterPairs(pairs.select("id_a", "id_b"))
      .as[(Long, Long)].collect()
    assert(clusters.forall(_._2 == 0L), s"one component with keeper 0: ${clusters.toSeq}")
    val kept = Curation.curate(same, "text", "doc_id",
        minQuality = 0.0, langs = Nil, nearDupJaccard = Some(0.9))
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(0L), s"exactly one survivor: $kept")
  }

  test("keepBestPerCluster keeps the best member per cluster, singletons kept") {
    val docs = Seq(
      (1L, 10L), (2L, 50L), (3L, 50L), // {1,2,3}: 2 ties 3 -> keep lower id 2
      (4L, 5L),                        // singleton: its own cluster, kept
      (5L, 9L), (6L, 7L)               // {5,6}: keep 5
    ).toDF("doc_id", "n_chars")
    val clusters = Dedup.clusterPairs(
      Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b"))
    val out = Dedup.keepBestPerCluster(docs, clusters).orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false)), s"got $out")
  }

  test("duplicateSpans counts corpus-wide repeated k-token windows") {
    val df = Seq(
      // docs 1 and 2 share the exact 4-token span "one two three four"
      (1L, "one two three four alpha beta"),
      (2L, "gamma one two three four delta"),
      // doc 3 repeats a span WITHIN itself
      (3L, "x y z w x y z w"),
      // doc 4: unique content, no dup windows
      (4L, "p q r s t u"),
      // doc 5: shorter than k -> no windows, omitted
      (5L, "too short")).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(df, "text", "doc_id", k = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_windows", "n_dup_windows", "dup_window_frac")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L), s"got ${out.toSeq}")
    // doc 1: 3 windows, exactly "one two three four" duplicated
    assert(out(0) == ((1L, 3L, 1L, 0.3333)), s"got ${out(0)}")
    assert(out(1) == ((2L, 3L, 1L, 0.3333)), s"got ${out(1)}")
    // doc 3: 5 windows of 8 tokens; "x y z w" appears at pos 1 and 5
    assert(out(2)._3 == 2L && out(2)._4 == 0.4, s"got ${out(2)}")
    assert(out(3) == ((4L, 3L, 0L, 0.0)), s"got ${out(3)}")
  }

  test("winnowing guarantees a shared fingerprint on w+k-1 token overlap") {
    // k=2, w=2: any verbatim run of >= 3 tokens must share a fingerprint
    val df = Seq(
      (1L, "p q r s t u v"),
      (2L, "x y p q r z w"), // shares "p q r" (3 tokens) with doc 1
      (3L, "completely different words here"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(df, "text", "doc_id", k = 2, w = 2)
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "overlap run must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty)
    // selection is sub-linear in the window stream: doc 1 has 6
    // windows, 5 complete w-positions, and strictly fewer fingerprints
    assert(fps(1L).size < 5, s"winnowing must thin the stream: ${fps(1L).size}")
  }

  test("containmentNearDups finds short-in-long pairs symmetric Jaccard misses") {
    val long = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango")
    val excerpt = "echo foxtrot golf hotel india juliet kilo lima" // tokens 5-12
    val df = Seq((1L, long), (2L, excerpt), (3L, other)).toDF("doc_id", "text")
    val out = Dedup.containmentNearDups(df, "text", "doc_id",
        threshold = 0.8, shingleK = 3, winnowK = 5, winnowW = 4)
      .as[(Long, Long, Double)].collect().toSet
    // excerpt fully contained in long: containment(2 in 1) = 1.0, and
    // the direction is asymmetric — (1 in 2) is ~excerpt/long, far
    // below 0.8, so exactly one row
    assert(out == Set((2L, 1L, 1.0)), out.toString)
    // the same pair is invisible to symmetric Jaccard at any useful
    // threshold: |A ∩ B| / |A ∪ B| = 6 shingles / 18 total
    val jac = df.select(Dedup.jaccardFromSets(
        Dedup.shingles(lit(long), 3), Dedup.shingles(lit(excerpt), 3)))
      .as[Double].head()
    assert(jac < 0.4, s"symmetric jaccard unexpectedly high: $jac")
  }

  test("dropContained keeps the maximal doc; mutual containment keeps min id") {
    val long = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango")
    val excerpt = "echo foxtrot golf hotel india juliet kilo lima"
    val df = Seq(
      (1L, long), (2L, excerpt),  // 2 contained in 1 -> 2 drops
      (5L, other), (6L, other),   // mutual (exact dup) -> 6 drops, 5 stays
      (9L, "totally unrelated standalone words without any overlap partner"))
      .toDF("doc_id", "text")
    val kept = Dedup.dropContained(df, "text", "doc_id", 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L, 9L), kept.toString)
  }

  test("containmentNearDups maxFpDocs drops hot fingerprints wholesale") {
    // 6 docs all carrying one shared boilerplate run -> every pair is
    // a candidate uncapped; capping at 3 removes the hot fingerprint
    // and with it every candidate (deterministic subset, no sampling)
    val boiler = "common header text used on every page of this site verbatim"
    val df = (1L to 6L).map(i => (i, s"$boiler unique$i")).toDF("doc_id", "text")
    val uncapped = Dedup.containmentNearDups(df, "text", "doc_id", 0.8)
    assert(uncapped.count() > 0)
    val capped = Dedup.containmentNearDups(df, "text", "doc_id", 0.8,
      maxFpDocs = 3)
    assert(capped.count() == 0)
  }

  test("property: one-pass winnowing matches the explode+window formulation") {
    import org.scalacheck.Gen
    import org.apache.spark.sql.expressions.{Window => W}
    // random docs over a tiny vocab (forces repeated windows), plus
    // whitespace/case edges the normalization must survive
    val word = Gen.oneOf("aa", "Bb", "cc", "dd", "e", "ff\tg")
    val doc = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val docs = (1 to 150).map { i =>
      (i.toLong, doc(Gen.Parameters.default.withSize(30),
        org.scalacheck.rng.Seed(i.toLong)).getOrElse(""))
    }
    val df = docs.toDF("doc_id", "text")
    for ((k, w) <- Seq((2, 2), (5, 4), (1, 1))) {
      val fast = Dedup.winnowFingerprints(df, "text", "doc_id", k, w)
        .as[(Long, String)].collect().toSet
      // the pre-rewrite formulation, verbatim
      val wins = df
        .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("__toks"))
        .filter(size(col("__toks")) >= k)
        .select(col("doc_id"), col("__toks"),
          explode(sequence(lit(1), size(col("__toks")) - (k - 1))).as("__start"))
        .select(col("doc_id"), col("__start"),
          md5(array_join(slice(col("__toks"), col("__start"), lit(k)), " ")).as("__h"))
      val slow = wins
        .withColumn("__m", count(lit(1)).over(W.partitionBy(col("doc_id"))))
        .withColumn("__fp", min(col("__h")).over(
          W.partitionBy(col("doc_id")).orderBy(col("__start")).rowsBetween(0, w - 1)))
        .filter(col("__start") <= col("__m") - (w - 1))
        .select(col("doc_id"), col("__fp")).distinct()
        .as[(Long, String)].collect().toSet
      assert(fast == slow, s"parity broke at k=$k w=$w: " +
        s"only-fast=${(fast -- slow).take(3)} only-slow=${(slow -- fast).take(3)}")
    }
  }

  test("winnowing omits docs too short for one complete window") {
    val df = Seq((1L, "a b c"), (2L, "a b c d e f g h")).toDF("doc_id", "text")
    // k=3, w=3: needs >= k+w-1 = 5 tokens for a complete window
    val ids = Dedup.winnowFingerprints(df, "text", "doc_id", k = 3, w = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }

  test("collapseLoops excises immediate phrase repeats, keeps the first") {
    val df = Seq(
      (1L, "x a b a b a b y"),  // period-2 loop -> collapse
      (2L, "a b c a b c"),      // period-3 at k=2: NOT an immediate repeat
      (3L, "steady text no loops at all"))
      .toDF("doc_id", "text")
    val out = Dedup.collapseLoops(df, "text", "doc_id", k = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, "x a b y", 8L, 4L)), s"got ${out(0)}")
    assert(out(1) == ((2L, "a b c a b c", 6L, 0L)))
    assert(out(2)._4 == 0L && out(2)._2 == "steady text no loops at all")
  }

  test("collapseLoops at k=1 collapses character-level token stutter") {
    val df = Seq((1L, "a a a a"), (2L, "a b a b")).toDF("doc_id", "text")
    val out = Dedup.collapseLoops(df, "text", "doc_id", k = 1)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, "a", 4L, 3L)))
    assert(out(1) == ((2L, "a b a b", 4L, 0L))) // alternation is not a k=1 loop
  }

  test("property: map-side loop collapse matches the lag-window formulation") {
    import org.scalacheck.Gen
    import org.apache.spark.sql.expressions.{Window => W}
    // tiny vocab -> frequent accidental repeats; include a stutter doc
    val word = Gen.oneOf("x", "y", "zz", "x")
    val doc = Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val docs = ((1 to 120).map { i =>
      (i.toLong, doc(Gen.Parameters.default.withSize(24),
        org.scalacheck.rng.Seed(i.toLong * 7)).getOrElse(""))
    } :+ (999L, "a b a b a b a b c")).toDF("doc_id", "text")
    for (k <- Seq(1, 2, 3)) {
      val fast = Dedup.collapseLoops(docs, "text", "doc_id", k)
        .as[(Long, String, Option[Long], Option[Long])].collect().toSet
      // the pre-rewrite formulation: window-stream lag(k) + exciseSpans
      val toks = docs.select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("__toks"))
      val wins = docs
        .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("__toks"))
        .filter(size(col("__toks")) >= k)
        .select(col("doc_id"), col("__toks"),
          explode(sequence(lit(1), size(col("__toks")) - (k - 1))).as("__start"))
        .select(col("doc_id"), col("__start"),
          md5(array_join(slice(col("__toks"), col("__start"), lit(k)), " ")).as("__h"))
      val byDoc = W.partitionBy(col("doc_id")).orderBy(col("__start"))
      val repeats = wins
        .withColumn("__prev", lag(col("__h"), k).over(byDoc))
        .filter(col("__h") === col("__prev"))
        .select(col("doc_id"), col("__start"))
      val slow = Dedup.exciseSpans(toks, repeats, "doc_id", k)
        .as[(Long, String, Option[Long], Option[Long])].collect().toSet
      assert(fast == slow, s"parity broke at k=$k: " +
        s"only-fast=${(fast -- slow).take(2)} only-slow=${(slow -- fast).take(2)}")
    }
  }

  test("dedupSavings accounts removable docs/chars under the min-id keeper") {
    val df = Seq(
      (1L, "aaa", 30L), (5L, "aaa", 31L), (9L, "aaa", 29L), // keeper 1 (30)
      (2L, "bb", 20L), (7L, "bb", 25L),                     // keeper 2 (20)
      (3L, "unique", 11L))
      .toDF("doc_id", "text", "n_chars")
    val out = Dedup.dedupSavings(df, "text", "doc_id", "n_chars")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // size 1: one group, nothing removable; size 2: the "bb" group
    // frees 25 (total 45 - keeper 20); size 3: "aaa" frees 60 (90-30)
    assert(out == Seq(
      (1L, 1L, 0L, 0L),
      (2L, 1L, 1L, 25L),
      (3L, 1L, 2L, 60L)), s"got $out")
  }
}
