package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("token counts") {
    val df = Seq("the quick brown fox", "a, b! c?").toDF("t")
    val r = df.select(
      TextAnalysis.tokenCountWs(col("t")),
      TextAnalysis.tokenCountBpe(col("t"))).collect()
    assert(r(0).getInt(0) == 4)
    assert(r(1).getInt(0) == 3)
    assert(r(1).getLong(1) == 6L) // a , b ! c ? (native counter: long)
  }

  test("stopword ratio and quality bounds") {
    val df = Seq("the cat sat on the mat with a hat and a bat").toDF("t")
    val r = df.select(
      TextAnalysis.stopwordRatio(col("t")),
      TextAnalysis.qualityScore(col("t"))).collect()(0)
    assert(r.getDouble(0) > 0.2 && r.getDouble(0) < 0.8)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
  }

  test("fingerprint is invariant to word order and duplication") {
    val df = Seq(("b a c a", "a b c"), ("x y", "y x")).toDF("t1", "t2")
    val r = df.select(
      TextAnalysis.fingerprint(col("t1")) === TextAnalysis.fingerprint(col("t2")))
      .as[Boolean].collect()
    assert(r.forall(identity))
  }

  test("rollingHash is order-sensitive") {
    val df = Seq(("a b c", "c b a")).toDF("t1", "t2")
    val r = df.select(
      TextAnalysis.rollingHash(col("t1")) === TextAnalysis.rollingHash(col("t2")))
      .as[Boolean].collect()
    assert(!r(0))
  }

  test("annotateStats matches the scalar helpers value-for-value") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog. It was fast!"),
      (2L, ""),
      (3L, "   "),
      (4L, "word"),
      (5L, "el que la los de una cosa y otra mas aqui."),
      (6L, "a, b! c? d; e: f."),
      (7L, "x " * 30 + "the end."),
      (8L, "的 是 了 在 我 something 的 mixed"),
      // trailing/leading NON-SPACE whitespace: Spark trim strips 0x20
      // only and Spark split passes limit -1 (trailing empty tokens
      // KEPT) — the parity edge a Java-default split implementation
      // silently gets wrong
      (9L, "hello world\n"),
      (10L, "\ttab lead"),
      (11L, "trail tab\t"),
      (12L, "\n"),
      (13L, "the and of \t\n"))
      .toDF("doc_id", "text")
    val fast = TextAnalysis.annotateStats(docs, "text")
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        col("mean_word_len"), col("punct_ratio"), col("stopword_ratio"),
        col("quality"), col("lang_pred"))
    val slow = docs.select(col("doc_id"),
      TextAnalysis.charCount(col("text")).as("n_chars"),
      TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tokens"),
      TextAnalysis.meanWordLen(col("text")).as("mean_word_len"),
      TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
      TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.langId(col("text")).as("lang_pred"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      s"fast=${fast.collect().toSeq}\nslow=${slow.collect().toSeq}")
  }

  test("qualityLr replays the documented logistic formula and gates at 0.5") {
    val df = Seq(
      (1L, "the cat sat on the mat with a hat and a bat for fun"),
      (2L, "zzzzz qqqqq !!!!! ##### @@@@@ %%%%% &&&&& *****")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityLr(df, "text")
      .select("doc_id", "quality_lr", "kept")
      .as[(Long, Double, Boolean)].collect().sortBy(_._1)
    val feats = TextAnalysis.annotateStats(df, "text")
      .select("doc_id", "stopword_ratio", "n_tokens", "mean_word_len",
        "punct_ratio")
      .as[(Long, Double, Long, Double, Double)].collect().sortBy(_._1)
    out.zip(feats).foreach { case ((id, score, kept), (fid, sr, nt, mwl, pr)) =>
      assert(id == fid)
      val logit = TextAnalysis.QualityLrBias +
        sr * TextAnalysis.QualityLrWStop +
        math.log1p(nt.toDouble) * TextAnalysis.QualityLrWLnTok +
        mwl * TextAnalysis.QualityLrWMeanLen +
        pr * TextAnalysis.QualityLrWPunct
      val expect = BigDecimal(1.0 / (1.0 + math.exp(-logit)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(score - expect) <= 1e-12, s"doc $id: $score vs $expect")
      assert(kept == (score >= 0.5))
    }
    // fluent stopword-rich prose outranks punctuation-dense junk
    assert(out(0)._2 > out(1)._2)
  }

  test("curateStats equals curate minus the text column") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it was fast."),
      (2L, "the quick brown fox jumps over the lazy dog and it was fast."),
      (3L, "short"),
      (4L, "another long enough document with the stopwords of a normal text."))
      .toDF("doc_id", "text")
    val viaJoin = Curation.curate(docs, "text", "doc_id")
      .select(col("doc_id"), col("quality"), col("lang_pred"), col("n_tokens"))
    val viaWindow = Curation.curateStats(docs, "text", "doc_id")
      .select(col("doc_id"), col("quality"), col("lang_pred"), col("n_tokens"))
    assert(viaJoin.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaJoin).isEmpty,
      s"join=${viaJoin.collect().toSeq}\nwindow=${viaWindow.collect().toSeq}")
  }

  test("unigramLogProb scores common-token docs higher than rare-token docs") {
    // "a a a a" tokens are 4/6 of the corpus; "x y" are 1/6 each
    val docs = Seq((1L, "a a a a"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs, "text", "doc_id")
      .orderBy("doc_id")
      .as[(Long, Double, Long)].collect()
    assert(out(0)._3 == 4L && out(1)._3 == 2L)
    assert(out(0)._2 > out(1)._2, s"common tokens must score higher: $out")
    // exact values: ln(4/6) and ln(1/6)
    assert(math.abs(out(0)._2 - math.log(4.0 / 6)) < 1e-3)
    assert(math.abs(out(1)._2 - math.log(1.0 / 6)) < 1e-3)
  }

  test("property: bigramLogProb is total and never positive (p <= 1 by construction)") {
    val rnd = new scala.util.Random(11)
    val junk = (1 to 60).map { i =>
      (i.toLong, (0 until rnd.nextInt(6)).map(_ =>
        rnd.alphanumeric.take(1 + rnd.nextInt(5)).mkString).mkString(" "))
    }
    val out = TextAnalysis.bigramLogProb(junk.toDF("doc_id", "text"), "text", "doc_id")
      .as[(Long, Option[Double], Long)].collect()
    assert(out.length == 60)
    out.foreach { case (id, lp, n) =>
      assert(lp.forall(_ <= 1e-9), s"doc $id: positive logprob $lp")
      assert((n == 0) == lp.isEmpty, s"doc $id: n=$n lp=$lp must agree")
    }
  }

  test("property: c4LineFilter is total and kept is a subsequence of input lines") {
    val rnd = new scala.util.Random(13)
    val chars = "abc .!?{\n"
    val docs = (1 to 60).map(i =>
      (i.toLong, (0 until rnd.nextInt(80)).map(_ => chars(rnd.nextInt(chars.length))).mkString))
    val out = TextAnalysis.c4LineFilter(docs.toDF("doc_id", "text"), "text", "doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == 60)
    val byId = docs.toMap
    out.foreach { case (id, clean, nl, nk) =>
      assert(nk <= nl && nl == byId(id).split("\n", -1).length)
      val inLines = byId(id).split("\n", -1).toSeq
      val keptLines = if (clean.isEmpty) Seq() else clean.split("\n", -1).toSeq
      // kept lines appear in order in the input (subsequence check)
      var j = 0
      keptLines.foreach { k =>
        j = inLines.indexOf(k, j)
        assert(j >= 0, s"doc $id: kept line not found in order: [$k]")
        j += 1
      }
    }
  }

  test("c4LineFilter applies the published line rules") {
    val doc =
      "This is a good sentence that survives the filter.\n" +  // kept
      "too short.\n" +                                          // < 5 words
      "No terminal punctuation on this line here\n" +           // no [.!?]$
      "Some lorem ipsum filler text sits right here.\n" +       // marker
      "A code line { return 1; } should be dropped.\n" +        // brace
      "Another proper sentence with enough words stays!"        // kept
    val Array((_, clean, nl, nk)) =
      TextAnalysis.c4LineFilter(Seq((1L, doc)).toDF("doc_id", "text"),
          "text", "doc_id")
        .as[(Long, String, Long, Long)].collect()
    assert(nl == 6L && nk == 2L)
    assert(clean ==
      "This is a good sentence that survives the filter.\n" +
      "Another proper sentence with enough words stays!")
  }

  test("bigramLogProb rewards word order, not just token frequency") {
    // both docs have identical unigram distributions; doc 1 repeats the
    // bigram "a b" (high transition prob), doc 2 scrambles it
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "a a a b b b"),
      (3L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs, "text", "doc_id")
      .orderBy("doc_id")
      .as[(Long, Option[Double], Long)].collect()
    assert(out.map(_._3).toSeq == Seq(5L, 5L, 0L), "bigrams = tokens - 1; short doc 0")
    assert(out(2)._2.isEmpty, "no bigrams -> null score")
    assert(out(0)._2.get > out(1)._2.get,
      s"ordered doc must outscore scrambled doc with same unigrams: ${out.toSeq}")
  }

  test("bigramLogProb counts occurrences, not distinct bigrams") {
    // "a a a": bigram "a a" occurs twice; c(uv)=2 c(u)=3 -> per-bigram
    // prob 0.7*2/3 + 0.3*3/3 = 0.7667 exactly, same for both positions
    val docs = Seq((1L, "a a a")).toDF("doc_id", "text")
    val Array((_, Some(lp), n)) = TextAnalysis.bigramLogProb(docs, "text", "doc_id")
      .as[(Long, Option[Double], Long)].collect()
    assert(n == 2L)
    assert(math.abs(lp - math.log(0.7 * 2.0 / 3 + 0.3)) < 1e-3, lp.toString)
  }

  test("langId picks the language with most marker hits") {
    val df = Seq(
      ("the cat and the dog is with of", "en"),
      ("el que la los de", "es"),
      ("der und die das ist", "de"),
      ("xyzzy plugh", "und")).toDF("t", "expected")
    val r = df.select(TextAnalysis.langId(col("t")), col("expected"))
      .as[(String, String)].collect()
    r.foreach { case (got, exp) => assert(got == exp, s"got $got want $exp") }
  }

  test("repetitionStats flags duplicated lines and n-grams") {
    val docs = Seq(
      // "spam spam spam spam": 3 bigrams, all "spam spam" -> dup 2/3
      (1L, "spam spam spam spam"),
      // 4 distinct words: no duplicate bigrams/trigrams
      (2L, "the quick brown fox"),
      // repeated line out of 3 -> dup_line_frac 1/3
      (3L, "alpha beta\nalpha beta\ngamma delta"),
      // shorter than k words: one whole-text gram, dup 0 by construction
      (4L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "text", "doc_id")
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "dup_line_frac", "dup_2gram_frac", "dup_3gram_frac")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(out(0) == ((1L, 1L, 0.0, 0.6667, 0.5)), s"got ${out(0)}")
    assert(out(1) == ((2L, 1L, 0.0, 0.0, 0.0)), s"got ${out(1)}")
    assert(out(2)._2 == 3L && out(2)._3 == 0.3333, s"got ${out(2)}")
    // "alpha beta\nalpha beta gamma delta" tokens: bigram "alpha beta"
    // repeats across the line break: 5 bigrams, 4 distinct
    assert(out(2)._4 == 0.2, s"got ${out(2)}")
    assert(out(3) == ((4L, 1L, 0.0, 0.0, 0.0)), s"got ${out(3)}")
  }

  test("perplexitySplit buckets by score terciles: head >= middle >= tail") {
    // 9 docs with distinct unigram profiles: repeated common tokens
    // score high, rare-token docs score low
    val docs = (1 to 9).map { i =>
      // doc i uses token "t<i>" i times: frequent tokens (high i) get
      // higher corpus log-prob
      (i.toLong, Seq.fill(i)(s"t$i").mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextAnalysis.perplexitySplit(docs, "text", "doc_id")
      .select("doc_id", "mean_logprob", "ppl_bucket")
      .as[(Long, Double, String)].collect().sortBy(_._1)
    assert(out.length == 9)
    assert(out.map(_._3).toSet == Set("head", "middle", "tail"))
    // bucket ordering respects score ordering
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket("head").min >= byBucket("middle").max)
    assert(byBucket("middle").min >= byBucket("tail").max)
    // ~tercile sizes on 9 distinct scores
    assert(byBucket.values.forall(v => v.length >= 2 && v.length <= 4),
      byBucket.view.mapValues(_.length).toMap.toString)
  }

  test("removeBoilerplateLines drops >=minDocs lines everywhere, keeps rare ones") {
    val docs = Seq(
      (1L, "FOOTER\nunique alpha\nFOOTER"), // in-doc repeat still 1 distinct doc... footer shared below
      (2L, "unique beta\nFOOTER"),
      (3L, "unique gamma\nFOOTER\nshared line"),
      (4L, "shared line\nunique delta")).toDF("doc_id", "text")
    // FOOTER in docs 1,2,3 (3 distinct); "shared line" in 2 docs
    val out = TextAnalysis.removeBoilerplateLines(docs, "text", "doc_id", minDocs = 3)
      .orderBy("doc_id")
      .select("doc_id", "clean_text", "n_lines", "n_kept")
      .as[(Long, String, Long, Long)].collect()
    // every FOOTER occurrence dropped, including the duplicate in doc 1
    assert(out(0) == ((1L, "unique alpha", 3L, 1L)), out(0).toString)
    assert(out(1) == ((2L, "unique beta", 2L, 1L)), out(1).toString)
    // "shared line" (df=2 < 3) survives
    assert(out(2) == ((3L, "unique gamma\nshared line", 3L, 2L)), out(2).toString)
    assert(out(3) == ((4L, "shared line\nunique delta", 2L, 2L)), out(3).toString)
  }

  test("dedupLinesWithinDoc keeps FIRST occurrences in order, per doc independently") {
    val docs = Seq(
      (1L, "a\nb\na\nc\nb\na"), // dups of a,b within the doc
      (2L, "a\nx"), // 'a' repeated ACROSS docs must NOT be touched
      (3L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLinesWithinDoc(docs, "text", "doc_id")
      .orderBy("doc_id").select("doc_id", "clean_text", "n_lines", "n_kept")
      .as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, "a\nb\nc", 6L, 3L)), out(0).toString)
    assert(out(1) == ((2L, "a\nx", 2L, 2L)), out(1).toString)
    assert(out(2) == ((3L, "solo", 1L, 1L)), out(2).toString)
  }

  test("removeBoilerplateLines: all-boilerplate doc empties; unshared doc untouched") {
    val docs = Seq(
      (1L, "B\nB"), (2L, "B"), (3L, "B"), // B in 3 docs
      (4L, "only me")).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplateLines(docs, "text", "doc_id", minDocs = 3)
      .orderBy("doc_id").select("doc_id", "clean_text", "n_kept")
      .as[(Long, String, Long)].collect()
    assert(out(0) == ((1L, "", 0L)))
    assert(out(3) == ((4L, "only me", 1L)))
  }

  test("charEntropy: known values, degenerate inputs, unicode") {
    import graft.functions.TextHashExpressions.char_entropy
    // a janino failure in the emitted static call must THROW here, not
    // silently run interpreted (the doc claim is codegen-native)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try charEntropyKnownValues()
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  private def charEntropyKnownValues(): Unit = {
    import graft.functions.TextHashExpressions.char_entropy
    val df = Seq(
      (1L, "aabbc"), // counts 2,2,1 -> 1.5219...
      (2L, ""), // empty -> 0
      (3L, "aaaaaa"), // single symbol -> 0
      (4L, "abcd"), // uniform over 4 -> exactly 2 bits
      (5L, "日日本"), // non-ASCII path: counts 2,1 over n=3
      (6L, null.asInstanceOf[String])) // null -> null
      .toDF("id", "t")
    val out = df.select(col("id"), char_entropy(col("t")).as("h"))
      .orderBy("id").as[(Long, Option[Double])].collect()
    def h(counts: Long*): Double = {
      val n = counts.sum.toDouble
      -counts.map { c => val p = c / n; p * (math.log(p) / math.log(2)) }.sum
    }
    assert(math.abs(out(0)._2.get - h(2, 2, 1)) < 1e-12)
    assert(out(1)._2.contains(0.0))
    assert(out(2)._2.contains(0.0))
    assert(math.abs(out(3)._2.get - 2.0) < 1e-12)
    assert(math.abs(out(4)._2.get - h(2, 1)) < 1e-12)
    assert(out(5)._2.isEmpty)
  }

  test("property: charEntropy matches a scala reference on random strings") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcXYZ 09.!é世" // mixed ascii + non-ascii
    val docs = (0 until 50).map { i =>
      (i.toLong, (0 until rnd.nextInt(80)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val got = docs.toDF("id", "t")
      .select(col("id"), graft.functions.TextHashExpressions.char_entropy(col("t")))
      .as[(Long, Double)].collect().toMap
    docs.foreach { case (id, s) =>
      val counts = s.toSeq.groupBy(identity).values.map(_.size.toLong).toSeq
      val want =
        if (s.isEmpty) 0.0
        else {
          val n = counts.sum.toDouble
          -counts.map { c => val p = c / n; p * (math.log(p) / math.log(2)) }.sum
        }
      assert(math.abs(got(id) - want) < 1e-9, s"id=$id s='$s'")
    }
  }

  test("zipfFit recovers slope -1 and R2 1 on an exact Zipf corpus") {
    // freqs 6/3/2 = 6/rank exactly: ln f = ln 6 - ln r, a perfect fit
    val text = (Seq.fill(6)("aa") ++ Seq.fill(3)("bb") ++ Seq.fill(2)("cc"))
      .mkString(" ")
    val df = Seq(Tuple1(text)).toDF("text")
    val Array((slope, r2, v)) = TextAnalysis.zipfFit(df, "text")
      .as[(Double, Double, Long)].collect()
    assert(slope == -1.0 && r2 == 1.0 && v == 3L, s"($slope, $r2, $v)")
  }

  test("hashEmbedding is a deterministic signed bag-of-words sum") {
    val df = Seq((1L, "alpha alpha beta"), (2L, "ALPHA alpha beta"),
      (3L, "")).toDF("id", "text")
    val got = TextAnalysis.hashEmbedding(df, "text", "id", dim = 16)
      .as[(Long, Array[Double])].collect().map(r => r._1 -> r._2.toSeq).toMap
    assert(got.values.forall(_.length == 16))
    // case-insensitive: docs 1 and 2 embed identically
    assert(got(1L) == got(2L))
    // multiplicity counts: "alpha" contributes twice the unit of "beta"
    assert(got(1L).map(math.abs).sum == 3.0, s"got ${got(1L)}")
    // the empty token still hashes somewhere (total on empty text)
    assert(got(3L).map(math.abs).sum == 1.0)
    // partition invariance (integer sums are order-exact)
    val re = TextAnalysis.hashEmbedding(df.repartition(5), "text", "id", 16)
      .as[(Long, Array[Double])].collect().map(r => r._1 -> r._2.toSeq).toMap
    assert(re == got)
  }

  test("spellSuggest ranks by distance then frequency then word") {
    val docs = Seq(
      (1L, "hash hash hash hath bash join"),
      (2L, "hash join scan hath")).toDF("doc_id", "text")
    val got = TextAnalysis.spellSuggest(docs, "text", Seq("hsah"), k = 3)
      .select("word", "dist", "rank").as[(String, Long, Long)].collect().toSeq
    // hash and hath sit within 2 edits of 'hsah' (bash is 3, excluded);
    // hash (freq 4) outranks hath (freq 2) at equal distance
    assert(got.map(_._1) == Seq("hash", "hath"), got.toString)
    assert(got.map(_._3) == Seq(1L, 2L))
  }

  test("snippets picks the densest fixed-stride window, earliest on ties") {
    val text = (Seq.fill(16)("pad") ++ Seq("hash", "join", "pad", "scan") ++
      Seq.fill(12)("pad") ++ Seq("hash")).mkString(" ")
    val docs = Seq((1L, text), (2L, "no match here")).toDF("doc_id", "text")
    val got = TextAnalysis.snippets(docs, "text", "doc_id",
        Seq("hash", "join", "scan"), window = 16)
      .as[(Long, Long, String)].collect().toSeq
    // bucket 1 (tokens 17-32) holds 3 hits vs bucket 2's 1; doc 2 absent
    assert(got.map(_._1) == Seq(1L), got.toString)
    assert(got.head._2 == 3L)
    assert(got.head._3.startsWith("hash join pad scan"), got.head._3)
  }

  test("bm25TopK ranks higher-tf docs first; non-matching docs absent") {
    val docs = Seq(
      (1L, "hash hash filter"),
      (2L, "hash filter row"),
      (3L, "row filter column")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "text", "doc_id", Seq("hash"), k = 5)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L), got.toString)
    assert(got.map(_._3) == Seq(1L, 2L))
    assert(got(0)._2 > got(1)._2, "tf=2 must outrank tf=1 at equal length")
    // equal scores tie-break by id, and the plan's global top-k is a
    // distributed TakeOrderedAndProject, not a single-partition window
    val plan = TextAnalysis.bm25TopK(docs, "text", "doc_id", Seq("hash"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("zipfFit is total on degenerate vocabularies (no NaN-vs-NULL drift)") {
    // all frequencies equal: slope is 0 (flat), r2 undefined -> NULL
    val flat = Seq(Tuple1("aa bb cc dd")).toDF("text")
    val r1 = TextAnalysis.zipfFit(flat, "text")
      .select("zipf_slope", "r2_loglog").collect()(0)
    assert(r1.getDouble(0) == 0.0 && r1.isNullAt(1), s"got $r1")
    // single-rank vocabulary: both undefined -> NULL
    val one = Seq(Tuple1("zz zz zz")).toDF("text")
    val r2 = TextAnalysis.zipfFit(one, "text")
      .select("zipf_slope", "r2_loglog").collect()(0)
    assert(r2.isNullAt(0) && r2.isNullAt(1), s"got $r2")
  }

  test("zipfFit ranks ties deterministically and is partition-invariant") {
    val docs = (1 to 40).map(i => (i.toLong, s"tok${i % 7} tok${i % 5} filler"))
    val df = docs.toDF("id", "text")
    val a = TextAnalysis.zipfFit(df, "text").as[(Double, Double, Long)].head()
    val b = TextAnalysis.zipfFit(df.repartition(7), "text")
      .as[(Double, Double, Long)].head()
    assert(a == b)
  }

  test("fertility averages per-doc chars-per-token within each language") {
    val df = Seq(
      (1L, "en", "ab cd"),    // 5 chars, 2 BPE tokens -> 2.5
      (2L, "en", "abcdef"),   // 6 chars, 1 token -> 6.0
      (3L, "xx", ""))         // 0 chars, clamped 1 token -> 0.0
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.fertility(df, "text", "lang")
      .as[(String, Double, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("en", 4.25, 3L, 2L), ("xx", 0.0, 1L, 1L)), s"got $out")
  }

  test("funnelReport stages are monotone and hand-checkable") {
    val good = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, good),                 // survives everything
      (2L, good),                 // exact dup of 1 -> dropped at dedup
      (3L, "x"),                  // fails the quality gate
      (4L, good + " extra"),      // survives gate+dedup, IS the eval doc
      (5L, "the cat sat on the mat with a hat and a bat"))
      .toDF("doc_id", "text")
    val eval_ = Seq(good + "   extra").toDF("text") // ws-variant of 4
    val got = Curation.funnelReport(docs, "text", "doc_id", eval_, "text")
      .as[(Long, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._2, r._3)) == Seq(
      ("raw", 5L), ("quality_gate", 4L), ("exact_dedup", 3L),
      ("decontaminated", 2L)), got.toString)
    assert(got.map(_._4) == Seq(1.0, 0.8, 0.6, 0.4))
    // monotone non-increasing by construction
    assert(got.map(_._3).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("funnelReport keeper is the min-id SURVIVOR, not a gated-out doc") {
    // doc 1 fails the gate but shares text shape with doc 2; the
    // dedup stage must keep 2 (min-id survivor), so counts don't
    // drop a real survivor because a failed doc 'took' its hash slot
    val good = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, "x"), (2L, good), (3L, good)).toDF("doc_id", "text")
    val got = Curation.funnelReport(docs, "text", "doc_id",
        Seq.empty[String].toDF("text"), "text")
      .as[(Long, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._2, r._3)) == Seq(
      ("raw", 3L), ("quality_gate", 2L), ("exact_dedup", 1L),
      ("decontaminated", 1L)), got.toString)
  }

  test("readability: hand-counted ingredients, vowel-less floor, negatives ok") {
    val docs = Seq(
      (1L, "The cat sat. It ran!"),   // 5 words, 2 sentences, 5 syllable groups
      (2L, "zzz zzz"),                // no vowels -> syllables floor at words
      (3L, "a")                       // minimal: 1/1/1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    def flesch(w: Double, s: Double, sy: Double) =
      q4(206.835 - 1.015 * (w / s) - 84.6 * (sy / w))
    def fk(w: Double, s: Double, sy: Double) =
      q4(0.39 * (w / s) + 11.8 * (sy / w) - 15.59)
    assert(got(1L) == ((1L, 5L, 2L, 5L, flesch(5, 2, 5), fk(5, 2, 5))),
      got(1L).toString)
    assert(got(2L) == ((2L, 2L, 1L, 2L, flesch(2, 1, 2), fk(2, 1, 2))),
      got(2L).toString)
    assert(got(3L) == ((3L, 1L, 1L, 1L, flesch(1, 1, 1), fk(1, 1, 1))))
    // simple prose scores higher (easier) than dense polysyllabic text
    val pair = Seq((1L, "The cat sat on the mat."),
      (2L, "Multisyllabic terminological obfuscation intensifies."))
      .toDF("doc_id", "text")
    val f = TextAnalysis.readability(pair, "text", "doc_id")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(f(1L) > f(2L), f.toString)
  }

  test("collocations: hand-computed PMI, minCount gate, deterministic top-N") {
    // tokens: a x3, b x3, c x1, N = 7; bigrams: (a,b) x3, (b,a) x1,
    // (b,c) x1. pmi(a,b) = ln(3*7/9) = pmi(b,c) = ln(7/3) -> the tie
    // breaks on word_a; pmi(b,a) = ln(7/9) < 0 ranks last.
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val two = TextAnalysis.collocations(docs, "text", minCount = 2, topN = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    val pmiAb = math.floor(math.log(3.0 * 7 / 9) * 1e4 + 0.5) / 1e4
    assert(two == Seq(("a", "b", 3L, pmiAb)), two.toString)
    val top = TextAnalysis.collocations(docs, "text", minCount = 1, topN = 2)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(top.map(r => (r._1, r._2)) == Seq(("a", "b"), ("b", "c")),
      top.toString)
  }

  test("gopherRules: each published rule rejects its violator, clean text passes") {
    val fluent = ("the data " * 30).trim + " have quality and that be with to of"
    val docs = Seq(
      1L -> fluent,                                  // passes everything
      2L -> "short the of and",                      // n_words < 50
      3L -> (Seq.fill(60)("a b") ++ Seq("the of")).mkString(" "), // mean len < 3
      4L -> (("### " * 20) + fluent),                // symbol ratio > 0.1
      5L -> (Seq.fill(10)("- the bullet of line item here").mkString("\n")), // bullets
      6L -> (Seq.fill(10)("the line trails off and that...").mkString("\n")), // ellipses
      7L -> ((Seq.fill(55)("12345") ++ Seq("the", "of")).mkString(" ")), // alpha < 0.8
      8L -> ("zorp blat " * 30).trim,                // no stop words
      9L -> "")                                      // empty: reject, not null
    val out = TextAnalysis.gopherRules(docs.toDF("doc_id", "text"),
        "text", "doc_id", minWords = 50)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out(1L), out.toString)
    for (i <- 2L to 9L) assert(!out(i), s"doc $i should fail: $out")
    // the statistics surface the WHY
    val row4 = TextAnalysis.gopherRules(docs.toDF("doc_id", "text"),
        "text", "doc_id", minWords = 50)
      .filter($"doc_id" === 4L).select("symbol_ratio")
      .as[Double].head()
    assert(row4 > 0.1, row4.toString)
  }
}
