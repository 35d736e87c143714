package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for LLM training-data pipelines:
  * sliding-window chunking, deterministic train/val/test splits,
  * sequence packing, and PII scrubbing. All pure column expressions
  * or map-side explodes — the only shuffle in the family is the
  * per-shard window in [[packSequences]].
  */
object Corpus {

  /** Sliding token-window chunking: explode each document into
    * `chunkSize`-token chunks advancing by `chunkSize - overlap`
    * tokens (the standard context-window preparation step). Map-side
    * only — tokens never shuffle; a trailing chunk may be shorter
    * than `chunkSize`.
    */
  def chunk(df: DataFrame, textCol: String, idCol: String,
            chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    // explode the window starts FIRST, then slice once per output row
    // in a staged projection (CollapseProject keeps the multi-referenced
    // non-cheap alias) — keeps slice/array_join/size in codegen instead
    // of an interpreted per-element lambda, and computes each window's
    // slice once instead of twice
    df.select(col(idCol), split(trim(col(textCol)), "\\s+").as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)), lit(step)))
          .as(Seq("chunk_id", "__start")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("__toks"), col("__start") + 1, lit(chunkSize)).as("__chunk"))
      .select(col(idCol), col("chunk_id"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"))
  }

  /** Deterministic train/val/test assignment: md5-bucket of the id.
    * Stable across runs, engines, and cluster layouts — no RNG, no
    * sampling order dependence; any engine that can md5 reproduces
    * the exact split.
    */
  def assignSplit(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct + valPct <= 100, "train + val must be <= 100")
    val bucket = conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
      .cast("int") % 100
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic WEIGHTED Bernoulli sampling — soft quality
    * filtering (the CCNet/RefinedWeb shape: rather than a hard
    * quality cutoff, keep each doc with probability `weightCol` in
    * [0, 1], so borderline docs survive at reduced rate and the
    * corpus keeps diversity): doc kept iff its md5-uniform draw
    * u(id) < weight. No RNG — u(id) is the first 8 hex digits of
    * md5(id) scaled to [0, 1), so the decision is a pure function of
    * the id, reproducible across runs, engines, and cluster layouts,
    * and INDEPENDENT of the weight column (reweighting a doc moves
    * only its own threshold, never another doc's draw). Zero
    * shuffles: the draw and the comparison evaluate in the scan
    * stage. Weights outside [0, 1] are clamped (w <= 0 never keeps,
    * w >= 1 always keeps).
    */
  def sampleWeighted(df: DataFrame, idCol: String, weightCol: String): DataFrame = {
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0d
    df.withColumn("kept", u < greatest(least(col(weightCol), lit(1.0)), lit(0.0)))
  }

  /** Leakage-safe split by duplicate CLUSTER: every member of a
    * near-dup cluster receives the SAME deterministic split, so no
    * (near-)identical pair straddles train/val/test — the eval-set
    * contamination that per-doc bucketing ([[assignSplit]] on the id)
    * cannot prevent: with 80/10/10 buckets, an exact-dup pair split
    * independently lands in different splits ~34% of the time.
    * `clusters` is (id, cluster_id) rows as produced by
    * [[Dedup.clusterPairs]] (clustered ids only — any id->group
    * mapping works, e.g. exact-dup groups keyed by min member id);
    * docs absent from `clusters` are their own singleton group.
    * Output: every input doc as (idCol, group_id, split).
    *
    * Scale shape: one equi-join on the id (the clusters side holds
    * only CLUSTERED ids — small when duplication is rare, so AQE
    * broadcasts it) then a map-side md5 bucket of group_id; the split
    * adds no shuffle beyond that join. For exact-dup-only safety skip
    * the join entirely: [[splitByContent]] hashes the text in the
    * scan stage — zero shuffle.
    */
  def splitByCluster(docs: DataFrame, clusters: DataFrame, idCol: String,
                     trainPct: Int = 80, valPct: Int = 10): DataFrame =
    docs.select(col(idCol))
      .join(clusters.select(col("id").as(idCol), col("cluster_id")),
        Seq(idCol), "left")
      .withColumn("group_id", coalesce(col("cluster_id"), col(idCol)))
      .select(col(idCol), col("group_id"),
        assignSplit(col("group_id"), trainPct, valPct).as("split"))

  /** Exact-dup leakage-safe split with ZERO shuffle: the split key is
    * the md5 of the text itself, so byte-identical docs always share
    * a split; evaluated entirely in the scan stage. Output:
    * (idCol, group_key, split) with group_key = md5(text).
    */
  def splitByContent(df: DataFrame, textCol: String, idCol: String,
                     trainPct: Int = 80, valPct: Int = 10): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("group_key"),
      assignSplit(md5(col(textCol)), trainPct, valPct).as("split"))

  /** Greedy-by-order sequence packing: documents are concatenated in
    * id order and cut at `budget`-token boundaries, so
    * pack_id = floor(exclusive-prefix-tokens / budget). Shard columns
    * bound the window partitions — at 100 TB packing is per shard
    * (each shard's cumsum is independent), never a single global
    * ordering.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, shardCols: Seq[String] = Nil): DataFrame = {
    val base =
      if (shardCols.isEmpty) Window.orderBy(col(idCol))
      else Window.partitionBy(shardCols.map(col): _*).orderBy(col(idCol))
    val cum = sum(col(tokenCol)).over(base.rowsBetween(Window.unboundedPreceding, 0))
    df.withColumn("pack_id", floor((cum - col(tokenCol)) / budget))
  }

  /** Deterministic stratified sampling: n rows per stratum, chosen by
    * md5-of-id order — reproducible across runs and engines (no RNG,
    * no partition-layout dependence), uniform-ish because the hash
    * decorrelates the choice from the id sequence. One shuffle on the
    * stratum key; WindowGroupLimit bounds each partition's sort to n.
    */
  def sampleStratified(df: DataFrame, strataCol: String, idCol: String,
                       n: Int): DataFrame = {
    require(n > 0, "sample size must be positive")
    // Top-n per stratum in md5 order WITHOUT sorting the stream: the
    // direct window formulation local-sorts every partition of the
    // full input by a 32-char hash (WindowGroupLimit trims the
    // exchange, not the sort) — measured 4.8x per decade at sf10 on
    // the 60M-event fixture for a query whose OUTPUT is 50 rows.
    // Instead, the md5 rank's first two hex digits form 256 ordered
    // range buckets per stratum (hex-string order = prefix order —
    // the takeTokenBudget prefix-sum idiom): a tiny per-(stratum,
    // bucket) count fixes the earliest bucket whose cumulative count
    // reaches n, rows past that bucket provably cannot rank top-n,
    // and only the surviving sliver (n/256th of uniform-hash data)
    // pays the window sort. Exact for every input: a stratum with
    // under n rows keeps every bucket (cumulative never reaches n →
    // cutoff defaults past the last bucket); null ids hash to null
    // md5 = bucket null, ranked FIRST by the window's asc-nulls-first
    // order, so they map to bucket -1 and always survive the filter.
    val ranked = df
      .withColumn("__r", md5(col(idCol).cast("string")))
      .withColumn("__b",
        coalesce(conv(substring(col("__r"), 1, 2), 16, 10).cast("int"),
          lit(-1)))
    val cutoffs = ranked.groupBy(col(strataCol), col("__b"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__cum", sum(col("__bn")).over(
        Window.partitionBy(col(strataCol)).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(strataCol))
      .agg(coalesce(min(when(col("__cum") >= n, col("__b"))),
        lit(256)).as("__cut"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("__r"), col(idCol))
    ranked
      // null-safe equality: a NULL stratum is a legitimate partition
      // of the window formulation and must meet its own cutoff row
      .join(broadcast(cutoffs.withColumnRenamed(strataCol, "__strat")),
        col(strataCol) <=> col("__strat"))
      .filter(col("__b") <= col("__cut"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .select(df.columns.map(col): _*)
  }

  /** Per-source token-budget intake: the EXECUTION half of dataset
    * blending ([[mixPlan]] decides shares; this enforces them): take
    * documents per source in deterministic md5-of-id order until the
    * source's token budget is exhausted — "1B tokens of src X, 200M of
    * src Y" as one declarative plan. A doc is kept iff its cumulative
    * token count (inclusive) fits the budget; sources absent from
    * `budgets` get `defaultBudget`.
    *
    * Scale shape — a DISTRIBUTED prefix sum, not a per-source window:
    * `PARTITION BY source ORDER BY rank` would funnel every row of a
    * source through ONE partition (the classic skew/scale-killer when
    * one source is half the corpus). Instead the md5 rank's first two
    * hex digits form 256 ORDERED range buckets per source (hex-string
    * order = numeric prefix order), so: tiny per-(source, bucket)
    * totals -> per-source running offsets over <= 256 rows -> local
    * cumsum inside each (source, bucket) partition + offset. Shuffles
    * carry (id, source, count) rows on a 256-way composite key; text
    * never leaves the map side.
    */
  def takeTokenBudget(df: DataFrame, sourceCol: String, idCol: String,
                      textCol: String, budgets: Map[String, Long],
                      defaultBudget: Long): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      "budgets must be non-negative")
    val base = df.select(col(idCol), col(sourceCol),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("__rank", md5(col(idCol).cast("string")))
      .withColumn("__bucket",
        conv(substring(col("__rank"), 1, 2), 16, 10).cast("int"))
    val offsets = base.groupBy(col(sourceCol), col("__bucket"))
      .agg(sum(col("n_tokens")).as("__bsum"))
      .withColumn("__offset",
        coalesce(sum(col("__bsum")).over(
          Window.partitionBy(col(sourceCol)).orderBy(col("__bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(sourceCol), col("__bucket"), col("__offset"))
    val wLocal = Window.partitionBy(col(sourceCol), col("__bucket"))
      .orderBy(col("__rank"), col(idCol))
    val budget = coalesce(
      element_at(typedLit(budgets), col(sourceCol)), lit(defaultBudget))
    base.join(broadcast(offsets), Seq(sourceCol, "__bucket"))
      .withColumn("cum_tokens", col("__offset") +
        sum(col("n_tokens")).over(wLocal.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("kept", col("cum_tokens") <= budget)
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        col("cum_tokens"), col("kept"))
  }

  /** Deterministic corpus shuffle + sharding: the "global shuffle"
    * every training run needs, without a global sort. Each row gets a
    * pseudo-random rank `md5("shuf<seed>:" || id)` (uniform, stable
    * across runs/engines/cluster layouts — same no-RNG argument as
    * [[assignSplit]]), a shard `hash-prefix mod nShards`, and a
    * within-shard position by rank. Changing the seed is an epoch
    * reshuffle: a completely different but equally deterministic
    * permutation.
    *
    * Shuffle profile: ONE hash exchange on the shard key, then a
    * per-shard sort for `row_number` — never a corpus-wide range sort
    * (a global ORDER BY rank would range-partition and resort 100 TB
    * for the same permutation semantics; shard-local positions plus
    * the shard id ARE the permutation). Shards are uniform by md5
    * construction, so no skew; pick nShards well above executor count
    * at scale so each shard's sort fits in memory (shard = training
    * data file, the usual layout).
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
                    seed: Long): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val rank = md5(concat(lit(s"shuf$seed:"), col(idCol).cast("string")))
    // 15 hex chars = 60 bits: exact in a long for any engine's
    // hex-to-int path (16 chars could overflow the sign bit)
    val shard = conv(substring(col("__rank"), 1, 15), 16, 10)
      .cast("long") % nShards
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__rank"), col(idCol))
    df.withColumn("__rank", rank)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__rank")
  }

  /** PII scrub: replace emails then phone-number runs with typed
    * placeholder tokens. Patterns are RE2-compatible (no lookarounds)
    * so any engine reproduces them.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
      "\\+?[0-9][0-9()\\- ]{6,}[0-9]", "[PHONE]")

  /** Source-mix rebalancing plan: per source, its observed share of the
    * corpus and the resampling factor that would hit the requested
    * target share (factor > 1 = upsample, < 1 = downsample). The mix
    * decision is the planning half of dataset blending — one narrow
    * aggregation on the source key; the actual resample composes with
    * [[sampleStratified]]. Unspecified sources get target share 0.
    */
  def mixPlan(df: DataFrame, sourceCol: String,
              targetShares: Map[String, Double]): DataFrame = {
    // corpus total as a lazy one-row broadcast aggregate, not an eager
    // df.count(): at 100 TB an eager count serializes a full extra scan
    // into plan CONSTRUCTION; this way the total rides the same job
    val totalDf = df.agg(count(lit(1)).cast("double").as("__total"))
    val target = typedLit(targetShares)
    df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(totalDf))
      .withColumn("share", round(col("n_docs") / col("__total"), 4))
      .withColumn("target_share",
        round(coalesce(element_at(target, col(sourceCol)), lit(0.0)), 4))
      .withColumn("factor",
        round(coalesce(element_at(target, col(sourceCol)), lit(0.0)) /
          (col("n_docs") / col("__total")), 4))
      .drop("__total")
  }

  /** Temperature-flattened source mixing (the multilingual/multi-
    * source sampling rule of XLM-R / GPT-3 / Llama data recipes):
    * sampling share of source s ∝ (n_s/N)^exponent, exponent = 1/T —
    * T > 1 flattens the natural distribution toward uniform so
    * low-resource sources are up-sampled. Output per source:
    * natural share, flattened sampled share, the doc target for a
    * given budget, and `epochs` (target/n — > 1 means the source
    * repeats, the standard small-source trade-off surfaced rather
    * than hidden).
    *
    * One count aggregate (sources-sized frame) + a one-row total
    * broadcast — no document ever shuffles. exponent = 0.5 (T = 2,
    * the canonical setting) computes via sqrt, which is IEEE-exact on
    * every engine; other exponents use pow (libm-dependent at the
    * last ulp — fine for planning, but pin 0.5 where bit-replay
    * matters). Shares round to 6dp before the target arithmetic so
    * the plan is engine-replayable.
    */
  def temperatureMix(df: DataFrame, sourceCol: String,
                     exponent: Double, totalBudget: Long): DataFrame = {
    require(exponent > 0 && exponent <= 1, "exponent in (0, 1]")
    require(totalBudget > 0, "budget must be positive")
    val totalDf = df.agg(count(lit(1)).cast("double").as("__total"))
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(totalDf))
      .withColumn("share", round(col("n_docs") / col("__total"), 6))
      .withColumn("__w",
        if (exponent == 0.5) sqrt(col("share"))
        else pow(col("share"), exponent))
    val wSum = counts.agg(sum(col("__w")).as("__wsum"))
    counts.crossJoin(broadcast(wSum))
      .withColumn("sampled_share", round(col("__w") / col("__wsum"), 6))
      .withColumn("target_n",
        floor(col("sampled_share") * totalBudget + 0.5).cast("long"))
      .withColumn("epochs", round(col("target_n") / col("n_docs"), 4))
      .select(col(sourceCol), col("n_docs"), col("share"),
        col("sampled_share"), col("target_n"), col("epochs"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", simplified to
    * unigrams): per document, the mean token log-likelihood ratio
    * ln(p_target / p_raw), where p_raw is the corpus's own unigram
    * distribution and p_target is estimated from a (small) target-
    * domain sample with add-1/2 smoothing over the raw vocabulary
    * (unsmoothed p_raw is safe: every scored token occurs in the raw
    * corpus by construction). High weight = looks like the target
    * domain; feeds the resampling half via [[sampleStratified]] /
    * [[mixPlan]].
    *
    * Shuffle profile: tokens shuffle once for each frequency table
    * (16-byte-ish tokens + counts, never documents); the target table
    * and the two one-row totals broadcast; the per-doc score is one
    * re-aggregation of the exploded tokens.
    */
  def importanceWeights(df: DataFrame, textCol: String, idCol: String,
                        target: DataFrame, targetTextCol: String): DataFrame = {
    val tok: Column => Column = c => explode(split(lower(trim(c)), "\\s+"))
    val toks = df.select(col(idCol), tok(col(textCol)).as("__tok"))
    val rawFreq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__rf"))
    val tgtFreq = target.select(tok(col(targetTextCol)).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__tf"))
    // lazy one-row broadcasts: raw total + vocab, target total (the
    // eager-count trap again — totals must ride the job, not precede it)
    val rawTot = rawFreq.agg(sum(col("__rf")).cast("double").as("__rn"),
      count(lit(1)).cast("double").as("__v"))
    val tgtTot = tgtFreq.agg(sum(col("__tf")).cast("double").as("__tn"))
    toks.join(rawFreq, Seq("__tok"))
      .join(broadcast(tgtFreq), Seq("__tok"), "left")
      .crossJoin(broadcast(rawTot))
      .crossJoin(broadcast(tgtTot))
      .groupBy(col(idCol))
      .agg(
        round(avg(
          log((coalesce(col("__tf"), lit(0L)).cast("double") + 0.5) /
            (col("__tn") + col("__v") * 0.5)) -
          log(col("__rf") / col("__rn"))), 4).as("importance_weight"),
        count(lit(1)).cast("long").as("n_tokens"))
  }

  /** Decontamination: drop training docs whose normalized text exactly
    * matches an eval/benchmark document. Matching is by md5 of the
    * whitespace-normalized lowercase body, so the shuffle carries
    * 16-byte hashes, never text — and the eval side (benchmarks are
    * small) broadcasts. Returns the surviving training rows.
    */
  def decontaminate(train: DataFrame, eval_ : DataFrame,
                    textCol: String, evalTextCol: String): DataFrame = {
    val norm: Column => Column =
      c => md5(regexp_replace(lower(trim(c)), "\\s+", " "))
    val evalHashes = eval_.select(norm(col(evalTextCol)).as("__h")).distinct()
    train.withColumn("__h", norm(col(textCol)))
      .join(broadcast(evalHashes), Seq("__h"), "left_anti")
      .drop("__h")
  }

  /** Bloom-filter decontamination: the same normalized-exact-match
    * semantics as [[decontaminate]], but the eval membership set ships
    * as a constant-size Bloom sketch instead of a broadcast hash join
    * side — the right shape when the eval/blocklist side is millions
    * of entries (a raw broadcast set would be GBs; the sketch is MBs
    * and the train side stays a map-only scan, zero shuffle).
    *
    * Bloom guarantees no false negatives, so every truly contaminated
    * doc is dropped; false positives over-drop clean docs at rate <=
    * `fpp`. Build is a distributed treeAggregate (stat.bloomFilter);
    * the one eager count is on the SMALL eval side only, to size the
    * sketch.
    */
  def decontaminateBloom(train: DataFrame, eval_ : DataFrame,
                         textCol: String, evalTextCol: String,
                         fpp: Double = 1e-3): DataFrame = {
    val norm: Column => Column =
      c => md5(regexp_replace(lower(trim(c)), "\\s+", " "))
    val evalHashes = eval_.select(norm(col(evalTextCol)).as("__h")).distinct()
    val bf = evalHashes.stat.bloomFilter("__h", math.max(evalHashes.count(), 1L), fpp)
    val bc = train.sparkSession.sparkContext.broadcast(bf)
    // scalar probe against the broadcast sketch — a UDF by necessity
    // (no Catalyst surface takes a prebuilt sketch), but it is one
    // hash-probe per row with no data movement
    val might = udf((h: String) => bc.value.mightContainString(h))
    train.filter(!might(norm(col(textCol))))
  }

  /** Semantic decontamination: drop training rows whose EMBEDDING has
    * cosine >= `threshold` to any eval/benchmark embedding — catches
    * paraphrased contamination that the exact/n-gram filters miss
    * (the modern complement; cf. the paraphrase-contamination findings
    * around GSM-style benchmarks). The eval side broadcasts (benchmarks
    * are small), so the plan is a broadcast nested-loop ANTI join:
    * the train side stays a single map-shaped scan with a per-row loop
    * over the broadcast eval vectors — the same 100-TB posture as
    * [[decontaminateBloom]], with vector math in the codegen
    * dot/norm expressions.
    */
  def decontaminateSemantic(train: DataFrame, evalEmb: DataFrame,
                            vecCol: String, evalVecCol: String,
                            threshold: Double): DataFrame = {
    import Similarity.{dot, norm}
    val ev = broadcast(
      evalEmb.select(col(evalVecCol).as("__ev"))
        .withColumn("__en", norm(col("__ev"))))
    train.join(ev,
      Similarity.safeCosine(dot(col(vecCol), col("__ev")),
        norm(col(vecCol)), col("__en")) >= threshold,
      "left_anti")
  }

  /** N-gram decontamination (the GPT-3-style overlap filter): drop
    * training docs sharing ANY word n-gram with the eval set — catches
    * partial/embedded contamination exact matching misses. Eval n-grams
    * (benchmarks are small) broadcast as a distinct set; training docs
    * explode to (id, gram), semi-join the set, and the contaminated ids
    * anti-join back. Docs shorter than n words fall back to whole-text
    * n-grams (word_shingles' short-doc rule), i.e. exact matching.
    */
  def decontaminateNgram(train: DataFrame, eval_ : DataFrame,
                         textCol: String, evalTextCol: String,
                         idCol: String, n: Int = 13): DataFrame = {
    val evalGrams = eval_
      .select(explode(Dedup.shingles(col(evalTextCol), n)).as("__g")).distinct()
    val contaminated = train
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("__g"))
      .join(broadcast(evalGrams), Seq("__g"), "left_semi")
      .select(col(idCol)).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** N-gram decontamination with the eval grams as a Bloom sketch —
    * for eval/blocklist sets whose GRAM inventory is too large to
    * broadcast raw (a 10M-item benchmark suite easily carries 10^9
    * distinct 13-grams; the raw broadcast set is tens of GB, the
    * sketch is tens of MB). Same drop semantics as
    * [[decontaminateNgram]]; the train side stays a map-side gram
    * explode + constant-size probe, then an id-only distinct and
    * anti-join — text never shuffles.
    *
    * `fpp` defaults two orders tighter than the doc-level sketch
    * ([[decontaminateBloom]]): a doc is over-dropped if ANY of its
    * grams false-positives, so the per-doc FP rate compounds to
    * ~ grams-per-doc x fpp. At 1e-6 a 1000-gram doc still sits at
    * 1e-3 over-drop probability; no false NEGATIVES ever (every truly
    * contaminated doc is dropped).
    *
    * Sizing honesty: a Bloom sketch costs ~ln(1/fpp)/ln(2)^2 bits per
    * gram — ~29 bits at 1e-6, so 10^9 eval grams is a ~3.6 GB
    * broadcast vs ~100 GB of raw 13-gram strings (~28x, not
    * unbounded). If the sketch itself would strain the driver, raise
    * fpp (pay over-drops) or shard the eval set into several sketches
    * probed in sequence.
    */
  def decontaminateNgramBloom(train: DataFrame, eval_ : DataFrame,
                              textCol: String, evalTextCol: String,
                              idCol: String, n: Int = 13,
                              fpp: Double = 1e-6): DataFrame = {
    val evalGrams = eval_
      .select(explode(Dedup.shingles(col(evalTextCol), n)).as("__g")).distinct()
      // persisted across the two actions below: sizing count + sketch
      // build would otherwise each re-run the full explode + distinct
      .persist()
    val bf =
      try evalGrams.stat.bloomFilter("__g",
        math.max(evalGrams.count(), 1L), fpp)
      finally evalGrams.unpersist()
    val bc = train.sparkSession.sparkContext.broadcast(bf)
    val might = udf((g: String) => bc.value.mightContainString(g))
    val contaminated = train
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("__g"))
      .filter(might(col("__g")))
      .select(col(idCol)).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Fuzzy (near-duplicate) decontamination: drop training docs whose
    * word-`k`-shingle Jaccard similarity to ANY eval/benchmark doc is
    * >= `threshold` — the overlap the exact-hash and 13-gram filters
    * both miss when a benchmark item was lightly edited before leaking
    * into the crawl (the MinHash-based decontamination pass of modern
    * open-data pipelines, e.g. Dolma's benchmark overlap removal).
    *
    * Shape: minhash signatures on both sides (codegen
    * [[graft.functions.TextHashExpressions.MinHashSignature]]),
    * slot-value equi-join against the BROADCAST eval side (eval sets
    * are small), exact-Jaccard verification of the candidates, then an
    * anti-join back — so the train corpus contributes one map-shaped
    * signature pass + a broadcast probe, and text never shuffles.
    *
    * Recall knob: candidates are docs sharing >= 1 of `numHashes`
    * minhash slots with an eval doc (banding with r = 1). Miss
    * probability for a true pair at Jaccard J is (1-J)^numHashes —
    * at the defaults (J >= 0.5, 20 hashes) under 1e-6. r = 1 trades
    * more exact verifications for that recall, which is the right
    * trade ONLY because the verify side is the small eval set; the
    * corpus-vs-corpus near-dup path ([[Dedup.minhashNearDups]]) keeps
    * banded r >= 2.
    */
  def decontaminateFuzzy(train: DataFrame, eval_ : DataFrame,
                         textCol: String, evalTextCol: String,
                         idCol: String, threshold: Double = 0.5,
                         k: Int = 5, numHashes: Int = 20): DataFrame = {
    import graft.functions.TextHashExpressions.{jaccard_sets, minhash_signature}
    // slot rows carry (id, slot, value) ONLY — keeping the shingle
    // array alongside the posexplode would copy it into each of the
    // numHashes output rows (a ~20x map-side byte amplification);
    // candidate pairs are distinct (train id, eval id), so the exact
    // verify runs once per pair, not once per matching slot
    val trainSh = train.select(col(idCol),
      Dedup.shingles(col(textCol), k).as("__sh"))
    val trainSlots = trainSh
      .select(col(idCol), posexplode(minhash_signature(col("__sh"), numHashes)))
      .select(col(idCol), col("pos").as("__p"), col("col").as("__v"))
    val evalSh = eval_.select(col(evalTextCol).as("__etxt")).distinct()
      .select(md5(col("__etxt")).as("__eid"),
        Dedup.shingles(col("__etxt"), k).as("__esh"))
    val evalSlots = evalSh
      .select(col("__eid"), posexplode(minhash_signature(col("__esh"), numHashes)))
      .select(col("__eid"), col("pos").as("__p"), col("col").as("__v"))
    val candPairs = trainSlots
      .join(broadcast(evalSlots), Seq("__p", "__v"))
      .select(col(idCol), col("__eid")).distinct()
    val contaminated = candPairs
      .join(trainSh, Seq(idCol))
      .join(broadcast(evalSh), Seq("__eid"))
      .filter(jaccard_sets(col("__sh"), col("__esh")) >= threshold)
      .select(col(idCol)).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Contamination evidence report — the audit half of n-gram
    * decontamination: for every (train doc, eval doc) pair sharing at
    * least one word `n`-gram, the number of distinct shared grams.
    * Real pipelines run this BEFORE dropping anything: it attributes
    * each hit to the benchmark item that caused it, separates
    * one-gram coincidences from wholesale leaks, and gives reviewers
    * something to eyeball. Train docs that are themselves eval
    * members are excluded via `evalIds` (reporting a benchmark
    * against itself is noise).
    *
    * Shape: per-doc distinct grams on both sides, gram equi-join with
    * the eval side broadcast, then one (train, eval) count — grams
    * shuffle as strings once; text never does.
    */
  def contaminationReport(train: DataFrame, eval_ : DataFrame,
                          textCol: String, evalTextCol: String,
                          idCol: String, evalIdCol: String,
                          n: Int = 13): DataFrame = {
    // grams travel as 16-byte md5 digests, never 13-gram strings (the
    // noveltyBySource convention): the gram equi-join's shuffle drops
    // ~6× in width and the md5-keyed match is the same pair set the
    // raw-string join produces (128-bit digests; the window_hashes128
    // md5-equivalence posture — a collision would need 2^64 grams)
    val evalGrams = eval_.select(col(evalIdCol).as("eval_id"),
      explode(Dedup.shingles(col(evalTextCol), n)).as("__g"))
      .select(col("eval_id"), unhex(md5(col("__g"))).as("__h"))
    val evalIds = eval_.select(col(evalIdCol).as("__eid")).distinct()
    train
      .join(broadcast(evalIds), col(idCol) === col("__eid"), "left_anti")
      .select(col(idCol).as("train_id"),
        explode(Dedup.shingles(col(textCol), n)).as("__g"))
      .select(col("train_id"), unhex(md5(col("__g"))).as("__h"))
      // no broadcast hint on the GRAM side: its volume scales with the
      // eval set (13-gram digests), so the size-checked planner/AQE
      // must keep the right to shuffle it — a forced broadcast would
      // bypass autoBroadcastJoinThreshold and OOM the driver on a
      // large benchmark suite
      .join(evalGrams, Seq("__h"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Span-level decontamination — the surgical variant of the
    * drop-whole-doc filters: EXCISE every k-token window of a train
    * doc that appears verbatim anywhere in the eval set, keep the
    * rest of the doc (the Lee et al. 2022 ExactSubstr machinery
    * pointed across the train/eval boundary instead of within the
    * corpus — what you want when a long doc quotes one benchmark item
    * but the other 99% of it is good training signal).
    *
    * Shape: train windows travel as (id, md5); the eval window-hash
    * set broadcasts (benchmarks are small); matched starts per doc
    * feed the same native one-pass reassembly as
    * [[Dedup.removeDuplicateSpans]]
    * ([[graft.functions.SpanRemoveExpressions]]), so text never
    * shuffles and no interpreted lambdas run. Docs under k tokens
    * have no window and pass through untouched. Returns
    * (id, clean_text, n_tokens, n_removed) over the normalized
    * token stream, like the in-corpus remover.
    */
  def decontaminateSpans(train: DataFrame, eval_ : DataFrame,
                         textCol: String, evalTextCol: String,
                         idCol: String, k: Int = 13): DataFrame = {
    require(k > 0, "window must be positive")
    val toks = train.select(col(idCol),
      split(lower(trim(col(textCol))), "\\s+").as("__toks"))
    val wins = Dedup.spanWindows(train, textCol, idCol, k)
    val evalHashes = Dedup
      .spanWindows(eval_.select(col(evalTextCol)).withColumn("__eid", lit(0L)),
        evalTextCol, "__eid", k)
      .select(col("__h")).distinct()
    val hitStarts = wins
      .join(broadcast(evalHashes), Seq("__h"), "left_semi")
      .select(col(idCol), col("__start"))
    Dedup.exciseSpans(toks, hitStarts, idCol, k)
  }

  /** N-gram novelty by source: rank sources in lexicographic order
    * and attribute every distinct corpus gram to the FIRST source
    * containing it; per source, report its distinct-gram count and
    * how many grams it contributes that no earlier source has. The
    * marginal-diversity curve data buyers actually look at — a source
    * whose `n_new_grams` is a sliver of `n_grams` duplicates what the
    * mix already covers and earns its tokens back as dedup losses.
    *
    * Shape: grams are md5-hashed BEFORE the shuffle (16-byte binary
    * keys, never gram text), and the whole curve comes out of ONE
    * gram-hash aggregation. Sources are a catalog-sized set (a mix
    * has tens of sources, not millions), so each source gets a bit in
    * a long: per gram hash, `bit_or` of the source bits + `min` of
    * the source ids — both primitive-buffer aggregates that partially
    * combine map-side — then a single-row aggregate sums each
    * source's membership bit and first-owner count. The round-13
    * formulation paid TWO full gram-stream shuffles (a
    * (source, hash) distinct plus a separate min-per-hash pass) and
    * exploded + hashed the corpus twice; this pays one explode and
    * one shuffle. Sources beyond 62 fall back to the two-aggregation
    * plan (same results, one extra shuffle).
    */
  def noveltyBySource(df: DataFrame, textCol: String, sourceCol: String,
                      n: Int = 5): DataFrame = {
    val spark = df.sparkSession
    // the source VOCABULARY is catalog-sized by construction, and the
    // collect is HARD-BOUNDED regardless: LIMIT 63 fetches just enough
    // rows to decide the plan — 63 distinct sources proves the >62
    // fallback applies (which needs no driver-side source list at
    // all), so an unexpectedly high-cardinality source column can
    // never balloon the driver. Lexicographic ids make
    // min(id) ≡ min(source). NULL sources carry no curve row on
    // EITHER plan (documented contract, not an accident of one
    // branch): a source label is catalog metadata, and unattributed
    // docs have no place on a marginal-diversity curve keyed by it.
    val srcs = df.select(col(sourceCol).cast("string").as("source"))
      .filter(col("source").isNotNull)
      .distinct().orderBy(col("source")).limit(63).collect().map(_.getString(0))
    val grams0 = df.select(col(sourceCol).cast("string").as("source"),
        explode(Dedup.shingles(col(textCol), n)).as("__g"))
      .filter(col("source").isNotNull)
    if (srcs.isEmpty) {
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_grams",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("n_new_grams",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }
    if (srcs.length > 62) {
      // 63 fetched under LIMIT 63 = more than 62 exist: two hash-key
      // aggregations over the distinct (source, hash) pair set —
      // still no windows, no global sorts, no driver-side source list
      val grams = grams0.select(col("source"),
        unhex(md5(col("__g"))).as("__h")).distinct().localCheckpoint()
      val perSource = grams.groupBy(col("source"))
        .agg(count(lit(1)).as("n_grams"))
      val novel = grams.groupBy(col("__h"))
        .agg(min(col("source")).as("source"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_new_grams"))
      return perSource.join(novel, Seq("source"), "left")
        .na.fill(0L, Seq("n_new_grams"))
    }
    val sid = srcs.tail.zipWithIndex.foldLeft(
      when(col("source") === srcs.head, lit(0))) {
      case (acc, (s, i)) => acc.when(col("source") === s, lit(i + 1))
    }
    val masks = grams0
      .select(sid.as("__sid"), unhex(md5(col("__g"))).as("__h"))
      .groupBy(col("__h"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), __sid)")).as("__mask"),
        min(col("__sid")).as("__first"))
    val aggCols = srcs.indices.flatMap(i => Seq(
      coalesce(sum(shiftright(col("__mask"), i).bitwiseAND(lit(1L))),
        lit(0L)).as(s"__g$i"),
      coalesce(sum(when(col("__first") === i, 1L).otherwise(0L)),
        lit(0L)).as(s"__n$i")))
    // single-row wide aggregate → exploded back to one row per source
    // (lazy end to end; a source whose docs produced no grams
    // contributes no curve row — the gram stream never saw it, which
    // matches the pair-set formulation and the oracle)
    masks.agg(aggCols.head, aggCols.tail: _*)
      .select(explode(array(srcs.indices.map(i =>
        struct(lit(srcs(i)).as("source"),
          col(s"__g$i").as("n_grams"),
          col(s"__n$i").as("n_new_grams"))): _*)).as("__r"))
      .select(col("__r.*"))
      .filter(col("n_grams") > 0)
  }
}
