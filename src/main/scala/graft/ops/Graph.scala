package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank (Brin & Page 1998) as the engine's
  * iterative-computation representative: each iteration is ONE edge
  * equi-join on the current rank vector plus one destination
  * aggregation — the canonical Spark formulation (the GraphX Pregel
  * kernel lowers to the same join-agg pair).
  *
  * Scale shape per iteration: ranks (|V| rows) hash-join edges (|E|
  * rows) on src — both sides partitioned by the join key, so with
  * ranks and edges co-partitioned the join reuses one exchange — then
  * a groupBy(dst) sum (map-side partial). Dangling mass (nodes with
  * no out-edges) is a one-row aggregate broadcast into the update, so
  * the sink-handling adds no per-edge work. Each iteration's rank
  * vector is consumed TWICE (dangling aggregate + contribution join),
  * so the loop truncates lineage with a localCheckpoint per round —
  * without it the un-materialized rank plan re-embeds every earlier
  * iteration once per consumer and recompute grows exponentially in
  * `iters` (the standard iterative-algorithm failure mode on lazy
  * DAGs). Edges and degrees materialize once for the same reason.
  *
  * Determinism: per-iteration ranks are rounded to 8dp so the
  * floating-point sum-order wobble (~1e-15) can't accumulate across
  * iterations; any engine replaying the same rounded recurrence
  * agrees to well beyond the surfaced 6dp.
  */
object Graph {

  /** THE single entry point for the reliable-checkpoint knob shared
    * by every iterative loop here ([[pageRank]], [[labelPropagation]],
    * [[shortestPaths]], [[kCorePeel]]): returns the per-round lineage
    * pin. Default (None) pins with `localCheckpoint` — executor-
    * memory blocks, fast in local[N], but NOT recomputable after
    * executor loss. With a reliable dir (HDFS/object store) the pin
    * is `checkpoint()`: blocks go to the checkpoint filesystem and
    * survive failures — the cluster-grade option for long runs, at a
    * write+read per round.
    *
    * CAVEAT (Spark API limit, documented ONCE here): the checkpoint
    * dir is a GLOBAL SparkContext setting — it persists after the
    * call, and two concurrent jobs passing different dirs race to
    * set it. Pass one application-wide dir, and clean it up yourself
    * (Spark only auto-deletes under
    * spark.cleaner.referenceTracking.cleanCheckpoints=true).
    */
  private def withCheckpointDir(edges: DataFrame,
                                checkpointDir: Option[String]): DataFrame => DataFrame = {
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    df => if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
  }

  /** Edge-row threshold above which the loops AUTO-select reliable
    * (disk) checkpointing when the caller gave no explicit dir:
    * `localCheckpoint` blocks live in executor memory, and pinning a
    * 100M-row edge table per run is a heap bomb (the sf10 bench needed
    * a 64 GB driver heap before this guard existed). Below it,
    * executor-memory pins stay the faster choice.
    */
  private[graft] val reliableEdgeThreshold: Long = 25L * 1000 * 1000

  /** Memoized per-JVM auto checkpoint dir: created lazily the first
    * time an edge set crosses [[reliableEdgeThreshold]] with no
    * explicit dir, deleted at JVM exit. One dir per JVM because
    * `setCheckpointDir` is GLOBAL to the SparkContext (the
    * [[withCheckpointDir]] caveat) — churning it per call would race.
    * A real cluster passes `checkpointDir` explicitly (HDFS/object
    * store); the auto dir is the local-disk fallback that keeps big
    * single-node runs inside a default heap.
    */
  private val autoCkptDir =
    new java.util.concurrent.atomic.AtomicReference[String](null)
  private def autoDir(): String =
    autoCkptDir.updateAndGet { d =>
      if (d != null) d
      else {
        val p = java.nio.file.Files.createTempDirectory("graft_ckpt")
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          try java.nio.file.Files.walk(p)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
          catch { case _: Exception => () }))
        p.toString
      }
    }

  /** The per-round lineage pin, sized by the DATA: explicit dir →
    * reliable; no dir but `edgeRows` over [[reliableEdgeThreshold]] →
    * reliable into a dir the loop may USE but never CLOBBERS — an
    * application-set `sc.getCheckpointDir` wins, and the per-JVM
    * temp-dir fallback engages only in local mode (on a cluster a
    * driver-local `file://` path would scatter "reliable" checkpoint
    * blocks across executor-local disks — worse than the
    * `localCheckpoint` it replaces, so big cluster runs without a dir
    * keep `localCheckpoint` and should pass `checkpointDir`
    * explicitly); small → `localCheckpoint`.
    */
  private def pinner(spark: org.apache.spark.sql.SparkSession,
                     checkpointDir: Option[String],
                     edgeRows: Long): DataFrame => DataFrame = {
    val sc = spark.sparkContext
    val dir = checkpointDir.orElse {
      if (edgeRows >= reliableEdgeThreshold) {
        val existing = sc.getCheckpointDir
        if (existing.isDefined) existing
        else if (sc.isLocal) Some(autoDir())
        else None
      } else None
    }
    // set only when it differs — never churn (or reset) a dir the
    // application already configured
    dir.filterNot(sc.getCheckpointDir.contains)
      .foreach(sc.setCheckpointDir)
    df => if (dir.isDefined) df.checkpoint() else df.localCheckpoint()
  }

  /** Node-count bound for the broadcast-iteration regime of
    * [[rankLoop]]: below it the per-round rank vector broadcasts
    * (~24 B/row → ≤ ~200 MB at the bound, well inside executor
    * budgets); above it iterations fall back to the co-partitioned
    * shuffle plan. An approximate count decides (HLL ±2%, either side
    * of the boundary is a sound plan — only cost changes).
    */
  private[graft] val broadcastNodeLimit: Long = 8L * 1000 * 1000

  /** Node-count bound for [[degreeAssortativity]]'s forced-broadcast
    * degree vector. Deliberately SMALLER than [[broadcastNodeLimit]]:
    * the rank loop broadcasts its vector once per iteration into a
    * plan that holds one hashed relation at a time, while
    * assortativity builds TWO hashed degree relations (degA, degB)
    * live simultaneously — at ~48 B/entry hashed that is ~2×190 MB at
    * 4M nodes, the most a default executor heap should carry for a
    * hint that OVERRIDES the 10 MB autoBroadcastJoinThreshold. Past
    * the bound the joins fall back to shuffles (the honest web-scale
    * price).
    */
  private[graft] val assortativityBroadcastLimit: Long = 4L * 1000 * 1000

  /** Edge-row floor below which the loops SKIP the whole co-partition/
    * cache/loop-conf machinery: on a small graph the fixed setup
    * (cache materializations, AQE-coalesce hold-off, p-partition tiny
    * tasks) costs more than every shuffle it saves — measured 1.8 s →
    * 5.6 s on the sf0.1 HITS entry before this gate. Small graphs run
    * the simple plan (per-iteration shuffles of tiny tables under
    * normal AQE); the scale machinery engages exactly when the data
    * would pay for it.
    */
  private[graft] val coPartitionThreshold: Long = 2L * 1000 * 1000

  /** Shuffle-partition count for an iterative loop, scaled with |E|
    * (~2M edge rows per partition) instead of pinned to the session
    * default (= core count in the bench harness): the core-count
    * default is a partition-size time bomb at 100× — a 100B-edge run
    * at 32 partitions is 3B rows per partition. Floor = the session
    * setting (never LOWER parallelism), cap 65536.
    */
  private def scaledPartitions(spark: org.apache.spark.sql.SparkSession,
                               edgeRows: Long): Int = {
    val base = spark.sessionState.conf.numShufflePartitions.toLong
    math.min(65536L, math.max(base, (edgeRows + 1999999L) / 2000000L)).toInt
  }

  /** Runs `body` with `spark.sql.shuffle.partitions` = `p` and AQE
    * partition coalescing OFF, restoring both after. The loops pin
    * eagerly inside, so every exchange they create is sized here; the
    * coalesce hold-off keeps the aggregate outputs at EXACTLY p
    * partitions so the co-partitioned joins below stay exchange-free
    * (a coalesced side would force a re-shuffle of the pinned side).
    *
    * CONCURRENCY CONTRACT: these are SESSION-level conf mutations —
    * any query submitted on the same SparkSession while a rank loop
    * runs executes under the loop's pinned settings, and two
    * concurrent loops race each other's save/restore. The rank APIs
    * assume single-threaded use of their session (the engine's
    * pattern throughout); callers needing concurrency should use
    * `spark.newSession()` per thread, which isolates the mutated
    * confs while sharing the SparkContext and cached data.
    */
  private def withLoopPartitions[A](spark: org.apache.spark.sql.SparkSession,
                                    p: Int)(body: => A): A = {
    val prevP = spark.conf.get("spark.sql.shuffle.partitions")
    val prevC = spark.conf
      .get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val prevJ = spark.conf
      .get("spark.sql.join.preferSortMergeJoin", "true")
    spark.conf.set("spark.sql.shuffle.partitions", p.toString)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // hash join, not sort-merge, inside the loop: the co-partitioned
    // iteration join would otherwise SORT the full cached edge table
    // EVERY round (the sort, not the join, dominated the sf10 profile)
    // — the build side is always a |V|-sized score vector, which fits
    // a per-partition hash map by construction
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    try body
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevP)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevC)
      spark.conf.set("spark.sql.join.preferSortMergeJoin", prevJ)
    }
  }

  /** Pre-computed sizing stats for an iterative graph run — the
    * catalog-metadata shape: a STORED edge table's row count and
    * per-side approximate node counts are ingestion-time facts (one
    * count + two HLL sketches over the table, computed once when the
    * table is built/registered), so a caller that stages its graph
    * passes them here and the loop skips its own sizing pass. Without
    * a hint the loop computes the same numbers itself (one scan).
    */
  final case class GraphSizing(edgeRows: Long, srcNodesApprox: Long,
                               dstNodesApprox: Long)

  /** Computes [[GraphSizing]] for an edge frame — the helper a staging
    * layer calls ONCE per stored table (one combined scan).
    */
  def sizingOf(edges: DataFrame, srcCol: String, dstCol: String): GraphSizing = {
    val r = edges.agg(count(lit(1)), approx_count_distinct(col(srcCol)),
      approx_count_distinct(col(dstCol))).head()
    GraphSizing(r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** (node, rank) after `iters` rounds of the damped recurrence
    * r(v) = (1-d)/N + d * (sum over in-edges u->v of r(u)/outdeg(u)
    *         + danglingMass/N).
    * `edges` rows are (srcCol, dstCol) pairs; duplicate edges count
    * once (the frame is distinct-ed). Nodes = src ∪ dst.
    *
    * `checkpointDir`: by default each iteration pins its rank vector
    * with `localCheckpoint` — executor-memory blocks, fast, but a
    * lost executor on a real cluster kills the job instead of
    * recomputing (lineage is truncated). For long cluster runs pass a
    * reliable checkpoint directory (HDFS/object store): iterations
    * then use `checkpoint()`, surviving executor loss at the cost of
    * a write+read per round.
    *
    * Threading: on large graphs the loop pins session confs for its
    * duration (see [[withLoopPartitions]]) — use one SparkSession (or
    * `spark.newSession()`) per concurrent rank call.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85,
               materialized: Boolean = false,
               checkpointDir: Option[String] = None,
               symmetric: Boolean = false,
               sizingHint: Option[GraphSizing] = None): DataFrame =
    rankLoop(edges, srcCol, dstCol, iters, damping, seeds = Nil,
      materialized, checkpointDir, symmetric = symmetric,
      sizingHint = sizingHint)

  /** Personalized PageRank (topic-sensitive, Haveliwala 2002): the
    * teleport distribution concentrates on `seeds` instead of being
    * uniform — r(v) measures proximity to the seed set, the standard
    * graph-proximity signal for recommendation ("customers related
    * to these") and seed-expansion labeling. Same per-iteration shape
    * as [[pageRank]]; dangling mass also returns to the seeds (the
    * teleport distribution, as in the standard formulation), so
    * total mass stays 1.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
                           dstCol: String, seeds: Seq[Long], iters: Int,
                           damping: Double = 0.85,
                           materialized: Boolean = false,
                           checkpointDir: Option[String] = None,
                           symmetric: Boolean = false,
                           sizingHint: Option[GraphSizing] = None): DataFrame = {
    require(seeds.nonEmpty, "need at least one seed")
    rankLoop(edges, srcCol, dstCol, iters, damping, seeds.distinct,
      materialized, checkpointDir, symmetric = symmetric,
      sizingHint = sizingHint)
  }

  /** Weighted PageRank: contributions flow proportionally to edge
    * weight over the source's total out-weight — r(v) = (1-d)/N +
    * d·(Σ_{u→v} r(u)·w(u,v)/W(u) + danglingMass/N). Parallel edges
    * collapse by SUMMING their weights (the multigraph convention);
    * non-positive/null weights are dropped. Same per-iteration
    * join-agg shape, rounding contract and checkpoint knob as
    * [[pageRank]] — the weight rides the edge row, so the only plan
    * difference is a sum-instead-of-count degree aggregate.
    */
  def weightedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                       weightCol: String, iters: Int,
                       damping: Double = 0.85,
                       materialized: Boolean = false,
                       checkpointDir: Option[String] = None,
                       symmetric: Boolean = false,
                       sizingHint: Option[GraphSizing] = None): DataFrame =
    rankLoop(edges, srcCol, dstCol, iters, damping, seeds = Nil,
      materialized, checkpointDir, weightCol = Some(weightCol),
      symmetric = symmetric, sizingHint = sizingHint)

  private def rankLoop(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int, damping: Double, seeds: Seq[Long],
                       materialized: Boolean = false,
                       checkpointDir: Option[String] = None,
                       weightCol: Option[String] = None,
                       symmetric: Boolean = false,
                       sizingHint: Option[GraphSizing] = None): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters in [1, 64]")
    val spark = edges.sparkSession
    // null endpoints carry no graph meaning and would otherwise
    // create a phantom null node on one side only.
    // Cost profile (measured at 30x): building + dedup'ing the edge
    // table dominates (one wide shuffle of every edge); each
    // iteration after that is an edges-ranks join + dst aggregation
    // at ~1/10th the build cost. So when several graph computations
    // share a graph, MATERIALIZE the deduped edge table once
    // (parquet/bucketed) and feed it here — construction is
    // ingestion-side work, exactly like a search index.
    // materialized = the caller hands a STORED table already deduped
    // (unweighted) / weight-collapsed ((src, dst) unique, w > 0)
    // (weighted), so the dedup/collapse shuffle is skipped.
    val shaped = weightCol match {
      case None =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
          .filter(col("src").isNotNull && col("dst").isNotNull)
      case Some(wc) =>
        // multigraph convention: parallel edges collapse by SUMMING
        // weights; non-positive weights carry no rank and are dropped.
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
            col(wc).cast("double").as("w"))
          .filter(col("src").isNotNull && col("dst").isNotNull &&
            col("w") > 0)
    }
    // ONE sizing pass computes |E| (upper bound pre-dedup) AND an
    // approximate node count: |E| sizes the shuffle-partition count
    // and the pin mode (disk past reliableEdgeThreshold); |V|~ picks
    // the ITERATION PLAN — see the broadcast-vs-shuffle regime choice
    // below. For the materialized path this is a cheap columnar scan
    // of the stored table; for a computed pipeline it is one extra
    // upstream pass, the price of sizing before materializing.
    val sizing = sizingHint.getOrElse(sizingOf(shaped, "src", "dst"))
    val eRows = sizing.edgeRows
    // |V| upper bound: a symmetric graph's two sides are the SAME set
    val vApprox =
      if (symmetric) math.max(sizing.srcNodesApprox, sizing.dstNodesApprox)
      else sizing.srcNodesApprox + sizing.dstNodesApprox
    val p = scaledPartitions(spark, eRows)
    val pin = pinner(spark, checkpointDir, eRows)
    // REGIME CHOICE (the knob that decides what shuffles per round):
    //   small |V| (fits a broadcast) → edges cached partitioned by
    //   DST, rank vector BROADCAST into the contribution join, and
    //   the dst aggregation is PARTITION-LOCAL: a zero-shuffle
    //   iteration. This is what kills the high-cardinality partial-agg
    //   trap: on a graph where |dst| ≈ |V|, map-side combine reduces
    //   nothing and the "one shuffle per round" moves ~|E| rows —
    //   measured 2.7× the weighted graph's cost at sf10 purely from
    //   that shuffle (the weighted graph's dst side is 16× smaller).
    //   big |V| (a 100-TB web graph) → broadcast is impossible; edges
    //   cache partitioned by SRC so the contribution join is
    //   exchange-free and the dst aggregation pays its honest shuffle.
    //   The broadcast regime only pays when the dst aggregate would
    //   NOT collapse map-side: with |dst| small (a bipartite
    //   customer→supplier graph), partial aggregation already reduces
    //   the shuffle to ~p×|dst| rows and the src-co-partitioned plan
    //   is strictly better (free outdeg, no per-round broadcast).
    // measurement override (graft.tools.RankAb's regime A/B): a
    // system property, not an env var, so one JVM can alternate
    // regimes rep-for-rep under identical host drift
    val smallV = sys.props.get("graft.rank.regime") match {
      case Some("broadcast") => true
      case Some("shuffle") => false
      case _ => vApprox <= broadcastNodeLimit &&
        2L * p * sizing.dstNodesApprox >= eRows
    }
    // below the threshold the machinery costs more than it saves —
    // simple plan, session confs untouched (AQE coalesces freely)
    val big = eRows >= coPartitionThreshold
    def inLoopConf[A](body: => A): A =
      if (big) withLoopPartitions(spark, p)(body) else body
    inLoopConf {
    // Co-partition the edge table by the contribution join key ONCE:
    // the cached copy is HashPartitioning(src, p), every iteration's
    // ranks vector is HashPartitioning(node, p) (deg's partitioning
    // survives the pin), and the dst aggregate lands on exactly p
    // partitions — so the steady-state iteration runs ONE shuffle
    // (the dst aggregation) instead of re-exchanging edges and ranks
    // every round. One edge shuffle per RUN, not per iteration.
    //
    // CACHE, not checkpoint, for the edges: their lineage is flat
    // (scan → repartition — no recursive plan to truncate), and
    // Dataset.persist stores COMPRESSED COLUMNAR batches that spill
    // to disk gracefully (MEMORY_AND_DISK) — a java-serialized
    // checkpoint of a ~90M-row edge table costs GBs of uncompressed
    // I/O re-read twice per iteration (measured materially slower at
    // sf10, SCALE.md). Only the RANK VECTORS, whose lineage grows per
    // round, need the checkpoint pin — and they are |V|-sized.
    val ded = weightCol match {
      case None =>
        if (materialized) shaped else shaped.distinct()
      case Some(_) =>
        if (materialized) shaped
        else shaped.groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    }
    val e =
      if (big) ded.repartition(p, col(if (smallV) "dst" else "src")).persist()
      else if (materialized) ded
      else pin(ded)
    // degree table (node, outdeg; 0 for sinks — the dangling set).
    // `symmetric` (a CALLER CONTRACT like `materialized`: every edge
    // present in both directions, so out-degree == in-degree == degree
    // and src-set == dst-set) lets the whole table come from ONE
    // aggregate on the cache's own partition key — zero extra
    // shuffles, and the node set IS the aggregate's key set. The
    // general path pays one grouping shuffle and a full-outer with the
    // other side's distinct (outdeg already enumerates distinct src,
    // so no separate 2|E| union-distinct pass exists on any path).
    // Pinned on the ITERATION key (node) so the per-round update join
    // reuses the partitioning.
    val zero = if (weightCol.isEmpty) lit(0L) else lit(0.0)
    val degKey = if (symmetric && smallV) "dst" else "src"
    val outdeg = weightCol match {
      case None => e.groupBy(col(degKey).as("src")).agg(count(lit(1)).as("outdeg"))
      case Some(_) => e.groupBy(col(degKey).as("src")).agg(sum(col("w")).as("outdeg"))
    }
    val deg = pin((
      if (symmetric)
        outdeg.select(col("src").as("node"), col("outdeg"))
      else {
        val dstN = e.select(col("dst")).distinct()
        dstN.join(outdeg, dstN("dst") === outdeg("src"), "full_outer")
          .select(coalesce(col("dst"), col("src")).as("node"),
            coalesce(col("outdeg"), zero).as("outdeg"))
      }).repartition(p, col("node")))
    val n = deg.count()
    require(n > 0, "empty graph")
    // teleport distribution: uniform 1/n (classic), or 1/|seeds| on
    // the seed set and 0 elsewhere (personalized) — a codegen row
    // expression, no seed join
    val tele: org.apache.spark.sql.Column =
      if (seeds.isEmpty) lit(1.0 / n)
      else when(col("node").isin(seeds.map(Long.box): _*),
        lit(1.0 / seeds.size)).otherwise(lit(0.0))
    val oneMinusD = 1.0 - damping

    // `symmetric` (round-16): every edge present in both directions is
    // the caller's contract, so EVERY node has an out-edge and the
    // dangling set is empty BY CONSTRUCTION — the per-iteration
    // dangling-mass aggregate (a |V|-row scan + one-row broadcast per
    // round) is identically 0.0 and is dropped from the plan. The
    // arithmetic is bit-identical: __in >= +0.0 always (sums of
    // non-negative shares), so `__in + 0.0 * tele == __in` exactly in
    // IEEE and the per-round round(.,8) sees the same operand.
    //
    // Round-16 measured NEGATIVE, kept for the record: with the
    // dangling reference gone, each iteration references the previous
    // vector exactly once (the share projection), so the small
    // symmetric regime COULD skip the eager pin and unroll the loop
    // as one lazy chain. graft.tools.RankLazyAb (same-JVM alternated
    // B,A,B,A at sf0.1, 3 blocks): lazy read 0.73× on q_pagerank /
    // 1.06× on q_pagerank_ppr vs the eager pin — no win, because each
    // per-iteration broadcast(share) still materializes its whole
    // sub-chain as its own broadcast-build job, so laziness saves no
    // job launches and pays deeper plans. Eager pins stay on every
    // path (`graft.rank.lazy=on` replays the lazy variant for
    // measurement only).
    val pinIter: DataFrame => DataFrame =
      if (sys.props.get("graft.rank.lazy").contains("on")) identity else pin
    var ranks = pinIter(deg.select(col("node"), col("outdeg"),
      round(tele, 8).as("rank")))
    for (_ <- 1 to iters) {
      // one-row dangling-mass aggregate, broadcast by construction
      // (general path only — see the symmetric contract note above;
      // graft.rank.dangling=keep replays the old always-aggregate
      // plan for same-JVM measurement, output identical: __dm ≡ 0)
      val skipDangling = symmetric &&
        !sys.props.get("graft.rank.dangling").contains("keep")
      val dangling =
        if (skipDangling) null
        else ranks.filter(col("outdeg") === 0)
          .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      // small-|V| regime: ranks broadcast, agg partition-local on the
      // dst-partitioned cache — ZERO shuffled rows per round. big-|V|:
      // co-partitioned join (no exchange), dst agg pays the shuffle.
      // UNWEIGHTED: the per-source share rank/outdeg is pre-divided on
      // the |V|-row vector (identical IEEE operands per source, so
      // sums are bit-identical to the per-edge division); sinks guard
      // the ANSI division with share 0 — they have no out-edges to
      // carry it anyway. WEIGHTED: pre-dividing would reorder the
      // per-edge term to (rank/outdeg)*w, which can differ from the
      // oracle's rank*w/outdeg by 1 ulp and flip the per-round
      // round(.,8) at a boundary — so the weighted path carries
      // (rank, outdeg) on the vector and divides PER EDGE in the
      // oracle's exact operand order (a joined src always has
      // outdeg > 0: its own w > 0 edges sum into it).
      val share = weightCol match {
        case None => ranks.select(col("node"),
          when(col("outdeg") > 0, col("rank") / col("outdeg"))
            .otherwise(lit(0.0)).as("__share"))
        case Some(_) =>
          ranks.select(col("node"), col("rank").as("__r"),
            col("outdeg").as("__od"))
      }
      val rhs = if (smallV) broadcast(share) else share
      val contribs = e.join(rhs, e("src") === rhs("node"))
        .groupBy(col("dst"))
        .agg((weightCol match {
          case None => sum(col("__share"))
          case Some(_) => sum(col("__r") * col("w") / col("__od"))
        }).as("__in"))
      val joined = deg.join(contribs, deg("node") === contribs("dst"), "left")
      ranks = pinIter(
        if (skipDangling)
          joined.select(col("node"), col("outdeg"),
            round(lit(oneMinusD) * tele + lit(damping) *
              coalesce(col("__in"), lit(0.0)), 8)
              .as("rank"))
        else
          joined.crossJoin(broadcast(dangling))
            .select(col("node"), col("outdeg"),
              round(lit(oneMinusD) * tele + lit(damping) *
                (coalesce(col("__in"), lit(0.0)) + col("__dm") * tele), 8)
                .as("rank")))
    }
    // final ranks are pinned (eager) — the edge cache is no longer
    // referenced by the returned plan and must not outlive the call
    if (big) e.unpersist(blocking = false)
    ranks.select(col("node"), col("rank"))
    }
  }

  /** Canonical undirected edge set: (a, b) with a < b, self-loops and
    * nulls dropped, duplicates (either direction) collapsed.
    */
  /** HITS hubs & authorities (Kleinberg 1999, "Authoritative sources
    * in a hyperlinked environment"): `iters` rounds of the alternating
    * recurrence over the DIRECTED distinct edge set —
    *   a(v) = Σ_{u→v} h(u),  a ← a/|a|₂;
    *   h(u) = Σ_{u→v} a(v),  h ← h/|h|₂
    * from the uniform hub start h₀ = 1/sqrt(|srcs|). The
    * bibliometric dual of [[pageRank]]: hubs point at good
    * authorities, authorities are pointed at by good hubs — on a
    * bipartite interaction graph (orders→parts, users→documents) the
    * two sides get independently meaningful scores.
    *
    * Scale shape per half-step: ONE edges⋈scores equi-join plus one
    * destination aggregation (map-side partial) — the [[pageRank]]
    * join-agg kernel — and the L2 norm is a one-row aggregate
    * broadcast into the rescale. Score vectors pin per round (the
    * [[withCheckpointDir]] knob). Determinism: normalized scores
    * round to 8dp per half-step (the rounded-recurrence contract);
    * surfaced values are 6dp.
    *
    * Output: (node, hub 6dp, authority 6dp) — full outer over the
    * two roles; a node with no out-edges scores hub 0.0 (it lends no
    * endorsement), one with no in-edges authority 0.0 (it receives
    * none) — the limit values of the recurrence, not missing data.
    *
    * `materialized = true` declares the input a STORED, already
    * distinct (src, dst) table (the [[pageRank]] staged-edge
    * contract): the dedup exchange and the edge pin are skipped —
    * re-scanning a columnar table twice per iteration beats
    * writing+reading an executor-memory copy of it.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
           materialized: Boolean = false,
           checkpointDir: Option[String] = None,
           sizingHint: Option[GraphSizing] = None): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters in [1, 64]")
    val spark = edges.sparkSession
    val e0 = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    // |E| sizes the scale knobs (the rankLoop contract): partition
    // count tracks the data, pins go to disk past the threshold
    val eRows = sizingHint.map(_.edgeRows).getOrElse(e0.count())
    val p = scaledPartitions(spark, eRows)
    val pin = pinner(spark, checkpointDir, eRows)
    val big = eRows >= coPartitionThreshold
    def inLoopConf[A](body: => A): A =
      if (big) withLoopPartitions(spark, p)(body) else body
    inLoopConf {
    // the edge table is consumed on BOTH keys each iteration (src for
    // the hub step, dst for the authority step) — cache one
    // co-partitioned copy per key so the alternating matvec never
    // re-exchanges edges: two edge shuffles per RUN instead of two
    // per ITERATION. Cache (compressed columnar, spills to disk),
    // not checkpoint: edge lineage is flat, only the per-round score
    // vectors need the truncation pin (the rankLoop rationale).
    val ded = if (materialized) e0 else e0.distinct()
    val (eS, eD) =
      if (big) {
        val s0 = ded.repartition(p, col("src")).persist()
        (s0, s0.repartition(p, col("dst")).persist())
      } else {
        val s0 = if (materialized) ded else pin(ded)
        (s0, s0)
      }
    val q8 = (c: Column) => Quantize.q(c, 8)
    val nSrc = eS.select(col("src")).distinct().count()
    require(nSrc > 0, "empty edge set")
    var h = eS.select(col("src").as("node")).distinct()
      .select(col("node"), lit(Quantize.qd(1.0 / math.sqrt(nSrc), 8)).as("s"))
    var a: DataFrame = null
    def normalized(raw: DataFrame): DataFrame = {
      val nrm = raw.agg(sqrt(sum(col("__v") * col("__v"))).as("__n"))
      pin(raw.crossJoin(broadcast(nrm))
        .select(col("node"), q8(col("__v") / col("__n")).as("s")))
    }
    for (_ <- 1 to iters) {
      a = normalized(eS.join(h, eS("src") === h("node"))
        .groupBy(eS("dst").as("node")).agg(sum(col("s")).as("__v")))
      h = normalized(eD.join(a.select(col("node").as("__an"), col("s")),
          eD("dst") === col("__an"))
        .groupBy(eD("src").as("node")).agg(sum(col("s")).as("__v")))
    }
    // h and a are pinned (eager) — the edge caches must not outlive
    // the call
    if (big) { eS.unpersist(blocking = false); eD.unpersist(blocking = false) }
    h.select(col("node"), col("s").as("__h"))
      .join(a.select(col("node"), col("s").as("__a")), Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(Quantize.q(col("__h"), 6), lit(0.0)).as("hub"),
        coalesce(Quantize.q(col("__a"), 6), lit(0.0)).as("authority"))
    }
  }

  private def canonicalEdges(edges: DataFrame, srcCol: String,
                             dstCol: String): DataFrame =
    edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .filter(col("__s").isNotNull && col("__d").isNotNull &&
        col("__s") =!= col("__d"))
      .select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"))
      .distinct()

  /** Per-node triangle participation counts over an undirected graph
    * — (node, n_triangles) for every node, 0 for triangle-free nodes.
    * The clustering signal of a co-occurrence graph (a node's
    * triangles are its neighbors that also know each other).
    *
    * Scale shape — the degree-ordered wedge join (Suri &
    * Vassilvitskii 2011's MR algorithm; Cohen 2009): edges are
    * ORIENTED from the lower-(degree, id) endpoint to the higher, and
    * wedges are enumerated only from each triangle's lowest-ranked
    * vertex. Oriented out-degree is bounded by O(sqrt(|E|)) for ANY
    * degree distribution — a hub of degree d contributes wedges only
    * through its (few) higher-ranked neighbors, so the join never
    * explodes quadratically on hot nodes the way a naive
    * common-neighbor self-join does. Three equi-joins total (wedge
    * build + closing-edge check), all on node/edge keys; counts are
    * exact integers, so any engine replays them bit-for-bit.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String,
                     sizingHint: Option[GraphSizing] = None): DataFrame = {
    val pin = trianglePin(edges, sizingHint)
    val e = pin(canonicalEdges(edges, srcCol, dstCol))
    triangleCountsOn(e, degreesOf(e), pin)
  }

  /** Pin strategy for the triangle/clustering family from catalog
    * sizing (the rank-loop consumption, task-7 round 15): a declared
    * edge table's row count decides memory vs disk checkpointing for
    * the TWO edge-sized pins these kernels make (canonical set +
    * oriented set) — pinning 2× a 100M-row edge table in executor
    * memory is the same heap bomb [[reliableEdgeThreshold]] guards in
    * the rank loops. No hint = the status quo local pin.
    */
  private def trianglePin(edges: DataFrame,
                          sizingHint: Option[GraphSizing]): DataFrame => DataFrame =
    pinner(edges.sparkSession, None,
      sizingHint.map(_.edgeRows).getOrElse(0L))

  /** Degrees of a canonical (a < b, deduped) edge set. */
  private def degreesOf(e: DataFrame): DataFrame =
    e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** Wedge-join kernel over an ALREADY canonical, already pinned edge
    * set with its degree table — so [[clusteringCoefficient]] (which
    * needs both anyway) doesn't re-canonicalize, re-pin, and
    * re-aggregate degrees a second time inside this call.
    */
  private def triangleCountsOn(e: DataFrame, deg: DataFrame,
                               pin: DataFrame => DataFrame = _.localCheckpoint()
                              ): DataFrame = {
    // orient by (deg, node) rank: lower -> higher
    val withDeg = e
      .join(deg.select(col("node").as("a"), col("deg").as("__da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("__db")), Seq("b"))
    val oriented0 = withDeg.select(
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")),
          struct(col("a").as("lo"), col("b").as("hi")))
          .otherwise(struct(col("b").as("lo"), col("a").as("hi")))
          .as("__o"))
      .select(col("__o.lo").as("lo"), col("__o.hi").as("hi"))
    val oriented = pin(oriented0)
    // wedges from the lowest-ranked vertex x: (x->y1), (x->y2); the
    // closing edge y1-y2 is checked against the CANONICAL set (its
    // orientation relative to y1/y2 is unknown, their ids are not)
    val o2 = oriented.select(col("lo").as("lo2"), col("hi").as("hi2"))
    val wedges = oriented.join(o2, col("lo") === col("lo2"))
      .filter(col("hi") < col("hi2"))
      .select(col("lo").as("x"),
        col("hi").as("y1"), col("hi2").as("y2"))
    val tris = wedges.join(e,
      least(col("y1"), col("y2")) === col("a") &&
        greatest(col("y1"), col("y2")) === col("b"))
    val perNode = tris
      .select(explode(array(col("x"), col("y1"), col("y2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.select(col("node"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Local clustering coefficient: for every node of degree >= 2,
    * 2 * triangles / (deg * (deg - 1)) — the fraction of a node's
    * neighbor pairs that are themselves connected, THE standard
    * "how community-like is this node's neighborhood" signal (a high
    * coefficient marks tight co-occurrence clusters; ~0 marks
    * hub-and-spoke). Composes [[triangleCounts]] with one degree
    * aggregate — same degree-ordered wedge economics; the ratio is a
    * codegen row expression rounded to 6dp.
    */
  def clusteringCoefficient(edges: DataFrame, srcCol: String,
                            dstCol: String,
                            sizingHint: Option[GraphSizing] = None): DataFrame = {
    val pin = trianglePin(edges, sizingHint)
    val e = pin(canonicalEdges(edges, srcCol, dstCol))
    val deg = degreesOf(e)
    deg.filter(col("deg") >= 2)
      .join(triangleCountsOn(e, deg, pin), Seq("node"))
      .select(col("node"), col("deg"), col("n_triangles"),
        round(lit(2.0) * col("n_triangles") /
          (col("deg") * (col("deg") - 1)), 6).as("clustering_coef"))
  }

  /** Common-neighbor link prediction (Adamic & Adar 2003): for every
    * NON-ADJACENT node pair sharing at least `minCommon` neighbors,
    * the common-neighbor count and the Adamic-Adar score
    * sum(1 / ln(deg(m))) over shared neighbors m — rarer mutual
    * friends weigh more. The standard "customers who share suppliers"
    * / collaborative-filtering candidate generator.
    *
    * Scale shape: candidate pairs are enumerated ONLY through shared
    * neighbors (adj ⋈ adj on the mid node — an equi-join, never an
    * all-pairs product), and `maxMidDegree` drops hub mids WHOLE
    * before the wedge join — the minhash maxBucket idiom. The cap is
    * principled here, not just protective: a degree-10^6 hub
    * contributes 1/ln(10^6) ≈ 0.07 per pair to a score where a
    * degree-10 mid contributes 0.43, while generating 10^12 wedges —
    * the signal-to-cost ratio is the worst in the graph. Scores are
    * rounded to 6dp so parallel sum order can't leak into the result.
    */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
                 maxMidDegree: Int, minCommon: Int = 1): DataFrame = {
    require(maxMidDegree >= 2, "maxMidDegree >= 2")
    require(minCommon >= 1, "minCommon >= 1")
    val e = canonicalEdges(edges, srcCol, dstCol).localCheckpoint()
    // undirected adjacency with the mid's degree riding each row
    val adj = e.select(col("a").as("mid"), col("b").as("nbr"))
      .union(e.select(col("b").as("mid"), col("a").as("nbr")))
    val deg = adj.groupBy(col("mid")).agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") <= maxMidDegree && col("__deg") >= 2)
    val slim = adj.join(deg, Seq("mid"))
    val right = slim.select(col("mid"), col("nbr").as("nbr2"))
    val scored = slim.join(right, Seq("mid"))
      .filter(col("nbr") < col("nbr2"))
      .groupBy(col("nbr").as("node_a"), col("nbr2").as("node_b"))
      .agg(count(lit(1)).as("n_common"),
        round(sum(lit(1.0) / log(col("__deg"))), 6).as("adamic_adar"))
      .filter(col("n_common") >= minCommon)
    // prediction = NEW links only: drop pairs already adjacent
    scored.join(e, scored("node_a") === e("a") && scored("node_b") === e("b"),
      "left_anti")
  }

  /** Synchronous label propagation (Raghavan et al. 2007), the
    * near-linear community detector: every node starts as its own
    * community; each round it adopts the label most frequent among
    * its neighbors, ties broken by MIN label — the deterministic
    * variant (classic LPA breaks ties randomly; the min rule makes
    * every engine replay the same communities, the same determinism
    * trade the dedup-cluster min-label closure makes). Fixed `iters`
    * rounds, no convergence check — the bounded-superstep posture of
    * [[pageRank]].
    *
    * Scale shape per round: one (adjacency ⋈ labels) equi-join on the
    * neighbor key, one (node, label) count aggregate (map-side
    * partial), one per-node arg-max window (WindowGroupLimit pushes
    * rank<=1 into the sort). Labels are consumed once per round but
    * the plan would still deepen linearly with `iters`, so each
    * round's label table pins with localCheckpoint (or `checkpoint()`
    * under `checkpointDir`, the [[pageRank]] knob).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int,
                       checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters in [1, 64]")
    val pin = withCheckpointDir(edges, checkpointDir)
    val e = canonicalEdges(edges, srcCol, dstCol).localCheckpoint()
    val adj = e.select(col("a").as("node"), col("b").as("nbr"))
      .union(e.select(col("b").as("node"), col("a").as("nbr")))
    var labels = adj.select(col("node")).distinct()
      .select(col("node"), col("node").as("community"))
    val w = Window.partitionBy(col("node"))
      .orderBy(col("__n").desc, col("community"))
    for (_ <- 1 to iters) {
      labels = pin(adj
        .join(labels.select(col("node").as("nbr"), col("community")),
          Seq("nbr"))
        .groupBy(col("node"), col("community"))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("node"), col("community")))
    }
    labels
  }

  /** Multi-source BFS hop distance: for every node reachable from
    * `sources` within `maxHops` directed hops, the MINIMUM hop count
    * — the "how far is everything from these seeds" primitive behind
    * neighborhood sampling, blast-radius analysis and seed-expansion
    * labeling. Edges are treated as DIRECTED over (srcCol, dstCol);
    * pass a symmetric edge table for undirected semantics (the
    * [[pageRank]] staged-table contract). Output: (node, dist) with
    * dist 0 on the seeds themselves.
    *
    * Scale shape — frontier BFS, the textbook Pregel lowering: each
    * hop is ONE (frontier ⋈ edges) equi-join plus ONE anti-join
    * against the settled set, so per-hop work is proportional to the
    * edges incident to the CURRENT frontier, never |E|·hops. The
    * settled set and frontier pin per round (localCheckpoint, or
    * `checkpoint()` under `checkpointDir` — the [[pageRank]] knob);
    * an empty frontier short-circuits the remaining rounds (one
    * cheap isEmpty job per hop, on the frontier — the smallest frame
    * in the loop).
    */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
                    sources: Seq[Long], maxHops: Int,
                    checkpointDir: Option[String] = None): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    require(maxHops >= 1 && maxHops <= 64, "maxHops in [1, 64]")
    val pin = withCheckpointDir(edges, checkpointDir)
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    var settled = pin(sources.distinct.toDF("node")
      .select(col("node"), lit(0L).as("dist")))
    var frontier = settled.select(col("node"))
    var hop = 1L
    var live = true
    while (live && hop <= maxHops) {
      val reached = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
      val fresh = pin(reached.join(settled.select(col("node")),
        Seq("node"), "left_anti"))
      if (fresh.isEmpty) live = false
      else {
        settled = pin(settled.union(
          fresh.select(col("node"), lit(hop).as("dist"))))
        frontier = fresh
        hop += 1
      }
    }
    settled
  }

  /** Fixed-round k-core peel (Seidman 1983's k-core by bounded
    * iteration): `rounds` times, drop every node whose degree in the
    * CURRENT graph is below `k` and restrict the edge set to the
    * survivors — the standard "strip the fringe" density filter that
    * isolates the tightly-connected kernel of a co-occurrence graph
    * (spam rings, core vocabularies, hub communities). Bounded
    * supersteps rather than peel-to-fixpoint, the [[pageRank]] /
    * [[labelPropagation]] posture: any engine replaying the same
    * `rounds` gets the identical node set. Output: (node, deg) —
    * survivors of the last peel with their degree in the peeled
    * graph (a node whose last neighbor was peeled disappears with
    * the edge that carried it).
    *
    * Scale shape per round: one degree aggregate (map-side partial)
    * plus two semi-joins restricting the edge set — all on node
    * keys, edge payload never widens; the shrinking edge table pins
    * per round so the `rounds`-deep plan never re-derives earlier
    * peels.
    */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
                k: Int, rounds: Int,
                checkpointDir: Option[String] = None,
                sizingHint: Option[GraphSizing] = None): DataFrame = {
    require(k >= 1, "k >= 1")
    require(rounds >= 1 && rounds <= 64, "rounds in [1, 64]")
    // catalog sizing picks the pin mode like the rank loops: the peel
    // re-pins a (shrinking) edge-sized table EVERY round, so a big
    // declared table auto-selects disk checkpointing instead of
    // holding `rounds` generations of executor-memory blocks
    val pin = pinner(edges.sparkSession, checkpointDir,
      sizingHint.map(_.edgeRows).getOrElse(0L))
    var e = pin(canonicalEdges(edges, srcCol, dstCol))
    for (_ <- 1 to rounds) {
      val keep = degreesOf(e).filter(col("deg") >= k)
        .select(col("node"))
      e = pin(e
        .join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b")))
    }
    degreesOf(e)
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over every undirected edge (each edge counted
    * in both directions, the standard convention) — positive means
    * hubs attach to hubs (social-network shape), negative means
    * hubs attach to leaves (bipartite / hub-and-spoke shape, e.g. a
    * customer-supplier co-purchase graph). The one-number structural
    * summary that says which join-skew regime the graph lives in.
    *
    * Scale shape: one degree aggregate, two (edge ⋈ degree)
    * equi-joins to put deg(src)/deg(dst) on each edge row, then a
    * single covariance/variance aggregate to one row — the explicit
    * covar/sqrt(var) form (the [[Profile.groupCorr]] convention) so
    * a degree-regular graph yields NULL, not NaN. Output: one row
    * (n_edges, assortativity).
    *
    * `materialized = true` declares the input ALREADY a symmetric,
    * deduped edge table (both directions present exactly once — the
    * staged-edge-table contract [[pageRank]] shares): the canonical
    * dedup exchange and its checkpoint pin are skipped, degrees come
    * straight off the stored table's scan (out-degree = degree on a
    * symmetric table). Measured 3.7x -> ~2x at 10x data on the
    * co-purchase graph.
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
                          dstCol: String,
                          materialized: Boolean = false): DataFrame = {
    val both =
      if (materialized) edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      else {
        val e = canonicalEdges(edges, srcCol, dstCol).localCheckpoint()
        e.select(col("a"), col("b"))
          .union(e.select(col("b").as("a"), col("a").as("b")))
      }
    // degree vector pinned (|V| rows — it feeds BOTH endpoint joins)
    // and BROADCAST when it fits: the edge table then never shuffles —
    // two broadcast-hash probes ride the scan straight into the one-row
    // covariance aggregate. Past the broadcast bound the joins fall
    // back to shuffles (the honest web-scale price).
    val deg = both.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg")).localCheckpoint()
    val degA = deg.select(col("node").as("a"), col("deg").as("__dx"))
    val degB = deg.select(col("node").as("b"), col("deg").as("__dy"))
    val small = deg.count() <= assortativityBroadcastLimit
    val withDeg = both
      .join(if (small) broadcast(degA) else degA, Seq("a"))
      .join(if (small) broadcast(degB) else degB, Seq("b"))
      .select(col("__dx").cast("double").as("__dx"),
        col("__dy").cast("double").as("__dy"))
    withDeg.agg(
      (count(lit(1)) / 2).cast("long").as("n_edges"),
      round(when(var_pop(col("__dx")) > 0 && var_pop(col("__dy")) > 0,
        covar_pop(col("__dx"), col("__dy")) /
          (sqrt(var_pop(col("__dx"))) * sqrt(var_pop(col("__dy"))))), 4)
        .as("assortativity"))
  }
}
