package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the event stream — the
  * engine's streaming surface beyond the document pipelines (X2).
  * The reference's "streaming" is completion-order row arrival
  * (app:886-906); these add the event-time semantics a production
  * pipeline needs at scale: watermarked tumbling/sliding windows and
  * stateful sessionization via flatMapGroupsWithState.
  *
  * Every operator takes a DataFrame so it runs identically on a
  * readStream source (incremental, stateful) and a batch frame
  * (backfill) — the recommended pattern for lambda-free pipelines.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(sessionId: Long, start: Long, lastSeen: Long, nEvents: Long)

  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp)

  /** Watermarked tumbling-window counts per event type. On a stream,
    * state for windows older than the watermark is dropped — bounded
    * memory regardless of stream length.
    */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Watermarked sliding-window counts. */
  def slidingCounts(events: DataFrame, window_ : String = "1 hour",
                    slide: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Built-in session windows (gap-based, watermarked). */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Custom stateful sessionization via flatMapGroupsWithState: one
    * state object per user (bounded by user cardinality), sessions
    * emitted when the 30-minute gap elapses (event-time driven here;
    * a processing-time timeout would close idle sessions on a real
    * feed). Demonstrates the KeyValueGroupedDataset state API the
    * built-in session_window cannot express (e.g. per-session custom
    * aggregates or early emission rules).
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // events within one micro-batch arrive unordered: sort by event time
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var st = state.getOption.getOrElse(SessionState(0L, -1L, -1L, 0L))
          sorted.foreach { e =>
            val t = e.ts.getTime
            if (st.lastSeen < 0) {
              st = SessionState(st.sessionId, t, t, 1L)
            } else if (t - st.lastSeen > gapSeconds * 1000) {
              out += SessionOut(userId, st.sessionId, st.nEvents,
                new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.lastSeen))
              st = SessionState(st.sessionId + 1, t, t, 1L)
            } else {
              st = st.copy(lastSeen = t, nEvents = st.nEvents + 1)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Sessionization with an EVENT-TIME timeout: like [[sessionize]],
    * but an idle session also closes when the stream's watermark passes
    * lastSeen + gap — no later event from the same user needed. This is
    * the production shape for an infinite feed: per-user state is
    * reclaimed by the timeout, so users who disappear do not pin state
    * forever. Because that eviction also discards any per-user counter,
    * session_id here is the session's START time in epoch millis —
    * unique and monotone per user WITHOUT surviving state (a counter
    * would restart at 0 after eviction and collide with emitted
    * sessions). Input must carry `withWatermark("ts", ...)`.
    */
  def sessionizeWithTimeout(events: Dataset[Event],
                            gapSeconds: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastSeen + gap with no new events: close
            // the open session and release the user's state
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(userId, st.start, st.nEvents,
              new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.lastSeen)))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var st = state.getOption.getOrElse(SessionState(0L, -1L, -1L, 0L))
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (st.lastSeen < 0) {
                st = SessionState(0L, t, t, 1L)
              } else if (t - st.lastSeen > gapSeconds * 1000) {
                out += SessionOut(userId, st.start, st.nEvents,
                  new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.lastSeen))
                st = SessionState(0L, t, t, 1L)
              } else if (t < st.start - gapSeconds * 1000) {
                // late event older than the current session's backward
                // gap horizon: it belongs to an ALREADY-EMITTED session.
                // Append mode cannot amend emitted rows, and merging it
                // would drag start (= the session id) back over an
                // emitted session's id — drop it. Events this late only
                // exist inside the watermark/gap mismatch window.
              } else {
                // cross-batch late event (above watermark, inside the
                // gap) may be OLDER than state's lastSeen/start — merge
                // with max/min so the session never shrinks and the
                // timeout horizon never moves backwards. start can move
                // back at most gap, which cannot reach the previous
                // emitted session (its close required a > gap silence).
                st = st.copy(start = math.min(st.start, t),
                  lastSeen = math.max(st.lastSeen, t),
                  nEvents = st.nEvents + 1)
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastSeen + gapSeconds * 1000)
            out.iterator
          }
      }
  }

  /** Flush any open sessions of a batch-mode sessionize run: in batch
    * execution flatMapGroupsWithState sees all data at once, so the
    * final open session per user is still in state when iteration ends.
    * This variant emits them too (batch/backfill semantics).
    */
  def sessionizeBatch(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, rows: Iterator[Event]) =>
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        var sessionId = 0L
        var start = -1L; var last = -1L; var n = 0L
        sorted.foreach { e =>
          val t = e.ts.getTime
          if (last < 0) { start = t; last = t; n = 1 }
          else if (t - last > gapSeconds * 1000) {
            out += SessionOut(userId, sessionId, n,
              new java.sql.Timestamp(start), new java.sql.Timestamp(last))
            sessionId += 1; start = t; last = t; n = 1
          } else { last = t; n += 1 }
        }
        if (last >= 0)
          out += SessionOut(userId, sessionId, n,
            new java.sql.Timestamp(start), new java.sql.Timestamp(last))
        out.iterator
      }
  }

  /** Per-user streaming-funnel state: `floor` = exclusive event-time
    * lower bound (everything at or below it belongs to already-emitted
    * chains), `buf` = the (ts, type) events above the floor.
    */
  case class FunnelBuf(floor: Long, buf: List[FunnelEv])
  case class FunnelEv(t: Long, tpe: String)
  case class FunnelHit(user_id: Long, steps_reached: Int, t1: java.sql.Timestamp)

  /** Walk the ordered chain over a user's buffered events: step i
    * completes at the EARLIEST step-i event strictly after step-(i-1)'s
    * completion and within the horizon of t1 — the same rule as the
    * batch [[graft.ops.Funnel.funnelReach]].
    */
  private def evalChain(steps: Seq[String], horizonMs: Long, t1: Long,
                        evs: Seq[FunnelEv]): Int = {
    var prev = t1
    var reached = 1
    var i = 1
    var go = true
    while (go && i < steps.length) {
      val cand = evs.collect {
        case e if e.tpe == steps(i) && e.t > prev && e.t - t1 <= horizonMs => e.t
      }
      if (cand.isEmpty) go = false
      else { prev = cand.min; reached += 1; i += 1 }
    }
    reached
  }

  /** STREAMING ordered funnel — [[graft.ops.Funnel.funnelReach]]'s
    * per-user emission on an infinite feed, with deterministic
    * RE-ENTRY: a user's step-1 events greedily partition their
    * timeline into chains — the first opens at the earliest step-1
    * time t1, closes at t1 + horizon, and the next chain opens at the
    * first step-1 event AFTER that close. Each chain's events buffer
    * until the watermark passes its close (after which nothing inside
    * the horizon can still arrive), then the chain evaluates once and
    * emits (user, steps_reached, t1). Buffer-then-evaluate is what
    * makes out-of-order arrival EXACT, and the greedy event-time
    * partition is what makes re-entry independent of micro-batch
    * boundaries — monotone per-step minima or arrival-order chaining
    * would both give batch-slicing-dependent answers.
    *
    * State is bounded: emitted chains advance `floor` and their events
    * drop; within the live chain, non-step-1 events at or below both
    * t1 and the watermark can never follow any present-or-future chain
    * start (a future step-1 arrival carries ts above the watermark)
    * and drop; step-1 events inside the live chain's horizon (other
    * than t1 itself) are irrelevant by the greedy rule and drop. What
    * remains spans at most the live horizon plus the feed's
    * event-time disorder. Users with no live chain are forgotten once
    * their buffered events age past the watermark. `steps` must be
    * distinct; input must carry `withWatermark("ts", ...)`.
    */
  def funnelStream(events: Dataset[Event], steps: Seq[String],
                   horizonSeconds: Long): Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(horizonSeconds > 0, "streaming funnel needs a finite horizon")
    val horizonMs = horizonSeconds * 1000
    val stepSet = steps.toSet
    // earliest step-1 time above the floor, or -1 (the live chain's t1)
    def t1Of(st: FunnelBuf): Long = {
      var t1 = -1L
      st.buf.foreach(e =>
        if (e.tpe == steps.head && (t1 < 0 || e.t < t1)) t1 = e.t)
      t1
    }
    events.filter(e => stepSet.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelBuf]) =>
          // one unified body: a timeout invocation is just "no new rows"
          var st = state.getOption.getOrElse(FunnelBuf(Long.MinValue, Nil))
          rows.foreach { e =>
            val t = e.ts.getTime
            if (t > st.floor)
              st = st.copy(buf = FunnelEv(t, e.event_type) :: st.buf)
          }
          val wm = state.getCurrentWatermarkMs()
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelHit]
          // flush every chain whose horizon the watermark has passed
          var t1 = t1Of(st)
          while (t1 >= 0 && wm > t1 + horizonMs) {
            out += FunnelHit(userId, evalChain(steps, horizonMs, t1, st.buf),
              new java.sql.Timestamp(t1))
            val close = t1 + horizonMs
            st = FunnelBuf(close, st.buf.filter(_.t > close))
            t1 = t1Of(st)
          }
          // prune the live buffer (see scaladoc for why each is safe);
          // in-horizon heads become prunable only once t1 is FINAL
          // (t1 <= wm: no later row can undercut it) — before that, a
          // late-but-earlier head could shrink the window and promote
          // them to the next chain's opener
          st = st.copy(buf = st.buf.filter { e =>
            if (e.tpe == steps.head)
              t1 < 0 || e.t == t1 || e.t > t1 + horizonMs || t1 > wm
            else t1 >= 0 && e.t > t1 && e.t - t1 <= horizonMs || e.t > wm
          })
          if (st.buf.isEmpty) {
            if (state.exists) state.remove()
            out.iterator
          } else {
            state.update(st)
            // t1 + horizon + 1 > wm is guaranteed by the flush loop;
            // with no live chain, wait for the youngest buffered event
            // to age below the watermark (pruning has already dropped
            // the rest), at which point the buffer empties and the
            // state is removed
            val target =
              if (t1 >= 0) t1 + horizonMs + 1
              else st.buf.map(_.t).max + 1
            state.setTimeoutTimestamp(math.max(target, wm + 1))
            out.iterator
          }
      }
  }

  case class AnomalyState(count: Long, mean: Double, m2: Double,
                          buf: List[AnomalyEv])
  case class AnomalyEv(t: Long, id: Long, v: Double)
  case class AnomalyHit(event_type: String, event_id: Long,
                        ts: java.sql.Timestamp, value: Double, z: Double,
                        n_prior: Long)

  /** STREAMING per-key z-score anomaly detection — the online form of
    * [[graft.ops.Profile.outliers]]: each event is scored against the
    * Welford running statistics of every STRICTLY-EARLIER event of its
    * key (event-time order, ties on event_id), and flags when
    * `|v - mean| > z * sigma_pop` once at least `minN` prior events
    * exist. Buffer-then-evaluate (the [[funnelStream]] discipline):
    * events buffer until the watermark passes their timestamp, then
    * finalize in (ts, id) order — so scoring order, and therefore
    * every emitted z, is EXACT under out-of-order arrival and
    * independent of micro-batch boundaries. An arrival-order fold
    * would score the same stream differently per run.
    *
    * State per key is three numbers (count, mean, M2) plus the pending
    * buffer, which the watermark bounds to the feed's event-time
    * disorder — O(1) amortized, never corpus-sized. Input must carry
    * `withWatermark("ts", ...)`. Exactness holds for arrivals at or
    * above the watermark (its contract domain); an event arriving
    * BELOW it folds into the statistics late and in arrival order —
    * the standard best-effort watermark semantics, same as every
    * other watermarked operator here.
    */
  def anomalyStream(events: Dataset[Event], zThreshold: Double,
                    minN: Long = 30L): Dataset[AnomalyHit] = {
    import events.sparkSession.implicits._
    require(zThreshold > 0, "threshold must be positive")
    require(minN >= 2, "need at least 2 prior events for a stddev")
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomalyState, AnomalyHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Event], state: GroupState[AnomalyState]) =>
          var st = state.getOption.getOrElse(AnomalyState(0L, 0.0, 0.0, Nil))
          rows.foreach { e =>
            st = st.copy(buf = AnomalyEv(e.ts.getTime, e.event_id, e.value) :: st.buf)
          }
          val wm = state.getCurrentWatermarkMs()
          val (ripe, pending) = st.buf.partition(_.t <= wm)
          val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyHit]
          var (count, mean, m2) = (st.count, st.mean, st.m2)
          ripe.sortBy(e => (e.t, e.id)).foreach { e =>
            if (count >= minN) {
              val sigma = math.sqrt(m2 / count)
              if (sigma > 0 && math.abs(e.v - mean) > zThreshold * sigma)
                out += AnomalyHit(key, e.id, new java.sql.Timestamp(e.t),
                  e.v, math.floor((e.v - mean) / sigma * 10000 + 0.5) / 10000,
                  count)
            }
            count += 1
            val d = e.v - mean
            mean += d / count
            m2 += d * (e.v - mean)
          }
          st = AnomalyState(count, mean, m2, pending)
          state.update(st)
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(pending.map(_.t).min + 1, wm + 1))
          out.iterator
      }
  }

  /** Watermarked stream-stream join (purchase attribution): each view
    * joined to purchases by the same user within `horizon` AFTER the
    * view. Both sides carry watermarks and the join condition bounds
    * the time band, so state for rows older than watermark + horizon
    * is evicted — the canonical bounded-state stream-stream join.
    * Works identically on batch frames (backfill).
    */
  def purchaseAttribution(events: DataFrame, horizon: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    views.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("purchase_value"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts"))).as("lag_us"))
  }

  /** Streaming exact dedup with bounded state: duplicates arriving
    * within the watermark horizon are dropped; state older than the
    * watermark is evicted, so memory stays bounded on an infinite
    * stream (the batch-mode exact dedup's streaming counterpart).
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
                     tsCol: String = "ts", watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
    else // batch backfill parity: global exact dedup
      events.dropDuplicates(keyCols.head, keyCols.tail: _*)

  /** Normalize the events fixture's `ts` column to an instant
    * TimestampType across generator vintages: raw int64 of nanos
    * (legacy TIMESTAMP(NANOS) files read under
    * `spark.sql.legacy.parquet.nanosAsLong`), native timestamp[us]
    * (which Spark reads as TIMESTAMP_NTZ), or an already-instant
    * timestamp. The engine pins the session timezone to UTC
    * everywhere, so the NTZ → instant cast preserves wall-clock
    * values and downstream windows/formats are byte-identical across
    * vintages.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  /** Read the events fixture as a bounded stream (for tests/demos):
    * parquet dir streamed file-by-file. The stream schema is taken
    * from a batch sniff of the same path so the reader tracks
    * whichever `ts` physical type the fixture vintage uses.
    */
  def readEventStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path).schema
    normalizeEventTs(spark.readStream.schema(schema).parquet(path))
  }
}
