package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event log — the classic product
  * question (view -> click -> purchase) the windowing family doesn't
  * answer directly: a user reaches step i when they emit step i's
  * event STRICTLY AFTER their step-(i-1) completion time, optionally
  * within a horizon of their step-1 time; each step's completion time
  * is the EARLIEST qualifying event (so reach is maximal — if any
  * ordered path exists, the earliest-completion path exists).
  *
  * Scale shape: one narrow (user, ts) aggregation per step plus one
  * equi-join per step on the user id — every stage hash-partitions on
  * the same key, so the exchanges reuse, and the carried state is one
  * (user, t1, prev) row per surviving user. No windows, no sorts, no
  * event-row explosion; the step count is the only multiplier, and
  * funnels are short by nature.
  */
object Funnel {

  /** Per-step reach: (step, event_type, n_users) for each funnel step,
    * step 1-based in the given order. `horizonSeconds` bounds the
    * whole funnel relative to the user's step-1 time (inclusive).
    */
  def funnelReach(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String],
                  horizonSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col(userCol).as("__u"), col(tsCol).as("__ts"),
      col(typeCol).as("__t"))
    val first = e.filter(col("__t") === steps.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("__t1"))
    var cur = first.withColumn("__prev", col("__t1"))
    val stages = scala.collection.mutable.ArrayBuffer[(Int, String, DataFrame)]()
    stages += ((1, steps.head, first))
    var i = 2
    for (st <- steps.tail) {
      val within = horizonSeconds.fold(lit(true))(h =>
        unix_micros(col("__ts")) - unix_micros(col("__t1")) <= h * 1000000L)
      val nxt = e.filter(col("__t") === st)
        .join(cur.select(col("__u"), col("__t1"), col("__prev")), Seq("__u"))
        .filter(col("__ts") > col("__prev") && within)
        // __t1 is constant per user — min() just carries it through
        .groupBy(col("__u"))
        .agg(min(col("__ts")).as("__next"), min(col("__t1")).as("__t1"))
      cur = nxt.withColumn("__prev", col("__next"))
      stages += ((i, st, nxt))
      i += 1
    }
    stages.map { case (step, name, s) =>
      s.agg(count(lit(1)).as("n_users"))
        .select(lit(step).cast("long").as("step"), lit(name).as("event_type"),
          col("n_users"))
    }.reduce(_.unionByName(_)).orderBy(col("step"))
  }

  /** Cohort retention matrix — the second classic event-log rollup:
    * users cohorted by the epoch-week of their FIRST event, then
    * counted distinctly in every later week they were active, as
    * (cohort_week, week_offset, n_users). Epoch-week arithmetic
    * (floor(epoch-micros / week-micros)) rather than calendar
    * truncation keeps the bucketing a pure integer function any
    * engine reproduces bit-exactly — no timezone/ISO-week edges.
    *
    * Scale shape: one user-keyed aggregation for the cohort
    * assignment, one equi-join back on the user id (same partitioning
    * — exchange reuses), then a distinct + count on (cohort, offset,
    * user) id-width rows. Nothing wider than three longs shuffles.
    */
  def retentionMatrix(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val WeekMicros = 7L * 86400L * 1000000L
    val week = (c: org.apache.spark.sql.Column) =>
      floor(unix_micros(c) / WeekMicros)
    val e = events.select(col(userCol).as("__u"), col(tsCol).as("__ts"))
    val cohort = e.groupBy(col("__u"))
      .agg(min(col("__ts")).as("__first"))
      .select(col("__u"), week(col("__first")).as("cohort_week"))
    e.join(cohort, Seq("__u"))
      .select(col("__u"), col("cohort_week"),
        (week(col("__ts")) - col("cohort_week")).as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over each user's event
    * sequence: (from_type, to_type, n, p) where p row-normalizes the
    * from_type — the behavioral-model summary behind "what usually
    * follows a view", next-event prediction baselines, and anomaly
    * scoring of improbable paths. Adjacency is per user in event-time
    * order, with `tieCol` breaking equal timestamps so the sequence
    * (and therefore the matrix) is deterministic under any partition
    * order.
    *
    * Scale shape: ONE user-partitioned ordered window (the sessionize
    * exchange) builds adjacent pairs with lead(); everything after is
    * (type, type, count) aggregation — a types²-sized frame. p is a
    * floor-quantized 6dp ratio (the midpoint-safe convention) of two
    * exact counts.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(tieCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val c = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = c.groupBy(col("from_type")).agg(sum(col("n")).as("__tot"))
    c.join(tot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        Quantize.q(col("n").cast("double") / col("__tot"), 6).as("p"))
  }
}
