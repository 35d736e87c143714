package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability: a StreamingQueryListener that records
  * per-batch progress (rows, rates, durations, state size) into a
  * bounded in-memory ring, queryable as a DataFrame — the minimal
  * ops surface a long-running ingest pipeline needs (lag/throughput
  * dashboards, stuck-query detection) without any external system.
  *
  * Listener callbacks arrive on Spark's listener bus thread;
  * everything mutable is confined behind this object's lock. The ring
  * is bounded (`keep` batches per query) so a months-long stream
  * cannot grow driver memory.
  */
object StreamMetrics {
  /** One micro-batch's progress snapshot (top-level so Spark can
    * derive an Encoder — inner case classes cannot be encoded).
    */
  case class BatchMetric(queryName: String, queryId: String, batchId: Long,
                         inputRows: Long, rowsPerSec: Double,
                         batchDurationMs: Long, stateRows: Long,
                         timestamp: String)
}

final class StreamMetrics(keep: Int = 256) extends StreamingQueryListener {
  import StreamMetrics.BatchMetric

  private val ring = mutable.Map.empty[String, mutable.ArrayDeque[BatchMetric]]

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val stateRows =
      if (p.stateOperators == null) 0L
      else p.stateOperators.map(_.numRowsTotal).sum
    val m = BatchMetric(
      Option(p.name).getOrElse(""), p.id.toString, p.batchId,
      p.numInputRows, p.processedRowsPerSecond,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
      stateRows, p.timestamp)
    synchronized {
      val q = ring.getOrElseUpdate(m.queryId, mutable.ArrayDeque.empty)
      q.append(m)
      while (q.size > keep) q.removeHead()
    }
  }

  /** All retained batch metrics as a frame (empty-safe). */
  def metrics(spark: SparkSession): DataFrame = {
    import spark.implicits._
    synchronized { ring.values.flatten.toSeq }.toDF()
  }

  /** Per-query health rollup: batches seen, total rows, mean rate,
    * max batch duration, latest state size — the one-glance view.
    */
  def health(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    metrics(spark)
      .groupBy(col("queryId"), col("queryName"))
      .agg(count(lit(1)).as("n_batches"),
        sum(col("inputRows")).as("total_rows"),
        round(avg(col("rowsPerSec")), 2).as("mean_rows_per_sec"),
        max(col("batchDurationMs")).as("max_batch_ms"),
        last(col("stateRows")).as("state_rows"))
  }

  def attach(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }

  def detach(spark: SparkSession): Unit = spark.streams.removeListener(this)
}
