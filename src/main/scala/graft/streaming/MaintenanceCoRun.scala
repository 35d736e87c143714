package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One batch's row in the co-run maintenance ledger — everything an
  * operator dashboards off a continuous-ingest curation job: feed
  * drift (psi of the ARRIVING batch vs the frozen reference), the two
  * gate counts, and both state-store sizes (rows vs distinct ids —
  * rows/ids quantifies replay bloat against the bands / nTables clean
  * shape, the number auto-compaction bounds).
  */
final case class MaintenanceBatchReport(
    batch_id: Long, n_in: Long, n_after_text_dedup: Long,
    n_vec_checked: Long, n_kept: Long, psi: Double,
    dedup_store_rows: Long, dedup_store_ids: Long,
    ann_store_rows: Long, ann_store_ids: Long)

/** Composed cross-batch corpus maintenance — the three maintenance
  * stores exercised TOGETHER over ONE document stream, the shape a
  * production continuous-ingest curation job actually runs (the
  * isolated specs prove each store's contract; this proves they
  * compose inside one foreachBatch without stepping on each other's
  * state, lineage, or compaction):
  *
  *   1. drift monitor on the arriving batch ([[DriftMonitor]] —
  *      pre-gate, so the signal reports what the FEED is doing, not
  *      what the gates let through),
  *   2. text near-dup gate ([[IncrementalDedup]] — MinHash signature
  *      store, survivors only continue),
  *   3. embedding near-dup gate over the text survivors that carry a
  *      vector ([[IncrementalAnn]] — SRP signature store; rows
  *      without a vector pass this gate vacuously — a 100-TB corpus
  *      embeds lazily, curation can't block on the embedder).
  *
  * Gate stores are MONOTONE per gate: the text store records every
  * text-gate survivor, including rows a LATER gate drops — text seen
  * once never re-admits (a near-dup of dropped content is still a
  * near-dup), which is the policy a sequential-gate pipeline implies
  * and what keeps each store's replay idempotence self-contained.
  *
  * Both stores auto-compact on their own slack bound, so state stays
  * O(accepted ids) across replays — the ledger's rows/ids columns are
  * the evidence. `processBatch` is replay-idempotent end-to-end
  * because each store is (survivors survive again; the ledger gets a
  * duplicate row, which is the honest record of the replay).
  *
  * Scale shape: everything per batch is the stores' own bucket-keyed
  * equi-join economics plus one windowed count for the monitor; the
  * only driver-side state is the ledger (one case-class row per
  * batch) and the store-size probes (column-pruned id scans).
  */
final class MaintenanceCoRun(spark: SparkSession, root: String,
                             cuts: Seq[Double], refShares: Seq[Double],
                             textThreshold: Double = 0.7,
                             vecThreshold: Double = 0.9,
                             driftWindow: String = "1 hour",
                             autoCompactSlack: Double = 1.5) {

  /** The two cross-batch stores — public so tests and tools can probe
    * [[IncrementalDedup.storeStats]] / force compaction between
    * batches, exactly as an operator would.
    */
  val dedup = new IncrementalDedup(spark, s"$root/dedup_store",
    threshold = textThreshold, autoCompactSlack = autoCompactSlack)
  val ann = new IncrementalAnn(spark, s"$root/ann_store",
    threshold = vecThreshold, autoCompactSlack = autoCompactSlack)

  private val ledger = ListBuffer.empty[MaintenanceBatchReport]

  /** Process one micro-batch of (idCol, textCol, vecCol nullable,
    * tsCol, valueCol) rows: monitor → text gate → vector gate.
    * Returns the accepted rows (pinned — safe to write after the
    * stores' own compactions rewrite their files) and appends one
    * ledger row. Single-writer per store, like the stores themselves:
    * call from ONE foreachBatch, batches in sequence.
    */
  def processBatch(batch: DataFrame, batchId: Long,
                   idCol: String = "doc_id", textCol: String = "text",
                   vecCol: String = "embedding", tsCol: String = "ts",
                   valueCol: String = "value"): DataFrame = {
    // the batch feeds three consumers (monitor, text gate, vector
    // gate) — pin once so the upstream source isn't replayed per gate
    val b = batch.localCheckpoint()
    val nIn = b.count()
    // monitor the FEED: worst window's psi this batch (a batch
    // usually spans one tumbling window; if it spans several, the
    // worst is the alarm that matters)
    val psi = {
      val r = DriftMonitor.psiOf(
          DriftMonitor.binCounts(b, tsCol, valueCol, cuts, driftWindow),
          refShares)
        .agg(max(col("psi"))).head()
      if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    }
    val textKept = dedup.processBatch(b, textCol, idCol).localCheckpoint()
    val withVec = textKept.filter(col(vecCol).isNotNull)
    val nVec = withVec.count()
    val vecKept = ann.processBatch(withVec, vecCol, idCol)
    val kept = textKept.filter(col(vecCol).isNull)
      .unionByName(vecKept).localCheckpoint()
    val (dRows, dIds) = dedup.storeStats()
    val (aRows, aIds) = ann.storeStats()
    ledger += MaintenanceBatchReport(batchId, nIn, textKept.count(),
      nVec, kept.count(), psi, dRows, dIds, aRows, aIds)
    kept
  }

  /** The per-batch maintenance ledger as a DataFrame (one row per
    * processBatch call, in call order).
    */
  def report(): DataFrame = {
    import spark.implicits._
    ledger.toSeq.toDF()
  }

  /** The raw ledger rows (driver-side, for asserts and JSON dumps). */
  def ledgerRows: Seq[MaintenanceBatchReport] = ledger.toSeq
}
