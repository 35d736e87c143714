package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Similarity

/** Incremental embedding near-duplicate filtering — the vector-space
  * sibling of [[IncrementalDedup]], for a corpus whose embeddings grow
  * batch by batch: a persisted (id, table, bucket, embedding, norm)
  * SRP signature store; each new batch hashes ONCE, equi-joins its
  * buckets against the store, cosine-verifies only the candidate
  * partners, drops near-dups (vs the accepted corpus and within the
  * batch, keeping the lowest id), and appends the survivors.
  *
  * Work per batch is O(batch x nTables) + a bucket-keyed hash join —
  * independent of corpus size except through bucket collision rate.
  * Recall follows the SRP parameters exactly as in
  * [[Similarity.cosineNearDups]] (same hyperplanes: both sides hash
  * through the shared srp_signatures expression). Designed for use
  * inside foreachBatch of an embedding stream. Replay of a crashed
  * batch is OUTPUT-correct (self-matches excluded); duplicate store
  * rows from a replay only re-derive the same candidates.
  */
final class IncrementalAnn(spark: SparkSession, storeDir: String,
                           nBits: Int = 8, nTables: Int = 8,
                           threshold: Double = 0.9,
                           autoCompactSlack: Double = 1.5) {

  // Bucket values are persisted, so EVERYTHING that determines them is
  // part of the on-disk format — the SRP hyperplane scheme version AND
  // the hyperparameters (nBits/nTables). Reopening a store with
  // different nBits/nTables would silently never match buckets; the
  // marker exists to fail fast on exactly that.
  private val formatVersion = s"1:nBits=$nBits,nTables=$nTables"
  locally {
    StoreSwap.recover(Paths.get(storePath))
    val marker = Paths.get(s"$storeDir/_FORMAT")
    if (Files.exists(Paths.get(storePath)) || Files.exists(marker)) {
      val v = if (Files.exists(marker)) Files.readString(marker).trim else "0"
      // bare pre-hyperparameter markers recorded the formula but NOT
      // the params the store was built with — unconditionally
      // incomparable (guessing defaults would silently admit a
      // mismatched store)
      require(v == formatVersion,
        s"SRP store at $storeDir uses bucket format [$v], this build writes " +
          s"[$formatVersion] — rebuild the store (bucket hashes are not comparable)")
    } else {
      Files.createDirectories(Paths.get(storeDir))
      Files.writeString(marker, formatVersion)
    }
  }

  private val storeSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("table", IntegerType),
    StructField("bucket", LongType),
    StructField("embedding", ArrayType(DoubleType, containsNull = false)),
    StructField("norm", DoubleType)))

  private def storePath = s"$storeDir/srp_signatures"

  private def store(): DataFrame =
    if (Files.exists(Paths.get(storePath)))
      spark.read.schema(storeSchema).parquet(storePath)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), storeSchema)

  /** (id, table, bucket, embedding, norm) rows for a batch — the same
    * bucketing as Similarity's SRP operators.
    */
  private def signatures(batch: DataFrame, vecCol: String, idCol: String): DataFrame =
    batch.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("embedding"))
      .withColumn("norm", Similarity.norm(col("embedding")))
      .select(col("id"), col("embedding"), col("norm"),
        posexplode(graft.functions.VectorExpressions
          .srp_signatures(col("embedding"), nBits, nTables)).as(Seq("table", "bucket")))
      .select(col("id"), col("table").cast("int").as("table"), col("bucket"),
        col("embedding"), col("norm"))

  private def cos(va: org.apache.spark.sql.Column, na: org.apache.spark.sql.Column,
                  vb: org.apache.spark.sql.Column, nb: org.apache.spark.sql.Column) =
    Similarity.safeCosine(Similarity.dot(va, vb), na, nb)

  /** Process one batch: returns rows NOT near-duplicate (cosine >=
    * threshold) of the accepted corpus or an earlier row of the same
    * batch, and persists the survivors' signatures.
    */
  def processBatch(batch: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val sigs = signatures(batch, vecCol, idCol).cache()
    try {
      // candidates vs the persisted corpus: bucket equi-join, verify.
      // The store id rides along so a row never matches ITSELF — a
      // foreachBatch replay re-presents rows whose signatures were
      // already persisted, and without the self-exclusion every
      // replayed survivor would cosine-1-match its own stored vector.
      //
      // Deliberately NOT the staged narrow-pair shape IncrementalDedup
      // uses — measured, it loses here. On the sf3 embeddings streamed
      // in 5 batches (DedupStress incremental_ann_batches), one
      // payload-carrying join + distinct runs 17.3 s at dim 64 and
      // 33.2 s FLAT per batch at dim 768 (REPEAT=12), while the staged
      // shape measured 70.3 s / 171.9 s with a GROWING curve. The
      // asymmetry vs text: SRP tables have 2^nBits buckets, so the
      // pair distinct dedups little (a pair shares few buckets), and
      // verification needs pair x vector rows regardless — staging
      // just re-shuffles the pair stream two extra times to reattach
      // what the bucket join already delivered. MinHash banding is the
      // opposite: huge bucket space, adversarially concentrated
      // collisions, and KB-scale shingle sets that dedup away before
      // payload attaches.
      val vsCorpus = sigs.join(
          store().select(col("table"), col("bucket"), col("id").as("__cid"),
            col("embedding").as("__ce"), col("norm").as("__cn")),
          Seq("table", "bucket"))
        .filter(col("id") =!= col("__cid"))
        .select(col("id"), col("embedding"), col("norm"), col("__ce"), col("__cn"))
        .distinct()
        .filter(cos(col("embedding"), col("norm"), col("__ce"), col("__cn")) >= threshold)
        .select(col("id")).distinct()
      // candidates within the batch itself (keep the lowest id)
      val a = sigs.select(col("table"), col("bucket"), col("id").as("id_a"),
        col("embedding").as("__va"), col("norm").as("__na"))
      val b = sigs.select(col("table"), col("bucket"), col("id").as("id_b"),
        col("embedding").as("__vb"), col("norm").as("__nb"))
      val intra = a.join(b, Seq("table", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("__va"), col("__na"), col("__vb"), col("__nb"))
        .distinct()
        .filter(cos(col("__va"), col("__na"), col("__vb"), col("__nb")) >= threshold)
        .select(col("id_b").as("id")).distinct()
      val dupIds = vsCorpus.unionByName(intra).distinct()
      val kept = batch.join(dupIds.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      val keptSigs = sigs.join(
        kept.select(col(idCol).as("id")), Seq("id"), "left_semi")
      keptSigs.select(col("id"), col("table"), col("bucket"),
          col("embedding"), col("norm"))
        .write.mode(SaveMode.Append).parquet(storePath)
      maybeAutoCompact(kept)
    } finally sigs.unpersist()
  }

  /** Auto-compaction (between-batch maintenance folded into the append
    * path): a clean store holds exactly `nTables` rows per id, so
    * total > slack x ids x nTables means foreachBatch replays have
    * accumulated duplicate signature rows worth a rewrite. The bloat
    * probe reads only the id column (column-pruned scan). Before the
    * rewrite the batch result is pinned with localCheckpoint — the
    * returned plan must not lazily re-read store files the bak-swap is
    * about to replace. Set autoCompactSlack <= 0 to disable and manage
    * [[compactStore]] manually.
    */
  private def maybeAutoCompact(kept: DataFrame): DataFrame = {
    if (autoCompactSlack <= 0) return kept
    val r = store().agg(count(lit(1)), count_distinct(col("id"))).head()
    if (r.getLong(0) <= (autoCompactSlack * r.getLong(1) * nTables).toLong) kept
    else {
      val pinned = kept.localCheckpoint()
      compactStore()
      pinned
    }
  }

  /** State-store size probe: (total signature rows, distinct ids) —
    * a clean store holds exactly `nTables` rows per id; the co-run
    * maintenance ledger surfaces it per batch. Column-pruned id scan.
    */
  def storeStats(): (Long, Long) = {
    val r = store().agg(count(lit(1)), count_distinct(col("id"))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Store maintenance: drop the duplicate signature rows that
    * foreachBatch replays accumulate — dedupe by (id, table, bucket),
    * rewrite via the crash-safe bak-swap. A replayed batch leaves the
    * compacted store's row count unchanged. Single-writer: run between
    * batches, not during one.
    */
  def compactStore(): Unit = {
    val live = Paths.get(storePath)
    if (!Files.exists(live)) return
    store().dropDuplicates("id", "table", "bucket")
      .write.mode(SaveMode.Overwrite).parquet(StoreSwap.stagePath(live).toString)
    StoreSwap.swapIn(live)
  }
}
