package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling
  * (spark.sql.adaptive.skewJoin.enabled, on by default) is the first
  * line of defense and needs no code; explicit salting remains useful
  * when the build side must be replicated deterministically (e.g. a
  * hot-key dimension join inside a streaming foreachBatch, where AQE
  * replanning is unavailable) or when a single key exceeds what one
  * task can hold even after AQE splitting.
  */
object Skew {

  /** Salted equi-join: the (large, skewed) `big` side gets a pseudo-
    * random salt in [0, salts); the `small` side is replicated once per
    * salt value. Equal keys still meet (every salt of a key sees the
    * full small-side slice for that key), but a hot key's rows now
    * spread over `salts` reducer partitions instead of one.
    *
    * Cost model: small side shuffles x salts — only worth it when the
    * small side is actually small and the big side's key skew is the
    * bottleneck.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // outer-on-the-small-side joins would emit one null-extended copy
    // per salt for unmatched small rows — reject them
    val supported = Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")
    require(supported.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/semi/anti/cross, not $joinType")
    // per-row salt: hash of a nondeterministic row id — spreads even
    // identical rows; nondeterminism is fine (any assignment is correct)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // hash join, not sort-merge: the small side is small BY CONTRACT
    // (that's when salting pays — see the cost model above), so
    // building a hash map per partition beats range-sorting the big
    // side, which is exactly the work salting exists to spread.
    // Measured at the 60M-event fixture: the SMJ plan sorted the
    // entire big side per partition for a join whose build side is
    // ~1/40th of it.
    saltedBig.join(replicatedSmall.hint("shuffle_hash"),
      keys :+ "__salt", joinType).drop("__salt")
  }

  /** Default hot-cell granule for [[adviseSalts]]: ~50k rows of a
    * narrow fact projection is ~2 MB of shuffle block — small enough
    * that no single (key, salt) cell dominates a task, large enough
    * that the salt replication tax on the small side stays trivial.
    */
  val defaultHotCellRows: Long = 50000L

  /** Measured salt suggestion from catalog sizing (round-15 task 8):
    * size `salts` so the HOTTEST key's rows split into cells of at
    * most ~`hotCellRows`, rounded up to a power of two (salting
    * composes with hash partitioning, and a pow2 keeps the modulo
    * cheap and the suggestion stable under small stat drift).
    *
    * The hottest-key estimate takes the LARGER of two lower bounds
    * the catalog records: the accumulated per-batch max (exact after
    * any rewrite) and rows/keys (the uniform floor — on the 60M-event
    * fixture, where every user is equally hot, it IS the max). On the
    * 60M-row / ~150-key events table this yields
    * ceil(400k / 50k) = 8 — exactly the hand-tuned value
    * q_skew_salted_join shipped with (SaltAdviceSpec pins it).
    * Unsalted data (hot key under one cell) advises 1 = no salting.
    * Advisory, not binding: the caller still owns the trade against
    * its small side's replication cost.
    */
  def adviseSalts(rows: Long, keysApprox: Long, maxKeyRows: Long,
                  hotCellRows: Long = defaultHotCellRows): Int = {
    require(hotCellRows > 0, "hotCellRows must be positive")
    val uniformFloor = rows / math.max(1L, keysApprox)
    val hottest = math.max(maxKeyRows, uniformFloor)
    val raw = math.max(1L, (hottest + hotCellRows - 1) / hotCellRows)
    val capped = math.min(raw, 256L)
    Integer.highestOneBit(capped.toInt) match {
      case h if h == capped => h
      case h => h * 2
    }
  }
}
