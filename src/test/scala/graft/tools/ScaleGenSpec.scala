package graft.tools

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.{Dedup, Similarity}

/** ScaleGen builds the sf1 bench inputs; the scale evidence in SCALE.md
  * rests on its two invariants, so they are pinned here on a tiny
  * source (sf0.001):
  *
  *  1. work preservation — row counts scale exactly by the factor, key
  *     spaces of different replicas are disjoint, join fan-out survives
  *     (every orders row still finds its customer);
  *  2. dedup-structure preservation — the per-replica token rename and
  *     Rademacher sign flip keep intra-replica Jaccard / cosine
  *     structure EXACTLY while creating no cross-replica near-dups.
  */
class ScaleGenSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val src = "/root/testdata/sf0.001"
  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("graft_scalegen_").toString
    ScaleGen.scale(spark, src, d, factor = 3)
    d
  }

  private def cnt(dir: String, name: String): Long =
    spark.read.parquet(s"$dir/$name.parquet").count()

  test("fact tables scale by the factor; fixed dims copy verbatim") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "documents", "embeddings"))
      assert(cnt(dst, t) == 3 * cnt(src, t), t)
    for (t <- Seq("region", "nation"))
      assert(cnt(dst, t) == cnt(src, t), t)
  }

  test("replica key spaces are disjoint and joins survive the shift") {
    val orders = spark.read.parquet(s"$dst/orders.parquet")
    val cust = spark.read.parquet(s"$dst/customer.parquet")
    // every order finds exactly its customer (fan-out preserved)
    val matched = orders.join(cust,
      orders("o_custkey") === cust("c_custkey"), "left_anti").count()
    assert(matched == 0, s"$matched orders lost their customer")
    // keys of replica i live in [i*OFF, (i+1)*OFF): the in-band offsets
    // must be exactly the source key set, and no key may exceed band 2
    val srcKeys = spark.read.parquet(s"$src/customer.parquet")
      .select("c_custkey").as[Long].collect().toSet
    val offsets = cust.select((col("c_custkey") % ScaleGen.KeyOffset))
      .as[Long].collect().toSet
    assert(offsets == srcKeys, "in-band offsets must equal the source key set")
    assert(cust.filter(col("c_custkey") >= 3 * ScaleGen.KeyOffset).count() == 0)
    assert(cust.select((col("c_custkey") / ScaleGen.KeyOffset).cast("int"))
      .distinct().count() == 3, "three disjoint replica key spaces")
  }

  test("events.ts stays a raw int64 of nanos (loader-compatible)") {
    val schema = spark.read.parquet(s"$dst/events.parquet").schema
    assert(schema("ts").dataType ==
      org.apache.spark.sql.types.LongType, schema("ts").dataType.toString)
  }

  test("documents: intra-replica Jaccard preserved exactly, cross-replica collapsed") {
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    // replica 1 of docs 0 and 1 vs originals: the rename is a pure
    // function of (token, replica), so J(doc0', doc1') == J(doc0, doc1)
    val ids = Seq(0L, 1L, ScaleGen.KeyOffset, ScaleGen.KeyOffset + 1)
    val sh = Dedup.shingleTable(
        docs.filter(col("doc_id").isin(ids: _*)), "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    def j(a: Set[String], b: Set[String]): Double =
      if ((a ++ b).isEmpty) 0.0 else a.intersect(b).size.toDouble / (a ++ b).size
    val intraSrc = j(sh(0L), sh(1L))
    val intraRep = j(sh(ScaleGen.KeyOffset), sh(ScaleGen.KeyOffset + 1L))
    assert(math.abs(intraSrc - intraRep) < 1e-12,
      s"intra-replica Jaccard must be preserved: $intraSrc vs $intraRep")
    // the same doc across replicas must NOT be a near-dup
    val cross = j(sh(0L), sh(ScaleGen.KeyOffset))
    assert(cross < 0.3, s"cross-replica Jaccard must collapse, got $cross")
  }

  test("embeddings: sign flip preserves intra-replica cosines exactly, kills cross") {
    val emb = spark.read.parquet(s"$dst/embeddings.parquet")
    val ids = Seq(0L, 1L, ScaleGen.KeyOffset, ScaleGen.KeyOffset + 1)
    val vecs = emb.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val n = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (n == 0) 0 else d / n
    }
    val intraSrc = cos(vecs(0L), vecs(1L))
    val intraRep = cos(vecs(ScaleGen.KeyOffset), vecs(ScaleGen.KeyOffset + 1L))
    assert(math.abs(intraSrc - intraRep) < 1e-9,
      s"reflection must preserve cosines: $intraSrc vs $intraRep")
    // norms preserved exactly (orthogonal transform)
    assert(math.abs(
      math.sqrt(vecs(0L).map(x => x * x).sum) -
        math.sqrt(vecs(ScaleGen.KeyOffset).map(x => x * x).sum)) < 1e-9)
    // the same vector across replicas is no longer a near neighbor
    val cross = math.abs(cos(vecs(0L), vecs(ScaleGen.KeyOffset)))
    assert(cross < 0.9, s"cross-replica cosine should drop well below 1: $cross")
  }

  test("near-dup operators see identical structure per replica") {
    // run the actual MinHash near-dup pipeline per replica: the pair
    // sets must be the shift-image of each other and nothing may pair
    // across replicas
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id",
        threshold = 0.5, shingleK = 3, numHashes = 16, bands = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val off = ScaleGen.KeyOffset
    def rep(p: (Long, Long)): (Long, Long) = (p._1 / off, p._2 / off)
    assert(pairs.forall(p => rep(p)._1 == rep(p)._2),
      s"cross-replica near-dup pairs must not exist: ${pairs.filter(p => rep(p)._1 != rep(p)._2).take(5)}")
    val r0 = pairs.filter(rep(_) == ((0L, 0L)))
    val r1 = pairs.filter(rep(_) == ((1L, 1L))).map(p => (p._1 - off, p._2 - off))
    val r2 = pairs.filter(rep(_) == ((2L, 2L))).map(p => (p._1 - 2 * off, p._2 - 2 * off))
    assert(r1 == r0 && r2 == r0,
      s"per-replica pair sets must be shift-images: r0=${r0.size} r1=${r1.size} r2=${r2.size}")
  }

  test("embedding near-dup pairs are shift-images per replica too") {
    val emb = spark.read.parquet(s"$dst/embeddings.parquet")
    val pairs = Similarity.exactNearDupPairs(emb, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val off = ScaleGen.KeyOffset
    val intra = pairs.filter(p => p._1 / off == p._2 / off)
    val r0 = intra.filter(_._1 < off)
    val r1 = intra.filter(p => p._1 >= off && p._1 < 2 * off)
      .map(p => (p._1 - off, p._2 - off))
    assert(r0 == r1, s"replica pair sets differ: ${r0.size} vs ${r1.size}")
  }
}
