package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MultimodalSkewSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 1, 2, 3, 4)
  private val pdf = "%PDF-1.4 something".getBytes("UTF-8")

  test("sniffFormat detects magic bytes (expression form)") {
    val df = Seq((1L, png), (2L, pdf), (3L, Array[Byte](0, 0)))
      .toDF("id", "b")
    val r = df.select(Multimodal.sniffFormat(col("b"))).as[String].collect()
    assert(r.toSeq == Seq("png", "pdf", "unknown"))
  }

  test("mediaCatalog yields narrow metadata rows without blobs") {
    val out = Multimodal.mediaCatalog(
      Seq((1L, png)).toDF("id", "b"), "b", "id")
    assert(out.columns.toSeq == Seq("id", "format", "byte_size", "width", "height"))
    val row = out.collect()(0)
    assert(row.getAs[String]("format") == "png")
    assert(row.getAs[Long]("byte_size") == png.length.toLong)
    assert(row.getAs[Int]("width") >= 32)
  }

  test("decodeBatch (mapPartitions path) is deterministic and batched") {
    val ds = Seq(Multimodal.MediaRow(1L, png), Multimodal.MediaRow(2L, pdf)).toDS()
    val out1 = Multimodal.decodeBatch(ds, 8).collect().sortBy(_.id)
    val out2 = Multimodal.decodeBatch(ds, 8).collect().sortBy(_.id)
    assert(out1.map(_.format).toSeq == Seq("png", "pdf"))
    assert(out1.map(_.embedding.toSeq).toSeq == out2.map(_.embedding.toSeq).toSeq)
    assert(out1.forall(_.embedding.length == 8))
  }

  test("sampleFrameIdx plans every stride-th frame") {
    val idx = Seq(10).toDF("n")
      .select(Multimodal.sampleFrameIdx(col("n"), 3)).as[Seq[Long]].collect()(0)
    assert(idx == Seq(0L, 3L, 6L, 9L))
  }

  test("resizePlan caps the long edge and preserves aspect ratio") {
    val df = Seq((1920, 1080), (100, 50)).toDF("w", "h")
    val r = df.select(Multimodal.resizePlan(col("w"), col("h"), 512).as("p"))
      .select("p.out_w", "p.out_h", "p.scale")
      .as[(Int, Int, Double)].collect()
    assert(r(0) == ((512, 288, 0.266667)))
    assert(r(1) == ((100, 50, 1.0))) // under the cap: untouched
  }

  test("decodeAudioMeta yields deterministic typed metadata") {
    val a = "ID3audio-bytes".getBytes("UTF-8")
    val r1 = Seq(Tuple1(a)).toDF("b")
      .select(Multimodal.decodeAudioMeta(col("b")).as("m"))
      .select("m.format", "m.sample_rate", "m.n_frames")
      .as[(String, Int, Int)].collect()(0)
    assert(r1._1 == "mp3")
    assert(Seq(16000, 22050, 44100).contains(r1._2))
    assert(r1._3 >= 1000)
  }

  test("saltedJoin matches plain join semantics (inner and left)") {
    val big = Seq((1, "a1"), (1, "a2"), (1, "a3"), (2, "b"), (3, "c"))
      .toDF("k", "v")
    val small = Seq((1, "X"), (2, "Y")).toDF("k", "w")
    for (jt <- Seq("inner", "left")) {
      val expected = big.join(small, Seq("k"), jt)
        .orderBy("k", "v").collect().toSeq
      val got = Skew.saltedJoin(big, small, Seq("k"), salts = 4, joinType = jt)
        .orderBy("k", "v").collect().toSeq
      assert(got == expected, s"join type $jt")
    }
  }
}
