package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata structs. Container-header METADATA is
  * REAL on the batched path (PNG/GIF/JPEG dimensions, WAV sample
  * rate/frames — public format specs, parsed from bytes below); only
  * pixel/sample CONTENT work (the embedding) is a deterministic stub,
  * since this container has no model runtime. The Spark-side plumbing
  * — schema, partitioning, batched processing shape — is real.
  *
  * At scale, media processing is partition-bound CPU work: the operators
  * here keep bytes inside executors (no collect), process per-partition
  * (mapPartitions-equivalent batching via codegen expressions where
  * possible), and emit narrow metadata rows so downstream shuffles never
  * carry the blobs.
  */
object Multimodal {

  /** Typed metadata schema attached to every media column. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("byte_size", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType)))

  /** Sniff a container format from magic bytes — real logic (public
    * magic numbers), works on any binary column.
    */
  def sniffFormat(bytes: Column): Column = {
    val head = hex(substring(bytes, 1, 8))
    when(head.startsWith("89504E47"), "png")
      .when(head.startsWith("FFD8FF"), "jpeg")
      .when(head.startsWith("47494638"), "gif")
      .when(head.startsWith("52494646"), "riff") // wav/avi container
      // mp4: 'ftyp' box sits AFTER the 4-byte size, i.e. bytes 4-7
      .when(substring(head, 9, 8) === "66747970", "mp4")
      .when(head.startsWith("494433"), "mp3")
      .when(head.startsWith("25504446"), "pdf")
      .otherwise("unknown")
  }

  /** STUB decode: deterministic fake dimensions derived from content
    * hash — stands in for an image decoder (the real one would be a
    * mapInPandas/JNI call; the schema and batch shape are identical).
    */
  def decodeImageMeta(bytes: Column): Column = struct(
    sniffFormat(bytes).as("format"),
    length(bytes).cast("long").as("byte_size"),
    (pmod(xxhash64(bytes), lit(1920)) + 32).cast("int").as("width"),
    (pmod(xxhash64(md5(bytes)), lit(1080)) + 32).cast("int").as("height"),
    lit(1).as("n_frames"),
    lit(null).cast("int").as("sample_rate"))

  /** STUB feature extraction: fixed-dim pseudo-embedding from content
    * bytes (deterministic). Real impl swaps in a model UDF with the
    * same signature: binary -> array<float>.
    */
  def fakeEmbedding(bytes: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(concat(md5(bytes), i.cast("string"))), lit(2000)).cast("double") - 1000.0) / 1000.0)

  /** STUB frame sampling plan for video: every `stride`-th frame index
    * up to n_frames — emits the (frame_idx) rows a real decoder would
    * fill with pixels. Keeps the explode-shape and row-count contract.
    */
  def sampleFrameIdx(nFrames: Column, stride: Int): Column =
    filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
      i => pmod(i, lit(stride)) === 0)

  /** Resize plan: target dimensions preserving aspect ratio with the
    * long edge capped at maxDim — the real (non-stub) geometry half of
    * an image resize; the pixel work would happen in [[decodeBatch]].
    */
  def resizePlan(width: Column, height: Column, maxDim: Int): Column = {
    val longEdge = greatest(width, height)
    val scale = when(longEdge <= maxDim, lit(1.0))
      .otherwise(lit(maxDim).cast("double") / longEdge.cast("double"))
    struct(
      round(width.cast("double") * scale).cast("int").as("out_w"),
      round(height.cast("double") * scale).cast("int").as("out_h"),
      round(scale, 6).as("scale"))
  }

  /** STUB audio metadata: deterministic fake duration/sample-rate from
    * content hash; format sniffing is real.
    */
  def decodeAudioMeta(bytes: Column): Column = struct(
    sniffFormat(bytes).as("format"),
    length(bytes).cast("long").as("byte_size"),
    lit(null).cast("int").as("width"),
    lit(null).cast("int").as("height"),
    (pmod(xxhash64(bytes), lit(90000)) + 1000).cast("int").as("n_frames"),
    array(lit(16000), lit(22050), lit(44100))
      .getItem(pmod(xxhash64(md5(bytes)), lit(3)).cast("int")).as("sample_rate"))

  /** Attach media metadata to a binary-column DataFrame and project the
    * narrow analytics view (blobs dropped before any shuffle).
    */
  def mediaCatalog(df: DataFrame, bytesCol: String, idCol: String): DataFrame =
    df.select(col(idCol), decodeImageMeta(col(bytesCol)).as("meta"))
      .select(col(idCol), col("meta.format").as("format"),
        col("meta.byte_size").as("byte_size"),
        col("meta.width").as("width"), col("meta.height").as("height"))

  // ---- batched per-partition decode path ----

  case class MediaRow(id: Long, content: Array[Byte])

  case class DecodedMedia(id: Long, format: String, byte_size: Long,
                          width: Int, height: Int, n_frames: Int,
                          sample_rate: Int, embedding: Array[Float])

  /** Per-partition batched decode: the Scala analogue of the Python
    * mapInPandas pattern — an iterator-to-iterator transform that never
    * materializes the partition, so executor memory stays bounded by
    * one media item regardless of partition size. A real pixel/sample
    * decoder would replace only the interior of `decodeOne`; the
    * schema, partitioning, and batch shape here are the production
    * plumbing.
    */
  def decodeBatch(ds: Dataset[MediaRow], embeddingDim: Int = 16): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition init cost (model load, decoder handle) would sit
      // here, amortized across the partition's rows
      rows.map(r => decodeOne(r, embeddingDim))
    }
  }

  /** Single-item decode. The container METADATA is REAL: PNG/GIF/JPEG
    * dimensions and WAV sample rate / frame count parse straight from
    * the container headers below (public format specs, no media libs
    * needed). Only the pixel/sample CONTENT work remains stubbed: the
    * embedding is a deterministic fake (this container has no model
    * runtime), and inputs whose headers are absent or truncated fall
    * back to deterministic content-hash geometry so the pipeline
    * plumbing stays testable on synthetic blobs.
    */
  private def decodeOne(r: MediaRow, dim: Int): DecodedMedia = {
    val bytes = if (r.content == null) Array.emptyByteArray else r.content
    val h = java.util.Arrays.hashCode(bytes).toLong & 0xFFFFFFFFL
    val fmt = sniffFormatBytes(bytes)
    val emb = Array.tabulate(dim)(i =>
      (((h * 6364136223846793005L + i * 1442695040888963407L) >>> 40) % 2000 - 1000) / 1000.0f)
    val real: Option[(Int, Int, Int, Int)] = fmt match {
      case "png" => pngDims(bytes).map { case (w, hh) => (w, hh, 1, 0) }
      case "gif" => gifDims(bytes).map { case (w, hh) => (w, hh, 1, 0) }
      case "jpeg" => jpegDims(bytes).map { case (w, hh) => (w, hh, 1, 0) }
      case "riff" => wavMeta(bytes).map { case (sr, nf) => (0, 0, nf, sr) }
      case _ => None
    }
    val (w, hh, nf, sr) = real.getOrElse(
      ((h % 1920 + 32).toInt, ((h / 1920) % 1080 + 32).toInt, 1, 0))
    DecodedMedia(r.id, fmt, bytes.length.toLong, w, hh, nf, sr, emb)
  }

  // ---- real container-header parsers (format specs are public) ----

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** PNG: IHDR is the first chunk — width/height big-endian at bytes
    * 16–23 (spec: 8-byte signature, 4-byte length, "IHDR").
    */
  private[ops] def pngDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16).toInt, be32(b, 20).toInt))
    else None

  /** GIF: logical screen width/height little-endian at bytes 6–9. */
  private[ops] def gifDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 10) Some((le16(b, 6), le16(b, 8))) else None

  /** JPEG: walk the marker segments to the first SOFn frame header
    * (0xC0–0xCF excluding C4/C8/CC); height BE at +5, width BE at +7
    * from the marker byte pair.
    */
  private[ops] def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2 // past FFD8
    while (i + 9 < b.length) {
      if (u8(b, i) != 0xFF) return None
      val marker = u8(b, i + 1)
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD9)) {
        i += 2 // standalone marker, no length field
      } else {
        val len = be16(b, i + 2)
        if (len < 2) return None
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (i + 9 <= b.length)
            return Some((be16(b, i + 7), be16(b, i + 5)))
          return None
        }
        i += 2 + len
      }
    }
    None
  }

  /** WAV (RIFF/WAVE): walk the chunk list for "fmt " (sample rate LE
    * at +4, block align LE at +12 inside the chunk body) and "data"
    * (frame count = chunk size / block align).
    */
  private[ops] def wavMeta(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 12 || !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
      return None
    var i = 12
    var sampleRate = -1
    var blockAlign = -1
    var dataSize = -1L
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = le32(b, i + 4)
      if (id == "fmt " && i + 8 + 14 <= b.length) {
        sampleRate = le32(b, i + 12).toInt
        blockAlign = le16(b, i + 20)
      } else if (id == "data") {
        dataSize = size
      }
      if (size < 0 || size > b.length) return None // corrupt size field
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (sampleRate > 0) {
      val frames = if (dataSize >= 0 && blockAlign > 0)
        (dataSize / blockAlign).toInt else 0
      Some((sampleRate, frames))
    } else None
  }

  /** Magic-byte sniffing on raw bytes (same table as [[sniffFormat]]). */
  private def sniffFormatBytes(b: Array[Byte]): String = {
    def at(i: Int): Int = if (i < b.length) b(i) & 0xFF else -1
    if (at(0) == 0x89 && at(1) == 0x50 && at(2) == 0x4E && at(3) == 0x47) "png"
    else if (at(0) == 0xFF && at(1) == 0xD8 && at(2) == 0xFF) "jpeg"
    else if (at(0) == 0x47 && at(1) == 0x49 && at(2) == 0x46 && at(3) == 0x38) "gif"
    else if (at(0) == 0x52 && at(1) == 0x49 && at(2) == 0x46 && at(3) == 0x46) "riff"
    else if (at(4) == 0x66 && at(5) == 0x74 && at(6) == 0x79 && at(7) == 0x70) "mp4"
    else if (at(0) == 0x49 && at(1) == 0x44 && at(2) == 0x33) "mp3"
    else if (at(0) == 0x25 && at(1) == 0x50 && at(2) == 0x44 && at(3) == 0x46) "pdf"
    else "unknown"
  }
}
