package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata structs. The decode step is STUBBED
  * (no image/audio libs in this container — the fake is deterministic
  * over the bytes); the Spark-side plumbing — schema, partitioning,
  * batched processing shape — is real.
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
      .when(head.startsWith("66747970"), "mp4")
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

  /** Attach media metadata to a binary-column DataFrame and project the
    * narrow analytics view (blobs dropped before any shuffle).
    */
  def mediaCatalog(df: DataFrame, bytesCol: String, idCol: String): DataFrame =
    df.select(col(idCol), decodeImageMeta(col(bytesCol)).as("meta"))
      .select(col(idCol), col("meta.format").as("format"),
        col("meta.byte_size").as("byte_size"),
        col("meta.width").as("width"), col("meta.height").as("height"))
}
