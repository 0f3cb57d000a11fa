package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video travel as opaque BINARY columns with typed metadata, and the
  * compute-heavy steps run batched per partition. The decode kernels are
  * STUBS by design — the container ships no image/audio codecs — but the
  * Spark-side contract (schema, batching, partitioning, deterministic
  * output) is real and tested; swapping `fakeDecode` for a JNI/codec call
  * changes no plan shape.
  *
  * (Beyond the reference surface — vers is vectors-only — per the
  * driver's north star.)
  */
object Multimodal {

  /** Canonical media schema. `meta` fields are nullable by modality. */
  case class MediaRow(id: Long, content: Array[Byte], media_type: String,
                      width: Int, height: Int, channels: Int,
                      sample_rate: Int, n_frames: Int)

  case class MediaFeature(id: Long, media_type: String, feature: Array[Float])

  /** STUB decode+featurize kernel: a deterministic PRNG seeded from the
    * content bytes stands in for a real decoder+encoder. Replace the body
    * with the actual codec; the signature (bytes → unit-norm float[dim])
    * is the real contract. */
  private[graft] def fakeDecode(content: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L // deterministic content hash (FNV-ish)
    var i = 0
    while (i < content.length) { h = h * 31 + (content(i) & 0xff); i += 1 }
    val rnd = new scala.util.Random(h)
    val raw = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val norm = math.sqrt(raw.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
    if (norm < 1e-6f) raw else raw.map(_ / norm)
  }

  /** Batched feature extraction: one partition = one batch, kernel called
    * per row inside `mapPartitions` (no per-row task overhead; the shape
    * a vectorized/native decoder needs). Output embeds straight into the
    * engine's index/dedup/similarity operators. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(r => MediaFeature(r.id, r.media_type, fakeDecode(r.content, dim)))
    }
  }

  /** STUB resize: metadata transform only (a real implementation rewrites
    * `content`; plan shape identical). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(width = w, height = h))
  }

  /** Frame sampling for video rows: emits `n` (frame_idx, byte-offset
    * slice) rows per video via posexplode — real distributed fan-out
    * plumbing; the slice bounds are what a real demuxer would seek. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media
      .filter(col("media_type") === "video")
      .select(col("id"), length(col("content")).as("total"),
        posexplode(sequence(lit(0), lit(n - 1))).as(Seq("ord", "frame_idx")))
      .withColumn("byte_offset", (col("frame_idx") * col("total")) / lit(n))
      .select(col("id"), col("frame_idx"),
        col("byte_offset").cast("long").as("byte_offset"))

  /** Wrap a text table as a media table (utf-8 bytes) — lets the binary
    * plumbing run against the driver's documents fixture. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("id"),
      encode(col("text"), "utf-8").cast("binary").as("content"),
      lit("text").as("media_type"),
      lit(0).as("width"), lit(0).as("height"), lit(0).as("channels"),
      lit(0).as("sample_rate"), lit(0).as("n_frames"))
}
