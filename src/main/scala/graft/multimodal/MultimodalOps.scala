package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Typed media metadata carried beside the opaque payload. */
case class MediaMeta(width: Int, height: Int, channels: Int,
    sample_rate: Int, duration_ms: Long)

case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
    meta: MediaMeta)

case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
    features: Array[Float])

case class FrameRow(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

/** F-family: multimodal columns — image/audio/video as opaque binary
  * with typed metadata.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC STUB (`fakeDecode`): it hashes payload bytes into a
  * fixed-width feature vector. Everything around it — schema, typed
  * Dataset plumbing, per-partition batching (the mapInPandas batch
  * shape), frame-sampling explode, resize metadata contract — is real
  * and is what a production codec would drop into.
  */
object MultimodalOps {

  val FeatureDim = 16

  /** STUB for the codec: deterministic bytes -> feature vector.
    * Replace with a real decoder (JNI/opencv/ffmpeg) in production.
    */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var d = 0
    while (d < FeatureDim) {
      val x = h ^ (0x9e3779b97f4a7c15L * (d + 1))
      out(d) = ((x % 1000L) / 1000.0).toFloat
      d += 1
    }
    out
  }

  /** Media table synthesized from documents: payload = utf-8 text bytes
    * (opaque stand-in), kind round-robins image/audio/video.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, n) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind, text.getBytes("UTF-8"),
          MediaMeta(width = 64 + (id % 4).toInt * 32,
            height = 64 + (id % 3).toInt * 32,
            channels = 3, sample_rate = 16000, duration_ms = n * 10))
      }
  }

  /** Feature extraction over batched partitions — the Spark-side shape
    * of a mapInPandas/Arrow pipeline: one kernel invocation per
    * partition iterator, not per row.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong,
          fakeDecode(m.bytes))
      }
    }
  }

  /** Frame sampling: one row per sampled frame (every `stride`-th),
    * explode stays executor-local (no shuffle).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val nFrames = math.max(1, (m.meta.duration_ms / 1000L).toInt)
      (0 until nFrames by stride).map { f =>
        // STUB frame decode: slice of payload stands in for pixels
        val start = math.min(f * 8, math.max(0, m.bytes.length - 8))
        FrameRow(m.media_id, f,
          java.util.Arrays.copyOfRange(m.bytes, start,
            math.min(start + 8, m.bytes.length)))
      }
    }
  }

  /** Resize contract: pure metadata transform (a real kernel would
    * also rewrite bytes); keeps aspect-ratio bookkeeping honest.
    */
  def resizeMeta(media: Dataset[MediaRow], targetW: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val scale = targetW.toDouble / m.meta.width
      m.copy(meta = m.meta.copy(width = targetW,
        height = math.max(1, math.round(m.meta.height * scale).toInt)))
    }
  }

  /** Per-media decoded features as scalar columns (f0..f15) — the
    * oracle-checked face of the decode plumbing: the DuckDB oracle
    * replicates fakeDecode's 31-polynomial hash + xor/mod arithmetic,
    * so a hash match proves the batched decode path end-to-end
    * (synthesis → mapPartitions kernel → schema) bit-for-bit.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = extractFeatures(mediaTable(spark, dir)).toDF()
    feats.select(
      col("media_id") +: col("kind") +: col("n_bytes") +:
      (0 until FeatureDim).map(i =>
        element_at(col("features"), i + 1).as(s"f$i")): _*)
      .orderBy("media_id")
  }

  /** Summary DataFrame (used as a rows-only verify query). */
  def mediaFeatureStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaTable(spark, dir))
      .groupBy(col("kind"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum(col("n_bytes")).cast(LongType).as("total_bytes"))
      .orderBy("kind")
  }
}
