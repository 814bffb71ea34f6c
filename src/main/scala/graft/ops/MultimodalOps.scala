package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: media travel as
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run as batched partition-level kernels
  * (`mapPartitions` — the Scala analog of `mapInPandas`: one kernel init
  * per partition, batch-shaped work per row).
  *
  * The actual codec step is STUBBED (no image/audio libraries ship in this
  * container): [[StubCodec.decode]] derives deterministic pseudo-features
  * from the payload bytes. The Spark-side plumbing — schema, partitioning,
  * kernel signature, batch shape — is real and tested; swapping the stub
  * for a JNI/javax.imageio decoder changes one function.
  */
object MultimodalOps {

  /** Typed metadata carried next to every media payload. */
  final case class MediaMeta(
      mime: String, width: Int, height: Int, durationMs: Long, nFrames: Int)

  final case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      media_id: Long, mime: String, width: Int, height: Int,
      feature: Array[Float], payload_hash: Long)

  final case class FrameRow(
      media_id: Long, frame_no: Int, ts_ms: Long, frame_payload: Array[Byte])

  implicit val mediaRowEnc: org.apache.spark.sql.Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val mediaFeaturesEnc: org.apache.spark.sql.Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit val frameRowEnc: org.apache.spark.sql.Encoder[FrameRow] = Encoders.product[FrameRow]

  /** STUB decoder — deterministic fake standing in for the real codec
    * (??? boundary). Produces a `dim`-length feature from payload bytes. */
  object StubCodec {
    def decode(payload: Array[Byte], dim: Int = 16): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < payload.length) {
        h = graft.gen.InputGen.mix(h ^ payload(i))
        out(i % dim) += ((h & 0xffff) / 65535.0f - 0.5f)
        i += 1
      }
      out
    }
    def payloadHash(payload: Array[Byte]): Long = {
      var h = 0L
      payload.foreach(b => h = graft.gen.InputGen.mix(h ^ b))
      h
    }
  }

  /** Decode + feature-extract: batched per partition (codec init amortized,
    * mirroring the reference's client-per-thread shape, inference.py:12-49). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] =
    media.mapPartitions { iter =>
      // per-partition "codec" init happens here (stubbed)
      iter.map { m =>
        MediaFeatures(m.media_id, m.meta.mime, m.meta.width, m.meta.height,
          StubCodec.decode(m.payload, dim), StubCodec.payloadHash(m.payload))
      }
    }

  /** Resize plumbing: rewrites the metadata through the reference's
    * smart_resize geometry (image_utils.py:29-63) — the raster op itself is
    * behind the stub boundary. */
  def withResizedDims(df: DataFrame, widthCol: String, heightCol: String): DataFrame = {
    val resize = udf { (h: Int, w: Int) =>
      try { val (hb, wb) = graft.kernel.Geometry.smartResize(h.toLong, w.toLong); Some((hb.toInt, wb.toInt)) }
      catch { case _: graft.kernel.Geometry.AspectRatioError => None }
    }
    df.withColumn("__r", resize(col(heightCol), col(widthCol)))
      .withColumn("resized_height", col("__r._1"))
      .withColumn("resized_width", col("__r._2"))
      .drop("__r")
  }

  /** Frame sampling: every `everyMs` milliseconds across the clip — pure
    * relational fan-out (sequence + explode), frame decode stubbed as a
    * deterministic byte slice. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameRow] =
    media.flatMap { m =>
      val n = math.max(1, (m.meta.durationMs / math.max(1L, everyMs)).toInt)
      (0 until math.min(n, m.meta.nFrames.max(1))).map { f =>
        val ts = f * everyMs
        val start = if (m.payload.isEmpty) 0 else (f * 97) % math.max(1, m.payload.length)
        val len = math.min(64, m.payload.length - start)
        FrameRow(m.media_id, f, ts, m.payload.slice(start, start + math.max(0, len)))
      }
    }

  /** Deterministic synthetic media table for tests/bench. */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rng = new graft.gen.InputGen.Rng(seed, i, 5L)
      val kind = rng.nextInt(3)
      val (mime, w, h, dur, frames) = kind match {
        case 0 => ("image/png", 640 + rng.nextInt(1280), 480 + rng.nextInt(960), 0L, 1)
        case 1 => ("audio/wav", 0, 0, 1000L + rng.nextInt(60000), 0)
        case _ => ("video/mp4", 1280, 720, 1000L + rng.nextInt(30000), 24 + rng.nextInt(240))
      }
      val payload = new Array[Byte](256 + rng.nextInt(1024))
      var j = 0
      while (j < payload.length) { payload(j) = (rng.nextLong() & 0xff).toByte; j += 1 }
      MediaRow(i, payload, MediaMeta(mime, w, h, dur, frames))
    }
  }
}
