package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal column handling for training-data pipelines: media travel as
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run as batched partition-level kernels
  * (`mapPartitions` — the Scala analog of `mapInPandas`: one kernel init
  * per partition, batch-shaped work per row).
  *
  * The codecs are REAL, using only the JDK (no external libraries ship in
  * this container): PNG/JPEG via `javax.imageio`, PCM WAV via
  * `javax.sound.sampled`, and "video" as a length-prefixed container of
  * PNG frames (a motion-PNG toy format this module defines — real mp4/
  * h264 demuxing would need native codecs and stays a documented
  * non-goal). Decode failures become typed error rows, never task
  * failures — mirroring the extraction pipeline's error contract.
  */
object MultimodalOps {

  /** Typed metadata carried next to every media payload. */
  final case class MediaMeta(
      mime: String, width: Int, height: Int, durationMs: Long, nFrames: Int)

  final case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      media_id: Long, mime: String, width: Int, height: Int,
      feature: Array[Float], payload_hash: Long, error: String)

  final case class FrameRow(
      media_id: Long, frame_no: Int, ts_ms: Long, frame_payload: Array[Byte],
      frame_width: Int, frame_height: Int)

  final case class ResizedMedia(
      media_id: Long, payload: Array[Byte], width: Int, height: Int,
      resized_width: Int, resized_height: Int, error: String)

  implicit val mediaRowEnc: org.apache.spark.sql.Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val mediaFeaturesEnc: org.apache.spark.sql.Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit val frameRowEnc: org.apache.spark.sql.Encoder[FrameRow] = Encoders.product[FrameRow]
  implicit val resizedEnc: org.apache.spark.sql.Encoder[ResizedMedia] = Encoders.product[ResizedMedia]

  /** JDK-backed codecs. Everything deterministic: fixed PNG writer, fixed
    * raster math, no wall-clock or RNG. */
  object Codec {

    // in-memory scratch staging for ImageIO streams (default is a temp
    // FILE per read/write) — byte-identical output, no per-call syscalls;
    // see the same init in graft.kernel.Raster
    ImageIO.setUseCache(false)

    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def decodeImage(payload: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) throw new IllegalArgumentException("undecodable image payload")
      img
    }

    /** Nearest-neighbor resample — exact integer source-pixel lookup, so
      * the result is bit-deterministic across JVMs (Graphics2D filtering
      * kernels are implementation-defined; NN is not). */
    def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        val sy = (y.toLong * img.getHeight / h).toInt
        var x = 0
        while (x < w) {
          val sx = (x.toLong * img.getWidth / w).toInt
          out.setRGB(x, y, img.getRGB(sx, sy))
          x += 1
        }
        y += 1
      }
      out
    }

    /** Grid mean-color features: `grid`×`grid` cells × RGB = feature dim.
      * The standard cheap visual descriptor for dedup/quality gating. */
    def imageFeatures(img: BufferedImage, grid: Int = 4): Array[Float] = {
      val out = new Array[Float](grid * grid * 3)
      val counts = new Array[Int](grid * grid)
      val w = img.getWidth; val h = img.getHeight
      var y = 0
      while (y < h) {
        val gy = math.min(y * grid / h, grid - 1)
        var x = 0
        while (x < w) {
          val gx = math.min(x * grid / w, grid - 1)
          val cell = gy * grid + gx
          val rgb = img.getRGB(x, y)
          out(cell * 3) += ((rgb >> 16) & 0xff)
          out(cell * 3 + 1) += ((rgb >> 8) & 0xff)
          out(cell * 3 + 2) += (rgb & 0xff)
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      var c = 0
      while (c < counts.length) {
        if (counts(c) > 0) {
          out(c * 3) /= counts(c); out(c * 3 + 1) /= counts(c); out(c * 3 + 2) /= counts(c)
        }
        c += 1
      }
      out
    }

    // ---- PCM16 mono WAV (RIFF) — hand-rolled writer, JDK reader ----

    def encodeWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    def decodeWavSamples(payload: Array[Byte]): (Array[Short], Float) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      val fmt = in.getFormat
      val bytes = in.readAllBytes()
      val n = bytes.length / 2
      val out = new Array[Short](n)
      val bb = java.nio.ByteBuffer.wrap(bytes).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < n) { out(i) = bb.getShort(); i += 1 }
      (out, fmt.getSampleRate)
    }

    /** Windowed RMS energy over `windows` equal slices of the clip. */
    def audioFeatures(samples: Array[Short], windows: Int = 16): Array[Float] = {
      val out = new Array[Float](windows)
      if (samples.isEmpty) return out
      var w = 0
      while (w < windows) {
        val from = (w.toLong * samples.length / windows).toInt
        val to = ((w + 1).toLong * samples.length / windows).toInt
        var acc = 0.0
        var i = from
        while (i < to) { val s = samples(i) / 32768.0; acc += s * s; i += 1 }
        out(w) = if (to > from) math.sqrt(acc / (to - from)).toFloat else 0f
        w += 1
      }
      out
    }

    // ---- toy video container: 4-byte frame count, then per frame
    //      4-byte length + PNG bytes (motion-PNG) ----

    def encodeVideo(frames: Seq[BufferedImage]): Array[Byte] = {
      val encoded = frames.map(encodePng)
      val bb = java.nio.ByteBuffer.allocate(4 + encoded.map(_.length + 4).sum)
      bb.putInt(encoded.length)
      encoded.foreach { f => bb.putInt(f.length); bb.put(f) }
      bb.array()
    }

    def videoFrameCount(payload: Array[Byte]): Int =
      java.nio.ByteBuffer.wrap(payload).getInt()

    def decodeVideoFrame(payload: Array[Byte], idx: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.wrap(payload)
      val n = bb.getInt()
      require(idx >= 0 && idx < n, s"frame $idx out of $n")
      // bound every declared length by the bytes actually present BEFORE
      // allocating — a torn or hostile container (declared len 2 GiB)
      // must throw a catchable IllegalArgumentException, never an OOM
      def boundedLen(): Int = {
        val len = bb.getInt()
        require(len >= 0 && len <= bb.remaining, s"frame length $len exceeds payload")
        len
      }
      var i = 0
      // read the length BEFORE the position getter — boundedLen() advances
      // the buffer past the 4-byte length field
      while (i < idx) { val len = boundedLen(); bb.position(bb.position() + len); i += 1 }
      val out = new Array[Byte](boundedLen())
      bb.get(out)
      out
    }

    /** P5 `to_rgb` (/root/reference/dots_ocr/utils/image_utils.py:74-80):
      * RGBA → RGB composited over a white background using the alpha
      * channel as mask (non-alpha images pass through as RGB). Semantic
      * port — PIL's exact per-pixel rounding is not byte-replicated
      * (raster parity is a documented non-goal); invariants (opaque
      * pixels unchanged, transparent pixels white) are test-pinned. */
    def toRgb(img: BufferedImage): BufferedImage = {
      if (!img.getColorModel.hasAlpha) {
        if (img.getType == BufferedImage.TYPE_INT_RGB) return img
        val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
        return out
      }
      val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val argb = img.getRGB(x, y)
          val a = (argb >>> 24) & 0xff
          val r = ((argb >> 16) & 0xff) * a / 255 + 255 * (255 - a) / 255
          val g = ((argb >> 8) & 0xff) * a / 255 + 255 * (255 - a) / 255
          val b = (argb & 0xff) * a / 255 + 255 * (255 - a) / 255
          out.setRGB(x, y, (math.min(r, 255) << 16) | (math.min(g, 255) << 8) | math.min(b, 255))
          x += 1
        }
        y += 1
      }
      out
    }

    /** P20 `read_image` display resize (/root/reference/dots_ocr/utils/
      * demo_utils/display.py:27-61): aspect-preserving resize where the
      * longer side becomes `max(w,h)` (use_native) or 1024; the shorter
      * side is `int(short * max_size / long)` — Python int() truncation.
      * Returns (resized, original_w, original_h). */
    def displayResize(img: BufferedImage, useNative: Boolean = false): (BufferedImage, Int, Int) = {
      val w = img.getWidth; val h = img.getHeight
      val maxSize = if (useNative) math.max(w, h) else 1024
      val (nw, nh) =
        if (w > h) (maxSize, (h.toLong * maxSize / w).toInt)
        else ((w.toLong * maxSize / h).toInt, maxSize)
      (resize(img, nw, nh), w, h)
    }

    def payloadHash(payload: Array[Byte]): Long = {
      var h = 0L
      payload.foreach(b => h = graft.gen.InputGen.mix(h ^ b))
      h
    }

    /** 64-bit difference hash (dHash) — the classic perceptual image
      * fingerprint: a 9×8 integer block-average grayscale grid, one bit
      * per horizontal neighbor comparison (bit `gy*8+gx` set iff cell
      * (gx+1,gy) is brighter than cell (gx,gy)). All-integer arithmetic
      * over the decoded raster (luma = (299r+587g+114b)/1000 summed per
      * block, floor-divided average), so the hash is bit-deterministic
      * across JVMs for lossless formats. Robust to re-encoding and small
      * edits: a perturbation confined to ONE grid cell can flip at most
      * its two adjacent comparisons (≤2 bits) — the basis of the
      * [[MultimodalOps.nearDupPairs64]] hamming guarantee tests. */
    def dHash64(img: BufferedImage): Long = {
      val rgb = toRgb(img)
      val w = rgb.getWidth; val h = rgb.getHeight
      val cells = new Array[Long](8 * 9) // row-major [gy][gx]
      var gy = 0
      while (gy < 8) {
        val y0 = math.min(gy * h / 8, h - 1)
        val y1 = math.max(y0 + 1, math.min((gy + 1) * h / 8, h))
        var gx = 0
        while (gx < 9) {
          val x0 = math.min(gx * w / 9, w - 1)
          val x1 = math.max(x0 + 1, math.min((gx + 1) * w / 9, w))
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val p = rgb.getRGB(x, y)
              sum += (299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
                114L * (p & 0xff)) / 1000L
              x += 1
            }
            y += 1
          }
          cells(gy * 9 + gx) = sum / ((x1 - x0).toLong * (y1 - y0))
          gx += 1
        }
        gy += 1
      }
      var hash = 0L
      gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          if (cells(gy * 9 + gx + 1) > cells(gy * 9 + gx))
            hash |= 1L << (gy * 8 + gx)
          gx += 1
        }
        gy += 1
      }
      hash
    }

    /** 64-bit audio envelope difference hash — [[dHash64]]'s temporal
      * analog: 65 equal time blocks of the PCM clip, per-block mean
      * absolute amplitude (integer sum, floor-divided), one bit per
      * neighbor comparison (bit `b` set iff block b+1 is louder than
      * block b). All-integer over the decoded samples, so the hash is
      * bit-deterministic across JVMs and survives the WAV encode/decode
      * round trip exactly (PCM16 is lossless). Same locality contract:
      * a perturbation confined to ONE time block can flip at most its
      * two adjacent comparisons (≤2 bits). Empty clips hash to 0. */
    def audioHash64(samples: Array[Short]): Long = {
      if (samples.isEmpty) return 0L
      val n = samples.length
      val means = new Array[Long](65)
      var b = 0
      while (b < 65) {
        val i0 = math.min(b * n / 65, n - 1)
        val i1 = math.max(i0 + 1, math.min((b + 1) * n / 65, n))
        var sum = 0L
        var i = i0
        while (i < i1) { sum += math.abs(samples(i).toLong); i += 1 }
        means(b) = sum / (i1 - i0)
        b += 1
      }
      var hash = 0L
      b = 0
      while (b < 64) {
        if (means(b + 1) > means(b)) hash |= 1L << b
        b += 1
      }
      hash
    }
  }

  /** Decode + feature-extract, dispatched on the mime column: images →
    * 4×4 grid mean-color (48-dim), audio → 16-window RMS, video → first
    * frame's grid features. Batched per partition; failures → error rows. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    media.mapPartitions { iter =>
      iter.map { m =>
        try {
          val feature = m.meta.mime match {
            case mime if mime.startsWith("image/") =>
              Codec.imageFeatures(Codec.decodeImage(m.payload))
            case mime if mime.startsWith("audio/") =>
              Codec.audioFeatures(Codec.decodeWavSamples(m.payload)._1)
            case mime if mime.startsWith("video/") =>
              Codec.imageFeatures(Codec.decodeImage(Codec.decodeVideoFrame(m.payload, 0)))
            case other =>
              throw new IllegalArgumentException(s"unsupported mime $other")
          }
          MediaFeatures(m.media_id, m.meta.mime, m.meta.width, m.meta.height,
            feature, Codec.payloadHash(m.payload), error = "")
        } catch {
          case e: Exception =>
            MediaFeatures(m.media_id, m.meta.mime, m.meta.width, m.meta.height,
              Array.empty[Float], Codec.payloadHash(m.payload),
              error = s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }

  /** Real raster resize through the reference's smart_resize geometry
    * (image_utils.py:29-63): decode → smart_resize target dims →
    * nearest-neighbor resample → re-encode PNG. */
  def resizeImages(media: Dataset[MediaRow]): Dataset[ResizedMedia] =
    media.mapPartitions { iter =>
      iter.map { m =>
        try {
          val img = Codec.decodeImage(m.payload)
          val (hb, wb) = graft.kernel.Geometry.smartResize(img.getHeight.toLong, img.getWidth.toLong)
          val out = Codec.resize(img, wb.toInt, hb.toInt)
          ResizedMedia(m.media_id, Codec.encodePng(out), img.getWidth, img.getHeight,
            wb.toInt, hb.toInt, error = "")
        } catch {
          case e: Exception =>
            ResizedMedia(m.media_id, Array.empty[Byte], m.meta.width, m.meta.height,
              0, 0, error = s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }

  /** smart_resize geometry over metadata columns (no raster touch) —
    * the relational fast path when only target dims are needed. */
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

  /** Frame sampling: every `everyMs` milliseconds across the clip; for
    * video payloads the sampled frames are REAL PNG frames demuxed from
    * the container (decoded lazily downstream); for stills, frame 0 is
    * the image itself. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameRow] =
    media.flatMap { m =>
      if (m.meta.mime.startsWith("video/")) {
        val available = try Codec.videoFrameCount(m.payload) catch { case _: Exception => 0 }
        val wanted = math.max(1, (m.meta.durationMs / math.max(1L, everyMs)).toInt)
        val frameDur = m.meta.durationMs / math.max(1, available)
        (0 until math.min(wanted, available)).map { f =>
          // pick the container frame whose timestamp covers f*everyMs
          val srcIdx = math.min(((f * everyMs) / math.max(1L, frameDur)).toInt, available - 1)
          val bytes = Codec.decodeVideoFrame(m.payload, srcIdx)
          val img = Codec.decodeImage(bytes)
          FrameRow(m.media_id, f, f * everyMs, bytes, img.getWidth, img.getHeight)
        }
      } else if (m.meta.mime.startsWith("image/")) {
        val dims = try { val i = Codec.decodeImage(m.payload); (i.getWidth, i.getHeight) }
                   catch { case _: Exception => (0, 0) }
        Seq(FrameRow(m.media_id, 0, 0L, m.payload, dims._1, dims._2))
      } else Seq.empty
    }

  /** Deterministic synthetic media table with REAL payloads: seeded
    * pattern PNGs, PCM sine-mix WAVs, and motion-PNG videos (plus a few
    * deliberately corrupt payloads to exercise the error rows). */
  /** Per-image perceptual hash table `(media_id, dhash, error)` —
    * map-only partition kernel, the dedup analog of [[extractFeatures]].
    * Undecodable payloads become typed error rows (dhash 0, excluded
    * from pairing), never task failures. */
  def imageDHash(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { iter =>
      iter.map { m =>
        try (m.media_id, Codec.dHash64(Codec.decodeImage(m.payload)), "")
        catch { case scala.util.control.NonFatal(e) =>
          (m.media_id, 0L, s"decode: ${e.getMessage}") }
      }
    }.toDF("media_id", "dhash", "error")
  }

  /** Per-clip audio perceptual hash table `(media_id, dhash, error)` —
    * [[imageDHash]]'s audio twin over [[Codec.audioHash64]]; undecodable
    * payloads become typed error rows, never task failures. The column
    * is named `dhash` on purpose: the envelope hash IS a difference
    * hash (over temporal blocks instead of grid cells), and the shared
    * [[nearDupPairs64]] pairer and its oracle SQL shape apply verbatim. */
  def audioDHash(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { iter =>
      iter.map { m =>
        try (m.media_id, Codec.audioHash64(Codec.decodeWavSamples(m.payload)._1), "")
        catch { case scala.util.control.NonFatal(e) =>
          (m.media_id, 0L, s"decode: ${e.getMessage}") }
      }
    }.toDF("media_id", "dhash", "error")
  }

  /** Near-duplicate pairs over ANY 64-bit perceptual hash table (image
    * dHash, audio envelope hash) by hamming distance ≤ `maxHamming`,
    * via 4×16-bit band LSH + exact verify — the MinHash band pattern on
    * a 64-bit perceptual hash. Pigeonhole exactness: ≤3 differing bits
    * can touch at most 3 of the 4 bands, so every hamming-≤3 pair shares
    * at least one intact band — candidate recall is EXACT for the
    * default radius (and for any `maxHamming ≤ 3`); the popcount verify
    * then kills band-collision false positives, so the result equals the
    * all-pairs answer without the O(n²) join. Scale shape: only
    * `(media_id, band, 16-bit value, dhash)` ever shuffles — payloads
    * stay behind; the self-join keys on (band, value) exactly like the
    * text MinHash path. Natural-image corpora can pile onto flat-image
    * buckets (all-zero bands); at crawl scale cap or salt hot buckets
    * the way [[DedupOps]]'s band index does — the small-radius verify
    * keeps correctness under any candidate superset. */
  def nearDupPairs64(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    // Deliberately NO hot-bucket guard (unlike the minhash/simhash band
    // joins): this pairer is pigeonhole-EXACT — pruning a hot band value
    // would silently drop true pairs. The k² cost of k identical-hash
    // media (a logo repeated across a crawl) is the true answer's size;
    // the scale mitigation is upstream EXACT dedup of identical hashes
    // (hamming 0 ⇒ same hash ⇒ one representative suffices), which
    // collapses the hot buckets without changing the near-dup relation.
    require(maxHamming <= 3, s"4x16 banding is exact only for hamming <= 3, got $maxHamming")
    val h = hashes.filter(col("error") === "").select("media_id", "dhash")
    val bands = h.select(col("media_id"), col("dhash"),
        explode(array((0 until 4).map(lit(_)): _*)).as("band"))
      .withColumn("bv", expr("shiftright(dhash, 16 * band) & 65535"))
    val a = bands.select(col("media_id").as("id_a"), col("dhash").as("da"),
      col("band"), col("bv"))
    val b = bands.select(col("media_id").as("id_b"), col("dhash").as("db"),
      col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "da", "db").distinct()
      .withColumn("hamming", expr("CAST(bit_count(da ^ db) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Deterministic planted near-dup image corpus: per base index, four
    * PNGs — the base, an exact copy (hamming 0), a one-grid-cell
    * perturbation (≤2 bits by [[Codec.dHash64]]'s locality), and an
    * unrelated far image. Drives q_image_neardup and the image_dhash
    * oracle dump (same seed → byte-identical payloads both passes). */
  def plantedNearDupMedia(spark: org.apache.spark.sql.SparkSession, nBase: Long,
      seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(nBase).flatMap { i =>
      val rng = new graft.gen.InputGen.Rng(seed, i, 11L)
      val w = 36 + rng.nextInt(60); val h = 36 + rng.nextInt(60)
      val base = noiseImage(w, h, rng.nextLong())
      val pert = brightenOneCell(base, rng.nextInt(9), rng.nextInt(8))
      val far = noiseImage(w, h, rng.nextLong())
      def row(k: Long, img: BufferedImage) =
        MediaRow(4 * i + k, Codec.encodePng(img), MediaMeta("image/png", w, h, 0L, 1))
      Seq(row(0, base), row(1, base), row(2, pert), row(3, far))
    }
  }

  /** Brighten every pixel of ONE dHash grid cell (same floor-division
    * block bounds as [[Codec.dHash64]]) — flips at most that cell's two
    * horizontal comparisons (≤2 bits). Shared by the planted image and
    * video near-dup corpora. */
  private def brightenOneCell(src: BufferedImage, gx: Int, gy: Int): BufferedImage = {
    val w = src.getWidth; val h = src.getHeight
    val pert = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g2 = pert.createGraphics(); g2.drawImage(src, 0, 0, null); g2.dispose()
    val x0 = math.min(gx * w / 9, w - 1); val x1 = math.max(x0 + 1, math.min((gx + 1) * w / 9, w))
    val y0 = math.min(gy * h / 8, h - 1); val y1 = math.max(y0 + 1, math.min((gy + 1) * h / 8, h))
    var y = y0
    while (y < y1) {
      var x = x0
      while (x < x1) {
        val p = pert.getRGB(x, y)
        val r = math.min(((p >> 16) & 0xff) + 200, 255)
        val g = math.min(((p >> 8) & 0xff) + 200, 255)
        val bl = math.min((p & 0xff) + 200, 255)
        pert.setRGB(x, y, (r << 16) | (g << 8) | bl)
        x += 1
      }
      y += 1
    }
    pert
  }

  /** Per-frame perceptual hash table `(media_id, frame_no, dhash, error)`
    * over video payloads — [[Codec.dHash64]] of every demuxed container
    * frame, map-only. A torn / hostile container (truncated tail,
    * declared 2 GiB frame length) becomes ONE typed error row
    * (frame_no -1), never a task failure or an OOM — the length guard
    * lives in [[Codec.decodeVideoFrame]] before any allocation. */
  def videoFrameDHash(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { iter =>
      iter.flatMap { m =>
        try {
          val n = Codec.videoFrameCount(m.payload)
          (0 until n).map { f =>
            (m.media_id, f,
              Codec.dHash64(Codec.decodeImage(Codec.decodeVideoFrame(m.payload, f))), "")
          }
        } catch { case scala.util.control.NonFatal(e) =>
          Seq((m.media_id, -1, 0L, s"decode: ${e.getMessage}")) }
      }
    }.toDF("media_id", "frame_no", "dhash", "error")
  }

  /** Near-duplicate VIDEO pairs: two videos are near-dups when they share
    * frames — the frame-level [[nearDupPairs64]] banding (pigeonhole-exact
    * for hamming ≤3 per frame pair) aggregated to the document level as
    * `(id_a, id_b, matched_frames, min_hamming)`, where matched_frames
    * counts distinct (frame_a, frame_b) pairs within the radius. Same
    * scale shape: only `(media_id, frame_no, band, 16-bit value, hash)`
    * ever shuffles, payloads stay behind; the doc-level agg is a hash
    * agg on (id_a, id_b). A re-encoded or lightly-edited copy matches on
    * every frame; a clip sharing one scene matches on that scene's
    * frames — callers threshold matched_frames for their notion of dup. */
  def videoNearDupPairs(frameHashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    // same no-guard exactness contract as [[nearDupPairs64]]: collapse
    // identical frame hashes upstream rather than prune band values
    require(maxHamming <= 3, s"4x16 banding is exact only for hamming <= 3, got $maxHamming")
    val h = frameHashes.filter(col("error") === "")
      .select("media_id", "frame_no", "dhash")
    val bands = h.select(col("media_id"), col("frame_no"), col("dhash"),
        explode(array((0 until 4).map(lit(_)): _*)).as("band"))
      .withColumn("bv", expr("shiftright(dhash, 16 * band) & 65535"))
    val a = bands.select(col("media_id").as("id_a"), col("frame_no").as("fa"),
      col("dhash").as("da"), col("band"), col("bv"))
    val b = bands.select(col("media_id").as("id_b"), col("frame_no").as("fb"),
      col("dhash").as("db"), col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "fa", "id_b", "fb", "da", "db").distinct()
      .withColumn("hamming", expr("CAST(bit_count(da ^ db) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("matched_frames"), min(col("hamming")).as("min_hamming"))
  }

  /** Deterministic planted near-dup video corpus: per base index, four
    * motion-PNG clips — the base (3–5 noise frames), an exact copy, a
    * one-frame one-grid-cell perturbation (that frame within hamming ≤2,
    * the rest identical), and an unrelated far clip. */
  def plantedNearDupVideos(spark: org.apache.spark.sql.SparkSession, nBase: Long,
      seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(nBase).flatMap { i =>
      val rng = new graft.gen.InputGen.Rng(seed, i, 17L)
      val w = 24 + rng.nextInt(24); val h = 24 + rng.nextInt(24)
      val nf = 3 + rng.nextInt(3)
      val base = Array.fill(nf)(noiseImage(w, h, rng.nextLong()))
      val pf = rng.nextInt(nf)
      val pgx = rng.nextInt(9); val pgy = rng.nextInt(8)
      val pert = base.zipWithIndex.map { case (img, idx) =>
        if (idx == pf) brightenOneCell(img, pgx, pgy) else img
      }
      val far = Array.fill(nf)(noiseImage(w, h, rng.nextLong()))
      def row(k: Long, frames: Array[BufferedImage]) =
        MediaRow(4 * i + k, Codec.encodeVideo(frames.toSeq),
          MediaMeta("video/mp4-toy", w, h, nf * 1000L, nf))
      Seq(row(0, base), row(1, base), row(2, pert), row(3, far))
    }
  }

  /** Deterministic planted near-dup audio corpus — [[plantedNearDupMedia]]'s
    * WAV twin: per base index, four clips — the base (per-block random
    * target amplitude, so the envelope hash is effectively a random 64-bit
    * value per seed), an exact copy (hamming 0), a one-time-block
    * perturbation (every sample of ONE [[Codec.audioHash64]] block set to
    * full scale — strictly louder than any base block, so at most that
    * block's two adjacent comparisons flip), and an unrelated far clip. */
  def plantedNearDupAudio(spark: org.apache.spark.sql.SparkSession, nBase: Long,
      seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(nBase).flatMap { i =>
      val rng = new graft.gen.InputGen.Rng(seed, i, 13L)
      val n = 1300 + rng.nextInt(2000)
      def clip(clipSeed: Long): Array[Short] = {
        val out = new Array[Short](n)
        var b = 0
        while (b < 65) {
          val i0 = math.min(b * n / 65, n - 1)
          val i1 = math.max(i0 + 1, math.min((b + 1) * n / 65, n))
          // per-block target amplitude in [500, 8691] — block-to-block
          // envelope contrast large vs the ~A/20 sample-mean jitter, so
          // neighbor comparisons are stable yet seed-random
          val amp = 500 + (graft.gen.InputGen.mix(clipSeed ^ (b.toLong << 32)) & 0x1fff).toInt
          var j = i0
          while (j < i1) {
            val r = graft.gen.InputGen.mix(clipSeed ^ (b.toLong << 40) ^ j.toLong)
            out(j) = ((math.floorMod(r, 2L * amp + 1) - amp)).toShort
            j += 1
          }
          b += 1
        }
        out
      }
      val baseSeed = rng.nextLong()
      val base = clip(baseSeed)
      val pert = base.clone()
      val pb = rng.nextInt(65)
      val p0 = math.min(pb * n / 65, n - 1)
      val p1 = math.max(p0 + 1, math.min((pb + 1) * n / 65, n))
      var j = p0
      while (j < p1) { pert(j) = if ((j & 1) == 0) 30000 else -30000; j += 1 }
      val far = clip(rng.nextLong())
      def row(k: Long, samples: Array[Short]) =
        MediaRow(4 * i + k, Codec.encodeWav(samples),
          MediaMeta("audio/wav", 0, 0, n / 8L, 0))
      Seq(row(0, base), row(1, base), row(2, pert), row(3, far))
    }
  }

  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rng = new graft.gen.InputGen.Rng(seed, i, 5L)
      val kind = rng.nextInt(4)
      kind match {
        case 0 =>
          val w = 32 + rng.nextInt(96); val h = 32 + rng.nextInt(96)
          val payload = Codec.encodePng(patternImage(w, h, rng.nextLong()))
          MediaRow(i, payload, MediaMeta("image/png", w, h, 0L, 1))
        case 1 =>
          val nSamples = 4000 + rng.nextInt(8000)
          val f1 = 1 + rng.nextInt(40)
          val samples = Array.tabulate(nSamples)(t =>
            (math.sin(t * f1 * 2 * math.Pi / 8000) * 12000).toShort)
          MediaRow(i, Codec.encodeWav(samples),
            MediaMeta("audio/wav", 0, 0, nSamples / 8L, 0))
        case 2 =>
          val nFrames = 2 + rng.nextInt(5)
          val w = 32 + rng.nextInt(32); val h = 32 + rng.nextInt(32)
          val frames = (0 until nFrames).map(f => patternImage(w, h, rng.nextLong() + f))
          MediaRow(i, Codec.encodeVideo(frames),
            MediaMeta("video/mp4-toy", w, h, nFrames * 1000L, nFrames))
        case _ =>
          // corrupt payload → must surface as an error row, not a crash
          val payload = new Array[Byte](64 + rng.nextInt(64))
          var j = 0
          while (j < payload.length) { payload(j) = (rng.nextLong() & 0xff).toByte; j += 1 }
          MediaRow(i, payload, MediaMeta("image/png", 0, 0, 0L, 1))
      }
    }
  }

  /** Seeded deterministic full-RGB hash noise — the dHash-diverse test
    * image ([[patternImage]]'s dominant x-gradient makes every
    * horizontal neighbor brighter, so its dHash degenerates to all-ones
    * for EVERY seed; block averages of per-pixel noise instead give each
    * seed an effectively random 64-bit hash, so unrelated images land at
    * hamming ≈ 32, far outside any near-dup radius). */
  def noiseImage(w: Int, h: Int, seed: Long): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val mixv = graft.gen.InputGen.mix(seed ^ (x.toLong << 20) ^ y.toLong)
        img.setRGB(x, y, (mixv & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Seeded deterministic test pattern (gradients + hash noise). */
  def patternImage(w: Int, h: Int, seed: Long): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val mixv = graft.gen.InputGen.mix(seed ^ (x.toLong << 20) ^ y.toLong)
        val r = (x * 255 / math.max(1, w - 1)) & 0xff
        val g = (y * 255 / math.max(1, h - 1)) & 0xff
        val b = (mixv & 0xff).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }
}
