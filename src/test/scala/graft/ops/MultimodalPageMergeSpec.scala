package graft.ops

import graft.SparkTestBase
import graft.pipeline.PageMerge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("media features: real decode per mime, determinism, corrupt → error rows") {
    val media = MultimodalOps.syntheticMedia(spark, 60L).cache()
    val feats = MultimodalOps.extractFeatures(media).cache()
    assert(feats.count() == 60)
    val rows = feats.collect()
    // images/video decode to 4x4x3 grid features; audio to 16 RMS windows
    rows.filter(r => r.error.isEmpty && r.mime.startsWith("image/"))
      .foreach(r => assert(r.feature.length == 48))
    rows.filter(r => r.error.isEmpty && r.mime.startsWith("video/"))
      .foreach(r => assert(r.feature.length == 48))
    rows.filter(r => r.error.isEmpty && r.mime.startsWith("audio/"))
      .foreach { r =>
        assert(r.feature.length == 16)
        assert(r.feature.exists(_ > 0.1f), "sine clip must carry RMS energy")
      }
    // the planted corrupt payloads surface as typed error rows
    val bad = rows.filter(_.error.nonEmpty)
    assert(bad.nonEmpty && bad.forall(_.feature.isEmpty))
    assert(rows.count(_.error.isEmpty) > bad.length, "most media decode fine")
    val again = MultimodalOps.extractFeatures(media)
    assert(feats.select("media_id", "payload_hash").except(
      again.select("media_id", "payload_hash")).count() == 0)
  }

  test("real image decode round-trip: pattern png decodes to original dims and pixels") {
    val img = MultimodalOps.patternImage(40, 30, seed = 7L)
    val bytes = MultimodalOps.Codec.encodePng(img)
    val back = MultimodalOps.Codec.decodeImage(bytes)
    assert(back.getWidth == 40 && back.getHeight == 30)
    for (x <- 0 until 40 by 7; y <- 0 until 30 by 5)
      assert((back.getRGB(x, y) & 0xffffff) == (img.getRGB(x, y) & 0xffffff))
  }

  test("raster resize hits smart_resize dims exactly") {
    val media = MultimodalOps.syntheticMedia(spark, 40L)
      .filter(col("meta.mime") === "image/png" && col("meta.width") > lit(0))
    val resized = MultimodalOps.resizeImages(media).collect().filter(_.error.isEmpty)
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val (hb, wb) = graft.kernel.Geometry.smartResize(r.height.toLong, r.width.toLong)
      assert(r.resized_width == wb.toInt && r.resized_height == hb.toInt)
      val img = MultimodalOps.Codec.decodeImage(r.payload)
      assert(img.getWidth == wb.toInt && img.getHeight == hb.toInt)
    }
  }

  test("P5 to_rgb: alpha composited over white; opaque unchanged") {
    val img = new java.awt.image.BufferedImage(4, 1, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, 0xff336699)         // opaque → unchanged
    img.setRGB(1, 0, 0x00336699)         // fully transparent → white
    img.setRGB(2, 0, (128 << 24) | 0x000000) // half-alpha black → mid grey
    img.setRGB(3, 0, 0xffffffff)
    val rgb = MultimodalOps.Codec.toRgb(img)
    assert((rgb.getRGB(0, 0) & 0xffffff) == 0x336699)
    assert((rgb.getRGB(1, 0) & 0xffffff) == 0xffffff)
    val grey = rgb.getRGB(2, 0) & 0xff
    assert(grey > 100 && grey < 140, s"half-alpha black over white ≈ 127, got $grey")
    assert((rgb.getRGB(3, 0) & 0xffffff) == 0xffffff)
    // non-alpha input passes through as RGB
    val plain = MultimodalOps.patternImage(5, 5, 1L)
    assert(MultimodalOps.Codec.toRgb(plain).getRGB(2, 2) == plain.getRGB(2, 2))
  }

  test("P20 display resize: long side 1024 (or native), short side int-truncated") {
    val wide = MultimodalOps.patternImage(200, 100, 2L)
    val (r1, ow, oh) = MultimodalOps.Codec.displayResize(wide)
    assert(ow == 200 && oh == 100)
    assert(r1.getWidth == 1024 && r1.getHeight == 512)
    val tall = MultimodalOps.patternImage(99, 301, 2L)
    val (r2, _, _) = MultimodalOps.Codec.displayResize(tall)
    assert(r2.getHeight == 1024 && r2.getWidth == (99L * 1024 / 301).toInt)
    val (r3, _, _) = MultimodalOps.Codec.displayResize(wide, useNative = true)
    assert(r3.getWidth == 200 && r3.getHeight == 100)
  }

  test("wav codec round-trip preserves samples") {
    val samples = Array.tabulate(4000)(t => (math.sin(t * 0.05) * 10000).toShort)
    val wav = MultimodalOps.Codec.encodeWav(samples)
    val (back, rate) = MultimodalOps.Codec.decodeWavSamples(wav)
    assert(rate == 8000f && back.toSeq == samples.toSeq)
  }

  test("resize plumbing applies smart_resize geometry to metadata") {
    val media = MultimodalOps.syntheticMedia(spark, 40L)
      .filter(col("meta.mime") === "image/png" && col("meta.width") > 0)
      .select(col("media_id"), col("meta.width").as("width"), col("meta.height").as("height"))
    val resized = MultimodalOps.withResizedDims(media, "width", "height").collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val (rh, rw) = (r.getAs[Int]("resized_height"), r.getAs[Int]("resized_width"))
      assert(rh % 28 == 0 && rw % 28 == 0)
      assert(rh.toLong * rw >= 3136 && rh.toLong * rw <= 11289600)
    }
  }

  test("frame sampling demuxes REAL png frames from the video container") {
    val media = MultimodalOps.syntheticMedia(spark, 60L)
    val frames = MultimodalOps.sampleFrames(media, everyMs = 1000L).cache()
    val videos = media.filter(col("meta.mime").startsWith("video/")).count()
    assert(videos > 0)
    assert(frames.select("media_id").distinct().count() >= videos)
    frames.groupBy("media_id").agg(countDistinct("frame_no").as("n"), count(lit(1)).as("t"))
      .collect().foreach(r => assert(r.getAs[Long]("n") == r.getAs[Long]("t")))
    // every sampled video frame is an actually decodable PNG with dims
    val vids = media.filter(col("meta.mime").startsWith("video/"))
      .select("media_id").as[Long].collect().toSet
    frames.collect().filter(f => vids.contains(f.media_id)).foreach { f =>
      val img = MultimodalOps.Codec.decodeImage(f.frame_payload)
      assert(img.getWidth == f.frame_width && img.getHeight == f.frame_height)
      assert(f.frame_width >= 32 && f.frame_height >= 32)
    }
  }
}

class PageMergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("continuation predicate follows the reference prompt rules") {
    assert(PageMerge.shouldMerge("unterminated clause", "continues here"))
    assert(!PageMerge.shouldMerge("Finished sentence.", "New paragraph"))
    assert(!PageMerge.shouldMerge("句子结束。", "新段落"))
    assert(PageMerge.shouldMerge("断行的句子", "，接续的标点"))
    assert(!PageMerge.shouldMerge("# A Title", "anything"))
    assert(!PageMerge.shouldMerge("text", "# Heading next"))
    assert(!PageMerge.shouldMerge("", "x") && !PageMerge.shouldMerge("x", ""))
  }

  test("splice semantics mirror merge_ocr_contents") {
    // same paragraph: rstrip + first line glued, rest newline-joined
    val merged = PageMerge.mergePages(Seq("para start\nand cont", "inues here\nnext line"))
    assert(merged == "para start\nand continues here\nnext line")
    // different paragraph: double-newline separator
    val apart = PageMerge.mergePages(Seq("Done.", "Fresh start"))
    assert(apart == "Done.\n\nFresh start")
    assert(PageMerge.mergePages(Nil) == "")
    assert(PageMerge.mergePages(Seq("only")) == "only")
  }

  test("distributed merge groups by url in page order") {
    import spark.implicits._
    val pages = Seq(
      ("u1", 1, "second page"),
      ("u1", 0, "first page ends unterminated"),
      ("u2", 0, "Solo page."))
      .toDF("url", "page_no", "md")
    val out = PageMerge.mergeDocuments(pages).collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("merged_md")).toMap
    assert(out("u1") == "first page ends unterminatedsecond page")
    assert(out("u2") == "Solo page.")
  }
}
