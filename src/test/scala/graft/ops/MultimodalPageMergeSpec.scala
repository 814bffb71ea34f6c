package graft.ops

import graft.SparkTestBase
import graft.pipeline.PageMerge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("media features: schema, determinism, batch shape") {
    val media = MultimodalOps.syntheticMedia(spark, 60L).cache()
    val feats = MultimodalOps.extractFeatures(media).cache()
    assert(feats.count() == 60)
    assert(feats.head().feature.length == 16)
    val again = MultimodalOps.extractFeatures(media)
    assert(feats.select("media_id", "payload_hash").except(
      again.select("media_id", "payload_hash")).count() == 0)
  }

  test("resize plumbing applies smart_resize geometry to metadata") {
    val media = MultimodalOps.syntheticMedia(spark, 40L)
      .filter(col("meta.mime") === "image/png")
      .select(col("media_id"), col("meta.width").as("width"), col("meta.height").as("height"))
    val resized = MultimodalOps.withResizedDims(media, "width", "height").collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val (rh, rw) = (r.getAs[Int]("resized_height"), r.getAs[Int]("resized_width"))
      assert(rh % 28 == 0 && rw % 28 == 0)
      assert(rh.toLong * rw >= 3136 && rh.toLong * rw <= 11289600)
    }
  }

  test("frame sampling fans out video rows deterministically") {
    val media = MultimodalOps.syntheticMedia(spark, 60L)
    val frames = MultimodalOps.sampleFrames(media, everyMs = 1000L).cache()
    val videos = media.filter(col("meta.mime") === "video/mp4").count()
    assert(frames.select("media_id").distinct().count() >= videos)
    frames.groupBy("media_id").agg(countDistinct("frame_no").as("n"), count(lit(1)).as("t"))
      .collect().foreach(r => assert(r.getAs[Long]("n") == r.getAs[Long]("t")))
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
