package graft.pipeline

import graft.SparkTestBase
import graft.core._
import graft.gen.{InputGen, InputTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineE2ESpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val NDocs = 80L
  lazy val input = InputTable.generate(spark, NDocs, seed = 42L).cache()
  lazy val result = ExtractPipeline.run(input).cache()

  test("every input url yields exactly one output row") {
    assert(result.count() == NDocs)
    assert(result.select("url").distinct().count() == NDocs)
  }

  test("html rows: markdown present, boilerplate stripped from md_nohf") {
    val html = result.filter(col("url").contains("/html/")).collect()
    assert(html.nonEmpty)
    html.foreach { r =>
      val md = r.getAs[String]("md")
      val nohf = r.getAs[String]("md_nohf")
      assert(md.nonEmpty, r.getAs[String]("url"))
      assert(r.getAs[String]("error") == "")
      // header/nav text ("Home") shows in md but never in md_nohf
      assert(md.contains("Home"))
      assert(!nohf.contains("Home"))
    }
  }

  test("pdf rows: pages assembled in order with the reference separator") {
    val pdf = result.filter(col("url").contains("/pdf/")).collect()
    assert(pdf.nonEmpty)
    pdf.foreach { r =>
      val n = r.getAs[Long]("n_pages")
      val md = r.getAs[String]("md")
      if (n > 1) assert(md.contains("\n\n---\n\n"))
      // page markers p1..pn appear in order in md
      val idx = (1 to n.toInt).map(i => md.indexOf(s"p$i"))
      assert(idx.forall(_ >= 0) && idx == idx.sorted, s"page order in ${r.getAs[String]("url")}")
    }
  }

  test("garbled rows exercise the repair chain → filtered=true") {
    val garbled = result.filter(col("url").contains("/garbled/")).collect()
    assert(garbled.nonEmpty)
    garbled.foreach { r =>
      assert(r.getAs[Boolean]("filtered"), r.getAs[String]("url"))
      assert(r.getAs[String]("error") == "")
    }
  }

  test("truncated payloads become error rows, never task failures") {
    val bad = result.filter(col("url").contains("/truncated/")).collect()
    assert(bad.nonEmpty)
    bad.foreach { r => assert(r.getAs[String]("error").nonEmpty) }
  }

  test("cells_json of clean rows is valid JSON with legal bboxes in reading order") {
    import graft.kernel._
    result.filter(col("url").contains("/html/")).limit(10).collect().foreach { r =>
      val parsed = PyJson.parse(r.getAs[String]("cells_json")).asInstanceOf[JArray]
      parsed.items.foreach { pageObj =>
        val cells = pageObj.asInstanceOf[JObject].get("cells").get.asInstanceOf[JArray].items
        assert(BboxScale.isLegalBbox(cells))
      }
    }
  }

  test("pipeline is deterministic end-to-end") {
    val again = ExtractPipeline.run(InputTable.generate(spark, NDocs, seed = 42L))
    val d = result.select(col("url"), col("md"), col("cells_json"))
      .except(again.select(col("url"), col("md"), col("cells_json")))
    assert(d.count() == 0)
  }

  test("spreadPages=true (shuffle assembly) ≡ default map-only assembly, all columns") {
    val spread = ExtractPipeline.run(InputTable.generate(spark, NDocs, seed = 42L),
      spreadPages = true)
    assert(spread.columns.toSeq == result.columns.toSeq)
    val cols = result.columns.map(col)
    val d1 = result.select(cols: _*).except(spread.select(cols: _*))
    val d2 = spread.select(cols: _*).except(result.select(cols: _*))
    assert(d1.count() == 0 && d2.count() == 0 && spread.count() == NDocs)
  }

  test("prompt modes: layout_only has no md; ocr passes text through") {
    val docs = ExtractPipeline.asPageDocs(input.filter(col("url").contains("/html/")).limit(5))
    val lo = ExtractPipeline.parsePages(docs, PromptMode.LayoutOnly).collect()
    lo.foreach { p =>
      assert(p.md == "" && p.cells_json.nonEmpty)
      assert(!p.cells_json.contains("\"text\""))
    }
    val ocr = ExtractPipeline.parsePages(docs, PromptMode.Ocr).collect()
    ocr.foreach { p =>
      assert(p.cells_json == "" && p.md.nonEmpty)
    }
  }

  test("grounding mode restricts text to the query bbox") {
    val docs = ExtractPipeline.asPageDocs(input.filter(col("url").contains("/html/")).limit(3))
    // top band of the synthesized layout = header/nav/title region
    val g = ExtractPipeline.parsePages(docs, PromptMode.GroundingOcr((0L, 0L, 1280L, 200L))).collect()
    val full = ExtractPipeline.parsePages(docs, PromptMode.Ocr).collect()
    g.zip(full).foreach { case (gp, fp) =>
      assert(gp.md.length < fp.md.length)
      assert(gp.md.contains("Home")) // header text is in the top band
    }
  }

  test("lineage accumulator captures every partition exactly once") {
    val acc = spark.sparkContext.collectionAccumulator[PartitionLineage]("lineage-test")
    val out = ExtractPipeline.run(input, lineageAcc = Some(acc))
    val total = out.count() // force
    val lineage = acc.value
    import scala.jdk.CollectionConverters._
    val rows = lineage.asScala.toVector
    assert(rows.map(_.row_count).sum >= NDocs) // pages ≥ docs
    assert(rows.map(_.partition_id).distinct.size == rows.size)
  }
}
