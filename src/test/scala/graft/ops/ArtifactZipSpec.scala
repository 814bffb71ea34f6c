package graft.ops

import graft.SparkTestBase
import graft.gen.InputTable
import graft.pipeline.ExtractPipeline
import org.scalatest.funsuite.AnyFunSuite

class ArtifactZipSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("zip bytes are deterministic and round-trip entry-exact") {
    val entries = Seq(
      "doc.md" -> "# Title\n\ncontent with ünïcode 日本語".getBytes("UTF-8"),
      "doc.json" -> """[{"bbox": [1, 2, 3, 4]}]""".getBytes("UTF-8"))
    val a = ArtifactZip.zipEntries(entries)
    val b = ArtifactZip.zipEntries(entries)
    assert(a.toSeq == b.toSeq, "same inputs must produce identical zip bytes")
    val back = ArtifactZip.unzipEntries(a)
    assert(back.map(_._1) == entries.map(_._1).toVector)
    back.zip(entries).foreach { case ((_, got), (_, want)) =>
      assert(got.toSeq == want.toSeq)
    }
  }

  test("per-document artifact zips carry the extraction outputs") {
    val out = ExtractPipeline.run(InputTable.generate(spark, 20L, seed = 42L))
    val zips = ArtifactZip.zipDocuments(out).collect()
    assert(zips.length == 20)
    zips.foreach { z =>
      val entries = ArtifactZip.unzipEntries(z.artifact_zip).toMap
      assert(entries.keySet == Set("doc.md", "doc_nohf.md", "doc.json"))
    }
    // spot-check content equality against the source row
    val row = out.orderBy("url").head()
    val z = zips.find(_.url == row.getAs[String]("url")).get
    val entries = ArtifactZip.unzipEntries(z.artifact_zip).toMap
    assert(new String(entries("doc.md"), "UTF-8") == row.getAs[String]("md"))
    assert(new String(entries("doc.json"), "UTF-8") == row.getAs[String]("cells_json"))
  }
}
