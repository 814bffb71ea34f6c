package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** S10: zip packaging sink (the reference zips a session's artifacts for
  * download, /root/reference/demo_gradio.py:365-371,408-414). Here the
  * zip is produced as a `binary` COLUMN — per-document artifact bundles
  * that flow through the table like any other payload (writing them to a
  * download area is an ordinary parquet/file sink of that column).
  *
  * Deterministic bytes: fixed DOS-epoch entry timestamps, caller-given
  * entry order, default deflate — same inputs, same zip, on any executor
  * (pinned by ArtifactZipSpec).
  */
object ArtifactZip {

  /** 1980-01-01T00:00:00 UTC — the zip epoch; fixed so archive bytes
    * don't depend on wall clock. */
  private val ZipEpochMs = 315532800000L

  def zipEntries(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      val e = new ZipEntry(name)
      e.setTime(ZipEpochMs)
      zos.putNextEntry(e)
      zos.write(bytes)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  def unzipEntries(zip: Array[Byte]): Vector[(String, Array[Byte])] = {
    val zis = new ZipInputStream(new java.io.ByteArrayInputStream(zip))
    val out = Vector.newBuilder[(String, Array[Byte])]
    var e = zis.getNextEntry
    while (e != null) {
      out += (e.getName -> zis.readAllBytes())
      e = zis.getNextEntry
    }
    out.result()
  }

  final case class DocZip(url: String, artifact_zip: Array[Byte])

  /** Bundle each extraction-output row's artifacts (md, nohf md, cells
    * JSON) into one zip — the per-document analog of the reference's
    * session zip (entry names mirror its md/json artifact layout). */
  def zipDocuments(docs: DataFrame): Dataset[DocZip] = {
    import docs.sparkSession.implicits._
    docs.select("url", "md", "md_nohf", "cells_json")
      .as[(String, String, String, String)]
      .map { case (url, md, nohf, cells) =>
        DocZip(url, zipEntries(Seq(
          "doc.md" -> md.getBytes("UTF-8"),
          "doc_nohf.md" -> nohf.getBytes("UTF-8"),
          "doc.json" -> cells.getBytes("UTF-8"))))
      }
  }
}
