package graft

import graft.core.PromptMode
import graft.gen.InputTable
import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operator registry: one entry per implemented SURVEY.md §2 operator.
  * Extraction ops run on the deterministic synthetic table; SQL-expressible
  * ops carry a DuckDB oracle over the driver's parquet tables. */
object Queries {

  private def docs(s: SparkSession, sfDir: String): DataFrame =
    InputTable.generate(s, InputTable.docsForSfDir(sfDir), seed = 42L)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- extraction pipeline (no SQL oracle; byte-identity enforced in sbt test)
    "x_extract_full" -> ((s, dir) =>
      ExtractPipeline.run(docs(s, dir)).orderBy("url")),
    "x_extract_layout_only" -> ((s, dir) =>
      ExtractPipeline.parsePages(
        ExtractPipeline.asPageDocs(docs(s, dir)), PromptMode.LayoutOnly)
        .toDF().orderBy("url", "page_no")),
    "x_extract_ocr" -> ((s, dir) =>
      ExtractPipeline.parsePages(
        ExtractPipeline.asPageDocs(docs(s, dir)), PromptMode.Ocr)
        .toDF().orderBy("url", "page_no"))
  )

  val oracles: Map[String, String] = Map()
}
