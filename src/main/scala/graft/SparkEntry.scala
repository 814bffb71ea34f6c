package graft

import graft.core.PromptMode
import graft.gen.InputTable
import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` entries are (SparkSession, sfDir) → DataFrame. Extraction
  * queries synthesize the north-rule input table deterministically at a
  * size derived from the sf tier (no external data); relational queries
  * read the driver's parquet tables so DuckDB can replay `oracleSql` on
  * identical inputs.
  */
object SparkEntry {

  /** Flagship: full extraction pipeline (HTML+PDF branches, repair, ordered
    * assembly) on a small synthetic table. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val input = InputTable.generate(spark, nDocs = 200L, seed = 42L)
    ExtractPipeline.run(input)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ Queries.benchExtras

  def oracleSql: Map[String, String] = Queries.oracles
}
