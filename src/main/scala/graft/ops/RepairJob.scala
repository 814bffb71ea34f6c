package graft.ops

import graft.kernel.{JArray, JValue, OutputRepair, PyJson}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** C9: the offline batch-repair job — the Spark translation of
  * `OutputCleaner.clean_all_data` (/root/reference/dots_ocr/utils/
  * output_cleaner.py:437-487): JSONL of raw `predict` strings → repaired
  * `predict_resized` per row + a cleaning report (A5, :528-597).
  *
  * Shape: `read → mapPartitions(repair) → write`, report = plain
  * aggregates. The repair kernel is the byte-identical OutputRepair chain.
  */
object RepairJob {

  final case class Repaired(
      case_id: Long,
      original_length: Long,
      predict_resized: String, // json.dumps(cleaned, ensure_ascii=False)
      cleaned_objects: Long,
      success: Boolean)

  def repair(rows: Dataset[(Long, String)]): Dataset[Repaired] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map { case (id, predict) =>
      val res = OutputRepair.cleanModelOutputResult(Right(predict))
      Repaired(id, predict.length.toLong, PyJson.dumps(JArray(res.cleanedData)),
        res.cleanedData.length.toLong, res.success)
    })
  }

  /** Cleaning report (`_generate_cleaning_report` aggregates). */
  def report(repaired: Dataset[Repaired]): DataFrame =
    repaired.toDF().agg(
      count(lit(1)).as("total_cases"),
      sum(when(col("success"), 1L).otherwise(0L)).as("successful_cases"),
      sum(col("cleaned_objects")).as("total_recovered_objects"))
}
