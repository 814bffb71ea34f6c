package graft
import graft.gen.InputTable
import graft.pipeline.ExtractPipeline
/** Materialize the synthetic input table to parquet (bench utility). */
object GenMain {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val path = args(1)
    val spark = ExtractPipeline.newSession("local[32]", 64)
    spark.sparkContext.setLogLevel("ERROR")
    InputTable.generate(spark, n, seed = 42L, numPartitions = 128)
      .write.mode("overwrite").parquet(path)
    spark.stop()
  }
}
