package graft.tools

import graft.gen.InputTable
import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the extraction-output digest for a fixed (seed, n) input — the
  * value pinned by `OutputDigestSpec.PinnedDigest`. Run it in the sbt JVM
  * and a standalone JVM to confirm cross-JVM byte identity before updating
  * the pin. Args: [n] [seed] (defaults 120, 99).
  */
object DigestMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 120L
    val seed = if (args.length > 1) args(1).toLong else 99L
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-digest")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val out = ExtractPipeline.run(InputTable.generate(spark, n, seed = seed))
        .orderBy("url")
        .select(concat_ws("", col("url"), col("md"), col("md_nohf"),
          col("extracted_text"), col("cells_json"), col("filtered").cast("string"), col("error")))
        .collect().map(_.getString(0)).mkString("")
      println(s"DIGEST n=$n seed=$seed len=${out.length} hash=${scala.util.hashing.MurmurHash3.stringHash(out)}")
    } finally spark.stop()
  }
}
