package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed materialization of the synthetic input table. Generation is
  * a pure function of (seed, id), so `spark.range` parallelizes it with no
  * shuffle and no driver-side data. */
object InputTable {

  /** See [[InputGen.CorpusVersion]]. */
  def corpusVersion: String = InputGen.CorpusVersion

  def generate(spark: SparkSession, nDocs: Long, seed: Long = 42L,
      numPartitions: Int = 0): DataFrame =
    generateRange(spark, 0L, nDocs, seed, numPartitions)

  /** Half-open docId range [start, end) — disjoint ranges yield disjoint
    * urls (docId is part of the url), e.g. for incremental crawl drops. */
  def generateRange(spark: SparkSession, start: Long, end: Long, seed: Long = 42L,
      numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val base = if (numPartitions > 0) spark.range(start, end, 1, numPartitions)
               else spark.range(start, end)
    base.map(i => InputGen.generate(seed, i)).toDF()
  }

  /** Scale-factor convention mirroring TESTDATA.md tiers. */
  def docsForSfDir(sfDir: String): Long = {
    val sf = raw".*sf([0-9.]+).*".r
    sfDir match {
      case sf(s) => math.max(50L, (s.toDouble * 200000).toLong) // sf0.01 → 2 000 docs
      case _     => 2000L
    }
  }
}
