package graft

/** Dev tool: time ONE registered query in isolation (fresh session, same
  * config as the driver contract) — for profiling a single headline entry
  * without the full `graft.Bench` sweep.
  *
  * Usage: runMain graft.BenchOne <queryName> <sfDir> [passes]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.pipeline.ExtractPipeline.newSession(s"local[$cpus]", cpus.toInt * 2)
    spark.sparkContext.setLogLevel("WARN")
    sys.props("graft.verify.tables.root") = VerifyTables.root(sfDir)
    val q = SparkEntry.queries(name)
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[benchone] $name pass $p: $dt%.3f s")
    }
    spark.stop()
  }
}
