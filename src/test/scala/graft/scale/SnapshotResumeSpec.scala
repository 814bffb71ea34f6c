package graft.scale

import graft.SparkTestBase
import graft.gen.InputTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SnapshotResumeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("kill after K commits, resume processes only the rest, output identical") {
    val input = InputTable.generate(spark, 120L, seed = 7L).cache()
    val dirA = Files.createTempDirectory("snap-a").toString
    val dirB = Files.createTempDirectory("snap-b").toString

    // uninterrupted reference run
    val full = new SnapshotRunner(dirA, nBuckets = 8, bucketsPerCommit = 2)
    assert(full.run(spark, input) == 4)

    // interrupted run: 2 of 4 batches, then "crash"
    val part = new SnapshotRunner(dirB, nBuckets = 8, bucketsPerCommit = 2)
    assert(part.run(spark, input, maxBatches = 2) == 2)
    assert(part.committedBuckets().size == 4)

    // resume: a NEW runner instance (fresh process) picks up the manifest
    val resumed = new SnapshotRunner(dirB, nBuckets = 8, bucketsPerCommit = 2)
    assert(resumed.run(spark, input) == 2) // exactly the remaining batches
    assert(resumed.committedBuckets().size == 8)

    // idempotence: nothing left to do
    assert(new SnapshotRunner(dirB, nBuckets = 8, bucketsPerCommit = 2)
      .run(spark, input) == 0)

    // byte-identical final output
    val a = full.output(spark).select("url", "md", "cells_json", "error")
    val b = resumed.output(spark).select("url", "md", "cells_json", "error")
    assert(a.count() == 120 && b.count() == 120)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)

    // lineage table covers both run segments with positive wall times
    val lin = resumed.lineage(spark)
    assert(lin.count() > 0)
    assert(lin.filter(col("row_count") > 0).count() > 0)
    assert(lin.select(countDistinct("commit_id")).head().getLong(0) == 4)
  }
}
