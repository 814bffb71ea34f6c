package graft.scale

import graft.SparkTestBase
import graft.gen.InputTable
import graft.ops.DedupOps
import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located-join claim, proven in the plan: a band index / snapshot
  * committed via bucketBy joins WITHOUT an exchange on the persisted side
  * — only the arriving batch shuffles. Broadcast is disabled inside each
  * test so the exchange count is the evidence (a broadcast would hide the
  * question the spec asks; at 100 TB neither side broadcasts). */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def hashExchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString()).length

  // NOTE: no pre-test cleanup on purpose — the warehouse directory
  // persists across test JVMs while the in-memory catalog does not, so
  // every re-run exercises CatalogTables.overwriteBucketed's
  // stale-location recovery path.

  private def noBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private lazy val docs = spark.range(0, 120)
    .select(col("id").as("doc_id"),
      concat(lit("alpha bravo charlie delta echo foxtrot golf hotel india "),
        when(col("id") % 7 === 0, lit("repeated family text body"))
          .otherwise(concat(lit("unique tail "), col("id")))).as("text"))

  test("band index: bucketed side joins with NO exchange (2 -> 1), identical candidates") {
    noBroadcast {
      val sigs = DedupOps.minhashSignatures(docs, "doc_id", "text",
        numHashes = 16, shingleSize = 3).cache()
      val index = DedupOps.minhashBandIndex(sigs, numHashes = 16, bands = 4)
      DedupOps.writeBandIndexBucketed(index, "band_index_spec", buckets = 4)
      val arrivals = sigs.filter(col("id") % 3 === 0)

      val unbucketed = DedupOps.candidatesAgainstIndex(
        arrivals, index, numHashes = 16, bands = 4)
      val bucketed = DedupOps.candidatesAgainstIndex(
        arrivals, spark.table("band_index_spec"), numHashes = 16, bands = 4)

      assert(hashExchanges(unbucketed) >= 2,
        "both sides of the unbucketed candidate join must shuffle")
      // compare whole plans (the trailing dropDuplicates contributes its
      // own exchange to BOTH): bucketing must remove exactly the
      // index-side shuffle and nothing else
      assert(hashExchanges(bucketed) == hashExchanges(unbucketed) - 1,
        s"bucketed index side must not shuffle:\n${bucketed.queryExecution.executedPlan}")

      val a = unbucketed.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val b = bucketed.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(a.nonEmpty && a.sameElements(b), "bucketing must not change the candidates")
      sigs.unpersist()
      ()
    }
  }

  test("incremental re-extraction: bucketed digest+output sides join with NO exchange (2 fewer), identical output") {
    noBroadcast {
      val snapA = InputTable.generate(spark, 80L, seed = 11L).cache()
      val outA = ExtractPipeline.run(snapA).cache()
      ExtractPipeline.commitSnapshotBucketed(snapA, outA,
        "snap_digests_spec", "snap_output_spec", buckets = 4)
      // snapshot B: same corpus with a deterministic slice "changed" by
      // swapping in another doc's payload (the donor pattern)
      val donors = snapA.select(col("url").as("__du"), col("html").as("__dh"))
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("__du")))
      val numbered = snapA.withColumn("__rn",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy("url")))
      val shifted = donors.withColumn("__rn",
        (col("__rn") % lit(80)) + 1)
      val snapB = numbered.join(shifted, Seq("__rn"))
        .select(col("url"), col("warc_ts"),
          when(pmod(col("__rn"), lit(5)) === 0, col("__dh")).otherwise(col("html")).as("html"),
          col("text"), col("lang")).cache()

      val viaParquet = ExtractPipeline.runIncremental(
        ExtractPipeline.snapshotDigests(snapA), outA, snapB)
      val viaBucketed = ExtractPipeline.runIncremental(
        spark.table("snap_digests_spec"), spark.table("snap_output_spec"), snapB)

      val eUnb = hashExchanges(viaParquet)
      val eBuc = hashExchanges(viaBucketed)
      assert(eBuc == eUnb - 2,
        s"bucketed digest+output sides must not shuffle (unbucketed $eUnb, bucketed $eBuc):\n" +
          viaBucketed.queryExecution.executedPlan)

      val rows = (df: org.apache.spark.sql.DataFrame) =>
        df.select("url", "md", "source").as[(String, String, String)]
          .collect().sorted.toSeq
      assert(rows(viaParquet) == rows(viaBucketed))
      assert(rows(viaBucketed).exists(_._3 == "extracted") &&
        rows(viaBucketed).exists(_._3 == "reused"),
        "the planted delta must exercise both the reuse and re-extract paths")
      snapA.unpersist(); outA.unpersist(); snapB.unpersist()
      ()
    }
  }
}
