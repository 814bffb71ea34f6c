package graft.scale

import graft.core.PromptMode
import graft.pipeline.{ExtractPipeline, PartitionLineage}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-style incremental snapshot commit + resume (north rule: "a
  * killed run resumes from the last committed snapshot without
  * reprocessing").
  *
  * The url space is split into `nBuckets` hash buckets
  * (`pmod(xxhash64(url), nBuckets)` — the url-hash partitioning axis).
  * Work proceeds in batches of `bucketsPerCommit` buckets; after a batch's
  * parquet (data + lineage) lands, a manifest file `commit-<k>.json` is
  * written via temp-file + atomic rename — the commit point. On restart,
  * committed buckets are skipped by a partition-pruning filter (the
  * dataflow analog of an anti-join against committed lineage keys;
  * SURVEY.md §2.9 — with bucket granularity the anti-join collapses to a
  * scan predicate, which is what survives at 10^12 rows).
  *
  * No Iceberg runtime jar ships in this sandbox, so the manifest directory
  * IS the snapshot log; the data layout stays `spark.read.parquet`-
  * compatible (SURVEY.md §7 environment note).
  */
final class SnapshotRunner(
    outDir: String,
    nBuckets: Int = 16,
    bucketsPerCommit: Int = 4,
    mode: PromptMode = PromptMode.LayoutAll) {

  private val dataDir = s"$outDir/data"
  private val lineageDir = s"$outDir/lineage"
  private val manifestDir: Path = Paths.get(outDir, "manifest")

  final case class Commit(id: Int, buckets: Seq[Int], rows: Long, wallMs: Long)

  def committedBuckets(): Set[Int] = commits().flatMap(_.buckets).toSet

  def commits(): Vector[Commit] = {
    if (!Files.isDirectory(manifestDir)) return Vector.empty
    Files.list(manifestDir).iterator().asScala
      .filter(_.getFileName.toString.matches("commit-\\d+\\.json"))
      .toVector.sortBy(_.getFileName.toString)
      .map { p =>
        val j = graft.kernel.PyJson.parse(Files.readString(p)).asInstanceOf[graft.kernel.JObject]
        def l(k: String) = j.get(k).get.asInstanceOf[graft.kernel.JInt].value.toLong
        val bs = j.get("buckets").get.asInstanceOf[graft.kernel.JArray].items
          .map(_.asInstanceOf[graft.kernel.JInt].value.toInt)
        Commit(l("id").toInt, bs, l("rows"), l("wall_ms"))
      }
  }

  private def writeCommit(c: Commit): Unit = {
    Files.createDirectories(manifestDir)
    val body = s"""{"id": ${c.id}, "buckets": [${c.buckets.mkString(", ")}], "rows": ${c.rows}, "wall_ms": ${c.wallMs}}"""
    val tmp = manifestDir.resolve(s".commit-${c.id}.json.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, manifestDir.resolve(f"commit-${c.id}%05d.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Process up to `maxBatches` uncommitted bucket-batches (-1 = all).
    * Returns the number of batches committed in this invocation. */
  def run(spark: SparkSession, input: DataFrame, maxBatches: Int = -1): Int = {
    val done = committedBuckets()
    val remaining = (0 until nBuckets).filterNot(done.contains)
    val batches = remaining.grouped(bucketsPerCommit).toVector
    val toRun = if (maxBatches >= 0) batches.take(maxBatches) else batches
    var commitId = commits().map(_.id).maxOption.getOrElse(-1) + 1
    toRun.foreach { buckets =>
      val t0 = System.currentTimeMillis()
      val acc = spark.sparkContext.collectionAccumulator[PartitionLineage](s"lineage-$commitId")
      val bucketCol = pmod(xxhash64(col("url")), lit(nBuckets))
      val batchInput = input.filter(bucketCol.isin(buckets.map(Integer.valueOf): _*))
      val out = ExtractPipeline.run(batchInput, mode, lineageAcc = Some(acc))
        .withColumn("bucket", pmod(xxhash64(col("url")), lit(nBuckets)))
      out.write.mode("append").partitionBy("bucket").parquet(dataDir)
      val rows = spark.read.parquet(dataDir)
        .filter(col("bucket").isin(buckets.map(Integer.valueOf): _*)).count()
      import spark.implicits._
      val lineage = acc.value.asScala.toVector
        .map(pl => (commitId, pl.partition_id, pl.stage, pl.row_count, pl.checksum, pl.wall_time_ms))
        .toDF("commit_id", "partition_id", "stage", "row_count", "checksum", "wall_time_ms")
      lineage.coalesce(1).write.mode("append").parquet(lineageDir)
      writeCommit(Commit(commitId, buckets, rows, System.currentTimeMillis() - t0))
      commitId += 1
    }
    toRun.length
  }

  def output(spark: SparkSession): DataFrame = spark.read.parquet(dataDir)

  def lineage(spark: SparkSession): DataFrame = spark.read.parquet(lineageDir)
}
