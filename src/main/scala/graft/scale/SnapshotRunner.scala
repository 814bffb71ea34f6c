package graft.scale

import graft.core.PromptMode
import graft.pipeline.ExtractPipeline
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
  * Crash-safety contract (the snapshot-log semantics):
  *   - batch data is written with DYNAMIC PARTITION OVERWRITE into
  *     bucket=<k> partitions: a crash between the data write and the
  *     manifest rename leaves orphan partitions that the NEXT run simply
  *     overwrites (the job is deterministic), so re-running an
  *     uncommitted batch is idempotent, never additive;
  *   - [[output]] / [[lineage]] read ONLY committed buckets/commits (a
  *     partition-pruned filter derived from the manifest) — uncommitted
  *     partial writes are invisible, exactly like an Iceberg snapshot
  *     read of the last committed snapshot;
  *   - lineage is computed relationally from the read-back committed
  *     batch ([[Lineage.fromOutput]]) — retry/speculation-safe and
  *     consistent with the data by construction.
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
  private val bucketedDir = s"$outDir/input_bucketed"
  private val preparedMarker: Path = Paths.get(outDir, "input_bucketed_PREPARED")

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

  /** One-time input bucketization: materialize the input partitioned by
    * `bucket=pmod(xxhash64(url), nBuckets)` so each commit batch reads a
    * PARTITION-PRUNED scan of just its buckets' files. Without this,
    * every batch re-filters the FULL input with a hash predicate parquet
    * cannot push down — nBuckets/bucketsPerCommit batches means that many
    * full scans of a 100 TB input; bucketized, the total input read across
    * all batches is exactly one pass (plus this one bucketing shuffle).
    * The explicit `repartition(nBuckets, bucket)` makes each writer task
    * own whole buckets — without it every task writes a sliver into every
    * `bucket=` dir (nTasks x nBuckets small files).
    *
    * Idempotent and crash-safe: the `_PREPARED` marker lands via atomic
    * rename only after the write succeeds; a crash mid-write leaves no
    * marker and the next call rewrites from scratch. */
  def prepareInput(spark: SparkSession, input: DataFrame): Unit = {
    if (Files.exists(preparedMarker)) return
    input.withColumn("bucket", Lineage.bucketOf(col("url"), nBuckets))
      .repartition(nBuckets, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(bucketedDir)
    Files.createDirectories(preparedMarker.getParent)
    val tmp = preparedMarker.resolveSibling(".input_bucketed_PREPARED.tmp")
    Files.writeString(tmp, s"""{"n_buckets": $nBuckets}""")
    Files.move(tmp, preparedMarker, StandardCopyOption.ATOMIC_MOVE)
  }

  /** The scan a commit batch reads when the bucketized layout exists:
    * partition-pruned to `buckets` (visible as PartitionFilters in the
    * plan; only those buckets' files are listed). None before
    * [[prepareInput]] has committed its marker. */
  def batchScan(spark: SparkSession, buckets: Seq[Int]): Option[DataFrame] =
    if (!Files.exists(preparedMarker)) None
    else Some(spark.read.parquet(bucketedDir)
      .filter(col("bucket").isin(buckets.map(Integer.valueOf): _*)))

  /** Process up to `maxBatches` uncommitted bucket-batches (-1 = all).
    * Returns the number of batches committed in this invocation. */
  def run(spark: SparkSession, input: DataFrame, maxBatches: Int = -1): Int = {
    val done = committedBuckets()
    val remaining = (0 until nBuckets).filterNot(done.contains)
    val batches = remaining.grouped(bucketsPerCommit).toVector
    val toRun = if (maxBatches >= 0) batches.take(maxBatches) else batches
    var commitId = commits().map(_.id).maxOption.getOrElse(-1) + 1
    val prevOverwriteMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try toRun.foreach { buckets =>
      val t0 = System.currentTimeMillis()
      val bucketCol = Lineage.bucketOf(col("url"), nBuckets)
      val inBatch = bucketCol.isin(buckets.map(Integer.valueOf): _*)
      // bucketized layout (prepareInput) → partition-pruned scan of just
      // this batch's buckets; otherwise fall back to filtering the full
      // input (correct, but a full scan per batch — fine at test scale)
      val batchInput = batchScan(spark, buckets)
        .map(_.drop("bucket"))
        .getOrElse(input.filter(inBatch))
      val out = ExtractPipeline.run(batchInput, mode).withColumn("bucket", bucketCol)
      // dynamic overwrite: only the bucket=<k> partitions present in `out`
      // are replaced — a rerun of an uncommitted batch lands identically
      out.write.mode("overwrite").partitionBy("bucket").parquet(dataDir)
      // read back the committed bytes (partition-pruned) for row count +
      // lineage — lineage derived from committed data is retry-safe and
      // exactly describes what the snapshot contains
      val committed = spark.read.parquet(dataDir)
        .filter(col("bucket").isin(buckets.map(Integer.valueOf): _*))
      val rows = committed.count()
      val lineage = Lineage.fromOutput(committed.drop("bucket"), nBuckets)
        .withColumn("commit_id", lit(commitId))
      lineage.coalesce(1).write.mode("overwrite")
        .partitionBy("commit_id").parquet(lineageDir)
      writeCommit(Commit(commitId, buckets, rows, System.currentTimeMillis() - t0))
      commitId += 1
    } finally prevOverwriteMode match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    toRun.length
  }

  /** Snapshot read: only buckets recorded in the manifest are visible
    * (partition-pruned scan — uncommitted partial writes are invisible). */
  def output(spark: SparkSession): DataFrame = {
    val done = committedBuckets().toSeq.sorted
    spark.read.parquet(dataDir)
      .filter(col("bucket").isin(done.map(Integer.valueOf): _*))
  }

  /** Committed lineage rows (commit_id, bucket, n_docs, n_pages, checksum,
    * n_filtered, n_errors), restricted to manifest-committed commits. */
  def lineage(spark: SparkSession): DataFrame = {
    val ids = commits().map(c => Integer.valueOf(c.id))
    spark.read.parquet(lineageDir).filter(col("commit_id").isin(ids: _*))
  }
}
