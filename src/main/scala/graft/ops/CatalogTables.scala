package graft.ops

import org.apache.spark.sql.DataFrame

/** Managed bucketed-table commit shared by the persisted-artifact writers
  * ([[DedupOps.writeBandIndexBucketed]],
  * `ExtractPipeline.commitSnapshotBucketed`). */
object CatalogTables {

  /** `mode(overwrite).bucketBy(...).saveAsTable(name)` that tolerates a
    * STALE warehouse location: with an in-memory catalog (local runs,
    * tests) the catalog dies with the JVM but the warehouse directory
    * persists, and Spark refuses to create a "new" managed table over an
    * existing location; the same orphan arises on a real metastore from a
    * crash between directory creation and catalog commit. If the catalog
    * has no entry for an unqualified `name` but its default-warehouse
    * location exists, remove the orphan directory first. */
  def overwriteBucketed(df: DataFrame, name: String, buckets: Int,
      bucketCols: Seq[String]): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    val spark = df.sparkSession
    if (!name.contains('.') && !spark.catalog.tableExists(name)) {
      val wh = spark.conf.get("spark.sql.warehouse.dir", "")
        .stripPrefix("file:")
      if (wh.nonEmpty) {
        val loc = java.nio.file.Paths.get(wh, name.toLowerCase)
        if (java.nio.file.Files.exists(loc))
          java.nio.file.Files.walk(loc)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(name)
  }
}
