package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-host corpus statistics with explicit skew salting (north rule:
  * "url-hash partitioning with skew salting").
  *
  * Host-keyed aggregation is the one place the synthetic corpus's skew
  * (one host ≈ 30% of urls, FIXTURES.md §4) would concentrate a reduce
  * task. The two-phase salted plan —
  * `groupBy(host, salt).partialAgg → groupBy(host).merge` — bounds any
  * single task's input to 1/S of the hot key; the oracle is the plain
  * single-phase aggregate (results must be identical; q_host_stats).
  * Count/sum aggregates here are algebraic, so at moderate skew Spark's
  * map-side partial aggregation achieves the same effect — the explicit
  * salt matters for the general pattern (e.g. collect-like or
  * high-cardinality-combine aggregates) and is what you reach for when a
  * hot key shows up in AQE's skewed-partition metrics.
  */
object HostStats {

  def hostOf(url: Column): Column =
    regexp_extract(url, "^https?://([^/]+)/", 1)

  /** Two-phase salted per-host stats. */
  def salted(df: DataFrame, saltBuckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("host", hostOf(col("url")))
      .groupBy(col("host"), pmod(xxhash64(col("url")), lit(saltBuckets)).as("__salt"))
      .agg(
        count(lit(1)).as("n_docs_p"),
        sum(length(col("html")).cast("long")).as("payload_bytes_p"))
    partial.groupBy("host")
      .agg(sum(col("n_docs_p")).as("n_docs"),
        sum(col("payload_bytes_p")).as("payload_bytes"))
  }

  /** Single-phase reference plan (the oracle shape). */
  def plain(df: DataFrame): DataFrame =
    df.withColumn("host", hostOf(col("url")))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("html")).cast("long")).as("payload_bytes"))
}
