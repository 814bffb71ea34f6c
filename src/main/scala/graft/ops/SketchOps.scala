package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size mergeable sketches for corpus-wide statistics — the
  * cardinality and frequency questions a 100-TB curation run asks
  * continuously ("how many distinct urls per host?", "which tokens are
  * heavy?") without paying a full-key shuffle or an exact global sort.
  *
  * Both sketches are DETERMINISTIC given the md5-prefix hash both engines
  * share (the [[TextOps.md5Bucket]] convention), so the DuckDB oracle
  * replays the sketch construction and the estimates bit-for-bit; the
  * accuracy-vs-exact bounds are pinned in SketchSpec.
  *
  * Scale shape: every sketch is an algebraic aggregate — per-partition
  * state is bounded by the sketch size (HLL: m registers; CMS: d·w
  * cells), map-side combine shrinks each partition to at most that many
  * rows before the shuffle, and sketches of disjoint slices merge by
  * max / sum. Nothing downstream ever sees the raw key stream.
  */
object SketchOps {

  /** 60-bit engine-portable hash: md5 hex prefix as an integer, replayed
    * in DuckDB as `CAST('0x' || substring(md5(x),1,15) AS BIGINT)`.
    * Non-negative (60 bits < sign bit). */
  private def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** HyperLogLog register table for COUNT(DISTINCT keyCol) per group:
    * one row per (group, register) with the max rank observed — the
    * standard Flajolet HLL state, kept RELATIONAL so register tables of
    * different corpus slices merge with a plain `groupBy(...).max(rho)`
    * (the same artifact-reuse shape as the LSH band index).
    *
    * Register index = low p bits of the 60-bit hash; rank rho = leading
    * zeros of the remaining W = 60-p bits, plus one. The leading-zero
    * count is INTEGRAL in both engines via the binary-string length
    * (`bin(w)` renders without leading zeros in Spark and DuckDB alike):
    * rho = W - length(bin(w)) + 1, and W + 1 for w = 0.
    *
    * Shuffle volume: after map-side combine at most 2^p rows per group
    * per partition — a terabyte-scale key column reduces to kilobytes. */
  def hllRegisters(df: DataFrame, keyCol: String, groupCols: Seq[String],
      p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p outside [4,16]")
    val m = 1L << p
    val bigW = 60 - p
    // integral DIV, never Column./ — float division of a 60-bit hash
    // loses bits past the 53-bit double mantissa
    df.select((groupCols.map(col) :+ md5Hash60(col(keyCol)).as("__h")): _*)
      .withColumn("reg", pmod(col("__h"), lit(m)))
      .withColumn("__w", expr(s"__h DIV ${m}L"))
      .withColumn("__rho",
        when(col("__w") > 0, lit(bigW) - length(bin(col("__w"))) + 1)
          .otherwise(lit(bigW + 1)))
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("__rho")).cast("long").as("rho"))
  }

  /** Fixed-point alpha_m correction constant (parts-per-million) — a
    * LITERAL baked into both engines' arithmetic, so the estimate is
    * engine-exact integer math end to end. */
  def alphaPpm(p: Int): Long = {
    val m = (1L << p).toDouble
    math.round(1e6 * 0.7213 / (1 + 1.079 / m))
  }

  /** Distinct-count estimate per group from an HLL register table.
    * All-integral fixed-point form of alpha_m * m^2 / sum(2^-rho):
    * the harmonic-mean denominator is scaled by 2^30 (ranks beyond 30
    * truncate to 0 — their true contribution is < 2^-30 and BOTH engines
    * truncate identically), absent registers contribute 2^30 each
    * (rho = 0), and the two integer divisions replay verbatim in DuckDB.
    * `est2 = m^2 * 2^30 DIV denom` is capped at 10^12 so the fixed-point
    * product never overflows a long (the estimate saturates at a
    * trillion distinct keys per group — document-scale, not a limit a
    * curation job reaches per host).
    *
    * Raw-estimate regime only (cardinality ≳ 2.5m): the small-range
    * linear-counting correction needs a log over one SCALAR per group —
    * a read-time choice, deliberately outside the engine-exact core.
    * `n_registers` ships alongside so callers can apply it. */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1L << p
    val term = expr("shiftleft(1L, CAST(30 - least(rho, 30L) AS INT))")
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_registers"), sum(term).as("__present"))
      .withColumn("__denom",
        greatest(col("__present") + (lit(m) - col("n_registers")) * lit(1L << 30), lit(1L)))
      .withColumn("__est2",
        least(expr(s"(${m * m}L * ${1L << 30}L) DIV __denom"), lit(1000000000000L)))
      .withColumn("estimate", expr(s"(${alphaPpm(p)}L * __est2) DIV 1000000L"))
      .drop("__present", "__denom", "__est2")
  }

  /** COUNT(DISTINCT keyCol) per group, estimated: registers + estimate in
    * one call. The register build is the only shuffle; the estimate is a
    * second agg over ≤ m rows per group. */
  def hllDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String],
      p: Int = 12): DataFrame =
    hllEstimate(hllRegisters(df, keyCol, groupCols, p), groupCols, p)

  /** Count-min sketch over a token stream: `depth` independent hash rows
    * of `width` cells; cell (r, c) counts every token whose r-th hash
    * lands on c. At most depth·width rows regardless of corpus size —
    * the mergeable frequency summary (sketches of two slices ADD).
    * Row hashes are md5 over a row-tagged token ("r<r>:<token>"), so
    * DuckDB replays cell assignment exactly. */
  def cmsBuild(df: DataFrame, textCol: String, depth: Int = 4,
      width: Int = 4096): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth=$depth outside [1,8]")
    val tok = df.select(explode(TextOps.tokens(col(textCol))).as("token"))
    val cells = array((0 until depth).map { r =>
      struct(lit(r).as("r"),
        pmod(conv(substring(md5(concat(lit(s"r$r:"), col("token"))), 1, 8), 16, 10)
          .cast("long"), lit(width.toLong)).as("cell"))
    }: _*)
    tok.select(explode(cells).as("rc"))
      .select(col("rc.r").as("r"), col("rc.cell").as("cell"))
      .groupBy("r", "cell")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for a probe-token table against a built
    * sketch: est(token) = min over rows of its cell count (the classic
    * one-sided CMS bound — never under-counts, over-counts only on
    * collisions). The probe side re-derives its d cells map-side and
    * joins the ≤ d·w-row sketch — AQE broadcasts the sketch, the probe
    * stream never shuffles. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, tokenCol: String,
      depth: Int = 4, width: Int = 4096): DataFrame = {
    // cells is applied AFTER the rename below, so it must read "token",
    // not tokenCol — they differ whenever the caller's column isn't
    // literally named "token"
    val cells = array((0 until depth).map { r =>
      struct(lit(r).as("r"),
        pmod(conv(substring(md5(concat(lit(s"r$r:"), col("token"))), 1, 8), 16, 10)
          .cast("long"), lit(width.toLong)).as("cell"))
    }: _*)
    probes.select(col(tokenCol).as("token"))
      .distinct()
      .select(col("token"), explode(cells).as("rc"))
      .select(col("token"), col("rc.r").as("r"), col("rc.cell").as("cell"))
      .join(sketch, Seq("r", "cell"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Heavy-hitter report: probe tokens whose CMS-estimated corpus
    * frequency clears `minCount`. The candidate set is the caller's (a
    * sample slice, yesterday's heavy set, a watchlist) — the sketch
    * answers any candidate stream without re-scanning the corpus. */
  def cmsHeavy(df: DataFrame, textCol: String, probes: DataFrame,
      tokenCol: String, minCount: Long, depth: Int = 4,
      width: Int = 4096): DataFrame =
    cmsEstimate(cmsBuild(df, textCol, depth, width), probes, tokenCol, depth, width)
      .filter(col("est") >= minCount)
}
