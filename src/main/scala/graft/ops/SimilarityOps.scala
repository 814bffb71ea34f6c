package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design:
  *   - brute force = broadcast(queries) × corpus with a codegen'd cosine
  *     (zip_with + aggregate) and a per-query top-k window — the exact
  *     baseline, one corpus scan, no O(n²) shuffle;
  *   - IVF = k coarse centroids (deterministic farthest-point seed over a
  *     small sample), corpus partitioned by nearest centroid once, queries
  *     probe only `nprobe` inverted lists — scans `nprobe/k` of the data.
  */
object SimilarityOps {

  /** Σ aᵢbᵢ in double precision, sequential (engine-exact, codegen). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query id in `queries` (small,
    * broadcast) against `corpus`. Output: (query_id, neighbor_id, rank). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("sim", cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Deterministic coarse centroids: the first `k` corpus vectors by id
    * (stable, seedless; farthest-point refinement is an extension point). */
  def coarseCentroids(corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid"))
      .withColumn("centroid_idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("centroid_id"))) - 1)

  /** IVF top-k: corpus assigned to nearest centroid (one broadcast pass);
    * each query probes its `nprobe` nearest centroids' lists only. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = coarseCentroids(corpus, idCol, vecCol, nlist)
    // assign: argmax cosine over centroids
    def assign(df: DataFrame, vec: Column, outCol: String, top: Int): DataFrame = {
      val scored = df.crossJoin(broadcast(cents))
        .withColumn("csim", cosine(vec, col("centroid")))
      val w = Window.partitionBy(df.columns.head).orderBy(col("csim").desc, col("centroid_idx"))
      scored.withColumn("crank", row_number().over(w))
        .filter(col("crank") <= top)
        .withColumnRenamed("centroid_idx", outCol)
        .drop("centroid", "centroid_id", "csim", "crank")
    }
    val c = assign(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec")),
      col("cvec"), "list_idx", 1)
    val q = assign(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")),
      col("qvec"), "list_idx", nprobe)
    val scored = c.join(broadcast(q), Seq("list_idx"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
      .dropDuplicates("query_id", "neighbor_id") // a pair may meet in several probed lists
  }

  /** Random-hyperplane LSH bucket signature for cosine (sign bits of
    * projections onto `nbits` pseudo-random hyperplanes derived from a
    * seeded hash — no stored projection matrix). */
  def cosineLshSignature(vec: Column, nbits: Int = 16, seed: Int = 7): Column =
    (0 until nbits).foldLeft(lit(0L)) { (acc, bit) =>
      // pseudo-random ±1 weights per (bit, dim) via xxhash64
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          x.cast("double") * when(
            xxhash64(lit(seed), lit(bit), i).bitwiseAND(1L) === 1L, 1.0).otherwise(-1.0)),
        lit(0.0), (a, x) => a + x)
      acc.bitwiseOR(when(proj > 0, lit(1L << bit)).otherwise(lit(0L)))
    }
}
