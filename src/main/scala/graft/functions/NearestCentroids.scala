package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: the `nprobe` nearest IVF centroids (by
  * cosine similarity, ties broken by centroid index) for an
  * `array<float|double>` vector against a small literal codebook.
  * Returns `array<int>` of centroid indices, best-first.
  *
  * Replaces the round-2 `probeListExpr` — an `array_sort` over `nlist`
  * per-row struct allocations with an interpreted comparator lambda and
  * `nlist` typedLit arrays inflating the plan tree. Here the codebook is
  * one reference object; per-row work is `nlist` fused cosine loops + an
  * O(nlist·nprobe) selection, no allocation beyond the output.
  *
  * Cosine arithmetic matches [[CosineSim]] exactly (sequential
  * `dot/(sqrt·sqrt)` in doubles) so the DuckDB oracle's
  * `list_cosine_similarity` replay keeps agreeing to ~1 ulp. NaN
  * similarities (zero-norm vector) rank WORST, ties by index — for an
  * all-NaN row this yields indices 0..nprobe-1, the same as the replaced
  * comparator's tie behavior.
  */
case class NearestCentroids(
    child: Expression,
    centroids: Vector[Vector[Double]],
    nprobe: Int)
  extends UnaryExpression {

  require(nprobe >= 1, s"nprobe must be positive, got $nprobe")
  require(centroids.nonEmpty, "empty codebook")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  @transient private lazy val cmat: Array[Array[Double]] = centroids.map(_.toArray).toArray
  @transient private lazy val cnorm: Array[Double] =
    cmat.map(c => math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x)))

  def probes(arr: ArrayData): GenericArrayData = {
    val m = cmat.length
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    // per-centroid cosine, CosineSim-identical accumulation order
    val sims = new Array[Double](m)
    var c = 0
    while (c < m) {
      val cv = cmat(c)
      val len = math.min(n, cv.length)
      var dot = 0.0; var nx = 0.0
      var j = 0
      while (j < len) {
        dot += v(j) * cv(j); nx += v(j) * v(j)
        j += 1
      }
      sims(c) = dot / (math.sqrt(nx) * cnorm(c))
      c += 1
    }
    // top-nprobe selection under (sim desc, idx asc), NaN worst
    val k = math.min(nprobe, m)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](m)
    var slot = 0
    while (slot < k) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      var c2 = 0
      while (c2 < m) {
        if (!taken(c2)) {
          val s = sims(c2)
          val sv = if (java.lang.Double.isNaN(s)) Double.NegativeInfinity else s
          if (best < 0 || sv > bestSim) { best = c2; bestSim = sv }
        }
        c2 += 1
      }
      taken(best) = true
      out(slot) = best
      slot += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    probes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ncent", this, classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object NearestCentroids {
  /** Column wrapper: nearest_centroids(vec) → array<int>, best-first. */
  def apply(vec: Column, centroids: Vector[Vector[Double]], nprobe: Int): Column =
    ColumnBridge.column(NearestCentroids(ColumnBridge.expression(vec), centroids, nprobe))
}
