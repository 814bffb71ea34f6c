package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a binary min-heap keyed WORST-first under the
  * ordering (sim desc, id asc), so the root is the entry to evict. Holds
  * at most k entries — this is what keeps the aggregate's partial state
  * (and therefore the shuffle) O(k) instead of O(group size). */
final class TopKBuffer(val k: Int) {
  val sims = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** a is WORSE than b under (sim desc, id asc)? */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(sims(i), ids(i), sims(p), ids(p))) {
        val ts = sims(i); sims(i) = sims(p); sims(p) = ts
        val ti = ids(i); ids(i) = ids(p); ids(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < size && worse(sims(l), ids(l), sims(w), ids(w))) w = l
      if (r < size && worse(sims(r), ids(r), sims(w), ids(w))) w = r
      if (w == i) return
      val ts = sims(i); sims(i) = sims(w); sims(w) = ts
      val ti = ids(i); ids(i) = ids(w); ids(w) = ti
      i = w
    }
  }

  def add(sim: Double, id: Long): Unit = {
    if (size < k) {
      sims(size) = sim; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (worse(sims(0), ids(0), sim, id)) {
      sims(0) = sim; ids(0) = id; siftDown()
    }
  }

  /** Entries best-first. */
  def sorted: Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (sims(i), ids(i)))
    out.sortWith { case ((sa, ia), (sb, ib)) => sa > sb || (sa == sb && ia < ib) }
  }
}

/** Per-group exact top-k under (sim desc, id asc) as a
  * TypedImperativeAggregate — the map-side partial state is a k-bounded
  * heap, so a `groupBy(query).agg(topK)` plan shuffles at most k entries
  * per (group, task) instead of every scored row. This replaces the
  * round-1 `row_number().over(Window.partitionBy(query))` top-k, which
  * shuffled every corpus score and landed each query's entire score set
  * on one task (the documented large-q scale hazard).
  *
  * Output: array<struct<sim:double, neighbor_id:bigint>> best-first.
  */
case class TopKSimAgg(
    sim: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0)

  override def children: Seq[Expression] = Seq(sim, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_sim"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = sim.eval(input)
    val i = id.eval(input)
    // NaN similarities (CosineSim of a zero-norm/empty vector) are skipped:
    // NaN makes every `worse` comparison false (never evicted, and sortWith
    // can throw on the broken total order). The replaced row_number window
    // ordered NaN as LARGEST — ranking an undefined similarity first; the
    // defined-sims-only semantics here is the documented divergence.
    if (s != null && i != null) {
      val sv = s.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(sv)) buf.add(sv, i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.add(other.sims(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.sims(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSimAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSimAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKSimAgg =
    copy(sim = newChildren(0), id = newChildren(1))
}

object TopKSimAgg {
  /** Column form: topK(sim, neighborId, k) → array<struct<sim, neighbor_id>>. */
  def apply(sim: Column, neighborId: Column, k: Int): Column =
    ColumnBridge.column(
      TopKSimAgg(ColumnBridge.expression(sim), ColumnBridge.expression(neighborId), k)
        .toAggregateExpression())
}
