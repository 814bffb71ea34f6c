package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking: boundary invariants, insert-resync (the
  * property fixed-size blocks lack), max-size forcing, determinism, and
  * the delta/stats relational ops. */
class CdcSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark

  private def randBytes(n: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt(256).toByte)
  }

  test("boundaries cover the payload exactly once within [min, max]; tail may undershoot min") {
    val b = randBytes(10000, 3L)
    val chunks = DedupOps.cdcChunks(b, minSize = 64, maskBits = 8, maxSize = 1024)
    assert(chunks.nonEmpty)
    assert(chunks.head._1 == 0)
    chunks.sliding(2).foreach { case Vector((o1, l1), (o2, _)) => assert(o1 + l1 == o2); case _ => () }
    assert(chunks.last._1 + chunks.last._2 == b.length)
    chunks.init.foreach { case (_, l) => assert(l >= 64 && l <= 1024) }
    assert(chunks.last._2 <= 1024)
    // deterministic
    assert(DedupOps.cdcChunks(b, 64, 8, 1024) == chunks)
    // degenerate inputs
    assert(DedupOps.cdcChunks(Array.emptyByteArray).isEmpty)
    assert(DedupOps.cdcChunks(null).isEmpty)
  }

  test("insert-resync: a mid-payload insertion shifts offsets but most chunk CONTENT survives") {
    val a = randBytes(8192, 7L)
    val marker = "<!-- rev2 -->".getBytes("UTF-8")
    val bArr = a.take(4096) ++ marker ++ a.drop(4096)
    def hashes(x: Array[Byte]) = DedupOps.cdcChunks(x, 64, 8, 1024).map {
      case (o, l) => graft.sources.Warc.payloadDigest(java.util.Arrays.copyOfRange(x, o, o + l))
    }
    val ha = hashes(a); val hb = hashes(bArr)
    val shared = ha.toSet.intersect(hb.toSet).size
    // all chunks strictly before the edit point are byte-identical, and
    // the gear window (64 bytes) re-syncs shortly after it — most of the
    // snapshot is shared despite every post-edit offset shifting
    assert(shared * 10 >= ha.size * 6, s"shared $shared of ${ha.size}")
    // a fixed-size blocker would share NOTHING after the edit point:
    // verify CDC shares content from the shifted tail too
    val preEdit = DedupOps.cdcChunks(a, 64, 8, 1024).count { case (o, l) => o + l <= 4096 }
    assert(shared > preEdit, "resync must recover chunks AFTER the insertion")
  }

  test("max-size forcing: a constant payload that never hits the mask still chunks") {
    val b = Array.fill(5000)(65.toByte)
    val chunks = DedupOps.cdcChunks(b, 64, 8, 512)
    // either natural boundaries or forced ones — every non-tail chunk
    // obeys the max, and a constant stream yields constant-size chunks
    assert(chunks.init.forall(_._2 <= 512))
    assert(chunks.map(_._2).sum == 5000)
    assert(chunks.init.map(_._2).distinct.size <= 1)
  }

  test("chunkTable / chunkDedupStats / chunkDelta: spark surface over planted snapshots") {
    import spark.implicits._
    val a = randBytes(4000, 11L)
    val marker = "X-EDIT".getBytes("UTF-8")
    val b2 = a.take(2000) ++ marker ++ a.drop(2000)
    val snapA = Seq(("u1", a), ("u2", randBytes(3000, 13L))).toDF("url", "html")
    val snapB = Seq(("u1", b2)).toDF("url", "html")
    val ca = DedupOps.chunkTable(snapA, "url", "html")
    val cb = DedupOps.chunkTable(snapB, "url", "html")
    // per-doc coverage survives the spark round trip
    val cov = ca.groupBy("id").agg(org.apache.spark.sql.functions.sum("len").as("n"))
      .as[(String, Long)].collect().toMap
    assert(cov == Map("u1" -> 4000L, "u2" -> 3000L))
    // stats: two distinct docs, no cross-doc dup chunks expected in random bytes
    val st = DedupOps.chunkDedupStats(ca).as[(Long, Long, Long, Long)].collect().head
    assert(st._1 >= st._2 && st._3 == 7000L && st._4 <= st._3)
    // delta: u1's edit produces a small delta, not the whole shifted tail
    val delta = DedupOps.chunkDelta(ca, cb).as[(String, Long, Long, Long, String)].collect()
    val nB = cb.count()
    assert(delta.nonEmpty && delta.length < nB / 2,
      s"delta ${delta.length} of $nB chunks — resync failed")
    assert(delta.forall(_._1 == "u1"))
  }
}
