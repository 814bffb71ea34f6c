package graft.ops

import graft.ops.MultimodalOps.Codec
import org.scalatest.funsuite.AnyFunSuite

/** Video near-dup: per-frame dHash determinism over the demuxed
  * container, the torn/hostile-container error contract (incl. the
  * pre-allocation length guard), and the doc-level banded pairing vs
  * brute-force frame-pair aggregation. */
class VideoHashSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("per-frame hashes: copy identical on every frame; perturbed clip differs on exactly one frame by <= 2 bits") {
    import spark.implicits._
    val rows = MultimodalOps.plantedNearDupVideos(spark, nBase = 10L, seed = 6L).collect()
    rows.grouped(4).foreach { g =>
      def frames(r: MultimodalOps.MediaRow): Array[Long] =
        (0 until Codec.videoFrameCount(r.payload)).map(f =>
          Codec.dHash64(Codec.decodeImage(Codec.decodeVideoFrame(r.payload, f)))).toArray
      val Array(base, copy, pert, _) = g.map(frames)
      assert(base.sameElements(copy))
      assert(base.length == pert.length)
      val diffs = base.indices.filter(i => base(i) != pert(i))
      assert(diffs.size <= 1)
      diffs.foreach(i => assert(hamming(base(i), pert(i)) <= 2))
    }
  }

  test("torn and hostile containers yield one typed error row, never a throw or an allocation") {
    import spark.implicits._
    val good = MultimodalOps.plantedNearDupVideos(spark, nBase = 1L, seed = 2L)
      .collect().head
    // truncated tail: frame count readable, first frame length is not
    val torn = good.payload.take(6)
    // hostile: declares one frame of length Int.MaxValue (a naive decoder
    // allocates 2 GiB before noticing the payload is 12 bytes long)
    val hostile = java.nio.ByteBuffer.allocate(12)
      .putInt(1).putInt(Int.MaxValue).putInt(0).array()
    val media = Seq(
      good,
      MultimodalOps.MediaRow(100L, torn, good.meta),
      MultimodalOps.MediaRow(101L, hostile, good.meta)).toDS()
    val out = MultimodalOps.videoFrameDHash(media)
      .as[(Long, Int, Long, String)].collect()
    assert(out.filter(_._1 == good.media_id).forall(_._4 == ""))
    for (bad <- Seq(100L, 101L)) {
      val rows = out.filter(_._1 == bad)
      assert(rows.length == 1 && rows.head._2 == -1 && rows.head._4.nonEmpty,
        s"media $bad: ${rows.toSeq}")
    }
  }

  test("videoNearDupPairs equals brute-force frame-pair aggregation at hamming <= 3") {
    import spark.implicits._
    val media = MultimodalOps.plantedNearDupVideos(spark, nBase = 12L, seed = 8L)
    val hashes = MultimodalOps.videoFrameDHash(media)
    val got = MultimodalOps.videoNearDupPairs(hashes)
      .as[(Long, Long, Long, Long)].collect().toSet
    val hs = hashes.as[(Long, Int, Long, String)].collect()
      .filter(_._4 == "").map(r => (r._1, r._2, r._3))
    val matched = for {
      (ia, fa, da) <- hs; (ib, fb, db) <- hs
      if ia < ib && hamming(da, db) <= 3
    } yield ((ia, ib), hamming(da, db).toLong)
    val want = matched.groupBy(_._1).map { case ((ia, ib), ms) =>
      (ia, ib, ms.size.toLong, ms.map(_._2).min)
    }.toSet
    assert(got == want)
    // planted structure: every (base, copy) pair matches on ALL frames
    val byPair = got.map(p => ((p._1, p._2), p._3)).toMap
    (0L until 12L).foreach { i =>
      val nf = Codec.videoFrameCount(media.filter($"media_id" === 4 * i).collect().head.payload)
      assert(byPair((4 * i, 4 * i + 1)) == nf.toLong)
    }
  }
}
