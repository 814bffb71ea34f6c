package graft.ops

import graft.ops.MultimodalOps.Codec
import org.scalatest.funsuite.AnyFunSuite

/** Audio near-dup: audioHash64 determinism through the WAV round trip,
  * one-time-block perturbation locality, and the shared banded pairer
  * vs brute-force all-pairs — mirroring DHashSpec on the audio axis. */
class AudioHashSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("audioHash64: deterministic; WAV encode/decode round-trip stable; unrelated clips far") {
    import spark.implicits._
    val rows = MultimodalOps.plantedNearDupAudio(spark, nBase = 8L, seed = 9L).collect()
    rows.grouped(4).foreach { g =>
      val Array(base, copy, pert, far) =
        g.map(r => Codec.audioHash64(Codec.decodeWavSamples(r.payload)._1))
      assert(base == copy)
      assert(hamming(base, pert) <= 2, s"perturbation flipped ${hamming(base, pert)} bits")
      assert(hamming(base, far) > 3, s"unrelated clip at hamming ${hamming(base, far)}")
    }
    // decoding the same payload twice yields the same hash
    val p = rows.head.payload
    assert(Codec.audioHash64(Codec.decodeWavSamples(p)._1) ==
      Codec.audioHash64(Codec.decodeWavSamples(p)._1))
  }

  test("degenerate clips hash without error") {
    assert(Codec.audioHash64(Array.empty[Short]) == 0L)
    Codec.audioHash64(Array[Short](5))            // shorter than the grid
    Codec.audioHash64(Array.fill[Short](64)(100)) // exactly one sample short
    // constant amplitude → no block louder than its neighbor → hash 0
    assert(Codec.audioHash64(Array.fill[Short](650)(1000)) == 0L)
  }

  test("nearDupPairs64 over audio hashes equals brute-force all-pairs; corrupt rows excluded") {
    import spark.implicits._
    val media = MultimodalOps.plantedNearDupAudio(spark, nBase = 16L, seed = 4L)
    val withCorrupt = media.union(Seq(
      MultimodalOps.MediaRow(9999L, Array[Byte](1, 2, 3),
        MultimodalOps.MediaMeta("audio/wav", 0, 0, 0L, 0))).toDS())
    val hashes = MultimodalOps.audioDHash(withCorrupt)
    assert(hashes.filter($"error" =!= "").as[(Long, Long, String)].collect()
      .map(_._1).toSeq == Seq(9999L))
    val got = MultimodalOps.nearDupPairs64(hashes)
      .as[(Long, Long, Long)].collect().toSet
    val hs = hashes.filter($"error" === "").as[(Long, Long, String)].collect()
      .map(r => (r._1, r._2))
    val want = (for {
      (ia, da) <- hs; (ib, db) <- hs
      if ia < ib && hamming(da, db) <= 3
    } yield (ia, ib, hamming(da, db).toLong)).toSet
    assert(got == want)
    val ids = got.map(p => (p._1, p._2))
    (0L until 16L).foreach(i => assert(ids.contains((4 * i, 4 * i + 1))))
  }
}
