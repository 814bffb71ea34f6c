package graft.ops

import graft.ops.MultimodalOps.Codec
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual image near-dup: dHash64 determinism and locality, the
  * 4×16-band pigeonhole exactness vs brute-force all-pairs, and the
  * never-throw decode contract. */
class DHashSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("dHash64: deterministic; identical images hash equal; encode/decode round-trip stable") {
    val img = MultimodalOps.noiseImage(50, 40, seed = 7L)
    val h1 = Codec.dHash64(img)
    assert(h1 == Codec.dHash64(MultimodalOps.noiseImage(50, 40, seed = 7L)))
    assert(h1 == Codec.dHash64(Codec.decodeImage(Codec.encodePng(img))))
    // unrelated seeds land far apart (hamming ~ 32)
    val h2 = Codec.dHash64(MultimodalOps.noiseImage(50, 40, seed = 8L))
    assert(java.lang.Long.bitCount(h1 ^ h2) > 3)
    // the gradient pattern's documented degeneracy: all-ones for any seed
    assert(Codec.dHash64(MultimodalOps.patternImage(50, 40, seed = 7L)) == -1L)
  }

  test("one-grid-cell perturbation flips at most 2 bits (the locality the planted corpus relies on)") {
    import spark.implicits._
    val rows = MultimodalOps.plantedNearDupMedia(spark, nBase = 12L, seed = 5L).collect()
    rows.grouped(4).foreach { g =>
      val Array(base, copy, pert, _) = g.map(r => Codec.dHash64(Codec.decodeImage(r.payload)))
      assert(base == copy)
      assert(hamming(base, pert) <= 2, s"perturbation flipped ${hamming(base, pert)} bits")
    }
  }

  test("tiny images (smaller than the 9x8 grid) hash without error") {
    for ((w, h) <- Seq((1, 1), (3, 2), (8, 8), (9, 7)))
      Codec.dHash64(MultimodalOps.patternImage(w, h, seed = 1L)) // must not throw
  }

  test("nearDupPairs64 equals brute-force all-pairs at hamming <= 3; corrupt rows excluded") {
    import spark.implicits._
    val media = MultimodalOps.plantedNearDupMedia(spark, nBase = 16L, seed = 3L)
    val withCorrupt = media.union(Seq(
      MultimodalOps.MediaRow(9999L, Array[Byte](1, 2, 3),
        MultimodalOps.MediaMeta("image/png", 0, 0, 0L, 1))).toDS())
    val hashes = MultimodalOps.imageDHash(withCorrupt)
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
    // the planted structure is actually present: every (base, copy) pair
    val ids = got.map(p => (p._1, p._2))
    (0L until 16L).foreach(i => assert(ids.contains((4 * i, 4 * i + 1))))
  }
}
