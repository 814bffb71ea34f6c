package graft.kernel

import graft.core.{PageDoc, PromptMode}
import graft.gen.InputGen
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input contract: at web scale EVERY byte pattern eventually
  * arrives, and the kernel's I3 contract is "never throw — emit a typed
  * error row" (a thrown exception fails the Spark task 4× then kills the
  * job). Seeded mutations of real generated payloads (bit flips,
  * truncations, splices, duplications) across every dispatch branch must
  * always produce rows, never exceptions, in bounded time. */
class FuzzSpec extends AnyFunSuite {

  private def mutate(rng: InputGen.Rng, bytes: Array[Byte]): Array[Byte] = {
    if (bytes.isEmpty) return bytes
    rng.nextInt(5) match {
      case 0 => // truncate at a random point
        bytes.take(1 + rng.nextInt(bytes.length))
      case 1 => // flip k random bits
        val out = bytes.clone()
        (0 until 1 + rng.nextInt(8)).foreach { _ =>
          val i = rng.nextInt(out.length)
          out(i) = (out(i) ^ (1 << rng.nextInt(8))).toByte
        }
        out
      case 2 => // splice a random window over another offset
        val from = rng.nextInt(bytes.length)
        val to = rng.nextInt(bytes.length)
        val len = math.min(1 + rng.nextInt(64), bytes.length - math.max(from, to))
        val out = bytes.clone()
        if (len > 0) System.arraycopy(bytes, from, out, to, len)
        out
      case 3 => // duplicate a chunk (repeated obj headers, nested streams)
        val at = rng.nextInt(bytes.length)
        val len = math.min(1 + rng.nextInt(128), bytes.length - at)
        bytes.take(at + len) ++ bytes.slice(at, at + len) ++ bytes.drop(at + len)
      case _ => // random garbage injection
        val at = rng.nextInt(bytes.length)
        val junk = Array.fill(1 + rng.nextInt(32))(rng.nextInt(256).toByte)
        bytes.take(at) ++ junk ++ bytes.drop(at)
    }
  }

  test("fanOut + parseDoc never throw on mutated payloads, bounded time, every branch") {
    // seed docs across the dispatch branches: html, pdf-lite, REAL pdf
    // (raw + flate), rastered, garbled, truncated
    val seeds: Seq[Array[Byte]] =
      (0L until 64L).map(i => InputGen.generate(42L, i).html) ++
      (0L until 512L).filter(i => InputGen.isRealPdfDoc(i)).take(16)
        .map(i => InputGen.generate(42L, i).html) ++
      (0L until 1024L).filter(i => InputGen.kindOf(42L, i) == "image").take(16)
        .map(i => InputGen.generate(42L, i).html) // PNG/JPEG image branch (r4)
    var checked = 0
    seeds.zipWithIndex.foreach { case (payload, si) =>
      val rng = new InputGen.Rng(9L, si.toLong, 7L)
      (0 until 40).foreach { mi =>
        var b = payload
        (0 to rng.nextInt(2)) foreach { _ => b = mutate(rng, b) }
        val doc = PageDoc(s"fuzz://$si/$mi", new java.sql.Timestamp(0L), b, "", "en")
        val t0 = System.nanoTime()
        val pages = ExtractKernel.fanOut(doc) // must not throw
        pages.foreach { p =>
          val parsed = ExtractKernel.parsePage(p, PromptMode.LayoutAll) // must not throw
          assert(parsed.url == doc.url)
        }
        val full = ExtractKernel.parseDoc(doc, PromptMode.LayoutAll) // must not throw
        assert(full.nonEmpty, "parseDoc must emit at least one (possibly error) row")
        val dtMs = (System.nanoTime() - t0) / 1e6
        assert(dtMs < 30000, s"pathological slowdown: ${dtMs}ms on seed $si mut $mi")
        checked += 1
      }
    }
    assert(checked >= 3000, s"fuzz corpus too small: $checked")
  }
}
