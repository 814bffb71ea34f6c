package graft.pipeline

import graft.SparkTestBase
import graft.gen.InputTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-refactor byte-identity pin: the full extraction output for a fixed
  * (seed, size) input hashes to a committed constant. Any change to the
  * extraction semantics — kernel, repair chain, rendering, assembly — must
  * update this constant DELIBERATELY (it is the per-url byte-identity
  * contract of the north rule, frozen). */
class OutputDigestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // seed=99, n=120; confirmed identical across independent JVMs (sbt run
  // JVM + standalone consumer via graft.tools.DigestMain). r3: raster-backed
  // Picture cells embed REAL crops (base64 PNG of the page-raster region),
  // and ~2.4% of docs are REAL %PDF- payloads parsed by the PdfReal
  // text-layer parser. r4 (deliberate corpus+kernel change): ~5% of docs
  // are now PNG/JPEG image payloads routed through the S1 image branch
  // (full-bleed Picture cell embeds the SOURCE bytes — pixel-identical,
  // container-preserving fast path), and 1-in-5 real PDFs carry a trailing
  // raster-only scanned page (full-page Picture fallback).
  // (corpus images are block-pattern compressible — the earlier per-pixel
  // noise images were ~200 KB each and their md embeds 3×'d the wall)
  val PinnedDigest: Int = 1779383505

  test("extraction output digest matches the pinned constant") {
    val out = ExtractPipeline.run(InputTable.generate(spark, 120L, seed = 99L))
      .orderBy("url")
      .select(concat_ws("", col("url"), col("md"), col("md_nohf"),
        col("extracted_text"), col("cells_json"), col("filtered").cast("string"), col("error")))
      .collect().map(_.getString(0)).mkString("")
    assert(scala.util.hashing.MurmurHash3.stringHash(out) == PinnedDigest,
      "extraction output changed — if intentional, update PinnedDigest and note it in the commit")
  }
}
