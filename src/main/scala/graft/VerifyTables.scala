package graft

import graft.gen.{InputGen, InputTable}
import graft.ops.{DedupOps, RepairJob, TextOps}
import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Materialized side tables for the driver's DuckDB oracle.
  *
  * Round 1 left 18 queries rows-only because the synthetic north-rule
  * table (and everything computed from it) existed only in Spark memory —
  * DuckDB had nothing to replay against. This module materializes the
  * deterministic inputs AND the kernel-computed intermediates to parquet
  * under a content-keyed /tmp root, so:
  *   - Spark queries and DuckDB oracles read byte-identical inputs;
  *   - kernel outputs DuckDB cannot recompute (extraction pages, minhash/
  *     simhash signatures, shingle sets, repair cases) become *inputs*
  *     whose downstream RELATIONAL logic (explode, band join, threshold,
  *     ordered assembly, aggregation) DuckDB replays independently — the
  *     cross-engine check the correctness gate wants. Byte-identity of
  *     the kernel itself stays pinned by the golden suites in sbt test.
  *
  * Everything here is a pure function of (sf tier, seed), so the path is
  * keyed by (version, nDocs, seed) and tables are written at most once.
  */
object VerifyTables {

  // bump whenever kernel/signature semantics change, or stale /tmp dumps
  // would be replayed (r4: image payload kind + scanned-PDF pages in the
  // corpus; OCR/garbled passthrough fix; per-mode page dumps; media
  // determinism dumps; r4e: cross-host outlinks in the corpus + the
  // extracted links table; r5: kernel semantics touched — ToUnicode CMap
  // decode, truncated-image gate, JPEG fill-byte scan — none of which
  // alters the synthetic corpus's dumps, but stale-dump insurance is
  // cheaper than reasoning about it every round; r5b: + page_meta)
  private val Version = "r5b"
  val Seed = 42L

  /** All table names, in dependency order. */
  val names: Vector[String] = Vector(
    "northrule", "extract_pages", "extract_pages_ocr",
    "extract_pages_layout_only", "extract_docs", "repair_cases",
    "parse_flex_cases", "minhash_sigs", "simhash_sigs", "shingles",
    "doc_vectors", "grounding_cells", "ivf_centroids",
    "media_features", "frame_samples", "links", "anchors", "fingerprints",
    "robots_rules", "robots_sitemaps", "page_meta", "sitemap_entries",
    "warc_files", "alternates", "image_dhash", "audio_dhash",
    "video_frame_dhash", "html_blocks", "robots_delays",
    "cdc_chunks", "cdc_chunks_b", "deflate_sizes", "feed_entries")

  /** The grounding-mode query bbox (original space) used by both the
    * x_extract_grounding query and the grounding_cells oracle dump. */
  val GroundingQueryBox: (Long, Long, Long, Long) = (0L, 0L, 1280L, 200L)

  def root(sfDir: String): String =
    s"/tmp/graft_tables_${Version}_${InputTable.docsForSfDir(sfDir)}_$Seed"

  def path(sfDir: String, name: String): String = s"${root(sfDir)}/$name"

  /** The parquet glob a DuckDB oracle uses for table `name`. The root is
    * overridable via system property (set by Verify.main to the sfDir it
    * was invoked with); the default is the driver's correctness tier
    * (sf0.01, TESTDATA.md). */
  def oracleGlob(name: String): String = {
    val r = sys.props.getOrElse("graft.verify.tables.root", root("sf0.01"))
    s"$r/$name/*.parquet"
  }

  private def done(p: String): Boolean = Files.exists(Paths.get(p, "_SUCCESS"))

  /** Deterministic garbled "model output" cases (the C9 repair-job input;
    * same construction as round 1's x_repair_batch). */
  def repairInput(s: SparkSession, sfDir: String): Dataset[(Long, String)] = {
    import s.implicits._
    val n = math.max(100L, InputTable.docsForSfDir(sfDir) / 10)
    s.range(n).map { i =>
      val rng = new InputGen.Rng(13L, i, 3L)
      (i.toLong, InputGen.garbledPayload(rng, InputGen.langOf(13L, i)))
    }
  }

  /** Deterministic noisy model-output cases for P17 parse_json_flex, and
    * their kernel triage — shared by the x_parse_flex live query and the
    * parse_flex_cases oracle dump. */
  def parseFlexCases(s: SparkSession, sfDir: String): DataFrame = {
    import s.implicits._
    val n = math.max(100L, InputTable.docsForSfDir(sfDir) / 10)
    s.range(n).map { (i: java.lang.Long) =>
      val rng = new InputGen.Rng(17L, i, 4L)
      val lang = InputGen.langOf(17L, i)
      val noisy = "Some preamble text " + InputGen.garbledPayload(rng, lang) + "]"
      graft.kernel.MiscText.parseJsonFlex(noisy) match {
        case Some(r) =>
          (i.toLong, true, r.extracted, graft.kernel.PyJson.dumps(r.value).length.toLong)
        case None => (i.toLong, false, false, 0L)
      }
    }.toDF("case_id", "parsed", "extracted", "json_len")
  }

  /** Materialize `name` (and its dependencies) if absent, then read it. */
  def read(s: SparkSession, sfDir: String, name: String): DataFrame = {
    ensure(s, sfDir, name)
    s.read.parquet(path(sfDir, name))
  }

  def ensureAll(s: SparkSession, sfDir: String): Unit =
    names.foreach(ensure(s, sfDir, _))

  /** Force re-materialization (Verify.main calls this so a round never
    * replays stale tables dumped by older code). */
  def refresh(s: SparkSession, sfDir: String): Unit = {
    val r = Paths.get(root(sfDir))
    if (Files.exists(r)) {
      Files.walk(r).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
    ensureAll(s, sfDir)
  }

  def ensure(s: SparkSession, sfDir: String, name: String): Unit = {
    val p = path(sfDir, name)
    if (done(p)) return
    val df: DataFrame = name match {
      case "northrule" =>
        InputTable.generate(s, InputTable.docsForSfDir(sfDir), Seed)
      case "extract_pages" =>
        ExtractPipeline.parsePages(
          ExtractPipeline.asPageDocs(read(s, sfDir, "northrule"))).toDF()
      case "extract_pages_ocr" =>
        // per-page OCR-mode output — DuckDB replays the per-doc assembly
        ExtractPipeline.parsePages(
          ExtractPipeline.asPageDocs(read(s, sfDir, "northrule")),
          graft.core.PromptMode.Ocr).toDF()
      case "extract_pages_layout_only" =>
        ExtractPipeline.parsePages(
          ExtractPipeline.asPageDocs(read(s, sfDir, "northrule")),
          graft.core.PromptMode.LayoutOnly).toDF()
      case "extract_docs" =>
        ExtractPipeline.run(read(s, sfDir, "northrule"))
      case "repair_cases" =>
        RepairJob.repair(repairInput(s, sfDir)).toDF()
      case "parse_flex_cases" =>
        // P17 flexible-JSON triage per deterministic noisy case; the live
        // x_parse_flex query recomputes these — the oracle checks the dump
        // (an independent JVM's run of the same kernel) row-for-row
        parseFlexCases(s, sfDir)
      case "minhash_sigs" =>
        DedupOps.minhashSignatures(docs(s, sfDir), "doc_id", "text",
          numHashes = 64, shingleSize = 3)
      case "simhash_sigs" =>
        DedupOps.simhashSignatures(docs(s, sfDir), "doc_id", "text")
      case "shingles" =>
        docs(s, sfDir).select(col("doc_id").as("id"),
          TextOps.shingles(col("text"), 3).as("sh"))
      case "doc_vectors" =>
        // hashed-BoW "embedding" per document + its 64-bit sign-LSH
        // signature — the dumped basis for the embedding-cosine near-dup
        // oracle (DuckDB replays the 16-bit-chunk band join from `sig`)
        docs(s, sfDir)
          .select(col("doc_id").as("id"),
            TextOps.hashedBowVector(col("text"), 64).as("vec"))
          .withColumn("sig", graft.ops.SimilarityOps.cosineLshSignature(col("vec"), 64))
      case "ivf_centroids" =>
        // the deterministic farthest-point IVF codebook over the embeddings
        // table — dumped so the DuckDB oracle replays assignment + probing
        // + top-k from the byte-identical codebook the Spark query uses
        // (the seeding itself is iterative driver-side math, like the
        // signatures: an input to the replayed relational plan)
        import s.implicits._
        graft.ops.SimilarityOps.collectCentroids(
          s.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id", "embedding", 16)
          .toSeq.map { case (i, v) => (i, v.toSeq) }.toDF("cidx", "cv")
      case "grounding_cells" =>
        // per-cell input-space centers + pre-processed query bbox for the
        // grounding-mode pages; DuckDB replays containment + ordered join
        import s.implicits._
        implicit val enc: org.apache.spark.sql.Encoder[graft.core.GroundingCellRow] =
          org.apache.spark.sql.Encoders.product[graft.core.GroundingCellRow]
        ExtractPipeline.asPageDocs(
          read(s, sfDir, "northrule").filter(col("url").contains("/html/")))
          .flatMap(d => graft.kernel.ExtractKernel.groundingCellRows(d, GroundingQueryBox))
          .toDF()
      case "media_features" =>
        // determinism dump for x_media_features: the same deterministic
        // codec kernel over the same synthetic media, materialized in a
        // separate pass — the oracle checks the live query row-for-row
        // (same evidential class as parse_flex_cases; decode correctness
        // itself is pinned by the round-trip pixel tests in sbt test)
        graft.ops.MultimodalOps.extractFeatures(
          graft.ops.MultimodalOps.syntheticMedia(s, mediaDocs(sfDir)))
          .toDF().drop("feature")
      case "frame_samples" =>
        graft.ops.MultimodalOps.sampleFrames(
          graft.ops.MultimodalOps.syntheticMedia(s, mediaDocs(sfDir)), everyMs = 1000L)
          .toDF().drop("frame_payload")
      case "links" =>
        // per-document outlinks (src, dst) from the HTML payloads — the
        // kernel-computed edge list whose downstream graph logic (host
        // aggregation, outdegree, PageRank iteration ladder) DuckDB
        // replays independently; resolution correctness is pinned by
        // LinkOpsSpec in sbt test
        graft.ops.LinkOps.extractLinks(read(s, sfDir, "northrule"))
      case "fingerprints" =>
        // per-doc rolling-xxhash64 fingerprint, materialized in a separate
        // pass — the q_fingerprint oracle checks the live query against
        // this dump row-for-row (an independent JVM's run of the same
        // deterministic kernel; the x_parse_flex evidential class).
        // Determinism itself is pinned in OpsSpec.
        docs(s, sfDir).select(col("doc_id"),
          TextOps.fingerprint(col("text")).as("fp"))
      case "anchors" =>
        // (src, dst, anchor) from the HTML payloads — the anchor-text
        // corpus whose per-target aggregation (q_anchor_summary) DuckDB
        // replays independently; extraction + normalization + truncation
        // are pinned by LinkOpsSpec in sbt test
        graft.ops.LinkOps.extractAnchors(read(s, sfDir, "northrule"))
      case "robots_rules" =>
        // per-host (prefix, is_allow) rules: each corpus host's planted
        // /robots.txt body run through the REAL parser
        // (LinkOps.parseRobotsTxt) in a separate pass — the
        // q_robots_filter oracle replays the RFC 9309 longest-match
        // DECISION from this dump in SQL; the parse itself is pinned by
        // RobotsSpec fixtures in sbt test (the x_parse_flex evidential
        // class: parser output dumped, decision logic cross-engine)
        import s.implicits._
        read(s, sfDir, "northrule")
          .select(graft.ops.LinkOps.hostOf(col("url")).as("host"))
          .distinct()
          .as[String]
          .flatMap(h => graft.ops.LinkOps.parseRobotsTxt(plantedRobotsTxt(h))
            .map { case (prefix, isAllow) => (h, prefix, isAllow) })
          .toDF("host", "prefix", "is_allow")
      case "robots_sitemaps" =>
        // per-host Sitemap: declarations harvested from the planted
        // robots bodies by the REAL parser in a separate pass — the
        // q_sitemap_discovery oracle replays the host-join DECISION from
        // this dump (the robots_rules evidential class; the parse itself
        // is pinned by RobotsRedirectSpec fixtures)
        import s.implicits._
        read(s, sfDir, "northrule")
          .select(graft.ops.LinkOps.hostOf(col("url")).as("host"))
          .distinct()
          .as[String]
          .flatMap(h => graft.ops.LinkOps.sitemapsOfRobots(plantedRobotsTxt(h))
            .map(u => (h, u)))
          .toDF("host", "sitemap_url")
      case "feed_entries" =>
        // per-host parsed RSS/Atom entries (planted bodies through the
        // REAL parser, independent pass) — see feedEntries
        feedEntries(s, sfDir)
      case "sitemap_entries" =>
        // per-host parsed sitemap entries (the planted sitemap.xml bodies
        // run through the REAL parser in a separate pass) — the
        // q_sitemap_recrawl oracle replays the new/stale/index DECISION
        // from this dump in SQL, and the live query re-parses the same
        // bodies so the dump doubles as an independent-pass parse replay
        // (the robots_rules / x_parse_flex evidential class)
        sitemapEntries(s, sfDir)
      case "warc_files" =>
        // the corpus re-serialized as synthetic crawl archives: ~64 docs
        // per file in doc_id order, one plain `.warc` byte blob and one
        // member-per-record `.warc.gz` blob per file (graft.sources.Warc
        // writer — deterministic bytes). The q_warc_roundtrip /
        // q_warc_gz_roundtrip oracles then check the PARSER's output
        // against the ORIGINAL northrule parquet directly in DuckDB —
        // url, timestamp, byte length and payload md5 all round-trip
        // through the archive format, a fully independent content check
        import s.implicits._
        read(s, sfDir, "northrule")
          .select(col("url"), unix_millis(col("warc_ts")).as("ms"), col("html"),
            regexp_extract(col("url"), "doc(\\d+)$", 1).cast("long").as("doc_id"))
          .as[(String, Long, Array[Byte], Long)]
          .groupByKey(_._4 / 64)
          .mapGroups { (fid, it) =>
            val rows = it.toVector.sortBy(_._4).map(r => (r._1, r._2, r._3))
            (fid, graft.sources.Warc.buildFile(rows, gzip = false),
              graft.sources.Warc.buildFile(rows, gzip = true))
          }.toDF("file_id", "data", "data_gz")
      case "alternates" =>
        // (url, hreflang, alt_url) hreflang edges of the corpus PLUS the
        // planted multilingual docs, harvested by the REAL parser in a
        // separate pass — the q_hreflang_clusters oracle replays the
        // symmetric-transitive closure + min-representative + langs
        // aggregation from this dump with a recursive CTE over url
        // STRINGS (so the live query's xxhash64 node-id plumbing is
        // cross-checked against a hash-free replay)
        graft.ops.LinkOps.extractAlternates(
          read(s, sfDir, "northrule").unionByName(plantedHreflangDocs(s)))
      case "page_meta" =>
        // (url, title, description, canonical) from the HTML payloads,
        // over the corpus PLUS the planted canonical-declaring docs (the
        // synthetic corpus carries titles but no rel=canonical) — the
        // q_page_meta oracle checks the live query against this dump
        // row-for-row (independent-pass replay, the x_parse_flex class;
        // first-wins walk + resolution pinned by LinkOpsSpec), and
        // q_canonical_dedup replays the consolidation grouping from it
        graft.ops.LinkOps.extractPageMeta(
          read(s, sfDir, "northrule").unionByName(plantedCanonicalDocs(s)))
      case "image_dhash" =>
        // (media_id, dhash, error) over the planted near-dup image corpus,
        // computed by the REAL perceptual-hash kernel in a separate pass —
        // the q_image_neardup live query recomputes the hashes from the
        // same seeded payloads and the DuckDB oracle replays band LSH +
        // popcount verify from THIS dump (the x_parse_flex evidential
        // class: independent-pass hash agreement + cross-engine pairing)
        graft.ops.MultimodalOps.imageDHash(
          graft.ops.MultimodalOps.plantedNearDupMedia(s, mediaDocs(sfDir) / 4, Seed))
      case "audio_dhash" =>
        // the audio twin of image_dhash: same evidential class, envelope
        // hashes computed by the real kernel in a separate pass
        graft.ops.MultimodalOps.audioDHash(
          graft.ops.MultimodalOps.plantedNearDupAudio(s, mediaDocs(sfDir) / 4, Seed))
      case "video_frame_dhash" =>
        // per-frame hashes over the planted video corpus, separate pass
        graft.ops.MultimodalOps.videoFrameDHash(
          graft.ops.MultimodalOps.plantedNearDupVideos(s, mediaDocs(sfDir) / 4, Seed))
      case "cdc_chunks" =>
        // per-document content-defined chunk boundaries + hashes from the
        // REAL chunker in a separate pass — the q_cdc_chunks oracle
        // CONTENT-VERIFIES every row by recomputing the hash from the
        // original payload's hex rendering at the dumped offsets
        graft.ops.DedupOps.chunkTable(read(s, sfDir, "northrule"), "url", "html")
      case "deflate_sizes" =>
        // raw-DEFLATE byte counts of the planted compressibility corpus,
        // computed by the native expression in a separate pass (an
        // independent JVM's run of the same deterministic codec; the
        // fingerprints evidential class) — the q_compression_gate oracle
        // trusts ONLY this scalar and re-derives byte counts, the ppm
        // ratio and the gate decision itself
        compressionCorpus(s, sfDir).select(col("id"),
          graft.functions.DeflateSize(col("text"), 6).as("n_deflate"))
      case "cdc_chunks_b" =>
        // chunk table of the planted recrawl snapshot (every 7th doc with
        // a marker inserted mid-payload) — feeds the q_cdc_delta replay,
        // where DuckDB reconstructs the edited payload by hex surgery and
        // content-verifies the delta chunks against it
        graft.ops.DedupOps.chunkTable(cdcRecrawlB(s, sfDir), "url", "html")
      case "robots_delays" =>
        // per-host politeness budgets (crawl_delay_sec, max_fetches) from
        // the planted robots bodies, computed by the REAL parser + budget
        // math in a separate pass — the q_polite_frontier oracle replays
        // the per-host cap DECISION from this dump (the robots_rules
        // evidential class; the parse + scoping is pinned in LinkOpsSpec)
        graft.ops.LinkOps.hostFetchBudgets(
          {
            import s.implicits._
            read(s, sfDir, "northrule")
              .select(graft.ops.LinkOps.hostOf(col("url")).as("host"))
              .distinct()
              .as[String]
              .map(h => (h, plantedRobotsTxt(h)))
              .toDF("host", "body")
          },
          windowSec = 600L, defaultDelaySec = 5L)
      case "html_blocks" =>
        // per-document leaf-block features from the HTML payloads,
        // extracted by the REAL kernel in a separate pass — the
        // q_block_features oracle checks the live extraction against this
        // dump row-for-row, and q_main_content replays the jusText-style
        // classification + ordered assembly from it in SQL (block walk
        // semantics pinned by LinkOpsSpec)
        graft.ops.LinkOps.extractBlocks(read(s, sfDir, "northrule"))
      case other => throw new IllegalArgumentException(s"unknown table $other")
    }
    df.write.mode("overwrite").parquet(p)
  }

  /** Deterministic planted robots.txt body for a corpus host (a pure
    * function of the host string — the synthetic corpus carries no
    * /robots.txt payloads of its own). The five variants exercise every
    * branch of the parser + decision: plain disallow, longer allow
    * override, EQUAL-length allow-vs-disallow tie (allow wins), root
    * block with a carve-out, an inapplicable bot-specific group, an
    * empty disallow no-op, comments, a skipped wildcard rule, and a
    * rule-free file. */
  /** The Crawl-delay placements exercise: a delay among rules (case 0),
    * no delay → default (cases 1, 3), agent scoping — the `*` group's 2 s
    * wins over specialbot's 60 s (case 2), and a non-integer value
    * ignored fail-open → default (case 4). Placed AFTER a rule line in
    * each group so the group structure the rules parser sees is
    * unchanged. */
  /** The planted recrawl snapshot for CDC delta: every 7th doc with a
    * fixed marker inserted at the byte midpoint (offsets after the edit
    * all shift — exactly what content-defined chunking must survive).
    * Shared verbatim by the cdc_chunks_b dump and the q_cdc_delta live
    * query; the oracle reconstructs the same payload by hex surgery. */
  def cdcRecrawlB(s: SparkSession, sfDir: String): DataFrame = {
    import s.implicits._
    val marker = "<!-- rev2 -->".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    read(s, sfDir, "northrule")
      .filter(regexp_extract(col("url"), "doc(\\d+)$", 1).cast("long") % 7 === 0)
      .select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .map { case (u, h) =>
        val p = h.length / 2
        (u, h.take(p) ++ marker ++ h.drop(p))
      }.toDF("url", "html")
  }

  def plantedRobotsTxt(host: String): String =
    math.floorMod(host.map(_.toInt).sum, 5) match {
      case 0 =>
        "User-agent: *\nDisallow: /pdf/\nCrawl-delay: 10\nAllow: /pdf/doc1\n" +
          "Allow: /image/\nDisallow: /image/\n"
      case 1 => "User-agent: *\nDisallow: /\nAllow: /html/\n"
      case 2 =>
        "User-agent: specialbot\nDisallow: /\nCrawl-delay: 60\n\n" +
          "User-agent: *\nDisallow: /garbled/\nCrawl-delay: 2\nDisallow:\n# comment line\n"
      case 3 => "# no rules at all\nSitemap: https://" + host + "/sitemap.xml\n"
      case _ =>
        "User-agent: *\nDisallow: /*.gif$\nCrawl-delay: 0.5\nDisallow: /truncated/\n" +
          "Allow: /truncated/doc\n"
    }

  /** Planted canonical-declaring documents (north-rule schema): the
    * synthetic corpus has `<title>`s but no `<link rel=canonical>` or
    * meta descriptions, so seven hand-checkable docs exercise every
    * branch of the page-meta walk and the consolidation grouping —
    * root-relative / absolute / path-relative+fragment hrefs, a
    * case-insensitive multi-token rel list, a group whose canonical
    * target is NOT a member (kept = min url), a canonical-free page, an
    * unresolvable (mailto:) canonical, entity/whitespace normalization
    * in title and description, and a first-wins duplicate declaration.
    * Shared verbatim by the page_meta dump and the live queries. */
  def plantedCanonicalDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions.{col, encode, lit}
    Seq(
      // the canonical page itself: self-referential root-relative href;
      // entities + whitespace in title and description
      ("https://planted.example/canon/a",
        "<html><head><title> Canon   A&amp;B </title>" +
          "<meta name=\"Description\" content=\" Alpha &amp; beta   page \">" +
          "<link rel=\"canonical\" href=\"/canon/a\"></head>" +
          "<body><p>Canon body.</p></body></html>"),
      // duplicate variant: absolute href, uppercase multi-token rel;
      // a SECOND canonical declaration must lose (first wins)
      ("https://planted.example/canon/a?utm_source=x",
        "<html><head><title>Canon A dup</title>" +
          "<link rel=\"CANONICAL alternate\" href=\"https://planted.example/canon/a\">" +
          "<link rel=\"canonical\" href=\"https://planted.example/wrong\"></head>" +
          "<body><p>Dup body.</p></body></html>"),
      // AMP-style variant: path-relative href with dot segments + fragment
      ("https://planted.example/amp/canon-a",
        "<html><head><title>Canon A amp</title>" +
          "<link rel=\"canonical\" href=\"../canon/a#top\"></head>" +
          "<body><p>Amp body.</p></body></html>"),
      // group whose canonical target is not itself in the corpus:
      // kept_url = lexicographically smallest member
      ("https://planted.example/mirror/d",
        "<html><head><title>Mirror D</title>" +
          "<link rel=\"canonical\" href=\"https://elsewhere.example/d0\"></head>" +
          "<body><p>Mirror body.</p></body></html>"),
      ("https://planted.example/mirror/e",
        "<html><head><title>Mirror E</title>" +
          "<link rel=\"canonical\" href=\"https://elsewhere.example/d0\"></head>" +
          "<body><p>Mirror body.</p></body></html>"),
      // no canonical at all (a stylesheet link must not match)
      ("https://planted.example/plain/f",
        "<html><head><title>Plain F</title>" +
          "<link rel=\"stylesheet\" href=\"/css/main.css\"></head>" +
          "<body><p>Plain body.</p></body></html>"),
      // unresolvable canonical scheme → treated as undeclared
      ("https://planted.example/plain/g",
        "<html><head><title>Plain G</title>" +
          "<link rel=\"canonical\" href=\"mailto:x@y.example\"></head>" +
          "<body><p>Plain body.</p></body></html>"))
      .toDF("url", "h")
      .select(col("url"), lit(null).cast("timestamp").as("warc_ts"),
        encode(col("h"), "UTF-8").as("html"), lit("").as("text"),
        lit("en").as("lang"))
  }

  /** Planted multilingual documents (north-rule schema) for the hreflang
    * family — the synthetic corpus declares no alternates, so five
    * hand-checkable clusters exercise every closure branch: a full
    * mutual 3-language cluster with self-references and an x-default; an
    * ASYMMETRIC pair (only one side declares — the closure must still
    * cluster both); a 3-hop CHAIN (transitivity); a self-reference-only
    * singleton; and a page with an unresolvable (mailto:) alternate, an
    * external never-fetched target, and a base-href-rebased relative
    * alternate. */
  def plantedHreflangDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions.{col, encode, lit}
    def alt(lang: String, href: String) =
      s"""<link rel="alternate" hreflang="$lang" href="$href">"""
    def page(title: String, links: String) =
      s"<html><head><title>$title</title>$links</head><body><p>$title body.</p></body></html>"
    Seq(
      // full mutual cluster: en/nl/zh each list all three + x-default
      ("https://ml.example/alt/doc10",
        page("ML ten en", alt("en", "/alt/doc10") + alt("nl", "/alt/doc11") +
          alt("zh", "/alt/doc12") + alt("x-default", "/alt/doc10"))),
      ("https://ml.example/alt/doc11",
        page("ML ten nl", alt("EN", "https://ml.example/alt/doc10") +
          alt("nl", "/alt/doc11") + alt("zh", "/alt/doc12"))),
      ("https://ml.example/alt/doc12",
        page("ML ten zh", alt("en", "/alt/doc10") + alt("nl", "/alt/doc11") +
          alt("zh", "/alt/doc12"))),
      // asymmetric: only doc20 declares; doc21 carries no links at all
      ("https://ml.example/alt/doc20",
        page("ML twenty", alt("en", "/alt/doc20") + alt("ru", "/alt/doc21"))),
      ("https://ml.example/alt/doc21", page("ML twenty-one", "")),
      // chain: 30 -> 31 -> 32, no back edges
      ("https://ml.example/alt/doc30",
        page("ML thirty", alt("kn", "/alt/doc31"))),
      ("https://ml.example/alt/doc31",
        page("ML thirty-one", alt("bo", "/alt/doc32"))),
      ("https://ml.example/alt/doc32", page("ML thirty-two", "")),
      // self-reference-only singleton
      ("https://ml.example/alt/doc40",
        page("ML forty", alt("en", "/alt/doc40"))),
      // unresolvable + external + base-rebased relative alternate
      ("https://ml.example/alt/doc50",
        "<html><head><title>ML fifty</title>" +
          "<base href=\"https://ml.example/alt/\">" +
          alt("de", "mailto:x@y.example") +
          alt("fr", "https://other.example/alt/doc99") +
          alt("nl", "doc51") + "</head><body><p>ML fifty body.</p></body></html>"),
      ("https://ml.example/alt/doc51", page("ML fifty-one", "")))
      .toDF("url", "h")
      .select(col("url"), lit(null).cast("timestamp").as("warc_ts"),
        encode(col("h"), "UTF-8").as("html"), lit("").as("text"),
        lit("en").as("lang"))
  }

  /** Deterministic planted sitemap.xml body for a corpus host (a pure
    * function of the host string, like [[plantedRobotsTxt]]). Three of
    * four variants publish a `<urlset>` whose doc0..doc7 locs overlap
    * the host's REAL corpus urls wherever that docId actually lives on
    * the host (→ matched entries exercise the stale-vs-fresh lastmod
    * compare; unmatched ones exercise `new`), with lastmod cycling
    * through a future full-ISO-offset timestamp, a stale date-only
    * value, and absent; the fourth variant is a `<sitemapindex>` (→
    * `index` rows, the follow-up fetch list). An XML prolog and an
    * entity-escaped query url exercise the parser's lenient path. */
  def plantedSitemapXml(host: String): String = {
    math.floorMod(host.map(_.toInt).sum, 4) match {
      case 3 =>
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
          "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
          s"<sitemap><loc>https://$host/sitemap-a.xml</loc><lastmod>2024-03-01</lastmod></sitemap>\n" +
          s"<sitemap><loc>https://$host/sitemap-b.xml</loc></sitemap>\n" +
          "</sitemapindex>\n"
      case _ =>
        val sb = new StringBuilder
        sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
        sb ++= "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
        for (d <- 0 until 8) {
          sb ++= s"<url><loc>https://$host/html/doc$d</loc>"
          math.floorMod(d, 3) match {
            case 0 => sb ++= "<lastmod>2025-06-15T12:30:00+02:00</lastmod>"
            case 1 => sb ++= "<lastmod>2023-01-01</lastmod>"
            case _ => () // absent → epoch-0 sentinel, never stale
          }
          sb ++= "</url>\n"
        }
        sb ++= s"<url><loc>https://$host/fresh/page?a=1&amp;b=2</loc>" +
          "<lastmod>2024-05-05</lastmod></url>\n"
        sb ++= "</urlset>\n"
        sb.toString
    }
  }

  /** Deterministic feed body per host — RSS 2.0 for even host checksums,
    * Atom for odd (both parser branches exercised every run). Items:
    * a known corpus url (doc0 — classifies `known` downstream), a fresh
    * url, an entity-escaped title (&amp; must decode), a dateless item
    * (epoch-0 sentinel), and a non-http ftp:// item that must drop.
    * Shared verbatim by the feed_entries dump and the live
    * q_feed_discovery query. */
  def plantedFeedXml(host: String): String = {
    if (math.floorMod(host.map(_.toInt).sum, 2) == 0)
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<rss version=\"2.0\"><channel>\n" +
        s"<title>$host news</title>\n" +
        s"<item><title>Known doc</title><link>https://$host/html/doc0</link>" +
        "<pubDate>Mon, 15 Jul 2024 08:30:00 GMT</pubDate></item>\n" +
        s"<item><title>Fresh A &amp; B</title><link>https://$host/feed/fresh1</link>" +
        "<pubDate>Tue, 16 Jul 2024 09:00:00 GMT</pubDate></item>\n" +
        s"<item><title>No date</title><link>https://$host/feed/nodate</link></item>\n" +
        s"<item><title>Bad scheme</title><link>ftp://$host/skip</link>" +
        "<pubDate>Tue, 16 Jul 2024 09:00:00 GMT</pubDate></item>\n" +
        "</channel></rss>\n"
    else
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<feed xmlns=\"http://www.w3.org/2005/Atom\">\n" +
        s"<title>$host feed</title>\n" +
        s"<entry><title>Known doc</title><link href=\"https://$host/html/doc1\"/>" +
        "<updated>2024-07-15T08:30:00Z</updated></entry>\n" +
        s"<entry><title>Fresh X &amp; Y</title><link href=\"https://$host/feed/fresh2\"/>" +
        "<updated>2024-07-16T10:00:00+02:00</updated></entry>\n" +
        s"<entry><title>No date</title><link href=\"https://$host/feed/nodate\"/></entry>\n" +
        "</feed>\n"
  }

  /** (host, item_url, title, published) from the planted feed bodies via
    * the real parser in a separate pass — the q_feed_discovery oracle
    * replays the known/new DECISION from this dump (the sitemap_entries
    * evidential class). */
  def feedEntries(s: SparkSession, sfDir: String): DataFrame = {
    import s.implicits._
    read(s, sfDir, "northrule")
      .select(graft.ops.LinkOps.hostOf(org.apache.spark.sql.functions.col("url")).as("host"))
      .distinct()
      .as[String]
      .flatMap(h => graft.ops.LinkOps.parseFeed(plantedFeedXml(h))
        .map { case (loc, title, ts) => (h, loc, title, ts) })
      .toDF("host", "item_url", "title", "published")
  }

  /** (host, loc, lastmod, is_index) from the planted sitemap bodies via
    * the real parser — shared verbatim by the sitemap_entries dump and
    * the live q_sitemap_recrawl query. */
  def sitemapEntries(s: SparkSession, sfDir: String): DataFrame = {
    import s.implicits._
    read(s, sfDir, "northrule")
      .select(graft.ops.LinkOps.hostOf(org.apache.spark.sql.functions.col("url")).as("host"))
      .distinct()
      .as[String]
      .flatMap(h => graft.ops.LinkOps.parseSitemap(plantedSitemapXml(h))
        .map { case (loc, ts, ix) => (h, loc, ts, ix) })
      .toDF("host", "loc", "lastmod", "is_index")
  }

  private def docs(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"$sfDir/documents.parquet")

  /** Planted compressibility corpus, shared verbatim by the
    * deflate_sizes dump and the q_compression_gate live query (the
    * cdcRecrawlB convention): documents plus (a) a too-repetitive spam
    * variant (every 9th doc), (b) an incompressible base64-of-md5 blob
    * variant (every 11th — base64's 64-symbol alphabet at ~6 bits/char
    * leaves raw DEFLATE no headroom, so ratio lands ABOVE 10⁶ with the
    * stream framing), and (c) a multibyte-suffix variant (every 13th —
    * binds the UTF-8 BYTE count vs char count in both engines). Every
    * construction replays in DuckDB SQL over the documents parquet. */
  def compressionCorpus(s: SparkSession, sfDir: String): DataFrame = {
    val d = docs(s, sfDir).select(col("doc_id").as("id"), col("text"))
    def b64(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      base64(unhex(md5(c)))
    val spam = d.filter(col("id") % 9 === 0)
      .select((col("id") + 300000).as("id"),
        repeat(lit("spam ham "), 200).as("text"))
    val blob = d.filter(col("id") % 11 === 0)
      .select((col("id") + 400000).as("id"),
        concat(b64(col("text")), b64(concat(col("text"), lit("x"))),
          b64(concat(col("text"), lit("y"))),
          b64(concat(col("text"), lit("z")))).as("text"))
    val multi = d.filter(col("id") % 13 === 0)
      .select((col("id") + 500000).as("id"),
        concat(col("text"), lit(" caf\u00e9 \u4e16\u754c")).as("text"))
    d.unionByName(spam).unionByName(blob).unionByName(multi)
  }

  /** Media-corpus size for a tier — MUST match the x_media_features /
    * x_frame_sample queries so the dump and the live result align. */
  def mediaDocs(sfDir: String): Long =
    math.max(100L, InputTable.docsForSfDir(sfDir) / 10)
}
