package graft

import graft.core.PromptMode
import graft.gen.InputTable
import graft.ops.{DedupOps, LinkOps, MultimodalOps, RankOps, RepairJob, SimilarityOps, SketchOps, TextOps}
import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operator registry: one entry per implemented SURVEY.md §2 operator plus
  * the training-data ops layer. SQL-expressible operators carry a DuckDB
  * oracle over the driver's parquet tables (column names aligned on both
  * sides; aggregates kept integral so cross-engine hashes match exactly).
  * Extraction ops run on the deterministic synthetic table and are
  * rows-only checked here — their byte-identity gate is the golden suites
  * under `sbt -batch test`.
  */
object Queries {

  private def t(s: SparkSession, sfDir: String, name: String): DataFrame =
    s.read.parquet(s"$sfDir/$name.parquet")

  /** The planted 25-token paragraph for q_repeated_spans — one constant,
    * interpolated into BOTH engines' augmented-text construction. */
  private val SpanPara: String =
    "span dedup boilerplate alpha bravo charlie delta echo foxtrot golf " +
    "hotel india juliett kilo lima mike november oscar papa quebec romeo " +
    "sierra tango uniform victor"

  /** Materialized side tables (north-rule input, extraction output,
    * signatures) — byte-identical for Spark and the DuckDB oracle. */
  private def vt(s: SparkSession, sfDir: String, name: String): DataFrame =
    VerifyTables.read(s, sfDir, name)

  private val cellArraySchema = org.apache.spark.sql.types.DataType.fromDDL(
    "array<struct<bbox:array<bigint>, category:string, text:string>>")

  /** Exploded reading-order spans from the per-page extraction dump
    * (clean layout rows only; bbox rendered as a JSON string — the raw
    * array is unhashable for the driver's pandas compare). */
  private def spanRows(s: SparkSession, sfDir: String): DataFrame =
    vt(s, sfDir, "extract_pages")
      .filter(!col("filtered") && col("error") === "")
      .select(col("url"), col("page_no"),
        from_json(col("cells_json"), cellArraySchema).as("cells"))
      .select(col("url"), col("page_no"),
        posexplode(col("cells")).as(Seq("reading_order", "cell")))

  // integral money: cents as BIGINT — engine-exact (doubles would drift
  // under Spark's partial aggregation vs DuckDB's sequential sum)
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Planted meta-robots documents for q_web_pipeline: the synthetic
    * corpus carries no robots metas, so three hand-checkable docs (single
    * `<p>` body → md IS the paragraph text; mixed-case name/content,
    * `none` directive) exercise the fused robots walk end-to-end. The
    * oracle replays them as SQL literals. */
  private def plantedRobotsDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("https://planted.example/robots/a",
        "<html><head><meta name=\"ROBOTS\" content=\"NOINDEX, nofollow\"></head>" +
          "<body><p>Planted alpha paragraph.</p></body></html>"),
      ("https://planted.example/robots/b",
        "<html><head><meta name=\"robots\" content=\"nofollow\"></head>" +
          "<body><p>Planted beta paragraph.</p></body></html>"),
      ("https://planted.example/robots/c",
        "<html><head><meta name=\"robots\" content=\"none\"></head>" +
          "<body><p>Planted gamma paragraph.</p></body></html>"))
      .toDF("url", "h")
      .select(col("url"), lit(null).cast("timestamp").as("warc_ts"),
        encode(col("h"), "UTF-8").as("html"), lit("").as("text"), lit("en").as("lang"))
  }

  /** Deterministic redirect edges derived from the corpus urls — the
    * scaffolding for q_redirect_resolve (the synthetic table carries no
    * redirects of its own). A 16% docId sample shrinks MAP-SIDE before
    * the per-host window (the window never sees the full corpus); within
    * each host the first up-to-8 sampled urls chain head→…→tail, and
    * hosts whose 5th authority character (the first digit of the
    * synthetic `hostN.example` names — host LENGTHS barely vary) has an
    * ascii code divisible by 3 close the chain into a CYCLE, so both
    * statuses appear at every tier. Pure Column algebra, replayed
    * verbatim by the oracle. */
  private def syntheticRedirectEdges(df: DataFrame): DataFrame = {
    val ranked = df
      .select(col("url"), LinkOps.hostOf(col("url")).as("host"),
        regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long").as("did"))
      .filter(pmod(col("did"), lit(100L)) < 16L)
      .withColumn("rn", row_number().over(Window.partitionBy("host").orderBy("url")))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("host")))
      .filter(col("rn") <= 8)
      .select(col("host"), col("url"), col("rn"),
        least(col("cnt"), lit(8L)).as("tail_rn"))
    val a = ranked.select(col("host"), col("url").as("src"), col("rn"), col("tail_rn"))
    val b = ranked.select(col("host").as("host_b"), col("url").as("dst"),
      col("rn").as("rn_b"))
    val chain = a.filter(col("rn") < col("tail_rn"))
      .join(b, a("host") === b("host_b") && b("rn_b") === a("rn") + 1)
      .select(col("src"), col("dst"))
    val back = a.filter(col("rn") === col("tail_rn") && col("tail_rn") >= 2 &&
        ascii(substring(col("host"), 5, 1)) % 3 === 0)
      .join(b, a("host") === b("host_b") && b("rn_b") === 1)
      .select(col("src"), col("dst"))
    chain.unionByName(back)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- extraction pipeline surface. x_extract_full now carries a REAL
    //      oracle: DuckDB independently re-assembles the per-document rows
    //      (ordered string_agg over page_no) from the dumped per-page
    //      extraction table — a cross-engine check of the A1+A2+S9
    //      assembly over real kernel output. Page-level mode dumps stay
    //      rows-only (their byte-identity gate is the golden suites).
    "x_extract_full" -> ((s, dir) =>
      ExtractPipeline.run(vt(s, dir, "northrule")).orderBy("url")),
    // transparent Content-Encoding: the SAME corpus with every payload
    // gzip-wrapped must extract byte-identically to the plain table (the
    // kernel sniffs RFC 1952 magic and strictly inflates before S1
    // dispatch) — the oracle is x_extract_full's page-dump re-assembly
    // verbatim, computed from the PLAIN corpus, so every output byte is
    // cross-checked against the uncompressed twin
    "q_gzip_extract" -> ((s, dir) => {
      import s.implicits._
      val gz = vt(s, dir, "northrule")
        .select(col("url"), col("warc_ts"), col("html"), col("text"), col("lang"))
        .as[(String, java.sql.Timestamp, Array[Byte], String, String)]
        .map { case (u, t, h, x, l) =>
          (u, t, if (h == null) h else graft.sources.Warc.gzipMember(h), x, l) }
        .toDF("url", "warc_ts", "html", "text", "lang")
      ExtractPipeline.run(gz).orderBy("url")
    }),
    // OCR / layout-only modes now run the FULL pipeline (parse + per-doc
    // assembly) and carry real oracles: DuckDB re-assembles the documents
    // from the per-mode page dumps exactly like x_extract_full
    "x_extract_layout_only" -> ((s, dir) =>
      ExtractPipeline.run(vt(s, dir, "northrule"), PromptMode.LayoutOnly)
        .select("url", "n_pages", "cells_json", "filtered").orderBy("url")),
    "x_extract_ocr" -> ((s, dir) =>
      ExtractPipeline.run(vt(s, dir, "northrule"), PromptMode.Ocr)
        .select("url", "n_pages", "md").orderBy("url")),
    // image branch (S1 dispatch of PNG/JPEG payloads, parser.py:252-256):
    // DuckDB independently recomputes the smart_resize INPUT dims from the
    // dumped original dims (round_even = Python banker's rounding) and
    // reconstructs the full-bleed Picture cells_json string byte-for-byte
    "x_extract_image" -> ((s, dir) =>
      ExtractPipeline.parsePages(
        ExtractPipeline.asPageDocs(vt(s, dir, "northrule").filter(col("url").contains("/image/"))))
        .toDF()
        .select(col("url"), col("origin_width"), col("origin_height"),
          col("input_width"), col("input_height"), col("cells_json"),
          length(col("md")).cast("long").as("md_len"),
          col("error"))
        .orderBy("url")),
    // grounding mode now carries a REAL oracle: the kernel dumps per-cell
    // input-space centers + the pre-processed query bbox (grounding_cells)
    // and DuckDB independently replays the center-containment filter +
    // reading-order text join that defines the response (parser.py:130-137)
    "x_extract_grounding" -> ((s, dir) =>
      ExtractPipeline.parsePages(
        ExtractPipeline.asPageDocs(vt(s, dir, "northrule").filter(col("url").contains("/html/"))),
        PromptMode.GroundingOcr(VerifyTables.GroundingQueryBox))
        .toDF().select(col("url"), col("page_no"), col("md").as("response"))
        .orderBy("url", "page_no")),

    // ---- A1+A2+W2/S9: per-group ordered assembly (reference md combine)
    "q_page_assembly" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          array_join(
            transform(array_sort(collect_list(struct(col("l_linenumber"), col("l_returnflag")))),
              x => x.getField("l_returnflag")), "|").as("flags"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_orderkey")),

    // ---- P19: header/footer category strip + histogram (A4)
    "q_hf_filter" -> ((s, dir) =>
      t(s, dir, "events")
        .filter(!col("event_type").isin("error", "signup"))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")),

    // ---- pushdown filter + partial agg (§2.5/§4): predicate reaches scan
    "q_agg_pushdown" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1997-01-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    // ---- W3 analog: lag-based continuation predicate per ordered group
    "q_window_merge" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("is_cont",
          when(col("prev_type") === col("event_type"), 1).otherwise(0))
        .select("event_id", "user_id", "prev_type", "is_cont")
        .orderBy("event_id")
    }),

    // ---- sessionization (gap > 600 s) — stateful-op analog, exact micros
    "q_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .withColumn("new_session", when(col("gap_us").isNull || col("gap_us") > 600000000L, 1).otherwise(0))
        .groupBy("user_id")
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // ---- broadcast dim join chain (scale layer §4): customer⋈nation⋈region
    "q_broadcast_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents"))
        .orderBy("r_name")),

    // ---- §2.9 resume: left-anti join against committed keys
    "q_resume_antijoin" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val committed = orders.filter(pmod(col("o_orderkey"), lit(10)) < 3)
        .select(col("o_orderkey").as("k"))
      orders.join(committed, col("o_orderkey") === col("k"), "left_anti")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_cents"))
        .orderBy("o_orderstatus")
    }),

    // ---- sort/limit/top-k (§2.7)
    "q_topk_docs" -> ((s, dir) =>
      t(s, dir, "documents")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
        .limit(10)
        .select("doc_id", "n_chars")),

    // ---- training ops: exact dedup — runs the REAL operator (keep the
    //      smallest id per content hash) against DuckDB's min-per-group
    "q_dedup_exact" -> ((s, dir) =>
      DedupOps.exactDedup(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")),

    // ---- training ops: near-exact dedup on the NFC+casefold+whitespace
    //      normalized key. The corpus is ASCII, so the Unicode branch is
    //      PLANTED in the query itself: every doc_id % 6 == 0 spawns two
    //      variants whose raw bytes differ three ways (composed U+00E9 vs
    //      e+U+0301, case, tab-vs-double-space) but whose normalized keys
    //      are equal — both engines build the identical augmented corpus,
    //      so NFC, lower and the collapse must all bind for the groups to
    //      match. Spark groups by xxhash64(key), the oracle by the key
    //      TEXT (the q_dedup_exact hash-for-text convention).
    "q_normalized_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id").as("id"), col("text"))
      val base6 = docs.filter(col("id") % 6 === 0)
      val vA = base6.select((col("id") + 100000).as("id"),
        concat(col("text"), lit("  Caf\u00e9 DUP")).as("text"))
      val vB = base6.select((col("id") + 200000).as("id"),
        concat(upper(col("text")), lit("\tcafe\u0301 dup")).as("text"))
      val aug = docs.unionByName(vA).unionByName(vB)
      DedupOps.normalizedDupGroups(aug, "id", "text").orderBy("keep_id")
    }),

    // ---- dedup: host-level MIRROR detection (Bharat & Broder's host
    //      pairs sharing identical content) over planted mirror hosts:
    //      every 4th doc copied verbatim under host "m-"+host (a partial
    //      mirror of every host), every 20th ALSO copied under
    //      "m2-"+host (m2 ⊂ m ⊂ original — a containment triangle with
    //      three distinct denominators), and every 8th copied EDITED
    //      under "x-"+host (binding text sensitivity: edited copies
    //      share no digest, so x- hosts appear in no pair). Both engines
    //      build the identical augmented corpus; digests are md5(text)
    //      (the cross-engine digest idiom), ratios integral ppm.
    "q_host_mirrors" -> ((s, dir) => {
      val base = vt(s, dir, "northrule").select(col("url"), col("text"))
      val n = regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long")
      def mirror(mod: Int, prefix: String) = base.filter(n % mod === 0)
        .select(regexp_replace(col("url"), "^(https?://)", s"$$1$prefix-").as("url"),
          col("text"))
      val edited = base.filter(n % 8 === 0)
        .select(regexp_replace(col("url"), "^(https?://)", "$1x-").as("url"),
          concat(col("text"), lit(" edited")).as("text"))
      val aug = base.unionByName(mirror(4, "m")).unionByName(mirror(20, "m2"))
        .unionByName(edited)
      DedupOps.hostMirrors(aug, "url", "text", minShared = 2L)
        .orderBy("host_a", "host_b")
    }),

    // ---- training ops: token counting
    "q_token_count" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")),

    // ---- training ops: quality features (integral)
    "q_quality" -> ((s, dir) =>
      TextOps.qualityFeatures(t(s, dir, "documents"), "text")
        .select("doc_id", "n_chars_calc", "n_tokens", "n_sentences", "n_digits", "n_upper")
        .orderBy("doc_id")),

    // ---- training ops: language-ID heuristic (CASE-expressible)
    "q_lang_id" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    // ---- scale layer: two-phase salted aggregation ≡ plain groupBy
    "q_salted_agg" -> ((s, dir) => {
      val salted = t(s, dir, "events")
        .groupBy(col("user_id"), pmod(xxhash64(col("event_id")), lit(8)).as("salt"))
        .agg(count(lit(1)).as("partial"))
      salted.groupBy("user_id").agg(sum(col("partial")).as("n"))
        .orderBy("user_id")
    }),

    // ---- embeddings: semantic OUTLIER report — documents far from
    //      their k-means centroid: junk/noise to drop, or (SemDeDup's
    //      reading) the diversity picks to keep. Composition of two
    //      oracled ops: the integral Lloyd assignment WITH its quantized
    //      squared distance + the histogram-quantile cutoff at p95
    //      (data-calibrated, the calibratedGate convention). All
    //      integral — the oracle replays the ladder, the definitional
    //      quantile and the gate bit-exactly.
    "q_semantic_outliers" -> ((s, dir) => {
      val a = SimilarityOps.kmeansLloyd(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 2, withDistance = true)
      val hi = TextOps.exactQuantiles(a, col("d2"), Seq(95))
        .select(col("value").as("hi"))
      a.crossJoin(broadcast(hi))
        .select(col("id").as("vec_id"), col("cluster"), col("d2"), col("hi"),
          (col("d2") > col("hi")).as("is_outlier"))
        .orderBy("vec_id")
    }),

    // ---- embeddings: relational stats
    "q_embedding_stats" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .groupBy("label")
        .agg(count(lit(1)).as("n"), min(size(col("embedding")).cast("long")).as("dim"))
        .orderBy("label")),

    // ---- similarity search: brute-force cosine top-k (ids ranked)
    "q_ann_topk" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val queries = embs.filter(col("vec_id") < 256)
      SimilarityOps.bruteForceTopK(embs, queries, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- similarity: hard-negative mining (DPR-style retrieval prep) —
    //      positives = each query's TRUE top-1 neighbor (derived by the
    //      brute-force operator itself, so the anti-join binds on EVERY
    //      query: the result must be ranks 2..6 renumbered 1..5, which
    //      the oracle re-derives independently from its own ranking;
    //      an anti-join or re-rank drift breaks every row)
    "q_hard_negatives" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val queries = embs.filter(col("vec_id") < 256)
      val pos = SimilarityOps.bruteForceTopK(embs, queries, "vec_id", "embedding", k = 1)
        .select(col("query_id"), col("neighbor_id").as("pos_id"))
      SimilarityOps.hardNegatives(embs, queries, pos, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "neg_rank")
    }),

    // ---- similarity search: IVF scale path (rows-only; recall gate in test)
    "q_ann_ivf" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      // 256 queries: the inverted-list scan reduction pays off when the
      // query set is large (brute force does q cosines per corpus row;
      // IVF does nlist for assignment + ~q*nprobe/nlist for probing)
      val queries = embs.filter(col("vec_id") < 256)
      SimilarityOps.ivfTopK(embs, queries, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- dedup: MinHash+LSH near-dup pairs. The xxhash64 signatures are
    //      materialized to parquet; Spark runs the band join + threshold
    //      from that table and DuckDB REPLAYS the same band join (chunk
    //      equality ⟺ band-hash equality) + match count independently —
    //      a full cross-engine check of the LSH plan. No-false-negative
    //      vs brute force stays in OpsSpec.
    "q_minhash_pairs" -> ((s, dir) =>
      DedupOps.minhashPairsFromSigs(vt(s, dir, "minhash_sigs"),
        numHashes = 64, bands = 16, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("est_jaccard") * 64).cast("long").as("matches64"))
        .orderBy("id_a", "id_b")),

    // ---- shingle CONTAINMENT pairs (Broder's asymmetric axis): quote /
    //      mirror detection — a doc verbatim-included in a longer one has
    //      containment ≈ 1 while its Jaccard resemblance falls below
    //      every LSH threshold. Planted quote-containers (every 101st
    //      doc + 20 unique filler tokens, constructed identically in
    //      both engines) guarantee exercised pairs; the df guard,
    //      guarded-set sizes, intersection counts and truncating-DIV ppm
    //      ratios are all replayed verbatim by the fully independent
    //      DuckDB oracle (no dump — the strongest oracle class).
    "q_containment_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val filler = concat_ws(" ", (1 to 20).map(i =>
        concat(lit("qq"), col("doc_id").cast("string"), lit("x" + i))): _*)
      val planted = docs.filter(col("doc_id") % 101 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(col("text"), lit(" "), filler).as("text"))
      DedupOps.containmentPairs(docs.unionByName(planted), "doc_id", "text")
        .orderBy("id_a", "id_b")
    }),

    // ---- dedup: the persistable LSH band index built and written as a
    //      real partitioned artifact (the LSH analogue of q_ann_ivf_build)
    //      — per-band entry/key stats read back from the files; the guard
    //      drops hot buckets at BUILD time so every later batch join is
    //      bounded by construction
    "q_band_index_build" -> ((s, dir) => {
      val sigs = vt(s, dir, "minhash_sigs").filter(col("id") % 5 =!= 0)
      val idxDir = s"/tmp/graft_band_index_${java.nio.file.Paths.get(dir).getFileName}"
      DedupOps.minhashBandIndex(sigs)
        .write.mode("overwrite").partitionBy("band").parquet(idxDir)
      s.read.parquet(idxDir).groupBy(col("band").cast("int").as("band"))
        .agg(count(lit(1)).as("n_entries"),
          countDistinct(col("band_hash")).as("n_keys"))
        .orderBy("band")
    }),

    // ---- dedup: incremental near-dup — an arriving batch (doc_id%5==0)
    //      dedupes against the already-accepted corpus index (the rest),
    //      never re-pairing the corpus against itself; every arrival gets
    //      a verdict row (survived = no index match at the threshold)
    "q_incremental_neardup" -> ((s, dir) => {
      val sigs = vt(s, dir, "minhash_sigs")
      val arrivals = sigs.filter(col("id") % 5 === 0)
      val index = sigs.filter(col("id") % 5 =!= 0)
      val pairs = DedupOps.minhashPairsAgainstIndex(arrivals, index,
        numHashes = 64, bands = 16, threshold = 0.5)
      val agg = pairs.groupBy(col("id_new").as("id"))
        .agg(count(lit(1)).as("n_dups"),
          max(round(col("est_jaccard") * 64).cast("long")).as("max_matches64"))
      arrivals.select("id").join(agg, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          coalesce(col("max_matches64"), lit(0L)).as("max_matches64"),
          col("n_dups").isNull.as("survived"))
        .orderBy("id")
    }),

    // ---- dedup: SimHash near-dup pairs (chunk join + popcount replayed
    //      by DuckDB from the dumped signatures)
    "q_simhash_pairs" -> ((s, dir) =>
      DedupOps.simhashPairsFromSigs(vt(s, dir, "simhash_sigs"), maxHamming = 3)
        .orderBy("id_a", "id_b")),

    // ---- dedup: pairs → clusters → keep-one (connected components over
    //      the simhash candidate pairs; DuckDB replays with a recursive
    //      reachability CTE)
    "q_dedup_clusters" -> ((s, dir) => {
      val pairs = DedupOps.simhashPairsFromSigs(vt(s, dir, "simhash_sigs"), maxHamming = 3)
      DedupOps.connectedComponents(
          t(s, dir, "documents").select(col("doc_id")), "doc_id", pairs)
        .withColumnRenamed("id", "doc_id")
        .withColumn("keep", col("doc_id") === col("cluster_id"))
        .orderBy("doc_id")
    }),

    // ---- dedup: the FULL near-dup dedup chain as one job — minhash LSH
    //      candidate pairs → connected components → keep-one → deduped
    //      corpus re-joined with cluster sizes and token counts. Every
    //      stage is the real operator; payloads attach only to survivors.
    "q_neardup_dedup" -> ((s, dir) => {
      val pairs = DedupOps.minhashPairsFromSigs(vt(s, dir, "minhash_sigs"),
        numHashes = 64, bands = 16, threshold = 0.5)
      val docs = t(s, dir, "documents")
      val labels = DedupOps.connectedComponents(
        docs.select(col("doc_id")), "doc_id", pairs)
      val sizes = labels.groupBy("cluster_id")
        .agg(count(lit(1)).as("cluster_size"))
      labels.filter(col("id") === col("cluster_id"))
        .join(sizes, Seq("cluster_id"))
        .join(docs.select(col("doc_id"),
            TextOps.tokenCount(col("text")).as("n_tokens")),
          col("id") === col("doc_id"))
        .select(col("doc_id"), col("cluster_size"), col("n_tokens"))
        .orderBy("doc_id")
    }),

    // ---- dedup: quality-keyed survivor selection — the SAME cluster
    //      labels as q_neardup_dedup but the keep policy made explicit:
    //      highest token count wins, ties to the NEWEST id (so it
    //      diverges from the keep-min-id convention on every uniform
    //      cluster, binding the policy itself, not just the clustering)
    "q_neardup_best" -> ((s, dir) => {
      val pairs = DedupOps.minhashPairsFromSigs(vt(s, dir, "minhash_sigs"),
        numHashes = 64, bands = 16, threshold = 0.5)
      val docs = t(s, dir, "documents")
      val labels = DedupOps.connectedComponents(
        docs.select(col("doc_id")), "doc_id", pairs)
      DedupOps.bestPerCluster(labels,
          docs.select(col("doc_id").as("id"),
            TextOps.tokenCount(col("text")).as("q")))
        .orderBy("cluster_id")
    }),

    // ---- curation: mixture resampling — the largest sub-corpus whose
    //      language composition matches integer ppm targets (all-integral
    //      quota math; row choice by the shared deterministic permutation)
    "q_mixture_resample" -> ((s, dir) =>
      TextOps.mixtureResample(t(s, dir, "documents").select("doc_id", "lang"),
        "doc_id", "lang",
        Seq("en" -> 400000L, "zh" -> 300000L, "ru" -> 200000L, "nl" -> 100000L))
        .orderBy("doc_id")),

    // ---- quality: n-gram LM surprise (the integral CCNet/KenLM-style
    //      perplexity proxy — corpus-trained bigram statistics, exact
    //      integer scoring; Spark keys n-grams by xxhash64, the oracle by
    //      text)
    "q_ngram_surprise" -> ((s, dir) =>
      TextOps.ngramSurprise(t(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // ---- CCNet-style head/middle/tail corpus split: LM-surprise
    //      percentile cutoffs (33/67, distributed-prefix-sum quantiles
    //      over the score histogram) broadcast back as map-side labels
    "q_ppl_buckets" -> ((s, dir) =>
      TextOps.surpriseBuckets(t(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // ---- web graph: per-document outlink stats from the kernel-extracted
    //      link table (href resolution pinned in LinkOpsSpec; DuckDB
    //      replays the aggregation + host parse from the dump)
    "q_link_extract" -> ((s, dir) =>
      vt(s, dir, "links")
        .groupBy("src")
        .agg(count(lit(1)).as("n_links"),
          countDistinct(LinkOps.hostOf(col("dst"))).as("n_dst_hosts"))
        .orderBy("src")),

    // ---- web graph: cross-host edge aggregation (payload-free counts)
    "q_host_graph" -> ((s, dir) =>
      LinkOps.hostGraph(vt(s, dir, "links")).orderBy("src_host", "dst_host")),

    // ---- web graph: integral PageRank (5 iterations) over the host
    //      graph — host centrality as a corpus-curation quality signal;
    //      scaled-integer DIV arithmetic end to end so the DuckDB
    //      iteration-ladder replay is bit-exact
    "q_pagerank" -> ((s, dir) =>
      LinkOps.pageRank(LinkOps.hostGraph(vt(s, dir, "links")), iterations = 5)
        .orderBy("node")),

    // ---- web graph: integral TrustRank (5 iterations) — PageRank whose
    //      teleport lands only on a trusted seed set (every host whose
    //      digit part % 3 == 0), so trust propagates outward and
    //      unreachable/spam-side hosts score 0; same DIV ladder, bit-exact
    //      DuckDB replay with the seed CASE folded into every round
    "q_trustrank" -> ((s, dir) => {
      val hg = LinkOps.hostGraph(vt(s, dir, "links"))
      val nodes = hg.select(col("src_host").as("node"))
        .union(hg.select(col("dst_host").as("node"))).distinct()
      val seeds = nodes.filter(
        expr("try_cast(regexp_extract(node, 'host([0-9]+)', 1) AS BIGINT)") % 3 === 0)
      LinkOps.trustRank(hg, seeds, iterations = 5).orderBy("node")
    }),

    // ---- web graph: integral HITS hubs/authorities (5 iterations) over
    //      the host graph — the quality-prior complement to PageRank
    //      (directory/spam farms score high-hub low-authority); max-
    //      normalized scaled-integer rounds so the DuckDB iteration-
    //      ladder replay is bit-exact
    "q_hits" -> ((s, dir) =>
      LinkOps.hits(LinkOps.hostGraph(vt(s, dir, "links")), iterations = 5)
        .orderBy("node")),

    // ---- crawl: recrawl consolidation — latest warc_ts wins per url
    //      (planted revisits over the snapshot: every 7th doc re-fetched
    //      +1h, every 14th again +2h)
    "q_url_revisit" -> ((s, dir) => {
      val base = vt(s, dir, "northrule").select(col("url"), col("warc_ts"))
      val n = regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long")
      val rev1 = base.filter(n % 7 === 0)
        .withColumn("warc_ts", col("warc_ts") + expr("INTERVAL 1 HOUR"))
      val rev2 = base.filter(n % 14 === 0)
        .withColumn("warc_ts", col("warc_ts") + expr("INTERVAL 2 HOUR"))
      LinkOps.latestVersionPerUrl(base.unionByName(rev1).unionByName(rev2))
        .orderBy("url")
    }),

    // ---- crawl: adaptive recrawl scheduling (Cho & Garcia-Molina's
    //      change-rate estimation, integral form). Planted revisit
    //      history over the snapshot: every 7th doc re-fetched +1h
    //      (payload changed only for every 21st), every 14th again +3h
    //      (always changed) — so single-observation, never-changed
    //      backoff, 1-change and 2-change branches are all exercised,
    //      plus both clamp bounds via the parameters. Digests are
    //      md5(hex(html)) so the oracle replays the change detection
    //      from the ORIGINAL parquet; the lag window, integer-seconds
    //      span math and truncating DIV all replay verbatim.
    "q_recrawl_schedule" -> ((s, dir) => {
      val n = regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long")
      val base = vt(s, dir, "northrule")
        .select(col("url"), col("warc_ts"), md5(hex(col("html"))).as("digest"), n.as("n"))
      val rev1 = base.filter(col("n") % 7 === 0)
        .select(col("url"), (col("warc_ts") + expr("INTERVAL 1 HOUR")).as("warc_ts"),
          when(col("n") % 21 === 0, md5(concat(col("digest"), lit("v2"))))
            .otherwise(col("digest")).as("digest"))
      val rev2 = base.filter(col("n") % 14 === 0)
        .select(col("url"), (col("warc_ts") + expr("INTERVAL 3 HOUR")).as("warc_ts"),
          md5(concat(col("digest"), lit("v3"))).as("digest"))
      LinkOps.recrawlSchedule(
          base.drop("n").unionByName(rev1).unionByName(rev2),
          baseIntervalSec = 86400L, minIntervalSec = 3600L,
          maxIntervalSec = 604800L)
        .orderBy("url")
    }),

    // ---- crawl: snapshot change MAGNITUDE — graded token-level change
    //      between consecutive versions, where q_crawl_delta /
    //      q_recrawl_schedule see only digest equality. Planted revisit
    //      history: every 7th doc re-fetched +1h with text unchanged
    //      EXCEPT every 21st (appended update sentence → partial
    //      overlap, change_ppm strictly between 0 and 10⁶); every 14th
    //      re-fetched again +3h with the DOUBLED text, so MULTISET
    //      semantics bind (recall vs prev is total, precision ~half — a
    //      set intersection would report no change). Both engines build
    //      the identical history from the parquet and re-derive the
    //      overlap + truncating-DIV ppm math independently.
    "q_change_magnitude" -> ((s, dir) => {
      val n = regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long")
      val base = vt(s, dir, "northrule")
        .select(col("url"), col("warc_ts"), col("text"), n.as("n"))
      val rev1 = base.filter(col("n") % 7 === 0)
        .select(col("url"), (col("warc_ts") + expr("INTERVAL 1 HOUR")).as("warc_ts"),
          when(col("n") % 21 === 0,
            concat(col("text"), lit(" freshly minted update tokens")))
            .otherwise(col("text")).as("text"))
      val rev2 = base.filter(col("n") % 14 === 0)
        .select(col("url"), (col("warc_ts") + expr("INTERVAL 3 HOUR")).as("warc_ts"),
          concat(col("text"), lit(" "), col("text")).as("text"))
      val snaps = base.drop("n").unionByName(rev1).unionByName(rev2)
      LinkOps.snapshotChangeMagnitude(snaps).orderBy("url", "ts_ms")
    }),

    // ---- curation: quality-ranked top-3 docs per host (score = sidecar
    //      text length, ties by doc id) — per-host cutoff from the score
    //      histogram, never a per-host sort of the data
    "q_host_topk" -> ((s, dir) => {
      val d = vt(s, dir, "northrule")
        .select(col("url"),
          regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long").as("id"),
          LinkOps.hostOf(col("url")).as("host"),
          length(col("text")).cast("long").as("score"))
      TextOps.topKPerStratum(d, "id", "host", col("score"), k = 3L)
        .select("url", "host", "score").orderBy("url")
    }),

    // ---- crawl: incremental-ingest snapshot delta. B is a deterministic
    //      rewrite of A (1-in-13 dropped, 1-in-11 edited, 1-in-17 gains a
    //      variant url); the diff join carries only (url, 8-byte digest)
    //      per side — payloads never shuffle at any snapshot size.
    // ---- crawl: RSS/Atom feed discovery — the third discovery channel
    //      next to outlinks and sitemaps (feeds surface new urls first;
    //      the freshness frontier polls them). Planted per-host feeds
    //      (RSS for even host checksums, Atom for odd — both parser
    //      branches every run) through the REAL parser in-query; items
    //      classify known/new against the snapshot. The oracle replays
    //      the classification from the independently-dumped feed_entries
    //      parse (the sitemap_entries evidential class); the parse
    //      itself is pinned by LinkOpsSpec fixtures.
    "q_feed_discovery" -> ((s, dir) => {
      import s.implicits._
      val snap = vt(s, dir, "northrule").select(col("url"))
      val entries = snap
        .select(LinkOps.hostOf(col("url")).as("host")).distinct().as[String]
        .flatMap(h => LinkOps.parseFeed(VerifyTables.plantedFeedXml(h))
          .map { case (loc, title, ts) => (h, loc, title, ts) })
        .toDF("host", "item_url", "title", "published")
      entries
        .join(snap.withColumnRenamed("url", "item_url")
          .withColumn("__known", lit(true)), Seq("item_url"), "left")
        .select(col("host"), col("item_url"), col("title"),
          col("published").cast("long").as("published_ts"),
          coalesce(col("__known"), lit(false)).as("known"))
        .orderBy("host", "item_url")
    }),

    // ---- crawl: AS-OF join — every probe gets the latest version
    //      at-or-before its timestamp. Versions replay q_url_revisit's
    //      plant (v1 at warc_ts for all, v2 +1h for every 7th, v3 +2h for
    //      every 14th); each url probes at +90min (matches v2 where it
    //      exists, else v1 — binding the per-key LATEST-wins rule, not
    //      just any-match) and at −30min (predates every version —
    //      binding the miss branch; coalesced to 0 for hash stability).
    //      The DuckDB oracle is a genuinely independent engine: its
    //      native ASOF LEFT JOIN operator vs our tag-union window plan.
    "q_asof_join" -> ((s, dir) => {
      val base = vt(s, dir, "northrule").select(col("url"), col("warc_ts"))
        .withColumn("n", regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long"))
      def ver(mod: Int, hours: Int, no: Int) = base.filter(col("n") % mod === 0)
        .select(col("url"),
          (col("warc_ts") + expr(s"INTERVAL $hours HOUR")).as("vts"),
          lit(no.toLong).as("version_no"))
      val versions = ver(1, 0, 1).unionByName(ver(7, 1, 2)).unionByName(ver(14, 2, 3))
      val probes = base
        .select(col("url"), (col("warc_ts") + expr("INTERVAL 90 MINUTE")).as("pts"))
        .unionByName(base.select(col("url"),
          (col("warc_ts") - expr("INTERVAL 30 MINUTE")).as("pts")))
      LinkOps.asOfJoin(probes, versions, "url", "pts", "vts", Seq("version_no"))
        .select(col("url"), col("pts").cast("long").as("probe_ts"),
          coalesce(col("version_ts").cast("long"), lit(0L)).as("version_ts"),
          coalesce(col("version_no"), lit(0L)).as("version_no"))
        .orderBy("url", "probe_ts")
    }),

    // ---- crawl: registered-domain (eTLD+1) rollup — the site-level
    //      aggregation key host-level grouping gets wrong for multi-label
    //      public suffixes. Plants bind every branch: every 6th/9th doc
    //      spawns a.shopK.co.uk / b.shopK.co.uk urls (different 3-label
    //      hosts, SAME registered domain shopK.co.uk — the co.uk branch
    //      and the subdomain merge), every 11th a www.siteK.example url
    //      (plain last-2 rollup of a 3-label host); the natural 2-label
    //      hosts flow through as themselves.
    "q_domain_rollup" -> ((s, dir) => {
      val base = vt(s, dir, "northrule").select(col("url"))
      val n = regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long")
      def plant(mod: Int, pre: String) = base.filter(n % mod === 0)
        .select(concat(lit(s"https://$pre.shop"), n % 10,
          lit(".co.uk/p"), n).as("url"))
      val www = base.filter(n % 11 === 0)
        .select(concat(lit("https://www.site"), n % 10,
          lit(".example/q"), n).as("url"))
      val aug = base.unionByName(plant(6, "a")).unionByName(plant(9, "b"))
        .unionByName(www)
      aug.select(LinkOps.hostOf(col("url")).as("host"))
        .filter(col("host") =!= "")
        .groupBy(LinkOps.registeredDomain(col("host")).as("registered_domain"))
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("host")).as("n_hosts"))
        .orderBy("registered_domain")
    }),

    // ---- crawl: crawler-trap detection — per (host, digit-collapsed URL
    //      template), distinct urls vs distinct contents. Two plants over
    //      the corpus: a calendar trap (every 5th doc becomes a
    //      trap.example/cal?day=N url sharing ONE text — ratio collapses,
    //      flagged) and a legitimately large section (every 7th doc a
    //      big.example/article/N url keeping its own text — ratio stays
    //      10⁶, not flagged), binding both gate directions; the natural
    //      corpus urls flow through untouched.
    "q_crawl_traps" -> ((s, dir) => {
      val base = vt(s, dir, "northrule").select(col("url"), col("text"))
      val n = regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long")
      val trap = base.filter(n % 5 === 0)
        .select(concat(lit("https://trap.example/cal?day="), n).as("url"),
          lit("trap calendar page").as("text"))
      val big = base.filter(n % 7 === 0)
        .select(concat(lit("https://big.example/article/"), n).as("url"),
          col("text"))
      LinkOps.crawlTraps(base.unionByName(trap).unionByName(big), "url", "text")
        .orderBy("host", "url_pattern")
    }),

    "q_crawl_delta" -> ((s, dir) => {
      val a = vt(s, dir, "northrule").select(col("url"), col("text"),
        regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long").as("__id"))
      val b = a.filter(col("__id") % 13 =!= 0)
        .select(col("url"),
          when(col("__id") % 11 === 0, concat(col("text"), lit(" updated")))
            .otherwise(col("text")).as("text"))
        .unionByName(a.filter(col("__id") % 17 === 0)
          .select(concat(col("url"), lit("?v=2")).as("url"), col("text")))
      LinkOps.crawlDelta(a.select("url", "text"), b).orderBy("url")
    }),

    // ---- crawl: incremental re-extraction — re-run the kernel ONLY on
    //      new/changed payloads, reuse the prior committed output for
    //      unchanged urls. B's "changed" docs swap in the PREVIOUS doc's
    //      html (donor substitution), so DuckDB can replay the entire job
    //      from the dumped full-extraction table with zero kernel code —
    //      which simultaneously proves extraction is a pure function of
    //      the payload and that the incremental routing is exact.
    "q_incremental_extract" -> ((s, dir) => {
      val a = vt(s, dir, "northrule")
      val withId = a.withColumn("__id",
        regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long"))
      val donors = withId.select((col("__id") + 1).as("__id"),
        col("html").as("__dh"))
      val bBase = withId.filter(col("__id") % 13 =!= 0)
        .join(donors, Seq("__id"), "left")
        .withColumn("html",
          when(col("__id") % 11 === 0 && col("__id") > 0, col("__dh"))
            .otherwise(col("html")))
        .drop("__dh")
      val b = bBase.unionByName(withId.filter(col("__id") % 17 === 0)
          .withColumn("url", concat(col("url"), lit("?v=2"))))
        .drop("__id")
      ExtractPipeline.runIncremental(
          ExtractPipeline.snapshotDigests(a), vt(s, dir, "extract_docs"), b)
        .select("url", "source", "n_pages", "extracted_text", "filtered", "error")
        .orderBy("url")
    }),

    // ---- curation: domain blocklist filter (UT1-style) — equals-or-
    //      subdomain matching via dot-suffix explode + semi/anti join
    "q_domain_filter" -> ((s, dir) => {
      import s.implicits._
      val blk = Seq("host7.example", "host13.example").toDF("domain")
      LinkOps.filterBlockedHosts(vt(s, dir, "northrule").select(col("url")),
          "url", blk)
        .select(col("url"), LinkOps.hostOf(col("url")).as("host"))
        .orderBy("url")
    }),

    // ---- crawl policy: meta-robots noindex opt-out — every 5th doc
    //      (planted, with mixed-case name/content) declares
    //      <meta name=robots content=noindex> and must drop; the kernel
    //      HTML parse is the op under test, the oracle replays the
    //      planted pattern
    "q_noindex_filter" -> ((s, dir) => {
      val n = regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long")
      val html = concat(
        lit("<html><head>"),
        when(n % 5 === 0,
          lit("<meta name=\"ROBOTS\" content=\"NOINDEX, nofollow\">"))
          .otherwise(lit("")),
        lit("</head><body><p>page</p></body></html>"))
      val docs = vt(s, dir, "northrule")
        .select(col("url"), encode(html, "UTF-8").as("html"))
      LinkOps.filterNoindex(docs).select("url").orderBy("url")
    }),

    // ---- crawl policy: robots.txt Disallow/Allow enforcement — the
    //      RFC 9309 longest-match decision per url over the dumped
    //      per-host rules table (each host's planted /robots.txt body
    //      parsed by the REAL parser in a separate pass; parse fixtures
    //      pinned in RobotsSpec). DuckDB replays host join + prefix match
    //      + longest-wins/allow-on-tie + anti join from the same dump.
    "q_robots_filter" -> ((s, dir) =>
      LinkOps.filterByRobots(vt(s, dir, "northrule"), "url",
        vt(s, dir, "robots_rules"))
        .select(col("url"), col("lang")).orderBy("url")),

    // ---- crawl metadata: page-metadata extraction (title / description /
    //      rel=canonical, first-wins DOM walk) over the corpus + the
    //      planted canonical docs — the oracle checks the live kernel run
    //      against the independently-dumped page_meta table row-for-row
    //      (the x_parse_flex evidential class; walk + resolution pinned
    //      in LinkOpsSpec)
    "q_page_meta" -> ((s, dir) =>
      LinkOps.extractPageMeta(
          vt(s, dir, "northrule").unionByName(VerifyTables.plantedCanonicalDocs(s)))
        .orderBy("url")),

    // ---- crawl dedup: rel=canonical consolidation — pages declaring the
    //      same canonical target collapse to one representative (self if
    //      present, else min url); corpus pages without a declaration are
    //      their own group. DuckDB replays the grouping + self-first pick
    //      from the dumped page_meta table.
    "q_canonical_dedup" -> ((s, dir) =>
      LinkOps.canonicalConsolidate(
          LinkOps.extractPageMeta(
            vt(s, dir, "northrule").unionByName(VerifyTables.plantedCanonicalDocs(s))))
        .orderBy("canonical_url")),

    // ---- crawl policy: frontier generation — undiscovered outlink
    //      targets, robots.txt + blocklist enforced, per-host politeness
    //      top-5 by inlink count. Planted edges aim at /pdf/ and
    //      /truncated/ paths so the robots rules actually DROP candidates
    //      (the synthetic outlinks are all /html/, which every planted
    //      rules variant allows). DuckDB replays every stage from the
    //      dumped links + robots_rules + northrule tables.
    "q_frontier" -> ((s, dir) => {
      import s.implicits._
      val nr = vt(s, dir, "northrule")
      val planted = nr
        .select(col("url"),
          regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long").as("did"))
        .filter(col("did") % 23 === 0)
        .select(col("url").as("src"),
          concat(regexp_extract(col("url"), "^(https?://[^/]+)", 1),
            when(col("did") % 2 === 0, lit("/pdf/frontier"))
              .otherwise(lit("/truncated/frontier")),
            col("did").cast("string")).as("dst"))
      val links = vt(s, dir, "links").select("src", "dst").unionByName(planted)
      val blk = Seq("host7.example", "host13.example").toDF("domain")
      LinkOps.crawlFrontier(nr.select("url"), links,
          vt(s, dir, "robots_rules"), blk, perHostK = 5L)
        .orderBy("url")
    }),

    // ---- crawl policy: sitemap-driven recrawl scheduling — each planted
    //      sitemap entry classified new / stale / index against the
    //      corpus snapshot (lastmod vs warc_ts). The live query re-parses
    //      the planted bodies with the REAL parser; DuckDB replays the
    //      decision from the separately-dumped sitemap_entries table, so
    //      the dump doubles as an independent-pass parse replay.
    "q_sitemap_recrawl" -> ((s, dir) =>
      LinkOps.sitemapRecrawl(VerifyTables.sitemapEntries(s, dir),
          vt(s, dir, "northrule"))
        .orderBy("url")),

    // ---- hreflang multilingual clusters: alternate declarations
    //      harvested by the live parser over corpus + planted docs, then
    //      clustered via connected components (asymmetric declarations
    //      and chains close transitively); DuckDB replays closure +
    //      min-representative + langs aggregation from the
    //      independently-dumped alternates table with a recursive CTE
    //      over url STRINGS — a hash-free cross-check of the xxhash64
    //      node-id plumbing
    "q_hreflang_clusters" -> ((s, dir) =>
      LinkOps.hreflangClusters(
        LinkOps.extractAlternates(
          vt(s, dir, "northrule").unionByName(VerifyTables.plantedHreflangDocs(s))))
        .orderBy("url")),

    // ---- sitemap discovery: the sitemaps.org robots.txt `Sitemap:`
    //      mechanism — each host's planted robots body parsed by the
    //      REAL harvester (non-group field, absolute-http(s)-only),
    //      joined against per-host doc counts; DuckDB replays the
    //      count-join from the independently-dumped robots_sitemaps
    //      table. Scale shape: discovery is map-only over a hosts-sized
    //      relation; the count agg is payload-free; the join is
    //      host-keyed (AQE broadcasts the small side).
    "q_sitemap_discovery" -> ((s, dir) => {
      import s.implicits._
      val hosts = vt(s, dir, "northrule")
        .groupBy(LinkOps.hostOf(col("url")).as("host"))
        .agg(count(lit(1)).as("n_docs"))
      val robots = hosts.select(col("host")).as[String]
        .map(h => (h, VerifyTables.plantedRobotsTxt(h)))
        .toDF("host", "body")
      LinkOps.discoverSitemaps(robots)
        .join(hosts, Seq("host"))
        .orderBy("host", "sitemap_url")
    }),

    // ---- WARC archive ingestion (graft.sources.Warc): the corpus
    //      re-serialized as synthetic crawl-archive files (warc_files
    //      dump) and parsed BACK into the input-table shape by the real
    //      parser — warcinfo records skipped, HTTP headers stripped,
    //      WARC-Date round-tripped. The oracle is the ORIGINAL northrule
    //      parquet itself: url, timestamp, byte length and payload
    //      md5(hex) must all survive the archive round-trip. Map-only
    //      flatMap per file — no shuffle (one task holds one file's
    //      bytes, the binary-ingest bound; archives are ~1 GiB files at
    //      crawl scale precisely so this holds).
    "q_warc_roundtrip" -> ((s, dir) =>
      graft.sources.Warc.readWarcTable(vt(s, dir, "warc_files"), "data")
        .select(col("url"), col("warc_ts"), length(col("html")).cast("long").as("n_bytes"),
          md5(hex(col("html"))).as("payload_md5"))
        .orderBy("url")),

    // ---- same round-trip through the member-per-record gzip layout
    //      (.warc.gz, the Common Crawl file format) — exercises the
    //      concatenated-member inflation path at verify scale
    "q_warc_gz_roundtrip" -> ((s, dir) =>
      graft.sources.Warc.readWarcTable(vt(s, dir, "warc_files"), "data_gz")
        .select(col("url"), col("warc_ts"), length(col("html")).cast("long").as("n_bytes"),
          md5(hex(col("html"))).as("payload_md5"))
        .orderBy("url")),

    // ---- archive-to-extraction composition: the FULL pipeline run
    //      straight off .warc.gz bytes (parse → dispatch → extract →
    //      assemble, one map-only job end to end) must equal the run
    //      over the table — the oracle is x_extract_full's page-dump
    //      re-assembly verbatim. This is the real ingest story at 100
    //      TB: no intermediate table materialization between the
    //      archive scan and the extraction kernel.
    "q_warc_pipeline" -> ((s, dir) =>
      ExtractPipeline.run(
        graft.sources.Warc.readWarcTable(vt(s, dir, "warc_files"), "data_gz")
          .withColumn("text", lit("")).withColumn("lang", lit("")))
        .orderBy("url")),

    // ---- image near-dup by perceptual hash: dHash64 over the planted
    //      image corpus (recomputed live — the dump is a SEPARATE pass
    //      over the same seeded payloads), then 4×16-bit band LSH +
    //      popcount verify. Pigeonhole-exact for hamming ≤3 (3 flipped
    //      bits can't touch all 4 bands), so this IS the all-pairs
    //      answer without the O(n²) join; only (id, band, 16-bit, hash)
    //      ever shuffles. Oracle replays banding + distinct + popcount
    //      from the independently-dumped hash table in SQL.
    "q_image_neardup" -> ((s, dir) =>
      MultimodalOps.nearDupPairs64(
          MultimodalOps.imageDHash(
            MultimodalOps.plantedNearDupMedia(s, VerifyTables.mediaDocs(dir) / 4,
              VerifyTables.Seed)))
        .orderBy("id_a", "id_b")),

    // ---- audio near-dup: the WAV twin of q_image_neardup — temporal
    //      envelope difference hash (65 blocks, mean |amplitude|, neighbor
    //      comparisons) through the SAME pigeonhole-exact 4×16 banded
    //      pairer. Hashes recomputed live from the seeded clips; the
    //      oracle replays banding + distinct + popcount from the
    //      independently-dumped audio_dhash table.
    "q_audio_neardup" -> ((s, dir) =>
      MultimodalOps.nearDupPairs64(
          MultimodalOps.audioDHash(
            MultimodalOps.plantedNearDupAudio(s, VerifyTables.mediaDocs(dir) / 4,
              VerifyTables.Seed)))
        .orderBy("id_a", "id_b")),

    // ---- video near-dup: per-frame dHash64 over demuxed motion-PNG
    //      frames, frame-level banding (pigeonhole-exact per frame pair)
    //      aggregated to (id_a, id_b, matched_frames, min_hamming).
    //      Oracle replays banding + popcount + the doc-level grouping
    //      from the independently-dumped per-frame hash table.
    "q_video_neardup" -> ((s, dir) =>
      MultimodalOps.videoNearDupPairs(
          MultimodalOps.videoFrameDHash(
            MultimodalOps.plantedNearDupVideos(s, VerifyTables.mediaDocs(dir) / 4,
              VerifyTables.Seed)))
        .orderBy("id_a", "id_b")),

    // ---- WET extracted-text archive round-trip: the WRITE side of the
    //      archive surface — the full pipeline's assembled markdown,
    //      written as WARC `conversion` records (Common Crawl's
    //      `.warc.wet.gz` shape, xxhash64(url)-mod-nFiles assignment,
    //      url-ordered deterministic bytes) and parsed BACK by the real
    //      WET reader. The oracle never touches the archive bytes: it
    //      re-assembles the expected text from the page dumps and the
    //      timestamp from the ORIGINAL northrule parquet — so text
    //      (multibyte UTF-8 through byte-counted Content-Length) and
    //      millisecond timestamps must both survive the format. Scale
    //      shape: ONE shuffle (each doc's text moves once to its file's
    //      writer), the read back map-only.
    "q_wet_roundtrip" -> ((s, dir) => {
      val text = ExtractPipeline.run(vt(s, dir, "northrule"))
        .select(col("url"), col("md").as("text"))
      val withTs = text.join(
        vt(s, dir, "northrule").select(col("url"), col("warc_ts")), Seq("url"))
      val files = graft.sources.Warc.writeWetTable(withTs,
        nFiles = math.max(1L, InputTable.docsForSfDir(dir) / 64).toInt)
      graft.sources.Warc.readWetTable(files, "data_gz").orderBy("url")
    }),

    // ---- main-content extraction (boilerplate removal): leaf-block
    //      features re-extracted live and checked row-for-row against the
    //      independently-dumped html_blocks table (the x_parse_flex
    //      evidential class — two kernel passes must agree byte-for-byte
    //      on every block's text and integral features)
    "q_block_features" -> ((s, dir) =>
      LinkOps.extractBlocks(vt(s, dir, "northrule"))
        .orderBy("url", "block_no")),

    // ---- the composed op: jusText-style content/boilerplate
    //      classification (division-free link-density test) + ordered
    //      blank-line assembly — the boilerplate-stripped training text
    //      of the CCNet/RefinedWeb lineage. DuckDB replays the
    //      classification AND the assembly from the dump, so the
    //      cross-multiplied threshold and the sorted-struct concat are
    //      both engine-checked. Map-only blocks; one hash agg per url.
    "q_main_content" -> ((s, dir) =>
      LinkOps.mainContent(vt(s, dir, "northrule")).orderBy("url")),

    // ---- WAT metadata-sidecar round-trip: the third Common Crawl
    //      format next to the WARC reader and the WET writer. ONE DOM
    //      parse per page builds the envelope JSON (head title + Links
    //      array) MAP-SIDE, so the HTML never shuffles; the files are
    //      re-parsed by the real WAT reader and the fields extracted
    //      back OUT of the JSON. The oracle recomputes title from the
    //      independently-dumped page_meta table, link counts from the
    //      independently-dumped links table, and timestamps from the
    //      ORIGINAL parquet — the archive bytes and the JSON encoding
    //      are never consulted, so escaping, Content-Length byte math
    //      and the record format must all round-trip.
    "q_wat_roundtrip" -> ((s, dir) => {
      val files = LinkOps.watFilesOf(vt(s, dir, "northrule"),
        nFiles = math.max(1L, InputTable.docsForSfDir(dir) / 64).toInt)
      val titlePath = "$.Envelope['Payload-Metadata']['HTTP-Response-Metadata']" +
        "['HTML-Metadata'].Head.Title"
      val linksPath = "$.Envelope['Payload-Metadata']['HTTP-Response-Metadata']" +
        "['HTML-Metadata'].Links"
      graft.sources.Warc.readWatTable(files, "data_gz")
        .select(col("url"), col("warc_ts"),
          get_json_object(col("json"), titlePath).as("title"),
          coalesce(json_array_length(get_json_object(col("json"), linksPath)),
            lit(0)).cast("long").as("n_links"))
        .orderBy("url")
    }),

    // ---- the COMPLETE archive-to-archive story: .warc.gz bytes in,
    //      .wet.gz bytes out, one composed job — WARC parse → extraction
    //      pipeline → WET conversion records → re-parse. Same oracle
    //      class as q_wet_roundtrip (page-dump re-assembly + ORIGINAL
    //      timestamps), but here the INPUT was archive bytes too, so url,
    //      timestamp and text must survive BOTH formats end to end. This
    //      is what a Common Crawl user actually runs at 100 TB: no
    //      intermediate table is ever materialized.
    "q_archive_pipeline" -> ((s, dir) => {
      val table = graft.sources.Warc.readWarcTable(
        vt(s, dir, "warc_files"), "data_gz")
      val text = ExtractPipeline.run(
          table.withColumn("text", lit("")).withColumn("lang", lit("")))
        .select(col("url"), col("md").as("text"))
      val withTs = text.join(table.select(col("url"), col("warc_ts")), Seq("url"))
      graft.sources.Warc.readWetTable(
        graft.sources.Warc.writeWetTable(withTs,
          nFiles = math.max(1L, InputTable.docsForSfDir(dir) / 64).toInt),
        "data_gz").orderBy("url")
    }),

    // ---- CDX capture index off the .warc.gz member layout: the archive
    //      store's random-access sidecar (Common Crawl publishes exactly
    //      this). Map-only per file like the ingest scan itself — index
    //      generation rides the same pass. The oracle recomputes the
    //      SURT urlkey (documented subset), the 14-digit UTC timestamp
    //      and the md5(hex(payload)) digest from the ORIGINAL northrule
    //      parquet — so url canonicalization, date round-trip and body
    //      identity are all independently replayed; the (offset, length)
    //      random-access slice contract is pinned byte-level in CdxSpec
    //      (not SQL-expressible — DuckDB never sees the archive bytes).
    "q_cdx_index" -> ((s, dir) =>
      graft.sources.Warc.cdxTable(vt(s, dir, "warc_files"), "data_gz")
        .select(col("urlkey"), col("ts14"), col("url"), col("digest"))
        .orderBy("url")),

    // ---- decontamination, large-eval-set scale path: Bloom prefilter +
    //      exact verify — result is EXACTLY q_decontaminate's (no false
    //      negatives in the sketch; false positives die in the verify
    //      join), so the same SQL oracles both
    "q_decontaminate_bloom" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextOps.decontaminateBloom(
          docs.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
          docs.filter(col("doc_id") % 97 === 0), "text", n = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- extraction QA: per-doc token-overlap precision/recall/F1 of
    //      the pipeline's extracted text against the table's sidecar
    //      text — the quality signal a 100-TB extraction run monitors.
    //      Map-only multiset counting (never a per-token shuffle); all
    //      integral (counts + truncating-DIV ppm ratios), so DuckDB's
    //      unnest+join replay is engine-exact.
    "q_extract_quality" -> ((s, dir) => {
      val pair = vt(s, dir, "extract_docs").select(col("url"), col("extracted_text"))
        .join(vt(s, dir, "northrule").select(col("url"), col("text")), Seq("url"))
      TextOps.extractionQuality(pair, "url", "extracted_text", "text")
        .orderBy("url")
    }),

    // ---- crawl consolidation: redirect-chain resolution — every
    //      synthetic redirect source mapped to its final destination via
    //      distance-doubling pointer jumping (O(log chain) rounds, string
    //      pairs only); per-host chains with planted CYCLES exercise the
    //      loop detector. DuckDB rebuilds the same edges and walks them
    //      with a recursive CTE — hop counts must match EXACTLY.
    "q_redirect_resolve" -> ((s, dir) =>
      LinkOps.resolveRedirects(syntheticRedirectEdges(vt(s, dir, "northrule")))
        .orderBy("url")),

    // ---- FUSED web-corpus pass (round-5 flagship composition): ONE DOM
    //      parse per payload feeds extraction + outlinks + anchors +
    //      robots (WebPipeline.run), where the per-op composition parses
    //      each payload 3×. The oracle is the strongest equivalence
    //      available: it reassembles the SEPARATE passes' dumped tables
    //      (extract_docs / links / anchors) in DuckDB — the fused pass
    //      must reproduce the independent per-op outputs byte-for-byte.
    //      Three planted docs with meta-robots exercise the robots walk
    //      end-to-end (the synthetic corpus carries none); their md is a
    //      hand-checkable constant, replayed as SQL literals. The real
    //      rows' n_robots=0/noindex=false IS an assertion: a misfiring
    //      fused robots walk on real pages would break the hash.
    "q_web_pipeline" -> ((s, dir) => {
      val input = vt(s, dir, "northrule").unionByName(plantedRobotsDocs(s))
      graft.pipeline.WebPipeline.run(input)
        .select(col("url"), col("n_pages"), col("md"), col("extracted_text"),
          size(col("links")).cast("long").as("n_links"),
          size(col("anchors")).cast("long").as("n_anchors"),
          aggregate(col("anchors"), lit(0L),
            (a, x) => a + length(x.getField("anchor")).cast("long")).as("n_anchor_chars"),
          size(col("robots")).cast("long").as("n_robots"),
          exists(col("robots"), t => t === "noindex" || t === "none").as("noindex"))
        .orderBy("url")
    }),

    // ---- web graph → curation: host-reputation gate — PageRank host
    //      centrality joined back onto the extraction output (the host
    //      rank table is tiny, so AQE broadcasts it: the graph signal
    //      reaches every document map-side, no corpus shuffle)
    "q_host_reputation" -> ((s, dir) => {
      val ranks = LinkOps.pageRank(LinkOps.hostGraph(vt(s, dir, "links")),
        iterations = 5)
      vt(s, dir, "extract_docs")
        .select(col("url"), LinkOps.hostOf(col("url")).as("host"))
        .join(ranks.withColumnRenamed("node", "host"), Seq("host"), "left")
        .select(col("url"), col("host"),
          coalesce(col("rank"), lit(0L)).as("host_rank"),
          (coalesce(col("rank"), lit(0L)) >= 500000L).as("keep"))
        .orderBy("url")
    }),

    // ---- web graph: per-target anchor-text aggregation — how the web
    //      describes each page (inlink-text features: counts, distinct
    //      texts, most-frequent text, distinct source hosts). Pure hash
    //      aggregations — the top-text pick is min(struct(-count, text)),
    //      never a per-dst window over raw anchors
    "q_anchor_summary" -> ((s, dir) =>
      LinkOps.anchorSummary(vt(s, dir, "anchors")).orderBy("dst")),

    // ---- dedup: embedding-cosine near-dup via banded sign-LSH over the
    //      hashed-BoW document vectors (dumped with their signatures;
    //      DuckDB replays band join + cosine-threshold verify; cosine
    //      emitted rounded to 1e-6 so cross-engine floats can't flip rows)
    "q_embed_neardup" -> ((s, dir) =>
      SimilarityOps.embeddingDupPairsFromSigs(vt(s, dir, "doc_vectors"), threshold = 0.95)
        .orderBy("id_a", "id_b")),

    // ---- quality-classifier inference: linear (fastText-style) scoring
    //      over the dumped hashed-BoW vectors with shared integer weight
    //      constants — all-integral logit, engine-exact keep decision
    "q_bow_classifier" -> ((s, dir) =>
      TextOps.scoreLinearBow(vt(s, dir, "doc_vectors"), "id", "vec")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // ---- fingerprinting: oracled against the separately-dumped
    //      fingerprints table (independent-pass replay, the x_parse_flex
    //      evidential class); determinism gate in OpsSpec
    "q_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // ---- writer prep: token-balanced shard packing — every doc to one
    //      of 8 shards of near-equal TOKEN mass via the shared
    //      permutation order + the range-sliced distributed prefix sum.
    //      The oracle computes the DEFINITIONAL single-window global
    //      cumsum, so the green row proves the two-phase slice/offset
    //      decomposition exactly equals the straight global order.
    "q_shard_pack" -> ((s, dir) =>
      TextOps.balancedShards(t(s, dir, "documents"), "doc_id", "text", m = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // ---- curation: contamination overlap FRACTION (the GPT-3
    //      appendix-C dirtiness grade) — bench = every 97th doc; the
    //      corpus gains two planted contamination tiers built FROM the
    //      bench docs (full: bench text + filler -> high ppm; partial:
    //      first 10 bench tokens + 10 filler tokens -> mid-range ppm
    //      binding the integral DIV), so the ppm threshold separates
    //      graded classes instead of a single natural outlier.
    "q_contamination_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val full = bench.select((col("doc_id") + 700000).as("doc_id"),
        concat(col("text"), lit(" unrelated filler tokens appended here now")).as("text"))
      val partial = bench.select((col("doc_id") + 800000).as("doc_id"),
        concat(concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 10)),
          lit(" filler alpha beta gamma delta epsilon zeta eta theta iota kappa")).as("text"))
      val corpus = docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), col("text"))
        .unionByName(full).unionByName(partial)
      TextOps.contaminationScore(corpus, "doc_id", "text",
          bench, "text", n = 3, maxPpm = 100000L)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- curation: mixed-language detection — paragraph-level langId
    //      consistency (the CCNet-style filter; boilerplate in one
    //      language glued to content in another is the classic doc a
    //      whole-doc language ID misses). The corpus is single-paragraph,
    //      so two plants bind: a German paragraph appended to every 6th
    //      doc (mixed unless the base already IDs as de) and a 3-para
    //      majority plant on every 8th (base, base, German — major_ppm
    //      binds the integral DIV at 666666).
    "q_lang_mixed" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").as("id"), col("text"))
      val p2 = d.filter(col("id") % 6 === 0)
        .select((col("id") + 300000).as("id"),
          concat(col("text"), lit("\n\nman sagt es ist und nicht mit der zeit")).as("text"))
      val p3 = d.filter(col("id") % 8 === 0)
        .select((col("id") + 400000).as("id"),
          concat(col("text"), lit("\n\n"), col("text"),
            lit("\n\nman sagt es ist und nicht mit der zeit")).as("text"))
      TextOps.langConsistency(d.unionByName(p2).unionByName(p3), "id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- tokenizer prep: BPE merge-pair statistics — adjacent char
    //      pairs over the DISTINCT vocabulary weighted by tf, top-20
    //      merge candidates (k < #distinct pairs so the cut binds; ties
    //      by pair ascending through the shared selector). Fully
    //      independent SQL oracle.
    "q_bpe_pairs" -> ((s, dir) =>
      TextOps.bpePairStats(t(s, dir, "documents"), "doc_id", "text", k = 20L)
        .orderBy("pair")),

    // ---- tokenizer prep: multi-round BPE merge TRAINING — the real
    //      iterative loop (count → argmax → greedy apply → recount), 4
    //      rounds over the corpus vocabulary plus ONE planted document of
    //      200 000 'qqq' tokens. The plant forces round 1's merge to be
    //      (q, q) with OVERLAPPING occurrences, so the symbols_after
    //      column (total corpus symbols after each greedy apply) proves
    //      both engines merge "qqq" exactly once per token — left-to-right
    //      non-overlapping — not pair_count times. Oracle: a 4-round
    //      DuckDB CTE ladder re-deriving vocab, the ␟-delimited symbol
    //      representation, pair counts, the (cnt DESC, lhs, rhs) argmax
    //      and the replace()-based apply, fully independently.
    "q_bpe_train" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").as("id"), col("text"))
      val plant = d.limit(1).select(lit(900001L).as("id"),
        expr("repeat('qqq ', 200000)").as("text"))
      TextOps.bpeTrain(d.unionByName(plant), "id", "text", rounds = 4)
        .orderBy("round")
    }),

    // ---- tokenizer prep: BPE ENCODE with the trained merges — the
    //      train→apply composition: bpeTrain's 4-round merge table
    //      (collected O(k) driver state) segments the corpus vocabulary
    //      through one map-only chain of literal replaces in merge-
    //      priority order. The oracle derives the SAME merges via the
    //      training CTE ladder and applies the identical nested-replace
    //      chain — so a drift in EITHER the training argmax or the greedy
    //      apply breaks the row hash.
    "q_bpe_encode" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").as("id"), col("text"))
      val plant = d.limit(1).select(lit(900001L).as("id"),
        expr("repeat('qqq ', 200000)").as("text"))
      val aug = d.unionByName(plant)
      val merges = TextOps.bpeTrain(aug, "id", "text", rounds = 4)
        .orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextOps.bpeEncode(aug, "id", "text", merges).orderBy("token")
    }),

    // ---- curation: encoding-damage (mojibake) gate — replacement
    //      chars, C1 controls, UTF-8-as-Latin-1 digraphs, one integral
    //      count per damage class. Plants (built identically in both
    //      engines via chr()): a Ã©-digraph variant (every 10th), a
    //      U+FFFD variant (every 15th), a C1-NEL variant (every 12th);
    //      the natural corpus is clean, so the gate binds both ways.
    "q_mojibake_gate" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").as("id"), col("text"))
      def plant(mod: Int, off: Long, suffix: String) =
        d.filter(col("id") % mod === 0)
          .select((col("id") + off).as("id"),
            concat(col("text"), lit(suffix)).as("text"))
      val aug = d
        .unionByName(plant(10, 300000L, " caf\u00C3\u00A9 it\u00E2\u20AC\u2122s"))
        .unionByName(plant(15, 400000L, " lost\uFFFDchar"))
        .unionByName(plant(12, 500000L, " nel\u0085break"))
      TextOps.encodingDamage(aug, "id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- curation: the full Gopher/MassiveWeb rule gate, one boolean
    //      per rule (auditable). The corpus is single-line 10-99-word
    //      docs, so ok_word_count and ok_stopwords bind naturally (half
    //      the corpus is under 50 words; non-English docs lack the
    //      stopword list) and three plants bind the line-shaped rules:
    //      bullet spam (every 9th — fails bullet + dup-line rules),
    //      digit salad (every 11th — fails alpha + stopwords),
    //      ellipsis spam (every 13th — fails ellipsis-line + symbol +
    //      dup-line rules), clean prose (every 7th — passes ALL rules,
    //      binding keep=true: the NATURAL corpus is keyword soup that
    //      the stopword rule correctly rejects, exactly the doc class
    //      Gopher's rule targets), and paragraph spam (every 17th —
    //      fails the dup-paragraph rules). Fully independent SQL
    //      oracle: every rule is an integer cross-multiplication
    //      re-derived from the rebuilt corpus.
    "q_gopher_gate" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").as("id"), col("text"))
      def plant(mod: Int, off: Long, body: String, n: Int) =
        d.filter(col("id") % mod === 0)
          .select((col("id") + off).as("id"), repeat(lit(body), n).as("text"))
      val aug = d
        .unionByName(plant(9, 300000L, "- buy now great deal\n", 60))
        .unionByName(plant(11, 400000L, "1234 5678 9012 3456 ", 15))
        .unionByName(plant(13, 500000L, "and the story continues to be good...\n", 12))
        .unionByName(plant(7, 200000L,
          "the data of this page seems to be useful and that is why we have kept it with care ", 4))
        .unionByName(plant(17, 600000L, "good paragraph with the best of stories\n\n", 8))
      TextOps.gopherRules(aug, "id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- curation: DSIR-style hashed n-gram importance selection —
    //      target distribution = the English slice, raw = whole corpus;
    //      integral smoothed ratio weights over 4096 md5 buckets, doc
    //      score additive in ratio space (engine-exact surrogate for the
    //      log-ratio; see TextOps.dsirWeights). minAvgW=440000 BINDS:
    //      en medians sit ~450k, other languages ~434k, so both gate
    //      outcomes are populated in every language. Fully independent
    //      SQL oracle (tokens, bigrams, md5 buckets, add-one ratio,
    //      score and gate all re-derived).
    "q_dsir_select" -> ((s, dir) =>
      TextOps.dsirWeights(t(s, dir, "documents"), "doc_id", "text",
          targetPred = col("lang") === "en", minAvgW = 440000L)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // ---- training ops: compressibility gate (RedPajama-v2's
    //      quality-signal family). The live operator runs DeflateSize +
    //      byte count + ppm ratio + both gate bounds over the shared
    //      planted corpus (spam plant ~13k ppm binds the LOW bound, the
    //      base64 blob plant >10⁶ ppm binds the HIGH bound — corpus docs
    //      span ~386k-912k at sf0.01 — and the multibyte plant binds
    //      BYTE-vs-char counting); the oracle trusts ONLY the dumped
    //      independent-pass deflate scalar and re-derives n_bytes
    //      (strlen ≡ octet_length), the truncating-DIV ratio and the
    //      gate decision itself.
    "q_compression_gate" -> ((s, dir) =>
      TextOps.compressionGate(VerifyTables.compressionCorpus(s, dir),
          "id", "text", minPpm = 100000L, maxPpm = 950000L)
        .orderBy("id")),

    // ---- curation: the filter FUNNEL report — per ordered gate, docs
    //      entering / dropped / surviving, all cumulative-AND counts in
    //      ONE aggregate pass (the stage accounting C4/Gopher/RefinedWeb
    //      publish). Four gates chosen so every stage drops non-trivially
    //      on the synthetic corpus: word floor, lang=en, stopword
    //      presence, length cap. The oracle re-derives each cumulative
    //      sum independently, so a drift in ANY gate or in the funnel
    //      order breaks the row hash.
    "q_filter_funnel" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextOps.filterFunnel(d, Seq(
        "min_words" -> (TextOps.tokenCount(col("text")) >= 20L),
        "english" -> (col("lang") === "en"),
        "has_stopword" -> col("text").contains(" the "),
        "max_chars" -> (length(col("text")).cast("long") <= 400L)))
        .orderBy("stage")
    }),

    // ---- curation: boilerplate n-gram catalog — the top-K 8-grams
    //      shared by the most documents, the report strip rules are
    //      written from. Two planted footers (every 6th and every 10th
    //      doc) at different frequencies bind the ordering; within-doc
    //      repetition (the footer appended TWICE on every 30th doc) must
    //      still count once per doc — the map-side array_distinct bind.
    "q_boilerplate_catalog" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val f1 = " subscribe to our newsletter for updates and offers today"
      val f2 = " all rights reserved terms of service privacy policy applies"
      val aug = d.select(col("doc_id").as("id"),
        concat(col("text"),
          when(col("doc_id") % 6 === 0, lit(f1)).otherwise(lit("")),
          when(col("doc_id") % 30 === 0, lit(f1)).otherwise(lit("")),
          when(col("doc_id") % 10 === 0, lit(f2)).otherwise(lit(""))).as("text"))
      TextOps.boilerplateCatalog(aug, "id", "text", window = 8,
        minDocs = 3L, topK = 50)
    }),

    // ---- curation: token-distribution DRIFT between two crawl
    //      snapshots — snapshot B simulates a spam-farm takeover (every
    //      6th doc's text replaced by a crypto template), the shift a
    //      recurring crawl's monitoring job must catch before training.
    //      Per token with >=100 ppm mass on either side: tf and integral
    //      ppm both sides + delta. Both engines build the identical B;
    //      the oracle re-derives tokenization, totals, the DIV ppm math
    //      and the full-outer drift join independently.
    "q_token_drift" -> ((s, dir) => {
      val a = t(s, dir, "documents").select(col("text"))
      val b = t(s, dir, "documents").select(
        when(col("doc_id") % 6 === 0,
          lit("win free crypto now click here win free")).otherwise(col("text"))
          .as("text"))
      TextOps.tokenDrift(a, b, "text", minPpm = 100L).orderBy("token")
    }),

    // ---- W1: reading-order span enumeration (posexplode over parsed
    //      cells, from the dumped page table; bbox emitted as a JSON
    //      string). DuckDB replays the JSON explode + ordinality.
    "x_span_explode" -> ((s, dir) =>
      spanRows(s, dir)
        .select(col("url"), col("page_no"), col("reading_order"),
          col("cell.category").as("category"), to_json(col("cell.bbox")).as("bbox"))
        .orderBy("url", "page_no", "reading_order")),

    // ---- A4: per-category span histogram over real extraction output
    //      (cross-engine JSON parse + explode + aggregate)
    "q_category_histogram" -> ((s, dir) =>
      spanRows(s, dir)
        .groupBy(col("cell.category").as("category"))
        .agg(count(lit(1)).as("n"))
        .orderBy("category")),

    // ---- document outline (structure report): ordered Title /
    //      Section-header spans per document, the TOC a corpus-analysis
    //      job publishes. Per-doc collect is bounded by page count; only
    //      heading cells carry text through the shuffle.
    "q_doc_outline" -> ((s, dir) =>
      spanRows(s, dir)
        .filter(col("cell.category").isin("Title", "Section-header"))
        .groupBy(col("url"))
        .agg(count(lit(1)).as("n_headings"),
          array_join(transform(array_sort(collect_list(struct(
            col("page_no"), col("reading_order"),
            concat(col("cell.category"), lit(": "), col("cell.text")).as("h")))),
            x => x.getField("h")), " > ").as("outline"))
        .orderBy("url")),

    // ---- W3: cross-page paragraph merge over extraction pages
    "x_cross_page_merge" -> ((s, dir) => {
      val pages = vt(s, dir, "extract_pages").filter(col("url").contains("/pdf/"))
      graft.pipeline.PageMerge.mergeDocuments(pages).orderBy("url")
    }),

    // ---- C9: offline batch repair job + A5 report (report aggregates
    //      replayed by DuckDB over the dumped repair-case table)
    "x_repair_batch" -> ((s, dir) =>
      VerifyTables.repairInput(s, dir)
        .transform(RepairJob.repair).toDF().orderBy("case_id")),
    "x_repair_report" -> ((s, dir) => {
      import s.implicits._
      RepairJob.report(vt(s, dir, "repair_cases").as[RepairJob.Repaired])
    }),

    // ---- multimodal columns: feature extraction + frame sampling
    //      (oracled as a determinism replay: VerifyTables dumps the same
    //      kernel's output in a separate pass, DuckDB compares row-for-row)
    "x_media_features" -> ((s, dir) =>
      MultimodalOps.extractFeatures(
          MultimodalOps.syntheticMedia(s, VerifyTables.mediaDocs(dir)))
        .toDF().drop("feature").orderBy("media_id")),
    "x_frame_sample" -> ((s, dir) =>
      MultimodalOps.sampleFrames(
          MultimodalOps.syntheticMedia(s, VerifyTables.mediaDocs(dir)), everyMs = 1000L)
        .toDF().drop("frame_payload").orderBy("media_id", "frame_no")),

    // ---- quality gate (SQL-expressible → oracle)
    "q_quality_gate" -> ((s, dir) =>
      TextOps.qualityGate(t(s, dir, "documents"), "text")
        .groupBy("keep_doc").agg(count(lit(1)).as("n"))
        .orderBy("keep_doc")),

    // ---- the data-card report: per-language corpus summary (docs, gate
    //      survivors, exact-dup docs, token/char volume) — the table a
    //      curated release publishes. One groupBy over the gate features
    //      + a text-keyed copy count (the q_dedup_exact convention).
    "q_corpus_card" -> ((s, dir) => {
      val d = TextOps.qualityGate(t(s, dir, "documents"), "text")
      val copies = d.groupBy(col("text")).agg(count(lit(1)).as("__copies"))
      d.join(copies, Seq("text"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep_doc"), 1L).otherwise(0L)).as("n_gate_kept"),
          sum(when(col("__copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_chars_calc")).as("total_chars"))
        .orderBy("lang")
    }),

    // ---- BPE-ish subword counting (match-count formulation, RE2-safe →
    //      DuckDB replays the identical pattern)
    "q_subword_count" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id")),

    // ---- exact n-gram Jaccard verification of LSH candidates (shingle
    //      sets + signatures dumped; DuckDB replays candidates AND the
    //      set-intersection Jaccard)
    "q_ngram_verify" -> ((s, dir) => {
      val cands = DedupOps.minhashPairsFromSigs(vt(s, dir, "minhash_sigs"), 64, 16, 0.3)
        .select("id_a", "id_b")
      DedupOps.ngramJaccardFromShingles(vt(s, dir, "shingles"), cands)
        .select(col("id_a"), col("id_b"), round(col("jaccard") * 1000).cast("long").as("jaccard_x1000"))
        .orderBy("id_a", "id_b")
    }),

    // ---- scale layer: per-host stats with skew salting (hot host ≈ 30%);
    //      oracle = DuckDB's single-phase aggregate over the same parquet
    "x_host_stats" -> ((s, dir) =>
      graft.scale.HostStats.salted(vt(s, dir, "northrule")).orderBy("host")),

    // ---- scale layer: bucket-granular lineage computed relationally from
    //      the committed output (retry/speculation-safe — no driver-side
    //      accumulator funnel; see graft.scale.Lineage). Rows-only: the
    //      bucket key and checksum are xxhash64-based. The row-count
    //      TOTALS are oracled separately (q_lineage_totals).
    "x_lineage" -> ((s, dir) =>
      graft.scale.Lineage.fromOutput(vt(s, dir, "extract_docs"), nBuckets = 32)
        .orderBy("bucket")),

    // ---- lineage invariant the oracle CAN check: totals over the same
    //      dumped output (doc count, page sum, filtered/error counts)
    "q_lineage_totals" -> ((s, dir) =>
      graft.scale.Lineage.fromOutput(vt(s, dir, "extract_docs"), nBuckets = 32)
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_pages")).as("n_pages"),
          sum(col("n_filtered")).as("n_filtered"), sum(col("n_errors")).as("n_errors"))),

    // ---- P17 flexible JSON extraction over noisy model output: the live
    //      kernel recomputes every case; the oracle replays the dumped
    //      parse_flex_cases table (written by a separate JVM pass) — a
    //      determinism + schema check in the x_repair_batch style
    "x_parse_flex" -> ((s, dir) =>
      VerifyTables.parseFlexCases(s, dir).orderBy("case_id")),

    // ---- fixed-window chunking: long docs → 64-token training windows
    //      with 16-token overlap (small window so the synthetic docs
    //      genuinely multi-chunk); integral arithmetic → engine-exact
    "q_chunk_docs" -> ((s, dir) =>
      TextOps.chunkTokens(t(s, dir, "documents"), "doc_id", "text",
          maxTokens = 64, overlap = 16)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_no")),

    // ---- composed corpus pipeline (flagship composition check): the
    //      ops chain the way a real pretraining-prep job runs them —
    //      quality gate → PII redaction → exact dedup → token count —
    //      each stage the REAL operator, the whole chain replayed as one
    //      DuckDB CTE ladder. Deterministic augmentation: sentence
    //      punctuation + planted PII per doc (the raw synthetic docs have
    //      no sentence structure — the gate would drop everything), and a
    //      constant text every 50th doc so the dedup stage genuinely
    //      collapses a duplicate family.
    "q_corpus_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val aug = docs.select(col("doc_id"),
        when(col("doc_id") % 50 === 7,
            lit("Breaking news everyone. Contact editor@example.com now. The end."))
          .otherwise(concat(col("text"), lit(". Contact user"),
            col("doc_id").cast("string"), lit("@example.com now. The end.")))
          .as("text"))
      val gated = TextOps.qualityGate(aug, "text")
        .filter(col("keep_doc")).select("doc_id", "text")
      val red = TextOps.redactPii(gated, "text")
        .select(col("doc_id"), col("text_redacted").as("text"))
      val deduped = DedupOps.exactDedup(red, "doc_id", "text")
      deduped.select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          col("text").as("text_clean"))
        .orderBy("doc_id")
    }),

    // ---- exact-substring dedup family: repeated 20-token spans across
    //      docs. A fixed 25-token paragraph is appended to every 5th doc
    //      IN the query (shared constant — both engines build it), so
    //      those docs share exactly 6 fully-inside windows; windows
    //      straddling the doc/paragraph boundary stay unique per doc.
    "q_repeated_spans" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val aug = docs.select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" " + SpanPara)))
          .otherwise(col("text")).as("text"))
      DedupOps.repeatedSpanStats(aug, "doc_id", "text", window = 20)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- span surgery: the removal half of exact-substring dedup —
    //      same augmented corpus as q_repeated_spans; every token covered
    //      by a ≥2-occurrence window is cut and the doc re-joined
    "q_span_scrub" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val aug = docs.select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" " + SpanPara)))
          .otherwise(col("text")).as("text"))
      DedupOps.stripRepeatedSpans(aug, "doc_id", "text", window = 20)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- distinctive terms (integral TF-IDF family): per-doc top-3 by
    //      tf*1e6 DIV df — integer scoring so no libm ln crosses engines
    "q_tfidf_terms" -> ((s, dir) =>
      TextOps.distinctiveTerms(t(s, dir, "documents"), "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "rank")),

    // ---- CCNet-style line dedup: strip lines frequent across docs.
    //      The synthetic docs are single-line, so the query builds a
    //      deterministic multi-line corpus IN the query (same pattern as
    //      q_pii_redact): unique content prefix + universal cookie banner
    //      (case/padding variant every 3rd doc → exercises key
    //      normalization) + a 1-in-7 newsletter line (frequent → removed)
    //      + a 3-doc promo line (below minDocs=10 → kept) + a blank line
    //      on even docs (frequent → removed under the uniform rule).
    "q_line_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val aug = docs.select(col("doc_id"),
        array_join(filter(array(
          substring(col("text"), 1, 80),
          when(col("doc_id") % 3 === 0,
              lit("  COOKIE NOTICE: ACCEPT ALL COOKIES "))
            .otherwise(lit("cookie notice: accept all cookies")),
          when(col("doc_id") % 7 === 0, lit("subscribe to our newsletter")),
          when(col("doc_id") % 200 === 3, lit("limited promo: free shipping")),
          when(col("doc_id") % 2 === 0, lit(""))
        ), x => x.isNotNull), "\n").as("text"))
      TextOps.stripBoilerplateLines(aug, "doc_id", "text", minDocs = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- quality: C4-style line filter (Raffel et al. 2020 public
    //      rules) over the EXTRACTION OUTPUT's multi-line text — terminal
    //      punctuation, ≥5 words, no "javascript"; page flags returned.
    //      Pure HOF Column algebra, map-only; DuckDB replays verbatim
    "q_c4_filter" -> ((s, dir) =>
      TextOps.c4LineFilter(vt(s, dir, "extract_docs"), "url", "extracted_text")
        .withColumnRenamed("id", "url")
        .orderBy("url")),

    // ---- dedup: within-document duplicate-line collapse (Gopher-style
    //      intra-doc repetition removal) — first occurrence wins,
    //      order preserved; map-only array algebra
    "q_doc_line_dedup" -> ((s, dir) =>
      TextOps.dedupLinesWithinDoc(vt(s, dir, "extract_docs"), "url", "extracted_text")
        .withColumnRenamed("id", "url")
        .orderBy("url")),

    // ---- dedup: corpus-GLOBAL exact line dedup (C4/CCNet-style) — every
    //      exact line survives only at its first occurrence across the
    //      whole crawl (nav/footer boilerplate shared across pages
    //      collapses to one copy); line hashes shuffle, line text never
    "q_line_dedup_global" -> ((s, dir) =>
      TextOps.dedupLinesAcrossCorpus(vt(s, dir, "extract_docs"), "url", "extracted_text")
        .orderBy("url")),

    // ---- PII redaction: emails / IPv4 / phone numbers → typed
    //      placeholders. Deterministic PII is APPENDED to every document
    //      in the query itself (both engines build the same augmented
    //      text), so each row exercises all three patterns and the oracle
    //      compares the fully-redacted strings, not just zero-hit rows.
    "q_pii_redact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val aug = docs.select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or call +1 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit("-99 from 10.0."), (col("doc_id") % 256).cast("string"),
          lit(".7 today")).as("text"))
      TextOps.redactPii(aug, "text")
        .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
          col("text_redacted"))
        .orderBy("doc_id")
    }),

    // ---- compliance: per-host PII AUDIT — the report a release review
    //      reads before shipping a corpus (which hosts leak what, at what
    //      rate) and the regression monitor for the redaction pass
    //      itself. PII planted at class-distinct rates (emails on every
    //      7th doc, IPs every 11th, phones every 13th — rates differ so
    //      a class-swap bug breaks the hash); redactPii does the
    //      counting map-only, one host aggregate on integral counts.
    "q_pii_audit" -> ((s, dir) => {
      val base = vt(s, dir, "northrule").select(col("url"), col("text"))
      val n = regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long")
      val aug = base.select(col("url"),
        concat(col("text"),
          when(n % 7 === 0, concat(lit(" contact u"), n, lit("@example.org")))
            .otherwise(lit("")),
          when(n % 11 === 0, concat(lit(" from 10.1."), n % 256, lit(".9")))
            .otherwise(lit("")),
          when(n % 13 === 0, concat(lit(" call +44 7700 900"),
            lpad((n % 1000).cast("string"), 3, "0"))).otherwise(lit("")))
          .as("text"))
      TextOps.redactPii(aug, "text")
        .groupBy(LinkOps.hostOf(col("url")).as("host"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_emails") + col("n_ips") + col("n_phones") > 0, 1L)
            .otherwise(0L)).as("n_docs_with_pii"),
          sum(col("n_emails")).as("n_emails"),
          sum(col("n_ips")).as("n_ips"),
          sum(col("n_phones")).as("n_phones"))
        .orderBy("host")
    }),

    // ---- URL canonicalization for crawl dedup: deterministic noisy
    //      variants (fragments, utm params, case-folded scheme/host,
    //      trailing slash) built from the north-rule urls IN the query —
    //      both engines construct and canonicalize identically (RE2-safe
    //      regex chain).
    "q_url_canon" -> ((s, dir) => {
      val base = vt(s, dir, "northrule").select(col("url"))
      val noisy = base.select(col("url"),
        when(pmod(length(col("url")), lit(4)) === 0,
            concat(col("url"), lit("?utm_source=feed&utm_campaign=x")))
          .when(pmod(length(col("url")), lit(4)) === 1,
            concat(upper(substring(col("url"), 1, 8)), substring(col("url"), 9, 100000)))
          .when(pmod(length(col("url")), lit(4)) === 2,
            concat(col("url"), lit("/#section-2")))
          .otherwise(concat(col("url"), lit("?a=1&utm_x=2&b=3")))
          .as("noisy"))
      noisy.select(col("url"), col("noisy"),
          TextOps.canonicalUrl(col("noisy")).as("canon"))
        .withColumn("roundtrips",
          TextOps.canonicalUrl(col("url")) === col("canon"))
        .orderBy("url")
    }),

    // ---- repetition quality signals (duplicate-line/token fractions,
    //      Gopher/RefinedWeb-style filters), integral so engine-exact
    "q_repetition" -> ((s, dir) =>
      TextOps.repetitionFeatures(
        t(s, dir, "documents").select("doc_id", "text"), "text")
        .drop("text").orderBy("doc_id")),

    // ---- sequence packing: fixed-token-budget training rows, per-shard
    //      greedy cut (close-when-exceeded); per-pack summary is the
    //      loader-facing relation. Fully engine-replayable (id-mod
    //      sharding, whitespace token counts, window cumsum).
    "q_seq_pack" -> ((s, dir) =>
      TextOps.packSummary(
        TextOps.packSequences(t(s, dir, "documents"), "doc_id", "text",
          tokenBudget = 2048L, nShards = 8))
        .orderBy("shard", "pack_id")),

    // ---- stratified quota sampling (pretraining mix curation): exactly
    //      ceil(frac·n) docs per language, deterministic multiplicative-
    //      permutation order — replayable in DuckDB with the same BIGINT
    //      arithmetic.
    "q_stratified_sample" -> ((s, dir) =>
      TextOps.stratifiedSample(
        t(s, dir, "documents").select("doc_id", "lang"), "doc_id", "lang", frac = 0.25)
        .orderBy("doc_id")),

    // ---- top-heavy-host mitigation: at most 40 docs per host (the
    //      corpus's hot host holds ~30% of urls — a real crawl's head
    //      domain is the same shape), deterministic permutation order;
    //      same bounded-histogram selector, no per-host sort anywhere
    "q_host_cap" -> ((s, dir) => {
      val d = vt(s, dir, "northrule")
        .select(col("url"),
          regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long").as("id"),
          LinkOps.hostOf(col("url")).as("host"))
      TextOps.capPerStratum(d, "id", "host", cap = 40L)
        .select("url", "host").orderBy("url")
    }),

    // ---- archive storage: content-defined chunking (FastCDC-style gear
    //      hash). The live chunk table's every row is CONTENT-VERIFIED by
    //      the oracle — DuckDB recomputes md5(substring(hex(html),
    //      2·offset+1, 2·len)) from the ORIGINAL parquet at the
    //      independently-dumped offsets, so boundaries and hashes are
    //      both checked against the raw bytes, never trusted.
    "q_cdc_chunks" -> ((s, dir) =>
      DedupOps.chunkTable(vt(s, dir, "northrule"), "url", "html")
        .orderBy("id", "chunk_no")),

    // ---- the chunk-store dedup report (total vs distinct chunks/bytes)
    "q_cdc_stats" -> ((s, dir) =>
      DedupOps.chunkDedupStats(
        DedupOps.chunkTable(vt(s, dir, "northrule"), "url", "html"))),

    // ---- incremental archive delta: chunks of the planted recrawl
    //      (marker inserted at each edited doc's byte midpoint — every
    //      later offset shifts) that exist nowhere in the base snapshot:
    //      exactly the bytes a chunk-addressed store must ADD. The
    //      oracle replays the anti-join from the two dumps AND
    //      content-verifies each delta chunk against the edited payload
    //      it reconstructs by hex surgery. CDC's point is visible here:
    //      the delta is a handful of chunks per edited doc, not its
    //      whole shifted tail.
    "q_cdc_delta" -> ((s, dir) =>
      DedupOps.chunkDelta(
          DedupOps.chunkTable(vt(s, dir, "northrule"), "url", "html"),
          DedupOps.chunkTable(VerifyTables.cdcRecrawlB(s, dir), "url", "html"))
        .orderBy("id", "chunk_no")),

    // ---- bitext candidate mining: translation-pair edges + the real
    //      corpus's per-doc languages and sidecar texts through the
    //      division-free length-ratio gate. Edges here are synthesized
    //      replayably (docid n % 5 == 0 → docid n+1 — both engines
    //      construct the identical edge set from the parquet), standing
    //      in for extractAlternates/hreflangClusters output so the
    //      RELATIONAL core (normalization, lang-differ, ratio gate) is
    //      what the oracle checks; the hreflang harvest itself is
    //      oracled separately (q_hreflang_clusters).
    "q_bitext_candidates" -> ((s, dir) => {
      val n = regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long")
      val docs = vt(s, dir, "northrule")
        .select(col("url"), n.as("id"), col("lang"), col("text"))
      val edges = docs.filter(col("id") % 5 === 0)
        .select(col("url"), (col("id") + 1L).as("__tid"))
        .join(docs.select(col("url").as("alt_url"), col("id").as("__tid")),
          Seq("__tid"))
        .select("url", "alt_url")
      LinkOps.bitextCandidates(docs, edges).orderBy("url_a", "url_b")
    }),

    // ---- crawl politeness: per-host Crawl-delay (group-scoped robots
    //      extension field, agent-scoping per RFC 9309's most-specific
    //      rule) → integer fetch budgets (windowSec DIV delay) → the
    //      variable-cap bounded-histogram selector. The oracle replays
    //      the budget join + per-host cap from the independently-dumped
    //      robots_delays table with the same integral sampleOrd
    //      row_number as q_host_cap. Scale: budgets are map-only over a
    //      hosts-sized relation; the cap selection never sorts a host's
    //      documents.
    "q_polite_frontier" -> ((s, dir) => {
      import s.implicits._
      val d = vt(s, dir, "northrule")
        .select(col("url"),
          regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long").as("id"),
          LinkOps.hostOf(col("url")).as("host"))
      val robots = d.select(col("host")).distinct().as[String]
        .map(h => (h, VerifyTables.plantedRobotsTxt(h))).toDF("host", "body")
      val budgets = LinkOps.hostFetchBudgets(robots,
        windowSec = 600L, defaultDelaySec = 5L)
      LinkOps.politeFrontier(d, budgets, idCol = "id")
        .join(budgets, Seq("host"))
        .select("url", "host", "crawl_delay_sec", "max_fetches")
        .orderBy("url")
    }),

    // ---- search: inverted-index BUILD as a persisted partitioned
    //      artifact (the text-retrieval analog of q_band_index_build) —
    //      distinct per-doc tokens, df guard at BUILD time (binds at the
    //      driver tier: the corpus's hottest tokens exceed 395 of 500
    //      docs), md5-prefix bucket as the replayable partition key;
    //      per-bucket stats read back from the WRITTEN files.
    "q_inverted_index_build" -> ((s, dir) => {
      val idxDir = s"/tmp/graft_inv_index_${java.nio.file.Paths.get(dir).getFileName}"
      TextOps.invertedIndexPostings(t(s, dir, "documents"), "doc_id", "text",
          maxDf = 395L, nBuckets = 16)
        .write.mode("overwrite").partitionBy("bucket").parquet(idxDir)
      s.read.parquet(idxDir)
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_postings"),
          countDistinct(col("token")).as("n_tokens"))
        .orderBy("bucket")
    }),

    // ---- search: conjunctive term lookup against the persisted index —
    //      driver-side O(#terms) bucket computation becomes a STATIC
    //      partition filter (the IVF probed-list discipline), then
    //      posting intersection by per-id distinct-term count
    "q_index_search" -> ((s, dir) => {
      val idxDir = s"/tmp/graft_inv_index_${java.nio.file.Paths.get(dir).getFileName}"
      TextOps.invertedIndexPostings(t(s, dir, "documents"), "doc_id", "text",
          maxDf = 395L, nBuckets = 16)
        .write.mode("overwrite").partitionBy("bucket").parquet(idxDir)
      TextOps.searchIndex(s.read.parquet(idxDir), Seq("data", "key"),
          nBuckets = 16)
        .orderBy("id")
    }),

    // ---- search: ranked (OR) retrieval — integral tf·idf over the
    //      pruned postings (score = Σ tf · (10^6 DIV df)), top-10 via the
    //      single-stratum bounded selector so a popular query never
    //      sorts its posting union in one task. k binds (hundreds of
    //      docs match at the driver tier).
    "q_ranked_search" -> ((s, dir) => {
      val idxDir = s"/tmp/graft_inv_index_${java.nio.file.Paths.get(dir).getFileName}"
      TextOps.invertedIndexPostings(t(s, dir, "documents"), "doc_id", "text",
          maxDf = 395L, nBuckets = 16)
        .write.mode("overwrite").partitionBy("bucket").parquet(idxDir)
      TextOps.rankedSearch(s.read.parquet(idxDir), Seq("data", "key", "dup"),
          k = 10L, nBuckets = 16)
        .orderBy("id")
    }),

    // ---- tokenizer prep: corpus vocabulary stats (token, tf, df) with
    //      the hapax tail pruned. One (token, id, count) shuffle with
    //      map-side combine; df is a second-level agg over the
    //      already-distinct pairs, never a countDistinct over raw
    //      occurrences. Fully independent SQL oracle.
    "q_vocab_stats" -> ((s, dir) =>
      TextOps.vocabStats(t(s, dir, "documents"), "doc_id", "text", minDf = 2L)
        .orderBy("token")),

    // ---- vocabulary cut: top-10 tokens by frequency (k < the corpus vocabulary, so the cut and its tie-break BIND) (ties by token) —
    //      the single-stratum bounded-histogram selector, so a
    //      billion-entry vocabulary never sorts in one task
    "q_top_vocab" -> ((s, dir) =>
      TextOps.topVocab(
          TextOps.vocabStats(t(s, dir, "documents"), "doc_id", "text"), k = 10L)
        .orderBy("token")),

    // ---- clustering: distributed integral k-means (Lloyd) over the
    //      embedding corpus — engine-exact (quantize once, integer
    //      distance/update arithmetic), replayed in DuckDB as the same
    //      iteration ladder; the clustering stage behind cluster-balanced
    //      curation / SemDeDup-style semantic dedup
    "q_kmeans" -> ((s, dir) =>
      SimilarityOps.kmeansLloyd(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 4, iters = 2)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")),

    // ---- composed curation: cluster-balanced sampling — k-means labels
    //      feed the stratified quota selector (exactly ceil(0.25·n_c) per
    //      cluster, deterministic permutation order): the SemDeDup-style
    //      "cluster then thin each cluster" stage as ONE job
    "q_cluster_sample" -> ((s, dir) => {
      val labels = SimilarityOps.kmeansLloyd(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 4, iters = 2)
      TextOps.stratifiedSample(labels, "id", "cluster", frac = 0.25)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    }),

    // ---- composed curation: SemDeDup — k-means clusters scope EXACT
    //      cosine pairing (no LSH), CC over ≥0.95 pairs, keep-one. The
    //      planted corpus both engines rebuild identically: exact copies
    //      of every 7th vec (cos exactly 1e6), second copies of every
    //      21st (transitivity: triangle components), and a dim0+0.25
    //      perturbed copy of every 11th (cos ~968k-975k on this
    //      unit-norm corpus — binds the non-identical near-dup branch;
    //      natural max pairwise cosine is ~513k, so margins to the
    //      950000 threshold exceed 18k ppm on every side). The oracle
    //      replays the kmeans ladder (shared CTE, src=aug), the
    //      within-cluster pairing, the 1e-6-grain cosine and the
    //      recursive-CTE reachability, all independently.
    "q_semdedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
      def cp(mod: Int, off: Long, perturb: Boolean) = {
        val base = emb.filter(col("vec_id") % mod === 0)
        val vec =
          if (!perturb) transform(col("embedding"), x => x.cast("double"))
          else concat(
            array(element_at(col("embedding"), 1).cast("double") + 0.25),
            transform(slice(col("embedding"), 2, 63), x => x.cast("double")))
        base.select((col("vec_id") + off).as("vec_id"), vec.as("embedding"))
      }
      val aug = emb
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
        .unionByName(cp(7, 100000L, perturb = false))
        .unionByName(cp(21, 200000L, perturb = false))
        .unionByName(cp(11, 300000L, perturb = true))
      SimilarityOps.semDedup(aug, "vec_id", "embedding",
          k = 4, iters = 2, threshold = 0.95)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    }),

    // ---- corpus distribution report: exact token-count percentiles via
    //      the bounded value histogram — no corpus-sized sort anywhere
    //      (integral percentile_disc: smallest v with cum·100 ≥ pct·n)
    "q_length_quantiles" -> ((s, dir) =>
      TextOps.exactQuantiles(t(s, dir, "documents"),
        TextOps.tokenCount(col("text")))
        .orderBy("pct")),

    // ---- curation: percentile-CALIBRATED gate — cutoffs computed from
    //      the corpus itself (p10/p90 of char length via the histogram
    //      quantile path), then applied map-only; the oracle re-derives
    //      the quantiles DEFINITIONALLY with a single global window (the
    //      house bit-identity convention for the two-phase decomposition)
    //      and replays the inclusive gate
    "q_calibrated_gate" -> ((s, dir) =>
      TextOps.calibratedGate(t(s, dir, "documents").
          select(col("doc_id"), col("text")),
        "doc_id", length(col("text")), lowPct = 10, highPct = 90)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // ---- deterministic train/val/test carve-out: ppm split labels from
    //      the shared multiplicative permutation (map-only CASE chain;
    //      same BIGINT arithmetic replayed in DuckDB)
    "q_split_assign" -> ((s, dir) =>
      TextOps.assignSplit(
        t(s, dir, "documents").select("doc_id"), "doc_id",
        Seq("train" -> 980000L, "val" -> 10000L, "test" -> 10000L))
        .orderBy("doc_id")),

    // ---- benchmark decontamination: corpus docs sharing any token 3-gram
    //      with the (deterministic) held-out "benchmark" slice — broadcast
    //      semi-join plan, zero corpus shuffles
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextOps.decontaminate(
          docs.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
          docs.filter(col("doc_id") % 97 === 0), "text", n = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- streaming dedup-on-arrival, exercised in batch mode (same
    //      flatMapGroupsWithState operator, trivial state): first-seen
    //      survivor per content identity = min (warc_ts, url) per text.
    //      DuckDB replays via row_number over PARTITION BY text (the
    //      xxhash64 grouping key is content identity minus collisions).
    //      Checkpointed cross-batch state is covered by StreamingDedupSpec.
    "q_stream_dedup" -> ((s, dir) =>
      graft.streaming.StreamingDedup.dedupStream(vt(s, dir, "northrule")).toDF()
        .select(col("url"), col("warc_ts"), col("lang"))
        .orderBy("url")),

    // ---- streaming host fetch-rate monitor, exercised in batch mode
    //      (same windowed-aggregation transform; the watermark is a
    //      batch no-op so ALL windows emit, which is exactly what the
    //      SQL replay computes). Tumbling 1-hour event-time windows per
    //      host: fetch count + payload bytes. Watermark lateness + the
    //      emit-once Append contract are covered by StreamingHostRateSpec.
    "q_host_fetch_rate" -> ((s, dir) =>
      graft.streaming.StreamingHostRate.hostRate(vt(s, dir, "northrule"))
        .orderBy("host", "window_start")),

    // ---- sketch: HyperLogLog distinct-visitor estimate per event type —
    //      the cardinality question ("distinct users/urls per group")
    //      answered with 2^p registers instead of a full-key shuffle.
    //      Engine-exact: md5-prefix hash, bin()-length rank, fixed-point
    //      alpha correction — DuckDB replays registers AND estimate
    //      bit-for-bit; accuracy-vs-exact is pinned in SketchSpec.
    "q_hll_distinct" -> ((s, dir) =>
      SketchOps.hllDistinct(
          t(s, dir, "events").withColumn("__k", col("user_id").cast("string")),
          "__k", Seq("event_type"), p = 10)
        .orderBy("event_type")),

    // ---- sketch: count-min heavy hitters — corpus token frequencies
    //      summarized into a fixed d=4 x w=4096 cell table (mergeable,
    //      map-side combined), probed by a deterministic candidate slice
    //      (every-97th doc's vocabulary); est = min over rows, the
    //      classic never-under-counts bound. Threshold 500 BINDS at
    //      sf0.01: stopwords clear it, content words don't.
    "q_cms_heavy" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      SketchOps.cmsHeavy(d, "text",
          d.filter(col("doc_id") % 97 === 0)
            .select(explode(TextOps.tokens(col("text"))).as("token")),
          "token", minCount = 500L)
        .orderBy("token")
    }),

    // ---- training: distributed batch-perceptron fit of the hashed-BoW
    //      quality classifier (en vs non-en as the wiki-vs-random stand-in)
    //      — 2 rounds, each one broadcast join + two integral aggs; the
    //      DuckDB oracle replays the full ladder (round 1 = class-
    //      conditional token mass, round 2 = misclassified-set correction)
    //      from raw text with no dumps.
    "q_perceptron_train" -> ((s, dir) =>
      TextOps.perceptronTrain(t(s, dir, "documents"), "doc_id", "text",
          when(col("lang") === "en", 1L).otherwise(-1L), nFeatures = 64, rounds = 2)
        .orderBy("f")),

    // ---- ranking: the Log2Fp expression pinned DIRECTLY cross-engine on
    //      500 values spanning 1 .. 2^48 (the bm25 oracle only exercises
    //      it on a handful of idf inputs; this pins the whole ladder —
    //      normalization branch both ways, every magnitude)
    "q_log2_fp" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"),
          expr("(CAST(doc_id AS BIGINT) + 1) * shiftleft(1L, CAST(doc_id % 40 AS INT))")
            .as("n"))
        .withColumn("log2fp", graft.functions.Log2Fp(col("n")))
        .orderBy("doc_id")),

    // ---- ranking: BM25 top-k for a fixed topic term bag — idf through
    //      the exact fixed-point log, tf saturation + length norm in ppm;
    //      DuckDB re-derives N/avgdl/df/idf (unrolled log ladder) and
    //      every score from raw text. Terms chosen with distinct corpus
    //      df so idf actually differentiates.
    "q_bm25_rank" -> ((s, dir) =>
      RankOps.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
          bm25Terms, k = 25)
        .withColumnRenamed("id", "doc_id")),

    // ---- quality: per-doc token-distribution Shannon entropy (Q20 bits)
    //      — the diversity/gibberish axis; every value replayed bit-for-
    //      bit through ONE unrolled log ladder over the (doc, token,
    //      count) relation plus the per-doc length rows.
    "q_token_entropy" -> ((s, dir) =>
      TextOps.tokenEntropy(t(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // ---- monitoring: smoothed KL divergence between two snapshots'
    //      token distributions in ppm-bits — the ONE-number drift alarm
    //      (q_token_drift is the per-token drill-down); same A/B
    //      construction as q_token_drift so the two views reconcile.
    //      NOTE on division: Spark DIV and DuckDB // both truncate
    //      toward zero (verified), so the signed per-token contributions
    //      replay exactly.
    "q_kl_drift" -> ((s, dir) => {
      val a = t(s, dir, "documents").select(col("text"))
      val b = t(s, dir, "documents").select(
        when(col("doc_id") % 6 === 0,
          lit("win free crypto now click here win free")).otherwise(col("text"))
          .as("text"))
      TextOps.tokenKlDrift(a, b, "text")
    }),

    // ---- exploration: TF-IDF top-3 keywords per document — per-doc
    //      top-k through the bounded-histogram quota selector (no
    //      per-doc sort), idf through the exact log; the oracle replays
    //      the selection contract as a row_number ladder.
    "q_tfidf_keywords" -> ((s, dir) =>
      RankOps.tfidfKeywords(t(s, dir, "documents"), "doc_id", "text", k = 3L)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "token")),

    // ---- exploration: PMI collocation mining — top-50 adjacent-bigram
    //      collocations (minCount 3) by the five-log signed Q20 expansion;
    //      the oracle replays bigram/unigram counts, all five ladders and
    //      the (pmi desc, x, y) top-k from raw text.
    "q_pmi_collocations" -> ((s, dir) =>
      RankOps.pmiCollocations(t(s, dir, "documents"), "text",
        minCount = 3L, k = 50))
  )

  /** Query-term bag for q_bm25_rank — shared by the Spark query and the
    * DuckDB oracle so the literal lists cannot drift (a def: the oracle
    * map interpolates it during object init, before a later val would
    * have been assigned). */
  private def bm25Terms: Seq[String] = Seq("customer", "vector", "spark", "window")

  /** End-to-end variants. The q_minhash_pairs / q_simhash_pairs queries
    * read pre-materialized signature tables (so DuckDB can replay the band
    * join); these variants compute the FULL operator — tokenize →
    * signatures → band join — which is what the throughput bench must
    * time. Since r4 they are ALSO registered with the correctness driver:
    * the in-flight signatures are byte-identical to the dumped sig tables
    * (same deterministic function), so the *_pairs replay SQL oracles the
    * e2e results too, and the IVF build/query split replays from the
    * dumped codebook. */
  private val ivfCodebookCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Int, Array[Double])]]()

  private def ivfIndexDirFor(dir: String): String =
    s"/tmp/graft_ivf_index_${java.nio.file.Paths.get(dir).getFileName}"

  val benchExtras: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q_web_pipeline's foil: the SAME composed output via the per-op
    //      entry points (3 DOM parses per HTML payload) — bench-only, to
    //      measure what the fused single-parse pass saves
    "q_web_pipeline_separate" -> ((s, dir) => {
      val input = vt(s, dir, "northrule").unionByName(plantedRobotsDocs(s))
      graft.pipeline.WebPipeline.runSeparate(input)
        .select(col("url"), col("n_pages"), col("md"), col("extracted_text"),
          size(col("links")).cast("long").as("n_links"),
          size(col("anchors")).cast("long").as("n_anchors"),
          aggregate(col("anchors"), lit(0L),
            (a, x) => a + length(x.getField("anchor")).cast("long")).as("n_anchor_chars"),
          size(col("robots")).cast("long").as("n_robots"),
          exists(col("robots"), t => t === "noindex" || t === "none").as("noindex"))
        .orderBy("url")
    }),
    "q_minhash_e2e" -> ((s, dir) =>
      DedupOps.minhashDupPairs(t(s, dir, "documents"), "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.5)
        .select(col("id_a"), col("id_b"))),
    "q_simhash_e2e" -> ((s, dir) =>
      DedupOps.simhashDupPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)),
    // ---- IVF the way production ANN runs it: index built ONCE (its cost
    //      amortizes over every subsequent query batch), query batches
    //      against the prebuilt partitioned index. q_ann_ivf above times
    //      the one-shot build+query path; the pair below separates the
    //      two phases so the steady-state query cost is visible next to
    //      q_ann_topk (which must rescan the whole corpus per batch).
    "q_ann_ivf_build" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val idxDir = ivfIndexDirFor(dir)
      val cents = SimilarityOps.buildIvfIndex(embs, "vec_id", "embedding", idxDir, nlist = 16)
      ivfCodebookCache.put(idxDir, cents)
      // (list_idx, neighbor_id) membership — the oracle replays the
      // nearest-centroid assignment from the dumped codebook
      s.read.parquet(idxDir)
        .select(col("list_idx").cast("int").as("list_idx"), col("neighbor_id"))
    }),
    "q_ann_ivf_query" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val queries = embs.filter(col("vec_id") < 256)
      val idxDir = ivfIndexDirFor(dir)
      val cents = Option(ivfCodebookCache.get(idxDir)).getOrElse {
        val c = SimilarityOps.buildIvfIndex(embs, "vec_id", "embedding", idxDir, nlist = 16)
        ivfCodebookCache.put(idxDir, c); c
      }
      SimilarityOps.queryIvfIndex(s, idxDir, cents, queries, "vec_id", "embedding",
        k = 5, nprobe = 4)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }))

  /** DuckDB equivalents. Bare table names resolve to
    * `<sfDir>/<name>.parquet` on the driver side; materialized side tables
    * (kernel outputs, signatures) are referenced by absolute
    * `read_parquet` globs under VerifyTables' content-keyed root —
    * Verify.main materializes them in the same invocation that dumps this
    * map, so the driver's DuckDB replay reads exactly what Spark read. */
  /** Shared oracle for q_web_pipeline and its separate-pass foil: the
    * per-op dumps reassembled + planted-robots literals. */
  private lazy val webPipelineOracle: String =
    s"""WITH d AS (SELECT url, n_pages, md, extracted_text
           |  FROM read_parquet('${VerifyTables.oracleGlob("extract_docs")}')),
           |l AS (SELECT src, CAST(count(*) AS BIGINT) AS n_links
           |  FROM read_parquet('${VerifyTables.oracleGlob("links")}') GROUP BY src),
           |a AS (SELECT src, CAST(count(*) AS BIGINT) AS n_anchors,
           |  CAST(sum(length(anchor)) AS BIGINT) AS n_anchor_chars
           |  FROM read_parquet('${VerifyTables.oracleGlob("anchors")}') GROUP BY src),
           |realrows AS (SELECT d.url, d.n_pages, d.md, d.extracted_text,
           |  coalesce(l.n_links, 0) AS n_links,
           |  coalesce(a.n_anchors, 0) AS n_anchors,
           |  coalesce(a.n_anchor_chars, 0) AS n_anchor_chars,
           |  CAST(0 AS BIGINT) AS n_robots, false AS noindex
           |  FROM d LEFT JOIN l ON l.src = d.url LEFT JOIN a ON a.src = d.url),
           |planted AS (SELECT * FROM (VALUES
           |  ('https://planted.example/robots/a', CAST(1 AS BIGINT),
           |   'Planted alpha paragraph.', 'Planted alpha paragraph.',
           |   CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
           |   CAST(2 AS BIGINT), true),
           |  ('https://planted.example/robots/b', CAST(1 AS BIGINT),
           |   'Planted beta paragraph.', 'Planted beta paragraph.',
           |   CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
           |   CAST(1 AS BIGINT), false),
           |  ('https://planted.example/robots/c', CAST(1 AS BIGINT),
           |   'Planted gamma paragraph.', 'Planted gamma paragraph.',
           |   CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
           |   CAST(1 AS BIGINT), true))
           |  AS v(url, n_pages, md, extracted_text, n_links, n_anchors,
           |       n_anchor_chars, n_robots, noindex))
           |SELECT * FROM realrows UNION ALL SELECT * FROM planted
           |ORDER BY url""".stripMargin

  def oracles: Map[String, String] = staticOracles ++ materializedOracles

  /** The q_bpe_train oracle: one (pairs → argmax → apply → symbol-count)
    * CTE block per round, chained v0 → v1 → … — DuckDB's analog of the
    * Spark driver loop, derived from the documents table + the same
    * planted 'qqq' doc with no dumps. chr(31) = the U+001F symbol
    * separator (single at string ends, DOUBLE at symbol junctions, so
    * one literal replace() is exactly BPE's greedy left-to-right pass —
    * see TextOps.bpeTrain). */
  private def bpeLadderCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS (SELECT (u).lhs AS lhs, (u).rhs AS rhs,
         |    CAST(sum(tf) AS BIGINT) AS cnt FROM (
         |  SELECT tf, unnest(list_transform(range(1, len(syms)),
         |      i -> {'lhs': syms[i], 'rhs': syms[i+1]})) AS u
         |  FROM (SELECT tf, str_split(substring(seq, 2, length(seq)-2),
         |          chr(31)||chr(31)) AS syms FROM v${r - 1}))
         |  GROUP BY 1, 2),
         |b$r AS (SELECT lhs, rhs, cnt FROM p$r
         |  ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |v$r AS (SELECT tf,
         |    replace(seq, chr(31)||b.lhs||chr(31)||chr(31)||b.rhs||chr(31),
         |      chr(31)||b.lhs||b.rhs||chr(31)) AS seq FROM v${r - 1}, b$r b),
         |s$r AS (SELECT CAST(sum(tf * len(str_split(
         |    substring(seq, 2, length(seq)-2), chr(31)||chr(31)))) AS BIGINT)
         |    AS sa FROM v$r)""".stripMargin
    }.mkString(",\n")
    s"""docs AS (
       |  SELECT doc_id AS id, text FROM documents
       |  UNION ALL SELECT 900001, repeat('qqq ', 200000)),
       |tok AS (SELECT
       |    unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |                       x -> x <> '')) AS token
       |  FROM docs),
       |v AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok
       |  WHERE NOT contains(token, chr(31)) GROUP BY token),
       |v0 AS (SELECT token, tf, chr(31) || array_to_string(
       |    list_transform(range(1, length(token)+1),
       |      i -> substring(token, CAST(i AS INT), 1)),
       |    chr(31)||chr(31)) || chr(31) AS seq FROM v),
       |$roundCtes""".stripMargin
  }

  private def bpeTrainOracleSql(rounds: Int): String = {
    val rows = (1 to rounds).map { r =>
      if (r == 1) s"SELECT CAST(1 AS BIGINT) AS round, lhs, rhs, " +
        s"cnt AS pair_count, (SELECT sa FROM s1) AS symbols_after FROM b1"
      else s"SELECT $r, lhs, rhs, cnt, (SELECT sa FROM s$r) FROM b$r"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${bpeLadderCtes(rounds)}
       |SELECT * FROM (
       |  $rows) ORDER BY round""".stripMargin
  }

  /** The q_bpe_encode oracle: the SAME training ladder derives b1..bk,
    * then the encode is the nested replace chain in merge-priority order
    * over v0 — one scalar expression, exactly the Spark fold. */
  private def bpeEncodeOracleSql(rounds: Int): String = {
    val encExpr = (1 to rounds).foldLeft("seq") { (e, r) =>
      s"replace($e, chr(31)||b$r.lhs||chr(31)||chr(31)||b$r.rhs||chr(31), " +
        s"chr(31)||b$r.lhs||b$r.rhs||chr(31))"
    }
    val bs = (1 to rounds).map(r => s"b$r").mkString(", ")
    s"""WITH ${bpeLadderCtes(rounds)},
       |enc AS (SELECT token, tf, str_split(substring(e.s, 2, length(e.s)-2),
       |    chr(31)||chr(31)) AS pieces
       |  FROM (SELECT token, tf, $encExpr AS s FROM v0, $bs) e)
       |SELECT token, tf, CAST(len(pieces) AS BIGINT) AS n_pieces,
       |  array_to_string(pieces, ' ') AS encoded
       |FROM enc ORDER BY token""".stripMargin
  }

  /** Shared by q_decontaminate and q_decontaminate_bloom (identical
    * results by contract — the Bloom path is an exactness-preserving
    * prefilter). */
  /** The langId rule chain as a DuckDB CASE over an arbitrary string
    * expression — ONE definition feeds the whole-doc replay (q_lang_id)
    * and the per-paragraph replay (q_lang_mixed) so the rule order can
    * never drift between them. Non-interpolated string: the \x{...}
    * classes stay literal. */
  private def langIdCaseSql(v: String): String =
    """CASE
      |WHEN regexp_matches(V, '[\x{4e00}-\x{9fff}]') THEN 'zh'
      |WHEN regexp_matches(V, '[\x{0400}-\x{04ff}]') THEN 'ru'
      |WHEN regexp_matches(V, '[\x{0f00}-\x{0fff}]') THEN 'bo'
      |WHEN regexp_matches(V, '[\x{0c80}-\x{0cff}]') THEN 'kn'
      |WHEN regexp_matches(V, ' (der|die|das|und|nicht|mit) ') THEN 'de'
      |WHEN regexp_matches(V, ' (le|la|les|des|une|est) ') THEN 'fr'
      |WHEN regexp_matches(V, ' (el|los|las|una|que|con) ') THEN 'es'
      |WHEN regexp_matches(V, ' (de|het|een|van|met|voor) ') THEN 'nl'
      |ELSE 'en' END""".stripMargin.replace("V", v)

  private val decontaminateSql: String =
    """WITH tok AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
      |  FROM documents),
      |sh AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |  ELSE list_distinct(list_transform(range(0, len(toks) - 2),
      |    i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))) END AS shs
      |  FROM tok),
      |bench AS (SELECT DISTINCT unnest(shs) AS s FROM sh WHERE doc_id % 97 = 0),
      |corpus AS (SELECT doc_id, unnest(shs) AS s FROM sh WHERE doc_id % 97 <> 0),
      |hits AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hits
      |  FROM corpus c JOIN bench b ON c.s = b.s GROUP BY c.doc_id)
      |SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
      |  coalesce(h.n_hits, 0) >= 1 AS contaminated
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
      |LEFT JOIN hits h USING (doc_id) ORDER BY doc_id""".stripMargin

  private val staticOracles: Map[String, String] = Map(
    "q_page_assembly" ->
      """SELECT l_orderkey, string_agg(l_returnflag, '|' ORDER BY l_linenumber, l_returnflag) AS flags,
        |CAST(count(*) AS BIGINT) AS n_lines FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_hf_filter" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events
        |WHERE event_type NOT IN ('error', 'signup') GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_pushdown" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |CAST(count(*) AS BIGINT) AS n
        |FROM lineitem WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1997-01-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_window_merge" ->
      """SELECT event_id, user_id,
        |lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) = event_type
        |  THEN 1 ELSE 0 END AS is_cont
        |FROM events ORDER BY event_id""".stripMargin,
    "q_sessionize" ->
      """WITH g AS (SELECT user_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT user_id,
        |CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_broadcast_join" ->
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n_customers,
        |CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_resume_antijoin" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 < 3)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_topk_docs" ->
      "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 10",
    "q_dedup_exact" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
        |ORDER BY doc_id""".stripMargin,
    // normalized near-exact dedup: the identical augmented corpus is
    // rebuilt here (chr(233) = composed é, chr(769) = combining acute),
    // then NFC + lower + explicit-class whitespace collapse re-derived via
    // DuckDB's own utf8proc nfc_normalize — grouping is by the normalized
    // key TEXT where Spark groups by xxhash64 of it (q_dedup_exact
    // convention, collision-sensitive on purpose)
    "q_normalized_dedup" ->
      """WITH docs AS (SELECT doc_id AS id, text FROM documents),
        |aug AS (
        |  SELECT id, text FROM docs
        |  UNION ALL SELECT id + 100000, text || '  Caf' || chr(233) || ' DUP'
        |    FROM docs WHERE id % 6 = 0
        |  UNION ALL SELECT id + 200000, upper(text) || chr(9) || 'cafe' || chr(769) || ' dup'
        |    FROM docs WHERE id % 6 = 0),
        |k AS (SELECT id,
        |  trim(regexp_replace(lower(nfc_normalize(text)), '[ \t\r\n]+', ' ', 'g')) AS nk
        |  FROM aug)
        |SELECT min(id) AS keep_id, CAST(count(*) AS BIGINT) AS dup_count,
        |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS member_ids
        |FROM k GROUP BY nk ORDER BY keep_id""".stripMargin,
    // host mirrors: identical augmented corpus (verbatim m-/m2- mirrors,
    // edited x- copies), md5 digests, hot-digest guard (<=100 hosts),
    // totals over ALL digests, integral ppm ratios — fully re-derived
    "q_host_mirrors" ->
      s"""WITH base AS (SELECT url, text,
         |    CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS n
         |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
         |aug AS (
         |  SELECT url, text FROM base
         |  UNION ALL SELECT regexp_replace(url, '^(https?://)', '\\1m-'), text
         |    FROM base WHERE n % 4 = 0
         |  UNION ALL SELECT regexp_replace(url, '^(https?://)', '\\1m2-'), text
         |    FROM base WHERE n % 20 = 0
         |  UNION ALL SELECT regexp_replace(url, '^(https?://)', '\\1x-'), text || ' edited'
         |    FROM base WHERE n % 8 = 0),
         |hd AS (SELECT DISTINCT host, digest FROM (
         |    SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
         |      md5(text) AS digest FROM aug)
         |  WHERE host <> ''),
         |tot AS (SELECT host, count(*) AS n FROM hd GROUP BY host),
         |hg AS (SELECT host, digest FROM hd
         |  QUALIFY count(*) OVER (PARTITION BY digest) <= 100),
         |sh AS (SELECT a.host AS host_a, b.host AS host_b, count(*) AS n_shared
         |  FROM hg a JOIN hg b ON a.digest = b.digest AND a.host < b.host
         |  GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT s.host_a, s.host_b, CAST(s.n_shared AS BIGINT) AS n_shared,
         |  CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
         |  CAST(s.n_shared * 1000000 // ta.n AS BIGINT) AS containment_a_ppm,
         |  CAST(s.n_shared * 1000000 // tb.n AS BIGINT) AS containment_b_ppm,
         |  CAST(s.n_shared * 1000000 // (ta.n + tb.n - s.n_shared) AS BIGINT) AS jaccard_ppm
         |FROM sh s JOIN tot ta ON ta.host = s.host_a
         |  JOIN tot tb ON tb.host = s.host_b
         |ORDER BY host_a, host_b""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id, CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |x -> x <> '')) AS BIGINT) AS n_tokens FROM documents ORDER BY doc_id""".stripMargin,
    "q_subword_count" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(text, '[\p{L}\p{N}]+|[^\p{L}\p{N}\s]'))
        |AS BIGINT) AS n_subwords FROM documents ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """SELECT doc_id,
        |CAST(len(list_filter(string_split(text, chr(10)), x -> trim(x) <> '')) AS BIGINT) AS n_lines,
        |CAST(len(list_distinct(list_filter(string_split(text, chr(10)), x -> trim(x) <> ''))) AS BIGINT) AS n_distinct_lines,
        |CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
        |CAST(len(list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))) AS BIGINT) AS n_distinct_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_seq_pack" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT shard, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM d)
        |SELECT shard, CAST(floor(cum_before / 2048.0) AS BIGINT) AS pack_id,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
        |FROM c GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin,
    // inverted index: the df guard (QUALIFY window), the md5-prefix
    // bucket (both engines agree on md5 hex) and the per-bucket stats
    // all re-derived from the documents parquet
    "q_inverted_index_build" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    x -> x <> ''))) AS token FROM documents),
        |g AS (SELECT doc_id, token FROM
        |  (SELECT doc_id, token, count(*) OVER (PARTITION BY token) AS df FROM t)
        |  WHERE df <= 395),
        |b AS (SELECT doc_id, token,
        |  CAST(('0x' || substring(md5(token), 1, 4)) AS INTEGER) % 16 AS bucket
        |  FROM g)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_postings,
        |  CAST(count(DISTINCT token) AS BIGINT) AS n_tokens
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    // conjunctive search: same guarded postings, intersection by
    // distinct-term count
    "q_index_search" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(list_distinct(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    x -> x <> ''))) AS token FROM documents),
        |g AS (SELECT doc_id, token FROM
        |  (SELECT doc_id, token, count(*) OVER (PARTITION BY token) AS df FROM t)
        |  WHERE df <= 395)
        |SELECT doc_id AS id FROM g WHERE token IN ('data', 'key')
        |GROUP BY doc_id HAVING count(DISTINCT token) = 2
        |ORDER BY id""".stripMargin,
    // ranked search: guarded tf postings, per-term df over the matched
    // slice, integral tf*(1e6 DIV df) scoring, top-k == row_number over
    // (-score, id)
    "q_ranked_search" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    x -> x <> '')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM t GROUP BY doc_id, token),
        |g AS (SELECT doc_id, token, tf FROM
        |  (SELECT doc_id, token, tf, count(*) OVER (PARTITION BY token) AS df
        |   FROM tf) WHERE df <= 395),
        |p AS (SELECT * FROM g WHERE token IN ('data', 'key', 'dup')),
        |d AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY token),
        |s AS (SELECT doc_id AS id,
        |    CAST(sum(tf * (1000000 // df)) AS BIGINT) AS score,
        |    CAST(count(*) AS BIGINT) AS n_terms
        |  FROM p JOIN d USING (token) GROUP BY doc_id),
        |r AS (SELECT id, score, n_terms,
        |  row_number() OVER (ORDER BY -score, id) AS rn FROM s)
        |SELECT id, score, n_terms FROM r WHERE rn <= 10 ORDER BY id""".stripMargin,
    "q_vocab_stats" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    x -> x <> '')) AS token FROM documents)
        |SELECT token, CAST(count(*) AS BIGINT) AS tf,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |FROM t GROUP BY token HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY token""".stripMargin,
    // top-vocab: the bounded-histogram selector == row_number over
    // (-tf, token) — the q_host_topk equivalence, single stratum
    "q_top_vocab" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    x -> x <> '')) AS token FROM documents),
        |g AS (SELECT token, CAST(count(*) AS BIGINT) AS tf,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY token),
        |r AS (SELECT token, tf, df,
        |  row_number() OVER (ORDER BY -tf, token) AS rn FROM g)
        |SELECT token, tf, df FROM r WHERE rn <= 10 ORDER BY token""".stripMargin,
    "q_decontaminate" -> decontaminateSql,
    // containment: same shingle CTE shape as decontaminateSql, then the
    // df guard window, guarded-set sizes, pair intersection counts and
    // truncating-DIV (//) ppm ratios — every stage replayed
    "q_containment_pairs" ->
      """WITH planted AS (
        |  SELECT doc_id + 10000000 AS doc_id,
        |    text || ' ' || array_to_string(list_transform(range(1, 21),
        |      i -> 'qq' || CAST(doc_id AS VARCHAR) || 'x' || CAST(i AS VARCHAR)), ' ') AS text
        |  FROM documents WHERE doc_id % 101 = 0),
        |alldocs AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM planted),
        |tok AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM alldocs),
        |sh AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |  ELSE list_distinct(list_transform(range(0, len(toks) - 2),
        |    i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))) END AS shs
        |  FROM tok),
        |e AS (SELECT doc_id, unnest(shs) AS s FROM sh),
        |g AS (SELECT doc_id, s FROM
        |  (SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM e)
        |  WHERE df <= 64),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM g GROUP BY doc_id),
        |cm AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(count(*) AS BIGINT) AS n_common
        |  FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, n_common, sa.sz AS size_a, sb.sz AS size_b,
        |  CAST((n_common * 1000000) // sa.sz AS BIGINT) AS cont_a_in_b_ppm,
        |  CAST((n_common * 1000000) // sb.sz AS BIGINT) AS cont_b_in_a_ppm
        |FROM cm JOIN sz sa ON cm.id_a = sa.doc_id JOIN sz sb ON cm.id_b = sb.doc_id
        |WHERE greatest((n_common * 1000000) // sa.sz,
        |               (n_common * 1000000) // sb.sz) >= 800000
        |ORDER BY id_a, id_b""".stripMargin,
    // the Bloom-prefilter scale path is exactness-preserving by contract
    // (no false negatives in the sketch, false positives killed by the
    // exact verify join) — the SAME SQL oracles it, so the equivalence
    // is checked by the independent engine too
    "q_decontaminate_bloom" -> decontaminateSql,
    // integral k-means: the same quantize + 2-round Lloyd ladder replayed
    // in pure integer arithmetic (round_even ≡ bround, // ≡ DIV)
    "q_kmeans" -> kmeansSql(4, 2),
    // semantic outliers: the k=8 ladder + final-centroid quantized d2 +
    // the definitional single-window p95 quantile + the gate
    "q_semantic_outliers" ->
      s"""WITH ${kmeansCtes(8, 2)},
        |d AS (SELECT q.id, a.cluster,
        |    sum((q.v - c.cv) * (q.v - c.cv)) AS d2
        |  FROM q JOIN afin a USING (id)
        |    JOIN c2 c ON c.cid = a.cluster AND c.dim = q.dim
        |  GROUP BY q.id, a.cluster),
        |h AS (SELECT d2 AS v, count(*) AS c FROM d GROUP BY d2),
        |cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h),
        |n AS (SELECT count(*) AS n FROM d),
        |hi AS (SELECT min(v) AS hi FROM cum, n WHERE cum * 100 >= 95 * n)
        |SELECT d.id AS vec_id, CAST(d.cluster AS BIGINT) AS cluster,
        |  CAST(d.d2 AS BIGINT) AS d2, CAST(hi.hi AS BIGINT) AS hi,
        |  (d.d2 > hi.hi) AS is_outlier
        |FROM d, hi ORDER BY vec_id""".stripMargin,
    // SemDeDup: identical planted corpus (float->double casts exact in
    // both engines), kmeans ladder over src=aug, within-cluster exact
    // pairing at the 1e-6 cosine grain, recursive reachability, keep
    // min-id. Fully independent replay — no dumps.
    "q_semdedup" ->
      s"""WITH RECURSIVE aug AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
         |    FROM embeddings WHERE vec_id % 7 = 0
         |  UNION ALL SELECT vec_id + 200000, CAST(embedding AS DOUBLE[])
         |    FROM embeddings WHERE vec_id % 21 = 0
         |  UNION ALL SELECT vec_id + 300000,
         |      list_concat([CAST(embedding[1] AS DOUBLE) + 0.25],
         |                  CAST(embedding[2:] AS DOUBLE[]))
         |    FROM embeddings WHERE vec_id % 11 = 0),
         |${kmeansCtes(4, 2, src = "aug")},
         |cl AS (SELECT id, cluster FROM afin
         |       QUALIFY count(*) OVER (PARTITION BY cluster) <= 5000),
         |pr AS (SELECT l.id AS id_a, r.id AS id_b
         |  FROM cl l JOIN cl r ON l.cluster = r.cluster AND l.id < r.id
         |  JOIN aug va ON va.vec_id = l.id JOIN aug vb ON vb.vec_id = r.id
         |  WHERE round(list_cosine_similarity(va.embedding, vb.embedding)
         |              * 1000000) >= 950000),
         |sym AS (SELECT id_a AS x, id_b AS y FROM pr
         |        UNION SELECT id_b, id_a FROM pr),
         |reach AS (
         |  SELECT x, x AS r FROM (SELECT DISTINCT x FROM sym)
         |  UNION
         |  SELECT sym.x, reach.r FROM sym JOIN reach ON reach.x = sym.y),
         |lab AS (SELECT x, min(r) AS g FROM reach GROUP BY x)
         |SELECT a.id AS vec_id, CAST(a.cluster AS BIGINT) AS cluster,
         |  coalesce(l.g, a.id) AS group_id,
         |  (coalesce(l.g, a.id) = a.id) AS kept
         |FROM afin a LEFT JOIN lab l ON a.id = l.x
         |ORDER BY vec_id""".stripMargin,
    // cluster-balanced sampling: the same ladder + the q_stratified_sample
    // permutation-quota replay over the final assignments
    "q_cluster_sample" ->
      s"""WITH ${kmeansCtes(4, 2)},
         |d AS (SELECT id, cluster,
         |  ((id % 1000003) * 2654435761) % 1000003 AS ord FROM afin),
         |r AS (SELECT id, cluster,
         |  row_number() OVER (PARTITION BY cluster ORDER BY ord, id) AS rn,
         |  count(*) OVER (PARTITION BY cluster) AS n FROM d)
         |SELECT id AS vec_id, CAST(cluster AS BIGINT) AS cluster
         |FROM r WHERE rn <= ceil(n * 0.25) ORDER BY vec_id""".stripMargin,
    // exact token-count percentiles: the same integral cum·100 ≥ pct·n
    // rule replayed over the value histogram
    "q_length_quantiles" ->
      """WITH v AS (SELECT len(list_filter(
        |    regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS v
        |  FROM documents),
        |h AS (SELECT v, count(*) AS c FROM v GROUP BY v),
        |cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h),
        |n AS (SELECT count(*) AS n FROM v),
        |q(pct) AS (VALUES (1),(5),(25),(50),(75),(95),(99))
        |SELECT CAST(pct AS BIGINT) AS pct, CAST(min(v) AS BIGINT) AS value
        |FROM cum, n, q WHERE cum * 100 >= pct * n
        |GROUP BY pct ORDER BY pct""".stripMargin,
    // calibrated gate: quantiles re-derived definitionally (single
    // global window), inclusive gate replayed
    "q_calibrated_gate" ->
      """WITH v AS (SELECT doc_id, length(text) AS v FROM documents),
        |h AS (SELECT v, count(*) AS c FROM v GROUP BY v),
        |cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h),
        |n AS (SELECT count(*) AS n FROM v),
        |lo AS (SELECT min(v) AS lo FROM cum, n WHERE cum * 100 >= 10 * n),
        |hi AS (SELECT min(v) AS hi FROM cum, n WHERE cum * 100 >= 90 * n)
        |SELECT doc_id, CAST(v.v AS BIGINT) AS v, CAST(lo.lo AS BIGINT) AS lo,
        |  CAST(hi.hi AS BIGINT) AS hi,
        |  (v.v >= lo.lo AND v.v <= hi.hi) AS keep
        |FROM v, lo, hi ORDER BY doc_id""".stripMargin,
    // split assignment: the same permutation + bucket arithmetic, all
    // BIGINT (doc_id >= 0, so % == pmod)
    "q_split_assign" ->
      """WITH d AS (SELECT doc_id,
        |  ((doc_id % 1000003) * 2654435761) % 1000003 AS ord FROM documents),
        |b AS (SELECT doc_id, (ord * 1000000) // 1000003 AS bucket FROM d)
        |SELECT doc_id,
        |  CASE WHEN bucket < 980000 THEN 'train'
        |       WHEN bucket < 990000 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_stratified_sample" ->
      """WITH d AS (SELECT doc_id, lang,
        |  ((doc_id % 1000003) * 2654435761) % 1000003 AS ord FROM documents),
        |r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang ORDER BY ord, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n FROM d)
        |SELECT doc_id, lang FROM r WHERE rn <= ceil(n * 0.25) ORDER BY doc_id""".stripMargin,
    "q_quality" ->
      """SELECT doc_id,
        |CAST(length(text) AS BIGINT) AS n_chars_calc,
        |CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
        |CAST(length(regexp_replace(text, '[^.!?。]', '', 'g')) AS BIGINT) AS n_sentences,
        |CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits,
        |CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      s"SELECT doc_id, ${langIdCaseSql("text")} AS lang_pred FROM documents ORDER BY doc_id",
    "q_salted_agg" ->
      "SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id ORDER BY user_id",
    "q_embedding_stats" ->
      """SELECT label, CAST(count(*) AS BIGINT) AS n, CAST(min(len(embedding)) AS BIGINT) AS dim
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "q_quality_gate" ->
      """WITH f AS (SELECT
        |  CAST(length(text) AS BIGINT) AS n_chars_calc,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
        |  CAST(length(regexp_replace(text, '[^.!?。]', '', 'g')) AS BIGINT) AS n_sentences,
        |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits
        |  FROM documents)
        |SELECT (n_chars_calc >= 20 AND n_tokens >= 5 AND n_sentences >= 1
        |        AND n_digits * 3 < n_chars_calc) AS keep_doc,
        |CAST(count(*) AS BIGINT) AS n FROM f GROUP BY keep_doc ORDER BY keep_doc""".stripMargin,
    // corpus card: gate features + text-keyed copy count + per-lang agg,
    // all re-derived (the q_quality_gate predicate verbatim)
    "q_corpus_card" ->
      """WITH f AS (SELECT lang, text,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
        |  CAST(length(regexp_replace(text, '[^.!?。]', '', 'g')) AS BIGINT) AS n_sentences,
        |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits
        |  FROM documents),
        |c AS (SELECT lang, n_tokens, n_chars,
        |  (n_chars >= 20 AND n_tokens >= 5 AND n_sentences >= 1
        |   AND n_digits * 3 < n_chars) AS keep_doc,
        |  count(*) OVER (PARTITION BY text) AS copies FROM f)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN keep_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_gate_kept,
        |  CAST(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin,
    "q_ann_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 256),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])) AS sim
        |  FROM embeddings c, q WHERE c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // hard negatives: positives are the top-1 rows of the SAME ranking,
    // so true negatives are exactly ranks 2..6 renumbered — re-derived
    // here from an independent row_number ranking
    "q_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 256),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])) AS sim
        |  FROM embeddings c, q WHERE c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id AS neg_id, CAST(rank - 1 AS INTEGER) AS neg_rank
        |FROM ranked WHERE rank BETWEEN 2 AND 6
        |ORDER BY query_id, neg_rank""".stripMargin,
    // HyperLogLog: registers (md5-prefix 60-bit hash, low-10-bit index,
    // bin()-length rank) and the fixed-point estimate replayed exactly —
    // the alpha constant and the m^2*2^30 numerator are the SAME Scala-
    // computed literals the operator bakes in
    "q_hll_distinct" ->
      s"""WITH h AS (SELECT event_type,
        |    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM events),
        |r AS (SELECT event_type, h % 1024 AS reg,
        |    CASE WHEN h // 1024 > 0 THEN 50 - length(bin(h // 1024)) + 1
        |         ELSE 51 END AS rho0 FROM h),
        |g AS (SELECT event_type, reg, CAST(max(rho0) AS BIGINT) AS rho
        |      FROM r GROUP BY 1, 2),
        |e AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_registers,
        |    CAST(sum(CAST(1 AS BIGINT) << CAST(30 - least(rho, 30) AS INT)) AS BIGINT)
        |      AS present FROM g GROUP BY 1)
        |SELECT event_type, n_registers,
        |  CAST((${SketchOps.alphaPpm(10)} * least(
        |    ${(1L << 20) * (1L << 30)} // greatest(present + (1024 - n_registers) * ${1L << 30}, 1),
        |    1000000000000)) // 1000000 AS BIGINT) AS estimate
        |FROM e ORDER BY event_type""".stripMargin,
    // count-min heavy hitters: sketch cells, probe cells and the min-over-
    // rows estimate all re-derived from the documents parquet
    "q_cms_heavy" ->
      """WITH tok AS (SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    t -> t <> '')) AS token FROM documents),
        |cells AS (SELECT CAST(t.r AS INTEGER) AS r,
        |    CAST(CAST('0x' || substring(md5('r' || CAST(t.r AS VARCHAR) || ':' || token), 1, 8)
        |      AS BIGINT) % 4096 AS BIGINT) AS cell
        |  FROM tok, range(0, 4) t(r)),
        |sketch AS (SELECT r, cell, CAST(count(*) AS BIGINT) AS cnt
        |  FROM cells GROUP BY 1, 2),
        |probes AS (SELECT DISTINCT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    t -> t <> '')) AS token FROM documents WHERE doc_id % 97 = 0),
        |pc AS (SELECT token, CAST(t.r AS INTEGER) AS r,
        |    CAST(CAST('0x' || substring(md5('r' || CAST(t.r AS VARCHAR) || ':' || token), 1, 8)
        |      AS BIGINT) % 4096 AS BIGINT) AS cell
        |  FROM probes, range(0, 4) t(r)),
        |est AS (SELECT token, CAST(min(coalesce(sketch.cnt, 0)) AS BIGINT) AS est
        |  FROM pc LEFT JOIN sketch USING (r, cell) GROUP BY token)
        |SELECT token, est FROM est WHERE est >= 500 ORDER BY token""".stripMargin,
    // batch perceptron: the unrolled 2-round ladder — round 1's update is
    // the full class-conditional token mass (zero init => margin 0 =>
    // everything misclassified), round 2 re-scores against w1 and adds
    // only the still-misclassified mass
    "q_perceptron_train" ->
      """WITH feats AS (SELECT doc_id, y,
        |    CAST(CAST('0x' || substring(md5(token), 1, 4) AS INTEGER) % 64 AS BIGINT) AS f,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
        |      unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |        t -> t <> '')) AS token FROM documents)
        |  GROUP BY 1, 2, 3),
        |w1 AS (SELECT f, CAST(sum(y * x) AS BIGINT) AS w FROM feats GROUP BY f),
        |m2 AS (SELECT feats.doc_id, feats.y,
        |    sum(feats.x * coalesce(w1.w, 0)) AS margin
        |  FROM feats LEFT JOIN w1 USING (f) GROUP BY 1, 2),
        |d2 AS (SELECT f, CAST(sum(y * x) AS BIGINT) AS d FROM feats
        |  WHERE doc_id IN (SELECT doc_id FROM m2 WHERE y * margin <= 0)
        |  GROUP BY f),
        |w2 AS (SELECT coalesce(w1.f, d2.f) AS f,
        |    CAST(coalesce(w1.w, 0) + coalesce(d2.d, 0) AS BIGINT) AS w
        |  FROM w1 FULL OUTER JOIN d2 ON w1.f = d2.f)
        |SELECT f, w FROM w2 WHERE w <> 0 ORDER BY f""".stripMargin,
    // the exact fixed-point binary log replayed as the unrolled 20-step
    // shift-and-square ladder over 500 values spanning every magnitude
    "q_log2_fp" ->
      s"""WITH b AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    (CAST(doc_id AS BIGINT) + 1) *
        |      (CAST(1 AS BIGINT) << CAST(doc_id % 40 AS INT)) AS n
        |  FROM documents),
        |${log2FpLadderSql("b", "doc_id, n")}
        |SELECT doc_id, n, lf AS log2fp FROM lfz ORDER BY doc_id""".stripMargin,
    // BM25: N, avgdl, per-term df, the idf log ladder and every ppm
    // truncation re-derived from raw text; same term literals via
    // bm25Terms, same k1/b ppm constants
    "q_bm25_rank" ->
      s"""WITH base AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS ts
        |  FROM documents),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(coalesce(sum(len(ts)), 0) AS BIGINT) AS sum_dl FROM base),
        |stats2 AS (SELECT n_docs,
        |    greatest((sum_dl * 1000000) // n_docs, 1) AS avgdl_ppm FROM stats),
        |tf AS (SELECT doc_id, dl, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl, unnest(ts) AS token
        |        FROM base)
        |  WHERE token IN (${bm25Terms.map(t => s"'$t'").mkString(", ")})
        |  GROUP BY 1, 2, 3),
        |dft AS (SELECT token, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
        |lin AS (SELECT token, CAST(1 AS BIGINT) AS side,
        |    2 * (SELECT n_docs FROM stats2) + 2 AS n FROM dft
        |  UNION ALL
        |  SELECT token, CAST(-1 AS BIGINT), 2 * df_t + 1 FROM dft),
        |${log2FpLadderSql("lin", "token, side")},
        |idf AS (SELECT token, CAST(sum(side * lf) AS BIGINT) AS idf_fp
        |  FROM lfz GROUP BY 1),
        |scored AS (SELECT tf.doc_id,
        |    (idf.idf_fp * ((tf.tf * 2200000 * 1000000) //
        |      (tf.tf * 1000000 +
        |       (1200000 * (250000 + (750000 * tf.dl * 1000000) // s.avgdl_ppm)) // 1000000)))
        |      // 1000000 AS sc
        |  FROM tf JOIN idf USING (token), stats2 s),
        |tot AS (SELECT doc_id, CAST(sum(sc) AS BIGINT) AS score,
        |    CAST(count(*) AS BIGINT) AS n_terms FROM scored GROUP BY 1)
        |SELECT doc_id, score, n_terms,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |FROM tot ORDER BY score DESC, doc_id LIMIT 25""".stripMargin,
    // token entropy: one ladder over the union of per-token counts and
    // per-doc lengths; H = lf(n) - (sum c*lf(c)) // n, empty docs 0
    "q_token_entropy" ->
      s"""WITH base AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS ts
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens FROM base),
        |tc AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(ts) AS token FROM base) GROUP BY 1, 2),
        |lin AS (SELECT doc_id, 'len' AS kind, n_tokens AS w, n_tokens AS n
        |    FROM dl WHERE n_tokens >= 1
        |  UNION ALL SELECT doc_id, 'tok', c, c FROM tc),
        |${log2FpLadderSql("lin", "doc_id, kind, w")},
        |h AS (SELECT doc_id,
        |    max(CASE WHEN kind = 'len' THEN lf END) AS lf_len,
        |    CAST(coalesce(sum(CASE WHEN kind = 'tok' THEN w * lf END), 0) AS BIGINT) AS s,
        |    CAST(coalesce(sum(CASE WHEN kind = 'tok' THEN 1 END), 0) AS BIGINT) AS n_distinct
        |  FROM lfz GROUP BY 1)
        |SELECT dl.doc_id, dl.n_tokens,
        |  coalesce(h.n_distinct, 0) AS n_distinct,
        |  CAST(CASE WHEN dl.n_tokens = 0 THEN 0
        |       ELSE h.lf_len - h.s // dl.n_tokens END AS BIGINT) AS entropy_q20
        |FROM dl LEFT JOIN h USING (doc_id) ORDER BY dl.doc_id""".stripMargin,
    // KL drift: union-vocab smoothed histograms, the four-log expansion
    // through one ladder (per-token a/b rows + two scalar total rows),
    // signed trunc-toward-zero contributions — both engines agree
    "q_kl_drift" ->
      s"""WITH ta AS (SELECT token, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
        |      t -> t <> '')) AS token FROM documents) GROUP BY 1),
        |bsrc AS (SELECT CASE WHEN doc_id % 6 = 0
        |    THEN 'win free crypto now click here win free' ELSE text END AS text
        |  FROM documents),
        |tb AS (SELECT token, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
        |      t -> t <> '')) AS token FROM bsrc) GROUP BY 1),
        |j AS (SELECT coalesce(ta.token, tb.token) AS token,
        |    coalesce(ta.tf, 0) AS tf_a, coalesce(tb.tf, 0) AS tf_b
        |  FROM ta FULL OUTER JOIN tb ON ta.token = tb.token),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab,
        |    CAST(coalesce(sum(tf_a), 0) AS BIGINT) AS tot_a,
        |    CAST(coalesce(sum(tf_b), 0) AS BIGINT) AS tot_b FROM j),
        |lin AS (SELECT token, 'a' AS kind, tf_a + 1 AS n FROM j
        |  UNION ALL SELECT token, 'b', tf_b + 1 FROM j
        |  UNION ALL SELECT '', 'ta', tot_a + n_vocab FROM st
        |  UNION ALL SELECT '', 'tb', tot_b + n_vocab FROM st),
        |${log2FpLadderSql("lin", "token, kind")},
        |lfa AS (SELECT token, lf FROM lfz WHERE kind = 'a'),
        |lfb AS (SELECT token, lf FROM lfz WHERE kind = 'b'),
        |lft AS (SELECT max(CASE WHEN kind = 'ta' THEN lf END) AS lf_ta,
        |    max(CASE WHEN kind = 'tb' THEN lf END) AS lf_tb
        |  FROM lfz WHERE kind IN ('ta', 'tb')),
        |per AS (SELECT
        |    ((j.tf_b + 1) * 1000000) // (st.tot_b + st.n_vocab) AS p_ppm,
        |    lfb.lf - lfa.lf + lft.lf_ta - lft.lf_tb AS lfdiff
        |  FROM j JOIN lfa USING (token) JOIN lfb USING (token), st, lft)
        |SELECT CAST(sum((p_ppm * lfdiff) // 1048576) AS BIGINT) AS d_kl_ppm_bits,
        |  st.n_vocab, st.tot_a, st.tot_b
        |FROM per, st GROUP BY 2, 3, 4""".stripMargin,
    // TF-IDF keywords: tf, vocab df, the idf ladder and the top-3
    // selection (score desc, token asc — the quotaSelect contract)
    // re-derived from raw text
    "q_tfidf_keywords" ->
      s"""WITH base AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS ts
        |  FROM documents),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(ts) AS token FROM base) GROUP BY 1, 2),
        |dft AS (SELECT token, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM base),
        |lin AS (SELECT token, 'd' AS kind, 2 * df_t + 1 AS n FROM dft
        |  UNION ALL SELECT '', 'N', 2 * n_docs + 2 FROM st),
        |${log2FpLadderSql("lin", "token, kind")},
        |lfn AS (SELECT max(CASE WHEN kind = 'N' THEN lf END) AS lf_n FROM lfz),
        |idf AS (SELECT token, lfn.lf_n - lf AS idf_fp
        |  FROM lfz, lfn WHERE kind = 'd'),
        |scored AS (SELECT tf.doc_id, tf.token, tf.tf,
        |    CAST(tf.tf * idf.idf_fp AS BIGINT) AS tfidf
        |  FROM tf JOIN idf USING (token)),
        |ranked AS (SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn FROM scored)
        |SELECT doc_id, token, tf, tfidf FROM ranked WHERE rn <= 3
        |ORDER BY doc_id, token""".stripMargin,
    // PMI collocations: adjacent-bigram and unigram counts, corpus
    // totals, the five-log signed Q20 expansion and the
    // (pmi desc, x, y) top-k all re-derived from raw text. Bigram keys
    // join the ladder through a chr(31) junction (tokens are
    // whitespace-split in both engines, so they cannot contain the
    // separator's surrounding whitespace; 0x1F is the same junction the
    // BPE oracles use).
    "q_pmi_collocations" ->
      s"""WITH base AS (SELECT
        |    list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS ts
        |  FROM documents),
        |d AS (SELECT ts, len(ts) AS n FROM base),
        |b AS (SELECT ts[CAST(i + 1 AS INTEGER)] AS x,
        |        ts[CAST(i + 2 AS INTEGER)] AS y
        |      FROM (SELECT ts, unnest(range(0, n - 1)) AS i FROM d WHERE n >= 2)),
        |cxy AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c_xy FROM b GROUP BY 1, 2),
        |cu AS (SELECT token, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(ts) AS token FROM base) GROUP BY 1),
        |st AS (SELECT CAST((SELECT sum(c_xy) FROM cxy) AS BIGINT) AS n_bi,
        |       CAST((SELECT sum(c) FROM cu) AS BIGINT) AS n_uni),
        |surv AS (SELECT * FROM cxy WHERE c_xy >= 3),
        |lin AS (SELECT x || chr(31) || y AS key, 'b' AS kind, c_xy AS n FROM surv
        |  UNION ALL SELECT token, 'u', c FROM cu
        |  UNION ALL SELECT '', 'NU', n_uni FROM st
        |  UNION ALL SELECT '', 'NB', n_bi FROM st),
        |${log2FpLadderSql("lin", "key, kind")},
        |lfs AS (SELECT max(CASE WHEN kind = 'NU' THEN lf END) AS lf_nu,
        |        max(CASE WHEN kind = 'NB' THEN lf END) AS lf_nb FROM lfz),
        |scored AS (SELECT s.x, s.y, s.c_xy, ux.c AS c_x, uy.c AS c_y,
        |    lb.lf + 2 * lfs.lf_nu - lfs.lf_nb - lx.lf - ly.lf AS pmi_fp
        |  FROM surv s
        |  JOIN (SELECT key, lf FROM lfz WHERE kind = 'b') lb
        |    ON lb.key = s.x || chr(31) || s.y
        |  JOIN cu ux ON ux.token = s.x
        |  JOIN cu uy ON uy.token = s.y
        |  JOIN (SELECT key, lf FROM lfz WHERE kind = 'u') lx ON lx.key = s.x
        |  JOIN (SELECT key, lf FROM lfz WHERE kind = 'u') ly ON ly.key = s.y, lfs),
        |ranked AS (SELECT *, row_number() OVER (
        |    ORDER BY pmi_fp DESC, x, y) AS rn FROM scored)
        |SELECT x, y, c_xy, c_x, c_y, CAST(pmi_fp AS BIGINT) AS pmi_fp,
        |  CAST(rn AS BIGINT) AS rank
        |FROM ranked WHERE rn <= 50 ORDER BY rank""".stripMargin
  )

  /** The [[graft.functions.Log2Fp]] algorithm as DuckDB CTEs: `baseCte`
    * must expose a BIGINT column `n >= 1` plus the `keep` columns; emits
    * lf0..lf20 and a final `lfz` CTE with `lf` = the Q20 fixed-point
    * log2 — the EXACT integer shift-and-square ladder the expression
    * computes, truncation point for truncation point. */
  private def log2FpLadderSql(baseCte: String, keep: String): String = {
    val steps = (1 to 20).map { i =>
      s"""lf$i AS (SELECT $keep, e,
         |    CASE WHEN x*x >= 2199023255552 THEN (x*x) // 2097152
         |         ELSE (x*x) // 1048576 END AS x,
         |    fr * 2 + CASE WHEN x*x >= 2199023255552 THEN 1 ELSE 0 END AS fr
         |  FROM lf${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""lf0 AS (SELECT $keep, CAST(length(bin(n)) - 1 AS BIGINT) AS e,
       |    CASE WHEN length(bin(n)) >= 21
       |         THEN n // (CAST(1 AS BIGINT) << CAST(length(bin(n)) - 21 AS INT))
       |         ELSE n * (CAST(1 AS BIGINT) << CAST(21 - length(bin(n)) AS INT)) END AS x,
       |    CAST(0 AS BIGINT) AS fr
       |  FROM $baseCte),
       |$steps,
       |lfz AS (SELECT $keep, e * 1048576 + fr AS lf FROM lf20)""".stripMargin
  }

  /** Oracles over the VerifyTables parquet dumps (paths resolved at dump
    * time — see [[VerifyTables.oracleGlob]]). */
  private def materializedOracles: Map[String, String] = {
    def g(name: String) = VerifyTables.oracleGlob(name)
    // IVF: the deterministic farthest-point codebook is dumped
    // (ivf_centroids) and DuckDB replays assignment, nprobe probing, and
    // per-query top-k from it — the full IVF relational plan. Shared by
    // q_ann_ivf (one-shot build+query) and q_ann_ivf_query (prebuilt
    // index): both return the same top-k table by construction, so the
    // same replay oracles both.
    val ivfTopKSql =
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cents AS (SELECT cidx, cv FROM read_parquet('${g("ivf_centroids")}')),
         |cassign AS (
         |  SELECT e.vec_id AS neighbor_id, e.v AS cvec, cents.cidx,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_cosine_similarity(e.v, cents.cv) DESC, cents.cidx ASC) AS crank
         |  FROM e, cents),
         |corpus AS (SELECT neighbor_id, cvec, cidx AS list_idx FROM cassign WHERE crank = 1),
         |qassign AS (
         |  SELECT e.vec_id AS query_id, e.v AS qvec, cents.cidx,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_cosine_similarity(e.v, cents.cv) DESC, cents.cidx ASC) AS crank
         |  FROM e, cents WHERE e.vec_id < 256),
         |probes AS (SELECT query_id, qvec, cidx AS list_idx FROM qassign WHERE crank <= 4),
         |scored AS (SELECT p.query_id, c.neighbor_id,
         |    list_cosine_similarity(c.cvec, p.qvec) AS sim
         |  FROM corpus c JOIN probes p ON c.list_idx = p.list_idx
         |  WHERE c.neighbor_id <> p.query_id),
         |ranked AS (SELECT query_id, neighbor_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    Map(
      "q_ann_ivf" -> ivfTopKSql,
      "q_ann_ivf_query" -> ivfTopKSql,
      // index membership: nearest-centroid assignment of every corpus
      // vector, replayed from the dumped codebook
      "q_ann_ivf_build" ->
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |cents AS (SELECT cidx, cv FROM read_parquet('${g("ivf_centroids")}')),
           |cassign AS (
           |  SELECT e.vec_id AS neighbor_id, cents.cidx,
           |    row_number() OVER (PARTITION BY e.vec_id
           |      ORDER BY list_cosine_similarity(e.v, cents.cv) DESC, cents.cidx ASC) AS crank
           |  FROM e, cents)
           |SELECT CAST(cidx AS INTEGER) AS list_idx, neighbor_id
           |FROM cassign WHERE crank = 1 ORDER BY list_idx, neighbor_id""".stripMargin,
      // determinism replays: an independent pass of the same media kernel,
      // dumped by VerifyTables — row-for-row + schema check (decode
      // correctness is pinned by the codec round-trip suites)
      "x_media_features" ->
        s"""SELECT media_id, mime, width, height, payload_hash, error
           |FROM read_parquet('${g("media_features")}') ORDER BY media_id""".stripMargin,
      "x_frame_sample" ->
        s"""SELECT media_id, frame_no, ts_ms, frame_width, frame_height
           |FROM read_parquet('${g("frame_samples")}') ORDER BY media_id, frame_no""".stripMargin,
      // A1+A2+S9 re-assembly of the per-document rows from per-page rows
      "x_extract_full" ->
        s"""SELECT url,
           |CAST(count(*) AS BIGINT) AS n_pages,
           |string_agg(md, e'\\n\\n---\\n\\n' ORDER BY page_no) AS md,
           |string_agg(md_nohf, e'\\n\\n---\\n\\n' ORDER BY page_no) AS md_nohf,
           |coalesce(string_agg(CASE WHEN extracted_text <> '' THEN extracted_text END, e'\\n\\n' ORDER BY page_no), '') AS extracted_text,
           |'[' || string_agg('{"page_no": ' || CAST(page_no AS VARCHAR) || ', "cells": ' || CASE WHEN cells_json = '' THEN 'null' ELSE cells_json END || '}', ', ' ORDER BY page_no) || ']' AS cells_json,
           |bool_or(filtered) AS filtered,
           |coalesce(string_agg(CASE WHEN error <> '' THEN error END, '; ' ORDER BY page_no), '') AS error
           |FROM read_parquet('${g("extract_pages")}')
           |GROUP BY url ORDER BY url""".stripMargin,
      // gzip-wrapped corpus: byte-identical to the plain corpus's
      // re-assembly (same SQL as x_extract_full — the oracle side never
      // sees compressed bytes)
      "q_gzip_extract" ->
        s"""SELECT url,
           |CAST(count(*) AS BIGINT) AS n_pages,
           |string_agg(md, e'\\n\\n---\\n\\n' ORDER BY page_no) AS md,
           |string_agg(md_nohf, e'\\n\\n---\\n\\n' ORDER BY page_no) AS md_nohf,
           |coalesce(string_agg(CASE WHEN extracted_text <> '' THEN extracted_text END, e'\\n\\n' ORDER BY page_no), '') AS extracted_text,
           |'[' || string_agg('{"page_no": ' || CAST(page_no AS VARCHAR) || ', "cells": ' || CASE WHEN cells_json = '' THEN 'null' ELSE cells_json END || '}', ', ' ORDER BY page_no) || ']' AS cells_json,
           |bool_or(filtered) AS filtered,
           |coalesce(string_agg(CASE WHEN error <> '' THEN error END, '; ' ORDER BY page_no), '') AS error
           |FROM read_parquet('${g("extract_pages")}')
           |GROUP BY url ORDER BY url""".stripMargin,
      // OCR mode: per-doc assembly replayed from the OCR-mode page dump
      "x_extract_ocr" ->
        s"""SELECT url, CAST(count(*) AS BIGINT) AS n_pages,
           |string_agg(md, e'\\n\\n---\\n\\n' ORDER BY page_no) AS md
           |FROM read_parquet('${g("extract_pages_ocr")}')
           |GROUP BY url ORDER BY url""".stripMargin,
      // layout-only mode: cells-array assembly replayed from its page dump
      "x_extract_layout_only" ->
        s"""SELECT url, CAST(count(*) AS BIGINT) AS n_pages,
           |'[' || string_agg('{"page_no": ' || CAST(page_no AS VARCHAR) || ', "cells": ' || CASE WHEN cells_json = '' THEN 'null' ELSE cells_json END || '}', ', ' ORDER BY page_no) || ']' AS cells_json,
           |bool_or(filtered) AS filtered
           |FROM read_parquet('${g("extract_pages_layout_only")}')
           |GROUP BY url ORDER BY url""".stripMargin,
      // image branch: INPUT dims independently recomputed from the dumped
      // ORIGINAL dims with the exact smart_resize algebra (image_utils.py:
      // 29-64; round_even = Python banker's rounding), and the full-bleed
      // Picture cells_json reconstructed byte-for-byte
      "x_extract_image" ->
        s"""WITH p AS (
           |  SELECT url, origin_width AS w, origin_height AS h, md, error
           |  FROM read_parquet('${g("extract_pages")}') WHERE url LIKE '%/image/%'
           |), r AS (
           |  SELECT *, GREATEST(28, CAST(round_even(h / 28.0, 0) AS BIGINT) * 28) AS hb,
           |            GREATEST(28, CAST(round_even(w / 28.0, 0) AS BIGINT) * 28) AS wb
           |  FROM p
           |), d AS (
           |  SELECT url, w, h, md, error, CASE
           |    WHEN hb * wb > 11289600 THEN GREATEST(28, CAST(floor(h / sqrt(h * w / 11289600.0) / 28) AS BIGINT) * 28)
           |    WHEN hb * wb < 3136 THEN CAST(ceil(h * sqrt(3136.0 / (h * w)) / 28) AS BIGINT) * 28
           |    ELSE hb END AS ih, CASE
           |    WHEN hb * wb > 11289600 THEN GREATEST(28, CAST(floor(w / sqrt(h * w / 11289600.0) / 28) AS BIGINT) * 28)
           |    WHEN hb * wb < 3136 THEN CAST(ceil(w * sqrt(3136.0 / (h * w)) / 28) AS BIGINT) * 28
           |    ELSE wb END AS iw
           |  FROM r)
           |SELECT url, CAST(w AS INTEGER) AS origin_width, CAST(h AS INTEGER) AS origin_height,
           |  CAST(iw AS INTEGER) AS input_width, CAST(ih AS INTEGER) AS input_height,
           |  '[{"bbox": [0, 0, ' || w || ', ' || h || '], "category": "Picture"}]' AS cells_json,
           |  CAST(length(md) AS BIGINT) AS md_len, error
           |FROM d ORDER BY url""".stripMargin,
      // P17 parse triage: the dump is an independent job pass of the same
      // deterministic kernel — row-for-row determinism + schema check
      "x_parse_flex" ->
        s"""SELECT case_id, parsed, extracted, json_len
           |FROM read_parquet('${g("parse_flex_cases")}') ORDER BY case_id""".stripMargin,
      // rolling-xxhash64 fingerprint: independent-pass dump replay (the
      // x_parse_flex evidential class — DuckDB cannot compute xxhash64)
      "q_fingerprint" ->
        s"""SELECT doc_id, fp
           |FROM read_parquet('${g("fingerprints")}') ORDER BY doc_id""".stripMargin,
      // shard packing: the definitional global-order cumsum (ORDER BY
      // ord, id in ONE window) — equality with Spark's range-sliced
      // two-phase prefix sum is the point of the check
      "q_shard_pack" ->
        s"""WITH b AS (SELECT doc_id AS id,
           |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
           |                         x -> x <> '')) AS BIGINT) AS nt,
           |    ((doc_id % 1000003) * 2654435761) % 1000003 AS ord
           |  FROM documents),
           |c AS (SELECT id, nt,
           |    coalesce(sum(nt) OVER (ORDER BY ord, id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
           |  FROM b),
           |t AS (SELECT sum(nt) AS total FROM b)
           |SELECT id AS doc_id, nt AS n_tokens,
           |  CAST(cum_before AS BIGINT) AS cum_before,
           |  CAST(cum_before * 8 // greatest(total, 1) AS BIGINT) AS shard
           |FROM c, t ORDER BY doc_id""".stripMargin,
      // contamination fraction: planted two-tier corpus rebuilt from the
      // bench docs, shingles, semi-join hits, integral ppm and the gate
      // all re-derived — fully independent
      "q_contamination_score" ->
        s"""WITH base AS (SELECT doc_id, text FROM documents),
           |bencht AS (SELECT doc_id, text FROM base WHERE doc_id % 97 = 0),
           |corp AS (
           |  SELECT doc_id, text FROM base WHERE doc_id % 97 <> 0
           |  UNION ALL SELECT doc_id + 700000,
           |      text || ' unrelated filler tokens appended here now' FROM bencht
           |  UNION ALL SELECT doc_id + 800000,
           |      array_to_string(list_slice(
           |        list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''),
           |        1, 10), ' ')
           |      || ' filler alpha beta gamma delta epsilon zeta eta theta iota kappa'
           |    FROM bencht),
           |shc AS (SELECT doc_id,
           |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
           |    ELSE list_distinct(list_transform(range(0, len(toks) - 2),
           |      i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))) END AS shs
           |  FROM (SELECT doc_id,
           |      list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS toks
           |    FROM corp)),
           |shb AS (SELECT
           |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
           |    ELSE list_distinct(list_transform(range(0, len(toks) - 2),
           |      i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))) END AS shs
           |  FROM (SELECT
           |      list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS toks
           |    FROM bencht)),
           |bench AS (SELECT DISTINCT unnest(shs) AS s FROM shb),
           |c AS (SELECT doc_id, unnest(shs) AS s FROM shc),
           |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nh FROM c
           |  WHERE s IN (SELECT s FROM bench) GROUP BY doc_id),
           |n AS (SELECT doc_id, CAST(len(shs) AS BIGINT) AS n_shingles FROM shc)
           |SELECT n.doc_id, n.n_shingles,
           |  CAST(coalesce(h.nh, 0) AS BIGINT) AS n_hits,
           |  CAST(coalesce(h.nh, 0) * 1000000 // n.n_shingles AS BIGINT) AS overlap_ppm,
           |  (coalesce(h.nh, 0) * 1000000 // n.n_shingles) > 100000 AS dirty
           |FROM n LEFT JOIN hits h USING (doc_id) ORDER BY n.doc_id""".stripMargin,
      // mixed-language: identical plants, the SHARED langId CASE applied
      // per paragraph, majority by struct max — fully independent
      "q_lang_mixed" ->
        s"""WITH d AS (SELECT doc_id AS id, text FROM documents),
           |aug AS (SELECT id, text FROM d
           |  UNION ALL SELECT id + 300000,
           |      text || chr(10) || chr(10) || 'man sagt es ist und nicht mit der zeit'
           |    FROM d WHERE id % 6 = 0
           |  UNION ALL SELECT id + 400000,
           |      text || chr(10) || chr(10) || text || chr(10) || chr(10)
           |      || 'man sagt es ist und nicht mit der zeit'
           |    FROM d WHERE id % 8 = 0),
           |f AS (SELECT id,
           |    list_filter(string_split(text, chr(10) || chr(10)), p -> trim(p) <> '') AS ps
           |  FROM aug),
           |l AS (SELECT id, len(ps) AS np,
           |    list_transform(ps, p -> ${langIdCaseSql("p")}) AS langs FROM f),
           |m AS (SELECT id, np, len(list_distinct(langs)) AS nl,
           |    list_max(list_transform(list_distinct(langs),
           |      d2 -> {'c': len(list_filter(langs, x -> x = d2)), 'lang': d2})) AS mx
           |  FROM l)
           |SELECT id AS doc_id, CAST(np AS BIGINT) AS n_paras,
           |  CAST(nl AS BIGINT) AS n_langs, mx.lang AS major_lang,
           |  CAST(CASE WHEN np > 0 THEN mx.c * 1000000 // np ELSE 0 END AS BIGINT) AS major_ppm,
           |  (nl > 1) AS mixed
           |FROM m ORDER BY doc_id""".stripMargin,
      // BPE merge pairs: vocab tf, adjacent-char-pair explode, weighted
      // counts and the top-20 cut (ties by pair) all re-derived — fully
      // independent
      "q_bpe_pairs" ->
        s"""WITH tok AS (SELECT
           |    unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
           |                       x -> x <> '')) AS token
           |  FROM documents),
           |v AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
           |p AS (SELECT unnest(list_transform(range(1, length(token)),
           |        i -> substring(token, CAST(i AS INT), 2))) AS pair, tf
           |      FROM v),
           |pc AS (SELECT pair, CAST(sum(tf) AS BIGINT) AS pair_count
           |       FROM p GROUP BY pair),
           |top AS (SELECT pair, pair_count,
           |    row_number() OVER (ORDER BY pair_count DESC, pair) AS rn FROM pc)
           |SELECT pair, substring(pair, 1, 1) AS lhs,
           |  substring(pair, 2, 1) AS rhs, pair_count
           |FROM top WHERE rn <= 20 ORDER BY pair""".stripMargin,
      // BPE merge TRAINING: a 4-round CTE ladder re-deriving the vocab,
      // the chr(31)-delimited symbol encoding, per-round pair counts, the
      // (cnt DESC, lhs, rhs) argmax and the greedy replace()-apply —
      // symbols_after binds the left-to-right non-overlapping semantics
      // (the planted 200k-tf 'qqq' token merges ONCE per occurrence)
      "q_bpe_train" -> bpeTrainOracleSql(4),
      // BPE encode: the same training ladder derives the merges, then the
      // nested replace chain segments the vocab — train and apply bound
      // in one row hash
      "q_bpe_encode" -> bpeEncodeOracleSql(4),
      // mojibake gate: identical plants and the identical RE2 patterns,
      // both built from chr() so the SQL stays ASCII — fully independent
      "q_mojibake_gate" ->
        s"""WITH d AS (SELECT doc_id AS id, text FROM documents),
           |aug AS (
           |  SELECT id, text FROM d
           |  UNION ALL SELECT id + 300000,
           |      text || ' caf' || chr(195) || chr(169) || ' it' ||
           |      chr(226) || chr(8364) || chr(8482) || 's'
           |    FROM d WHERE id % 10 = 0
           |  UNION ALL SELECT id + 400000, text || ' lost' || chr(65533) || 'char'
           |    FROM d WHERE id % 15 = 0
           |  UNION ALL SELECT id + 500000, text || ' nel' || chr(133) || 'break'
           |    FROM d WHERE id % 12 = 0),
           |m AS (SELECT id,
           |    CAST(len(regexp_extract_all(text, chr(65533))) AS BIGINT) AS n_replacement,
           |    CAST(len(regexp_extract_all(text,
           |      '[' || chr(128) || '-' || chr(159) || ']')) AS BIGINT) AS n_c1,
           |    CAST(len(regexp_extract_all(text,
           |      chr(195) || '[' || chr(128) || '-' || chr(191) || ']|' ||
           |      chr(194) || '[' || chr(160) || '-' || chr(191) || ']|' ||
           |      chr(226) || chr(8364) || '.')) AS BIGINT) AS n_mojibake
           |  FROM aug)
           |SELECT id AS doc_id, n_replacement, n_c1, n_mojibake,
           |  (n_replacement = 0 AND n_c1 = 0 AND n_mojibake = 0) AS clean
           |FROM m ORDER BY doc_id""".stripMargin,
      // Gopher gate: identical planted corpus (repeat is cross-engine
      // exact), every rule re-derived as integer cross-multiplications
      // over DuckDB's list algebra — fully independent, no dumps
      "q_gopher_gate" ->
        s"""WITH d AS (SELECT doc_id AS id, text FROM documents),
           |aug AS (
           |  SELECT id, text FROM d
           |  UNION ALL SELECT id + 300000, repeat('- buy now great deal' || chr(10), 60)
           |    FROM d WHERE id % 9 = 0
           |  UNION ALL SELECT id + 400000, repeat('1234 5678 9012 3456 ', 15)
           |    FROM d WHERE id % 11 = 0
           |  UNION ALL SELECT id + 500000,
           |      repeat('and the story continues to be good...' || chr(10), 12)
           |    FROM d WHERE id % 13 = 0
           |  UNION ALL SELECT id + 200000,
           |      repeat('the data of this page seems to be useful and that is why we have kept it with care ', 4)
           |    FROM d WHERE id % 7 = 0
           |  UNION ALL SELECT id + 600000,
           |      repeat('good paragraph with the best of stories' || chr(10) || chr(10), 8)
           |    FROM d WHERE id % 17 = 0),
           |f AS (SELECT id, text,
           |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS ts,
           |    list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS ls,
           |    list_filter(string_split(text, chr(10) || chr(10)), p -> trim(p) <> '') AS ps
           |  FROM aug),
           |m AS (SELECT id,
           |    CAST(len(ts) AS BIGINT) AS nw,
           |    CAST(coalesce(list_sum(list_transform(ts, x -> length(x))), 0) AS BIGINT) AS sumlen,
           |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS nhash,
           |    CAST((length(text) - length(replace(text, '...', ''))) // 3
           |         + (length(text) - length(replace(text, '…', ''))) AS BIGINT) AS nell,
           |    CAST(len(ls) AS BIGINT) AS nl,
           |    CAST(len(list_distinct(ls)) AS BIGINT) AS ndl,
           |    CAST(len(list_filter(ls, l -> starts_with(trim(l), '- ')
           |      OR starts_with(trim(l), '* ') OR starts_with(trim(l), '• '))) AS BIGINT) AS nbul,
           |    CAST(len(list_filter(ls, l -> ends_with(rtrim(l), '...')
           |      OR ends_with(rtrim(l), '…'))) AS BIGINT) AS nellend,
           |    CAST(len(list_filter(ts, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS nalpha,
           |    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
           |      s -> list_contains(list_transform(ts, w -> lower(w)), s))) AS BIGINT) AS nstop,
           |    CAST(coalesce(list_sum(list_transform(list_distinct(ls),
           |      d2 -> CASE WHEN len(list_filter(ls, x -> x = d2)) > 1
           |            THEN len(list_filter(ls, x -> x = d2)) * length(d2) ELSE 0 END)), 0) AS BIGINT) AS duplc,
           |    CAST(coalesce(list_sum(list_transform(ls, l -> length(l))), 0) AS BIGINT) AS totlc,
           |    CAST(len(ps) AS BIGINT) AS np,
           |    CAST(len(list_distinct(ps)) AS BIGINT) AS ndp,
           |    CAST(coalesce(list_sum(list_transform(list_distinct(ps),
           |      d2 -> CASE WHEN len(list_filter(ps, x -> x = d2)) > 1
           |            THEN len(list_filter(ps, x -> x = d2)) * length(d2) ELSE 0 END)), 0) AS BIGINT) AS duppc,
           |    CAST(coalesce(list_sum(list_transform(ps, p -> length(p))), 0) AS BIGINT) AS totpc
           |  FROM f),
           |r AS (SELECT id AS doc_id, nw AS n_words,
           |    (nw >= 50 AND nw <= 100000) AS ok_word_count,
           |    (nw * 3 <= sumlen AND sumlen <= nw * 10) AS ok_mean_word_len,
           |    ((nhash + nell) * 10 <= nw) AS ok_symbol_ratio,
           |    (nbul * 10 <= nl * 9) AS ok_bullet_lines,
           |    (nellend * 10 <= nl * 3) AS ok_ellipsis_lines,
           |    (nalpha * 5 >= nw * 4) AS ok_alpha_words,
           |    (nstop >= 2) AS ok_stopwords,
           |    ((nl - ndl) * 10 <= nl * 3) AS ok_dup_lines,
           |    ((np - ndp) * 10 <= np * 3) AS ok_dup_paras,
           |    (duplc * 5 <= totlc) AS ok_dup_line_chars,
           |    (duppc * 5 <= totpc) AS ok_dup_para_chars
           |  FROM m)
           |SELECT *,
           |  (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
           |   AND ok_bullet_lines AND ok_ellipsis_lines AND ok_alpha_words
           |   AND ok_stopwords AND ok_dup_lines AND ok_dup_paras
           |   AND ok_dup_line_chars AND ok_dup_para_chars) AS keep
           |FROM r ORDER BY doc_id""".stripMargin,
      // DSIR selection: tokens, bigram construction, md5-prefix buckets,
      // add-one integral ratio weights, the additive score and the gate
      // all re-derived from the documents parquet — fully independent
      "q_dsir_select" ->
        s"""WITH d AS (SELECT doc_id AS id, text, (lang = 'en') AS tgt FROM documents),
           |tok AS (SELECT id, tgt,
           |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS ts
           |  FROM d),
           |uni AS (SELECT id, tgt, unnest(ts) AS f FROM tok),
           |bi AS (SELECT id, tgt,
           |    unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS f
           |  FROM tok),
           |feats AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
           |fb AS (SELECT id, tgt,
           |    CAST('0x' || substring(md5(f),1,4) AS INTEGER) % 4096 AS bucket
           |  FROM feats),
           |bt AS (SELECT bucket, count(*) AS cr,
           |    count(*) FILTER (WHERE tgt) AS ct FROM fb GROUP BY bucket),
           |w AS (SELECT bucket, (ct+1)*1000000 // (cr+1) AS w FROM bt),
           |pd AS (SELECT id, bucket, count(*) AS c FROM fb GROUP BY id, bucket),
           |sc AS (SELECT id, sum(c*w) AS score, sum(c) AS n_feats
           |  FROM pd JOIN w USING (bucket) GROUP BY id)
           |SELECT d.id AS doc_id,
           |  CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
           |  CAST(coalesce(sc.score, 0) AS BIGINT) AS score,
           |  (coalesce(sc.n_feats, 0) > 0 AND
           |   coalesce(sc.score, 0) >= coalesce(sc.n_feats, 0) * 440000) AS kept
           |FROM d LEFT JOIN sc ON d.id = sc.id
           |ORDER BY doc_id""".stripMargin,
      // compressibility gate: the identical planted corpus is rebuilt
      // here (repeat/md5/base64/chr all cross-engine exact), n_bytes
      // re-derived as strlen (DuckDB strlen counts UTF-8 BYTES — the
      // multibyte plant binds it against octet_length), and the ratio +
      // both gate bounds recomputed; ONLY the deflate byte count comes
      // from the independent-pass dump (no SQL engine exposes DEFLATE)
      "q_compression_gate" ->
        s"""WITH d AS (SELECT doc_id AS id, text FROM documents),
           |aug AS (
           |  SELECT id, text FROM d
           |  UNION ALL SELECT id + 300000, repeat('spam ham ', 200)
           |    FROM d WHERE id % 9 = 0
           |  UNION ALL SELECT id + 400000,
           |      to_base64(from_hex(md5(text))) ||
           |      to_base64(from_hex(md5(text || 'x'))) ||
           |      to_base64(from_hex(md5(text || 'y'))) ||
           |      to_base64(from_hex(md5(text || 'z')))
           |    FROM d WHERE id % 11 = 0
           |  UNION ALL SELECT id + 500000,
           |      text || ' caf' || chr(233) || ' ' || chr(19990) || chr(30028)
           |    FROM d WHERE id % 13 = 0),
           |z AS (SELECT id, n_deflate
           |  FROM read_parquet('${g("deflate_sizes")}')),
           |f AS (SELECT aug.id,
           |    CAST(strlen(aug.text) AS BIGINT) AS n_bytes, z.n_deflate
           |  FROM aug JOIN z USING (id)),
           |r AS (SELECT id, n_bytes, n_deflate,
           |  CASE WHEN n_bytes = 0 THEN 0
           |       ELSE n_deflate * 1000000 // n_bytes END AS ratio_ppm
           |  FROM f)
           |SELECT id, n_bytes, n_deflate, ratio_ppm,
           |  (ratio_ppm >= 100000 AND ratio_ppm <= 950000) AS kept
           |FROM r ORDER BY id""".stripMargin,
      // filter funnel: every cumulative-AND survival sum re-derived
      // independently (gates: token floor, lang, stopword, length cap)
      "q_filter_funnel" ->
        """WITH d AS (SELECT text, lang,
          |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
          |      x -> x <> '')) AS n_tok,
          |    length(text) AS n_chars FROM documents),
          |g AS (SELECT (n_tok >= 20) AS g1, (lang = 'en') AS g2,
          |    contains(text, ' the ') AS g3, (n_chars <= 400) AS g4 FROM d),
          |a AS (SELECT CAST(count(*) AS BIGINT) AS n0,
          |    CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
          |    CAST(sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
          |    CAST(sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
          |    CAST(sum(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
          |  FROM g)
          |SELECT * FROM (
          |  SELECT CAST(1 AS BIGINT) AS stage, 'min_words' AS gate,
          |    n0 AS n_in, n0 - s1 AS n_dropped, s1 AS n_out FROM a
          |  UNION ALL SELECT 2, 'english', s1, s1 - s2, s2 FROM a
          |  UNION ALL SELECT 3, 'has_stopword', s2, s2 - s3, s3 FROM a
          |  UNION ALL SELECT 4, 'max_chars', s3, s3 - s4, s4 FROM a)
          |ORDER BY stage""".stripMargin,
      // boilerplate catalog: identical footer plants, per-doc distinct
      // grams, doc counts, (n_docs DESC, gram) order and the top-50 cut
      // all re-derived
      "q_boilerplate_catalog" ->
        """WITH d AS (SELECT doc_id AS id, text
          |    || CASE WHEN doc_id % 6 = 0
          |         THEN ' subscribe to our newsletter for updates and offers today' ELSE '' END
          |    || CASE WHEN doc_id % 30 = 0
          |         THEN ' subscribe to our newsletter for updates and offers today' ELSE '' END
          |    || CASE WHEN doc_id % 10 = 0
          |         THEN ' all rights reserved terms of service privacy policy applies' ELSE '' END
          |    AS text FROM documents),
          |t AS (SELECT id, list_filter(regexp_split_to_array(trim(text), '\s+'),
          |    x -> x <> '') AS ts FROM d),
          |g AS (SELECT id, unnest(list_distinct(
          |    CASE WHEN len(ts) >= 8
          |      THEN list_transform(range(0, len(ts) - 7),
          |        i -> array_to_string(list_slice(ts, i + 1, i + 8), ' '))
          |      ELSE CAST([] AS VARCHAR[]) END)) AS gram FROM t),
          |c AS (SELECT gram, count(*) AS n_docs FROM g GROUP BY gram
          |  HAVING count(*) >= 3)
          |SELECT gram, CAST(n_docs AS BIGINT) AS n_docs FROM c
          |ORDER BY n_docs DESC, gram LIMIT 50""".stripMargin,
      // token drift: identical spam-takeover snapshot B, independent
      // tokenization/total/ppm/full-outer re-derivation
      "q_token_drift" ->
        """WITH ta AS (SELECT unnest(list_filter(regexp_split_to_array(trim(text),
          |    '\s+'), x -> x <> '')) AS token FROM documents),
          |tb AS (SELECT unnest(list_filter(regexp_split_to_array(trim(
          |    CASE WHEN doc_id % 6 = 0
          |      THEN 'win free crypto now click here win free'
          |      ELSE text END), '\s+'), x -> x <> '')) AS token FROM documents),
          |da AS MATERIALIZED (SELECT token, count(*) AS tf FROM ta GROUP BY token),
          |db AS MATERIALIZED (SELECT token, count(*) AS tf FROM tb GROUP BY token),
          |pa AS (SELECT token, tf, tf * 1000000 // (SELECT sum(tf) FROM da) AS ppm
          |  FROM da),
          |pb AS (SELECT token, tf, tf * 1000000 // (SELECT sum(tf) FROM db) AS ppm
          |  FROM db)
          |SELECT coalesce(pa.token, pb.token) AS token,
          |  CAST(coalesce(pa.tf, 0) AS BIGINT) AS tf_a,
          |  CAST(coalesce(pb.tf, 0) AS BIGINT) AS tf_b,
          |  CAST(coalesce(pa.ppm, 0) AS BIGINT) AS ppm_a,
          |  CAST(coalesce(pb.ppm, 0) AS BIGINT) AS ppm_b,
          |  CAST(coalesce(pb.ppm, 0) - coalesce(pa.ppm, 0) AS BIGINT) AS delta_ppm
          |FROM pa FULL OUTER JOIN pb ON pa.token = pb.token
          |WHERE greatest(coalesce(pa.ppm, 0), coalesce(pb.ppm, 0)) >= 100
          |ORDER BY token""".stripMargin,
      // C9 batch repair: same determinism replay over the repair-case dump
      "x_repair_batch" ->
        s"""SELECT case_id, original_length, predict_resized, cleaned_objects, success
           |FROM read_parquet('${g("repair_cases")}') ORDER BY case_id""".stripMargin,
      // grounding OCR: center-containment filter + reading-order text join
      // replayed from the dumped per-cell centers / query bbox; anchor rows
      // (ord = -1) keep zero-hit and error pages in the group with "" —
      // exactly the kernel's empty-response rendering
      "x_extract_grounding" ->
        s"""WITH c AS (SELECT * FROM read_parquet('${g("grounding_cells")}')),
           |hits AS (
           |  SELECT url, page_no, ord, text FROM c
           |  WHERE ord >= 0 AND cx >= qx1 AND cx <= qx2 AND cy >= qy1 AND cy <= qy2
           |), pages AS (SELECT DISTINCT url, page_no FROM c)
           |SELECT p.url, p.page_no,
           |  coalesce(string_agg(h.text, e'\\n\\n' ORDER BY h.ord), '') AS response
           |FROM pages p LEFT JOIN hits h ON p.url = h.url AND p.page_no = h.page_no
           |GROUP BY p.url, p.page_no ORDER BY p.url, p.page_no""".stripMargin,
      // W1 span explode: JSON parse + per-page ordinality
      "x_span_explode" ->
        s"""WITH p AS (
           |  SELECT url, page_no, json_extract(cells_json, '$$[*]') AS cells
           |  FROM read_parquet('${g("extract_pages")}')
           |  WHERE NOT filtered AND error = ''
           |), c AS (
           |  SELECT url, page_no, unnest(cells) AS cell,
           |         generate_subscripts(cells, 1) AS idx FROM p
           |)
           |SELECT url, page_no, CAST(idx - 1 AS INTEGER) AS reading_order,
           |  json_extract_string(cell, '$$.category') AS category,
           |  CAST(json_extract(cell, '$$.bbox') AS VARCHAR) AS bbox
           |FROM c ORDER BY url, page_no, reading_order""".stripMargin,
      // outline: heading spans re-assembled in reading order per doc
      "q_doc_outline" ->
        s"""WITH p AS (
           |  SELECT url, page_no, json_extract(cells_json, '$$[*]') AS cells
           |  FROM read_parquet('${g("extract_pages")}')
           |  WHERE NOT filtered AND error = ''
           |), c AS (
           |  SELECT url, page_no, unnest(cells) AS cell,
           |         generate_subscripts(cells, 1) AS idx FROM p
           |), h AS (
           |  SELECT url, page_no, idx,
           |    json_extract_string(cell, '$$.category') AS category,
           |    json_extract_string(cell, '$$.text') AS text FROM c
           |  WHERE json_extract_string(cell, '$$.category')
           |        IN ('Title', 'Section-header')
           |)
           |SELECT url, CAST(count(*) AS BIGINT) AS n_headings,
           |  string_agg(category || ': ' || text, ' > ' ORDER BY page_no, idx)
           |    AS outline
           |FROM h GROUP BY url ORDER BY url""".stripMargin,
      "q_category_histogram" ->
        s"""WITH p AS (
           |  SELECT json_extract(cells_json, '$$[*]') AS cells
           |  FROM read_parquet('${g("extract_pages")}')
           |  WHERE NOT filtered AND error = ''
           |), c AS (SELECT unnest(cells) AS cell FROM p)
           |SELECT json_extract_string(cell, '$$.category') AS category,
           |  CAST(count(*) AS BIGINT) AS n
           |FROM c GROUP BY category ORDER BY category""".stripMargin,
      // chunking: same tokens, same integer chunk-count/slice arithmetic
      "q_chunk_docs" ->
        """WITH tok AS (SELECT doc_id,
          |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
          |  FROM documents),
          |d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM tok
          |      WHERE len(toks) > 0),
          |c AS (SELECT doc_id, n, toks,
          |  unnest(range(0, (greatest(n - 16, 1) + 47) // 48)) AS chunk_no FROM d)
          |SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
          |  CAST(least(64, n - chunk_no*48) AS BIGINT) AS n_chunk_tokens,
          |  array_to_string(list_slice(toks, chunk_no*48 + 1, chunk_no*48 + 64), ' ') AS chunk_text
          |FROM c ORDER BY doc_id, chunk_no""".stripMargin,
      // composed pipeline: the same four stage replays chained — gate
      // predicate, PII chain (shared pattern constants), min-per-text
      // dedup, token count
      "q_corpus_pipeline" ->
        s"""WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 50 = 7
           |    THEN 'Breaking news everyone. Contact editor@example.com now. The end.'
           |    ELSE text || '. Contact user' || CAST(doc_id AS VARCHAR) || '@example.com now. The end.'
           |  END AS text FROM documents),
           |f AS (SELECT doc_id, text,
           |  CAST(length(text) AS BIGINT) AS n_chars,
           |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
           |  CAST(length(regexp_replace(text, '[^.!?。]', '', 'g')) AS BIGINT) AS n_sent,
           |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_dig
           |  FROM aug),
           |gate AS (SELECT doc_id, text FROM f
           |  WHERE n_chars >= 20 AND n_tokens >= 5 AND n_sent >= 1 AND n_dig * 3 < n_chars),
           |e AS (SELECT doc_id, regexp_replace(text, '${TextOps.PiiPatterns.Email}', '<EMAIL>', 'g') AS t1 FROM gate),
           |i AS (SELECT doc_id, regexp_replace(t1, '${TextOps.PiiPatterns.Ip}', '<IP>', 'g') AS t2 FROM e),
           |p AS (SELECT doc_id, regexp_replace(t2, '${TextOps.PiiPatterns.Phone}', '${TextOps.PiiPatterns.PhoneReplRe2}', 'g') AS text FROM i),
           |d AS (SELECT min(doc_id) AS doc_id FROM p GROUP BY text)
           |SELECT p.doc_id,
           |  CAST(len(list_filter(regexp_split_to_array(trim(p.text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
           |  p.text AS text_clean
           |FROM p JOIN d USING (doc_id) ORDER BY p.doc_id""".stripMargin,
      // repeated spans: DuckDB keys windows by their joined TEXT where
      // Spark keys by xxhash64 of it (hash-vs-text trick); same planted
      // paragraph constant
      "q_repeated_spans" ->
        s"""WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0
           |    THEN text || ' $SpanPara' ELSE text END AS text FROM documents),
           |tok AS (SELECT doc_id,
           |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS toks
           |  FROM aug),
           |d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM tok),
           |w AS (SELECT doc_id, unnest(range(0, greatest(n - 19, 0))) AS pos, toks FROM d),
           |wt AS (SELECT doc_id, array_to_string(list_slice(toks, pos + 1, pos + 20), ' ') AS win FROM w),
           |dup AS (SELECT win FROM (SELECT win, count(*) AS c FROM wt GROUP BY win) WHERE c >= 2),
           |dd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows
           |       FROM wt WHERE win IN (SELECT win FROM dup) GROUP BY doc_id)
           |SELECT d.doc_id, CAST(greatest(n - 19, 0) AS BIGINT) AS n_windows,
           |  CAST(coalesce(dd.n_dup_windows, 0) AS BIGINT) AS n_dup_windows
           |FROM d LEFT JOIN dd USING (doc_id) ORDER BY doc_id""".stripMargin,
      // span surgery: same window/dup replay as q_repeated_spans, then
      // the same coverage filter + token re-join
      "q_span_scrub" ->
        s"""WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0
           |    THEN text || ' $SpanPara' ELSE text END AS text FROM documents),
           |tok AS (SELECT doc_id,
           |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS toks
           |  FROM aug),
           |d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM tok),
           |w AS (SELECT doc_id, unnest(range(0, greatest(n - 19, 0))) AS pos, toks FROM d),
           |wt AS (SELECT doc_id, pos, array_to_string(list_slice(toks, pos + 1, pos + 20), ' ') AS win FROM w),
           |dup AS (SELECT win FROM (SELECT win, count(*) AS c FROM wt GROUP BY win) WHERE c >= 2),
           |dp AS (SELECT doc_id, list(pos) AS dps FROM wt
           |       WHERE win IN (SELECT win FROM dup) GROUP BY doc_id),
           |j AS (SELECT d.doc_id, d.toks, d.n, coalesce(dp.dps, CAST([] AS BIGINT[])) AS dps
           |      FROM d LEFT JOIN dp USING (doc_id)),
           |k AS (SELECT doc_id, n, toks,
           |    list_filter(range(0, n), x -> len(list_filter(dps, p -> x >= p AND x < p + 20)) = 0) AS kept
           |  FROM j)
           |SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_tokens_kept,
           |  CAST(n - len(kept) AS BIGINT) AS n_tokens_removed,
           |  coalesce(array_to_string(list_transform(kept, x -> toks[CAST(x + 1 AS INTEGER)]), ' '), '') AS text_clean
           |FROM k ORDER BY doc_id""".stripMargin,
      // distinctive terms: same tokenization as q_token_count, integer
      // score arithmetic, same (score DESC, term ASC) tie-break
      "q_tfidf_terms" ->
        """WITH tok AS (SELECT doc_id,
          |    unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
          |                       x -> x <> '')) AS term FROM documents),
          |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          |       FROM tok GROUP BY doc_id, term),
          |d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
          |s AS (SELECT doc_id, term, tf, df, (tf * 1000000) // df AS score
          |      FROM tf JOIN d USING (term)),
          |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
          |        ORDER BY score DESC, term ASC) AS rank FROM s)
          |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df,
          |  CAST(score AS BIGINT) AS score
          |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
      // line dedup: same augmented multi-line construction; DuckDB keys
      // lines by the normalized TEXT where Spark keys by xxhash64 of it
      // (same replay trick as q_stream_dedup — collisions negligible)
      "q_line_dedup" ->
        """WITH aug AS (SELECT doc_id, array_to_string(list_filter([
          |    substr(text, 1, 80),
          |    CASE WHEN doc_id % 3 = 0 THEN '  COOKIE NOTICE: ACCEPT ALL COOKIES '
          |         ELSE 'cookie notice: accept all cookies' END,
          |    CASE WHEN doc_id % 7 = 0 THEN 'subscribe to our newsletter' END,
          |    CASE WHEN doc_id % 200 = 3 THEN 'limited promo: free shipping' END,
          |    CASE WHEN doc_id % 2 = 0 THEN '' END
          |  ], x -> x IS NOT NULL), chr(10)) AS text FROM documents),
          |l AS (SELECT doc_id,
          |    generate_subscripts(string_split(text, chr(10)), 1) - 1 AS line_no,
          |    unnest(string_split(text, chr(10))) AS line FROM aug),
          |k AS (SELECT doc_id, line_no, line, lower(trim(line)) AS key FROM l),
          |freq AS (SELECT key FROM (SELECT key, count(DISTINCT doc_id) AS n
          |                          FROM k GROUP BY key) WHERE n >= 10),
          |kept AS (SELECT * FROM k WHERE key NOT IN (SELECT key FROM freq)),
          |a AS (SELECT doc_id, count(*) AS n_kept,
          |        string_agg(line, chr(10) ORDER BY line_no) AS clean_text
          |      FROM kept GROUP BY doc_id),
          |t AS (SELECT doc_id, count(*) AS n FROM l GROUP BY doc_id)
          |SELECT t.doc_id,
          |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_lines_kept,
          |  CAST(t.n - coalesce(a.n_kept, 0) AS BIGINT) AS n_lines_removed,
          |  coalesce(a.clean_text, '') AS clean_text
          |FROM t LEFT JOIN a USING (doc_id) ORDER BY doc_id""".stripMargin,
      // PII redaction: the same augmented text construction + the SAME
      // pattern constants (TextOps.PiiPatterns, interpolated verbatim) —
      // DuckDB replays count + replace per class in the same order
      "q_pii_redact" ->
        s"""WITH aug AS (SELECT doc_id,
           |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call +1 555-' ||
           |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-99 from 10.0.' ||
           |  CAST(doc_id % 256 AS VARCHAR) || '.7 today' AS text FROM documents),
           |e AS (SELECT doc_id, text,
           |  CAST(len(regexp_extract_all(text, '${TextOps.PiiPatterns.Email}')) AS BIGINT) AS n_emails,
           |  regexp_replace(text, '${TextOps.PiiPatterns.Email}', '<EMAIL>', 'g') AS t1 FROM aug),
           |i AS (SELECT doc_id, n_emails,
           |  CAST(len(regexp_extract_all(t1, '${TextOps.PiiPatterns.Ip}')) AS BIGINT) AS n_ips,
           |  regexp_replace(t1, '${TextOps.PiiPatterns.Ip}', '<IP>', 'g') AS t2 FROM e),
           |p AS (SELECT doc_id, n_emails, n_ips,
           |  CAST(len(regexp_extract_all(t2, '${TextOps.PiiPatterns.Phone}')) AS BIGINT) AS n_phones,
           |  regexp_replace(t2, '${TextOps.PiiPatterns.Phone}', '${TextOps.PiiPatterns.PhoneReplRe2}', 'g') AS text_redacted FROM i)
           |SELECT doc_id, n_emails, n_ips, n_phones, text_redacted FROM p
           |ORDER BY doc_id""".stripMargin,
      // per-host PII audit: identical class-distinct plants; counts
      // re-derived with the SAME shared pattern constants on the same
      // staged intermediates (email -> ip -> phone), then host-aggregated
      "q_pii_audit" ->
        s"""WITH base AS (SELECT url, text,
           |    CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS n
           |  FROM read_parquet('${g("northrule")}')),
           |aug AS (SELECT url, text
           |  || CASE WHEN n % 7 = 0
           |       THEN ' contact u' || n || '@example.org' ELSE '' END
           |  || CASE WHEN n % 11 = 0
           |       THEN ' from 10.1.' || (n % 256) || '.9' ELSE '' END
           |  || CASE WHEN n % 13 = 0
           |       THEN ' call +44 7700 900' || lpad(CAST(n % 1000 AS VARCHAR), 3, '0')
           |       ELSE '' END AS text FROM base),
           |e AS (SELECT url,
           |  CAST(len(regexp_extract_all(text, '${TextOps.PiiPatterns.Email}')) AS BIGINT) AS n_emails,
           |  regexp_replace(text, '${TextOps.PiiPatterns.Email}', '<EMAIL>', 'g') AS t1 FROM aug),
           |i AS (SELECT url, n_emails,
           |  CAST(len(regexp_extract_all(t1, '${TextOps.PiiPatterns.Ip}')) AS BIGINT) AS n_ips,
           |  regexp_replace(t1, '${TextOps.PiiPatterns.Ip}', '<IP>', 'g') AS t2 FROM e),
           |p AS (SELECT url, n_emails, n_ips,
           |  CAST(len(regexp_extract_all(t2, '${TextOps.PiiPatterns.Phone}')) AS BIGINT) AS n_phones FROM i)
           |SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN n_emails + n_ips + n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
           |  CAST(sum(n_emails) AS BIGINT) AS n_emails,
           |  CAST(sum(n_ips) AS BIGINT) AS n_ips,
           |  CAST(sum(n_phones) AS BIGINT) AS n_phones
           |FROM p GROUP BY 1 ORDER BY host""".stripMargin,
      // URL canonicalization: the same deterministic noisy-variant
      // construction + the same RE2-safe regex chain, replayed verbatim
      // on both the noisy and the original url (roundtrips check)
      "q_url_canon" ->
        s"""WITH base AS (SELECT url FROM read_parquet('${g("northrule")}')),
           |n AS (SELECT url, CASE length(url) % 4
           |  WHEN 0 THEN url || '?utm_source=feed&utm_campaign=x'
           |  WHEN 1 THEN upper(substring(url, 1, 8)) || substring(url, 9)
           |  WHEN 2 THEN url || '/#section-2'
           |  ELSE url || '?a=1&utm_x=2&b=3' END AS noisy FROM base),
           |c1 AS (SELECT url, noisy,
           |  regexp_replace(noisy, '#.*$$', '', 'g') AS a,
           |  regexp_replace(url,   '#.*$$', '', 'g') AS b FROM n),
           |c2 AS (SELECT url, noisy,
           |  regexp_replace(a, '([?&])(?:utm_[^&=#?]*|fbclid|gclid)=[^&#]*', '\\1', 'g') AS a,
           |  regexp_replace(b, '([?&])(?:utm_[^&=#?]*|fbclid|gclid)=[^&#]*', '\\1', 'g') AS b FROM c1),
           |c3 AS (SELECT url, noisy,
           |  regexp_replace(a, '&&+', '&', 'g') AS a,
           |  regexp_replace(b, '&&+', '&', 'g') AS b FROM c2),
           |c4 AS (SELECT url, noisy,
           |  regexp_replace(a, '\\?&', '?', 'g') AS a,
           |  regexp_replace(b, '\\?&', '?', 'g') AS b FROM c3),
           |c5 AS (SELECT url, noisy,
           |  regexp_replace(a, '[?&]+$$', '', 'g') AS a,
           |  regexp_replace(b, '[?&]+$$', '', 'g') AS b FROM c4),
           |c6 AS (SELECT url, noisy,
           |  lower(regexp_extract(a, '^[^/?#]*//[^/?#]*')) || regexp_replace(a, '^[^/?#]*//[^/?#]*', '') AS a,
           |  lower(regexp_extract(b, '^[^/?#]*//[^/?#]*')) || regexp_replace(b, '^[^/?#]*//[^/?#]*', '') AS b FROM c5),
           |c7 AS (SELECT url, noisy,
           |  regexp_replace(a, '^(.*[^/])/$$', '\\1') AS a,
           |  regexp_replace(b, '^(.*[^/])/$$', '\\1') AS b FROM c6)
           |SELECT url, noisy, a AS canon, (b = a) AS roundtrips
           |FROM c7 ORDER BY url""".stripMargin,
      // streaming dedup in batch mode ≡ first row per text by (ts, url);
      // floor(epoch) mirrors Spark's timestamp→long truncation
      "q_stream_dedup" ->
        s"""SELECT url, CAST(floor(epoch(warc_ts)) AS BIGINT) AS warc_ts, lang
           |FROM read_parquet('${g("northrule")}')
           |QUALIFY row_number() OVER (
           |  PARTITION BY text
           |  ORDER BY CAST(floor(epoch(warc_ts)) AS BIGINT), url) = 1
           |ORDER BY url""".stripMargin,
      // streaming host fetch-rate in batch: tumbling epoch-aligned hour
      // windows = date_trunc; bytes via octet_length, null html -> 0
      "q_host_fetch_rate" ->
        s"""SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           |  CAST(floor(epoch(date_trunc('hour', warc_ts))) AS BIGINT) AS window_start,
           |  CAST(count(*) AS BIGINT) AS n_fetches,
           |  CAST(sum(coalesce(octet_length(html), 0)) AS BIGINT) AS n_bytes
           |FROM read_parquet('${g("northrule")}')
           |WHERE warc_ts IS NOT NULL
           |GROUP BY 1, 2 ORDER BY host, window_start""".stripMargin,
      // skew-salted host stats ≡ single-phase aggregate
      "x_host_stats" ->
        s"""SELECT regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
           |CAST(count(*) AS BIGINT) AS n_docs,
           |CAST(sum(octet_length(html)) AS BIGINT) AS payload_bytes
           |FROM read_parquet('${g("northrule")}')
           |GROUP BY host ORDER BY host""".stripMargin,
      // C9/A5 report aggregates over the dumped repair cases
      "x_repair_report" ->
        s"""SELECT CAST(count(*) AS BIGINT) AS total_cases,
           |CAST(sum(CASE WHEN success THEN 1 ELSE 0 END) AS BIGINT) AS successful_cases,
           |CAST(sum(cleaned_objects) AS BIGINT) AS total_recovered_objects
           |FROM read_parquet('${g("repair_cases")}')""".stripMargin,
      // lineage totals ≡ direct aggregates over the dumped output
      "q_lineage_totals" ->
        s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |CAST(sum(n_pages) AS BIGINT) AS n_pages,
           |CAST(sum(CASE WHEN filtered THEN 1 ELSE 0 END) AS BIGINT) AS n_filtered,
           |CAST(sum(CASE WHEN error <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
           |FROM read_parquet('${g("extract_docs")}')""".stripMargin,
      // W3 cross-page paragraph merge: the continuation predicate
      // (heading/list guard, CJK punctuation, terminal punctuation) and
      // the rstrip-splice, replayed in SQL over the page dump
      "x_cross_page_merge" ->
        s"""
           |WITH p AS (
           |  SELECT url, page_no, md FROM read_parquet('${g("extract_pages")}')
           |  WHERE url LIKE '%/pdf/%'
           |), ctx AS (
           |  SELECT url, page_no, md,
           |    list_filter(list_transform(string_split(md, chr(10)),
           |      x -> trim(x, ' ' || chr(9) || chr(13) || chr(12) || chr(11))), x -> x <> '') AS lines
           |  FROM p
           |), b AS (
           |  SELECT url, page_no, md,
           |    CASE WHEN len(lines) = 0 THEN '' ELSE lines[1] END AS first_line,
           |    CASE WHEN len(lines) = 0 THEN '' ELSE lines[-1] END AS last_line
           |  FROM ctx
           |), w AS (
           |  SELECT *, lag(last_line) OVER (PARTITION BY url ORDER BY page_no) AS prev_last FROM b
           |), m AS (
           |  SELECT url, page_no, md,
           |    CASE
           |      WHEN prev_last IS NULL THEN false
           |      WHEN prev_last = '' OR first_line = '' THEN false
           |      WHEN substr(prev_last,1,1) = '#' OR substr(prev_last,1,2) = '- ' OR substr(prev_last,1,2) = '* '
           |        OR substr(prev_last,1,2) = '> ' OR substr(prev_last,1,1) = '|' OR substr(prev_last,1,2) = '$$$$'
           |        OR substr(prev_last,1,6) = '<table' THEN false
           |      WHEN substr(first_line,1,1) = '#' OR substr(first_line,1,2) = '- ' OR substr(first_line,1,2) = '* '
           |        OR substr(first_line,1,2) = '> ' OR substr(first_line,1,1) = '|' OR substr(first_line,1,2) = '$$$$'
           |        OR substr(first_line,1,6) = '<table' THEN false
           |      WHEN substr(first_line,1,1) IN ('，','。','、','；','：','）','」','』','…') THEN true
           |      ELSE NOT (substr(prev_last, length(prev_last), 1) IN ('。','？','！','.','?','!','"','”','’','」','』',':','：',';','；'))
           |    END AS merge_here
           |  FROM w
           |), t AS (
           |  SELECT url, page_no, md, merge_here,
           |    coalesce(lead(merge_here) OVER (PARTITION BY url ORDER BY page_no), false) AS next_merges
           |  FROM m
           |), piece AS (
           |  SELECT url, page_no,
           |    (CASE WHEN page_no = 0 OR merge_here THEN '' ELSE chr(10)||chr(10) END) ||
           |    (CASE WHEN next_merges THEN rtrim(md, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) ELSE md END)
           |    AS piece
           |  FROM t
           |)
           |SELECT url, CAST(count(*) AS INTEGER) AS n_pages,
           |  string_agg(piece, '' ORDER BY page_no) AS merged_md
           |FROM piece GROUP BY url ORDER BY url""".stripMargin.trim,
      // embedding-cosine near-dup: 16-bit-chunk band join over the dumped
      // 64-bit sign-LSH signatures (incl. the hot-bucket guard) + exact
      // cosine verify, all replayed
      "q_embed_neardup" ->
        s"""WITH v AS (SELECT id, vec, sig FROM read_parquet('${g("doc_vectors")}')),
           |b AS (SELECT id, vec, sig, band, (sig >> (band*16)) & 65535 AS chunk
           |      FROM v, range(0, 4) t(band)
           |      QUALIFY count(*) OVER (PARTITION BY band, chunk) <= 1000),
           |cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.vec AS va, r.vec AS vb
           |         FROM b l JOIN b r ON l.band = r.band AND l.chunk = r.chunk
           |           AND l.id < r.id)
           |SELECT id_a, id_b,
           |  CAST(round(list_cosine_similarity(va, vb) * 1000000) AS BIGINT) AS cos_x1e6
           |FROM cand WHERE round(list_cosine_similarity(va, vb) * 1000000) >= 950000
           |ORDER BY id_a, id_b""".stripMargin,
      // linear classifier: the SAME integer weight/bias constants
      // (TextOps.BowClassifier) interpolated as a literal list; integral
      // dot product over the dumped vectors — engine-exact
      "q_bow_classifier" ->
        s"""WITH w AS (SELECT [${TextOps.BowClassifier.Weights.mkString(",")}]::DOUBLE[] AS wv),
           |v AS (SELECT id, vec FROM read_parquet('${g("doc_vectors")}')),
           |s AS (SELECT id AS doc_id,
           |    CAST(list_sum(list_transform(range(1, 65), i -> vec[i] * wv[i]))
           |         + ${TextOps.BowClassifier.Bias} AS BIGINT) AS logit
           |  FROM v, w)
           |SELECT doc_id, logit, logit > 0 AS keep FROM s ORDER BY doc_id""".stripMargin,
      // Shared band-join CTE bodies (no WITH keyword — callers prepend
      // WITH / WITH RECURSIVE): ONE definition per signature family so
      // the band count, hot-bucket cap, and tie-break can never drift
      // between the pairs / e2e / clustering replays (the same reason
      // guardedSelfJoin is shared on the Spark side).
      "q_minhash_pairs" -> s"""WITH $minhashCandCte,
           |m AS (SELECT id_a, id_b,
           |        len(list_filter(range(1, 65), i -> sig_a[i] = sig_b[i])) AS matches
           |      FROM cand)
           |SELECT id_a, id_b, CAST(matches AS BIGINT) AS matches64 FROM m
           |WHERE CAST(matches AS DOUBLE) / 64 >= 0.5
           |ORDER BY id_a, id_b""".stripMargin,
      // band index build: per-band stats of the guarded banded relation
      // (chunk-distinct ⟺ band-hash-distinct absent 64-bit collisions —
      // the same equivalence the candidate-join oracles rest on)
      "q_band_index_build" ->
        s"""WITH s AS (SELECT id, sig
           |  FROM read_parquet('${VerifyTables.oracleGlob("minhash_sigs")}')
           |  WHERE id % 5 <> 0),
           |b AS (SELECT id, band, list_slice(sig, band*4 + 1, band*4 + 4) AS chunk
           |      FROM s, range(0, 16) t(band)
           |      QUALIFY count(*) OVER (PARTITION BY band, chunk) <= 1000)
           |SELECT CAST(band AS INTEGER) AS band,
           |  CAST(count(*) AS BIGINT) AS n_entries,
           |  CAST(count(DISTINCT chunk) AS BIGINT) AS n_keys
           |FROM b GROUP BY band ORDER BY band""".stripMargin,
      // incremental near-dup: arrival bands join the hot-bucket-guarded
      // INDEX bands (chunk equality ⟺ Spark's band-hash equality); the
      // corpus is never self-paired
      "q_incremental_neardup" ->
        s"""WITH s AS (SELECT id, sig
           |  FROM read_parquet('${VerifyTables.oracleGlob("minhash_sigs")}')),
           |arr AS (SELECT * FROM s WHERE id % 5 = 0),
           |idx AS (SELECT * FROM s WHERE id % 5 <> 0),
           |bi AS (SELECT id, sig, band,
           |         list_slice(sig, band*4 + 1, band*4 + 4) AS chunk
           |       FROM idx, range(0, 16) t(band)
           |       QUALIFY count(*) OVER (PARTITION BY band, chunk) <= 1000),
           |ba AS (SELECT id, sig, band,
           |         list_slice(sig, band*4 + 1, band*4 + 4) AS chunk
           |       FROM arr, range(0, 16) t(band)),
           |cand AS (SELECT DISTINCT a.id AS id_new, i.id AS id_idx,
           |           a.sig AS sig_a, i.sig AS sig_b
           |         FROM ba a JOIN bi i ON a.band = i.band AND a.chunk = i.chunk),
           |m AS (SELECT id_new, id_idx,
           |        len(list_filter(range(1, 65), i -> sig_a[i] = sig_b[i])) AS matches
           |      FROM cand),
           |f AS (SELECT id_new, count(*) AS n_dups, max(matches) AS mx
           |      FROM m WHERE CAST(matches AS DOUBLE) / 64 >= 0.5
           |      GROUP BY id_new)
           |SELECT arr.id, CAST(coalesce(f.n_dups, 0) AS BIGINT) AS n_dups,
           |  CAST(coalesce(f.mx, 0) AS BIGINT) AS max_matches64,
           |  f.id_new IS NULL AS survived
           |FROM arr LEFT JOIN f ON arr.id = f.id_new ORDER BY arr.id""".stripMargin,
      // SimHash chunk join + popcount Hamming verification; the e2e
      // variant computes signatures in-flight but they are byte-identical
      // to the dump, so ONE replay oracles both
      "q_simhash_pairs" -> simhashPairsSql,
      "q_simhash_e2e" -> simhashPairsSql,
      // pairs → clusters: DuckDB recomputes the simhash candidate pairs,
      // then derives each node's component as min-reachable-id via a
      // recursive reachability CTE (components are near-dup clusters —
      // tiny — so full reachability enumeration is cheap in the oracle)
      "q_dedup_clusters" -> s"""WITH RECURSIVE $simhashCandCte,
           |e AS (SELECT id_a, id_b FROM cand
           |      WHERE bit_count(xor(sig_a, sig_b)) <= 3),
           |sym AS (SELECT id_a AS x, id_b AS y FROM e
           |        UNION SELECT id_b, id_a FROM e),
           |reach AS (
           |  SELECT x, x AS r FROM (SELECT DISTINCT x FROM sym)
           |  UNION
           |  SELECT sym.x, reach.r FROM sym JOIN reach ON reach.x = sym.y),
           |lab AS (SELECT x, min(r) AS cluster_id FROM reach GROUP BY x)
           |SELECT d.doc_id,
           |  CAST(coalesce(l.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
           |  coalesce(l.cluster_id, d.doc_id) = d.doc_id AS keep
           |FROM documents d LEFT JOIN lab l ON d.doc_id = l.x
           |ORDER BY d.doc_id""".stripMargin,
      // recrawl consolidation: same planted revisits, max-ts + count
      // per-host cap: row_number replay of the bounded-histogram quota
      // selector (same equivalence as q_stratified_sample — ord, then id)
      "q_host_cap" ->
        s"""WITH d AS (SELECT url,
           |  CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS id,
           |  regexp_extract(url, '^https?://([^/?#]+)', 1) AS host
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |r AS (SELECT url, host,
           |  row_number() OVER (PARTITION BY host
           |    ORDER BY ((id % 1000003) * 2654435761) % 1000003, id) AS rn
           |  FROM d)
           |SELECT url, host FROM r WHERE rn <= 40 ORDER BY url""".stripMargin,
      // CDC chunks: every dumped boundary content-verified — the hash is
      // recomputed from the ORIGINAL payload's hex rendering (the repo's
      // md5-of-uppercase-hex digest convention) at the dumped offsets
      "q_cdc_chunks" ->
        s"""SELECT d.id, d.chunk_no, d.offset, d.len,
           |  md5(substring(hex(n.html), CAST(2*d.offset+1 AS BIGINT),
           |    CAST(2*d.len AS BIGINT))) AS chunk_hash
           |FROM read_parquet('${VerifyTables.oracleGlob("cdc_chunks")}') d
           |JOIN read_parquet('${VerifyTables.oracleGlob("northrule")}') n
           |  ON d.id = n.url
           |ORDER BY d.id, d.chunk_no""".stripMargin,
      // chunk-store dedup report replayed from the dump
      "q_cdc_stats" ->
        s"""WITH g AS (SELECT chunk_hash, CAST(count(*) AS BIGINT) AS copies,
           |    CAST(min(len) AS BIGINT) AS len
           |  FROM read_parquet('${VerifyTables.oracleGlob("cdc_chunks")}')
           |  GROUP BY chunk_hash)
           |SELECT CAST(sum(copies) AS BIGINT) AS n_chunks,
           |  CAST(count(*) AS BIGINT) AS n_distinct_chunks,
           |  CAST(sum(copies * len) AS BIGINT) AS total_bytes,
           |  CAST(sum(len) AS BIGINT) AS unique_bytes
           |FROM g""".stripMargin,
      // CDC delta: anti-join replayed from the two dumps; each delta
      // chunk's hash recomputed against the edited payload RECONSTRUCTED
      // by hex surgery (same midpoint + marker as the Spark builder)
      "q_cdc_delta" ->
        s"""WITH a AS (SELECT DISTINCT chunk_hash
           |  FROM read_parquet('${VerifyTables.oracleGlob("cdc_chunks")}')),
           |nb AS (SELECT url,
           |    substring(hex(html), 1, CAST(2*(octet_length(html)//2) AS BIGINT))
           |      || hex(CAST('<!-- rev2 -->' AS BLOB))
           |      || substring(hex(html), CAST(2*(octet_length(html)//2)+1 AS BIGINT)) AS bhex
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')
           |  WHERE CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) % 7 = 0)
           |SELECT b.id, b.chunk_no, b.offset, b.len,
           |  md5(substring(nb.bhex, CAST(2*b.offset+1 AS BIGINT),
           |    CAST(2*b.len AS BIGINT))) AS chunk_hash
           |FROM read_parquet('${VerifyTables.oracleGlob("cdc_chunks_b")}') b
           |JOIN nb ON b.id = nb.url
           |WHERE b.chunk_hash NOT IN (SELECT chunk_hash FROM a)
           |ORDER BY b.id, b.chunk_no""".stripMargin,

      // bitext candidates: identical edge synthesis + normalization +
      // lang-differ + cross-multiplied ratio gate, token counts from the
      // same split/filter replay as q_token_count
      "q_bitext_candidates" ->
        s"""WITH d AS (SELECT url,
           |    CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS id,
           |    lang,
           |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
           |      x -> x <> '')) AS BIGINT) AS n
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |e AS (SELECT a.url AS u1, b.url AS u2
           |  FROM d a JOIN d b ON a.id % 5 = 0 AND b.id = a.id + 1),
           |ne AS (SELECT DISTINCT least(u1, u2) AS url_a,
           |    greatest(u1, u2) AS url_b FROM e WHERE u1 <> u2)
           |SELECT url_a, url_b, da.lang AS lang_a, db.lang AS lang_b,
           |  da.n AS n_tokens_a, db.n AS n_tokens_b
           |FROM ne JOIN d da ON ne.url_a = da.url JOIN d db ON ne.url_b = db.url
           |WHERE da.lang <> db.lang AND da.n > 0 AND db.n > 0
           |  AND da.n * 100 <= db.n * 200 AND db.n * 100 <= da.n * 200
           |ORDER BY url_a, url_b""".stripMargin,

      // polite frontier: budget join + per-host variable cap replayed
      // from the robots_delays dump with the q_host_cap ord replay
      "q_polite_frontier" ->
        s"""WITH d AS (SELECT url,
           |  CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS id,
           |  regexp_extract(url, '^https?://([^/?#]+)', 1) AS host
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |b AS (SELECT host, crawl_delay_sec, max_fetches
           |  FROM read_parquet('${VerifyTables.oracleGlob("robots_delays")}')),
           |r AS (SELECT url, host,
           |  row_number() OVER (PARTITION BY host
           |    ORDER BY ((id % 1000003) * 2654435761) % 1000003, id) AS rn
           |  FROM d)
           |SELECT url, r.host, crawl_delay_sec, max_fetches
           |FROM r JOIN b ON r.host = b.host
           |WHERE rn <= max_fetches ORDER BY url""".stripMargin,

      // top-k per host: row_number replay ordered by (-score, id)
      "q_host_topk" ->
        s"""WITH d AS (SELECT url,
           |  CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS id,
           |  regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           |  CAST(length(text) AS BIGINT) AS score
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |r AS (SELECT url, host, score,
           |  row_number() OVER (PARTITION BY host ORDER BY -score, id) AS rn
           |  FROM d)
           |SELECT url, host, score FROM r WHERE rn <= 3 ORDER BY url""".stripMargin,
      // snapshot delta: text equality replays the digest compare (the
      // same hash-for-text equivalence the dedup oracles pin)
      // feed discovery: known/new decision replayed from the
      // independently-dumped parsed entries vs the snapshot urls
      "q_feed_discovery" ->
        s"""WITH f AS (SELECT host, item_url, title,
           |    CAST(floor(epoch(published)) AS BIGINT) AS published_ts
           |  FROM read_parquet('${g("feed_entries")}')),
           |snap AS (SELECT url FROM read_parquet('${g("northrule")}'))
           |SELECT f.host, f.item_url, f.title, f.published_ts,
           |  (s.url IS NOT NULL) AS known
           |FROM f LEFT JOIN snap s ON s.url = f.item_url
           |ORDER BY host, item_url""".stripMargin,
      // as-of join: DuckDB's NATIVE ASOF LEFT JOIN operator replays the
      // same probes/versions — two independent engine implementations of
      // the temporal-join semantics must agree row for row
      "q_asof_join" ->
        s"""WITH base AS (SELECT url, warc_ts,
           |    CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS n
           |  FROM read_parquet('${g("northrule")}')),
           |vers AS (
           |  SELECT url, warc_ts AS vts, CAST(1 AS BIGINT) AS version_no FROM base
           |  UNION ALL SELECT url, warc_ts + INTERVAL 1 HOUR, 2 FROM base WHERE n % 7 = 0
           |  UNION ALL SELECT url, warc_ts + INTERVAL 2 HOUR, 3 FROM base WHERE n % 14 = 0),
           |probes AS (
           |  SELECT url, warc_ts + INTERVAL 90 MINUTE AS pts FROM base
           |  UNION ALL SELECT url, warc_ts - INTERVAL 30 MINUTE FROM base)
           |SELECT p.url,
           |  CAST(floor(epoch(p.pts)) AS BIGINT) AS probe_ts,
           |  CAST(coalesce(floor(epoch(v.vts)), 0) AS BIGINT) AS version_ts,
           |  CAST(coalesce(v.version_no, 0) AS BIGINT) AS version_no
           |FROM probes p ASOF LEFT JOIN vers v
           |  ON p.url = v.url AND p.pts >= v.vts
           |ORDER BY p.url, probe_ts""".stripMargin,
      // registered-domain rollup: identical plants; the PSL-lite suffix
      // set interpolates from the SAME Scala constant the live operator
      // uses, the eTLD+1 CASE is re-derived over split labels
      "q_domain_rollup" ->
        s"""WITH base AS (SELECT url,
           |    CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS n
           |  FROM read_parquet('${g("northrule")}')),
           |aug AS (
           |  SELECT url FROM base
           |  UNION ALL SELECT 'https://a.shop' || (n % 10) || '.co.uk/p' || n
           |    FROM base WHERE n % 6 = 0
           |  UNION ALL SELECT 'https://b.shop' || (n % 10) || '.co.uk/p' || n
           |    FROM base WHERE n % 9 = 0
           |  UNION ALL SELECT 'https://www.site' || (n % 10) || '.example/q' || n
           |    FROM base WHERE n % 11 = 0),
           |h AS (SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host
           |  FROM aug),
           |r AS (SELECT host, string_split(host, '.') AS ls FROM h WHERE host <> ''),
           |d AS (SELECT host,
           |    CASE WHEN len(ls) >= 3 AND (ls[-2] || '.' || ls[-1]) IN
           |        (${graft.ops.LinkOps.MultiLabelSuffixes.map(x => s"'$x'").mkString(", ")})
           |      THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
           |      WHEN len(ls) >= 2 THEN ls[-2] || '.' || ls[-1]
           |      ELSE host END AS registered_domain
           |  FROM r)
           |SELECT registered_domain, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
           |FROM d GROUP BY registered_domain ORDER BY registered_domain""".stripMargin,
      // crawler traps: identical plants, digit-collapse template, md5
      // contents, both distinct counts and the ratio gate re-derived
      "q_crawl_traps" ->
        s"""WITH base AS (SELECT url, text,
           |    CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS n
           |  FROM read_parquet('${g("northrule")}')),
           |aug AS (
           |  SELECT url, text FROM base
           |  UNION ALL SELECT 'https://trap.example/cal?day=' || n,
           |    'trap calendar page' FROM base WHERE n % 5 = 0
           |  UNION ALL SELECT 'https://big.example/article/' || n, text
           |    FROM base WHERE n % 7 = 0),
           |t AS (SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           |    regexp_replace(regexp_extract(url, '^https?://[^/?#]+(.*)$$', 1),
           |      '[0-9]+', 'N', 'g') AS url_pattern,
           |    url, md5(text) AS d FROM aug),
           |a AS (SELECT host, url_pattern,
           |    count(DISTINCT url) AS n_urls, count(DISTINCT d) AS n_contents
           |  FROM t WHERE host <> '' GROUP BY host, url_pattern)
           |SELECT host, url_pattern, CAST(n_urls AS BIGINT) AS n_urls,
           |  CAST(n_contents AS BIGINT) AS n_contents,
           |  CAST(n_contents * 1000000 // n_urls AS BIGINT) AS content_ratio_ppm,
           |  (n_urls >= 20 AND n_contents * 1000000 // n_urls <= 200000) AS is_trap
           |FROM a ORDER BY host, url_pattern""".stripMargin,
      "q_crawl_delta" ->
        s"""WITH a AS (SELECT url, text,
           |  CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS id
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |b AS (
           |  SELECT url,
           |    CASE WHEN id % 11 = 0 THEN text || ' updated' ELSE text END AS text
           |  FROM a WHERE id % 13 <> 0
           |  UNION ALL
           |  SELECT url || '?v=2' AS url, text FROM a WHERE id % 17 = 0),
           |j AS (SELECT coalesce(a.url, b.url) AS url, a.text AS ta, b.text AS tb
           |      FROM a FULL OUTER JOIN b ON a.url = b.url)
           |SELECT url, CASE WHEN ta IS NULL THEN 'new'
           |  WHEN tb IS NULL THEN 'deleted'
           |  WHEN ta = tb THEN 'unchanged' ELSE 'changed' END AS status
           |FROM j ORDER BY url""".stripMargin,
      // incremental re-extraction: the donor-substitution rewrite lets
      // DuckDB produce every output row from the dumped FULL extraction
      // table — changed/new urls map to their payload-donor's row, so any
      // url-dependence in the kernel or mis-routed reuse would mismatch
      "q_incremental_extract" ->
        s"""WITH a AS (SELECT url,
           |  CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS id
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |d AS (SELECT url, n_pages, extracted_text, filtered, error
           |  FROM read_parquet('${VerifyTables.oracleGlob("extract_docs")}')),
           |b AS (
           |  SELECT url,
           |    CASE WHEN id % 11 = 0 AND id > 0 THEN 'extracted'
           |         ELSE 'reused' END AS source,
           |    CASE WHEN id % 11 = 0 AND id > 0 THEN id - 1 ELSE id END AS src_id
           |  FROM a WHERE id % 13 <> 0
           |  UNION ALL
           |  SELECT url || '?v=2' AS url, 'extracted' AS source, id AS src_id
           |  FROM a WHERE id % 17 = 0),
           |s AS (SELECT b.url, b.source, a2.url AS src_url
           |      FROM b JOIN a a2 ON a2.id = b.src_id)
           |SELECT s.url, s.source, d.n_pages, d.extracted_text, d.filtered,
           |       d.error
           |FROM s JOIN d ON d.url = s.src_url ORDER BY s.url""".stripMargin,
      "q_url_revisit" ->
        s"""WITH base AS (SELECT url, warc_ts
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |rev1 AS (SELECT url, warc_ts + INTERVAL 1 HOUR AS warc_ts FROM base
           |  WHERE CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) % 7 = 0),
           |rev2 AS (SELECT url, warc_ts + INTERVAL 2 HOUR AS warc_ts FROM base
           |  WHERE CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) % 14 = 0),
           |u AS (SELECT * FROM base UNION ALL SELECT * FROM rev1
           |      UNION ALL SELECT * FROM rev2)
           |SELECT url, max(warc_ts) AS latest_ts,
           |  CAST(count(*) AS BIGINT) AS n_versions
           |FROM u GROUP BY url ORDER BY url""".stripMargin,
      // recrawl schedule: planted history + lag-window change detection
      // + the integral interval policy, all replayed from the ORIGINAL
      // parquet (epoch_ms // 1000 ≡ unix_seconds truncation on
      // non-negative epochs; // ≡ DIV throughout)
      "q_recrawl_schedule" ->
        s"""WITH b AS (SELECT url, warc_ts, md5(hex(html)) AS digest,
           |    CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS n
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |h AS (
           |  SELECT url, warc_ts, digest FROM b
           |  UNION ALL
           |  SELECT url, warc_ts + INTERVAL 1 HOUR,
           |    CASE WHEN n % 21 = 0 THEN md5(digest || 'v2') ELSE digest END
           |  FROM b WHERE n % 7 = 0
           |  UNION ALL
           |  SELECT url, warc_ts + INTERVAL 3 HOUR, md5(digest || 'v3')
           |  FROM b WHERE n % 14 = 0),
           |m AS (SELECT url, epoch_ms(warc_ts) // 1000 AS ts_sec, digest,
           |    lag(digest) OVER (PARTITION BY url
           |      ORDER BY epoch_ms(warc_ts) // 1000, digest) AS prev
           |  FROM h),
           |a AS (SELECT url, CAST(count(*) AS BIGINT) AS n_versions,
           |    CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> digest
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
           |    CAST(max(ts_sec) - min(ts_sec) AS BIGINT) AS span_sec,
           |    max(ts_sec) AS last_sec
           |  FROM m GROUP BY url),
           |i AS (SELECT *,
           |    greatest(3600, least(604800,
           |      CASE WHEN n_versions < 2 THEN 86400
           |           WHEN n_changes = 0 THEN (span_sec // (n_versions - 1)) * 2
           |           ELSE span_sec // n_changes END)) AS niv
           |  FROM a)
           |SELECT url, n_versions, n_changes, span_sec,
           |  CAST(CASE WHEN n_versions >= 2
           |    THEN (n_changes * 1000000) // (n_versions - 1)
           |    ELSE 0 END AS BIGINT) AS change_ratio_ppm,
           |  CAST(niv AS BIGINT) AS next_interval_sec,
           |  CAST(last_sec + niv AS BIGINT) AS next_crawl_sec
           |FROM i ORDER BY url""".stripMargin,

      // snapshot change magnitude: planted history + lag pairing + the
      // q_extract_quality multiset-overlap formulation keyed by
      // (url, version ts) — epoch_ms ≡ unix_millis on the shared parquet
      // instants, // ≡ DIV on the nonnegative counts
      "q_change_magnitude" ->
        s"""WITH b AS (SELECT url, warc_ts, text,
           |    CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS n
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |h AS (
           |  SELECT url, warc_ts, text FROM b
           |  UNION ALL
           |  SELECT url, warc_ts + INTERVAL 1 HOUR,
           |    CASE WHEN n % 21 = 0 THEN text || ' freshly minted update tokens'
           |         ELSE text END
           |  FROM b WHERE n % 7 = 0
           |  UNION ALL
           |  SELECT url, warc_ts + INTERVAL 3 HOUR, text || ' ' || text
           |  FROM b WHERE n % 14 = 0),
           |v AS (SELECT url, epoch_ms(warc_ts) AS ts_ms, text,
           |    lag(text) OVER (PARTITION BY url ORDER BY warc_ts) AS prev_text,
           |    lag(epoch_ms(warc_ts)) OVER (PARTITION BY url ORDER BY warc_ts)
           |      AS prev_ts_ms
           |  FROM h),
           |d AS (SELECT url, ts_ms, prev_ts_ms, text, prev_text FROM v
           |  WHERE prev_ts_ms IS NOT NULL),
           |ta AS (SELECT url, ts_ms, unnest(regexp_split_to_array(
           |  lower(coalesce(text, '')), '[ \\t\\n\\r\\f]+')) AS tok FROM d),
           |tb AS (SELECT url, ts_ms, unnest(regexp_split_to_array(
           |  lower(coalesce(prev_text, '')), '[ \\t\\n\\r\\f]+')) AS tok FROM d),
           |ac AS (SELECT url, ts_ms, tok, count(*) AS c FROM ta
           |  WHERE tok <> '' GROUP BY 1, 2, 3),
           |bc AS (SELECT url, ts_ms, tok, count(*) AS c FROM tb
           |  WHERE tok <> '' GROUP BY 1, 2, 3),
           |ax AS (SELECT url, ts_ms, CAST(sum(c) AS BIGINT) AS n_curr
           |  FROM ac GROUP BY 1, 2),
           |bx AS (SELECT url, ts_ms, CAST(sum(c) AS BIGINT) AS n_prev
           |  FROM bc GROUP BY 1, 2),
           |iv AS (SELECT ac.url, ac.ts_ms,
           |    CAST(sum(least(ac.c, bc.c)) AS BIGINT) AS n_inter
           |  FROM ac JOIN bc ON ac.url = bc.url AND ac.ts_ms = bc.ts_ms
           |    AND ac.tok = bc.tok GROUP BY 1, 2),
           |j AS (SELECT d.url, d.ts_ms, d.prev_ts_ms,
           |    coalesce(ax.n_curr, 0) AS n_curr,
           |    coalesce(bx.n_prev, 0) AS n_prev,
           |    coalesce(iv.n_inter, 0) AS n_inter
           |  FROM d LEFT JOIN ax ON d.url = ax.url AND d.ts_ms = ax.ts_ms
           |  LEFT JOIN bx ON d.url = bx.url AND d.ts_ms = bx.ts_ms
           |  LEFT JOIN iv ON d.url = iv.url AND d.ts_ms = iv.ts_ms),
           |p AS (SELECT url, ts_ms, prev_ts_ms, n_curr, n_prev, n_inter,
           |  CASE WHEN n_curr = 0 THEN 0
           |       ELSE n_inter * 1000000 // n_curr END AS precision_ppm,
           |  CASE WHEN n_prev = 0 THEN 0
           |       ELSE n_inter * 1000000 // n_prev END AS recall_ppm
           |  FROM j),
           |f AS (SELECT *, CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
           |       ELSE 2 * precision_ppm * recall_ppm
           |            // (precision_ppm + recall_ppm) END AS f1_ppm
           |  FROM p)
           |SELECT url, ts_ms, prev_ts_ms, n_curr, n_prev, n_inter,
           |  precision_ppm, recall_ppm, f1_ppm,
           |  1000000 - f1_ppm AS change_ppm
           |FROM f ORDER BY url, ts_ms""".stripMargin,

      // domain blocklist: equals-or-subdomain replayed as suffix LIKE
      "q_domain_filter" ->
        s"""WITH docs AS (SELECT url,
           |    regexp_extract(url, '^https?://([^/?#]+)', 1) AS host
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |blk(domain) AS (VALUES ('host7.example'), ('host13.example')),
           |blocked AS (SELECT DISTINCT d.url FROM docs d JOIN blk b
           |  ON d.host = b.domain OR d.host LIKE '%.' || b.domain)
           |SELECT url, host FROM docs
           |WHERE url NOT IN (SELECT url FROM blocked) ORDER BY url""".stripMargin,
      // mixture resample: integral quota math (T = min (n·1e6)//w,
      // k = (w·T)//1e6) + the same permutation-order selection as
      // q_stratified_sample
      "q_mixture_resample" ->
        """WITH d AS (SELECT doc_id, lang,
          |  ((doc_id % 1000003) * 2654435761) % 1000003 AS ord FROM documents),
          |tgt(lang, w) AS (VALUES ('en', 400000), ('zh', 300000),
          |                        ('ru', 200000), ('nl', 100000)),
          |caps AS (SELECT t.lang, t.w, (n.n * 1000000) // t.w AS cap
          |  FROM tgt t JOIN (SELECT lang, count(*) AS n FROM d GROUP BY lang) n
          |  USING (lang)),
          |tot AS (SELECT min(cap) AS T FROM caps),
          |q AS (SELECT lang, (w * T) // 1000000 AS k FROM caps, tot),
          |r AS (SELECT doc_id, lang,
          |  row_number() OVER (PARTITION BY lang ORDER BY ord, doc_id) AS rn FROM d)
          |SELECT r.doc_id, r.lang FROM r JOIN q USING (lang)
          |WHERE rn <= k ORDER BY doc_id""".stripMargin,
      // bigram LM surprise: same tokenization as q_token_count, corpus
      // counts and per-doc integer mean replayed keyed by word TEXT
      // (Spark keys by xxhash64 — the hash-vs-text oracle trick)
      "q_ngram_surprise" ->
        s"""WITH $surpriseCtes
           |SELECT doc_id, n_bigrams, surprise
           |FROM sc ORDER BY doc_id""".stripMargin,
      // CCNet-style head/middle/tail: the same surprise ladder + integral
      // 33/67 percentile cutoffs over the score histogram (cum·100 ≥
      // pct·n, the q_length_quantiles rule) + the CASE labeling
      "q_ppl_buckets" ->
        s"""WITH $surpriseCtes,
           |h AS (SELECT surprise AS v, count(*) AS c FROM sc GROUP BY v),
           |cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h),
           |n AS (SELECT count(*) AS n FROM sc),
           |q(pct) AS (VALUES (33), (67)),
           |cu AS (SELECT pct, min(v) AS value FROM cum, n, q
           |       WHERE cum * 100 >= pct * n GROUP BY pct),
           |cuts AS (SELECT max(CASE WHEN pct = 33 THEN value END) AS c33,
           |                max(CASE WHEN pct = 67 THEN value END) AS c67 FROM cu)
           |SELECT doc_id, n_bigrams, surprise,
           |  CASE WHEN surprise <= c33 THEN 'head'
           |       WHEN surprise <= c67 THEN 'middle' ELSE 'tail' END AS bucket
           |FROM sc, cuts ORDER BY doc_id""".stripMargin,
      // web graph: aggregation + host parse replayed from the dumped
      // per-document link table (resolution itself is sbt-test-pinned)
      "q_link_extract" ->
        s"""SELECT src, CAST(count(*) AS BIGINT) AS n_links,
           |  CAST(count(DISTINCT regexp_extract(dst, '^https?://([^/?#]+)', 1)) AS BIGINT)
           |    AS n_dst_hosts
           |FROM read_parquet('${VerifyTables.oracleGlob("links")}')
           |GROUP BY src ORDER BY src""".stripMargin,
      // C4 line filter: the same line rules replayed over the dumped
      // extraction output (RE2-safe patterns shared verbatim)
      "q_c4_filter" ->
        s"""WITH d AS (SELECT url, coalesce(extracted_text, '') AS t
           |  FROM read_parquet('${VerifyTables.oracleGlob("extract_docs")}')),
           |f AS (SELECT url, t,
           |  len(string_split(t, chr(10))) AS n_lines,
           |  list_filter(string_split(t, chr(10)), l ->
           |    regexp_matches(l, '[.!?"]\\s*$$')
           |    AND len(list_filter(regexp_split_to_array(trim(l), '\\s+'),
           |          w -> w <> '')) >= 5
           |    AND NOT contains(lower(l), 'javascript')) AS kept FROM d),
           |g AS (SELECT url, t, n_lines, kept,
           |  -- DuckDB array_to_string([]) is NULL, not '' (q_span_scrub lesson)
           |  coalesce(array_to_string(kept, chr(10)), '') AS clean FROM f)
           |SELECT url, CAST(n_lines AS BIGINT) AS n_lines,
           |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
           |  CAST(length(regexp_replace(clean, '[^.!?]', '', 'g')) AS BIGINT)
           |    AS n_sentences,
           |  (NOT contains(lower(t), 'lorem ipsum') AND NOT contains(t, '{')
           |   AND length(regexp_replace(clean, '[^.!?]', '', 'g')) >= 3)
           |    AS page_keep,
           |  clean AS text_clean
           |FROM g ORDER BY url""".stripMargin,
      // within-doc line dedup: first-occurrence order via min line index
      "q_doc_line_dedup" ->
        s"""WITH d AS (SELECT url,
           |  string_split(coalesce(extracted_text, ''), chr(10)) AS ls
           |  FROM read_parquet('${VerifyTables.oracleGlob("extract_docs")}')),
           |l AS (SELECT url, generate_subscripts(ls, 1) - 1 AS i,
           |  unnest(ls) AS line FROM d),
           |f AS (SELECT url, line, min(i) AS i FROM l GROUP BY url, line),
           |a AS (SELECT url, CAST(count(*) AS BIGINT) AS n_unique_lines,
           |  string_agg(line, chr(10) ORDER BY i) AS text_dedup
           |  FROM f GROUP BY url)
           |SELECT d.url, CAST(len(d.ls) AS BIGINT) AS n_lines,
           |  a.n_unique_lines, a.text_dedup
           |FROM d JOIN a USING (url) ORDER BY d.url""".stripMargin,
      // corpus-global line dedup: row_number over the line TEXT (hash-for-
      // text equivalence — an xxhash64 collision in Spark would mismatch),
      // first occurrence = (url, idx) order; left join keeps fully-deduped
      // docs as empty rewrites
      "q_line_dedup_global" ->
        s"""WITH d AS (SELECT url,
           |  string_split(coalesce(extracted_text, ''), chr(10)) AS ls
           |  FROM read_parquet('${VerifyTables.oracleGlob("extract_docs")}')),
           |l AS (SELECT url, generate_subscripts(ls, 1) - 1 AS idx,
           |  unnest(ls) AS line FROM d),
           |r AS (SELECT url, idx, line,
           |  row_number() OVER (PARTITION BY line ORDER BY url, idx) AS rn
           |  FROM l),
           |k AS (SELECT url, CAST(count(*) AS BIGINT) AS n_kept_lines,
           |  string_agg(line, chr(10) ORDER BY idx) AS text_dedup
           |  FROM r WHERE rn = 1 GROUP BY url)
           |SELECT d.url, CAST(len(d.ls) AS BIGINT) AS n_lines,
           |  coalesce(k.n_kept_lines, 0) AS n_kept_lines,
           |  coalesce(k.text_dedup, '') AS text_dedup
           |FROM d LEFT JOIN k USING (url) ORDER BY d.url""".stripMargin,
      // noindex filter: the planted every-5th pattern replayed
      // relationally (the HTML meta parse itself is pinned in LinkOpsSpec)
      "q_noindex_filter" ->
        s"""SELECT url FROM (SELECT url,
           |  CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS n
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}'))
           |WHERE n % 5 <> 0 ORDER BY url""".stripMargin,
      // robots.txt enforcement: the RFC 9309 decision — longest matching
      // prefix wins, Allow wins length ties — replayed from the dumped
      // per-host rules (the parse is pinned by RobotsSpec; Spark's
      // max(struct(len, is_allow, prefix)) IS this window's row 1)
      "q_robots_filter" ->
        s"""WITH u AS (
           |  SELECT url, lang,
           |    regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           |    CASE WHEN length(regexp_extract(url, '^https?://[^/?#]+(/[^?#]*)', 1)) = 0
           |         THEN '/' ELSE regexp_extract(url, '^https?://[^/?#]+(/[^?#]*)', 1)
           |    END AS p
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |m AS (
           |  SELECT u.url, r.is_allow,
           |    row_number() OVER (PARTITION BY u.url
           |      ORDER BY length(r.prefix) DESC, r.is_allow DESC, r.prefix DESC) AS rn
           |  FROM u JOIN read_parquet('${VerifyTables.oracleGlob("robots_rules")}') r
           |    ON u.host = r.host AND starts_with(u.p, r.prefix)),
           |dis AS (SELECT url FROM m WHERE rn = 1 AND NOT is_allow)
           |SELECT u.url, u.lang FROM u
           |LEFT JOIN dis ON u.url = dis.url
           |WHERE dis.url IS NULL ORDER BY u.url""".stripMargin,
      // sitemap recrawl: the new/stale/index decision replayed from the
      // dumped per-host entries (parsed by the real parser in a separate
      // pass; parse fixtures pinned in LinkOpsSpec) against the corpus
      // snapshot's warc_ts
      "q_sitemap_recrawl" ->
        s"""WITH e AS (SELECT host, loc, lastmod, is_index
           |  FROM read_parquet('${VerifyTables.oracleGlob("sitemap_entries")}')),
           |n AS (SELECT url, warc_ts
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |u AS (SELECT e.loc AS url,
           |    CASE WHEN e.is_index THEN 'index'
           |         WHEN n.url IS NULL THEN 'new'
           |         WHEN e.lastmod > n.warc_ts THEN 'stale' END AS status,
           |    e.lastmod
           |  FROM e LEFT JOIN n ON e.loc = n.url)
           |SELECT url, status, lastmod FROM u WHERE status IS NOT NULL
           |ORDER BY url""".stripMargin,
      // hreflang clusters: symmetric-transitive closure over the dumped
      // alternates edges with STRING urls (min-reachable-url label), so
      // the live query's hash-id internals are replayed hash-free
      "q_hreflang_clusters" ->
        s"""WITH RECURSIVE
           |a AS (SELECT url, hreflang, alt_url
           |  FROM read_parquet('${VerifyTables.oracleGlob("alternates")}')),
           |sym AS (SELECT url AS x, alt_url AS y FROM a
           |        UNION SELECT alt_url, url FROM a),
           |reach AS (
           |  SELECT x, x AS r FROM (SELECT DISTINCT x FROM sym)
           |  UNION
           |  SELECT sym.x, reach.r FROM sym JOIN reach ON reach.x = sym.y),
           |lab AS (SELECT x AS url, min(r) AS cluster_url FROM reach GROUP BY x),
           |langs AS (SELECT alt_url AS url,
           |  string_agg(DISTINCT hreflang, ',' ORDER BY hreflang) AS langs
           |  FROM a GROUP BY alt_url)
           |SELECT l.url, l.cluster_url, coalesce(g.langs, '') AS langs
           |FROM lab l LEFT JOIN langs g ON l.url = g.url
           |ORDER BY l.url""".stripMargin,
      // sitemap discovery: the host-join replayed from the dumped
      // robots_sitemaps table against counts computed straight from the
      // corpus parquet (parse pinned by RobotsRedirectSpec fixtures)
      "q_sitemap_discovery" ->
        s"""WITH h AS (
           |  SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           |    CAST(count(*) AS BIGINT) AS n_docs
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')
           |  GROUP BY 1)
           |SELECT r.host, r.sitemap_url, h.n_docs
           |FROM read_parquet('${VerifyTables.oracleGlob("robots_sitemaps")}') r
           |JOIN h ON r.host = h.host
           |ORDER BY r.host, r.sitemap_url""".stripMargin,
      // WARC round-trip: the parser's output over the synthesized
      // archive files must reproduce the ORIGINAL northrule table —
      // url, timestamp, byte length and payload digest checked straight
      // against the source parquet (the strongest oracle class here:
      // nothing on the oracle side touches the archive bytes at all).
      // hex() is uppercase-no-separator in both engines, so
      // md5(hex(blob)) is engine-portable where md5(blob) is not.
      "q_warc_roundtrip" ->
        s"""SELECT url, warc_ts, octet_length(html) AS n_bytes,
           |  md5(hex(html)) AS payload_md5
           |FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')
           |ORDER BY url""".stripMargin,
      "q_warc_gz_roundtrip" ->
        s"""SELECT url, warc_ts, octet_length(html) AS n_bytes,
           |  md5(hex(html)) AS payload_md5
           |FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')
           |ORDER BY url""".stripMargin,
      // image near-dup: band LSH + popcount verify replayed from the
      // independently-dumped perceptual-hash table (shift+mask band
      // extraction identical on both engines; the sign-extending >> is
      // masked to the low 16 bits so arithmetic-vs-logical shift can't
      // diverge)
      "q_image_neardup" ->
        s"""WITH h AS (
           |  SELECT media_id, dhash
           |  FROM read_parquet('${VerifyTables.oracleGlob("image_dhash")}')
           |  WHERE error = ''
           |), b AS (
           |  SELECT media_id, dhash, band, (dhash >> (16 * band)) & 65535 AS bv
           |  FROM h, (SELECT unnest([0, 1, 2, 3]) AS band)
           |), cand AS (
           |  SELECT DISTINCT a.media_id AS id_a, c.media_id AS id_b,
           |    a.dhash AS da, c.dhash AS db
           |  FROM b a JOIN b c ON a.band = c.band AND a.bv = c.bv
           |    AND a.media_id < c.media_id
           |)
           |SELECT id_a, id_b, CAST(bit_count(xor(da, db)) AS BIGINT) AS hamming
           |FROM cand WHERE bit_count(xor(da, db)) <= 3
           |ORDER BY id_a, id_b""".stripMargin,
      // audio near-dup: identical replay shape over the audio hash dump
      "q_audio_neardup" ->
        s"""WITH h AS (
           |  SELECT media_id, dhash
           |  FROM read_parquet('${VerifyTables.oracleGlob("audio_dhash")}')
           |  WHERE error = ''
           |), b AS (
           |  SELECT media_id, dhash, band, (dhash >> (16 * band)) & 65535 AS bv
           |  FROM h, (SELECT unnest([0, 1, 2, 3]) AS band)
           |), cand AS (
           |  SELECT DISTINCT a.media_id AS id_a, c.media_id AS id_b,
           |    a.dhash AS da, c.dhash AS db
           |  FROM b a JOIN b c ON a.band = c.band AND a.bv = c.bv
           |    AND a.media_id < c.media_id
           |)
           |SELECT id_a, id_b, CAST(bit_count(xor(da, db)) AS BIGINT) AS hamming
           |FROM cand WHERE bit_count(xor(da, db)) <= 3
           |ORDER BY id_a, id_b""".stripMargin,
      // video near-dup: frame-level banding + popcount, then the doc-level
      // matched-frames / min-hamming grouping — all from the per-frame dump
      "q_video_neardup" ->
        s"""WITH h AS (
           |  SELECT media_id, frame_no, dhash
           |  FROM read_parquet('${VerifyTables.oracleGlob("video_frame_dhash")}')
           |  WHERE error = ''
           |), b AS (
           |  SELECT media_id, frame_no, dhash, band,
           |    (dhash >> (16 * band)) & 65535 AS bv
           |  FROM h, (SELECT unnest([0, 1, 2, 3]) AS band)
           |), cand AS (
           |  SELECT DISTINCT a.media_id AS id_a, a.frame_no AS fa,
           |    c.media_id AS id_b, c.frame_no AS fb, a.dhash AS da, c.dhash AS db
           |  FROM b a JOIN b c ON a.band = c.band AND a.bv = c.bv
           |    AND a.media_id < c.media_id
           |), m AS (
           |  SELECT id_a, id_b, bit_count(xor(da, db)) AS hm
           |  FROM cand WHERE bit_count(xor(da, db)) <= 3
           |)
           |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS matched_frames,
           |  CAST(min(hm) AS BIGINT) AS min_hamming
           |FROM m GROUP BY id_a, id_b
           |ORDER BY id_a, id_b""".stripMargin,
      // block features: independent-pass dump replay (two runs of the
      // same kernel must agree on every block)
      "q_block_features" ->
        s"""SELECT url, block_no, tag, text, n_chars, n_link_chars, n_words
           |FROM read_parquet('${VerifyTables.oracleGlob("html_blocks")}')
           |ORDER BY url, block_no""".stripMargin,
      // main content: jusText-style classification (cross-multiplied
      // link-density threshold) + ordered assembly replayed from the dump
      "q_main_content" ->
        s"""WITH c AS (SELECT url, block_no, text,
           |    (n_words >= 10 AND n_link_chars * 1000000 <= 300000 * n_chars)
           |      AS is_content
           |  FROM read_parquet('${VerifyTables.oracleGlob("html_blocks")}'))
           |SELECT url,
           |  coalesce(string_agg(CASE WHEN is_content THEN text END,
           |    e'\\n\\n' ORDER BY block_no), '') AS main_text,
           |  CAST(sum(CASE WHEN is_content THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_content_blocks,
           |  CAST(count(*) AS BIGINT) AS n_blocks
           |FROM c GROUP BY url ORDER BY url""".stripMargin,

      // WAT round-trip: expected title from the page_meta dump (restricted
      // to corpus urls — the dump also carries planted canonical docs),
      // link counts from the links dump, timestamps from the ORIGINAL
      // parquet; the JSON encoding itself is never consulted
      "q_wat_roundtrip" ->
        s"""WITH n AS (SELECT url, warc_ts
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |t AS (SELECT url, title
           |  FROM read_parquet('${VerifyTables.oracleGlob("page_meta")}')),
           |l AS (SELECT src AS url, CAST(count(*) AS BIGINT) AS n_links
           |  FROM read_parquet('${VerifyTables.oracleGlob("links")}') GROUP BY src)
           |SELECT n.url, n.warc_ts, coalesce(t.title, '') AS title,
           |  CAST(coalesce(l.n_links, 0) AS BIGINT) AS n_links
           |FROM n LEFT JOIN t USING (url) LEFT JOIN l USING (url)
           |ORDER BY url""".stripMargin,

      // archive-to-archive composition: identical expectation to
      // q_wet_roundtrip — the WARC leg must be invisible
      "q_archive_pipeline" ->
        s"""WITH t AS (
           |  SELECT url, string_agg(md, e'\\n\\n---\\n\\n' ORDER BY page_no) AS text
           |  FROM read_parquet('${VerifyTables.oracleGlob("extract_pages")}')
           |  GROUP BY url
           |)
           |SELECT t.url, n.warc_ts, t.text
           |FROM t JOIN read_parquet('${VerifyTables.oracleGlob("northrule")}') n
           |  USING (url)
           |ORDER BY url""".stripMargin,

      // WET round-trip: expected text re-assembled from the page dumps,
      // expected timestamp from the ORIGINAL corpus parquet — the
      // archive bytes themselves are never consulted by the oracle
      "q_wet_roundtrip" ->
        s"""WITH t AS (
           |  SELECT url, string_agg(md, e'\\n\\n---\\n\\n' ORDER BY page_no) AS text
           |  FROM read_parquet('${VerifyTables.oracleGlob("extract_pages")}')
           |  GROUP BY url
           |)
           |SELECT t.url, n.warc_ts, t.text
           |FROM t JOIN read_parquet('${VerifyTables.oracleGlob("northrule")}') n
           |  USING (url)
           |ORDER BY url""".stripMargin,

      // CDX index: SURT urlkey (same documented subset as Warc.surt),
      // UTC ts14 and payload digest all recomputed from the ORIGINAL
      // corpus parquet — fully independent of the archive bytes
      "q_cdx_index" ->
        s"""WITH t AS (
           |  SELECT url, warc_ts, html,
           |    regexp_replace(regexp_replace(url, '^[Hh][Tt][Tt][Pp][Ss]?://', ''),
           |                   '#.*$$', '') AS s
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')
           |), p AS (
           |  SELECT url, warc_ts, html,
           |    regexp_extract(s, '^([^/?]*)', 1) AS hostport,
           |    substr(s, length(regexp_extract(s, '^([^/?]*)', 1)) + 1) AS rest
           |  FROM t
           |), h AS (
           |  SELECT url, warc_ts, html,
           |    CASE WHEN starts_with(regexp_replace(lower(hostport), ':(80|443)$$', ''), 'www.')
           |         THEN substr(regexp_replace(lower(hostport), ':(80|443)$$', ''), 5)
           |         ELSE regexp_replace(lower(hostport), ':(80|443)$$', '') END AS host,
           |    CASE WHEN rest = '' THEN '/'
           |         WHEN substr(rest, 1, 1) = '?' THEN '/' || rest
           |         ELSE rest END AS rest2
           |  FROM p
           |)
           |SELECT array_to_string(list_reverse(string_split(host, '.')), ',') || ')' || rest2 AS urlkey,
           |  strftime(warc_ts, '%Y%m%d%H%M%S') AS ts14, url, md5(hex(html)) AS digest
           |FROM h ORDER BY url""".stripMargin,
      // archive-to-extraction composition: extraction off .warc.gz bytes
      // must equal the plain-corpus page-dump re-assembly (same SQL as
      // x_extract_full)
      "q_warc_pipeline" ->
        s"""SELECT url,
           |CAST(count(*) AS BIGINT) AS n_pages,
           |string_agg(md, e'\\n\\n---\\n\\n' ORDER BY page_no) AS md,
           |string_agg(md_nohf, e'\\n\\n---\\n\\n' ORDER BY page_no) AS md_nohf,
           |coalesce(string_agg(CASE WHEN extracted_text <> '' THEN extracted_text END, e'\\n\\n' ORDER BY page_no), '') AS extracted_text,
           |'[' || string_agg('{"page_no": ' || CAST(page_no AS VARCHAR) || ', "cells": ' || CASE WHEN cells_json = '' THEN 'null' ELSE cells_json END || '}', ', ' ORDER BY page_no) || ']' AS cells_json,
           |bool_or(filtered) AS filtered,
           |coalesce(string_agg(CASE WHEN error <> '' THEN error END, '; ' ORDER BY page_no), '') AS error
           |FROM read_parquet('${VerifyTables.oracleGlob("extract_pages")}')
           |GROUP BY url ORDER BY url""".stripMargin,
      // page metadata: the live kernel run checked row-for-row against
      // the independently-dumped page_meta table (the x_parse_flex
      // evidential class; first-wins walk + href resolution pinned in
      // LinkOpsSpec)
      "q_page_meta" ->
        s"""SELECT url, title, description, canonical
           |FROM read_parquet('${VerifyTables.oracleGlob("page_meta")}')
           |ORDER BY url""".stripMargin,
      // canonical consolidation: grouping + self-first representative
      // pick replayed from the dumped page_meta table (Spark's
      // min(struct(url != key, url)) IS this window's row 1 — boolean
      // false < true in both engines)
      "q_canonical_dedup" ->
        s"""WITH m AS (SELECT url,
           |  CASE WHEN canonical = '' THEN url ELSE canonical END AS k
           |  FROM read_parquet('${VerifyTables.oracleGlob("page_meta")}')),
           |r AS (SELECT k, url,
           |  row_number() OVER (PARTITION BY k ORDER BY (url <> k), url) AS rn,
           |  count(*) OVER (PARTITION BY k) AS n FROM m)
           |SELECT k AS canonical_url, url AS kept_url,
           |  CAST(n AS BIGINT) AS n_members
           |FROM r WHERE rn = 1 ORDER BY canonical_url""".stripMargin,
      // crawl frontier: every stage replayed — planted /pdf/ + /truncated/
      // edges rebuilt as SQL, inlink counts from the dumped links table,
      // anti-join vs the corpus urls, the RFC 9309 robots decision, the
      // equals-or-subdomain blocklist, and the per-host top-5 (Spark's
      // bounded-histogram selector ≡ ORDER BY -score, url row_number)
      "q_frontier" ->
        s"""WITH nr AS (SELECT url
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |pl AS (SELECT url AS src,
           |    regexp_extract(url, '^(https?://[^/]+)', 1) ||
           |    CASE WHEN did % 2 = 0 THEN '/pdf/frontier'
           |         ELSE '/truncated/frontier' END || CAST(did AS VARCHAR) AS dst
           |  FROM (SELECT url,
           |    CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS did
           |    FROM nr)
           |  WHERE did % 23 = 0),
           |l AS (SELECT src, dst
           |    FROM read_parquet('${VerifyTables.oracleGlob("links")}')
           |  UNION ALL SELECT src, dst FROM pl),
           |cand AS (SELECT dst AS url, CAST(count(*) AS BIGINT) AS n_inlinks
           |  FROM l GROUP BY 1),
           |und AS (SELECT c.url, c.n_inlinks FROM cand c
           |  LEFT JOIN nr ON c.url = nr.url WHERE nr.url IS NULL),
           |u AS (SELECT url, n_inlinks,
           |    regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           |    CASE WHEN length(regexp_extract(url, '^https?://[^/?#]+(/[^?#]*)', 1)) = 0
           |         THEN '/' ELSE regexp_extract(url, '^https?://[^/?#]+(/[^?#]*)', 1)
           |    END AS p
           |  FROM und),
           |m AS (SELECT u.url, r.is_allow,
           |    row_number() OVER (PARTITION BY u.url
           |      ORDER BY length(r.prefix) DESC, r.is_allow DESC, r.prefix DESC) AS rn
           |  FROM u JOIN read_parquet('${VerifyTables.oracleGlob("robots_rules")}') r
           |    ON u.host = r.host AND starts_with(u.p, r.prefix)),
           |dis AS (SELECT url FROM m WHERE rn = 1 AND NOT is_allow),
           |rob AS (SELECT u.url, u.n_inlinks, u.host FROM u
           |  LEFT JOIN dis ON u.url = dis.url WHERE dis.url IS NULL),
           |blk(domain) AS (VALUES ('host7.example'), ('host13.example')),
           |blocked AS (SELECT DISTINCT r.url FROM rob r JOIN blk b
           |  ON r.host = b.domain OR r.host LIKE '%.' || b.domain),
           |f AS (SELECT * FROM rob
           |  WHERE url NOT IN (SELECT url FROM blocked)),
           |r2 AS (SELECT url, host, n_inlinks,
           |    row_number() OVER (PARTITION BY host ORDER BY -n_inlinks, url) AS rn
           |  FROM f)
           |SELECT url, host, n_inlinks FROM r2 WHERE rn <= 5
           |ORDER BY url""".stripMargin,
      // extraction QA: both token multisets rebuilt by unnest+count, the
      // intersection by a per-token least() join, ratios by the same
      // truncating integer division (DuckDB sums CAST to BIGINT — they
      // widen to HUGEINT and would break the pandas dtype compare)
      "q_extract_quality" ->
        s"""WITH d AS (SELECT d.url, d.extracted_text, n.text
           |  FROM read_parquet('${VerifyTables.oracleGlob("extract_docs")}') d
           |  JOIN read_parquet('${VerifyTables.oracleGlob("northrule")}') n
           |    ON d.url = n.url),
           |et AS (SELECT url, unnest(regexp_split_to_array(
           |  lower(coalesce(extracted_text, '')), '[ \\t\\n\\r\\f]+')) AS tok FROM d),
           |rt AS (SELECT url, unnest(regexp_split_to_array(
           |  lower(coalesce(text, '')), '[ \\t\\n\\r\\f]+')) AS tok FROM d),
           |ec AS (SELECT url, tok, count(*) AS c FROM et WHERE tok <> '' GROUP BY 1, 2),
           |rc AS (SELECT url, tok, count(*) AS c FROM rt WHERE tok <> '' GROUP BY 1, 2),
           |ex AS (SELECT url, CAST(sum(c) AS BIGINT) AS n_ext FROM ec GROUP BY 1),
           |rx AS (SELECT url, CAST(sum(c) AS BIGINT) AS n_ref FROM rc GROUP BY 1),
           |iv AS (SELECT ec.url, CAST(sum(least(ec.c, rc.c)) AS BIGINT) AS n_inter
           |  FROM ec JOIN rc ON ec.url = rc.url AND ec.tok = rc.tok GROUP BY 1),
           |j AS (SELECT d.url, coalesce(ex.n_ext, 0) AS n_ext,
           |    coalesce(rx.n_ref, 0) AS n_ref, coalesce(iv.n_inter, 0) AS n_inter
           |  FROM d LEFT JOIN ex ON d.url = ex.url
           |  LEFT JOIN rx ON d.url = rx.url LEFT JOIN iv ON d.url = iv.url),
           |p AS (SELECT url, n_ext, n_ref, n_inter,
           |  CASE WHEN n_ext = 0 THEN 0 ELSE n_inter * 1000000 // n_ext END AS precision_ppm,
           |  CASE WHEN n_ref = 0 THEN 0 ELSE n_inter * 1000000 // n_ref END AS recall_ppm
           |  FROM j)
           |SELECT url, n_ext, n_ref, n_inter, precision_ppm, recall_ppm,
           |  CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
           |       ELSE 2 * precision_ppm * recall_ppm // (precision_ppm + recall_ppm)
           |  END AS f1_ppm
           |FROM p ORDER BY url""".stripMargin,
      // redirect resolution: the SAME deterministic edge construction
      // (16% sample -> per-host ranking -> chains + first-digit cycles),
      // then a recursive walk — the terminal node and EXACT hop count
      // must match Spark's distance-doubling ladder; cycle rows never
      // find a terminal within the 64-hop cap (chains here are <= 8)
      "q_redirect_resolve" ->
        s"""WITH RECURSIVE s AS (
           |  SELECT url, regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           |    CAST(regexp_extract(url, 'doc([0-9]+)$$', 1) AS BIGINT) AS did
           |  FROM read_parquet('${VerifyTables.oracleGlob("northrule")}')),
           |f AS (SELECT url, host FROM s WHERE did % 100 < 16),
           |r AS (SELECT url, host,
           |    row_number() OVER (PARTITION BY host ORDER BY url) AS rn,
           |    count(*) OVER (PARTITION BY host) AS cnt FROM f),
           |r8 AS (SELECT host, url, rn, LEAST(cnt, 8) AS tail_rn FROM r WHERE rn <= 8),
           |chain AS (SELECT a.url AS src, b.url AS dst FROM r8 a JOIN r8 b
           |  ON a.host = b.host AND b.rn = a.rn + 1 WHERE a.rn < a.tail_rn),
           |back AS (SELECT a.url AS src, b.url AS dst FROM r8 a JOIN r8 b
           |  ON a.host = b.host AND b.rn = 1
           |  WHERE a.rn = a.tail_rn AND a.tail_rn >= 2
           |    AND ascii(substr(a.host, 5, 1)) % 3 = 0),
           |edges AS (SELECT src AS url, min(dst) AS nxt
           |  FROM (SELECT * FROM chain UNION ALL SELECT * FROM back)
           |  WHERE src <> dst GROUP BY src),
           |walk AS (
           |  SELECT url, nxt AS cur, CAST(1 AS BIGINT) AS hops FROM edges
           |  UNION ALL
           |  SELECT w.url, e.nxt, w.hops + 1 FROM walk w
           |  JOIN edges e ON w.cur = e.url WHERE w.hops < 64),
           |fin AS (SELECT w.url, w.cur AS final_url, w.hops FROM walk w
           |  LEFT JOIN edges e ON w.cur = e.url WHERE e.url IS NULL)
           |SELECT e.url, coalesce(f.final_url, '') AS final_url,
           |  coalesce(f.hops, 0) AS hops,
           |  CASE WHEN f.url IS NULL THEN 'cycle' ELSE 'resolved' END AS status
           |FROM edges e LEFT JOIN fin f ON e.url = f.url
           |ORDER BY e.url""".stripMargin,
      // fused web pass: the SEPARATE passes' dumps reassembled — the
      // fused single-DOM-parse output must match the independent per-op
      // tables (extract_docs / links / anchors) byte-for-byte; planted
      // robots docs replayed as hand-written literals
      "q_web_pipeline" -> webPipelineOracle,
      // the separate-pass bench foil produces IDENTICAL rows by contract
      // (WebPipelineSpec pins it) — same oracle, so the equivalence is
      // also checked by the independent engine
      "q_web_pipeline_separate" -> webPipelineOracle,
      // anchor-text summary: aggregation replayed from the dumped
      // (src, dst, anchor) table; the Spark min(struct(-c, anchor)) top
      // pick is the window's "ORDER BY c DESC, anchor ASC" row 1
      "q_anchor_summary" ->
        s"""WITH a AS (SELECT src, dst, anchor
           |  FROM read_parquet('${VerifyTables.oracleGlob("anchors")}')),
           |c AS (SELECT dst, anchor, count(*) AS c FROM a GROUP BY dst, anchor),
           |r AS (SELECT dst, anchor, c,
           |  row_number() OVER (PARTITION BY dst ORDER BY c DESC, anchor ASC) AS rn
           |  FROM c),
           |agg AS (SELECT dst, CAST(sum(c) AS BIGINT) AS n_anchors,
           |  CAST(count(*) AS BIGINT) AS n_texts FROM c GROUP BY dst),
           |h AS (SELECT dst,
           |  CAST(count(DISTINCT regexp_extract(src, '^https?://([^/?#]+)', 1)) AS BIGINT)
           |    AS n_src_hosts
           |  FROM a GROUP BY dst)
           |SELECT agg.dst, agg.n_anchors, agg.n_texts,
           |  r.anchor AS top_anchor, CAST(r.c AS BIGINT) AS top_anchor_n,
           |  h.n_src_hosts
           |FROM agg JOIN r ON agg.dst = r.dst AND r.rn = 1
           |JOIN h ON agg.dst = h.dst
           |ORDER BY agg.dst""".stripMargin,
      "q_host_graph" ->
        s"""WITH l AS (SELECT
           |    regexp_extract(src, '^https?://([^/?#]+)', 1) AS src_host,
           |    regexp_extract(dst, '^https?://([^/?#]+)', 1) AS dst_host
           |  FROM read_parquet('${VerifyTables.oracleGlob("links")}'))
           |SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
           |FROM l WHERE src_host <> dst_host AND src_host <> '' AND dst_host <> ''
           |GROUP BY src_host, dst_host ORDER BY src_host, dst_host""".stripMargin,
      // integral PageRank: the same 5-round iteration ladder unrolled as
      // CTEs — every step integer DIV, so the replay is bit-exact
      "q_pagerank" -> pagerankSql(5),
      // integral HITS: the 5-round hub/auth half-step ladder unrolled as
      // CTEs — L-infinity (max) normalization keeps every step integer
      "q_hits" -> hitsSql(5),
      // integral TrustRank: the PageRank ladder with teleport gated on
      // the seed flag, re-derived per round
      "q_trustrank" -> trustrankSql(5),
      // host-reputation gate: the same 5-round ladder joined onto the
      // extraction output's urls
      "q_host_reputation" ->
        s"""WITH ${pagerankCtes(5)},
           |docs AS (SELECT url,
           |    regexp_extract(url, '^https?://([^/?#]+)', 1) AS host
           |  FROM read_parquet('${VerifyTables.oracleGlob("extract_docs")}'))
           |SELECT d.url, d.host,
           |  CAST(coalesce(r.rank, 0) AS BIGINT) AS host_rank,
           |  coalesce(r.rank, 0) >= 500000 AS keep
           |FROM docs d LEFT JOIN r5 r ON r.node = d.host
           |ORDER BY d.url""".stripMargin,
      // full near-dup dedup chain: minhash candidate pairs (e2e threshold)
      // → reachability components → keep-one → survivors re-joined with
      // cluster size + token count (same tokenization as q_token_count)
      "q_neardup_dedup" -> s"""WITH RECURSIVE $minhashCandCte,
           |e AS (SELECT id_a, id_b FROM cand
           |  WHERE CAST(len(list_filter(range(1, 65), i -> sig_a[i] = sig_b[i])) AS DOUBLE) / 64 >= 0.5),
           |sym AS (SELECT id_a AS x, id_b AS y FROM e
           |        UNION SELECT id_b, id_a FROM e),
           |reach AS (
           |  SELECT x, x AS r FROM (SELECT DISTINCT x FROM sym)
           |  UNION
           |  SELECT sym.x, reach.r FROM sym JOIN reach ON reach.x = sym.y),
           |lab AS (SELECT x, min(r) AS cluster_id FROM reach GROUP BY x),
           |allv AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
           |         FROM documents d LEFT JOIN lab l ON d.doc_id = l.x),
           |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM allv GROUP BY cluster_id)
           |SELECT a.doc_id, CAST(sz.cluster_size AS BIGINT) AS cluster_size,
           |  CAST(len(list_filter(regexp_split_to_array(trim(d.text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
           |FROM allv a JOIN sz USING (cluster_id) JOIN documents d USING (doc_id)
           |WHERE a.doc_id = a.cluster_id
           |ORDER BY a.doc_id""".stripMargin,
      // quality-keyed survivor: same recursive clustering, keep policy
      // re-derived as an independent per-cluster ranking (q DESC, id DESC)
      "q_neardup_best" -> s"""WITH RECURSIVE $minhashCandCte,
           |e AS (SELECT id_a, id_b FROM cand
           |  WHERE CAST(len(list_filter(range(1, 65), i -> sig_a[i] = sig_b[i])) AS DOUBLE) / 64 >= 0.5),
           |sym AS (SELECT id_a AS x, id_b AS y FROM e
           |        UNION SELECT id_b, id_a FROM e),
           |reach AS (
           |  SELECT x, x AS r FROM (SELECT DISTINCT x FROM sym)
           |  UNION
           |  SELECT sym.x, reach.r FROM sym JOIN reach ON reach.x = sym.y),
           |lab AS (SELECT x, min(r) AS cluster_id FROM reach GROUP BY x),
           |allv AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id,
           |    CAST(len(list_filter(regexp_split_to_array(trim(d.text), '\\s+'),
           |      x -> x <> '')) AS BIGINT) AS q
           |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.x),
           |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM allv GROUP BY cluster_id)
           |SELECT a.cluster_id, a.doc_id AS keep_id, a.q AS keep_q,
           |  CAST(sz.cluster_size AS BIGINT) AS cluster_size
           |FROM allv a JOIN sz USING (cluster_id)
           |QUALIFY row_number() OVER (PARTITION BY a.cluster_id
           |  ORDER BY a.q DESC, a.doc_id DESC) = 1
           |ORDER BY cluster_id""".stripMargin,
      // end-to-end minhash (text → signatures → band join → verify): the
      // in-flight signatures are byte-identical to the dumped sig table
      // (same deterministic function, pinned by the native-expression
      // specs) — same pair set as q_minhash_pairs, e2e projection
      "q_minhash_e2e" -> s"""WITH $minhashCandCte
           |SELECT id_a, id_b FROM cand
           |WHERE CAST(len(list_filter(range(1, 65), i -> sig_a[i] = sig_b[i])) AS DOUBLE) / 64 >= 0.5
           |ORDER BY id_a, id_b""".stripMargin,
      // candidate generation + exact set Jaccard, both replayed
      "q_ngram_verify" -> s"""WITH $minhashCandCte,
           |cand2 AS (SELECT id_a, id_b FROM cand
           |  WHERE CAST(len(list_filter(range(1, 65), i -> sig_a[i] = sig_b[i])) AS DOUBLE) / 64 >= 0.3),
           |sh AS (SELECT id, sh FROM read_parquet('${g("shingles")}')),
           |j AS (SELECT c.id_a, c.id_b,
           |        CAST(len(list_filter(list_distinct(a.sh), x -> list_contains(b2.sh, x))) AS DOUBLE)
           |          / len(list_distinct(list_concat(a.sh, b2.sh))) AS jaccard
           |      FROM cand2 c JOIN sh a ON c.id_a = a.id JOIN sh b2 ON c.id_b = b2.id)
           |SELECT id_a, id_b, CAST(round(jaccard * 1000) AS BIGINT) AS jaccard_x1000
           |FROM j ORDER BY id_a, id_b""".stripMargin,
    )
  }

  /** Integral-PageRank replay: host parse → distinct cross edges →
    * outdegree → k unrolled iteration CTEs, each the exact integer
    * arithmetic of [[graft.ops.LinkOps.pageRank]] (DuckDB `//` ≡ Spark
    * `DIV` on the non-negative ranks involved). */
  /** Integral k-means Lloyd ladder (mirrors SimilarityOps.kmeansLloyd):
    * quantize once (round_even ≡ bround), `iters` assign/update rounds in
    * pure integer arithmetic (`//` ≡ DIV on the engines' shared
    * truncating semantics), final assignment vs the last centroids. */
  /** Bigram LM-surprise CTE ladder (shared by q_ngram_surprise and
    * q_ppl_buckets): same tokenization as q_token_count, corpus counts
    * and per-doc integer mean replayed keyed by word TEXT (Spark keys by
    * xxhash64 — the hash-vs-text oracle trick). Ends with
    * `sc(doc_id, n_bigrams, surprise)`, one row per document. */
  private val surpriseCtes: String =
    """tok AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
      |  FROM documents),
      |d AS (SELECT doc_id, toks, len(toks) AS n FROM tok),
      |b AS (SELECT doc_id, toks[CAST(i + 1 AS INTEGER)] AS w1,
      |        toks[CAST(i + 2 AS INTEGER)] AS w2
      |      FROM (SELECT doc_id, toks, unnest(range(0, n - 1)) AS i
      |            FROM d WHERE n >= 2)),
      |c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY w1),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY w1, w2),
      |s AS (SELECT doc_id, (c1.c1 * 1000000) // c12.c12 AS s
      |      FROM b JOIN c1 USING (w1) JOIN c12 USING (w1, w2)),
      |agg AS (SELECT doc_id, count(*) AS n_bigrams,
      |        sum(s) // count(*) AS surprise FROM s GROUP BY doc_id),
      |sc AS (SELECT d.doc_id,
      |  CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  CAST(coalesce(a.surprise, 0) AS BIGINT) AS surprise
      |FROM d LEFT JOIN agg a USING (doc_id))""".stripMargin

  private def kmeansCtes(k: Int, iters: Int, scale: Long = 1000000L,
      src: String = "embeddings"): String = {
    def assign(name: String, cents: String): String =
      s"""$name AS (SELECT id, cid AS cluster FROM (
         |  SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
         |  FROM (SELECT q.id, c.cid, sum((q.v - c.cv) * (q.v - c.cv)) AS d2
         |        FROM q JOIN $cents c USING (dim) GROUP BY q.id, c.cid))
         |  WHERE rn = 1)""".stripMargin
    val steps = (1 to iters).flatMap { i =>
      Seq(assign(s"a$i", s"c${i - 1}"),
        s"""c$i AS (SELECT a.cluster AS cid, q.dim, sum(q.v) // count(*) AS cv
           |  FROM q JOIN a$i a USING (id) GROUP BY a.cluster, q.dim)""".stripMargin)
    }.mkString(",\n")
    s"""q AS (SELECT vec_id AS id,
       |    generate_subscripts(embedding, 1) - 1 AS dim,
       |    CAST(round_even(CAST(unnest(embedding) AS DOUBLE) * $scale, 0) AS BIGINT) AS v
       |  FROM $src),
       |ids AS (SELECT DISTINCT id FROM q ORDER BY id LIMIT $k),
       |ini AS (SELECT id, CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid
       |        FROM ids),
       |c0 AS (SELECT ini.cid, q.dim, q.v AS cv FROM q JOIN ini USING (id)),
       |$steps,
       |${assign("afin", s"c$iters")}""".stripMargin
  }

  private def kmeansSql(k: Int, iters: Int): String =
    s"""WITH ${kmeansCtes(k, iters)}
       |SELECT id AS vec_id, CAST(cluster AS BIGINT) AS cluster
       |FROM afin ORDER BY vec_id""".stripMargin

  private def pagerankCtes(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""r$i AS (SELECT n.node, 150000 + (85 * coalesce(s.m, 0)) // 100 AS rank
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r${i - 1}.rank // od.outdeg) AS m
         |    FROM e JOIN od USING (src) JOIN r${i - 1} ON r${i - 1}.node = e.src
         |    GROUP BY e.dst) s USING (node))""".stripMargin
    }.mkString(",\n")
    s"""l AS (SELECT
       |    regexp_extract(src, '^https?://([^/?#]+)', 1) AS sh,
       |    regexp_extract(dst, '^https?://([^/?#]+)', 1) AS dh
       |  FROM read_parquet('${VerifyTables.oracleGlob("links")}')),
       |e AS (SELECT DISTINCT sh AS src, dh AS dst FROM l
       |      WHERE sh <> dh AND sh <> '' AND dh <> ''),
       |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM n),
       |$iters""".stripMargin
  }

  private def pagerankSql(k: Int): String =
    s"""WITH ${pagerankCtes(k)}
       |SELECT node, CAST(rank AS BIGINT) AS rank FROM r$k ORDER BY node""".stripMargin

  /** Integral TrustRank ladder — the [[pagerankCtes]] shape with teleport
    * gated on the seed flag (seeds = digit part % 3 == 0, TRY_CAST so
    * non-matching hosts are simply non-seeds in both engines). */
  private def trustrankSql(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""r$i AS (SELECT ns.node,
         |    CASE WHEN ns.is_seed THEN 150000 ELSE 0 END
         |      + (85 * coalesce(s.m, 0)) // 100 AS rank
         |  FROM ns LEFT JOIN (
         |    SELECT e.dst AS node, sum(r${i - 1}.rank // od.outdeg) AS m
         |    FROM e JOIN od USING (src) JOIN r${i - 1} ON r${i - 1}.node = e.src
         |    GROUP BY e.dst) s USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH l AS (SELECT
       |    regexp_extract(src, '^https?://([^/?#]+)', 1) AS sh,
       |    regexp_extract(dst, '^https?://([^/?#]+)', 1) AS dh
       |  FROM read_parquet('${VerifyTables.oracleGlob("links")}')),
       |e AS (SELECT DISTINCT sh AS src, dh AS dst FROM l
       |      WHERE sh <> dh AND sh <> '' AND dh <> ''),
       |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |ns AS (SELECT node, coalesce(
       |    TRY_CAST(regexp_extract(node, 'host([0-9]+)', 1) AS BIGINT) % 3 = 0,
       |    false) AS is_seed FROM n),
       |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |r0 AS (SELECT node,
       |  CASE WHEN is_seed THEN CAST(1000000 AS BIGINT) ELSE 0 END AS rank FROM ns),
       |$iters
       |SELECT node, CAST(rank AS BIGINT) AS trust FROM r$k ORDER BY node""".stripMargin
  }

  /** Integral HITS iteration ladder: each round one auth half-step (sum of
    * in-neighbor hubs, max-normalized to 10⁶) then one hub half-step (sum
    * of out-neighbor auths, same normalization) — mirroring
    * [[graft.ops.LinkOps.hits]] exactly; `//` is integer division and all
    * values stay non-negative BIGINTs so the replay is bit-exact. The
    * per-level max is a window function and every chain CTE is
    * MATERIALIZED + referenced exactly once by the next level — a scalar
    * `(SELECT max(..))` subquery would reference each level 3× and
    * DuckDB's CTE inlining would blow up exponentially over the rounds.
    * `greatest(max, 1)` replaces the max>0 CASE: values are non-negative,
    * so max=0 forces every raw value to 0 and 0 DIV 1 = 0, matching the
    * Spark branch. */
  private def hitsSql(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""a$i AS MATERIALIZED (
         |  SELECT node, (ar * 1000000) // greatest(max(ar) OVER (), 1) AS auth
         |  FROM (SELECT n.node, coalesce(s.m, 0) AS ar FROM n LEFT JOIN (
         |    SELECT e.dst AS node, sum(h${i - 1}.hub) AS m
         |    FROM e JOIN h${i - 1} ON h${i - 1}.node = e.src
         |    GROUP BY e.dst) s USING (node))),
         |h$i AS MATERIALIZED (
         |  SELECT node, (hr * 1000000) // greatest(max(hr) OVER (), 1) AS hub
         |  FROM (SELECT n.node, coalesce(s.m, 0) AS hr FROM n LEFT JOIN (
         |    SELECT e.src AS node, sum(a$i.auth) AS m
         |    FROM e JOIN a$i ON a$i.node = e.dst
         |    GROUP BY e.src) s USING (node)))""".stripMargin
    }.mkString(",\n")
    s"""WITH l AS (SELECT
       |    regexp_extract(src, '^https?://([^/?#]+)', 1) AS sh,
       |    regexp_extract(dst, '^https?://([^/?#]+)', 1) AS dh
       |  FROM read_parquet('${VerifyTables.oracleGlob("links")}')),
       |e AS MATERIALIZED (SELECT DISTINCT sh AS src, dh AS dst FROM l
       |      WHERE sh <> dh AND sh <> '' AND dh <> ''),
       |n AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS hub FROM n),
       |$iters
       |SELECT h$k.node, CAST(h$k.hub AS BIGINT) AS hub,
       |  CAST(a$k.auth AS BIGINT) AS auth
       |FROM h$k JOIN a$k USING (node) ORDER BY node""".stripMargin
  }

  /** MinHash band-join replay (band-hash equality ⟺ chunk equality):
    * explode 16 bands of 4 sig slots, hot-bucket cap 1000, dedup'd
    * ordered candidate pairs. CTE body only — prepend WITH. */
  private def minhashCandCte: String =
    s"""s AS (SELECT id, sig FROM read_parquet('${VerifyTables.oracleGlob("minhash_sigs")}')),
       |b AS (SELECT id, sig, band,
       |        list_slice(sig, band*4 + 1, band*4 + 4) AS chunk
       |      FROM s, range(0, 16) t(band)
       |      QUALIFY count(*) OVER (PARTITION BY band, chunk) <= 1000),
       |cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b,
       |           l.sig AS sig_a, r.sig AS sig_b
       |         FROM b l JOIN b r ON l.band = r.band AND l.chunk = r.chunk
       |           AND l.id < r.id)""".stripMargin

  /** SimHash 16-bit-chunk pigeonhole join replay, same shape. */
  private def simhashCandCte: String =
    s"""s AS (SELECT id, sig FROM read_parquet('${VerifyTables.oracleGlob("simhash_sigs")}')),
       |b AS (SELECT id, sig, band, (sig >> (band*16)) & 65535 AS chunk
       |      FROM s, range(0, 4) t(band)
       |      QUALIFY count(*) OVER (PARTITION BY band, chunk) <= 1000),
       |cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b,
       |           l.sig AS sig_a, r.sig AS sig_b
       |         FROM b l JOIN b r ON l.band = r.band AND l.chunk = r.chunk
       |           AND l.id < r.id)""".stripMargin

  private def simhashPairsSql: String =
    s"""WITH $simhashCandCte
       |SELECT id_a, id_b,
       |  CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
       |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
}
