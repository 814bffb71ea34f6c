package graft

import graft.core.PromptMode
import graft.gen.InputTable
import graft.ops.{DedupOps, MultimodalOps, RepairJob, SimilarityOps, TextOps}
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

  private def docsTable(s: SparkSession, sfDir: String): DataFrame =
    InputTable.generate(s, InputTable.docsForSfDir(sfDir), seed = 42L)

  // integral money: cents as BIGINT — engine-exact (doubles would drift
  // under Spark's partial aggregation vs DuckDB's sequential sum)
  private def cents(c: Column): Column = round(c * 100).cast("long")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- extraction pipeline surface (rows-only; byte-identity in sbt test)
    "x_extract_full" -> ((s, dir) =>
      ExtractPipeline.run(docsTable(s, dir)).orderBy("url")),
    "x_extract_layout_only" -> ((s, dir) =>
      ExtractPipeline.parsePages(
        ExtractPipeline.asPageDocs(docsTable(s, dir)), PromptMode.LayoutOnly)
        .toDF().orderBy("url", "page_no")),
    "x_extract_ocr" -> ((s, dir) =>
      ExtractPipeline.parsePages(
        ExtractPipeline.asPageDocs(docsTable(s, dir)), PromptMode.Ocr)
        .toDF().orderBy("url", "page_no")),
    "x_extract_grounding" -> ((s, dir) =>
      ExtractPipeline.parsePages(
        ExtractPipeline.asPageDocs(docsTable(s, dir).filter(col("url").contains("/html/"))),
        PromptMode.GroundingOcr((0L, 0L, 1280L, 200L)))
        .toDF().orderBy("url", "page_no")),

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

    // ---- training ops: exact dedup (hash-groupBy)
    "q_dedup_exact" -> ((s, dir) =>
      t(s, dir, "documents")
        .agg(countDistinct(col("text")).as("distinct_texts"),
          count(lit(1)).as("total_docs"))),

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

    // ---- embeddings: relational stats
    "q_embedding_stats" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .groupBy("label")
        .agg(count(lit(1)).as("n"), min(size(col("embedding")).cast("long")).as("dim"))
        .orderBy("label")),

    // ---- similarity search: brute-force cosine top-k (ids ranked)
    "q_ann_topk" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val queries = embs.filter(col("vec_id") < 8)
      SimilarityOps.bruteForceTopK(embs, queries, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- similarity search: IVF scale path (rows-only; recall gate in test)
    "q_ann_ivf" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val queries = embs.filter(col("vec_id") < 8)
      SimilarityOps.ivfTopK(embs, queries, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- dedup: MinHash+LSH near-dup pairs over documents (rows-only;
    //      correctness vs brute force in OpsSpec)
    "q_minhash_pairs" -> ((s, dir) =>
      DedupOps.minhashDupPairs(t(s, dir, "documents"), "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("est_jaccard") * 64).cast("long").as("matches64"))
        .orderBy("id_a", "id_b")),

    // ---- dedup: SimHash near-dup pairs (rows-only)
    "q_simhash_pairs" -> ((s, dir) =>
      DedupOps.simhashDupPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b")),

    // ---- fingerprinting (rows-only; determinism gate in OpsSpec)
    "q_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // ---- W1: reading-order span enumeration (posexplode over parsed cells)
    "x_span_explode" -> ((s, dir) => {
      val pageSchema = "array<struct<page_no:int, cells:array<struct<bbox:array<bigint>, category:string, text:string>>>>"
      ExtractPipeline.run(docsTable(s, dir))
        .filter(!col("filtered") && col("error") === "")
        .select(col("url"), from_json(col("cells_json"), org.apache.spark.sql.types.DataType.fromDDL(pageSchema)).as("pages"))
        .select(col("url"), explode(col("pages")).as("page"))
        .select(col("url"), col("page.page_no").as("page_no"),
          posexplode(col("page.cells")).as(Seq("reading_order", "cell")))
        .select(col("url"), col("page_no"), col("reading_order"),
          col("cell.category").as("category"), col("cell.bbox").as("bbox"))
        .orderBy("url", "page_no", "reading_order")
    }),

    // ---- W3: cross-page paragraph merge over extraction pages
    "x_cross_page_merge" -> ((s, dir) => {
      val pages = ExtractPipeline.parsePages(
        ExtractPipeline.asPageDocs(docsTable(s, dir).filter(col("url").contains("/pdf/"))))
        .toDF()
      graft.pipeline.PageMerge.mergeDocuments(pages).orderBy("url")
    }),

    // ---- C9: offline batch repair job + A5 report
    "x_repair_batch" -> ((s, dir) => {
      import s.implicits._
      val n = math.max(100L, InputTable.docsForSfDir(dir) / 10)
      val rows = s.range(n).map { i =>
        val rng = new graft.gen.InputGen.Rng(13L, i, 3L)
        (i.toLong, graft.gen.InputGen.garbledPayload(rng, graft.gen.InputGen.langOf(13L, i)))
      }
      RepairJob.repair(rows).toDF().orderBy("case_id")
    }),
    "x_repair_report" -> ((s, dir) => {
      import s.implicits._
      val n = math.max(100L, InputTable.docsForSfDir(dir) / 10)
      val rows = s.range(n).map { i =>
        val rng = new graft.gen.InputGen.Rng(13L, i, 3L)
        (i.toLong, graft.gen.InputGen.garbledPayload(rng, graft.gen.InputGen.langOf(13L, i)))
      }
      RepairJob.report(RepairJob.repair(rows))
    }),

    // ---- multimodal columns: feature extraction + frame sampling
    "x_media_features" -> ((s, dir) => {
      val n = math.max(100L, InputTable.docsForSfDir(dir) / 10)
      MultimodalOps.extractFeatures(MultimodalOps.syntheticMedia(s, n))
        .toDF().drop("feature").orderBy("media_id")
    }),
    "x_frame_sample" -> ((s, dir) => {
      val n = math.max(100L, InputTable.docsForSfDir(dir) / 10)
      MultimodalOps.sampleFrames(MultimodalOps.syntheticMedia(s, n), everyMs = 1000L)
        .toDF().drop("frame_payload").orderBy("media_id", "frame_no")
    }),

    // ---- quality gate (SQL-expressible → oracle)
    "q_quality_gate" -> ((s, dir) =>
      TextOps.qualityGate(t(s, dir, "documents"), "text")
        .groupBy("keep_doc").agg(count(lit(1)).as("n"))
        .orderBy("keep_doc")),

    // ---- BPE-ish subword counting (RE2 can't express the lookarounds →
    //      rows-only; determinism across partitionings checked by driver)
    "q_subword_count" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id")),

    // ---- exact n-gram Jaccard verification of LSH candidates
    "q_ngram_verify" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cands = DedupOps.minhashDupPairs(docs, "doc_id", "text", 64, 16, 0.3)
        .select("id_a", "id_b")
      DedupOps.ngramJaccard(docs, "doc_id", "text", cands)
        .select(col("id_a"), col("id_b"), round(col("jaccard") * 1000).cast("long").as("jaccard_x1000"))
        .orderBy("id_a", "id_b")
    }),

    // ---- scale layer: per-host stats with skew salting (hot host ≈ 30%)
    "x_host_stats" -> ((s, dir) =>
      graft.scale.HostStats.salted(docsTable(s, dir)).orderBy("host")),

    // ---- scale layer: per-partition lineage records as a metrics table
    //      (wall-time column excluded: non-deterministic by nature)
    "x_lineage" -> ((s, dir) => {
      import s.implicits._
      val acc = s.sparkContext.collectionAccumulator[graft.pipeline.PartitionLineage]("q-lineage")
      ExtractPipeline.run(docsTable(s, dir), lineageAcc = Some(acc))
        .write.format("noop").mode("overwrite").save()
      import scala.jdk.CollectionConverters._
      acc.value.asScala.toVector
        .map(pl => (pl.partition_id, pl.stage, pl.row_count, pl.checksum))
        .toDF("partition_id", "stage", "row_count", "checksum")
        .orderBy("partition_id")
    }),

    // ---- P17 flexible JSON extraction over noisy model output
    "x_parse_flex" -> ((s, dir) => {
      import s.implicits._
      val n = math.max(100L, InputTable.docsForSfDir(dir) / 10)
      s.range(n).map { (i: java.lang.Long) =>
        val rng = new graft.gen.InputGen.Rng(17L, i, 4L)
        val lang = graft.gen.InputGen.langOf(17L, i)
        val noisy = "Some preamble text " + graft.gen.InputGen.garbledPayload(rng, lang) + "]"
        graft.kernel.MiscText.parseJsonFlex(noisy) match {
          case Some(r) => (i, true, r.extracted, graft.kernel.PyJson.dumps(r.value).length.toLong)
          case None    => (i, false, false, 0L)
        }
      }.toDF("case_id", "parsed", "extracted", "json_len").orderBy("case_id")
    })
  )

  /** DuckDB equivalents over the same parquet files. Table names resolve to
    * `<sfDir>/<name>.parquet` on the driver side. */
  val oracles: Map[String, String] = Map(
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
      """SELECT CAST(count(DISTINCT text) AS BIGINT) AS distinct_texts,
        |CAST(count(*) AS BIGINT) AS total_docs FROM documents""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id, CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |x -> x <> '')) AS BIGINT) AS n_tokens FROM documents ORDER BY doc_id""".stripMargin,
    "q_quality" ->
      """SELECT doc_id,
        |CAST(length(text) AS BIGINT) AS n_chars_calc,
        |CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
        |CAST(length(regexp_replace(text, '[^.!?。]', '', 'g')) AS BIGINT) AS n_sentences,
        |CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits,
        |CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      """SELECT doc_id, CASE
        |WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
        |WHEN regexp_matches(text, '[\x{0f00}-\x{0fff}]') THEN 'bo'
        |WHEN regexp_matches(text, '[\x{0c80}-\x{0cff}]') THEN 'kn'
        |WHEN regexp_matches(text, ' (der|die|das|und|nicht|mit) ') THEN 'de'
        |WHEN regexp_matches(text, ' (le|la|les|des|une|est) ') THEN 'fr'
        |WHEN regexp_matches(text, ' (el|los|las|una|que|con) ') THEN 'es'
        |WHEN regexp_matches(text, ' (de|het|een|van|met|voor) ') THEN 'nl'
        |ELSE 'en' END AS lang_pred FROM documents ORDER BY doc_id""".stripMargin,
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
    "q_ann_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])) AS sim
        |  FROM embeddings c, q WHERE c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin
  )
}
