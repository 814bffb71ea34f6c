package graft.ops

import graft.functions.Log2Fp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-side relevance ranking — the retrieval view over the same
  * documents table the curation tier filters. BM25 is the canonical
  * lexical ranker (Robertson & Zaragoza 2009; the function every search
  * stack from Lucene to web-scale crawlers ships as its default), and a
  * training-data pipeline uses it directly: mining documents relevant to
  * a topic seed list, building lexical baselines for hard-negative
  * mining, and scoring query-document pairs for retrieval eval sets.
  *
  * The whole scorer is ENGINE-EXACT integer arithmetic: the idf log runs
  * through [[Log2Fp]] (Q20 fixed-point binary log — an exact integer
  * algorithm, not libm), tf saturation and length normalization are ppm
  * fixed-point with defined truncation points, so the DuckDB oracle
  * replays every score bit-for-bit from raw text. Using log2 instead of
  * ln scales every idf by the constant 1/ln2 — ranking order is
  * unchanged, which is the only BM25 contract anyone relies on. */
object RankOps {

  /** BM25 top-k over a document table for a fixed bag of query terms.
    *
    * score(d) = Σ_t idf(t) · tf_t(d)·(k1+1) / (tf_t(d) + k1·(1 − b + b·dl/avgdl))
    * with the Lucene non-negative idf variant idf(t) = log((N+1)/(df_t+0.5)),
    * computed in Q20 as log2_fp(2N+2) − log2_fp(2·df_t+1) (doubling clears
    * the 0.5 without leaving integers). k1/b ride as ppm (defaults 1.2 and
    * 0.75); the tf term is ppm; the final per-term score is idf_fp-scaled
    * (Q20). All divisions are integral with fixed order — both engines
    * truncate identically.
    *
    * Scale shape: two corpus passes, the honest BM25 minimum (the
    * [[TextOps.ngramSurprise]] precedent) — pass 1 explodes tokens with
    * the per-doc length carried and filters to the query terms BEFORE the
    * shuffle, so only matching (id, dl, term) rows — a sliver at any
    * corpus size — ever leave the map side; pass 2 is a map-side-partial
    * global aggregate for (N, Σdl) producing ONE row. Per-term df and idf
    * live in a ≤ |terms|-row table joined back with an explicit broadcast
    * (bounded by construction). The final top-k is orderBy+limit —
    * Spark's TakeOrderedAndProject, per-partition heaps + driver merge of
    * k rows, never a global sort.
    *
    * Overflow bounds (documented, not checked per row): tf·(k1+1e6)·1e6
    * must fit a long → tf < 4.1e6 occurrences of one term in one document
    * at default k1; idf_fp ≤ 64·2^20 and the tf term ≤ (k1+1)·1e6 keep
    * the product far from the edge.
    *
    * Output: (id, score, n_terms, rank) — top k by (score desc, id asc),
    * rank 1-based; ties broken by id so the row set and order are
    * deterministic cross-engine. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1Ppm: Long = 1200000L, bPpm: Long = 750000L): DataFrame = {
    require(terms.nonEmpty && terms.size <= 1024, s"terms must be 1..1024, got ${terms.size}")
    require(k >= 1 && k <= 1000000, s"k=$k outside [1, 1e6]")
    require(k1Ppm >= 0L && k1Ppm <= 10000000L, s"k1Ppm=$k1Ppm outside [0, 1e7]")
    require(bPpm >= 0L && bPpm <= 1000000L, s"bPpm=$bPpm outside [0, 1e6]")

    // pass 1: (id, dl, term) -> tf; the isin prune runs map-side, so the
    // shuffle carries query-term hits only
    val tf = df
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__ts"))
      .select(col("id"), size(col("__ts")).cast("long").as("dl"),
        explode(col("__ts")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy("id", "dl", "token").agg(count(lit(1)).as("tf"))

    // pass 2: corpus stats, one row (map-side partial agg all the way)
    val stats = df
      .agg(count(lit(1)).cast("long").as("n_docs"),
        coalesce(sum(TextOps.tokenCount(col(textCol))), lit(0L)).as("sum_dl"))
      .withColumn("avgdl_ppm", greatest(expr("(sum_dl * 1000000L) DIV n_docs"), lit(1L)))

    // per-term idf over a <= |terms|-row table; the 1-row stats cross join
    // and the broadcast back to the tf stream are both bounded by
    // construction (the perceptronTrain weight-table precedent)
    val idf = tf.groupBy("token").agg(count(lit(1)).as("df_t"))
      .crossJoin(stats)
      .withColumn("idf_fp", Log2Fp(col("n_docs") * 2 + 2) - Log2Fp(col("df_t") * 2 + 1))
      .select("token", "idf_fp", "avgdl_ppm")

    val scored = tf.join(broadcast(idf), Seq("token"))
      .withColumn("__ratio", expr(s"(${bPpm}L * dl * 1000000L) DIV avgdl_ppm"))
      .withColumn("__denom",
        expr(s"tf * 1000000L + (${k1Ppm}L * (${1000000L - bPpm}L + __ratio)) DIV 1000000L"))
      .withColumn("__tfterm", expr(s"(tf * ${k1Ppm + 1000000L}L * 1000000L) DIV __denom"))
      .withColumn("__sc", expr("(idf_fp * __tfterm) DIV 1000000L"))

    val top = scored.groupBy("id")
      .agg(sum(col("__sc")).as("score"), count(lit(1)).cast("long").as("n_terms"))
      .orderBy(desc("score"), asc("id"))
      .limit(k)
    // rank over the k survivors only — the single-partition window is
    // bounded by k, never by the corpus
    top
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("score"), asc("id"))).cast("long"))
      .orderBy("rank")
  }

  /** TF-IDF top-k keyword extraction per document — the corpus-exploration
    * complement to [[bm25TopK]] (that ranks docs for a query; this labels
    * every doc with its most distinctive terms, the classic input to topic
    * browsing, cluster naming, and weak topic supervision).
    *
    * score(d, t) = tf_t(d) · idf(t) with the same Lucene non-negative idf
    * as bm25 — Q20-integral via [[graft.functions.Log2Fp]], so every
    * score and every selected keyword replays exactly in DuckDB.
    *
    * Scale shape: one explode + (id, token) hash agg for tf; the df_t/idf
    * table is VOCABULARY-sized — joined back on token with NO forced
    * broadcast (the quotaSelect discipline: AQE broadcasts it when it is
    * actually small, a web-scale vocabulary is not); the 1-row N table is
    * the only forced-tiny side. Per-doc top-k goes through
    * [[TextOps.topKPerStratum]] — the bounded-histogram quota selector,
    * no per-document sort at any fan-in; its selection contract (all rows
    * above the score cutoff, token-ascending ties AT the cutoff) is
    * exactly `row_number() OVER (PARTITION BY doc ORDER BY score DESC,
    * token) <= k`, which is what the oracle replays.
    *
    * Output: (id, token, tf, tfidf), ≤ k rows per document; empty docs
    * have no tokens and are naturally absent. */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Long = 3L): DataFrame = {
    import graft.functions.Log2Fp
    require(k >= 1L && k <= 1000L, s"k=$k outside [1, 1000]")
    val tf = df
      .select(col(idCol).as("id"), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val stats = df.agg(count(lit(1)).cast("long").as("n_docs"))
    val idf = tf.groupBy("token").agg(count(lit(1)).as("df_t"))
      .crossJoin(broadcast(stats))
      .select(col("token"),
        (Log2Fp(col("n_docs") * 2 + 2) - Log2Fp(col("df_t") * 2 + 1)).as("idf_fp"))
    val scored = tf.join(idf, Seq("token"))
      .select(col("id"), col("token"), col("tf"),
        (col("tf") * col("idf_fp")).as("tfidf"))
    TextOps.topKPerStratum(scored, "token", "id", col("tfidf"), k)
  }

  /** PMI collocation mining — the top-k adjacent-bigram collocations of a
    * corpus by pointwise mutual information: the phrase-mining step
    * (word2phrase / Mikolov et al. 2013) that turns "new york" into one
    * unit before tokenizer training, and the standard collocation report
    * in any corpus card.
    *
    * PMI(x, y) = log2( p(x,y) / (p(x)·p(y)) ), expanded to a SIGNED SUM
    * of five Q20 fixed-point logs — lf(c_xy) + 2·lf(N_uni) − lf(N_bi)
    * − lf(c_x) − lf(c_y) via [[Log2Fp]] — so no intermediate product
    * exists to overflow (c_xy·N_uni² would blow a long at crawl scale)
    * and the DuckDB oracle replays every score bit-for-bit. A `minCount`
    * floor on c_xy kills the rare-pair noise PMI is infamous for
    * (hapax pairs score arbitrarily high), standard practice since the
    * original paper.
    *
    * Scale shape: TWO corpus passes (the ngramSurprise precedent) — one
    * explode for adjacent-bigram counts, one for unigram counts, both
    * map-side-combined hash aggregates; both count tables are
    * vocabulary-sized and eagerly localCheckpointed because each feeds
    * two consumers (its total AND a join — the kmeansLloyd unpersist
    * lesson). Corpus totals derive from the count tables, never a third
    * pass. The unigram table joins back WITHOUT a forced broadcast (a
    * web-scale vocabulary is not small — AQE decides); the only forced
    * broadcast is the 1-row totals table. Top-k is orderBy+limit —
    * TakeOrderedAndProject per-partition heaps, never a global sort; the
    * rank window runs over the k survivors only.
    *
    * Output: (x, y, c_xy, c_x, c_y, pmi_fp, rank) — top k by
    * (pmi_fp desc, x asc, y asc), rank 1-based, deterministic
    * cross-engine. Docs with fewer than two tokens contribute no
    * bigrams; an all-short corpus yields an empty result. */
  def pmiCollocations(df: DataFrame, textCol: String,
      minCount: Long = 5L, k: Int = 100): DataFrame = {
    require(minCount >= 1L, s"minCount=$minCount must be >= 1")
    require(k >= 1 && k <= 1000000, s"k=$k outside [1, 1e6]")
    val toks = df.select(TextOps.tokens(col(textCol)).as("__ts"))
      .withColumn("__n", size(col("__ts")))
    // sequence(0, n-2) needs n >= 2: Spark's default step flips to -1
    // when start > stop, which would fabricate reversed indices
    val bigAll = toks.filter(col("__n") >= 2)
      .select(explode(transform(
        sequence(lit(0), col("__n") - 2),
        i => struct(
          element_at(col("__ts"), i + 1).as("x"),
          element_at(col("__ts"), i + 2).as("y")))).as("b"))
      .select(col("b.x").as("x"), col("b.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .localCheckpoint(true) // bigram-vocab-sized; feeds N_bi AND the survivor filter
    val uni = df.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // vocab-sized; feeds N_uni AND two joins
    val stats = bigAll.agg(coalesce(sum("c_xy"), lit(0L)).as("n_bi"))
      .crossJoin(uni.agg(coalesce(sum("c"), lit(0L)).as("n_uni")))
    val top = bigAll.filter(col("c_xy") >= minCount)
      .join(uni.select(col("token").as("x"), col("c").as("c_x")), Seq("x"))
      .join(uni.select(col("token").as("y"), col("c").as("c_y")), Seq("y"))
      .crossJoin(broadcast(stats)) // 1 row, bounded by construction
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        (Log2Fp(col("c_xy")) + Log2Fp(col("n_uni")) * 2 - Log2Fp(col("n_bi"))
          - Log2Fp(col("c_x")) - Log2Fp(col("c_y"))).as("pmi_fp"))
      .orderBy(desc("pmi_fp"), asc("x"), asc("y"))
      .limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(desc("pmi_fp"), asc("x"), asc("y")))
          .cast("long"))
      .orderBy("rank")
  }
}
