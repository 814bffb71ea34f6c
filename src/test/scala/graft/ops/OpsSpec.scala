package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()
  lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  /** documents + synthetic near-duplicates (perturbed copies) + exact dups. */
  lazy val dupCorpus = {
    val base = docs.limit(120).select(col("doc_id"), col("text"))
    val exact = base.limit(10)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val near = base.limit(20)
      .select((col("doc_id") + 20000).as("doc_id"),
        concat(col("text"), lit(" appended tail token")).as("text"))
    base.union(exact).union(near).cache()
  }

  test("token count / quality features are sane") {
    val r = TextOps.qualityFeatures(docs.limit(50), "text").collect()
    r.foreach { row =>
      val nChars = row.getAs[Long]("n_chars_calc")
      assert(nChars == row.getAs[String]("text").length)
      assert(row.getAs[Long]("n_tokens") > 0)
    }
    val empty = Seq("", "   ", "one two  three").toDF("text")
      .select(TextOps.tokenCount(col("text")).as("n")).as[Long].collect()
    assert(empty.toSeq == Seq(0L, 0L, 3L))
  }

  test("language-ID heuristic: script languages exact, latin falls back sanely") {
    // the driver's documents.lang labels are synthetic (text is English
    // tech-words for every label) — score against real multilingual text
    // from the generator's word banks instead
    import graft.gen.InputGen
    val rows = (0 until 200).flatMap { i =>
      InputGen.Langs.map { l =>
        val rng = new InputGen.Rng(9L, i.toLong, 2L)
        (l, InputGen.paragraph(rng, l))
      }
    }.toDF("lang", "text")
    val scored = rows.withColumn("pred", TextOps.langId(col("text"))).collect()
    scored.foreach { r =>
      val (lang, pred) = (r.getAs[String]("lang"), r.getAs[String]("pred"))
      lang match {
        case "zh" | "zh-Hant" => assert(pred == "zh", s"$lang -> $pred")
        case "ru"             => assert(pred == "ru")
        case "bo"             => assert(pred == "bo")
        case "kn"             => assert(pred == "kn")
        case _                => assert(Set("en", "nl", "de", "fr", "es").contains(pred))
      }
    }
  }

  test("exact dedup finds planted duplicates and keeps smallest id") {
    val groups = DedupOps.exactDupGroups(dupCorpus, "doc_id", "text").collect()
    assert(groups.length == 10)
    groups.foreach { g =>
      assert(g.getAs[Long]("dup_count") == 2)
      assert(g.getAs[Long]("keep_id") < 10000)
    }
    val deduped = DedupOps.exactDedup(dupCorpus, "doc_id", "text")
    assert(deduped.count() == dupCorpus.count() - 10)
    assert(deduped.filter(col("doc_id") >= 10000 && col("doc_id") < 20000).count() == 0)
  }

  test("NfcNormalize: composed/decomposed collapse, quick-path identity, brute-force parity") {
    val composedCafe = "Caf\u00e9 already composed"
    val decomposedCafe = "Cafe\u0301 decomposed acute"
    val decomposedRing = "A\u030aring decomposed ring"
    val precomposedMulti = "\u1e69 multi-mark"
    val decomposedMulti = "s\u0323\u0307 decomposed multi-mark"
    val cases = Seq("plain ascii stays", composedCafe, decomposedCafe,
      decomposedRing, precomposedMulti, decomposedMulti, "")
    val out = cases.toDF("s")
      .select(col("s"), graft.functions.NfcNormalize(col("s")).as("n"))
      .as[(String, String)].collect().toMap
    cases.foreach { c =>
      assert(out(c) == java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFC),
        s"NFC mismatch for codepoints ${c.codePoints().toArray.mkString(",")}")
    }
    // the quick paths return the INPUT unchanged; the slow path composes
    assert(out("plain ascii stays") == "plain ascii stays")
    assert(out(composedCafe) == composedCafe)
    assert(out(decomposedCafe) == "Caf\u00e9 decomposed acute")
    assert(out(decomposedRing) == "\u00c5ring decomposed ring")
    assert(out(decomposedMulti) == "\u1e69 decomposed multi-mark")
    // null in -> null out
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(graft.functions.NfcNormalize(col("s"))).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("normalized dedup: NFC + case + whitespace variants collapse, raw-distinct texts do not") {
    // four raw-distinct spellings of one logical doc + one genuinely different doc
    val rows = Seq(
      (1L, "The  Caf\u00e9\tMenu"),      // composed, tab + double space
      (2L, "the cafe\u0301 menu"),        // decomposed, lowercase, single spaces
      (3L, "THE CAF\u00c9 MENU"),         // composed uppercase E-acute
      (4L, "the cafe menu"),              // NO accent -- must stay distinct
      (5L, "  the caf\u00e9 menu  ")      // leading/trailing whitespace
    ).toDF("id", "text")
    val groups = DedupOps.normalizedDupGroups(rows, "id", "text")
      .orderBy("keep_id").collect()
    assert(groups.length == 2)
    assert(groups(0).getAs[Long]("keep_id") == 1L)
    assert(groups(0).getAs[Long]("dup_count") == 4L)
    assert(groups(0).getAs[String]("member_ids") == "1,2,3,5")
    assert(groups(1).getAs[Long]("keep_id") == 4L)
    val kept = DedupOps.normalizedDedup(rows, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
    // on the planted corpus normalized dedup can only remove MORE than exact
    val exactKept = DedupOps.exactDedup(dupCorpus, "doc_id", "text").count()
    val normKept = DedupOps.normalizedDedup(dupCorpus, "doc_id", "text").count()
    assert(normKept <= exactKept)
  }

  test("bestPerCluster: quality wins, ties to newest id, singletons keep themselves") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (9L, 9L))
      .toDF("id", "cluster_id")
    val quality = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 7L), (5L, 7L), (9L, 1L))
      .toDF("id", "q")
    val r = DedupOps.bestPerCluster(labels, quality).orderBy("cluster_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      (1L, 3L, 30L, 3L),   // q tie 2 vs 3 -> newest (3) wins, NOT min id
      (4L, 5L, 7L, 2L),    // uniform cluster -> newest
      (9L, 9L, 1L, 1L)))   // singleton
  }

  test("hostMirrors: containment/jaccard ppm, minShared cutoff, hot-digest guard vs true totals") {
    // host a: t1..t4; host b mirrors t1..t3; host c holds t1 only (+ a
    // same-host duplicate url that must collapse in the DISTINCT);
    // host d shares nothing
    val rows = Seq(
      ("https://a.example/doc1", "t1"), ("https://a.example/doc2", "t2"),
      ("https://a.example/doc3", "t3"), ("https://a.example/doc4", "t4"),
      ("https://b.example/doc1", "t1"), ("https://b.example/doc2", "t2"),
      ("https://b.example/doc3", "t3"),
      ("https://c.example/doc1", "t1"), ("https://c.example/dup", "t1"),
      ("https://d.example/doc9", "t9")).toDF("url", "text")
    val r = DedupOps.hostMirrors(rows, "url", "text", minShared = 2L)
      .orderBy("host_a", "host_b").collect()
    // only (a,b) reaches minShared=2: shared 3, n_a=4, n_b=3
    assert(r.length == 1)
    val p = r(0)
    assert(p.getAs[String]("host_a") == "a.example" &&
      p.getAs[String]("host_b") == "b.example")
    assert(p.getAs[Long]("n_shared") == 3L && p.getAs[Long]("n_a") == 4L &&
      p.getAs[Long]("n_b") == 3L)
    assert(p.getAs[Long]("containment_a_ppm") == 750000L)
    assert(p.getAs[Long]("containment_b_ppm") == 1000000L)
    assert(p.getAs[Long]("jaccard_ppm") == 750000L) // 3e6 DIV (4+3-3)
    // hot-digest guard: t1 sits on 3 hosts; cap 2 removes it from PAIR
    // discovery ((a,b) drops to shared 2 — t2,t3) but totals stay true
    val g = DedupOps.hostMirrors(rows, "url", "text", minShared = 2L,
        maxHostsPerDigest = 2).orderBy("host_a", "host_b").collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("n_shared") == 2L && g(0).getAs[Long]("n_a") == 4L)
    assert(g(0).getAs[Long]("containment_a_ppm") == 500000L)
  }

  test("calibratedGate: data-derived cutoffs, inclusive bounds, tails dropped") {
    // values 1..10 once each: p10 cutoff = 1 (cum 1*100 >= 10*10), p90 = 9
    val rows = (1L to 10L).map(i => (i, i)).toDF("id", "score")
    val r = TextOps.calibratedGate(rows, "id", col("score"), 10, 90)
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4)))
    assert(r.forall(x => x._3 == 1L && x._4 == 9L))
    assert(r.filter(_._5).map(_._1).toSeq == (1L to 9L)) // 10 dropped, bounds inclusive
    intercept[IllegalArgumentException] {
      TextOps.calibratedGate(rows, "id", col("score"), 90, 10)
    }
  }

  test("boilerplateCatalog: doc-count votes, within-doc repeats count once, topK order") {
    val footer = "click here to subscribe"
    val rows = Seq(
      (1L, s"alpha beta gamma $footer"),
      (2L, s"delta epsilon $footer zeta"),
      (3L, s"$footer eta $footer"),          // footer twice -> one vote
      (4L, "unrelated words only here now"),
      (5L, s"theta iota $footer")).toDF("id", "text")
    val r = TextOps.boilerplateCatalog(rows, "id", "text", window = 4,
      minDocs = 3L, topK = 3).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r.head == (footer, 4L)) // docs 1,2,3,5 — doc 3 votes ONCE
    assert(r.forall(_._2 >= 3L) && r.length <= 3)
    // short docs (< window tokens) contribute nothing and don't throw
    val short = Seq((9L, "a b c")).toDF("id", "text")
    assert(TextOps.boilerplateCatalog(short, "id", "text", window = 4,
      minDocs = 1L).count() == 0)
  }

  test("tokenDrift: ppm math, appeared/vanished tokens, minPpm bound") {
    val a = Seq("x x y", "y z").toDF("text")        // tf x2 y2 z1, total 5
    val b = Seq("x y", "w w").toDF("text")          // tf x1 y1 w2, total 4
    val r = TextOps.tokenDrift(a, b, "text", minPpm = 100L).orderBy("token")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5)))
    assert(r.toSeq == Seq(
      ("w", 0L, 2L, 0L, 500000L, 500000L),          // appeared
      ("x", 2L, 1L, 400000L, 250000L, -150000L),
      ("y", 2L, 1L, 400000L, 250000L, -150000L),
      ("z", 1L, 0L, 200000L, 0L, -200000L)))        // vanished
    // minPpm bounds the report by the LARGER side
    val m = TextOps.tokenDrift(a, b, "text", minPpm = 250000L)
      .select("token").as[String].collect().toSet
    assert(m == Set("w", "x", "y"))
  }

  test("filterFunnel: cumulative stage accounting, null gate drops, single-pass plan") {
    val rows = Seq((1L, "aa", 5L), (2L, "bb", 50L), (3L, "aa", 60L),
      (4L, "aa", 70L), (5L, null.asInstanceOf[String], 80L))
      .toDF("id", "tag", "score")
    val r = TextOps.filterFunnel(rows, Seq(
      "score_floor" -> (col("score") >= 50L),
      "tag_aa" -> (col("tag") === "aa"))) // null tag -> null predicate -> drop
      .orderBy("stage").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (1L, "score_floor", 5L, 1L, 4L),   // id1 dropped
      (2L, "tag_aa", 4L, 2L, 2L)))       // id2 (bb) and id5 (null) dropped
    intercept[IllegalArgumentException] {
      TextOps.filterFunnel(rows, Seq.empty)
    }
    // single pass: exactly one aggregate over the input in the plan
    val plan = TextOps.filterFunnel(rows,
      Seq("a" -> (col("score") > 0L), "b" -> (col("score") > 1L)))
      .queryExecution.optimizedPlan
    val nAggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size
    assert(nAggs == 1)
  }

  test("DeflateSize + compression gate: determinism, tails, byte counting") {
    import java.util.zip.Deflater
    def jdkDeflate(t: String): Long = {
      val d = new Deflater(6, true)
      d.setInput(t.getBytes(java.nio.charset.StandardCharsets.UTF_8)); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    val spam = "spam ham " * 200
    val prose = docs.limit(1).select("text").as[String].head()
    val cases = Seq(spam, prose, "", "caf\u00e9")
    val out = TextOps.compressionSignal(
        cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
        "id", "text")
      .orderBy("id").collect()
    // expression output == the JDK codec run driver-side (same zlib build)
    cases.zip(out).foreach { case (t, r) =>
      assert(r.getAs[Long]("n_deflate") == jdkDeflate(t))
      assert(r.getAs[Long]("n_bytes") ==
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
    }
    // multibyte: 4 chars, 5 UTF-8 bytes
    assert(out(3).getAs[Long]("n_bytes") == 5L)
    // empty text: framing bytes > 0 but ratio pinned to 0
    assert(out(2).getAs[Long]("n_deflate") > 0L)
    assert(out(2).getAs[Long]("ratio_ppm") == 0L)
    // the signal separates the tails by an order of magnitude
    val spamR = out(0).getAs[Long]("ratio_ppm")
    val proseR = out(1).getAs[Long]("ratio_ppm")
    assert(spamR < 50000L, s"spam ratio $spamR")
    assert(proseR > 300000L && proseR < 1000000L, s"prose ratio $proseR")
    // gate: both bounds bind on the planted corpus
    val gated = TextOps.compressionGate(
      graft.VerifyTables.compressionCorpus(spark, "/root/testdata/sf0.001"),
      "id", "text", minPpm = 100000L, maxPpm = 950000L)
    val byRange = gated.withColumn("bucket",
        when(col("id") >= 500000L, "multi")
          .when(col("id") >= 400000L, "blob")
          .when(col("id") >= 300000L, "spam")
          .otherwise("doc"))
      .groupBy("bucket", "kept").count().collect()
      .map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(!byRange.contains(("spam", true)) && byRange(("spam", false)) > 0)
    assert(!byRange.contains(("blob", true)) && byRange(("blob", false)) > 0)
    assert(byRange(("doc", true)) > 0)
    // the multibyte plant is ordinary prose plus a suffix — it survives
    assert(byRange(("multi", true)) > 0)
  }

  test("MinHash-LSH finds every brute-force Jaccard≥0.7 pair (no false negatives at high sim)") {
    val brute = DedupOps.bruteForceJaccardPairs(dupCorpus, "doc_id", "text", threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "corpus should contain near-dup pairs")
    val lsh = DedupOps.minhashDupPairs(dupCorpus, "doc_id", "text",
      numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val missed = brute -- lsh
    assert(missed.isEmpty, s"LSH missed: $missed")
    // and LSH candidates verified by exact jaccard agree with brute force
    val verified = DedupOps.ngramJaccard(dupCorpus, "doc_id", "text",
      DedupOps.minhashDupPairs(dupCorpus, "doc_id", "text", 64, 16, 0.5).select("id_a", "id_b"))
      .filter(col("jaccard") >= 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(verified == brute)
  }

  test("SimHash: exact dups at distance 0; banded join finds them") {
    val pairs = DedupOps.simhashDupPairs(dupCorpus, "doc_id", "text", maxHamming = 3)
      .collect()
    val exactPairs = pairs.filter(_.getAs[Int]("hamming") == 0)
    assert(exactPairs.length >= 10) // the 10 planted exact dups
    pairs.foreach(p => assert(p.getAs[Int]("hamming") <= 3))
  }

  test("native MinHashShingleSig ≡ independent Scala reference; codegen ≡ interpreted") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    def refSig(text: String): Seq[Long] = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val th = toks.map(w => XXH64.hashUTF8String(UTF8String.fromString(w), 42L))
      val n = th.length
      val win = math.min(math.max(n, 1), 3)
      val nw = math.max(n - win + 1, 1)
      val seeds = Array.tabulate(64)(j => XXH64.hashInt(j, 42L))
      val mins = Array.fill(64)(Long.MaxValue)
      for (w <- 0 until nw) {
        var h = 42L
        for (i <- w until math.min(w + win, n)) h = XXH64.hashLong(th(i), h)
        for (j <- 0 until 64) {
          val hj = XXH64.hashLong(h, seeds(j))
          if (hj < mins(j)) mins(j) = hj
        }
      }
      mins.toSeq
    }
    val sample = docs.limit(20).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = DedupOps.minhashSignatures(docs.limit(20), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sample.foreach { case (id, text) =>
      assert(got(id) == refSig(text), s"sig mismatch for doc $id")
    }
    // interpreted path agrees with codegen
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = DedupOps.minhashSignatures(docs.limit(20), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(interp == got)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("native SimHash64 expression ≡ columnar 64-fold formulation (and codegen path ≡ interpreted)") {
    val th = DedupOps.tokenHashes(col("text"))
    val both = dupCorpus
      .select(col("doc_id"),
        DedupOps.simhashOfHashes(th).as("native"),
        DedupOps.simhashOfHashesColumnar(th).as("columnar"))
    assert(both.filter(col("native") =!= col("columnar")).count() == 0)
    // interpreted eval path (codegen off) must agree too
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = dupCorpus.select(col("doc_id"), DedupOps.simhashOfHashes(th).as("native"))
      assert(both.select("doc_id", "native").except(interp).count() == 0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("embedding-cosine near-dup: planted exact dups found at cos=1; threshold respected") {
    val vecs = dupCorpus.select(col("doc_id").as("id"),
      TextOps.hashedBowVector(col("text"), 64).as("vec"))
    val pairs = SimilarityOps.embeddingDupPairs(vecs, "id", "vec", threshold = 0.95)
      .collect()
    val exact = pairs.filter(_.getAs[Long]("cos_x1e6") == 1000000L)
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // the 10 planted exact duplicates have identical vectors → cosine 1,
    // and identical vectors always share every LSH band
    val planted = (0 until 10).map { i =>
      val base = dupCorpus.orderBy("doc_id").limit(120).collect()(i).getAs[Long]("doc_id")
      (base, base + 10000)
    }.toSet
    assert(planted.subsetOf(exact), s"missing exact dups: ${planted -- exact}")
    pairs.foreach(p => assert(p.getAs[Long]("cos_x1e6") >= 950000L))
  }

  test("native CosineSim ≡ columnar dot/(norm·norm) bit-for-bit; codegen ≡ interpreted") {
    val pairs = embs.limit(60).select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(embs.limit(20).select(col("vec_id").as("ib"), col("embedding").as("vb")))
    val both = pairs.select(col("ia"), col("ib"),
      SimilarityOps.cosine(col("va"), col("vb")).as("native"),
      SimilarityOps.cosineColumnar(col("va"), col("vb")).as("columnar"))
    // bit-identical, not just approximately equal — rank/oracle stability
    assert(both.filter(col("native") =!= col("columnar")).count() == 0)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = pairs.select(col("ia"), col("ib"),
        SimilarityOps.cosine(col("va"), col("vb")).as("native"))
      assert(both.select("ia", "ib", "native").except(interp).count() == 0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("hamming distance column = Java popcount") {
    val rows = Seq((0L, 0L), (1L, 0L), (-1L, 0L), (0x1234abcdL, 0x4321dcbaL),
      (Long.MinValue, Long.MaxValue)).toDF("a", "b")
    val got = rows.select(DedupOps.hammingDistance(col("a"), col("b"))).as[Int].collect()
    val want = Seq((0L, 0L), (1L, 0L), (-1L, 0L), (0x1234abcdL, 0x4321dcbaL),
      (Long.MinValue, Long.MaxValue)).map { case (a, b) => java.lang.Long.bitCount(a ^ b) }
    assert(got.toSeq == want)
  }

  test("brute-force ANN: exact self-retrieval and symmetric sanity") {
    val queries = embs.limit(8)
    val top = SimilarityOps.bruteForceTopK(embs, queries, "vec_id", "embedding", k = 5,
      excludeSelf = false).cache()
    // rank 1 for each query must be itself (cosine=1)
    val r1 = top.filter(col("rank") === 1).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect()
    r1.foreach { case (q, n) => assert(q == n, s"query $q self-sim not rank1 (got $n)") }
    assert(top.groupBy("query_id").count().select(min("count")).as[Long].head() == 5)
  }

  test("hardNegatives: positives anti-joined before top-k, exactly k true negatives") {
    val queries = embs.limit(8)
    val top = SimilarityOps.bruteForceTopK(embs, queries, "vec_id", "embedding", k = 8)
      .cache()
    // positives = each query's true rank-1 and rank-3 neighbors
    val pos = top.filter(col("rank").isin(1, 3))
      .select(col("query_id"), col("neighbor_id").as("pos_id"))
    val negs = SimilarityOps.hardNegatives(embs, queries, pos,
      "vec_id", "embedding", k = 5).cache()
    // exactly 5 negatives per query, ranks 1..5
    assert(negs.groupBy("query_id").count().select(min("count")).as[Long].head() == 5)
    assert(negs.groupBy("query_id").count().select(max("count")).as[Long].head() == 5)
    // negatives = brute ranks {2,4,5,6,7} renumbered 1..5, per query
    val want = top.filter(col("rank").isin(2, 4, 5, 6, 7))
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val got = negs.select("query_id", "neg_id", "neg_rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(got == want)
    // no positive ever appears as a negative
    val leaked = negs.join(pos,
      negs("query_id") === pos("query_id") && negs("neg_id") === pos("pos_id"))
    assert(leaked.count() == 0)
  }

  /** Deterministic clustered embeddings: 10 unit-norm gaussian centers,
    * points = center + noise·gaussian, labels interleaved. The driver's
    * embeddings.parquet is isotropic noise at every SF (measured: intra-
    * vs inter-label cosine 0.009 vs −0.004 at sf0.01) — no pruned-search
    * index can hit high recall there, so the ≥0.9 gate runs on data that
    * actually has the cluster structure IVF exists to exploit. */
  private def clusteredEmbeddings(n: Int, dim: Int, k: Int, noise: Double) = {
    val rng = new java.util.Random(42)
    val centers = Array.fill(k) {
      val c = Array.fill(dim)(rng.nextGaussian())
      val nrm = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / nrm)
    }
    val rows = (0 until n).map { i =>
      val c = centers(i % k)
      (i.toLong, c.map(x => (x + noise * rng.nextGaussian()).toFloat).toSeq)
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
  }

  test("IVF ANN achieves ≥90% recall@10 vs brute force on clustered data at the registered config (nlist=16, nprobe=4, FPS+Lloyd codebook)") {
    val corpus = clusteredEmbeddings(500, 64, 10, 0.2).cache()
    val queries = corpus.limit(25)
    val brute = SimilarityOps.bruteForceTopK(corpus, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = SimilarityOps.ivfTopK(corpus, queries, "vec_id", "embedding", 10,
      nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF recall $recall")
  }

  test("IVF ANN recall floor on the driver's isotropic embeddings table (structure-free worst case)") {
    // With zero cluster structure, probing 4/16 lists bounds recall near
    // the scanned corpus fraction — the gate here only pins that the
    // pipeline stays sane on the worst-case input, not index quality.
    val corpus = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    val queries = corpus.limit(25)
    val brute = SimilarityOps.bruteForceTopK(corpus, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = SimilarityOps.ivfTopK(corpus, queries, "vec_id", "embedding", 10,
      nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.4, s"IVF recall $recall")
  }

  test("persistent IVF index: queryIvfIndex ≡ ivfTopK (same codebook); probe scan reads ONLY probed lists' files") {
    val corpus = clusteredEmbeddings(500, 64, 10, 0.2).cache()
    val queries = corpus.limit(25)
    val idxDir = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    val cents = SimilarityOps.buildIvfIndex(corpus, "vec_id", "embedding", idxDir, nlist = 16)
    val viaIndex = SimilarityOps.queryIvfIndex(spark, idxDir, cents, queries,
      "vec_id", "embedding", k = 10, nprobe = 4)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val oneShot = SimilarityOps.ivfTopK(corpus, queries, "vec_id", "embedding", 10,
      nlist = 16, nprobe = 4, centroids = Some(cents))
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(viaIndex == oneShot, "prebuilt-index query must equal the one-shot IVF result")

    // partition pruning, proved at execution level: with ONE query probing
    // nprobe lists, the scan's input files stay inside those lists' dirs
    val oneQuery = corpus.limit(1)
    val probedScan = SimilarityOps.queryIvfIndex(spark, idxDir, cents, oneQuery,
      "vec_id", "embedding", k = 10, nprobe = 2)
    probedScan.collect() // execute
    val cmat = cents.sortBy(_._1).map(_._2.toVector).toVector
    val probedLists = oneQuery
      .select(explode(graft.functions.NearestCentroids(col("embedding"), cmat, 2)).as("l"))
      .as[Int].collect().toSet
    val filesRead = spark.read.parquet(idxDir)
      .filter(col("list_idx").isin(probedLists.toSeq.map(Integer.valueOf): _*))
      .select(input_file_name()).distinct().as[String].collect()
    assert(filesRead.nonEmpty &&
      filesRead.forall(f => probedLists.exists(l => f.contains(s"list_idx=$l/"))),
      s"probe scan escaped its lists: ${filesRead.take(3).mkString(", ")}")
    // the index genuinely holds other lists the probe did not read
    val allLists = spark.read.parquet(idxDir).select("list_idx").distinct().count()
    assert(allLists > probedLists.size, s"need unprobed lists ($allLists vs ${probedLists.size})")
  }

  test("native NearestCentroids ≡ columnar probe-list formulation (top-1 and nprobe=4); codegen ≡ interpreted") {
    val cents = SimilarityOps.collectCentroids(embs, "vec_id", "embedding", 8)
    val cmat = cents.sortBy(_._1).map(_._2.toVector).toVector
    def check(): Unit = {
      val both = embs.select(col("vec_id"),
        graft.functions.NearestCentroids(col("embedding"), cmat, 4).as("native"),
        SimilarityOps.probeListColumnar(col("embedding"), cents, 4).as("columnar"),
        element_at(graft.functions.NearestCentroids(col("embedding"), cmat, 1), 1).as("native1"),
        element_at(SimilarityOps.probeListColumnar(col("embedding"), cents, 1), 1).as("columnar1"))
      assert(both.filter(to_json(col("native")) =!= to_json(col("columnar"))).count() == 0)
      assert(both.filter(col("native1") =!= col("columnar1")).count() == 0)
    }
    check()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      check()
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("farthest-point centroids: deterministic, spread across clusters") {
    val a = SimilarityOps.collectCentroids(embs, "vec_id", "embedding", 8)
    val b = SimilarityOps.collectCentroids(embs, "vec_id", "embedding", 8)
    assert(a.map(_._2.toSeq).toSeq == b.map(_._2.toSeq).toSeq)
    assert(a.length == 8 && a.map(_._1).toSeq == (0 until 8))
    // pairwise distinct (FPS never re-picks an already-chosen point)
    assert(a.map(_._2.toSeq).distinct.length == 8)
  }

  test("fingerprint is order-sensitive and deterministic") {
    val r = Seq("a b c", "c b a", "a b c").toDF("text")
      .select(TextOps.fingerprint(col("text")).as("fp")).as[Long].collect()
    assert(r(0) == r(2) && r(0) != r(1))
  }

  test("native CosineLshSig ≡ columnar formulation at 64 bits (double AND float vectors); codegen ≡ interpreted") {
    // array<double> input: hashed-BoW doc vectors
    val vecs = dupCorpus.select(col("doc_id"),
      TextOps.hashedBowVector(col("text"), 64).as("vec"))
    val both = vecs.select(col("doc_id"),
      SimilarityOps.cosineLshSignature(col("vec"), 64).as("native"),
      SimilarityOps.cosineLshSignatureColumnar(col("vec"), 64).as("columnar"))
    assert(both.filter(col("native") =!= col("columnar")).count() == 0)
    // array<float> input: the embeddings table
    val fboth = embs.limit(100).select(col("vec_id"),
      SimilarityOps.cosineLshSignature(col("embedding"), 64).as("native"),
      SimilarityOps.cosineLshSignatureColumnar(col("embedding"), 64).as("columnar"))
    assert(fboth.filter(col("native") =!= col("columnar")).count() == 0)
    // non-default widths agree too
    val short = vecs.select(
      SimilarityOps.cosineLshSignature(col("vec"), 16).as("native"),
      SimilarityOps.cosineLshSignatureColumnar(col("vec"), 16).as("columnar"))
    assert(short.filter(col("native") =!= col("columnar")).count() == 0)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = vecs.select(col("doc_id"),
        SimilarityOps.cosineLshSignature(col("vec"), 64).as("native"))
      assert(both.select("doc_id", "native").except(interp).count() == 0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("native HashedBow ≡ columnar formulation bit-for-bit; codegen ≡ interpreted") {
    val both = dupCorpus.select(col("doc_id"),
      TextOps.hashedBowVector(col("text"), 64).as("native"),
      TextOps.hashedBowVectorColumnar(col("text"), 64).as("columnar"))
    assert(both.filter(col("native") =!= col("columnar")).count() == 0)
    val empty = Seq("", "   ").toDF("text")
      .select(TextOps.hashedBowVector(col("text"), 8).as("v")).as[Seq[Double]].collect()
    empty.foreach(v => assert(v == Seq.fill(8)(0.0)))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = dupCorpus.select(col("doc_id"),
        TextOps.hashedBowVector(col("text"), 64).as("native"))
      assert(both.select("doc_id", "native").except(interp).count() == 0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  /** Heavy-boilerplate corpus: every doc shares the template tokens and
    * differs only in a unique tail — the web-scale shape that concentrates
    * LSH buckets. */
  private def boilerplateCorpus(n: Int) = {
    val template = "home about contact copyright all rights reserved nav menu " +
      "footer header subscribe newsletter privacy policy terms of service"
    spark.range(n.toLong)
      .select(col("id"), concat(lit(template + " page token "), col("id")).as("text"))
  }

  test("minhashPairsAgainstIndex: arrivals pair with index only; index never self-pairs; guard on index side") {
    val sigA = Array.tabulate(64)(i => i.toLong)
    val sigB = Array.tabulate(64)(i => i + 1000L)
    val sigC = Array.tabulate(64)(i => i + 2000L)
    val index = Seq((1L, sigA), (2L, sigB), (3L, sigA)).toDF("id", "sig")
    val arrivals = Seq((100L, sigA), (101L, sigC)).toDF("id", "sig")
    val r = DedupOps.minhashPairsAgainstIndex(arrivals, index, threshold = 0.5)
      .select("id_new", "id_idx").as[(Long, Long)].collect().toSet
    // arrival 100 matches BOTH copies of sigA in the index; the index's
    // own near-dup pair (1,3) is never emitted; arrival 101 is clean
    assert(r == Set((100L, 1L), (100L, 3L)))
    // est_jaccard on an exact signature match is 1.0
    val j = DedupOps.minhashPairsAgainstIndex(arrivals, index, threshold = 0.5)
      .filter(col("id_idx") === 1L).select("est_jaccard").as[Double].head()
    assert(j == 1.0)
    // hot-bucket guard: cap 1 drops the two-entry sigA index buckets
    val g = DedupOps.minhashPairsAgainstIndex(arrivals, index,
      threshold = 0.5, maxBucketSize = 1)
    assert(g.count() == 0)
  }

  test("hot-bucket guard bounds candidates on a boilerplate-heavy corpus (simhash + embedding LSH)") {
    val n = 2000
    val corpus = boilerplateCorpus(n).cache()
    // SimHash: near-identical docs concentrate the 16-bit chunks. With the
    // guard at 100, every (band, chunk) bucket contributes ≤ 100·(100-1)/2
    // pairs, so candidates ≤ guardBound regardless of skew.
    val simSigs = DedupOps.simhashSignatures(corpus, "id", "text").cache()
    val simBanded = simSigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("band", "chunk")))
    val guarded = DedupOps.guardedSelfJoin(simBanded, Seq("sig"), maxBucketSize = 100).count()
    // the dominant (hot) buckets are dropped entirely; what remains is the
    // long tail — far below the unguarded all-pairs blow-up (~n²/bands)
    assert(guarded < n.toLong * 100, s"guarded candidate count $guarded not ~O(n·cap)")
    // embedding LSH end-to-end: the 64-bit/16-bit-chunk default plus the
    // guard must keep candidates bounded even though every vector is
    // nearly identical (this corpus is the review's degenerate case)
    val vecs = corpus.select(col("id"), TextOps.hashedBowVector(col("text"), 64).as("vec"))
    val pairs = SimilarityOps.embeddingDupPairs(vecs, "id", "vec",
      threshold = 0.95, maxBucketSize = 100)
    assert(pairs.count() < n.toLong * 100)
  }

  test("hot-bucket guard drops planted degenerate buckets but keeps the long tail") {
    // 300 identical signatures (one hot bucket per band) + 20 distinct ones
    val hot = spark.range(300).select(col("id"), lit(0x1234_5678_9abc_def0L).as("sig"))
    val tail = spark.range(300, 320)
      .select(col("id"), (col("id") * 1000000007L).as("sig"))
    val sigs = hot.union(tail)
    val pairs = DedupOps.simhashPairsFromSigs(sigs, maxHamming = 3, maxBucketSize = 100)
      .collect()
    // no pair from the hot bucket survives (both endpoints ≥ 300 excluded…
    // actually hot ids are 0-299: no pair may have BOTH endpoints < 300)
    assert(!pairs.exists(p => p.getAs[Long]("id_a") < 300 && p.getAs[Long]("id_b") < 300))
    // and with the guard above the bucket size, the hot pairs come back
    val unguarded = DedupOps.simhashPairsFromSigs(sigs, maxHamming = 3, maxBucketSize = 1000)
    assert(unguarded.filter(col("id_a") < 300 && col("id_b") < 300).count() == 300L * 299 / 2)
  }

  test("embedding LSH 64-bit default: planted exact dups still found, candidate domain is 16-bit") {
    val vecs = dupCorpus.select(col("doc_id").as("id"),
      TextOps.hashedBowVector(col("text"), 64).as("vec"))
    val pairs = SimilarityOps.embeddingDupPairs(vecs, "id", "vec", threshold = 0.95)
      .collect()
    val exact = pairs.filter(_.getAs[Long]("cos_x1e6") == 1000000L)
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val planted = (0 until 10).map { i =>
      val base = dupCorpus.orderBy("doc_id").limit(120).collect()(i).getAs[Long]("doc_id")
      (base, base + 10000)
    }.toSet
    assert(planted.subsetOf(exact), s"missing exact dups: ${planted -- exact}")
  }

  test("TopKSimAgg skips NaN similarities (zero-norm vectors) instead of corrupting the heap") {
    val rows = Seq(
      (1L, 10L, 0.9), (1L, 11L, Double.NaN), (1L, 12L, 0.8),
      (1L, 13L, Double.NaN), (1L, 14L, 0.95)
    ).toDF("query_id", "neighbor_id", "sim")
    val top = rows.groupBy("query_id")
      .agg(graft.functions.TopKSimAgg(col("sim"), col("neighbor_id"), 3).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.neighbor_id"), col("e.sim"))
      .as[(Long, Double)].collect().toSeq
    assert(top == Seq((14L, 0.95), (10L, 0.9), (12L, 0.8)))
  }

  test("sequence packing: greedy close-when-exceeded cut, no doc split, shard-local") {
    // one shard (ids all ≡ 0 mod 1): tokens 5,5,5 at budget 12 → cum_before
    // 0,5,10 → packs 0,0,0 (third doc overflows pack 0: close-when-exceeded
    // admits the doc whose cum_before is still inside the budget); the
    // fourth doc (cum_before 15) opens pack 1
    val df = Seq(
      (0L, "a b c d e"), (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d e")
    ).toDF("doc_id", "text")
    val packed = TextOps.packSequences(df, "doc_id", "text", tokenBudget = 12L, nShards = 1)
      .orderBy("doc_id").select("doc_id", "pack_id").as[(Long, Long)].collect().toSeq
    assert(packed == Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L)))

    // invariants on real docs: every doc appears exactly once; within a
    // shard, pack ids are contiguous from 0 and non-decreasing in id
    // order; every pack but a shard's last holds ≥ budget tokens only via
    // its LAST doc (i.e. cum_before of each pack's first doc is below the
    // next multiple of budget)
    val budget = 512L
    val p = TextOps.packSequences(docs, "doc_id", "text", budget, nShards = 4).cache()
    assert(p.count() == docs.count())
    val perShard = p.groupBy("shard")
      .agg(max("pack_id").as("mx"), countDistinct("pack_id").as("nd"))
      .as[(Long, Long, Long)].collect()
    perShard.foreach { case (_, mx, nd) => assert(nd == mx + 1, "pack ids not contiguous") }
    // summary totals = doc totals
    val sum1 = TextOps.packSummary(p).agg(sum("pack_tokens")).as[Long].head()
    val sum2 = p.agg(sum("n_tokens")).as[Long].head()
    assert(sum1 == sum2)
  }

  test("canonical url: fragments, tracking params, punct cleanup, case-fold, trailing slash") {
    val cases = Seq(
      "https://A.Example/Path#frag"                    -> "https://a.example/Path",
      "HTTPS://HOST.x/p?utm_source=a&q=1"              -> "https://host.x/p?q=1",
      "https://h.x/p?a=1&utm_x=2&b=3"                  -> "https://h.x/p?a=1&b=3",
      "https://h.x/p?utm_a=1&utm_b=2"                  -> "https://h.x/p",
      "https://h.x/p?fbclid=abc"                       -> "https://h.x/p",
      "https://h.x/dir/"                               -> "https://h.x/dir",
      "https://h.x/"                                   -> "https://h.x",
      "https://h.x/p?gclid=1&keep=2#s"                 -> "https://h.x/p?keep=2",
      // tracking-token substrings mid-param-name must be left alone: the
      // pattern is anchored to a [?&] boundary
      "https://h.x/p?afbclid=x"                        -> "https://h.x/p?afbclid=x",
      "https://h.x/p?a=1&mygclid=2"                    -> "https://h.x/p?a=1&mygclid=2",
      "https://h.x/p?autm_x=1"                         -> "https://h.x/p?autm_x=1",
      "https://h.x/p?fbclid=a&fbclid=b"                -> "https://h.x/p",
      "https://h.x/CaseKept/Path"                      -> "https://h.x/CaseKept/Path")
    val got = cases.map(_._1).toDF("u")
      .select(TextOps.canonicalUrl(col("u"))).as[String].collect().toSeq
    assert(got == cases.map(_._2), got.zip(cases).filter { case (g, (_, e)) => g != e }.toString)
  }

  test("stratified sample: exact per-stratum quota, deterministic, not first-k-by-id") {
    val d = docs.select("doc_id", "lang")
    val sampled = TextOps.stratifiedSample(d, "doc_id", "lang", 0.25).cache()
    val quota = d.groupBy("lang").count()
      .select(col("lang"), ceil(col("count") * 0.25).as("q"))
      .as[(String, Long)].collect().toMap
    val got = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got == quota, s"per-stratum counts $got != quotas $quota")
    // deterministic across evaluations
    val again = TextOps.stratifiedSample(d, "doc_id", "lang", 0.25)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(again == sampled.orderBy("doc_id").as[(Long, String)].collect().toSeq)
    // the permutation must not just take the first k ids of a stratum
    val firstK = d.orderBy("doc_id").limit(quota.values.sum.toInt)
      .as[(Long, String)].collect().map(_._1).toSet
    val sampledIds = sampled.as[(Long, String)].collect().map(_._1).toSet
    assert(sampledIds != firstK, "sample degenerated to first-k-by-id")
  }

  test("stratified sample: histogram-cutoff selection ≡ single-window oracle; no full-input stratum sort") {
    val d = docs.select("doc_id", "lang")
    for (frac <- Seq(0.1, 0.25, 0.5, 1.0)) {
      val fast = TextOps.stratifiedSample(d, "doc_id", "lang", frac)
        .orderBy("doc_id").as[(Long, String)].collect().toSeq
      val naive = TextOps.stratifiedSampleSingleWindow(d, "doc_id", "lang", frac)
        .orderBy("doc_id").as[(Long, String)].collect().toSeq
      assert(fast == naive, s"selection diverged from single-window oracle at frac=$frac")
    }
    // plan pin: the only row_number window runs over the cutoff-tie rows
    // (child subtree filtered on __cut) — NEVER a sort of a whole stratum
    // of the input; cumulative windows run over the bounded ord histogram
    // (child subtree contains the groupBy aggregate).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, Window => LWindow}
    // frac=0.3: an earlier test .cache()s the frac=0.25 query, and the
    // cache manager would substitute an InMemoryRelation for an identical
    // plan — hiding the Window nodes this pin inspects
    val lp = TextOps.stratifiedSample(d, "doc_id", "lang", 0.3).queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val isRowNumber = w.windowExpressions.exists(_.toString.toLowerCase.contains("row_number"))
      if (isRowNumber) {
        // Catalyst folds the __ord === __cut tie filter into the join
        // condition — either shape proves the window sees only tie rows
        val tieFiltered = w.collectFirst {
          case f: Filter if f.condition.references.exists(_.name == "__cut") => f
          case j: Join if j.condition.exists(_.references.exists(_.name == "__cut")) => j
        }.nonEmpty
        assert(tieFiltered, s"row_number window not restricted to cutoff ties:\n$w")
      } else {
        val overHistogram = w.collectFirst { case a: Aggregate => a }.nonEmpty
        assert(overHistogram, s"cumulative window not over the bounded histogram:\n$w")
      }
    }
  }

  test("connected components: chains, cycles, singletons; min-id labels; early convergence") {
    // component A: 9-node path 18-17-…-10 ordered so the min id sits at
    // one END of the chain (diameter 8 — plain neighbor-min needs 8
    // rounds; pointer jumping must collapse it in ~log rounds well under
    // maxIter); component B: triangle 20-21-22 (cycle); component C:
    // pair 30-31; 40,41 are edge-free singletons
    val chain = (10L until 18L).map(i => (i + 1, i))
    val edges = (chain ++ Seq((20L, 21L), (21L, 22L), (22L, 20L), (31L, 30L)))
      .toDF("id_a", "id_b")
    val verts = ((10L to 18L) ++ Seq(20L, 21L, 22L, 30L, 31L, 40L, 41L)).toDF("id")
    val r = DedupOps.connectedComponents(verts, "id", edges, maxIter = 6)
      .orderBy("id").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val expected = (10L to 18L).map(_ -> 10L).toMap ++
      Map(20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L,
        40L -> 40L, 41L -> 41L)
    assert(r == expected)
    // keep-one: exactly one keeper (the min id) per component
    val keepers = r.filter { case (id, c) => id == c }.keySet
    assert(keepers == Set(10L, 20L, 30L, 40L, 41L))
  }

  test("chunkTokens: window/overlap boundaries, short docs, empty docs") {
    def doc(id: Long, n: Int) = (id, (1 to n).map(i => s"t$i").mkString(" "))
    val rows = Seq(doc(1L, 10),   // n=10 = maxTokens → exactly 1 chunk
      doc(2L, 11),                // one past → 2 chunks, 2nd has ov+1 tokens
      doc(3L, 3),                 // n <= overlap → still 1 chunk
      doc(4L, 25),                // 3 full-ish chunks (stride 8: starts 0,8,16)
      (5L, "   ")                 // zero tokens → no rows
    ).toDF("doc_id", "text")
    val r = TextOps.chunkTokens(rows, "doc_id", "text", maxTokens = 10, overlap = 2)
      .orderBy("id", "chunk_no").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    val byId = r.groupBy(_._1)
    assert(byId(1L).length == 1 && byId(1L).head._3 == 10L)
    assert(byId(2L).length == 2)
    assert(byId(2L)(1)._4 == "t9 t10 t11")        // starts at stride=8 → tokens 9..11
    assert(byId(2L)(1)._3 == 3L)
    assert(byId(3L) === Array((3L, 0L, 3L, "t1 t2 t3")))
    assert(byId(4L).length == 3 && byId(4L)(2)._4.startsWith("t17 "))
    assert(!byId.contains(5L))
    // overlap invariant: consecutive chunks share exactly `overlap` tokens
    val c2 = byId(2L).map(_._4.split(" ").toVector)
    assert(c2(0).takeRight(2) == c2(1).take(2))
  }

  test("repeatedSpanStats: cross-doc shared window, within-doc repeat, short docs") {
    val rows = Seq(
      (1L, "a b c d e"),     // "a b c" shared with doc 2
      (2L, "x y a b c"),
      (3L, "p q"),           // shorter than the window → 0 windows
      (4L, "m m m m")        // "m m m" twice WITHIN one doc → both dup
    ).toDF("doc_id", "text")
    val r = DedupOps.repeatedSpanStats(rows, "doc_id", "text", window = 3)
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 3L, 1L), (2L, 3L, 1L), (3L, 0L, 0L), (4L, 2L, 2L)))
  }

  test("stripRepeatedSpans: covered tokens cut, overlap union, clean docs untouched, empty docs safe") {
    val rows = Seq(
      (1L, "a b c d e f"),    // windows "a b c".."d e f"; "a b c" dup with doc 2
      (2L, "z z a b c"),      // "z z a","z a b","a b c": only "a b c" dup
      (3L, "p q r s"),        // all windows unique → untouched
      (4L, "")                // empty → 0/0/""
    ).toDF("doc_id", "text")
    val r = DedupOps.stripRepeatedSpans(rows, "doc_id", "text", window = 3)
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    // doc 1: dup window at pos 0 covers tokens 0..2 → "d e f" survives
    assert(r(0) == ((1L, 3L, 3L, "d e f")))
    // doc 2: dup window at pos 2 covers tokens 2..4 → "z z" survives
    assert(r(1) == ((2L, 2L, 3L, "z z")))
    assert(r(2) == ((3L, 4L, 0L, "p q r s")))
    assert(r(3) == ((4L, 0L, 0L, "")))
  }

  test("mixtureResample: exact target composition, binding stratum fully consumed, untargeted strata dropped") {
    // a: 6 rows, b: 3 rows, c untargeted; targets 50/50
    val rows = ((0L to 5L).map(i => (i, "a")) ++ (10L to 12L).map(i => (i, "b")) ++
      Seq((20L, "c"))).toDF("doc_id", "lang")
    val r = TextOps.mixtureResample(rows, "doc_id", "lang",
      Seq("a" -> 500000L, "b" -> 500000L)).collect()
    val byLang = r.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // caps: a = 6e6/5e5 = 12, b = 3e6/5e5 = 6 -> T = 6 -> quotas a=3, b=3
    assert(byLang == Map("a" -> 3, "b" -> 3))
    // binding stratum b is fully consumed
    assert(r.filter(_.getString(1) == "b").map(_.getLong(0)).sorted.toSeq == Seq(10L, 11L, 12L))
    // deterministic: same call, same rows
    val r2 = TextOps.mixtureResample(rows, "doc_id", "lang",
      Seq("a" -> 500000L, "b" -> 500000L)).collect()
    assert(r.map(x => (x.getLong(0), x.getString(1))).sorted.toSeq ==
      r2.map(x => (x.getLong(0), x.getString(1))).sorted.toSeq)
    // 70/30: caps a = 6e6/7e5 = 8, b = 3e6/3e5 = 10 -> T = 8 -> a=5, b=2
    val r3 = TextOps.mixtureResample(rows, "doc_id", "lang",
      Seq("a" -> 700000L, "b" -> 300000L)).collect()
    val byLang3 = r3.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byLang3 == Map("a" -> 5, "b" -> 2))
  }

  test("capPerStratum: hot stratum capped exactly, small strata intact, permutation order, deterministic") {
    val rows = ((0L to 19L).map(i => (i, "hot")) ++ (100L to 104L).map(i => (i, "cold")))
      .toDF("doc_id", "host")
    val r = TextOps.capPerStratum(rows, "doc_id", "host", cap = 8L)
      .as[(Long, String)].collect().toSeq
    val byHost = r.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byHost == Map("hot" -> 8, "cold" -> 5))
    // selection equals the naive per-stratum (ord, id) sort-and-take
    def ord(id: Long): Long = ((id % 1000003L) * 2654435761L) % 1000003L
    val naive = Seq("hot" -> (0L to 19L), "cold" -> (100L to 104L)).flatMap {
      case (h, ids) => ids.sortBy(i => (ord(i), i)).take(8).map(i => (i, h))
    }.sorted
    assert(r.sorted == naive)
    // the permutation must not degenerate to first-k-by-id
    assert(r.filter(_._2 == "hot").map(_._1).toSet != (0L to 7L).toSet,
      "cap selection degenerated to first-k-by-id")
    // deterministic across evaluations
    val again = TextOps.capPerStratum(rows, "doc_id", "host", cap = 8L)
      .as[(Long, String)].collect().toSeq
    assert(again.sorted == r.sorted)
  }

  test("capPerStratum/topKPerStratum: randomized equivalence with naive per-stratum sort-and-take") {
    val rng = new java.util.Random(7)
    val data = (0 until 600).map { i =>
      (i.toLong, s"h${rng.nextInt(7)}", rng.nextInt(20).toLong)
    }
    val df = data.toDF("doc_id", "host", "score")
    def ord(id: Long): Long = ((id % 1000003L) * 2654435761L) % 1000003L
    val capped = TextOps.capPerStratum(df, "doc_id", "host", cap = 25L)
      .select("doc_id", "host").as[(Long, String)].collect().toSet
    val naiveCap = data.groupBy(_._2).flatMap { case (h, rows) =>
      rows.map(_._1).sortBy(i => (ord(i), i)).take(25).map(i => (i, h))
    }.toSet
    assert(capped == naiveCap)
    val topk = TextOps.topKPerStratum(df, "doc_id", "host", col("score"), k = 9L)
      .select("doc_id", "host").as[(Long, String)].collect().toSet
    val naiveTop = data.groupBy(_._2).flatMap { case (h, rows) =>
      rows.sortBy(r => (-r._3, r._1)).take(9).map(r => (r._1, h))
    }.toSet
    assert(topk == naiveTop)
  }

  test("topKPerStratum: score-descending selection, cutoff ties rank by id, small strata intact") {
    // hot: scores 10,20,20,20,5 — k=3 keeps one 20-tie pair + the cutoff
    // tie resolved by smallest id
    val rows = Seq((1L, "hot", 10L), (2L, "hot", 20L), (3L, "hot", 20L),
      (4L, "hot", 20L), (5L, "hot", 5L), (10L, "cold", 1L))
      .toDF("doc_id", "host", "score")
    val r = TextOps.topKPerStratum(rows, "doc_id", "host", col("score"), k = 3L)
      .as[(Long, String, Long)].collect().toSeq.sorted
    // hot top-3 by (-score, id): ids 2, 3, 4 (all score 20); cold intact
    assert(r == Seq((2L, "hot", 20L), (3L, "hot", 20L), (4L, "hot", 20L),
      (10L, "cold", 1L)).sorted)
    // non-tied cutoff: k=4 adds the score-10 row, not the score-5 row
    val r4 = TextOps.topKPerStratum(rows, "doc_id", "host", col("score"), k = 4L)
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(r4.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 10L))
  }

  test("topKPerStratum: Long.MinValue score does not overflow the negated ord axis (ANSI)") {
    // -Long.MinValue overflows a long under ANSI; the ord axis is
    // decimal(20,0) so the extreme score just ranks last
    val rows = Seq((1L, "h", Long.MinValue), (2L, "h", 5L), (3L, "h", Long.MaxValue))
      .toDF("doc_id", "host", "score")
    val r = TextOps.topKPerStratum(rows, "doc_id", "host", col("score"), k = 2L)
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(r.map(_._1) == Seq(2L, 3L), s"top-2 must be the two largest scores, got $r")
  }

  test("c4LineFilter: terminal punct + min words + javascript rules; page flags") {
    val rows = Seq(
      (1L, "This line has enough words here.\nshort one.\nno terminal punct here at all\n" +
        "Please enable JavaScript to continue browsing.\nAnother good long line survives here!"),
      (2L, "Lorem Ipsum dolor sit amet consectetur.\nGood long line number one stays.\n" +
        "Good long line number two stays.\nGood long line number three stays."),
      (3L, "function f() { return 1; }\nA perfectly fine sentence with words.\nB fine sentence with more words.\nC fine sentence with more words."),
      (4L, "")
    ).toDF("doc_id", "text")
    val r = TextOps.c4LineFilter(rows, "doc_id", "text").orderBy("id").collect()
    // doc 1: 5 lines; kept = line1 + line5 (short -> <5 words; no punct; javascript)
    assert(r(0).getLong(1) == 5 && r(0).getLong(2) == 2 &&
      r(0).getString(5) == "This line has enough words here.\nAnother good long line survives here!")
    // doc 1: 2 sentences in cleaned text -> page_keep false
    assert(r(0).getLong(3) == 2 && !r(0).getBoolean(4))
    // doc 2: all 4 lines pass the line rules, but 'lorem ipsum' kills the page
    assert(r(1).getLong(2) == 4 && !r(1).getBoolean(4))
    // doc 3: curly brace kills the page; 3 kept lines
    assert(r(2).getLong(2) == 3 && r(2).getLong(3) == 3 && !r(2).getBoolean(4))
    // doc 4: empty text -> 1 empty line, 0 kept, page dropped
    assert(r(3).getLong(1) == 1 && r(3).getLong(2) == 0 && !r(3).getBoolean(4) &&
      r(3).getString(5) == "")
    // a page that passes everything
    val ok = TextOps.c4LineFilter(Seq((9L,
      "One good long sentence right here.\nTwo good long sentences right here!\nThree good long sentences right here?"))
      .toDF("doc_id", "text"), "doc_id", "text").collect()(0)
    assert(ok.getBoolean(4) && ok.getLong(2) == 3)
  }

  test("dedupLinesWithinDoc: first occurrence wins, order preserved (array_distinct pin)") {
    val rows = Seq(
      (1L, "alpha\nbeta\nalpha\ngamma\nbeta\nalpha"),
      (2L, "only"),
      (3L, "")
    ).toDF("doc_id", "text")
    val r = TextOps.dedupLinesWithinDoc(rows, "doc_id", "text").orderBy("id").collect()
    assert(r(0).getLong(1) == 6 && r(0).getLong(2) == 3 &&
      r(0).getString(3) == "alpha\nbeta\ngamma")
    assert(r(1).getLong(1) == 1 && r(1).getString(3) == "only")
    assert(r(2).getLong(1) == 1 && r(2).getLong(2) == 1 && r(2).getString(3) == "")
  }

  test("dedupLinesAcrossCorpus: global first occurrence wins by (id, idx); fully-deduped docs survive empty") {
    val rows = Seq(
      (1L, "home\nalpha\nfooter"),
      (2L, "home\nbeta\nfooter"),     // home+footer first seen in doc 1
      (3L, "home\nfooter"),            // fully boilerplate → empty rewrite
      (4L, "")                          // first "" line globally → kept
    ).toDF("doc_id", "text")
    val r = TextOps.dedupLinesAcrossCorpus(rows, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 3 && r(0).getLong(2) == 3 &&
      r(0).getString(3) == "home\nalpha\nfooter")
    assert(r(1).getLong(1) == 3 && r(1).getLong(2) == 1 &&
      r(1).getString(3) == "beta")
    assert(r(2).getLong(1) == 2 && r(2).getLong(2) == 0 &&
      r(2).getString(3) == "")
    assert(r(3).getLong(1) == 1 && r(3).getLong(2) == 1 &&
      r(3).getString(3) == "")
    // within-doc duplicates also collapse to the single first instance
    val rep = Seq((1L, "x\nx\nx"), (2L, "x")).toDF("doc_id", "text")
    val rr = TextOps.dedupLinesAcrossCorpus(rep, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rr(0).getLong(2) == 1 && rr(0).getString(3) == "x")
    assert(rr(1).getLong(2) == 0 && rr(1).getString(3) == "")
  }

  test("kmeansLloyd: separated blobs cluster correctly; ties to smaller cid; deterministic") {
    // two well-separated 2-D blobs (with negative coordinates — DIV/`//`
    // truncation parity matters there)
    val rows = Seq(
      (1L, Array(-0.30f, -0.20f)), (2L, Array(-0.20f, -0.30f)), (3L, Array(-0.25f, -0.25f)),
      (4L, Array(10.0f, 10.1f)), (5L, Array(10.2f, 9.9f)), (6L, Array(10.1f, 10.0f))
    ).toDF("vec_id", "embedding")
    val r = SimilarityOps.kmeansLloyd(rows, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size == 6)
    assert(Set(r(1L), r(2L), r(3L)).size == 1, "left blob together")
    assert(Set(r(4L), r(5L), r(6L)).size == 1, "right blob together")
    assert(r(1L) != r(4L), "blobs separated")
    // deterministic across invocations
    val r2 = SimilarityOps.kmeansLloyd(rows, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == r2)
    // exact tie: equidistant point goes to the SMALLER cid (init centroids
    // are ids 1 (0.0) and 2 (1.0); 0.5 ties -> cid 0), one assignment pass
    val tie = Seq((1L, Array(0.0f)), (2L, Array(1.0f)), (3L, Array(0.5f)))
      .toDF("vec_id", "embedding")
    // iters=1: a1 decides from c0 = the raw init vectors; then c1 moves
    // them — assert on the FIRST assignment by reading cluster sizes after
    // one round: ids 1,3 -> cid0 mean 0.25; id 2 -> cid1; final assign:
    // 0.0->0 (d 0.25 vs 1), 0.5->0 (0.25 vs 0.5), 1.0->1 (0.75 vs 0)
    val t = SimilarityOps.kmeansLloyd(tie, "vec_id", "embedding", k = 2, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(t == Map(1L -> 0L, 3L -> 0L, 2L -> 1L), t.toString)
  }

  test("kmeansLloyd withDistance: assigned-centroid quantized d2, zero at the centroid") {
    // 1-D, k=2, iters=1: c0 = raw inits {0.0 -> cid0, 1.0 -> cid1};
    // a1: 0.0,0.4 -> cid0; 1.0 -> cid1; c1 means: cid0 = (0+400000) DIV 2
    // = 200000, cid1 = 1000000. Final assign+d2 vs c1 (scale 1e6):
    // id1 (0): d2 = 200000^2 = 4e10; id2 (1.0): 0; id3 (0.4): 200000^2
    val rows = Seq((1L, Array(0.0f)), (2L, Array(1.0f)), (3L, Array(0.4f)))
      .toDF("vec_id", "embedding")
    val r = SimilarityOps.kmeansLloyd(rows, "vec_id", "embedding", k = 2,
      iters = 1, withDistance = true)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == (0L, 40000000000L))
    assert(r(2L) == (1L, 0L))
    assert(r(3L) == (0L, 40000000000L))
    // default path keeps the 2-column schema (q_kmeans oracle contract)
    assert(SimilarityOps.kmeansLloyd(rows, "vec_id", "embedding", k = 2,
      iters = 1).columns.toSeq == Seq("id", "cluster"))
  }

  test("balancedShards: near-equal token mass, exact definitional cumsum, m=1") {
    val r = TextOps.balancedShards(docs, "doc_id", "text", m = 4)
      .collect()
    assert(r.length == docs.count())
    val total = r.map(_.getAs[Long]("n_tokens")).sum
    val maxDoc = r.map(_.getAs[Long]("n_tokens")).max
    val byShard = r.groupBy(_.getAs[Long]("shard"))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    assert(byShard.keySet == Set(0L, 1L, 2L, 3L), byShard.toString)
    // every shard within one document of the ideal total/4 mass
    byShard.values.foreach(s_ =>
      assert(math.abs(s_ - total / 4) <= maxDoc, s"$byShard vs ideal ${total / 4}"))
    // the two-phase prefix sum equals the definitional driver-side cumsum
    def ordOf(id: Long): Long = ((id % 1000003L) * 2654435761L) % 1000003L
    val sorted = r.sortBy(x => (ordOf(x.getAs[Long]("id")), x.getAs[Long]("id")))
    var run = 0L
    sorted.foreach { x =>
      assert(x.getAs[Long]("cum_before") == run,
        s"id ${x.getAs[Long]("id")}: ${x.getAs[Long]("cum_before")} != $run")
      run += x.getAs[Long]("n_tokens")
    }
    // m=1: everything in shard 0
    val one = TextOps.balancedShards(docs.limit(20), "doc_id", "text", m = 1)
      .select("shard").distinct().collect()
    assert(one.map(_.getLong(0)).toSet == Set(0L))
  }

  test("contaminationScore: graded ppm overlap, short-doc shingle floor, gate binds") {
    val bench = Seq((100L, "the quick brown fox jumps over lazy dogs")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over lazy dogs extra"), // near-full overlap
      (2L, "the quick brown cat sat still"),                  // partial: 1 of 4 shingles
      (3L, "completely different content with no shared phrases at all"),
      (4L, "tiny doc")                                        // < n tokens: one joined shingle
    ).toDF("doc_id", "text")
    val r = TextOps.contaminationScore(corpus, "doc_id", "text", bench, "text",
        n = 3, maxPpm = 100000L)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4)))).toMap
    // doc 1: 7 shingles, 6 hit (the 6 bench trigrams it contains)
    assert(r(1L) == ((7L, 6L, 857142L, true)), r(1L).toString)
    // doc 2: 4 shingles, exactly "the quick brown" hits -> 250000 ppm
    assert(r(2L) == ((4L, 1L, 250000L, true)))
    assert(r(3L) == ((7L, 0L, 0L, false)))
    assert(r(4L) == ((1L, 0L, 0L, false)))
  }

  test("langConsistency: paragraph langs, majority share, tie order, single-para docs") {
    val d = Seq(
      (1L, "plain english words here"),                        // 1 para en
      (2L, "plain english text\n\nman sagt und nicht mit der"), // en + de -> mixed
      (3L, "good text one\n\ngood text two\n\nwas ist und nicht mit der"), // 2 en 1 de
      (4L, "erste war und nicht mit der\n\nplain english here") // de + en: tie -> larger code
    ).toDF("doc_id", "text")
    val r = TextOps.langConsistency(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3), x.getLong(4), x.getBoolean(5)))).toMap
    assert(r(1L) == ((1L, 1L, "en", 1000000L, false)))
    assert(r(2L) == ((2L, 2L, "en", 500000L, true)) ||
      r(2L) == ((2L, 2L, "de", 500000L, true))) // 1-1 tie -> larger code wins
    assert(r(2L)._3 == "en", "tie breaks to the lexicographically larger lang code")
    assert(r(3L) == ((3L, 2L, "en", 666666L, true)))
    assert(r(4L)._1 == 2L && r(4L)._3 == "en" && r(4L)._5)
  }

  test("bpePairStats: tf-weighted pair counts over distinct vocab; k cut; single-char tokens") {
    // "ab ab abc x": vocab ab(tf2) abc(1) x(1); pairs: ab -> ab:2;
    // abc -> ab:1, bc:1; x -> none. Totals: ab=3, bc=1.
    val d = Seq((1L, "ab ab abc"), (2L, "x")).toDF("doc_id", "text")
    val all = TextOps.bpePairStats(d, "doc_id", "text", k = 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(all == Map("ab" -> (("a", "b", 3L)), "bc" -> (("b", "c", 1L))))
    // k=1 keeps only the top pair
    val top1 = TextOps.bpePairStats(d, "doc_id", "text", k = 1L).collect()
    assert(top1.length == 1 && top1(0).getString(0) == "ab")
    // tie at the cut: equal counts break by pair ascending
    val tie = Seq((1L, "xy zw")).toDF("doc_id", "text")
    val t1 = TextOps.bpePairStats(tie, "doc_id", "text", k = 1L).collect()
    assert(t1.length == 1 && t1(0).getString(0) == "xy")
  }

  test("bpeTrain: greedy non-overlapping apply, tie order, early stop, sep-token drop") {
    // vocab: "aaa" tf2, "bc" tf2 (plus a U+001F-carrying token that must
    // be DROPPED at vocab build). Hand-derived ladder:
    //   r1: (a,a) cnt 4 (2 per "aaa" x tf2) beats (b,c) 2; GREEDY apply
    //       merges "aaa" ONCE -> (aa)(a): symbols 2*2 + 2*2 = 8 (naive
    //       count-subtraction would claim 10-4 = 6)
    //   r2: (aa,a) 2 ties (b,c) 2 -> lhs "aa" < "b" wins; symbols 6
    //   r3: (b,c) 2; symbols 4
    //   r4: no pair left -> EARLY STOP (3 rows despite rounds=4)
    val d = Seq((1L, "aaa bc bc"), (2L, "aaa"), (3L, "x\u001Fy x\u001Fy"))
      .toDF("doc_id", "text")
    val m = TextOps.bpeTrain(d, "doc_id", "text", rounds = 4).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(m.size == 3, s"early stop expected 3 merges, got ${m.size}")
    assert(m(1L) == (("a", "a", 4L, 8L)))
    assert(m(2L) == (("aa", "a", 2L, 6L)))
    assert(m(3L) == (("b", "c", 2L, 4L)))
    // back-to-back merge sites both fire in ONE pass: "aaaa" tf1 under
    // (a,a) -> (aa)(aa), so round 2's top pair is (aa,aa)
    val d2 = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val m2 = TextOps.bpeTrain(d2, "doc_id", "text", rounds = 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(m2(1L) == (("a", "a", 9L, 6L)), s"got ${m2.get(1L)}")
    assert(m2(2L) == (("aa", "aa", 3L, 3L)), s"got ${m2.get(2L)}")
  }

  test("bpeEncode: merges apply in priority order; unseen tokens segment; no merges = chars") {
    // merges trained on the bpeTrain corpus: (a,a), (aa,a), (b,c)
    val merges = Seq(("a", "a"), ("aa", "a"), ("b", "c"))
    // encode a DIFFERENT corpus (train/apply split): "aab" was never a
    // training token — (a)(a)(b) -> (aa)(b) under merge 1, merges 2-3
    // don't fire -> "aa b"
    val d = Seq((1L, "aaa bc aab aab"), (2L, "z")).toDF("doc_id", "text")
    val e = TextOps.bpeEncode(d, "doc_id", "text", merges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(e("aaa") == ((1L, 1L, "aaa")), s"got ${e.get("aaa")}")
    assert(e("bc") == ((1L, 1L, "bc")))
    assert(e("aab") == ((2L, 2L, "aa b")))
    assert(e("z") == ((1L, 1L, "z")))
    // empty merge list degenerates to the character split
    val raw = TextOps.bpeEncode(d, "doc_id", "text", Seq.empty).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(raw("aab") == "a a b")
  }

  test("encodingDamage: each damage class counted separately; clean text passes") {
    val d = Seq(
      (1L, "perfectly clean ascii text"),
      (2L, "two bad� marks� here"),
      (3L, "nel\u0085break and del-range\u009F"),
      (4L, "caf\u00C3\u00A9 digraph"),     // the U+00C3 U+00A9 digraph - UTF-8 e-acute read as Latin-1
      (5L, "it\u00E2\u20AC\u2122s quoted"), // the U+00E2 U+20AC U+2122 triple - Win-1252 misdecode
      (6L, "real caf\u00E9 is fine")        // genuine é — NOT damage
    ).toDF("doc_id", "text")
    val r = TextOps.encodingDamage(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4)))).toMap
    assert(r(1L) == ((0L, 0L, 0L, true)))
    assert(r(2L) == ((2L, 0L, 0L, false)))
    assert(r(3L) == ((0L, 2L, 0L, false)))
    assert(r(4L) == ((0L, 0L, 1L, false)))
    assert(r(5L) == ((0L, 0L, 1L, false)))
    assert(r(6L) == ((0L, 0L, 0L, true)), "genuine accented text is not damage")
  }

  test("gopherRules: each rule binds on a targeted violation; clean doc passes all") {
    val clean = ("the quick brown fox jumps over the lazy dog and then " +
      "rests with a calm mind beside the old river bank watching boats " +
      "drift past while children play games that have simple rules and " +
      "everyone laughs at the warm sunny afternoon full of joy today now " +
      "because good weather makes every single moment feel light and easy")
    val cases = Seq(
      (1L, clean),                                             // passes all
      (2L, "too short to be kept with these few words"),       // word count
      (3L, ("a " * 60).trim),                                  // mean word len < 3
      (4L, Array.fill(60)("#tag").mkString(" ")),              // symbol ratio (+alpha ok)
      (5L, Array.fill(20)("- item with the best offers of all time").mkString("\n")), // bullets+dups
      (6L, Array.fill(20)("the story continues to be told with more...").mkString("\n")), // ellipsis lines
      (7L, Array.fill(60)("12345").mkString(" ")),             // alpha words
      (8L, Array.fill(60)("zebra").mkString(" ")),             // stopwords < 2
      (9L, "")                                                 // empty
    ).toDF("doc_id", "text")
    val r = TextOps.gopherRules(cases, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    def ok(id: Long, colName: String) =
      r(id).getAs[Boolean](colName)
    assert(r(1L).getAs[Boolean]("keep"), r(1L).toString)
    assert(!ok(2L, "ok_word_count") && !r(2L).getAs[Boolean]("keep"))
    assert(!ok(3L, "ok_mean_word_len") && ok(3L, "ok_word_count"))
    assert(!ok(4L, "ok_symbol_ratio") && ok(4L, "ok_alpha_words"))
    assert(!ok(5L, "ok_bullet_lines") && !ok(5L, "ok_dup_lines") &&
      !ok(5L, "ok_dup_line_chars"))
    assert(!ok(6L, "ok_ellipsis_lines"))
    assert(!ok(7L, "ok_alpha_words") && !ok(7L, "ok_stopwords"))
    assert(!ok(8L, "ok_stopwords") && ok(8L, "ok_alpha_words"))
    // empty doc: zero-line rules vacuously pass, word count fails, never kept
    assert(!ok(9L, "ok_word_count") && ok(9L, "ok_bullet_lines") &&
      !r(9L).getAs[Boolean]("keep"))
  }

  test("dsirWeights: target features score high, bigram order matters, empty doc, feature count") {
    val corpus = Seq(
      (1L, "alpha beta gamma", true), (2L, "alpha beta delta", true),
      (3L, "omega psi chi", false), (4L, "omega psi phi", false),
      (5L, "beta alpha gamma", false), // same unigrams as 1, reversed bigrams
      (6L, "", false)
    ).toDF("doc_id", "text", "is_tgt")
    val r = TextOps.dsirWeights(corpus, "doc_id", "text", col("is_tgt"),
        minAvgW = 500000L)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(r.size == 6)
    // n_feats = tokens + bigrams = 2*len - 1
    assert(r(1L)._1 == 5 && r(3L)._1 == 5)
    // empty doc: no features, never kept
    assert(r(6L) == ((0L, 0L, false)))
    // target-vocab docs outscore non-target-vocab docs per feature
    def avg(id: Long) = r(id)._2.toDouble / r(id)._1
    assert(avg(1L) > avg(3L) && avg(2L) > avg(4L))
    // doc 5 shares doc 1's unigrams but reversed bigrams — the bigram
    // buckets differ, so the scores differ (bigrams genuinely contribute)
    assert(r(5L)._2 != r(1L)._2)
    // the gate binds both ways at 500000 on this corpus
    assert(r(1L)._3 && r(2L)._3 && !r(3L)._3 && !r(4L)._3)
    // weight bound: target ⊆ raw ⟹ every per-bucket weight ≤ scale,
    // so score ≤ n_feats · scale
    r.values.foreach { case (nf, sc, _) => assert(sc <= nf * 1000000L) }
  }

  test("semDedup: within-cluster pairing, transitive groups, keep-min-id, cluster-size guard") {
    // two well-separated direction blobs (ids interleaved so kmeans init
    // — the two smallest ids — seeds one centroid per blob), plus planted
    // duplicates inside blob A: 10,11 = exact copies of 1 (triangle),
    // 12 = near copy of 3 (cos ~0.994); no cross-blob cosine reaches 0.95
    val rows = Seq(
      (1L, Array(1.0f, 0.0f)), (3L, Array(0.6f, 0.8f)), (5L, Array(0.0f, 1.0f)),
      (2L, Array(-1.0f, 0.0f)), (4L, Array(-0.6f, -0.8f)), (6L, Array(0.0f, -1.0f)),
      (10L, Array(1.0f, 0.0f)), (11L, Array(1.0f, 0.0f)), (12L, Array(0.7f, 0.75f))
    ).toDF("vec_id", "embedding")
    val r = SimilarityOps.semDedup(rows, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(r.size == 9, "every input row emitted")
    // clusters: blobs stay together, copies land with their originals
    val clA = Set(1L, 3L, 5L, 10L, 11L, 12L).map(r(_)._1)
    val clB = Set(2L, 4L, 6L).map(r(_)._1)
    assert(clA.size == 1 && clB.size == 1 && clA != clB)
    // groups: {1,10,11} merge transitively to min id 1; {3,12} to 3
    assert(Seq(1L, 10L, 11L).map(r(_)._2).forall(_ == 1L))
    assert(Seq(3L, 12L).map(r(_)._2).forall(_ == 3L))
    assert(r(1L)._3 && !r(10L)._3 && !r(11L)._3)
    assert(r(3L)._3 && !r(12L)._3)
    // non-dups are their own kept singletons
    Seq(2L, 4L, 5L, 6L).foreach(i => assert(r(i)._2 == i && r(i)._3))
    // guard: blob A has 6 members > maxClusterSize=5 — it is dropped from
    // PAIRING (rows still emitted, all singleton-kept); blob B unaffected
    val g = SimilarityOps.semDedup(rows, "vec_id", "embedding", k = 2,
        iters = 2, maxClusterSize = 5)
      .collect().map(x => x.getLong(0) -> x.getBoolean(3)).toMap
    assert(g.size == 9 && g.values.forall(identity))
  }

  test("exactQuantiles: matches brute-force percentile_disc on sorted values; duplicates and skew") {
    // skewed multiset with heavy duplication — the histogram path must
    // agree with the definitional sorted-order computation
    val vals = Seq.fill(50)(3L) ++ Seq.fill(30)(7L) ++ (1L to 20L) ++ Seq(1000L)
    val pcts = Seq(1, 5, 25, 50, 75, 95, 99, 100)
    def bruteDisc(p: Int): Long = {
      val s = vals.sorted
      // smallest value whose cumulative count reaches ceil(p*n/100)
      val target = (p.toLong * s.length + 99) / 100
      s((target - 1).toInt)
    }
    val got = TextOps.exactQuantiles(vals.toDF("x"), col("x"), pcts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pcts.foreach(p => assert(got(p.toLong) == bruteDisc(p), s"pct $p"))
    intercept[IllegalArgumentException] {
      TextOps.exactQuantiles(vals.toDF("x"), col("x"), Seq(0))
    }
  }

  test("assignSplit: labels match an independent reimplementation; stable under corpus growth") {
    val p = 1000003L
    def expected(id: Long): String = {
      val ord = ((id % p) * 2654435761L) % p
      val bucket = (ord * 1000000L) / p
      if (bucket < 980000L) "train" else if (bucket < 990000L) "val" else "test"
    }
    val splits = Seq("train" -> 980000L, "val" -> 10000L, "test" -> 10000L)
    val ids = (0L until 5000L).toDF("doc_id")
    val got = TextOps.assignSplit(ids, "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 5000)
    got.foreach { case (id, s) => assert(s == expected(id), s"id $id") }
    // all three splits are populated at this size and roughly proportional
    val n = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("train") > 4800 && n("val") > 10 && n("test") > 10)
    // growth stability: a grown corpus never relabels an old document
    val grown = TextOps.assignSplit((0L until 9000L).toDF("doc_id"), "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, s) => assert(grown(id) == s) }
    // weights must be positive and sum to 1e6
    intercept[IllegalArgumentException] {
      TextOps.assignSplit(ids, "doc_id", Seq("a" -> 1L, "b" -> 2L))
    }
  }

  test("ngramSurprise: hand-computed corpus bigram statistics, integer means, short docs zero") {
    val rows = Seq(
      (1L, "a b a b"), // bigrams (a,b)(b,a)(a,b)
      (2L, "a b c"),   // bigrams (a,b)(b,c)
      (3L, "x")        // no bigrams
    ).toDF("doc_id", "text")
    val r = TextOps.ngramSurprise(rows, "doc_id", "text").orderBy("id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // c(a·)=3 c(b·)=2; c(a b)=3 c(b a)=1 c(b c)=1
    // doc1: (1e6*3/3 + 1e6*2/1 + 1e6*3/3)=4e6 DIV 3 = 1333333
    // doc2: (1e6 + 2e6) DIV 2 = 1500000
    assert(r.toSeq == Seq((1L, 3L, 1333333L), (2L, 2L, 1500000L), (3L, 0L, 0L)))
  }

  test("ngramSurprise: no shuffle carries text or the token array (payload-free discipline)") {
    val q = TextOps.ngramSurprise(docs.select("doc_id", "text"), "doc_id", "text")
    q.collect() // finalize the adaptive plan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec        => nodes(s.plan)
      case _                        => p +: p.children.flatMap(nodes)
    }
    val shuffles = nodes(q.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.nonEmpty)
    val bad = shuffles.filter(_.child.output.exists(a =>
      a.name == "text" || a.name == "__ts"))
    assert(bad.isEmpty,
      s"text-bearing shuffle: ${bad.map(_.child.output.map(_.name).mkString(",")).mkString("; ")}")
  }

  test("dedupLinesAcrossCorpus: no shuffle carries per-line text; doc text crosses at most one exchange") {
    val q = TextOps.dedupLinesAcrossCorpus(docs.select("doc_id", "text"), "doc_id", "text")
    q.collect() // finalize the adaptive plan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec        => nodes(s.plan)
      case _                        => p +: p.children.flatMap(nodes)
    }
    val shuffles = nodes(q.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.nonEmpty)
    // the exploded per-line rows exchange as (id, idx, 8-byte hash) only
    val lineBearing = shuffles.filter(_.child.output.exists(_.name == "line"))
    assert(lineBearing.isEmpty,
      s"per-line text crossed a shuffle: ${lineBearing.map(_.child.output.map(_.name).mkString(",")).mkString("; ")}")
    // whole-doc text may cross at most once (the keep-index join side)
    val docBearing = shuffles.filter(_.child.output.exists(_.name == "text"))
    assert(docBearing.size <= 1,
      s"doc text crossed ${docBearing.size} shuffles")
  }

  test("exactQuantiles: distributed prefix sum is exact when distinct values exceed the slice count") {
    // 5,000 distinct values with varying multiplicities — far more than
    // spark.sql.shuffle.partitions range slices, so correctness requires
    // the cross-slice offsets to line up exactly
    val vals = (0 until 5000).flatMap(i => Seq.fill(1 + (i * 7) % 5)(i.toLong * 3 + 1))
    val pcts = Seq(1, 10, 33, 50, 67, 90, 99)
    val sorted = vals.sorted
    def brute(p: Int): Long = {
      val target = (p.toLong * sorted.length + 99) / 100
      sorted((target - 1).toInt)
    }
    val got = TextOps.exactQuantiles(vals.toDF("x"), col("x"), pcts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pcts.foreach(p => assert(got(p.toLong) == brute(p), s"pct $p"))
  }

  test("exactQuantiles plan: no unpartitioned window over the histogram — only over the slice totals") {
    val q = TextOps.exactQuantiles((1L to 200L).toDF("x"), col("x"), Seq(50))
    q.collect() // finalize the adaptive plan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec        => nodes(s.plan)
      case _                        => p +: p.children.flatMap(nodes)
    }
    val windows = nodes(q.queryExecution.executedPlan).collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    val global = windows.filter(_.partitionSpec.isEmpty)
    assert(global.nonEmpty, "the slice-offset window should exist")
    // every single-partition window must consume the per-slice totals (a
    // bounded table: one row per range slice), never the histogram itself
    global.foreach { w =>
      val feedsFromSliceAgg = nodes(w.child).exists {
        case a: BaseAggregateExec =>
          a.groupingExpressions.exists(_.references.exists(_.name == "__slice"))
        case _ => false
      }
      assert(feedsFromSliceAgg,
        s"unpartitioned window not over slice totals:\n${w.treeString}")
    }
    windows.filterNot(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.partitionSpec.flatMap(_.references.toSeq).exists(_.name == "__slice"), w.toString)
    }
  }

  test("surpriseBuckets: head/middle/tail match the integral 33/67 percentile rule") {
    // spread surprise scores: doc i mixes (31-i) copies of a corpus-common
    // bigram (low surprise) with i one-off salad words (max surprise), so
    // per-doc means increase roughly monotonically in i — ~30 distinct
    // scores, all three terciles populated
    val df = (1L to 30L).map { i =>
      val fluent = Seq.fill(31 - i.toInt)("the cat").mkString(" ")
      val salad = (1 to i.toInt).map(j => s"u${i}w$j").mkString(" ")
      (i, s"$fluent $salad")
    }.toDF("doc_id", "text")
    val scored = TextOps.ngramSurprise(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sorted = scored.values.toSeq.sorted
    def cut(p: Int): Long = {
      val target = (p.toLong * sorted.length + 99) / 100
      sorted((target - 1).toInt)
    }
    val (c33, c67) = (cut(33), cut(67))
    val got = TextOps.surpriseBuckets(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got.keySet == scored.keySet)
    got.foreach { case (id, (s, b)) =>
      assert(s == scored(id), s"doc $id surprise drift")
      val expected = if (s <= c33) "head" else if (s <= c67) "middle" else "tail"
      assert(b == expected, s"doc $id: surprise $s, cuts ($c33, $c67)")
    }
    // the corpus genuinely splits: every bucket non-empty
    assert(got.values.map(_._2).toSet == Set("head", "middle", "tail"))
  }

  test("scoreLinearBow: integral logit matches hand dot product; keep is the logit sign") {
    val w = TextOps.BowClassifier.Weights
    assert(w.length == 64 && w.forall(x => x >= -8 && x <= 8))
    val vec = Array.fill(64)(0.0); vec(0) = 2.0; vec(5) = 1.0; vec(63) = 3.0
    val zero = Array.fill(64)(0.0)
    val df = Seq((7L, vec.toSeq), (8L, zero.toSeq)).toDF("id", "vec")
    val r = TextOps.scoreLinearBow(df, "id", "vec").orderBy("id").collect()
    val expected = 2 * w(0) + w(5) + 3 * w(63) + TextOps.BowClassifier.Bias
    assert(r(0).getLong(1) == expected)
    assert(r(0).getBoolean(2) == (expected > 0))
    // empty doc scores exactly the bias
    assert(r(1).getLong(1) == TextOps.BowClassifier.Bias && r(1).getBoolean(2))
  }

  test("distinctiveTerms: integral tf*1e6 DIV df scoring, term-asc tie-break, k truncation") {
    val rows = Seq(
      (1L, "apple apple banana zeta"),
      (2L, "banana banana banana date"),
      (3L, "apple date date")
    ).toDF("doc_id", "text")
    val r = TextOps.distinctiveTerms(rows, "doc_id", "text", k = 3)
      .orderBy("id", "rank").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))
    // doc 1: apple (tf2/df2=1e6) ties zeta (tf1/df1=1e6) → term asc
    assert(r.filter(_._1 == 1L).toSeq == Seq(
      (1L, 1L, "apple", 2L, 2L, 1000000L),
      (1L, 2L, "zeta", 1L, 1L, 1000000L),
      (1L, 3L, "banana", 1L, 2L, 500000L)))
    // docs with < k distinct terms emit only what exists
    assert(r.filter(_._1 == 2L).toSeq == Seq(
      (2L, 1L, "banana", 3L, 2L, 1500000L),
      (2L, 2L, "date", 1L, 2L, 500000L)))
    assert(r.filter(_._1 == 3L).map(t => (t._2, t._3)).toSeq ==
      Seq((1L, "date"), (2L, "apple")))
  }

  test("stripBoilerplateLines: frequency threshold, key normalization, blanks, all-removed docs, order") {
    val rows = Seq(
      (1L, "alpha one\ncookie banner\n\nomega one"),
      (2L, "  COOKIE BANNER \nbeta two\n\nshared pair"),
      (3L, "cookie banner\n"),                  // banner + blank → all removed
      (4L, "shared pair\ngamma four")           // "shared pair" in only 2 docs < minDocs
    ).toDF("doc_id", "text")
    val r = TextOps.stripBoilerplateLines(rows, "doc_id", "text", minDocs = 3)
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    // "cookie banner" (normalized) in docs 1,2,3 → removed; blank line in
    // docs 1,2,3 → removed under the uniform rule; "shared pair" in 2 docs → kept
    assert(r(0) == ((1L, 2L, 2L, "alpha one\nomega one")))
    assert(r(1) == ((2L, 2L, 2L, "beta two\nshared pair")))
    assert(r(2) == ((3L, 0L, 2L, "")))          // every line boilerplate → "" not a dropped row
    assert(r(3) == ((4L, 2L, 0L, "shared pair\ngamma four")))
  }

  test("PII redaction: emails, IPv4, phones; counts match placements; clean text untouched") {
    val rows = Seq(
      (1L, "mail me at jane.doe+spam@sub.example.org thanks"),
      (2L, "server at 192.168.001.255 and 10.0.0.1 responded"),
      (3L, "call +44 20 7946 0958 or 0015551234567 now"),
      (4L, "no pii here, just words and 1234 plain numbers"),
      (5L, "version 1.2.3 is not an ip; neither is 1.2.3.4.5 fully"),
      (6L, "00123456789012@example.com is an email, not a phone")
    ).toDF("doc_id", "text")
    val r = TextOps.redactPii(rows, "text").orderBy("doc_id").collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("n_emails"),
        x.getAs[Long]("n_ips"), x.getAs[Long]("n_phones"),
        x.getAs[String]("text_redacted"))).toList
    assert(r(0) == ((1L, 1L, 0L, 0L, "mail me at <EMAIL> thanks")))
    assert(r(1) == ((2L, 0L, 2L, 0L, "server at <IP> and <IP> responded")))
    assert(r(2) == ((3L, 0L, 0L, 2L, "call <PHONE> or <PHONE> now")))
    assert(r(3) == ((4L, 0L, 0L, 0L, "no pii here, just words and 1234 plain numbers")))
    // 1.2.3.4.5: the \b-anchored IP pattern matches its leading 1.2.3.4
    assert(r(4)._3 == 1L)
    // the local part LOOKS like a 00-prefixed phone, but email redacts
    // first and the counts are taken per intermediate — no double count
    assert(r(5) == ((6L, 1L, 0L, 0L, "<EMAIL> is an email, not a phone")))
  }

  test("PII phone guard: '+' after a digit is arithmetic, not a phone; start-of-string '+' still redacts") {
    val rows = Seq(
      (1L, "formula 2+12345678 applies"),     // digit before '+' → untouched
      (2L, "+4912345678 leads the line"),     // '^' guard branch
      (3L, "sum 1++23456789 stays")           // '+' before '+' → untouched
    ).toDF("doc_id", "text")
    val r = TextOps.redactPii(rows, "text").orderBy("doc_id").collect()
      .map(x => (x.getAs[Long]("n_phones"), x.getAs[String]("text_redacted")))
    assert(r(0) == ((0L, "formula 2+12345678 applies")))
    assert(r(1) == ((1L, "<PHONE> leads the line")))
    assert(r(2) == ((0L, "sum 1++23456789 stays")))
  }

  test("decontamination: planted n-gram overlap caught, clean docs zero, broadcast plan") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),       // shares 3-gram with bench
      (2L, "zeta eta theta iota kappa"),            // clean
      (3L, "the quick brown fox jumps over"),       // exact copy of a bench doc
      (4L, "tiny"),                                 // < n tokens, clean
      (5L, "")                                      // empty
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over"),
      (101L, "prefix words alpha beta gamma")
    ).toDF("doc_id", "text")
    val r = TextOps.decontaminate(corpus, "doc_id", "text", bench, "text", n = 3)
      .orderBy("id").collect()
    assert(r.length == 5)
    val byId = r.map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    assert(byId(1L) == ((1L, true)))   // "alpha beta gamma" only
    assert(byId(2L) == ((0L, false)))
    assert(byId(3L)._1 == 4L && byId(3L)._2) // 4 distinct 3-grams, all hit
    assert(byId(4L) == ((0L, false)))
    // empty text's single shingle is "" — bench's shingles are all non-empty
    assert(byId(5L) == ((0L, false)))
    // scale pin on the FINAL adaptive plan (the hits join is unhinted —
    // AQE picks broadcast for a small hit table): the semi join
    // broadcasts and the corpus payload never takes a sort-merge shuffle
    val q = TextOps.decontaminate(corpus, "doc_id", "text", bench, "text", n = 3)
    q.collect()
    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin") || phys.contains("BroadcastNestedLoopJoin"))
    assert(!phys.contains("SortMergeJoin"), s"corpus-side shuffle join:\n$phys")
  }

  test("decontaminateBloom: exact equivalence to decontaminate, including under heavy sketch fpp") {
    // a corpus big enough that a Bloom false positive is likely at high
    // fpp — the exact verify join must kill every one (result identity,
    // not probabilistic agreement)
    val corpus = spark.range(300).selectExpr("id AS doc_id",
      "concat('w', id, ' w', id+1, ' w', id+2, ' w', id+3, ' filler tail') AS text")
    val bench = Seq(
      (1000L, "w10 w11 w12 w13"),            // contaminates docs 10 (and neighbors)
      (1001L, "totally disjoint bench text")
    ).toDF("doc_id", "text")
    val exact = TextOps.decontaminate(corpus, "doc_id", "text", bench, "text", n = 3)
      .orderBy("id").collect().toSeq
    for (fpp <- Seq(0.01, 0.4)) {
      val bloom = TextOps.decontaminateBloom(corpus, "doc_id", "text",
          bench, "text", n = 3, fpp = fpp)
        .orderBy("id").collect().toSeq
      assert(bloom == exact, s"bloom path diverged at fpp=$fpp")
    }
    assert(exact.count(_.getBoolean(2)) > 0) // the planted hit is real
  }

  test("extractionQuality: multiset overlap, integral ppm ratios, empty/null edges, case folding") {
    val rows = Seq(
      ("same",    "alpha beta gamma", "alpha beta gamma"),      // perfect
      ("disjoint","alpha beta",       "gamma delta"),           // zero overlap
      ("multiset","a a a b",          "a b b"),                 // min counts: a->1? no: min(3,1)+min(1,2)=2
      ("partial", "one two three four", "two three"),           // p=2/4, r=2/2
      ("caseWs",  "Foo\tBar\nbaz",    "foo bar BAZ"),           // fold + ws classes
      ("emptyE",  "",                 "x y"),
      ("nullRef", "x y",              null)
    ).toDF("url", "e", "r")
    val out = TextOps.extractionQuality(rows, "url", "e", "r")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6))))
      .toMap
    assert(out("same")     == ((3L, 3L, 3L, 1000000L, 1000000L, 1000000L)))
    assert(out("disjoint") == ((2L, 2L, 0L, 0L, 0L, 0L)))
    assert(out("multiset") == ((4L, 3L, 2L, 500000L, 666666L, 571428L)))
    assert(out("partial")  == ((4L, 2L, 2L, 500000L, 1000000L, 666666L)))
    assert(out("caseWs")   == ((3L, 3L, 3L, 1000000L, 1000000L, 1000000L)))
    assert(out("emptyE")   == ((0L, 2L, 0L, 0L, 0L, 0L)))
    assert(out("nullRef")  == ((2L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("vocabStats/topVocab: tf/df vs brute force, minDf pruning, top-k tie-break by token") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana date"),
      (3L, "apple  \n date"),
      (4L, "")).toDF("doc_id", "text")
    val got = TextOps.vocabStats(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("apple", 3L, 2L), ("banana", 3L, 2L),
      ("cherry", 1L, 1L), ("date", 2L, 2L)))
    val pruned = TextOps.vocabStats(docs, "doc_id", "text", minDf = 2L)
      .as[(String, Long, Long)].collect().toSet
    assert(pruned == got.filter(_._3 >= 2L))
    // top-2 by tf: apple and banana tie at 3 — both beat date; the
    // selector's tie order (token asc) only matters at the cut
    val top = TextOps.topVocab(TextOps.vocabStats(docs, "doc_id", "text"), k = 2L)
      .as[(String, Long, Long)].collect().map(_._1).toSet
    assert(top == Set("apple", "banana"))
    // k = 3 must admit date (tf 2) over cherry (tf 1)
    val top3 = TextOps.topVocab(TextOps.vocabStats(docs, "doc_id", "text"), k = 3L)
      .as[(String, Long, Long)].collect().map(_._1).toSet
    assert(top3 == Set("apple", "banana", "date"))
  }

  test("invertedIndexPostings/searchIndex: df guard, conjunctive lookup, STATIC partition pruning on the persisted index") {
    val docs = Seq(
      (1L, "alpha beta common"), (2L, "alpha common"), (3L, "beta common"),
      (4L, "alpha beta common"), (5L, "gamma common")).toDF("doc_id", "text")
    // 'common' (df 5) is guarded out at maxDf 4; the rest stay
    val post = TextOps.invertedIndexPostings(docs, "doc_id", "text",
      maxDf = 4L, nBuckets = 8)
    assert(post.filter($"token" === "common").count() == 0L)
    assert(post.filter($"token" === "alpha").count() == 3L)
    val dir = java.nio.file.Files.createTempDirectory("inv_idx_spec").toString
    post.write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val index = spark.read.parquet(dir)
    // conjunctive AND: alpha ∩ beta = {1, 4}
    val hits = TextOps.searchIndex(index, Seq("alpha", "beta"), nBuckets = 8)
      .as[Long].collect().toSet
    assert(hits == Set(1L, 4L))
    // guarded-out term can never match (honest: the index has no posting)
    assert(TextOps.searchIndex(index, Seq("alpha", "common"), nBuckets = 8).count() == 0L)
    // STATIC pruning: the bucket filter the lookup applies reads ONLY the
    // touched partition directories
    val bks = Seq("alpha", "beta").map(t => {
      import org.apache.spark.sql.functions.{conv, lit => flit, md5 => fmd5, pmod, substring}
      Seq(t).toDF("token")
        .select(pmod(conv(substring(fmd5($"token"), 1, 4), 16, 10).cast("long"), flit(8L)))
        .as[Long].collect().head
    }).distinct
    val filesRead = index.filter($"bucket".isin(bks: _*))
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().as[String].collect()
    assert(filesRead.nonEmpty &&
      filesRead.forall(f => bks.exists(b => f.contains(s"bucket=$b"))),
      s"lookup scan escaped its buckets: ${filesRead.take(3).mkString(", ")}")
  }

  test("rankedSearch: integral tf·idf, tf weighting, binding top-k with (-score, id) order") {
    val docs = Seq(
      (1L, "alpha alpha beta"),   // tf(alpha)=2 → scores double
      (2L, "alpha"),
      (3L, "beta"),
      (4L, "alpha beta"),
      (5L, "gamma")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("inv_idx_rank").toString
    TextOps.invertedIndexPostings(docs, "doc_id", "text", maxDf = 10L, nBuckets = 8)
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val index = spark.read.parquet(dir)
    // dfs over matched slice: alpha 3, beta 3 → unit 333333
    // doc1: 2·u + 1·u = 999999, doc4: 666666, doc2: 333333, doc3: 333333
    val top3 = TextOps.rankedSearch(index, Seq("alpha", "beta"), k = 3L, nBuckets = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(top3.toSeq == Seq((1L, 999999L, 2L), (2L, 333333L, 1L), (4L, 666666L, 2L)))
    // k binds: doc3 ties doc2 on score but loses the id tie-break at the cut
    assert(!top3.map(_._1).contains(3L))
  }

  // ---- shingle containment (Broder's asymmetric axis) ----

  private def bruteContainment(docs: Seq[(Long, String)], n: Int,
      minPpm: Long, maxDf: Int): Set[(Long, Long, Long, Long, Long, Long, Long)] = {
    def shinglesOf(text: String): Set[String] = {
      val ts = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (ts.length < n) Set(ts.mkString(" ")) else ts.sliding(n).map(_.mkString(" ")).toSet
    }
    val raw = docs.map { case (id, t) => id -> shinglesOf(t) }.toMap
    val df = raw.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val g = raw.view.mapValues(_.filter(df(_) <= maxDf)).toMap
    (for {
      (a, sa) <- g.toSeq; (b, sb) <- g.toSeq if a < b
      common = (sa & sb).size.toLong if common > 0
      cab = common * 1000000L / sa.size
      cba = common * 1000000L / sb.size
      if math.max(cab, cba) >= minPpm
    } yield (a, b, common, sa.size.toLong, sb.size.toLong, cab, cba)).toSet
  }

  test("containmentPairs: verbatim quote has containment 1e6 while Jaccard stays below LSH range; unrelated docs silent") {
    val quoted = (1 to 30).map(i => s"q$i").mkString(" ")
    val container = quoted + " " + (1 to 60).map(i => s"pad$i").mkString(" ")
    val unrelated = (1 to 40).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, quoted), (2L, container), (3L, unrelated)).toDF("doc_id", "text")
    val out = DedupOps.containmentPairs(docs, "doc_id", "text", minContainPpm = 900000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.length == 1)
    val (ia, ib, common, sa, sb, cab, _) = out.head
    assert((ia, ib) == ((1L, 2L)))
    assert(cab == 1000000L)         // all of the quote's shingles inside the container
    assert(common == sa && sb > sa) // asymmetric by construction
    // resemblance for the same pair is |A|/|B| < 0.5 — below every LSH
    // threshold used in this repo: the semantic MinHash cannot express
    assert(common.toDouble / (sa + sb - common) < 0.5)
  }

  test("containmentPairs equals brute force, including the df guard and truncating ppm") {
    val rng = new scala.util.Random(7)
    val vocab = (1 to 25).map(i => s"w$i")
    val docs = (0L until 24L).map { id =>
      val len = 4 + rng.nextInt(12)
      id -> Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    val out = DedupOps.containmentPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        n = 2, minContainPpm = 300000L, maxShingleDf = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(out == bruteContainment(docs, n = 2, minPpm = 300000L, maxDf = 4))
  }

  test("containmentPairs: a shingle over the df cap cannot manufacture pairs") {
    // 10 docs share ONLY the boilerplate trigram; with maxShingleDf = 4
    // the hot shingle is excluded and nothing pairs
    val docs = (0L until 10L).map(id =>
      id -> s"u${id}a u${id}b boiler plate line u${id}c u${id}d")
    val none = DedupOps.containmentPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
      minContainPpm = 0L, maxShingleDf = 4)
    assert(none.count() == 0)
    // raising the cap above the sharing degree re-admits it: every pair
    // now shares exactly the boilerplate shingles
    val all = DedupOps.containmentPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
      minContainPpm = 0L, maxShingleDf = 10)
    assert(all.count() == 45L) // C(10, 2)
  }
}
