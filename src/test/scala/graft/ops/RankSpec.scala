package graft.ops

import graft.SparkTestBase
import graft.functions.Log2Fp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- Log2Fp ----

  test("log2Fp: distributed expression == driver-side reference on every magnitude") {
    // values spanning 1 .. near 2^62: powers, powers +/- 1, odd composites
    val vals = (0 to 61).flatMap { e =>
      val p = 1L << e
      Seq(p, p + 1, math.max(1L, p - 1), p + (p >> 1))
    }.distinct.filter(_ >= 1)
    val got = vals.toDF("n").select(col("n"), Log2Fp(col("n")).as("lf"))
      .as[(Long, Long)].collect().toMap
    vals.foreach { n =>
      assert(got(n) == Log2Fp.compute(n), s"n=$n got=${got(n)} want=${Log2Fp.compute(n)}")
    }
  }

  test("log2Fp: exact at powers of two (zero fraction), floor(log2) in the exponent bits") {
    (0 to 62).foreach { e =>
      assert(Log2Fp.compute(1L << e) == e.toLong << 20, s"2^$e")
    }
    assert(Log2Fp.compute(1L) == 0L)
  }

  test("log2Fp: within 4 ulp of the real log2, never above it") {
    val rng = new scala.util.Random(42)
    val vals = Seq(1L, 2L, 3L, 5L, 7L, 10L, 1000L, 999999937L) ++
      (1 to 2000).map(_ => 1L + math.abs(rng.nextLong() % ((1L << 55) - 1)))
    vals.foreach { n =>
      val fp = Log2Fp.compute(n).toDouble / (1L << 20)
      val real = math.log(n.toDouble) / math.log(2.0)
      assert(fp <= real + 1e-12, s"n=$n fp=$fp over real=$real")
      assert(fp > real - 4.0 / (1L << 20), s"n=$n fp=$fp too far below real=$real")
    }
  }

  test("log2Fp: null for zero, negatives, and null input") {
    val out = Seq[java.lang.Long](0L, -5L, null, 8L).toDF("n")
      .select(Log2Fp(col("n")).as("lf")).as[Option[Long]].collect()
    assert(out.toSeq == Seq(None, None, None, Some(3L << 20)))
  }

  // ---- BM25 ----

  /** Independent driver-side BM25 — same contract, written directly from
    * the formula (not by calling the operator's column algebra). */
  private def bm25Ref(docs: Seq[(Long, String)], terms: Seq[String], k: Int,
      k1Ppm: Long = 1200000L, bPpm: Long = 750000L): Seq[(Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq }
    val n = docs.size.toLong
    val sumDl = toks.map(_._2.size.toLong).sum
    val avgdlPpm = math.max(sumDl * 1000000L / n, 1L)
    val dfT = terms.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    val scored = toks.flatMap { case (id, ts) =>
      val dl = ts.size.toLong
      terms.flatMap { term =>
        val tf = ts.count(_ == term).toLong
        if (tf == 0 || dfT(term) == 0) None
        else {
          val idf = Log2Fp.compute(2 * n + 2) - Log2Fp.compute(2 * dfT(term) + 1)
          val ratio = (bPpm * dl * 1000000L) / avgdlPpm
          val denom = tf * 1000000L + (k1Ppm * ((1000000L - bPpm) + ratio)) / 1000000L
          val tfterm = (tf * (k1Ppm + 1000000L) * 1000000L) / denom
          Some(id -> (idf * tfterm) / 1000000L)
        }
      }
    }
    scored.groupBy(_._1).toSeq
      .map { case (id, xs) => (id, xs.map(_._2).sum, xs.size.toLong) }
      .sortBy { case (id, sc, _) => (-sc, id) }
      .take(k).zipWithIndex
      .map { case ((id, sc, nt), i) => (id, sc, nt, i + 1L) }
  }

  test("bm25TopK: matches the independent reference scorer exactly (scores, set, order)") {
    val docs = Seq(
      (1L, "spark window spark filter join table"),
      (2L, "spark spark spark spark spark"),
      (3L, "window table row column filter agg merge sort data line key batch"),
      (4L, "vector vector spark window"),
      (5L, "the quick brown fox jumps over the lazy dog again and again today"),
      (6L, "spark window"),
      (7L, "vector"),
      (8L, ""))
    val terms = Seq("spark", "vector", "window")
    val got = RankOps.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text", terms, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == bm25Ref(docs, terms, 5))
  }

  test("bm25TopK: more occurrences of a term beats fewer at equal doc length") {
    val docs = Seq(
      (1L, "spark spark spark pad1 pad2"),
      (2L, "spark pad1 pad2 pad3 pad4"))
    val got = RankOps.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text",
      Seq("spark"), k = 2).as[(Long, Long, Long, Long)].collect()
    assert(got.head._1 == 1L && got.head._2 > got(1)._2)
  }

  test("bm25TopK: the rarer term outweighs the common one at equal tf and dl") {
    // 'rare' in 1 of 10 docs, 'common' in 9 of 10; probe docs 101/102 are
    // structurally identical apart from which term they carry
    val bg = (1L to 8L).map(i => (i, s"common filler$i pad"))
    val docs = bg ++ Seq((101L, "rare x y"), (102L, "common x y"))
    val got = RankOps.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text",
      Seq("rare", "common"), k = 10).as[(Long, Long, Long, Long)].collect()
    val sc = got.map(r => r._1 -> r._2).toMap
    assert(sc(101L) > sc(102L), s"rare=${sc(101L)} common=${sc(102L)}")
  }

  test("bm25TopK: ties broken by ascending id, rank contiguous from 1") {
    val docs = Seq((9L, "spark a b"), (3L, "spark a b"), (7L, "spark a b"))
    val got = RankOps.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text",
      Seq("spark"), k = 3).as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(3L, 7L, 9L))
    assert(got.map(_._4) == Seq(1L, 2L, 3L))
    assert(got.map(_._2).distinct.size == 1)
  }

  // ---- token entropy ----

  test("tokenEntropy: exact identities — all-distinct = log2fp(n), all-same = 0, empty/single = 0") {
    val docs = Seq(
      (1L, "a b c d e f g h"), // 8 distinct -> exactly log2fp(8) = 3.0
      (2L, "x x x x x x"),     // one token   -> exactly 0
      (3L, ""),                 // empty       -> 0 by contract, kept
      (4L, "solo"))             // single      -> 0
    val got = TextOps.tokenEntropy(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 8L, 8L, 3L << 20),
      (2L, 6L, 1L, 0L),
      (3L, 0L, 0L, 0L),
      (4L, 1L, 1L, 0L)))
  }

  test("tokenEntropy: matches an independent driver-side computation; repetition lowers it") {
    val docs = Seq(
      (1L, "a a b b c c d d"),
      (2L, "a a a a a a a b"),
      (3L, "w x y z w x y z w"))
    val got = TextOps.tokenEntropy(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    docs.foreach { case (id, text) =>
      val ts = text.trim.split("\\s+").filter(_.nonEmpty)
      val n = ts.length.toLong
      val s = ts.groupBy(identity).values.map { g =>
        val c = g.length.toLong; c * Log2Fp.compute(c)
      }.sum
      val want = Log2Fp.compute(n) - s / n
      assert(got(id) == want, s"doc $id: got ${got(id)} want $want")
    }
    assert(got(2L) < got(1L)) // heavy repetition scores below balanced mix
  }

  // ---- KL drift ----

  /** Independent driver-side smoothed KL, same contract. */
  private def klRef(a: Seq[String], b: Seq[String]): (Long, Long, Long, Long) = {
    def hist(xs: Seq[String]) = xs.flatMap(_.trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val ha = hist(a); val hb = hist(b)
    val vocab = (ha.keySet ++ hb.keySet).toSeq
    val v = vocab.size.toLong
    val totA = ha.values.sum; val totB = hb.values.sum
    val d = vocab.map { t =>
      val tfA = ha.getOrElse(t, 0L); val tfB = hb.getOrElse(t, 0L)
      val pPpm = ((tfB + 1) * 1000000L) / (totB + v)
      val lfdiff = Log2Fp.compute(tfB + 1) - Log2Fp.compute(tfA + 1) +
        Log2Fp.compute(totA + v) - Log2Fp.compute(totB + v)
      (pPpm * lfdiff) / 1048576L
    }.sum
    (d, v, totA, totB)
  }

  test("tokenKlDrift: identical slices diverge by exactly zero") {
    val docs = Seq("a b c", "d e f a", "g g g").toDF("text")
    val got = TextOps.tokenKlDrift(docs, docs, "text")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((0L, 7L, 10L, 10L)))
  }

  test("tokenKlDrift: matches the independent driver-side computation; drift raises it") {
    val a = Seq("the cat sat on the mat", "dogs bark at the moon", "rain falls on green hills")
    val b = Seq("the cat sat on the mat", "win free crypto now click here", "rain falls on green hills")
    val got = TextOps.tokenKlDrift(a.toDF("text"), b.toDF("text"), "text")
      .as[(Long, Long, Long, Long)].head()
    assert(got == klRef(a, b))
    val same = TextOps.tokenKlDrift(a.toDF("text"), a.toDF("text"), "text")
      .as[(Long, Long, Long, Long)].head()
    assert(got._1 > same._1, s"drifted=${got._1} identical=${same._1}")
  }

  // ---- TF-IDF keywords ----

  test("tfidfKeywords: matches an independent driver-side computation (scores, selection, ties)") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana durian"),
      (3L, "apple elderberry elderberry fig fig"),
      (4L, "banana apple"))
    val k = 2L
    val got = RankOps.tfidfKeywords(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .as[(Long, String, Long, Long)].collect().toSet
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq }
    val n = docs.size.toLong
    val dfT = toks.flatMap(_._2.distinct).groupBy(identity)
      .map { case (t, g) => t -> g.size.toLong }
    val want = toks.flatMap { case (id, ts) =>
      ts.groupBy(identity).toSeq.map { case (t, g) =>
        val tf = g.size.toLong
        val idf = Log2Fp.compute(2 * n + 2) - Log2Fp.compute(2 * dfT(t) + 1)
        (id, t, tf, tf * idf)
      }.sortBy { case (_, t, _, s) => (-s, t) }.take(k.toInt)
    }.toSet
    assert(got == want)
  }

  test("tfidfKeywords: a corpus-wide stopword never beats a doc-unique term") {
    val docs = (1L to 9L).map(i => (i, s"common uniq$i uniq$i")) :+ ((10L, "common"))
    val got = RankOps.tfidfKeywords(docs.toDF("doc_id", "text"), "doc_id", "text", 1L)
      .as[(Long, String, Long, Long)].collect()
    got.filter(_._1 <= 9L).foreach(r => assert(r._2.startsWith("uniq"), r.toString))
  }

  test("tfidfKeywords: score ties at the cutoff break by token ascending") {
    val docs = Seq((1L, "delta alpha charlie bravo"))
    val got = RankOps.tfidfKeywords(docs.toDF("doc_id", "text"), "doc_id", "text", 2L)
      .as[(Long, String, Long, Long)].collect().map(_._2).sorted.toSeq
    assert(got == Seq("alpha", "bravo"))
  }

  // ---- PMI collocations ----

  /** Independent driver-side PMI: full pipeline re-derived from first
    * principles (bigram/unigram counts, totals, five-log expansion,
    * (pmi desc, x, y) top-k). */
  private def pmiRef(texts: Seq[String], minCount: Long, k: Int)
      : Seq[(String, String, Long, Long, Long, Long, Long)] = {
    val toks = texts.map(_.trim.split("\\s+").filter(_.nonEmpty).toSeq)
    val bigs = toks.flatMap(ts => ts.zip(ts.drop(1)))
    val cXy = bigs.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val cU = toks.flatten.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val nBi = bigs.size.toLong
    val nUni = toks.map(_.size.toLong).sum
    cXy.toSeq.filter(_._2 >= minCount).map { case ((x, y), cxy) =>
      val pmi = Log2Fp.compute(cxy) + 2 * Log2Fp.compute(nUni) -
        Log2Fp.compute(nBi) - Log2Fp.compute(cU(x)) - Log2Fp.compute(cU(y))
      (x, y, cxy, cU(x), cU(y), pmi)
    }.sortBy { case (x, y, _, _, _, p) => (-p, x, y) }.take(k)
      .zipWithIndex.map { case ((x, y, cxy, cx, cy, p), i) =>
        (x, y, cxy, cx, cy, p, i + 1L)
      }
  }

  test("pmiCollocations: matches an independent driver-side computation (counts, scores, order)") {
    val texts = Seq(
      "new york is big and new york is old",
      "the cat and the dog and the bird",
      "new day in york town the cat sat",
      "big dog old cat new york wins")
    val got = RankOps.pmiCollocations(texts.toDF("text"), "text", minCount = 2L, k = 100)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == pmiRef(texts, 2L, 100))
  }

  test("pmiCollocations: a true collocation outranks a frequent independent pair") {
    // "aa bb" always adjacent; "cc" and "dd" each frequent but never adjacent
    val texts = (1 to 6).map(i => s"aa bb cc x$i dd cc y$i dd")
    val got = RankOps.pmiCollocations(texts.toDF("text"), "text", minCount = 2L, k = 5)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(got.head._1 == "aa" && got.head._2 == "bb", got.head.toString)
    assert(!got.exists(r => r._1 == "cc" && r._2 == "dd"))
  }

  test("pmiCollocations: minCount gates rare pairs; short docs contribute nothing") {
    val texts = Seq("p q", "p q", "r s", "solo", "")
    val got = RankOps.pmiCollocations(texts.toDF("text"), "text", minCount = 2L, k = 10)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set(("p", "q")))
    val empty = RankOps.pmiCollocations(Seq("one", "", "two").toDF("text"),
      "text", minCount = 1L, k = 10).collect()
    assert(empty.isEmpty)
  }

  test("bm25 plan: term-side joins broadcast, top-k is TakeOrdered, no sort-merge join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = RankOps.bm25TopK(docs, "doc_id", "text", Seq("spark", "vector"), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.toLowerCase.contains("sortmergejoin"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
