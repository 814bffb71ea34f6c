package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  // ---- HyperLogLog ----

  test("hllDistinct: estimate within the 1.04/sqrt(m) HLL error band of exact") {
    // ~6k distinct keys against m=256 registers (p=8) — raw-estimate
    // regime (n >> 2.5m); theoretical rel. std error 1.04/16 = 6.5%,
    // assert 3 sigma
    val n = 6000L
    val keys = spark.range(n).select(concat(lit("url-"), col("id")).as("k"), lit(1).as("g"))
    val est = SketchOps.hllDistinct(keys, "k", Seq("g"), p = 8)
      .select("estimate").as[Long].head()
    assert(math.abs(est - n).toDouble / n < 0.20, s"est=$est exact=$n")
  }

  test("hllDistinct: per-group estimates track per-group exact counts") {
    // skewed groups: group i holds ~1000*(i+1) distinct keys
    val keys = spark.range(10000)
      .select(concat(lit("k"), col("id")).as("k"), (col("id") % 4).as("g"))
    val est = SketchOps.hllDistinct(keys, "k", Seq("g"), p = 10)
      .select("g", "estimate").as[(Long, Long)].collect().toMap
    val exact = keys.groupBy("g").agg(countDistinct("k").as("n"))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n).toDouble / n < 0.15, s"g=$g est=${est(g)} exact=$n")
    }
  }

  test("hllRegisters: merge of slice registers == registers of the union (algebraic)") {
    val a = spark.range(0, 3000).select(concat(lit("k"), col("id")).as("k"), lit(1).as("g"))
    val b = spark.range(1500, 5000).select(concat(lit("k"), col("id")).as("k"), lit(1).as("g"))
    val merged = SketchOps.hllRegisters(a, "k", Seq("g"), p = 8)
      .unionByName(SketchOps.hllRegisters(b, "k", Seq("g"), p = 8))
      .groupBy("g", "reg").agg(max("rho").as("rho"))
    val direct = SketchOps.hllRegisters(a.unionByName(b), "k", Seq("g"), p = 8)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("hllDistinct: duplicates never move the estimate (cardinality, not count)") {
    val once = spark.range(4000).select(concat(lit("k"), col("id")).as("k"), lit(1).as("g"))
    val tenX = once.crossJoin(spark.range(10).select(col("id").as("rep"))).select("k", "g")
    val e1 = SketchOps.hllDistinct(once, "k", Seq("g"), p = 8).select("estimate").as[Long].head()
    val e10 = SketchOps.hllDistinct(tenX, "k", Seq("g"), p = 8).select("estimate").as[Long].head()
    assert(e1 == e10)
  }

  test("hll plan: register build is a two-level hash agg — no window, no sort") {
    val keys = spark.range(100).select(concat(lit("k"), col("id")).as("k"), lit(1).as("g"))
    val plan = SketchOps.hllDistinct(keys, "k", Seq("g"), p = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("sortmergejoin"), plan)
  }

  // ---- Count-min sketch ----

  test("cms: estimate >= true count always; exact for unique heavy tokens at low load") {
    // heavy token planted 500x, background of ~2.4k distinct tokens into
    // d=4 x w=4096 cells: collisions possible but the one-sided bound and
    // the heavy token's dominance must hold
    val heavy = spark.range(500).select(lit("HEAVYTOKEN").as("text"))
    val corpus = docs.limit(200).select(col("text")).unionByName(heavy)
    val truth = corpus.select(explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    val probes = corpus.select(explode(TextOps.tokens(col("text"))).as("token")).distinct()
    val est = SketchOps.cmsEstimate(
      SketchOps.cmsBuild(corpus, "text"), probes, "token")
      .as[(String, Long)].collect().toMap
    truth.foreach { case (t, n) =>
      assert(est(t) >= n, s"CMS under-counted $t: est=${est(t)} true=$n")
    }
    assert(est("HEAVYTOKEN") === truth("HEAVYTOKEN"))
  }

  test("cms: sketches of two slices ADD to the sketch of the union") {
    val a = docs.limit(100).select("text")
    val b = docs.orderBy(desc("doc_id")).limit(100).select("text")
    val summed = SketchOps.cmsBuild(a, "text").unionByName(SketchOps.cmsBuild(b, "text"))
      .groupBy("r", "cell").agg(sum("cnt").as("cnt"))
    val direct = SketchOps.cmsBuild(a.unionByName(b), "text")
    assert(summed.exceptAll(direct).isEmpty && direct.exceptAll(summed).isEmpty)
  }

  test("cmsHeavy: finds exactly the planted heavy hitters at a binding threshold") {
    val heavy = spark.range(3000).select(lit("ZHEAVYA ZHEAVYB").as("text"))
    val corpus = docs.limit(150).select(col("text")).unionByName(heavy)
    val probes = corpus.select(explode(TextOps.tokens(col("text"))).as("token"))
    val hits = SketchOps.cmsHeavy(corpus, "text", probes, "token", minCount = 2000L)
      .select("token").as[String].collect().toSet
    assert(hits.contains("ZHEAVYA") && hits.contains("ZHEAVYB"))
    // even the heaviest background stopword in 150 short docs stays far
    // below 2000, and collision inflation is bounded by the planted mass
    // landing in other cells (w=4096 cells vs ~2k distinct tokens)
    val exact = corpus.select(explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").count().filter(col("count") >= 2000).count()
    assert(exact == 2L, s"test premise: only the planted pair is truly heavy, got $exact")
    // and no background token's ESTIMATE clears the bar either (a
    // background token colliding with a planted cell would need to
    // collide in ALL d rows to be reported — probability ~ (2/4096)^4)
    assert(hits.size == 2, s"false heavy hitters: ${hits - "ZHEAVYA" - "ZHEAVYB"}")
  }

  test("cms: bounded size — sketch row count <= d*w regardless of corpus") {
    val sk = SketchOps.cmsBuild(docs.select("text"), "text", depth = 4, width = 512)
    assert(sk.count() <= 4L * 512)
  }

  // ---- Perceptron training ----

  test("perceptron: converges on linearly separable data; trained weights classify it") {
    // class +1 docs speak one vocabulary, class -1 another — separable in
    // any hashed space with high probability at 64 buckets
    val pos = (0 until 40).map(i => (i.toLong, s"alpha bravo charlie delta echo token$i", 1L))
    val neg = (0 until 40).map(i => (1000L + i, s"zulu yankee xray whiskey victor neg$i", -1L))
    val df = (pos ++ neg).toDF("id", "text", "y")
    val w = TextOps.perceptronTrain(df, "id", "text", col("y"), nFeatures = 64, rounds = 4)
    // apply the learned weights: every doc must land on its own side
    val feats = df.select(col("id"), col("y"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("id"), col("y"),
        TextOps.md5Bucket(col("tok"), 64).as("f"))
      .groupBy("id", "y", "f").agg(count(lit(1)).as("x"))
    val margins = feats.join(w, Seq("f"), "left")
      .groupBy("id", "y")
      .agg(sum(col("x") * coalesce(col("w"), lit(0L))).as("m"))
    val wrong = margins.filter(col("y") * col("m") <= 0).count()
    assert(wrong == 0L, s"$wrong training points still misclassified after 4 rounds")
  }

  test("perceptron round 1 == class-conditional token-mass difference (zero-init contract)") {
    val df = Seq((1L, "aa bb aa", 1L), (2L, "bb cc", -1L)).toDF("id", "text", "y")
    val w = TextOps.perceptronTrain(df, "id", "text", col("y"), nFeatures = 8, rounds = 1)
      .as[(Long, Long)].collect().toMap
    // with w0 = 0 every margin is 0 => all docs misclassified => w1_f = sum y*x_f
    val expected = df.select(col("y"), explode(TextOps.tokens(col("text"))).as("t"))
      .select(col("y"), TextOps.md5Bucket(col("t"), 8).as("f"))
      .groupBy("f").agg(sum("y").as("w")).filter(col("w") =!= 0)
      .as[(Long, Long)].collect().toMap
    assert(w == expected)
  }

  test("perceptron: weight table never exceeds nFeatures rows") {
    val w = TextOps.perceptronTrain(docs.limit(300), "doc_id", "text",
      when(col("lang") === "en", 1L).otherwise(-1L), nFeatures = 32, rounds = 2)
    assert(w.count() <= 32L)
  }
}
