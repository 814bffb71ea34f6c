package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property suites from SURVEY.md §5.2 (raw ScalaCheck generators driven
  * from a fixed seed — scalatestplus isn't in the offline cache). */
class PropertySpec extends AnyFunSuite {

  def forAll[T](g: Gen[T], n: Int = 200)(f: T => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(12345L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 50) {
      g.apply(params, seed).foreach { v => f(v); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > n / 2, s"generator too restrictive: $produced of $n")
  }

  val dims: Gen[(Long, Long)] = for {
    h <- Gen.choose(1L, 8000L)
    w <- Gen.choose(1L, 8000L)
    if math.max(h, w).toDouble / math.min(h, w) <= 200
  } yield (h, w)

  test("smart_resize invariants: divisibility, pixel window, aspect") {
    forAll(dims) { hw => val (h, w) = hw;
      val (hb, wb) = Geometry.smartResize(h, w)
      assert(hb % 28 == 0 && wb % 28 == 0)
      assert(hb * wb <= Geometry.MaxPixels)
      // min-pixels can only be violated by the factor floor on extremes
      assert(hb * wb >= Geometry.MinPixels || hb == 28 || wb == 28)
      // aspect preserved within one factor step on each side
      val r0 = h.toDouble / w
      val r1 = hb.toDouble / wb
      assert(r1 / r0 < 3.0 && r0 / r1 < 3.0)
    }
  }

  test("smart_resize idempotent on its own output") {
    forAll(dims) { hw => val (h, w) = hw;
      val (hb, wb) = Geometry.smartResize(h, w)
      assert(Geometry.smartResize(hb, wb) == ((hb, wb)))
    }
  }

  val bboxGen: Gen[(Long, Long, Long, Long)] = for {
    x1 <- Gen.choose(0L, 2000L); y1 <- Gen.choose(0L, 2000L)
    dw <- Gen.choose(1L, 1000L); dh <- Gen.choose(1L, 1000L)
  } yield (x1, y1, x1 + dw, y1 + dh)

  test("bbox pre∘post round-trip within truncation error") {
    val geom = for {
      (h, w) <- dims.suchThat { case (h, w) => h >= 100 && w >= 100 }
      b <- bboxGen.suchThat { case (x1, y1, x2, y2) => x2 <= w && y2 <= h }
    } yield (h, w, b)
    forAll(geom) { g => val (h, w, (x1, y1, x2, y2)) = g;
      val (ih, iw) = Geometry.smartResize(h, w)
      val cell = JObject("bbox" -> JArray(Vector(x1, y1, x2, y2).map(JInt(_))),
        "category" -> JString("Text"))
      // post: input→original space; pre: original→input space
      val post = BboxScale.postProcessCells(w, h, Vector(cell), iw, ih)
      val JArray(pb) = post.head.asInstanceOf[JObject].get("bbox").get
      val back = BboxScale.preProcessBboxes(w, h, Vector(pb), iw, ih).head
      val orig = Vector(x1, y1, x2, y2)
      back.zip(orig).foreach { case (b, o) =>
        // each direction truncates: error ≤ ceil(scale) per hop
        val scale = math.max(w.toDouble / iw, h.toDouble / ih)
        assert((b.toLong - o).abs <= math.ceil(scale).toLong + 1, s"$back vs $orig")
      }
    }
  }

  val cellGen: Gen[JValue] = for {
    x1 <- Gen.choose(0, 500); y1 <- Gen.choose(0, 500)
    w <- Gen.choose(1, 300); h <- Gen.choose(1, 300)
    cat <- Gen.oneOf(graft.core.Categories.All)
    text <- Gen.oneOf("plain", "中文内容", "Привет", "$$x$$", "a\nb", "")
    dropText <- Gen.prob(0.2)
  } yield {
    var o = JObject(
      "bbox" -> JArray(Vector(x1, y1, x1 + w, y1 + h).map(v => JInt(BigInt(v)))),
      "category" -> JString(cat))
    if (!dropText) o = o.updated("text", JString(text))
    o
  }

  test("cleaner idempotent on already-clean serialized cells") {
    forAll(Gen.listOfN(6, cellGen)) { cells =>
      val json = PyJson.dumps(JArray(cells.toVector))
      val once = OutputRepair.cleanModelOutput(Right(json))
      val twice = OutputRepair.cleanModelOutput(Right(PyJson.dumps(JArray(once))))
      assert(PyJson.dumps(JArray(once)) == PyJson.dumps(JArray(twice)))
    }
  }

  test("C7 dedup preserves order and keeps first occurrences") {
    forAll(Gen.listOfN(12, cellGen)) { cells =>
      val out = OutputRepair.dedupPairsAndBbox(cells.toVector)
      // order preserved: out is a subsequence of input
      var i = 0
      out.foreach { o =>
        val j = cells.indexWhere(_ eq o, i)
        val j2 = if (j < 0) cells.indexOf(o, i) else j
        assert(j2 >= i, "order not preserved")
        i = j2 + 1
      }
      // no bbox occurs twice in the output
      val bboxes = out.collect { case o: JObject => o.get("bbox") }.flatten
      assert(bboxes.distinct.size == bboxes.size)
    }
  }

  test("PyJson dumps∘parse is identity on generated values") {
    val leaf: Gen[JValue] = Gen.oneOf(
      Gen.choose(-1000000L, 1000000L).map(v => JInt(BigInt(v))),
      Gen.choose(-1e6, 1e6).map(JDouble(_)),
      Gen.oneOf("", "text", "汉字", "a\"b\\c", "line\nbreak", "ctl").map(JString(_)),
      Gen.oneOf(JBool(true), JBool(false), JNull))
    val value: Gen[JValue] = for {
      items <- Gen.listOfN(5, leaf)
      keys <- Gen.listOfN(3, Gen.alphaNumStr.suchThat(_.nonEmpty))
      inner <- Gen.listOfN(3, leaf)
    } yield JArray(items.toVector :+ JObject(keys.zip(inner).toVector.distinctBy(_._1)))
    forAll(value) { v =>
      assert(PyJson.parse(PyJson.dumps(v)) == v)
    }
  }

  test("page combine associativity across splits") {
    forAll(Gen.listOfN(6, Gen.alphaStr)) { mds =>
      val pages = mds.zipWithIndex.map { case (m, i) => (i, m) }
      val whole = MdRender.combinePages(pages)
      val (a, b) = pages.splitAt(3)
      val recombined = (MdRender.combinePages(a), MdRender.combinePages(b)) match {
        case (x, y) if a.isEmpty => y
        case (x, y) if b.isEmpty => x
        case (x, y)              => x + "\n\n---\n\n" + y
      }
      assert(whole == recombined)
    }
  }
}
