package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** robots.txt parsing + RFC 9309 decision filter, and redirect-chain
  * resolution (distance doubling + cycle detection). The cross-engine
  * decision/walk replays live in q_robots_filter / q_redirect_resolve. */
class RobotsRedirectSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- parseRobotsTxt --------------------------------------------------

  test("parseRobotsTxt: basic group, comments, empty-disallow no-op") {
    val txt =
      """# top comment
        |User-agent: *
        |Disallow: /private/   # trailing comment
        |Allow: /private/ok/
        |Disallow:
        |Sitemap: https://h/sitemap.xml
        |""".stripMargin
    assert(LinkOps.parseRobotsTxt(txt) ==
      Seq(("/private/", false), ("/private/ok/", true)))
  }

  test("parseRobotsTxt: most-specific group wins; '*' is the fallback") {
    val txt =
      """User-agent: specialbot
        |Disallow: /only-special/
        |
        |User-agent: *
        |Disallow: /everyone/
        |""".stripMargin
    assert(LinkOps.parseRobotsTxt(txt) == Seq(("/everyone/", false)))
    assert(LinkOps.parseRobotsTxt(txt, "SpecialBot") ==
      Seq(("/only-special/", false)))
    assert(LinkOps.parseRobotsTxt(txt, "otherbot") == Seq(("/everyone/", false)))
  }

  test("parseRobotsTxt: consecutive User-agent lines share one group; a UA after rules starts a new one") {
    val txt =
      """User-agent: a
        |User-agent: *
        |Disallow: /x/
        |User-agent: b
        |Disallow: /y/
        |""".stripMargin
    assert(LinkOps.parseRobotsTxt(txt) == Seq(("/x/", false)))
    assert(LinkOps.parseRobotsTxt(txt, "a") == Seq(("/x/", false)))
    assert(LinkOps.parseRobotsTxt(txt, "b") == Seq(("/y/", false)))
  }

  test("parseRobotsTxt: trailing '*' drops; interior wildcard/'$' rules are skipped; fields case-insensitive") {
    val txt =
      """USER-AGENT: *
        |DISALLOW: /cgi-bin/*
        |Disallow: /*.gif$
        |Disallow: /end$
        |ALLOW: /cgi-bin/ok
        |""".stripMargin
    assert(LinkOps.parseRobotsTxt(txt) ==
      Seq(("/cgi-bin/", false), ("/cgi-bin/ok", true)))
  }

  test("parseRobotsTxt: null/empty/rule-free input yields no rules") {
    assert(LinkOps.parseRobotsTxt(null) == Nil)
    assert(LinkOps.parseRobotsTxt("") == Nil)
    assert(LinkOps.parseRobotsTxt("# only comments\nSitemap: x\n") == Nil)
  }

  test("sitemapsOfRobots: non-group field, case-insensitive, absolute http(s) only, first-position dedupe") {
    val txt =
      """# header comment
        |SITEMAP: https://h.example/a.xml
        |User-agent: *
        |Disallow: /x/
        |sitemap: http://h.example/b.xml   # trailing comment
        |Sitemap: /relative/rejected.xml
        |Sitemap: ftp://h.example/rejected.xml
        |Sitemap: https://h.example/a.xml
        |""".stripMargin
    assert(LinkOps.sitemapsOfRobots(txt) ==
      Seq("https://h.example/a.xml", "http://h.example/b.xml"))
    assert(LinkOps.sitemapsOfRobots(null) == Nil)
    assert(LinkOps.sitemapsOfRobots("User-agent: *\nDisallow: /\n") == Nil)
  }

  test("discoverSitemaps: (host, sitemap_url) rows, map-only over the robots table") {
    val robots = Seq(
      ("h1.example", "Sitemap: https://h1.example/s.xml\nSitemap: https://h1.example/t.xml\n"),
      ("h2.example", "User-agent: *\nDisallow: /\n")).toDF("host", "body")
    val out = LinkOps.discoverSitemaps(robots)
      .as[(String, String)].collect().sorted.toSeq
    assert(out == Seq(("h1.example", "https://h1.example/s.xml"),
      ("h1.example", "https://h1.example/t.xml")))
  }

  // ---- filterByRobots --------------------------------------------------

  private val rules = Seq(
    // h1: root block with a carve-out, plus an equal-length tie
    ("h1.example", "/", false),
    ("h1.example", "/pub/", true),
    ("h1.example", "/tie/", true),
    ("h1.example", "/tie/", false),
    // h2: longest match is a disallow UNDER an allow
    ("h2.example", "/a/", true),
    ("h2.example", "/a/b/", false)
  ).toDF("host", "prefix", "is_allow")

  private def kept(urls: Seq[String]): Set[String] =
    LinkOps.filterByRobots(urls.toDF("url"), "url", rules)
      .as[String].collect().toSet

  test("filterByRobots: longest match wins, allow wins length ties, unknown hosts pass") {
    val urls = Seq(
      "https://h1.example/pub/doc1",   // allow /pub/ (len 5) beats / (len 1)
      "https://h1.example/priv/doc2",  // only / matches -> blocked
      "https://h1.example/tie/doc3",   // equal-length allow vs disallow -> allow
      "https://h2.example/a/doc4",     // allow /a/
      "https://h2.example/a/b/doc5",   // deeper disallow beats shorter allow
      "https://h3.example/any/doc6")   // no rules for host -> kept
    assert(kept(urls) == Set(
      "https://h1.example/pub/doc1",
      "https://h1.example/tie/doc3",
      "https://h2.example/a/doc4",
      "https://h3.example/any/doc6"))
  }

  test("filterByRobots: a url without a path is the root path") {
    assert(kept(Seq("https://h1.example", "https://h2.example")) ==
      Set("https://h2.example")) // h1 blocks '/', h2 has no rule matching '/'
  }

  // ---- resolveRedirects ------------------------------------------------

  private def resolve(edges: Seq[(String, String)]): Map[String, (String, Long, String)] =
    LinkOps.resolveRedirects(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getString(3))))
      .toMap

  test("resolveRedirects: chain resolves with exact hop counts") {
    val m = resolve(Seq("a" -> "b", "b" -> "c", "c" -> "d"))
    assert(m == Map(
      "a" -> (("d", 3L, "resolved")),
      "b" -> (("d", 2L, "resolved")),
      "c" -> (("d", 1L, "resolved"))))
  }

  test("resolveRedirects: cycles and chains INTO cycles are flagged, not resolved") {
    val m = resolve(Seq("x" -> "y", "y" -> "z", "z" -> "x", "e" -> "x"))
    assert(m.keySet == Set("x", "y", "z", "e"))
    assert(m.values.forall { case (f, h, s) => f == "" && h == 0L && s == "cycle" })
  }

  test("resolveRedirects: multi-edges collapse to the smallest destination; self-loops drop") {
    val m = resolve(Seq("a" -> "c", "a" -> "b", "s" -> "s"))
    assert(m == Map("a" -> (("b", 1L, "resolved"))))
  }

  test("resolveRedirects: a 20-hop chain resolves under the default round cap") {
    val chain = (0 until 20).map(i => f"u$i%02d" -> f"u${i + 1}%02d")
    val m = resolve(chain)
    assert(m(f"u00") == (("u20", 20L, "resolved")))
    assert(m(f"u19") == (("u20", 1L, "resolved")))
    assert(m.size == 20)
  }
}
