package graft

import graft.functions.SitemapExpr
import org.apache.spark.unsafe.types.UTF8String

/** Sitemap-protocol parser: the three shipped shapes, entity decode,
  * namespace tolerance, damage tolerance, and the frontier composition. */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private def parse(body: String): Seq[(String, Option[String], String)] = {
    val arr = SitemapExpr.parse(UTF8String.fromString(body))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString,
        if (r.isNullAt(1)) None else Some(r.getUTF8String(1).toString),
        r.getUTF8String(2).toString)
    }
  }

  test("urlset: loc + optional lastmod, entity decode, whitespace trim") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        | <url>
        |  <loc> https://e.com/a </loc>
        |  <lastmod>2024-02-03</lastmod>
        | </url>
        | <url><loc>https://e.com/b?x=1&amp;y=2</loc></url>
        | <url><lastmod>2024-01-01</lastmod></url>
        |</urlset>""".stripMargin
    assert(parse(xml) == Seq(
      ("https://e.com/a", Some("2024-02-03"), "url"),
      ("https://e.com/b?x=1&y=2", None, "url")))
  }

  test("sitemapindex: nested children carry kind=sitemap; namespace prefixes tolerate") {
    val xml =
      """<sm:sitemapindex xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        | <sm:sitemap><sm:loc>https://e.com/sm1.xml</sm:loc></sm:sitemap>
        | <sm:sitemap>
        |  <sm:loc>https://e.com/sm2.xml</sm:loc>
        |  <sm:lastmod>2024-05-05</sm:lastmod>
        | </sm:sitemap>
        |</sm:sitemapindex>""".stripMargin
    assert(parse(xml) == Seq(
      ("https://e.com/sm1.xml", None, "sitemap"),
      ("https://e.com/sm2.xml", Some("2024-05-05"), "sitemap")))
  }

  test("plain-text form: http(s) lines only; damage yields the parseable prefix") {
    assert(parse("https://e.com/a\n# comment\nftp://no\nhttps://e.com/b\n") ==
      Seq(("https://e.com/a", None, "url"), ("https://e.com/b", None, "url")))
    // stray <loc> outside a parent drops; truncated tail keeps the prefix
    assert(parse("<urlset><loc>https://orphan</loc>" +
      "<url><loc>https://e.com/ok</loc></url><url><loc>https://e.com/cut") ==
      Seq(("https://e.com/ok", None, "url")))
    assert(parse("") == Nil)
    assert(parse("<<<>>>") == Nil)
  }

  test("recrawl: a crawled url re-admits only when its sitemap lastmod advances past the fetch") {
    val links = Seq.empty[(String, String, String)]
      .toDF("src", "dst", "anchor")
    val crawled = Seq(
      ("http://a.test/fresh", "2024-03-01T00:00:00Z"),  // fetched AFTER lastmod
      ("http://a.test/stale", "2024-01-01T00:00:00Z"),  // lastmod advanced
      ("http://a.test/nolm", "2024-01-01T00:00:00Z"))   // sitemap has no lastmod
      .toDF("url", "fetched_at")
    val sm = Seq(("http://a.test/sm.xml",
      "<urlset>" +
        "<url><loc>http://a.test/fresh</loc>" +
        "<lastmod>2024-02-01T00:00:00Z</lastmod></url>" +
        "<url><loc>http://a.test/stale</loc>" +
        "<lastmod>2024-02-01T00:00:00Z</lastmod></url>" +
        "<url><loc>http://a.test/nolm</loc></url>" +
        "<url><loc>http://a.test/brand-new</loc></url>" +
        "</urlset>")).toDF("url", "body")
    val out = graft.operators.LinkGraph.frontier(links, crawled,
        sitemapDocs = sm)
      .select($"url").as[String].collect().toSet
    assert(out == Set("http://a.test/stale", "http://a.test/brand-new"))
    // the 1-column crawled frame keeps fetched-is-final semantics
    val strict = graft.operators.LinkGraph.frontier(links,
        crawled.select($"url"), sitemapDocs = sm)
      .select($"url").as[String].collect().toSet
    assert(strict == Set("http://a.test/brand-new"))
    // a RE-FETCHED url compares against its LATEST fetch: the stale row's
    // old date must not re-admit it, and the duplicate must not multiply
    // frontier rows
    val refetched = crawled.unionByName(Seq(
      ("http://a.test/stale", "2024-03-01T00:00:00Z")) // newer than lastmod
      .toDF("url", "fetched_at"))
    val out2 = graft.operators.LinkGraph.frontier(links, refetched,
        sitemapDocs = sm)
      .select($"url").as[String].collect().toSeq.sorted
    assert(out2 == Seq("http://a.test/brand-new"))
  }

  test("fuzz: random and mutated bodies never kill the crawl kernels (fixed seed)") {
    // the WarcSpec fuzz discipline applied to the r15 kernels: sitemap
    // parse, robots crawl-delay, URL resolve — all total functions over
    // arbitrary strings; a crawl feeds them the open web
    val rnd = new scala.util.Random(271828L)
    val seeds = Seq(
      "<urlset><url><loc>https://e.com/a</loc></url></urlset>",
      "<sitemapindex><sitemap><loc>https://e.com/s.xml</loc></sitemap></sitemapindex>",
      "https://e.com/a\nhttps://e.com/b",
      "User-agent: *\nCrawl-delay: 1.5\nDisallow: /a\nSitemap: https://e.com/s.xml")
    val alphabet = "<>/lochurst :=.&;#\n\r\tabc0129-\"'%$*".toCharArray
    for (i <- 0 until 400) {
      val body =
        if (i % 4 == 0) // pure noise
          new String(Array.fill(rnd.nextInt(300))(
            alphabet(rnd.nextInt(alphabet.length))))
        else { // mutated seed: splice noise into a valid shape
          val s = seeds(rnd.nextInt(seeds.length))
          val cut = rnd.nextInt(s.length + 1)
          s.substring(0, cut) +
            new String(Array.fill(rnd.nextInt(20))(
              alphabet(rnd.nextInt(alphabet.length)))) +
            s.substring(rnd.nextInt(s.length + 1).min(s.length))
        }
      val u = UTF8String.fromString(body)
      SitemapExpr.parse(u) // must not throw
      graft.functions.RobotsExprs.crawlDelayMs(u,
        UTF8String.fromString("graftbot"))
      graft.functions.RobotsExprs.rules(u, UTF8String.fromString("x"))
      graft.functions.UrlFns.resolve(
        UTF8String.fromString("http://e.com/d/p"), u)
      graft.functions.UrlFns.resolve(u, UTF8String.fromString("../x"))
    }
  }

  test("frontier expands fetched sitemap bodies (pages AND nested children)") {
    val links = Seq(("http://seed.test/", "http://a.test/p1", ""))
      .toDF("src", "dst", "anchor")
    val crawled = Seq("http://seed.test/", "http://a.test/fromsm1")
      .toDF("url")
    val smBodies = Seq(("http://a.test/sm.xml",
      "<urlset><url><loc>http://a.test/fromsm1</loc></url>" +
        "<url><loc>http://a.test/fromsm2</loc></url></urlset>"),
      ("http://a.test/smidx.xml",
        "<sitemapindex><sitemap><loc>http://a.test/child.xml</loc>" +
          "</sitemap></sitemapindex>"))
      .toDF("url", "body")
    val out = graft.operators.LinkGraph.frontier(links, crawled,
        sitemapDocs = smBodies)
      .select($"url").as[String].collect().toSet
    // fromsm1 already crawled; fromsm2 and the nested child are fetchable
    assert(out == Set("http://a.test/p1", "http://a.test/fromsm2",
      "http://a.test/child.xml"))
  }
}
