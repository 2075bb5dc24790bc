package graft

import graft.functions.UrlFns
import graft.operators.LinkGraph
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Link-graph surface: href extraction (ExtractLinksExpr), relative-URL
  * resolution (UrlResolveExpr), edge building, scaled-integer PageRank,
  * and anchor-text aggregation. */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  private def links(html: String): Seq[(String, String)] = {
    val out = Seq(("https://base.example.com/dir/page.html", html))
      .toDF("url", "html")
      .select(explode(graft.functions.ExtractLinksExpr($"html")).as("l"))
      .select($"l.href", $"l.anchor")
      .as[(String, String)].collect().toSeq
    out
  }

  test("extract_links: quoted/unquoted hrefs, anchors, entity decode") {
    val html =
      """<html><body>
        |<a href="https://a.example.com/x?p=1&amp;q=2">First <b>bold</b> link</a>
        |<a href='/rel/path'>second</a>
        |<a href=bare.html>third&nbsp;one</a>
        |<a class="x" href="https://dup.example.com" href="https://ignored">dup attr</a>
        |<a name="no-href-anchor">not a link</a>
        |<a href="   https://trimmed.example.com  ">ws href</a>
        |</body></html>""".stripMargin
    assert(links(html) == Seq(
      ("https://a.example.com/x?p=1&q=2", "First bold link"),
      ("/rel/path", "second"),
      ("bare.html", "third one"),
      ("https://dup.example.com", "dup attr"),
      ("https://trimmed.example.com", "ws href")))
  }

  test("extract_links: script/style/comments excluded, quote-aware tags") {
    val html =
      """<script>document.write('<a href="https://ghost.example.com">x</a>');</script>
        |<style>a:after { content: '<a href="https://css.example.com">'; }</style>
        |<!-- <a href="https://comment.example.com">c</a> -->
        |<a href="https://real.example.com/a>b" title="x>y">kept > link</a>""".stripMargin
    assert(links(html) == Seq(
      ("https://real.example.com/a>b", "kept > link")))
  }

  test("extract_links: implicit close at next <a>, unterminated anchor, self-closing") {
    val html =
      """<a href="https://one.example.com">first
        |<a href="https://two.example.com"/>
        |<a href="https://three.example.com">tail runs to end""".stripMargin
    assert(links(html) == Seq(
      ("https://one.example.com", "first"),
      ("https://two.example.com", ""),
      ("https://three.example.com", "tail runs to end")))
  }

  test("url_resolve: RFC 3986 battery") {
    def r(base: String, href: String): String = {
      val out = UrlFns.resolve(UTF8String.fromString(base),
        UTF8String.fromString(href))
      if (out == null) null else out.toString
    }
    val base = "https://h.example.com/a/b/c.html?bq=1#bf"
    assert(r(base, "https://other.example.com/x") == "https://other.example.com/x")
    assert(r(base, "//cdn.example.com/x.js") == "https://cdn.example.com/x.js")
    assert(r(base, "/rooted/y") == "https://h.example.com/rooted/y")
    assert(r(base, "sib.html") == "https://h.example.com/a/b/sib.html")
    assert(r(base, "../up.html") == "https://h.example.com/a/up.html")
    assert(r(base, "../../../over.html") == "https://h.example.com/over.html")
    assert(r(base, "./same/dir/") == "https://h.example.com/a/b/same/dir/")
    assert(r(base, "?q=2") == "https://h.example.com/a/b/c.html?q=2")
    assert(r(base, "#frag") == "https://h.example.com/a/b/c.html?bq=1")
    assert(r(base, "") == "https://h.example.com/a/b/c.html?bq=1")
    assert(r(base, "x?q=3#f") == "https://h.example.com/a/b/x?q=3#f")
    assert(r(base, "mailto:a@example.com") == "mailto:a@example.com")
    assert(r(base, "javascript:void(0)") == "javascript:void(0)")
    // base with bare authority (no path)
    assert(r("https://h.example.com", "x.html") == "https://h.example.com/x.html")
    assert(r("not a url", "x.html") == null)
  }

  test("links/edges: resolve + normalize compose; non-http and self-loops drop") {
    val pages = Seq(
      ("HTTP://Site.Example.COM:80/d/p1.html",
        """<a href="p2.html?utm_source=x&b=2">to p2</a>
          |<a href="mailto:x@example.com">mail</a>
          |<a href="/d/p1.html">self</a>
          |<a href="//other.example.com/q">proto-rel</a>""".stripMargin))
      .toDF("url", "html")
    val ls = LinkGraph.links(pages, "url", "html")
      .as[(String, String, String)].collect().toSeq
    assert(ls == Seq(
      ("http://site.example.com/d/p1.html",
        "http://site.example.com/d/p2.html?b=2", "to p2"),
      ("http://site.example.com/d/p1.html",
        "http://site.example.com/d/p1.html", "self"),
      ("http://site.example.com/d/p1.html",
        "http://other.example.com/q", "proto-rel")))
    val es = LinkGraph.edges(LinkGraph.links(pages, "url", "html"))
      .as[(String, String)].collect().toSeq.sorted
    assert(es == Seq(
      ("http://site.example.com/d/p1.html", "http://other.example.com/q"),
      ("http://site.example.com/d/p1.html",
        "http://site.example.com/d/p2.html?b=2")))
  }

  test("pageRank: hand-computed 3-node chain, exact integer ranks") {
    // a -> b, a -> c, b -> c ; c dangles
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val out = LinkGraph.pageRank(edges, iters = 2, dampE3 = 850L)
      .orderBy($"node")
      .as[(String, Long, Long, Long)].collect().toSeq
    // n=3, r0 = 333333333333, teleport = 150e12/3000 = 50000000000
    val r0 = 1000000000000L / 3
    val tp = 150L * 1000000000000L / 3000L
    // iter1: a=tp; b=tp + a0*850/2000; c=tp + a0*850/2000 + b0*850/1000
    val a1 = tp
    val b1 = tp + r0 * 850 / 2000
    val c1 = tp + r0 * 850 / 2000 + r0 * 850 / 1000
    // iter2
    val a2 = tp
    val b2 = tp + a1 * 850 / 2000
    val c2 = tp + a1 * 850 / 2000 + b1 * 850 / 1000
    assert(out == Seq(
      ("a", 2L, 0L, a2), ("b", 1L, 1L, b2), ("c", 0L, 2L, c2)))
  }

  test("pageRank: partitioning-invariant (1 vs 32 partitions)") {
    val edges = (0 until 200).map { i =>
      (s"n${i % 50}", s"n${(i * 7 + 1) % 50}")
    }.toDF("src", "dst")
    val a = LinkGraph.pageRank(edges.repartition(1), iters = 3)
      .orderBy($"node").as[(String, Long, Long, Long)].collect().toSeq
    val b = LinkGraph.pageRank(edges.repartition(32), iters = 3)
      .orderBy($"node").as[(String, Long, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("frontier: undiscovered ∪ sitemaps, robots-clean, host-capped, rank-prioritized") {
    def fnv(s: String): Long =
      graft.functions.RollingHash64.hashBytes(s.getBytes("UTF-8"))
    val ls = Seq(
      ("http://seed.test/", "http://a.test/p1", ""),
      ("http://seed.test/", "http://a.test/p2", ""),
      ("http://seed.test/", "http://a.test/p3", ""),     // already crawled
      ("http://seed.test/", "http://a.test/bad/x", ""),  // robots-disallowed
      ("http://seed.test/", "http://b.test/q1", ""),
      ("http://seed.test/", "http://b.test/q1", ""),     // dup collapses
      ("http://seed.test/", "http://b.test/q2", ""),
      ("http://seed.test/", "mailto:x@y.test", ""))      // non-http drops
      .toDF("src", "dst", "anchor")
    val crawled = Seq("http://a.test/p3", "http://seed.test/").toDF("url")
    val robots = Seq(("a.test",
      "User-agent: *\nDisallow: /bad\nCrawl-delay: 2.5\n" +
        "Sitemap: http://a.test/sm.xml\n"))
      .toDF("host", "robots_txt")
    val hostRank = Seq(("b.test", 500L)).toDF("node", "pr_e12")
    val out = LinkGraph.frontier(ls, crawled, hostRank, robots, hostCap = 2)
      .orderBy($"host_rank_e12".desc,
        graft.functions.RollingHash64($"url"))
      .as[(String, String, Long, Int, Option[Long])].collect().toSeq
    // a.test candidates after governance: p1, p2, sm.xml (p3 crawled, /bad
    // disallowed) — the cap keeps the TWO smallest-FNV urls; b.test keeps
    // both, at rank 500, so they lead the fetch order
    val aKept = Seq("http://a.test/p1", "http://a.test/p2",
      "http://a.test/sm.xml").sortBy(fnv).take(2)
    val bKept = Seq("http://b.test/q1", "http://b.test/q2").sortBy(fnv)
    assert(out.map(_._1) == bKept ++ aKept)
    assert(out.map(_._3) == Seq(500L, 500L, 0L, 0L))
    assert(out.forall(_._4 <= 2))
    // politeness calendar: a.test's fractional Crawl-delay (2.5 s) slots
    // its picks at (rn-1)*2500 ms, monotone per host; b.test has no robots
    // row -> NULL slots (the caller's own pacing, nothing invented)
    assert(out.map(r => (r._2, r._4, r._5)).sortBy(t => (t._1, t._2)) ==
      Seq(("a.test", 1, Some(0L)), ("a.test", 2, Some(2500L)),
        ("b.test", 1, None), ("b.test", 2, None)))
    // no robots/rank inputs: everything undiscovered is eligible
    val open = LinkGraph.frontier(ls, crawled)
      .as[(String, String, Long, Int, Option[Long])].collect()
    assert(open.map(_._1).toSet == Set("http://a.test/p1",
      "http://a.test/p2", "http://a.test/bad/x", "http://b.test/q1",
      "http://b.test/q2"))
    assert(open.forall(_._5.isEmpty), "no robots frame -> NULL calendar")
  }

  test("pageRank release contract: two calls leave no blocks beyond their results") {
    // r14 verdict #2: the iteration's internal edges/nodes/rank snapshots
    // are localCheckpoint blocks that clearCache() does not cover — the
    // operator must free them itself once the result is pinned, and
    // Dedup.release(result) must leave ZERO residue (the dedup-composite
    // contract applied to the graph operator).
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val edges = (0 until 120).map { i =>
      (s"n${i % 30}", s"n${(i * 11 + 3) % 30}")
    }.toDF("src", "dst")
    val r1 = LinkGraph.pageRank(edges, iters = 2)
    val r2 = LinkGraph.pageRank(edges, iters = 3)
    assert(r1.count() > 0 && r2.count() > 0)
    val mid = spark.sparkContext.getPersistentRDDs.values.toSeq
    assert(mid.size <= 2,
      s"internal snapshots leaked past the operator: ${mid.map(_.toString)}")
    graft.operators.Dedup.release(r1)
    graft.operators.Dedup.release(r2)
    def residual = spark.sparkContext.getPersistentRDDs.values.toSeq
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (residual.nonEmpty && System.nanoTime() < deadline) Thread.sleep(100)
    assert(residual.isEmpty,
      s"residual cached blocks after release: ${residual.map(_.toString)}")
  }

  test("anchorTopK: counts ranked, ties on FNV hash asc, empty anchors drop") {
    val ls = Seq(
      ("s1", "t", "alpha"), ("s2", "t", "alpha"), ("s3", "t", "beta"),
      ("s4", "t", "beta"), ("s5", "t", "gamma"), ("s6", "t", ""),
      ("s1", "u", "only"))
      .toDF("src", "dst", "anchor")
    val out = LinkGraph.anchorTopK(ls, 2)
      .orderBy($"dst", $"rn")
      .as[(String, Int, String, Long)].collect().toSeq
    def fnv(s: String): Long =
      graft.functions.RollingHash64.hashBytes(s.getBytes("UTF-8"))
    // alpha and beta tie at cnt=2; the FNV hash (asc) breaks it
    val tied = Seq("alpha", "beta").sortBy(fnv)
    assert(out == Seq(
      ("t", 1, tied(0), 2L), ("t", 2, tied(1), 2L),
      ("u", 1, "only", 1L)))
  }
}
