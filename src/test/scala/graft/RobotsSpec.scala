package graft

import graft.functions.RobotsExprs
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 robots kernels: group selection, rule parsing, longest-match
  * verdicts, wildcard/anchor patterns. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def rules(txt: String, agent: String): Seq[(String, Boolean)] = {
    val arr = RobotsExprs.rules(UTF8String.fromString(txt),
      UTF8String.fromString(agent))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getBoolean(1))
    }
  }

  private def verdict(path: String, rs: Seq[(String, Boolean)]): Boolean = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    RobotsExprs.allowed(UTF8String.fromString(path),
      new GenericArrayData(rs.map(r => UTF8String.fromString(r._1)).toArray),
      new GenericArrayData(rs.map(_._2).toArray))
  }

  private val robotsTxt =
    """# a comment line
      |User-agent: BigCrawler
      |Disallow: /private
      |Allow: /private/ok
      |
      |User-agent: Spot
      |User-agent: OtherBot
      |Disallow: /
      |
      |Sitemap: https://x.test/sitemap.xml
      |User-agent: *
      |Disallow: /tmp   # trailing comment
      |Disallow:
      |Allow: /tmp/keep
      |""".stripMargin

  test("rules: group selection — named longest-prefix, shared groups, * fallback") {
    assert(rules(robotsTxt, "bigcrawler") ==
      Seq(("/private", false), ("/private/ok", true)))
    // longest UA prefix wins: "bigcrawler-news/1.0" still matches BigCrawler
    assert(rules(robotsTxt, "BigCrawler-News") ==
      Seq(("/private", false), ("/private/ok", true)))
    // two UA lines share one group
    assert(rules(robotsTxt, "spot") == Seq(("/", false)))
    assert(rules(robotsTxt, "otherbot") == Seq(("/", false)))
    // unknown agent -> the * group; empty-path Disallow ignored; Sitemap
    // line does not break anything
    assert(rules(robotsTxt, "randombot") ==
      Seq(("/tmp", false), ("/tmp/keep", true)))
    // robots with NO matching group and no * -> empty rules = allow all
    assert(rules("User-agent: x\nDisallow: /", "ybot").isEmpty)
  }

  test("rules: ALL groups at the winning UA match combine (RFC 9309 §2.2.1)") {
    // real robots.txt files repeat `User-agent: *` groups; dropping the
    // later ones silently allows their Disallow paths (r14 advice)
    val repeated =
      """User-agent: *
        |Disallow: /a
        |
        |User-agent: spot
        |Disallow: /s
        |
        |User-agent: *
        |Disallow: /b
        |Allow: /b/ok
        |""".stripMargin
    assert(rules(repeated, "randombot") ==
      Seq(("/a", false), ("/b", false), ("/b/ok", true)))
    // named groups repeat too — and the * groups do NOT leak into a
    // named-agent merge
    assert(rules(repeated + "\nUser-agent: spot\nAllow: /s/ok\n", "spot") ==
      Seq(("/s", false), ("/s/ok", true)))
  }

  test("allowed: longest-match wins, allow wins ties, no match allows") {
    val rs = Seq(("/p", false), ("/p/special", true), ("/q", false))
    assert(!verdict("/p/other", rs))       // /p disallows
    assert(verdict("/p/special/x", rs))    // longer allow overrides
    assert(verdict("/r/anything", rs))     // no rule matches
    // equal-length tie -> allow
    assert(verdict("/ab", Seq(("/a", false), ("/a", true))))
    // empty rule set (no governing group) allows
    assert(verdict("/x", Nil))
  }

  test("patterns: * wildcards and $ anchors") {
    assert(verdict("/a/img_x.jpg", Seq(("/a/*.jpg", false))) == false)
    assert(verdict("/a/img_x.jpgx", Seq(("/a/*.jpg$", false))) == true)
    assert(verdict("/a/img_x.jpg", Seq(("/a/*.jpg$", false))) == false)
    // * spans multiple segments; prefix semantics after the wildcard
    assert(verdict("/x/y/z/file.pdf?dl=1", Seq(("/*/file.pdf", false))) == false)
    // $ alone anchors an exact path
    assert(verdict("/", Seq(("/$", false))) == false)
    assert(verdict("/x", Seq(("/$", false))) == true)
    // star-only pattern disallows everything it prefixes (i.e. everything)
    assert(verdict("/whatever", Seq(("*", false))) == false)
    // a literal '*' in the PATH (legal RFC 3986 path char) must not consume
    // the pattern's wildcard: `/a*b$` matches `/a*cb` only via backtrack
    // (r14 advice — literal-equality-before-star recorded no star point)
    assert(verdict("/a*cb", Seq(("/a*b$", false))) == false)
    assert(verdict("/a*c", Seq(("/a*b$", false))) == true)
    assert(verdict("/x*y", Seq(("/x*y$", false))) == false)
  }

  test("crawl-delay: governing group's value in millis, fractional, merged-max, null absent") {
    def delay(txt: String, agent: String): Option[Long] = {
      val r = RobotsExprs.crawlDelayMs(UTF8String.fromString(txt),
        UTF8String.fromString(agent))
      if (r == null) None else Some(r.longValue())
    }
    val txt =
      """User-agent: slow
        |Crawl-delay: 2.5
        |Disallow: /x
        |
        |User-agent: *
        |Crawl-delay: 1
        |
        |User-agent: *
        |Crawl-delay: 3
        |""".stripMargin
    assert(delay(txt, "slowbot") == Some(2500L))
    // the two merged * groups: conservative max
    assert(delay(txt, "otherbot") == Some(3000L))
    // absent / unparseable -> null; a crawl-delay does NOT break its group
    assert(delay("User-agent: a\nDisallow: /x\n", "a") == None)
    assert(delay("User-agent: a\nCrawl-delay: soon\n", "a") == None)
    assert(rules("User-agent: a\nCrawl-delay: 1\nDisallow: /x\n", "a") ==
      Seq(("/x", false)))
    // column/codegen form, null-safe
    val df = Seq((txt, "otherbot"), ("User-agent: a\nDisallow: /\n", "a"))
      .toDF("t", "ua")
    assert(df.select(RobotsExprs.robotsCrawlDelayMs(col("t"), col("ua")))
      .as[Option[Long]].collect().toSeq == Seq(Some(3000L), None))
  }

  test("sitemaps: non-group records in file order, comments stripped, dups kept") {
    val arr = RobotsExprs.sitemaps(UTF8String.fromString(robotsTxt))
    assert((0 until arr.numElements()).map(arr.getUTF8String(_).toString) ==
      Seq("https://x.test/sitemap.xml"))
    val multi = RobotsExprs.sitemaps(UTF8String.fromString(
      "SITEMAP: https://a.test/1.xml # c\nUser-agent: *\n" +
        "sitemap: https://a.test/2.xml\nSitemap: https://a.test/1.xml\n" +
        "Sitemap:\n"))
    assert((0 until multi.numElements()).map(multi.getUTF8String(_).toString) ==
      Seq("https://a.test/1.xml", "https://a.test/2.xml",
        "https://a.test/1.xml"))
  }

  test("column forms evaluate in-plane and under codegen") {
    val df = Seq(
      ("/private/ok/page", robotsTxt),
      ("/private/secret", robotsTxt),
      ("/open", robotsTxt))
      .toDF("path", "robots")
    val out2 = df
      .withColumn("r", RobotsExprs.robotsRules(col("robots"),
        lit("bigcrawler")))
      .select(col("path"), RobotsExprs.robotsAllowed(col("path"),
        expr("transform(r, x -> x.pattern)"),
        expr("transform(r, x -> x.allow)")).as("ok"))
      .orderBy(col("path"))
      .as[(String, Boolean)].collect().toSeq
    assert(out2 == Seq(
      ("/open", true),
      ("/private/ok/page", true),
      ("/private/secret", false)))
  }
}
