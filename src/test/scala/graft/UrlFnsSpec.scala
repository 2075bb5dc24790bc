package graft

import graft.functions.UrlFns
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization kernels: the rule surface, the lenient non-URL
  * passthrough, and the codegen/SQL contracts. */
class UrlFnsSpec extends SparkSpec {
  import spark.implicits._

  private def n(u: String): String =
    UrlFns.normalize(UTF8String.fromString(u)).toString
  private def h(u: String): String = {
    val r = UrlFns.host(UTF8String.fromString(u))
    if (r == null) null else r.toString
  }

  test("scheme/host lower; default ports strip; real ports keep") {
    assert(n("HTTP://Example.COM/a") == "http://example.com/a")
    assert(n("http://example.com:80/a") == "http://example.com/a")
    assert(n("https://example.com:443/a") == "https://example.com/a")
    assert(n("http://example.com:8080/a") == "http://example.com:8080/a")
    assert(n("https://example.com:80/a") == "https://example.com:80/a",
      ":80 is NOT https' default")
    assert(n("HTTP://EXAMPLE.COM") == "http://example.com/")
  }

  test("fragments drop; tracking params drop; order and case of the rest keep") {
    assert(n("http://e.com/a#section") == "http://e.com/a")
    assert(n("http://e.com/a?utm_source=x&q=1&UTM_medium=y") ==
      "http://e.com/a?q=1")
    assert(n("http://e.com/a?q=1&fbclid=abc&b=2") == "http://e.com/a?q=1&b=2")
    assert(n("http://e.com/a?utm_source=x") == "http://e.com/a")
    assert(n("http://e.com/a?B=2&a=1") == "http://e.com/a?B=2&a=1",
      "param order/case preserved")
    assert(n("http://e.com/CaseyPath/X") == "http://e.com/CaseyPath/X")
    assert(n("http://e.com/a?gclid=1#f") == "http://e.com/a")
  }

  test("lenient: non-URLs pass through; hosts resolve or null") {
    assert(n("not a url at all") == "not a url at all")
    assert(n("") == "")
    assert(h("not a url") == null)
    assert(h("HTTP://Example.COM:8080/x?q=1") == "example.com")
    assert(h("http://[::1]:8080/x") == "[::1]")
    assert(h("http://[::1]/x") == "[::1]")
    assert(h("http://e.com") == "e.com")
  }

  test("bracketed IPv6 authorities: the default-port strip applies outside brackets only") {
    // a colon INSIDE the bracketed literal is never a port separator — the
    // strip must not truncate inside the brackets (r13 advice: the corrupted
    // url_norm poisons the xxhash64 doc ids derived from it)
    assert(n("http://[2001:db8::80]/x") == "http://[2001:db8::80]/x")
    assert(n("https://[2001:db8::443]/x") == "https://[2001:db8::443]/x")
    assert(n("HTTP://[2001:DB8::80]") == "http://[2001:db8::80]/")
    // unterminated-bracket garbage (the case where endsWith(":80") CAN be
    // true with the colon inside the literal) passes through un-mangled
    assert(n("http://[2001:db8::80/x") == "http://[2001:db8::80/x")
    assert(n("HTTPS://[2001:db8::443") == "https://[2001:db8::443/")
    // a REAL default port after the brackets still strips
    assert(n("http://[::1]:80/x") == "http://[::1]/x")
    assert(n("https://[::1]:443/x") == "https://[::1]/x")
    assert(n("http://[::1]:8080/x") == "http://[::1]:8080/x")
  }

  test("codegen column forms ≡ interpreted; SQL registration; null host type") {
    val battery = Seq("HTTP://A.COM:80/x?utm_source=1&q=2#f",
      "https://B.org:443", "junk", "", "http://c.net:9/Y?fbclid=z")
    val df = battery.toDF("u")
    assert(df.select(UrlFns.urlNormalize($"u")).as[String].collect().toSeq ==
      battery.map(n))
    assert(df.select(UrlFns.urlHost($"u")).as[Option[String]].collect().toSeq ==
      battery.map(u => Option(h(u))))
    UrlFns.register(spark)
    df.createOrReplaceTempView("url_battery")
    assert(spark.sql("SELECT url_normalize(u), url_host(u) FROM url_battery")
      .as[(String, Option[String])].collect().toSeq ==
      battery.map(u => (n(u), Option(h(u)))))
  }

  private def res(base: String, href: String): String = {
    val r = UrlFns.resolve(UTF8String.fromString(base),
      UTF8String.fromString(href))
    if (r == null) null else r.toString
  }

  test("resolve: absolute only when the scheme colon precedes any /?#") {
    // a RELATIVE href whose query embeds a URL must resolve against the
    // base, not pass through as 'absolute' (r14 advice: the bare
    // contains(\"://\") check lost these edges to the http(s) filter)
    assert(res("http://e.com/dir/page", "/redirect?to=https://x.com") ==
      "http://e.com/redirect?to=https://x.com")
    assert(res("http://e.com/dir/page", "a?u=http://y.org/z") ==
      "http://e.com/dir/a?u=http://y.org/z")
    assert(res("http://e.com/p", "#frag?fake=https://x.com") ==
      "http://e.com/p")
    // genuinely absolute and non-hierarchical hrefs still pass through
    assert(res("http://e.com/p", "https://other.net/q") ==
      "https://other.net/q")
    assert(res("http://e.com/p", "mailto:a@b.c") == "mailto:a@b.c")
  }

  test("resolve: null-safe under WHOLE-STAGE CODEGEN for authority-less bases") {
    // resolve() returns null for a base with no '://' even when both inputs
    // are non-null — defineCodeGen left isNull=false and the UnsafeRow
    // writer NPE'd on the first garbage WARC-Target-URI (r14 advice, high).
    // The filter + downstream normalize force the codegen path end to end.
    val rows = Seq(("garbage-uri", "/a"), ("http://e.com/d/p", "x"),
      ("also bad", "rel/y"), ("http://f.org", "//cdn.h.io/z"))
      .toDF("base", "href")
    val out = rows
      .select(UrlFns.urlNormalize(
        UrlFns.urlResolve($"base", $"href")).as("dst"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(None, Some("http://e.com/d/x"), None,
      Some("http://cdn.h.io/z")))
  }
}
