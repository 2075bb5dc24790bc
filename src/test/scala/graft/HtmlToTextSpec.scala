package graft

import graft.functions.{HtmlToTextExpr, TextFns}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** HTML→text extraction kernel: tag stripping, raw-text element skipping,
  * entity decode, whitespace collapse — and the codegen/interpreted
  * equivalence + SQL registration contracts every graft kernel carries. */
class HtmlToTextSpec extends SparkSpec {
  import spark.implicits._

  private def x(html: String): String =
    HtmlToTextExpr.extract(UTF8String.fromString(html)).toString

  test("tags strip to whitespace; text nodes keep; collapse + trim") {
    assert(x("<html><body><h1>Title</h1><p>a b</p></body></html>") == "Title a b")
    assert(x("  <p> padded   text </p>  ") == "padded text")
    assert(x("a<br/>b") == "a b")
    assert(x("no markup at all") == "no markup at all")
    assert(x("") == "")
    assert(x("<p></p>") == "")
  }

  test("script and style drop whole, raw-text rules, case-blind close tags") {
    assert(x("<script>if (1 < 2) { s = \"<p>fake</p>\"; }</script>after") == "after")
    assert(x("<style>p > a { color: red; }</style>kept") == "kept")
    assert(x("a<SCRIPT type='x'>var q = '</div>';</ScRiPt>b") == "a b")
    // unterminated raw text drops the remainder (truncated capture)
    assert(x("before<script>var x = 1;") == "before")
    // scriptx is NOT script — raw-text skip must require a name boundary
    assert(x("<scriptx>shown</scriptx>") == "shown")
  }

  test("comments, declarations, processing instructions drop whole") {
    assert(x("a<!-- hidden <p>ghost</p> -->b") == "a b")
    assert(x("<!DOCTYPE html><p>x</p>") == "x")
    assert(x("<?xml version=\"1.0\"?>y") == "y")
    assert(x("a<!-- unterminated comment") == "a")
  }

  test("quote-aware tag scan: '>' inside attribute values does not end the tag") {
    assert(x("<a href=\"x>y\">link</a>") == "link")
    assert(x("<a href='x>y' title=\"a>b\">z</a>") == "z")
    // unterminated tag at EOF drops (never emits half a tag as text)
    assert(x("text<a href=") == "text")
  }

  test("stray '<' stays literal text") {
    assert(x("a < b and 1<2 is true") == "a < b and 1<2 is true")
    assert(x("<3 hearts") == "<3 hearts")
  }

  test("character references: named, numeric, astral, invalid-stay-literal") {
    assert(x("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") ==
      "a & b <c> \"d\" 'e'")
    assert(x("&#68;&#x6f;&#X63;") == "Doc")
    assert(x("x&nbsp;&nbsp;y") == "x y")             // nbsp collapses as ws
    assert(x("&#128512;") == new String(Character.toChars(0x1F600)))
    assert(x("AT&T and &bogus; and &toolongtobeanentity; stay") ==
      "AT&T and &bogus; and &toolongtobeanentity; stay")
    assert(x("bare & amp") == "bare & amp")
    assert(x("&#xD800; high surrogate stays") == "&#xD800; high surrogate stays")
    assert(x("trailing &amp") == "trailing &amp")
    // entity-decoded '<' is TEXT, not re-parsed markup
    assert(x("&lt;p&gt;not a tag&lt;/p&gt;") == "<p>not a tag</p>")
  }

  test("codegen column form ≡ interpreted extract; SQL registration") {
    val battery = Seq(
      "<html><head><title>T</title><script>a<b</script></head><body>B</body>",
      "plain", "", "a &amp; b", "<p size=\"5>4\">q</p>", "x<!--c-->y",
      "&#x1F600; astral &nbsp; done", "<style>s</style>tail", "a < b",
      "ünïcøde <b>bold</b> &amp; more")
    val df = battery.toDF("h")
    val viaCol = df.select(TextFns.htmlToText($"h")).as[String].collect().toSeq
    assert(viaCol == battery.map(x))
    HtmlToTextExpr.register(spark)
    val viaSql = df.createOrReplaceTempView("html_battery")
    val sql = spark.sql("SELECT html_to_text(h) FROM html_battery")
      .as[String].collect().toSeq
    assert(sql == battery.map(x))
    // null propagates, non-string rejects at analysis
    assert(df.select(TextFns.htmlToText(lit(null).cast("string")))
      .first().isNullAt(0))
  }
}
