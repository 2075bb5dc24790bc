package graft

import graft.functions.{HtmlMainTextExpr, HtmlToTextExpr, TextFns}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Main-text extraction kernel: block cutting, link-density accounting,
  * word-count floor — and the codegen/interpreted + SQL contracts. */
class HtmlMainTextSpec extends SparkSpec {
  import spark.implicits._

  private def x(html: String, minWords: Int = 5,
                maxLd: Int = 500000): String =
    HtmlMainTextExpr.extract(UTF8String.fromString(html), minWords, maxLd,
      new java.util.HashSet[String](), 10, 250000, 450000).toString

  test("content blocks keep, boilerplate blocks drop") {
    val page =
      "<html><head><title>graft capture</title></head><body>" +
        "<nav><a>Home</a> <a>About</a> <a>Contact</a> <a>Careers</a> " +
        "<a>Blog</a> <a>Press</a></nav>" +
        "<h1>Too short head</h1>" +
        "<p>this paragraph has plenty of honest words in it</p>" +
        "<p>Read the full story at <a>this link</a> now please</p>" +
        "<footer><a>terms of service</a> <a>privacy policy notice</a></footer>" +
        "</body></html>"
    assert(x(page) ==
      "this paragraph has plenty of honest words in it\n" +
        "Read the full story at this link now please")
  }

  test("word-count floor is exact: five words keep, four drop") {
    assert(x("<p>one two three four five</p>") == "one two three four five")
    assert(x("<p>one two three four</p>") == "")
    assert(x("<p>one two three four</p>", minWords = 4) == "one two three four")
  }

  test("link density is exact at the boundary: equal keeps, above drops") {
    // 15 link non-space chars of 30 total = exactly 0.5 -> keep (6 words)
    assert(x("<p><a>abcde fghij klmno</a> pqrst uvwxy zabcd</p>") ==
      "abcde fghij klmno pqrst uvwxy zabcd", "exactly-at-dial must keep")
    // 20 of 30 = 0.667 -> drop
    assert(x("<p><a>abcde fghij klmno pqrst</a> uvwxy zabcd</p>") == "")
    // same block at a raised dial keeps
    assert(x("<p><a>abcde fghij klmno pqrst</a> uvwxy zabcd</p>",
      maxLd = 700000) == "abcde fghij klmno pqrst uvwxy zabcd")
  }

  test("nested and block-spanning anchors count correctly") {
    // nested <a> (malformed but real): depth-counted, no double count
    assert(x("<p><a><a>abcde</a> fghij</a> klmno pqrst uvwxy</p>") ==
      "abcde fghij klmno pqrst uvwxy") // 10 link of 25 = 0.4 -> keep
    // an <a> left open across a block cut keeps counting into the next block
    assert(x("<div><a>abcde fghij</div><div>klmno pqrst uvwxy</a> one two</div>") ==
      "") // block2: 15 link chars of 21 = 0.71 -> drop; block1: 2 words -> drop
  }

  test("br/hr cut blocks; inline tags do not") {
    assert(x("<p>alpha beta gamma delta epsilon<br>one two</p>") ==
      "alpha beta gamma delta epsilon")
    assert(x("<p>alpha <b>beta</b> gamma <span>delta</span> epsilon</p>") ==
      "alpha beta gamma delta epsilon")
  }

  test("script/style/comments drop inside blocks; entities decode") {
    assert(x("<p>alpha &amp; beta<script>x = \"<p>no</p>\";</script> gamma " +
      "delta epsilon</p>") == "alpha & beta gamma delta epsilon")
    assert(x("<p>a&#32;b c d e f g</p>") == "a b c d e f g")
  }

  test("whole-page degenerate inputs") {
    assert(x("") == "")
    assert(x("plain text with no markup at all here") ==
      "plain text with no markup at all here")
    assert(x("<p></p><div></div>") == "")
  }

  test("codegen column form ≡ interpreted; SQL registration with dials") {
    val battery = Seq(
      "<p>one two three four five</p>",
      "<nav><a>Home</a> <a>About</a> <a>Contact</a> <a>Careers</a> <a>Blog</a> <a>Press</a></nav>",
      "<p>Read at <a>link</a> here now please ok</p>", "", "no tags at all here five")
    val df = battery.toDF("h")
    val viaCol = df.select(TextFns.htmlMainText($"h")).as[String].collect().toSeq
    assert(viaCol == battery.map(x(_)))
    HtmlMainTextExpr.register(spark)
    df.createOrReplaceTempView("main_battery")
    assert(spark.sql("SELECT html_main_text(h) FROM main_battery")
      .as[String].collect().toSeq == battery.map(x(_)))
    assert(spark.sql("SELECT html_main_text(h, 2, 500000) FROM main_battery")
      .as[String].collect().toSeq == battery.map(x(_, minWords = 2)))
  }

  // ---- jusText four-class scheme (r14: stopword density + context) ----

  private val stops = Seq("the", "a", "an", "and", "of", "to", "in", "it",
    "was", "is", "for", "on", "with", "that")

  private def xj(html: String): String = {
    val set = new java.util.HashSet[String]()
    stops.foreach(set.add)
    HtmlMainTextExpr.extract(UTF8String.fromString(html), 5, 500000,
      set, 10, 250000, 450000).toString
  }

  private val good = "the cat sat on the mat and the dog lay in the sun today"
  private val zeroStop = "buy cheap deals now best offers sale discount here"

  test("jusText mode: stopword-dense blocks are real text, zero-stopword prose is boilerplate") {
    // the long zero-stopword block passed the LEGACY rules (>= 5 words, no
    // links) but dies under the stopword rule — the fluent-boilerplate flip
    assert(x(s"<p>$zeroStop</p>") == zeroStop)
    assert(xj(s"<p>$zeroStop</p>") == "")
    // stopword-dense long block is GOOD standalone
    assert(xj(s"<p>$good</p>") == good)
    // stopword-dense SHORT-ish block (<= lenHigh words) is only NEARGOOD:
    // alone on a page (edges are BAD) it dies; next to a GOOD block it lives
    val dense7 = "it was the best of the worst"
    assert(xj(s"<p>$dense7</p>") == "")
    assert(xj(s"<p>$good</p><p>$dense7</p>") == s"$good\n$dense7")
  }

  test("jusText mode: SHORT blocks rescue between GOOD neighbors only") {
    val short4 = "It was so good"
    // GOOD | SHORT | GOOD -> rescued
    assert(xj(s"<p>$good</p><p>$short4</p><p>$good</p>") ==
      s"$good\n$short4\n$good")
    // BAD | SHORT | GOOD -> mixed neighborhood, dies
    assert(xj(s"<p>$zeroStop</p><p>$short4</p><p>$good</p>") == good)
    // page edge counts BAD: SHORT at the start dies even before GOOD
    assert(xj(s"<p>$short4</p><p>$good</p>") == good)
  }

  test("jusText mode: NEARGOOD lives next to GOOD, dies between BADs") {
    val nearGood = "please sign up for our newsletter to get the latest updates"
    // between BADs (fluent-looking boilerplate in a bad neighborhood): dies
    assert(xj(s"<p>$zeroStop</p><p>$nearGood</p><p>$zeroStop</p>") == "")
    // after a GOOD block: lives (either-side rule)
    assert(xj(s"<p>$good</p><p>$nearGood</p>") == s"$good\n$nearGood")
    // link-dense blocks stay BAD regardless of stopword density
    val linky = "read all of it at <a>the page of the day with the story</a>"
    assert(xj(s"<p>$good</p><p>$linky</p>") == good)
  }

  test("kept-everything page equals html_to_text modulo block newlines") {
    // a page with ONLY good blocks: main-text == whole-page extraction with
    // '\n' where the block cuts are
    val page = "<p>alpha beta gamma delta epsilon</p>" +
      "<p>zeta eta theta iota kappa</p>"
    val whole = HtmlToTextExpr.extract(UTF8String.fromString(page)).toString
    assert(x(page).replace('\n', ' ') == whole)
  }

  test("by-lang: a NULL lang routes to the fallback list, not a NULL page") {
    val en = Seq("the", "and", "of", "in", "on", "it", "was")
    val page = s"<p>$good</p><p>$zeroStop</p>"
    val rows = Seq((1L, page, "en"), (2L, page, null: String),
        (3L, null: String, "en"))
      .toDF("id", "html", "lang")
    val out = rows.select($"id",
        TextFns.htmlMainTextJustextByLang($"html", $"lang",
          Map("xx" -> Seq("zzz")), fallback = en, minWords = 5,
          maxLinkDensityE6 = 500000, lenHighWords = 10,
          stopLowE6 = 250000, stopHighE6 = 450000).as("main"))
      .orderBy($"id").as[(Long, String)].collect()
    // "en" has no configured list -> fallback; NULL lang -> the SAME
    // fallback route (the prober abstained, the page must not drop)
    assert(out(0)._2 == good && out(1)._2 == good)
    // a NULL page stays NULL: nothing to extract
    assert(out(2)._2 == null)
    // interpreted expression agrees with the codegen route
    val expr = graft.functions.HtmlMainTextByLangExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(page),
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.StringType),
      Map("xx" -> Seq("zzz")), fallback = en)
    assert(expr.eval(null).toString == good)
  }
}
