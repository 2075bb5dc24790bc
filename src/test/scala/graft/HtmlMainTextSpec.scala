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
    HtmlMainTextExpr.extract(UTF8String.fromString(html), minWords, maxLd)
      .toString

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

  test("kept-everything page equals html_to_text modulo block newlines") {
    // a page with ONLY good blocks: main-text == whole-page extraction with
    // '\n' where the block cuts are
    val page = "<p>alpha beta gamma delta epsilon</p>" +
      "<p>zeta eta theta iota kappa</p>"
    val whole = HtmlToTextExpr.extract(UTF8String.fromString(page)).toString
    assert(x(page).replace('\n', ' ') == whole)
  }
}
