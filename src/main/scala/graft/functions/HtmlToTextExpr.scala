package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: deterministic HTML→text extraction — the
  * operator that sits between a raw web capture (`io.Warc` response records,
  * HTTP media type `text/html`) and the curation pipeline's `text` contract.
  * WET files exist precisely because this step is needed; with it, the
  * engine ingests raw `.warc.gz` captures end-to-end instead of markup soup
  * flowing through every quality gate (r12 verdict #2).
  *
  * One compiled pass over the chars, zero regex, zero DOM. The semantics
  * are deliberately closed-form (DuckDB re-derives the expected output for
  * q126 — any drift turns the row red):
  *
  *  1. `<script>`/`<style>` elements drop WHOLE — tag, raw-text content
  *     (HTML5 raw-text rules: content runs to the matching case-insensitive
  *     close tag; a `<p>` inside a script string is data, not markup), and
  *     close tag.
  *  2. Comments (`<!-- … -->`), markup declarations (`<!DOCTYPE …>`), and
  *     processing instructions (`<? … >`) drop whole.
  *  3. Every other tag becomes one whitespace — quote-aware: a `>` inside a
  *     quoted attribute value (`href="x>y"`) does not end the tag.
  *  4. Character references decode: the five XML named entities plus
  *     `&nbsp;` (→ plain space, so it collapses like any whitespace) and
  *     numeric `&#NN;` / `&#xHH;` (full astral range via code points).
  *     Unrecognized `&…` stays literal — web text is full of bare
  *     ampersands.
  *  5. Whitespace collapses to single spaces, leading/trailing trimmed —
  *     the same Java `\s` class `NormalizeTextExpr` pins, so the output
  *     composes with every downstream tokenizer unchanged.
  *
  * A stray `<` that does not start a tag (not followed by a letter, `/`,
  * `!` or `?` — e.g. "a < b") stays literal text, as browsers treat it.
  * Unterminated constructs at end-of-input drop the remainder (lenient:
  * truncated captures must not emit half a tag as text). */
case class HtmlToTextExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_to_text requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "html_to_text"

  override def nullSafeEval(input: Any): Any =
    HtmlToTextExpr.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlToTextExpr.extract($c)")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlToTextExpr = copy(child = newChild)
}

object HtmlToTextExpr {

  private[functions] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private[functions] def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** ASCII-only case fold (entity names are ASCII by the HTML grammar) —
    * locale-free by construction, per the LocaleProof kernel rule. */
  private[functions] def asciiLower(s: String): String = {
    val a = s.toCharArray
    var i = 0
    while (i < a.length) {
      val c = a(i)
      if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
      i += 1
    }
    new String(a)
  }

  /** True when `s` holds `name` (ASCII, lowercase) at `at`, case-blind,
    * followed by a tag-name terminator (ws, '>', '/', or end). */
  private[functions] def tagNameAt(s: String, at: Int, name: String): Boolean = {
    if (at + name.length > s.length) return false
    var k = 0
    while (k < name.length) {
      val c = s.charAt(at + k)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (lc != name.charAt(k)) return false
      k += 1
    }
    val j = at + name.length
    j >= s.length || isWs(s.charAt(j)) || s.charAt(j) == '>' || s.charAt(j) == '/'
  }

  /** Index just past the '>' that closes the tag opening at `lt`
    * (quote-aware); `s.length` when unterminated. */
  private[functions] def skipTag(s: String, lt: Int): Int = {
    var i = lt + 1
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    s.length
  }

  /** Index just past the raw-text element (script/style) whose open tag
    * starts at `lt`: past the open tag, then case-blind to `</name`, then
    * past that close tag's '>'. `s.length` when unterminated. */
  private[functions] def skipRawText(s: String, lt: Int, name: String): Int = {
    var i = skipTag(s, lt)
    while (i < s.length) {
      if (s.charAt(i) == '<' && i + 1 < s.length && s.charAt(i + 1) == '/' &&
          tagNameAt(s, i + 2, name))
        return skipTag(s, i)
      i += 1
    }
    s.length
  }

  /** Referenced from generated Java code — must stay public. */
  def extract(input: UTF8String): UTF8String = {
    val s = input.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingWs = false
    def emit(c: Char): Unit =
      if (isWs(c)) pendingWs = true
      else {
        if (pendingWs && sb.length > 0) sb.append(' ')
        pendingWs = false
        sb.append(c)
      }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val next = if (i + 1 < n) s.charAt(i + 1) else 0.toChar
        if (s.regionMatches(i, "<!--", 0, 4)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          pendingWs = true
        } else if (tagNameAt(s, i + 1, "script")) {
          i = skipRawText(s, i, "script"); pendingWs = true
        } else if (tagNameAt(s, i + 1, "style")) {
          i = skipRawText(s, i, "style"); pendingWs = true
        } else if (next == '!' || next == '?') {
          i = skipTag(s, i); pendingWs = true
        } else if (isAsciiLetter(next) || next == '/') {
          i = skipTag(s, i); pendingWs = true
        } else { emit('<'); i += 1 }
      } else if (c == '&') {
        val semi = {
          // a reference fits in a short window; a ';' further away means
          // this '&' is plain text
          var j = i + 1
          val lim = math.min(n, i + 12)
          while (j < lim && s.charAt(j) != ';') j += 1
          if (j < lim && j < n && s.charAt(j) == ';') j else -1
        }
        var consumed = false
        if (semi > i + 1) {
          val body = s.substring(i + 1, semi)
          if (body.charAt(0) == '#') {
            val num = body.substring(1)
            val cp =
              try {
                if (num.nonEmpty && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
                  Integer.parseInt(num.substring(1), 16)
                else Integer.parseInt(num)
              } catch { case _: NumberFormatException => -1 }
            if (cp >= 0 && cp <= 0x10FFFF &&
                !(cp >= 0xD800 && cp <= 0xDFFF)) {
              if (cp < 0x10000) emit(cp.toChar)
              else {
                // astral: emit both surrogate halves as non-ws text
                if (pendingWs && sb.length > 0) sb.append(' ')
                pendingWs = false
                sb.appendCodePoint(cp)
              }
              consumed = true
            }
          } else asciiLower(body) match {
            case "amp" => emit('&'); consumed = true
            case "lt" => emit('<'); consumed = true
            case "gt" => emit('>'); consumed = true
            case "quot" => emit('"'); consumed = true
            case "apos" => emit('\''); consumed = true
            case "nbsp" => pendingWs = true; consumed = true
            case _ => ()
          }
        }
        if (consumed) i = semi + 1
        else { emit('&'); i += 1 }
      } else { emit(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      HtmlToTextExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Register as a SQL function: `SELECT html_to_text(x)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "html_to_text", exprs => HtmlToTextExpr(exprs.head), "built-in")
}
