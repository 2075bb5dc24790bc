package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: MAIN-text extraction — [[HtmlToTextExpr]]'s
  * tag/entity machinery plus BLOCK-level boilerplate classification, the
  * reason WET files still carry "Home About Contact" navigation soup and
  * real curation pipelines run a block scorer (jusText/trafilatura family).
  * Deterministic and closed-form by design so the q128/q133 oracles can
  * re-derive the expected output in DuckDB.
  *
  * Semantics:
  *  1. The page is cut into BLOCKS at block-level tag boundaries (open or
  *     close of p/div/section/article/li/ul/ol/table/tr/td/th/h1-h6/
  *     blockquote/pre/br/hr/nav/header/footer/aside/form/body/head/html/
  *     title/main/figure — the HTML5 flow-content cut set). Inline tags
  *     (a/b/i/span/em/strong/…) do NOT cut; they become whitespace exactly
  *     as in [[HtmlToTextExpr]].
  *  2. Within a block, text extracts with the identical rules as
  *     `html_to_text` (script/style/comment drop, entity decode, whitespace
  *     collapse) — PLUS the chars contributed inside `<a>…</a>` are counted
  *     as LINK text (nesting-safe), and each completed word is checked
  *     against the stopword list (ASCII-case-folded exact token match).
  *  3. With an EMPTY stopword list (the pre-r14 surface, q128): a block is
  *     boilerplate and drops when it has fewer than `minWords` words or
  *     link density > `maxLinkDensityE6`/10⁶ (density = link non-space
  *     chars / total non-space chars).
  *  4. With a stopword list (r14): the jusText four-class scheme
  *     (Pomikálek 2011), integer-exact with word counts standing in for
  *     jusText's char lengths (documented divergence — words are what the
  *     engine's other rules count):
  *       - link density > max                        → BAD
  *       - words < minWords                          → BAD if any link
  *                                                     chars else SHORT
  *       - stop density ≥ stopHighE6/10⁶             → GOOD if words >
  *                                                     lenHighWords else
  *                                                     NEARGOOD
  *       - stop density ≥ stopLowE6/10⁶              → NEARGOOD
  *       - else                                      → BAD
  *     (stop density = stopword tokens / words — a block dense in function
  *     words is REAL TEXT regardless of length.) Then ONE context pass
  *     against the context-free GOOD/BAD neighbors (page edges count BAD):
  *       - SHORT    → GOOD iff the nearest GOOD/BAD block on BOTH sides is
  *                    GOOD (short-but-real paragraphs between good prose
  *                    are rescued), else BAD
  *       - NEARGOOD → GOOD iff the nearest GOOD/BAD block on EITHER side
  *                    is GOOD, else BAD (fluent-looking boilerplate in a
  *                    bad neighborhood dies here)
  *     This is jusText's published shape with the neargood-chain tiebreak
  *     simplified to a single deterministic pass — every verdict is a pure
  *     integer function of the block list, which is what makes the q133
  *     oracle possible.
  *  5. Output = kept blocks joined by a single '\n' (line structure feeds
  *     the Gopher line rules downstream).
  *
  * `html_to_text` remains the right call when the WHOLE page is wanted
  * (WET-equivalent extraction); this one is the corpus-quality dial. */
case class HtmlMainTextExpr(child: Expression, minWords: Int,
                            maxLinkDensityE6: Int,
                            stopwords: Seq[String] = Nil,
                            lenHighWords: Int = 10,
                            stopLowE6: Int = 250000,
                            stopHighE6: Int = 450000)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_main_text requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "html_main_text"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    // the SAME fold the match side applies to document tokens (extract
    // lowers via asciiLower) — locale-free by construction, and a config
    // word like "The" folds identically on both sides
    stopwords.foreach(w => h.add(HtmlToTextExpr.asciiLower(w)))
    h
  }

  override def nullSafeEval(input: Any): Any =
    HtmlMainTextExpr.extract(input.asInstanceOf[UTF8String], minWords,
      maxLinkDensityE6, stopSet, lenHighWords, stopLowE6, stopHighE6)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HtmlMainTextExpr.extract($c, $minWords, " +
        s"$maxLinkDensityE6, $setRef, $lenHighWords, $stopLowE6, $stopHighE6)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HtmlMainTextExpr = copy(child = newChild)
}

/** Per-LANGUAGE jusText (r14 verdict #6): `html_main_text_by_lang(html,
  * lang)` — jusText's stopword-density classes are only meaningful against
  * the language's OWN function words (the paper ships one stopword list
  * per language; a French page measured against an English list scores
  * every content block stopword-free and drops it). This is the q132
  * strata pattern applied to extraction: ONE kernel, the row's `lang`
  * column selects its list in-row — no per-language job loop, no shuffle.
  * Langs with no configured list (or a null-safe-missed lang) fall back to
  * `fallback` (empty = the legacy two-rule surface). Dials are shared
  * across languages; per-lang thresholds belong in curation
  * (`min_words_by_lang`), not extraction. */
case class HtmlMainTextByLangExpr(left: Expression, right: Expression,
                                  stopwordsByLang: Map[String, Seq[String]],
                                  fallback: Seq[String] = Nil,
                                  minWords: Int = 5,
                                  maxLinkDensityE6: Int = 500000,
                                  lenHighWords: Int = 10,
                                  stopLowE6: Int = 250000,
                                  stopHighE6: Int = 450000)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_main_text_by_lang requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = StringType
  override def prettyName: String = "html_main_text_by_lang"

  @transient private lazy val setsRef:
      java.util.HashMap[String, java.util.HashSet[String]] = {
    val m = new java.util.HashMap[String, java.util.HashSet[String]]()
    stopwordsByLang.foreach { case (l, ws) =>
      val h = new java.util.HashSet[String]()
      ws.foreach(w => h.add(HtmlToTextExpr.asciiLower(w)))
      m.put(l, h)
    }
    m
  }
  @transient private lazy val fallbackSet: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    fallback.foreach(w => h.add(HtmlToTextExpr.asciiLower(w)))
    h
  }

  // NOT null-safe on `lang`: a null lang routes to the fallback list (the
  // documented contract) instead of dropping the page's text outright —
  // the default BinaryExpression null-safety would return NULL and lose
  // the whole document over a missing language tag. A null `html` is
  // still NULL (there is nothing to extract).
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val html = left.eval(input)
    if (html == null) null
    else {
      val lang = right.eval(input)
      HtmlMainTextExpr.extractByLang(html.asInstanceOf[UTF8String],
        if (lang == null) null else lang.asInstanceOf[UTF8String],
        setsRef, fallbackSet, minWords, maxLinkDensityE6, lenHighWords,
        stopLowE6, stopHighE6)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsR = ctx.addReferenceObj("setsByLang", setsRef,
      "java.util.HashMap")
    val fbR = ctx.addReferenceObj("fallbackSet", fallbackSet,
      "java.util.HashSet")
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val langVar = ctx.freshName("graftLang")
    ev.copy(code =
      code"""
        ${leftGen.code}
        boolean ${ev.isNull} = true;
        UTF8String ${ev.value} = null;
        if (!${leftGen.isNull}) {
          ${rightGen.code}
          UTF8String $langVar = ${rightGen.isNull} ? null : ${rightGen.value};
          ${ev.value} = graft.functions.HtmlMainTextExpr.extractByLang(
            ${leftGen.value}, $langVar, $setsR, $fbR, $minWords,
            $maxLinkDensityE6, $lenHighWords, $stopLowE6, $stopHighE6);
          ${ev.isNull} = false;
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HtmlMainTextByLangExpr =
    copy(left = newLeft, right = newRight)
}

object HtmlMainTextExpr {

  /** Referenced from generated Java code — must stay public: the per-lang
    * dispatch in front of [[extract]]. A null `lang` (the language prober
    * abstained) routes to the fallback list, same as an unconfigured
    * language. */
  def extractByLang(html: UTF8String, lang: UTF8String,
                    sets: java.util.HashMap[String, java.util.HashSet[String]],
                    fallback: java.util.HashSet[String], minWords: Int,
                    maxLinkDensityE6: Int, lenHighWords: Int,
                    stopLowE6: Int, stopHighE6: Int): UTF8String = {
    val s = if (lang == null) null else sets.get(lang.toString)
    extract(html, minWords, maxLinkDensityE6,
      if (s == null) fallback else s, lenHighWords, stopLowE6, stopHighE6)
  }

  /** HTML5 flow-content tags that CUT a block. Sorted-set membership over
    * ASCII-folded names. */
  private val BlockTags: Set[String] = Set(
    "p", "div", "section", "article", "li", "ul", "ol", "table", "tr",
    "td", "th", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
    "br", "hr", "nav", "header", "footer", "aside", "form", "body",
    "head", "html", "title", "main", "figure")

  // context-free block classes
  private final val Bad = 0
  private final val Short = 1
  private final val NearGood = 2
  private final val Good = 3

  private final class Block(val text: String, val words: Long,
                            val chars: Long, val linkChars: Long,
                            val stopHits: Long)

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def asciiLower(s: String): String = {
    val a = s.toCharArray
    var i = 0
    while (i < a.length) {
      val c = a(i)
      if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
      i += 1
    }
    new String(a)
  }

  private def tagNameAt(s: String, at: Int, name: String): Boolean = {
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

  /** The ASCII-folded element name starting at `at` (just past '<' or
    * '</'); empty when none. */
  private def readTagName(s: String, at: Int): String = {
    var j = at
    while (j < s.length && (isAsciiLetter(s.charAt(j)) ||
      (s.charAt(j) >= '0' && s.charAt(j) <= '9'))) j += 1
    if (j == at) "" else asciiLower(s.substring(at, j))
  }

  private def skipTag(s: String, lt: Int): Int = {
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

  private def skipRawText(s: String, lt: Int, name: String): Int = {
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
  def extract(input: UTF8String, minWords: Int, maxLinkDensityE6: Int,
              stopSet: java.util.HashSet[String], lenHighWords: Int,
              stopLowE6: Int, stopHighE6: Int): UTF8String = {
    val s = input.toString
    val n = s.length
    val blocks = new scala.collection.mutable.ArrayBuffer[Block]()
    // current block state
    val block = new java.lang.StringBuilder(256)
    var pendingWs = false
    var words = 0L
    var chars = 0L      // non-space chars in the block
    var linkChars = 0L  // non-space chars contributed inside <a>…</a>
    var linkDepth = 0
    var stopHits = 0L
    var wordStart = 0   // builder offset where the in-progress word began
    def endWord(): Unit =
      if (block.length() > wordStart) {
        if (!stopSet.isEmpty &&
            stopSet.contains(asciiLower(block.substring(wordStart))))
          stopHits += 1
        wordStart = block.length()
      }
    def emit(c: Char): Unit =
      if (isWs(c)) pendingWs = true
      else {
        if (pendingWs && block.length > 0) { endWord(); block.append(' ') }
        if (pendingWs || block.length == 0) { words += 1; wordStart = block.length() }
        pendingWs = false
        block.append(c)
        chars += 1
        if (linkDepth > 0) linkChars += 1
      }
    def cutBlock(): Unit = {
      endWord()
      if (block.length > 0)
        blocks += new Block(block.toString, words, chars, linkChars, stopHits)
      block.setLength(0)
      pendingWs = false
      words = 0L; chars = 0L; linkChars = 0L; stopHits = 0L; wordStart = 0
      // linkDepth survives a cut: an <a> spanning a block boundary keeps
      // counting (malformed but common markup)
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
          val nameAt = if (next == '/') i + 2 else i + 1
          val name = readTagName(s, nameAt)
          if (name == "a") {
            if (next == '/') { if (linkDepth > 0) linkDepth -= 1 }
            else linkDepth += 1
          }
          if (BlockTags.contains(name)) cutBlock()
          i = skipTag(s, i)
          pendingWs = true
        } else { emit('<'); i += 1 }
      } else if (c == '&') {
        val semi = {
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
                if (pendingWs && block.length > 0) { endWord(); block.append(' ') }
                if (pendingWs || block.length == 0) { words += 1; wordStart = block.length() }
                pendingWs = false
                block.appendCodePoint(cp)
                chars += 2
                if (linkDepth > 0) linkChars += 2
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
    cutBlock()

    val out = new java.lang.StringBuilder(n)
    def keep(b: Block): Unit = {
      if (out.length > 0) out.append('\n')
      out.append(b.text)
    }
    if (stopSet.isEmpty) {
      // legacy two-rule surface (q128): word floor + link density
      var k = 0
      while (k < blocks.length) {
        val b = blocks(k)
        if (b.words >= minWords &&
            b.linkChars * 1000000L <= maxLinkDensityE6.toLong * b.chars)
          keep(b)
        k += 1
      }
    } else {
      // jusText four-class scheme (scaladoc §4), all integer arithmetic
      val m = blocks.length
      val cls = new Array[Int](m)
      var k = 0
      while (k < m) {
        val b = blocks(k)
        cls(k) =
          if (b.linkChars * 1000000L > maxLinkDensityE6.toLong * b.chars) Bad
          else if (b.words < minWords) { if (b.linkChars > 0) Bad else Short }
          else if (b.stopHits * 1000000L >= stopHighE6.toLong * b.words) {
            if (b.words > lenHighWords) Good else NearGood
          }
          else if (b.stopHits * 1000000L >= stopLowE6.toLong * b.words)
            NearGood
          else Bad
        k += 1
      }
      // nearest context-free GOOD/BAD neighbor on each side; edges are BAD
      val prevCtx = new Array[Int](m)
      val nextCtx = new Array[Int](m)
      var carry = Bad
      k = 0
      while (k < m) {
        prevCtx(k) = carry
        if (cls(k) == Good || cls(k) == Bad) carry = cls(k)
        k += 1
      }
      carry = Bad
      k = m - 1
      while (k >= 0) {
        nextCtx(k) = carry
        if (cls(k) == Good || cls(k) == Bad) carry = cls(k)
        k -= 1
      }
      k = 0
      while (k < m) {
        val resolved = cls(k) match {
          case Short =>
            if (prevCtx(k) == Good && nextCtx(k) == Good) Good else Bad
          case NearGood =>
            if (prevCtx(k) == Good || nextCtx(k) == Good) Good else Bad
          case c => c
        }
        if (resolved == Good) keep(blocks(k))
        k += 1
      }
    }
    UTF8String.fromString(out.toString)
  }

  /** Column form with the paper-default dials. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    apply(c, 5, 500000)

  def apply(c: org.apache.spark.sql.Column, minWords: Int,
            maxLinkDensityE6: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      HtmlMainTextExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c),
        minWords, maxLinkDensityE6))

  /** Column form with the full jusText dial set (stopwords enable the
    * four-class + context scheme). */
  def apply(c: org.apache.spark.sql.Column, minWords: Int,
            maxLinkDensityE6: Int, stopwords: Seq[String],
            lenHighWords: Int, stopLowE6: Int,
            stopHighE6: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      HtmlMainTextExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c),
        minWords, maxLinkDensityE6, stopwords, lenHighWords, stopLowE6,
        stopHighE6))

  /** Register as SQL: `html_main_text(x[, minWords, maxLinkDensityE6])`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "html_main_text", exprs => {
        val mw = if (exprs.length > 1)
          exprs(1).eval().asInstanceOf[Number].intValue() else 5
        val ld = if (exprs.length > 2)
          exprs(2).eval().asInstanceOf[Number].intValue() else 500000
        HtmlMainTextExpr(exprs.head, mw, ld)
      }, "built-in")
}
