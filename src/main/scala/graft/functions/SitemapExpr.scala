package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Sitemap-protocol parser (sitemaps.org — the crawl frontier's EXPANSION
  * step): `sitemap_entries(body)` → the URLs a fetched sitemap declares.
  * [[graft.operators.LinkGraph.frontier]] discovers sitemap URLs from
  * robots.txt; once those bodies are fetched, THIS kernel turns them into
  * frontier candidates — including nested `<sitemapindex>` children, which
  * are themselves fetchable (`kind = "sitemap"`).
  *
  * The three shapes real sites ship:
  *  - `<urlset>` … `<url><loc>u</loc><lastmod>d</lastmod></url>` —
  *    `kind = "url"`, lastmod carried when present (incremental recrawl
  *    keys on it);
  *  - `<sitemapindex>` … `<sitemap><loc>u</loc></sitemap>` —
  *    `kind = "sitemap"`;
  *  - plain text (no `<` anywhere): one URL per line, http(s) lines only.
  *
  * Deterministic single-pass tag walk: case-blind tag names, XML character
  * references decode in `loc`/`lastmod` (`&amp;` is the legally-required
  * spelling of `&` in a sitemap URL), surrounding whitespace trims,
  * entries without a `<loc>` drop, a `<loc>` outside any `<url>`/
  * `<sitemap>` parent drops (damaged files yield their parseable prefix,
  * never a task failure). Namespace prefixes tolerate (`<sm:loc>` walks
  * to the local name). */
case class SitemapExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sitemap_entries requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = SitemapExpr.schema
  override def prettyName: String = "sitemap_entries"
  override def nullSafeEval(input: Any): Any =
    SitemapExpr.parse(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SitemapExpr.parse($c)")
  override protected def withNewChildInternal(
      newChild: Expression): SitemapExpr = copy(child = newChild)
}

object SitemapExpr {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true),
    StructField("kind", StringType, nullable = false))),
    containsNull = false)

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

  private def row(loc: String, lastmod: String, kind: String): AnyRef =
    new GenericInternalRow(Array[Any](UTF8String.fromString(loc),
      if (lastmod == null) null else UTF8String.fromString(lastmod),
      UTF8String.fromString(kind)))

  /** Referenced from generated Java code — must stay public. */
  def parse(input: UTF8String): GenericArrayData = {
    val s = input.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    if (s.indexOf('<') < 0) {
      // plain-text sitemap: one URL per line
      s.split("\n", -1).foreach { raw =>
        val line = raw.trim
        if (line.startsWith("http://") || line.startsWith("https://"))
          out += row(line, null, "url")
      }
      return new GenericArrayData(out.toArray)
    }
    val n = s.length
    var i = 0
    var kind: String = null     // inside <url> or <sitemap>?
    var loc: String = null
    var lastmod: String = null
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0) i = n
      else {
        // read the tag name: optional '/', then letters/digits/':'/'-',
        // stop at ws or '>' or '/'
        var j = lt + 1
        val closing = j < n && s.charAt(j) == '/'
        if (closing) j += 1
        val nameStart = j
        while (j < n && s.charAt(j) != '>' && s.charAt(j) != ' ' &&
          s.charAt(j) != '\t' && s.charAt(j) != '\n' && s.charAt(j) != '\r' &&
          s.charAt(j) != '/') j += 1
        val rawName = asciiLower(s.substring(nameStart, j))
        // namespace prefix tolerates: walk to the local name
        val name = rawName.lastIndexOf(':') match {
          case -1 => rawName
          case c => rawName.substring(c + 1)
        }
        val gt = s.indexOf('>', j)
        if (gt < 0) { i = n }
        else if (!closing && (name == "url" || name == "sitemap")) {
          kind = name; loc = null; lastmod = null; i = gt + 1
        } else if (closing && (name == "url" || name == "sitemap")) {
          if (kind == name && loc != null && loc.nonEmpty)
            out += row(loc, lastmod, kind)
          kind = null; loc = null; lastmod = null; i = gt + 1
        } else if (!closing && kind != null &&
          (name == "loc" || name == "lastmod")) {
          val end = s.indexOf('<', gt + 1)
          val text = ExtractLinksExpr.decodeRefs(
            s.substring(gt + 1, if (end < 0) n else end).trim)
          if (name == "loc") loc = text else lastmod = text
          i = gt + 1
        } else i = gt + 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SitemapExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Register as SQL: `sitemap_entries(body)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sitemap_entries", exprs => SitemapExpr(exprs.head), "built-in")
}
