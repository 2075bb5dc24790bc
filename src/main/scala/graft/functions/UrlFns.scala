package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization kernels — the other half of crawl-level dedup:
  * the same page is fetched as `HTTP://Example.COM:80/a?utm_source=x#top`
  * and `http://example.com/a`, and a corpus that keys on raw target URIs
  * double-counts it. The C4/CCNet-family normalization, deterministic and
  * closed-form (q129 re-derives it in DuckDB):
  *
  *  - scheme and host ASCII-lowercase (path/query case is significant and
  *    keeps);
  *  - default ports strip (`:80` for http, `:443` for https — other ports
  *    keep);
  *  - the fragment (`#…`) drops (never sent to the server);
  *  - tracking query parameters drop: names starting `utm_` and the click
  *    ids `fbclid`/`gclid`/`msclkid`/`igshid` (param ORDER is otherwise
  *    preserved — reordering would conflate genuinely different requests);
  *    an emptied query drops its `?`;
  *  - an empty path becomes `/`.
  *
  * Non-URL input (no `://`) passes through unchanged — lenient, a crawl
  * carries garbage URIs and a normalizer must not invent structure.
  * Punycode/IDN hosts pass through as-is (already ASCII in WARC headers);
  * percent-escapes are preserved byte-for-byte (decoding them changes
  * request identity in the general case). */
case class UrlNormalizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"url_normalize requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "url_normalize"
  override def nullSafeEval(input: Any): Any =
    UrlFns.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlFns.normalize($c)")
  override protected def withNewChildInternal(
      newChild: Expression): UrlNormalizeExpr = copy(child = newChild)
}

/** Lowercased host of a URL (port stripped); null when the input has no
  * `://` authority — the stratification key for per-site mixture, caps,
  * and reports. */
case class UrlHostExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"url_host requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_host"
  override def nullSafeEval(input: Any): Any =
    UrlFns.host(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.UrlFns.host($c);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  override protected def withNewChildInternal(
      newChild: Expression): UrlHostExpr = copy(child = newChild)
}

/** RFC 3986 §5 relative-reference resolution: `url_resolve(base, href)` —
  * the step between [[graft.functions.ExtractLinksExpr link extraction]]
  * and [[UrlNormalizeExpr canonicalization]]. A crawled page's hrefs are
  * mostly RELATIVE (`/a/b`, `../c`, `?q=1`, `//cdn.example.com/x`); a link
  * graph built from raw hrefs would connect nothing. Null-lenient: a null
  * base or href yields null (the row simply contributes no edge). */
case class UrlResolveExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"url_resolve requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = StringType
  // resolve() returns null for a base with no authority even when both
  // inputs are non-null, so the expression is nullable REGARDLESS of its
  // children — defineCodeGen would leave ev.isNull false around a null
  // value and NPE the UnsafeRow writer on the first garbage base URI
  // (r14 advice, high).
  override def nullable: Boolean = true
  override def nullSafeEval(base: Any, href: Any): Any =
    UrlFns.resolve(base.asInstanceOf[UTF8String],
      href.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"""${ev.value} = graft.functions.UrlFns.resolve($b, $h);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UrlResolveExpr =
    copy(left = newLeft, right = newRight)
}

object UrlFns {

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

  private def isTracking(name: String): Boolean = {
    val n = asciiLower(name)
    n.startsWith("utm_") || n == "fbclid" || n == "gclid" ||
      n == "msclkid" || n == "igshid"
  }

  /** (scheme, hostPort, rest-from-path) of `s`; null when no `://`. */
  private def split(s: String): (String, String, String) = {
    val i = s.indexOf("://")
    if (i <= 0) return null
    val authStart = i + 3
    var j = authStart
    while (j < s.length && s.charAt(j) != '/' && s.charAt(j) != '?' &&
      s.charAt(j) != '#') j += 1
    (s.substring(0, i), s.substring(authStart, j), s.substring(j))
  }

  /** Referenced from generated Java code — must stay public. */
  def normalize(input: UTF8String): UTF8String = {
    val s = input.toString
    val parts = split(s)
    if (parts == null) return input
    val scheme = asciiLower(parts._1)
    var hostPort = asciiLower(parts._2)
    // the final colon is a PORT separator only outside a bracketed IPv6
    // literal: `[2001:db8::80]`-shaped (or unterminated-bracket garbage)
    // authorities must not be truncated inside the brackets — the corrupted
    // url_norm would poison the xxhash64 doc ids derived from it (r13
    // advice). With no '[' at all the colon is a port separator as before.
    val colon = hostPort.lastIndexOf(':')
    val openBr = hostPort.indexOf('[')
    val closeBr = hostPort.lastIndexOf(']')
    val portSep = colon >= 0 &&
      (openBr < 0 || (closeBr > openBr && closeBr < colon))
    if (portSep &&
        ((scheme == "http" && hostPort.endsWith(":80")) ||
         (scheme == "https" && hostPort.endsWith(":443"))))
      hostPort = hostPort.substring(0, colon)
    var rest = parts._3
    // drop the fragment
    val hash = rest.indexOf('#')
    if (hash >= 0) rest = rest.substring(0, hash)
    // split path / query
    val q = rest.indexOf('?')
    var path = if (q >= 0) rest.substring(0, q) else rest
    if (path.isEmpty) path = "/"
    val query =
      if (q < 0) ""
      else {
        val kept = rest.substring(q + 1).split("&", -1).filter { p =>
          val eq = p.indexOf('=')
          val name = if (eq >= 0) p.substring(0, eq) else p
          !isTracking(name)
        }
        if (kept.isEmpty) "" else "?" + kept.mkString("&")
      }
    UTF8String.fromString(scheme + "://" + hostPort + path + query)
  }

  /** Referenced from generated Java code — must stay public. Null when the
    * input carries no `://` authority. */
  def host(input: UTF8String): UTF8String = {
    val parts = split(input.toString)
    if (parts == null) return null
    var h = asciiLower(parts._2)
    val colon = h.lastIndexOf(':')
    // strip any port (IPv6 literals keep their brackets; a colon inside
    // [] is not a port separator)
    if (colon >= 0 && h.indexOf(']') < colon) h = h.substring(0, colon)
    if (h.isEmpty) null else UTF8String.fromString(h)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute path. */
  private def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var trailingSlash = false
    var i = 0
    val n = path.length
    while (i < n) {
      var j = path.indexOf('/', i)
      val seg = if (j < 0) { j = n; path.substring(i) } else path.substring(i, j)
      seg match {
        case "" | "." => trailingSlash = true
        case ".." =>
          if (out.nonEmpty) out.remove(out.length - 1)
          trailingSlash = true
        case s =>
          out += s
          trailingSlash = j < n
      }
      i = j + 1
    }
    "/" + out.mkString("/") + (if (trailingSlash && out.nonEmpty) "/" else "")
  }

  /** Referenced from generated Java code — must stay public.
    *
    * RFC 3986 §5 resolution, crawl-lenient:
    *  - href with `://` → href (already absolute);
    *  - non-hierarchical absolute href (`mailto:`, `javascript:`, `tel:`,
    *    `data:` — a scheme `[A-Za-z][A-Za-z0-9+.-]*:` before any `/?#`)
    *    → href unchanged (the graph builder's scheme filter drops it);
    *  - base without `://` → null (no authority to resolve against);
    *  - `//host/x` → base scheme + `:` + href;
    *  - `/rooted` → scheme://authority + remove_dot_segments(href);
    *  - `?query` → base path + href; empty href / `#frag` → base
    *    (its own fragment dropped — a self-link);
    *  - relative path → merged with the base path's directory, dot
    *    segments removed. */
  def resolve(baseIn: UTF8String, hrefIn: UTF8String): UTF8String = {
    val href = hrefIn.toString
    // absolute iff a scheme colon appears BEFORE any '/', '?' or '#' —
    // covers both hierarchical (`http://…`) and non-hierarchical
    // (`mailto:`, `javascript:`) references. A bare `contains("://")`
    // would misclassify a RELATIVE href whose query embeds a URL
    // (`/redirect?to=https://x.com`) as absolute and lose the edge
    // (r14 advice).
    var k = 0
    while (k < href.length && href.charAt(k) != ':' && href.charAt(k) != '/' &&
      href.charAt(k) != '?' && href.charAt(k) != '#') k += 1
    if (k > 0 && k < href.length && href.charAt(k) == ':' &&
        isAsciiLetterAt(href, 0)) return hrefIn
    val base = baseIn.toString
    val parts = split(base)
    if (parts == null) return null
    val scheme = parts._1
    val auth = parts._2
    // base path/query, fragment-free
    var rest = parts._3
    val bh = rest.indexOf('#')
    if (bh >= 0) rest = rest.substring(0, bh)
    val bq = rest.indexOf('?')
    val basePath = if (bq >= 0) rest.substring(0, bq) else rest
    val root = scheme + "://" + auth
    if (href.isEmpty || href.charAt(0) == '#')
      return UTF8String.fromString(root + rest)
    if (href.startsWith("//"))
      return UTF8String.fromString(scheme + ":" + href)
    if (href.charAt(0) == '?')
      return UTF8String.fromString(
        root + (if (basePath.isEmpty) "/" else basePath) + href)
    // split href into path-part and suffix (query/fragment travel verbatim)
    var pe = 0
    while (pe < href.length && href.charAt(pe) != '?' && href.charAt(pe) != '#')
      pe += 1
    val hrefPath = href.substring(0, pe)
    val suffix = href.substring(pe)
    val merged =
      if (hrefPath.startsWith("/")) hrefPath
      else {
        val dir = basePath.lastIndexOf('/') match {
          case -1 => "/"
          case d => basePath.substring(0, d + 1)
        }
        dir + hrefPath
      }
    UTF8String.fromString(root + removeDotSegments(merged) + suffix)
  }

  private def isAsciiLetterAt(s: String, i: Int): Boolean = {
    val c = s.charAt(i)
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  }

  def urlResolve(base: org.apache.spark.sql.Column,
                 href: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      UrlResolveExpr(org.apache.spark.sql.graft.ColumnBridge.expression(base),
        org.apache.spark.sql.graft.ColumnBridge.expression(href)))

  def urlNormalize(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      UrlNormalizeExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  def urlHost(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      UrlHostExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Register as SQL: `url_normalize(x)`, `url_host(x)`,
    * `url_resolve(base, href)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "url_normalize", exprs => UrlNormalizeExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "url_host", exprs => UrlHostExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "url_resolve", exprs => UrlResolveExpr(exprs.head, exprs(1)), "built-in")
  }
}
