package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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

  def urlNormalize(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      UrlNormalizeExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  def urlHost(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      UrlHostExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Register as SQL: `url_normalize(x)`, `url_host(x)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "url_normalize", exprs => UrlNormalizeExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "url_host", exprs => UrlHostExpr(exprs.head), "built-in")
  }
}
