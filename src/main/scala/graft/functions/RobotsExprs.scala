package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 (Robots Exclusion Protocol) kernels — crawl governance for a
  * training-data pipeline. Two real uses at this seam: a crawler decides
  * what to FETCH, and a curation pipeline retroactively HONORS robots
  * rules over an already-captured corpus (robots.txt captures ship inside
  * Common Crawl dumps precisely so consumers can do this). Both reduce to
  * the same two pure functions:
  *
  *  - `robots_rules(txt, agent)` — parse a robots.txt body into the rule
  *    group that GOVERNS `agent`: per RFC 9309 §2.2.1 the group whose
  *    `User-agent` line is the LONGEST case-insensitive prefix-token match
  *    of the agent's product token wins; with no named match the `*` group
  *    applies; with neither, everything is allowed (empty rules). Keys are
  *    case-insensitive; `#` comments strip; `Allow`/`Disallow` with an
  *    EMPTY path are ignored (a bare `Disallow:` famously means
  *    allow-all). Unknown directives (Crawl-delay, Sitemap, …) are
  *    skipped, but a `Sitemap:` line does NOT break a group (it is a
  *    non-group record per the RFC).
  *  - `robots_allowed(path, patterns, allows)` — the RFC 9309 §2.2.2
  *    longest-match verdict for a url path (+optional query): among all
  *    rules whose pattern matches, the one with the LONGEST pattern wins;
  *    an allow/disallow TIE at equal length resolves to allow; no match ⇒
  *    allowed. Patterns support `*` (any chars) and a trailing `$` (end
  *    anchor); matching is byte-literal otherwise (the RFC's
  *    percent-encoding nuances are the caller's normalization problem).
  *
  * Both are deterministic, locale-free, single-pass-per-rule; the matcher
  * is a two-pointer wildcard walk (no regex compilation, no backtracking
  * blowup: `*` segments match greedily with backoff over the path only). */
case class RobotsRulesExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"robots_rules requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = RobotsExprs.rulesSchema
  override def prettyName: String = "robots_rules"
  override def nullSafeEval(txt: Any, agent: Any): Any =
    RobotsExprs.rules(txt.asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, a) => s"graft.functions.RobotsExprs.rules($t, $a)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsRulesExpr =
    copy(left = newLeft, right = newRight)
}

/** Verdict for one path against a parsed rule group (see [[RobotsExprs]]):
  * `robots_allowed(path, patterns, allows)` → boolean. */
case class RobotsAllowedExpr(first: Expression, second: Expression,
                             third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(dt: DataType): DataType = dt match {
      case ArrayType(e, _) => e
      case other => other
    }
    if (first.dataType == StringType && elem(second.dataType) == StringType &&
      elem(third.dataType) == BooleanType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"robots_allowed requires (string, array<string>, array<boolean>), " +
        s"got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString})")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_allowed"
  override def nullSafeEval(path: Any, pats: Any, allows: Any): Any =
    RobotsExprs.allowed(path.asInstanceOf[UTF8String],
      pats.asInstanceOf[ArrayData], allows.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, a, b) => s"graft.functions.RobotsExprs.allowed($p, $a, $b)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): RobotsAllowedExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `robots_sitemaps(txt)` → the file's Sitemap URLs (see
  * [[RobotsExprs.sitemaps]]). */
case class RobotsSitemapsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"robots_sitemaps requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "robots_sitemaps"
  override def nullSafeEval(input: Any): Any =
    RobotsExprs.sitemaps(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RobotsExprs.sitemaps($c)")
  override protected def withNewChildInternal(
      newChild: Expression): RobotsSitemapsExpr = copy(child = newChild)
}

/** `robots_crawl_delay_ms(txt, agent)` → the governing group's
  * Crawl-delay in milliseconds, null when absent (see
  * [[RobotsExprs.crawlDelayMs]]). */
case class RobotsCrawlDelayExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"robots_crawl_delay_ms requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_crawl_delay_ms"
  override def nullSafeEval(txt: Any, agent: Any): Any =
    RobotsExprs.crawlDelayMs(txt.asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("delay")
    nullSafeCodeGen(ctx, ev, (t, a) =>
      s"""java.lang.Long $tmp =
         |  graft.functions.RobotsExprs.crawlDelayMs($t, $a);
         |${ev.isNull} = ($tmp == null);
         |if (!${ev.isNull}) ${ev.value} = $tmp.longValue();""".stripMargin)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsCrawlDelayExpr =
    copy(left = newLeft, right = newRight)
}

object RobotsExprs {

  val rulesSchema: DataType = ArrayType(StructType(Seq(
    StructField("pattern", StringType, nullable = false),
    StructField("allow", BooleanType, nullable = false))),
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

  private final case class Group(
      uas: scala.collection.mutable.ArrayBuffer[String],
      rules: scala.collection.mutable.ArrayBuffer[(String, Boolean)],
      delays: scala.collection.mutable.ArrayBuffer[String])

  /** One pass: collect (uaTokens, rules, delays) groups. A group is a
    * maximal run of User-agent lines followed by its rule lines; a
    * User-agent line after a rule line starts a NEW group (RFC 9309
    * §2.2.1). */
  private def parseGroups(txt: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var cur: Group = null
    var curOpenForUa = false // true while consecutive UA lines accumulate
    txt.split("\n", -1).foreach { raw =>
      // strip comments and CR
      val noCr = if (raw.nonEmpty && raw.last == '\r') raw.dropRight(1) else raw
      val hash = noCr.indexOf('#')
      val line = (if (hash >= 0) noCr.substring(0, hash) else noCr).trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = asciiLower(line.substring(0, colon).trim)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!curOpenForUa) {
                cur = Group(scala.collection.mutable.ArrayBuffer.empty,
                  scala.collection.mutable.ArrayBuffer.empty,
                  scala.collection.mutable.ArrayBuffer.empty)
                groups += cur
                curOpenForUa = true
              }
              cur.uas += asciiLower(value)
            case "allow" | "disallow" =>
              curOpenForUa = false
              // empty-path rules are ignored (bare `Disallow:` = allow all)
              if (cur != null && value.nonEmpty)
                cur.rules += ((value, key == "allow"))
            case "crawl-delay" =>
              // de-facto rule line (Bing/Yandex honor it): attaches to the
              // group like Allow/Disallow
              curOpenForUa = false
              if (cur != null && value.nonEmpty) cur.delays += value
            case "sitemap" =>
              () // non-group record: does NOT terminate UA accumulation
            case _ =>
              curOpenForUa = false // unknown directive ends the UA run
          }
        }
      }
    }
    groups.toSeq
  }

  /** The governing groups for `agent`: longest UA token that
    * prefix-matches the agent token; "*" matches with length 0 (weakest).
    * RFC 9309 §2.2.1: rules of ALL groups matching the same agent combine
    * — real robots.txt files repeat `User-agent: *` groups, and keeping
    * only the first silently drops the later groups' Disallow lines (r14
    * advice). Two passes: find the winning match length, then merge every
    * group that achieves it, in file order. */
  private def winningGroups(groups: Seq[Group], agent: String): Seq[Group] = {
    def matchLen(ua: String): Int =
      if (ua == "*") 0
      else if (ua.nonEmpty && agent.startsWith(ua)) ua.length
      else -1
    var bestLen = -1
    groups.foreach { g =>
      g.uas.foreach { ua =>
        val len = matchLen(ua)
        if (len > bestLen) bestLen = len
      }
    }
    if (bestLen < 0) Nil
    else groups.filter(_.uas.exists(matchLen(_) == bestLen))
  }

  /** Referenced from generated Java code — must stay public. Parse the
    * governing groups' rules for `agent` (see class doc). */
  def rules(txtIn: UTF8String, agentIn: UTF8String): GenericArrayData = {
    val agent = asciiLower(agentIn.toString.trim)
    val merged = winningGroups(parseGroups(txtIn.toString), agent)
      .iterator.flatMap(_.rules)
    new GenericArrayData(merged.map { case (p, a) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(p),
        a)): AnyRef
    }.toArray)
  }

  /** Referenced from generated Java code — must stay public. The
    * governing `Crawl-delay` for `agent`, in MILLISECONDS (the directive
    * is seconds, commonly fractional — "0.5" ships in the wild); null
    * when the governing groups carry none or only unparseable values.
    * Merged groups take the MAXIMUM (conservative politeness). Not part
    * of RFC 9309, but Bing/Yandex-class crawlers honor it and a polite
    * frontier should too — compose with
    * [[graft.operators.LinkGraph.frontier]]'s per-host cap. */
  def crawlDelayMs(txtIn: UTF8String, agentIn: UTF8String): java.lang.Long = {
    val agent = asciiLower(agentIn.toString.trim)
    val delays = winningGroups(parseGroups(txtIn.toString), agent)
      .iterator.flatMap(_.delays)
      .flatMap { v =>
        try {
          val d = v.toDouble
          if (d.isNaN || d < 0 || d > 1e6) None
          else Some(math.round(d * 1000.0))
        } catch { case _: NumberFormatException => None }
      }.toSeq
    if (delays.isEmpty) null else java.lang.Long.valueOf(delays.max)
  }

  /** Sitemap URLs from a robots.txt body (non-group records per RFC 9309
    * §2.2.4: they apply regardless of user agent, in file order, duplicates
    * kept). Referenced from generated code — stays public. */
  def sitemaps(txtIn: UTF8String): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    txtIn.toString.split("\n", -1).foreach { raw =>
      val noCr = if (raw.nonEmpty && raw.last == '\r') raw.dropRight(1) else raw
      val hash = noCr.indexOf('#')
      val line = (if (hash >= 0) noCr.substring(0, hash) else noCr).trim
      val colon = line.indexOf(':')
      if (colon > 0 && asciiLower(line.substring(0, colon).trim) == "sitemap") {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) out += UTF8String.fromString(v)
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Wildcard pattern match: `*` = any run of chars, trailing `$` anchors
    * the end; greedy-with-backoff two-pointer walk, linear-ish in
    * |path|·segments. Referenced from generated code — stays public. */
  def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.last == '$'
    val pat = if (anchored) pattern.dropRight(1) else pattern
    var pi = 0
    var si = 0
    var starPi = -1
    var starSi = -1
    while (si < path.length) {
      // `*` must be tested BEFORE literal equality: '*' is a legal RFC
      // 3986 path char, and consuming a pattern '*' as a literal against
      // a path '*' records no backtrack point — false negatives for
      // anchored patterns like `/a*b$` vs `/a*cb` (r14 advice).
      if (pi < pat.length && pat.charAt(pi) == '*') {
        starPi = pi; starSi = si; pi += 1
      } else if (pi < pat.length && (pat.charAt(pi) == path.charAt(si))) {
        pi += 1; si += 1
      } else if (starPi >= 0) {
        starSi += 1; si = starSi; pi = starPi + 1
      } else {
        return false
      }
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length
  }

  /** RFC 9309 longest-match verdict (see class doc). Referenced from
    * generated code — stays public. */
  def allowed(pathIn: UTF8String, pats: ArrayData, allows: ArrayData): Boolean = {
    val path = pathIn.toString
    var bestLen = -1
    var bestAllow = true
    var i = 0
    val n = pats.numElements()
    while (i < n) {
      val pat = pats.getUTF8String(i).toString
      if (prefixWildcardMatches(pat, path)) {
        val len = pat.length
        if (len > bestLen || (len == bestLen && !bestAllow &&
          allows.getBoolean(i))) {
          bestLen = len
          bestAllow = allows.getBoolean(i)
        }
      }
      i += 1
    }
    bestAllow
  }

  /** Robots matching is PREFIX semantics: the pattern must match some
    * prefix of the path (or, with `$`, the whole path). */
  def prefixWildcardMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.last == '$'
    if (anchored) return patternMatches(pattern, path)
    // prefix match: walk pattern against path, `*` skips
    var pi = 0
    var si = 0
    var starPi = -1
    var starSi = -1
    val pat = pattern
    while (pi < pat.length) {
      if (pat.charAt(pi) == '*') {
        starPi = pi; starSi = si; pi += 1
      } else if (si < path.length && pat.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (starPi >= 0 && starSi < path.length) {
        starSi += 1; si = starSi; pi = starPi + 1
      } else {
        return false
      }
    }
    true
  }

  def robotsRules(txt: org.apache.spark.sql.Column,
                  agent: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      RobotsRulesExpr(org.apache.spark.sql.graft.ColumnBridge.expression(txt),
        org.apache.spark.sql.graft.ColumnBridge.expression(agent)))

  def robotsAllowed(path: org.apache.spark.sql.Column,
                    patterns: org.apache.spark.sql.Column,
                    allows: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      RobotsAllowedExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(path),
        org.apache.spark.sql.graft.ColumnBridge.expression(patterns),
        org.apache.spark.sql.graft.ColumnBridge.expression(allows)))

  /** Register as SQL: `robots_rules(txt, agent)`,
    * `robots_allowed(path, patterns, allows)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "robots_rules", exprs => RobotsRulesExpr(exprs.head, exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "robots_allowed",
      exprs => RobotsAllowedExpr(exprs.head, exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "robots_sitemaps", exprs => RobotsSitemapsExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "robots_crawl_delay_ms",
      exprs => RobotsCrawlDelayExpr(exprs.head, exprs(1)), "built-in")
  }

  def robotsCrawlDelayMs(txt: org.apache.spark.sql.Column,
                         agent: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      RobotsCrawlDelayExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(txt),
        org.apache.spark.sql.graft.ColumnBridge.expression(agent)))

  def robotsSitemaps(txt: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      RobotsSitemapsExpr(org.apache.spark.sql.graft.ColumnBridge.expression(txt)))
}
