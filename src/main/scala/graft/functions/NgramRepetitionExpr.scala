package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: the REMAINING Gopher repetition signals (Rae et
  * al. 2021 arXiv:2112.11446 §A1.1) that `TextStatsExpr` (top bigram
  * multiplicity) and `LineStatsExpr` (duplicate lines / top word) do not
  * cover — the full word n-gram battery, one compiled pass per document:
  *
  *   - for n ∈ {2,3,4}: the multiplicity of the most frequent n-gram and the
  *     characters it accounts for (`count · len(joined gram)`) — the paper's
  *     "fraction of characters within the most frequently-occurring n-gram"
  *     numerators;
  *   - for n ∈ {5..10}: the characters covered by ALL duplicated n-grams,
  *     where overlapping occurrences count each WORD once (coverage union
  *     over word positions, chars = Σ len(word) over covered positions) —
  *     the paper's "fraction of characters within all duplicate n-grams".
  *
  * Deterministic contracts (so a plain-SQL oracle can re-derive every bit):
  *   - tokens = `filter(split(lower(trim(text)), "\s+"), len > 0)` (the
  *     engine-wide rule); char counts are CODE POINTS (Spark `length`);
  *   - top-n ties resolve to the UTF8-binary-smallest gram
  *     (`ORDER BY cnt DESC, gram ASC` in the oracle);
  *   - `top{n}_chars` counts the joined gram's code points INCLUDING its
  *     n−1 joining spaces, times the multiplicity;
  *   - `dup{n}_chars` counts covered words' code points only (no spaces):
  *     space characters sit between words and belong to no single position,
  *     so the union semantics stay exact under overlap.
  */
case class NgramRepetitionExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_repetition requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = NgramRepetitionExpr.schema
  override def prettyName: String = "ngram_repetition"

  override def nullSafeEval(input: Any): Any =
    NgramRepetitionExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramRepetitionExpr.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NgramRepetitionExpr = copy(child = newChild)
}

object NgramRepetitionExpr {

  val TopNs: Range = 2 to 4
  val DupNs: Range = 5 to 10

  val schema: StructType = StructType(
    Seq(StructField("n_words", LongType, nullable = false),
      StructField("n_word_chars", LongType, nullable = false)) ++
    TopNs.flatMap(n => Seq(
      StructField(s"top${n}_n", LongType, nullable = false),
      StructField(s"top${n}_chars", LongType, nullable = false))) ++
    DupNs.map(n => StructField(s"dup${n}_chars", LongType, nullable = false)))

  /** Referenced from generated code. */
  def compute(text: UTF8String): InternalRow = {
    val words = KernelTok.words(text)
    val L = words.length
    val wordLens = new Array[Long](L)
    var wordChars = 0L
    var i = 0
    while (i < L) {
      val w = words(i)
      wordLens(i) = w.codePointCount(0, w.length)
      wordChars += wordLens(i)
      i += 1
    }
    val out = new Array[Any](2 + TopNs.size * 2 + DupNs.size)
    out(0) = L.toLong
    out(1) = wordChars
    var slot = 2

    /** Gram strings for one n, document order; empty for short docs. */
    def grams(n: Int): Array[String] = {
      val m = L - n + 1
      if (m <= 0) return Array.empty[String]
      val gs = new Array[String](m)
      val sb = new java.lang.StringBuilder
      var p = 0
      while (p < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(p + j))
          j += 1
        }
        gs(p) = sb.toString
        p += 1
      }
      gs
    }

    TopNs.foreach { n =>
      val gs = grams(n)
      val counts = new java.util.HashMap[String, Long]()
      gs.foreach(g => counts.merge(g, 1L, (a, b) => a + b))
      var best = 0L
      var bestGram: UTF8String = null
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getValue
        if (k > best) { best = k; bestGram = UTF8String.fromString(e.getKey) }
        else if (k == best && best > 0L) {
          val cand = UTF8String.fromString(e.getKey)
          if (cand.compareTo(bestGram) < 0) bestGram = cand
        }
      }
      val chars =
        if (bestGram == null) 0L
        else {
          val bg = bestGram.toString
          best * bg.codePointCount(0, bg.length)
        }
      out(slot) = best; out(slot + 1) = chars; slot += 2
    }

    DupNs.foreach { n =>
      val gs = grams(n)
      val counts = new java.util.HashMap[String, Long]()
      gs.foreach(g => counts.merge(g, 1L, (a, b) => a + b))
      val covered = new Array[Boolean](L)
      var p = 0
      while (p < gs.length) {
        if (counts.get(gs(p)) >= 2L) {
          var j = p
          val end = p + n
          while (j < end) { covered(j) = true; j += 1 }
        }
        p += 1
      }
      var chars = 0L
      var w = 0
      while (w < L) { if (covered(w)) chars += wordLens(w); w += 1 }
      out(slot) = chars; slot += 1
    }

    new GenericInternalRow(out)
  }

  /** Column form — direct expression construction, no registry required. */
  def apply(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NgramRepetitionExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))
}
