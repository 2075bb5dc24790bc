package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer induction (Sennrich, Haddow &
  * Birch, "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016) — REAL subword vocabulary learning, not the fixed-regex token
  * counting of `TextStatsExpr`: iteratively merge the most frequent adjacent
  * symbol pair until `nMerges` rules exist, then tokenize any corpus by
  * replaying the rules.
  *
  * Scale shape — the classic observation that makes BPE distributable: after
  * ONE corpus-scale pass (the word-frequency aggregate, map-combinable),
  * every training iteration runs on the WORD TABLE — vocab-sized, orders of
  * magnitude smaller than the corpus and independent of corpus growth (a
  * 100 TB crawl and a 1 TB crawl over the same language have near-identical
  * word tables). Each round is two vocab-sized jobs (pair-count aggregate +
  * merge application) plus a 1-row argmax collect; the evolving word frame is
  * lineage-truncated per round (`localCheckpoint`) and the previous round's
  * blocks are freed eagerly, so memory is flat in the round count.
  *
  * Determinism: counts are integers, and the argmax tie-break is pinned to
  * (count DESC, "a b" pair string ASC — binary collation, equal to the
  * (a, b) tuple order because a symbol can never contain the separator), so
  * the learned rules are identical under any partitioning, any engine, any
  * run. Merge application is the canonical greedy left-to-right
  * non-overlapping scan. The q88 oracle re-derives the ENTIRE training loop
  * — every pair count, every argmax, every merge application — in SQL.
  */
object Bpe {

  /** (word, cnt) corpus word frequencies — the one corpus-scale pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFns.words(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** A word's initial symbol sequence: its characters plus the end-of-word
    * marker (the Sennrich convention — lets a rule distinguish word-final
    * "er</w>" from word-internal "er"). */
  def initSymbols(word: Column): Column =
    concat(filter(split(word, ""), c => length(c) > 0), array(lit("</w>")))

  /** The GPT-2 byte↔unicode alphabet (public `bytes_to_unicode`): the 188
    * visually-printable bytes map to themselves, the rest shift to
    * U+0100.. in byte order — 256 single-char symbols, every one
    * printable, so byte-level training reuses the string-symbol machinery
    * unchanged. Index = byte value. */
  lazy val byteAlphabet: IndexedSeq[String] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var shifted = 0
    (0 until 256).map { b =>
      if (direct(b)) new String(Character.toChars(b))
      else {
        val s = new String(Character.toChars(256 + shifted))
        shifted += 1
        s
      }
    }
  }

  private lazy val hexToByteChar: Column = map_from_arrays(
    typedLit((0 until 256).map(b => f"$b%02X")),
    typedLit(byteAlphabet))

  /** BYTE-LEVEL initial symbols (r17 — the GPT-style alphabet option): the
    * word's UTF-8 bytes, each rendered through [[byteAlphabet]], plus
    * `</w>`. The base alphabet is CLOSED — 256 symbols cover every
    * possible input, so no out-of-alphabet token exists on arbitrary
    * UTF-8 (spec-pinned), where char-level induction grows its alphabet
    * with the corpus's character set. Same learn/encode machinery; the
    * hex→symbol hop keeps it pure column expressions. */
  def initSymbolsBytes(word: Column): Column =
    concat(transform(
      regexp_extract_all(hex(encode(word, "UTF-8")), lit(".."), lit(0)),
      h => element_at(hexToByteChar, h)), array(lit("</w>")))

  /** The init rule for a level: char code points or UTF-8 bytes. */
  private def initSymbolsOf(word: Column, byteLevel: Boolean): Column =
    if (byteLevel) initSymbolsBytes(word) else initSymbols(word)

  /** Adjacent symbol pairs as "a b" strings (every occurrence counted,
    * overlapping included — the reference algorithm's get_stats). */
  private def adjacentPairs(syms: Column): Column =
    transform(slice(syms, lit(1), size(syms) - 1),
      (x, i) => concat(x, lit(" "), element_at(syms, i + lit(2))))

  /** One merge rule applied to a symbol sequence: the greedy left-to-right
    * non-overlapping scan (fold; a just-merged symbol can never be the left
    * side of another merge in the same pass). Null-safe on empty prefixes
    * via 0-based `get`. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(get(acc, size(acc) - 1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn `nMerges` merge rules from the corpus, in rank order. Stops early
    * if no adjacent pair remains (every word fully merged).
    *
    * Two rule-identical paths behind one entry (r17 — the verdict's #3):
    *  - default (`localThreshold = 0`): the word table — vocab-sized and
    *    corpus-growth-independent by the operator's own scale law, the
    *    EXACT frame the distributed loop iterates on — collects ONCE and
    *    the classic Sennrich heap-with-invalidation loop runs driver-side
    *    ([[learnLocal]]). A real 32k–100k-merge tokenizer is minutes of
    *    in-process work instead of ~64k–200k sequential Spark jobs of
    *    driver round-trips — and even a 6-merge training run is 2 actions
    *    (budget count + vocab-sized collect) instead of 13 sequential
    *    jobs (r17 optimization: the per-round argmax collect + merge
    *    checkpoint pair is pure driver-round-trip latency at EVERY corpus
    *    scale, because the iterated frame never grows with the corpus).
    *    `maxLocalWords` bounds the collect with a loud refusal (a filthy
    *    corpus with an unbounded "word" set should be line/url-normalized
    *    upstream, not silently OOM the driver).
    *  - `nMerges <= localThreshold` (opt-in): the distributed per-round
    *    loop (two vocab-sized jobs + a 1-row argmax per round) — kept as
    *    the cross-check twin the specs pin the local path against, and
    *    the escape hatch for a corpus whose word table is over budget.
    * Both paths are spec-pinned rule-for-rule equal (BpeSpec). */
  def learn(docs: DataFrame, textCol: String, nMerges: Int,
            localThreshold: Int = 0,
            maxLocalWords: Long = 20000000L,
            byteLevel: Boolean = false): Seq[(String, String)] = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    if (nMerges > localThreshold) {
      val wc = wordCounts(docs, textCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = wc.count()
        require(n <= maxLocalWords,
          s"Bpe.learn: the corpus has $n distinct words, over the " +
            s"$maxLocalWords driver-collect budget for the local training " +
            s"path — normalize the corpus (line dedup, url scrub) or " +
            s"raise maxLocalWords.")
        learnLocal(
          wc.collect().map(r => (r.getString(0), r.getLong(1))), nMerges,
          byteLevel)
      } finally Dedup.release(wc)
    } else learnDistributed(docs, textCol, nMerges, byteLevel)
  }

  private def learnDistributed(docs: DataFrame, textCol: String,
                               nMerges: Int,
                               byteLevel: Boolean = false):
      Seq[(String, String)] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var words = wordCounts(docs, textCol)
      .withColumn("syms", initSymbolsOf(col("word"), byteLevel))
      .localCheckpoint(eager = true)
    var done = false
    while (merges.length < nMerges && !done) {
      val top = words
        .select(col("cnt"), explode(adjacentPairs(col("syms"))).as("pr"))
        .groupBy(col("pr")).agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("pr").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        merges += ((a, b))
        val next = words.withColumn("syms", applyMerge(col("syms"), a, b))
          .localCheckpoint(eager = true)
        Dedup.release(words)
        words = next
      }
    }
    Dedup.release(words)
    merges.toSeq
  }

  /** Spark's binary string order (UTF8String compares UTF-8 bytes
    * unsigned) — java.lang.String.compareTo is UTF-16 code-unit order and
    * DIVERGES above the BMP, so the local path compares explicit UTF-8
    * bytes to keep the argmax tie-break bit-equal to the distributed
    * `orderBy(pr.asc)`. */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  /** The in-process Sennrich loop over a COLLECTED (word, cnt) table:
    * identical counts (every adjacent occurrence, overlap included),
    * identical greedy left-to-right non-overlapping merge application,
    * identical (count DESC, "a b" UTF-8-binary ASC) argmax tie-break —
    * rule-for-rule equal to the distributed loop by construction and by
    * spec. Incremental: each merge re-prices only the words CONTAINING
    * the merged pair (an inverted pair→words index), and the max pops
    * from a lazy-invalidation heap — every count change pushes a fresh
    * (count, pair) snapshot and stale snapshots are discarded on pop, so
    * a merge costs O(affected words · word length · log pairs), not a
    * full table rescan. */
  def learnLocal(wordTable: Array[(String, Long)], nMerges: Int,
                 byteLevel: Boolean = false): Seq[(String, String)] = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    import scala.collection.mutable
    // initial symbol sequences: code points + </w> (split(word, "") never
    // splits a surrogate pair — mirror with codePoints)
    val cnts = wordTable.map(_._2)
    val words: Array[Array[String]] = wordTable.map { case (w, _) =>
      val base: Array[String] =
        if (byteLevel)
          w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            .map(b => byteAlphabet(b & 0xff))
        else w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp)))
      base :+ "</w>"
    }
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords =
      mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def pairsOf(syms: Array[String]): Iterator[(String, String)] =
      (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1)))
    // heap of (count, pair) snapshots; orders count DESC then pair ASC in
    // UTF-8 byte order ("a b" string order == (a, b) tuple order because a
    // symbol can never contain the separator — the distributed loop's own
    // invariant)
    val ord = new Ordering[(Long, String, String)] {
      def compare(p: (Long, String, String),
                  q: (Long, String, String)): Int = {
        if (p._1 != q._1) return java.lang.Long.compare(p._1, q._1)
        val sp = p._2 + " " + p._3
        val sq = q._2 + " " + q._3
        if (sp == sq) 0 else if (utf8Lt(sp, sq)) 1 else -1
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    def bump(p: (String, String), delta: Long): Unit = {
      val v = pairCounts.getOrElse(p, 0L) + delta
      if (v <= 0L) pairCounts.remove(p)
      else {
        pairCounts(p) = v
        if (delta > 0L) heap.enqueue((v, p._1, p._2))
      }
    }
    // initial build accumulates raw, then snapshots each distinct pair
    // ONCE (a per-occurrence push would put O(corpus symbol count)
    // entries on the heap before the first merge)
    words.indices.foreach { i =>
      pairsOf(words(i)).foreach { p =>
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + cnts(i)
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
      }
    }
    pairCounts.foreach { case ((a, b), v) => heap.enqueue((v, a, b)) }
    // count drops also need a fresh snapshot IF the pair survives — push
    // lazily at pop time instead: a popped snapshot whose count is stale
    // re-enqueues the CURRENT count once (classic lazy decrease-key)
    def popMax(): Option[(String, String)] = {
      while (heap.nonEmpty) {
        val (c, a, b) = heap.dequeue()
        pairCounts.get((a, b)) match {
          case Some(cur) if cur == c => return Some((a, b))
          case Some(cur) => heap.enqueue((cur, a, b)) // refresh once
          case None => // pair died; discard
        }
      }
      None
    }
    val merged = (syms: Array[String], a: String, b: String) => {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toArray
    }
    val rules = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (rules.length < nMerges && !exhausted) {
      popMax() match {
        case None => exhausted = true
        case Some((a, b)) =>
          rules += ((a, b))
          val affected = pairWords.getOrElse((a, b), mutable.HashSet.empty)
          affected.toArray.foreach { wi =>
            val before = words(wi)
            val after = merged(before, a, b)
            words(wi) = after
            val delta = mutable.HashMap.empty[(String, String), Long]
            pairsOf(before).foreach(p =>
              delta(p) = delta.getOrElse(p, 0L) - 1L)
            pairsOf(after).foreach(p =>
              delta(p) = delta.getOrElse(p, 0L) + 1L)
            delta.foreach { case (p, d) =>
              if (d != 0L) {
                bump(p, d * cnts(wi))
                val set = pairWords.getOrElseUpdate(p, mutable.HashSet.empty)
                if (d > 0L) set += wi
              }
              // membership re-check for pairs that lost copies but may
              // keep others in this word
              if (d < 0L && !pairsOf(words(wi)).contains(p))
                pairWords.get(p).foreach(_.remove(wi))
            }
          }
          pairCounts.remove((a, b))
          pairWords.remove((a, b))
      }
    }
    rules.toSeq
  }

  /** Tokenize the DISTINCT words of `wordsDf(wordCol)` by replaying `merges`
    * in rank order: adds a `bpe` array<string> column. The rules nest as one
    * expression tree per 32 rules, checkpointed between chunks so arbitrarily
    * long rule lists neither blow the expression depth nor accumulate
    * lineage. */
  def encodeWords(wordsDf: DataFrame, wordCol: String,
                  merges: Seq[(String, String)],
                  byteLevel: Boolean = false): DataFrame = {
    val init =
      wordsDf.withColumn("bpe", initSymbolsOf(col(wordCol), byteLevel))
    if (merges.isEmpty) init
    else {
      val chunks = merges.grouped(32).toSeq
      val out = chunks.zipWithIndex.foldLeft(init) { case (df, (chunk, i)) =>
        val applied = chunk.foldLeft(df)((d, m) =>
          d.withColumn("bpe", applyMerge(col("bpe"), m._1, m._2)))
        if (i == chunks.length - 1) applied
        else {
          val cp = applied.localCheckpoint(eager = true)
          Dedup.release(df)
          cp
        }
      }
      out
    }
  }

  /** The corpus's realized VOCABULARY under a rule list: every distinct
    * BPE symbol the corpus's words produce, with a dense integer
    * `token_id` (1-based, assigned in token sort order — deterministic
    * under any partitioning, re-derivable by `ROW_NUMBER() OVER (ORDER BY
    * token)` in plain SQL). The id table is what an LLM batch reader and
    * an embedding matrix actually index by; export it beside the corpus.
    * Scale: the ranking window runs on the VOCAB-sized symbol frame (the
    * same bounded-frame convention as the codebook/centroid tables and
    * `learn`'s own driver-side counts), never on the corpus. */
  def vocab(docs: DataFrame, textCol: String,
            merges: Seq[(String, String)],
            byteLevel: Boolean = false): DataFrame =
    vocabOf(encodeWords(
      docs.select(explode(TextFns.words(col(textCol))).as("word"))
        .distinct(), "word", merges, byteLevel))

  /** [[vocab]] over an ALREADY-ENCODED (word, bpe) frame — lets callers
    * that hold `encodeWords` output (one pass) derive ids without
    * re-encoding. */
  private[operators] def vocabOf(encodedWords: DataFrame): DataFrame =
    idsOf(encodedWords.select(explode(col("bpe")).as("token")).distinct())

  /** Dense 1-based ids in token sort order — the ONE id rule every vocab
    * form shares (so realized and closed vocabs agree on the convention,
    * and the SQL twins re-derive it with a ROW_NUMBER). */
  private def idsOf(tokens: DataFrame): DataFrame =
    tokens.withColumn("token_id",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("token"))))

  /** The CLOSED byte-level vocab: every base symbol of [[byteAlphabet]]
    * plus `</w>` plus each merge rule's output — the TOTAL (token,
    * token_id) table a byte-level pipeline freezes on day one, under which
    * no input can ever produce an out-of-vocab symbol (the base alphabet
    * covers all 256 byte values; every merge output is reachable only from
    * symbols already in the table). A REALIZED vocab ([[vocab]]) carries
    * only corpus-seen tokens — fine for a one-shot export, but a stream
    * encoding tomorrow's bytes under yesterday's realized vocab can hit
    * UNK; the closed table is the streaming contract
    * (`Packing.encodeIdsFrozen` + `PackingStream` with
    * `byteLevel = true`). Ids are dense 1-based in token sort order — the
    * same rule as every vocab here, just over the closed token set. */
  def closedVocab(spark: org.apache.spark.sql.SparkSession,
                  merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    idsOf(((byteAlphabet :+ "</w>") ++ merges.map { case (a, b) => a + b })
      .distinct.toDF("token"))
  }

  /** Per-document BPE token count under a learned rule list: the corpus's
    * distinct words are encoded ONCE (vocab-sized), then a broadcast join
    * prices every token occurrence — the corpus itself is touched by one
    * explode + one doc-key aggregate, no per-document re-encoding. Returns
    * (idCol, n_words, n_tokens_bpe); documents with no tokens drop (no
    * evidence — the established tokenless-doc convention). */
  def tokenCount(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)],
                 byteLevel: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol), explode(TextFns.words(col(textCol))).as("word"))
    val enc = encodeWords(toks.select(col("word")).distinct(), "word", merges,
      byteLevel)
      .select(col("word"), size(col("bpe")).as("__nt"))
    toks.join(broadcast(enc), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__nt")).cast("long").as("n_tokens_bpe"))
  }
}
