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
    * if no adjacent pair remains (every word fully merged). */
  def learn(docs: DataFrame, textCol: String, nMerges: Int): Seq[(String, String)] = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var words = wordCounts(docs, textCol)
      .withColumn("syms", initSymbols(col("word")))
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

  /** Tokenize the DISTINCT words of `wordsDf(wordCol)` by replaying `merges`
    * in rank order: adds a `bpe` array<string> column. The rules nest as one
    * expression tree per 32 rules, checkpointed between chunks so arbitrarily
    * long rule lists neither blow the expression depth nor accumulate
    * lineage. */
  def encodeWords(wordsDf: DataFrame, wordCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val init = wordsDf.withColumn("bpe", initSymbols(col(wordCol)))
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
            merges: Seq[(String, String)]): DataFrame =
    vocabOf(encodeWords(
      docs.select(explode(TextFns.words(col(textCol))).as("word"))
        .distinct(), "word", merges))

  /** [[vocab]] over an ALREADY-ENCODED (word, bpe) frame — lets callers
    * that hold `encodeWords` output (one pass) derive ids without
    * re-encoding. */
  private[operators] def vocabOf(encodedWords: DataFrame): DataFrame =
    encodedWords
      .select(explode(col("bpe")).as("token")).distinct()
      .withColumn("token_id",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("token"))))

  /** Per-document BPE token count under a learned rule list: the corpus's
    * distinct words are encoded ONCE (vocab-sized), then a broadcast join
    * prices every token occurrence — the corpus itself is touched by one
    * explode + one doc-key aggregate, no per-document re-encoding. Returns
    * (idCol, n_words, n_tokens_bpe); documents with no tokens drop (no
    * evidence — the established tokenless-doc convention). */
  def tokenCount(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val toks = docs.select(col(idCol), explode(TextFns.words(col(textCol))).as("word"))
    val enc = encodeWords(toks.select(col("word")).distinct(), "word", merges)
      .select(col("word"), size(col("bpe")).as("__nt"))
    toks.join(broadcast(enc), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__nt")).cast("long").as("n_tokens_bpe"))
  }
}
