package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the large-scale training-data pipeline:
  * tokenization, shingling, quality scoring, language-ID heuristic, token counting,
  * fingerprinting. All pure built-in column expressions (codegen'd, no UDFs) so they
  * run inside whole-stage codegen over 100 TB of documents without serialization
  * overhead.
  */
object TextFns {

  /** Whitespace tokenization, lowercased, empty tokens dropped. */
  def words(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => length(w) > 0)

  /** Word n-gram shingles (space-joined). Documents shorter than n words yield an
    * empty array. Used by n-gram Jaccard / MinHash dedup. */
  def wordShingles(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => array_join(slice(ws, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Distinct word n-gram shingles hashed to longs, SORTED — the required input
    * form for `SortedIntersectCount`'s allocation-free merge intersections (sort
    * cost per document, not per pair). Set operations (Jaccard intersections,
    * MinHash) over 8-byte longs are ~10× cheaper than over shingle strings —
    * both per-comparison and in shuffle payload — and set SIZES are identical to
    * the string version barring a ~1e-15 xxhash64 collision.
    *
    * Backed by the native `SortedHashedShinglesExpr` (one compiled loop per row);
    * `sortedHashedShinglesCols` is the equivalent higher-order-function column
    * pipeline, kept as the reference implementation the equivalence spec pins
    * the native expression against (HOF lambdas evaluate interpreted — measured
    * ~6× slower). */
  def sortedHashedShingles(text: Column, n: Int): Column =
    SortedHashedShinglesExpr(text, n)

  /** Reference column-expression implementation of `sortedHashedShingles`. */
  def sortedHashedShinglesCols(text: Column, n: Int): Column =
    array_sort(transform(array_distinct(wordShingles(words(text), n)),
      s => xxhash64(s)))

  /** Alias of `sortedHashedShingles` for set-consumers (explode/agg/join) that
    * don't care about order — all consumers are order-insensitive, so both
    * names share the native sorted-distinct implementation. */
  def hashedShingles(text: Column, n: Int): Column =
    sortedHashedShingles(text, n)

  /** Distinct word n-gram shingles AS STRINGS, first-occurrence order — the
    * native compiled form of `array_distinct(wordShingles(words(text), n))`
    * (which rides interpreted HOFs); empty array for docs shorter than n
    * words, exactly like the column form. For hash-consumers prefer
    * [[hashedShingles]]; this is for the string-gram consumers (the
    * bloom/contamination family, whose oracles need string grams). */
  def stringShingles(text: Column, n: Int): Column =
    DistinctShinglesExpr(text, n)

  /** POSITIONAL window hashes in document order (no sort/dedup — for
    * `posexplode` consumers like the scrub family): native compiled form of
    * `transform(wordShingles(words(text), n), g => xxhash64(g))`. */
  def positionalShingles(text: Column, n: Int): Column =
    PositionalShinglesExpr(text, n)

  /** Winnowed (minimizer-sampled) distinct window hashes: keep the minimum
    * hash value of every `stride` consecutive window positions — ~stride×
    * fewer hashes, with the winnowing recall contract (any ≥ (n + stride − 1)
    * consecutive-token overlap still shares a sampled hash). `stride = 1` is
    * exactly `sortedHashedShingles`. */
  def winnowedShingles(text: Column, n: Int, stride: Int): Column =
    WinnowedShinglesExpr(text, n, stride)

  /** BPE-ish token count: letters runs, digit singletons, or single non-space symbols —
    * a deterministic proxy for subword token counts. */
  val bpeTokenPattern = "[a-z]+|[0-9]|[^a-z0-9\\s]"

  def tokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpeTokenPattern), lit(0)))

  /** Count of tokens found in `stops`. */
  def stopwordCount(ws: Column, stops: Seq[String]): Column = {
    val stopArr = array(stops.map(lit): _*)
    size(filter(ws, w => array_contains(stopArr, w)))
  }

  /** Quality metrics for filtering: word count, mean word length (chars), stopword
    * ratio. Ratios are exact integer divisions rendered as doubles, so they are
    * bit-reproducible across engines.
    *
    * Backed by the native `TextStatsExpr` (one compiled loop per row);
    * `qualityStructCols` is the equivalent higher-order-function column pipeline,
    * kept as the reference implementation the equivalence spec pins the native
    * expression against (HOF lambdas evaluate interpreted). Catalyst's
    * subexpression elimination collapses the repeated field accesses into a
    * single `text_stats` evaluation per row. */
  def qualityStruct(text: Column, stops: Seq[String]): Column = {
    val st = TextStatsExpr(text, stops)
    // nullif denominator: zero-word docs get NULL ratios (ANSI forbids the
    // divide; NULL is the portable answer both Spark and DuckDB agree on)
    val denom = nullif(st("n_words"), lit(0L)).cast("double")
    struct(
      st("n_words").as("n_words"),
      (st("char_sum").cast("double") / denom).as("mean_word_len"),
      (st("stop_count").cast("double") / denom).as("stop_ratio"))
  }

  /** Reference column-expression implementation of `qualityStruct`. */
  def qualityStructCols(text: Column, stops: Seq[String]): Column = {
    val ws = words(text)
    val nWords = size(ws)
    val denom = nullif(nWords.cast("long"), lit(0L)).cast("double")
    val charSum = aggregate(ws, lit(0), (acc, w) => acc + length(w))
    struct(
      nWords.cast("long").as("n_words"),
      (charSum.cast("double") / denom).as("mean_word_len"),
      (stopwordCount(ws, stops).cast("double") / denom).as("stop_ratio"))
  }

  /** Language-ID heuristic: marker-stopword hit counts per language, argmax with a
    * fixed priority order on ties. A lightweight n-gram-free heuristic in the spirit of
    * stopword-profile language identifiers; scores are exposed so downstream filters
    * can threshold on confidence. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "y", "que", "es"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "zh" -> Seq("的", "是", "了"))

  /** Per-language marker scores in ONE tokenize pass (native `StopCountsExpr`
    * compiled loop — the column form runs one interpreted filter lambda PER
    * LANGUAGE per row). Returns (code, score column) pairs. */
  def langScores(text: Column): Seq[(String, Column)] = {
    val sc = StopCountsExpr(text, langMarkers.map(_._2))
    langMarkers.zipWithIndex.map { case ((code, _), i) => code -> sc.getItem(i) }
  }

  /** Predicted language code: argmax of marker scores where earlier languages (in
    * `langMarkers` order) win ties — a nested CASE, reproducible verbatim in ANSI
    * SQL: CASE WHEN s_en >= max(s_de..s_zh) THEN 'en' WHEN ... ELSE 'zh' END. */
  def langIdPredict(text: Column): Column =
    langIdFromScores(langScores(text))

  /** The tie-broken argmax CASE over precomputed score columns. */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    def build(rem: List[(String, Column)]): Column = rem match {
      case (code, _) :: Nil => lit(code)
      case (code, s) :: tail =>
        val laterMax = tail.map(_._2).reduce((a, b) => greatest(a, b))
        when(s >= laterMax, lit(code)).otherwise(build(tail))
      case Nil => lit(null)
    }
    build(scores.toList)
  }

  /** Reference column-expression implementation of `langIdPredict`. */
  def langIdPredictCols(text: Column): Column = {
    val ws = words(text)
    langIdFromScores(
      langMarkers.map { case (code, stops) => code -> stopwordCount(ws, stops) })
  }

  /** Document fingerprint: sha256 over the sorted distinct token set — a canonical
    * content id robust to word order and repetition (bag-of-words identity).
    * The canonical string builds in the native `BagOfWordsExpr` compiled loop;
    * `fingerprintShaCols` is the spec-pinned column reference. */
  def fingerprintSha(text: Column): Column =
    sha2(BagOfWordsExpr(text), 256)

  /** Reference column-expression implementation of `fingerprintSha`. */
  def fingerprintShaCols(text: Column): Column =
    sha2(array_join(array_sort(array_distinct(words(text))), " "), 256)

  /** Longest run of equal values in a SORTED array — i.e. the max multiplicity of
    * any element. One in-row fold with a (prev, run, best) accumulator: no
    * explode, no per-doc groupBy, stays a narrow projection at any corpus size.
    * Empty arrays yield 0. */
  def maxRunLength(sortedArr: Column): Column =
    aggregate(sortedArr,
      struct(lit(Long.MinValue).as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val newRun = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), newRun.as("run"),
          greatest(acc("best"), newRun).as("best"))
      },
      acc => acc("best"))

  /** CCNet-style text normalization (Wenzek et al. 1911.00359 §4.1) — the
    * canonical form dedup/fingerprint hashing runs on, so `Café  2024` and
    * `cafe 0000` collide: lowercase → accents stripped (native
    * [[StripAccentsExpr]], NFD + drop combining marks) → every digit mapped
    * to `0` → whitespace runs collapsed to single spaces and trimmed. Four
    * chained codegen'd projections in the scan stage; DuckDB mirrors it as
    * `trim(regexp_replace(regexp_replace(strip_accents(lower(t)), '[0-9]',
    * '0', 'g'), '\s+', ' ', 'g'))`, which is what keeps every downstream
    * hash oracle-checkable. Idempotent (spec-pinned).
    *
    * Backed by the native single-pass [[NormalizeTextExpr]] kernel (one byte
    * loop on ASCII rows — no regex engines); `normalizeTextCols` is the
    * chained-column reference the equivalence spec pins it against. */
  def normalizeText(text: Column): Column = NormalizeTextExpr(text)

  /** Deterministic HTML→text extraction (script/style/comment drop, tags →
    * whitespace, entity decode, whitespace collapse) — the step between a
    * raw `text/html` web capture and the curation pipeline's text contract.
    * Backed by the native single-pass [[HtmlToTextExpr]] kernel. */
  def htmlToText(text: Column): Column = HtmlToTextExpr(text)

  /** MAIN-text extraction: [[htmlToText]]'s machinery plus block-level
    * boilerplate classification (jusText's word-count + link-density
    * rules) — navigation/footer link soup drops, content blocks keep.
    * Backed by the native single-pass [[HtmlMainTextExpr]] kernel. */
  def htmlMainText(text: Column): Column = HtmlMainTextExpr(text)

  def htmlMainText(text: Column, minWords: Int,
                   maxLinkDensityE6: Int): Column =
    HtmlMainTextExpr(text, minWords, maxLinkDensityE6)

  /** [[htmlMainText]] with the full jusText dial set (r14): a stopword list
    * enables the four-class scheme — stopword-density classification plus
    * the SHORT/NEARGOOD context pass (see [[HtmlMainTextExpr]] §4). */
  def htmlMainTextJustext(text: Column, minWords: Int, maxLinkDensityE6: Int,
                          stopwords: Seq[String], lenHighWords: Int,
                          stopLowE6: Int, stopHighE6: Int): Column =
    HtmlMainTextExpr(text, minWords, maxLinkDensityE6, stopwords,
      lenHighWords, stopLowE6, stopHighE6)

  /** [[htmlMainTextJustext]] with PER-LANGUAGE stopword lists: the row's
    * `lang` column picks its list in-row (the q132 strata pattern applied
    * to extraction — see [[HtmlMainTextByLangExpr]]); unlisted langs fall
    * back to `fallback`. */
  def htmlMainTextJustextByLang(text: Column, lang: Column,
                                stopwordsByLang: Map[String, Seq[String]],
                                fallback: Seq[String], minWords: Int,
                                maxLinkDensityE6: Int, lenHighWords: Int,
                                stopLowE6: Int, stopHighE6: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      HtmlMainTextByLangExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(text),
        org.apache.spark.sql.graft.ColumnBridge.expression(lang),
        stopwordsByLang, fallback, minWords, maxLinkDensityE6,
        lenHighWords, stopLowE6, stopHighE6))

  /** Reference column-chain implementation of [[normalizeText]]. */
  def normalizeTextCols(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(StripAccentsExpr(lower(text)), "[0-9]", "0"),
      "\\s+", " "))

  /** PII redaction patterns: kept deliberately simple (no lookaround, no
    * back-references) so the same pattern strings run identically under Java
    * regex (Spark) and RE2 (DuckDB/ripgrep-family engines). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "[0-9]{3}[- ][0-9]{3}[- ]?[0-9]{4}"
  val ipv4Pattern =
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Redact emails, phone numbers, and IPv4 literals to fixed placeholder tags —
    * the standard pre-training scrub. Three chained regexp_replace projections:
    * codegen'd, order fixed (email first so its digits cannot be re-matched). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "[EMAIL]"),
        ipv4Pattern, "[IP]"),
      phonePattern, "[PHONE]")

  /** Gopher-style repetition signals per document: word/distinct-word counts and
    * the multiplicity of the most repeated bigram (all exact longs; downstream
    * filters threshold on the ratios). The whole struct is one narrow projection
    * — no explode, no per-doc groupBy — backed by the native `TextStatsExpr`
    * compiled loop; `repetitionStructCols` is the interpreted column reference
    * the equivalence spec pins it against. */
  def repetitionStruct(text: Column): Column = {
    val st = TextStatsExpr(text, Nil)
    struct(
      st("n_words").as("n_words"),
      st("n_distinct_words").as("n_distinct_words"),
      st("n_bigrams").as("n_bigrams"),
      st("top_bigram_n").as("top_bigram_n"))
  }

  /** Reference column-expression implementation of `repetitionStruct`. */
  def repetitionStructCols(text: Column): Column = {
    val ws = words(text)
    val bg = wordShingles(ws, 2)
    struct(
      size(ws).cast("long").as("n_words"),
      size(array_distinct(ws)).cast("long").as("n_distinct_words"),
      size(bg).cast("long").as("n_bigrams"),
      maxRunLength(array_sort(transform(bg, g => xxhash64(g)))).as("top_bigram_n"))
  }
}
