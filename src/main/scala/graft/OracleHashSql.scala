package graft

/** DuckDB oracle-SQL generators that re-derive the engine's 64-bit hash chains
  * in INT128 (HUGEINT) SQL — the q93/q94/q100 FNV→splitmix oracle pattern
  * generalized to Spark's `xxhash64` (XXH64, seed 42) and `MinHashSketch`'s
  * golden-add splitmix64 permutation family. These close the last four
  * `no_oracle` ledger rows (q24/q25/q43/q46): the oracle recomputes the exact
  * signature/bucket/cell internals the queries depend on, so the DuckDB
  * result is value-identical to the engine output (modulo 64-bit hash
  * collisions, which would surface as a hash mismatch — none on the test
  * corpora).
  *
  * Arithmetic discipline (shared with the q93 chain): all walk state is an
  * UNSIGNED value in [0, 2^64) carried as HUGEINT; multiplication by a 64-bit
  * constant splits the operand into 32-bit halves so no intermediate exceeds
  * 2^97; xor runs directly on the HUGEINT views (both operands < 2^64, high
  * bits zero); signed Long views for output/compare wrap through two's
  * complement CASEs. Rotations are exact divide/multiply by powers of two.
  */
object OracleHashSql {

  private val Mod = BigInt(1) << 64
  // XXH64 primes (public constants of the xxHash spec)
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)
  // splitmix64 (Steele et al. 2014) — MinHashSketch.mix's constants
  private val Golden = BigInt("9E3779B97F4A7C15", 16)
  private val C2 = BigInt("BF58476D1CE4E5B9", 16)
  private val C3 = BigInt("94D049BB133111EB", 16)
  private val Init0 = (BigInt(42) + P5) mod Mod // string hash, pre += len
  private val Init8 = (BigInt(42) + P5 + 8) mod Mod // long hash
  private val Init4 = (BigInt(42) + P5 + 4) mod Mod // int hash

  private def hug(c: BigInt): String = s"$c::HUGEINT"

  /** (x * c) mod 2^64 for unsigned x < 2^64 and a 64-bit constant c. */
  private def mulc(x: String, c: BigInt): String =
    s"((((($x) // 4294967296::HUGEINT) * ${hug(c)}) % 4294967296::HUGEINT" +
      s" * 4294967296::HUGEINT + (($x) % 4294967296::HUGEINT) * ${hug(c)})" +
      s" % ${hug(Mod)})"

  private def rotl(x: String, r: Int): String = {
    val lo = BigInt(1) << (64 - r)
    s"((($x) % ${hug(lo)}) * ${hug(BigInt(1) << r)} + ($x) // ${hug(lo)})"
  }

  private def xoru(a: String, b: String): String =
    s"xor(($a)::HUGEINT, ($b)::HUGEINT)"

  private def shr(x: String, n: Int): String =
    s"(($x) // ${hug(BigInt(1) << n)})"

  private def addm(a: String, b: String): String =
    s"((($a) + ($b)) % ${hug(Mod)})"

  private def addm(a: String, b: BigInt): String = addm(a, hug(b))

  /** unsigned HUGEINT → signed BIGINT (two's-complement wrap). */
  private def sg(x: String): String =
    s"CAST(CASE WHEN ($x) >= 9223372036854775808::HUGEINT" +
      s" THEN ($x) - ${hug(Mod)} ELSE ($x) END AS BIGINT)"

  /** signed BIGINT → unsigned HUGEINT. */
  private def usg(x: String): String =
    s"(CASE WHEN ($x) < 0 THEN ($x)::HUGEINT + ${hug(Mod)}" +
      s" ELSE ($x)::HUGEINT END)"

  /** XXH64 avalanche (fmix) as three CTE stages over `incol` of `src`,
    * carrying every other column. Returns (fragment, finalCte, finalCol). */
  private def fmixStages(prefix: String, src: String,
                         incol: String): (String, String, String) = {
    val s1 = mulc(xoru(incol, shr(incol, 33)), P2)
    val s2 = mulc(xoru("fx1", shr("fx1", 29)), P3)
    val s3 = xoru("fx2", shr("fx2", 32))
    val frag =
      s"""${prefix}_fa AS (SELECT *, $s1 AS fx1 FROM $src),
         |${prefix}_fb AS (SELECT * EXCLUDE (fx1), $s2 AS fx2 FROM ${prefix}_fa),
         |${prefix}_fc AS (SELECT * EXCLUDE (fx2), $s3 AS ${prefix}_h FROM ${prefix}_fb)""".stripMargin
    (frag, s"${prefix}_fc", s"${prefix}_h")
  }

  /** Spark `xxhash64(string)` (seed 42) over column `strcol` of CTE `src`,
    * one row per input string, as a CTE chain: UTF-8 bytes via the
    * hex(encode()) nibble trick, little-endian 8-byte lane folds, the 4-byte
    * and tail-byte steps, then fmix. Inputs must be < 32 bytes (the XXH64
    * 32-byte stripe loop is not generated; a loud `error()` guards the
    * boundary — corpus words/grams are ≤ 17 bytes). Final CTE:
    * (strcol, xh BIGINT signed). */
  private def xxh64StrStages(prefix: String, src: String,
                             strcol: String): (String, String) = {
    val lane8 = (0 until 8).map(k =>
      s"(bs[8*j+${k + 1}]::HUGEINT) * ${hug(BigInt(256).pow(k))}")
      .mkString(" + ")
    val lane4 = (0 until 4).map(k =>
      s"(bs[t4+${k + 1}]::HUGEINT) * ${hug(BigInt(256).pow(k))}")
      .mkString(" + ")
    val hstepK = mulc(rotl(mulc("lane", P2), 31), P1)
    val hstep = addm(mulc(rotl(xoru("h", hstepK), 27), P1), P4)
    val bstep = mulc(rotl(xoru("h", mulc("byt", P5)), 11), P1)
    val (fmix, fcte, fcol) = fmixStages(prefix, s"${prefix}_t", s"${prefix}_ht")
    val h4expr = addm(mulc(rotl(xoru("h8", mulc(s"($lane4)", P1)), 23), P2), P3)
    val frag =
      s"""${prefix}_b AS (
         |  SELECT $strcol, octet_length(encode($strcol)) AS n,
         |    list_transform(range(0, octet_length(encode($strcol))), i ->
         |      CAST(strpos('123456789ABCDEF',
         |             hex(encode($strcol))[CAST(2*i+1 AS BIGINT)]) * 16
         |         + strpos('123456789ABCDEF',
         |             hex(encode($strcol))[CAST(2*i+2 AS BIGINT)]) AS BIGINT)) AS bs
         |  FROM $src),
         |${prefix}_l AS (
         |  SELECT $strcol, n, bs,
         |    CASE WHEN n >= 32 THEN CAST(error('xxh64 oracle: input >= 32 bytes') AS HUGEINT)
         |         ELSE (${hug(Init0)} + n::HUGEINT) % ${hug(Mod)} END AS h0,
         |    list_transform(range(0, n // 8), j -> $lane8) AS ls,
         |    (n // 8) * 8 + CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END AS tstart,
         |    (n // 8) * 8 AS t4
         |  FROM ${prefix}_b),
         |${prefix}_h8 AS (
         |  SELECT $strcol, n, bs, tstart, t4,
         |    list_reduce(list_prepend(h0, ls), (h, lane) -> $hstep) AS h8
         |  FROM ${prefix}_l),
         |${prefix}_h4 AS (
         |  SELECT $strcol, bs, tstart,
         |    CASE WHEN n % 8 >= 4
         |      THEN $h4expr
         |      ELSE h8 END AS h4
         |  FROM ${prefix}_h8),
         |${prefix}_t AS (
         |  SELECT $strcol,
         |    list_reduce(list_prepend(h4,
         |      list_transform(bs[tstart+1:], b -> b::HUGEINT)), (h, byt) -> $bstep)
         |      AS ${prefix}_ht
         |  FROM ${prefix}_h4),
         |$fmix,
         |${prefix}_xh AS (SELECT $strcol, ${sg(fcol)} AS xh FROM $fcte)""".stripMargin
    (frag, s"${prefix}_xh")
  }

  /** Spark `xxhash64(bigint)` (seed 42): k1 = rotl31(l·P2)·P1 folded into the
    * 8-byte init, then fmix. `carry` = passthrough column list. */
  private def xxh64LongStages(prefix: String, src: String, longcol: String,
                              carry: String): (String, String) = {
    val k1 = mulc(rotl(mulc(usg(longcol), P2), 31), P1)
    val h1 = addm(mulc(rotl(xoru(hug(Init8), k1), 27), P1), P4)
    val (fmix, fcte, fcol) = fmixStages(prefix, s"${prefix}_t", s"${prefix}_ht")
    val frag =
      s"""${prefix}_t AS (SELECT $carry, $h1 AS ${prefix}_ht FROM $src),
         |$fmix,
         |${prefix}_xh AS (SELECT $carry, ${sg(fcol)} AS xh FROM $fcte)""".stripMargin
    (frag, s"${prefix}_xh")
  }

  /** Spark `xxhash64(int)` (seed 42) of a NON-NEGATIVE int column
    * (IntegerType semantics: (i & 0xFFFFFFFF)·P1 — the unsigned-int widen is
    * the identity for i ≥ 0, which the plane-index inputs always are). */
  private def xxh64IntStages(prefix: String, src: String, intcol: String,
                             carry: String): (String, String) = {
    val h1 = addm(
      mulc(rotl(xoru(hug(Init4), mulc(s"($intcol)::HUGEINT", P1)), 23), P2), P3)
    val (fmix, fcte, fcol) = fmixStages(prefix, s"${prefix}_t", s"${prefix}_ht")
    val frag =
      s"""${prefix}_t AS (SELECT $carry, $h1 AS ${prefix}_ht FROM $src),
         |$fmix,
         |${prefix}_xh AS (SELECT $carry, ${sg(fcol)} AS xh FROM $fcte)""".stripMargin
    (frag, s"${prefix}_xh")
  }

  /** `MinHashSketch.mix(x)` = splitmix64(x + golden-gamma) over unsigned
    * HUGEINT column `incol`, staged. Final CTE: carry + mx (unsigned). */
  private def sketchmixStages(prefix: String, src: String, incol: String,
                              carry: String): (String, String) = {
    val a1 = addm(incol, Golden)
    val s1 = mulc(xoru("mx1", shr("mx1", 30)), C2)
    val s2 = mulc(xoru("mx2", shr("mx2", 27)), C3)
    val s3 = xoru("mx3", shr("mx3", 31))
    val frag =
      s"""${prefix}_m1 AS (SELECT $carry, $a1 AS mx1 FROM $src),
         |${prefix}_m2 AS (SELECT $carry, $s1 AS mx2 FROM ${prefix}_m1),
         |${prefix}_m3 AS (SELECT $carry, $s2 AS mx3 FROM ${prefix}_m2),
         |${prefix}_mx AS (SELECT $carry, $s3 AS mx FROM ${prefix}_m3)""".stripMargin
    (frag, s"${prefix}_mx")
  }

  private val Toks =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |    w -> len(w) > 0) AS ws
      |  FROM documents)""".stripMargin

  /** q24 oracle: the full MinHash-LSH pipeline — distinct 2-gram shingles,
    * xxhash64 per gram, 64 splitmix permutation minima per doc (signed-Long
    * minima, exactly `MinHashSketch`'s compare), 32 bands of 2 rows matched on
    * BAND VALUES (slice equality ⟺ the engine's xxhash64-of-slice equality,
    * barring a 64-bit collision), then the exact integer-cross-multiplied
    * Jaccard ≥ 0.3 verify over the hashed shingle sets
    * (`Dedup.verifyJaccard`'s S = 1e6 discipline).
    *
    * DIVERGENCE CONDITION (r10 ADVICE): this oracle enumerates FULL
    * band-bucket crosses, but the engine's `minhashLshPairs` applies
    * `splitOversizedBuckets` at `maxBucket = 4096` — on a corpus where one
    * band bucket exceeds that, the engine emits only (bucket-min, id) star
    * candidates and this oracle would list verified pairs the engine
    * deliberately skips, turning the row red. The verify corpus stays far
    * under the cap (sf0.01: largest bucket ≪ 4096); if the cap ever trips
    * there, either model the star contraction here or raise `maxBucket` in
    * the q24 registry entry. */
  def q24MinhashLsh: String = {
    val (gfrag, gfin) = xxh64StrStages("gx", "gd", "g")
    val (sfrag, sfin) = sketchmixStages("sd", "seedi", "(i)::HUGEINT", "i")
    val (pfrag, pfin) = sketchmixStages("pm", "hx", "xor(hu, seed_mx)", "hu, i")
    s"""WITH $Toks,
       |grams0 AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws)),
       |    i -> ws[i] || ' ' || ws[i+1]))) AS g
       |  FROM toks WHERE len(ws) >= 2),
       |gd AS (SELECT DISTINCT g FROM grams0),
       |$gfrag,
       |dg AS (SELECT DISTINCT g0.doc_id, x.xh
       |       FROM grams0 g0 JOIN $gfin x USING (g)),
       |seedi AS (SELECT unnest(range(0, 64)) AS i),
       |$sfrag,
       |seeds AS (SELECT i, mx AS seed_mx FROM $sfin),
       |dh AS (SELECT DISTINCT ${usg("xh")} AS hu, xh FROM dg),
       |hx AS (SELECT dh.hu, s.i, s.seed_mx FROM dh CROSS JOIN seeds s),
       |$pfrag,
       |perm AS (SELECT hu, i, ${sg("mx")} AS p FROM $pfin),
       |sig AS (
       |  SELECT d.doc_id, p.i, MIN(p.p) AS s
       |  FROM dg d JOIN dh ON dh.xh = d.xh JOIN perm p ON p.hu = dh.hu
       |  GROUP BY d.doc_id, p.i),
       |bandv AS (
       |  SELECT doc_id, i // 2 AS band,
       |    MAX(CASE WHEN i % 2 = 0 THEN s END) AS s0,
       |    MAX(CASE WHEN i % 2 = 1 THEN s END) AS s1
       |  FROM sig GROUP BY doc_id, i // 2),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bandv a JOIN bandv b ON a.band = b.band AND a.s0 = b.s0
       |    AND a.s1 = b.s1 AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM dg GROUP BY doc_id),
       |inter AS (
       |  SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS ni
       |  FROM cand c JOIN dg x ON x.doc_id = c.id_a
       |    JOIN dg y ON y.doc_id = c.id_b AND y.xh = x.xh
       |  GROUP BY c.id_a, c.id_b)
       |SELECT i.id_a, i.id_b,
       |  round(CAST(i.ni AS DOUBLE) / CAST(sa.n + sb.n - i.ni AS DOUBLE), 6) AS jaccard
       |FROM inter i JOIN sz sa ON sa.doc_id = i.id_a JOIN sz sb ON sb.doc_id = i.id_b
       |WHERE i.ni * 1300000 >= 300000 * (sa.n + sb.n)
       |  AND CAST(i.ni AS DOUBLE) / CAST(sa.n + sb.n - i.ni AS DOUBLE) >= 0.3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q25 oracle: 64-bit SimHash per doc — xxhash64 per distinct word, 64
    * occurrence-weighted sign sums (`sum > 0` bit rule, token multiplicity
    * counted like `SimHash64Expr`), then the EXACT Hamming-radius pair set
    * (bit_count(xor) ≤ 12) — the pigeonhole banding provably adds no
    * constraint beyond the radius, so the oracle needs no band model. */
  def q25Simhash: String = {
    val (wfrag, wfin) = xxh64StrStages("wx", "wd", "w")
    val bitSums = (0 until 64).map(j =>
      s"SUM(CASE WHEN (hu // ${hug(BigInt(1) << j)}) % 2::HUGEINT = 1::HUGEINT" +
        s" THEN cnt ELSE -cnt END) AS b$j").mkString(",\n    ")
    val simExpr = (0 until 64).map(j =>
      s"CASE WHEN b$j > 0 THEN ${hug(BigInt(1) << j)} ELSE 0::HUGEINT END")
      .mkString(" + ")
    s"""WITH $Toks,
       |wc AS (
       |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT doc_id, unnest(ws) AS w FROM toks)
       |  GROUP BY doc_id, w),
       |wd AS (SELECT DISTINCT w FROM wc),
       |$wfrag,
       |wh AS (SELECT w, ${usg("xh")} AS hu FROM $wfin),
       |bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM wc JOIN wh USING (w)
       |  GROUP BY doc_id),
       |sig AS (SELECT doc_id, ${sg(s"($simExpr)")} AS sim FROM bits)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= 12
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** `round(x·1e6)` quantization of a float list, matching
    * `VectorFns.quantize` (non-finite → 0; DuckDB ROUND on DOUBLE is
    * HALF_UP-compatible away-from-zero, parity proven by the q26 family). */
  private def quant(v: String): String =
    s"list_transform($v, x -> CASE WHEN isnan(CAST(x AS DOUBLE) * 1000000.0)" +
      " OR isinf(CAST(x AS DOUBLE) * 1000000.0) THEN 0" +
      " ELSE CAST(ROUND(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) END)"

  private def dot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a) + 1), i ->" +
      s" ($a)[i] * ($b)[i])) AS BIGINT)"

  /** q43 oracle: the untrained IVF build + 4-probe serve — seed centroids =
    * the 16 smallest (xxhash64(vec_id), vec_id) corpus rows (the engine-hash
    * pick, re-derived via the BIGINT chain), Voronoi assignment and probe
    * ranking by (rounded-1e-6 cosine DESC, centroid_id ASC) — q64's total
    * order — then brute-force ranking inside the probed cells only. */
  def q43AnnIvf: String = {
    val (lfrag, lfin) = xxh64LongStages("lx", "nv", "vec_id", "vec_id")
    val dotVs = dot("v.qv", "s.centv")
    val dotQs = dot("q.qv", "s.centv")
    val dotQc = dot("q.qv", "c.qv")
    s"""WITH nv0 AS (
       |  SELECT vec_id, ${quant("embedding")} AS qv FROM embeddings),
       |nv AS (
       |  SELECT vec_id, qv,
       |    sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) AS nrm
       |  FROM nv0),
       |$lfrag,
       |seeds AS (
       |  SELECT n.vec_id AS centroid_id, n.qv AS centv, n.nrm AS centn
       |  FROM nv n JOIN $lfin h USING (vec_id)
       |  ORDER BY h.xh, n.vec_id LIMIT 16),
       |assign AS (
       |  SELECT vec_id, centroid_id AS cell FROM (
       |    SELECT v.vec_id, s.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
       |        ROUND(CAST($dotVs AS DOUBLE) / (v.nrm * s.centn), 6) DESC,
       |        s.centroid_id) AS rk
       |    FROM nv v CROSS JOIN seeds s) WHERE rk = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, centroid_id AS cell FROM (
       |    SELECT q.vec_id, s.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |        ROUND(CAST($dotQs AS DOUBLE) / (q.nrm * s.centn), 6) DESC,
       |        s.centroid_id) AS rk
       |    FROM nv q CROSS JOIN seeds s WHERE q.vec_id < 10) WHERE rk <= 4),
       |ranked AS (
       |  SELECT p.query_id, c.vec_id AS neighbor_id,
       |    CAST($dotQc AS DOUBLE) / (q.nrm * c.nrm) AS cosine
       |  FROM probes p
       |    JOIN assign a ON a.cell = p.cell
       |    JOIN nv c ON c.vec_id = a.vec_id AND c.vec_id != p.query_id
       |    JOIN nv q ON q.vec_id = p.query_id),
       |topk AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY round(cosine, 6) DESC, neighbor_id) AS INT) AS rank
       |  FROM ranked)
       |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_6dp, rank
       |FROM topk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** q111 oracle: the FULL data card — q108's exact per-stratum integers,
    * q106's exact e6-integer KL-vs-mix, and the top-5 token list under the
    * (cnt DESC, signed-FNV-1a ASC) total order (q67's hash-verified
    * tie-break — the FNV fold below re-derives `RollingHash64` so the pick
    * itself is checked, not assumed). LEFT joins + COALESCE mirror the
    * render's zero-token-stratum guarantee. */
  def q111CorpusReportFull: String =
    """WITH base AS (SELECT doc_id, source, lang, text FROM documents),
      |toksl AS (
      |  SELECT doc_id, source, lang, list_filter(
      |    string_split_regex(lower(trim(text)), '\s+'),
      |    w -> len(w) > 0) AS ws
      |  FROM base),
      |chars AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS ch
      |  FROM base),
      |cc AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2),
      |entagg AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(SUM(CAST(round(c * ln(c) * 1000000) AS BIGINT)) AS BIGINT)
      |      AS slp
      |  FROM cc GROUP BY doc_id),
      |ent AS (
      |  SELECT b.doc_id,
      |    COALESCE(CAST(round(ln(e.n) * 1000000) AS BIGINT)
      |      - e.slp // e.n, 0) AS ent_e6
      |  FROM base b LEFT JOIN entagg e USING (doc_id)),
      |docagg AS (
      |  SELECT t.source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(t.ws)) AS BIGINT) AS n_tokens,
      |    CAST(SUM(e.ent_e6) AS BIGINT) AS ent_sum,
      |    CAST(SUM(CASE WHEN e.ent_e6 < 2000000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS low,
      |    CAST(SUM(CASE WHEN t.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS en_n
      |  FROM toksl t JOIN ent e USING (doc_id) GROUP BY t.source),
      |voc AS (
      |  SELECT source, COUNT(DISTINCT tk) AS n_distinct_tokens
      |  FROM (SELECT source, unnest(ws) AS tk FROM toksl) GROUP BY source),
      |tcnt AS (
      |  SELECT source, tk AS t, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM (SELECT source, unnest(ws) AS tk FROM toksl) GROUP BY 1, 2),
      |klcc AS (SELECT t, SUM(cnt) AS c_i FROM tcnt GROUP BY 1),
      |klns AS (SELECT source, SUM(cnt) AS n_s FROM tcnt GROUP BY 1),
      |kltot AS (SELECT SUM(cnt) AS n FROM tcnt),
      |klterms AS (
      |  SELECT s.source, x.n_s, s.cnt *
      |    CAST(round((ln(s.cnt) - ln(x.n_s) - ln(c.c_i) + ln(kltot.n))
      |      * 1000000) AS BIGINT) AS term
      |  FROM tcnt s JOIN klcc c USING (t) JOIN klns x USING (source)
      |  CROSS JOIN kltot),
      |kl AS (
      |  SELECT source, CAST(SUM(term) // MIN(n_s) AS BIGINT) AS kl_vs_mix_e6
      |  FROM klterms GROUP BY source),
      |tdist AS (SELECT DISTINCT t FROM tcnt),
      |fnv AS (
      |  SELECT t, CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
      |      THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS fnv
      |  FROM (
      |    SELECT t, list_reduce(
      |      list_prepend(14695981039346656037::HUGEINT,
      |        list_transform(range(0, octet_length(encode(t))), i ->
      |          CAST(strpos('123456789ABCDEF',
      |                 hex(encode(t))[CAST(2*i+1 AS BIGINT)]) * 16
      |             + strpos('123456789ABCDEF',
      |                 hex(encode(t))[CAST(2*i+2 AS BIGINT)]) AS BIGINT))),
      |      (h, byt) -> ((h - (h % 256)
      |          + xor(CAST(h % 256 AS BIGINT), byt)::HUGEINT)
      |        * 1099511628211::HUGEINT)
      |        % 18446744073709551616::HUGEINT) AS h
      |    FROM tdist)),
      |ranked AS (
      |  SELECT c.source, c.t, c.cnt,
      |    ROW_NUMBER() OVER (PARTITION BY c.source
      |      ORDER BY c.cnt DESC, f.fnv) AS rn
      |  FROM tcnt c JOIN fnv f USING (t)),
      |tops AS (
      |  SELECT source, string_agg(t || ':' || cnt, ',' ORDER BY rn)
      |    AS top_tokens
      |  FROM ranked WHERE rn <= 5 GROUP BY source)
      |SELECT d.source, CAST(d.n_docs AS BIGINT) AS n_docs, d.n_tokens,
      |  CAST(COALESCE(v.n_distinct_tokens, 0) AS BIGINT) AS n_distinct_tokens,
      |  CAST(d.n_tokens // d.n_docs AS BIGINT) AS mean_doc_tokens,
      |  CAST(d.ent_sum // d.n_docs AS BIGINT) AS mean_entropy_e6,
      |  CAST(d.low * 1000000 // d.n_docs AS BIGINT) AS low_entropy_rate_e6,
      |  CAST(d.en_n * 1000000 // d.n_docs AS BIGINT) AS en_rate_e6,
      |  COALESCE(k.kl_vs_mix_e6, 0) AS kl_vs_mix_e6,
      |  COALESCE(tp.top_tokens, '') AS top_tokens
      |FROM docagg d
      |LEFT JOIN voc v USING (source)
      |LEFT JOIN kl k USING (source)
      |LEFT JOIN tops tp USING (source)
      |ORDER BY d.source""".stripMargin

  /** q46 oracle: the banded hyperplane-LSH embedding-dedup scale path —
    * plane weights from the xxhash64-of-int chain ((plane·4099 + dim), pmod
    * 2001 − 1000, exactly `HyperplaneBucketExpr`), integer plane dots over the
    * quantized (jitter-doubled) corpus, 8 bands × 12 sign bits, candidates on
    * shared (band, bucket), then the exact quantized cosine ≥ 0.98 verify.
    * The +0.02f jitter runs in REAL (IEEE float32) arithmetic on both sides. */
  def q46EmbeddingDedupLsh: String = {
    val (ifrag, ifin) = xxh64IntStages("ix", "pidx", "pi", "gp, d, pi")
    val bkt = (0 until 12).map(pl =>
      s"MAX(CASE WHEN gp % 12 = $pl AND dot >= 0 THEN ${1 << pl} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH base AS (
       |  SELECT vec_id, embedding AS v FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000,
       |    list_transform(embedding, e -> e + 0.02::REAL) FROM embeddings),
       |qv0 AS (SELECT vec_id, ${quant("v")} AS qv FROM base),
       |qvn AS (
       |  SELECT vec_id, qv,
       |    sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) AS nrm
       |  FROM qv0),
       |pidx AS (
       |  SELECT CAST(k // 64 AS BIGINT) AS gp, CAST(k % 64 AS BIGINT) AS d,
       |    (k // 64) * 4099 + (k % 64) AS pi
       |  FROM (SELECT unnest(range(0, 96 * 64)) AS k)),
       |$ifrag,
       |pw0 AS (
       |  SELECT gp, d,
       |    (CASE WHEN xh % 2001 < 0 THEN xh % 2001 + 2001 ELSE xh % 2001 END) - 1000
       |      AS w
       |  FROM $ifin),
       |pw AS (SELECT gp, list(w ORDER BY d) AS wl FROM pw0 GROUP BY gp),
       |dots AS (
       |  SELECT v.vec_id, p.gp,
       |    CAST(list_sum(list_transform(range(1, 65), i -> v.qv[i] * p.wl[i]))
       |      AS BIGINT) AS dot
       |  FROM qvn v CROSS JOIN pw p),
       |bkts AS (
       |  SELECT vec_id, gp // 12 AS band, $bkt AS bkt
       |  FROM dots GROUP BY vec_id, gp // 12),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM bkts a JOIN bkts b ON a.band = b.band AND a.bkt = b.bkt
       |    AND a.vec_id < b.vec_id),
       |scored AS (
       |  SELECT c.id_a, c.id_b,
       |    CAST(${dot("x.qv", "y.qv")} AS DOUBLE) / (x.nrm * y.nrm)
       |      AS cosine
       |  FROM cand c JOIN qvn x ON x.vec_id = c.id_a JOIN qvn y ON y.vec_id = c.id_b)
       |SELECT id_a, id_b, round(cosine, 6) AS cosine_6dp
       |FROM scored WHERE cosine >= 0.98
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---------- media-family oracles (q112+, r12) ----------
  // The r11 verdict's top ask: red-capable DuckDB rows for the perceptual
  // near-dup family. q112/q113 oracle the 64-bit pigeonhole banding and the
  // collapse-corpus admission join over a SYNTHESIZED signature frame
  // (xxhash64-of-group base, per-doc bit flips — brute-force O(n²) truth);
  // q114/q118 the clip shared-frame semantics; q115–q117 go DECODE-INCLUSIVE:
  // `SyntheticMedia`'s closed-form pixels are re-derived here in HUGEINT SQL
  // and walked through the exact lumaGrid/dhash64 integer math, so the
  // engine's PNM parse + luma fold + dhash bit assembly all sit under the
  // driver's hash compare.

  /** The synthesized 64-bit signature frame both q112 and q113 share:
    * media_id = doc_id, base = xxhash64(doc_id % 97), then `doc_id % 4`
    * bit flips at (doc_id·7 + j·17) % 64. Final CTE `sig`(media_id BIGINT,
    * simhash BIGINT signed). */
  private def synthSigCtes: String = {
    val (frag, fin) = xxh64LongStages("ms", "d0", "grp", "media_id, grp")
    val masks = (0 until 3).map { j =>
      s"CASE WHEN media_id % 4 > $j THEN " +
        sg(s"(1::HUGEINT << ((media_id * 7 + ${j * 17}) % 64))") +
        " ELSE 0 END"
    }
    val sim = masks.foldLeft("xh")((acc, m) => s"xor($acc, $m)")
    s"""d0 AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
       |  CAST(doc_id % 97 AS BIGINT) AS grp FROM documents),
       |$frag,
       |sig AS (SELECT media_id, $sim AS simhash FROM $fin)""".stripMargin
  }

  /** q112: every signature pair within hamming 6 — the banding recall
    * guarantee, brute-forced. */
  def q112MediaBandPairs: String =
    s"""WITH $synthSigCtes
       |SELECT a.media_id AS id_a, b.media_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM sig a JOIN sig b ON a.media_id < b.media_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
       |ORDER BY id_a, id_b""".stripMargin

  /** q113: incoming (media_id % 5 = 0) × corpus-store matches within
    * hamming 6, corpus contracted to min-id reps per identical signature
    * (`simhashBandMatchesBetween`'s collapse flood guard, modeled exactly). */
  def q113MediaAdmission: String =
    s"""WITH $synthSigCtes,
       |inc AS (SELECT media_id, simhash FROM sig WHERE media_id % 5 = 0),
       |reps AS (
       |  SELECT MIN(media_id) AS media_id, simhash
       |  FROM sig WHERE media_id % 5 <> 0 GROUP BY simhash)
       |SELECT i.media_id AS id_a, r.media_id AS id_b,
       |  CAST(bit_count(xor(i.simhash, r.simhash)) AS INT) AS hamming
       |FROM inc i JOIN reps r
       |  ON bit_count(xor(i.simhash, r.simhash)) <= 6
       |ORDER BY id_a, id_b""".stripMargin

  /** The synthesized frame-signature frame q114/q118 share: clip media_id =
    * doc_id with ((doc_id//60) % 4)+1 frames, frame j's signature =
    * xxhash64((doc_id % 60)·8 + j) — same-group clips share their prefix
    * frames. Final CTE `ex`(media_id, fsig) — DISTINCT per clip. */
  private def synthFrameCtes: String = {
    val (frag, fin) = xxh64LongStages("vf", "fr", "k", "media_id, k")
    s"""d0 AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
       |  CAST(doc_id % 60 AS BIGINT) AS grp,
       |  CAST((doc_id // 60) % 4 AS BIGINT) AS nf1 FROM documents),
       |fr AS (
       |  SELECT media_id, CAST(grp * 8 + j AS BIGINT) AS k
       |  FROM d0 CROSS JOIN (SELECT unnest(range(0, 4)) AS j)
       |  WHERE j <= nf1),
       |$frag,
       |ex AS (SELECT DISTINCT media_id, xh AS fsig FROM $fin)""".stripMargin
  }

  /** q114: clip pairs sharing >= 2 distinct frame signatures. */
  def q114VideoSharedFrames: String =
    s"""WITH $synthFrameCtes
       |SELECT a.media_id AS id_a, b.media_id AS id_b,
       |  COUNT(*) AS shared_frames
       |FROM ex a JOIN ex b ON a.fsig = b.fsig AND a.media_id < b.media_id
       |GROUP BY a.media_id, b.media_id
       |HAVING COUNT(*) >= 2
       |ORDER BY id_a, id_b""".stripMargin

  /** q118: incoming clips (media_id % 7 = 0) × corpus frame store —
    * `videoAdmissionMatchesFromSigs` semantics. */
  def q118VideoAdmissionSigs: String =
    s"""WITH $synthFrameCtes
       |SELECT a.media_id AS id_a, b.media_id AS id_b,
       |  COUNT(*) AS shared_frames
       |FROM (SELECT * FROM ex WHERE media_id % 7 = 0) a
       |JOIN (SELECT * FROM ex WHERE media_id % 7 <> 0) b ON a.fsig = b.fsig
       |GROUP BY a.media_id, b.media_id
       |HAVING COUNT(*) >= 2
       |ORDER BY id_a, id_b""".stripMargin

  /** `SyntheticMedia.pixel(seed, i, c)` in HUGEINT SQL: two wraparound
    * mixing rounds, xor-fold, low byte. `seed`/`i` are SQL expressions
    * (seed an unsigned HUGEINT, i a small non-negative integer). */
  private def synthPix(seed: String, i: String, c: Int): String = {
    val u1 = addm(mulc(seed, BigInt(2654435761L)),
      s"((($i) * 40503 + ${69427 * c + 98765})::HUGEINT)")
    val u2 = addm(mulc(u1, BigInt("6364136223846793005")),
      hug(BigInt("1442695040888963407")))
    s"((${xoru(u2, shr(u2, 31))}) % 256::HUGEINT)"
  }

  /** The decode-inclusive dhash frame q115–q117 share: per-doc 72-cell luma
    * plane from `SyntheticMedia`'s pixel function (gray pass-through for
    * even groups, the exact (77R+150G+29B)>>8 integer fold for odd), then
    * dhash64's adjacent-comparison bits. Final CTE `sig`(media_id, phash
    * BIGINT signed). */
  private def synthDhashCtes: String = {
    // seed: the doc's perturbed cells use doc seed d+1000003, others grp
    val pert = "((media_id % 3) >= 1 AND i = (media_id * 31) % 72) OR " +
      "((media_id % 3) >= 2 AND i = (media_id * 31 + 29) % 72)"
    val seed = s"(CASE WHEN $pert THEN (media_id + 1000003)::HUGEINT" +
      " WHEN media_id % 101 = 0 THEN (media_id + 5000011)::HUGEINT" +
      " ELSE grp::HUGEINT END)"
    val luma = s"CASE WHEN grp % 2 = 0 THEN ${synthPix(seed, "i", 0)}" +
      s" ELSE (77 * ${synthPix(seed, "i", 0)} + 150 * ${synthPix(seed, "i", 1)}" +
      s" + 29 * ${synthPix(seed, "i", 2)}) // 256::HUGEINT END"
    s"""d0 AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
       |  CAST(doc_id % 40 AS BIGINT) AS grp FROM documents),
       |px AS (
       |  SELECT media_id, grp, i, ($luma) AS lum
       |  FROM d0 CROSS JOIN (SELECT unnest(range(0, 72)) AS i)),
       |grid AS (
       |  SELECT d.media_id, r.b,
       |    (r.b // 8) * 9 + (r.b % 8) AS i1,
       |    (r.b // 8) * 9 + (r.b % 8) + 1 AS i2
       |  FROM d0 d CROSS JOIN (SELECT unnest(range(0, 64)) AS b) r),
       |hb AS (
       |  SELECT g.media_id,
       |    SUM(CASE WHEN p1.lum < p2.lum THEN (1::HUGEINT << g.b)
       |        ELSE 0::HUGEINT END) AS hu
       |  FROM grid g
       |  JOIN px p1 ON p1.media_id = g.media_id AND p1.i = g.i1
       |  JOIN px p2 ON p2.media_id = g.media_id AND p2.i = g.i2
       |  GROUP BY g.media_id),
       |sig AS (SELECT media_id, ${sg("hu")} AS phash FROM hb)""".stripMargin
  }

  /** q115: the dhash64 values themselves — PNM parse + lumaGrid + bit
    * assembly end-to-end under the driver's hash compare. */
  def q115MediaDhash: String =
    s"""WITH $synthDhashCtes
       |SELECT media_id, phash FROM sig ORDER BY media_id""".stripMargin

  /** q116: decode-inclusive near-dup pairs within hamming 8
    * (`imageNearDupPairs` end-to-end), brute-forced. */
  def q116MediaNearDupPairs: String =
    s"""WITH $synthDhashCtes
       |SELECT a.media_id AS id_a, b.media_id AS id_b,
       |  CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
       |FROM sig a JOIN sig b ON a.media_id < b.media_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= 8
       |ORDER BY id_a, id_b""".stripMargin

  /** The decode-inclusive VIDEO frame-signature frame q119/q120 share:
    * `SyntheticMedia.y4mClip` re-derived — clip d has (d % 3)+1 gray 9×8
    * frames, frame f's luma = pixel(grp·8 + f, i, 0) with grp = d % 30 —
    * then the per-frame dhash64 walk. Final CTE `vsig`(media_id,
    * frame_idx, fsig BIGINT signed). */
  private def synthVideoSigCtes: String = {
    val lum = synthPix("((grp * 8 + f))::HUGEINT", "i", 0)
    s"""d0 AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
       |  CAST(doc_id % 30 AS BIGINT) AS grp,
       |  CAST(doc_id % 3 AS BIGINT) AS nf1 FROM documents),
       |fr AS (
       |  SELECT media_id, grp, f
       |  FROM d0 CROSS JOIN (SELECT unnest(range(0, 3)) AS f)
       |  WHERE f <= nf1),
       |px AS (
       |  SELECT media_id, f, i, ($lum) AS lum
       |  FROM fr CROSS JOIN (SELECT unnest(range(0, 72)) AS i)),
       |grid AS (
       |  SELECT x.media_id, x.f, r.b,
       |    (r.b // 8) * 9 + (r.b % 8) AS i1,
       |    (r.b // 8) * 9 + (r.b % 8) + 1 AS i2
       |  FROM fr x CROSS JOIN (SELECT unnest(range(0, 64)) AS b) r),
       |hb AS (
       |  SELECT g.media_id, g.f,
       |    SUM(CASE WHEN p1.lum < p2.lum THEN (1::HUGEINT << g.b)
       |        ELSE 0::HUGEINT END) AS hu
       |  FROM grid g
       |  JOIN px p1 ON p1.media_id = g.media_id AND p1.f = g.f AND p1.i = g.i1
       |  JOIN px p2 ON p2.media_id = g.media_id AND p2.f = g.f AND p2.i = g.i2
       |  GROUP BY g.media_id, g.f),
       |vsig AS (SELECT media_id, CAST(f AS INT) AS frame_idx,
       |  ${sg("hu")} AS fsig FROM hb)""".stripMargin
  }

  /** q119: the REAL Y4M decode chain end-to-end — stream-header walk, FRAME
    * markers, luma-plane extraction, per-frame dhash64 — every frame's
    * signature under the driver's hash compare. */
  def q119VideoDhashFrames: String =
    s"""WITH $synthVideoSigCtes
       |SELECT media_id, frame_idx, fsig FROM vsig
       |ORDER BY media_id, frame_idx""".stripMargin

  /** q120: decode-inclusive clip near-dup pairs (shared >= 2 distinct
    * DECODED frame signatures) — `videoNearDupPairs` with real payloads. */
  def q120VideoNearDupE2e: String =
    s"""WITH $synthVideoSigCtes,
       |ex AS (SELECT DISTINCT media_id, fsig FROM vsig)
       |SELECT a.media_id AS id_a, b.media_id AS id_b,
       |  COUNT(*) AS shared_frames
       |FROM ex a JOIN ex b ON a.fsig = b.fsig AND a.media_id < b.media_id
       |GROUP BY a.media_id, b.media_id
       |HAVING COUNT(*) >= 2
       |ORDER BY id_a, id_b""".stripMargin

  /** q121: the REAL RIFF/WAVE decode chain + `WavCodec.afp64` end-to-end —
    * `SyntheticMedia.wav` holds EXACTLY 65 mono frames, so the 65
    * equal-duration energy bins degenerate to one sample each and bit i is
    * |s_i|² < |s_{i+1}|² with amplitudes from the pixel function (signs
    * alternate in the payload; energy is sign-blind). */
  def q121AudioAfp64: String = {
    val amp1 = synthPix("(media_id)::HUGEINT", "b", 0)
    val amp2 = synthPix("(media_id)::HUGEINT", "(b + 1)", 0)
    s"""WITH d0 AS (SELECT CAST(doc_id AS BIGINT) AS media_id FROM documents),
       |bits AS (
       |  SELECT media_id, b, ($amp1) AS a1, ($amp2) AS a2
       |  FROM d0 CROSS JOIN (SELECT unnest(range(0, 64)) AS b)),
       |hb AS (
       |  SELECT media_id,
       |    SUM(CASE WHEN a1 * a1 < a2 * a2 THEN (1::HUGEINT << b)
       |        ELSE 0::HUGEINT END) AS hu
       |  FROM bits GROUP BY media_id)
       |SELECT media_id, ${sg("hu")} AS phash FROM hb
       |ORDER BY media_id""".stripMargin
  }

  /** One tick's within-tick dedup chain over `src`(media_id, phash): exact
    * pairs at hamming ≤ 8 → recursive-CTE closure → min-id survivors.
    * Emits CTEs p/e/r/doom/surv suffixed `n`. */
  private def tickCcCtes(n: Int, src: String): String =
    s"""p$n AS MATERIALIZED (
       |  SELECT a.media_id AS ia, b.media_id AS ib
       |  FROM $src a JOIN $src b ON a.media_id < b.media_id
       |  WHERE bit_count(xor(a.phash, b.phash)) <= 8),
       |e$n AS MATERIALIZED (
       |  SELECT ia AS a, ib AS b FROM p$n UNION SELECT ib, ia FROM p$n),
       |r$n(id, comp) AS (
       |  SELECT a, a FROM e$n
       |  UNION
       |  SELECT e.b, r.comp FROM r$n r JOIN e$n e ON e.a = r.id),
       |doom$n AS (
       |  SELECT id FROM (SELECT id, MIN(comp) AS comp FROM r$n GROUP BY id) t
       |  WHERE id <> comp),
       |surv$n AS MATERIALIZED (
       |  SELECT media_id, phash FROM $src
       |  WHERE media_id NOT IN (SELECT id FROM doom$n))""".stripMargin

  /** q127: three composed MediaCurationJob ticks against one maintained
    * store — tick 1 dedups fresh, tick 2 admits against tick 1's survivors
    * then folds them, tick 3 admits against the post-fold union. The whole
    * admission × dedup × fold chain re-derived in closed form. */
  def q127MediaStoreTicks: String =
    s"""WITH RECURSIVE $synthDhashCtes,
       |sigm AS MATERIALIZED (SELECT media_id, phash FROM sig),
       |s1 AS MATERIALIZED (
       |  SELECT media_id, phash FROM sigm
       |  WHERE media_id < 2000 AND ((media_id // 40) % 5) IN (1, 2)),
       |${tickCcCtes(1, "s1")},
       |s2a AS MATERIALIZED (
       |  SELECT media_id, phash FROM sigm
       |  WHERE media_id < 2000 AND ((media_id // 40) % 5) IN (3, 4)),
       |rej2 AS (
       |  SELECT DISTINCT i.media_id FROM s2a i JOIN surv1 c
       |  ON bit_count(xor(i.phash, c.phash)) <= 8),
       |s2 AS MATERIALIZED (
       |  SELECT * FROM s2a WHERE media_id NOT IN (SELECT media_id FROM rej2)),
       |${tickCcCtes(2, "s2")},
       |s3a AS MATERIALIZED (
       |  SELECT media_id, phash FROM sigm
       |  WHERE media_id < 2000 AND ((media_id // 40) % 5) = 0),
       |store3 AS (SELECT * FROM surv1 UNION ALL SELECT * FROM surv2),
       |rej3 AS (
       |  SELECT DISTINCT i.media_id FROM s3a i JOIN store3 c
       |  ON bit_count(xor(i.phash, c.phash)) <= 8),
       |s3 AS MATERIALIZED (
       |  SELECT * FROM s3a WHERE media_id NOT IN (SELECT media_id FROM rej3)),
       |${tickCcCtes(3, "s3")}
       |SELECT CAST(1 AS INT) AS tick, media_id FROM surv1
       |UNION ALL SELECT 2, media_id FROM surv2
       |UNION ALL SELECT 3, media_id FROM surv3
       |ORDER BY tick, media_id""".stripMargin

  /** q117: `admitNewMedia` end-to-end — incoming docs (copy index % 5 = 0)
    * admitted iff no corpus image within hamming 8 (corpus contracted to
    * reps, which changes match ids but never the admitted set). */
  def q117MediaAdmissionE2e: String =
    s"""WITH $synthDhashCtes,
       |inc AS (SELECT media_id, phash FROM sig WHERE (media_id // 40) % 5 = 0),
       |corp AS (SELECT media_id, phash FROM sig WHERE (media_id // 40) % 5 <> 0),
       |matched AS (
       |  SELECT DISTINCT i.media_id
       |  FROM inc i JOIN corp c ON bit_count(xor(i.phash, c.phash)) <= 8)
       |SELECT media_id, 'image' AS kind FROM inc
       |WHERE media_id NOT IN (SELECT media_id FROM matched)
       |ORDER BY media_id""".stripMargin
}
