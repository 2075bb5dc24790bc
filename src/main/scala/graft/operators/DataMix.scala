package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data-mixture construction: per-stratum (source/domain/language)
  * downsampling with exact, reproducible membership — how a training corpus is
  * re-weighted ("2 parts web, 1 part code, 0.1 part forums") without a random
  * number generator in sight.
  *
  * Membership is decided by a Knuth multiplicative hash of the row id — pure
  * 64-bit integer arithmetic (id·2654435761 mod 2³²), so the SAME rows are chosen
  * under any partitioning, any engine, any run. Sampling is a narrow filter: no
  * shuffle, fully pushdown-friendly, and the fraction is exact-in-expectation
  * with per-id determinism (re-runs and incremental loads agree on every row). */
object DataMix {

  /** (id mod 2^32) · 2654435761 mod 2^32 — Knuth's multiplicative hash,
    * computed WITHOUT 64-bit overflow: the naive `id * 2654435761` exceeds
    * Long past id ≈ 3.5e9 (silently wrapping under default Spark, throwing
    * under ANSI mode, erroring in a BIGINT SQL oracle). Splitting the
    * reduced id into 16-bit halves keeps every intermediate under 2^49;
    * the result is bit-identical to the mathematical mod-2^32 hash for ANY
    * id, so membership decisions never change across id ranges or modes. */
  def knuthHash(id: Column): Column = {
    val a = pmod(id, lit(4294967296L))
    val hi = graft.ops.Quantiles.div(a, lit(65536L))
    val lo = a - hi * lit(65536L)
    pmod(pmod(hi * lit(2654435761L), lit(4294967296L)) * lit(65536L) +
      lo * lit(2654435761L), lit(4294967296L))
  }

  /** Uniform [0, 1) hash of an integer id: `knuthHash(id) / 2^32`.
    * Exact integer ops only. */
  def hash01(id: Column): Column =
    knuthHash(id).cast("double") / 4294967296.0

  /** Keep each row iff hash01(id) < fraction(stratum). Strata absent from
    * `fractions` use `defaultFraction`. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hash01(col(idCol)) < frac)
  }

  /** Mixture report: per stratum, total rows vs deterministically sampled rows —
    * the audit artifact that accompanies any mixture definition. */
  def mixtureReport(df: DataFrame, idCol: String, strataCol: String,
                    fractions: Map[String, Double],
                    defaultFraction: Double = 1.0): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_total"),
        count(when(hash01(col(idCol)) < frac, 1)).as("n_sampled"))
  }

  /** Per-stratum admission rates for TEMPERATURE-scaled mixture sampling
    * (the XLM-R / mC4 re-weighting: sampling probability ∝ countᵅ, α < 1
    * flattens the source distribution so a dominant web crawl stops drowning
    * the small high-quality sources). Returns (stratum, n_rows, rate): an
    * audit-artifact frame, strata-bounded, broadcastable.
    *
    * rate_s = target · w_s / W / n_s with w_s = ⌊n_sᵅ · 10⁶⌋ and W = Σ w_t —
    * the expected take from stratum s is target · w_s/W rows (its temperature
    * share of the corpus budget); rate ≥ 1 means the stratum is kept whole
    * (deterministic sampling cannot upsample — the standard clamp).
    *
    * Every step is cross-engine exact, so a SQL oracle reproduces membership
    * bit-for-bit (q87): counts and w are integers (floor of a correctly-
    * rounded IEEE op — exact for α ∈ {0, ½, 1}, the sqrt/identity cases; the
    * engine is self-consistent for ANY α, the cross-engine guarantee is what
    * needs the restriction), W is an integer sum (order-independent), and the
    * rate's double ops evaluate left-associated on integer-exact operands
    * (each < 2⁵³), hence correctly rounded to the same bits in any IEEE
    * engine. */
  def temperatureRates(df: DataFrame, strataCol: String, target: Long,
                       alpha: Double = 0.5): DataFrame = {
    require(target > 0, s"target must be positive, got $target")
    require(alpha >= 0.0 && alpha <= 1.0,
      s"alpha must be in [0, 1] (1 = proportional, 0 = uniform), got $alpha")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_rows"))
    val nD = col("n_rows").cast("double")
    val pw = if (alpha == 0.0) lit(1.0)
      else if (alpha == 0.5) sqrt(nD)
      else if (alpha == 1.0) nD
      else pow(nD, lit(alpha))
    val weighted = counts.withColumn("__w", floor(pw * lit(1000000.0)).cast("long"))
    weighted
      .crossJoin(broadcast(weighted.agg(sum(col("__w")).as("__tw"))))
      .withColumn("rate",
        lit(target.toDouble) * col("__w") / col("__tw") / col("n_rows"))
      .select(col(strataCol), col("n_rows"), col("rate"))
  }

  /** Temperature-scaled mixture sample: keep each row iff hash01(id) <
    * rate(stratum) — `stratifiedSample` with the fractions DERIVED from the
    * countᵅ temperature formula instead of hand-picked. Expected total is
    * ~`target` rows (exact-in-expectation per stratum, clamped where a
    * stratum's share exceeds its size). One strata-bounded count aggregate,
    * then a narrow broadcast-join filter — the corpus is never shuffled, and
    * membership is stable under any partitioning, engine, or re-run. */
  def temperatureSample(df: DataFrame, idCol: String, strataCol: String,
                        target: Long, alpha: Double = 0.5): DataFrame =
    df.join(broadcast(
        temperatureRates(df, strataCol, target, alpha).drop("n_rows")),
        Seq(strataCol))
      .filter(hash01(col(idCol)) < col("rate"))
      .drop("rate")

  /** Deterministic train/validation/test split assignment: each row lands in
    * the first split whose cumulative fraction exceeds its id hash — the same
    * Knuth arithmetic as sampling, so membership is stable under any
    * partitioning, engine, or re-run, and incremental loads never move a row
    * between splits (the property RNG-based splitters silently lack). A split
    * column is a narrow projection: no shuffle, partition-pruning-friendly
    * when written as a partition key. `splits` are (name, fraction) in
    * declaration order; fractions must sum to ~1. */
  def assignSplit(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $splits")
    val h = hash01(col(idCol))
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.zip(cum).dropRight(1).foldRight(
      lit(splits.last._1)) { case (((name, _), upper), acc) =>
      when(h < upper, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** LEAKAGE-CONTROLLED split assignment (r15): membership keys on the
    * doc's dedup COMPONENT root instead of its own id, so a near-duplicate
    * CLUSTER lands in one split — a plain id-hash split GUARANTEES
    * train/test leakage at corpus scale (with a 10% near-dup rate, ~1% of
    * test docs have a train twin; benchmark numbers inflate silently).
    * `labels` = (id, component) from `Dedup.components` / the admission
    * ticks; docs with no label row are their own singleton cluster (the
    * key falls back to the id). Same Knuth arithmetic as [[assignSplit]]
    * applied to the key, so splits stay stable under any partitioning,
    * re-runs, AND incremental admission — a new doc joining an existing
    * cluster inherits the cluster's split (its component root is the
    * standing minimum, which admission ticks preserve). Emits `split_key`
    * beside `split` so the keying itself sits under the oracle (q145).
    * Scale: one id-keyed join against the labels frame — co-located
    * (exchange-free) when both sides live in the BucketedStore layout the
    * curation job publishes. Unlabeled singletons key on the id itself
    * when it is integral and on `xxhash64(id)` otherwise — a string id
    * under `cast("long")` would null the split_key for every unlabeled
    * doc, funneling them all into one split and silently skewing the
    * advertised proportions. */
  def assignSplitByComponent(df: DataFrame, idCol: String,
                             labels: DataFrame,
                             splits: Seq[(String, Double)]): DataFrame = {
    val lab = labels.select(col(labels.columns.head).as(idCol),
      col(labels.columns(1)).as("__comp"))
    df.join(lab, Seq(idCol), "left")
      .withColumn("split_key",
        coalesce(col("__comp"), Dedup.singletonKey(df, idCol)))
      .drop("__comp")
      .transform(d => assignSplit(d, "split_key", splits))
  }

  /** Deterministic per-stratum subsample: the `n` rows of each stratum with
    * the SMALLEST Knuth hash of their id — a reproducible "uniform" sample
    * (same rows under any partitioning, engine, or re-run; the property
    * RNG-based samplers silently lack), the standard curation move for
    * capping an over-represented source at a fixed row budget. Scale shape:
    * the bounded-heap top-k aggregate (map-side partials; the shuffle
    * carries at most n rows per stratum per mapper) — NOT a per-stratum
    * ranking window, which funnels every row of a stratum through one task.
    * Output: strata + rn (1-based hash-order rank) + payload columns. */
  def sampleStratified(df: DataFrame, strata: Seq[String], n: Int,
                       idCol: String, payload: Seq[String]): DataFrame =
    // few-file guard: the heap top-k partials run map-side in the scan stage
    graft.ops.TopK.topKPerGroup(Dedup.ensureParallel(df), strata,
      -knuthHash(col(idCol)), col(idCol),
      payload.map(col), n)
      .drop("__sort", "__tie")

  /** Deterministic per-stratum BUDGET sample — `sampleStratified`'s weighted
    * sibling, the "cap each source at N tokens" curation move: keep each
    * stratum's greedy hash-order prefix whose INCLUSIVE cumulative `weight`
    * stays within `budget` (same Knuth hash order as every sampler here, so
    * membership is reproducible under any partitioning or re-run).
    *
    * Scale shape — the naive plan is a running-sum window over
    * `(stratum ORDER BY hash)`, which funnels every row of a stratum through
    * one task (the q66 defect, weighted). This plan is the histogram-cutoff
    * form instead: (1) bucket the hash space, aggregate per-bucket weight
    * sums (map-combinable; shuffle carries strata × buckets rows); (2) one
    * in-row fold per stratum finds the bucket where the cumulative budget
    * crosses; (3) only THAT bucket's rows — corpus/buckets of the data —
    * enter a window to resolve the exact boundary. Earlier buckets are
    * admitted wholesale, later ones rejected wholesale, both as map-side
    * filters against a broadcast cutoff frame. */
  def sampleToBudget(df: DataFrame, strata: Seq[String], budget: Long,
                     idCol: String, weight: Column,
                     buckets: Int = 4096): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    budgetSample(df, strata, None, budget, idCol, weight, buckets)
  }

  /** [[sampleToBudget]] with PER-STRATUM budgets — `budgets` = (strata…,
    * budget) with the budget in its LAST column; strata absent from the
    * frame keep nothing. The identical histogram-cutoff machinery, with
    * each stratum's fold reading its own broadcast budget — the form
    * [[executeEpochPlan]]'s fractional epoch rides. */
  def sampleToBudgetEach(df: DataFrame, strata: Seq[String],
                         budgets: DataFrame, idCol: String, weight: Column,
                         buckets: Int = 4096): DataFrame =
    budgetSample(df, strata, Some(budgets), 0L, idCol, weight, buckets)

  private def budgetSample(df: DataFrame, strata: Seq[String],
                           budgets: Option[DataFrame], budgetLit: Long,
                           idCol: String, weight: Column,
                           buckets: Int): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val step = 4294967296L / buckets
    val base = df
      .withColumn("__w", weight.cast("long"))
      .withColumn("__h", knuthHash(col(idCol)))
      .withColumn("__b", graft.ops.Quantiles.div(col("__h"), lit(step)))
    val hist = base.groupBy((strata.map(col) :+ col("__b")): _*)
      .agg(sum(col("__w")).as("__bw"))
    // per stratum: the first bucket where cumulative weight exceeds the
    // budget (cb) and the cumulative total BEFORE it — one sorted in-row fold
    // over the (strata x buckets)-bounded histogram
    val cuts0 = hist.groupBy(strata.map(col): _*)
      .agg(sort_array(collect_list(struct(col("__b"), col("__bw"))))
        .as("__bins"))
    val withBudget = budgets match {
      case None => cuts0.withColumn("__budget", lit(budgetLit))
      case Some(b) =>
        cuts0.join(broadcast(b.select((strata.map(col) :+
            col(b.columns.last).cast("long").as("__budget")): _*)),
            strata, "left")
          .withColumn("__budget", coalesce(col("__budget"), lit(0L)))
    }
    val cuts = withBudget
      .withColumn("__cut", aggregate(col("__bins"),
        struct(lit(0L).as("cum"), lit(null).cast("long").as("cb"),
          lit(0L).as("before")),
        (acc, x) => struct(
          (acc("cum") + x("__bw")).as("cum"),
          when(acc("cb").isNull && acc("cum") + x("__bw") > col("__budget"),
            x("__b")).otherwise(acc("cb")).as("cb"),
          when(acc("cb").isNull && acc("cum") + x("__bw") > col("__budget"),
            acc("cum")).otherwise(acc("before")).as("before"))))
      .select((strata.map(col) :+ col("__cut.cb").as("__cb") :+
        col("__cut.before").as("__before") :+ col("__budget")): _*)
    val joined = base.join(broadcast(cuts), strata)
    val earlier = joined.filter(col("__cb").isNull || col("__b") < col("__cb"))
    // the boundary window's partition holds ONE hash bucket of one stratum —
    // corpus/buckets rows, not the stratum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*).orderBy(col("__h"), col(idCol))
    val boundary = joined
      .filter(col("__cb").isNotNull && col("__b") === col("__cb"))
      .withColumn("__cum", sum(col("__w")).over(w))
      .filter(col("__before") + col("__cum") <= col("__budget"))
      .drop("__cum")
    earlier.unionByName(boundary)
      .drop("__cb", "__before", "__budget", "__b", "__h", "__w")
  }

  /** DSIR-style importance RESAMPLING (Xie et al. 2023 arXiv:2302.03169 —
    * the selection step that turns an importance score into a sample): draw
    * `k` rows without replacement with probability ∝ exp(weight / T) via the
    * Gumbel-top-k trick — every row gets `key = round(w/T) + G` and the k
    * largest keys win, where the Gumbel noise `G = −ln(−ln(u))` comes from
    * the row's OWN Knuth hash (`u = (knuthHash(id)+0.5)/2³²`, never 0 or 1),
    * not an RNG — so the draw is one deterministic narrow projection:
    * reproducible under any partitioning, engine, or re-run, and incremental
    * corpus loads never perturb the keys of existing rows.
    *
    * `weightE6Col` is a log-space importance weight in the e6 scaled-integer
    * convention (e.g. `NgramLm.domainLlr`'s `llr_e6`); the Gumbel term is
    * rounded to the same e6 grid before an exact integer add, so `key_e6`
    * is cross-engine-reproducible the same way the LM scores are (the ln
    * calls are correctly-rounded IEEE doubles in any engine; at T=1 the
    * weight passes through bit-exact). Selection is a global top-k —
    * `TakeOrderedAndProject`: per-partition heaps, k·partitions rows to the
    * driver, the corpus never sorts. Ties break by id. */
  def importanceResample(scored: DataFrame, idCol: String, weightE6Col: String,
                         k: Int, temperature: Double = 1.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val u = (knuthHash(col(idCol)).cast("double") + 0.5) / 4294967296.0
    val gumbelE6 = round(-log(-log(u)) * 1e6).cast("long")
    val scaledW =
      if (temperature == 1.0) col(weightE6Col).cast("long")
      else round(col(weightE6Col).cast("double") / temperature).cast("long")
    scored
      .withColumn("gumbel_e6", gumbelE6)
      .withColumn("key_e6", scaledW + col("gumbel_e6"))
      .orderBy(col("key_e6").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic corpus shuffle + shard assignment — the training-export
    * step ("shuffle the corpus, cut it into N shard files") done without a
    * random number generator: the Knuth hash IS the permutation, `shard =
    * hash mod nShards` (near-balanced multinomial for corpus-scale n), and
    * the within-shard order is (hash, id). A narrow projection — no shuffle,
    * no state; `salt` varies the permutation across epochs while keeping
    * every run of one epoch bit-reproducible. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
                    salt: Long = 0L): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(salt >= 0, s"salt must be non-negative, got $salt")
    df.withColumn("__h", knuthHash(pmod(col(idCol), lit(4294967296L)) +
        lit(salt)))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
  }

  /** `shuffleShards` plus the EXACT 1-based position of every row within its
    * shard's (hash, id) order — without ever sorting a whole shard in one
    * task: positions compose from (a) per-(shard, high-hash-bucket) counts
    * rolled into running offsets — a histogram-scale frame (≤ nShards·2¹⁶
    * rows), its running sum a window over bucket counts, not rows — and
    * (b) a row_number within each (shard, bucket) — 2¹⁶ buckets per shard,
    * so every window partition holds ~corpus/(nShards·2¹⁶) rows no matter
    * how large the corpus. The q74 histogram-offset discipline applied to
    * dense ranking. One corpus shuffle on (shard, bucket) serves both the
    * window and the offset join. */
  def shardPositions(df: DataFrame, idCol: String, nShards: Int,
                     salt: Long = 0L): DataFrame = {
    val bucketed = shuffleShards(df, idCol, nShards, salt)
      .withColumn("__b", graft.ops.Quantiles.div(col("__h"), lit(65536L)))
    val offsets = bucketed.groupBy(col("shard"), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", sum(col("__n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(col("__b"))) - col("__n"))
      .drop("__n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), col("__b")).orderBy(col("__h"), col(idCol))
    bucketed.join(offsets, Seq("shard", "__b"))
      .withColumn("pos", col("__off") + row_number().over(w))
      .drop("__b", "__h", "__off")
  }

  /** Materialize the shuffled shards as `dir/shard=K/` parquet, each shard's
    * rows in (hash, id) order: one hash repartition on the shard key, an
    * intra-task sort, and a partitioned write — readers stream any shard in
    * permutation order straight off the files, nothing ever ranks the corpus
    * globally.
    *
    * Restart contract: the write is a whole-dir overwrite of EXTERNAL input,
    * so a killed export self-heals by re-running. Readers that may race a
    * re-export should gate on the job-level `_SUCCESS` marker at `dir/` —
    * a dir without it is a partial export, not a short corpus. */
  def writeShards(df: DataFrame, idCol: String, dir: String, nShards: Int,
                  salt: Long = 0L): Unit =
    shuffleShards(df, idCol, nShards, salt)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__h"), col(idCol))
      .drop("__h")
      .write.mode("overwrite").partitionBy("shard").parquet(dir)

  /** Per-stratum token-distribution KL divergence vs the whole corpus —
    * the mixture diagnostic behind reweighting decisions ("how far is this
    * source's unigram distribution from the mix?", the quantity DoReMi-style
    * excess-loss heuristics proxy): KL(p_s ‖ p) = Σ_i p_si·ln(p_si / p_i)
    * over the stratum's tokens, in the exact e6 integer convention — each
    * token's log-ratio `ln c_si − ln n_s − ln c_i + ln n` is e6-rounded ONCE
    * and multiplied by the exact count, so the sum is an integer with no
    * float order anywhere; `kl_e6 = Σ term ÷ n_s` (truncated division,
    * identical both engines). Nonnegative up to rounding; 0 = the stratum IS
    * the mix.
    *
    * Scale shape: the corpus pays one map-combinable (stratum, token) count
    * aggregate; everything after is VOCAB-sized (strata × vocab rows joined
    * to vocab totals, one scalar corpus total broadcast). At 100 TB the
    * vocab frames are MBs — the diagnostic is a footnote on the token-count
    * pass every other text operator already pays.
    *
    * Range: |Σ term| ≤ n_s · max|log-ratio|·10⁶ ≈ n_s · 2·10⁷ — a long
    * overflows only past ~4·10¹¹ tokens IN ONE STRATUM; shard the stratum
    * (and average the shard KLs) before that point. */
  def sourceTokenKl(docs: DataFrame, textCol: String,
                    strataCol: String): DataFrame = {
    // few-file guard: the corpus token pass is the operator's whole cost
    val toks = Dedup.ensureParallel(docs).select(col(strataCol),
      explode(graft.functions.TextFns.words(col(textCol))).as("__t"))
    sourceTokenKlFromCounts(
      toks.groupBy(col(strataCol), col("__t")).agg(count(lit(1)).as("c_si")),
      strataCol)
  }

  /** [[sourceTokenKl]] from a PRE-AGGREGATED (strata, __t, c_si) count frame
    * — the fused-pass seam `Reports.corpusReportFull` rides so one token
    * explode serves the vocabulary, KL, and hitter columns at once. */
  def sourceTokenKlFromCounts(sc: DataFrame,
                              strataCol: String): DataFrame = {
    val cc = sc.groupBy(col("__t")).agg(sum(col("c_si")).as("c_i"))
    val ns = sc.groupBy(col(strataCol)).agg(sum(col("c_si")).as("n_s"))
    val n = sc.agg(sum(col("c_si")).as("n"))
    val terms = sc.join(broadcast(cc), Seq("__t"))
      .join(broadcast(ns), Seq(strataCol))
      .crossJoin(broadcast(n))
      .withColumn("__term", col("c_si") *
        round((log(col("c_si")) - log(col("n_s")) -
          log(col("c_i")) + log(col("n"))) * 1000000.0).cast("long"))
    terms.groupBy(col(strataCol))
      .agg(first(col("n_s")).as("n_tokens"),
        sum(col("__term")).as("__sum"))
      .select(col(strataCol), col("n_tokens"),
        graft.ops.Quantiles.div(col("__sum"), col("n_tokens")).as("kl_e6"))
  }

  /** TOKEN-BUDGET EPOCH PLAN — the "how many epochs of each source" table a
    * pretraining run is configured from (the LLaMA-style mixture: a token
    * budget splits across sources by weight, small high-quality sources
    * REPEAT up to a cap, a dominant crawl contributes once): allocate
    * `budgetTokens` across strata proportionally to `mixWeights`, each
    * stratum capped at `avail · maxEpochsE3/1000` tokens, with capped
    * strata's unused share flowing to the others — exact WATER-FILLING,
    * computed as one greedy fold over the strata sorted by saturation
    * point (cap/weight ascending: a stratum saturates only if it would
    * also saturate under every later, larger fair share, so one pass
    * suffices — the classic max-min fairness argument).
    *
    * Everything is exact integer arithmetic (the oracle discipline):
    * - `cap = a·m/1000` and `epochs_e3 = alloc·1000/a` evaluate in split
    *   form `(a div 1000)·m + ((a mod 1000)·m) div 1000` — bit-equal to
    *   the unsplit floor for ANY a (the decomposition is exact because
    *   the split-off quotient term is divisible), with every intermediate
    *   under 2⁶³ up to ~9·10¹⁵ tokens per stratum (≈36 PB of text).
    * - the fold's fair share `floor(r·w / wr)` splits the same way on
    *   `wr`; weights are bounded to [1, 10⁶] so `(r mod wr)·w` fits.
    * - only the sort key is a double (cap/w, ONE correctly-rounded IEEE
    *   divide — same bits in any engine, the [[temperatureRates]]
    *   rationale), ties broken by stratum name.
    *
    * Output (strata-sized): stratum (as string), n_docs, avail_tokens,
    * mix_w, cap_tokens, alloc_tokens, epochs_e3 (milli-epochs of the
    * stratum a reader consumes), unallocated_tokens (same value on every
    * row: > 0 iff every stratum saturated — the budget exceeds what the
    * caps admit; by construction the fold's floors never strand budget
    * while an unsaturated stratum remains).
    *
    * Scale shape: one map-combinable count/sum aggregate over the corpus,
    * then the fold runs in-row on ONE strata-bounded array — no driver
    * loop, no second corpus pass, no shuffle beyond the aggregate's. */
  def epochPlan(docs: DataFrame, strataCol: String, tokens: Column,
                budgetTokens: Long, mixWeights: Map[String, Long],
                defaultWeight: Long = 1L,
                maxEpochsE3: Long = 1000L): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    require(maxEpochsE3 >= 0 && maxEpochsE3 <= 1000000L,
      s"maxEpochsE3 must be in [0, 1e6] (0..1000 epochs), got $maxEpochsE3")
    (mixWeights.values.toSeq :+ defaultWeight).foreach(w =>
      require(w >= 1L && w <= 1000000L,
        s"mix weights must be in [1, 1e6], got $w"))
    val d = (a: Column, b: Column) => graft.ops.Quantiles.div(a, b)
    val wtd = docs.groupBy(col(strataCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(tokens.cast("long")), lit(0L)).as("avail_tokens"))
      .withColumn("mix_w", mixWeights.foldLeft(lit(defaultWeight)) {
        case (acc, (k, v)) => when(col("__s") === k, lit(v)).otherwise(acc)
      })
      .withColumn("cap_tokens",
        d(col("avail_tokens"), lit(1000L)) * lit(maxEpochsE3) +
          d(pmod(col("avail_tokens"), lit(1000L)) * lit(maxEpochsE3),
            lit(1000L)))
    val outType = "array<struct<s:string,nd:bigint,a:bigint,w:bigint," +
      "cap:bigint,alloc:bigint>>"
    val folded = wtd
      .agg(sort_array(collect_list(struct(
          (col("cap_tokens").cast("double") / col("mix_w").cast("double"))
            .as("k"),
          col("__s").as("s"), col("n_docs").as("nd"),
          col("avail_tokens").as("a"), col("mix_w").as("w"),
          col("cap_tokens").as("cap")))).as("__rows"),
        sum(col("mix_w")).as("__tw"))
      .select(aggregate(col("__rows"),
        struct(lit(budgetTokens).as("r"), col("__tw").as("wr"),
          lit(null).cast(outType).as("out")),
        (acc, x) => {
          val share = d(acc("r"), acc("wr")) * x("w") +
            d(pmod(acc("r"), acc("wr")) * x("w"), acc("wr"))
          val alloc = least(x("cap"), share)
          val row = array(struct(x("s").as("s"), x("nd").as("nd"),
            x("a").as("a"), x("w").as("w"), x("cap").as("cap"),
            alloc.as("alloc")))
          struct((acc("r") - alloc).as("r"), (acc("wr") - x("w")).as("wr"),
            when(acc("out").isNull, row)
              .otherwise(concat(acc("out"), row)).as("out"))
        }).as("__fold"))
    folded
      .select(col("__fold.r").as("unallocated_tokens"),
        explode(col("__fold.out")).as("x"))
      .select(col("x.s").as(strataCol), col("x.nd").as("n_docs"),
        col("x.a").as("avail_tokens"), col("x.w").as("mix_w"),
        col("x.cap").as("cap_tokens"), col("x.alloc").as("alloc_tokens"),
        when(col("x.a") > 0,
            d(col("x.alloc"), col("x.a")) * lit(1000L) +
              d(pmod(col("x.alloc"), col("x.a")) * lit(1000L), col("x.a")))
          .otherwise(lit(0L)).as("epochs_e3"),
        col("unallocated_tokens"))
  }

  /** MATERIALIZE an [[epochPlan]] — the (doc, epoch_idx) expansion a
    * training reader actually consumes: each stratum repeats
    * `⌊alloc/avail⌋` FULL epochs of itself (every doc appears once per
    * full epoch, `epoch_idx` 0, 1, …) and tops the allocation up with a
    * FRACTIONAL final epoch — the deterministic hash-order prefix worth
    * the remaining `alloc − full·avail` tokens (the [[sampleToBudget]]
    * membership, so re-runs, engines, and partitionings agree on every
    * row, and the fractional epoch of a 0.37-epoch source is the same
    * stable prefix every sampler in this file would pick).
    *
    * `plan` is [[epochPlan]]'s output (strataCol, …, avail_tokens, …,
    * alloc_tokens, …) — only those three columns are read, so a hand-built
    * plan frame works too. `tokens` must price docs EXACTLY as the plan's
    * avail was computed, or full epochs would mis-divide. Strata absent
    * from the plan (or with zero remaining tokens) contribute no rows of
    * the respective kind.
    *
    * Scale shape: output-sized by construction (the product IS the
    * repeated corpus): full epochs are one broadcast join + an in-row
    * sequence explode; the fractional prefix is the histogram-cutoff
    * machinery ([[sampleToBudgetEach]] — only one hash bucket per stratum
    * ever enters a window). */
  def executeEpochPlan(docs: DataFrame, strataCol: String, idCol: String,
                       tokens: Column, plan: DataFrame): DataFrame = {
    val p = plan
      .select(col(strataCol), col("avail_tokens").cast("long").as("__a"),
        col("alloc_tokens").cast("long").as("__alloc"))
      .withColumn("__full", when(col("__a") > 0,
        graft.ops.Quantiles.div(col("__alloc"), col("__a")))
        .otherwise(lit(0L)))
      .withColumn("__rem", col("__alloc") - col("__full") * col("__a"))
      .select(col(strataCol), col("__full"), col("__rem"))
    val outCols = docs.columns.map(col).toSeq :+ col("epoch_idx")
    val full = docs
      .join(broadcast(p.filter(col("__full") > 0)), Seq(strataCol))
      .select(docs.columns.map(col).toSeq :+
        explode(sequence(lit(0L), col("__full") - 1)).as("epoch_idx"): _*)
    val frac = sampleToBudgetEach(docs, Seq(strataCol),
        p.filter(col("__rem") > 0).select(col(strataCol), col("__rem")),
        idCol, tokens)
      .join(broadcast(p), Seq(strataCol))
      .withColumn("epoch_idx", col("__full"))
      .select(outCols: _*)
    full.unionByName(frac)
  }
}
