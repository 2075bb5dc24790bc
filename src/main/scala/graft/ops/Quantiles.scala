package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact rank-based per-stratum statistics in histogram form.
  *
  * The naive plan for "exact median per source" ranks every row with
  * `row_number().over(Window.partitionBy(stratum).orderBy(value))` — which
  * shuffles every document of a stratum to ONE task and sorts it there. With
  * a handful of sources over a 100 TB corpus that is a multi-TB single-task
  * sort. This helper computes the SAME integer-exact answers from the value
  * histogram instead:
  *
  *   1. `groupBy(stratum, value).count()` — fully map-combinable; the shuffle
  *      carries at most (strata x distinct values) rows, i.e. histogram-sized
  *      data, regardless of corpus size.
  *   2. Pack each stratum's histogram into one sorted array (bounded by the
  *      number of DISTINCT values — e.g. token-length buckets — not by the
  *      number of documents).
  *   3. Select requested ranks with a single in-row fold over the cumulative
  *      counts. No Window operator exists anywhere in the plan.
  *
  * Rank semantics match `row_number()` over `(value asc)`: the selected value
  * for rank r is the value of the r-th row in that total order, so results are
  * bit-for-bit identical to the window form (and to a SQL oracle using
  * `row_number()`), for any integer rank expression such as lower-median
  * `(n+1) div 2` or p90 `greatest(1, (n*9) div 10)`.
  *
  * Reference tie-in: the per-catchment summary shapes of
  * `inputs/gen_mike_input_rf_linux.py:180-202` are exactly per-stratum survey
  * statistics run once per batch.
  */
object Quantiles {

  /** Exact integral division for rank arithmetic (`a div b` — Spark's `/` on
    * longs is double division, which would round past 2^53). */
  def div(a: Column, b: Column): Column = call_function("div", a, b)

  /** Per-stratum count, sum, and exact rank-selected values.
    *
    * @param df      input frame
    * @param strata  grouping column names (the strata)
    * @param value   integral value column (counted, summed, rank-selected)
    * @param ranks   output column name -> rank expression builder; the builder
    *                receives the stratum's row count `n` (LongType column) and
    *                must return a 1-based rank (LongType). The output column
    *                holds the value at that rank in `(value asc)` order.
    * @param nName   name for the per-stratum row count column
    * @param sumName name for the per-stratum value sum column
    * @param maxBinsPerStratum hard safety bound on a stratum's DISTINCT value
    *                count. The whole plan's safety rests on the value column
    *                being histogram-shaped (token lengths, bucketed scores);
    *                a near-unique column (timestamps, raw floats) would pack a
    *                corpus-sized array into one row — the same single-task
    *                failure this helper exists to kill, rebuilt as an executor
    *                OOM. The bound is enforced INSIDE the packing aggregate
    *                (`BoundedHistAgg`): every partial buffer refuses loudly
    *                the moment a stratum crosses it, before the oversized
    *                array is materialized anywhere — no probe job, no cache
    *                (the r6 eager-probe form cost both; r6 ADVICE). The
    *                refusal therefore surfaces on the first ACTION as a
    *                SparkException whose cause carries the message.
    */
  def strataStats(
      df: DataFrame,
      strata: Seq[String],
      value: Column,
      ranks: Seq[(String, Column => Column)],
      nName: String = "n",
      sumName: String = "total",
      maxBinsPerStratum: Long = 4000000L): DataFrame = {
    graft.functions.BoundedHistAgg.register(df.sparkSession)
    val hist = df
      .groupBy((strata.map(col) :+ value.cast("long").as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val packed = hist
      .groupBy(strata.map(col): _*)
      .agg(
        sum(col("__c")).as(nName),
        sum(col("__v") * col("__c")).as(sumName),
        // bounded by maxBinsPerStratum BY CONSTRUCTION (the aggregate's
        // buffer throws past it); sorted by __v asc at eval
        graft.functions.BoundedHistAgg(struct(col("__v"), col("__c")),
          maxBinsPerStratum).as("__bins"))
    val selected = ranks.foldLeft(packed) { case (acc, (name, rankOf)) =>
      acc.withColumn(name, rankSelect(col("__bins"), rankOf(col(nName))))
    }
    selected.drop("__bins")
  }

  /** The APPROXIMATE sibling of `strataStats` for value columns the histogram
    * plan refuses (near-unique: timestamps, raw scores, byte offsets): per
    * stratum, count, sum, and `percentile_approx` estimates — Spark's built-in
    * mergeable quantile sketch, whose state is bounded by `accuracy`, not by
    * the column's distinct-value count, so there is nothing to guard. One
    * map-combinable aggregation; rank error ≤ n/accuracy per stratum (the
    * built-in's contract). Use `strataStats` when the column is
    * histogram-shaped and answers must be bit-exact (its results match a
    * row_number oracle; this one's are approximate by construction and NOT
    * oracle-hashable — spec-pinned against exact ranks within the error bound
    * instead).
    *
    * @param percentiles output column name -> percentile in [0, 1]
    */
  def strataStatsApprox(
      df: DataFrame,
      strata: Seq[String],
      value: Column,
      percentiles: Seq[(String, Double)],
      nName: String = "n",
      sumName: String = "total",
      accuracy: Int = 10000): DataFrame = {
    val v = value.cast("long")
    df.groupBy(strata.map(col): _*)
      .agg(
        count(lit(1)).as(nName),
        sum(v).as(sumName) +:
          percentiles.map { case (name, p) =>
            percentile_approx(v, lit(p), lit(accuracy)).as(name)
          }: _*)
  }

  /** Exact rank-quantile bucket assignment — every row's 1-based rank in the
    * per-stratum `(value, id)` total order, mapped to `nBuckets` even-spread
    * buckets by pure integer arithmetic:
    *
    *   bucket = (rank − 1) · nBuckets div n  +  1
    *
    * (the even-spread quantile rule — boundaries at k·n/nBuckets; NOT SQL
    * NTILE, whose remainder rows all pile into the leading buckets — and
    * exactly reproducible from a ROW_NUMBER in any engine, which is what the
    * q89 oracle does). The CCNet move: bucket a corpus by model perplexity,
    * then treat head/middle/tail differently.
    *
    * Scale shape — the naive plan is `row_number().over(orderBy(value))`,
    * which funnels the WHOLE stratum through one task. This is the q74/q81
    * histogram-offset discipline applied to global ranking instead: bin the
    * value space (`binStep`), roll per-bin counts into running offsets (a
    * window over the BIN HISTOGRAM — bounded by value-range/binStep, not by
    * corpus size), and resolve exact order only WITHIN each bin (a window
    * whose partition is one bin of one stratum). Ties broken by `idCol`, so
    * assignment is deterministic under any partitioning. `binStep` is the
    * cost dial: match it to the value scale so bins stay balanced (a single
    * bin holding the whole stratum re-creates the naive plan's funnel).
    * Adds `rank` and `bucket`; both engines' integer ops, oracle-exact. */
  def rankBuckets(df: DataFrame, idCol: String, value: Column, nBuckets: Int,
                  binStep: Long, strata: Seq[String] = Nil): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(binStep > 0, s"binStep must be positive, got $binStep")
    // size-gated pin (r17 opt): `base` is referenced by the bin histogram,
    // the stratum totals, AND the final row join — when `df` is an
    // expensive scoring plan (q89/q132: a corpus tokenize + model join) the
    // whole subtree would otherwise evaluate once per reference at cluster
    // scale (q132's single plan held 24 corpus parquet scans before the
    // pin; see plans/r17/q132_per_lang_perplexity_{before,after}.txt).
    // Gated on source size: at bench scale the re-scan is cheaper than the
    // pin (graft.operators.Dedup.persistIfHeavy scaladoc).
    val base = graft.operators.Dedup.persistIfHeavy(
      df.withColumn("__v", value.cast("long"))
        .withColumn("__b", div(col("__v"), lit(binStep))), df)
    val binW = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*).orderBy(col("__b"))
    val offsets = base.groupBy((strata.map(col) :+ col("__b")): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", sum(col("__c")).over(binW) - col("__c"))
    val totals = offsets.groupBy(strata.map(col): _*).agg(sum(col("__c")).as("__n"))
    val withOff = base.join(offsets.drop("__c"), strata :+ "__b")
    val withN = if (strata.isEmpty) withOff.crossJoin(broadcast(totals))
      else withOff.join(broadcast(totals), strata)
    val rowW = org.apache.spark.sql.expressions.Window
      .partitionBy((strata.map(col) :+ col("__b")): _*)
      .orderBy(col("__v"), col(idCol))
    withN.withColumn("rank", col("__off") + row_number().over(rowW))
      .withColumn("bucket",
        (div((col("rank") - 1) * lit(nBuckets.toLong), col("__n")) + 1).cast("int"))
      .drop("__v", "__b", "__off", "__n")
  }

  /** Value at 1-based `rank` in the (value asc) total order, read off a sorted
    * histogram of `struct(__v, __c)` bins: the first bin whose cumulative
    * count reaches the rank. A single in-row fold — codegen-friendly, no
    * Window, no explode. */
  private def rankSelect(bins: Column, rank: Column): Column =
    aggregate(
      bins,
      struct(lit(0L).as("cum"), lit(null).cast("long").as("v")),
      (acc, b) => struct(
        (acc("cum") + b("__c")).as("cum"),
        when(acc("v").isNull && acc("cum") + b("__c") >= rank, b("__v"))
          .otherwise(acc("v")).as("v")),
      acc => acc("v"))
}
