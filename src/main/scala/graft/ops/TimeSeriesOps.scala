package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core keyed, versioned time-series operators.
  *
  * Re-expresses the reference's eager pandas dataflows (SURVEY.md §2; reference
  * `CUrW-SL/curw_mike_data_handler`, read-only at /root/reference) as lazy, composable
  * `DataFrame => DataFrame` transforms so Catalyst owns planning and Tungsten owns
  * execution. Nothing here collects to the driver; every transform is a narrow map or a
  * single shuffle that scales horizontally: at 100 TB the spine join is a broadcast (the
  * spine is tiny), the resample is one hash aggregate with map-side partial aggregation,
  * and the catchment fold is one shuffle on (name, time) instead of the reference's
  * O(catchments × members) in-memory frame merges
  * (ref: inputs/gen_mike_input_rf_linux.py:180-202).
  */
object TimeSeriesOps {

  /** S7: dense, regular time spine at N-minute frequency.
    * ref: inputs/gen_mike_input_rf_linux.py:144-145 (5-min),
    * inputs/gen_mike_input_dis_linux.py:92-93 (15-min).
    * Inclusive of both endpoints, matching `pd.date_range`.
    * NTZ (wall-clock) semantics — the reference operates in naive local time
    * (SURVEY.md §1.2). `sequence` stays on the driver-planned literal path, so the
    * generated rows are produced distributed after `explode`.
    */
  def timeSpine(spark: SparkSession, startTs: String, endTs: String,
                stepMinutes: Int, timeCol: String = "time"): DataFrame =
    spark.sql(
      s"""SELECT explode(sequence(timestamp_ntz'$startTs', timestamp_ntz'$endTs',
         |interval $stepMinutes minutes)) AS $timeCol""".stripMargin)

  /** J1: align a long-layout series onto the dense spine; gaps become NULLs to be
    * imputed. ref: inputs/gen_mike_input_rf_linux.py:162 (loop of 22 sequential
    * left-joins — here it is ONE join; the wide shape comes later from pivot).
    * The spine side is small — callers should pass `broadcast(spine)` when the series
    * side is large, keeping this shuffle-free.
    */
  def alignToSpine(spine: DataFrame, series: DataFrame, timeCol: String = "time"): DataFrame =
    spine.join(series, Seq(timeCol), "left")

  /** A1: right-closed, right-labeled time bucket — bucket (t-step, t] gets label t,
    * pandas `resample(step, label='right', closed='right')` semantics
    * (ref: inputs/gen_mike_input_rf_linux.py:165). A timestamp exactly on a bucket
    * boundary stays in its own bucket. Pure integer arithmetic (no float division) so
    * results are bit-exact and the expression stays inside whole-stage codegen:
    * ceil(t/step)*step == t + pmod(-t, step).
    */
  def ceilBucket(ts: Column, stepSeconds: Long): Column = {
    val stepUs = stepSeconds * 1000000L
    val us = unix_micros(ts.cast("timestamp"))
    timestamp_micros(us + pmod(-us, lit(stepUs))).cast("timestamp_ntz")
  }

  /** A1/A7: resample a long-layout series to a coarser right-closed grid with SUM.
    * `nullAsZero=true` replicates the pandas 0.25 quirk that an all-NaN bucket sums to
    * 0.0 where SQL would yield NULL (SURVEY.md §7.4.1) — pinned explicitly.
    * One hash aggregate; partial aggregation happens map-side before the shuffle.
    */
  def resampleSum(df: DataFrame, timeCol: String, stepSeconds: Long,
                  keyCols: Seq[String], valueCol: String,
                  nullAsZero: Boolean = true): DataFrame = {
    val bucketed = df.withColumn(timeCol, ceilBucket(col(timeCol), stepSeconds))
    val agged = bucketed.groupBy((keyCols :+ timeCol).map(col): _*)
      .agg(sum(col(valueCol)).as(valueCol))
    if (nullAsZero) agged.withColumn(valueCol, coalesce(col(valueCol), lit(0.0))) else agged
  }

  /** P3: negative readings are sensor noise -> NULL.
    * ref: inputs/gen_mike_input_rf_linux.py:98-101 (`num[num < 0] = np.nan`). */
  def cleanseNegatives(df: DataFrame, valueCol: String): DataFrame =
    df.withColumn(valueCol,
      when(col(valueCol) < 0, lit(null)).otherwise(col(valueCol)))

  /** P4: sentinel missing-marker -> NULL.
    * ref: inputs/gen_mike_input_tide_linux.py:82-85 (`-99999.0`). */
  def cleanseSentinel(df: DataFrame, valueCol: String,
                      sentinel: Double = -99999.0): DataFrame =
    df.withColumn(valueCol,
      when(col(valueCol) === sentinel, lit(null)).otherwise(col(valueCol)))

  /** A2/W4: row-mean imputation in long layout — a missing value at time t is filled
    * with the mean over the OTHER series' values at the same t, where the mean is
    * computed over the pre-fill column (order-insensitive, matching the reference's
    * mean-before-fill: SURVEY.md §7.4.5; ref inputs/gen_mike_input_rf_linux.py:104-108).
    * `avg` skips NULLs natively, matching pandas NaN-skipping mean.
    */
  def imputeRowMean(df: DataFrame, timeCol: String, valueCol: String): DataFrame =
    df.withColumn(valueCol,
      coalesce(col(valueCol), avg(col(valueCol)).over(Window.partitionBy(timeCol))))

  /** P6/W2: MIKE needs a closed boundary — if the final spine row of a series is
    * missing or negative, patch it to 0.
    * ref: inputs/gen_mike_input_dis_linux.py:104-106; inputs/gen_mike_input_tide_linux.py:110-111. */
  def patchLastRow(df: DataFrame, timeCol: String, valueCol: String,
                   keyCols: Seq[String] = Nil): DataFrame = {
    val w = (if (keyCols.isEmpty) Window.partitionBy(lit(1))
             else Window.partitionBy(keyCols.map(col): _*))
      .orderBy(col(timeCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .withColumn(valueCol,
        when(col("__rn") === 1 && (col(valueCol).isNull || col(valueCol) < 0), lit(0.0))
          .otherwise(col(valueCol)))
      .drop("__rn")
  }

  /** A3/J2: per-catchment weighted fold — Σ over member stations of
    * coefficient × value(t). The reference builds one weighted frame per member and
    * merges them pairwise (ref: inputs/gen_mike_input_rf_linux.py:180-202, 23 LoC of
    * nested loops); here it is a single broadcast join + one hash aggregate.
    * `coeffs` is a small dim (204 rows in the reference) — always broadcast.
    */
  def weightedGroupSum(series: DataFrame, coeffs: DataFrame, joinKey: String,
                       groupCol: String, timeCol: String, valueCol: String,
                       weightCol: String, outCol: String = "value"): DataFrame =
    series.join(broadcast(coeffs), joinKey)
      .groupBy(col(groupCol), col(timeCol))
      .agg(sum(col(weightCol) * col(valueCol)).as(outCol))

  /** R1: long -> wide pivot (`time × station` matrix for MIKE interchange).
    * ref: inputs/gen_mike_input_rf_linux.py:155-162 (loop-of-joins). Passing explicit
    * `keys` avoids the extra distinct-keys job and keeps column order deterministic —
    * required for the single-file CSV contract (SURVEY.md §7.4.8).
    */
  def pivotWide(long: DataFrame, timeCol: String, keyCol: String, valueCol: String,
                keys: Seq[String] = Nil): DataFrame = {
    val g = long.groupBy(col(timeCol))
    val p = if (keys.nonEmpty) g.pivot(keyCol, keys) else g.pivot(keyCol)
    p.agg(first(col(valueCol)))
  }

  /** R2: wide -> long unpivot for warehouse insert.
    * ref: outputs/extract_water_level.py:75-78 (per-column loop).
    * Uses the native `unpivot` (Spark 3.4+) which plans as a single Expand — no
    * shuffle, no N-pass scan. */
  def unpivotLong(wide: DataFrame, idCols: Seq[String],
                  varCol: String = "station", valueCol: String = "value"): DataFrame =
    wide.unpivot(idCols.map(col).toArray, varCol, valueCol)

  /** F7: deterministic 64-hex series/content id from metadata columns — the engine's
    * replacement for the adapter's `generate_timeseries_id` (SURVEY.md §0.1; id shape
    * visible at inputs/configs/tide_config.json:5). Content-hash ids need no central
    * id-allocator, so dimension get-or-create is coordination-free on a cluster. */
  def seriesId(cols: Column*): Column = sha2(concat_ws(":", cols: _*), 256)

  /** As-of join (point-in-time lookup): for every left row, the LATEST right row
    * with the same key and `rightTime <= leftTime` (within `toleranceSeconds` if
    * given). The reference approximates this with dense-spine alignment (J1); this
    * is the general, scale-path form.
    *
    * Implementation: tag + union both sides, ONE sort per key partition, forward-fill
    * the right-side values with `last(ignoreNulls)` — a single shuffle on the key,
    * no range-join explosion, no per-row binary search. At equal timestamps the
    * right row sorts first, so a same-instant right row is visible to the left row.
    * Right value columns are returned with their own names; both inputs must share
    * ONLY `keyCols` + `timeCol`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               timeCol: String, toleranceSeconds: Long = -1L): DataFrame = {
    val rightVals = right.columns.filterNot((keyCols :+ timeCol).contains).toSeq
    val leftVals = left.columns.filterNot((keyCols :+ timeCol).contains).toSeq
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rt", lit(null).cast("timestamp_ntz"))
    val r = right.withColumn("__side", lit(0))
      .withColumn("__rt", col(timeCol).cast("timestamp_ntz"))
    val lAligned = l.select((keyCols :+ timeCol).map(col) ++
      leftVals.map(col) ++ rightVals.map(c => lit(null).cast(
        right.schema(c).dataType).as(c)) ++ Seq(col("__side"), col("__rt")): _*)
    val rAligned = r.select((keyCols :+ timeCol).map(col) ++
      leftVals.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      rightVals.map(col) ++ Seq(col("__side"), col("__rt")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lAligned.unionByName(rAligned)
      .withColumn("__lastRt", last(col("__rt"), ignoreNulls = true).over(w))
    val withVals = rightVals.foldLeft(filled)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    val tolerated = if (toleranceSeconds >= 0) {
      val stale = col("__lastRt").isNull ||
        (unix_micros(col(timeCol).cast("timestamp")) -
          unix_micros(col("__lastRt").cast("timestamp"))) >
          toleranceSeconds * 1000000L
      rightVals.foldLeft(withVals)((d, c) =>
        d.withColumn(c, when(stale, lit(null)).otherwise(col(c))))
    } else withVals
    tolerated.filter(col("__side") === 1)
      .withColumnRenamed("__lastRt", "asof_time")
      .drop("__side", "__rt")
  }

  /** W3: prioritized coalesce across neighbor series (gap-fill cascade from 1st then
    * 2nd nearest neighbor). `neighbors` maps key -> (n1key, n2key); series is long
    * layout. ref: inputs/gen_mike_input_rf_linux_all_stations_raw.py:277-284.
    * Two self-joins on (neighborKey, time); the neighbor map is tiny -> broadcast,
    * and the series side joins are on the same (key, time) layout so AQE can reuse
    * the exchange. */
  def neighborCoalesce(series: DataFrame, neighbors: DataFrame,
                       keyCol: String, timeCol: String, valueCol: String): DataFrame = {
    val n1 = series.select(col(keyCol).as("__n1k"), col(timeCol).as("__t1"),
      col(valueCol).as("__v1"))
    val n2 = series.select(col(keyCol).as("__n2k"), col(timeCol).as("__t2"),
      col(valueCol).as("__v2"))
    series
      .join(broadcast(neighbors), Seq(keyCol), "left")
      .join(n1, col("n1") === col("__n1k") && col(timeCol) === col("__t1"), "left")
      .join(n2, col("n2") === col("__n2k") && col(timeCol) === col("__t2"), "left")
      .withColumn(valueCol, coalesce(col(valueCol), col("__v1"), col("__v2")))
      .drop("__n1k", "__t1", "__v1", "__n2k", "__t2", "__v2", "n1", "n2")
  }
}
