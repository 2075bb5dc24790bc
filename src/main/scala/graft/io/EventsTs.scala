package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** THE schema seam for the events table's time column.
  *
  * `events.parquet` has shipped with two physical encodings across testdata
  * generations:
  *   - parquet TIMESTAMP(NANOS) — Spark only reads it under
  *     `spark.sql.legacy.parquet.nanosAsLong`, as a nanos-epoch LONG;
  *   - plain `timestamp[us]` — Spark reads it as TIMESTAMP_NTZ.
  *
  * Every engine consumer normalizes through here to ONE canonical form — a
  * nanos-epoch long — so downstream integer time math (`ts div 1000`,
  * right-closed bucketing, gap windows) is encoding-independent. The DuckDB
  * oracle side needs no dial: `CAST(ts AS TIMESTAMP)` is valid for both
  * encodings there.
  *
  * The session time zone is pinned UTC everywhere (Bench/Verify/SparkSpec), so
  * the NTZ→TZ cast below is value-preserving; `unix_micros` then recovers the
  * exact stored micros. The added projection is a codegen'd map over the scan —
  * column pruning still drops `ts` when unused, and non-`ts` filter pushdown is
  * unaffected, so the seam is free at 100 TB.
  */
object EventsTs {

  /** Normalize `colName` to a nanos-epoch long, whatever the physical encoding.
    * No-op when the column is already a long (or absent). */
  def toNanosLong(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema.fields.find(_.name == colName).map(_.dataType) match {
      case Some(LongType) | None => df
      case Some(_) =>
        df.withColumn(colName,
          unix_micros(col(colName).cast("timestamp")) * lit(1000L))
    }

  /** Physical schema of the events files actually present in `dir` — file-source
    * streams require an explicit schema, and hardcoding one is exactly the
    * assumption this seam exists to remove. One driver-side footer read. */
  def streamSchema(spark: SparkSession, dir: String): StructType =
    spark.read.option("pathGlobFilter", "events*.parquet").parquet(dir).schema
}
