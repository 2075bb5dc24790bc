package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe interval joins. A naive `a JOIN b ON a.t BETWEEN b.lo AND b.hi`
  * has no equi-key, so Spark plans a BroadcastNestedLoopJoin — every point
  * against every interval, quadratic and memory-fragile (the exact plan shape
  * PlanAuditSpec bans).
  *
  * The bucketed form restores an equi-key: intervals are exploded onto a coarse
  * grid (one row per `bucketWidth` cell they overlap), points map to their single
  * cell, and the join runs hash-partitioned on the cell id with the exact
  * containment predicate applied inside. Work is proportional to
  * Σ per-cell points × per-cell intervals — local density, not corpus². Pick
  * `bucketWidth` near the typical interval length: amplification =
  * avg(interval/bucketWidth + 1) rows per interval, while smaller buckets mean
  * fewer false candidates per cell.
  */
object RangeJoin {

  /** Point-in-interval join: rows of `points` paired with every row of
    * `intervals` whose [loCol, hiCol] contains pointCol (inclusive both ends).
    * All three columns must be numeric (cast timestamps to epoch first).
    * Output: all point columns + all interval columns. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val cells = intervals.withColumn("__cell",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val probed = points.withColumn("__cell",
      floor(col(pointCol) / bucketWidth).cast("long"))
    probed.join(cells, Seq("__cell"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__cell")
  }
}
