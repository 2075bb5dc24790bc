package graft.ops

import graft.functions.TopKAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top-k rows per group — the aggregate (scale) form of W1.
  *
  * `row_number().over(partitionBy(g).orderBy(...))` (the window form, q07)
  * shuffles the whole corpus and sorts every group; this form keeps a
  * k-bounded buffer per group inside a hash aggregate, so partial aggregation
  * reduces map-side and the shuffle carries at most k rows per (group,
  * mapper). Same row set, proven by the shared q07/q63 oracle and the
  * partition-invariance spec. */
object TopK {

  /** Top-k per group by (`sortKey` DESC, `tie` ASC). Both must be LONG
    * (scaled-integer convention for float keys); `tie` should be unique
    * within a group for a total order. `payload` columns ride along to the
    * output, which carries groupCols + rn (1-based) + payload + __sort/__tie. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], sortKey: Column,
                   tie: Column, payload: Seq[Column], k: Int): DataFrame = {
    TopKAgg.register(df.sparkSession)
    val st = struct(
      (sortKey.cast("long").as("__sort") +: tie.cast("long").as("__tie") +:
        payload): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(TopKAgg(st, k).as("__top"))
      .select((groupCols.map(col) :+
        posexplode(col("__top")).as(Seq("__pos", "__row"))): _*)
      .select((groupCols.map(col) ++
        Seq((col("__pos") + 1).cast("int").as("rn"), col("__row.*"))): _*)
  }
}
