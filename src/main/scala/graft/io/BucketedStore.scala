package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed catalog tables for CO-LOCATED corpus-scale joins — the storage
  * half of the incremental-maintenance story: a daily admission tick joins
  * the persisted dedup labels / PQ codes / doc stats on the id key every
  * tick, and on an unbucketed lake each tick re-shuffles the whole corpus to
  * meet a batch one thousandth its size. Saving the corpus frame bucketed
  * (hash-partitioned into `nBuckets` files) and sorted BY the join key makes
  * that join exchange-free and sort-free on the corpus side forever after:
  * Spark's scan reports the bucketing as the output partitioning, so only
  * the batch side shuffles — per-tick cost goes from O(corpus) bytes moved
  * to O(batch).
  *
  * Two frames saved with the SAME key and bucket count co-locate: their
  * mutual join moves zero rows. `nBuckets` is the layout's parallelism dial
  * — pick ~corpus bytes / 128 MB at write time (buckets are the minimum
  * read granularity until AQE coalescing splits by row ranges).
  *
  * The one-file-per-bucket `repartition` matters: Spark only trusts the
  * per-bucket SORT (eliding the merge-join sort) when each bucket holds a
  * single file, and appends would break that — hence `overwrite`-only; for
  * rolling appends, compose with `VersionedFactStore`-style ticks and
  * re-bucket on compaction. */
object BucketedStore {

  def save(df: DataFrame, table: String, keyCol: String,
           nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = df.sparkSession
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    if (!catalog.tableExists(ident)) {
      // Overwrite only cleans locations the CATALOG knows about. A killed run
      // under a non-persistent metastore leaves the managed directory on disk
      // with no catalog entry, and the next save dies with
      // LOCATION_ALREADY_EXISTS — publish must be restart-idempotent, so a
      // stale unregistered location is cleared before writing.
      val loc = new org.apache.hadoop.fs.Path(catalog.defaultTablePath(ident))
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.repartition(nBuckets, col(keyCol))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(table)
  }

  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
