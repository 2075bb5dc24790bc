package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lake-native versioned fact store — the 100 TB analog of the JDBC warehouse
  * (S11/T4/T5 semantics on parquet): a relational upsert sink cannot hold 100 TB
  * of forecast facts, so ticks land as immutable fgt-partitioned parquet deltas
  * and version resolution moves to read time.
  *
  *  - WRITE (T4 idempotent): each tick writes its rows under `fgt=<ts>/`
  *    partitions with DYNAMIC partition overwrite — re-running a tick replaces
  *    exactly its own partitions, never appends duplicates and never touches
  *    other ticks. No coordination, no transaction log needed for this contract.
  *  - READ latest: "highest fgt wins per (tms_id, time)" — one window. The
  *    `asOf` variant filters `fgt <= t` FIRST, so partition pruning drops every
  *    newer tick's files before any row is read (time travel priced at planning
  *    time, like the date-partitioned layout in WarehouseLayoutSpec).
  *  - T5 read pattern: latest fgt per series is a plain aggregate over the
  *    pruned fact files — the run-dim lookup without a run table when the
  *    warehouse is the lake.
  *
  * Compaction (rewriting latest-wins into a base layout) composes from
  * `readLatest` + a partitioned write and is deliberately left to the operator
  * schedule, like the reference's retention cron. */
object VersionedFactStore {

  /** Idempotent tick append: dynamic overwrite of the tick's own fgt partitions. */
  def appendTick(facts: DataFrame, dir: String): Unit =
    facts.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("fgt")
      .parquet(dir)

  private def latestWins(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("tms_id"), col("time"))
      .orderBy(col("fgt").desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Latest version of every (tms_id, time) fact. */
  def readLatest(spark: SparkSession, dir: String): DataFrame =
    latestWins(spark.read.parquet(dir))

  /** Time travel: the warehouse as it stood when `fgt <= asOfFgt` — the filter
    * sits on the partition column, so newer ticks are pruned at the file index. */
  def readAsOf(spark: SparkSession, dir: String, asOfFgt: String): DataFrame =
    latestWins(spark.read.parquet(dir)
      .filter(col("fgt") <= lit(asOfFgt).cast("timestamp_ntz")))

  /** T5 read pattern: latest forecast-generation time per series. */
  def latestFgtPerSeries(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("tms_id"))
      .agg(max(col("fgt")).as("latest_fgt"))

  /** Compaction outcome: tick/file counts around the fold. */
  final case class CompactReport(ticksBefore: Int, ticksAfter: Int,
                                 filesBefore: Int, filesAfter: Int)

  /** Tick-folding compaction — the maintenance move the store's write
    * contract defers: every tick older than the newest `keepTicks` is folded
    * into ONE base partition (latest-wins resolved, sized to `targetBytes`
    * files), and the superseded per-tick partitions are removed. A year of
    * hourly ticks stops costing 8 760 partition dirs of small files.
    *
    * READ-TRANSPARENT at every step, which is what makes it safe to run
    * while readers are live: the base is written INTO the newest folded
    * tick's partition (fgt = that tick) via the same dynamic overwrite as
    * `appendTick`, so from the moment it lands, every folded row exists at
    * fgt = cutoff and `latestWins` resolves base-vs-original duplicates to
    * identical values; deleting the older partition dirs afterwards removes
    * only shadowed rows. `readLatest`'s FACTS are bit-identical before,
    * during, and after (folded rows report fgt = cutoff — their provenance
    * tick no longer exists); `readAsOf(t >= cutoff)` likewise. The one semantic loss is BY
    * DESIGN and priced explicitly: time travel BELOW the compaction horizon
    * is gone — every folded row now carries fgt = cutoff, so `asOf(t <
    * cutoff)` matches no partition and returns empty. Retention policy
    * decides `keepTicks`, exactly like the reference's TTL cron
    * (flush_mike_data_in_bucket.sh) decides what history survives.
    *
    * Partition values are never re-formatted driver-side: the fold set is
    * chosen by sorting the ESCAPED `fgt=` dir names' decoded values (ISO
    * timestamps sort lexicographically), and the base lands in the newest
    * folded tick's OWN partition dir, so no fgt value is ever re-encoded.
    *
    * CRASH-SAFE PUBLISH. `appendTick`'s dynamic overwrite is the wrong tool
    * here: its commit deletes the target partition's files before all staged
    * replacements are renamed in, and compaction's INPUT IS that partition —
    * a driver death inside the commit window destroys rows whose only other
    * copies the fold was about to delete, and a re-run reads the damaged
    * store. (appendTick itself is safe under the same window because a tick's
    * rows come from OUTSIDE the store — the caller's retry rewrites them.)
    * The fold therefore publishes in three fs-level steps, each of whose
    * intermediate states is both read-correct and heal-by-rerun:
    *   1. STAGE   — write the complete base to `.compact_staging/` (dot-dir,
    *                invisible to readers); a crashed run's staging is deleted
    *                on entry and rebuilt from the current readable state.
    *   2. PUBLISH — rename the staged files INTO the target partition beside
    *                the originals. Until retire, every base row duplicates a
    *                still-present original at the same (tms_id, time, fgt)
    *                with identical values, so `latestWins` reads are
    *                unchanged — and pre-horizon time travel still works.
    *   3. RETIRE  — only with the complete base in place, delete the
    *                partition's pre-publish files and the older tick dirs.
    * A crash between any two steps leaves duplicates or stale dirs, never a
    * missing row; the next compact run absorbs and removes them. */
  def compact(spark: SparkSession, dir: String, keepTicks: Int,
              targetBytes: Long = 128L * 1024 * 1024): CompactReport = {
    require(keepTicks >= 1, s"keepTicks must be >= 1, got $keepTicks")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(path, ".compact_staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    def tickDirs(): Seq[org.apache.hadoop.fs.Path] = fs.listStatus(path)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("fgt="))
      .map(_.getPath)
      .sortBy(p => java.net.URLDecoder.decode(p.getName.stripPrefix("fgt="),
        "UTF-8"))
      .toSeq
    def fileCount(): Int = {
      val it = fs.listFiles(path, true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val before = tickDirs()
    val filesBefore = fileCount()
    if (before.length <= keepTicks)
      return CompactReport(before.length, before.length, filesBefore, filesBefore)
    val folded = before.dropRight(keepTicks)
    val target = folded.last // base partition = newest folded tick's dir
    val foldedBytes = folded.map(p => fs.getContentSummary(p).getLength).sum
    val nFiles = math.max(1L, (foldedBytes + targetBytes - 1) / targetBytes).toInt
    val old = spark.read.option("basePath", dir)
      .parquet(folded.map(_.toString): _*)
    // 1. STAGE the complete base out-of-tree. `fgt` is dropped from the data
    // files — the partition dir carries it, the exact layout appendTick's
    // partitionBy produces (every folded row's winning fgt IS target's value).
    latestWins(old).drop("fgt").repartition(nFiles)
      .write.mode("overwrite").parquet(staging.toString)
    // Record the partition's pre-publish files: the originals, plus any
    // partial base a previously crashed publish left behind.
    val preExisting = fs.listStatus(target).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    // 2. PUBLISH beside the originals, under names no task writer produces
    // and no retry reuses.
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val staged = fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    staged.zipWithIndex.foreach { case (p, i) =>
      val dest = new org.apache.hadoop.fs.Path(
        target, f"compact-$stamp-part$i%05d.parquet")
      require(fs.rename(p, dest), s"compact publish rename failed: $p -> $dest")
    }
    // 3. RETIRE the shadowed files and the older tick dirs.
    preExisting.foreach(p => fs.delete(p, false))
    folded.dropRight(1).foreach(p => fs.delete(p, true))
    fs.delete(staging, true)
    CompactReport(before.length, tickDirs().length, filesBefore, fileCount())
  }
}
