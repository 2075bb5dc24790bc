package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tick-versioned perceptual-signature store — the media admission gate's
  * persistent state (`MediaCurationJob`), maintained with the
  * `VersionedFactStore` discipline instead of an ad-hoc external union:
  *
  *  - WRITE (idempotent): each curation tick lands its survivor signatures
  *    under a `tick=<id>/` partition via DYNAMIC partition overwrite —
  *    replaying a tick replaces exactly its own partition with identical
  *    content (the signatures are a pure function of the tick's inputs),
  *    never appends duplicates, never touches other ticks.
  *  - READ: the store is the plain union of the tick partitions. Signature
  *    rows are immutable facts with no version to resolve, so there is no
  *    latest-wins window — and transient DUPLICATES (from a crashed
  *    compaction's publish/retire window, or a replayed pre-compaction
  *    tick) are semantically harmless by construction: every consumer
  *    (`simhashBandMatchesBetween`'s corpus collapse, the banded frame's
  *    min-id contraction, `videoAdmissionMatchesFromSigs`' distinct)
  *    collapses identical signatures before matching.
  *  - COMPACT: ticks older than the newest `keepTicks` fold into ONE
  *    distinct base written into the newest folded tick's own partition,
  *    with `VersionedFactStore.compact`'s crash-safe three-step publish
  *    (STAGE out-of-tree → PUBLISH by rename beside the originals →
  *    RETIRE shadowed files and older dirs). A crash between any two steps
  *    leaves duplicates or stale dirs — both read-correct — and the next
  *    run absorbs them. A year of daily media ticks stops costing 365
  *    partition dirs of small files.
  */
object SignatureStore {

  /** Idempotent tick append: the tick's signature frame (any schema with a
    * `media_id` — image/audio (media_id, phash) or video (media_id, fsig))
    * lands under its own `tick=<id>` partition. */
  def appendTick(sigs: DataFrame, dir: String, tickId: String): Unit =
    sigs.withColumn("tick", lit(tickId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("tick")
      .parquet(dir)

  /** The full store as the admission gates consume it (tick column dropped). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("tick")

  final case class CompactReport(ticksBefore: Int, ticksAfter: Int)

  /** Fold every tick older than the newest `keepTicks` into one distinct
    * base partition. Read-transparent at every step (see object doc). */
  def compact(spark: SparkSession, dir: String,
              keepTicks: Int): CompactReport = {
    require(keepTicks >= 1, s"keepTicks must be >= 1, got $keepTicks")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(path, ".compact_staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    def tickDirs(): Seq[org.apache.hadoop.fs.Path] = fs.listStatus(path)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("tick="))
      .map(_.getPath)
      .sortBy(p => java.net.URLDecoder.decode(p.getName.stripPrefix("tick="),
        "UTF-8"))
      .toSeq
    val before = tickDirs()
    if (before.length <= keepTicks)
      return CompactReport(before.length, before.length)
    val folded = before.dropRight(keepTicks)
    val target = folded.last // base partition = newest folded tick's dir
    // 1. STAGE the distinct base out-of-tree (`tick` lives in the dir name,
    // exactly appendTick's layout)
    spark.read.option("basePath", dir).parquet(folded.map(_.toString): _*)
      .drop("tick").distinct()
      .write.mode("overwrite").parquet(staging.toString)
    val preExisting = fs.listStatus(target).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    // 2. PUBLISH beside the originals under names no task writer produces
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val staged = fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    staged.zipWithIndex.foreach { case (p, i) =>
      val dest = new org.apache.hadoop.fs.Path(
        target, f"compact-$stamp-part$i%05d.parquet")
      require(fs.rename(p, dest), s"compact publish rename failed: $p -> $dest")
    }
    // 3. RETIRE the shadowed files and the older tick dirs
    preExisting.foreach(p => fs.delete(p, false))
    folded.dropRight(1).foreach(p => fs.delete(p, true))
    fs.delete(staging, true)
    CompactReport(before.length, tickDirs().length)
  }
}
