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
  *    never appends duplicates, never touches other ticks. Every row also
  *    carries `src_tick` (= the writing tick) as a DATA column: the row's
  *    provenance survives compaction, which re-homes rows into the reserved
  *    fold partition and would otherwise erase the tick<->row identity that
  *    crash-heal replays depend on (a replayed tick must be able to exclude
  *    ITS OWN rows from the admission probe wherever they now live, and must
  *    never hide or overwrite OTHER ticks' folded rows).
  *  - READ: the store is the plain union of the partitions. Signature rows
  *    are immutable facts with no version to resolve, so there is no
  *    latest-wins window — and transient DUPLICATES (from a crashed
  *    compaction's publish/retire window, or a replayed already-folded
  *    tick re-landing its partition beside its folded copies) are
  *    semantically harmless by construction: every consumer
  *    (`simhashBandMatchesBetween`'s corpus collapse, the banded frame's
  *    min-id contraction, `videoAdmissionMatchesFromSigs`' distinct)
  *    collapses identical signatures before matching, and the next
  *    compaction's `distinct()` absorbs them physically.
  *  - COMPACT: real ticks older than the newest `keepTicks` fold — together
  *    with any previous fold — into ONE distinct base under the RESERVED
  *    `tick=__folded__` partition (a name `appendTick` refuses, so no tick's
  *    dynamic overwrite can ever clobber folded history), with
  *    `VersionedFactStore.compact`'s crash-safe three-step publish (STAGE
  *    out-of-tree → PUBLISH by rename beside the originals → RETIRE shadowed
  *    files and the folded tick dirs). A crash between any two steps leaves
  *    duplicates or stale dirs — both read-correct — and the next run
  *    absorbs them. "Newest" is by partition-directory modification time
  *    (tie-break: tick id), NOT lexicographic id order — daily ids like
  *    `out2` vs `out10` sort wrong as strings, and folding the newest ticks
  *    would put still-heal-eligible ticks beyond their replay window. A year
  *    of daily media ticks stops costing 365 partition dirs of small files.
  */
object SignatureStore {

  /** Reserved partition the compactor folds into; never a tick's own id. */
  val FoldedTick = "__folded__"

  /** Idempotent tick append: the tick's signature frame (any schema with a
    * `media_id` — image/audio (media_id, phash) or video (media_id, fsig))
    * lands under its own `tick=<id>` partition, each row stamped with
    * `src_tick = tickId` so its provenance survives compaction. */
  def appendTick(sigs: DataFrame, dir: String, tickId: String): Unit = {
    require(tickId.nonEmpty && tickId != FoldedTick,
      s"tickId '$tickId' is reserved/empty")
    sigs.withColumn("src_tick", lit(tickId))
      .withColumn("tick", lit(tickId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("tick")
      .parquet(dir)
  }

  /** The full store as the admission gates consume it (bookkeeping columns
    * dropped). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("tick", "src_tick")

  /** The store MINUS `tickId`'s own rows — the admission view for a
    * crash-heal replay of that tick (store appended, marker missing): the
    * tick must not find its own signatures and self-reject. Exclusion is by
    * the `src_tick` DATA column, so it holds even after the row was folded
    * out of its original partition; the redundant partition-column filter
    * prunes the tick's own directory from the scan in the common unfolded
    * case. */
  def readExcluding(spark: SparkSession, dir: String,
                    tickId: String): DataFrame =
    spark.read.parquet(dir)
      .filter(col("tick") =!= tickId && col("src_tick") =!= tickId)
      .drop("tick", "src_tick")

  final case class CompactReport(ticksBefore: Int, ticksAfter: Int)

  /** Fold every real tick older than the newest `keepTicks` (by partition
    * mtime), plus any existing fold, into one distinct base under
    * `tick=__folded__`. Read-transparent at every step (see object doc). */
  def compact(spark: SparkSession, dir: String,
              keepTicks: Int): CompactReport = {
    require(keepTicks >= 1, s"keepTicks must be >= 1, got $keepTicks")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(path, ".compact_staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    def tickName(p: org.apache.hadoop.fs.Path): String =
      java.net.URLDecoder.decode(p.getName.stripPrefix("tick="), "UTF-8")
    def partDirs(): Seq[org.apache.hadoop.fs.FileStatus] = fs.listStatus(path)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("tick="))
      .toSeq
    val (foldBase, realTicks0) =
      partDirs().partition(s => tickName(s.getPath) == FoldedTick)
    // oldest-first by dir mtime (a replayed tick's rewrite refreshes its
    // mtime, pushing it back inside the keep window — exactly right: it is
    // demonstrably still live), tie-break by id for determinism
    val realTicks = realTicks0
      .sortBy(s => (s.getModificationTime, tickName(s.getPath))).map(_.getPath)
    if (realTicks.length <= keepTicks)
      return CompactReport(realTicks.length, realTicks.length)
    val foldedTicks = realTicks.dropRight(keepTicks)
    val sources = foldBase.map(_.getPath) ++ foldedTicks
    val target = new org.apache.hadoop.fs.Path(path, s"tick=$FoldedTick")
    // 1. STAGE the distinct base out-of-tree. `tick` lives in the dir name
    // and is recomputed from the target's; `src_tick` is a data column and
    // rides along — provenance survives the fold.
    spark.read.option("basePath", dir).parquet(sources.map(_.toString): _*)
      .drop("tick").distinct()
      .write.mode("overwrite").parquet(staging.toString)
    if (!fs.exists(target)) fs.mkdirs(target)
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
    // 3. RETIRE the shadowed files and the folded tick dirs
    preExisting.foreach(p => fs.delete(p, false))
    foldedTicks.foreach(p => fs.delete(p, true))
    fs.delete(staging, true)
    CompactReport(realTicks.length, keepTicks)
  }
}
