package graft.jobs

import java.nio.file.{Files, Path, Paths}
import java.time.Instant
import java.time.temporal.ChronoUnit

import scala.jdk.CollectionConverters._

/** Operational semantics of the reference's shell orchestration (SURVEY.md §2.1/§2.9):
  * idempotence gates and TTL retention. Driver-side utilities — they manage job
  * artifacts, not the distributed data path. */
object Maintenance {

  /** S13: idempotence gate — skip a job tick whose output already exists
    * (ref: inputs/gen_mike_input_rf_linux.py:271-280). Returns true if the job
    * should run. */
  def shouldRun(outputPath: String): Boolean = !Files.exists(Paths.get(outputPath))

  /** Run `job` only if `outputPath` is absent; returns whether it ran. */
  def runIdempotent(outputPath: String)(job: => Unit): Boolean =
    if (shouldRun(outputPath)) { job; true } else false

  /** S14/T7: TTL retention — delete artifacts older than `ttlDays` under `dir`
    * (ref: flush_mike_data_in_bucket.sh:20-24, 60-day monthly flush). Returns the
    * deleted paths. Age is by last-modified time, like `find -mtime`. */
  def flushOlderThan(dir: String, ttlDays: Long,
                     now: Instant = Instant.now()): Seq[Path] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return Nil
    val cutoff = now.minus(ttlDays, ChronoUnit.DAYS)
    val doomed = Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filter(p => Files.getLastModifiedTime(p).toInstant.isBefore(cutoff))
      .toSeq
    doomed.foreach(Files.delete)
    doomed
  }
}
