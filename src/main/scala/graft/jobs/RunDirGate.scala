package graft.jobs

import java.nio.file.{Files, Path, Paths}
import java.time.{Duration, Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The cron front-gate of the output-extraction pipeline (T3; SURVEY §2.7) —
  * re-expressing `outputs/extract_mike_data_to_db.sh:5-32`:
  *
  *  1. "today" is the current DATE in the reference deployment's UTC+5:30
  *     timezone (`date -u -d '+5 hour +30 min' '+%F'`, ref line 5);
  *  2. candidate run directories are those named `<today>*` under the outputs
  *     root (`find -name "$today"\*`, ref line 6);
  *  3. a directory is processed only when its result CSV was modified less
  *     than `maxAgeMinutes` ago — shell integer-minute arithmetic,
  *     `(CURRENT-FILE_MODIFIED_TIME)/60 < 40` (ref lines 15-21);
  *  4. the forecast-generated time is parsed FROM THE DIRECTORY NAME:
  *     basename split on '_' → date + 'H-M-S', dashes to colons
  *     (ref lines 23-33), yielding `"yyyy-MM-dd H:M:S"`.
  *
  * Directory selection is deliberately driver-side (like the reference's find
  * loop): the candidate set is run-sized (dozens), not data-sized. The
  * data-sized analog for multi-directory scans is `fgtFromPath`, which
  * derives the same fgt per ROW from `input_file_name()` inside the scan. */
object RunDirGate {

  /** One admitted run directory: its path, the result CSV inside it, and the
    * fgt parsed from the directory name. */
  case class RunDir(dir: String, resultCsv: String, fgt: String)

  /** `date -u -d '+5 hour +30 min' '+%F'` — the deployment-local calendar
    * date (ref line 5). */
  def today(nowMs: Long, utcOffsetMinutes: Int = 330): String =
    Instant.ofEpochMilli(nowMs).plus(Duration.ofMinutes(utcOffsetMinutes))
      .atOffset(ZoneOffset.UTC).toLocalDate
      .format(DateTimeFormatter.ISO_LOCAL_DATE)

  /** `"$dir" | grep -oE "[^//]+$"` then the '_'/'-' splits of ref lines 23-33.
    * None when the basename doesn't carry a `date_H-M-S` prefix (the reference
    * would emit a malformed fgt and fail downstream; skipping is the safe
    * re-expression). */
  def fgtFromDirname(basename: String): Option[String] = {
    val parts = basename.split('_')
    if (parts.length < 2) return None
    val t = parts(1).split('-')
    if (!parts(0).matches("[0-9]{4}-[0-9]{2}-[0-9]{2}") || t.length < 3 ||
      !t.take(3).forall(_.matches("[0-9]{1,2}"))) None
    else Some(s"${parts(0)} ${t(0)}:${t(1)}:${t(2)}")
  }

  /** Run directories that pass the reference gate, sorted by path for
    * deterministic processing order. `nowMs`/`todayOverride` are injectable so
    * the gate is testable against a fixture tree (and so callers replaying
    * history can pin the reference wall-clock). Directories without the result
    * file are skipped — same outcome as the reference, where the unset mtime
    * makes the age test fail. */
  def freshRunDirs(outputsRoot: String,
                   resultFile: String = "resmike11_WL.csv",
                   maxAgeMinutes: Long = 40L,
                   nowMs: Long = System.currentTimeMillis(),
                   todayOverride: Option[String] = None,
                   utcOffsetMinutes: Int = 330): Seq[RunDir] = {
    val root = Paths.get(outputsRoot)
    if (!Files.isDirectory(root)) return Seq.empty
    val day = todayOverride.getOrElse(today(nowMs, utcOffsetMinutes))
    val stream = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith(day))
        .flatMap { dir =>
          val csv = dir.resolve(resultFile)
          for {
            mtime <- mtimeSec(csv)
            // shell integer-minute arithmetic: (CURRENT - FILE_MODIFIED_TIME)/60
            if (nowMs / 1000L - mtime) / 60L < maxAgeMinutes
            fgt <- fgtFromDirname(dir.getFileName.toString)
          } yield RunDir(dir.toString, csv.toString, fgt)
        }
        .toSeq.sortBy(_.dir)
    } finally stream.close()
  }

  private def mtimeSec(p: Path): Option[Long] =
    if (Files.isRegularFile(p)) Some(Files.getLastModifiedTime(p).toMillis / 1000L)
    else None

  /** Data-sized analog of the dirname parse for multi-directory scans: derive
    * each row's fgt from `input_file_name()` with one codegen'd
    * regexp_extract over the path — no per-directory driver loop, so a
    * thousand run directories read as ONE distributed scan. Yields null for
    * paths without a `date_H-M-S` directory component. */
  def fgtFromPath(path: Column): Column = {
    val re = "([0-9]{4}-[0-9]{2}-[0-9]{2})_([0-9]{1,2})-([0-9]{1,2})-([0-9]{1,2})[^/]*/"
    when(regexp_extract(path, re, 1) =!= "",
      concat(
        regexp_extract(path, re, 1), lit(" "),
        regexp_extract(path, re, 2), lit(":"),
        regexp_extract(path, re, 3), lit(":"),
        regexp_extract(path, re, 4)))
  }
}
