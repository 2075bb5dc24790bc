package graft.jobs

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import graft.io.MikeCsv
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CLI for the obs-window rainfall generator (SURVEY.md §3.5) — the engine's
  * `inputs/gen_mike_input_rf_obs_win.py`: observed rainfall over any window at
  * any N-minute frequency, station-name wide matrix, blank cells for gaps.
  *
  * Config JSON:
  * {
  *   "series_path": "<parquet (hash_id, time, value) raw obs>",
  *   "stations_csv": "<csv hash_id,station_id,station_name,latitude,longitude>",
  *   "output_dir": "<dir>", "output_file_name": "<optional>"
  * }
  * Usage: ObsRainfallInputJob <config.json> [-s "..."] [-e "..."] [-t N]
  *
  * CLI surface matches the reference (ref :216-253): -s/-e default to 00:00:00
  * three days back / two days ahead, -t defaults to 15 and must be a multiple
  * of 5 (ref :252-255); start/end must sit on a full hour (minutes and seconds
  * '00', ref :85-96). The default output name is the reference's
  * `mike_rf_obs_{start}_{end}_{step}.txt` with spaces/colons mangled
  * (ref :261), and an existing output file skips the run (S13, ref :265-273). */
object ObsRainfallInputJob {

  val stationSchema: StructType = StructType(Seq(
    StructField("hash_id", StringType, nullable = false),
    StructField("station_id", IntegerType, nullable = false),
    StructField("station_name", StringType, nullable = false),
    StructField("latitude", DoubleType, nullable = false),
    StructField("longitude", DoubleType, nullable = false)))

  private val Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** ref :85-96: window timestamps must be exact hours. */
  def validateHourTs(ts: String): Unit = {
    val t = LocalDateTime.parse(ts.replace(' ', 'T'))
    require(t.getSecond == 0, s"Seconds should be always 00: $ts")
    require(t.getMinute == 0, s"Minutes should be always 00: $ts")
  }

  /** ref :240-247: default window = [today-3d 00:00, today+2d 00:00]. */
  def defaultWindow(now: LocalDateTime): (String, String) = (
    now.minusDays(3).toLocalDate.atStartOfDay.format(Fmt),
    now.plusDays(2).toLocalDate.atStartOfDay.format(Fmt))

  /** ref :261: `'mike_rf_obs_{start}_{end}_{step}.txt'` with " "->"_", ":"->"-". */
  def defaultFileName(start: String, end: String, step: Int): String =
    s"mike_rf_obs_${start}_${end}_$step.txt".replace(" ", "_").replace(":", "-")

  def parseArgs(args: Array[String]): (String, Option[String], Option[String], Int) = {
    val m = args.drop(1).sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    (args(0), m.get("-s"), m.get("-e"), m.get("-t").map(_.trim.toInt).getOrElse(15))
  }

  def main(args: Array[String]): Unit = {
    val (cfgPath, sOpt, eOpt, step) = parseArgs(args)
    val (defS, defE) = defaultWindow(LocalDateTime.now())
    val (start, end) = (sOpt.getOrElse(defS), eOpt.getOrElse(defE))
    sOpt.foreach(validateHourTs)
    eOpt.foreach(validateHourTs)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, cfgPath, start, end, step)
    finally spark.stop()
  }

  /** Returns whether the tick ran (false = output already present, S13). */
  def run(spark: SparkSession, cfgPath: String, start: String, end: String,
          step: Int): Boolean = {
    require(step % 5 == 0, "Time step should be a multiple of 5.")
    val cfg = spark.read.option("multiLine", true).json(cfgPath).first()
    def opt(f: String): Option[String] =
      if (cfg.schema.fieldNames.contains(f) && !cfg.isNullAt(cfg.fieldIndex(f)) &&
        cfg.getString(cfg.fieldIndex(f)).nonEmpty)
        Some(cfg.getString(cfg.fieldIndex(f)))
      else None
    val outPath = opt("output_dir").getOrElse(".") + "/" +
      opt("output_file_name").getOrElse(defaultFileName(start, end, step))
    Maintenance.runIdempotent(outPath) {
      val stations = MikeCsv.readDimCsv(spark,
        cfg.getAs[String]("stations_csv"), stationSchema)
      // column order = stations-CSV row order, like the reference's insertion-
      // ordered station_dict merge loop (dim-scale collect). limit(n+1)-guarded
      // like the other driver-side scalars: a mis-pointed config (series file
      // as stations_csv) must fail loudly, not OOM the driver
      val order = {
        val rows = stations.select(col("station_name")).limit(10001).collect()
        require(rows.length <= 10000,
          s"stations_csv has > 10000 rows — expected a dim-scale station list; " +
            s"is a series file pointed at stations_csv?")
        rows.map(_.getString(0)).toSeq
      }
      // readings contributing to right-closed buckets labeled in [start, end]
      val series = spark.read.parquet(cfg.getAs[String]("series_path"))
        .filter(col("time") > lit(start).cast("timestamp_ntz") -
          expr(s"interval $step minutes") &&
          col("time") <= lit(end).cast("timestamp_ntz"))
      val wide = MikeJobs.obsRainfallInput(spark, series, stations, start, end,
        step, order)
      MikeCsv.writeWideCsv(wide, outPath)
    }
  }
}
