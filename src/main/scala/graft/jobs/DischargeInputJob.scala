package graft.jobs

import graft.io.MikeCsv
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI for the discharge input pipeline
  * (ref: inputs/gen_mike_input_dis_linux.py): long series -> 15-min spine align ->
  * last-row patch -> headerless time,value CSV, tagged with the series'
  * `get_obs_end`-derived latest_fgt (ref :176) for downstream run bookkeeping.
  *
  * Config JSON: { "series_path": "<parquet (time,value)>", "output_path": "<dir>" }
  * Usage: DischargeInputJob <config.json> -s "..." -e "..."
  */
object DischargeInputJob {

  def main(args: Array[String]): Unit = {
    val (cfgPath, start, end) = RainfallInputJob.parseArgs(args)
    RainfallInputJob.validateWindowTs(start)
    RainfallInputJob.validateWindowTs(end)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (ran, fgt) = run(spark, cfgPath, start, end)
      println(s"[discharge] ran=$ran latest_fgt=${fgt.getOrElse("none")}")
    } finally spark.stop()
  }

  /** Returns (whether the tick ran, latest_fgt = obs end of the raw series). */
  def run(spark: SparkSession, cfgPath: String, start: String,
          end: String): (Boolean, Option[java.time.LocalDateTime]) = {
    val cfg = spark.read.option("multiLine", true).json(cfgPath).first()
    val outputPath = cfg.getAs[String]("output_path")
    val series = spark.read.parquet(cfg.getAs[String]("series_path"))
      .filter(col("time") >= lit(start).cast("timestamp_ntz") &&
        col("time") <= lit(end).cast("timestamp_ntz"))
    // the reference derives the tick's fgt from the series' observation end, not
    // wall clock — re-runs over the same data are tagged identically (T4-friendly)
    val latestFgt = MikeJobs.getObsEnd(series)
    val ran = Maintenance.runIdempotent(outputPath) {
      MikeCsv.writeHeaderlessSeries(
        MikeJobs.dischargeInput(spark, series, start, end), outputPath)
    }
    (ran, latestFgt)
  }
}
