package graft.jobs

import graft.io.MikeCsv
import org.apache.spark.sql.SparkSession

/** CLI for the tide/discharge input pipeline — the minimum end-to-end slice
  * (SURVEY.md §7.2; ref inputs/gen_mike_input_tide_linux.py): long series ->
  * spine align -> sentinel cleanse -> last-row patch -> headerless time,value CSV.
  *
  * Config JSON: { "series_path": "<parquet (time,value)>", "output_path": "<dir>" }
  * Usage: TideInputJob <config.json> -s "..." -e "..."
  */
object TideInputJob {

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
    try run(spark, cfgPath, start, end)
    finally spark.stop()
  }

  def run(spark: SparkSession, cfgPath: String, start: String, end: String): Boolean = {
    val cfg = spark.read.option("multiLine", true).json(cfgPath).first()
    val outputPath = cfg.getAs[String]("output_path")
    Maintenance.runIdempotent(outputPath) {
      val series = spark.read.parquet(cfg.getAs[String]("series_path"))
      val out = MikeJobs.tideInput(spark, series, start, end)
      MikeCsv.writeHeaderlessSeries(out, outputPath)
    }
  }
}
