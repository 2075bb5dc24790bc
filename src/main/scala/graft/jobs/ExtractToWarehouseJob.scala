package graft.jobs

import graft.io.{JdbcUpsert, MikeCsv}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CLI for the output-extraction pipeline (SURVEY.md §3.2) — the engine's
  * `outputs/extract_water_level.py`: wide MIKE result CSV -> unpivot -> station-dim
  * join -> deterministic series ids -> idempotent fact upsert keyed
  * (tms_id, time, fgt), with the unmatched-station branch reported.
  *
  * Config JSON:
  * {
  *   "results_csv": "<wide MIKE result csv dir/file>",
  *   "stations_csv": "<csv station,station_id,latitude,longitude>",
  *   "jdbc_url": "<warehouse url>", "fact_table": "facts",
  *   "sim_tag": "...", "model": "mike11_2016", "variable": "WaterLevel", "unit": "m"
  * }
  * Usage: ExtractToWarehouseJob <config.json> -f "yyyy-MM-dd HH:mm:ss"   (fgt)
  */
object ExtractToWarehouseJob {

  val stationSchema: StructType = StructType(Seq(
    StructField("station", StringType, nullable = false),
    StructField("station_id", IntegerType, nullable = false),
    StructField("latitude", DoubleType, nullable = false),
    StructField("longitude", DoubleType, nullable = false)))

  def main(args: Array[String]): Unit = {
    val cfgPath = args(0)
    val fgt = args.sliding(2, 1).collectFirst { case Array("-f", v) => v }
      .getOrElse(sys.error("missing -f <fgt timestamp>"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, cfgPath, fgt)
    finally spark.stop()
  }

  /** Returns (facts upserted, unmatched station names). */
  def run(spark: SparkSession, cfgPath: String, fgt: String): (Long, Seq[String]) = {
    val cfg = spark.read.option("multiLine", true).json(cfgPath).first()
    val wide = MikeCsv.readWideCsv(spark, cfg.getAs[String]("results_csv"))
    val dim = MikeCsv.readDimCsv(spark, cfg.getAs[String]("stations_csv"),
      stationSchema)
    val (facts, unmatched) = MikeJobs.extractToWarehouse(wide, dim, fgt,
      cfg.getAs[String]("sim_tag"), cfg.getAs[String]("model"),
      cfg.getAs[String]("variable"), cfg.getAs[String]("unit"))
    JdbcUpsert.upsert(facts, cfg.getAs[String]("jdbc_url"),
      cfg.getAs[String]("fact_table"), Seq("tms_id", "time", "fgt"))
    val missing = unmatched.collect().map(_.getString(0)).toSeq
    // ref behavior: log stations absent from the dim (extract_water_level.py:103-104)
    missing.foreach(m => System.err.println(s"[extract] station not in dim: $m"))
    (facts.count(), missing)
  }
}
