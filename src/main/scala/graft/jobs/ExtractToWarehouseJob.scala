package graft.jobs

import graft.io.{JdbcUpsert, MikeCsv, VersionedFactStore}
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
  *    or: ExtractToWarehouseJob <config.json> --gated
  *
  * `--gated` runs the reference's cron front-gate instead of taking an
  * explicit fgt (T3; `outputs/extract_mike_data_to_db.sh:5-32` via
  * `RunDirGate`): every run directory under config `outputs_root` named with
  * today's (UTC+5:30) date whose result CSV is fresher than
  * `max_age_minutes` (default 40) is extracted with the fgt parsed from the
  * directory name.
  */
object ExtractToWarehouseJob {

  val stationSchema: StructType = StructType(Seq(
    StructField("station", StringType, nullable = false),
    StructField("station_id", IntegerType, nullable = false),
    StructField("latitude", DoubleType, nullable = false),
    StructField("longitude", DoubleType, nullable = false)))

  def main(args: Array[String]): Unit = {
    val cfgPath = args(0)
    val gated = args.contains("--gated")
    val fgt = args.sliding(2, 1).collectFirst { case Array("-f", v) => v }
    if (!gated && fgt.isEmpty) sys.error("missing -f <fgt timestamp> (or --gated)")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (gated) runGated(spark, cfgPath)
      else run(spark, cfgPath, fgt.get)
    } finally spark.stop()
  }

  private def opt(cfg: org.apache.spark.sql.Row, field: String, default: String) =
    if (cfg.schema.fieldNames.contains(field) && !cfg.isNullAt(cfg.fieldIndex(field)))
      cfg.getString(cfg.fieldIndex(field))
    else default

  /** Returns (facts upserted, unmatched station names).
    *
    * Full reference shape (outputs/extract_water_level.py:200-240 + 90-97):
    *  1. resolve source/variable/unit dims get-or-create (ids are deterministic
    *     content hashes, so there is no id-allocator to coordinate);
    *  2. register CSV stations into the warehouse station dim get-or-create and
    *     join facts against the WAREHOUSE dim (stations already known to the
    *     warehouse keep working even if dropped from the CSV);
    *  3. upsert facts keyed (tms_id, time, fgt) — row count from inside the
    *     writer, the plan executes once;
    *  4. run bookkeeping: insert_run/update_start_date once per new series,
    *     update_latest_fgt every tick. */
  def run(spark: SparkSession, cfgPath: String, fgt: String): (Long, Seq[String]) = {
    val cfg = spark.read.option("multiLine", true).json(cfgPath).first()
    runWithCfg(spark, cfg, cfg.getAs[String]("results_csv"), fgt)
  }

  /** T3 gated mode (ref `outputs/extract_mike_data_to_db.sh:5-32`): one
    * extract per fresh today-named run directory, fgt from the dirname.
    * `nowMs`/`todayOverride` injectable for tests and replays. Returns
    * (directory, facts upserted) per admitted run. */
  def runGated(spark: SparkSession, cfgPath: String,
               nowMs: Long = System.currentTimeMillis(),
               todayOverride: Option[String] = None): Seq[(String, Long)] = {
    val cfg = spark.read.option("multiLine", true).json(cfgPath).first()
    val dirs = RunDirGate.freshRunDirs(
      cfg.getAs[String]("outputs_root"),
      resultFile = opt(cfg, "result_file", "resmike11_WL.csv"),
      // JSON numbers arrive as Long, not String — go through Any
      maxAgeMinutes =
        if (cfg.schema.fieldNames.contains("max_age_minutes") &&
          !cfg.isNullAt(cfg.fieldIndex("max_age_minutes")))
          cfg.get(cfg.fieldIndex("max_age_minutes")).toString.toLong
        else 40L,
      nowMs = nowMs, todayOverride = todayOverride)
    dirs.map { rd =>
      System.err.println(s"[extract] gated run: ${rd.dir} fgt=${rd.fgt}")
      val (n, _) = runWithCfg(spark, cfg, rd.resultCsv, rd.fgt)
      rd.dir -> n
    }
  }

  private def runWithCfg(spark: SparkSession, cfg: org.apache.spark.sql.Row,
                         resultsCsv: String, fgt: String): (Long, Seq[String]) = {
    val url = cfg.getAs[String]("jdbc_url")
    val (simTag, model) = (cfg.getAs[String]("sim_tag"), cfg.getAs[String]("model"))
    val (variable, unit) = (cfg.getAs[String]("variable"), cfg.getAs[String]("unit"))
    val wide = MikeCsv.readWideCsv(spark, resultsCsv)
    val csvDim = MikeCsv.readDimCsv(spark, cfg.getAs[String]("stations_csv"),
      stationSchema)
    // dim get-or-create (S12/J7; ref outputs/extract_water_level.py:217-223)
    import graft.ops.TimeSeriesOps.seriesId
    import spark.implicits._
    JdbcUpsert.getOrCreateDim(spark,
      Seq(model).toDF("model")
        .select(seriesId(lit("source"), col("model")).as("source_id"), col("model")),
      url, opt(cfg, "source_table", "source_dim"), Seq("model"))
    JdbcUpsert.getOrCreateDim(spark,
      Seq(variable).toDF("variable")
        .select(seriesId(lit("variable"), col("variable")).as("variable_id"), col("variable")),
      url, opt(cfg, "variable_table", "variable_dim"), Seq("variable"))
    JdbcUpsert.getOrCreateDim(spark,
      Seq(unit).toDF("unit")
        .select(seriesId(lit("unit"), col("unit")).as("unit_id"), col("unit")),
      url, opt(cfg, "unit_table", "unit_dim"), Seq("unit"))
    val dim = JdbcUpsert.getOrCreateDim(spark, csvDim,
        url, opt(cfg, "station_table", "station_dim"), Seq("station_id"))
      .select("station", "station_id", "latitude", "longitude")
    val (facts0, unmatched) = MikeJobs.extractToWarehouse(wide, dim, fgt,
      simTag, model, variable, unit)
    // optional lake sink (100 TB path): fgt-partitioned versioned parquet deltas
    // alongside (or ahead of) the relational warehouse. Both sinks are actions,
    // so the fact plan is persisted when it feeds two of them.
    val lakeDir = opt(cfg, "lake_dir", "")
    val facts = if (lakeDir.nonEmpty)
      facts0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else facts0
    if (lakeDir.nonEmpty) VersionedFactStore.appendTick(facts, lakeDir)
    val n = JdbcUpsert.upsert(facts, url,
      cfg.getAs[String]("fact_table"), Seq("tms_id", "time", "fgt"))
    // T5 run bookkeeping (ref :90-97)
    JdbcUpsert.maintainRuns(spark, MikeJobs.runMeta(wide, dim, simTag, model,
      variable, unit), url, opt(cfg, "run_table", "run"), fgt)
    val missing = unmatched.collect().map(_.getString(0)).toSeq
    // ref behavior: log stations absent from the dim (extract_water_level.py:103-104)
    missing.foreach(m => System.err.println(s"[extract] station not in dim: $m"))
    (n, missing)
  }
}
