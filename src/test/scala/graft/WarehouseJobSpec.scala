package graft

import java.nio.file.Files

import graft.jobs.{ExtractToWarehouseJob, TideInputJob}
import org.apache.spark.sql.functions._

class WarehouseJobSpec extends SparkSpec {
  import spark.implicits._

  test("ExtractToWarehouseJob: CSV -> unpivot -> dim join -> Derby upsert, idempotent") {
    val dir = Files.createTempDirectory("exjob")
    val url = s"jdbc:derby:memory:exjob;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().execute(
      """CREATE TABLE facts (tms_id VARCHAR(64) NOT NULL, time TIMESTAMP NOT NULL,
        |  fgt TIMESTAMP NOT NULL, value DOUBLE,
        |  PRIMARY KEY (tms_id, time, fgt))""".stripMargin)
    c.close()
    // wide result CSV: 2 timesteps x (1 known station + 1 ghost)
    Files.writeString(dir.resolve("res.csv"),
      """time,Nagalagam Street,Ghost Station
        |2024-01-01 00:00:00,1.2342,9.9
        |2024-01-01 00:15:00,1.5,9.9
        |""".stripMargin)
    Files.writeString(dir.resolve("stations.csv"),
      "station,station_id,latitude,longitude\nNagalagam Street,1,6.95,79.87\n")
    Files.writeString(dir.resolve("cfg.json"),
      s"""{"results_csv": "$dir/res.csv", "stations_csv": "$dir/stations.csv",
         | "jdbc_url": "$url", "fact_table": "facts", "sim_tag": "evening_18:00",
         | "model": "mike11_2016", "variable": "WaterLevel", "unit": "m"}""".stripMargin)
    val (n1, missing1) = ExtractToWarehouseJob.run(spark, s"$dir/cfg.json",
      "2024-01-01 01:00:00")
    assert(n1 == 2 && missing1 == Seq("Ghost Station"))
    // re-run with the same fgt: upsert, not append
    ExtractToWarehouseJob.run(spark, s"$dir/cfg.json", "2024-01-01 01:00:00")
    val facts = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "facts").load()
    assert(facts.count() == 2)
    // a NEW fgt versions the same series/time instead of overwriting (T4)
    ExtractToWarehouseJob.run(spark, s"$dir/cfg.json", "2024-01-01 02:00:00")
    assert(spark.read.format("jdbc").option("url", url)
      .option("dbtable", "facts").load().count() == 4)
  }

  test("TideInputJob: config -> spine-aligned cleansed patched headerless CSV") {
    val dir = Files.createTempDirectory("tidejob")
    Seq(("2024-01-01 00:00:00", 1.0), ("2024-01-01 00:15:00", -99999.0),
      ("2024-01-01 00:45:00", -0.5))
      .toDF("s", "value")
      .select(to_timestamp($"s").cast("timestamp_ntz").as("time"), $"value")
      .write.parquet(s"$dir/series")
    Files.writeString(dir.resolve("cfg.json"),
      s"""{"series_path": "$dir/series", "output_path": "$dir/out"}""")
    assert(TideInputJob.run(spark, s"$dir/cfg.json",
      "2024-01-01 00:00:00", "2024-01-01 00:45:00"))
    val csv = new java.io.File(s"$dir/out").listFiles
      .filter(_.getName.endsWith(".csv")).head
    val lines = Files.readAllLines(csv.toPath)
    assert(lines.size() == 2)
    assert(lines.get(0) == "2024-01-01 00:00:00,1.0")
    assert(lines.get(1) == "2024-01-01 00:45:00,0.0") // negative last row patched
  }
}
