package graft

import java.nio.file.Files

import graft.jobs.RainfallInputJob
import org.apache.spark.sql.functions._

class RainfallInputJobSpec extends SparkSpec {
  import spark.implicits._

  test("end-to-end: config + window args -> validated, gated, single-file wide CSV") {
    val dir = Files.createTempDirectory("rfjob")
    // long-layout series input
    Seq(
      (101, "2024-01-01 00:05:00", 1.0),
      (101, "2024-01-01 00:10:00", 2.0),
      (101, "2024-01-01 00:15:00", 3.0),
      (102, "2024-01-01 00:10:00", 4.0))
      .toDF("obs_id", "s", "value")
      .select($"obs_id", to_timestamp($"s").cast("timestamp_ntz").as("time"), $"value")
      .write.parquet(s"$dir/series")
    Files.writeString(dir.resolve("coeffs.csv"),
      "name,curw_obs_id,coefficient\nC1,101,0.5\nC1,102,0.5\nC2,101,1.0\n")
    Files.writeString(dir.resolve("cfg.json"),
      s"""{"series_path": "$dir/series",
         | "coefficients_csv": "$dir/coeffs.csv",
         | "output_path": "$dir/out"}""".stripMargin)

    // P9 validation rejects off-grid windows
    intercept[IllegalArgumentException] {
      RainfallInputJob.validateWindowTs("2024-01-01 00:07:00")
    }
    val ran = RainfallInputJob.run(spark, s"$dir/cfg.json",
      "2024-01-01 00:00:00", "2024-01-01 00:15:00")
    assert(ran)
    val files = new java.io.File(s"$dir/out").listFiles
      .filter(_.getName.endsWith(".csv"))
    assert(files.length == 1) // single ordered file contract
    val lines = Files.readAllLines(files.head.toPath)
    assert(lines.get(0) == "time,C1,C2")
    // 00:00 bucket: no data at all -> stays empty in the wide matrix
    assert(lines.get(1) == "2024-01-01 00:00:00,,")
    // station 101 bucket = 1+2+3 = 6.0; 102 = 4.0 -> C1 = 0.5*6+0.5*4 = 5.0; C2 = 6.0
    assert(lines.get(2) == "2024-01-01 00:15:00,5.0,6.0")
    // S13 gate: second run is a no-op
    assert(!RainfallInputJob.run(spark, s"$dir/cfg.json",
      "2024-01-01 00:00:00", "2024-01-01 00:15:00"))
  }
}
