package graft

import graft.io.MikeCsv
import graft.jobs.MikeJobs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fidelity against the reference's OWN committed operational fixtures (read-only
  * inputs at /root/reference/resources — the only golden artifacts the reference has,
  * SURVEY.md §5): the engine must ingest the real MIKE result matrix and produce the
  * documented warehouse-extract shape (481 rows × 48 stations = 23,088 facts,
  * BASELINE.md "Warehouse extract job shape"). */
class ReferenceFixturesSpec extends SparkSpec {
  import spark.implicits._

  val wlCsv = "/root/reference/resources/resmike11_WL.csv"
  val stationsCsv = "/root/reference/resources/mike_stations.csv"

  test("S2: real MIKE water-level matrix parses to 481 x 48 wide frame") {
    val wide = MikeCsv.readWideCsv(spark, wlCsv)
    assert(wide.count() == 481)
    assert(wide.columns.length == 49) // time + 48 stations
    assert(wide.columns.head == "time")
    assert(wide.schema.drop(1).forall(_.dataType == DoubleType))
    // time parses and spans the 5-day 15-min window
    val span = wide.agg(min($"time").cast("string"), max($"time").cast("string"))
      .as[(String, String)].head()
    assert(span._1 == "2020-05-22 00:00:00" && span._2 == "2020-05-27 00:00:00")
  }

  test("3.2 extract on real fixtures yields the documented 23,088-fact shape") {
    val wide = MikeCsv.readWideCsv(spark, wlCsv)
    val dim = spark.read.option("header", true).csv(stationsCsv)
      .select(col("Location").as("station"),
        col("OBJECTID").cast("int").as("station_id"),
        col("Latitude").cast("double").as("latitude"),
        col("Longitude").cast("double").as("longitude"))
    val (facts, unmatched) = MikeJobs.extractToWarehouse(wide, dim,
      "2020-05-22 06:00:00", "evening_18:00", "mike11_2016", "WaterLevel", "m")
    val missing = unmatched.as[String].collect()
    val n = facts.count()
    // every wide column resolves or is reported; resolved x 481 rows = fact count
    assert(missing.toSet.size + (n / 481) == 48)
    assert(n % 481 == 0)
    assert(n == 481L * (48 - missing.length))
    // pinned real behavior: the fixtures THEMSELVES have one dangling station —
    // the result matrix says "Ambatale Outfall" but the dim spells it
    // "Ambatale Outfull1" (mike_stations.csv:10), so the reference's own run takes
    // the "not included in the database" branch (extract_water_level.py:103-104)
    // for that column and upserts 47 x 481 = 22,607 facts, not the naive 48 x 481.
    assert(missing.toSeq == Seq("Ambatale Outfall"))
    assert(n == 481L * 47)
    // fgt versioning + deterministic ids: one distinct fgt, 47 distinct series
    assert(facts.select($"fgt").distinct().count() == 1)
    assert(facts.select($"tms_id").distinct().count() == 47)
  }

  test("S10/3.3 discharge fixture: engine round-trips the real Discharge.txt") {
    // the reference's committed discharge input: 481 rows (5-day 15-min spine,
    // both endpoints inclusive), headerless time,value — parse with the engine's
    // reader, verify the spine law holds on the REAL artifact, and re-emit an
    // identical series through the engine's discharge pipeline + sink
    val disc = MikeCsv.readHeaderlessSeries(spark,
      "/root/reference/resources/Discharge.txt")
    assert(disc.count() == 481)
    val span = disc.agg(min($"time").cast("string"), max($"time").cast("string"))
      .as[(String, String)].head()
    assert(span._1 == "2019-05-26 00:00:00" && span._2 == "2019-05-31 00:00:00")
    // exactly the engine's timeSpine over the same window — cadence law
    val spine = graft.ops.TimeSeriesOps.timeSpine(spark,
      "2019-05-26 00:00:00", "2019-05-31 00:00:00", 15)
    assert(spine.count() == 481)
    assert(disc.join(spine, Seq("time"), "left_anti").count() == 0)
    // dischargeInput over the fixture is the identity (no gaps, no negatives,
    // last row 32.32 > 0 -> unpatched): the engine reproduces the artifact
    val out = MikeJobs.dischargeInput(spark, disc,
      "2019-05-26 00:00:00", "2019-05-31 00:00:00")
    assert(out.count() == 481)
    assert(out.join(disc.withColumnRenamed("value", "v0"), Seq("time"))
      .filter($"value" =!= $"v0").count() == 0)
    val obsEnd = MikeJobs.getObsEnd(disc)
    assert(obsEnd.contains(java.time.LocalDateTime.parse("2019-05-31T00:00:00")))
  }

  test("S1/R1 shape conformance: generated wide RF matrix matches RF.txt layout") {
    // the reference's committed rainfall input: header 'Times' + 114 catchments
    val rf = spark.read.option("header", true).csv("/root/reference/resources/RF.txt")
    assert(rf.columns.length == 115)
    assert(rf.count() == 120)
    // engine pivot with the same catchment key set produces the same column layout
    val catchments = rf.columns.tail.toSeq
    val long = catchments.take(3).zipWithIndex.map { case (c, i) =>
      (s"2019-05-26 0$i:00:00", c, 0.1 * i) }
      .toDF("time", "name", "value")
    val wide = graft.ops.TimeSeriesOps.pivotWide(long, "time", "name", "value",
      catchments)
    assert(wide.columns.toSeq == "time" +: catchments)
  }
}
