package graft

import graft.ops.TimeSeriesOps._
import org.apache.spark.sql.functions._

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  test("timeSpine is dense, inclusive of both endpoints, at the requested step") {
    val s = timeSpine(spark, "2024-01-01 00:00:00", "2024-01-01 01:00:00", 15)
    val times = s.orderBy($"time").as[java.time.LocalDateTime].collect()
    assert(times.length == 5)
    assert(times.head.toString == "2024-01-01T00:00")
    assert(times.last.toString == "2024-01-01T01:00")
  }

  test("ceilBucket is right-closed right-labeled: boundary stays, +1us rolls up") {
    val df = Seq(
      "2024-01-01 00:15:00.000000", // exactly on boundary -> own bucket
      "2024-01-01 00:15:00.000001", // 1us past -> next bucket
      "2024-01-01 00:00:00.000001", // just past prior boundary -> 00:15
      "2024-01-01 00:14:59.999999").toDF("s")
      .select(to_timestamp($"s").as("t"))
      .select(ceilBucket($"t", 900L).cast("string").as("b"))
    assert(df.as[String].collect().toSeq == Seq(
      "2024-01-01 00:15:00", "2024-01-01 00:30:00",
      "2024-01-01 00:15:00", "2024-01-01 00:15:00"))
  }

  test("resampleSum replicates pandas all-NaN-bucket -> 0.0 quirk") {
    val df = Seq(
      ("a", "2024-01-01 00:05:00", Some(1.0)),
      ("a", "2024-01-01 00:10:00", Some(2.0)),
      ("a", "2024-01-01 00:20:00", None: Option[Double]))
      .toDF("k", "s", "value")
      .select($"k", to_timestamp($"s").cast("timestamp_ntz").as("time"), $"value")
    val out = resampleSum(df, "time", 900L, Seq("k"), "value")
      .orderBy($"time").select($"value").as[Double].collect()
    assert(out.toSeq == Seq(3.0, 0.0)) // second bucket all-null -> 0.0, not NULL
  }

  test("imputeRowMean uses the pre-fill mean (reference order-sensitivity)") {
    val df = Seq(
      ("s1", "t1", Some(2.0)), ("s2", "t1", Some(4.0)),
      ("s3", "t1", None: Option[Double]), ("s4", "t1", None: Option[Double]))
      .toDF("station", "time", "value")
    val out = imputeRowMean(df, "time", "value")
      .orderBy($"station").select($"value").as[Double].collect()
    // both gaps get mean(2,4)=3 — NOT a running fill where s4 would see s3's fill
    assert(out.toSeq == Seq(2.0, 4.0, 3.0, 3.0))
  }

  test("patchLastRow zeroes a missing/negative final row only") {
    val df = Seq(
      ("2024-01-01 00:00:00", Some(5.0)),
      ("2024-01-01 00:15:00", Some(-2.0)),
      ("2024-01-01 00:30:00", None: Option[Double]))
      .toDF("s", "value")
      .select(to_timestamp($"s").as("time"), $"value")
    val out = patchLastRow(df, "time", "value")
      .orderBy($"time").select($"value").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(5.0), Some(-2.0), Some(0.0)))
  }

  test("weightedGroupSum folds coefficient x value per group (hand-computed)") {
    val ts = Seq((101, "t1", 10.0), (102, "t1", 20.0), (101, "t2", 1.0))
      .toDF("obs_id", "time", "value")
    val coeffs = Seq(("C1", 101, 0.3), ("C1", 102, 0.7), ("C2", 101, 1.0))
      .toDF("name", "obs_id", "coefficient")
    val out = weightedGroupSum(ts, coeffs, "obs_id", "name", "time", "value",
      "coefficient")
      .orderBy($"name", $"time")
      .select($"name", $"time", round($"value", 9).as("value"))
      .as[(String, String, Double)].collect()
    assert(out.toSeq == Seq(
      ("C1", "t1", 17.0), ("C1", "t2", 0.3), ("C2", "t1", 10.0), ("C2", "t2", 1.0)))
  }

  test("pivotWide / unpivotLong round-trip on deduplicated keys") {
    val long = Seq(("t1", "a", 1.0), ("t1", "b", 2.0), ("t2", "a", 3.0))
      .toDF("time", "station", "value")
    val wide = pivotWide(long, "time", "station", "value", Seq("a", "b"))
    assert(wide.columns.toSeq == Seq("time", "a", "b"))
    val back = unpivotLong(wide, Seq("time")).filter($"value".isNotNull)
    assert(back.count() == 3)
    val t2a = back.filter($"time" === "t2" && $"station" === "a")
      .select($"value").as[Double].head()
    assert(t2a == 3.0)
  }

  test("seriesId is a stable 64-hex content hash") {
    val df = Seq(("mike11", "WL")).toDF("m", "v")
      .select(seriesId(col("m"), col("v")).as("id"))
    val id = df.as[String].head()
    assert(id.matches("[0-9a-f]{64}"))
    assert(df.as[String].head() == id) // deterministic across evaluations
  }

  test("neighborCoalesce fills from 1st then 2nd neighbor at the same time") {
    val ts = Seq(
      ("s1", "t1", None: Option[Double]), ("s2", "t1", Some(7.0)),
      ("s3", "t1", Some(9.0)),
      ("s1", "t2", None: Option[Double]), ("s3", "t2", Some(5.0)))
      .toDF("station", "time", "value")
    val nb = Seq(("s1", "s2", "s3")).toDF("station", "n1", "n2")
    val out = neighborCoalesce(ts, nb, "station", "time", "value")
      .filter($"station" === "s1").orderBy($"time")
      .select($"value").as[Double].collect()
    assert(out.toSeq == Seq(7.0, 5.0)) // t1 from n1; t2 falls through to n2
  }
}
