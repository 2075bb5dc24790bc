package graft

import graft.ops.TimeSeriesOps
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = to_timestamp(lit(s)).cast("timestamp_ntz")

  test("asofJoin picks the latest right row at-or-before each left time, per key") {
    val left = Seq(
      ("s1", "2024-01-01 00:10:00", 1),
      ("s1", "2024-01-01 00:30:00", 2),
      ("s1", "2024-01-01 00:05:00", 3), // before any right row
      ("s2", "2024-01-01 00:30:00", 4)) // other key: own right series
      .toDF("k", "t", "seq")
      .select($"k", to_timestamp($"t").cast("timestamp_ntz").as("time"), $"seq")
    val right = Seq(
      ("s1", "2024-01-01 00:10:00", 10.0), // equal instant -> visible
      ("s1", "2024-01-01 00:20:00", 20.0),
      ("s2", "2024-01-01 00:00:00", 99.0))
      .toDF("k", "t", "level")
      .select($"k", to_timestamp($"t").cast("timestamp_ntz").as("time"), $"level")
    val out = TimeSeriesOps.asofJoin(left, right, Seq("k"), "time")
      .orderBy($"k", $"time")
      .select($"k", $"seq", $"level")
      .collect().map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSeq == Seq(
      ("s1", 3, None),        // 00:05 precedes all right rows
      ("s1", 1, Some(10.0)),  // 00:10 sees the equal-instant right row
      ("s1", 2, Some(20.0)),  // 00:30 sees 00:20
      ("s2", 4, Some(99.0))))
  }

  test("tolerance nulls out stale matches") {
    val left = Seq(("s1", "2024-01-01 01:00:00", 1))
      .toDF("k", "t", "seq")
      .select($"k", to_timestamp($"t").cast("timestamp_ntz").as("time"), $"seq")
    val right = Seq(("s1", "2024-01-01 00:00:00", 7.0))
      .toDF("k", "t", "level")
      .select($"k", to_timestamp($"t").cast("timestamp_ntz").as("time"), $"level")
    val strict = TimeSeriesOps.asofJoin(left, right, Seq("k"), "time",
      toleranceSeconds = 1800)
    assert(strict.select($"level").collect().head.isNullAt(0)) // 1h gap > 30min tol
    val loose = TimeSeriesOps.asofJoin(left, right, Seq("k"), "time",
      toleranceSeconds = 7200)
    assert(loose.select($"level").collect().head.getDouble(0) == 7.0)
  }
}
