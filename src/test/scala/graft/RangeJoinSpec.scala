package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq((1L, 0L), (2L, 10L), (3L, 15L), (4L, 99L), (5L, -5L))
    .toDF("pid", "v")
  private val intervals = Seq(("a", 0L, 10L), ("b", 10L, 20L), ("c", 90L, 200L),
    ("d", -100L, -1L)).toDF("name", "lo", "hi")

  test("point-in-interval: inclusive bounds, overlaps, negatives") {
    val out = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 8L)
      .select($"pid", $"name").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "a"), (2L, "b"), // 10 is in both [0,10] and [10,20]
      (3L, "b"), (4L, "c"), (5L, "d")))
  }

  test("bucket width never changes results (pure performance knob)") {
    val expected = RangeJoin
      .pointInInterval(points, intervals, "v", "lo", "hi", 1L)
      .select($"pid", $"name").as[(Long, String)].collect().toSet
    for (w <- Seq(3L, 7L, 64L, 100000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", w)
        .select($"pid", $"name").as[(Long, String)].collect().toSet
      assert(got == expected, s"bucketWidth=$w diverged")
    }
  }

  test("plans as an equi hash join on the cell, never a nested loop") {
    val plan = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
