package graft

import graft.ops.GeoOps._
import org.apache.spark.sql.functions._

class GeoOpsSpec extends SparkSpec {
  import spark.implicits._

  test("greatCircleKm matches hand-computed references") {
    // Colombo (6.9271, 79.8612) -> Kandy (7.2906, 80.6337) ~ 94 km
    val d = Seq((6.9271, 79.8612, 7.2906, 80.6337))
      .toDF("lat1", "lon1", "lat2", "lon2")
      .select(greatCircleKm($"lat1", $"lon1", $"lat2", $"lon2").as("d"))
      .as[Double].head()
    assert(math.abs(d - 94.0) < 2.0)
    // zero distance, clamp path: identical points must not NaN
    val z = Seq((6.9, 79.8, 6.9, 79.8)).toDF("a", "b", "c", "d")
      .select(greatCircleKm($"a", $"b", $"c", $"d").as("d")).as[Double].head()
    assert(z == 0.0)
    // antipodal clamp: must be ~ half circumference, not NaN
    val anti = Seq((0.0, 0.0, 0.0, 180.0)).toDF("a", "b", "c", "d")
      .select(greatCircleKm($"a", $"b", $"c", $"d").as("d")).as[Double].head()
    assert(math.abs(anti - math.Pi * 6371.0) < 1.0)
  }

  test("knnJoin excludes self, honors k and maxKm, ranks deterministically") {
    val pts = Seq(
      (1, 0.0, 0.0), (2, 0.0, 0.1), (3, 0.0, 0.2), (4, 0.0, 0.3), (5, 50.0, 50.0))
      .toDF("id", "latitude", "longitude")
    val out = knnJoin(pts, pts, k = 2, maxKm = 100.0)
      .orderBy($"origin_id", $"rank")
      .select($"origin_id", $"neighbor_id", $"rank")
      .as[(Int, Int, Int)].collect()
    val forOrigin1 = out.filter(_._1 == 1).map(_._2).toSeq
    assert(forOrigin1 == Seq(2, 3)) // nearest two, self excluded
    assert(!out.exists(r => r._1 == r._2))
    assert(!out.exists(_._1 == 5) || out.filter(_._1 == 5).isEmpty) // 5 isolated
    assert(out.forall(_._3 <= 2))
  }
}
