package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial operators: great-circle distance and k-nearest-neighbor join.
  *
  * The reference computes all-pairs spherical-law-of-cosines distance in a Python
  * double loop and keeps the ≤3 nearest stations within 100 km
  * (ref: inputs/gen_mike_input_rf_linux_all_stations_raw.py:159-202). Here both are
  * declarative: the distance is a pure column expression (codegen'd, no UDF), and the
  * k-NN is a broadcast θ-join + ranking window. At scale the broadcast side is the
  * station dim (thousands of rows at most); the probe side streams, so no shuffle of
  * the big side is needed.
  */
object GeoOps {

  /** F6: great-circle distance (spherical law of cosines, R = 6371 km), with the
    * reference's clamp of the intermediate cosine to [-1, 1] before acos
    * (ref: inputs/gen_mike_input_rf_linux_all_stations_raw.py:180-185 — it clamps the
    * upper bound; we clamp both for antipodal robustness).
    * Pure built-in column expression — stays inside whole-stage codegen. */
  def greatCircleKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val c = sin(radians(lat1)) * sin(radians(lat2)) +
      cos(radians(lat1)) * cos(radians(lat2)) * cos(radians(lon2) - radians(lon1))
    acos(greatest(least(c, lit(1.0)), lit(-1.0))) * lit(6371.0)
  }

  /** J6/W1/O1: k-NN join — for every row of `origins`, the ≤k nearest rows of
    * `neighbors` within `maxKm`, excluding self-matches on `idCol`.
    * `neighbors` is broadcast (station dims are small); ranking ties are broken by
    * neighbor id so results are deterministic.
    * ref semantics: top-10 sort then ≤3 within 100 km, self excluded
    * (inputs/gen_mike_input_rf_linux_all_stations_raw.py:189-198). */
  def knnJoin(origins: DataFrame, neighbors: DataFrame, k: Int, maxKm: Double,
              idCol: String = "id", latCol: String = "latitude",
              lonCol: String = "longitude"): DataFrame = {
    val o = origins.select(col(idCol).as("origin_id"),
      col(latCol).as("o_lat"), col(lonCol).as("o_lon"))
    val n = neighbors.select(col(idCol).as("neighbor_id"),
      col(latCol).as("n_lat"), col(lonCol).as("n_lon"))
    val dist = greatCircleKm(col("o_lat"), col("o_lon"), col("n_lat"), col("n_lon"))
    val w = Window.partitionBy(col("origin_id"))
      .orderBy(round(col("dist_km"), 6), col("neighbor_id"))
    o.join(broadcast(n), col("origin_id") =!= col("neighbor_id"))
      .withColumn("dist_km", dist)
      .filter(col("dist_km") <= maxKm)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("origin_id"), col("neighbor_id"), col("dist_km"), col("rank"))
  }
}
