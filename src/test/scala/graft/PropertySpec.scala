package graft

import graft.ops.TimeSeriesOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.4), using raw ScalaCheck generators with
  * fixed seeds (the scalatest<->scalacheck bridge artifact is not available offline).
  * Few but meaningful generations — each sample spins Spark jobs. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val pointsGen = Gen.nonEmptyListOf(for {
    offsetMin <- Gen.choose(0, 600)
    cents <- Gen.choose(-10000L, 10000L)
  } yield (offsetMin, cents / 100.0))

  test("resample conservation: sum of right-closed bucket sums == total sum") {
    for (pts <- samples(pointsGen, 5)) {
      val df = pts.toDF("m", "value")
        .select((to_timestamp(lit("2024-01-01 00:00:00")).cast("timestamp_ntz")
          + make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), $"m")).as("time"),
          $"value")
      val total = df.agg(sum(round($"value" * 100).cast("long"))).as[Long].head()
      val bucketTotal = TimeSeriesOps
        .resampleSum(df.withColumn("value",
          round($"value" * 100).cast("long").cast("double")),
          "time", 900L, Nil, "value")
        .agg(sum($"value".cast("long"))).as[Long].head()
      assert(bucketTotal == total)
    }
  }

  test("impute idempotence: imputing an already-imputed frame changes nothing") {
    val gen = Gen.listOfN(8, Gen.option(Gen.choose(0, 1000)))
    for (vals <- samples(gen, 5) if vals.exists(_.isDefined)) {
      val df = vals.zipWithIndex.map { case (v, i) =>
        (s"s$i", "t1", v.map(_.toDouble)) }.toDF("station", "time", "value")
      val once = TimeSeriesOps.imputeRowMean(df, "time", "value")
      val twice = TimeSeriesOps.imputeRowMean(once, "time", "value")
      val a = once.orderBy($"station").select($"value").collect().toSeq
      val b = twice.orderBy($"station").select($"value").collect().toSeq
      assert(a == b)
    }
  }

  test("pivot . unpivot == identity on deduplicated (time,key) pairs") {
    val gen = Gen.nonEmptyListOf(for {
      t <- Gen.oneOf("t1", "t2", "t3"); k <- Gen.oneOf("a", "b")
      v <- Gen.choose(1, 99)
    } yield (t, k, v.toDouble))
    for (rows <- samples(gen, 5)) {
      val dedup = rows.distinctBy(r => (r._1, r._2))
      val long = dedup.toDF("time", "station", "value")
      val wide = TimeSeriesOps.pivotWide(long, "time", "station", "value", Seq("a", "b"))
      val back = TimeSeriesOps.unpivotLong(wide, Seq("time"))
        .filter($"value".isNotNull)
        .as[(String, String, Double)].collect().toSet
      assert(back == dedup.toSet)
    }
  }
}
