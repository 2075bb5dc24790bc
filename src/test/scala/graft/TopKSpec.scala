package graft

import graft.ops.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W1 scale form: the bounded-heap TopKAgg must reproduce the ranking-window
  * row set exactly, under any partitioning (map-side partials + merge). */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    df.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"g", $"id", $"v", $"rn")
  }

  test("heap == window on lineitem (the q07/q63 pair, sf0.001)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_extendedprice".desc, $"l_linenumber")
    val win = li.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"l_orderkey", $"l_linenumber", $"rn")
      .as[(Long, Int, Int)].collect().toSet
    val heap = TopK.topKPerGroup(li, Seq("l_orderkey"),
        round($"l_extendedprice" * 100).cast("long"),
        $"l_linenumber".cast("long"), Seq($"l_linenumber"), k = 3)
      .select($"l_orderkey", $"l_linenumber", $"rn")
      .as[(Long, Int, Int)].collect().toSet
    assert(heap == win)
  }

  test("partition invariance: same rows from 1 and 13 partitions; ties break by id") {
    // duplicate sort values force the tie-break; partial buffers must merge
    // to the identical result regardless of which mapper saw which rows
    val df = (0L until 2000L).map(i => (s"g${i % 7}", i, (i % 5) * 10L))
      .toDF("g", "id", "v")
    val one = windowForm(df.repartition(1)).as[(String, Long, Long, Int)]
      .collect().toSet
    val heap1 = TopK.topKPerGroup(df.repartition(1), Seq("g"), $"v", $"id",
        Seq($"id".as("pid"), $"v".as("pv")), k = 3)
      .select($"g", $"pid", $"pv", $"rn").as[(String, Long, Long, Int)]
      .collect().toSet
    val heap13 = TopK.topKPerGroup(df.repartition(13), Seq("g"), $"v", $"id",
        Seq($"id".as("pid"), $"v".as("pv")), k = 3)
      .select($"g", $"pid", $"pv", $"rn").as[(String, Long, Long, Int)]
      .collect().toSet
    assert(heap1 == one)
    assert(heap13 == one)
  }

  test("k larger than group size returns the whole group ranked") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, 9L)).toDF("g", "id", "v")
    val out = TopK.topKPerGroup(df, Seq("g"), $"v", $"id",
        Seq($"id".as("pid")), k = 10)
      .select($"g", $"pid", $"rn").as[(String, Long, Int)].collect().toSet
    assert(out == Set(("a", 2L, 1), ("a", 1L, 2)))
  }
}
