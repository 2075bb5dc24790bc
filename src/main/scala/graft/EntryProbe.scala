package graft

import org.apache.spark.sql.SparkSession

/** Driver-smoke probe: builds a BARE session (no nanosAsLong or shuffle confs
  * preset — exactly what the driver does) and calls `SparkEntry.entry`. Verifies
  * the entry query sets every conf it needs at runtime. */
object EntryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("entry-probe").getOrCreate()
    try {
      val n = SparkEntry.entry(spark).count()
      println(s"""{"entry_rows":$n}""")
      require(n > 0, "entry returned no rows")
    } finally spark.stop()
  }
}
