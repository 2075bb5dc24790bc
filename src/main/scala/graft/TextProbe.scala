package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main for the text-stats queries (not part of the driver contract). */
object TextProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("text-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    for (q <- Seq("q48_repetition_quality", "q27_text_quality", "q28_lang_id"); i <- 1 to 3)
      time(s"$q-$i") {
        SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      }
    SparkEntry.queries("q48_repetition_quality")(spark, dir).explain("formatted")
    spark.stop()
  }
}
