package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main for the dedup family (not part of the driver contract). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("dedup-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val d2k = docs.filter(col("doc_id") < 2000)

    import graft.functions.TextFns
    time("q23.tokenize-only") {
      d2k.repartition(32)
        .select(col("doc_id"), TextFns.sortedHashedShingles(col("text"), 3).as("sh"))
        .agg(sum(size(col("sh")))).count()
    }
    time("q23.prefix-explode") {
      val tS = 500000L
      d2k.repartition(32)
        .withColumn("__sh", TextFns.sortedHashedShingles(col("text"), 3))
        .filter(size(col("__sh")) > 0)
        .withColumn("__sz", size(col("__sh")).cast("long"))
        .withColumn("__p", (col("__sz") - expr(s"($tS * __sz + 999999) div 1000000") + 1).cast("int"))
        .select(col("doc_id"), explode(slice(col("__sh"), lit(1), col("__p"))).as("tok"))
        .count()
    }
    time("q23.candidates") {
      Dedup.ngramPrefixCandidates(d2k, "doc_id", "text", 3, 0.5, Seq("lang")).count()
    }
    time("q23.full") {
      Dedup.ngramJaccardPairs(d2k, "doc_id", "text", 3, 0.5, Seq("lang")).count()
    }
    time("q46.embedding-lsh") {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val jit = emb.select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), e => e + lit(0.02f)).as("embedding"))
      Dedup.embeddingCosinePairs(
        emb.select(col("vec_id"), col("embedding")).unionByName(jit),
        "vec_id", "embedding",
        threshold = 0.98, blockCols = Nil, lshPlanes = 12, lshBands = 8).count()
    }
    for (i <- 1 to 5) time(s"q48.repetition-$i") {
      val df = SparkEntry.queries("q48_repetition_quality")(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      1L
    }
    time("q24.sig-only") {
      graft.functions.MinHashSketch.register(spark)
      docs.repartition(32)
        .select(col("doc_id"), TextFns.sortedHashedShingles(col("text"), 2).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(graft.functions.MinHashSketch.sketchCol(col("sh"), 64).as("sig"))
        .select(sum(size(col("sig")))).count()
    }
    time("q24.full") {
      Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 2, numHashes = 64, bands = 32, threshold = 0.3).count()
    }
    time("q25.full") {
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 12).count()
    }
    spark.stop()
  }
}
