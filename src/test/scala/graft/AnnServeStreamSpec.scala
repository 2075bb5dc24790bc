package graft

import graft.operators.Similarity
import graft.streaming.AnnServeStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ANN serving == batch search: every micro-batch's answers must be
  * bit-identical to running `ivfPqSearch` on the same queries in batch mode
  * against the same persisted index, across multiple micro-batches. */
class AnnServeStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream answers == batch ivfPqSearch answers, across micro-batches") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val cents = Similarity.kmeansCentroids(corpus, nCentroids = 8, iters = 0)
    val idx = Similarity.buildIvfPqIndexFrom(corpus, cents, m = 4, ksub = 16,
      iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("ann-serve-idx").toString
    idx.save(dir)
    val loaded = Similarity.IvfPqIndex.load(spark, dir)

    val queryRows = corpus.filter($"vec_id" < 6)
      .as[(Long, Seq[Float])].collect().toSeq
    val batchAnswers = Similarity.ivfPqSearch(loaded,
        queryRows.toDF("vec_id", "embedding"), k = 3, nProbe = 2)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val got = scala.collection.mutable.Set[(Long, Long, Int)]()
    val ckpt = java.nio.file.Files.createTempDirectory("ann-serve-ckpt").toString
    val q = AnnServeStream.run(input.toDF().toDF("vec_id", "embedding"),
        loaded, k = 3, nProbe = 2, ckpt) { answers =>
      got ++= answers.select($"query_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Int)].collect()
      ()
    }
    try {
      input.addData(queryRows.take(2): _*)
      q.processAllAvailable()
      input.addData(queryRows.drop(2): _*)
      q.processAllAvailable()
      assert(got.toSet == batchAnswers,
        "stream must serve exactly the batch answers")
      assert(got.groupBy(_._1).keySet.size == 6) // every query answered
    } finally q.stop()
  }
}
