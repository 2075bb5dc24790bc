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

  test("streaming dense-index maintenance: add + forget ticks == frozen-quantizer rebuild") {
    // the BM25 generation-swap discipline (WarcStreamSpec) on the IVF+PQ
    // store: micro-batches of (op, vec_id, embedding) fold in with
    // ivfPqAdd / drop with ivfPqRemove, each tick publishing the NEXT
    // generation to the alternate directory. The final live generation
    // must be bit-for-bit the one-shot encode of the surviving vector set
    // under the SAME frozen quantizers, and serve identically.
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val cents = Similarity.kmeansCentroids(corpus, nCentroids = 8, iters = 0)
    val initial = Similarity.buildIvfPqIndexFrom(corpus, cents, m = 4,
      ksub = 16, iters = 0)
    val base = java.nio.file.Files.createTempDirectory("ann-maint").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Seq[Float])]
    var cur = ""
    val q = AnnServeStream.maintain(
      input.toDF().toDF("op", "vec_id", "embedding"), initial,
      s"$base/a", s"$base/b", s"$base/ckpt")(d => cur = d)
    val fresh = corpus.filter($"vec_id" < 5)
      .select(($"vec_id" + 9000L).as("vec_id"), $"embedding")
      .as[(Long, Seq[Float])].collect().toSeq
    try {
      assert(cur == s"$base/a") // the initial generation published eagerly
      // t1: admit 5 new vectors
      input.addData(fresh.map { case (i, v) => ("add", i, v) }: _*)
      q.processAllAvailable()
      assert(cur == s"$base/b")
      // t2: forget 3 originals AND one of t1's admissions; admit 1 more;
      // within the same tick, add+del of one id must net to DELETED
      input.addData(Seq(("del", 7L, Seq.empty[Float]),
        ("del", 11L, Seq.empty[Float]), ("del", 13L, Seq.empty[Float]),
        ("del", 9000L, Seq.empty[Float]),
        ("add", 9100L, fresh.head._2),
        ("del", 9100L, Seq.empty[Float])): _*)
      q.processAllAvailable()
      assert(cur == s"$base/a") // A/B alternation
    } finally q.stop()
    val live = Similarity.IvfPqIndex.load(spark, cur)
    // the surviving set, re-encoded one-shot under the SAME quantizers
    val survivors = corpus
      .unionByName(fresh.toDF("vec_id", "embedding"))
      .filter(!$"vec_id".isin(7L, 11L, 13L, 9000L, 9100L))
    val oneShot = Similarity.ivfPqAdd(
      initial.copy(cells = initial.cells.limit(0)), survivors, m = 4)
    def cellRows(i: Similarity.IvfPqIndex) =
      i.cells.select($"neighbor_id", $"codes", $"cell")
        .as[(Long, Seq[Int], Long)].collect().sortBy(_._1).toSeq
    assert(cellRows(live) == cellRows(oneShot))
    assert(live.books.collect().toSet == initial.books.collect().toSet)
    // and it serves: the forgotten ids never come back
    val hits = Similarity.ivfPqSearch(live,
        corpus.filter($"vec_id" < 6), k = 5, nProbe = 8)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(!hits.exists(Set(7L, 11L, 13L, 9000L, 9100L)),
      "a forgotten id served")

    // RESTART: re-seed from the live generation's DIR (seedDir — passing
    // the loaded index as `initial` again would overwrite the dir while
    // reading it); a further tick keeps composing on top of the history
    val input2 = MemoryStream[(String, Long, Seq[Float])]
    var cur2 = ""
    val q2 = AnnServeStream.maintain(
      input2.toDF().toDF("op", "vec_id", "embedding"), null,
      s"$base/a", s"$base/b", s"$base/ckpt2", seedDir = cur)(d => cur2 = d)
    try {
      assert(cur2 == cur, "restart must publish the seed generation as-is")
      input2.addData(("del", 17L, Seq.empty[Float]))
      q2.processAllAvailable()
      assert(cur2 != cur)
    } finally q2.stop()
    val after = Similarity.IvfPqIndex.load(spark, cur2)
    assert(cellRows(after) ==
      cellRows(Similarity.ivfPqRemove(live, Seq(17L).toDF("vec_id"))))

    // REPLAY VETO (the exactly-once guard, driven directly): re-applying
    // the live generation's own batch id is a no-op — without the marker
    // an at-least-once replay would union the adds in twice
    val inc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Path.of(s"$base/ckpt2/graft_incarnation")), "UTF-8")
    val replay = Seq(("del", 23L, Seq.empty[Float]))
      .toDF("op", "vec_id", "embedding")
    var pub = ""
    // the restarted stream's del tick committed as batch 0 of ckpt2
    assert(AnnServeStream.applyTick(replay, 0L, cur2, s"$base/a",
      s"$base/b", inc, p => pub = p) == cur2)
    assert(pub == "", "a vetoed batch must not publish")
    // a NEWER id applies once; replaying it against the new live no-ops
    val moved = AnnServeStream.applyTick(replay, 1L, cur2, s"$base/a",
      s"$base/b", inc, p => pub = p)
    assert(moved != cur2 && pub == moved)
    assert(AnnServeStream.applyTick(replay, 1L, moved, s"$base/a",
      s"$base/b", inc, _ => fail("replay published")) == moved)
    assert(cellRows(Similarity.IvfPqIndex.load(spark, moved)) ==
      cellRows(Similarity.ivfPqRemove(after, Seq(23L).toDF("vec_id"))))
  }
}
