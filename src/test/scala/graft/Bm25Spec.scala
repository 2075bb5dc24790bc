package graft

import graft.operators.Bm25

/** BM25 retrieval: hand-computed scaled-integer scores, ranking, and
  * partition invariance. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian"))
    .toDF("doc_id", "text")

  test("topK: exact quantized scores against the hand computation") {
    val queries = Seq((100L, "apple cherry")).toDF("q_id", "q_text")
    val out = Bm25.topK(docs, "doc_id", "text", queries, "q_id", "q_text",
      k = 3)
      .orderBy($"q_id", $"rn")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    // N=3, Σdl=9, avgdl_e3=3000; norm_e6 = 250000 + 250·dl·1000/1... see
    // operator doc. idf_e6(apple)=round(ln(8/3)·1e6)=980829;
    // idf_e6(cherry)=round(ln(1.6)·1e6)=470004.
    // d1: term(apple): ⌊980829·2·2200 / (2000+1200)⌋ = 1348639
    // d3: term(cherry): ⌊470004·3·2200 / (3000+1500)⌋ = 689339
    // d2: term(cherry): ⌊470004·1·2200 / (1000+900)⌋  = 544215
    assert(out == Seq(
      (100L, 1, 1L, 1348639L, 1L),
      (100L, 2, 3L, 689339L, 1L),
      (100L, 3, 2L, 544215L, 1L)))
  }

  test("topK: k truncates, multi-term queries sum, missing terms contribute 0") {
    val queries = Seq(
      (1L, "banana cherry"), // matches all three docs
      (2L, "zzz absent"))    // matches nothing -> query emits nothing
      .toDF("q_id", "q_text")
    val out = Bm25.topK(docs, "doc_id", "text", queries, "q_id", "q_text",
      k = 2)
      .orderBy($"q_id", $"rn")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1).toSet == Set(1L))
    assert(out.size == 2) // k=2 of 3 matching docs
    // d2 matches BOTH terms (banana + cherry); others match one
    assert(out.head._3 == 2L && out.head._5 == 2L)
  }

  test("topK: maxHits budget refuses the stopword-frequent regime loudly") {
    // every query term appears in most docs: hit volume = Σ df = 2 + 2
    val queries = Seq((1L, "banana cherry")).toDF("q_id", "q_text")
    val e = intercept[IllegalArgumentException] {
      Bm25.topK(docs, "doc_id", "text", queries, "q_id", "q_text",
        k = 2, maxHits = 3L).collect()
    }
    assert(e.getMessage.contains("4 hit rows"))
    assert(e.getMessage.contains("refusing before any join work"))
    // under budget: identical results to the ungated run
    val gated = Bm25.topK(docs, "doc_id", "text", queries, "q_id", "q_text",
      k = 2, maxHits = 4L).orderBy($"q_id", $"rn")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    val open = Bm25.topK(docs, "doc_id", "text", queries, "q_id", "q_text",
      k = 2).orderBy($"q_id", $"rn")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(gated == open && gated.nonEmpty)
  }

  private val big = (0L until 300L).map { i =>
    (i, s"w${i % 7} w${i % 11} w${i % 13} common w${i % 3}")
  }.toDF("doc_id", "text")
  private val bigQueries = Seq((1L, "w1 w2 common"), (2L, "w5 w10"))
    .toDF("q_id", "q_text")

  private type Hit = (Long, Int, Long, Long, Long)
  private def hits(df: org.apache.spark.sql.DataFrame): Seq[Hit] =
    df.orderBy($"q_id", $"rn").as[Hit].collect().toSeq

  /** The index as a value: every frame collected sorted + the scalars —
    * the bit-for-bit comparison the tick contract promises. */
  private def indexValue(i: Bm25.Bm25Index) = (
    i.tf.select($"doc_id", $"token", $"tf").as[(Long, String, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq,
    i.dl.select($"doc_id", $"dl").as[(Long, Long)].collect().sorted.toSeq,
    i.df.select($"token", $"df").as[(String, Long)].collect().sorted.toSeq,
    i.nDocs, i.totTokens)

  test("index: build -> save -> load -> search reproduces topK exactly") {
    val fromScratch = hits(Bm25.topK(big, "doc_id", "text", bigQueries,
      "q_id", "q_text", k = 5))
    val idx = Bm25.buildIndex(big, "doc_id", "text")
    idx.save("bm25_spec_idx", nBuckets = 4)
    val loaded = Bm25.Bm25Index.load(spark, "bm25_spec_idx")
    assert(loaded.idCol == "doc_id" && loaded.nDocs == 300L)
    val served = hits(Bm25.search(loaded, bigQueries, "q_id", "q_text", k = 5))
    assert(served == fromScratch && served.size == 10)
    // the dials behave identically on the served route
    assert(hits(Bm25.search(loaded, bigQueries, "q_id", "q_text", k = 5,
      minDf = 50L)) ==
      hits(Bm25.topK(big, "doc_id", "text", bigQueries, "q_id", "q_text",
        k = 5, minDf = 50L)))
    val e = intercept[IllegalArgumentException] {
      Bm25.search(loaded, bigQueries, "q_id", "q_text", k = 5, maxHits = 10L)
    }
    assert(e.getMessage.contains("refusing before any join work"))
  }

  test("add/remove ticks == full rebuild, bit-for-bit; unknown ids no-op") {
    val head = big.filter($"doc_id" < 250L)
    val tail = big.filter($"doc_id" >= 250L)
    // admission tick: fold the tail batch into the head index
    val ticked = Bm25.add(Bm25.buildIndex(head, "doc_id", "text"),
      tail, "text")
    val full = Bm25.buildIndex(big, "doc_id", "text")
    assert(indexValue(ticked) == indexValue(full))
    // serving off the ticked index == the from-scratch answer (q140's pin)
    assert(hits(Bm25.search(ticked, bigQueries, "q_id", "q_text", k = 5)) ==
      hits(Bm25.topK(big, "doc_id", "text", bigQueries, "q_id", "q_text",
        k = 5)))
    // deletion tick: the inverse — removing the tail ids recovers the head
    // index exactly (zero-df tokens drop); unknown ids change nothing
    val removed = Bm25.remove(full,
      tail.select($"doc_id").unionByName(Seq(99999L).toDF("doc_id")))
    assert(indexValue(removed) ==
      indexValue(Bm25.buildIndex(head, "doc_id", "text")))
  }

  test("zero-token docs carry dl = 0: add-then-remove leaves the index untouched") {
    val base = Bm25.buildIndex(big, "doc_id", "text")
    // a doc whose text tokenizes to nothing: counted in nDocs (it dilutes
    // avgdl) AND visible to remove via its (id, 0) dl row — the r15 blind
    // spot left nDocs off by one forever after this round trip
    val empty = Seq((7777L, "   ")).toDF("doc_id", "text")
    val added = Bm25.add(base, empty, "text")
    assert(added.nDocs == base.nDocs + 1 &&
      added.totTokens == base.totTokens)
    assert(added.dl.filter($"doc_id" === 7777L)
      .select($"dl").as[Long].collect().toSeq == Seq(0L))
    val back = Bm25.remove(added, Seq(7777L).toDF("doc_id"))
    assert(indexValue(back) == indexValue(base))
    // and a from-scratch build over a corpus WITH empty docs matches the
    // tick route bit-for-bit (the rebuild-equality contract, empty case)
    assert(indexValue(added) ==
      indexValue(Bm25.buildIndex(big.select($"doc_id", $"text")
        .unionByName(empty), "doc_id", "text")))
  }

  test("search: metadata-filtered serving — candidates restrict, corpus stats keep") {
    val idx = Bm25.buildIndex(big, "doc_id", "text")
    val evens = big.filter($"doc_id" % 2 === 0).select($"doc_id")
    val filtered = hits(Bm25.search(idx, bigQueries, "q_id", "q_text",
      k = 5, allowedIds = evens))
    // Lucene semantics: the expected list is the UNFILTERED ranking
    // restricted to the allowed docs, re-ranked, top-5 — with the scores
    // UNCHANGED (idf/avgdl stay corpus-level; a filter narrows who
    // competes, it does not re-weigh the language)
    val full = hits(Bm25.search(idx, bigQueries, "q_id", "q_text", k = 300))
    val expected = full.filter(_._3 % 2 == 0)
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._4, r._3)).take(5).zipWithIndex
          .map { case (r, i) => (r._1, i + 1, r._3, r._4, r._5) }
      }.sortBy(r => (r._1, r._2))
    assert(filtered == expected && filtered.nonEmpty)
    assert(filtered.forall(_._3 % 2 == 0))
    idx.release()
  }

  test("index release contract: save() frees the build/tick pins; release() covers the unsaved path") {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    def residual = spark.sparkContext.getPersistentRDDs.values.toSeq
    def awaitEmpty(label: String): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (residual.nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(residual.isEmpty,
        s"$label left cached blocks: ${residual.map(_.toString)}")
    }
    // save() consumes the in-memory index: the stored tables are the
    // artifact, and the build + tick persists free themselves
    val base = Bm25.buildIndex(big.filter($"doc_id" < 200L),
      "doc_id", "text")
    Bm25.add(base, big.filter($"doc_id" >= 200L), "text")
      .save("bm25_spec_release", nBuckets = 4)
    awaitEmpty("save()")
    // the unsaved route frees explicitly, after its final action
    val mem = Bm25.buildIndex(big, "doc_id", "text")
    assert(Bm25.search(mem, bigQueries, "q_id", "q_text", k = 3)
      .count() > 0)
    mem.release()
    awaitEmpty("release()")
  }

  test("served search: the corpus-side tf-dl join is exchange-free off the bucketed store") {
    // the 100 TB contract: per-search corpus work is a co-located scan —
    // the postings and length frames bucket on the doc id, so the length
    // norm join moves ZERO corpus rows; the first shuffle any corpus row
    // sees is the hit-sized (q_id, doc_id) score aggregate. Baseline: the
    // same search over UNBUCKETED frames pays two corpus exchanges.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      def count(p: SparkPlan): Int = {
        val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        self + kids.map(count).sum
      }
      count(df.queryExecution.executedPlan)
    }
    val idx = Bm25.buildIndex(big, "doc_id", "text")
    idx.save("bm25_spec_xfree", nBuckets = 4)
    val loaded = Bm25.Bm25Index.load(spark, "bm25_spec_xfree")
    // unbucketed twin: identical frames, no layout
    val flat = loaded.copy(
      tf = loaded.tf.collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toDF("doc_id", "token", "tf"),
      dl = loaded.dl.collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
        .toDF("doc_id", "dl"))
    // broadcast hints still apply under -1 (hints beat config); only the
    // corpus-vs-corpus join regime is forced, as at real scale
    val th = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val served = Bm25.search(loaded, bigQueries, "q_id", "q_text", k = 5)
      val unbucketed = Bm25.search(flat, bigQueries, "q_id", "q_text", k = 5)
      assert(hits(served) == hits(unbucketed))
      val (eb, eu) = (exchanges(served), exchanges(unbucketed))
      assert(eb == eu - 2,
        s"bucketed route must elide exactly the two corpus-side exchanges " +
          s"of the tf-dl join (bucketed=$eb, unbucketed=$eu)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", th)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("topK: partitioning-invariant") {
    val big = (0L until 300L).map { i =>
      (i, s"w${i % 7} w${i % 11} w${i % 13} common w${i % 3}")
    }.toDF("doc_id", "text")
    val queries = Seq((1L, "w1 w2 common"), (2L, "w5 w10")).toDF("q_id", "q_text")
    val a = Bm25.topK(big.repartition(1), "doc_id", "text", queries,
      "q_id", "q_text", k = 5).orderBy($"q_id", $"rn")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    val b = Bm25.topK(big.repartition(32), "doc_id", "text", queries,
      "q_id", "q_text", k = 5).orderBy($"q_id", $"rn")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.size == 10)
  }
}
