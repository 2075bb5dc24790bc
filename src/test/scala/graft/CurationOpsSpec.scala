package graft

import graft.functions.TextFns
import graft.operators.{Contamination, Dedup}
import org.apache.spark.sql.functions._

/** Specs for the corpus-curation operators added round 2: benchmark contamination,
  * repetition quality signals, duplicate-cluster resolution. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("contamination: shared n-grams counted, clean docs zero, short docs zero") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // shares exactly "alpha beta gamma delta epsilon" with the benchmark
      (1L, "alpha beta gamma delta epsilon other words here"),
      (2L, "totally different words with no overlap at all"),
      (3L, "tiny doc")) // < 5 words -> no grams
      .toDF("doc_id", "text")
    val out = Contamination.sharedNgrams(corpus, bench, "doc_id", "text", 5)
      .orderBy($"doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 1L, true), (2L, 0L, false), (3L, 0L, false)))
  }

  test("scrubBenchWindows: exact spans cut, rest survives in place, idempotent") {
    // benchmark span of 6 tokens; corpus doc embeds it mid-document
    val bench = Seq((100L, "b1 b2 b3 b4 b5 b6")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "pre1 pre2 b1 b2 b3 b4 b5 b6 post1 post2"), // mid-doc contamination
      (2L, "clean doc with enough words to have windows ok"),
      (3L, "b1 b2 b3 b4 b5 b6"),   // fully contaminated -> empty husk
      (4L, "b1 b2 b3 b4 b5"))       // shorter than the window -> untouched
      .toDF("doc_id", "text")
    val out = Contamination.scrubBenchWindows(corpus, bench, "doc_id", "text",
        windowTokens = 6)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 10L, 6L, "pre1 pre2 post1 post2"),
      (2L, 9L, 0L, "clean doc with enough words to have windows ok"),
      (3L, 6L, 6L, ""),
      (4L, 5L, 0L, "b1 b2 b3 b4 b5")))
    // idempotence: scrubbing the scrubbed corpus removes nothing further
    val again = Contamination.scrubBenchWindows(
        out.map { case (id, _, _, t) => (id, t) }.toDF("doc_id", "text"),
        bench, "doc_id", "text", windowTokens = 6)
      .agg(sum($"n_removed")).as[Long].head()
    assert(again == 0L)
  }

  test("scrubBenchWindows: overlapping windows cover the union of positions") {
    // bench carries an 8-token span -> corpus doc shares it; windows of 6
    // at offsets 0,1,2 all match; covered union = all 8 tokens
    val bench = Seq((100L, "s1 s2 s3 s4 s5 s6 s7 s8")).toDF("doc_id", "text")
    val corpus = Seq((1L, "x1 s1 s2 s3 s4 s5 s6 s7 s8 x2"))
      .toDF("doc_id", "text")
    val out = Contamination.scrubBenchWindows(corpus, bench, "doc_id", "text",
        windowTokens = 6)
      .as[(Long, Long, Long, String)].head()
    assert(out == ((1L, 10L, 8L, "x1 x2")))
  }

  test("maxRunLength: sorted multiplicities; empty array is 0") {
    val out = Seq(
      (1L, Seq(1L, 1L, 1L, 2L, 3L, 3L)),
      (2L, Seq(5L)),
      (3L, Seq.empty[Long]))
      .toDF("id", "arr")
      .select($"id", TextFns.maxRunLength($"arr").as("m"))
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L), (2L, 1L), (3L, 0L)))
  }

  test("repetitionStruct: word/bigram multiplicities for a repetitive doc") {
    val out = Seq((1L, "spam spam spam spam eggs"), (2L, "one"), (3L, "all unique words here"))
      .toDF("doc_id", "text")
      .withColumn("r", TextFns.repetitionStruct($"text"))
      .select($"doc_id", $"r.n_words", $"r.n_distinct_words", $"r.n_bigrams",
        $"r.top_bigram_n")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // "spam spam" bigram occurs 3 times; single-word doc has no bigrams
    assert(out == Seq((1L, 5L, 2L, 4L, 3L), (2L, 1L, 1L, 0L, 0L),
      (3L, 4L, 4L, 3L, 1L)))
  }

  test("stratifiedSample: deterministic membership, exact re-run agreement") {
    val df = (0L until 1000L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val fr = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0)
    val s1 = graft.operators.DataMix.stratifiedSample(df, "id", "src", fr, 0.1)
      .as[(Long, String)].collect().toSet
    val s2 = graft.operators.DataMix.stratifiedSample(df, "id", "src", fr, 0.1)
      .as[(Long, String)].collect().toSet
    assert(s1 == s2) // byte-for-byte reproducible, no RNG
    val bySrc = s1.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc("src0") == 250)          // fraction 1.0 keeps everything
    assert(!bySrc.contains("src2"))       // fraction 0.0 keeps nothing
    assert(bySrc("src1") > 75 && bySrc("src1") < 175)  // ~0.5 of 250
    assert(bySrc("src3") > 5 && bySrc("src3") < 60)    // default 0.1 of 250
    val report = graft.operators.DataMix.mixtureReport(df, "id", "src", fr, 0.1)
      .orderBy($"src").as[(String, Long, Long)].collect()
    assert(report.map(_._2).sum == 1000)
    assert(report.map(_._3).sum == s1.size) // report agrees with the sample
  }

  test("temperatureSample: alpha limits, flattening, clamp, determinism") {
    // skewed corpus: src0 dominates 8:1:1
    val df = ((0L until 800L).map(i => (i, "src0")) ++
      (800L until 900L).map(i => (i, "src1")) ++
      (900L until 1000L).map(i => (i, "src2"))).toDF("id", "src")
    import graft.operators.DataMix
    // alpha = 1 is proportional: every stratum gets the SAME rate target/N,
    // so the sample equals plain fraction-sampling at target/N
    val r1 = DataMix.temperatureRates(df, "src", 300L, alpha = 1.0)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(r1.values.toSet.size == 1 && math.abs(r1("src0") - 0.3) < 1e-9)
    // alpha = 0 is uniform: equal EXPECTED take per stratum -> rate inversely
    // proportional to stratum size
    val r0 = DataMix.temperatureRates(df, "src", 300L, alpha = 0.0)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(r0("src0") * 8.0 - r0("src1")) < 1e-9)
    assert(math.abs(r0("src1") - r0("src2")) < 1e-9)
    // alpha = 1/2 flattens: the dominant source's share of the sample sits
    // strictly between uniform (1/3) and proportional (8/10)
    val w = Seq(800L, 100L, 100L).map(n => math.floor(math.sqrt(n.toDouble) * 1e6))
    val share0 = w.head / w.sum
    assert(share0 > 1.0 / 3.0 && share0 < 0.8)
    val got = DataMix.temperatureSample(df, "id", "src", 300L, alpha = 0.5)
      .select($"id", $"src").as[(Long, String)].collect().toSet
    val bySrc = got.groupBy(_._2).view.mapValues(_.size).toMap
    // expected takes: 300 * share (src0 ~ 174, src1/src2 ~ 62.8 each)
    assert(bySrc("src0") > 130 && bySrc("src0") < 220)
    assert(bySrc("src1") > 35 && bySrc("src1") < 95)
    // membership is partition-invariant and re-run stable
    val again = DataMix.temperatureSample(df.repartition(13), "id", "src",
      300L, alpha = 0.5).select($"id", $"src").as[(Long, String)].collect().toSet
    assert(got == again)
    // a target beyond the corpus clamps every stratum to keep-all
    assert(DataMix.temperatureSample(df, "id", "src", 100000L, 0.5)
      .count() == 1000L)
  }

  test("knuthHash: overflow-safe for huge ids, ANSI-mode clean, exact mod-2^32") {
    // r7 ADVICE: the naive id * 2654435761 overflows Long past id ~3.5e9 —
    // silently wrapping (default) or throwing (ANSI). The decomposed form
    // must equal the mathematical mod-2^32 hash for ANY id, under ANSI mode.
    val ids = Seq(0L, 1L, 12345L, 3469557302L, 3469557303L, 4294967295L,
      4294967296L, 5000000000L, Long.MaxValue / 2, Long.MaxValue - 1,
      Long.MaxValue)
    val df = ids.map(Tuple1(_)).toDF("id")
    // suites share one session (SparkSpec getOrCreate) — restore the PRIOR
    // value, not a hardcoded one, or every later suite inherits a flipped
    // ANSI mode (caught r11: size(null) is -1 vs null across that flip)
    val prevAnsi = spark.conf.getOption("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val got = df.select($"id", graft.operators.DataMix.knuthHash($"id"))
        .as[(Long, Long)].collect().toMap
      for (id <- ids) {
        val want = ((BigInt(id) mod BigInt(4294967296L)) * BigInt(2654435761L))
          .mod(BigInt(4294967296L)).toLong
        assert(got(id) == want, s"id=$id")
      }
    } finally prevAnsi match {
      case Some(v) => spark.conf.set("spark.sql.ansi.enabled", v)
      case None => spark.conf.unset("spark.sql.ansi.enabled")
    }
  }

  test("assignSplit: exhaustive, disjoint, stable, fraction-faithful") {
    val df = (0L until 10000L).map(i => Tuple1(i)).toDF("id")
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val out = graft.operators.DataMix.assignSplit(df, "id", splits)
      .as[(Long, String)].collect()
    assert(out.length == 10000) // every row assigned exactly once
    val byName = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    assert(byName("train") > 8700 && byName("train") < 9300)
    assert(byName("val") > 300 && byName("val") < 700)
    // re-run produces the identical assignment (no RNG)
    val again = graft.operators.DataMix.assignSplit(df, "id", splits)
      .as[(Long, String)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
    intercept[IllegalArgumentException] {
      graft.operators.DataMix.assignSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("assignSplitByComponent: clusters land whole, singletons fall back, admission inherits") {
    val docs = (0L until 3000L).map(i => Tuple1(i)).toDF("doc_id")
    // clusters of 3: {0,1,2}->0, {3,4,5}->3, ... for the first 1500 ids;
    // the rest are unlabeled singletons
    val labels = (0L until 1500L).map(i => (i, i - i % 3))
      .toDF("id", "component")
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val out = graft.operators.DataMix.assignSplitByComponent(
        docs, "doc_id", labels, splits)
      .as[(Long, Long, String)].collect()
    assert(out.length == 3000)
    val byDoc = out.map(r => r._1 -> (r._2, r._3)).toMap
    // the LEAKAGE contract: every cluster maps to exactly one split
    for (root <- 0L until 1500L by 3L) {
      assert(Set(byDoc(root), byDoc(root + 1), byDoc(root + 2)).size == 1,
        s"cluster $root straddles splits")
      assert(byDoc(root)._1 == root)
    }
    // unlabeled docs key on their own id — identical to the plain split
    val plain = graft.operators.DataMix.assignSplit(
        docs.filter($"doc_id" >= 1500L), "doc_id", splits)
      .as[(Long, String)].collect().toMap
    out.filter(_._1 >= 1500L).foreach { r =>
      assert(r._2 == r._1 && r._3 == plain(r._1))
    }
    // incremental admission: a NEW doc joining cluster 0 inherits the
    // cluster's split verbatim (the root is the standing minimum)
    val grown = graft.operators.DataMix.assignSplitByComponent(
        Seq(9999L).toDF("doc_id"), "doc_id",
        Seq((9999L, 0L)).toDF("id", "component"), splits)
      .as[(Long, Long, String)].head()
    assert(grown._2 == 0L && grown._3 == byDoc(0L)._2)
  }

  test("assignSplitByComponent: STRING ids — unlabeled docs spread across splits") {
    // the old cast("long") fallback nulled every unlabeled string id into
    // ONE split_key, silently skewing the advertised proportions
    val docs = (0 until 400).map(i => Tuple1(s"http://s${i % 7}.test/p/$i"))
      .toDF("url")
    val labels = Seq(("http://s0.test/p/0", 7L), ("http://s1.test/p/1", 7L))
      .toDF("id", "component")
    val splits = Seq("train" -> 0.8, "test" -> 0.2)
    val out = graft.operators.DataMix.assignSplitByComponent(
        docs, "url", labels, splits)
      .as[(String, Long, String)].collect()
    assert(out.length == 400)
    // the labeled cluster lands whole
    val clustered = out.filter(r =>
      r._1 == "http://s0.test/p/0" || r._1 == "http://s1.test/p/1")
    assert(clustered.map(_._2).toSet == Set(7L) &&
      clustered.map(_._3).toSet.size == 1)
    // unlabeled docs carry DISTINCT non-null keys and hit both splits
    val singles = out.filterNot(r =>
      r._1 == "http://s0.test/p/0" || r._1 == "http://s1.test/p/1")
    assert(singles.map(_._2).distinct.length == singles.length)
    val frac = singles.count(_._3 == "train").toDouble / singles.length
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac")
  }

  test("sampleStratified: exact cap per stratum, partition-invariant, rank = hash order") {
    val df = (0L until 2000L).map(i => (s"src${i % 4}", i)).toDF("src", "id")
    val a = graft.operators.DataMix
      .sampleStratified(df.repartition(1), Seq("src"), 5, "id", Seq("id"))
      .as[(String, Int, Long)].collect().toSet
    val b = graft.operators.DataMix
      .sampleStratified(df.repartition(13), Seq("src"), 5, "id", Seq("id"))
      .as[(String, Int, Long)].collect().toSet
    assert(a == b) // the heap's total order is partition-independent
    assert(a.size == 20) // exactly n per stratum
    assert(a.groupBy(_._1).forall(_._2.size == 5))
    // selection = the n smallest Knuth hashes of each stratum, rank = order
    val want = (0L until 2000L).groupBy(i => s"src${i % 4}").flatMap {
      case (s, ids) =>
        ids.sortBy(i => ((i * 2654435761L) % 4294967296L, i)).take(5)
          .zipWithIndex.map { case (i, r) => (s, r + 1, i) }
    }.toSet
    assert(a == want)
    // a stratum smaller than n returns whole-stratum, ranked
    val tiny = Seq(("only", 1L), ("only", 2L)).toDF("src", "id")
    assert(graft.operators.DataMix
      .sampleStratified(tiny, Seq("src"), 5, "id", Seq("id"))
      .count() == 2)
  }

  test("sampleToBudget: greedy hash-order prefix, exact boundary, partition-invariant") {
    // weights chosen so budgets cut INSIDE a hash bucket (the boundary
    // window path) and strata differ in totals
    val df = (0L until 600L).map(i => (s"s${i % 3}", i, 10L + i % 7))
      .toDF("src", "id", "w")
    def run(part: Int, budget: Long) = graft.operators.DataMix
      .sampleToBudget(df.repartition(part), Seq("src"), budget, "id", $"w")
      .select($"src", $"id").as[(String, Long)].collect().toSet
    val got = run(1, 500L)
    assert(got == run(11, 500L)) // histogram cutoff is partition-independent
    // reference: the literal greedy prefix in (knuth-hash, id) order
    // (.toSeq first: flatMap on a Map with pair elements would collapse to
    // one entry per stratum)
    val want = (0L until 600L).groupBy(i => s"s${i % 3}").toSeq.flatMap {
      case (s, ids) =>
        val ordered = ids.sortBy(i => ((i * 2654435761L) % 4294967296L, i))
        val cums = ordered.scanLeft(0L)((acc, i) => acc + 10L + i % 7).tail
        ordered.zip(cums).takeWhile(_._2 <= 500L).map { case (i, _) => (s, i) }
    }.toSet
    assert(got == want)
    // inclusive semantics: a budget below the first doc's weight keeps nothing
    assert(run(4, 5L).isEmpty)
    // a budget >= the stratum total keeps everything (cutoff never fires)
    assert(run(4, 1000000L).size == 600)
  }

  test("epochPlan: water-filling caps, epoch arithmetic, overflow domain, invariance") {
    // one doc per (source, token-count) unit keeps avail hand-computable:
    // web 1000 tokens, code 100, wiki 50
    val df = Seq(("web", 1000L), ("code", 100L), ("wiki", 50L))
      .toDF("src", "n_tok")
    def plan(budget: Long, w: Map[String, Long], maxE3: Long, part: Int = 1) =
      graft.operators.DataMix.epochPlan(df.repartition(part), "src",
          $"n_tok", budget, w, maxEpochsE3 = maxE3)
        .select($"src", $"n_docs", $"avail_tokens", $"mix_w", $"cap_tokens",
          $"alloc_tokens", $"epochs_e3", $"unallocated_tokens")
        .as[(String, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSet
    // hand-walked fold at 2-epoch caps: wiki (weight 2) saturates at 100,
    // code at 200, web soaks the remaining 300 of the 600 budget
    val got = plan(600L, Map("code" -> 1L, "wiki" -> 2L), 2000L)
    assert(got == Set(
      ("wiki", 1L, 50L, 2L, 100L, 100L, 2000L, 0L),
      ("code", 1L, 100L, 1L, 200L, 200L, 2000L, 0L),
      ("web", 1L, 1000L, 1L, 2000L, 300L, 300L, 0L)))
    assert(got == plan(600L, Map("code" -> 1L, "wiki" -> 2L), 2000L,
      part = 7)) // the fold is one in-row pass — partition-independent
    // every stratum saturates: allocs == caps, the excess reports honestly
    val sat = plan(5000L, Map("code" -> 1L, "wiki" -> 2L), 2000L)
    assert(sat.forall(r => r._6 == r._5 && r._7 == 2000L && r._8 == 2700L))
    // caps never bind (1000-epoch ceiling): allocation is exactly
    // weight-proportional and the budget is fully spent
    val prop = plan(400L, Map("web" -> 2L), 1000000L)
    assert(prop.map(r => r._1 -> r._6).toMap ==
      Map("web" -> 200L, "code" -> 100L, "wiki" -> 100L))
    assert(prop.forall(_._8 == 0L))
    // the documented exactness domain: ~9e15 tokens in one stratum still
    // computes the split-form epochs without overflow
    val big = graft.operators.DataMix.epochPlan(
        Seq(("s", 9000000000000000L)).toDF("src", "n_tok"), "src",
        $"n_tok", 100000000000000L, Map.empty)
      .select($"epochs_e3", $"cap_tokens").as[(Long, Long)].head()
    assert(big == ((11L, 9000000000000000L)))
    // empty corpus -> empty plan (no null-fold residue row)
    assert(graft.operators.DataMix.epochPlan(
      df.filter($"n_tok" < 0), "src", $"n_tok", 100L, Map.empty)
      .isEmpty)
  }

  test("executeEpochPlan: full epochs replicate, fractional epoch is the stable hash prefix") {
    import graft.operators.DataMix
    // web: 10 docs x 100 tokens (avail 1000); code: 4 x 25 (avail 100);
    // wiki: 2 x 25 (avail 50) — the epochPlan fixture's avails, spread
    // over docs so prefixes are non-trivial
    val docs = ((1L to 10L).map(i => ("web", i, 100L)) ++
      (11L to 14L).map(i => ("code", i, 25L)) ++
      (21L to 22L).map(i => ("wiki", i, 25L)))
      .toDF("src", "id", "n_tok")
    val plan = DataMix.epochPlan(docs, "src", $"n_tok", 600L,
      Map("code" -> 1L, "wiki" -> 2L), maxEpochsE3 = 2000L)
    val got = DataMix.executeEpochPlan(docs, "src", "id", $"n_tok", plan)
      .select($"src", $"id", $"epoch_idx")
      .as[(String, Long, Long)].collect().toSet
    // wiki and code saturate at exactly 2 epochs (rem 0): every doc
    // appears at epoch 0 and 1, nothing fractional
    assert(got.filter(_._1 == "wiki") ==
      (21L to 22L).flatMap(i => Seq(("wiki", i, 0L), ("wiki", i, 1L))).toSet)
    assert(got.filter(_._1 == "code") ==
      (11L to 14L).flatMap(i => Seq(("code", i, 0L), ("code", i, 1L))).toSet)
    // web got 300 of its 1000 tokens: zero full epochs, the fractional
    // epoch is the greedy knuth-hash-order prefix with cum <= 300
    val webOrder = (1L to 10L).sortBy(i => ((i * 2654435761L) % 4294967296L, i))
    val webWant = webOrder.zip(webOrder.scanLeft(0L)(_ + _ * 0 + 100L).tail)
      .takeWhile(_._2 <= 300L).map { case (i, _) => ("web", i, 0L) }.toSet
    assert(got.filter(_._1 == "web") == webWant)
    // token conservation: materialized tokens == full·avail + prefix sums
    val totTok = got.toSeq.map { case (s, i, _) =>
      if (s == "web") 100L else 25L }.sum
    assert(totTok == 2L * 50L + 2L * 100L + 300L)
    // full + fractional together: a hand plan at 1.25 epochs of web —
    // every doc at epoch 0, the 250-token prefix again at epoch 1
    val hand = Seq(("web", 1000L, 1250L))
      .toDF("src", "avail_tokens", "alloc_tokens")
    val g2 = DataMix.executeEpochPlan(docs.filter($"src" === "web"),
        "src", "id", $"n_tok", hand)
      .select($"id", $"epoch_idx").as[(Long, Long)].collect().toSet
    val prefix250 = webOrder.zip(webOrder.scanLeft(0L)(_ + _ * 0 + 100L).tail)
      .takeWhile(_._2 <= 250L).map(_._1)
    assert(g2 == (1L to 10L).map((_, 0L)).toSet ++
      prefix250.map((_, 1L)).toSet)
    // sampleToBudgetEach with a uniform budget frame == sampleToBudget
    val budgets = Seq(("web", 300L), ("code", 300L), ("wiki", 300L))
      .toDF("src", "b")
    assert(DataMix.sampleToBudgetEach(docs, Seq("src"), budgets, "id",
        $"n_tok").select($"src", $"id").as[(String, Long)].collect().toSet
      == DataMix.sampleToBudget(docs, Seq("src"), 300L, "id", $"n_tok")
        .select($"src", $"id").as[(String, Long)].collect().toSet)
    // strata absent from the budget frame keep nothing
    assert(DataMix.sampleToBudgetEach(docs, Seq("src"),
        Seq(("web", 300L)).toDF("src", "b"), "id", $"n_tok")
      .select($"src").as[String].collect().toSet == Set("web"))
  }

  test("shardPositions/writeShards: dense per-shard ranks, files in permutation order") {
    import graft.operators.DataMix
    // positions must be the per-shard dense 1..n rank over (hash, id) — the
    // histogram-offset + bucket-window composition vs the literal definition —
    // and must not depend on input partitioning
    val ids = spark.range(5000).select($"id".as("doc_id"))
    val got = DataMix.shardPositions(ids, "doc_id", nShards = 4)
      .select($"doc_id", $"shard", $"pos")
      .as[(Long, Int, Long)].collect().toSeq
    val byShard = got.groupBy(_._2)
    assert(byShard.keySet == Set(0, 1, 2, 3))
    for ((_, rows) <- byShard) {
      assert(rows.map(_._3).sorted == (1L to rows.size).toSeq)
      // per-shard hash order: sort members by (knuth hash, id), positions agree
      def kh(id: Long) = (id % 4294967296L) * 2654435761L % 4294967296L
      val expect = rows.map(_._1).sortBy(id => (kh(id), id))
        .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
      assert(rows.forall { case (id, _, pos) => expect(id) == pos })
    }
    val skewed = DataMix.shardPositions(ids.repartition(37), "doc_id", 4)
      .select($"doc_id", $"shard", $"pos").as[(Long, Int, Long)].collect().toSeq
    assert(skewed.toSet == got.toSet)
    // the writer lays out shard=K dirs with every file ascending in the
    // permutation order, so a reader streams shards pre-shuffled
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    DataMix.writeShards(ids, "doc_id", dir, nShards = 4)
    val dirs = new java.io.File(dir).listFiles.filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet == (0 until 4).map(i => s"shard=$i").toSet)
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    for (k <- 0 until 4; f <- new java.io.File(s"$dir/shard=$k").listFiles
         if f.getName.endsWith(".parquet")) {
      val inFile = spark.read.parquet(f.getPath)
        .select($"doc_id").as[Long].collect().toSeq
      def kh(id: Long) = (id % 4294967296L) * 2654435761L % 4294967296L
      assert(inFile == inFile.sortBy(id => (kh(id), id)),
        s"file ${f.getName} of shard $k not in permutation order")
    }
  }

  test("admitNew: rejects incoming near-dups of the corpus, admits novel docs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about databases and query engines"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again and again"), // copy of 1
      (102L, "the quick brown fox jumps over the lazy cat again and again"), // near-dup of 1
      (103L, "entirely novel material nothing like the existing corpus rows"))
      .toDF("doc_id", "text")
    val admitted = graft.operators.Dedup.admitNew(corpus, incoming,
      "doc_id", "text", n = 3, threshold = 0.5, blockCols = Nil)
      .select($"doc_id").as[Long].collect().toSet
    assert(admitted == Set(103L))
    val matches = graft.operators.Dedup.incrementalJaccardMatches(corpus, incoming,
      "doc_id", "text", n = 3, threshold = 0.5, blockCols = Nil)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(matches == Set((101L, 1L), (102L, 1L)))
  }

  test("vocabulary/oovRate: occurrence-ranked vocab, exact coverage, tokenless docs drop") {
    import graft.operators.TfIdf
    val docs = Seq(
      (1L, "aa aa aa bb cc"),   // 3+1+1
      (2L, "aa bb bb"),         // 1+2
      (3L, "cc dd"),            // cc ties dd on count 2? cc: 1+1=2, dd: 1
      (4L, "   ")               // no tokens -> drops from oovRate
    ).toDF("doc_id", "text")
    // counts: aa=4, bb=3, cc=2, dd=1 -> vocab(2) = {aa, bb}
    val vocab = TfIdf.vocabulary(docs, "text", 2)
      .as[(String, Long)].collect().toSeq
    assert(vocab == Seq(("aa", 4L), ("bb", 3L)))
    val rates = TfIdf.oovRate(docs, "doc_id", "text", docs.sparkSession
        .createDataFrame(vocab).toDF("token", "n_occ"))
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(rates == Seq(
      (1L, 5L, 1L, 200000L),
      (2L, 3L, 0L, 0L),
      (3L, 2L, 2L, 1000000L)))
    // tie at the vocab boundary resolves by token asc: with v=3, "cc" (2
    // occurrences) enters before "dd" (1) — and a cc/dd tie would prefer cc
    val v3 = TfIdf.vocabulary(docs, "text", 3).as[(String, Long)].collect()
    assert(v3.map(_._1).toSeq == Seq("aa", "bb", "cc"))
  }

  test("bigram LM: hand-derived counts/NLL; unseen backoff; short docs drop") {
    import graft.operators.NgramLm
    // corpus: bc(a,b)=3, bc(b,a)=2; ctx a=3, b=2; V={a,b,c}=3
    val docs = Seq(
      (1L, "a b a b"),  // bigrams (a,b),(b,a),(a,b)
      (2L, "a b"),
      (3L, "c"),        // one token -> no bigrams -> drops
      (4L, "b a")
    ).toDF("doc_id", "text")
    val lm = NgramLm.trainBigram(docs, "text")
    assert(lm.vocabSize == 3L)
    assert(lm.bigrams.as[(String, String, Long)].collect().toSet ==
      Set(("a", "b", 3L), ("b", "a", 2L)))
    assert(lm.contexts.as[(String, Long)].collect().toSet ==
      Set(("a", 3L), ("b", 2L)))
    // lp(a,b) = round(ln(4/6)*1e6) = -405465; lp(b,a) = round(ln(3/5)*1e6)
    // = -510826 (the exact integers the oracle must reproduce)
    val got = NgramLm.scoreBigram(docs, "doc_id", "text", lm)
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1321756L, 440585L),
      (2L, 1L, 405465L, 405465L),
      (4L, 1L, 510826L, 510826L)))
    // unseen bigram with a SEEN context: ln(1/(3+3)); both-unseen: ln(1/3)
    val novel = Seq((9L, "a c"), (10L, "x y")).toDF("doc_id", "text")
    val backoff = NgramLm.scoreBigram(novel, "doc_id", "text", lm)
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(backoff == Seq(
      (9L, 1L, 1791759L, 1791759L),
      (10L, 1L, 1098612L, 1098612L)))
  }

  test("per-stratum bigram LM family: one pass == per-lang filtered training, " +
      "per-lang smoothing, strata-less docs drop") {
    import graft.operators.NgramLm
    val docs = Seq(
      (1L, "a b a b", "en"), (2L, "a b", "en"), (3L, "b a", "en"),
      (4L, "x y x y x", "de"), (5L, "y x", "de"), (6L, "z", "de"))
      .toDF("doc_id", "text", "lang")
    val fam = NgramLm.trainBigramBy(docs, "text", Seq("lang"))
    // the family scores every doc exactly as its language's SOLO-trained
    // LM would (same counts, same per-lang V in the smoothing denominator)
    val famScores = NgramLm.scoreBigramBy(docs, "doc_id", "text", fam)
      .select($"doc_id", $"lang", $"n_bigrams", $"nll_e6", $"avg_nll_e6")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val soloScores = Seq("en", "de").flatMap { l =>
      val slice = docs.filter($"lang" === l)
      val lm = NgramLm.trainBigram(slice, "text")
      NgramLm.scoreBigram(slice, "doc_id", "text", lm)
        .select($"doc_id", lit(l).as("lang"), $"n_bigrams", $"nll_e6",
          $"avg_nll_e6")
        .as[(Long, String, Long, Long, Long)].collect()
    }.toSet
    assert(famScores == soloScores,
      s"family $famScores != per-lang solo $soloScores")
    // vocab is per-stratum: en V=2, de V=3 (x, y, z)
    assert(fam.vocab.as[(String, Long)].collect().toSet ==
      Set(("en", 2L), ("de", 3L)))
    // a doc in a stratum the family never trained drops (inner vocab join)
    val alien = Seq((9L, "a b", "fr")).toDF("doc_id", "text", "lang")
    assert(NgramLm.scoreBigramBy(alien, "doc_id", "text", fam).isEmpty)
  }

  test("domainLlr: in-domain docs outrank out-of-domain; llr is the avg-NLL gap") {
    import graft.operators.NgramLm
    val docs = Seq(
      (1L, "math proof theorem lemma math proof", "math"),
      (2L, "theorem lemma math proof theorem", "math"),
      (3L, "court ruling appeal verdict court ruling", "legal"),
      (4L, "appeal verdict court ruling appeal", "legal")
    ).toDF("doc_id", "text", "source")
    val domainLm = NgramLm.trainBigram(
      docs.filter($"source" === "math"), "text")
    val baseLm = NgramLm.trainBigram(docs, "text")
    val llr = NgramLm.domainLlr(docs, "doc_id", "text", domainLm, baseLm)
      .select($"doc_id", $"domain_nll_e6", $"base_nll_e6", $"llr_e6")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // the gap column is exactly base - domain, row by row
    assert(llr.values.forall(r => r._4 == r._3 - r._2))
    // every math doc scores a higher llr than every legal doc
    val math = Seq(1L, 2L).map(llr(_)._4)
    val legal = Seq(3L, 4L).map(llr(_)._4)
    assert(math.min > legal.max,
      s"in-domain docs must outrank: math=$math legal=$legal")
  }

  test("tf-idf: document frequency exact; rare informative tokens outrank ubiquitous") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "the bird flew over the rainbow zebra zebra zebra"))
      .toDF("doc_id", "text")
    val df = graft.operators.TfIdf.documentFrequency(docs, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(df("the") == 3 && df("sat") == 2 && df("zebra") == 1)
    val top = graft.operators.TfIdf.topTfIdf(docs, "doc_id", "text",
      k = 2, minDf = 1)
    val d3 = top.filter($"doc_id" === 3L).orderBy($"rn")
      .select($"token").as[String].collect()
    assert(d3.head == "zebra") // tf 3 × rarest idf beats everything
    // 'the' appears in every doc: idf = ln(1) = 0, never ranks above tied-at-0
    val theScore = top.filter($"token" === "the").select($"score").as[Long].collect()
    assert(theScore.forall(_ == 0L))
  }

  test("redactPii: emails, phones, IPv4 replaced; clean text untouched") {
    val out = Seq(
      (1L, "write to john.doe+x@mail.example.org today"),
      (2L, "call 077-123-4567 or 011 555-1234 now"),
      (3L, "host 10.0.255.7 responded"),
      (4L, "nothing sensitive here"))
      .toDF("id", "text")
      .select($"id", TextFns.redactPii($"text").as("r"))
      .orderBy($"id").as[(Long, String)].collect().toMap
    assert(out(1L) == "write to [EMAIL] today")
    assert(out(2L) == "call [PHONE] or [PHONE] now")
    assert(out(3L) == "host [IP] responded")
    assert(out(4L) == "nothing sensitive here")
  }

  test("chunkTokens: in-row chunks, last chunk truncated, empty docs dropped") {
    val out = graft.operators.Packing.chunkTokens(
      Seq((1L, "a b c d e f g"), (2L, "x y"), (3L, "   "))
        .toDF("doc_id", "text"), "doc_id", "text", chunkSize = 3)
      .select($"doc_id", $"chunk_idx", $"n_chunk_tokens")
      .orderBy($"doc_id", $"chunk_idx")
      .as[(Long, Int, Long)].collect().toSeq
    assert(out == Seq((1L, 0, 3L), (1L, 1, 3L), (1L, 2, 1L), (2L, 0, 2L)))
    // no join, no KEY shuffle: chunking is a narrow projection. The one
    // permitted exchange is the r10 few-file parallelism guard — a
    // round-robin repartition, never a hash shuffle.
    val plan = graft.operators.Packing.chunkTokens(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("chunkTokensStrided: overlapping windows, truncated tails, stride=chunk == chunkTokens") {
    import graft.operators.Packing
    val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")),
      (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val got = Packing.chunkTokensStrided(docs, "doc_id", "text",
        chunkSize = 4, stride = 2)
      .select($"doc_id", $"chunk_idx", $"n_chunk_tokens")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // doc 1: starts 0,2,4,6,8 -> sizes 4,4,4,4,2; doc 2: one window of 1;
    // doc 3: tokenless, dropped
    assert(got === Seq((1L, 0, 4L), (1L, 1, 4L), (1L, 2, 4L), (1L, 3, 4L),
      (1L, 4, 2L), (2L, 0, 1L)))
    // degenerate stride: bit-identical to the disjoint chunker
    val a = Packing.chunkTokens(docs, "doc_id", "text", 4)
      .collect().map(_.toString).sorted.toSeq
    val b = Packing.chunkTokensStrided(docs, "doc_id", "text", 4, 4)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("packBins: budget boundaries per shard, shards independent") {
    val docs = Seq(
      (1L, "w w w w", "s0"),   // 4 tokens, prior 0  -> bin 0
      (2L, "w w w", "s0"),     // prior 4            -> bin 0
      (3L, "w w", "s0"),       // prior 7            -> bin 1 (budget 6)
      (4L, "w w w w w", "s1")) // other shard: prior 0 -> bin 0
      .toDF("doc_id", "text", "source")
    val out = graft.operators.Packing.packBins(docs, "doc_id", "text",
      Seq("source"), tokenBudget = 6L)
      .select($"doc_id", $"n_tokens", $"bin_id")
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 4L, 0L), (2L, 3L, 0L), (3L, 2L, 1L), (4L, 5L, 0L)))
  }

  test("encodeDocsBpe/chunkBpe: position-ordered symbol stream, BPE-unit chunk boundaries") {
    import graft.operators.Packing
    val docs = Seq((1L, "cd ab ab"), (2L, "ab"), (3L, " ")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    // "cd" -> [c, d, </w>], "ab" -> [ab, </w>]: doc 1's stream must follow
    // WORD ORDER (c d </w> ab </w> ab </w>), not the join's arrival order
    val enc = Packing.encodeDocsBpe(docs, "doc_id", "text", merges)
      .orderBy($"doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(enc == Seq(
      (1L, Seq("c", "d", "</w>", "ab", "</w>", "ab", "</w>")),
      (2L, Seq("ab", "</w>"))))
    // chunk boundaries count SYMBOLS: 7 symbols at size 3 -> 3,3,1
    val ch = Packing.chunkBpe(docs, "doc_id", "text", merges, chunkSize = 3)
      .select($"doc_id", $"chunk_idx", $"n_chunk_tokens")
      .orderBy($"doc_id", $"chunk_idx").as[(Long, Int, Long)].collect().toSeq
    assert(ch == Seq((1L, 0, 3L), (1L, 1, 3L), (1L, 2, 1L), (2L, 0, 2L)))
    // the strided form and the generic encoded-column entry agree
    val strided = Packing.chunkBpe(docs, "doc_id", "text", merges,
        chunkSize = 3, stride = 2)
      .select($"doc_id", $"chunk_idx", $"n_chunk_tokens")
      .orderBy($"doc_id", $"chunk_idx").as[(Long, Int, Long)].collect().toSeq
    // doc 1: starts 0,2,4,6 -> 3,3,3,1; doc 2: starts 0 -> 2
    assert(strided == Seq((1L, 0, 3L), (1L, 1, 3L), (1L, 2, 3L), (1L, 3, 1L),
      (2L, 0, 2L)))
    val direct = Packing.chunkEncoded(
        Seq((9L, Seq("x", "y", "z", "w"))).toDF("id", "tokens"),
        "id", "tokens", chunkSize = 3)
      .select($"id", $"chunk_idx", $"n_chunk_tokens")
      .as[(Long, Int, Long)].collect().toSeq
    assert(direct == Seq((9L, 0, 3L), (9L, 1, 1L)))
  }

  test("packBinsBpe: bins walk in BPE units, tokenless docs pack at cost 0") {
    import graft.operators.Packing
    val docs = Seq(
      (1L, "ab ab", "s0"), // 2 words x 3 symbols = 6, prior 0 -> bin 0
      (2L, "a", "s0"),     // 2 symbols, prior 6  -> bin 0 (budget 7)
      (3L, "  ", "s0"),    // tokenless: cost 0, prior 8 -> bin 1 (kept!)
      (4L, "ab", "s1"))    // other shard: prior 0 -> bin 0
      .toDF("doc_id", "text", "source")
    val out = Packing.packBinsBpe(docs, "doc_id", "text", Seq("source"),
        tokenBudget = 7L, merges = Nil)
      .select($"doc_id", $"n_tokens_bpe", $"bin_id")
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 6L, 0L), (2L, 2L, 0L), (3L, 0L, 1L), (4L, 3L, 0L)))
  }

  test("encodeIdsBpe: dense sorted-order vocab ids, position-ordered streams") {
    import graft.operators.{Bpe, Packing}
    val docs = Seq((1L, "cd ab ab"), (2L, "ab")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    // realized vocab sorted: </w> < ab < c < d  ->  ids 1..4
    val vocab = Bpe.vocab(docs, "text", merges)
      .as[(String, Int)].collect().toMap
    assert(vocab == Map("</w>" -> 1, "ab" -> 2, "c" -> 3, "d" -> 4))
    val enc = Packing.encodeIdsBpe(docs, "doc_id", "text", merges)
      .orderBy($"doc_id").as[(Long, Seq[Int])].collect().toSeq
    // doc 1: [c d </w> ab </w> ab </w>] -> [3,4,1,2,1,2,1]; doc 2: [2,1]
    assert(enc == Seq((1L, Seq(3, 4, 1, 2, 1, 2, 1)), (2L, Seq(2, 1))))
  }

  test("packedLayout: per-(shard, bin) token offsets — the addressable batch table") {
    import graft.operators.Packing
    val docs = Seq(
      (1L, "ab ab", "s0"), // 6 tokens, bin 0, offset 0
      (2L, "a", "s0"),     // 2 tokens, bin 0, offset 6
      (3L, "  ", "s0"),    // tokenless: bin 1, offset 0
      (4L, "ab", "s1"))    // other shard: bin 0, offset 0
      .toDF("doc_id", "text", "source")
    val out = Packing.packedLayout(docs, "doc_id", "text", Seq("source"),
        tokenBudget = 7L, merges = Nil)
      .select($"doc_id", $"n_tokens_bpe", $"bin_id", $"offset_tokens")
      .orderBy($"doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 6L, 0L, 0L), (2L, 2L, 0L, 6L),
      (3L, 0L, 1L, 0L), (4L, 3L, 0L, 0L)))
  }

  test("tokenizedCorpus: concat-and-cut pieces — budget-exact bins, exact id slices") {
    import graft.operators.Packing
    val docs = Seq(
      (1L, "ab ab", "s0"), // 6 tokens: bin 0 whole
      (2L, "a", "s0"),     // 2 tokens at prior 6: SPLITS at the 7-boundary
      (3L, "  ", "s0"),    // tokenless: layout row at its stream position
      (4L, "ab", "s1"))    // other shard
      .toDF("doc_id", "text", "source")
    val (pieces, vocab) = Packing.tokenizedCorpus(docs, "doc_id", "text",
      Seq("source"), tokenBudget = 7L, merges = Nil)
    // vocab sorted: </w> < a < b -> ids 1..3
    assert(vocab.as[(String, Int)].collect().toMap ==
      Map("</w>" -> 1, "a" -> 2, "b" -> 3))
    val out = pieces
      .select($"doc_id", $"chunk_idx", $"n_tokens_bpe", $"bin_id",
        $"offset_tokens", $"token_ids")
      .orderBy($"doc_id", $"chunk_idx")
      .as[(Long, Long, Long, Long, Long, Option[Seq[Int]])]
      .collect().toSeq
    assert(out == Seq(
      (1L, 0L, 6L, 0L, 0L, Some(Seq(2, 3, 1, 2, 3, 1))),
      (2L, 0L, 1L, 0L, 6L, Some(Seq(2))), // first token fills bin 0...
      (2L, 1L, 1L, 1L, 0L, Some(Seq(1))), // ...the rest opens bin 1
      (3L, 0L, 0L, 1L, 1L, None),
      (4L, 0L, 3L, 0L, 0L, Some(Seq(2, 3, 1)))))
    // the contract the export publishes: every (shard, bin) sums to
    // exactly the budget except the shard's final bin
    val sums = out.groupBy(r => (r._1 >= 4L, r._4))
      .view.mapValues(_.map(_._3).sum).toMap
    assert(sums == Map((false, 0L) -> 7L, (false, 1L) -> 1L,
      (true, 0L) -> 3L))
    graft.operators.Dedup.release(pieces)
  }

  test("shardManifest: per-bin counts, stream sha is boundary-invariant") {
    import graft.operators.Packing
    def sha(s: String): String = java.security.MessageDigest
      .getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "ab ab", "s0"), (2L, "a", "s0"), (3L, "  ", "s0"),
      (4L, "ab", "s1")).toDF("doc_id", "text", "source")
    val (pieces, _) = Packing.tokenizedCorpus(docs, "doc_id", "text",
      Seq("source"), tokenBudget = 7L, merges = Nil)
    val got = Packing.shardManifest(pieces, "doc_id", Seq("source"))
      .select($"source", $"bin_id", $"n_pieces", $"n_docs", $"n_tokens",
        $"content_sha")
      .as[(String, Long, Long, Long, Long, String)].collect().toSet
    // hand-derived streams (vocab </w>=1, a=2, b=3): s0/bin0 holds doc 1
    // whole + doc 2's first token; s0/bin1 holds doc 2's tail + the
    // tokenless doc 3 (counted, hashes nothing); s1/bin0 holds doc 4
    assert(got == Set(
      ("s0", 0L, 2L, 2L, 7L, sha("2 3 1 2 3 1 2")),
      ("s0", 1L, 2L, 2L, 1L, sha("1")),
      ("s1", 0L, 1L, 1L, 3L, sha("2 3 1"))))
    graft.operators.Dedup.release(pieces)
    // boundary invariance: re-cutting a bin's stream into different
    // contiguous pieces changes the counts but NOT the content sha —
    // the sha certifies content, not where the cuts fell
    val recut = Seq(
      (1L, "s0", 0L, 3L, 0L, 0L, Some(Seq(2, 3, 1))),
      (1L, "s0", 1L, 3L, 0L, 3L, Some(Seq(2, 3, 1))),
      (2L, "s0", 0L, 1L, 0L, 6L, Some(Seq(2))))
      .toDF("doc_id", "source", "chunk_idx", "n_tokens_bpe", "bin_id",
        "offset_tokens", "token_ids")
    val m2 = Packing.shardManifest(recut, "doc_id", Seq("source"))
      .select($"n_pieces", $"content_sha").as[(Long, String)].head()
    assert(m2 == ((3L, sha("2 3 1 2 3 1 2"))))
    // an all-empty bin hashes the empty string
    val empty = Seq((9L, "s9", 0L, 0L, 5L, 0L, Option.empty[Seq[Int]]))
      .toDF("doc_id", "source", "chunk_idx", "n_tokens_bpe", "bin_id",
        "offset_tokens", "token_ids")
    assert(Packing.shardManifest(empty, "doc_id", Seq("source"))
      .select($"n_tokens", $"content_sha").as[(Long, String)].head()
      == ((0L, sha(""))))
  }

  test("examples: bins materialize gap-free with doc-boundary metadata") {
    import graft.operators.Packing
    val docs = Seq(
      (1L, "ab ab", "s0"), (2L, "a", "s0"), (3L, "  ", "s0"),
      (4L, "ab", "s1")).toDF("doc_id", "text", "source")
    val (pieces, _) = Packing.tokenizedCorpus(docs, "doc_id", "text",
      Seq("source"), tokenBudget = 7L, merges = Nil)
    val got = Packing.examples(pieces, "doc_id", Seq("source"))
      .select($"source", $"bin_id", $"n_tokens", $"token_ids",
        $"doc_offsets", $"doc_ids")
      .as[(String, Long, Long, Seq[Int], Seq[Long], Seq[Long])]
      .collect().toSet
    // s0/bin0: doc 1 whole + doc 2's first token (split mid-doc at the
    // budget); s0/bin1: doc 2's tail — same doc id continuing — plus the
    // tokenless doc 3 contributing no boundary; s1/bin0: doc 4
    assert(got == Set(
      ("s0", 0L, 7L, Seq(2, 3, 1, 2, 3, 1, 2), Seq(0L, 6L), Seq(1L, 2L)),
      ("s0", 1L, 1L, Seq(1), Seq(0L), Seq(2L)),
      ("s1", 0L, 3L, Seq(2, 3, 1), Seq(0L), Seq(4L))))
    // the reader contract: every example's stream length == its price,
    // and offsets are strictly ascending from 0
    got.foreach { e =>
      assert(e._4.size.toLong == e._3)
      assert(e._5.headOption.forall(_ == 0L) &&
        e._5 == e._5.sorted && e._5.distinct == e._5)
    }
    graft.operators.Dedup.release(pieces)
  }

  test("sourceTokenKl: uniform mix scores ~0, skewed source scores positive") {
    import graft.operators.DataMix
    // src0 == the corpus-average distribution (KL ~ 0 up to rounding);
    // src1 is all-one-token (maximally skewed)
    val docs = Seq(
      (1L, "a b c d", "src0"),
      (2L, "a b c d", "src0"),
      (3L, "z z z z", "src1"))
      .toDF("doc_id", "text", "source")
    for (parts <- Seq(1, 4)) {
      val got = DataMix.sourceTokenKl(docs.repartition(parts), "text", "source")
        .orderBy($"source").as[(String, Long, Long)].collect().toSeq
      // hand-derived: n=12, src0: each of a,b,c,d has c_si=2, c_i=2, n_s=8
      //   term ratio = ln2 - ln8 - ln2 + ln12 = ln(12/8) -> 405465 each
      //   kl = 8*405465/8... per token: c_si=2 -> 2*round(ln(12/8)*1e6)
      //   sum = 4 * 2 * 405465 = 3243720; / 8 = 405465
      // src1: z c_si=4, c_i=4, n_s=4: 4*round(ln(12/4)*1e6)=4*1098612
      //   /4 = 1098612
      assert(got === Seq(("src0", 8L, 405465L), ("src1", 4L, 1098612L)),
        s"parts=$parts")
    }
    // a literally-average source scores exactly 0: one source only
    val uni = Seq((1L, "a b", "s")).toDF("doc_id", "text", "source")
    val z = DataMix.sourceTokenKl(uni, "text", "source")
      .select($"kl_e6").as[Long].head()
    assert(z === 0L)
  }

  test("collocations: PMI ranks the exclusive pair top, min-count floor holds") {
    import graft.operators.NgramLm
    // "x y" always co-occur exclusively (max PMI); "a b" frequent but both
    // words promiscuous; rare pairs below the count floor vanish
    val docs = Seq(
      (1L, "x y x y x y x y x y"),
      (2L, "a b a c a b a d a b"),
      (3L, "b a c a d a b a b a"),
      (4L, "rare pair"))
      .toDF("doc_id", "text")
    val got = NgramLm.collocations(docs, "text", minCount = 5L, k = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    // the exclusive bigram ranks first
    assert(got.head._1 == "x" && got.head._2 == "y")
    // every surviving pair respects the floor; the rare pair is gone
    assert(got.forall(_._3 >= 5L))
    assert(!got.exists(r => r._1 == "rare"))
    // verify every surviving row against a local replay of the definition
    val toks = docs.as[(Long, String)].collect().flatMap { case (_, t) =>
      val ws = t.split("\\s+").filter(_.nonEmpty)
      ws.zip(ws.drop(1))
    }
    val bc = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val c2 = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tot = toks.length.toDouble
    got.foreach { case (w1, w2, c12, pmi) =>
      assert(c12 === bc((w1, w2)))
      val exp = Math.round((Math.log(c12.toDouble) + Math.log(tot) -
        Math.log(c1(w1).toDouble) - Math.log(c2(w2).toDouble)) * 1e6)
      assert(pmi === exp, s"($w1,$w2)")
    }
  }

  test("connectedComponents: chains collapse to min-id label, deterministic") {
    // components: {1,2,3,4} via chain, {10,11}, pairs only
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs)
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
    // empty pair set -> empty labels, no crash
    assert(Dedup.connectedComponents(Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .count() == 0)
  }

  test("connectedComponents: adversarial long chain with near-Long.MaxValue ids") {
    // 31-node chain, diameter 30 (> default maxIter) with ids whose label sum
    // overflows Long many times over — exercises both the multi-round
    // propagation loop and the overflow-safe changed-count convergence probe
    val base = Long.MaxValue - 1000L
    val pairs = (0 until 30).map(i => (base + i, base + i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs, maxIter = 40)
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(out.size == 31)
    assert(out.forall { case (_, comp) => comp == base })
  }
}
