package graft

import java.nio.file.Files

import graft.operators.Dedup
import graft.plans.ParallelismAudit
import org.apache.spark.sql.functions._

/** The few-file parallelism guard, pinned as a PERMANENT audit (r10 verdict
  * #1). Round 10's sf10 receipt proved the failure mode: two operators
  * shipped without `ensureParallel` and ran 500k-doc kernels at 2-task
  * (file-count) parallelism for minutes; the fix was a hand sweep, and round
  * 11's first walker run found SIXTEEN more kernel-over-raw-scan sites the
  * sweep had missed (the whole ANN/vector family, heap-top-k over scans, the
  * simhash filter pushdown). This spec makes the invariant structural:
  *
  *  - a deliberately 2-FILE corpus is materialized (the cluster pathology in
  *    miniature: files ≪ cores);
  *  - the guard's size skip is DISABLED (`minKernelBytes = 0`) and shuffle
  *    parallelism raised to 32, so every guard that exists must fire;
  *  - EVERY registry query is planned and `ParallelismAudit.unguardedKernels`
  *    walks its physical plan: any graft kernel expression whose subtree
  *    reaches a raw few-file scan without crossing an exchange / broadcast /
  *    checkpoint boundary fails the suite — deleting any current guard turns
  *    this red (the self-test below proves the walker actually bites);
  *  - every action the full-stage CurationJob executes is captured via a
  *    QueryExecutionListener and walked the same way.
  */
class ParallelismAuditSpec extends SparkSpec {

  /** FileSourceScan leaves with ≥ this many files count as natively
    * parallel (operator-written partitioned indexes re-read under DPP). The
    * corpus tables are written as 2 files, far under it. */
  private val floor = 16

  /** Force-guard conventions: shuffle=32 (so the guard's files-vs-floor test
    * sees 2 < 16) and size skip off; restored afterwards — the session is
    * shared across suites. */
  private def withGuardForced[T](body: => T): T = {
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevMin = spark.conf.getOption(Dedup.MinKernelBytesKey)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set(Dedup.MinKernelBytesKey, "0")
    try body
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      prevMin match {
        case Some(v) => spark.conf.set(Dedup.MinKernelBytesKey, v)
        case None => spark.conf.unset(Dedup.MinKernelBytesKey)
      }
    }
  }

  /** Every sf0.001 table rewritten as exactly 2 parquet files. */
  private lazy val twoFileDir: String = {
    val tgt = Files.createTempDirectory("audit2f").toString
    for (f <- new java.io.File("/root/testdata/sf0.001").listFiles
         if f.getName.endsWith(".parquet"))
      spark.read.parquet(f.getPath).repartition(2)
        .write.mode("overwrite").parquet(s"$tgt/${f.getName}")
    tgt
  }

  test("self-test: the walker flags an unguarded kernel and passes a guarded one") {
    withGuardForced {
      val raw = spark.read.parquet(s"$twoFileDir/documents.parquet")
      val unguarded = raw.select(col("doc_id"),
        graft.functions.CharEntropyExpr(col("text")).as("e"))
      assert(ParallelismAudit.unguardedKernels(unguarded, floor).nonEmpty,
        "walker must flag a kernel projection fed straight from a 2-file scan")
      val guarded = Dedup.ensureParallel(raw).select(col("doc_id"),
        graft.functions.CharEntropyExpr(col("text")).as("e"))
      assert(ParallelismAudit.unguardedKernels(guarded, floor).isEmpty,
        "walker must accept the same kernel above the guard exchange")
    }
  }

  test("every registry query plans guarded kernels on a 2-file corpus") {
    withGuardForced {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val off =
            try ParallelismAudit.unguardedKernels(fn(spark, twoFileDir), floor)
            catch { case e: Throwable =>
              Seq(s"ERROR ${e.getClass.getSimpleName}: ${e.getMessage}") }
          off.map(o => s"$name: $o")
      }
      assert(offenders.isEmpty,
        s"kernel(s) would run at file-count parallelism:\n${offenders.mkString("\n")}")
    }
  }

  test("every CurationJob action is guarded (full-stage config, 2-file corpus)") {
    withGuardForced {
      val dir = Files.createTempDirectory("auditcuration")
      // a small bench set for both decontamination stages
      spark.read.parquet(s"$twoFileDir/documents.parquet")
        .filter(col("doc_id") % 97 === 0).select(col("doc_id"), col("text"))
        .repartition(2).write.parquet(s"$dir/bench")
      Files.writeString(dir.resolve("cfg.json"),
        s"""{"documents_path": "$twoFileDir/documents.parquet",
           | "output_path": "$dir/out", "min_words": 5,
           | "min_char_entropy_e6": 1000, "gopher_rules": true,
           | "gopher_ngrams": true, "reline_words_per_line": 8,
           | "ngram_n": 3, "jaccard_threshold": 0.8, "block_cols": ["lang"],
           | "line_freq_cap": 2, "min_novelty_e6": 100000,
           | "novelty_window_tokens": 10, "scrub_window_tokens": 10,
           | "decontaminate_bench_path": "$dir/bench",
           | "decontaminate_window_tokens": 10,
           | "decontaminate_fuzzy_threshold": 0.9,
           | "redact_pii": true, "mix_strata_col": "source",
           | "mix_fractions": {"src0": 1.0, "src1": 1.0, "src2": 1.0},
           | "dsir_domain_col": "source", "dsir_domain_value": "src0",
           | "dsir_k": 100, "report_strata_col": "source"}""".stripMargin)
      val captured =
        new java.util.concurrent.ConcurrentLinkedQueue[
          org.apache.spark.sql.execution.SparkPlan]()
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = captured.add(qe.executedPlan)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        val stats = graft.jobs.CurationJob.run(spark, s"$dir/cfg.json")
        assert(stats.nonEmpty && stats.get.output > 0,
          s"full-stage curation run must produce rows, got $stats")
        // listener delivery is async on the shared bus: wait for quiescence
        var last = -1
        var same = 0
        while (same < 4) {
          Thread.sleep(250)
          val now = captured.size()
          if (now == last) same += 1 else { same = 0; last = now }
        }
      } finally spark.listenerManager.unregister(listener)
      import scala.jdk.CollectionConverters._
      assert(captured.size() > 0, "listener captured no CurationJob actions")
      val offenders = captured.asScala.toSeq.flatMap(
        ParallelismAudit.unguardedKernels(_, floor)).distinct
      assert(offenders.isEmpty,
        s"CurationJob stage kernel(s) unguarded:\n${offenders.mkString("\n")}")
    }
  }

  test("ensureParallel is size-aware: tiny frames skip, the probe reads " +
    "UNCOMPRESSED bytes, caller exchanges and checkpoints are respected") {
    val dir = Files.createTempDirectory("guardsize")
    // ~0.2 MB uncompressed, single file: under the 2 MB default -> skip
    spark.range(2000).select(col("id"),
        concat_ws(" ", (0 until 10).map(i => concat(lit(s"w$i"), col("id"))): _*)
          .as("text"))
      .coalesce(1).write.parquet(s"$dir/small")
    val small = spark.read.parquet(s"$dir/small")
    assert(Dedup.ensureParallel(small).queryExecution.analyzed ==
      small.queryExecution.analyzed,
      "sub-threshold frame must not be exchanged (the r10 sf0.1 overhead)")
    // same data, guard forced: exchanged
    withGuardForced {
      val forced = Dedup.ensureParallel(spark.read.parquet(s"$dir/small"))
      assert(forced.queryExecution.logical.exists {
        case _: org.apache.spark.sql.catalyst.plans.logical.Repartition => true
        case _ => false
      }, "with minKernelBytes=0 the few-file guard must fire")
      // a caller-side repartition in the STRAIGHT-LINE ancestry suppresses it
      val stacked = Dedup.ensureParallel(
        spark.read.parquet(s"$dir/small").repartition(32).select(col("text")))
      val exchanges = stacked.queryExecution.logical.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
      }
      assert(exchanges.size == 1, "stacked guards must not double-exchange")
      // ...but a repartition on the FAR SIDE of a join must NOT suppress the
      // guard for this branch's scan (r10 ADVICE: ancestry, not plan-wide)
      val farSide = spark.read.parquet(s"$dir/small").repartition(32)
        .select(col("id").as("rid"))
      val joined = Dedup.ensureParallel(
        spark.read.parquet(s"$dir/small").join(farSide, col("id") === col("rid")))
      assert(joined.queryExecution.logical.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
      }.size == 2, "far-side repartition must not suppress the guard")
      // checkpoint-backed (LogicalRDD) already-parallel input: untouched
      val pinned = spark.read.parquet(s"$dir/small").repartition(32)
        .localCheckpoint(true)
      assert(Dedup.ensureParallel(pinned).queryExecution.analyzed ==
        pinned.queryExecution.analyzed,
        "post-pin parallel data must not be re-exchanged (r10 ADVICE)")
      graft.operators.Dedup.release(pinned)
    }
  }
}
