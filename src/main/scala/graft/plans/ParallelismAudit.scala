package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, BroadcastQueryStageExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}

/** Physical-plan audit for the few-file parallelism guard — the r10 lesson
  * made permanent. Two operators shipped without `Dedup.ensureParallel` and
  * turned a 2-file sf10 corpus into minutes-long single-task kernel stages;
  * the fix was a hand sweep, and nothing stopped operator #41 from repeating
  * it. This walker expresses the invariant structurally: every physical node
  * that evaluates a graft native kernel expression (anything under
  * `graft.functions.*` — the per-doc tokenize/hash/stats work) must be fed
  * through something that restores parallelism on a few-file corpus:
  *
  *  - a shuffle exchange below it (the guard's own repartition, or an
  *    aggregate/join exchange that already re-distributes the rows), or
  *  - a broadcast exchange below it (the build side of a broadcast join is
  *    DECLARED small — kernels over it are driver-bounded by design), or
  *  - a checkpoint-backed RDD scan that is already parallel (composite
  *    boundaries, CurationJob stage pins), or
  *  - a driver-local literal relation (tiny by construction).
  *
  * A kernel node whose every path to a leaf bottoms out in a raw file scan
  * with none of the above is exactly the defect: on a few-file corpus that
  * kernel runs at file-count parallelism. The audit spec plans EVERY registry
  * query (and every CurationJob action) against a deliberately 2-file corpus
  * and asserts this walker returns no unpinned offenders.
  *
  * The walk descends through AQE wrappers, query stages, reused exchanges,
  * and INTO `InMemoryRelation.cachedPlan` (the persisted shingle/signature
  * frames hide their guard exchange inside the cached plan). Multi-child
  * nodes require EVERY child path guarded — a broadcast join with a guarded
  * build side and an unguarded stream side is still an offender. */
object ParallelismAudit {

  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case r: ReusedExchangeExec => Seq(r.child)
    case i: InMemoryTableScanExec => Seq(i.relation.cachedPlan)
    case o => o.children
  }

  private def kernelExprs(p: SparkPlan): Seq[String] = p.expressions.flatMap {
    _.collect {
      case e if e.getClass.getName.startsWith("graft.functions.") =>
        e.getClass.getSimpleName.stripSuffix("$")
    }
  }.distinct

  /** True when every path from `p` down to a leaf crosses a
    * parallelism-restoring boundary (exchange / broadcast / parallel RDD /
    * local relation). `floor` is the minimum partition count a
    * checkpoint-backed RDD must carry to count as parallel. */
  private def guarded(p: SparkPlan, floor: Int): Boolean = p match {
    case _: ShuffleExchangeLike | _: ShuffleQueryStageExec => true
    case _: BroadcastExchangeLike | _: BroadcastQueryStageExec => true
    // checkpoint-backed RDDs (composite boundaries, CC labels, stage pins)
    // are POST-SHUFFLE data: their partition count was sized by the engine
    // (AQE coalescing) proportional to the data, so a 1-partition RDD means
    // tiny data, not a file-layout accident — always trusted. The defect
    // this audit hunts is FILE-count-bound parallelism, which can only
    // enter through a file scan leaf.
    case _: RDDScanExec => true
    case _: LocalTableScanExec => true
    // a file scan that already spans enough files feeds the target
    // parallelism natively (e.g. an operator-written partitioned index
    // re-read under DPP) — the same skip ensureParallel itself applies
    case f: FileSourceScanExec =>
      (try f.relation.location.inputFiles.length catch {
        case _: Throwable => 0
      }) >= floor
    case other =>
      val cs = kids(other)
      cs.nonEmpty && cs.forall(guarded(_, floor))
  }

  /** Total node count of a physical plan, descending through AQE wrappers /
    * query stages / cached relations (TreeNode.foreach stops at stage
    * boundaries and undercounts adaptive plans). */
  def countNodes(root: SparkPlan): Int =
    1 + kids(root).map(countNodes).sum

  /** Count shuffle exchanges anywhere in a physical plan, descending through
    * AQE wrappers / query stages / cached relations (each exchange counted
    * once — query-stage wrappers are descended, not counted). Execute the
    * frame first when the AQE-final shape is what matters. */
  def countShuffleExchanges(root: SparkPlan): Int = {
    def c(p: SparkPlan): Int =
      (p match { case _: ShuffleExchangeLike => 1; case _ => 0 }) +
        kids(p).map(c).sum
    c(root)
  }

  /** All kernel-bearing nodes in `df`'s physical plan whose subtree is NOT
    * guarded, as `NodeClass[KernelExpr,…]` strings. Empty = the plan is safe
    * on a few-file corpus. Plan-only — does not execute the query. */
  def unguardedKernels(df: DataFrame, floor: Int = 2): Seq[String] =
    unguardedKernels(df.queryExecution.executedPlan, floor)

  def unguardedKernels(root: SparkPlan, floor: Int): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    def walk(p: SparkPlan, underBroadcast: Boolean): Unit = {
      // everything UNDER a broadcast exchange is declared small by whoever
      // wrote the `broadcast()` — query batches, packed centroid rows, bench
      // sets; kernels there are bounded by the broadcast size limit, never
      // corpus-scale, so they are exempt (the corpus STREAM side is not)
      val under = underBroadcast || p.isInstanceOf[BroadcastExchangeLike] ||
        p.isInstanceOf[BroadcastQueryStageExec]
      // an exchange's own partitioning keys (e.g. a graft hash expression in
      // a repartitionByExpression) are evaluated map-side pre-shuffle, but
      // that is one cheap hash per row — the exact cost the guard's own
      // repartition pays; only KERNELS below an unguarded path are defects
      val ks = if (under || p.isInstanceOf[ShuffleExchangeLike]) Nil
        else kernelExprs(p)
      if (ks.nonEmpty && !kids(p).forall(guarded(_, floor)))
        out += s"${p.getClass.getSimpleName}[${ks.mkString(",")}]"
      kids(p).foreach(walk(_, under))
    }
    walk(root, underBroadcast = false)
    out.toList.distinct
  }
}
