package graft

import graft.io.BucketedStore
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** The co-located layout contract: two frames bucketed on the same key and
  * count join with ZERO exchange (corpus never moves again), and an
  * admission-tick join against one bucketed side shuffles only the batch.
  * Plan-asserted, not hoped — the executedPlan is swept for exchanges after
  * the action, so AQE's final shape is what's checked. */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // settle AQE to the final physical plan
    // AQE wraps materialized stages in QueryStageExec LEAVES (Result/Shuffle
    // stages hide their subtree from `children`) — descend through them
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

  test("save is restart-idempotent over a stale unregistered location") {
    // simulate a killed run under a non-persistent metastore: the managed
    // directory survives on disk but the catalog has no entry to overwrite
    // through — save must clear it rather than die LOCATION_ALREADY_EXISTS
    spark.sql("DROP TABLE IF EXISTS bkt_stale")
    val loc = new java.io.File(new java.net.URI(
      spark.sessionState.catalog.defaultTablePath(
        spark.sessionState.sqlParser.parseTableIdentifier("bkt_stale"))
        .toString).getPath)
    assert(loc.mkdirs() || loc.isDirectory)
    val junk = new java.io.File(loc, "part-stale.parquet")
    java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))
    assert(junk.exists())

    val df = spark.range(100).select($"id".as("doc_id"))
    BucketedStore.save(df, "bkt_stale", "doc_id", 4)
    assert(BucketedStore.load(spark, "bkt_stale").count() == 100)
    spark.sql("DROP TABLE bkt_stale")
  }

  test("co-located join: zero exchanges; admission join: batch side only") {
    val corpus = spark.range(10000)
      .select($"id".as("doc_id"), (rand(7) * 100).cast("long").as("score"))
    val labels = spark.range(10000)
      .select($"id".as("doc_id"), pmod($"id", lit(97L)).as("component"))
    BucketedStore.save(corpus, "bkt_corpus", "doc_id", 8)
    BucketedStore.save(labels, "bkt_labels", "doc_id", 8)

    val joined = BucketedStore.load(spark, "bkt_corpus")
      .join(BucketedStore.load(spark, "bkt_labels"), "doc_id")
    assert(exchanges(joined) == 0,
      "co-bucketed same-key join must move zero rows")
    // values survive the layout round-trip
    assert(joined.count() == 10000)
    assert(joined.filter($"component" =!= pmod($"doc_id", lit(97L))).count() == 0)

    // the daily tick: a batch 1000x smaller joins the bucketed corpus — only
    // the batch may exchange (one small shuffle into the corpus bucketing)
    val batch = spark.range(10).select(($"id" * 1000).as("doc_id"))
    val tick = BucketedStore.load(spark, "bkt_corpus").join(batch, "doc_id")
    val n = exchanges(tick)
    assert(n <= 1, s"corpus side must not re-shuffle, saw $n exchanges")

    // the SAME join without the layout DOES shuffle — the baseline that
    // proves the zero above is the bucketing, not AQE cleverness (broadcast
    // is disabled for the baseline only: at corpus scale neither side
    // broadcasts, which is exactly the regime bucketing exists for)
    val th = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try assert(exchanges(corpus.join(labels, "doc_id")) >= 2)
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", th)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
