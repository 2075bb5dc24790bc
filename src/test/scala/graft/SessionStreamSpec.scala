package graft

import graft.streaming.SessionStream

/** The stateful stream must agree with the batch sessionizer (q32) — same gap rule,
  * same data, two execution models. */
class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState sessionization matches batch q32 session counts") {
    val out = SessionStream.closedSessions(spark, "/root/testdata/sf0.001")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try q.processAllAvailable() finally q.stop()
    // stream emits CLOSED sessions; the per-user open session is still in state,
    // so streamed sessions per user == batch max(session_id) - 1
    val streamed = spark.sql(
      "SELECT user_id, count(*) AS n FROM sessions GROUP BY user_id")
      .as[(Long, Long)].collect().toMap
    val batch = SparkEntry.queries("q32_sessionize")(spark, "/root/testdata/sf0.001")
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.max($"session_id").as("m"))
      .as[(Long, Long)].collect().toMap
    assert(batch.nonEmpty)
    batch.foreach { case (user, maxSess) =>
      assert(streamed.getOrElse(user, 0L) == maxSess - 1,
        s"user $user: streamed=${streamed.getOrElse(user, 0L)} batchMax=$maxSess")
    }
    // event conservation: closed-session events + one open session per user = total
    val closedEvents = spark.sql("SELECT sum(n_events) FROM sessions")
      .collect().head.getLong(0)
    assert(closedEvents < 1000 && closedEvents > 0)
  }
}
