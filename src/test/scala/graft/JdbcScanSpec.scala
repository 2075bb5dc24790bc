package graft

import org.apache.spark.sql.functions._

/** S3/S4: JDBC point-range and filtered dimension scans with predicate pushdown —
  * the engine's replacement for the adapter's get_timeseries / run-dim lookups
  * (SURVEY.md §0.1), against embedded Derby. */
class JdbcScanSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:scantest;create=true"

  private lazy val setup: Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().execute(
      """CREATE TABLE series (tms_id VARCHAR(64) NOT NULL, t TIMESTAMP NOT NULL,
        |  v DOUBLE, PRIMARY KEY (tms_id, t))""".stripMargin)
    val ps = c.prepareStatement("INSERT INTO series VALUES (?, ?, ?)")
    for (id <- Seq("aaa", "bbb"); m <- 0 until 60 by 5) {
      ps.setString(1, id)
      ps.setTimestamp(2, java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00"))
      ps.setDouble(3, m.toDouble)
      ps.addBatch()
    }
    ps.executeBatch()
    c.close()
  }

  test("S3: point-range scan pushes id + time-range predicates to the database") {
    setup
    val df = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "series").load()
      .filter($"tms_id" === "aaa" &&
        $"t" >= java.sql.Timestamp.valueOf("2024-01-01 00:10:00") &&
        $"t" <= java.sql.Timestamp.valueOf("2024-01-01 00:30:00"))
    assert(df.count() == 5)
    // predicates must reach the JDBC source, not run client-side
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("TMS_ID"))
  }

  test("S4: freshness-filtered dim scan (obs_end >= watermark) pushes down") {
    setup
    val latest = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "series").load()
      .groupBy($"tms_id").agg(max($"t").as("obs_end")) // A6 get_obs_end
      .filter($"obs_end" >= java.sql.Timestamp.valueOf("2024-01-01 00:55:00"))
    assert(latest.count() == 2)
  }

  test("A5/A6 probes push AGGREGATES into the database via the V2 catalog path") {
    setup
    val series = graft.io.JdbcScan.table(spark, url, "APP.SERIES")
    // A6: max(obs_end) — the database must return one row per series, not the table
    val obsEnd = series.groupBy($"TMS_ID").agg(max($"T").as("obs_end"))
    val plan = obsEnd.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [MAX(T)]"),
      s"max not pushed:\n$plan")
    assert(plan.contains("PushedGroupByExpressions: [TMS_ID]"),
      s"group-by not pushed:\n$plan")
    assert(obsEnd.count() == 2)
    assert(obsEnd.filter($"TMS_ID" === "aaa").select($"obs_end")
      .as[java.sql.Timestamp].head() ===
      java.sql.Timestamp.valueOf("2024-01-01 00:55:00"))
    // A5: count(*) exists-gate — pushed as COUNT(*), one scalar over the wire
    val gate = series.filter($"TMS_ID" === "aaa").agg(count(lit(1)).as("n"))
    val gatePlan = gate.queryExecution.executedPlan.toString
    assert(gatePlan.contains("PushedAggregates: [COUNT(*)]"),
      s"count not pushed:\n$gatePlan")
    assert(gate.as[Long].head() == 12L)
  }

  test("S6: grouped SUM pushes into the database — the server-side re-bucketing shape") {
    // ref: inputs/gen_mike_input_rf_obs_win.py:151-152 — the reference asks the
    // SERVER to sum per bucket; the V2 path compiles SUM + GROUP BY into the
    // remote query so only one row per group crosses the wire
    setup
    val series = graft.io.JdbcScan.table(spark, url, "APP.SERIES")
    val sums = series.groupBy($"TMS_ID")
      .agg(sum($"V").as("v_sum"), count(lit(1)).as("n"))
    val plan = sums.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") && plan.contains("SUM(V)"),
      s"sum not pushed:\n$plan")
    assert(plan.contains("PushedGroupByExpressions: [TMS_ID]"),
      s"group-by not pushed:\n$plan")
    // values must equal the V1 path's engine-side aggregation bit-for-bit
    val v1 = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "series").load()
      .groupBy($"tms_id").agg(sum($"v").as("v_sum"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect()
      .map { case (id, s, n) => id -> ((s, n)) }.toMap
    val v2 = sums.as[(String, Double, Long)].collect()
    assert(v2.length == 2)
    v2.foreach { case (id, s, n) =>
      assert((s, n) == v1(id), s"pushed SUM diverged for $id")
    }
  }
}
