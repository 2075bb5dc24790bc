package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DataSource-V2 JDBC table reader with AGGREGATE pushdown (SURVEY.md §4's
  * optional planner item).
  *
  * `spark.read.format("jdbc")` is the V1 path: filters push down, aggregates
  * do NOT — an A5/A6-style probe (`count(*)` run gate, `max(obs_end)`
  * freshness tag; ref: db_adapter get_obs_end / run-exists lookups) drags the
  * whole series table over the wire so Spark can compute one scalar. The V2
  * `JDBCTableCatalog` path compiles supported aggregates into the remote
  * query (plan shows `PushedAggregates`), so the database returns one row —
  * the difference between a metadata probe and a table scan on every cron
  * tick, at any warehouse size.
  *
  * The catalog is registered lazily under one session-conf namespace per URL
  * hash; re-registering the same URL is a no-op, so callers just call
  * `table(...)` (options follow Spark's `JDBCOptions`; `pushDownAggregate`
  * and `pushDownLimit` are on by default in Spark 4, set here explicitly to
  * pin the contract).
  */
object JdbcScan {

  private def catalogName(url: String): String =
    "graft_jdbc_" + java.lang.Integer.toHexString(url.hashCode)

  /** A V2 JDBC frame for `tableName` (schema-qualify Derby tables as
    * `APP.tbl`). Aggregates, filters, and limits push into the database. */
  def table(spark: SparkSession, url: String, tableName: String): DataFrame = {
    val cat = catalogName(url)
    spark.conf.set(s"spark.sql.catalog.$cat",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.url", url)
    spark.conf.set(s"spark.sql.catalog.$cat.pushDownAggregate", "true")
    spark.conf.set(s"spark.sql.catalog.$cat.pushDownLimit", "true")
    spark.table(s"$cat.$tableName")
  }
}
