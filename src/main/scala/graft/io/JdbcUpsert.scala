package graft.io

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC upsert + dimension get-or-create sinks (SURVEY.md S11/S12).
  *
  * Plain `.write.jdbc` has no upsert mode, so the fact sink is a `foreachPartition`
  * writer: each partition opens one connection, executes batched upsert statements,
  * and commits — executor-side, no driver round-trips, so write throughput scales
  * with the number of partitions. Idempotent by construction: re-running a tick with
  * the same `(tms_id, time, fgt)` keys overwrites identical values
  * (ref semantics: outputs/extract_water_level.py:96-97, `insert_data(..., upsert=True)`).
  *
  * Dialects: MySQL (the reference's warehouse, ref: requirements.txt:6 PyMySQL) gets
  * a single-statement `INSERT ... ON DUPLICATE KEY UPDATE` batch; the generic/Derby
  * path uses UPDATE-then-INSERT (Derby's MERGE cannot take a VALUES source). */
object JdbcUpsert {

  sealed trait Dialect
  /** Single-statement upsert, batched. Param order: all columns. */
  case object MySqlDialect extends Dialect
  /** Two statements: UPDATE (params: non-keys then keys); if no row matched,
    * INSERT (params: all columns). Works on any ANSI JDBC target incl. Derby. */
  case object UpdateInsertDialect extends Dialect

  private def mysqlSql(table: String, cols: Seq[String], keyCols: Seq[String]) = {
    val updates = cols.filterNot(keyCols.contains)
      .map(c => s"$c = VALUES($c)").mkString(", ")
    s"""INSERT INTO $table (${cols.mkString(", ")})
       |VALUES (${cols.map(_ => "?").mkString(", ")})
       |ON DUPLICATE KEY UPDATE $updates""".stripMargin
  }

  private def updateSql(table: String, cols: Seq[String], keyCols: Seq[String]) = {
    val sets = cols.filterNot(keyCols.contains).map(c => s"$c = ?").mkString(", ")
    val where = keyCols.map(c => s"$c = ?").mkString(" AND ")
    s"UPDATE $table SET $sets WHERE $where"
  }

  private def insertSql(table: String, cols: Seq[String]) =
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"

  private def jdbcValue(v: Any): AnyRef = (v match {
    case t: java.time.LocalDateTime => java.sql.Timestamp.valueOf(t)
    case t: java.time.Instant => java.sql.Timestamp.from(t)
    case other => other
  }).asInstanceOf[AnyRef]

  private def bind(ps: java.sql.PreparedStatement, row: Row,
                   fields: Seq[String], schema: Seq[String]): Unit =
    fields.zipWithIndex.foreach { case (f, i) =>
      ps.setObject(i + 1, jdbcValue(row.get(schema.indexOf(f))))
    }

  /** S11: batched fact upsert keyed `keyCols`. One connection per partition;
    * `batchSize` bounds buffered statements. */
  def upsert(df: DataFrame, url: String, table: String, keyCols: Seq[String],
             dialect: Dialect = UpdateInsertDialect, batchSize: Int = 1000): Unit = {
    val cols = df.columns.toSeq
    val nonKeys = cols.filterNot(keyCols.contains)
    dialect match {
      case MySqlDialect =>
        val sql = mysqlSql(table, cols, keyCols)
        df.foreachPartition { (rows: Iterator[Row]) =>
          if (rows.nonEmpty) {
            val conn = DriverManager.getConnection(url)
            try {
              conn.setAutoCommit(false)
              val ps = conn.prepareStatement(sql)
              var n = 0
              rows.foreach { r =>
                bind(ps, r, cols, cols); ps.addBatch(); n += 1
                if (n % batchSize == 0) ps.executeBatch()
              }
              ps.executeBatch()
              conn.commit()
            } finally conn.close()
          }
        }
      case UpdateInsertDialect =>
        val uSql = updateSql(table, cols, keyCols)
        val iSql = insertSql(table, cols)
        df.foreachPartition { (rows: Iterator[Row]) =>
          if (rows.nonEmpty) {
            val conn = DriverManager.getConnection(url)
            try {
              conn.setAutoCommit(false)
              val up = conn.prepareStatement(uSql)
              val ins = conn.prepareStatement(iSql)
              var n = 0
              rows.foreach { r =>
                bind(up, r, nonKeys ++ keyCols, cols)
                if (up.executeUpdate() == 0) {
                  bind(ins, r, cols, cols); ins.addBatch(); n += 1
                  if (n % batchSize == 0) ins.executeBatch()
                }
              }
              ins.executeBatch()
              conn.commit()
            } finally conn.close()
          }
        }
    }
  }

  /** S12: idempotent dimension get-or-create — insert the key-rows that do not yet
    * exist (left-anti join against the current dim), then return the full dim.
    * Ids are deterministic content hashes (TimeSeriesOps.seriesId), so concurrent
    * writers converge on identical rows without an id-allocator; the upsert makes
    * the race a benign overwrite-with-equal-values. */
  def getOrCreateDim(spark: SparkSession, candidates: DataFrame, url: String,
                     table: String, keyCols: Seq[String],
                     dialect: Dialect = UpdateInsertDialect): DataFrame = {
    val existing = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()
    val missing = candidates.join(existing.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    upsert(missing, url, table, keyCols, dialect)
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()
  }
}
