package graft.io

import java.sql.{Connection, DriverManager}

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
  * Dialect note: MySQL (what the reference warehouse runs) uses
  * `INSERT ... ON DUPLICATE KEY UPDATE`; the tests run against embedded Derby which
  * needs ANSI `MERGE`. The statement template is pluggable per dialect.
  */
object JdbcUpsert {

  sealed trait Dialect {
    def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String
  }

  /** MySQL / MariaDB: INSERT ... ON DUPLICATE KEY UPDATE (the reference's warehouse,
    * ref: requirements.txt:6 PyMySQL). */
  case object MySqlDialect extends Dialect {
    def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String = {
      val updates = cols.filterNot(keyCols.contains)
        .map(c => s"$c = VALUES($c)").mkString(", ")
      s"""INSERT INTO $table (${cols.mkString(", ")})
         |VALUES (${cols.map(_ => "?").mkString(", ")})
         |ON DUPLICATE KEY UPDATE $updates""".stripMargin
    }
  }

  /** ANSI MERGE (Derby, and most warehouses). */
  case object AnsiMergeDialect extends Dialect {
    def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String = {
      val on = keyCols.map(c => s"t.$c = v.$c").mkString(" AND ")
      val updates = cols.filterNot(keyCols.contains)
        .map(c => s"t.$c = v.$c").mkString(", ")
      s"""MERGE INTO $table t
         |USING (VALUES (${cols.map(_ => "?").mkString(", ")}))
         |  AS v (${cols.mkString(", ")})
         |ON $on
         |WHEN MATCHED THEN UPDATE SET $updates
         |WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})
         |  VALUES (${cols.map(c => s"v.$c").mkString(", ")})""".stripMargin
    }
  }

  private def bind(ps: java.sql.PreparedStatement, row: Row): Unit = {
    var i = 0
    while (i < row.length) {
      ps.setObject(i + 1, row.get(i) match {
        case t: java.time.LocalDateTime => java.sql.Timestamp.valueOf(t)
        case v => v
      })
      i += 1
    }
  }

  /** S11: batched fact upsert keyed `keyCols`. One connection + one batch stream per
    * partition; `batchSize` bounds memory. */
  def upsert(df: DataFrame, url: String, table: String, keyCols: Seq[String],
             dialect: Dialect = AnsiMergeDialect, batchSize: Int = 1000): Unit = {
    val cols = df.columns.toSeq
    val sql = dialect.upsertSql(table, cols, keyCols)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { r =>
            bind(ps, r); ps.addBatch(); n += 1
            if (n % batchSize == 0) ps.executeBatch()
          }
          ps.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** S12: idempotent dimension get-or-create — insert the key-rows that do not yet
    * exist (left-anti join against the current dim), then return the full dim.
    * Ids are deterministic content hashes (TimeSeriesOps.seriesId), so concurrent
    * writers converge on identical rows without an id-allocator; the upsert makes the
    * race a benign overwrite-with-equal-values. */
  def getOrCreateDim(spark: SparkSession, candidates: DataFrame, url: String,
                     table: String, keyCols: Seq[String],
                     dialect: Dialect = AnsiMergeDialect): DataFrame = {
    val existing = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()
    val missing = candidates.join(existing.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    upsert(missing, url, table, keyCols, dialect)
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()
  }
}
