package graft.sources

import java.sql.{Connection, DriverManager}
import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** JDBC source/sink bindings (SURVEY §2.1 S1-S3): the deployment mode where
  * the engine reads a live OLTP PostgreSQL and merges into a warehouse DB,
  * exactly like the reference. Parquet is the test corpus; this module is
  * the production-source configuration surface.
  *
  * Scale posture: the whole extract query ships to the source as a
  * `dbtable` subquery (the reference's pushdown, S1), reads are partitioned
  * on a numeric/timestamp column so N executors pull in parallel, and the
  * statement timeout + fetchsize mirror the reference's resource guards
  * (config.py:14, db.py:74).
  */
object Jdbc {

  final case class SourceConf(
      url: String, user: String, password: String,
      queryTimeoutSec: Int = 15,   // reference statement_timeout=15000
      fetchSize: Int = 1000)

  /** S1: pushdown scan — the full extract SQL runs inside the source DB. */
  def pushdownQuery(spark: SparkSession, conf: SourceConf, sql: String): DataFrameReader =
    spark.read.format("jdbc")
      .option("url", conf.url)
      .option("user", conf.user)
      .option("password", conf.password)
      .option("dbtable", s"($sql) q")
      .option("queryTimeout", conf.queryTimeoutSec)
      .option("fetchsize", conf.fetchSize)

  /** S1 at scale: partitioned parallel read over a range column — one
    * executor task per slice instead of a single-connection pull. */
  def partitionedTable(spark: SparkSession, conf: SourceConf, table: String,
                       partitionCol: String, lower: Long, upper: Long,
                       numPartitions: Int): DataFrameReader =
    pushdownQuery(spark, conf, s"SELECT * FROM $table")
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)

  // -------------------------------------------------------------------
  // S2/S3 + M1-M4 on a JDBC target: batched `INSERT ... ON CONFLICT`
  // statements executed per partition inside foreachPartition — the exact
  // load.py shape (pages of 500, db.py:68-76), no driver-side collect.
  // -------------------------------------------------------------------

  /** Quote an SQL identifier (double-quote style, embedded quotes doubled)
    * and reject names no sane schema produces — table/column names reach
    * this module from config, and unquoted interpolation would make a
    * hostile name an injection vector.
    *
    * Quoting makes names case-SENSITIVE on PostgreSQL (unquoted identifiers
    * fold to lowercase): configs must use the exact stored-case names —
    * all-lowercase throughout the reference schema. Schema-qualified names
    * are split on '.', so dotted identifiers themselves are unsupported. */
  def quoteIdent(name: String): String = {
    require(name.nonEmpty && name.length <= 128 && !name.contains(' '),
      s"invalid SQL identifier: '$name'")
    "\"" + name.replace("\"", "\"\"") + "\""
  }

  /** The ON CONFLICT statement for a merge mode (load.py:18-187), all
    * identifiers quoted. Exposed for tests; executed by [[writeUpsert]]. */
  def upsertSql(table: String, columns: Seq[String], keys: Seq[String],
                mutableCols: Seq[String]): String = {
    // table may be schema-qualified: quote each dotted part separately
    val qtable = table.split('.').map(quoteIdent).mkString(".")
    val collist = columns.map(quoteIdent).mkString(", ")
    val params = columns.map(_ => "?").mkString(", ")
    val conflict = keys.map(quoteIdent).mkString(", ")
    val action =
      if (mutableCols.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " +
        mutableCols.map(c => s"${quoteIdent(c)} = EXCLUDED.${quoteIdent(c)}").mkString(", ")
    s"INSERT INTO $qtable ($collist) VALUES ($params) ON CONFLICT ($conflict) $action"
  }

  /** Apply a batch to a JDBC target with upsert semantics, page-committed.
    * Runs on executors via `df.foreachPartition` — each partition opens one
    * connection, addBatch/executeBatch in pages (S3), commits per page.
    * On mid-page failure the uncommitted page is rolled back before the
    * connection closes (committed pages stand — per-page atomicity, and the
    * ON CONFLICT statement is idempotent under task retry); the statement
    * and connection always close. */
  def writeUpsert(df: DataFrame, url: String, props: java.util.Properties,
                  table: String, keys: Seq[String], mutableCols: Seq[String],
                  pageSize: Int = 500): Unit = {
    val columns = df.columns.toSeq
    val sql = upsertSql(table, columns, keys, mutableCols)
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          try {
            var n = 0
            rows.foreach { r =>
              columns.indices.foreach(i => st.setObject(i + 1, r.get(i)))
              st.addBatch()
              n += 1
              if (n % pageSize == 0) { st.executeBatch(); conn.commit() }
            }
            st.executeBatch(); conn.commit()
          } catch {
            case e: Throwable =>
              try conn.rollback() catch { case _: Throwable => () }
              throw e
          } finally st.close()
        } finally conn.close()
      }
    }
  }
}
