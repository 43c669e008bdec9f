package graft

import java.sql.DriverManager
import graft.sources.Jdbc

/** Live-database integration for the JDBC source/sink (SURVEY §2.1).
  *
  * Two tiers:
  *  - The READ path (S1 pushdown + partitioned parallel scan) runs against
  *    an embedded Derby instance — a real JDBC round trip, always on.
  *  - The WRITE path (S2/S3 + M1/M3 `ON CONFLICT` upserts) is PostgreSQL
  *    syntax, so those cases run only when `SPARK_GRAFT_PG_URL` (plus
  *    optional `SPARK_GRAFT_PG_USER`/`SPARK_GRAFT_PG_PASSWORD`) points at a
  *    live server; otherwise they cancel (reported, not silently skipped).
  *    Against the reference's docker-compose PostgreSQL this exercises the
  *    exact load.py statement shapes end-to-end.
  */
class JdbcIntegrationSpec extends SparkTestBase {
  import spark.implicits._

  private val derbyUrl = "jdbc:derby:memory:graftjdbc;create=true"
  private def derby() = DriverManager.getConnection(derbyUrl)

  private lazy val seeded: Unit = {
    val c = derby()
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE t_src (id BIGINT NOT NULL, name VARCHAR(32), val DOUBLE)")
      val ins = c.prepareStatement("INSERT INTO t_src VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setLong(1, i.toLong); ins.setString(2, s"n$i"); ins.setDouble(3, i * 0.5)
        ins.addBatch()
      }
      ins.executeBatch()
      st.close(); ins.close()
    } finally c.close()
  }

  test("S1 pushdown scan runs the extract SQL inside a live JDBC database") {
    seeded
    val conf = Jdbc.SourceConf(derbyUrl, "", "")
    val df = Jdbc.pushdownQuery(spark, conf,
      "SELECT id, name FROM t_src WHERE id <= 50").load()
    assert(df.count() == 50)
    assert(df.columns.map(_.toLowerCase).toSet == Set("id", "name"))
    assert(df.selectExpr("max(id)").as[Long].head() == 50L)
  }

  test("S1 partitioned read splits the range into parallel JDBC slices") {
    seeded
    val conf = Jdbc.SourceConf(derbyUrl, "", "")
    val df = Jdbc.partitionedTable(spark, conf, "t_src", "id",
      lower = 1L, upper = 101L, numPartitions = 4).load()
    assert(df.rdd.getNumPartitions == 4)      // really four slices
    assert(df.count() == 100)                 // no row lost/duplicated at bounds
    assert(df.selectExpr("sum(id)").as[Long].head() == 5050L)
  }

  // ------------------------------------------------------------------
  // PostgreSQL-gated write-path cases (load.py M1/M3 round trip)
  // ------------------------------------------------------------------

  private val pgUrl = sys.env.get("SPARK_GRAFT_PG_URL")
  private def pgProps(): java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("user", sys.env.getOrElse("SPARK_GRAFT_PG_USER", "postgres"))
    sys.env.get("SPARK_GRAFT_PG_PASSWORD").foreach(p.setProperty("password", _))
    p
  }

  test("M1 writeUpsert round-trips against live PostgreSQL (set SPARK_GRAFT_PG_URL)") {
    assume(pgUrl.isDefined, "SPARK_GRAFT_PG_URL not set — skipping live-PG case")
    val url = pgUrl.get
    val conn = DriverManager.getConnection(url, pgProps())
    try {
      val st = conn.createStatement()
      st.execute("DROP TABLE IF EXISTS graft_it_m1")
      st.execute("CREATE TABLE graft_it_m1 (k TEXT PRIMARY KEY, status TEXT, note TEXT)")
      st.close()
    } finally conn.close()

    val b1 = Seq(("a", "open", "created-a"), ("b", "open", "created-b"))
      .toDF("k", "status", "note")
    Jdbc.writeUpsert(b1, url, pgProps(), "graft_it_m1", Seq("k"), Seq("status"))
    val b2 = Seq(("a", "closed", "SHOULD-NOT-REPLACE"), ("c", "open", "created-c"))
      .toDF("k", "status", "note")
    // note is immutable on conflict: only status may change
    Jdbc.writeUpsert(b2, url, pgProps(), "graft_it_m1", Seq("k"), Seq("status"))
    Jdbc.writeUpsert(b2, url, pgProps(), "graft_it_m1", Seq("k"), Seq("status")) // replay

    val conf = Jdbc.SourceConf(url,
      sys.env.getOrElse("SPARK_GRAFT_PG_USER", "postgres"),
      sys.env.getOrElse("SPARK_GRAFT_PG_PASSWORD", ""))
    val got = Jdbc.pushdownQuery(spark, conf,
      "SELECT k, status, note FROM graft_it_m1").load()
      .as[(String, String, String)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == Map(
      "a" -> ("closed", "created-a"),
      "b" -> ("open", "created-b"),
      "c" -> ("open", "created-c")))
  }

  test("M3 writeUpsert DO NOTHING keeps first-seen rows on live PostgreSQL") {
    assume(pgUrl.isDefined, "SPARK_GRAFT_PG_URL not set — skipping live-PG case")
    val url = pgUrl.get
    val conn = DriverManager.getConnection(url, pgProps())
    try {
      val st = conn.createStatement()
      st.execute("DROP TABLE IF EXISTS graft_it_m3")
      st.execute("CREATE TABLE graft_it_m3 (k TEXT PRIMARY KEY, v DOUBLE PRECISION)")
      st.close()
    } finally conn.close()

    Jdbc.writeUpsert(Seq(("r1", 1.0), ("r2", 2.0)).toDF("k", "v"),
      url, pgProps(), "graft_it_m3", Seq("k"), mutableCols = Nil)
    Jdbc.writeUpsert(Seq(("r2", 999.0), ("r3", 3.0)).toDF("k", "v"),
      url, pgProps(), "graft_it_m3", Seq("k"), mutableCols = Nil)

    val conf = Jdbc.SourceConf(url,
      sys.env.getOrElse("SPARK_GRAFT_PG_USER", "postgres"),
      sys.env.getOrElse("SPARK_GRAFT_PG_PASSWORD", ""))
    val got = Jdbc.pushdownQuery(spark, conf, "SELECT k, v FROM graft_it_m3").load()
      .as[(String, Double)].collect().toMap
    assert(got == Map("r1" -> 1.0, "r2" -> 2.0, "r3" -> 3.0))
  }
}
