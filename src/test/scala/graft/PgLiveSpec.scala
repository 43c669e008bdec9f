package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Jdbc

/** Live-PostgreSQL proof of the write path's statement shapes (SURVEY §2.1
  * S2/S3, §2.10 M1/M3; reference load.py:18-187, db.py:68-76).
  *
  * The sandbox has PostgreSQL server binaries but no pgjdbc driver jar (and
  * no egress to fetch one), so a JDBC round trip is impossible here — instead
  * this spec boots a throwaway cluster (initdb + pg_ctl, unix socket only, no
  * TCP port) and feeds the EXACT SQL text [[Jdbc.upsertSql]] generates through
  * PostgreSQL's own parser/planner via `PREPARE`/`EXECUTE` ($n placeholders
  * are PostgreSQL's native form of JDBC's `?`). That exercises everything the
  * canceled JDBC cases would have: statement validity, conflict-update
  * semantics, immutable-column preservation, DO NOTHING semantics, and replay
  * idempotency — on a real server, not a syntax mock.
  *
  * Cancels (not silently skips) when the binaries or the `postgres` OS user
  * are absent. PostgreSQL refuses to run as root, so every server command is
  * wrapped in `su postgres`.
  */
class PgLiveSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val base = s"/tmp/graft-pgit-${ProcessHandle.current().pid()}"
  private val dataDir = s"$base/data"
  private val sockDir = s"$base/sock"
  private var serverUp = false

  private def haveBinary(name: String): Boolean =
    Seq("bash", "-c", s"command -v $name").!(ProcessLogger(_ => ())) == 0
  private lazy val envOk: Boolean =
    Seq("initdb", "pg_ctl", "psql").forall(haveBinary) &&
      Seq("bash", "-c", "id postgres").!(ProcessLogger(_ => ())) == 0 &&
      // chown + su below need root; on a non-root dev box this must CANCEL
      // (assume), never abort the suite from beforeAll
      Seq("bash", "-c", "[ \"$(id -u)\" = 0 ]").!(ProcessLogger(_ => ())) == 0

  /** Run a shell command as the postgres user from a directory it can read. */
  private def asPg(cmd: String): Int =
    Process(Seq("su", "postgres", "-s", "/bin/bash", "-c", cmd),
      new java.io.File("/tmp")).!(ProcessLogger(_ => (), _ => ()))

  override def beforeAll(): Unit = {
    if (envOk) {
      Files.createDirectories(Paths.get(dataDir))
      Files.createDirectories(Paths.get(sockDir))
      require(Seq("chown", "-R", "postgres:postgres", base).! == 0)
      require(asPg(s"initdb -D $dataDir -A trust") == 0, "initdb failed")
      serverUp = asPg(s"pg_ctl -D $dataDir -l $base/log -w " +
        s"-o '-c listen_addresses= -c unix_socket_directories=$sockDir' start") == 0
    }
  }

  override def afterAll(): Unit = {
    if (serverUp) asPg(s"pg_ctl -D $dataDir -m immediate -w stop")
    if (envOk) Seq("rm", "-rf", base).!(ProcessLogger(_ => ()))
  }

  /** Run a psql script; returns stdout. Throws on any SQL error. */
  private def psql(script: String): String = {
    val out = new StringBuilder
    val err = new StringBuilder
    val code = (Process(Seq("psql", "-h", sockDir, "-U", "postgres", "-d", "postgres",
      "-v", "ON_ERROR_STOP=1", "-tA"), new java.io.File("/tmp"))
      #< new java.io.ByteArrayInputStream(script.getBytes("UTF-8")))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => err.append(l).append('\n')))
    assert(code == 0, s"psql failed (exit $code):\n$err\nscript:\n$script")
    out.toString
  }

  /** JDBC `?` positional placeholders → PostgreSQL's native `$n`, so the
    * statement text PREPARE sees is byte-identical to what pgjdbc itself
    * would send the server (pgjdbc performs exactly this substitution). */
  private def dollarize(sql: String): String = {
    var n = 0
    sql.flatMap { case '?' => n += 1; s"$$$n"; case c => c.toString }
  }

  /** psql prints command tags ("INSERT 0 1", "CREATE TABLE") to stdout even
    * under -tA; every asserted data row carries a '|' separator and no tag
    * does, so this isolates the SELECT output. */
  private def dataLines(out: String): List[String] =
    out.linesIterator.filter(_.contains("|")).toList

  private def ready(): Unit = assume(envOk && serverUp,
    "postgres binaries / postgres user unavailable — skipping live-PG cases")

  test("M1 upsertSql round-trips on live PostgreSQL: update mutable, keep immutable, replay-safe") {
    ready()
    val sql = Jdbc.upsertSql("graft_it_m1", Seq("k", "status", "note"), Seq("k"), Seq("status"))
    val got = psql(s"""
      |DROP TABLE IF EXISTS graft_it_m1;
      |CREATE TABLE graft_it_m1 (k TEXT PRIMARY KEY, status TEXT, note TEXT);
      |PREPARE up AS ${dollarize(sql)};
      |EXECUTE up('a', 'open', 'created-a');
      |EXECUTE up('b', 'open', 'created-b');
      |-- second batch: conflict on a (note must NOT be replaced), new row c
      |EXECUTE up('a', 'closed', 'SHOULD-NOT-REPLACE');
      |EXECUTE up('c', 'open', 'created-c');
      |-- at-least-once replay of the second batch: must be a no-op
      |EXECUTE up('a', 'closed', 'SHOULD-NOT-REPLACE');
      |EXECUTE up('c', 'open', 'created-c');
      |SELECT k || '|' || status || '|' || note FROM graft_it_m1 ORDER BY k;
      |""".stripMargin)
    assert(dataLines(got) ==
      List("a|closed|created-a", "b|open|created-b", "c|open|created-c"), got)
  }

  test("M3 upsertSql DO NOTHING keeps first-seen rows on live PostgreSQL") {
    ready()
    val sql = Jdbc.upsertSql("graft_it_m3", Seq("k", "v"), Seq("k"), mutableCols = Nil)
    assert(sql.endsWith("DO NOTHING"), sql)
    val got = psql(s"""
      |DROP TABLE IF EXISTS graft_it_m3;
      |CREATE TABLE graft_it_m3 (k TEXT PRIMARY KEY, v DOUBLE PRECISION);
      |PREPARE ins AS ${dollarize(sql)};
      |EXECUTE ins('r1', 1.0);
      |EXECUTE ins('r2', 2.0);
      |EXECUTE ins('r2', 999.0);
      |EXECUTE ins('r3', 3.0);
      |SELECT k || '|' || v FROM graft_it_m3 ORDER BY k;
      |""".stripMargin)
    assert(dataLines(got) ==
      List("r1|1", "r2|2", "r3|3"), got)
  }

  test("upsertSql handles schema-qualified tables and composite keys on live PostgreSQL") {
    ready()
    val sql = Jdbc.upsertSql("graft_sch.t", Seq("a", "b", "v"), Seq("a", "b"), Seq("v"))
    val got = psql(s"""
      |DROP SCHEMA IF EXISTS graft_sch CASCADE;
      |CREATE SCHEMA graft_sch;
      |CREATE TABLE graft_sch.t (a TEXT, b BIGINT, v TEXT, PRIMARY KEY (a, b));
      |PREPARE up AS ${dollarize(sql)};
      |EXECUTE up('x', 1, 'v1');
      |EXECUTE up('x', 2, 'v2');
      |EXECUTE up('x', 1, 'v1b');
      |SELECT a || '|' || b || '|' || v FROM graft_sch.t ORDER BY a, b;
      |""".stripMargin)
    assert(dataLines(got) ==
      List("x|1|v1b", "x|2|v2"), got)
  }

  test("quoted identifiers are case-sensitive on live PostgreSQL, as documented") {
    ready()
    // quoteIdent's doc promises quoted = exact stored case; prove the
    // mixed-case statement binds to the mixed-case table, not a folded one.
    val sql = Jdbc.upsertSql("GraftMixed", Seq("K", "v"), Seq("K"), Seq("v"))
    val got = psql(s"""
      |DROP TABLE IF EXISTS "GraftMixed";
      |CREATE TABLE "GraftMixed" ("K" TEXT PRIMARY KEY, v TEXT);
      |PREPARE up AS ${dollarize(sql)};
      |EXECUTE up('k1', 'first');
      |EXECUTE up('k1', 'second');
      |SELECT "K" || '|' || v FROM "GraftMixed";
      |""".stripMargin)
    assert(dataLines(got) == List("k1|second"), got)
  }
}
