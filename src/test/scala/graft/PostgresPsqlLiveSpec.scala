package graft

import java.nio.file.Files

import scala.sys.process._

import graft.ingest.{Generator, ParquetIngest, Postgis}
import org.apache.spark.sql.SaveMode

/** LIVE plain-PostgreSQL coverage of the O13 sink via `psql` — the hop a
  * zero-egress sandbox CAN close (reference `app.py:58-61,181`).
  *
  * `PostgisLiveSpec` needs two things this environment lacks: the pgjdbc
  * jar (no egress to fetch one) and the postgis server packages. But the
  * box DOES ship postgres server binaries (initdb/pg_ctl/psql), so this
  * spec stands up a THROWAWAY cluster (`tools/pg-local.sh`, random temp
  * PGDATA, private port) and drives the EXACT artifacts [[Postgis.plan]]
  * generates — the DDL strings and the hex-EWKB wire values — through a
  * real PostgreSQL 15 server with `psql` as the transport:
  *
  *  - the save-mode pre-action sequences (replace = DROP IF EXISTS +
  *    CREATE; fail = bare CREATE that must error on rerun; append =
  *    CREATE IF NOT EXISTS) execute against the live dialect;
  *  - the `CREATE EXTENSION IF NOT EXISTS postgis` pre-action reaches the
  *    server and fails with the server's own "not available" diagnostic —
  *    live proof the statement parses and only the package is missing;
  *  - every hex-EWKB value the frame would ship through pgjdbc is
  *    INSERTed and then re-parsed SERVER-SIDE with `decode(..,'hex')` +
  *    `get_byte` arithmetic: endianness byte, point type code, EWKB SRID
  *    flag, embedded SRID 4326, and the exact 25-byte point length.
  *
  * The one substitution: the geometry column's `geometry(Geometry,4326)`
  * typmod becomes TEXT (asserted, not silent), because the typed input
  * function IS the postgis package — that residue stays with the gated
  * `PostgisLiveSpec`. Everything else is byte-identical to what the JDBC
  * path sends (`stringtype=unspecified` ships hex strings untyped; the
  * server resolves them through the column type's input function).
  *
  * Cancels cleanly when server binaries are absent or the cluster cannot
  * start (e.g. no root and no writable temp), so the suite stays green on
  * minimal machines.
  */
class PostgresPsqlLiveSpec extends SparkSpec {

  private val repoRoot = new java.io.File(".").getCanonicalPath
  private val script = s"$repoRoot/tools/pg-local.sh"
  private val port = 54333
  // NOT under a Files.createTempDirectory parent: those are mode-700 and
  // owned by the invoking user, and the cluster runs as 'pglocal' when the
  // suite runs as root (postgres refuses root) — the pg user must be able
  // to traverse into PGDATA
  private val pgdata = s"/tmp/graft_pg_live_$port"

  private def haveBinaries: Boolean =
    Seq("initdb", "pg_ctl", "psql").forall(b =>
      Seq("bash", "-c", s"command -v $b").!(ProcessLogger(_ => ())) == 0)

  /** Runs SQL against the throwaway cluster; returns (exitCode, stdout+err). */
  private def psql(sql: String): (Int, String) = {
    val out = new StringBuilder
    val cmd = Seq("psql", "-X", "-v", "ON_ERROR_STOP=1", "-A", "-t",
      "-h", "127.0.0.1", "-p", port.toString, "-U", "pglocal", "postgres",
      "-c", sql)
    val code = cmd.!(ProcessLogger(l => out.append(l).append('\n'),
      l => out.append(l).append('\n')))
    (code, out.toString)
  }

  private def env = Map("PGDATA_LOCAL" -> pgdata, "PGPORT_LOCAL" -> port.toString)

  private def startCluster(): Boolean = {
    // clear any half-initialized leftover from a crashed prior run —
    // initdb refuses a non-empty PGDATA
    Process(Seq("bash", script, "stop"), None, env.toSeq: _*)
      .!(ProcessLogger(_ => ()))
    val log = new StringBuilder
    val code = Process(Seq("bash", script, "start"), None,
      env.toSeq: _*).!(ProcessLogger(l => log.append(l).append('\n'),
        l => log.append(l).append('\n')))
    code == 0 && psql("SELECT 1")._1 == 0
  }

  override def afterAll(): Unit = {
    Process(Seq("bash", script, "stop"), None, env.toSeq: _*)
      .!(ProcessLogger(_ => ()))
    super.afterAll()
  }

  test("O13 live: generated DDL + hex-EWKB wire rows round-trip a real PostgreSQL") {
    assume(haveBinaries, "no postgres server binaries on this machine")
    assume(startCluster(), s"local cluster failed to start (pgdata=$pgdata)")

    val src = Files.createTempDirectory("graft_pg_fix").toString + "/points"
    Generator.writeFixture(spark, src, n = 10)
    val df = ParquetIngest.read(spark, src)
    val sink = ParquetIngest.PostgisSink(
      url = s"jdbc:postgresql://127.0.0.1:$port/postgres?user=pglocal",
      table = "graft_points_live")
    val plan = Postgis.plan(df, sink, SaveMode.Overwrite)

    // O11 pre-action order: extension first, then the mode actions
    assert(plan.preActions.head == "CREATE EXTENSION IF NOT EXISTS postgis")
    val (extCode, extMsg) = psql(plan.preActions.head)
    assert(extCode != 0 && extMsg.contains("not available"),
      s"plain postgres should lack postgis, got: $extMsg")

    // replace-mode table actions, geometry typmod -> TEXT (the one
    // postgis-package residue; asserted so the substitution can't rot)
    val tableActions = plan.preActions.tail
    assert(tableActions.exists(_.contains("geometry(Geometry,4326)")))
    tableActions.foreach { ddl =>
      val live = ddl.replace("geometry(Geometry,4326)", "TEXT")
      val (c, m) = psql(live)
      assert(c == 0, s"DDL failed live: $live\n$m")
    }

    // fail-mode: bare CREATE must error against the existing table
    val failDdl = Postgis.plan(df, sink, SaveMode.ErrorIfExists)
      .preActions.tail
    assert(failDdl.length == 1 && !failDdl.head.contains("IF NOT EXISTS"))
    val (failCode, failMsg) =
      psql(failDdl.head.replace("geometry(Geometry,4326)", "TEXT"))
    assert(failCode != 0 && failMsg.contains("already exists"),
      s"ErrorIfExists CREATE should collide, got: $failMsg")

    // append-mode: CREATE IF NOT EXISTS is a live no-op
    val appendDdl = Postgis.plan(df, sink, SaveMode.Append).preActions.tail
    assert(appendDdl.length == 1 && appendDdl.head.contains("IF NOT EXISTS"))
    val (appendCode, appendMsg) =
      psql(appendDdl.head.replace("geometry(Geometry,4326)", "TEXT"))
    assert(appendCode == 0, s"append DDL failed live: $appendMsg")

    // the wire rows pgjdbc would ship: every column, geometry as the
    // hex-EWKB string, sent as INSERTs (the fixture's non-geometry columns
    // are NOT NULL in the generated DDL, so the full row must travel)
    val rows = plan.frame.select("id", "value", "category", "geometry")
      .collect()
      .map(r => s"(${r.getLong(0)}, ${r.getDouble(1)}, " +
        s"'${r.getString(2)}', '${r.getString(3)}')")
    assert(rows.length == 10)
    val (insCode, insMsg) = psql(
      "INSERT INTO graft_points_live (id, value, category, geometry) " +
        s"VALUES ${rows.mkString(", ")}")
    assert(insCode == 0, s"wire insert failed: $insMsg")

    // server-side EWKB parse: decode the hex and walk the bytes with the
    // server's own functions — endianness, point type, SRID flag, SRID,
    // exact 25-byte point length (1 order + 4 type + 4 srid + 16 coords)
    val (qCode, qOut) = psql(
      """SELECT count(*),
        |  count(*) FILTER (WHERE get_byte(b,0) = 1),
        |  count(*) FILTER (WHERE get_byte(b,1) = 1 AND get_byte(b,2) = 0
        |                     AND get_byte(b,3) = 0 AND get_byte(b,4) = 32),
        |  count(*) FILTER (WHERE get_byte(b,5) + 256*get_byte(b,6)
        |                     + 65536*get_byte(b,7) = 4326),
        |  count(*) FILTER (WHERE octet_length(b) = 25)
        |FROM (SELECT decode(geometry,'hex') AS b FROM graft_points_live) t
        |""".stripMargin)
    assert(qCode == 0, s"server-side parse failed: $qOut")
    assert(qOut.trim == "10|10|10|10|10",
      s"EWKB byte audit mismatch, server said: $qOut")

    // id round-trip: the id set the server holds == the frame's
    val (idCode, idOut) = psql(
      "SELECT string_agg(id::text, ',' ORDER BY id) FROM graft_points_live")
    val expected = plan.frame.select("id").collect()
      .map(_.getLong(0)).sorted.mkString(",")
    assert(idCode == 0 && idOut.trim == expected,
      s"id round-trip mismatch: server=$idOut expected=$expected")
  }
}
