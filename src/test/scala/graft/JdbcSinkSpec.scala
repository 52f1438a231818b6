package graft

import java.nio.file.Files

import graft.ingest.ParquetIngest
import org.apache.spark.sql.functions._

/** Live JDBC sink test against embedded Derby (ships with Spark): the
  * reference's Postgres path (O11–O14, `app.py:58-61,177-186`) exercised
  * end-to-end — DDL pre-action, create-table write, fail/replace/append
  * semantics, observed row counts. */
class JdbcSinkSpec extends SparkSpec {

  private def derbyUrl(): String = {
    val dir = Files.createTempDirectory("graft_derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("JDBC ingest: pre-action DDL + create + append + replace (O11-O14)") {
    val url = derbyUrl()
    val src = s"$sfDir/region.parquet"
    // pre-action (O11): create an audit table like the reference's
    // CREATE EXTENSION pre-flight
    val r1 = ParquetIngest.ingest(spark, src,
      ParquetIngest.JdbcSink(url, "regions",
        preActions = Seq("CREATE TABLE ingest_audit (note VARCHAR(64))")),
      "fail")
    assert(r1.rowsWritten == 5)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "regions").load()
    assert(back.count() == 5)
    assert(back.columns.toSet == Set("r_regionkey", "r_name"))
    // pre-action table exists
    val audit = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "ingest_audit").load()
    assert(audit.count() == 0)
    // append (O14)
    ParquetIngest.ingest(spark, src,
      ParquetIngest.JdbcSink(url, "regions"), "append")
    assert(spark.read.format("jdbc").option("url", url)
      .option("dbtable", "regions").load().count() == 10)
    // replace (O14)
    ParquetIngest.ingest(spark, src,
      ParquetIngest.JdbcSink(url, "regions"), "replace")
    assert(spark.read.format("jdbc").option("url", url)
      .option("dbtable", "regions").load().count() == 5)
    // fail on existing (O14)
    intercept[Exception] {
      ParquetIngest.ingest(spark, src,
        ParquetIngest.JdbcSink(url, "regions"), "fail")
    }
  }

  // ------------------------------------------------------- PostGIS (O13)
  // No PostgreSQL exists in this environment, so the live socket is out of
  // reach; everything up to it — typed DDL, save-mode action sequence,
  // EWKB wire bytes, connection properties — is asserted here.

  private def spatialFrame() = {
    val dir = Files.createTempDirectory("graft_pg").toString
    graft.ingest.Generator.writeFixture(spark, s"$dir/fixture", n = 10)
    ParquetIngest.read(spark, s"$dir/fixture")
  }

  test("PostGIS DDL types the geometry column with the metadata SRID (O13)") {
    import graft.ingest.Postgis
    val df = spatialFrame()
    val ddl = Postgis.createTableDdl(df.schema, "geometry", 4326, "pts")
    assert(ddl.startsWith("CREATE TABLE pts ("))
    assert(ddl.contains("\"geometry\" geometry(Geometry,4326)"))
    assert(!ddl.toUpperCase.contains("BYTEA"), s"geometry fell through untyped: $ddl")
    // non-spatial columns go through the Postgres dialect
    assert(ddl.contains("\"id\""))
    val custom = Postgis.createTableDdl(df.schema, "geometry", 3857, "pts",
      geometryType = "Point", ifNotExists = true)
    assert(custom.contains("CREATE TABLE IF NOT EXISTS pts ("))
    assert(custom.contains("geometry(Point,3857)"))
  }

  test("PostGIS plan: save-mode DDL sequences, wire format, properties") {
    import graft.ingest.Postgis
    import org.apache.spark.sql.SaveMode
    val df = spatialFrame()
    val sink = ParquetIngest.PostgisSink("jdbc:postgresql://nowhere/db", "pts")

    val fail = Postgis.plan(df, sink, SaveMode.ErrorIfExists)
    assert(fail.preActions.head == "CREATE EXTENSION IF NOT EXISTS postgis")
    assert(fail.preActions.tail.map(_.takeWhile(_ != '(')).map(_.trim) ==
      Seq("CREATE TABLE pts"))

    val replace = Postgis.plan(df, sink, SaveMode.Overwrite)
    assert(replace.preActions.tail.head == "DROP TABLE IF EXISTS pts")
    assert(replace.preActions.tail(1).startsWith("CREATE TABLE pts ("))

    val append = Postgis.plan(df, sink, SaveMode.Append)
    assert(append.preActions.tail.head.startsWith("CREATE TABLE IF NOT EXISTS pts"))

    // pgjdbc must send the hex string untyped for geometry coercion
    assert(fail.properties.getProperty("stringtype") == "unspecified")

    // wire format: geometry column became a hex EWKB string
    import org.apache.spark.sql.types.StringType
    assert(fail.frame.schema("geometry").dataType == StringType)
    val hexStr = fail.frame.select("geometry").limit(1).collect()(0).getString(0)
    val bytes = hexStr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    import graft.functions.SpatialExpressions
    assert(SpatialExpressions.sridOf(bytes).contains(4326),
      "wire bytes must embed the SRID (EWKB)")
    assert(SpatialExpressions.walkWkb(bytes).contains(1),
      "wire bytes must stay a structurally valid point")
  }

  test("PostGIS plan honors an explicit SRID override and rejects non-spatial frames") {
    import graft.ingest.Postgis
    import org.apache.spark.sql.SaveMode
    val df = spatialFrame()
    val forced = Postgis.plan(df,
      ParquetIngest.PostgisSink("jdbc:postgresql://nowhere/db", "pts",
        srid = Some(27700)), SaveMode.Append)
    assert(forced.preActions.exists(_.contains("geometry(Geometry,27700)")))
    intercept[IllegalArgumentException] {
      Postgis.plan(Tables.nation(spark, sfDir),
        ParquetIngest.PostgisSink("jdbc:postgresql://nowhere/db", "t"),
        SaveMode.Append)
    }
  }

  test("PostGIS SRID parse from CRS metadata strings") {
    import graft.ingest.Postgis
    assert(Postgis.sridOfCrs("EPSG:4326") == 4326)
    assert(Postgis.sridOfCrs("epsg:3857") == 3857)
    assert(Postgis.sridOfCrs("EPSG: 27700") == 27700)
    assert(Postgis.sridOfCrs("""{"proj":"custom"}""") == 4326)
    assert(Postgis.sridOfCrs(null) == 4326)
    assert(Postgis.sridOfCrs("EPSG:notanumber") == 4326)
  }

  test("JDBC round-trip preserves values") {
    val url = derbyUrl()
    ParquetIngest.ingest(spark, s"$sfDir/nation.parquet",
      ParquetIngest.JdbcSink(url, "nations"), "fail")
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "nations").load()
      .orderBy("n_nationkey")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    val orig = Tables.nation(spark, sfDir).orderBy("n_nationkey")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(back == orig)
  }
}
