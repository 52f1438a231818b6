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
