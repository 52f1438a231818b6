package graft

import graft.operators.VersionedTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Measures the `graftvt` V1 Row-conversion hop at CORPUS scale
  * (round-13 verdict item 7): the DSv1 choice was argued from a ~0.4 s
  * delta on a 20-row probe; this prices a FULL-corpus aggregation —
  * count + sum(length(text)) over every document at the given SF —
  * through the format surface vs the direct library read of the same
  * versioned table. The library path stays inside whole-stage codegen
  * end-to-end; the format path exits codegen at the relation boundary
  * (InternalRow → Row → InternalRow), so this is the worst realistic
  * shape for the hop: data-proportional work with a tiny result.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.FormatHopProbe"` — prints one JSON line; the number and the
  * routing decision it supports are recorded in BASELINE.md.
  */
object FormatHopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files
      .createTempDirectory("graft_hop_probe").toString
    // replicate the fixture corpus so the scan is data-proportional
    // (sf0.1's documents alone are 5k rows — fixed costs would drown
    // the per-row hop this probe exists to price)
    val reps = sys.env.getOrElse("SPARK_GRAFT_HOP_SCALE", "100").toInt
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .crossJoin(spark.range(reps).select(col("id").as("rep")))
      .select((col("doc_id") * reps + col("rep")).as("doc_id"),
        col("text"), pmod(col("doc_id"), lit(16L)).as("bucket"))
    VersionedTable.publishFull(spark, root, "bucket", docs)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("bucket", LongType)))

    def agg(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(length(col("text")).cast("long")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    def library() = agg(VersionedTable.readCurrent(spark, root, schema))
    def format() = agg(spark.read.format("graftvt").load(root))

    // warm both paths (codegen compile, file listing, page cache), then
    // median-of-3 timed reps per path, interleaved
    library(); format()
    def time3(f: () => (Long, Long)): (Double, (Long, Long)) = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val out = f()
        ((System.nanoTime() - t0) / 1e9, out)
      }
      (reps.map(_._1).sorted.apply(1), reps.head._2)
    }
    val (libSec, libOut) = time3(() => library())
    val (fmtSec, fmtOut) = time3(() => format())
    require(libOut == fmtOut,
      s"answer mismatch: library=$libOut format=$fmtOut")
    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"probe":"graftvt_row_hop","sf":${
        VerifyCommon.jsonStr(sfDir)},"rows":${libOut._1},""" +
      s""""sum_chars":${libOut._2},"library_sec":${f(libSec)},""" +
      s""""format_sec":${f(fmtSec)},"ratio":${f(fmtSec / libSec)}}""")
    spark.stop()
  }
}
