package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.StreamingOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming demo CLI: drives `readStream` (parquet file source) →
  * event-time windowed aggregation with watermark → `writeStream` into an
  * in-memory sink, simulating file arrival by copying the events table
  * into a watched directory in two batches.
  *
  * Usage: runMain graft.Stream <sfDir>
  */
object Stream {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    // stage the source: split events into two "arriving" files
    val watchDir = Files.createTempDirectory("graft_stream").toString
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select("ts", "user_id", "event_type", "value", "event_id")
    val Array(first, second) = ev.randomSplit(Array(0.5, 0.5), seed = 42)
    first.write.parquet(s"$watchDir/batch1")
    val schema = ev.schema

    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$watchDir/batch*/")
    val query = StreamingOps.tumblingCounts(stream)
      .writeStream.format("memory").queryName("stream_demo")
      .outputMode("complete").start()
    query.processAllAvailable()
    val afterFirst = spark.table("stream_demo").count()
    println(s"[stream] windows after batch 1: $afterFirst")

    second.write.parquet(s"$watchDir/batch2")
    query.processAllAvailable()
    val afterSecond = spark.table("stream_demo").count()
    println(s"[stream] windows after batch 2: $afterSecond")
    query.stop()

    val batchWindows = StreamingOps.tumblingCounts(ev).count()
    println(s"[stream] batch-mode windows:    $batchWindows")
    println(s"[stream] stream==batch: ${afterSecond == batchWindows}")
    spark.stop()
  }
}
