package org.apache.spark.sql.graftvt

import org.apache.spark.sql.DataFrame

/** The one `private[sql]` hop a V1 streaming source needs (the standard
  * third-party-connector shim, hence this file's package): V1
  * `Source.getBatch` must return a frame whose logical plan reports
  * `isStreaming = true` — `MicroBatchExecution` asserts it before
  * splicing the plan under the streaming leaves — and the only way to
  * build one from an arbitrary batch plan is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`.
  * The RDD hand-off is lazy: the wrapped feed still computes inside
  * the micro-batch that runs it, nothing is materialized here. */
object StreamingCompat {
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[
        org.apache.spark.sql.Row]].queryExecution.toRdd,
      df.schema, isStreaming = true)
  }
}
