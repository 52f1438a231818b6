package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: time named queries in isolation with the Bench protocol
  * (noop sink, same session confs); SPARK_GRAFT_CPUS / SPARK_GRAFT_SF_DIR
  * env-tunable to reproduce the driver's config exactly. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    if (sys.env.contains("SPARK_GRAFT_WARM_ENTRY"))
      SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    for (name <- args; i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      println(f"$name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
