package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup so the first timed query isn't charged for one-time session
    // spin-up (classloading, the codegen compiler, parquet vectorized
    // reader + footer paths, shuffle/AQE machinery): a synthetic agg plus
    // the flagship scan+agg query at sf0.001 (~6k rows — data cost is
    // negligible, the class/codegen warm-up is what matters; measured
    // ~18 s charged to whichever query happened to run first otherwise).
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        // noop sink: every row is fully materialized through the complete
        // plan (projections, sorts, limits) but written nowhere — unlike
        // count(), which lets Catalyst prune projections and drop sorts,
        // timing a cheaper plan than the query declares.
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          // a failed query must not masquerade as a fast one
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
