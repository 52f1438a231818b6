package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
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
    // The driver captures only the LAST ~2000 chars of output and looks
    // for a {"metric"...} JSON line (every BENCH_r{1..5}.json recorded
    // parsed:null because the full per-query line exceeds that window).
    // Emit the line twice: first the COMPLETE per-query map (for anyone
    // reading the full log), then a compact copy sized to fit the tail
    // window — slowest queries first, packed into a fixed char budget,
    // with the drop count declared (never silently truncated).
    def enc(kv: (String, Double)): String =
      "\"" + kv._1 + "\":" +
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(kv._2))
    val sorted = results.toSeq.sortBy { case (_, v) => -v }
    val total = results.values.filter(_ >= 0).sum
    val totalS = String.format(java.util.Locale.ROOT, "%.3f", Double.box(total))
    val full = sorted.map(enc).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$totalS,"unit":"sec","queries":$full,"sf":"$sfDir"}""")
    val budget = 1400 // chars for the compact queries map (tail is ~2000)
    val buf = new StringBuilder
    var omitted = 0
    sorted.foreach { kv =>
      val e = enc(kv)
      if (buf.length + e.length + 1 <= budget) {
        if (buf.nonEmpty) buf.append(',')
        buf.append(e)
      } else omitted += 1
    }
    println(s"""{"metric":"total","value":$totalS,"unit":"sec","queries":{$buf},"sf":"$sfDir","queries_omitted_for_length":$omitted,"complete_line_earlier_in_log":true}""")
    spark.stop()
  }
}
