package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` through a noop sink and prints one JSON line.
  *
  * The measurement SELF-ADJUDICATES: a bench run on a machine that is
  * busy doing something else (the round-6 driver capture recorded 357 s
  * for a suite that re-times at ~109 s in a clean window) must label
  * itself rather than masquerade as a regression. Two signals are
  * embedded in the output line:
  *
  *  - `sentinel_pre_sec` / `sentinel_post_sec`: the flagship q01
  *    scan+agg timed in isolation immediately before and after the
  *    suite. Clean-window records for this sentinel are 0.94–1.1 s at
  *    sf0.1 (BASELINE.md, rounds 4–6); `contaminated` is true when
  *    either sample exceeds `sentinel_band_sec` (2.0 s — 2× the worst
  *    clean record). The verdict is keyed on the sentinel ONLY: load
  *    average during the suite is dominated by the bench's own 32
  *    threads and cannot distinguish self-load from contention.
  *  - `load_avg_start` (captured before any Spark work — external load)
  *    and a per-query 1-min load-average map in the full line (context
  *    for adjudicating individual outliers after the fact).
  */
object Bench {
  /** Sentinel clean band (sec) at sf0.1: 2× the worst clean-window q01
    * record (1.1 s @ 8 CPUs; 0.94–0.98 s @ 32 CPUs — BASELINE.md). */
  private val SentinelBandSec = 2.0

  private def loadAvg(): Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage // -1.0 if unsupported

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val loadStart = loadAvg() // BEFORE any Spark work: external load only
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

    def runNoop(name: String): Double = {
      val t0 = System.nanoTime()
      // noop sink: every row is fully materialized through the complete
      // plan (projections, sorts, limits) but written nowhere — unlike
      // count(), which lets Catalyst prune projections and drop sorts,
      // timing a cheaper plan than the query declares.
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val sentinelPre = runNoop("q01_pricing_summary")
    val loads = scala.collection.mutable.LinkedHashMap[String, Double]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      loads(name) = loadAvg()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          // a failed query must not masquerade as a fast one
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> -1.0
      }
    }
    val sentinelPost = runNoop("q01_pricing_summary")
    val loadEnd = loadAvg()
    val contaminated =
      sentinelPre > SentinelBandSec || sentinelPost > SentinelBandSec

    // The driver captures only the LAST ~2000 chars of output and looks
    // for a {"metric"...} JSON line (every BENCH_r{1..5}.json recorded
    // parsed:null because the full per-query line exceeded that window).
    // Emit the line twice: first the COMPLETE per-query map plus the
    // per-query load-average context (for anyone reading the full log),
    // then a compact copy sized to fit the tail window — slowest queries
    // first, packed into a fixed char budget, with the drop count
    // declared (never silently truncated). The adjudication fields ride
    // on BOTH lines so a truncated capture still self-labels.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def enc(kv: (String, Double)): String = "\"" + kv._1 + "\":" + fmt(kv._2)
    val sorted = results.toSeq.sortBy { case (_, v) => -v }
    val total = results.values.filter(_ >= 0).sum
    val adjudication =
      s""""load_avg_start":${fmt(loadStart)},"load_avg_end":${fmt(loadEnd)},""" +
      s""""sentinel_pre_sec":${fmt(sentinelPre)},"sentinel_post_sec":${fmt(sentinelPost)},""" +
      s""""sentinel_band_sec":${fmt(SentinelBandSec)},"contaminated":$contaminated"""
    val full = sorted.map(enc).mkString("{", ",", "}")
    val loadFull = loads.toSeq.map(enc).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$full,"load_avg_per_query":$loadFull,"sf":"$sfDir",$adjudication}""")
    val budget = 1200 // chars for the compact queries map (tail is ~2000)
    val buf = new StringBuilder
    var omitted = 0
    sorted.foreach { kv =>
      val e = enc(kv)
      if (buf.length + e.length + 1 <= budget) {
        if (buf.nonEmpty) buf.append(',')
        buf.append(e)
      } else omitted += 1
    }
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":{$buf},"sf":"$sfDir",$adjudication,"queries_omitted_for_length":$omitted,"complete_line_earlier_in_log":true}""")
    spark.stop()
  }
}
