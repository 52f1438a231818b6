package graft

/** Development helper: [[Verify]] for a NAMED SUBSET of queries — same
  * output layout (`outDir/<name>.parquet` + `oracle_sql.json`), so
  * `tools/check.py` works unchanged while iterating on one operator
  * without paying the full catalog sweep. All session/dump/escape
  * plumbing is [[VerifyCommon]]'s — shared with Verify by construction.
  *
  * Usage: runMain graft.VerifyOne <sfDir> <outDir> <q1> [q2 ...]
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val spark = VerifyCommon.session()
    new java.io.File(outDir).mkdirs()
    val unknown = names.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    SparkEntry.queries.filter(kv => names(kv._1)).foreach { case (name, fn) =>
      VerifyCommon.dump(spark, sfDir, outDir, name, fn)
      println(s"[verify-one] wrote $name")
    }
    VerifyCommon.writeOracleJson(outDir,
      SparkEntry.oracleSql.filter(kv => names(kv._1)))
    spark.stop()
  }
}
