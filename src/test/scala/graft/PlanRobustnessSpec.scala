package graft

import org.apache.spark.sql.Row

/** Results must not depend on the physical strategy Catalyst happens to
  * pick: with broadcasting disabled (forcing sort-merge joins — the plan
  * shape large-scale data gets), every join query returns the identical
  * answer. Guards against broadcast-only correctness assumptions. */
class PlanRobustnessSpec extends SparkSpec {

  private val joinQueries = Seq(
    "q03_join_broadcast_dim", "q04_join_large", "q05_multi_join",
    "q06_semi_join", "q07_anti_join", "q15_brand_revenue",
    "q29_salted_join", "q49_range_join", "q24_asof_join")

  test("join results are identical with broadcasting disabled (SMJ plans)") {
    val queries = SparkEntry.queries
    def run(name: String): Seq[Row] = queries(name)(spark, sfDir).collect().toSeq
    val withBroadcast = joinQueries.map(n => n -> run(n)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joinQueries.foreach { n =>
        assert(run(n) == withBroadcast(n),
          s"$n result changed when broadcast joins were disabled")
      }
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("query catalog has no duplicate names (driver map would drop them)") {
    assert(SparkEntry.ops.map(_.name).distinct.size == SparkEntry.ops.size)
    // every oracle entry corresponds to a declared query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
