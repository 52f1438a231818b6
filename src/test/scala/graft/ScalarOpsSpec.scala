package graft

import graft.operators.ScalarOps
import org.apache.spark.sql.functions._

/** Bounds for the approximate-distinct sketch. The raw HLL estimates are
  * engine-specific, so q27's oracle surface is tolerance FLAGS; this spec
  * bounds the raw Spark estimates much tighter (2% rsd → <6% observed). */
class ScalarOpsSpec extends SparkSpec {

  test("approx_count_distinct within configured 2% relative error") {
    val rows = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exactOrders = r.getLong(1).toDouble
      val approxOrders = r.getLong(2).toDouble
      val exactParts = r.getLong(3).toDouble
      val approxParts = r.getLong(4).toDouble
      assert(math.abs(approxOrders - exactOrders) / exactOrders < 0.06,
        s"orders sketch off: $approxOrders vs $exactOrders")
      assert(math.abs(approxParts - exactParts) / exactParts < 0.06,
        s"parts sketch off: $approxParts vs $exactParts")
    }
  }

  test("q27 tolerance flags are all true and deterministic across runs") {
    val a = ScalarOps.approxDistinct(spark, sfDir).collect().toSeq
    a.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"sketch outside 10% tolerance for flag ${r.getString(0)}")
    }
    val b = ScalarOps.approxDistinct(spark, sfDir).collect().toSeq
    assert(a == b)
  }
}
