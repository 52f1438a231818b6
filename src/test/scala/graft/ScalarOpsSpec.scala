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

  test("approx_percentile honors the GK rank-error guarantee (q67 raw bound)") {
    // accuracy=1000 → rank error ε = 1/1000: the returned value's TRUE rank
    // must be within p ± ε (we allow 5ε slack for interpolation edges).
    // This is the sketch-side guarantee behind q67's cross-engine flags.
    val vals = Tables.orders(spark, sfDir)
      .select(col("o_totalprice")).collect().map(_.getDouble(0)).sorted
    val n = vals.length
    for (p <- Seq(0.5, 0.9)) {
      val approx = Tables.orders(spark, sfDir)
        .agg(expr(s"approx_percentile(o_totalprice, $p, 1000)").as("a"))
        .collect()(0).getDouble(0)
      val rank = vals.count(_ <= approx).toDouble / n
      assert(math.abs(rank - p) <= 0.005,
        s"p=$p approx=$approx true rank=$rank outside ±5e-3")
    }
    // q67 flags are all true and deterministic
    val a = ScalarOps.approxPercentiles(spark, sfDir).collect().toSeq
    a.foreach { r =>
      assert(r.getBoolean(4) && r.getBoolean(5),
        s"percentile sketch outside 5% tolerance for ${r.getString(0)}")
    }
    assert(ScalarOps.approxPercentiles(spark, sfDir).collect().toSeq == a)
  }
}
