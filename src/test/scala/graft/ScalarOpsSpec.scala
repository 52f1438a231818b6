package graft

import graft.operators.ScalarOps

/** Bounds for the approximate-distinct sketch (not oracle-comparable). */
class ScalarOpsSpec extends SparkSpec {

  test("approx_count_distinct within configured 2% relative error") {
    val rows = ScalarOps.approxDistinct(spark, sfDir).collect()
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

  test("approx sketch is deterministic across runs") {
    val a = ScalarOps.approxDistinct(spark, sfDir).collect().toSeq
    val b = ScalarOps.approxDistinct(spark, sfDir).collect().toSeq
    assert(a == b)
  }
}
