package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Physical-layout techniques for scale: bucketed co-located joins (no
  * shuffle) and partition-pruned reads. These are plan-shape assertions —
  * the observable contract that the layout actually removes work. */
class LayoutSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // (warehouse dir is a static conf — set at session build in SparkSpec)
    // AQE rewrites make plan-shape assertions fuzzy; turn it off here
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Tables.orders(spark, sfDir).write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bkt")
      Tables.customer(spark, sfDir).write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_bkt")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucket join: SortMergeJoin with NO shuffle before it
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      val shufflesBeforeAgg = plan.linesIterator
        .takeWhile(l => !l.contains("HashAggregate"))
        .count(_.contains("Exchange hashpartitioning"))
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      // only the final groupBy may shuffle; the join itself must not
      assert(exchanges <= 1, s"bucketed join should not shuffle:\n$plan")
      // and the result matches the unbucketed join
      val expect = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("partitionBy layout enables partition pruning at the scan") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.orders(spark, sfDir)
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(s"$dir/orders")
    val pruned = spark.read.parquet(s"$dir/orders")
      .filter(col("status") === "F")
    val scan = pruned.queryExecution.executedPlan.toString
    // the partition filter must appear as a PartitionFilters entry on the
    // scan (not merely a post-scan data filter)
    val pf = scan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(l => l.contains("status") && l.contains("= F")),
      s"expected a status=F PartitionFilter on the scan:\n$scan")
    // (note: df.inputFiles reports the full FileIndex listing, NOT the
    // post-pruning set — the PartitionFilters entry is the observable)
    // and counts match the logical filter
    val expect = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F").count()
    assert(expect > 0 && pruned.count() == expect)
  }
}
