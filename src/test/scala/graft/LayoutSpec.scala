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

  test("shard writer: bounded files per language, sorted rows, pruned reads") {
    import graft.ingest.ShardWriter
    val dir = Files.createTempDirectory("graft_shards").toString + "/out"
    val docs = Tables.documents(spark, sfDir)
    ShardWriter.writeShards(docs, dir, shardsPerLang = 4)
    // one directory per language
    val langs = docs.select("lang").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val langDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
      .map(_.getName).sorted.toSeq
    assert(langDirs == langs.map("lang=" + _))
    // the small-file bound: ≤ shardsPerLang files per language no matter
    // the input parallelism (the writer's repartition is what enforces it)
    langDirs.foreach { d =>
      val files = new java.io.File(s"$dir/$d").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty && files.length <= 4,
        s"$d has ${files.length} files (shardsPerLang = 4)")
      // id-sorted within every file -> tight doc_id row-group stats
      files.foreach { f =>
        val ids = spark.read.parquet(f.getAbsolutePath)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        assert(ids == ids.sorted, s"unsorted doc_ids in ${f.getName}")
      }
    }
    // nothing lost, and per-language reads prune at the scan
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    val scan = back.filter(col("lang") === langs.head)
      .queryExecution.executedPlan.toString
    assert(scan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("lang")),
      s"expected a lang PartitionFilter on the shard scan:\n$scan")
  }

  test("epoch shards: files land in q103 manifest order — the manifest IS the layout") {
    import graft.ingest.ShardWriter
    import graft.operators.CurationOps
    val dir = Files.createTempDirectory("graft_epoch").toString + "/out"
    val docs = Tables.documents(spark, sfDir)
    val shards = 8
    ShardWriter.writeEpochShards(docs, dir, epoch = 1, shards = shards)
    // the declared query's manifest: (shard, pos) -> doc_id
    val manifest = CurationOps.epochShuffleOf(docs, epoch = 1, shards = shards)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(0)).toMap
    var seen = 0L
    for (shard <- 0 until shards) {
      val shardDir = new java.io.File(s"$dir/shard=$shard")
      if (shardDir.exists()) {
        // read files in name order, rows in stored order (no sort anywhere)
        val files = shardDir.listFiles()
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        val inFileOrder = files.flatMap(f =>
          spark.read.parquet(f.getAbsolutePath)
            .select("doc_id").collect().map(_.getLong(0))).toSeq
        val expect = (1 to inFileOrder.length)
          .map(pos => manifest((shard.toLong, pos.toLong)))
        assert(inFileOrder == expect,
          s"shard $shard file order must equal manifest position order")
        seen += inFileOrder.length
      }
    }
    assert(seen == docs.count(), "every document lands in exactly one shard")
  }
}
