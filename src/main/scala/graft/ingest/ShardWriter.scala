package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-shard OUTPUT layout — the write side of the curation pipeline
  * (the dedup/funnel/mix operators in `graft.operators.PipelineOps` decide
  * WHAT survives; this decides how the survivors land on disk so the
  * training jobs that read them do no avoidable work):
  *
  *  - `partitionBy(lang)`: per-language training reads prune whole
  *    directories at planning time (no data touched for other languages);
  *  - an explicit hash-shard repartition BEFORE the write: with
  *    `partitionBy` alone, EVERY task writes one file per language it
  *    happens to hold — tasks × languages small files, the classic
  *    100 TB small-file explosion. Repartitioning on (lang, shard) puts
  *    each (language, shard) combination in exactly one task, so a
  *    language's file count is capped by `shardsPerLang` regardless of
  *    input parallelism;
  *  - `sortWithinPartitions(doc_id)`: rows land id-sorted per file, so
  *    parquet row-group min/max statistics on `doc_id` are tight and
  *    id-range reads (resume-from-checkpoint, sample-by-range) prune at
  *    the row-group level;
  *  - `maxRecordsPerFile` caps file size below the splittable-unit target
  *    even if a shard is hot.
  *
  * Deterministic end-to-end: the shard key is a hash of the stable row id,
  * not round-robin, so re-running the writer on the same input produces
  * the same layout. */
object ShardWriter {

  /** Write `docs` (any frame with `lang` and `doc_id` columns) as a
    * partitioned, sharded, id-sorted parquet layout under `outDir`. */
  def writeShards(docs: DataFrame, outDir: String, shardsPerLang: Int = 4,
      maxRecordsPerFile: Long = 1000000L): Unit =
    docs
      .repartition(col("lang"),
        pmod(xxhash64(col("doc_id")), lit(shardsPerLang)))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("lang")
      .parquet(outDir)

  /** Epoch-ordered training shards: materializes q103's epoch-shuffle
    * manifest (`CurationOps.epochShuffleOf`) as the PHYSICAL layout — the
    * write side of the reproducible-training-order story. Same md5 key
    * and nibble-bucket shard as the declared query; rows land in manifest
    * position order inside each `shard=` directory via
    * `repartition(shard).sortWithinPartitions(key)`, so a data loader
    * streaming the files sequentially reads the epoch's global shuffle
    * with ZERO runtime sorting and no window function anywhere on the
    * write path (the q103 scaladoc's claim, made concrete). The `ep_key`
    * column rides along so any reader can audit the order without
    * recomputing hashes. */
  def writeEpochShards(docs: DataFrame, outDir: String, epoch: Int,
      shards: Int = 16, maxRecordsPerFile: Long = 1000000L): Unit =
    docs
      .withColumn("ep_key",
        md5(concat(lit(s"ep$epoch:"), col("doc_id").cast("string"))))
      .withColumn("shard",
        pmod(conv(substring(col("ep_key"), 29, 4), 16, 10).cast("long"),
          lit(shards.toLong)))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("ep_key"), col("doc_id"))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(outDir)
}
