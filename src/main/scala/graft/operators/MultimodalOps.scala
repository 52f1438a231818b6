package graft.operators

import graft.{GraftSession, Op, OpCatalog, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal pipeline operators (north-star E20): binary media columns
  * with typed metadata, stubbed decode, frame sampling. Deterministic but
  * hash/byte-level — not DuckDB-expressible; `MultimodalSpec` is the
  * correctness gate, the driver records rows-only checks.
  */
object MultimodalOps extends OpCatalog {

  // ---------------------------------------------------------------- q53
  /** Pack → decode(stub) → aggregate per modality: counts, payload bytes,
    * mean decoded brightness, frame totals. */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val media = Multimodal.packMedia(Tables.documents(spark, sfDir))
    Multimodal.extractFeatures(media).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("mean_byte")), 4).as("avg_brightness"),
        sum(col("n_frames")).cast("long").as("total_frames"))
      .orderBy(col("kind"))
  }

  // ---------------------------------------------------------------- q54
  /** Frame sampling over video payloads: every 4th 256-byte frame,
    * counted per media id (top 20 by id for a bounded result). */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val media = Multimodal.packMedia(Tables.documents(spark, sfDir))
    Multimodal.sampleFrames(media)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(length(col("frame"))).cast("long").as("sampled_bytes"))
      .orderBy(col("media_id"))
      .limit(20)
  }

  override val ops: Seq[Op] = Seq(
    Op("q53_media_features", mediaFeatures, None,
      "multimodal pack→decode(stub)→per-kind feature aggregation"),
    Op("q54_frame_sample", frameSample, None,
      "video frame sampling: every 4th 256-byte frame slice"))
}
