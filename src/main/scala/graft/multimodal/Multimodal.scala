package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north-star): image/audio/video as opaque
  * `binary` columns with typed metadata, decode / feature-extract / resize /
  * frame-sample as per-partition batch transforms.
  *
  * The Spark-side plumbing here is real and tested — schema, partitioning,
  * typed `Dataset` + `mapPartitions` batch shape, metadata dispatch — while
  * the codec itself is a clearly-marked deterministic STUB (`decodeStub`):
  * this container has no image/audio libraries, so the stub parses our own
  * fake header instead of calling libjpeg/ffmpeg. A real deployment swaps
  * ONE function (`decodeStub`) for a JNI/library call; everything around it
  * is unchanged. The per-partition iterator shape is exactly how a native
  * decoder wants to be fed (batch init/teardown amortized per partition,
  * not per row).
  */
object Multimodal {

  /** Typed media row: id + opaque payload + metadata (the dispatch key —
    * reference O6's dtype dispatch, `app.py:136,145-152`, generalized). */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      media: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      // stub "decoded" features — deterministic functions of the payload
      mean_byte: Double,
      checksum: Long,
      n_frames: Int)

  /** Build a deterministic fake media corpus from the documents table:
    * payload = UTF-8 bytes of the text, metadata derived from stable
    * column arithmetic. Exercises E20 (binary + nested columns surviving
    * scan→transform→sink). */
  def packMedia(documents: DataFrame): DataFrame = {
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("media"),
      (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) === 1, 16000).otherwise(0)
        .cast("int").as("sample_rate"))
  }

  /** Ingest raw media FILES via Spark's `binaryFile` source — the shape
    * 100 TB of media actually arrives in (a directory tree of image/audio/
    * video files), vs [[packMedia]]'s in-table fixture. The source lists
    * files in parallel, carries (path, modificationTime, length, content),
    * prunes with `pathGlobFilter` at listing time (skipped files are never
    * opened), and assigns files to tasks by size buckets — so ingest
    * parallelism scales with file count, no driver loop. Output is the same
    * MediaRow schema as packMedia: kind dispatched on file extension,
    * media_id a deterministic content-path hash, pixel/rate metadata zero
    * until the decode stage ([[extractFeatures]]) fills it — so the whole
    * downstream pipeline (features/frames/resize) runs unchanged on
    * file-ingested corpora. */
  def ingestBinaryFiles(spark: SparkSession, dir: String): DataFrame = {
    val kind = element_at(
      map(lit("jpg"), lit("image"), lit("png"), lit("image"),
        lit("wav"), lit("audio"), lit("mp4"), lit("video")),
      lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)))
    spark.read.format("binaryFile")
      // listing-time prune; Hadoop globs are case-sensitive, so both cases
      // are spelled out (media trees mix them)
      .option("pathGlobFilter", "*.{jpg,png,wav,mp4,JPG,PNG,WAV,MP4}")
      .load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        kind.as("kind"),
        col("content").as("media"),
        lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"))
  }

  /** STUB decoder — stands in for libjpeg/libsndfile/ffmpeg, which are
    * not in this container. Deterministic features of the raw bytes; a real
    * build replaces only this function body. */
  private[multimodal] def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.media
    var sum = 0L
    var checksum = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      sum += (bytes(i) & 0xff)
      checksum = checksum * 31L + bytes(i)
      i += 1
    }
    val meanByte =
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    val frames = row.kind match {
      case "video" => math.max(1, bytes.length / 256) // fake 256-byte frames
      case "audio" => math.max(1, bytes.length / 64)
      case _       => 1
    }
    MediaFeatures(row.media_id, row.kind, bytes.length.toLong, meanByte,
      checksum, frames)
  }

  /** Feature extraction over the media corpus: typed per-partition batches.
    * A real decoder initializes its native context once per partition in
    * the `mapPartitions` closure — the batch shape is the point. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init for a native decoder would go here
      rows.map(decodeStub)
    }
  }

  /** Frame sampling for video payloads: every k-th fixed-size frame slice,
    * exploded to one row per sampled frame. Pure column ops — no UDF. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256,
      everyK: Int = 4): DataFrame = {
    media.filter(col("kind") === "video")
      .withColumn("n_frames",
        greatest(floor(length(col("media")) / frameBytes), lit(1)).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(media, frame_idx * $frameBytes + 1, $frameBytes)")
          .as("frame"))
  }

  /** "Resize": metadata-level transform (the real pixel work lives behind
    * the same stub boundary as decode). Demonstrates metadata dispatch —
    * only image rows change. */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height")))
    media.withColumn("width",
        when(col("kind") === "image", floor(col("width") * scale).cast("int"))
          .otherwise(col("width")))
      .withColumn("height",
        when(col("kind") === "image", floor(col("height") * scale).cast("int"))
          .otherwise(col("height")))
  }
}
