package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north-star): image/audio/video as opaque
  * `binary` columns with typed metadata, decode / feature-extract / resize /
  * frame-sample as per-partition batch transforms.
  *
  * The Spark-side plumbing here is real and tested — schema, partitioning,
  * typed `Dataset` + `mapPartitions` batch shape, metadata dispatch — and
  * the decode dispatch has two REAL branches: PNG header decode
  * ([[pngDimensions]], pure JVM against the public W3C spec) and JPEG
  * frame-header decode ([[jpegDimensions]], SOFn marker scan per ITU-T
  * T.81), both reporting true image dimensions. The remaining formats
  * are a clearly-marked deterministic STUB (`decodeStub`): this
  * container has no audio/video libraries, so the stub derives features
  * from raw bytes instead of calling ffmpeg. A real deployment extends
  * the same dispatch
  * with JNI/library calls; everything around it is unchanged. The
  * per-partition iterator shape is exactly how a native decoder wants to
  * be fed (batch init/teardown amortized per partition, not per row).
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
      n_frames: Int,
      // REAL decoded dimensions for payloads the header parsers understand
      // (PNG IHDR + JPEG SOFn); (0, 0) for everything still behind the stub
      width: Int,
      height: Int)

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

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** REAL (header-level) PNG decode — pure JVM, no codec library: the
    * 8-byte signature then the mandatory first chunk, IHDR (13-byte data:
    * 4-byte big-endian width, 4-byte big-endian height, then bit depth /
    * color type / compression / filter / interlace), per the public W3C
    * PNG specification §5.2/§11.2.2. Returns None for anything that is
    * not a well-formed PNG prefix — malformed bytes degrade to the stub
    * path, never throw. */
  private[graft] def pngDimensions(bytes: Array[Byte]): Option[(Int, Int)] = {
    def be32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    if (bytes.length < 24) None
    else if ((0 until 8).exists(i => bytes(i) != PngSignature(i))) None
    else if (be32(8) != 13) None // IHDR data length is always 13
    else if (bytes(12) != 'I' || bytes(13) != 'H' ||
      bytes(14) != 'D' || bytes(15) != 'R') None
    else {
      val w = be32(16)
      val h = be32(20)
      if (w <= 0 || h <= 0) None else Some((w, h))
    }
  }

  /** REAL (header-level) JPEG decode — pure JVM, no codec library: after
    * the SOI marker (FFD8), JPEG is a sequence of FF-prefixed segments,
    * each carrying a 2-byte big-endian length (self-inclusive); the
    * frame header SOFn (FFC0 baseline, FFC2 progressive, and the other
    * SOF variants — everything in C0–CF except DHT C4 / JPG C8 / DAC CC)
    * holds precision(1), height(2 BE), width(2 BE) per ITU-T T.81
    * §B.2.2. The scan walks segments until the first SOF, skipping
    * standalone markers (TEM, RSTn) and FF fill bytes; EOI/SOS before
    * any SOF, a desynced stream, or a truncated header all degrade to
    * None — the stub path, never a throw. */
  private[graft] def jpegDimensions(bytes: Array[Byte]): Option[(Int, Int)] = {
    def u8(o: Int): Int = bytes(o) & 0xff
    def be16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
    def isSof(m: Int): Boolean =
      m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
    var result: Option[(Int, Int)] = None
    var done = bytes.length < 4 || u8(0) != 0xff || u8(1) != 0xd8
    var i = 2
    while (!done && i + 3 < bytes.length) {
      if (u8(i) != 0xff) done = true // marker desync: not a JPEG stream
      else {
        var j = i + 1 // skip FF fill bytes before the marker id
        while (j + 1 < bytes.length && u8(j) == 0xff) j += 1
        val marker = u8(j)
        if (marker == 0xd9 || marker == 0xda) done = true // EOI / SOS
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
          i = j + 1 // TEM / RSTn: standalone, no length field
        } else if (j + 2 >= bytes.length) done = true
        else {
          val len = be16(j + 1)
          if (len < 2) done = true
          else if (isSof(marker)) {
            // segment data: [len hi][len lo][precision][h hi][h lo][w hi][w lo]
            if (len >= 7 && j + 7 < bytes.length) {
              val h = be16(j + 4)
              val w = be16(j + 6)
              if (w > 0 && h > 0) result = Some((w, h))
            }
            done = true
          } else i = j + 1 + len
        }
      }
    }
    result
  }

  /** Decoder: the PNG and JPEG branches are REAL header-level decodes
    * ([[pngDimensions]] / [[jpegDimensions]]); other formats remain a
    * deterministic STUB standing in for libsndfile/ffmpeg, which are not
    * in this container. A real build extends the same dispatch with
    * library calls; everything around it is unchanged. */
  private[multimodal] def decodeStub(row: MediaRow): MediaFeatures = {
    // a NULL payload (failed fetch, tombstoned blob) decodes as an empty
    // one — real media corpora carry them, and a decoder NPE fails the
    // whole stage (NullCorpusSpec sweeps exactly this)
    val bytes = if (row.media == null) Array.emptyByteArray else row.media
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
    val (w, h) =
      if (row.kind == "image")
        pngDimensions(bytes).orElse(jpegDimensions(bytes)).getOrElse((0, 0))
      else (0, 0)
    MediaFeatures(row.media_id, row.kind, bytes.length.toLong, meanByte,
      checksum, frames, w, h)
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
