package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north-star): image/audio/video as opaque
  * `binary` columns with typed metadata, decode / feature-extract / resize /
  * frame-sample as per-partition batch transforms.
  *
  * The Spark-side plumbing here is real and tested — schema, partitioning,
  * typed `Dataset` + `mapPartitions` batch shape, metadata dispatch — and
  * the decode dispatch has four REAL header-level branches: PNG IHDR
  * ([[pngDimensions]], W3C spec), JPEG SOFn ([[jpegDimensions]], ITU-T
  * T.81) for true image dimensions, WAV RIFF fmt/data ([[wavInfo]]) for
  * true channel count / sample rate / exact sample-frame count, and
  * MP4 mvhd ([[mp4Info]], ISO/IEC 14496-12) for true duration. What
  * still needs a codec library (pixel data, compressed-audio samples,
  * video frame counts via stts) remains a clearly-marked deterministic
  * STUB (`decodeStub`): this container has no media libraries, so the
  * stub derives those features from raw bytes instead of calling ffmpeg.
  * A real deployment extends the same dispatch
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
      height: Int,
      // REAL decoded audio/video container metadata: WAV fmt/data chunks
      // and MP4 mvhd; 0 for payloads the header parsers don't understand
      sample_rate: Int,
      duration_ms: Long)

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

  /** The media-extension listing glob. Hadoop globs are case-sensitive,
    * so each extension is a per-character [aA] class — covering MIXED
    * case (a.Jpg, b.Mp4) that an all-lower/all-upper alternation
    * silently skipped at listing time (round-9 review); .jpeg is as
    * common as .jpg in the wild. ONE definition for
    * [[ingestBinaryFiles]] and [[idCollisions]]. */
  private val MediaGlob: String =
    "*.{[jJ][pP][gG],[jJ][pP][eE][gG],[pP][nN][gG]," +
      "[wW][aA][vV],[mM][pP]4}"

  /** Ingest raw media FILES via Spark's `binaryFile` source — the shape
    * 100 TB of media actually arrives in (a directory tree of image/audio/
    * video files), vs [[packMedia]]'s in-table fixture. The source lists
    * files in parallel, carries (path, modificationTime, length, content),
    * prunes with `pathGlobFilter` at listing time (skipped files are never
    * opened), and assigns files to tasks by size buckets — so ingest
    * parallelism scales with file count, no driver loop. Output is the same
    * MediaRow schema as packMedia: kind dispatched on file extension,
    * media_id a deterministic hash of the PATH (two mounts of the same
    * file get distinct ids, identical bytes at distinct paths never
    * share one — content-level dedup belongs to the q30-family exact
    * dedup over `media`, not this id), pixel/rate metadata zero
    * until the decode stage ([[extractFeatures]]) fills it — so the whole
    * downstream pipeline (features/frames/resize) runs unchanged on
    * file-ingested corpora. */
  def ingestBinaryFiles(spark: SparkSession, dir: String): DataFrame = {
    val kind = element_at(
      map(lit("jpg"), lit("image"), lit("jpeg"), lit("image"),
        lit("png"), lit("image"),
        lit("wav"), lit("audio"), lit("mp4"), lit("video")),
      lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)))
    spark.read.format("binaryFile")
      // listing-time prune — ONE glob definition ([[MediaGlob]]) shared
      // with the collision audit
      .option("pathGlobFilter", MediaGlob)
      // a media corpus is a TREE (dir/2024/cam1/a.jpg); without this the
      // reader runs partition DISCOVERY over subdirectories instead of
      // listing them, silently returning 0 rows for nested files
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        // deterministic 64-bit id from the path: re-ingest stable, and
        // the id the fixture tables key on. Honest limit: 64-bit
        // birthday math puts P(any collision) ≈ 2.7% at 10⁹ files — at
        // that scale run [[idCollisions]] after ingest (or key on the
        // path itself) before trusting per-id aggregation
        xxhash64(col("path")).as("media_id"),
        kind.as("kind"),
        col("content").as("media"),
        lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"))
  }

  /** Collision audit for [[ingestBinaryFiles]]'s 64-bit path-hash id: media_ids
    * claimed by more than one distinct path under `dir` (empty = safe to
    * key on media_id). Re-lists the tree with the path retained (the
    * ingest schema deliberately matches the fixture tables and carries
    * no path) and projects ONLY the path, so no payload bytes are read —
    * one listing-sized groupBy, cheap next to ingesting the media. */
  def idCollisions(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", MediaGlob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(xxhash64(col("path")).as("media_id"), col("path"))
      .groupBy(col("media_id"))
      .agg(countDistinct(col("path")).as("n_paths"),
        sort_array(collect_set(col("path"))).as("paths"))
      .filter(col("n_paths") > 1)

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

  final case class WavInfo(
      channels: Int, sampleRate: Int, bitsPerSample: Int, nSamples: Long)

  /** REAL (header-level) WAV decode — pure JVM, no codec library: RIFF
    * container (`RIFF` magic, little-endian sizes, `WAVE` form type) per
    * the public RIFF/WAVE spec (Microsoft/IBM 1991, as mirrored by the
    * MultimediaWiki / W3C WAVE notes). Walks the chunk list: `fmt ` gives
    * format tag, channel count, sample rate, block align, bits per
    * sample; `data`'s declared size over block align gives the exact
    * sample-frame count. WAVE_FORMAT_PCM (1), IEEE float (3) and the
    * EXTENSIBLE wrapper (0xFFFE) are accepted; compressed format tags,
    * malformed chunk walks, or a missing fmt/data chunk degrade to None —
    * the stub path, never a throw. Chunks are word-aligned (odd sizes pad
    * one byte), which the walk honors. */
  private[graft] def wavInfo(bytes: Array[Byte]): Option[WavInfo] = {
    def u8(o: Int): Int = bytes(o) & 0xff
    def le16(o: Int): Int = u8(o) | (u8(o + 1) << 8)
    def le32(o: Int): Long =
      (u8(o) | (u8(o + 1) << 8) | (u8(o + 2) << 16)).toLong |
        ((u8(o + 3) & 0xffL) << 24)
    def tag(o: Int): String =
      new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") None
    else {
      var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, align, bits
      var dataSize = -1L
      var i = 12
      var bad = false
      while (!bad && dataSize < 0 && i + 8 <= bytes.length) {
        val id = tag(i)
        val size = le32(i + 4)
        if (id == "fmt " && size >= 16 && i + 8 + 16 <= bytes.length) {
          val formatTag = le16(i + 8)
          // PCM, IEEE float, or the EXTENSIBLE wrapper (real format in
          // the extension's SubFormat GUID — channel/rate/align fields
          // are authoritative either way)
          if (formatTag == 1 || formatTag == 3 || formatTag == 0xfffe)
            fmt = Some((le16(i + 10), le32(i + 12).toInt,
              le16(i + 20), le16(i + 22)))
          else bad = true
        } else if (id == "data") dataSize = size
        if (dataSize < 0) {
          val step = size + (size & 1L) // word alignment
          if (step < 0 || i + 8 + step > Int.MaxValue) bad = true
          else i += 8 + step.toInt
        }
      }
      fmt match {
        // 0xFFFFFFFF data size is the streamed-WAV "length unknown at
        // header time" sentinel (ffmpeg/sox pipe output) — a real frame
        // count cannot be derived, so degrade to the stub path like any
        // other unparseable header rather than reporting ~1e9 frames
        case Some((ch, rate, align, bits))
            if !bad && dataSize >= 0 && dataSize != 0xffffffffL &&
              ch > 0 && rate > 0 && align > 0 =>
          Some(WavInfo(ch, rate, bits, dataSize / align))
        case _ => None
      }
    }
  }

  /** REAL (header-level) MP4/ISO-BMFF decode — pure JVM, no codec
    * library: the box grammar of ISO/IEC 14496-12 (size BE32 + fourcc;
    * size 1 → 64-bit largesize; size 0 → to EOF). Walks the top level for
    * `moov`, then inside it reads `mvhd` (version 0: timescale BE32 at
    * +12, duration BE32 at +16 of the box body; version 1: 64-bit
    * times, timescale at +20, duration BE64 at +24) and counts `trak`
    * boxes. Returns (timescale, duration_ms, n_tracks); anything that is
    * not a well-formed BMFF prefix degrades to None — the stub path,
    * never a throw. */
  private[graft] def mp4Info(bytes: Array[Byte]): Option[(Int, Long, Int)] = {
    def u8(o: Int): Int = bytes(o) & 0xff
    def be32(o: Int): Long =
      ((u8(o).toLong << 24) | (u8(o + 1) << 16) | (u8(o + 2) << 8) | u8(o + 3))
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def tag(o: Int): String =
      new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // walk boxes in [from, until); f gets (type, bodyStart, boxEnd)
    def walk(from: Int, until: Int)(f: (String, Int, Int) => Unit): Boolean = {
      var i = from
      var ok = true
      while (ok && i + 8 <= until) {
        val size32 = be32(i)
        val typ = tag(i + 4)
        val (body, end) =
          if (size32 == 1 && i + 16 <= until) (i + 16, i + be64(i + 8))
          else if (size32 == 0) (i + 8, until.toLong)
          else (i + 8, i + size32)
        if (end < body || end > until) ok = false
        else { f(typ, body, end.toInt); i = end.toInt }
      }
      ok
    }
    if (bytes.length < 16 || !Set("ftyp", "moov", "free", "skip", "mdat",
      "wide", "moof", "styp").contains(tag(4))) None
    else {
      var moov: Option[(Int, Int)] = None
      if (!walk(0, bytes.length) {
        (t, b, e) => if (t == "moov" && moov.isEmpty) moov = Some((b, e))
      }) None
      else moov.flatMap { case (mb, me) =>
        var mvhd: Option[(Int, Long)] = None // timescale, durationUnits
        var traks = 0
        val ok = walk(mb, me) { (t, b, e) =>
          if (t == "trak") traks += 1
          else if (t == "mvhd" && mvhd.isEmpty && b + 4 <= e) {
            val version = u8(b)
            if (version == 0 && b + 20 <= e)
              mvhd = Some((be32(b + 12).toInt, be32(b + 16)))
            else if (version == 1 && b + 32 <= e)
              mvhd = Some((be32(b + 20).toInt, be64(b + 24)))
          }
        }
        mvhd match {
          // all-ones duration is the fragmented-MP4 "unknown" sentinel
          // (the real duration lives in mehd/moof, which needs a
          // demuxer) — degrade to the stub path instead of reporting an
          // ~82-day video; and a hostile version-1 duration must not
          // overflow the *1000 into a negative duration_ms
          case Some((ts, dur)) if ok && ts > 0 && dur >= 0 &&
              dur != 0xffffffffL && dur <= Long.MaxValue / 1000L =>
            Some((ts, dur * 1000L / ts, traks))
          case _ => None
        }
      }
    }
  }

  /** Decoder: the PNG, JPEG, WAV and MP4 branches are REAL header-level
    * decodes ([[pngDimensions]] / [[jpegDimensions]] / [[wavInfo]] /
    * [[mp4Info]]); everything else remains a deterministic STUB standing
    * in for libsndfile/ffmpeg, which are not in this container (notably:
    * video FRAME COUNT needs an stts walk or a real demuxer, so n_frames
    * for video stays the stub estimate even when mvhd duration is real).
    * A real build extends the same dispatch with library calls;
    * everything around it is unchanged. */
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
    val wav = if (row.kind == "audio") wavInfo(bytes) else None
    val mp4 = if (row.kind == "video") mp4Info(bytes) else None
    val frames = row.kind match {
      // real PCM sample-frame count when the WAV header parses
      case "audio" => wav.map(w => math.min(w.nSamples, Int.MaxValue).toInt)
        .getOrElse(math.max(1, bytes.length / 64))
      case "video" => math.max(1, bytes.length / 256) // fake 256-byte frames
      case _       => 1
    }
    val (w, h) =
      if (row.kind == "image")
        pngDimensions(bytes).orElse(jpegDimensions(bytes)).getOrElse((0, 0))
      else (0, 0)
    val sampleRate = wav.map(_.sampleRate).getOrElse(0)
    val durationMs = wav.map(i => i.nSamples * 1000L / i.sampleRate)
      .orElse(mp4.map(_._2)).getOrElse(0L)
    MediaFeatures(row.media_id, row.kind, bytes.length.toLong, meanByte,
      checksum, frames, w, h, sampleRate, durationMs)
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
    * only image rows with KNOWN dimensions change: undecoded rows carry
    * width=height=0 (`ingestBinaryFiles` output, failed header parses)
    * and pass through unchanged by an EXPLICIT guard — the previous form
    * relied on maxDim/0.0 = Infinity collapsing under least(1.0, ·),
    * which happened to give the same answer but read as an accident
    * (and would become an ANSI error if the operands ever turned
    * integral or decimal). */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val known = greatest(col("width"), col("height")) > 0
    val scale = least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height")))
    // BOTH dims must scale against the ORIGINAL columns in one
    // withColumns batch: sequential withColumn calls re-resolved `scale`
    // for the height step against the already-resized width, destroying
    // the aspect ratio of every landscape image (2000x1000 @ maxDim=100
    // came out 100x100, not 100x50). A known nonzero dimension is also
    // clamped to >= 1 the way real resizers do — floor alone can
    // produce a degenerate 0-wide "decoded" image (width=1, height=200
    // @ maxDim=64 -> floor(0.32) = 0).
    def resized(c: String) =
      when(col("kind") === "image" && known && col(c) > 0,
        greatest(lit(1), floor(col(c) * scale)).cast("int"))
        .otherwise(col(c)) // a 0 (unknown) dim stays 0, never invents 1
    media.withColumns(Map(
      "width" -> resized("width"),
      "height" -> resized("height")))
  }
}
