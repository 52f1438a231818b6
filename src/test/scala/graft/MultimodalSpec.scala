package graft

import java.nio.file.Files

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing specs: pack→decode→features determinism, frame
  * sampling arithmetic, binary round-trip through parquet (E20). */
class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.packMedia(Tables.documents(spark, sfDir))

  test("binary media columns round-trip through parquet unchanged (E20)") {
    val dir = Files.createTempDirectory("graft_media").toString
    media.write.mode("overwrite").parquet(s"$dir/media")
    val back = spark.read.parquet(s"$dir/media")
    assert(back.schema("media").dataType.typeName == "binary")
    val before = media.select("media_id", "media").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val after = back.select("media_id", "media").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(before == after)
  }

  test("binaryFile ingest: glob-pruned file tree -> MediaRow shape -> decode") {
    val dir = Files.createTempDirectory("graft_files")
    val payloads = Map(
      "a.jpg" -> Array[Byte](1, 2, 3, 4),
      "b.wav" -> Array.tabulate(200)(i => (i % 97).toByte),
      "c.mp4" -> Array.tabulate(1024)(i => (i * 7 % 251).toByte),
      "D.PNG" -> Array[Byte](9, 8, 7)) // extension match is case-insensitive
    payloads.foreach { case (n, b) => Files.write(dir.resolve(n), b) }
    Files.write(dir.resolve("notes.txt"), Array[Byte](1)) // glob-excluded
    val got = Multimodal.ingestBinaryFiles(spark, dir.toString)
    // same columns/types as the in-table fixture (nullability flags differ
    // by construction path and are irrelevant to the shared downstream)
    assert(got.schema.map(f => (f.name, f.dataType))
      == media.schema.map(f => (f.name, f.dataType)))
    val rows = got.collect().map(r =>
      (r.getString(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(rows == Set(
      ("image", payloads("a.jpg").toSeq), ("audio", payloads("b.wav").toSeq),
      ("video", payloads("c.mp4").toSeq), ("image", payloads("D.PNG").toSeq)),
      s"unexpected ingest rows: ${rows.map(_._1)}")
    // ids are deterministic and distinct; decode runs unchanged downstream
    assert(got.select("media_id").distinct().count() == 4)
    val feats = Multimodal.extractFeatures(got).collect()
    assert(feats.length == 4)
    val bytesById = got.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](2)).toMap
    feats.foreach(f => assert(f.n_bytes == bytesById(f.media_id).length))
  }

  test("PNG decode reports TRUE planted dimensions through binaryFile ingest") {
    // hand-assembled structurally-valid PNGs (signature, IHDR with real
    // CRC32, deflated IDAT, IEND) — no codec library involved on either
    // side, so the decoded dims are checked against ground truth
    def png(w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      def chunk(typ: String, data: Array[Byte]): Unit = {
        out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array())
        val tb = typ.getBytes("US-ASCII")
        out.write(tb); out.write(data)
        val crc = new java.util.zip.CRC32()
        crc.update(tb); crc.update(data)
        out.write(java.nio.ByteBuffer.allocate(4)
          .putInt(crc.getValue.toInt).array())
      }
      chunk("IHDR", java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array())
      val raw = new Array[Byte](h * (1 + w * 3)) // zero RGB rows + filter byte
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val n = d.deflate(buf); d.end()
      chunk("IDAT", buf.take(n))
      chunk("IEND", Array.empty)
      out.toByteArray
    }
    val dir = Files.createTempDirectory("graft_png")
    val planted = Map("a.png" -> (640, 480), "b.PNG" -> (16, 16),
      "tiny.png" -> (1, 1))
    planted.foreach { case (name, (w, h)) =>
      Files.write(dir.resolve(name), png(w, h)) }
    Files.write(dir.resolve("fake.png"), Array[Byte](9, 8, 7)) // not a PNG
    val got = Multimodal.ingestBinaryFiles(spark, dir.toString)
    val pathById = got
      .select(col("media_id"), input_file_name()) // ids are path hashes
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val feats = Multimodal.extractFeatures(got).collect()
    assert(feats.length == 4)
    val dims = feats.map(f =>
      pathById(f.media_id).split('/').last -> ((f.width, f.height))).toMap
    planted.foreach { case (name, wh) =>
      assert(dims(name) == wh, s"$name decoded ${dims(name)}, planted $wh") }
    // malformed bytes degrade to the stub path, never throw
    assert(dims("fake.png") == ((0, 0)))
    // direct unit coverage of the rejection branches
    assert(Multimodal.pngDimensions(png(7, 3)).contains((7, 3)))
    assert(Multimodal.pngDimensions(Array.empty[Byte]).isEmpty)
    assert(Multimodal.pngDimensions(png(7, 3).take(20)).isEmpty)
    val zeroW = png(0, 3) // IHDR parses but dimensions are invalid
    assert(Multimodal.pngDimensions(zeroW).isEmpty)
  }

  test("JPEG decode reports TRUE planted dimensions (SOF0 + SOF2), degrades on junk") {
    // hand-assembled structurally-valid JPEG prefixes per ITU-T T.81:
    // SOI, APP0/JFIF, a comment, optional RST-style standalone noise,
    // then the SOFn frame header carrying the planted dimensions —
    // ground truth on both sides, no codec library involved
    def seg(marker: Int, data: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        ((data.length + 2) >> 8).toByte, ((data.length + 2) & 0xff).toByte) ++
        data
    def jpeg(w: Int, h: Int, sof: Int): Array[Byte] = {
      val jfif = "JFIF".getBytes("US-ASCII") ++
        Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
      val sofData = Array[Byte](8, // precision
        (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte,
        3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1) // 3 components
      Array(0xff.toByte, 0xd8.toByte) ++ // SOI
        seg(0xe0, jfif) ++ // APP0
        seg(0xfe, "planted".getBytes("US-ASCII")) ++ // COM
        Array(0xff.toByte, 0x01.toByte) ++ // TEM standalone, no length
        seg(sof, sofData) ++
        seg(0xda, Array[Byte](1, 1, 0, 0, 0x3f, 0)) // SOS, then junk "scan"
    }
    assert(Multimodal.jpegDimensions(jpeg(640, 480, 0xc0)).contains((640, 480)),
      "baseline SOF0 dimensions")
    assert(Multimodal.jpegDimensions(jpeg(31, 17, 0xc2)).contains((31, 17)),
      "progressive SOF2 dimensions")
    assert(Multimodal.jpegDimensions(jpeg(1, 1, 0xc1)).contains((1, 1)),
      "extended-sequential SOF1 dimensions")
    // rejection branches: junk, truncation before SOF, SOS-before-SOF,
    // a DHT (C4) segment must NOT be mistaken for a frame header
    assert(Multimodal.jpegDimensions(Array[Byte](9, 8, 7)).isEmpty)
    assert(Multimodal.jpegDimensions(Array.empty[Byte]).isEmpty)
    assert(Multimodal.jpegDimensions(jpeg(640, 480, 0xc0).take(8)).isEmpty)
    val dhtOnly = Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xc4, Array.fill[Byte](20)(1)) ++
      seg(0xda, Array[Byte](1))
    assert(Multimodal.jpegDimensions(dhtOnly).isEmpty,
      "DHT C4 is not a frame header")
    // end-to-end: a planted .jpg flows through binaryFile ingest ->
    // extractFeatures with its true dimensions, same as the PNG bar
    val dir = Files.createTempDirectory("graft_jpg")
    Files.write(dir.resolve("x.jpg"), jpeg(320, 200, 0xc0))
    Files.write(dir.resolve("p.JPG"), jpeg(99, 44, 0xc2))
    val feats = Multimodal.extractFeatures(
      Multimodal.ingestBinaryFiles(spark, dir.toString)).collect()
    assert(feats.map(f => (f.width, f.height)).toSet == Set((320, 200), (99, 44)),
      s"planted JPEG dims lost in the pipeline: ${feats.toSeq}")
  }

  test("WAV decode reports TRUE planted audio metadata, degrades on junk") {
    // hand-assembled canonical RIFF/WAVE bytes: RIFF header, a JUNK chunk
    // (odd size, exercising word alignment), fmt , data — ground truth on
    // both sides, no codec library involved
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def wav(channels: Int, rate: Int, bits: Int, nSamples: Int,
        formatTag: Int = 1): Array[Byte] = {
      val align = channels * bits / 8
      val dataSize = nSamples * align
      val junk = "JUNK".getBytes("US-ASCII") ++ le32(3) ++
        Array[Byte](1, 2, 3, 0) // 3 data bytes + 1 alignment pad
      val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
        le16(formatTag) ++ le16(channels) ++ le32(rate) ++
        le32(rate * align) ++ le16(align) ++ le16(bits)
      val data = "data".getBytes("US-ASCII") ++ le32(dataSize) ++
        Array.tabulate(dataSize)(i => (i % 251).toByte)
      val body = "WAVE".getBytes("US-ASCII") ++ junk ++ fmt ++ data
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    assert(Multimodal.wavInfo(wav(2, 16000, 16, 1000))
      .contains(Multimodal.WavInfo(2, 16000, 16, 1000L)),
      "stereo 16-bit PCM: channels/rate/bits/sample count")
    assert(Multimodal.wavInfo(wav(1, 44100, 8, 77))
      .contains(Multimodal.WavInfo(1, 44100, 8, 77L)), "mono 8-bit PCM")
    assert(Multimodal.wavInfo(wav(2, 48000, 32, 10, formatTag = 3))
      .contains(Multimodal.WavInfo(2, 48000, 32, 10L)), "IEEE-float fmt")
    // rejection branches: junk, truncation, compressed format tag
    assert(Multimodal.wavInfo(Array[Byte](9, 8, 7)).isEmpty)
    assert(Multimodal.wavInfo(Array.empty[Byte]).isEmpty)
    assert(Multimodal.wavInfo(wav(2, 16000, 16, 1000).take(30)).isEmpty)
    assert(Multimodal.wavInfo(wav(1, 8000, 16, 10, formatTag = 0x55)).isEmpty,
      "MP3-in-WAV (format tag 0x55) is not a parseable PCM header")
    // streamed-WAV sentinel: pipe writers (ffmpeg/sox) stamp data size
    // 0xFFFFFFFF when the length is unknown at header time — must
    // degrade to the stub path, not report ~1e9 frames
    val streamed = wav(2, 16000, 16, 10)
    val dataAt = streamed.indexOfSlice("data".getBytes("US-ASCII"))
    (0 until 4).foreach(j => streamed(dataAt + 4 + j) = 0xff.toByte)
    assert(Multimodal.wavInfo(streamed).isEmpty,
      "unknown-length data sentinel must not parse as a frame count")
    // end-to-end: planted .wav files flow through binaryFile ingest ->
    // extractFeatures with true sample counts, rates and durations
    val dir = Files.createTempDirectory("graft_wav")
    Files.write(dir.resolve("a.wav"), wav(2, 16000, 16, 8000)) // 500 ms
    Files.write(dir.resolve("b.WAV"), wav(1, 8000, 16, 2000)) // 250 ms
    Files.write(dir.resolve("junk.wav"), Array.tabulate(200)(_.toByte))
    val feats = Multimodal.extractFeatures(
      Multimodal.ingestBinaryFiles(spark, dir.toString)).collect()
    assert(feats.map(f => (f.n_frames, f.sample_rate, f.duration_ms)).toSet
      == Set((8000, 16000, 500L), (2000, 8000, 250L), (200 / 64, 0, 0L)),
      s"planted WAV metadata lost in the pipeline: ${feats.toSeq}")
  }

  test("MP4 decode reports TRUE planted duration/tracks, degrades on junk") {
    // hand-assembled ISO-BMFF boxes per ISO/IEC 14496-12: ftyp, free,
    // moov(mvhd + traks), mdat — ground truth on both sides
    def be32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    def be64(v: Long) = java.nio.ByteBuffer.allocate(8).putLong(v).array()
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8) ++ typ.getBytes("US-ASCII") ++ body
    def mp4(timescale: Int, duration: Long, traks: Int,
        mvhdV1: Boolean = false): Array[Byte] = {
      val mvhd =
        if (mvhdV1) box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0)
          ++ be32(timescale) ++ be64(duration) ++ Array.fill[Byte](80)(0))
        else box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0)
          ++ be32(timescale) ++ be32(duration.toInt) ++ Array.fill[Byte](80)(0))
      val trakBoxes = Array.fill(traks)(
        box("trak", box("tkhd", Array.fill[Byte](84)(0)))).flatten
      box("ftyp", "isom".getBytes ++ be32(512) ++ "isomiso2".getBytes) ++
        box("free", Array.fill[Byte](5)(7)) ++
        box("moov", mvhd ++ trakBoxes) ++
        box("mdat", Array.tabulate(64)(_.toByte))
    }
    assert(Multimodal.mp4Info(mp4(600, 1200L, 2)).contains((600, 2000L, 2)),
      "v0 mvhd: timescale 600, duration 1200 units -> 2000 ms, 2 tracks")
    assert(Multimodal.mp4Info(mp4(90000, 90000L * 63, 1, mvhdV1 = true))
      .contains((90000, 63000L, 1)), "v1 mvhd 64-bit duration")
    // rejection branches: junk, no moov, truncated box walk
    assert(Multimodal.mp4Info(Array[Byte](9, 8, 7)).isEmpty)
    assert(Multimodal.mp4Info(Array.empty[Byte]).isEmpty)
    assert(Multimodal.mp4Info(
      box("ftyp", "isom".getBytes ++ be32(512))).isEmpty, "no moov")
    assert(Multimodal.mp4Info(mp4(600, 1200L, 2).take(40)).isEmpty,
      "truncated moov walk degrades, never throws")
    // fragmented-MP4 sentinel (all-ones duration = "unknown, see
    // mehd/moof") and hostile v1 durations that would overflow *1000
    assert(Multimodal.mp4Info(mp4(600, 0xffffffffL, 1)).isEmpty,
      "v0 all-ones duration is the unknown sentinel, not ~82 days")
    assert(Multimodal.mp4Info(mp4(600, -1L, 1, mvhdV1 = true)).isEmpty,
      "v1 all-ones (negative) duration rejected")
    assert(Multimodal.mp4Info(
      mp4(600, Long.MaxValue / 500L, 1, mvhdV1 = true)).isEmpty,
      "v1 duration that would overflow duration_ms rejected")
    // end-to-end: planted .mp4 flows through binaryFile ingest ->
    // extractFeatures with its true duration, same as the image bar
    val dir = Files.createTempDirectory("graft_mp4")
    Files.write(dir.resolve("a.mp4"), mp4(1000, 2500L, 1))
    Files.write(dir.resolve("junk.mp4"), Array.tabulate(512)(_.toByte))
    val feats = Multimodal.extractFeatures(
      Multimodal.ingestBinaryFiles(spark, dir.toString)).collect()
    assert(feats.map(f => f.duration_ms).toSet == Set(2500L, 0L),
      s"planted MP4 duration lost in the pipeline: ${feats.toSeq}")
  }

  test("stub decode is deterministic and byte-faithful") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id).toSeq
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id).toSeq
    assert(f1 == f2)
    // n_bytes must equal the true payload size
    val sizes = media.select(col("media_id"), length(col("media")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    f1.foreach(f => assert(f.n_bytes == sizes(f.media_id)))
    // mean_byte of ASCII text is within the printable range
    f1.foreach(f => assert(f.mean_byte > 32.0 && f.mean_byte < 127.0))
  }

  test("frame sampling slices the expected frames") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 256, everyK = 4)
    val perMedia = frames.groupBy("media_id")
      .agg(count(lit(1)).as("n"), max(col("frame_idx")).as("max_idx"))
      .collect()
    assert(perMedia.nonEmpty)
    perMedia.foreach { r =>
      assert(r.getLong(1) >= 1) // at least frame 0 sampled
      assert(r.getInt(2) % 4 == 0, "sampled indices step by 4")
    }
    // only video rows produce frames
    val kinds = frames.join(media, "media_id").select("kind").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(kinds == Seq("video"))
  }

  test("resize transforms only image metadata") {
    val resized = Multimodal.resizeMeta(media, maxDim = 64)
    val bad = resized.filter(
      col("kind") === "image" && greatest(col("width"), col("height")) > 64)
    assert(bad.count() == 0)
    val untouched = resized.filter(col("kind") =!= "image")
      .select("media_id", "width", "height").collect().toSet
    val orig = media.filter(col("kind") =!= "image")
      .select("media_id", "width", "height").collect().toSet
    assert(untouched == orig)
  }

  test("resize preserves aspect ratio; extreme ratios clamp to 1, unknown dims stay 0") {
    import spark.implicits._
    val m = Seq(
      (1L, "image", 2000, 1000), // landscape: the withColumn-order trap
      (2L, "image", 1000, 2000), // portrait
      (3L, "image", 1, 200), // extreme ratio: floor would give width 0
      (4L, "image", 0, 0), // undecoded: passes through
      (5L, "image", 50, 25)) // already under maxDim: untouched
      .toDF("media_id", "kind", "width", "height")
      .withColumn("media", lit(Array[Byte](1)))
      .withColumn("sample_rate", lit(0))
    val got = Multimodal.resizeMeta(m, maxDim = 100)
      .select("media_id", "width", "height").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got(1L) == ((100, 50)),
      s"landscape must scale BOTH dims by the original ratio: ${got(1L)}")
    assert(got(2L) == ((50, 100)), s"portrait: ${got(2L)}")
    assert(got(3L) == ((1, 100)),
      s"a known nonzero dim clamps to >= 1, never 0: ${got(3L)}")
    assert(got(4L) == ((0, 0)), "undecoded rows pass through unchanged")
    assert(got(5L) == ((50, 25)), "already-small images untouched")
  }

  test("binaryFile ingest recurses nested trees and takes .jpeg") {
    val dir = Files.createTempDirectory("graft_tree")
    val nested = dir.resolve("2024").resolve("cam1")
    Files.createDirectories(nested)
    Files.write(nested.resolve("a.jpeg"), Array[Byte](1, 2))
    Files.write(nested.resolve("b.JPEG"), Array[Byte](3))
    Files.write(dir.resolve("top.png"), Array[Byte](4))
    // MIXED case (title-cased by some export tools): the per-character
    // glob classes must list these too — the old lower/upper alternation
    // silently skipped them at listing time
    Files.write(nested.resolve("c.Jpg"), Array[Byte](5))
    Files.write(dir.resolve("clip.Mp4"), Array[Byte](6))
    val rows = Multimodal.ingestBinaryFiles(spark, dir.toString)
      .select("kind").collect().map(_.getString(0)).toSeq
    assert(rows.sorted == Seq("image", "image", "image", "image", "video"),
      s"nested + mixed-case files must all ingest: $rows")
    // the collision audit over a healthy tree is empty (distinct paths
    // hashing to one id would surface here)
    assert(Multimodal.idCollisions(spark, dir.toString).isEmpty,
      "no 64-bit id collisions expected on a 5-file tree")
  }
}
