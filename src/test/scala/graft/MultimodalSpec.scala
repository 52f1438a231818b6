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
}
