package graft.ingest

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.spark.sql.SparkSession

import graft.ingest.ParquetIngest.SpatialInfo

/** GeoParquet `geo` footer metadata on WRITE (SURVEY.md §2.1 O21).
  *
  * The reference's fixture writer emits true GeoParquet — `gdf.to_parquet`
  * stamps the `geo` key-value footer (`generate_data.py:21`), which its own
  * probe then reads back (`app.py:72-77`). Spark's parquet writer has no
  * user hook for file-level key-value metadata, so we post-stamp: after the
  * distributed write commits, each part file's footer is rewritten with the
  * `geo` key added. The rewrite is a byte-level row-group copy
  * (`ParquetFileWriter.appendFile`) — no page decode, no re-encode, cost is
  * one sequential copy of the file — and runs as one Spark task per file,
  * so a 10k-file dataset stamps with 10k-way parallelism, not a driver loop.
  *
  * With this, a write→probe round-trip detects the geometry column from the
  * footer itself (O3 path), not the `geometry`-name fallback (O10): rename
  * the column and detection survives, exactly like the reference.
  */
object GeoParquetFooter {

  private val GeoKey = "geo"

  /** GeoParquet 1.0.0 metadata JSON for one primary geometry column.
    * CRS: an `authority:code` string (our probe's normal form) becomes the
    * minimal PROJJSON identifier object — the part both our own
    * [[ParquetIngest.parseGeoMetadata]] and geopandas' reader key on;
    * anything else rides through as a raw string. */
  def geoJson(si: SpatialInfo): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", "1.0.0")
    root.put("primary_column", si.geometryColumn)
    val colNode = root.putObject("columns").putObject(si.geometryColumn)
    colNode.put("encoding", si.encoding)
    colNode.putArray("geometry_types")
    si.crs match {
      case AuthorityCode(auth, code) =>
        val id = colNode.putObject("crs").putObject("id")
        id.put("authority", auth)
        id.put("code", code)
      case other => colNode.put("crs", other)
    }
    mapper.writeValueAsString(root)
  }

  private object AuthorityCode {
    def unapply(crs: String): Option[(String, Int)] = crs.split(':') match {
      // Try, not bare toInt: an all-digits code beyond Int range would
      // throw out of the extractor AFTER the parquet data was written
      // (round-9 review); it falls through to the raw-string crs branch
      // instead, exactly like the Postgis twin's guarded parse
      case Array(auth, code) if code.forall(_.isDigit) && code.nonEmpty =>
        scala.util.Try(code.toInt).toOption.map((auth, _))
      case _ => None
    }
  }

  /** Stamp the `geo` key into every part file under `dir` (or the single
    * file at `dir`). Idempotent: re-stamping overwrites the key, so append
    * writes may re-stamp previously stamped files safely. */
  def attach(spark: SparkSession, dir: String, si: SpatialInfo): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    val qRoot = fs.makeQualified(root)
    // hidden check must walk EVERY path component below the root, not
    // just the leaf: a crashed earlier write's dir/_temporary/.../part-*
    // has a plain leaf name, and stamping those orphans wastes whole-file
    // copies on data no reader will ever use (and fails the job if one
    // is corrupt). This mirrors what Spark's own reader skips.
    // ONE hidden-path rule with the probe (ParquetIngest.hiddenBelow):
    // the two previously carried divergent hand-rolled copies. The
    // extension filter is gone for the same probe==read reason — a
    // reader consumes every non-hidden file, so every non-hidden file
    // must carry the geo footer.
    def hiddenUnder(p: Path): Boolean =
      ParquetIngest.hiddenBelow(qRoot.toString, p)
    val files: Seq[String] =
      if (fs.getFileStatus(root).isDirectory) {
        val it = fs.listFiles(root, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next().getPath
          if (!hiddenUnder(f)) buf += f.toString
        }
        buf.toSeq
      } else Seq(root.toString)
    if (files.isEmpty) return
    // Hadoop Configuration is not serializable; ship it as entries and
    // rebuild per task (iteration yields defaults + overrides).
    val confEntries = hconf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val json = geoJson(si)
    spark.sparkContext
      .parallelize(files, math.min(files.size, 256))
      .foreach { file =>
        val conf = new Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        stampFile(conf, new Path(file), json)
      }
  }

  /** Rewrite one parquet file with `geo` added to its key-value footer.
    * Row groups are copied byte-for-byte (no decode); existing key-value
    * entries (e.g. Spark's schema key) are preserved.
    *
    * Loss-proof swap under CONCURRENT attempts (speculation, zombie
    * retries): both the stamped temp AND the backup are attempt-unique,
    * so no attempt can ever delete another attempt's backup — the hole
    * in the earlier shared-backup-name protocol, where a loser's cleanup
    * could drop the only copy of the original mid-swap. Protocol: write
    * the stamped copy to a unique temp; rename original → MY backup (a
    * failure here means a concurrent attempt holds the swap — its
    * stamped output is byte-equivalent, so discard mine and return);
    * rename temp into place (if the slot was refilled by the concurrent
    * winner, likewise discard mine); delete MY backup last. At every
    * instant the committed row data exists under the original name or
    * under some attempt's backup, and recovery (file absent on entry)
    * restores from whichever backup survives. Crashed attempts can leave
    * hidden `.geo.*.{bak,tmp}` residue; readers ignore dot-files, and a
    * later re-stamp proceeds regardless. */
  private[graft] def stampFile(conf: Configuration, file: Path,
      geoJson: String): Unit = {
    val fs = file.getFileSystem(conf)
    val bakPrefix = s".${file.getName}.geo."
    def backups(): Seq[Path] =
      fs.listStatus(file.getParent).toSeq.map(_.getPath)
        .filter(p => p.getName.startsWith(bakPrefix) &&
          p.getName.endsWith(".bak"))
    // Recover from a prior attempt that crashed between the two renames:
    // the original was moved aside but the stamped temp never landed.
    if (!fs.exists(file)) {
      val bs = backups()
      if (bs.isEmpty || !fs.rename(bs.head, file))
        throw new java.io.IOException(
          s"geo footer stamp: $file missing and no backup recoverable")
    }
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    val (schema, existingKv) =
      try {
        val md = reader.getFooter.getFileMetaData
        (md.getSchema, md.getKeyValueMetaData)
      } finally reader.close()
    val merged = new java.util.HashMap[String, String](existingKv)
    merged.put(GeoKey, geoJson)
    val attempt = java.util.UUID.randomUUID().toString.substring(0, 8)
    val tmp = new Path(file.getParent, s"$bakPrefix$attempt.tmp")
    val backup = new Path(file.getParent, s"$bakPrefix$attempt.bak")
    val writer = new ParquetFileWriter(
      HadoopOutputFile.fromPath(tmp, conf), schema,
      ParquetFileWriter.Mode.OVERWRITE,
      org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE.toLong,
      org.apache.parquet.hadoop.ParquetWriter.MAX_PADDING_SIZE_DEFAULT)
    writer.start()
    writer.appendFile(HadoopInputFile.fromPath(file, conf))
    writer.end(merged)
    if (!fs.rename(file, backup)) {
      // The optimistic reading of this failure is "a concurrent attempt
      // holds the swap — its stamped output is byte-equivalent, discard
      // mine". But rename also fails for permissions, quota, or
      // transient FS errors, and returning success then leaves the file
      // UNSTAMPED with no signal (round-8 advisor). Verify the assumed
      // winner is real: a concurrent swap completes in milliseconds, so
      // wait briefly for the file to reappear carrying OUR geo value;
      // if it never does, this was a genuine rename failure — throw.
      fs.delete(tmp, false)
      if (!awaitStamped(fs, conf, file, geoJson))
        throw new java.io.IOException(
          s"geo footer stamp: rename $file -> $backup failed and no " +
            "concurrent stamped copy appeared — genuine rename failure " +
            "(permissions/quota/FS error); geo metadata NOT attached")
      return
    }
    if (!fs.rename(tmp, file)) {
      if (fs.exists(file)) {
        // the slot was refilled while we held the backup — only a
        // concurrent winner's stamped copy can do that; verify before
        // discarding ours (same advisor rule as above)
        if (!awaitStamped(fs, conf, file, geoJson))
          throw new java.io.IOException(
            s"geo footer stamp: $file refilled by a copy that does not " +
              "carry the geo key — refusing to discard this attempt's " +
              s"stamp (original preserved at $backup)")
        fs.delete(tmp, false)
        fs.delete(backup, false)
        return
      }
      fs.rename(backup, file) // roll back; data was never at risk
      throw new java.io.IOException(
        s"geo footer stamp: rename $tmp -> $file failed")
    }
    fs.delete(backup, false)
  }

  /** True once `file` exists and its footer carries EXACTLY `geoJson`
    * under the geo key (a concurrent attempt stamps a byte-equivalent
    * value — anything else is not a winner). Polls up to ~5 s: a
    * concurrent swap's window between its two renames is milliseconds,
    * so a miss after 5 s means the assumed winner never existed. */
  private def awaitStamped(fs: org.apache.hadoop.fs.FileSystem,
      conf: Configuration, file: Path, geoJson: String): Boolean = {
    var waited = 0L
    while (waited <= 5000L) {
      val stamped =
        try {
          if (!fs.exists(file)) false
          else {
            val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
            try geoJson == r.getFooter.getFileMetaData
              .getKeyValueMetaData.get(GeoKey)
            finally r.close()
          }
        } catch { case _: java.io.IOException => false } // mid-swap vanish
      if (stamped) return true
      Thread.sleep(100L)
      waited += 100L
    }
    false
  }
}
