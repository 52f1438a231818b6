package graft.ingest

import scala.jdk.CollectionConverters._
import scala.util.Try

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BinaryType, Metadata, MetadataBuilder}

/** The reference's whole pipeline, Spark-first (SURVEY.md §2.1 O1–O16):
  * probe → scan → spatial-metadata attach → sink with save-mode semantics.
  *
  * Reference mapping (file:line cites into /root/reference):
  *  - `probe`: footer-only metadata read — `num_rows`/`num_row_groups`
  *    (O2, `app.py:91,100`) and GeoParquet `geo` footer sniff for geometry
  *    column + CRS (O3, `app.py:69-84`, which burns a 1-row data read; the
  *    footer key-value route reads no data pages at all).
  *  - `read`: scan (O1, `app.py:88,111` 50k-row batch loop — subsumed by
  *    Spark's vectorized, splittable parquet scan) + spatial attach
  *    (O8/O9, `app.py:154-164`) + `geometry`-name fallback (O10,
  *    `app.py:169-175`) + EPSG:4326 CRS default (`app.py:163-164`).
  *  - `ingest`: sinks (O12/O13 `app.py:181,183`, O21) behind one trait;
  *    save-mode mapping fail/replace/append → SaveMode (O14, `app.py:21,
  *    109,178,186` — the first-chunk-then-append trick dissolves into
  *    Spark's create-once-then-parallel-append JDBC protocol); DDL
  *    pre-action (O11, `app.py:58-61`); row-count observation (O15,
  *    `app.py:99-106,185-193`) via `observe()` metrics, not a collect.
  */
object ParquetIngest {

  /** Spatial column info sniffed from GeoParquet metadata (or name
    * fallback). `crs` defaults to EPSG:4326 like the reference. */
  final case class SpatialInfo(
      geometryColumn: String,
      crs: String,
      encoding: String,
      fromFallback: Boolean)

  /** Footer-only probe result (no data pages read). */
  final case class ProbeResult(
      numRows: Long,
      numRowGroups: Int,
      columns: Seq[String],
      spatial: Option[SpatialInfo])

  val DefaultCrs = "EPSG:4326"

  /** O2+O3: read parquet footer metadata only. Directories are walked
    * RECURSIVELY (FileSystem.listFiles remote iterator), so both flat
    * multi-file layouts and Hive-partitioned `key=value/` trees — the
    * normal shape of large parquet datasets, and what `spark.read.parquet`
    * itself accepts — probe correctly: rows summed across every footer,
    * first footer (in path order) for schema/spatial. Paths with a hidden
    * (`_`/`.`-prefixed) component below the root — `_temporary` leftovers
    * of a killed write, `.staging`, `_SUCCESS` — are skipped, matching
    * Spark's own file-index filter, so the probed count equals what
    * `spark.read.parquet(dir).count()` would return. Note partition-key
    * columns live in directory names, not footers, so `columns` reports
    * the data columns only. */
  /** True iff any path component strictly BELOW the qualified root
    * starts with '_' or '.' — the filter Spark's own file index applies
    * when reading. ONE definition shared by [[probe]] and the geo-footer
    * stamper ([[GeoParquetFooter.attach]]); the two used to carry
    * divergent hand-rolled copies of the same rule (round-9 review).
    * listFiles returns already-qualified paths, so one string prefix
    * strip per file suffices; unexpected qualification falls back to
    * walking every component (ancestor DIRS included — a
    * `.staging/part.parquet` leaf has an unsuspicious name but a hidden
    * parent). */
  private[ingest] def hiddenBelow(qualifiedRootPrefix: String,
      f: Path): Boolean = {
    val s = f.toString
    val rel =
      if (s.startsWith(qualifiedRootPrefix))
        s.substring(qualifiedRootPrefix.length)
      else {
        var cur = f
        val names = scala.collection.mutable.ListBuffer.empty[String]
        while (cur != null && cur.getName.nonEmpty) {
          names += cur.getName
          cur = cur.getParent
        }
        names.mkString("/")
      }
    rel.split('/').exists(n => n.startsWith("_") || n.startsWith("."))
  }

  def probe(spark: SparkSession, path: String): ProbeResult = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val rootPrefix = fs.makeQualified(p).toString
    def hidden(f: Path): Boolean = hiddenBelow(rootPrefix, f)
    val files =
      if (fs.getFileStatus(p).isDirectory) {
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
        while (it.hasNext) {
          val f = it.next().getPath
          // every non-hidden file, NOT just *.parquet: spark.read.parquet
          // reads all of them (Hive writes extension-less part files like
          // 000000_0), so an extension filter here broke the documented
          // probe==read invariant (round-9 review). A non-parquet stray
          // makes the footer open throw — the same failure the Spark read
          // itself would hit.
          if (!hidden(f)) buf += f
        }
        buf.sortBy(_.toString).toSeq
      } else Seq(p)
    var numRows = 0L
    var numRowGroups = 0
    var columns: Seq[String] = Nil
    var geo: Option[String] = None
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        numRows += reader.getRecordCount
        numRowGroups += reader.getRowGroups.size()
        if (columns.isEmpty) {
          val md = reader.getFooter.getFileMetaData
          columns = md.getSchema.getFields.asScala.map(_.getName).toSeq
          geo = Option(md.getKeyValueMetaData.get("geo"))
        }
      } finally reader.close()
    }
    ProbeResult(numRows, numRowGroups, columns,
      geo.flatMap(parseGeoMetadata).orElse(nameFallback(columns)))
  }

  /** Parse the GeoParquet `geo` footer JSON: primary geometry column, CRS,
    * encoding (O3). Tolerant like the reference's try/except probe
    * (`app.py:78-84`): malformed metadata → None (fallback path). */
  private[graft] def parseGeoMetadata(json: String): Option[SpatialInfo] =
    Try {
      val root = new ObjectMapper().readTree(json)
      val primary = root.path("primary_column").asText("geometry")
      val colMeta = root.path("columns").path(primary)
      val crs =
        if (colMeta.path("crs").isMissingNode || colMeta.path("crs").isNull)
          DefaultCrs
        else {
          // GeoParquet 1.x uses PROJJSON; surface the authority:code id if
          // present, else keep the raw JSON string
          val id = colMeta.path("crs").path("id")
          if (id.isMissingNode) colMeta.path("crs").toString
          else s"${id.path("authority").asText}:${id.path("code").asText}"
        }
      val enc = colMeta.path("encoding").asText("WKB")
      SpatialInfo(primary, crs, enc, fromFallback = false)
    }.toOption

  /** O10: a column literally named `geometry` is treated as WKB spatial
    * when footer metadata is absent (`app.py:169-175`). */
  private[graft] def nameFallback(columns: Seq[String]): Option[SpatialInfo] =
    if (columns.contains("geometry"))
      Some(SpatialInfo("geometry", DefaultCrs, "WKB", fromFallback = true))
    else None

  /** O1+O8+O9+O10: scan with spatial column metadata attached. The
    * geometry column keeps BinaryType; CRS/encoding ride in column
    * `Metadata` (a logical tag — zero physical cost). */
  def read(spark: SparkSession, path: String): DataFrame =
    readWithProbe(spark, path, probe(spark, path))

  /** [[read]] against an already-computed probe — [[ingest]] probes once
    * for its row total and shares the result here instead of paying a
    * second sequential driver-side walk over every footer (on a
    * many-thousand-file dataset each walk is minutes of object-store
    * round-trips before any distributed work starts). */
  private[graft] def readWithProbe(spark: SparkSession, path: String,
      probed: ProbeResult): DataFrame = {
    val df = spark.read.parquet(path)
    probed.spatial match {
      case Some(si) if df.schema.fieldNames.contains(si.geometryColumn) &&
          df.schema(si.geometryColumn).dataType == BinaryType =>
        val md: Metadata = new MetadataBuilder()
          .putString("crs", si.crs)
          .putString("encoding", si.encoding)
          .build()
        df.withColumn(si.geometryColumn,
          col(si.geometryColumn).as(si.geometryColumn, md))
      case _ => df
    }
  }

  /** Spatial info recorded on a read frame, if any. */
  def spatialOf(df: DataFrame): Option[SpatialInfo] =
    df.schema.fields.collectFirst {
      case f if f.dataType == BinaryType && f.metadata.contains("crs") =>
        SpatialInfo(f.name, f.metadata.getString("crs"),
          if (f.metadata.contains("encoding")) f.metadata.getString("encoding")
          else "WKB",
          fromFallback = false)
    }

  // ------------------------------------------------------------------ sinks

  /** O12/O13/O21 behind one trait so tests can target parquet when no
    * database exists in the environment (SURVEY.md §5.2-5). */
  sealed trait Sink
  /** File sink (O21). */
  final case class ParquetSink(path: String) extends Sink
  /** Relational sink (O12/O13). `preActions` mirrors the reference's
    * `CREATE EXTENSION IF NOT EXISTS postgis` DDL hook (O11) and runs on
    * the driver before the distributed write. */
  final case class JdbcSink(
      url: String,
      table: String,
      properties: java.util.Properties = new java.util.Properties(),
      preActions: Seq[String] = Nil) extends Sink
  /** PostGIS-typed relational sink (O13, `app.py:181`): geometry lands as
    * `geometry(<geometryType>, <srid>)`, SRID defaulting from the scanned
    * CRS metadata. Mechanics in [[Postgis]]. */
  final case class PostgisSink(
      url: String,
      table: String,
      properties: java.util.Properties = new java.util.Properties(),
      srid: Option[Int] = None,
      geometryType: String = "Geometry") extends Sink

  /** O14: the reference's `fail/replace/append` strings. */
  def saveMode(ifExists: String): SaveMode = ifExists match {
    case "fail"    => SaveMode.ErrorIfExists
    case "replace" => SaveMode.Overwrite
    case "append"  => SaveMode.Append
    case other =>
      throw new IllegalArgumentException(
        s"if_exists must be fail|replace|append, got '$other'")
  }

  final case class IngestReport(rowsWritten: Long)

  /** O21: parquet write that preserves spatial-ness on disk. If the frame
    * carries spatial column metadata ([[spatialOf]]), the committed part
    * files are post-stamped with the GeoParquet `geo` footer key
    * ([[GeoParquetFooter]]) — the reference's `gdf.to_parquet` does the
    * same (`generate_data.py:21`), and its probe reads it back
    * (`app.py:72-77`). Plain frames write plain parquet. */
  def writeSpatial(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    df.write.mode(mode).parquet(path)
    spatialOf(df).foreach(si =>
      GeoParquetFooter.attach(df.sparkSession, path, si))
  }

  /** O11: driver-side DDL pre-actions, run in order before the write. */
  private def runPreActions(
      url: String,
      props: java.util.Properties,
      actions: Seq[String]): Unit =
    if (actions.nonEmpty) {
      // DriverManager IGNORES the "driver" property Spark's JDBC write
      // uses; under a forked JVM ServiceLoader autoloading is
      // classloader-sensitive and "No suitable driver" results. Load the
      // pinned class explicitly — registration is its static initializer.
      Option(props.getProperty("driver")).foreach { cls =>
        try Class.forName(cls)
        catch { case _: ClassNotFoundException => /* fall through to DriverManager */ }
      }
      val conn = java.sql.DriverManager.getConnection(url, props)
      try actions.foreach { sql =>
        val st = conn.createStatement(); try st.execute(sql) finally st.close()
      } finally conn.close()
    }

  /** The reference's end-to-end pipeline (`app.py:86-193`): source scan →
    * spatial attach → counted sink write. Row count comes from an
    * `observe()` metric collected by the write job itself — one pass, no
    * extra `count()` scan (O15).
    *
    * `onProgress` mirrors the reference's per-chunk fraction reporting
    * (`app.py:185-193`): each finished task adds its scanned record count
    * against the footer row total (a footer-only probe, no data pages), so
    * callbacks arrive DURING the write, monotone in [0,1]. Task-level
    * granularity is the Spark-native analog of the reference's
    * 5000-row chunks; with a single input split there is exactly one
    * callback at completion. Counts other jobs' tasks too if the caller
    * runs concurrent work on the same session — the ingest CLI doesn't. */
  def ingest(
      spark: SparkSession,
      sourcePath: String,
      sink: Sink,
      ifExists: String = "fail",
      onProgress: Double => Unit = _ => (),
      preProbed: Option[ProbeResult] = None): IngestReport = {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.functions.{count, lit}
    import org.apache.spark.sql.util.QueryExecutionListener
    val mode = saveMode(ifExists)
    val metricName = s"graft_ingest_${java.util.UUID.randomUUID().toString.take(8)}"
    // ONE footer walk serves both the spatial attach and the progress
    // total (read() used to probe again: two sequential driver-side
    // sweeps of every footer before any distributed work)
    // a caller that already probed (the CLI prints a probe report first)
    // passes its result — on a many-thousand-file object store each walk
    // is minutes of sequential footer reads, and paying it twice per run
    // is the exact waste readWithProbe eliminated INSIDE ingest
    val probed = preProbed.getOrElse(probe(spark, sourcePath))
    val observed = readWithProbe(spark, sourcePath, probed)
      .observe(metricName, count(lit(1)).as("rows"))
    // The write runs as its own QueryExecution; the observed metric is
    // delivered through the listener bus (same mechanism the reference's
    // progress counter hand-rolls at app.py:185-193, but collected by the
    // write job itself — no second scan).
    val rows = new java.util.concurrent.atomic.AtomicLong(-1L)
    val latch = new java.util.concurrent.CountDownLatch(1)
    val listener = new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.get(metricName).foreach { row =>
          rows.set(row.getLong(0)); latch.countDown()
        }
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    // Task-level progress: footer row total ÷ cumulative records read by
    // finished tasks. The scheduler bus delivers onTaskEnd while the write
    // job is still running — incremental, unlike the observe() metric
    // which lands only at job end.
    val totalRows = math.max(1L, probed.numRows)
    val seenRows = new java.util.concurrent.atomic.AtomicLong(0L)
    val progressListener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null && m.inputMetrics.recordsRead > 0) {
          val cum = seenRows.addAndGet(m.inputMetrics.recordsRead)
          onProgress(math.min(1.0, cum.toDouble / totalRows))
        }
      }
    }
    spark.sparkContext.addSparkListener(progressListener)
    spark.listenerManager.register(listener)
    try {
      sink match {
        case ParquetSink(path) =>
          writeSpatial(observed, path, mode)
        case JdbcSink(url, table, props, preActions) =>
          runPreActions(url, props, preActions)
          observed.write.mode(mode).jdbc(url, table, props)
        case ps: PostgisSink =>
          val plan = Postgis.plan(observed, ps, mode)
          runPreActions(ps.url, plan.properties, plan.preActions)
          // table semantics already applied by the DDL actions; the
          // distributed write itself always appends into the typed table
          plan.frame.write.mode(SaveMode.Append)
            .jdbc(ps.url, ps.table, plan.properties)
      }
      val delivered = latch.await(30, java.util.concurrent.TimeUnit.SECONDS)
      if (!delivered || rows.get() < 0)
        throw new IllegalStateException(
          "ingest wrote data but the observed row-count metric was not " +
            "delivered within 30s — count unknown")
    } finally {
      spark.listenerManager.unregister(listener)
      spark.sparkContext.removeSparkListener(progressListener)
    }
    IngestReport(rows.get())
  }

  /** O16 for buffers: parquet files open AND close with `PAR1`. Public so
    * the CLI's stdin branch can fail fast (an empty pipe, a gzip, a CSV)
    * before a SparkSession or spool file exists. */
  def requireParquetBuffer(buffer: Array[Byte]): Unit = {
    val magic = "PAR1".getBytes("US-ASCII")
    require(buffer.length >= 12 &&
      buffer.startsWith(magic) && buffer.endsWith(magic),
      s"upload is not a parquet file (${buffer.length} bytes; " +
        "expected PAR1 magic at head and tail)")
  }

  /** The reference's OTHER input branch (`app.py:30-31,46-47`: "Upload
    * File (Small Files)" — an in-memory buffer, not a path): validate the
    * buffer IS parquet, spool it to a private temp file, and run the
    * identical probe→scan→sink pipeline. Spooling is not a cop-out — it
    * is what the reference's own upload widget does under the hood
    * (buffers beyond a size threshold land in a temp file), and it keeps
    * ONE code path for footer probe, spatial attach, save modes and the
    * counted write. By design for SMALL files only, like the reference
    * labels it: an upload is driver-memory-bounded; corpus-scale data
    * arrives by path, where the scan is distributed and nothing ever
    * passes through the driver.
    *
    * The spool lives on the DRIVER's local disk and is passed with an
    * explicit `file:` scheme, so on a cluster whose default filesystem is
    * remote (HDFS/S3) the path still resolves to the right filesystem —
    * and the documented restriction is honest: executors on other hosts
    * cannot read the driver's disk, so uploads are a local-mode /
    * driver-side feature (matching the reference's single-process
    * widget); a cluster deployment uploads to shared storage and ingests
    * by path. */
  def ingestUpload(
      spark: SparkSession,
      buffer: Array[Byte],
      sink: Sink,
      ifExists: String = "fail",
      onProgress: Double => Unit = _ => ()): IngestReport = {
    requireParquetBuffer(buffer)
    val spool = java.nio.file.Files.createTempFile("graft_upload_", ".parquet")
    try {
      java.nio.file.Files.write(spool, buffer)
      ingest(spark, spool.toUri.toString, sink, ifExists, onProgress)
    } finally java.nio.file.Files.deleteIfExists(spool)
  }
}
