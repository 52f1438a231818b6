package graft

import java.nio.file.Files

import graft.functions.SpatialExpressions
import graft.ingest.{Generator, GeoParquetFooter, ParquetIngest}
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity pipeline specs (SURVEY.md §5.2): probe, spatial
  * detection + fallback, save-mode semantics, fixture schema parity, WKB
  * round-trip. */
class IngestSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_ingest").toString

  test("probe reads row counts and columns from footers only") {
    val p = ParquetIngest.probe(spark, s"$sfDir/lineitem.parquet")
    assert(p.numRows == 6000L)
    assert(p.numRowGroups >= 1)
    assert(p.columns.contains("l_orderkey") && p.columns.size == 11)
    assert(p.spatial.isEmpty, "lineitem has no geometry")
  }

  test("geo metadata parsing: GeoParquet footer JSON → SpatialInfo") {
    val json =
      """{"version":"1.0.0","primary_column":"geometry",
        |"columns":{"geometry":{"encoding":"WKB",
        |"crs":{"id":{"authority":"EPSG","code":4326}}}}}""".stripMargin
    val si = ParquetIngest.parseGeoMetadata(json).get
    assert(si.geometryColumn == "geometry")
    assert(si.crs == "EPSG:4326")
    assert(si.encoding == "WKB")
    // missing crs → reference default (app.py:163-164)
    val noCrs = """{"primary_column":"geom","columns":{"geom":{"encoding":"WKB"}}}"""
    assert(ParquetIngest.parseGeoMetadata(noCrs).get.crs == "EPSG:4326")
    // garbage → None (tolerant probe, app.py:78-84)
    assert(ParquetIngest.parseGeoMetadata("not json").isEmpty)
  }

  test("name-based spatial fallback + CRS metadata attach end-to-end") {
    val dir = tmp()
    // a PLAIN Spark write (not writeFixture, which stamps the 'geo' footer):
    // no footer key → probe must take the geometry-name fallback (O10)
    Generator.fixture(spark, n = 10).write.parquet(s"$dir/fixture")
    val probe = ParquetIngest.probe(spark, s"$dir/fixture")
    assert(probe.numRows == 10)
    assert(probe.spatial.exists(_.fromFallback))
    val df = ParquetIngest.read(spark, s"$dir/fixture")
    val si = ParquetIngest.spatialOf(df)
    assert(si.exists(s => s.geometryColumn == "geometry" && s.crs == "EPSG:4326"))
  }

  test("probe descends Hive-partitioned directories (key=value subdirs)") {
    val dir = tmp()
    // the normal shape of large parquet datasets: key=value/ subtrees that
    // spark.read.parquet itself resolves — probe must sum footers across
    // the whole tree, not just top-level *.parquet files
    Generator.writeFixture(spark, s"$dir/flat", n = 10)
    spark.read.parquet(s"$dir/flat")
      .write.partitionBy("category").parquet(s"$dir/part")
    val probe = ParquetIngest.probe(spark, s"$dir/part")
    assert(probe.numRows == 10, s"partitioned probe rows: ${probe.numRows}")
    assert(probe.numRows == spark.read.parquet(s"$dir/part").count(),
      "probe must agree with what spark.read.parquet resolves")
    // spatial sniff still works via the first leaf footer (name fallback:
    // the partitioned re-write above is a plain Spark write, no 'geo' key)
    assert(probe.spatial.exists(_.fromFallback))
    // partition-key columns live in directory names, not footers
    assert(probe.columns.contains("geometry") && !probe.columns.contains("category"))
  }

  test("GeoParquet 'geo' footer on write: renamed geometry column round-trips with NO name fallback (O21)") {
    val dir = tmp()
    // rename the geometry column — the O10 name fallback CANNOT detect it;
    // only a real footer key can (reference writes one, generate_data.py:21)
    val md = new MetadataBuilder()
      .putString("crs", "EPSG:4326").putString("encoding", "WKB").build()
    val spatial = Generator.fixture(spark, n = 10)
      .withColumnRenamed("geometry", "geom_wkb")
      .withColumn("geom_wkb", col("geom_wkb").as("geom_wkb", md))
    ParquetIngest.writeSpatial(spatial, s"$dir/geo")
    val probe = ParquetIngest.probe(spark, s"$dir/geo")
    assert(probe.spatial.exists(s => s.geometryColumn == "geom_wkb" &&
      !s.fromFallback && s.crs == "EPSG:4326" && s.encoding == "WKB"),
      s"footer-based detection failed: ${probe.spatial}")
    // read() attaches CRS metadata to the renamed column
    val back = ParquetIngest.read(spark, s"$dir/geo")
    assert(ParquetIngest.spatialOf(back).exists(_.geometryColumn == "geom_wkb"))
    // data survives the footer rewrite byte-for-byte (row groups copied)
    assert(back.count() == 10)
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 10L).toSeq)
  }

  test("writeFixture emits true GeoParquet; parseGeoMetadata parses our own output") {
    val dir = tmp()
    Generator.writeFixture(spark, s"$dir/fixture", n = 10)
    val probe = ParquetIngest.probe(spark, s"$dir/fixture")
    assert(probe.spatial.exists(s =>
      s.geometryColumn == "geometry" && !s.fromFallback))
    // Spark's own reader is unbothered by the extra footer key
    assert(spark.read.parquet(s"$dir/fixture").count() == 10)
    // writer/parser agreement on a non-default CRS too
    val si = ParquetIngest.SpatialInfo("g", "EPSG:3857", "WKB", fromFallback = false)
    assert(ParquetIngest.parseGeoMetadata(GeoParquetFooter.geoJson(si))
      .contains(si))
  }

  test("stampFile recovers a swap crashed between renames: backup restored, no row lost") {
    val dir = tmp()
    Generator.writeFixture(spark, s"$dir/crash", n = 10)
    val part = new java.io.File(s"$dir/crash").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .head
    // simulate the worst crash point: original moved to the hidden backup,
    // stamped temp never landed — the data exists ONLY under the backup name
    val bak = new java.io.File(part.getParent, s".${part.getName}.geo.bak")
    assert(part.renameTo(bak))
    val hconf = spark.sessionState.newHadoopConf()
    val si = ParquetIngest.SpatialInfo("geometry", "EPSG:4326", "WKB",
      fromFallback = false)
    GeoParquetFooter.stampFile(hconf,
      new org.apache.hadoop.fs.Path(part.getAbsolutePath),
      GeoParquetFooter.geoJson(si))
    // retry restored the backup, re-stamped, and cleaned up
    assert(part.exists()); assert(!bak.exists())
    assert(spark.read.parquet(s"$dir/crash").count() == 10)
    assert(ParquetIngest.probe(spark, s"$dir/crash").spatial
      .exists(s => s.geometryColumn == "geometry" && !s.fromFallback))
  }

  test("probe ignores hidden (_/. prefixed) files and dirs, like Spark's reader") {
    val dir = tmp()
    Generator.writeFixture(spark, s"$dir/data", n = 10)
    // a killed write leaves committed files NEXT TO _temporary leftovers;
    // spark.read.parquet ignores every _/.-prefixed path component, so the
    // probe must too or its count diverges from what Spark will read
    val aParquet = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    val temp = java.nio.file.Paths.get(s"$dir/data/_temporary/0")
    java.nio.file.Files.createDirectories(temp)
    java.nio.file.Files.copy(aParquet, temp.resolve("part-orphan.parquet"))
    val hidden = java.nio.file.Paths.get(s"$dir/data/.staging.parquet")
    java.nio.file.Files.copy(aParquet, hidden)
    val probe = ParquetIngest.probe(spark, s"$dir/data")
    assert(probe.numRows == 10, s"hidden files leaked into probe: ${probe.numRows}")
    assert(probe.numRows == spark.read.parquet(s"$dir/data").count())
  }

  test("fixture schema matches the reference's dummy_spatial.parquet (FIXTURES.md)") {
    val df = Generator.fixture(spark)
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(fields("id") == LongType)
    assert(fields("value") == DoubleType)
    assert(fields("category") == StringType)
    assert(fields("geometry") == BinaryType)
    // cyclic A/B (generate_data.py:10)
    val cats = df.select("category").collect().map(_.getString(0)).toSeq
    assert(cats == Seq("A", "B", "A", "B", "A", "B", "A", "B", "A", "B"))
    // deterministic under a fixed seed
    assert(Generator.fixture(spark).collect().toSeq ==
      Generator.fixture(spark).collect().toSeq)
  }

  test("WKB point round-trip (property, SURVEY §5.2-3)") {
    import spark.implicits._
    val coords = (-10 to 10).flatMap(i =>
      Seq((i * 17.1234, -i * 3.5), (i * 1e6, i * 1e-6), (0.0, 0.0)))
    val df = coords.toDF("x", "y")
      .withColumn("wkb", SpatialExpressions.stPoint(col("x"), col("y")))
      .withColumn("x2", SpatialExpressions.stX(col("wkb")))
      .withColumn("y2", SpatialExpressions.stY(col("wkb")))
      .withColumn("valid", SpatialExpressions.stIsWkbPoint(col("wkb")))
    df.collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(3), "x round-trip")
      assert(r.getDouble(1) == r.getDouble(4), "y round-trip")
      assert(r.getBoolean(5), "valid WKB point")
    }
    // invalid bytes → null coords, false validity (tolerant decode)
    val bad = Seq(Array[Byte](9, 9, 9)).toDF("wkb")
      .select(SpatialExpressions.stX(col("wkb")).as("x"),
        SpatialExpressions.stIsWkbPoint(col("wkb")).as("v"))
      .collect()(0)
    assert(bad.isNullAt(0) && !bad.getBoolean(1))
  }

  test("save-mode semantics: fail/replace/append (reference O14)") {
    val dir = tmp()
    val src = s"$sfDir/region.parquet"
    val dst = s"$dir/out"
    val r1 = ParquetIngest.ingest(spark, src, ParquetIngest.ParquetSink(dst), "fail")
    assert(r1.rowsWritten == 5)
    assert(spark.read.parquet(dst).count() == 5)
    // fail on existing target
    intercept[AnalysisException] {
      ParquetIngest.ingest(spark, src, ParquetIngest.ParquetSink(dst), "fail")
    }
    // append doubles
    ParquetIngest.ingest(spark, src, ParquetIngest.ParquetSink(dst), "append")
    assert(spark.read.parquet(dst).count() == 10)
    // replace resets
    ParquetIngest.ingest(spark, src, ParquetIngest.ParquetSink(dst), "replace")
    assert(spark.read.parquet(dst).count() == 5)
    // invalid mode string rejected (reference UI constrains to 3 values)
    intercept[IllegalArgumentException] {
      ParquetIngest.saveMode("upsert")
    }
  }

  test("ingest reports observed row count from the write pass (O15)") {
    val dir = tmp()
    val r = ParquetIngest.ingest(spark, s"$sfDir/customer.parquet",
      ParquetIngest.ParquetSink(s"$dir/c"), "replace")
    assert(r.rowsWritten == 150)
  }

  test("ingest reports monotone incremental progress per task (O15 parity)") {
    val dir = tmp()
    // 4-file source → 4 scan tasks → ≥2 distinct progress callbacks
    Generator.fixture(spark, n = 4000L).repartition(4)
      .write.parquet(s"$dir/src")
    val fractions = java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.lang.Double]())
    val r = ParquetIngest.ingest(spark, s"$dir/src",
      ParquetIngest.ParquetSink(s"$dir/out"), "replace",
      onProgress = f => fractions.add(f))
    assert(r.rowsWritten == 4000L)
    // the observed-metric latch inside ingest drains the shared listener
    // queue past the job's task-end events, so all callbacks have landed
    import scala.jdk.CollectionConverters._
    val fs = fractions.asScala.toList.map(_.doubleValue())
    assert(fs.size >= 2, s"expected per-task callbacks, got $fs")
    assert(fs == fs.sorted, s"progress not monotone: $fs")
    assert(math.abs(fs.last - 1.0) < 1e-9, s"final fraction ${fs.last} != 1.0")
    assert(fs.head < 1.0, s"first callback already complete: $fs")
  }

  test("upload-buffer ingest: bytes run the full pipeline; junk fails fast (O16)") {
    // the reference's "Upload File (Small Files)" branch (app.py:30-31):
    // an in-memory parquet buffer, not a path
    val src = tmp() + "/points"
    // an upload is ONE file: single-partition fixture write
    ParquetIngest.writeSpatial(
      Generator.fixture(spark, n = 10).coalesce(1), src)
    val file = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val bytes = Files.readAllBytes(file.toPath)

    val dst = tmp() + "/uploaded"
    val r = ParquetIngest.ingestUpload(spark, bytes,
      ParquetIngest.ParquetSink(dst), "replace")
    assert(r.rowsWritten == 10)
    // the spatial path survived the buffer hop: geometry + CRS re-detected
    // from the spooled footer, and re-stamped on the sink output
    val probe = ParquetIngest.probe(spark, dst)
    assert(probe.spatial.exists(s =>
      s.geometryColumn == "geometry" && s.crs == "EPSG:4326"))
    assert(spark.read.parquet(dst).count() == 10)

    // validation before Spark ever sees it: truncated/mislabeled buffers
    val junk = intercept[IllegalArgumentException] {
      ParquetIngest.ingestUpload(spark, Array[Byte](1, 2, 3),
        ParquetIngest.ParquetSink(tmp() + "/x"), "replace")
    }
    assert(junk.getMessage.contains("not a parquet file"))
    val truncated = intercept[IllegalArgumentException] {
      ParquetIngest.ingestUpload(spark, bytes.dropRight(1),
        ParquetIngest.ParquetSink(tmp() + "/y"), "replace")
    }
    assert(truncated.getMessage.contains("not a parquet file"))
    // no spool file leaks — both paths clean up their temp file
    val leaked = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_upload_"))
    assert(leaked.isEmpty, s"spool files leaked: ${leaked.mkString(",")}")
  }
}
