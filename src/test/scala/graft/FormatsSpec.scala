package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format breadth beyond the reference's parquet-only surface
  * (SURVEY.md §2.2 "Scans/sources" row): CSV, JSON, ORC round-trips, and
  * map-typed column handling. */
class FormatsSpec extends SparkSpec {

  private def nations = Tables.nation(spark, sfDir)

  test("CSV round-trip with header and schema") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    nations.write.option("header", "true").csv(s"$dir/csv")
    val back = spark.read.option("header", "true")
      .schema(nations.schema).csv(s"$dir/csv")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nations.orderBy("n_nationkey").collect().toSeq)
  }

  test("JSON round-trip") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    nations.write.json(s"$dir/json")
    val back = spark.read.schema(nations.schema).json(s"$dir/json")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nations.orderBy("n_nationkey").collect().toSeq)
  }

  test("ORC round-trip incl. array column") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    val emb = Tables.embeddings(spark, sfDir)
    emb.write.orc(s"$dir/orc")
    val back = spark.read.orc(s"$dir/orc")
    assert(back.schema("embedding").dataType.typeName == "array")
    assert(back.count() == emb.count())
    val a = back.orderBy("vec_id").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = emb.orderBy("vec_id").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
  }

  test("text source round-trip: one line per document (raw-corpus ingestion)") {
    // the most common LLM-corpus wire format after jsonl: one document
    // per line. Write documents' text out, read back with the `text`
    // source, prove byte-level fidelity (modulo line order — the text
    // source has no key, so content-sort both sides)
    val dir = Files.createTempDirectory("graft_fmt").toString
    val docs = Tables.documents(spark, sfDir).select(col("text"))
    docs.write.text(s"$dir/txt")
    val back = spark.read.text(s"$dir/txt").select(col("value").as("text"))
    assert(back.count() == docs.count())
    assert(back.orderBy("text").collect().toSeq ==
      docs.orderBy("text").collect().toSeq)
    // and the jsonl form: json-lines round-trip with doc keys preserved
    val keyed = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    keyed.write.json(s"$dir/jsonl")
    val backJ = spark.read.schema(keyed.schema).json(s"$dir/jsonl")
    assert(backJ.orderBy("doc_id").collect().toSeq ==
      keyed.orderBy("doc_id").collect().toSeq)
  }

  test("map-typed columns: build, access, transform, parquet round-trip") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    val withMap = Tables.events(spark, sfDir)
      .withColumn("m", map_from_arrays(
        array(lit("type"), lit("uid")),
        array(col("event_type"), col("user_id").cast("string"))))
    val accessed = withMap
      .select(col("event_id"),
        element_at(col("m"), "type").as("t"),
        map_keys(col("m")).as("ks"),
        expr("transform_values(m, (k, v) -> upper(v))").as("upper_m"))
    val row = accessed.orderBy("event_id").limit(1).collect()(0)
    assert(row.getString(1).nonEmpty)
    assert(row.getSeq[String](2) == Seq("type", "uid"))
    withMap.select("event_id", "m").write.parquet(s"$dir/map")
    val back = spark.read.parquet(s"$dir/map")
    assert(back.schema("m").dataType.typeName == "map")
    assert(back.count() == withMap.count())
  }

  test("corrupt part file: default read fails loudly; ignoreCorruptFiles recovers the good rows") {
    // at 100 TB a truncated upload or a half-written object WILL appear
    // in some input prefix; both behaviors matter — fail-loud by default
    // (silent row loss is worse than a failed run), opt-in skip for
    // scavenge/repair jobs, and the skip must lose ONLY the bad file
    val dir = Files.createTempDirectory("graft_corrupt").toString + "/t"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.repartition(4).write.parquet(dir)
    val good = spark.read.parquet(dir).count()
    assert(good == docs.count())
    Files.write(java.nio.file.Paths.get(s"$dir/part-junk.parquet"),
      "this is not a parquet file".getBytes)
    val prev = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    try {
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
      val failed =
        try { spark.read.parquet(dir).count(); false }
        catch { case _: Throwable => true }
      assert(failed, "a corrupt part file must fail the default read")
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
      assert(spark.read.parquet(dir).count() == good,
        "ignoreCorruptFiles must recover exactly the good files' rows")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }
}
