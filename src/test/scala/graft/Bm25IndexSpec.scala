package graft

import graft.operators.{Bm25Index, PipelineOps, VectorOps}
import org.apache.spark.sql.functions._

/** The offline BM25 posting-list artifact (q134): losslessness vs the
  * q133 re-tokenize path, the pruned/pushed serving plan, empty-corpus
  * degradation, and the declared form's artifact reuse. */
class Bm25IndexSpec extends SparkSpec {

  private val terms = Seq("window", "spark", "stream")

  test("artifact probe == q133's re-tokenize answer (lossless index)") {
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    Bm25Index.build(docs, dir)
    val served = Bm25Index.probe(spark, dir, terms).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val reTokenized = PipelineOps.bm25Search(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(served == reTokenized,
      "the index is lossless: artifact scores must be hash-identical")
    // different query terms against the SAME artifact (no rebuild): sane
    // shape, scores positive, doc_id tiebreak ordering
    val other = Bm25Index.probe(spark, dir, Seq("the", "data"), k = 5).collect()
    assert(other.length <= 5)
    assert(other.map(_.getLong(0)).toSeq ==
      other.map(r => (-r.getDouble(1), r.getLong(0))).sorted.map(_._2).toSeq)
    // DUPLICATED query terms: the re-tokenize path scores one term-
    // column per OCCURRENCE (doubled term -> doubled score + doubled
    // n_query_terms, same df), so the probe weights each matched
    // posting by the term's query multiplicity — parity must hold for
    // the degenerate input too, not just distinct-term queries
    val dupTerms = Seq("spark", "window", "spark")
    val servedDup = Bm25Index.probe(spark, dir, dupTerms).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val reTokenizedDup = PipelineOps.bm25SearchOf(docs, dupTerms).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(servedDup == reTokenizedDup,
      "multiplicity weighting must reproduce per-occurrence scoring")
  }

  test("serving plan: bucket-pruned, term-pushed, no tokenize in-plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_plan").toString
    Bm25Index.build(Tables.documents(spark, sfDir), dir)
    val probe = Bm25Index.probe(spark, dir, terms)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("postings"), "must scan the artifact")
    assert(!plan.toLowerCase.contains("explode"),
      "serving must NOT re-tokenize — that is the artifact's whole point")
    // the term predicate reaches the parquet scan, and the partition
    // column filter prunes to the query terms' buckets
    assert(plan.contains("w IN (") || plan.contains("w#"),
      s"term filter must reach the scan")
    assert(plan.contains("bucket"), "bucket pruning filter must be present")
    // pruning is real: the scanned partition count equals the distinct
    // buckets of the query terms, not the artifact's full bucket count
    val allBuckets = spark.read.parquet(s"$dir/postings")
      .select(col("bucket")).distinct().count()
    val queryBuckets = spark.range(1)
      .select(terms.map(t =>
        pmod(xxhash64(lit(t)), lit(Bm25Index.Buckets.toLong)).cast("int")): _*)
      .collect().head.toSeq.map(_.asInstanceOf[Int]).distinct
    assert(queryBuckets.size < allBuckets,
      s"fixture must have more populated buckets (${allBuckets}) than the " +
        s"query touches (${queryBuckets.size}) for pruning to be observable")
    val scannedFiles = probe.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputRDD.getNumPartitions
      }
    info(s"query buckets ${queryBuckets.size} of $allBuckets populated; " +
      s"scan partitions: $scannedFiles")
    // round-10: the corpus constants are memoized literals — the ONLY
    // file scan in a probe plan is the pruned postings read (the old
    // plan re-read the 1-row stats parquet on every query)
    assert(!plan.contains("/stats"),
      "stats must come from the per-path memo, not a per-probe file read")
    // string-based: AQE wraps the plan in a leaf AdaptiveSparkPlanExec,
    // so node-class collection sees no scans at all
    val scanLines = plan.linesIterator.filter(l =>
      l.toLowerCase.contains("scan") && l.toLowerCase.contains("parquet"))
      .toList
    assert(scanLines.size == 1,
      s"probe plan must contain exactly the postings scan:\n" +
        scanLines.mkString("\n"))
  }

  test("q142 hybrid RRF: score IS the reciprocal-rank sum of its own rank columns; both channels contribute; deterministic") {
    val rows = PipelineOps.hybridRrf(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val lex = if (r.isNullAt(2)) None else Some(r.getInt(2))
      val vec = if (r.isNullAt(3)) None else Some(r.getInt(3))
      assert(lex.nonEmpty || vec.nonEmpty,
        "a fused row must come from at least one channel")
      val want = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        vec.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getDouble(1) == math.floor(want * 1e6 + 0.5) / 1e6,
        s"RRF of ranks ($lex, $vec) must be the reciprocal sum")
    }
    assert(rows.exists(!_.isNullAt(2)) && rows.exists(!_.isNullAt(3)),
      "fixture must exercise both channels or the fusion is vacuous")
    val again = PipelineOps.hybridRrf(spark, sfDir).collect()
    assert(again.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq,
      "artifact reuse + stable tiebreaks make the fusion deterministic")
  }

  test("versioned probe plan: literal-path pruning off the manifest, no stats read, no tokenize") {
    import graft.operators.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_bm25_vtp").toString
    Bm25Index.buildVersioned(spark, Tables.documents(spark, sfDir), root)
    val probe = Bm25Index.probeVersioned(spark, root, terms)
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("explode"), "no re-tokenize in-plan")
    assert(!plan.contains("/stats"),
      "corpus constants are per-(root,version) memoized literals")
    // pruning is LITERAL path selection: only the query terms' bucket
    // directories are handed to the scan at all — the file index never
    // lists the rest (stronger than a partition filter, which still
    // discovers everything). The scan's root paths ARE the wanted dirs.
    val queryBuckets = spark.range(1)
      .select(terms.map(t =>
        pmod(xxhash64(lit(t)), lit(Bm25Index.Buckets.toLong)).cast("int")): _*)
      .collect().head.toSeq.map(_.asInstanceOf[Int]).distinct
      .map(b => s"bucket=$b")
    val scannedDirs = plan.linesIterator.filter(l =>
      l.contains("Location") || l.contains("file:")).mkString("\n")
    // greedy digit match: a path with bucket=18 extracts "bucket=18",
    // never a false "bucket=1" prefix hit — then exact set equality
    val scannedBuckets = "bucket=\\d+".r.findAllIn(scannedDirs).toSet
    assert(scannedBuckets == queryBuckets.toSet,
      s"scan roots must be EXACTLY the wanted bucket dirs: " +
        s"scanned=$scannedBuckets wanted=$queryBuckets\n$scannedDirs")
    // and the answer equals the plain-layout probe's
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_vtq").toString
    Bm25Index.build(Tables.documents(spark, sfDir), dir)
    assert(probe.collect().map(_.toSeq).toSeq ==
      Bm25Index.probe(spark, dir, terms).collect().map(_.toSeq).toSeq,
      "versioned and plain layouts must serve identical answers")
  }

  test("probeBatch == per-query probe, shared postings scored once per query, dup terms weighted") {
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_bt").toString
    Bm25Index.build(docs, dir)
    // overlapping vocabulary + a duplicated term in one query
    val battery = Seq(
      1L -> Seq("window", "spark", "stream"),
      2L -> Seq("query", "join", "merge"),
      3L -> Seq("spark", "the", "spark"))
    val batched = Bm25Index.probeBatch(spark, dir, battery, k = 20)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val perQuery = battery.flatMap { case (qid, terms) =>
      Bm25Index.probe(spark, dir, terms, k = 20).collect().map(r =>
        (qid, r.getLong(0), r.getDouble(1), r.getLong(2)))
    }.sortBy { case (qid, doc, sc, _) => (qid, -sc, doc) }
    assert(batched == perQuery,
      "one batched scan must equal each query probed alone (incl. the " +
        "duplicated-term multiplicity and the shared 'spark' postings)")
    // versioned route: same battery, same answers
    val root = java.nio.file.Files.createTempDirectory("graft_bm25_btv").toString
    Bm25Index.buildVersioned(spark, docs, root)
    val versioned = Bm25Index.probeBatchVersioned(spark, root, battery)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(versioned == batched,
      "manifest-served batch must equal the plain-layout batch")
  }

  test("empty and degenerate corpora: build + probe degrade to empty, never throw") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val dirE = java.nio.file.Files.createTempDirectory("graft_bm25_e").toString
    Bm25Index.build(empty, dirE)
    assert(Bm25Index.probe(spark, dirE, terms).collect().isEmpty)
    // null text + docs with no matching terms
    val sparse = Seq((1L, null: String), (2L, ""), (3L, "nothing relevant"))
      .toDF("doc_id", "text")
    val dirS = java.nio.file.Files.createTempDirectory("graft_bm25_s").toString
    Bm25Index.build(sparse, dirS)
    assert(Bm25Index.probe(spark, dirS, terms).collect().isEmpty)
    // and a doc that DOES match still scores
    val hit = Seq((1L, "spark streams"), (2L, "x")).toDF("doc_id", "text")
    val dirH = java.nio.file.Files.createTempDirectory("graft_bm25_h").toString
    Bm25Index.build(hit, dirH)
    val r = Bm25Index.probe(spark, dirH, terms).collect()
    assert(r.length == 1 && r.head.getLong(0) == 1L && r.head.getLong(2) == 1L)
  }

  test("q134 declared form: equals q133, artifact reused not rebuilt") {
    val law = PipelineOps.bm25IndexProbe(spark, sfDir).collect()
    val q133 = PipelineOps.bm25Search(spark, sfDir).collect()
    assert(law.map(_.toSeq).toSeq == q133.map(_.toSeq).toSeq,
      "q134 must serve q133's exact answer")
    val marker = VectorOps.artifactDir(
        s"graft_bm25_index_${Bm25Index.formatTag}", sfDir,
        sourceFile = "documents.parquet")
      .resolve("postings").resolve("_SUCCESS")
    val mtime = java.nio.file.Files.getLastModifiedTime(marker).toMillis
    val again = PipelineOps.bm25IndexProbe(spark, sfDir).collect()
    assert(again.map(_.toSeq).toSeq == law.map(_.toSeq).toSeq)
    assert(java.nio.file.Files.getLastModifiedTime(marker).toMillis == mtime,
      "second probe must reuse the artifact, not rebuild it")
  }
}
