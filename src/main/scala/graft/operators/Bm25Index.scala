package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Offline BM25 posting-list artifact (E14/E13 retrieval family; the
  * import-then-query lifecycle of [[PqIndex]]/[[IvfIndex]] applied to
  * LEXICAL retrieval — the reference's own import-once/query-later
  * shape, `app.py:88-183`).
  *
  * q133 computes Okapi BM25 in one honest tokenize pass, but it
  * re-tokenizes the corpus on EVERY query — at 100 TB, lexical
  * retrieval serves from a prebuilt inverted index, not a re-tokenize
  * (Robertson et al., TREC-3; every Lucene/ES deployment). The build
  * step runs the tokenize ONCE and stores:
  *
  *   `<path>/postings/` — (w, doc_id, tf, dl, df) PARTITIONED BY
  *                        `bucket` = xxhash64(w) mod [[Buckets]]: the
  *                        term-sharded layout a cluster co-locates
  *                        postings by. dl/df are denormalized into the
  *                        row (Lucene stores per-doc norms the same
  *                        way) so serving needs NO join against a
  *                        doc-lengths table.
  *   `<path>/stats/`    — 1 row (n_docs, total_len) — the corpus
  *                        constants of the BM25 formula.
  *
  * Serving a query is then: map its terms to their buckets (partition
  * pruning — the scan touches |terms| of [[Buckets]] partitions), push
  * `w IN (terms)` into the pruned scan (`PushedFilters`), score each
  * surviving posting row against the memoized corpus constants
  * (literals in the plan — the stats parquet is read once per path per
  * JVM, not once per probe), and
  * aggregate per doc — cost proportional to the matched postings, not
  * the corpus. `Bm25IndexSpec` pins the pruned/pushed plan and the
  * answer's equality to q133's re-tokenize path; the declared q134
  * carries q133's exact DuckDB oracle (identical integer inputs,
  * identical double expression, one `round(·,4)`).
  */
object Bm25Index {

  /** Term-shard count. At fixture scale this is plain partition
    * pruning; at 100 TB each bucket is the unit postings co-locate and
    * scale by (a hot shard splits by raising the count — which changes
    * [[formatTag]] and thus rebuilds, as it must). */
  val Buckets = 64

  /** Format/params token folded into the shared-cache directory name
    * ([[VectorOps.artifactDir]]): bump on any change to the layout,
    * tokenizer, or bucket rule so stale artifacts built by old code are
    * orphaned rather than served. */
  def formatTag: String = s"b$Buckets-v1"

  /** Postings schema, used for explicit-schema reads so an
    * empty-corpus artifact (zero part files under `postings/`) still
    * serves an empty result instead of failing schema inference. */
  val postingsSchema: StructType = StructType(Seq(
    StructField("w", StringType),
    StructField("doc_id", LongType),
    StructField("tf", LongType),
    StructField("dl", LongType),
    StructField("df", LongType),
    StructField("bucket", IntegerType)))

  private val statsSchema: StructType = StructType(Seq(
    StructField("n_docs", LongType),
    StructField("total_len", LongType)))

  private def bucketCol(w: org.apache.spark.sql.Column) =
    pmod(xxhash64(w), lit(Buckets.toLong)).cast("int")

  /** Per-artifact (n_docs, total_len) memo: a ready artifact is
    * immutable (identity-keyed cache dirs; [[updateFrom]] invalidates
    * explicitly), so the 1-row stats parquet is read ONCE per path per
    * JVM instead of once per probe (round-9 verdict item 6 — the
    * PqIndex family already memoizes its corpus metadata this way).
    * The constants then enter the probe plan as literals: no stats
    * scan, no crossJoin, one less file read per query. */
  private val statsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  private def corpusStats(spark: SparkSession, path: String): (Long, Long) = {
    val cached = statsMemo.get(path)
    if (cached != null) return cached
    val r = spark.read.schema(statsSchema).parquet(s"$path/stats")
      .collect().headOption
    r match {
      case Some(row) =>
        val v = (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
        statsMemo.put(path, v)
        v
      case None =>
        // a complete build always writes exactly one stats row (the
        // aggregate of an empty corpus is (0, null)), so zero rows
        // means a torn/in-progress artifact: serve zeros WITHOUT
        // caching — the pre-memo per-probe read self-healed once stats
        // landed, and memoizing the degenerate read would pin bogus
        // IDF/avgdl constants forever
        (0L, 0L)
    }
  }

  private val vStatsMemo = new VersionedTable.SnapshotMemo[(Long, Long)]

  /** Per-(root, version) corpus constants for the versioned probes —
    * ONE definition for single and batched serving (the [[termFreq]]
    * rule), on the shared [[VersionedTable.SnapshotMemo]] (key format,
    * rollover eviction, and the degenerate-read no-cache policy live
    * there). A zero-row stats read (lost part file) serves zeros
    * UNCACHED — [[corpusStats]]' same self-healing rule. */
  private def versionedStats(spark: SparkSession, root: String,
      snap: VersionedTable.Snapshot): (Long, Long) =
    vStatsMemo.get(root, snap) {
      VersionedTable.readExtra(spark, snap, root, "stats", statsSchema)
        .collect().headOption.map(row =>
          (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1)))
    }.getOrElse((0L, 0L))

  /** q133's lower+space-split token contract — ONE definition shared
    * by [[build]] and [[updateFrom]], whose df/dl math silently
    * diverges from the stored postings if the tokenize forks. */
  private def termFreq(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
    .filter(col("w") =!= "")
    .groupBy(col("doc_id"), col("w"))
    .agg(count(lit(1)).as("tf"))

  /** Build the index at `path` from a `(doc_id, text)` frame: ONE
    * tokenize pass (q133's lower+space-split token contract), tf per
    * (doc, term), dl/df derived from the tf frame (no second
    * tokenize), everything denormalized into the bucket-partitioned
    * postings. Offline cost: the tokenize plus two tf-frame
    * aggregations and two joins — paid once per corpus. */
  def build(docs: DataFrame, path: String): Unit = {
    val (rows, stats) = buildFrames(docs)
    rows.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings")
    stats.write.mode("overwrite").parquet(s"$path/stats")
    // an in-place rebuild at a served path must not leave v(old)'s
    // corpus constants memoized (same contract as updateFrom)
    statsMemo.remove(path)
  }

  /** ONE tokenize pass → (posting rows incl. `bucket`, 1-row stats) —
    * the math of [[build]], shared verbatim with [[buildVersioned]] so
    * the two layouts cannot drift. */
  private def buildFrames(docs: DataFrame): (DataFrame, DataFrame) = {
    val tf = termFreq(docs)
      .localCheckpoint() // dl, df, AND the postings write all read it
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val rows = tf.join(dl, "doc_id").join(df, "w")
      .withColumn("bucket", bucketCol(col("w")))
      .select(col("w"), col("doc_id"), col("tf"), col("dl"), col("df"),
        col("bucket"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_len"))
    (rows, stats)
  }

  /** [[build]] into a [[VersionedTable]] at `root` instead of a plain
    * directory: postings partitions and the stats side-table publish as
    * ONE atomic snapshot (they must agree — df/n_docs enter the same
    * formula), the contract [[IndexMaintenance.replacePartitions]]'
    * in-place layout cannot give. */
  def buildVersioned(spark: SparkSession, docs: DataFrame,
      root: String, properties: Map[String, String] = Map.empty): Long = {
    val (rows, stats) = buildFrames(docs)
    VersionedTable.publishFull(spark, root, "bucket", rows,
      Map("stats" -> stats), properties)
  }

  /** Incremental maintenance — apply a corpus delta (q100's diff
    * classes: `upserts` = added ∪ changed docs as `(doc_id, text)`,
    * `removedIds` = `(doc_id)` of removed docs) to a built index
    * WITHOUT re-tokenizing the unchanged corpus. Only the delta is
    * tokenized; the rewrite touches exactly the buckets of the
    * AFFECTED terms — every term whose doc-set changed, which is by
    * construction the union of the delta docs' term sets, so every
    * stale row (dropped doc, moved df) lives inside the rewritten
    * partitions and untouched buckets stay byte-identical. df is
    * denormalized, so affected terms' surviving rows are rewritten
    * with `df − removedDocs(w) + addedDocs(w)`; dl rides only on the
    * delta docs' own rows. One pushed-`doc_id IN` read of the old
    * postings recovers the dropped docs' term sets and lengths (the
    * reverse index IS the forward information at delta size; a 100 TB
    * deployment that wants to skip even that keeps a doc→terms
    * manifest beside the index). Stats move by the same deltas.
    * `IndexMaintenanceSpec` pins `updateFrom(v1→v2) == build(v2)` as
    * row-set + stats equality on the planted-v2 fixture. */
  def updateFrom(spark: SparkSession, path: String, upserts: DataFrame,
      removedIds: DataFrame): Unit = {
    val old = spark.read.schema(postingsSchema).parquet(s"$path/postings")
    val oldStats = spark.read.schema(statsSchema).parquet(s"$path/stats")
      .collect().headOption
    val stats1 = (oldStats.map(_.getLong(0)).getOrElse(0L),
      oldStats.filter(!_.isNullAt(1)).map(_.getLong(1)).getOrElse(0L))
    val (affectedBuckets, replacement, newStats) =
      deltaFrames(spark, old, stats1, upserts, removedIds)
    IndexMaintenance.replacePartitions(spark, s"$path/postings", "bucket",
      affectedBuckets, replacement)
    newStats.write.mode("overwrite").parquet(s"$path/stats")
    statsMemo.remove(path) // the artifact at this path is no longer v1
  }

  /** [[updateFrom]] against a [[VersionedTable]] at `root`: the same
    * delta math, but the affected buckets' replacements and the moved
    * stats land as ONE copy-on-write snapshot — readers see the old
    * index or the new one, never postings from v2 scored against v1's
    * corpus constants, and the previous snapshot stays serveable until
    * [[VersionedTable.vacuum]]. Published through
    * [[VersionedTable.retryingPublish]]: the delta is DERIVED from the
    * attempt's own base snapshot, so a concurrent commit (a backfill
    * colliding with the nightly job) makes this recompute against the
    * winner's state and retry instead of dying — or worse, applying
    * df/dl/stats movements computed against a superseded base. */
  def updateFromVersioned(spark: SparkSession, root: String,
      upserts: DataFrame, removedIds: DataFrame,
      properties: Map[String, String] = Map.empty): Long =
    VersionedTable.retryingPublish(spark, root) { snap =>
      val old = VersionedTable.read(spark, snap, root, postingsSchema)
      val s = VersionedTable.readExtra(spark, snap, root, "stats",
        statsSchema).collect().headOption
      val stats1 = (s.map(_.getLong(0)).getOrElse(0L),
        s.filter(!_.isNullAt(1)).map(_.getLong(1)).getOrElse(0L))
      val (affectedBuckets, replacement, newStats) =
        deltaFrames(spark, old, stats1, upserts, removedIds)
      VersionedTable.Delta(affectedBuckets, replacement,
        Map("stats" -> newStats), properties)
    }

  /** The delta math of [[updateFrom]] (doc-set diff → affected buckets,
    * full replacement rows for exactly those buckets, moved corpus
    * stats), factored over an abstract `old` postings frame so the
    * in-place and versioned layouts share it verbatim. */
  private def deltaFrames(spark: SparkSession, old: DataFrame,
      stats1: (Long, Long), upserts: DataFrame,
      removedIds: DataFrame): (Seq[Any], DataFrame, DataFrame) = {
    val dropIds = removedIds.select(col("doc_id"))
      .union(upserts.select(col("doc_id"))).distinct().localCheckpoint()
    // the delta docs' OLD rows: df decrements + dropped dl both come
    // from here — a literal pushed `doc_id IN` predicate (row-group
    // skipping makes the read delta-bounded; join fallback for huge
    // deltas)
    val droppedOld = IndexMaintenance.filterByIds(old, "doc_id", dropIds)
      .localCheckpoint()
    val newTf = termFreq(upserts).localCheckpoint()
    val newDl = newTf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .localCheckpoint()
    val dfMinus = droppedOld.groupBy(col("w"))
      .agg(count(lit(1)).as("minus"))
    val dfPlus = newTf.groupBy(col("w")).agg(count(lit(1)).as("plus"))
    val deltas = dfMinus.join(dfPlus, Seq("w"), "full_outer")
      .select(col("w"), coalesce(col("minus"), lit(0L)).as("minus"),
        coalesce(col("plus"), lit(0L)).as("plus"))
      .localCheckpoint()
    val affectedBuckets = IndexMaintenance.distinctVals(
      deltas.select(bucketCol(col("w")).as("bucket")), "bucket")
    // old df of every affected term — from the FULL postings (a term
    // can gain docs without losing any, so droppedOld alone would
    // reset its count), read bucket-pruned to the affected set; 0 for
    // brand-new terms. df2 = df − minus + plus; a term whose df2 hits
    // 0 has no surviving rows to carry it — it vanishes, as in build
    val oldDf = old.filter(col("bucket").isin(affectedBuckets: _*))
      .join(broadcast(deltas.select(col("w"))), "w")
      .groupBy(col("w")).agg(max(col("df")).as("df_old"))
    val df2 = deltas.join(oldDf, Seq("w"), "left")
      .select(col("w"),
        (coalesce(col("df_old"), lit(0L)) - col("minus") + col("plus"))
          .as("df2"))
      .localCheckpoint()
    // surviving rows of the affected buckets, with moved df values;
    // the bucket filter partition-prunes the read to the rewrite set
    val kept = old
      .filter(col("bucket").isin(affectedBuckets: _*))
      .join(broadcast(dropIds), Seq("doc_id"), "left_anti")
      .join(broadcast(df2), Seq("w"), "left")
      .select(col("w"), col("doc_id"), col("tf"), col("dl"),
        coalesce(col("df2"), col("df")).as("df"), col("bucket"))
    val added = newTf.join(newDl, "doc_id")
      .join(broadcast(df2), "w")
      .select(col("w"), col("doc_id"), col("tf"), col("dl"),
        col("df2").as("df"), bucketCol(col("w")).as("bucket"))
    // corpus constants move by the delta (a doc counts iff it has ≥1
    // token — droppedOld/newDl carry exactly those docs)
    val (n1, len1) = stats1
    val droppedDl = droppedOld.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("len"))
      .collect().head
    val addedDl = newDl
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("len"))
      .collect().head
    import spark.implicits._
    val newStats = Seq((n1 - droppedDl.getLong(0) + addedDl.getLong(0),
        len1 - droppedDl.getLong(1) + addedDl.getLong(1)))
      .toDF("n_docs", "total_len")
    (affectedBuckets, kept.unionByName(added), newStats)
  }

  /** Serve one keyword query from the built artifact: top-`k` docs by
    * Okapi BM25 (k1=1.2, b=0.75, Lucene's +1-inside-the-log IDF),
    * (doc_id, bm25, n_query_terms) in q133's exact shape — rounded
    * score, doc_id tiebreak. The scan is bucket-pruned + term-pushed;
    * everything after it is posting-proportional. */
  def probe(spark: SparkSession, path: String, terms: Seq[String],
      k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val (distinctTerms, mult, buckets) = queryPrep(spark, terms)
    // corpus constants from the per-path memo — LITERALS in the plan,
    // so the only scan left is the pruned postings read
    val (nDocs, totalLen) = corpusStats(spark, path)
    val postings = spark.read.schema(postingsSchema)
      .parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*)) // partition pruning
      .filter(col("w").isin(distinctTerms: _*)) // pushed into the pruned scan
    scorePostings(spark, postings, mult, nDocs, totalLen, k)
  }

  /** [[probe]] against the CURRENT snapshot of a [[VersionedTable]]
    * BM25 index: identical scoring, but bucket pruning is literal path
    * selection off the manifest (only the query terms' partitions are
    * even handed to the scan) and the corpus constants come from the
    * snapshot the postings came from — a mid-probe publish cannot mix
    * versions. Stats memo keyed by (root, version): a new snapshot is
    * a new key, no invalidation protocol needed. */
  def probeVersioned(spark: SparkSession, root: String, terms: Seq[String],
      k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val snap = VersionedTable.currentSnapshot(spark, root).getOrElse(
      throw new IllegalStateException(s"no BM25 snapshot at $root"))
    val (distinctTerms, mult, buckets) = queryPrep(spark, terms)
    val (nDocs, totalLen) = versionedStats(spark, root, snap)
    val postings = VersionedTable.read(spark, snap, root, postingsSchema,
        wanted = Some(buckets))
      .filter(col("w").isin(distinctTerms: _*)) // pushed into each gen scan
    scorePostings(spark, postings, mult, nDocs, totalLen, k)
  }

  /** [[probeVersioned]] with postings AND corpus stats resolved through
    * the NAMED-FORMAT read surface (`spark.read.format("graftvt")` —
    * [[graft.sources.GraftVt]]) instead of library reads: q138's exact
    * query re-served through the DSv1 layer, which must be
    * answer-invariant (q148's driver check shares q138's oracle). The
    * `bucket IN` filter lands in the relation as partition-value
    * pruning — the same literal-dir selection [[probeVersioned]] gets
    * from `wanted` — and the version is PINNED across the two format
    * reads so a mid-probe publish cannot mix postings with another
    * snapshot's stats. Hot serving keeps [[probeVersioned]]'s direct
    * reads (the Row hand-off at a V1 relation boundary exits codegen);
    * this entry exists to prove the interop surface serves the same
    * answers. */
  def probeVersionedViaFormat(spark: SparkSession, root: String,
      terms: Seq[String], k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val snap = VersionedTable.currentSnapshot(spark, root).getOrElse(
      throw new IllegalStateException(s"no BM25 snapshot at $root"))
    val (distinctTerms, mult, buckets) = queryPrep(spark, terms)
    def fmt = spark.read.format("graftvt").option("path", root)
      .option("versionAsOf", snap.version.toString)
    val statsRow = fmt.option("extra", "stats").schema(statsSchema)
      .load().collect().headOption
    val (nDocs, totalLen) = statsRow.map(r =>
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .getOrElse((0L, 0L))
    val postings = fmt.schema(postingsSchema).load()
      .filter(col("bucket").isin(buckets: _*)) // partition-value pruning
      .filter(col("w").isin(distinctTerms: _*)) // row-level re-apply
    scorePostings(spark, postings, mult, nDocs, totalLen, k)
  }

  /** Batched serving — [[probe]] for a query BATCH in ONE postings
    * scan (the lexical rung of the batch matrix: q122 batched brute /
    * q135 batched IVF / q137 batched PQ / this): the scan is pruned to
    * the UNION of the batch's term buckets with the union term list
    * pushed, each surviving posting row joins the broadcast
    * (q_id, w, mult) block — so a posting matched by several queries
    * scores once PER QUERY, with per-query multiplicity — and the
    * per-query top-`k` runs as `row_number ≤ k` over q_id: Spark's
    * map-side `WindowGroupLimit` frontier, the q_id exchange carrying
    * ≤ k·|queries|·partitions rows no matter the corpus. Output
    * (q_id, doc_id, bm25, n_query_terms), totally ordered for the
    * declared form. */
  def probeBatch(spark: SparkSession, path: String,
      queries: Seq[(Long, Seq[String])], k: Int = 20): DataFrame = {
    val (mults, distinctTerms, buckets) = batchPrep(spark, queries)
    val (nDocs, totalLen) = corpusStats(spark, path)
    val postings = spark.read.schema(postingsSchema)
      .parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("w").isin(distinctTerms: _*))
    scoreBatch(spark, postings, mults, nDocs, totalLen, k)
  }

  /** [[probeBatch]] against the CURRENT snapshot of a versioned index —
    * the online serving tier's inner loop: resolve ONE manifest for the
    * whole batch (all queries in a batch see the same snapshot; the
    * rollover boundary is the batch boundary), literal-path-prune to
    * the batch's buckets, serve. [[graft.streaming.StreamingOps]] wraps
    * exactly this per micro-batch. */
  def probeBatchVersioned(spark: SparkSession, root: String,
      queries: Seq[(Long, Seq[String])], k: Int = 20): DataFrame = {
    val snap = VersionedTable.currentSnapshot(spark, root).getOrElse(
      throw new IllegalStateException(s"no BM25 snapshot at $root"))
    val (mults, distinctTerms, buckets) = batchPrep(spark, queries)
    val (nDocs, totalLen) = versionedStats(spark, root, snap)
    val postings = VersionedTable.read(spark, snap, root, postingsSchema,
        wanted = Some(buckets))
      .filter(col("w").isin(distinctTerms: _*))
    scoreBatch(spark, postings, mults, nDocs, totalLen, k)
  }

  private def batchPrep(spark: SparkSession,
      queries: Seq[(Long, Seq[String])])
      : (Seq[(Long, String, Long)], Seq[String], Seq[Int]) = {
    require(queries.nonEmpty, "empty query batch")
    require(queries.forall(_._2.nonEmpty), "a batch query has no terms")
    val mults = queries.flatMap { case (qid, ts) =>
      ts.groupBy(identity).toSeq.map { case (t, occ) =>
        (qid, t, occ.size.toLong) }
    }
    val distinctTerms = queries.flatMap(_._2).distinct
    val buckets = spark.range(1).select(
        distinctTerms.map(t => bucketCol(lit(t))): _*)
      .collect().head.toSeq.map(_.asInstanceOf[Int]).distinct
    (mults, distinctTerms, buckets)
  }

  /** Batch scoring core: [[scorePostings]]' formula keyed by q_id, with
    * the per-query frontier as `row_number ≤ k` (map-side
    * `WindowGroupLimit`) instead of a global TakeOrdered. */
  private def scoreBatch(spark: SparkSession, postings: DataFrame,
      mults: Seq[(Long, String, Long)], nDocs: Long, totalLen: Long,
      k: Int): DataFrame = {
    import spark.implicits._
    val score =
      log((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        (col("tf") * (lit(1.2) + 1.0)) /
        (col("tf") + lit(1.2) *
          (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl")))
    val avgdl = if (nDocs == 0) 0.0 else totalLen.toDouble / nDocs
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("bm25").desc, col("doc_id"))
    postings
      .join(broadcast(mults.toDF("q_id", "w", "mult")), "w")
      .withColumn("avgdl", lit(avgdl))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(graft.functions.Rounding.roundVal(sum(score * col("mult")), 4)
        .as("bm25"),
        sum(col("mult")).as("n_query_terms"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("bm25"),
        col("n_query_terms"))
      .orderBy(col("q_id"), col("bm25").desc, col("doc_id"))
  }

  /** Query-side prep shared by both probes: distinct terms for the scan
    * predicates, per-term multiplicity for q133 parity under duplicated
    * query terms (bm25SearchOf scores one term-column per OCCURRENCE,
    * postings carry each (doc, term) once — so each matched posting is
    * weighted by its term's query multiplicity), and the terms' buckets.
    * The terms are driver literals, but the bucket rule is Spark's
    * xxhash64 — evaluated on a literal frame (LocalTableScan, no file
    * I/O) rather than re-implemented driver-side. */
  private def queryPrep(spark: SparkSession, terms: Seq[String])
      : (Seq[String], Seq[(String, Long)], Seq[Int]) = {
    val distinctTerms = terms.distinct
    val mult = terms.groupBy(identity).toSeq
      .map { case (t, occ) => (t, occ.size.toLong) }
    val buckets = spark.range(1).select(
        distinctTerms.map(t => bucketCol(lit(t))): _*)
      .collect().head.toSeq.map(_.asInstanceOf[Int]).distinct
    (distinctTerms, mult, buckets)
  }

  /** Okapi BM25 scoring over an already-pruned postings frame —
    * (doc_id, bm25, n_query_terms) in q133's exact shape (k1=1.2,
    * b=0.75, Lucene's +1-inside-the-log IDF, rounded score, doc_id
    * tiebreak). Everything here is posting-proportional. */
  private def scorePostings(spark: SparkSession, postings: DataFrame,
      mult: Seq[(String, Long)], nDocs: Long, totalLen: Long,
      k: Int): DataFrame = {
    import spark.implicits._
    val score =
      log((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        (col("tf") * (lit(1.2) + 1.0)) /
        (col("tf") + lit(1.2) *
          (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl")))
    // nDocs == 0 means no postings exist to score — but the avgdl
    // literal still constant-folds eagerly under ANSI, so the 0/0 must
    // be resolved driver-side, not left to the (empty) plan
    val avgdl =
      if (nDocs == 0) 0.0 else totalLen.toDouble / nDocs
    postings
      .join(broadcast(mult.toDF("w", "mult")), "w")
      .withColumn("avgdl", lit(avgdl))
      .groupBy(col("doc_id"))
      .agg(graft.functions.Rounding.roundVal(sum(score * col("mult")), 4)
        .as("bm25"),
        sum(col("mult")).as("n_query_terms"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
