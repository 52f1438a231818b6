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
  * surviving posting row against the broadcast 1-row stats, and
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

  /** Build the index at `path` from a `(doc_id, text)` frame: ONE
    * tokenize pass (q133's lower+space-split token contract), tf per
    * (doc, term), dl/df derived from the tf frame (no second
    * tokenize), everything denormalized into the bucket-partitioned
    * postings. Offline cost: the tokenize plus two tf-frame
    * aggregations and two joins — paid once per corpus. */
  def build(docs: DataFrame, path: String): Unit = {
    val tf = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint() // dl, df, AND the postings write all read it
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    tf.join(dl, "doc_id").join(df, "w")
      .withColumn("bucket", bucketCol(col("w")))
      .select(col("w"), col("doc_id"), col("tf"), col("dl"), col("df"),
        col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings")
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Serve one keyword query from the built artifact: top-`k` docs by
    * Okapi BM25 (k1=1.2, b=0.75, Lucene's +1-inside-the-log IDF),
    * (doc_id, bm25, n_query_terms) in q133's exact shape — rounded
    * score, doc_id tiebreak. The scan is bucket-pruned + term-pushed;
    * everything after it is posting-proportional. */
  def probe(spark: SparkSession, path: String, terms: Seq[String],
      k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "empty query")
    import spark.implicits._
    // q133 parity under DUPLICATED query terms: bm25SearchOf scores one
    // term-column per OCCURRENCE (a doubled term doubles its score and
    // its n_query_terms contribution), while postings carry each
    // (doc, term) once — so each matched posting is weighted by the
    // term's multiplicity in the query. Distinct terms feed the scan
    // predicates; the multiplicity rides as a broadcast k-row join.
    val distinctTerms = terms.distinct
    val mult = terms.groupBy(identity).toSeq
      .map { case (t, occ) => (t, occ.size.toLong) }
    // the terms are driver literals, but the bucket rule is Spark's
    // xxhash64 — evaluate it on a literal frame (LocalTableScan, no
    // file I/O) rather than re-implementing the hash driver-side
    val buckets = spark.range(1).select(
        distinctTerms.map(t => bucketCol(lit(t))): _*)
      .collect().head.toSeq.map(_.asInstanceOf[Int]).distinct
    val stats = spark.read.schema(statsSchema).parquet(s"$path/stats")
    val postings = spark.read.schema(postingsSchema)
      .parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*)) // partition pruning
      .filter(col("w").isin(distinctTerms: _*)) // pushed into the pruned scan
    val score =
      log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        (col("tf") * (lit(1.2) + 1.0)) /
        (col("tf") + lit(1.2) *
          (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl")))
    postings.crossJoin(broadcast(stats))
      .join(broadcast(mult.toDF("w", "mult")), "w")
      .withColumn("avgdl",
        col("total_len").cast("double") / col("n_docs"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.Rounding.roundVal(sum(score * col("mult")), 4)
        .as("bm25"),
        sum(col("mult")).as("n_query_terms"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
