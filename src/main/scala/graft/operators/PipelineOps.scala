package graft.operators

import graft.{GraftSession, Op, OpCatalog, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation pipeline operators (north-star §2.3 family,
  * beyond the reference's own surface): TF-IDF salient-term extraction,
  * deterministic stratified sampling, a quality-filter funnel, and a
  * length histogram — the compose-into-a-curation-run shapes a 100 TB
  * corpus pipeline needs around the dedup/similarity ladder in
  * [[TextOps]]/[[VectorOps]].
  *
  * All four are oracle-declared: every predicate and score is either pure
  * integer arithmetic (hash-exact across engines) or a single
  * `round(·,4)` double computed from identical integer inputs.
  */
object PipelineOps extends OpCatalog {

  /** Exploded (doc_id, word) tokens — same lower+space-split contract as
    * [[TextOps]] (`string_split(lower(text), ' ')` on the DuckDB side). */
  private def tok(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("word"))

  // ---------------------------------------------------------------- q63
  /** TF-IDF salient terms: each document's single most salient word — the
    * keyword-extraction shape of a relevance/topicality scorer. Classic
    * two-pass formulation: per-(doc,word) tf, then per-word df over the tf
    * frame (one extra agg, no second tokenize), then a per-doc top-1 by
    * salience. The rank orders by (tf DESC, df ASC, word) — the integer
    * keys TF-IDF is monotone in — never by the double score itself, so
    * cross-engine `ln` rounding can't flip row membership; the reported
    * score `tf · ln((N+1)/(df+1))` is one rounded double from identical
    * integer inputs in both engines. (An earlier absolute-threshold form,
    * `tf >= 3 AND df*10 <= n`, matched its oracle with ZERO rows on the
    * synthetic corpus — a vacuous pass. Top-1-per-doc always compares one
    * real row per document at any SF.)
    *
    * Scale: two shuffles (tf by (doc,word), df by word), an equi-join on
    * word, and one window partitioned by doc_id. The df side is
    * vocabulary-sized — orders of magnitude smaller than the corpus — and
    * AQE broadcasts it when it fits; the N scalar is an explicit
    * broadcast. The window re-uses the tf shuffle's doc_id clustering;
    * nothing here is quadratic in docs. */
  def salientTerms(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val tf = tok(spark, sfDir)
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n"))
    val rank = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("word").asc)
    tf.join(df, "word")
      .crossJoin(broadcast(n))
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        round(col("tf") * log((col("n") + 1.0) / (col("df") + 1.0)), 4)
          .as("tfidf"))
      .orderBy(col("doc_id"))
  }

  private val salientTermsSql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      |  FROM documents),
      |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word),
      |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
      |n AS (SELECT count(*) AS n FROM documents)
      |SELECT doc_id, word, tf, df,
      |  round(tf * ln((n + 1.0) / (df + 1.0)), 4) AS tfidf
      |FROM (SELECT t.doc_id, t.word, t.tf, d.df, n.n,
      |        row_number() OVER (PARTITION BY t.doc_id
      |          ORDER BY t.tf DESC, d.df ASC, t.word ASC) AS rn
      |      FROM tf t JOIN df d USING (word) CROSS JOIN n)
      |WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Deterministic stratified sampling: an LCG hash of the stable doc id
    * (`(id·1103515245 + 12345) mod 1000 < 200` → ~20%) selects the sample,
    * reported per language stratum. Hash-mod sampling is THE reproducible
    * sampling primitive at scale: a narrow map-side predicate — no
    * shuffle, no RNG state, no driver coordination — the same rows are
    * chosen on any cluster, any partitioning, any run. */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val sampled = pmod(col("doc_id") * 1103515245L + 12345L, lit(1000L)) < 200
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(sampled, 1L).otherwise(0L)).as("n_sampled"),
        min(when(sampled, col("doc_id"))).as("first_sampled"),
        max(when(sampled, col("doc_id"))).as("last_sampled"))
      .select(col("lang"), col("n_total"), col("n_sampled"),
        round(col("n_sampled") / col("n_total").cast("double"), 4)
          .as("sample_rate"),
        col("first_sampled"), col("last_sampled"))
      .orderBy(col("lang"))
  }

  private val stratifiedSampleSql =
    """SELECT lang, n_total, n_sampled,
      |  round(n_sampled / CAST(n_total AS DOUBLE), 4) AS sample_rate,
      |  first_sampled, last_sampled
      |FROM (
      |  SELECT lang, count(*) AS n_total,
      |    CAST(sum(CASE WHEN (doc_id * 1103515245 + 12345) % 1000 < 200
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |    min(CASE WHEN (doc_id * 1103515245 + 12345) % 1000 < 200
      |             THEN doc_id END) AS first_sampled,
      |    max(CASE WHEN (doc_id * 1103515245 + 12345) % 1000 < 200
      |             THEN doc_id END) AS last_sampled
      |  FROM documents GROUP BY lang)
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q65
  /** Quality-filter funnel: how many documents survive each curation
    * stage — length floor, token floor, mean-token-length band (the
    * gibberish/boilerplate heuristic), then exact content dedup among the
    * survivors. The avg-token-length band is evaluated in INTEGER form
    * (`3n ≤ Σlen ≤ 12n`), so every stage count is hash-exact. One scan,
    * one aggregate (plus the distinct-rewrite for the dedup column) — the
    * funnel shape stays a single pass no matter the corpus size. */
  def qualityFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val d = Tables.documents(spark, sfDir)
      .withColumn("w", split(lower(col("text")), " "))
      .withColumn("n_tok", size(col("w")))
      .withColumn("sum_len",
        expr("aggregate(w, 0, (acc, x) -> acc + length(x))"))
    val s1 = col("n_chars") >= 200
    val s2 = s1 && col("n_tok") >= 30
    val s3 = s2 && col("sum_len") >= col("n_tok") * 3 &&
      col("sum_len") <= col("n_tok") * 12
    d.agg(count(lit(1)).as("n_input"),
        sum(when(s1, 1L).otherwise(0L)).as("n_after_length"),
        sum(when(s2, 1L).otherwise(0L)).as("n_after_tokens"),
        sum(when(s3, 1L).otherwise(0L)).as("n_after_toklen"),
        countDistinct(when(s3, lower(col("text")))).as("n_after_dedup"))
  }

  private val qualityFunnelSql =
    """SELECT count(*) AS n_input,
      |  CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_after_length,
      |  CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_after_tokens,
      |  CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_after_toklen,
      |  count(DISTINCT CASE WHEN s3 THEN lower(text) END) AS n_after_dedup
      |FROM (
      |  SELECT text,
      |    s1, s1 AND n_tok >= 30 AS s2,
      |    s1 AND n_tok >= 30 AND sum_len BETWEEN n_tok * 3 AND n_tok * 12 AS s3
      |  FROM (
      |    SELECT text, n_chars >= 200 AS s1,
      |      len(string_split(lower(text), ' ')) AS n_tok,
      |      list_sum(list_transform(string_split(lower(text), ' '),
      |        x -> length(x))) AS sum_len
      |    FROM documents))""".stripMargin

  // ---------------------------------------------------------------- q66
  /** Corpus length histogram: 200-char buckets capped at bucket 9 — the
    * length-distribution profile every curation run starts from. Pure
    * integer bucketing (single partial-agg shuffle of ≤10 groups). */
  def lengthHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    Tables.documents(spark, sfDir)
      .groupBy(least(floor(col("n_chars") / 200), lit(9L)).as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("bucket"))
  }

  private val lengthHistogramSql =
    """SELECT least(n_chars // 200, 9) AS bucket, count(*) AS n_docs,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM documents
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("q63_salient_terms", salientTerms, Some(salientTermsSql),
      "TF-IDF salient-term extraction (top-1 per doc, integer-exact rank)"),
    Op("q64_stratified_sample", stratifiedSample, Some(stratifiedSampleSql),
      "deterministic hash-mod stratified sampling per language"),
    Op("q65_quality_funnel", qualityFunnel, Some(qualityFunnelSql),
      "curation funnel: length/token/token-length filters + exact dedup counts"),
    Op("q66_length_histogram", lengthHistogram, Some(lengthHistogramSql),
      "corpus length histogram, 200-char integer buckets"))
}
