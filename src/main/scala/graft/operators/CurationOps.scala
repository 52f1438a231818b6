package graft.operators

import graft.{GraftSession, Op, OpCatalog, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-governance operators for the curation pipeline (round 5):
  * per-source document caps, cross-doc boilerplate n-gram detection,
  * deterministic content-hash train/valid/test splits, and the token
  * frequency spectrum — the "who gets into the corpus, and how is it
  * carved up" layer that sits above [[TextOps]]' dedup ladder in a web-
  * scale ingest (reference scope: the importer loads whole files
  * verbatim, `app.py:96-106`; these govern WHAT is worth loading).
  *
  * All four are oracle-declared: every decision predicate is integer
  * arithmetic (LCG / md5-hex-nibble hashes, `k·df ≥ n` threshold forms)
  * so both engines agree bit-for-bit, and every emitted double is one
  * [[roundVal]] (`floor(x·1e4+0.5)/1e4`) of a ratio of exact integers —
  * the floor form, not SQL `round`, because Spark and DuckDB `round`
  * genuinely disagree on half-way doubles and integer ratios land on
  * exactly those (see [[roundKey]]).
  */
object CurationOps extends OpCatalog {

  /** Exploded (source, doc_id, word) tokens — same lower+space-split
    * contract as [[TextOps]]/[[PipelineOps]] (`string_split(lower(text),
    * ' ')` on the DuckDB side). */
  private def tok(spark: SparkSession, sfDir: String): DataFrame =
    GraftSession.spread(Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("source"), col("doc_id"),
        split(lower(col("text")), " ").as("w"))

  // ---------------------------------------------------------------- q94
  /** Per-source document cap — the domain-cap of a web crawl curation run
    * (no single site may contribute more than CAP documents). Survivors
    * are chosen by a deterministic hash priority, NOT arrival order, so
    * the kept set is stable under corpus re-partitioning and re-runs:
    * priority `h = ((doc_id mod 2³¹)·1103515245 + 12345) mod 1e9+7`
    * ([[lcgPriority]] — the fixture LCG family q64 established),
    * total-ordered by `(h, doc_id)`.
    *
    * Scale shape: a per-key top-K is the canonical SKEWED window — one
    * hot domain (the real distribution is Zipfian) would naively sort its
    * entire partition on one task. Spark's `InferWindowGroupLimit` rule
    * makes the declarative form skew-safe BY ITSELF: the `rn ≤ CAP`
    * filter over a `row_number` window compiles to a
    * `WindowGroupLimit(Partial)` BELOW the exchange (each map task keeps
    * only its local top-CAP per source, a bounded-heap pass) and a
    * `Final` one above it, so the hot key's reducer receives at most
    * tasks·CAP rows, never the domain's full row count. A hand-salted
    * two-level window was written first and benchmarked structurally: it
    * produces the identical kept set but adds a whole extra exchange on
    * `(source, salt)` — the optimizer's map-side prune already IS the
    * salting. `CurationOpsSpec` pins the Partial-below-exchange plan
    * shape so a regression (e.g. a non-rank predicate defeating the
    * rule) fails loudly. */
  def sourceCap(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    sourceCapOf(Tables.documents(spark, sfDir), cap = 150)
  }

  /** The deterministic LCG priority shared by q64/q94/q99 (and replayed
    * verbatim in their oracles): `((doc_id mod 2³¹)·1103515245 + 12345)
    * mod modulus`. The id is reduced mod 2³¹ BEFORE the multiply: the
    * raw product wraps BIGINT once doc_id exceeds ~8.4e9 — wrapping
    * silently in Spark but ERRORING in the DuckDB twin, so the oracle
    * contract would die at exactly the corpus sizes the
    * "same rows on any cluster, any run" guarantee exists for. The
    * reduction is the identity at fixture scale (every fixture id
    * < 2³¹) and keeps the product ≤ 2³¹·1103515245 < 2⁶³. */
  private[graft] def lcgPriority(modulus: Long)
      : org.apache.spark.sql.Column =
    pmod(pmod(col("doc_id"), lit(2147483648L)) * lit(1103515245L)
      + lit(12345L), lit(modulus))

  /** Content-hash split bucket + split label — ONE definition for the
    * q96/q99/q110 "same document, same split, everywhere" invariant
    * (`bucket = last-4-hex-nibbles of md5(text) mod 100`; <90 train,
    * <95 valid, else test). The three consumers previously carried
    * hand-copied clones of this expression; an edit to the nibble
    * offset or the 90/95 thresholds in one of them would silently
    * desync the cross-query split — the exact drift [[plantedV2]] was
    * factored out to prevent. */
  private[graft] def splitBucket: Column = pmod(
    conv(substring(md5(col("text")), 29, 4), 16, 10).cast("long"), lit(100L))

  /** The split label over [[splitBucket]] — q96/q99/q110's shared CASE. */
  private[graft] def splitLabel: Column =
    when(splitBucket < 90, "train").when(splitBucket < 95, "valid")
      .otherwise("test")

  /** Cross-engine half-up rounding — [[graft.functions.Rounding]] is
    * the canonical definition (and the WHY: Spark and DuckDB SQL
    * `round(DOUBLE, n)` genuinely disagree on half-way doubles, which
    * integer ratios land on). Local aliases for this file's dense use. */
  private[graft] def roundKey(c: Column, scale: Int): Column =
    graft.functions.Rounding.roundKey(c, scale)
  private[graft] def roundVal(c: Column, scale: Int): Column =
    graft.functions.Rounding.roundVal(c, scale)
  private[graft] def roundKeySql(e: String, scale: Int): String =
    graft.functions.Rounding.roundKeySql(e, scale)
  private[graft] def roundValSql(e: String, scale: Int): String =
    graft.functions.Rounding.roundValSql(e, scale)

  /** Core of q94 over any (source, doc_id) frame — spec entry point. */
  private[graft] def sourceCapOf(docs: DataFrame, cap: Int): DataFrame = {
    val h = lcgPriority(1000000007L)
    val global = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    docs.select(col("source"), col("doc_id")).withColumn("h", h)
      .withColumn("rn", row_number().over(global).cast("long"))
      .filter(col("rn") <= cap)
      .select(col("source"), col("doc_id"), col("rn"))
      .orderBy(col("source"), col("rn"))
  }

  private val sourceCapSql =
    """SELECT source, doc_id, rn FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY ((doc_id % 2147483648)*1103515245 + 12345) % 1000000007,
      |        doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 150
      |ORDER BY source, rn""".stripMargin

  // ---------------------------------------------------------------- q95
  /** Cross-doc boilerplate n-grams per source: token 3-grams shared by
    * many documents of the SAME source are navigation chrome / legal
    * footers / templating, not content (the line-level dedup insight of
    * CCNet, at shingle granularity because the fixture corpus is
    * single-line). Reports each source's top-3 grams by document
    * frequency with the boilerplate verdict `5·df ≥ n_src` (df-rate
    * ≥ 20%) — in INTEGER form, so the flag is hash-exact cross-engine.
    *
    * Scale: distinct-(source, doc, gram) then two aggs — all shuffles
    * key on gram-bearing composites (no hot single key); the per-source
    * doc-count side is sources-sized and broadcast by AQE. The top-3
    * window sees vocabulary-sized rows per source, never corpus-sized. */
  def boilerplateNgrams(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val grams = tok(spark, sfDir)
      .select(col("source"), col("doc_id"),
        graft.functions.NGramGenerator.ngrams(col("w"), 3)
          .as(Seq("pos", "ngram")))
      .select(col("source"), col("doc_id"), col("ngram"))
      .distinct()
    val df = grams.groupBy(col("source"), col("ngram"))
      .agg(count(lit(1)).as("df"))
    val nSrc = Tables.documents(spark, sfDir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val top = Window.partitionBy(col("source"))
      .orderBy(col("df").desc, col("ngram").asc)
    df.join(nSrc, "source")
      .withColumn("rn", row_number().over(top))
      .filter(col("rn") <= 3)
      .select(col("source"), col("ngram"), col("df"), col("n_src"),
        roundVal(col("df") / col("n_src").cast("double"), 4).as("df_rate"),
        (col("df") * 5 >= col("n_src")).as("is_boilerplate"))
      .orderBy(col("source"), col("df").desc, col("ngram"))
  }

  private val boilerplateNgramsSql =
    """WITH tok AS (
      |  SELECT source, doc_id, string_split(lower(text), ' ') AS w
      |  FROM documents),
      |g AS (
      |  SELECT DISTINCT source, doc_id,
      |    unnest(list_transform(range(1, len(w) - 1),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS ngram
      |  FROM tok),
      |df AS (SELECT source, ngram, count(*) AS df FROM g GROUP BY 1, 2),
      |ns AS (SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
      |r AS (
      |  SELECT df.source, ngram, df, n_src,
      |    row_number() OVER (PARTITION BY df.source
      |      ORDER BY df DESC, ngram) AS rn
      |  FROM df JOIN ns ON df.source = ns.source)
      |SELECT source, ngram, df, n_src,
      |  floor((df / CAST(n_src AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS df_rate,
      |  df * 5 >= n_src AS is_boilerplate
      |FROM r WHERE rn <= 3
      |ORDER BY source, df DESC, ngram""".stripMargin

  // ---------------------------------------------------------------- q96
  /** Deterministic train/valid/test split audit. Assignment hashes the
    * CONTENT, not the row id: bucket = last-4-hex-nibbles of md5(text)
    * mod 100 → <90 train, <95 valid, else test — so a document keeps its
    * split across re-shards, re-crawls and pipeline re-runs (the
    * leakage-safety property; an id- or position-based split reassigns
    * docs whenever upstream ordering changes, silently moving training
    * text into eval). Reports per-(split, lang) counts and the
    * within-lang share — the stratification audit that shows a pure
    * hash split self-stratifies at corpus scale.
    *
    * Cross-engine: md5 hex is identical in both engines (q38
    * established); the nibble slice is parsed with `conv(·,16,10)` /
    * `'0x·'::BIGINT`, integer thereafter. Scale: one scan, one agg;
    * the window runs over ≤ |splits|·|langs| rows. */
  def splitAssign(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    splitAssignOf(Tables.documents(spark, sfDir))
  }

  /** Core of q96 over any (text, lang) frame — spec entry point. */
  private[graft] def splitAssignOf(docs: DataFrame): DataFrame = {
    val lang = Window.partitionBy(col("lang"))
    docs
      .withColumn("split", splitLabel)
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lang_total", sum(col("n")).over(lang))
      .select(col("split"), col("lang"), col("n"), col("lang_total"),
        roundVal(col("n") / col("lang_total").cast("double"), 4).as("share"))
      .orderBy(col("split"), col("lang"))
  }

  private val splitAssignSql =
    """WITH b AS (
      |  SELECT lang,
      |    ('0x' || substr(md5(text), 29, 4))::BIGINT % 100 AS bucket
      |  FROM documents),
      |s AS (
      |  SELECT CASE WHEN bucket < 90 THEN 'train'
      |              WHEN bucket < 95 THEN 'valid'
      |              ELSE 'test' END AS split, lang FROM b),
      |c AS (SELECT split, lang, count(*) AS n FROM s GROUP BY 1, 2)
      |SELECT split, lang, n,
      |  CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS lang_total,
      |  floor((n / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE))
      |    * 1e4 + 0.5) / 1e4
      |    AS share
      |FROM c ORDER BY split, lang""".stripMargin

  // ---------------------------------------------------------------- q97
  /** Token frequency spectrum (frequency-of-frequencies): for each corpus
    * frequency c, how many word types occur exactly c times. The hapax
    * row (c=1) over the vocabulary total is the classic OCR-garbage /
    * tokenizer-damage tripwire, and the spectrum's Zipf tail is what
    * vocabulary-size planning reads. Share is each row's fraction of the
    * vocabulary.
    *
    * Scale: the spectrum is two map-side-combining aggs (corpus → word
    * counts → count-of-counts); the frame entering the second agg is
    * vocabulary-sized and its output is O(distinct frequencies) — tiny.
    * The vocabulary total rides in as a broadcast 1-row frame (q63's N
    * pattern), not a global window. */
  def tokenFreqSpectrum(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val wc = tok(spark, sfDir)
      .select(explode(col("w")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val vocab = wc.agg(count(lit(1)).as("vocab"))
    wc.groupBy(col("freq")).agg(count(lit(1)).as("n_types"))
      .crossJoin(broadcast(vocab))
      .select(col("freq"), col("n_types"), col("vocab"),
        roundVal(col("n_types") / col("vocab").cast("double"), 4).as("share"))
      .orderBy(col("freq"))
  }

  private val tokenFreqSpectrumSql =
    """WITH tok AS (
      |  SELECT unnest(string_split(lower(text), ' ')) AS word
      |  FROM documents),
      |wc AS (SELECT word, count(*) AS freq FROM tok GROUP BY 1),
      |sp AS (SELECT freq, count(*) AS n_types FROM wc GROUP BY 1),
      |v AS (SELECT count(*) AS vocab FROM wc)
      |SELECT freq, n_types, vocab,
      |  floor((n_types / CAST(vocab AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS share
      |FROM sp, v ORDER BY freq""".stripMargin

  // ---------------------------------------------------------------- q98
  /** Greedy k-center diversity coreset over the embedding corpus — the
    * coverage-maximizing sample of coreset-selection literature (pick
    * the point farthest from everything picked so far; the k selected
    * centers 2-approximate the optimal k-center cover). Reports each
    * seed with the covering radius at its selection (the max-min
    * distance it closed) and how many corpus vectors assign to it.
    *
    * Cross-engine determinism is the interesting part: selection argmax
    * and assignment argmin both order by the ROUNDED distance with a
    * total-order `vec_id` tiebreak — the q63 rule: rank on the exact
    * value you output — so last-ulp sum differences between engines
    * (the SQL twin sums dims in GROUP BY order, Spark in-row) are
    * absorbed by the key's 10⁻⁴ granularity. The rounding is
    * [[roundKey]]'s floor form, NOT SQL `round`: Spark and DuckDB
    * `round(DOUBLE, 4)` genuinely disagree on half-way doubles (see
    * [[roundKey]]'s scaladoc), so a `round` key could flip a pick even
    * on bit-identical distances; the floor form is the same IEEE ops in
    * both engines and in the driver-side radius below. Distances are
    * squared L2 computed in-row over doubles (no cross-row float
    * accumulation); the oracle replays all 8 selection steps as
    * mechanically-generated SQL CTEs.
    *
    * Scale: greedy k-center is O(n·k) scans BY DESIGN — each iteration
    * is one broadcast-literal compare + `TakeOrderedAndProject` (never a
    * full sort), and the running min-distance column updates in place
    * with `least(...)`, checkpointed per round like the IVF trainer. At
    * 100 TB the same loop runs over a uniform sample or the
    * [[IvfIndex]] centroid table (coreset-of-coreset), and k stays
    * human-sized; the assignment pass is one broadcast of k·dim floats
    * and a packed-long argmin that stays in HashAggregate (q92's
    * pattern). The k driver-side 1-row collects are the k-centroids
    * broadcast pattern, not a data collect. */
  def diversityCoreset(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    diversityCoresetOf(Tables.embeddings(spark, sfDir), k = 8)
  }

  /** ONE squared-L2 definition engine-wide: the accumulation order and
    * cast placement drive cross-engine argmin stability (the scaladoc
    * above), so q98 shares [[VectorOps.sqDist]] rather than keeping a
    * drift-prone local copy. */
  private def sqDist(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    VectorOps.sqDist(a, b)

  /** Core of q98 over any (vec_id, embedding) frame — spec entry point. */
  private[graft] def diversityCoresetOf(e: DataFrame, k: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val corpus = e.select(col("vec_id"), col("embedding")).localCheckpoint()
    def embOf(row: org.apache.spark.sql.Row): Array[Float] =
      row.getAs[scala.collection.Seq[Float]]("embedding").toArray
    // seed 1: smallest vec_id (pure convention, total-ordered)
    val first = corpus.orderBy(col("vec_id")).limit(1).collect()(0)
    var centers = Vector((1, first.getLong(0), Option.empty[Double], embOf(first)))
    var frame = corpus
      .withColumn("mind", sqDist(col("embedding"), typedlit(centers.head._4)))
      .localCheckpoint()
    for (rank <- 2 to k) {
      val next = frame
        .orderBy(roundKey(col("mind"), 4).desc, col("vec_id").asc)
        .limit(1).collect()(0)
      val emb = embOf(next)
      // radius = the SAME floor-form rounding the rank key used (one
      // definition: rank on the exact value you output)
      centers :+= ((rank, next.getLong(0),
        Some(graft.functions.Rounding.roundValDouble(next.getDouble(2), 4)), emb))
      frame = frame
        .withColumn("mind",
          least(col("mind"), sqDist(col("embedding"), typedlit(emb))))
        .localCheckpoint()
    }
    val centerDf = broadcast(
      centers.map { case (r, id, rad, em) => (r.toLong, id, rad, em) }
        .toDF("seed_rank", "center_id", "radius", "center_emb"))
    // assignment: packed (floor(d²·1e4+0.5), seed_rank) argmin per
    // vector — stays in HashAggregate (k ≤ 15 fits the low nibble)
    val packed = corpus.crossJoin(centerDf)
      .select(col("vec_id"), col("seed_rank"),
        (roundKey(sqDist(col("embedding"), col("center_emb")), 4)
          .cast("long") * 16L + col("seed_rank")).as("pk"))
      .groupBy(col("vec_id")).agg(min(col("pk")).as("pk"))
      .select(pmod(col("pk"), lit(16L)).as("seed_rank"))
      .groupBy(col("seed_rank")).agg(count(lit(1)).as("n_assigned"))
    centerDf.select(col("seed_rank"), col("center_id"), col("radius"))
      .join(packed, Seq("seed_rank"), "left")
      .select(col("seed_rank"), col("center_id"), col("radius"),
        coalesce(col("n_assigned"), lit(0L)).as("n_assigned"))
      .orderBy(col("seed_rank"))
  }

  /** Mechanically-generated 8-step replay of the greedy selection: CTE
    * `c<i>` picks step i's argmax of the running min-distance `m<i-1>`
    * by `(floor(mind·1e4+0.5) DESC, vec_id)` — [[roundKeySql]], the
    * same floor-form key the Spark loop ranks on — `d<i>`/`m<i>` fold
    * the new center's distances in with `least`. */
  private val diversityCoresetSql: String = {
    val steps = (2 to 8).map { i =>
      s"""d$i AS (
         |  SELECT a.vec_id, sum((a.v - b.v)*(a.v - b.v)) AS d
         |  FROM dims a JOIN dims b ON a.i = b.i
         |    AND b.vec_id = (SELECT id FROM c$i)
         |  GROUP BY a.vec_id),
         |m$i AS (
         |  SELECT m.vec_id, least(m.mind, d$i.d) AS mind
         |  FROM m${i - 1} m JOIN d$i ON m.vec_id = d$i.vec_id)""".stripMargin
    }
    val picks = (2 to 8).map { i =>
      s"""c$i AS (
         |  SELECT vec_id AS id, ${roundValSql("mind", 4)} AS r FROM m${i - 1}
         |  ORDER BY ${roundKeySql("mind", 4)} DESC, vec_id LIMIT 1)""".stripMargin
    }
    // interleave: c2 needs m1; d2/m2 need c2; c3 needs m2; ...
    val chain = (2 to 8).map(i => picks(i - 2) + ",\n" + steps(i - 2))
      .mkString(",\n")
    val centerRows = (2 to 8)
      .map(i => s"UNION ALL SELECT $i, (SELECT id FROM c$i), (SELECT r FROM c$i)")
      .mkString("\n")
    s"""WITH dims AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
       |    generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |c1 AS (SELECT min(vec_id) AS id FROM embeddings),
       |d1 AS (
       |  SELECT a.vec_id, sum((a.v - b.v)*(a.v - b.v)) AS d
       |  FROM dims a JOIN dims b ON a.i = b.i
       |    AND b.vec_id = (SELECT id FROM c1)
       |  GROUP BY a.vec_id),
       |m1 AS (SELECT vec_id, d AS mind FROM d1),
       |$chain,
       |centers AS (
       |  SELECT 1 AS seed_rank, (SELECT id FROM c1) AS center_id,
       |    CAST(NULL AS DOUBLE) AS radius
       |$centerRows),
       |cd AS (
       |  SELECT a.vec_id, c.seed_rank,
       |    sum((a.v - b.v)*(a.v - b.v)) AS d
       |  FROM dims a
       |  JOIN centers c ON true
       |  JOIN dims b ON b.vec_id = c.center_id AND a.i = b.i
       |  GROUP BY a.vec_id, c.seed_rank),
       |asg AS (
       |  SELECT vec_id, seed_rank,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY ${roundKeySql("d", 4)}, seed_rank) AS rn
       |  FROM cd)
       |SELECT c.seed_rank, c.center_id, c.radius,
       |  CAST(coalesce(count(a.vec_id), 0) AS BIGINT) AS n_assigned
       |FROM centers c
       |LEFT JOIN (SELECT * FROM asg WHERE rn = 1) a ON a.seed_rank = c.seed_rank
       |GROUP BY c.seed_rank, c.center_id, c.radius
       |ORDER BY c.seed_rank""".stripMargin
  }

  // ---------------------------------------------------------------- q99
  /** The composed curation run — every governance stage in one declared
    * plan, in production order: quality gate (q65's integer-form
    * predicates: `n_chars ≥ 200`, `n_tok ≥ 30`, `3·n_tok ≤ Σlen ≤
    * 12·n_tok`) → exact content dedup (first-doc_id survivor per
    * `lower(text)`, q31's policy) → per-source cap (q94's LCG-priority
    * rule, cap 100) → content-hash split (q96's md5 buckets) → per-
    * (split, lang) doc and token counts. The point is operator
    * COMPOSITION: four window/filter stages chain in one plan with no
    * materialization between them, every decision integer-exact so the
    * whole pipeline is one oracle CTE chain.
    *
    * Scale: one scan; the dedup window keys on the content hash, the cap
    * window on source (both `WindowGroupLimit`-prunable rank-1/rank-≤k
    * filters), the final rollup is a grid-sized agg. Stage order
    * matters at 100 TB and is the cheap-first order a real run uses:
    * the map-only quality gate drops rows BEFORE any shuffle, dedup
    * halves the cap window's input, and the split hash touches only
    * survivors. */
  def curationPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val d = Tables.documents(spark, sfDir)
      .withColumn("w", split(lower(col("text")), " "))
      .withColumn("n_tok", size(col("w")))
      .withColumn("sum_len",
        expr("aggregate(w, 0, (acc, x) -> acc + length(x))"))
      .filter(col("n_chars") >= 200 && col("n_tok") >= 30 &&
        col("sum_len") >= col("n_tok") * 3 &&
        col("sum_len") <= col("n_tok") * 12)
    val dedup = Window.partitionBy(lower(col("text"))).orderBy(col("doc_id"))
    val capW = Window.partitionBy(col("source"))
      .orderBy(lcgPriority(1000000007L), col("doc_id"))
    d.withColumn("drn", row_number().over(dedup)).filter(col("drn") === 1)
      .withColumn("crn", row_number().over(capW)).filter(col("crn") <= 100)
      .withColumn("split", splitLabel)
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy(col("split"), col("lang"))
  }

  private val curationPipelineSql =
    """WITH base AS (
      |  SELECT doc_id, text, lang, source, n_chars,
      |    string_split(lower(text), ' ') AS w
      |  FROM documents),
      |quality AS (
      |  SELECT doc_id, text, lang, source,
      |    len(w) AS n_tok,
      |    list_sum(list_transform(w, x -> len(x))) AS sum_len
      |  FROM base
      |  WHERE n_chars >= 200 AND len(w) >= 30
      |    AND list_sum(list_transform(w, x -> len(x))) >= len(w) * 3
      |    AND list_sum(list_transform(w, x -> len(x))) <= len(w) * 12),
      |dedup AS (
      |  SELECT * FROM (
      |    SELECT quality.*,
      |      row_number() OVER (PARTITION BY lower(text)
      |        ORDER BY doc_id) AS drn
      |    FROM quality)
      |  WHERE drn = 1),
      |capped AS (
      |  SELECT * FROM (
      |    SELECT dedup.*,
      |      row_number() OVER (PARTITION BY source
      |        ORDER BY ((doc_id % 2147483648)*1103515245 + 12345) % 1000000007,
      |          doc_id) AS crn
      |    FROM dedup)
      |  WHERE crn <= 100),
      |assigned AS (
      |  SELECT lang, n_tok,
      |    CASE WHEN ('0x' || substr(md5(text), 29, 4))::BIGINT % 100 < 90
      |           THEN 'train'
      |         WHEN ('0x' || substr(md5(text), 29, 4))::BIGINT % 100 < 95
      |           THEN 'valid'
      |         ELSE 'test' END AS split
      |  FROM capped)
      |SELECT split, lang, count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |FROM assigned GROUP BY split, lang
      |ORDER BY split, lang""".stripMargin

  /** THE planted snapshot v2 — one definition for the whole incremental
    * family (q100 diff, q108 drift, q110 incremental re-run, q111 KS,
    * q121 sketch distinct), which all describe the SAME pair of
    * snapshots: from base (v1), docs with `doc_id % 89 = 0` are dropped,
    * `% 97 = 0` have their text rewritten (`+" rev2"`), and re-crawls of
    * `% 101 = 0` docs arrive again as new ids (+1000000) with their
    * original text. Hand-copying this rule per query is how the "one
    * consistent incremental world" invariant (and the cross-query
    * reconciliation CurationOpsSpec asserts) would silently desync —
    * every consumer now projects from this ONE frame; only the per-query
    * SQL twins spell the rule out again, per dialect, for the oracle. */
  private[graft] def plantedV2(base: DataFrame): DataFrame =
    base.filter(pmod(col("doc_id"), lit(89L)) =!= 0)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(97L)) === 0,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      .unionByName(base.filter(pmod(col("doc_id"), lit(101L)) === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))

  /** q100's diff CLASSES as consumable frames — the honest hash-diff
    * every maintenance consumer (q136/q138 index deltas, the streaming
    * rollover, the maintenance specs) feeds from, in ONE definition
    * (the [[plantedV2]] rationale: hand-copied diff logic silently
    * desyncs). Null-safe via PRESENCE flags, not hash comparison alone:
    * `md5(null)` is null, so a live doc with null text would look
    * "absent" under a bare h-is-null test — the in1/in2 flags classify
    * it correctly (its unchanged re-delivery is a no-op upsert).
    * Returns (upserts = added ∪ changed rows of v2, removed ids). */
  private[graft] def hashDiff(v1: DataFrame, v2: DataFrame)
      : (DataFrame, DataFrame) = {
    val d = v1.select(col("doc_id"), md5(col("text")).as("h1"),
        lit(true).as("in1"))
      .join(v2.select(col("doc_id"), md5(col("text")).as("h2"),
        lit(true).as("in2")), Seq("doc_id"), "full_outer")
    val removed = d.filter(col("in2").isNull).select(col("doc_id"))
    val upsertIds = d.filter(col("in2").isNotNull &&
      (col("in1").isNull || !(col("h1") <=> col("h2"))))
      .select(col("doc_id"))
    (v2.join(upsertIds, "doc_id"), removed)
  }

  // --------------------------------------------------------------- q100
  /** Corpus snapshot diff — the incremental-processing primitive: given
    * crawl v1 and crawl v2, classify every doc_id as added / removed /
    * changed / unchanged by content hash, so downstream stages (dedup,
    * embedding, indexing) re-run over `added ∪ changed` instead of the
    * whole corpus. v2 is simulated from the fixture deterministically
    * (the q77 planted-delivery precedent — the fixture has only one
    * snapshot): docs with `doc_id % 89 = 0` are dropped, `% 97 = 0`
    * rewritten, and re-crawls of `% 101 = 0` docs arrive as new ids
    * (+1000000). Reports per-status doc counts and id ranges.
    *
    * Scale: ONE full-outer equi-join on the primary key — at 100 TB both
    * snapshots are bucketed/partitioned by doc_id, so the diff is a
    * co-partitioned zip with no shuffle; content compare is md5 (already
    * stored in a real snapshot manifest, computed here). The rollup is
    * a 4-row agg. */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val v1 = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("h1"))
    val v2 = plantedV2(Tables.documents(spark, sfDir))
      .select(col("doc_id"), md5(col("text")).as("h2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") === col("h2"), "unchanged")
          .otherwise("changed").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy(col("status"))
  }

  private val snapshotDiffSql =
    """WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
      |v2 AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 97 = 0 THEN text || ' rev2'
      |             ELSE text END) AS h2
      |  FROM documents WHERE doc_id % 89 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, md5(text) AS h2
      |  FROM documents WHERE doc_id % 101 = 0),
      |diff AS (
      |  SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
      |    CASE WHEN v1.h1 IS NULL THEN 'added'
      |         WHEN v2.h2 IS NULL THEN 'removed'
      |         WHEN v1.h1 = v2.h2 THEN 'unchanged'
      |         ELSE 'changed' END AS status
      |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
      |SELECT status, count(*) AS n_docs,
      |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
      |FROM diff GROUP BY status
      |ORDER BY status""".stripMargin

  // --------------------------------------------------------------- q101
  /** Tokenizer training: the first 10 BPE merge rules learned from the
    * corpus (Sennrich et al. — THE subword-vocabulary construction every
    * LLM pipeline runs before anything else sees a token id). Classic
    * formulation: train on the WORD-FREQUENCY table, not the corpus —
    * one corpus-sized agg produces a vocabulary-sized (word, freq) frame
    * (Heaps' law: ≪ corpus), and all 10 iterations run on that tiny
    * frame. Each round counts adjacent symbol pairs weighted by word
    * frequency, picks argmax `(count DESC, pair ASC)` — pure INTEGER
    * ordering, no floats anywhere in this operator — and merges.
    *
    * Merging is string `replace` on a delimiter-anchored encoding chosen
    * so both engines' non-overlapping left-to-right scan IS the BPE
    * greedy-left merge: a word's symbols are encoded
    * `|s1||s2||...||sn|`. A pattern `|a||b|` can only match at a symbol
    * boundary (symbols never contain `|`, and mid-`||` alignment would
    * need the left symbol to start with `|`), `aaa → (aa, a)` resolves
    * left-first, and consecutive occurrences `abab` both merge because
    * the matched trailing `|` is the FIRST char of the `||` separator —
    * the replacement restores it, leaving the second `|` to lead the
    * next match. The oracle replays all 10 rounds as generated CTEs
    * over the identical encoding.
    *
    * Scale: one explode+agg per round over the vocabulary frame
    * (checkpointed; plans stay flat); the argmax is a 1-row
    * TakeOrderedAndProject collect (the k-centroids pattern). */
  /** The corpus word-frequency table q101/q102 train on — memoized per
    * (session, corpus): q101's training build and q102's apply pass each
    * need it, and the corpus-sized tokenize+agg is the expensive part
    * (the resulting frame is Heaps'-law vocabulary-sized — cheap to hold,
    * exactly the persist-vs-recompute trade the shingle base documents). */
  private def wordFreq(spark: SparkSession, sfDir: String): DataFrame =
    graft.Memo.cached(spark, s"curation:word_freq:$sfDir") {
      tok(spark, sfDir)
        .select(explode(col("w")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    }

  /** Trained rules, memoized per (session, corpus) so q101 and q102
    * share one training run (the shingle-base precedent in TextOps). */
  private def bpeRules(spark: SparkSession, sfDir: String): DataFrame =
    graft.Memo.cached(spark, s"curation:bpe_rules:$sfDir") {
      bpeMergesOf(wordFreq(spark, sfDir), rounds = 10)
    }

  def bpeMerges(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    bpeRules(spark, sfDir).orderBy(col("merge_rank"))
  }

  /** Core of q101 over any (word, freq) frame — spec entry point.
    *
    * Job shape (round-14 optimization, guide §2.4): the encoded initial
    * state is materialized ONCE (`localCheckpoint` — this is also the one
    * corpus-sized pass, the word-frequency agg); each round's merge is
    * then a lazily CHAINED `replace` over that base rather than its own
    * materializing checkpoint, so round r's argmax job applies r−1
    * narrow string replaces to the cached vocabulary frame in the same
    * pass that counts pairs. The old shape paid a second materializing
    * job per round (10 extra jobs) to save re-running replaces that cost
    * microseconds per row on a Heaps'-law-sized frame — the wrong side
    * of the trade at every scale. Rule values are identical: the chain
    * applies the same replaces in the same order. */
  private[graft] def bpeMergesOf(wordFreq: DataFrame, rounds: Int): DataFrame = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    var cur = wordFreq
      .select(col("freq"),
        concat(lit("|"), concat_ws("||", split(col("word"), "")), lit("|"))
          .as("state"))
      .localCheckpoint()
    val rules = (1 to rounds).iterator.map { rank =>
      val picked = cur
        .select(col("freq"),
          graft.functions.NGramGenerator.ngrams(
            split(trim(col("state"), "|"), "\\|\\|"), 2).as(Seq("pos", "pair")))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      // a degenerate corpus (all words single-symbol) runs out of pairs
      // before `rounds` — stop with the rules learned so far
      if (picked.isEmpty) None
      else {
        val pick = picked(0)
        val Array(l, r) = pick.getString(0).split(" ", 2)
        cur = cur
          .withColumn("state", org.apache.spark.sql.functions.replace(
            col("state"), lit(s"|$l||$r|"), lit(s"|$l$r|")))
        Some((rank.toLong, l, r, l + r, pick.getLong(1)))
      }
    }.takeWhile(_.isDefined).flatten.toSeq
    rules.toDF("merge_rank", "left_sym", "right_sym", "merged", "pair_count")
      .orderBy(col("merge_rank"))
  }

  /** Shared WITH-chain replaying the 10 BPE rounds over the identical
    * `|s1||s2||…|` encoding (see [[bpeMerges]]); `s10` is the fully
    * merged per-word state, `k1..k10` the picked rules. Both the q101
    * and q102 oracles append their own final SELECT. */
  private val bpeChainSql: String = {
    // k<i> is an aggregate over the (0-or-1)-row argmax subquery so it is
    // ALWAYS exactly 1 row (all-NULL when p<i> is empty): a degenerate
    // corpus (all words single-symbol) runs out of pairs before round 10,
    // and the old `FROM s<i-1>, k<i>` cross join with an EMPTY k<i> would
    // empty s<i>..s10 — making q102's ledger vanish while the Spark side
    // (bpeMergesOf's early stop) still aggregates the full table. The
    // CASE keeps s<i> = s<i-1> verbatim when there is no rule to apply.
    val steps = (1 to 10).map { i =>
      s"""p$i AS (
         |  SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest(list_transform(range(1, len(syms)),
         |      j -> syms[j] || ' ' || syms[j+1])) AS pair
         |    FROM (SELECT freq, string_split(trim(state, '|'), '||') AS syms
         |          FROM s${i - 1}))
         |  GROUP BY pair),
         |k$i AS (
         |  SELECT min(l) AS l, min(r) AS r, min(cnt) AS cnt FROM (
         |    SELECT split_part(pair, ' ', 1) AS l, split_part(pair, ' ', 2) AS r,
         |      cnt
         |    FROM p$i ORDER BY cnt DESC, pair LIMIT 1)),
         |s$i AS (
         |  SELECT word, freq,
         |    CASE WHEN k$i.l IS NULL THEN state
         |         ELSE replace(state, '|' || k$i.l || '||' || k$i.r || '|',
         |           '|' || k$i.l || k$i.r || '|') END AS state
         |  FROM s${i - 1}, k$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH tok AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS word
       |  FROM documents),
       |s0 AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
       |    '|' || array_to_string(string_split(word, ''), '||') || '|'
       |      AS state
       |  FROM tok GROUP BY word),
       |$steps""".stripMargin
  }

  private val bpeMergesSql: String = {
    // k<i> is 1-row-always (all-NULL when pairs ran dry) — filter the
    // NULL sentinel so the rule list stops early exactly like Spark's
    val rows = (1 to 10).map(i =>
      s"SELECT $i AS merge_rank, l AS left_sym, r AS right_sym, " +
        s"l || r AS merged, cnt AS pair_count FROM k$i WHERE l IS NOT NULL")
      .mkString("\nUNION ALL ")
    s"""$bpeChainSql
       |$rows
       |ORDER BY merge_rank""".stripMargin
  }

  // --------------------------------------------------------------- q102
  /** Tokenizer application — what did the learned vocabulary BUY: apply
    * q101's 10 merges to the word-frequency table and report the corpus
    * compression ledger (whitespace tokens vs BPE tokens vs chars,
    * tokens-per-word and chars-per-token). This is the
    * train→apply→measure loop a tokenizer team actually runs; the
    * training run is shared with q101 via the session memo.
    *
    * Scale: application is 10 chained per-row `replace`s over the
    * vocabulary-sized frame (at serving time the merges would compile
    * into a trie over raw text; on the word-frequency formulation the
    * whole apply is vocabulary-sized), then one 1-row aggregate. Every
    * count is integer-exact; the two ratios are single `round(·,4)`s of
    * exact-integer quotients. */
  def bpeApply(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val rules = bpeRules(spark, sfDir).orderBy(col("merge_rank")).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val wf = wordFreq(spark, sfDir)
    var st = wf.withColumn("state",
      concat(lit("|"), concat_ws("||", split(col("word"), "")), lit("|")))
    for ((l, r) <- rules)
      st = st.withColumn("state", org.apache.spark.sql.functions.replace(
        col("state"), lit(s"|$l||$r|"), lit(s"|$l$r|")))
    st.withColumn("n_sym",
        size(split(trim(col("state"), "|"), "\\|\\|")).cast("long"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("freq")).as("ws_tokens"),
        sum(col("freq") * col("n_sym")).as("bpe_tokens"),
        sum(col("freq") * length(col("word"))).as("n_chars"))
      .select(col("n_words"), col("ws_tokens"), col("bpe_tokens"),
        col("n_chars"),
        roundVal(col("bpe_tokens") / col("ws_tokens").cast("double"), 4)
          .as("tokens_per_word"),
        roundVal(col("n_chars") / col("bpe_tokens").cast("double"), 4)
          .as("chars_per_token"))
  }

  private val bpeApplySql: String =
    s"""$bpeChainSql
       |SELECT CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(freq) AS BIGINT) AS ws_tokens,
       |  CAST(sum(freq * len(string_split(trim(state, '|'), '||')))
       |    AS BIGINT) AS bpe_tokens,
       |  CAST(sum(freq * len(word)) AS BIGINT) AS n_chars,
       |  floor((sum(freq * len(string_split(trim(state, '|'), '||')))
       |    / CAST(sum(freq) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS tokens_per_word,
       |  floor((sum(freq * len(word))
       |    / CAST(sum(freq * len(string_split(trim(state, '|'), '||')))
       |        AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS chars_per_token
       |FROM s10""".stripMargin

  // ---------------------------------------------------------------- q108
  /** Per-source corpus-composition drift between crawl snapshots — the
    * monitoring read on top of q100's diff primitive: for every source,
    * doc and token counts in v1 vs v2, the deltas, and the share-of-corpus
    * shift. A feed silently collapsing (or flooding) between crawls moves
    * its share; the drift table is what a 100 TB ingest pages somebody
    * about. v2 is the SAME deterministic plant as q100 (docs `%89` drop,
    * `%97` rewrite with " rev2", `%101` re-crawled under a new id), so the
    * two queries describe one consistent pair of snapshots.
    *
    * Scale: two corpus scans (one per snapshot), each map-combining to a
    * ≤|sources| grid; the join and share windows run on the grid only.
    * Counts integer; shares/shifts one `round(·,4)` each. */
  def snapshotDrift(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    def toks(c: org.apache.spark.sql.Column) = size(split(c, " ")).cast("long")
    val base = Tables.documents(spark, sfDir)
    val v1 = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_v1"),
        sum(toks(col("text"))).as("tokens_v1"))
    val v2rows = plantedV2(base).select(col("source"), col("text"))
    val v2 = v2rows.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_v2"),
        sum(toks(col("text"))).as("tokens_v2"))
    val all = Window.partitionBy(lit(1))
    v1.join(v2, Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("n_docs_v1"), lit(0L)).as("n_docs_v1"),
        coalesce(col("n_docs_v2"), lit(0L)).as("n_docs_v2"),
        coalesce(col("tokens_v1"), lit(0L)).as("tokens_v1"),
        coalesce(col("tokens_v2"), lit(0L)).as("tokens_v2"))
      .withColumn("doc_delta", col("n_docs_v2") - col("n_docs_v1"))
      .withColumn("token_delta", col("tokens_v2") - col("tokens_v1"))
      .withColumn("share_v1",
        roundVal(col("tokens_v1") / sum(col("tokens_v1")).over(all).cast("double"), 4))
      .withColumn("share_v2",
        roundVal(col("tokens_v2") / sum(col("tokens_v2")).over(all).cast("double"), 4))
      .withColumn("share_shift", roundVal(
        col("tokens_v2") / sum(col("tokens_v2")).over(all).cast("double") -
          col("tokens_v1") / sum(col("tokens_v1")).over(all).cast("double"), 4))
      .orderBy(col("source"))
  }

  private val snapshotDriftSql =
    """WITH v1 AS (
      |  SELECT source, count(*) AS n_docs_v1,
      |    sum(len(string_split(text, ' '))) AS tokens_v1
      |  FROM documents GROUP BY source),
      |v2rows AS (
      |  SELECT source,
      |    CASE WHEN doc_id % 97 = 0 THEN text || ' rev2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 89 <> 0
      |  UNION ALL
      |  SELECT source, text FROM documents WHERE doc_id % 101 = 0),
      |v2 AS (
      |  SELECT source, count(*) AS n_docs_v2,
      |    sum(len(string_split(text, ' '))) AS tokens_v2
      |  FROM v2rows GROUP BY source),
      |j AS (
      |  SELECT coalesce(v1.source, v2.source) AS source,
      |    coalesce(n_docs_v1, 0) AS n_docs_v1,
      |    coalesce(n_docs_v2, 0) AS n_docs_v2,
      |    coalesce(tokens_v1, 0) AS tokens_v1,
      |    coalesce(tokens_v2, 0) AS tokens_v2
      |  FROM v1 FULL OUTER JOIN v2 ON v1.source = v2.source)
      |SELECT source,
      |  CAST(n_docs_v1 AS BIGINT) AS n_docs_v1,
      |  CAST(n_docs_v2 AS BIGINT) AS n_docs_v2,
      |  CAST(tokens_v1 AS BIGINT) AS tokens_v1,
      |  CAST(tokens_v2 AS BIGINT) AS tokens_v2,
      |  CAST(n_docs_v2 - n_docs_v1 AS BIGINT) AS doc_delta,
      |  CAST(tokens_v2 - tokens_v1 AS BIGINT) AS token_delta,
      |  floor((tokens_v1 / CAST(sum(tokens_v1) OVER () AS DOUBLE))
      |    * 1e4 + 0.5) / 1e4 AS share_v1,
      |  floor((tokens_v2 / CAST(sum(tokens_v2) OVER () AS DOUBLE))
      |    * 1e4 + 0.5) / 1e4 AS share_v2,
      |  floor((tokens_v2 / CAST(sum(tokens_v2) OVER () AS DOUBLE)
      |    - tokens_v1 / CAST(sum(tokens_v1) OVER () AS DOUBLE))
      |    * 1e4 + 0.5) / 1e4 AS share_shift
      |FROM j ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q110
  /** Incremental reprocessing — the OPERATIONAL payoff of q100's diff:
    * downstream curation (content-hash split + token accounting, q96's
    * buckets) re-runs over `added ∪ changed` documents ONLY, never the
    * unchanged corpus. At 100 TB this is the difference between a
    * nightly full re-run and a delta job: v2 joins the v1 HASH manifest
    * (16 bytes/doc, not the corpus) on the primary key — co-partitioned
    * zip under q100's doc_id bucketing — and unchanged docs are filtered
    * out BEFORE any downstream compute touches their text. Same planted
    * v2 as q100/q108, so the three queries describe one consistent
    * incremental world; `CurationOpsSpec` reconciles the work set
    * against q100's added/changed classes exactly. */
  def incrementalPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val base = Tables.documents(spark, sfDir)
    val v1 = base.select(col("doc_id"), md5(col("text")).as("h1"))
    val v2 = plantedV2(base).select(col("doc_id"), col("text"))
    val work = v2.withColumn("h2", md5(col("text")))
      .join(v1, Seq("doc_id"), "left")
      .filter(col("h1").isNull || col("h1") =!= col("h2"))
      .withColumn("status", when(col("h1").isNull, "added").otherwise("changed"))
    work
      .withColumn("split", splitLabel)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "valid", 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
      .orderBy(col("status"))
  }

  private val incrementalPipelineSql =
    """WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
      |v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 97 = 0 THEN text || ' rev2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 89 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text
      |  FROM documents WHERE doc_id % 101 = 0),
      |work AS (
      |  SELECT v2.doc_id, v2.text,
      |    CASE WHEN v1.h1 IS NULL THEN 'added' ELSE 'changed' END AS status
      |  FROM v2 LEFT JOIN v1 ON v2.doc_id = v1.doc_id
      |  WHERE v1.h1 IS NULL OR v1.h1 <> md5(v2.text)),
      |s AS (
      |  SELECT status, text,
      |    ('0x' || substr(md5(text), 29, 4))::BIGINT % 100 AS bucket
      |  FROM work)
      |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
      |  CAST(sum(CASE WHEN bucket < 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
      |  CAST(sum(CASE WHEN bucket >= 90 AND bucket < 95 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_valid,
      |  CAST(sum(CASE WHEN bucket >= 95 THEN 1 ELSE 0 END) AS BIGINT) AS n_test
      |FROM s GROUP BY status ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q113
  /** License / opt-out compliance screen — the legal gate of a crawl
    * curation run: documents carrying non-commercial license markers,
    * all-rights-reserved notices, or AI-training opt-out signals
    * (robots "noai" convention) are counted and dropped before the
    * corpus ships. Markers are PLANTED in-query by integer mods (q73's
    * precedent — the fixture carries none), detection is `LIKE`
    * substring matching so both engines share one exactly-identical
    * semantics (no regex-dialect surface at all).
    *
    * Scale: one map-only pass (plant + three LIKEs) and one
    * ≤|sources|-group map-combined agg — q73's shape; counts integer,
    * keep_rate one round(·,4). A doc carrying several markers counts in
    * each marker column and ONCE in n_restricted. */
  def licenseScreen(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val planted = GraftSession.spread(Tables.documents(spark, sfDir), col("doc_id"))
      .withColumn("ptext", concat(col("text"),
        when(pmod(col("doc_id"), lit(41L)) === 0, lit(" license: cc-by-nc"))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(43L)) === 0, lit(" all rights reserved"))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(47L)) === 0, lit(" x-robots: noai"))
          .otherwise(lit(""))))
      .withColumn("f_nc", col("ptext").like("%cc-by-nc%"))
      .withColumn("f_arr", col("ptext").like("%all rights reserved%"))
      .withColumn("f_noai", col("ptext").like("%noai%"))
      .withColumn("restricted", col("f_nc") || col("f_arr") || col("f_noai"))
    planted.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("f_nc"), 1L).otherwise(0L)).as("n_nc"),
        sum(when(col("f_arr"), 1L).otherwise(0L)).as("n_arr"),
        sum(when(col("f_noai"), 1L).otherwise(0L)).as("n_noai"),
        sum(when(col("restricted"), 1L).otherwise(0L)).as("n_restricted"))
      .select(col("source"), col("n_docs"), col("n_nc"), col("n_arr"),
        col("n_noai"), col("n_restricted"),
        roundVal((col("n_docs") - col("n_restricted")) /
          col("n_docs").cast("double"), 4).as("keep_rate"))
      .orderBy(col("source"))
  }

  private val licenseScreenSql =
    """WITH planted AS (
      |  SELECT source,
      |    text ||
      |      CASE WHEN doc_id % 41 = 0 THEN ' license: cc-by-nc' ELSE '' END ||
      |      CASE WHEN doc_id % 43 = 0 THEN ' all rights reserved' ELSE '' END ||
      |      CASE WHEN doc_id % 47 = 0 THEN ' x-robots: noai' ELSE '' END
      |      AS ptext
      |  FROM documents),
      |f AS (
      |  SELECT source,
      |    ptext LIKE '%cc-by-nc%' AS f_nc,
      |    ptext LIKE '%all rights reserved%' AS f_arr,
      |    ptext LIKE '%noai%' AS f_noai
      |  FROM planted)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN f_nc THEN 1 ELSE 0 END) AS BIGINT) AS n_nc,
      |  CAST(sum(CASE WHEN f_arr THEN 1 ELSE 0 END) AS BIGINT) AS n_arr,
      |  CAST(sum(CASE WHEN f_noai THEN 1 ELSE 0 END) AS BIGINT) AS n_noai,
      |  CAST(sum(CASE WHEN f_nc OR f_arr OR f_noai THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_restricted,
      |  floor(((count(*) - sum(CASE WHEN f_nc OR f_arr OR f_noai
      |                              THEN 1 ELSE 0 END))
      |    / CAST(count(*) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS keep_rate
      |FROM f GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q111
  /** Two-sample Kolmogorov–Smirnov drift test on the document-length
    * distribution between crawl snapshots — the DISTRIBUTIONAL alarm
    * completing q108's count-based drift monitor (a feed can keep its
    * share while its length distribution silently collapses to stubs; KS
    * catches shape, not just volume). Same planted v2 as q100/q108/q110.
    *
    * Fully integer-exact cross-engine: the statistic is computed SCALED —
    * D_s = max |cum1·N2 − cum2·N1| over the merged length grid (exact
    * BIGINT products; D = D_s/(N1·N2) is the one rounded double) — and
    * the α=0.05 decision c(α)√((N1+N2)/(N1N2)) is squared into the pure
    * integer comparison 10⁶·D_s² > 1844164·(N1+N2)·N1·N2, evaluated in
    * 128-bit exact arithmetic (Spark DECIMAL(38,0) / DuckDB HUGEINT) so
    * the verdict cannot flap. Arg-max length ties break to the smallest.
    *
    * Exactness bound: D_s ≤ N1·N2, so the left side 10⁶·D_s² stays
    * inside DECIMAL(38,0) / HUGEINT only while N1·N2 < 10¹⁶ (≈10⁸ docs
    * per snapshot at parity — comfortably past any fixture SF, and past
    * most real snapshot comparisons). Beyond that, Spark (non-ANSI)
    * yields NULL and DuckDB errors rather than silently flipping; the
    * at-scale recipe is to KS-test a stratified length sample (or bucket
    * lengths first), which keeps N inside the exact window — do NOT
    * widen to doubles, which reintroduces verdict flap at the boundary.
    *
    * Scale: two corpus scans map-combine to per-length counts (the grid
    * is ≤ distinct lengths — bounded, bucket at 100 TB); the CDF windows
    * and the top-1 run on that grid only. */
  def lengthDriftKs(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val base = Tables.documents(spark, sfDir)
    val len1 = base.select(length(col("text")).cast("long").as("len"))
    val len2 = plantedV2(base)
      .select(length(col("text")).cast("long").as("len"))
    lengthDriftKsOf(len1, len2)
  }

  /** Core of q111 over any two single-column `len` frames — spec entry. */
  private[graft] def lengthDriftKsOf(len1: DataFrame,
      len2: DataFrame): DataFrame = {
    val c1 = len1.groupBy(col("len")).agg(count(lit(1)).as("c1"))
    val c2 = len2.groupBy(col("len")).agg(count(lit(1)).as("c2"))
    val grid = c1.join(c2, Seq("len"), "full_outer")
      .select(col("len"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
    val cdf = Window.orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(1))
    grid
      .withColumn("cum1", sum(col("c1")).over(cdf))
      .withColumn("cum2", sum(col("c2")).over(cdf))
      .withColumn("n1", sum(col("c1")).over(all))
      .withColumn("n2", sum(col("c2")).over(all))
      .withColumn("ds",
        abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
      .orderBy(col("ds").desc, col("len").asc)
      .limit(1)
      .select(col("n1"), col("n2"), col("ds").as("ks_scaled"),
        col("len").as("at_len"),
        // integer-ratio output: 3/20000-style doubles are exactly the
        // class SQL round diverges on cross-engine — floor form (roundVal)
        roundVal(col("ds") / (col("n1") * col("n2")).cast("double"), 6).as("ks"),
        (col("ds").cast("decimal(38,0)") * col("ds") * lit(1000000L) >
          lit(1844164L).cast("decimal(38,0)") *
            (col("n1") + col("n2")) * col("n1") * col("n2")).as("reject_05"))
  }

  private val lengthDriftKsSql =
    """WITH v1 AS (SELECT CAST(length(text) AS BIGINT) AS len FROM documents),
      |v2t AS (
      |  SELECT CASE WHEN doc_id % 97 = 0 THEN text || ' rev2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 89 <> 0
      |  UNION ALL
      |  SELECT text FROM documents WHERE doc_id % 101 = 0),
      |v2 AS (SELECT CAST(length(text) AS BIGINT) AS len FROM v2t),
      |k1 AS (SELECT len, count(*) AS c1 FROM v1 GROUP BY len),
      |k2 AS (SELECT len, count(*) AS c2 FROM v2 GROUP BY len),
      |grid AS (
      |  SELECT coalesce(k1.len, k2.len) AS len,
      |    coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2
      |  FROM k1 FULL OUTER JOIN k2 ON k1.len = k2.len),
      |cum AS (
      |  SELECT len,
      |    sum(c1) OVER (ORDER BY len
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
      |    sum(c2) OVER (ORDER BY len
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
      |    sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
      |  FROM grid),
      |scored AS (SELECT *, abs(cum1*n2 - cum2*n1) AS ds FROM cum)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST(ds AS BIGINT) AS ks_scaled, CAST(len AS BIGINT) AS at_len,
      |  floor((ds / CAST(n1*n2 AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS ks,
      |  (CAST(ds AS HUGEINT)*ds*1000000
      |     > CAST(1844164 AS HUGEINT)*(n1+n2)*n1*n2) AS reject_05
      |FROM scored ORDER BY ds DESC, len LIMIT 1""".stripMargin

  // ---------------------------------------------------------------- q103
  /** Deterministic epoch shuffle — the training data-loader's global
    * reshuffle as a PURE FUNCTION of (epoch, doc_id): key =
    * md5("ep<epoch>:" || doc_id), shard = low-nibble bucket of the key,
    * position = rank of (key, doc_id) within the shard. Changing the
    * epoch prefix re-deals the whole corpus; nothing else (arrival
    * order, partitioning, re-runs) can move a document — the
    * reproducible-training-order property, same argument as q96's
    * leakage-safe split. Output is the loader's manifest: which shard
    * file, which offset.
    *
    * Scale: shard count is the file-count knob (≥ cluster cores in
    * production so shards stay bounded — FIXED shard size, growing shard
    * count); the in-shard rank is a `row_number` per shard partition —
    * at write time the same order falls out of
    * `repartition(shard).sortWithinPartitions(key)` with no window at
    * all. Cross-engine: md5 hex + integer nibble parse (q96), rank ties
    * broken by doc_id — bit-exact. */
  def epochShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    epochShuffleOf(Tables.documents(spark, sfDir), epoch = 1, shards = 16)
  }

  /** Core of q103 over any (doc_id) frame — spec entry point. */
  private[graft] def epochShuffleOf(docs: DataFrame, epoch: Int,
      shards: Int): DataFrame = {
    val key = md5(concat(lit(s"ep$epoch:"), col("doc_id").cast("string")))
    val inShard = Window.partitionBy(col("shard"))
      .orderBy(col("key"), col("doc_id"))
    docs.select(col("doc_id")).withColumn("key", key)
      .withColumn("shard",
        pmod(conv(substring(col("key"), 29, 4), 16, 10).cast("long"),
          lit(shards.toLong)))
      .withColumn("pos", row_number().over(inShard).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  private val epochShuffleSql =
    """WITH k AS (
      |  SELECT doc_id, md5('ep1:' || CAST(doc_id AS VARCHAR)) AS key
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, key,
      |    ('0x' || substr(key, 29, 4))::BIGINT % 16 AS shard
      |  FROM k)
      |SELECT doc_id, shard,
      |  row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) AS pos
      |FROM s ORDER BY shard, pos""".stripMargin

  // ---------------------------------------------------------------- q104
  /** Robust per-lang length-outlier screen: median + MAD (median absolute
    * deviation) instead of mean + sd, so the fences themselves cannot be
    * dragged by the outliers they hunt (a handful of concatenation-bug
    * megadocs shifts a mean far enough to hide itself; the median does
    * not move). Flag: dev > 4.4478·MAD — the classic 3σ-equivalent
    * (3 × 1.4826, the normal-consistency constant).
    *
    * Cross-engine: n_chars is integer, so the interpolated median is
    * k or k.5 and deviations are exact binary doubles; MAD interpolates
    * to quarters at worst — still exact — and `4.4478·MAD` is ONE IEEE
    * multiply of identical operands in both engines, so the flagged SET
    * is identical (the q88 "predicate must not flap" argument; both
    * engines interpolate at rank p·(n−1)). Scale: two ≤|langs|-group
    * aggs with the tiny stats frames broadcast back — the corpus is
    * scanned, never sorted globally. */
  def outlierMad(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    outlierMadOf(Tables.documents(spark, sfDir))
  }

  /** q104's fence over (n_chars, med_chars, mad_chars) columns — ONE
    * definition shared with the streaming twin
    * (`StreamingOps.madScreenStream`) so batch and stream cannot drift:
    * dev > 4.4478·MAD (3 × 1.4826, the 3σ-equivalent). */
  private[graft] def madOutlierPredicate: org.apache.spark.sql.Column =
    abs(col("n_chars") - col("med_chars")) >
      col("mad_chars") * lit(4.4478)

  /** Core of q104 over any (lang, n_chars) frame — spec entry point. */
  private[graft] def outlierMadOf(input: DataFrame): DataFrame = {
    val docs = input.select(col("lang"), col("n_chars"))
    val med = docs.groupBy(col("lang"))
      .agg(expr("percentile(n_chars, 0.5)").as("med_chars"))
    val dev = docs.join(broadcast(med), "lang")
      .withColumn("dev", abs(col("n_chars") - col("med_chars")))
    val mad = dev.groupBy(col("lang"))
      .agg(expr("percentile(dev, 0.5)").as("mad_chars"))
    dev.join(broadcast(mad), "lang")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("med_chars")).as("med_chars"),
        max(col("mad_chars")).as("mad_chars"),
        sum(when(madOutlierPredicate, 1L).otherwise(0L)).as("n_outliers"))
      .select(col("lang"), col("n_docs"), col("med_chars"), col("mad_chars"),
        col("n_outliers"),
        roundVal(col("n_outliers") / col("n_docs").cast("double"), 4)
          .as("outlier_rate"))
      .orderBy(col("lang"))
  }

  private val outlierMadSql =
    """WITH med AS (
      |  SELECT lang, quantile_cont(n_chars, 0.5) AS med_chars
      |  FROM documents GROUP BY lang),
      |dev AS (
      |  SELECT d.lang, abs(d.n_chars - m.med_chars) AS dev, m.med_chars
      |  FROM documents d JOIN med m ON d.lang = m.lang),
      |mad AS (
      |  SELECT lang, quantile_cont(dev, 0.5) AS mad_chars
      |  FROM dev GROUP BY lang)
      |SELECT v.lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  max(v.med_chars) AS med_chars, max(a.mad_chars) AS mad_chars,
      |  CAST(sum(CASE WHEN v.dev > a.mad_chars * 4.4478 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers,
      |  floor((sum(CASE WHEN v.dev > a.mad_chars * 4.4478 THEN 1 ELSE 0 END)
      |    / CAST(count(*) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS outlier_rate
      |FROM dev v JOIN mad a ON v.lang = a.lang
      |GROUP BY v.lang ORDER BY v.lang""".stripMargin

  // ---------------------------------------------------------------- q106
  /** Pairwise source content-overlap matrix: for every source pair, how
    * many EXACT contents (md5 of text) they share, as a Jaccard over
    * each side's distinct-content set — the "which feeds duplicate each
    * other" read that decides crawl retirement and dedup priority
    * upstream of q72's within-source dup rate. All unordered source
    * pairs (the upper triangle, `src_a < src_b`) are emitted,
    * zero-overlap pairs included: absence of overlap is the finding.
    *
    * Scale: the only corpus-sized shuffles key on the 16-byte content
    * hash (distinct + self-equi-join on h — never a nested loop); the
    * per-source totals and the pair grid are |sources|-sized and
    * broadcast. A hash shared by k sources expands to k(k−1)/2 grid
    * cells, bounded by the grid itself. Integer counts; jaccard is one
    * round(·,4) of an exact-integer ratio. */
  def sourceOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    sourceOverlapOf(Tables.documents(spark, sfDir))
  }

  /** Core of q106 over any (source, text) frame — spec entry point. */
  private[graft] def sourceOverlapOf(docs: DataFrame): DataFrame = {
    val hs = docs
      .select(col("source"), md5(col("text")).as("h")).distinct()
    val per = hs.groupBy(col("source")).agg(count(lit(1)).as("nh"))
    val inter = hs.select(col("source").as("src_a"), col("h"))
      .join(hs.select(col("source").as("src_b"), col("h")), "h")
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_common"))
    val grid = per.select(col("source").as("src_a"), col("nh").as("nh_a"))
      .crossJoin(broadcast(
        per.select(col("source").as("src_b"), col("nh").as("nh_b"))))
      .filter(col("src_a") < col("src_b"))
    grid.join(inter, Seq("src_a", "src_b"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .select(col("src_a"), col("src_b"), col("nh_a"), col("nh_b"),
        col("n_common"),
        roundVal(col("n_common") /
          (col("nh_a") + col("nh_b") - col("n_common")).cast("double"), 4)
          .as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val sourceOverlapSql =
    """WITH hs AS (SELECT DISTINCT source, md5(text) AS h FROM documents),
      |per AS (SELECT source, count(*) AS nh FROM hs GROUP BY source),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
      |  FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT pa.source AS src_a, pb.source AS src_b,
      |  CAST(pa.nh AS BIGINT) AS nh_a, CAST(pb.nh AS BIGINT) AS nh_b,
      |  CAST(coalesce(i.n_common, 0) AS BIGINT) AS n_common,
      |  floor((coalesce(i.n_common, 0)
      |    / CAST(pa.nh + pb.nh - coalesce(i.n_common, 0) AS DOUBLE))
      |    * 1e4 + 0.5) / 1e4 AS jaccard
      |FROM per pa JOIN per pb ON pa.source < pb.source
      |LEFT JOIN inter i ON i.src_a = pa.source AND i.src_b = pb.source
      |ORDER BY src_a, src_b""".stripMargin

  // --------------------------------------------------------------- q116
  /** Weighted sampling without replacement — the budget-proportional
    * subsample every mixture rebalance ends with ("keep 100 documents,
    * longer ones proportionally more likely, and make the draw
    * reproducible"). Algorithm A-Res of Efraimidis & Spirakis,
    * "Weighted random sampling with a reservoir" (IPL 2006): each item
    * draws key `-ln(u)/w` (u uniform, w the weight) and the k SMALLEST
    * keys are the sample — a one-pass, merge-associative rule, which is
    * exactly what a distributed top-k needs. Here w = n_chars
    * (byte-budget-proportional) and u is replayable on both engines:
    * the first 8 md5 hex nibbles of the doc id, `(v+1)/(2^32+1)`.
    * Keys are ranked as `floor(-ln(u)·1000/w · 1e4 + 0.5)/1e4` with
    * doc_id tie-break — the q63/q98 rounded-key rule in [[roundVal]]'s
    * floor form, absorbing last-ulp `ln` differences cross-engine.
    *
    * Scale: the plan is `TakeOrderedAndProject` — per-partition top-k
    * then a k·partitions merge, NO global sort, NO shuffle of the
    * corpus; the rank window runs over the k surviving rows only. At
    * 100 TB this samples in one pass over the scan. */
  def weightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    weightedSampleOf(Tables.documents(spark, sfDir), k = 100)
  }

  /** The A-Res rank key as a reusable column:
    * `floor(-ln(u)·1000/w · 1e4 + 0.5)/1e4` ([[roundVal]] — the floor
    * form, because the key is BOTH the rank and an output column the
    * driver hashes, and SQL `round` diverges cross-engine on half-way
    * doubles, see [[roundKey]]) with u replayed from the first 8 md5
    * hex nibbles of the doc id. Shared verbatim by q116 and its
    * streaming twin [[graft.streaming.StreamingOps.reservoirStream]] —
    * ONE definition, so the stream==batch law can never drift on
    * rounding. */
  private[graft] def aResKey(docId: Column, nChars: Column): Column = {
    val v = conv(substring(md5(docId.cast("string")), 1, 8), 16, 10)
      .cast("long")
    val u = (v.cast("double") + 1.0) / 4294967297.0
    roundVal(-log(u) * 1000.0 / nChars.cast("double"), 4)
  }

  /** Core of q116 over any (doc_id, lang, source, n_chars) frame. */
  private[graft] def weightedSampleOf(docs: DataFrame, k: Int): DataFrame = {
    val picked = docs
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .withColumn("rkey", aResKey(col("doc_id"), col("n_chars")))
      .orderBy(col("rkey").asc, col("doc_id").asc)
      .limit(k)
    // rank over the k survivors only (k rows — the window is trivial)
    picked
      .withColumn("sample_rank", row_number().over(
        Window.orderBy(col("rkey").asc, col("doc_id").asc)))
      .select(col("sample_rank"), col("doc_id"), col("lang"), col("source"),
        col("n_chars"), col("rkey"))
      .orderBy(col("sample_rank"))
  }

  private val weightedSampleSql =
    s"""WITH s AS (
      |  SELECT doc_id, lang, source, n_chars,
      |    ${roundValSql(
        "-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT" +
          " + 1) / 4294967297.0) * 1000.0 / n_chars", 4)} AS rkey
      |  FROM documents)
      |SELECT CAST(row_number() OVER (ORDER BY rkey, doc_id) AS INT)
      |    AS sample_rank,
      |  doc_id, lang, source, n_chars, rkey
      |FROM s ORDER BY rkey, doc_id LIMIT 100""".stripMargin

  // --------------------------------------------------------------- q121
  /** Incremental distinct counting with MERGEABLE HLL sketches (Spark's
    * built-in Apache DataSketches functions, added in 3.5): per-source
    * distinct-content counts for snapshot v1, snapshot v2 (q100's planted
    * rules), and their union — where the union estimate comes from
    * `hll_union` over the two per-snapshot sketches, NOT from re-scanning
    * the union. That is the 100 TB pattern this query exists to pin: a
    * snapshot's per-source sketch is a few-KB artifact computed once with
    * its ingest; "distinct contents across all snapshots / the last N
    * crawls" is then sketch merges on a |sources|-row grid, no data
    * re-scan, associative across any partitioning (Agarwal et al.,
    * "Mergeable Summaries", PODS 2012).
    *
    * Fixture-scale harness: exact counts ride along (`count_distinct` on
    * the same scan) and the sketch path must land within 5% of the exact
    * union — emitted as the `est_ok` flag, TRUE in the oracle (the q27
    * tolerance-flag precedent: DuckDB cannot replay the sketch, but it
    * CAN fail the compare if the estimate ever drifts out of tolerance).
    * At lgK=12 the HLL RSE is ~1.6%, so 5% is a stable 3σ band at any
    * cardinality the fixtures or a real per-source grid produce.
    *
    * One scan of each snapshot, one grid-sized agg, no join (snapshots
    * are tagged and aggregated together here so the harness is a single
    * deterministic plan; deployed, sk1 IS the stored v1 artifact). */
  def sketchDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    sketchDistinctOf(Tables.documents(spark, sfDir))
  }

  /** Core of q121 over any (doc_id, source, text) frame. */
  private[graft] def sketchDistinctOf(base: DataFrame): DataFrame = {
    val v1 = base.select(col("source"), md5(col("text")).as("h"))
      .withColumn("snap", lit(1))
    val v2 = plantedV2(base)
      .select(col("source"), md5(col("text")).as("h"))
      .withColumn("snap", lit(2))
    val est = {
      val sk1 = col("sk1"); val sk2 = col("sk2")
      when(sk1.isNull && sk2.isNull, lit(0.0))
        .when(sk1.isNull, hll_sketch_estimate(sk2))
        .when(sk2.isNull, hll_sketch_estimate(sk1))
        .otherwise(hll_sketch_estimate(hll_union(sk1, sk2)))
    }
    v1.unionByName(v2)
      .groupBy(col("source"))
      .agg(
        count_distinct(when(col("snap") === 1, col("h"))).as("n_v1"),
        count_distinct(when(col("snap") === 2, col("h"))).as("n_v2"),
        count_distinct(col("h")).as("n_union_exact"),
        hll_sketch_agg(when(col("snap") === 1, col("h")), lit(12)).as("sk1"),
        hll_sketch_agg(when(col("snap") === 2, col("h")), lit(12)).as("sk2"))
      .select(col("source"), col("n_v1"), col("n_v2"), col("n_union_exact"),
        (abs(est - col("n_union_exact").cast("double")) <=
          col("n_union_exact").cast("double") * 0.05).as("est_ok"))
      .orderBy(col("source"))
  }

  private val sketchDistinctSql =
    """WITH v1 AS (
      |  SELECT source, md5(text) AS h, 1 AS snap FROM documents),
      |v2 AS (
      |  SELECT source,
      |    md5(CASE WHEN doc_id % 97 = 0 THEN text || ' rev2'
      |             ELSE text END) AS h, 2 AS snap
      |  FROM documents WHERE doc_id % 89 <> 0
      |  UNION ALL
      |  SELECT source, md5(text) AS h, 2 AS snap
      |  FROM documents WHERE doc_id % 101 = 0),
      |u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
      |SELECT source,
      |  CAST(count(DISTINCT CASE WHEN snap = 1 THEN h END) AS BIGINT) AS n_v1,
      |  CAST(count(DISTINCT CASE WHEN snap = 2 THEN h END) AS BIGINT) AS n_v2,
      |  CAST(count(DISTINCT h) AS BIGINT) AS n_union_exact,
      |  TRUE AS est_ok
      |FROM u GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------- q143
  /** CDC changes feed between two retained [[VersionedTable]] snapshots
    * — q100's diff question ("what must downstream reprocess?") answered
    * from the MANIFEST instead of two full corpus scans. The lifecycle:
    * publish the corpus bucketed by `doc_id % 16` as snapshot v1, apply
    * the [[plantedV2]] crawl delta as a copy-on-write publish (via
    * [[VersionedTable.retryingPublish]] — the nightly-job commit path)
    * replacing ONLY the buckets that contain a diff, then serve
    * [[VersionedTable.changes]](v1, v2).
    *
    * Why this beats q100 at 100 TB: q100's full-outer hash-join reads
    * BOTH snapshots end to end every night. The manifest diff reads only
    * partitions whose generation id changed — delta-bounded I/O — and
    * the row-level classify inside them suppresses the COW-carried
    * unchanged rows, so the feed q100 computes from 2× corpus scans
    * falls out of ~2× delta-sized reads. The DuckDB oracle recomputes
    * the SAME insert/update/delete classification from first principles
    * (full md5 diff of v1 vs v2), so a partition-routing bug that
    * dropped or duplicated a changed bucket hash-mismatches. */
  private val vtChangesSchema = new org.apache.spark.sql.types.StructType()
    .add("doc_id", org.apache.spark.sql.types.LongType)
    .add("text", org.apache.spark.sql.types.StringType)
    .add("bucket", org.apache.spark.sql.types.LongType)

  private def vtBucketed(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("text"),
      pmod(col("doc_id"), lit(16L)).as("bucket"))

  /** Build-once versioned documents fixture shared by q143/q144: v1 =
    * the corpus bucketed by `doc_id % 16`, v2 = the [[plantedV2]] crawl
    * delta published copy-on-write over only the buckets containing a
    * diff ([[VersionedTable.retryingPublish]] — the nightly commit
    * path). Both manifests stay retained (no vacuum): the whole point
    * is diffing them. Returns the table root. */
  private def docVtArtifact(spark: SparkSession, sfDir: String): String = {
    val dir = VectorOps.artifactDir("graft_docvt_changes_fmt1", sfDir,
      sourceFile = "documents.parquet")
    if (VectorOps.buildArtifactOnce(dir, Seq("READY"))(tmp => {
        val v1 = vtBucketed(Tables.documents(spark, sfDir))
        VersionedTable.publishFull(spark, tmp, "bucket", v1)
        val v2 = vtBucketed(plantedV2(Tables.documents(spark, sfDir)))
        val (upserts, removed) = hashDiff(
          v1.select(col("doc_id"), col("text")),
          v2.select(col("doc_id"), col("text")))
        // buckets containing any diff — ≤16 values, a bounded collect
        val touched = upserts.select(pmod(col("doc_id"), lit(16L)).as("b"))
          .union(removed.select(pmod(col("doc_id"), lit(16L)).as("b")))
          .distinct().collect().map(_.getLong(0)).sorted.toSeq
        VersionedTable.retryingPublish(spark, tmp)(_ =>
          VersionedTable.Delta(touched,
            v2.filter(col("bucket").isin(touched: _*))))
        val ready = java.nio.file.Paths.get(tmp, "READY")
        java.nio.file.Files.createDirectories(ready)
        java.nio.file.Files.createFile(ready.resolve("_SUCCESS"))
      })) {
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"q143/q144: published v1 + planted crawl delta at $dir (first " +
          "touch; later runs serve off the retained manifests)")
      VectorOps.sweepStaleArtifacts(dir, "graft_docvt_changes_", sfDir)
    }
    dir.toString
  }

  private def docVtSnap(spark: SparkSession, root: String,
      v: Long): VersionedTable.Snapshot =
    VersionedTable.snapshotAt(spark, root, v).getOrElse(
      throw new IllegalStateException(s"doc-vt artifact at $root lost v$v"))

  def versionedChanges(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val root = docVtArtifact(spark, sfDir)
    VersionedTable.changes(spark, root, docVtSnap(spark, root, 1L),
        docVtSnap(spark, root, 2L), vtChangesSchema, "doc_id")
      .select(col("doc_id"), col("change_type"))
      .orderBy(col("doc_id"), col("change_type"))
  }

  /** First-principles recomputation of the feed: full md5 diff of the
    * deterministic planted v2 against v1, classified exactly as
    * [[VersionedTable.changes]] classifies (absent→insert/delete,
    * hash-differ→an update_pre/update_post image pair, unchanged
    * suppressed). PRESENCE is the doc_id, never the hash — md5(null) is
    * null, so a null-text doc classified by `h IS NULL` would read as
    * absent ([[hashDiff]]'s documented trap) and a bare `h1 <> h2`
    * would suppress a null↔non-null flip; `IS DISTINCT FROM` mirrors
    * the engine's null-safe struct equality. */
  private val versionedChangesSql =
    """WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
      |v2 AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 97 = 0 THEN text || ' rev2'
      |             ELSE text END) AS h2
      |  FROM documents WHERE doc_id % 89 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, md5(text) AS h2
      |  FROM documents WHERE doc_id % 101 = 0),
      |diff AS (
      |  SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
      |    CASE WHEN v1.doc_id IS NULL THEN 'insert'
      |         WHEN v2.doc_id IS NULL THEN 'delete'
      |         ELSE 'update' END AS status
      |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
      |  WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL
      |     OR v1.h1 IS DISTINCT FROM v2.h2)
      |SELECT doc_id,
      |  CASE WHEN status = 'update' THEN img ELSE status END AS change_type
      |FROM diff
      |CROSS JOIN (SELECT unnest(['update_pre', 'update_post']) AS img)
      |WHERE status = 'update' OR img = 'update_pre'
      |ORDER BY doc_id, change_type""".stripMargin

  // --------------------------------------------------------------- q144
  /** The CDC feed DRIVING a downstream incremental aggregate — proof
    * that [[VersionedTable.changes]]' image pairs are SUFFICIENT to
    * maintain derived state with no second corpus read: per-bucket
    * (n_docs, n_chars) stats are computed once over snapshot v1, then
    * maintained to v2 purely from the feed — `insert`/`update_post`
    * images ADD their contribution, `delete`/`update_pre` images
    * RETRACT theirs (the reason updates carry both images; a post-only
    * feed cannot retract a sum). The DuckDB oracle computes the same
    * stats DIRECTLY on planted v2, so a missed retraction, a
    * double-applied image, or a leaked COW-carried row all
    * hash-mismatch. At 100 TB this is the nightly shape of every
    * derived table downstream of the corpus: one delta-bounded feed
    * read plus a grid-sized merge, never a recompute-the-world scan. */
  def cdcIncrementalStats(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val root = docVtArtifact(spark, sfDir)
    val s1 = docVtSnap(spark, root, 1L)
    val s2 = docVtSnap(spark, root, 2L)
    val base = VersionedTable.read(spark, s1, root, vtChangesSchema)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(length(col("text"))), lit(0L)).as("n_chars"))
    val feed = VersionedTable.changes(spark, root, s1, s2,
      vtChangesSchema, "doc_id")
    val add = col("change_type").isin("insert", "update_post")
    val delta = feed.groupBy(col("bucket")).agg(
      sum(when(col("change_type") === "insert", 1L)
        .when(col("change_type") === "delete", -1L)
        .otherwise(0L)).as("d_docs"),
      sum(when(add, lit(1L)).otherwise(lit(-1L)) *
        coalesce(length(col("text")).cast("long"), lit(0L))).as("d_chars"))
    base.join(delta, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        (coalesce(col("n_docs"), lit(0L)) +
          coalesce(col("d_docs"), lit(0L))).as("n_docs"),
        (coalesce(col("n_chars"), lit(0L)) +
          coalesce(col("d_chars"), lit(0L))).as("n_chars"))
      .filter(col("n_docs") > 0) // a fully-emptied bucket leaves the grid
      .orderBy(col("bucket"))
  }

  // --------------------------------------------------------------- q147
  private val zoneSchema = new org.apache.spark.sql.types.StructType()
    .add("doc_id", org.apache.spark.sql.types.LongType)
    .add("n_chars", org.apache.spark.sql.types.LongType)
    .add("rbucket", org.apache.spark.sql.types.LongType)

  /** Build-once RANGE-bucketed versioned documents fixture for the
    * zone-map read path: partitions keyed by `doc_id div 100` so each
    * bucket's doc_id bounds are disjoint — the layout of a real corpus
    * whose ids are assigned in ingestion order. v2 COW-rewrites one
    * in-range bucket with identical content, so the served read crosses
    * BOTH a staged-stats generation and carried-over ones. */
  private def zoneVtArtifact(spark: SparkSession, sfDir: String): String = {
    val dir = VectorOps.artifactDir("graft_zonevt_fmt1", sfDir,
      sourceFile = "documents.parquet")
    if (VectorOps.buildArtifactOnce(dir, Seq("READY"))(tmp => {
        val v1 = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("n_chars"),
            (col("doc_id") / 100).cast("long").as("rbucket"))
        VersionedTable.publishFull(spark, tmp, "rbucket", v1)
        VersionedTable.publishDelta(spark, tmp, Seq(2L),
          v1.filter(col("rbucket") === 2L))
        val ready = java.nio.file.Paths.get(tmp, "READY")
        java.nio.file.Files.createDirectories(ready)
        java.nio.file.Files.createFile(ready.resolve("_SUCCESS"))
      })) {
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"q147: published range-bucketed v1 + COW rewrite at $dir (first " +
          "touch; later runs serve off the retained manifests)")
      VectorOps.sweepStaleArtifacts(dir, "graft_zonevt_", sfDir)
    }
    dir.toString
  }

  /** A doc_id-range read served THROUGH the manifest zone map
    * ([[VersionedTable.readRange]]): only partitions whose recorded
    * min/max overlap [150, 349] are handed to the scan — at 100 TB the
    * difference between touching the 2–3 buckets a key range lives in
    * and listing every file of the table (the manifest-level form of
    * the reference's parquet footer-stats probe, `app.py:91-100`; the
    * file-count law is pinned in `VersionedTableSpec`). The oracle is
    * the same range select straight off the raw table — the zone-map
    * layer must be answer-invariant. */
  def zonemapRangeRead(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val root = zoneVtArtifact(spark, sfDir)
    val snap = VersionedTable.currentSnapshot(spark, root).getOrElse(
      throw new IllegalStateException(s"zone-map artifact at $root unborn"))
    VersionedTable.readRange(spark, snap, root, zoneSchema,
        "doc_id", 150L, 349L)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  private val zonemapRangeReadSql =
    """SELECT doc_id, n_chars FROM documents
      |WHERE doc_id BETWEEN 150 AND 349 ORDER BY doc_id""".stripMargin

  /** Direct recomputation on planted v2 — what the incrementally
    * maintained grid must equal. */
  private val cdcIncrementalStatsSql =
    """WITH v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 97 = 0 THEN text || ' rev2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 89 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text
      |  FROM documents WHERE doc_id % 101 = 0)
      |SELECT doc_id % 16 AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS n_chars
      |FROM v2 GROUP BY 1 ORDER BY 1""".stripMargin

  override def ops: Seq[Op] = Seq(
    Op("q143_versioned_changes", versionedChanges, Some(versionedChangesSql),
      "manifest-level CDC between versioned snapshots: delta-bounded changed-partition read, insert/delete + update image-pair classify, COW rewrites silent"),
    Op("q144_cdc_incremental_stats", cdcIncrementalStats,
      Some(cdcIncrementalStatsSql),
      "CDC-maintained downstream aggregate: per-bucket doc/char grid computed on v1, maintained to v2 purely from the feed's add/retract images, oracle = direct v2 recompute"),
    Op("q147_zonemap_range_read", zonemapRangeRead,
      Some(zonemapRangeReadSql),
      "doc_id-range read served through the manifest zone map (per-partition min/max pruning recorded at publish), oracle = same range select on the raw table"),
    Op("q121_sketch_distinct", sketchDistinct, Some(sketchDistinctSql),
      "incremental per-source distinct contents across snapshots via mergeable HLL sketch union (exact ridealong + 5% tolerance flag)"),
    Op("q94_source_cap", sourceCap, Some(sourceCapSql),
      "per-source document cap by deterministic hash priority (rank<=cap window map-side pruned by WindowGroupLimit, domain-cap shape)"),
    Op("q95_boilerplate_ngrams", boilerplateNgrams, Some(boilerplateNgramsSql),
      "cross-doc boilerplate 3-grams per source (CCNet line-dedup shape at shingle granularity)"),
    Op("q96_split_assign", splitAssign, Some(splitAssignSql),
      "content-hash train/valid/test split with per-lang stratification audit (leakage-safe md5 buckets)"),
    Op("q97_token_freq_spectrum", tokenFreqSpectrum, Some(tokenFreqSpectrumSql),
      "token frequency spectrum + hapax share (Zipf / vocabulary diagnostics)"),
    Op("q98_diversity_coreset", diversityCoreset, Some(diversityCoresetSql),
      "greedy k-center diversity coreset (k=8): rounded-key selection replayed step-by-step in the oracle, packed-argmin assignment"),
    Op("q99_curation_pipeline", curationPipeline, Some(curationPipelineSql),
      "composed curation run: quality gate -> exact dedup -> source cap -> content-hash split -> per-(split,lang) doc/token counts"),
    Op("q100_snapshot_diff", snapshotDiff, Some(snapshotDiffSql),
      "corpus snapshot diff (added/removed/changed/unchanged by content hash) -- the incremental-processing primitive"),
    Op("q101_bpe_merges", bpeMerges, Some(bpeMergesSql),
      "tokenizer training: first 10 BPE merge rules from the word-frequency table, integer-exact, 10-round replayed oracle"),
    Op("q102_bpe_apply", bpeApply, Some(bpeApplySql),
      "tokenizer application: corpus compression ledger under the learned merges (ws/bpe/char counts + ratios)"),
    Op("q103_epoch_shuffle", epochShuffle, Some(epochShuffleSql),
      "deterministic epoch shuffle: md5(epoch,doc) keyed shard + in-shard position -- the reproducible training-order manifest"),
    Op("q104_outlier_mad", outlierMad, Some(outlierMadSql),
      "robust per-lang length outliers via median + MAD (4.4478*MAD fence, outlier-proof statistics)"),
    Op("q106_source_overlap", sourceOverlap, Some(sourceOverlapSql),
      "pairwise source content-overlap matrix (Jaccard over distinct md5 contents, all unordered pairs incl. zero pairs)"),
    Op("q108_snapshot_drift", snapshotDrift, Some(snapshotDriftSql),
      "per-source doc/token composition drift between crawl snapshots (q100's planted v2, share-shift monitoring)"),
    Op("q110_incremental_pipeline", incrementalPipeline,
      Some(incrementalPipelineSql),
      "incremental reprocessing: downstream split+token accounting over added+changed docs ONLY (q100's diff operationalized)"),
    Op("q111_length_drift_ks", lengthDriftKs, Some(lengthDriftKsSql),
      "two-sample KS drift test on doc-length distributions between snapshots (scaled-integer statistic, 128-bit exact verdict)"),
    Op("q113_license_screen", licenseScreen, Some(licenseScreenSql),
      "license/opt-out compliance screen: cc-by-nc / all-rights-reserved / noai marker counts + keep rate per source (planted markers, LIKE-only detection)"),
    Op("q116_weighted_sample", weightedSample, Some(weightedSampleSql),
      "weighted sampling without replacement (Efraimidis-Spirakis A-Res): byte-budget-proportional k=100 draw, md5-replayed keys, one-pass top-k plan"))
}
