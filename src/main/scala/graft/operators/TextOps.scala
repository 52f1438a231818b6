package graft.operators

import graft.{GraftSession, Memo, Op, OpCatalog, Tables}
import graft.functions.Rounding.roundVal
import graft.functions.TextExpressions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis and deduplication operators over `documents` (SURVEY.md
  * §2.3 E11/E12/E14; north-star dedup + text-analysis set).
  *
  * Dedup ladder, cheapest→strongest, each with a distinct scale profile:
  *  - exact (q30/q31): hash-groupBy — one shuffle on the key, linear.
  *  - near-dup pairwise (q32): 3-gram shingles + prefix-filtered set-
  *    similarity self-join — exact answer, DuckDB-checkable; one shuffle on
  *    shingle keys, no quadratic block.
  *  - MinHash LSH (q33): banded signatures → candidates share a band bucket
  *    → verify candidates exactly. Linear + one shuffle on band keys; THE
  *    100 TB path (candidate count ≈ true-pair count, not n²).
  *  - SimHash (q34): 64-bit fingerprints, banded Hamming candidates —
  *    constant per-doc state, cheapest near-dup signal.
  *  - clustering (q60): pairs → connected components via alternating
  *    large-star/small-star — O(log n) rounds, no driver-side data.
  *
  * The whole family consumes ONE memoized shingle base per (session, path)
  * — tokenize+shingle is the dominant shared cost and runs once, not once
  * per query (see [[graft.Memo]] for the cache-hygiene contract).
  */
object TextOps extends OpCatalog {

  /** THE whitespace tokenizer: lower + single-space split into tokens —
    * ONE Column definition for the shingle family (q32/q33/q34/q60), the
    * gram family (q109/q115/q120), the doc-stat family (q35–q39) and the
    * Zipf ranker: the round-9 gramTokenized fix closed this drift class
    * for the ≥8-token gate, and five hand-rolled copies of the split
    * itself remained — a delimiter/casing change in one would silently
    * desync the families while each oracle still matched its own side. */
  private[graft] def wsTokens: org.apache.spark.sql.Column =
    split(lower(col("text")), " ")

  /** Documents with lowercased word tokens. Lowercasing is applied here (not
    * assumed of the corpus) so token-level ops behave on mixed-case input;
    * every DuckDB oracle mirrors it with `lower(text)`. */
  private def toks(spark: SparkSession, sfDir: String): DataFrame =
    GraftSession.spread(Tables.documents(spark, sfDir), col("doc_id"))
      .withColumn("w", wsTokens)

  /** Distinct 3-gram word shingles: order-sensitive near-dup features.
    * Docs shorter than 3 tokens yield an EMPTY set (guard needed: Spark's
    * `sequence(1, 0)` counts DOWN, which would fabricate bogus shingles;
    * DuckDB's `range(1, len-1)` is empty there — both sides must agree).
    * The gram construction itself is the shared [[wordGramExpr]]. */
  private val shingles: Column = array_distinct(
    when(size(col("w")) >= 3, wordGramExpr(3))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))

  /** Space-joined n-word grams over an ARRAY<STRING> column named `w` —
    * the single source of the gram definition shared by the batch
    * contamination check (q69) and its streaming screen twin
    * ([[graft.streaming.StreamingOps]]), whose spec-asserted equivalence
    * would silently drift if each site hand-rolled the expression. Caller
    * contract: rows are pre-filtered to `size(w) >= n` (Spark's
    * `sequence(1, 0)` counts DOWN and would fabricate grams otherwise —
    * same guard rationale as [[shingles]]). */
  private[graft] def wordGramExpr(n: Int): Column = {
    val terms = (0 until n).map { j =>
      (j - 1) match {
        case -1 => "w[i-1]"
        case 0  => "w[i]"
        case k  => s"w[i+$k]"
      }
    }.mkString(", ")
    expr(s"transform(sequence(1, size(w) - ${n - 1}), " +
      s"i -> concat_ws(' ', $terms))")
  }

  /** The contamination family's TOKENIZER half, completing what
    * [[wordGramExpr]] does for the gram half: lower + space-split into
    * `w` + the ≥8-token gate. ONE definition for batch q69
    * ([[graft.operators.PipelineOps]].contamination), the streaming
    * screen, and the benchmark-gram-set builder — previously three
    * hand-synced copies, where a delimiter/casing/min-length change in
    * one would silently break the spec-asserted screen==q69 law
    * (round-9 review). */
  private[graft] def gramTokenized(docs: DataFrame): DataFrame =
    docs.withColumn("w", wsTokens)
      .filter(size(col("w")) >= 8)

  /** Shingle base of ANY `(doc_id, lang, text)` frame — the parameterized
    * core behind [[shingled]], also driven directly by `ScaleStressSpec`
    * over planted-duplicate corpora. */
  private[graft] def shingledOf(docs: DataFrame): DataFrame =
    GraftSession.spread(docs, col("doc_id"))
      .withColumn("w", wsTokens)
      .select(col("lang"), col("doc_id"), array_sort(shingles).as("sh"))
      .withColumn("n", size(col("sh")))

  /** Shared shingle base for the whole near-dup family (q32/q33/q34/q60):
    * `(doc_id, lang, sh sorted-distinct, n)`. Memoized per (session, path)
    * — the tokenize+shingle pass is ~2 s per query at sf0.1 and was paid
    * independently by each family member in round 1. A few MB per 5k docs;
    * at cluster scale this is the persist-vs-recompute decision and the
    * default MEMORY_AND_DISK level spills rather than evicts. */
  private def shingled(spark: SparkSession, sfDir: String): DataFrame =
    Memo.cached(spark, s"textops:shingled:$sfDir") {
      shingledOf(Tables.documents(spark, sfDir))
    }

  // ---------------------------------------------------------------- q30
  /** Exact dedup, content-keyed (E11): group by full text and report the
    * dedup summary (stable at any SF). The survivor-picking variant with
    * a deterministic keeper (lowest doc_id) is q31. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    Tables.documents(spark, sfDir)
      .groupBy(col("text"))
      // (q31 is the keeper-REPORTING variant; this summary never reads a
      // keeper, so computing min(doc_id) here would just add a dead
      // aggregation buffer to the corpus-sized shuffle)
      .agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_unique"),
        sum(col("cnt") - 1).as("n_dups_removed"),
        sum(col("cnt")).as("n_docs"))
  }

  private val dedupExactSql =
    """SELECT count(*) AS n_unique,
      |  CAST(sum(cnt - 1) AS BIGINT) AS n_dups_removed,
      |  CAST(sum(cnt) AS BIGINT) AS n_docs
      |FROM (SELECT count(*) AS cnt FROM documents GROUP BY text)""".stripMargin

  // ---------------------------------------------------------------- q31
  /** Keyed dedup with deterministic survivor (E11): one row per
    * (lang, source), keeping the lowest doc_id — the `row_number() = 1`
    * formulation of `dropDuplicates`, which (unlike dropDuplicates itself)
    * pins WHICH row survives. */
  def dedupKeyed(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("doc_id"))
    Tables.documents(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("lang"), col("source"), col("doc_id").as("keeper"),
        col("n_chars"))
      .orderBy(col("lang"), col("source"))
  }

  private val dedupKeyedSql =
    """SELECT lang, source, doc_id AS keeper, n_chars
      |FROM (SELECT lang, source, doc_id, n_chars,
      |        row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
      |      FROM documents)
      |WHERE rn = 1
      |ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Near-dup detection, EXACT, via prefix filtering (E12): 3-gram shingle
    * Jaccard ≥ 0.8 within lang blocks. Instead of the naive n² self-join,
    * this is a set-similarity join (PPJoin-family prefix filter): sort each
    * doc's shingle set in a fixed total order and emit only its first
    * `|s| - ⌈0.8·|s|⌉ + 1` shingles — two sets with Jaccard ≥ 0.8 MUST
    * share a prefix shingle (pigeonhole), so candidates come from an
    * equi-join on (lang, shingle) and only candidates pay the exact
    * verification. A length-ratio filter (`jac ≤ min/max of sizes`) prunes
    * further before the intersect. Same answer as the naive join — the
    * DuckDB oracle states the naive formulation — but linear-ish at scale:
    * one shuffle on shingle keys, no quadratic block.
    * Jaccard is an integer ratio — bit-identical in both engines.
    *
    * The pair RESULT is memoized per (session, path): q32 (the declared
    * query) and q60 (clustering) both consume it; without the memo a
    * combined run pays the similarity join twice. */
  def neardupShingle(spark: SparkSession, sfDir: String): DataFrame =
    Memo.cached(spark, s"textops:neardup_pairs:$sfDir") {
      neardupShingleUncached(spark, sfDir)
    }

  private def neardupShingleUncached(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    // the memoized shingle base feeds five branches of this plan (freq agg,
    // ordering join, both verify sides) — and every sibling query
    exactNeardupFromShingled(shingled(spark, sfDir), 0.8)
  }

  /** PPJoin candidate id-pairs `(id_a, id_b)` of a shingle base at
    * threshold `t` — the pre-verification surface, split out so
    * `ScaleStressSpec` can measure candidate-set growth against corpus
    * size (the property that makes this the non-n² plan at 100 TB). */
  private[graft] def prefixCandidates(base: DataFrame, t: Double): DataFrame = {
    // PPJoin refinement: order each doc's shingles by ascending global
    // document frequency so the emitted prefixes are the RAREST shingles —
    // minimal join-key collisions. Any fixed total order keeps exactness;
    // frequency order makes the candidate set near-optimal.
    val ex = base.select(col("lang"), col("doc_id"), explode(col("sh")).as("s"))
    val freq = ex.groupBy(col("s")).agg(count(lit(1)).as("f"))
    val ordered = ex.join(freq, "s")
      .groupBy(col("lang"), col("doc_id"))
      .agg(expr("transform(array_sort(collect_list(struct(f, s))), x -> x.s)")
        .as("by_rarity"))
    // Ids-only through the prefix shuffle: carrying the shingle arrays here
    // would move each doc's full payload |pfx|× (≈26× at t=0.8 on ~130
    // shingles) through the exchange; the verify joins arrays back ONCE,
    // post-distinct — the same shape as [[minhashFromShingled]].
    val d = base.join(ordered, Seq("lang", "doc_id"))
      // prefix length for threshold t: |s| - ceil(t*|s|) + 1
      .withColumn("pfx",
        expr(s"slice(by_rarity, 1, n - CAST(ceil($t * n) AS INT) + 1)"))
      .select(col("lang"), col("doc_id"), col("n"), explode(col("pfx")).as("p"))
    d.select(col("lang"), col("doc_id").as("id_a"), col("n").as("n_a"),
        col("p"))
      .join(d.select(col("lang").as("lang_b"), col("doc_id").as("id_b"),
          col("n").as("n_b"), col("p").as("p_b")),
        col("lang") === col("lang_b") && col("p") === col("p_b") &&
          col("id_a") < col("id_b") &&
          // length-ratio bound: jac >= t requires min/max >= t
          col("n_a") * t <= col("n_b") && col("n_b") * t <= col("n_a"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact set-similarity join (PPJoin candidates + exact Jaccard verify)
    * over any shingle base — the parameterized core of q32. */
  private[graft] def exactNeardupFromShingled(base: DataFrame, t: Double): DataFrame = {
    val byId = base.select(col("doc_id"), col("sh"))
    prefixCandidates(base, t)
      .join(byId.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(byId.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jac", col("inter") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .filter(col("jac") >= t)
      .select(col("id_a"), col("id_b"), roundVal(col("jac"), 4).as("jac"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The 3-gram shingle-docs CTE, parameterized by CTE name — ONE
    * definition (ccOracleCtes' q73/q83 rule) for the q32/q33/q34 oracles
    * and the q60/q86 closure chain; previously four verbatim copies an
    * edit to the shingle construction would have to hand-sync. */
  /** [[graft.functions.Rounding.roundValSql]] alias for this file's
    * oracle strings — the floor form is generated, not hand-rolled, so
    * a convention change edits ONE definition (round-9 review; commit
    * e4c8c29 paid the 17-copy edit this removes). */
  private def rv(e: String, scale: Int): String =
    graft.functions.Rounding.roundValSql(e, scale)

  private def shingleDocsCte(name: String): String =
    s"""$name AS (
       |  SELECT doc_id, lang,
       |    list_distinct(list_transform(range(1, len(w) - 1),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS w FROM documents))""".stripMargin

  private val neardupShingleSql =
    s"""WITH ${shingleDocsCte("d")}
      |SELECT id_a, id_b, ${rv("jac", 4)} AS jac FROM (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    len(list_intersect(a.sh, b.sh)) /
      |      CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jac
      |  FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id)
      |WHERE jac >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q33
  /** Near-dup via MinHash LSH (E12 scale path): 32-permutation signatures,
    * 8 bands × 4 rows. Candidates = pairs sharing any band bucket (shuffle
    * on band keys — linear, no n² join); candidates are then verified with
    * the exact shingle Jaccard. Same schema as q32. Oracle-declared: the
    * md5-based affine permutation family (see
    * [[graft.functions.TextExpressions.minhashEval]]) is replayed exactly
    * in DuckDB via `md5_number_lower` + HUGEINT arithmetic, so signatures,
    * band buckets, candidates and the verified output all hash-match.
    * `TextOpsSpec` additionally asserts q33 ⊆ q32 (precision 1.0 by
    * construction) and measures recall. */
  def neardupMinhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    // signature frame is memoized: the banded candidate join reads it from
    // BOTH sides, and the per-shingle MinHash pass is the query's real
    // cost — pay it once per (session, path). Empty shingle sets are
    // dropped BEFORE banding: their all-sentinel signatures would
    // otherwise collide into one bucket whose candidate count is quadratic
    // in the number of short docs (the oracle drops them implicitly —
    // unnest of an empty list yields no rows).
    val base = shingled(spark, sfDir)
    val sig = Memo.cached(spark, s"textops:minhash_sig:$sfDir") {
      base.filter(size(col("sh")) > 0)
        .select(col("doc_id"), col("lang"),
          TextExpressions.minhashSignature(col("sh"), 32).as("sig"))
    }
    minhashFromShingled(base, sig, sigLen = 32, bands = 8, rows = 4, t = 0.8)
  }

  /** Banded-MinHash candidate+verify core over any shingle base and its
    * signature frame — the parameterized core of q33, also driven by
    * `ScaleStressSpec` for boundary-similarity recall measurement.
    * `sigLen` is the signature length the CALLER built `sig` with; it must
    * equal `bands · rows`, else the band slices would silently run off the
    * end of the array (`slice` past-the-end returns EMPTY arrays, every
    * doc collides in one constant bucket, and the candidate set goes
    * quadratic with no error — the exact failure LSH exists to prevent). */
  private[graft] def minhashFromShingled(base: DataFrame, sig: DataFrame,
      sigLen: Int, bands: Int, rows: Int, t: Double): DataFrame = {
    require(bands * rows == sigLen,
      s"bands*rows (${bands * rows}) must equal the signature length ($sigLen)")
    // Band join carries ONLY (band, bucket, lang, id) — the shingle arrays
    // would otherwise be shuffled bands× over; candidates join back to the
    // (id → shingles) side for verification, so array bytes move once.
    // The bucket is the band's VALUE slice (rows longs), not a re-hash of
    // it: candidate semantics are exactly "share a band tuple" — what the
    // DuckDB oracle replays — with no re-hash collision term; the key is
    // rows×8 bytes vs 8, a wash against the (id, lang) payload.
    val banded = sig.select(col("doc_id"), col("lang"),
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
          s"b -> slice(sig, b * $rows + 1, $rows))"))
          .as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("lang"))
    val r = banded.select(col("band").as("band_r"), col("bucket").as("bucket_r"),
      col("doc_id").as("id_b"), col("lang").as("lang_r"))
    val candIds = l.join(r,
        col("band") === col("band_r") && col("bucket") === col("bucket_r")
          && col("lang") === col("lang_r") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b") // same pair may collide in many bands
    val byId = base.select(col("doc_id"), col("sh"))
    candIds
      .join(byId.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(byId.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jac", col("inter") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .filter(col("jac") >= t)
      .select(col("id_a"), col("id_b"), roundVal(col("jac"), 4).as("jac"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** DuckDB replay of q33: identical shingles (q32's CTE), base hash
    * `md5_number_lower` ≡ [[graft.functions.TextExpressions.md5Low64]],
    * the same affine coefficients mod 2^61−1 (HUGEINT products are exact:
    * a,h < 2^61 → a·h < 2^122 < 2^127), band tuples grouped `i // 4`
    * matching the engine's `slice(sig, b*4+1, 4)`, then the exact-Jaccard
    * verify shared with q32. */
  private val neardupMinhashSql =
    s"""WITH ${shingleDocsCte("d")},
      |hh AS (
      |  SELECT doc_id, lang,
      |    md5_number_lower(g)::HUGEINT % 2305843009213693951 AS h
      |  FROM (SELECT doc_id, lang, unnest(sh) AS g FROM d)),
      |perm AS (
      |  SELECT doc_id, lang, i,
      |    min((((2*i+1)::HUGEINT * 11400714819323198485) % 2305843009213693951 * h
      |         + (i::HUGEINT * 14029467366897019727) % 2305843009213693951)
      |        % 2305843009213693951) AS v
      |  FROM hh CROSS JOIN range(32) t(i) GROUP BY doc_id, lang, i),
      |bnd AS (
      |  SELECT doc_id, lang, i // 4 AS band, list(v ORDER BY i) AS bsig
      |  FROM perm GROUP BY doc_id, lang, i // 4),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bnd a JOIN bnd b ON a.band = b.band AND a.bsig = b.bsig
      |    AND a.lang = b.lang AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b, ${rv("jac", 4)} AS jac FROM (
      |  SELECT c.id_a, c.id_b,
      |    len(list_intersect(x.sh, y.sh)) /
      |      CAST(len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)) AS DOUBLE) AS jac
      |  FROM cand c JOIN d x ON x.doc_id = c.id_a JOIN d y ON y.doc_id = c.id_b)
      |WHERE jac >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q34
  /** SimHash fingerprints (E12, cheapest signal): 64-bit fingerprint per
    * doc via a custom Catalyst expression; near-dup candidates share one of
    * four 16-bit Hamming bands. Output: candidate pairs + Hamming distance
    * ≤ 6. Oracle-declared: the md5-based bit-majority fingerprint, the
    * 16-bit band split and the xor/bit_count Hamming verify are all
    * replayed exactly in DuckDB (`md5_number_lower`, HUGEINT bit
    * arithmetic, two's-complement fold). */
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    // fingerprints are 8 bytes/doc; memoized so the self-join's two
    // branches don't each recompute the shingle+simhash pass. Empty
    // shingle sets are dropped BEFORE banding: fp=0 for every such doc, so
    // they'd all pair with each other at Hamming 0 (quadratic in short
    // docs; the oracle drops them implicitly via unnest of empty lists).
    val d = Memo.cached(spark, s"textops:simhash_fp:$sfDir") {
      shingled(spark, sfDir).filter(size(col("sh")) > 0)
        .select(col("doc_id"), col("lang"),
          TextExpressions.simhash64(col("sh")).as("fp"))
    }
    // id+fp only through the band shuffle (fp is 8 bytes — cheap enough to
    // carry, saving the verify-side join q33 needs for its big arrays)
    val banded = d.select(col("doc_id"), col("lang"), col("fp"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> shiftright(fp, b * 16) & 65535)"))
        .as(Seq("band", "chunk")))
    val l = banded.select(col("band"), col("chunk"), col("lang"),
      col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val r = banded.select(col("band").as("band_r"), col("chunk").as("chunk_r"),
      col("lang").as("lang_r"), col("doc_id").as("id_b"), col("fp").as("fp_b"))
    l.join(r, col("band") === col("band_r") && col("chunk") === col("chunk_r")
        && col("lang") === col("lang_r") && col("id_a") < col("id_b"))
      // filter Hamming BEFORE the pair dedup — far fewer rows to distinct
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= 6)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .dropDuplicates("id_a", "id_b")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** DuckDB replay of q34: same shingles, `md5_number_lower` base hash,
    * per-bit majority vote in HUGEINT, two's-complement fold to the signed
    * BIGINT fingerprint (q38's pattern), 16-bit bands extracted from the
    * UNSIGNED value (the engine's `shiftright(fp,48) & 65535` masks away
    * the sign-extension, so the two agree on every band), and xor +
    * bit_count Hamming — DuckDB's bit_count on BIGINT is two's-complement,
    * matching Spark's. */
  private val simhashPairsSql =
    s"""WITH ${shingleDocsCte("d")},
      |hh AS (
      |  SELECT doc_id, lang, md5_number_lower(g)::HUGEINT AS u
      |  FROM (SELECT doc_id, lang, unnest(sh) AS g FROM d)),
      |bits AS (
      |  SELECT doc_id, lang, b,
      |    sum(CASE WHEN (u // (1::HUGEINT << b)) % 2 = 1 THEN 1 ELSE -1 END) AS acc
      |  FROM hh CROSS JOIN range(64) t(b) GROUP BY doc_id, lang, b),
      |fps AS (
      |  SELECT doc_id, lang, fpu,
      |    CAST(CASE WHEN fpu >= 9223372036854775808::HUGEINT
      |         THEN fpu - 18446744073709551616::HUGEINT ELSE fpu END AS BIGINT) AS fp
      |  FROM (
      |    SELECT doc_id, lang,
      |      sum(CASE WHEN acc > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END) AS fpu
      |    FROM bits GROUP BY doc_id, lang)),
      |bnd AS (
      |  SELECT doc_id, lang, fp, band,
      |    (fpu // (1::HUGEINT << (16 * band))) % 65536 AS chunk
      |  FROM fps CROSS JOIN range(4) t(band))
      |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
      |FROM bnd a JOIN bnd b ON a.band = b.band AND a.chunk = b.chunk
      |  AND a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.fp, b.fp)) <= 6
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q35
  /** Per-document token stats (E14 / north-star token counting): token
    * count, distinct tokens, type-token ratio, mean token length. */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    toks(spark, sfDir)
      .select(col("doc_id"),
        size(col("w")).as("n_tokens"),
        size(array_distinct(col("w"))).as("n_distinct"),
        roundVal(size(array_distinct(col("w"))) / size(col("w")).cast("double"), 4)
          .as("ttr"),
        roundVal(expr("aggregate(w, 0, (acc, x) -> acc + length(x))") /
          size(col("w")).cast("double"), 4).as("avg_tok_len"))
      .orderBy(col("doc_id"))
  }

  private val tokenStatsSql =
    s"""SELECT doc_id,
      |  len(w) AS n_tokens,
      |  len(list_distinct(w)) AS n_distinct,
      |  ${rv("len(list_distinct(w)) / CAST(len(w) AS DOUBLE)", 4)} AS ttr,
      |  ${rv("list_sum(list_transform(w, x -> length(x))) / CAST(len(w) AS DOUBLE)", 4)} AS avg_tok_len
      |FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q36
  /** Global word frequency (E14): explode → count → top 20. The Spark plan
    * is generate + partial agg + final agg + TakeOrdered — the classic
    * word-count shape, fully distributed. */
  def wordFreq(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    toks(spark, sfDir)
      .select(explode(col("w")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)
  }

  private val wordFreqSql =
    """SELECT word, count(*) AS n
      |FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
      |GROUP BY word
      |ORDER BY n DESC, word
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q84
  /** EXACT heavy hitters via a Misra–Gries candidate prefilter — every
    * token holding ≥ 1/32 of all token occurrences, with exact counts and
    * shares. The declared OUTPUT is plain SQL (the oracle computes it with
    * a full GROUP BY); the Spark PLAN never builds the full vocabulary
    * aggregate: pass 1 reduces each partition to a k=64-counter
    * [[graft.functions.MisraGriesAggregator]] summary (guaranteed to
    * contain every item above n/(k+1) < n/32 — so candidates ⊇ answers,
    * see the aggregator's scaladoc for the 1982/PODS-2012 provenance),
    * pass 2 exact-counts ONLY tokens surviving a map-membership filter
    * against the broadcast 1-row sketch (≤64 candidates). At 100 TB pass 1 shuffles a few KB of
    * summaries and pass 2 a ≤64-key aggregate — vs the full-vocabulary
    * (billions of distinct keys) shuffle the naive form pays. The final
    * integer threshold compare (`cnt·32 ≥ n`) and one `round(·,4)` share
    * keep the output hash-exact cross-engine. */
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    import org.apache.spark.sql.functions.udaf
    val words = toks(spark, sfDir).select(explode(col("w")).as("word"))
    val mg = udaf(new graft.functions.MisraGriesAggregator(64))
    // ONE pass computes both the sketch and the exact total in a single
    // 1-row frame (a ≤64-entry map + a long), which broadcasts into
    // pass 2 — the in-plan form of the sketch pattern (q77's bloom
    // scalar subquery is the same idea). Keeping it one frame matters
    // twice over: the plan stays LAZY (an eager collect here made
    // graft.Explain run the full corpus job just to print a plan), and
    // a single consumer means column pruning can't split the aggregate
    // into sketch-only/count-only copies that re-scan the corpus (the
    // ReuseExchange failure the previous two-frame version hit). The
    // cross join is a broadcast of ONE row; the map_contains_key filter
    // prunes pass 2 to ≤64 keys, so the corpus is scanned exactly twice
    // and nothing corpus-sized ever converges anywhere.
    val pass1 = words.agg(mg(col("word")).as("sketch"),
      count(lit(1)).as("n"))
    words.crossJoin(broadcast(pass1))
      .filter(expr("map_contains_key(sketch, word)"))
      .groupBy(col("word"), col("n")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 32 >= col("n"))
      .select(col("word"), col("cnt"),
        roundVal(col("cnt") / col("n").cast("double"), 4).as("share"))
      .orderBy(col("cnt").desc, col("word"))
  }

  private val heavyHittersSql =
    s"""WITH tok AS (
      |  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
      |tot AS (SELECT count(*) AS n FROM tok)
      |SELECT word, count(*) AS cnt,
      |  ${rv("count(*) / CAST(n AS DOUBLE)", 4)} AS share
      |FROM tok CROSS JOIN tot
      |GROUP BY word, n
      |HAVING count(*) * 32 >= n
      |ORDER BY cnt DESC, word""".stripMargin

  // ---------------------------------------------------------------- q91
  /** Vocabulary growth curve (Heaps'-law profile) — distinct BIGRAM
    * vocabulary as the corpus grows, the saturation signal tokenizer
    * training (BPE merges operate on pairs) and dedup-quality monitoring
    * both read. Bigram vocabulary, not unigram: the fixture's 31-word
    * unigram vocabulary saturates inside the first bucket (a vacuous
    * one-row curve — the q63 lesson), while its ~900 bigrams keep
    * arriving for most of the corpus. The naive formulation (count
    * distinct grams over every prefix) is quadratic in prefixes; this is
    * the one-pass form: the bucket where each GRAM FIRST APPEARS (one
    * min-agg on gram) gives per-bucket new-gram counts, and the running
    * sum of those IS the curve — `cum_vocab(b) = Σ_{b'≤b} new(b')`.
    *
    * Buckets are 10-doc id ranges (deterministic, not time- or
    * partition-dependent). Scale: one gram explode → min-agg shuffle on
    * gram (vocabulary-sized, map-combined), one ≤#buckets agg, one
    * window over the tiny bucket frame. Never a prefix-by-prefix rescan. */
  def vocabGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val firstSeen = toks(spark, sfDir)
      .filter(size(col("w")) >= 2) // wordGramExpr caller contract
      .select(col("doc_id"), explode(wordGramExpr(2)).as("gram"))
      .groupBy(col("gram"))
      .agg(min(expr("doc_id div 10")).as("bucket"))
    firstSeen
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("new_grams"))
      .withColumn("cum_vocab",
        sum(col("new_grams")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("bucket"))
  }

  private val vocabGrowthSql =
    """WITH d AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
      |  WHERE len(string_split(lower(text), ' ')) >= 2),
      |g AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(w)),
      |      i -> w[i] || ' ' || w[i+1])) AS gram
      |  FROM d),
      |first_seen AS (
      |  SELECT gram, min(doc_id // 10) AS bucket FROM g GROUP BY gram),
      |per_bucket AS (
      |  SELECT bucket, count(*) AS new_grams FROM first_seen GROUP BY bucket)
      |SELECT bucket, new_grams,
      |  CAST(sum(new_grams) OVER (ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_vocab
      |FROM per_bucket
      |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q37
  /** Quality scoring per language (north-star): type-token ratio, stopword
    * ratio, chars-per-token — the length/punct/stopword heuristics of
    * pretraining-data filters, aggregated per lang. */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    toks(spark, sfDir)
      .withColumn("n_tok", size(col("w")))
      .withColumn("ttr",
        size(array_distinct(col("w"))) / col("n_tok").cast("double"))
      .withColumn("stop_ratio",
        size(expr("filter(w, x -> array_contains(array('the','a','of','and','to'), x))"))
          / col("n_tok").cast("double"))
      .withColumn("chars_per_tok", col("n_chars") / col("n_tok").cast("double"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        roundVal(avg(col("ttr")), 4).as("avg_ttr"),
        roundVal(avg(col("stop_ratio")), 4).as("avg_stop_ratio"),
        roundVal(avg(col("chars_per_tok")), 4).as("avg_chars_per_tok"))
      .orderBy(col("lang"))
  }

  private val qualityScoreSql =
    s"""SELECT lang, count(*) AS n_docs,
      |  ${rv("avg(len(list_distinct(w)) / CAST(len(w) AS DOUBLE))", 4)} AS avg_ttr,
      |  ${rv("avg(len(list_filter(w, x -> list_contains(['the','a','of','and','to'], x))) / CAST(len(w) AS DOUBLE))", 4)} AS avg_stop_ratio,
      |  ${rv("avg(n_chars / CAST(len(w) AS DOUBLE))", 4)} AS avg_chars_per_tok
      |FROM (SELECT lang, n_chars, string_split(lower(text), ' ') AS w FROM documents)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Content fingerprints (north-star document fingerprinting): the
    * engine's polynomial rolling hash (order-sensitive, custom codegen
    * expression) + md5 per doc. BOTH columns are hash-exact against
    * DuckDB: md5 exists in both engines, and the rolling hash's
    * `h = h*31 + signed_byte (mod 2^64)` recurrence over UTF-8 bytes is
    * replayed in the oracle with HUGEINT `list_reduce` arithmetic — so the
    * fingerprint MECHANISM itself is oracle-verified, not just spec'd.
    * (SimHash gets the same treatment through q34_simhash_pairs, whose
    * md5-based fingerprint is likewise replayed in its oracle.) */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    toks(spark, sfDir)
      .select(col("doc_id"),
        TextExpressions.rollingHash64(col("text")).as("content_fp"),
        md5(col("text")).as("md5_fp"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB replay of [[graft.functions.TextExpressions.rollingHashEval]]:
    * UTF-8 bytes via `hex(encode(text))`, Java's SIGNED byte values
    * (b≥128 → b-256), wrap-around mod 2^64 in HUGEINT, final two's-
    * complement fold back to BIGINT. */
  private val fingerprintsSql =
    """WITH b AS (
      |  SELECT doc_id, md5(text) AS md5_fp,
      |         upper(hex(encode(text))) AS hx,
      |         octet_length(encode(text)) AS nb
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, md5_fp,
      |    list_reduce(
      |      list_prepend(1125899906842597::HUGEINT,
      |        list_transform(range(1, nb + 1), i ->
      |          CAST(CASE WHEN (strpos('0123456789ABCDEF', substring(hx, 2*i-1, 1)) - 1) * 16
      |                       + (strpos('0123456789ABCDEF', substring(hx, 2*i, 1)) - 1) >= 128
      |               THEN (strpos('0123456789ABCDEF', substring(hx, 2*i-1, 1)) - 1) * 16
      |                       + (strpos('0123456789ABCDEF', substring(hx, 2*i, 1)) - 1) - 256
      |               ELSE (strpos('0123456789ABCDEF', substring(hx, 2*i-1, 1)) - 1) * 16
      |                       + (strpos('0123456789ABCDEF', substring(hx, 2*i, 1)) - 1) END AS HUGEINT))),
      |      (acc, x) -> ((acc * 31 + x) % 18446744073709551616::HUGEINT
      |                   + 18446744073709551616::HUGEINT) % 18446744073709551616::HUGEINT) AS h0
      |  FROM b)
      |SELECT doc_id,
      |  CAST(CASE WHEN h0 >= 9223372036854775808::HUGEINT
      |       THEN h0 - 18446744073709551616::HUGEINT ELSE h0 END AS BIGINT) AS content_fp,
      |  md5_fp
      |FROM h
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Language-ID heuristic (north-star): stopword-profile voting over a
    * tiny per-language marker list, argmax with deterministic tiebreak.
    * Output is a lang × predicted confusion matrix. Oracle-declared: the
    * profiles are LITERALS, so the whole query is plain SQL — the struct
    * argmax (max of (score, plang) pairs, ties to the greatest language
    * tag) replays in DuckDB as `list_sort(structs)[last]`. */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    // Public-knowledge marker words per language; the testdata's text is
    // synthetic English-ish soup, so this exercises the mechanism (scored
    // argmax over profiles), not real-world accuracy.
    val profiles = Map(
      "en" -> Seq("the", "a", "of", "and", "to"),
      "es" -> Seq("el", "la", "de", "y", "que"),
      "de" -> Seq("der", "die", "und", "das", "ist"),
      "fr" -> Seq("le", "la", "de", "et", "les"),
      "zh" -> Seq("de", "shi", "le", "bu", "wo"))
    val scores = profiles.map { case (l, words) =>
      val arr = s"array(${words.map(w => s"'$w'").mkString(",")})"
      struct(
        size(expr(s"filter(w, x -> array_contains($arr, x))")).as("score"),
        lit(l).as("plang"))
    }.toSeq
    toks(spark, sfDir)
      .withColumn("best", greatest(scores: _*))
      .select(col("lang"), col("best.plang").as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** DuckDB twin of [[langId]]: same profiles, same (score, plang)
    * lexicographic tiebreak — Spark's `greatest` over structs ==
    * ascending `list_sort`'s last element. */
  private val langIdSql =
    """WITH d AS (SELECT lang, string_split(lower(text), ' ') AS w FROM documents),
      |s AS (SELECT lang, list_sort([
      |  {'score': len(list_filter(w, x -> list_contains(['the','a','of','and','to'], x))), 'plang': 'en'},
      |  {'score': len(list_filter(w, x -> list_contains(['el','la','de','y','que'], x))), 'plang': 'es'},
      |  {'score': len(list_filter(w, x -> list_contains(['der','die','und','das','ist'], x))), 'plang': 'de'},
      |  {'score': len(list_filter(w, x -> list_contains(['le','la','de','et','les'], x))), 'plang': 'fr'},
      |  {'score': len(list_filter(w, x -> list_contains(['de','shi','le','bu','wo'], x))), 'plang': 'zh'}])[5] AS best
      |FROM d)
      |SELECT lang, best.plang AS predicted, count(*) AS n
      |FROM s GROUP BY lang, predicted
      |ORDER BY lang, predicted""".stripMargin

  // ---------------------------------------------------------------- q60
  /** Dedup endgame: near-dup PAIRS (q32) → connected-component CLUSTERS →
    * canonical keep-list. Components run as alternating large-star/
    * small-star rounds — see [[GraphOps.connectedComponents]] for the
    * algorithm and its scale shape (O(log n) rounds, one materializing job
    * per round, no driver-side data). q78 applies the same machinery to the
    * embedding-similarity graph.
    * Oracle: a recursive CTE computing the same transitive closure. */
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    ccLabels(spark, sfDir).orderBy(col("doc_id"))
  }

  /** Session-shared cluster labels over the memoized near-dup pair set —
    * q60 AND q86 both consume them, and the star-round loop behind them
    * is multiple materializing jobs per round (historically a third of
    * the bench when paid twice). Memoized like the pair set one level
    * down. */
  private def ccLabels(spark: SparkSession, sfDir: String): DataFrame =
    Memo.cached(spark, s"textops:cc_labels:$sfDir") {
      GraphOps.connectedComponents(
          neardupShingle(spark, sfDir), "id_a", "id_b")
        .select(col("node").as("doc_id"), col("canon").as("canon_id"))
    }

  // ---------------------------------------------------------------- q86
  /** Cluster representatives — the KEEP decision that completes the dedup
    * ladder: pairs (q32) → clusters (q60) → one surviving document per
    * cluster. The representative is the cluster's best document by a
    * total-order policy (longest `n_chars`, then smallest `doc_id` — ties
    * can never be engine-ambiguous), reported with the cluster size and
    * how many documents the decision drops. This is the row a 100 TB
    * dedup run actually writes back out; q60's labels alone don't tell a
    * pipeline WHICH copy to keep.
    *
    * Scale: the CC stage is q60's (O(log n) star rounds); the keep pass
    * adds one equi-join of the cluster labels against the docs table (the
    * labels side is only the docs that appear in any near-dup pair —
    * vastly smaller than the corpus, AQE broadcasts it) and one window
    * over canon_id, whose partitions are cluster-sized (bounded, small).
    * No new corpus-wide shuffle. */
  def clusterRepresentatives(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val labels = ccLabels(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val byCanon = Window.partitionBy(col("canon_id"))
    labels.join(docs, "doc_id")
      .withColumn("rn", row_number().over(
        byCanon.orderBy(col("n_chars").desc, col("doc_id").asc)))
      .withColumn("cluster_size", count(lit(1)).over(byCanon))
      .filter(col("rn") === 1)
      .select(col("canon_id"), col("doc_id").as("rep_doc_id"),
        col("source").as("rep_source"), col("n_chars").as("rep_chars"),
        col("cluster_size"),
        (col("cluster_size") - 1L).as("n_dropped"))
      .orderBy(col("canon_id"))
  }

  /** The shingle→pairs→edges→transitive-closure CTE chain shared by the
    * q60 and q86 oracles — ONE definition (the q73/q83 single-definition
    * rule): the 0.8 Jaccard threshold, the 3-shingle construction, and
    * the closure must change in lockstep with the Spark plan both
    * queries reuse (`neardupShingle` + `GraphOps`), or an edit to one
    * dialect copy would silently desync the other's oracle. */
  private val ccOracleCtes =
    s"""${shingleDocsCte("sh_docs")},
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh_docs a
      |  JOIN sh_docs b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.sh, b.sh)) /
      |    CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.8),
      |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  SELECT a AS node, b AS reachable FROM edges
      |  UNION
      |  SELECT r.node, e.b FROM reach r JOIN edges e ON r.reachable = e.a)""".stripMargin

  private val clusterRepresentativesSql =
    s"""WITH RECURSIVE $ccOracleCtes,
       |labels AS (
       |  SELECT node AS doc_id,
       |    CAST(least(node, min(reachable)) AS BIGINT) AS canon_id
       |  FROM reach GROUP BY node),
       |ranked AS (
       |  SELECT l.canon_id, l.doc_id, d.source, d.n_chars,
       |    row_number() OVER (PARTITION BY l.canon_id
       |      ORDER BY d.n_chars DESC, l.doc_id ASC) AS rn,
       |    count(*) OVER (PARTITION BY l.canon_id) AS cluster_size
       |  FROM labels l JOIN documents d ON l.doc_id = d.doc_id)
       |SELECT canon_id, doc_id AS rep_doc_id, source AS rep_source,
       |  n_chars AS rep_chars, cluster_size,
       |  CAST(cluster_size - 1 AS BIGINT) AS n_dropped
       |FROM ranked WHERE rn = 1
       |ORDER BY canon_id""".stripMargin

  private val dedupClustersSql =
    s"""WITH RECURSIVE $ccOracleCtes
       |SELECT node AS doc_id,
       |  CAST(least(node, min(reachable)) AS BIGINT) AS canon_id
       |FROM reach
       |GROUP BY node
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Token counting two ways (north-star): whitespace tokens vs a BPE-ish
    * regex segmentation (word pieces + standalone punctuation), plus the
    * chars-per-token ratio LLM data pipelines budget with. */
  def tokenEstimate(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    Tables.documents(spark, sfDir)
      .withColumn("lt", lower(col("text")))
      .select(col("doc_id"),
        size(split(col("lt"), " ")).as("ws_tokens"),
        // the whitespace class is spelled OUT, not \s: Java regex \s
        // includes vertical tab \x0B, RE2 (DuckDB) \s does not — a
        // document carrying \x0B would tokenize differently per engine.
        // With the explicit class both engines treat \x0B as a
        // punctuation token, identically.
        size(expr(
          "regexp_extract_all(lt, '[a-z0-9]+|[^a-z0-9 \\\\t\\\\n\\\\r\\\\f]', 0)"))
          .as("re_tokens"),
        roundVal(col("n_chars") / size(split(col("lt"), " ")).cast("double"), 4)
          .as("chars_per_ws_token"))
      .orderBy(col("doc_id"))
  }

  private val tokenEstimateSql =
    s"""SELECT doc_id,
      |  len(string_split(lower(text), ' ')) AS ws_tokens,
      |  len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 \t\n\r\f]')) AS re_tokens,
      |  ${rv("n_chars / CAST(len(string_split(lower(text), ' ')) AS DOUBLE)", 4)} AS chars_per_ws_token
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q62
  /** Custom Generator / UDTF surface: bigram frequency via the engine's
    * own `NGramGenerator` expression (a native `Generate` node, same
    * plan shape as `explode`). Top-20 bigrams with count + distinct docs. */
  def bigramFreq(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    toks(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.NGramGenerator.ngrams(col("w"), 2).as(Seq("pos", "ngram")))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n").desc, col("ngram"))
      .limit(20)
  }

  private val bigramFreqSql =
    """SELECT ngram, count(*) AS n, count(DISTINCT doc_id) AS n_docs
      |FROM (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(w)),
      |      i -> w[i] || ' ' || w[i+1])) AS ngram
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents))
      |GROUP BY ngram
      |ORDER BY n DESC, ngram
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q76
  /** Repeated-span detection — the exact-substring dedup signal (the
    * "Deduplicating Training Data Makes Language Models Better" shape,
    * token-windowed rather than suffix-array): 15-token contiguous spans
    * occurring in ≥ 2 distinct documents, top-20 by reach. These are the
    * boilerplate/template runs a span-level deduper would excise even when
    * whole documents are NOT duplicates (this corpus has zero exact-dup
    * texts yet ~900 cross-doc spans).
    *
    * Scale shape: explode is linear in corpus tokens; the group-by is one
    * map-combined shuffle; `TakeOrderedAndProject` keeps the top-20 frontier
    * per partition (no global sort). The declared query shuffles the span
    * STRING because the output includes it and the oracle must see the same
    * key; the at-scale variant groups on `rolling_hash64(span)` (8-byte
    * keys, the q72 trick) and joins the winning spans' text back. */
  def repeatedSpans(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val n = 15
    toks(spark, sfDir) // the one tokenization definition
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(wordGramExpr(n)).as("span"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("span"))
      .limit(20)
  }

  private val repeatedSpansSql =
    """SELECT span, count(*) AS n_occurrences,
      |  count(DISTINCT doc_id) AS n_docs
      |FROM (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(w) - 13),
      |      i -> array_to_string(w[i:i+14], ' '))) AS span
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
      |  WHERE len(w) >= 15)
      |GROUP BY span
      |HAVING count(DISTINCT doc_id) >= 2
      |ORDER BY n_docs DESC, n_occurrences DESC, span
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q77
  /** Incremental dedup against a seen-set Bloom sketch — the cross-batch
    * form of exact dedup: an arriving batch is screened against a compact
    * sketch of everything already ingested, without joining the historical
    * corpus. Uses Spark's own `BloomFilterAggregate` /
    * `BloomFilterMightContain` (public Catalyst classes that back the
    * runtime row-level filter; the engine registers them as SQL functions —
    * see [[graft.GraftFunctions]]). The fixture has no exact duplicates
    * (q30), so the batch PLANTS re-deliveries of every 10th seen document —
    * q73's planted-marker pattern — and the output audits the sketch:
    * flagged/true-dup/false-positive/false-negative counts (false negatives
    * are structurally impossible for a Bloom filter; the audit proves it).
    *
    * Scale shape: the sketch is built by one aggregation whose partial
    * states OR-merge (order-free, deterministic bits), lands as ONE bounded
    * binary (128 KB here) via scalar subquery, and broadcasts into a
    * per-row predicate — the arriving batch never shuffles and the seen
    * corpus is read once to build the sketch. The exact-join audit columns
    * exist only to measure the sketch; a production screen keeps the
    * predicate and drops the join.
    *
    * Declared form (round-8 law-flag oracle, q121's pattern): the exact
    * columns (n_arriving, n_true_dups) are DuckDB-reproducible and ride
    * as values; n_false_neg is emitted as a VALUE too, because a Bloom
    * filter structurally cannot miss a member — the exact answer is 0,
    * and any engine bug that broke that guarantee breaks the hash
    * compare; the bit-layout-dependent false-positive rate becomes the
    * `fp_ok` flag (≤ 5% — the sketch is sized 2^20 BITS = 128 KiB for
    * 100k keys, ~10.5 bits/key ≈ 0.9% fp at capacity, far under-loaded
    * at fixture scale). The full
    * numeric audit (n_flagged/n_false_pos/fp_rate) stays available via
    * [[incrementalDedupBloomAudit]], which the spec gates. */
  def incrementalDedupBloom(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    incrementalDedupBloomAudit(spark, sfDir)
      .select(col("n_arriving"), col("n_true_dups"), col("n_false_neg"),
        (col("fp_rate") <= 0.05).as("fp_ok"))
  }

  /** q77's full numeric audit frame (the pre-round-8 output shape). */
  private[graft] def incrementalDedupBloomAudit(
      spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // sign-following % (not pmod), matching the oracle's DuckDB `%`: a
    // negative doc_id under pmod(·,2)=1 lands in the arriving batch here
    // while the oracle's `% 2` yields -1 and drops the doc entirely —
    // identity at fixture ids (non-negative), divergent in general
    val seen = docs.filter(col("doc_id") % 2 === 0)
    val redelivered = seen.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
    val arriving = docs.filter(col("doc_id") % 2 === 1)
      .unionByName(redelivered)
    // might_contain requires its bloom side to be constant-foldable — the
    // scalar subquery evaluates once and broadcasts the sketch
    val flagged = graft.TempViews.withViews(
      Seq(seen -> "graft_q77_seen", arriving -> "graft_q77_arriving")) {
      case Seq(seenV, arrivingV) => spark.sql(
        s"""SELECT a.doc_id, a.text,
           |  might_contain(
           |    (SELECT bloom_filter_agg(xxhash64(text), 100000L, 1048576L)
           |     FROM $seenV),
           |    xxhash64(a.text)) AS maybe_seen
           |FROM $arrivingV a""".stripMargin)
    }
    val dups = arriving
      .join(seen.select(col("text")).distinct(), Seq("text"), "left_semi")
      .select(col("doc_id"), lit(true).as("is_dup"))
    flagged.join(dups, Seq("doc_id"), "left")
      .na.fill(false, Seq("is_dup"))
      // coalesce: SUM over an EMPTY arriving batch is NULL — the audit
      // of nothing is zeros, not a null-typed row (q46's precedent)
      .agg(count(lit(1)).as("n_arriving"),
        coalesce(sum(when(col("is_dup"), 1L).otherwise(0L)), lit(0L))
          .as("n_true_dups"),
        coalesce(sum(when(col("maybe_seen"), 1L).otherwise(0L)), lit(0L))
          .as("n_flagged"),
        coalesce(sum(when(col("maybe_seen") && !col("is_dup"), 1L)
          .otherwise(0L)), lit(0L)).as("n_false_pos"),
        coalesce(sum(when(!col("maybe_seen") && col("is_dup"), 1L)
          .otherwise(0L)), lit(0L)).as("n_false_neg"))
      // an all-duplicates batch has NO non-dup rows to false-positive on:
      // its fp rate is 0 by definition, not NULL (which would read as a
      // failed fp_ok law flag against the oracle's literal TRUE)
      .withColumn("fp_rate",
        when(col("n_arriving") === col("n_true_dups"), lit(0.0))
          .otherwise(roundVal(col("n_false_pos") /
            (col("n_arriving") - col("n_true_dups")).cast("double"), 4)))
  }

  private val incrementalDedupBloomSql =
    """WITH seen AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      |arriving AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
      |  UNION ALL
      |  SELECT doc_id + 10000000, text FROM seen WHERE doc_id % 10 = 0)
      |SELECT CAST(count(*) AS BIGINT) AS n_arriving,
      |  CAST(count(*) FILTER (
      |    WHERE text IN (SELECT text FROM seen)) AS BIGINT) AS n_true_dups,
      |  CAST(0 AS BIGINT) AS n_false_neg,
      |  TRUE AS fp_ok
      |FROM arriving""".stripMargin

  // --------------------------------------------------------------- q109
  /** Directed containment pairs — the PARTIAL-duplicate primitive the
    * symmetric dedup ladder misses: a short document fully embedded in a
    * long one scores near containment 1.0 while its Jaccard stays low
    * (the exact case q32/q33's symmetric thresholds are blind to;
    * Lee et al.'s dedup uses substring containment for the same reason).
    * C(a→b) = |G_a ∩ G_b| / |G_a| over distinct token 8-grams (q69's
    * gram contract), reported as the top-20 directed pairs.
    *
    * Grams with document frequency > 50 are dropped from BOTH sets
    * before pairing — boilerplate chrome (q95's finding) would otherwise
    * manufacture hot-key pair floods; the drop redefines containment
    * over INFORMATIVE grams, which is the standard common-shingle
    * stopping move. Scale: grams are immediately collapsed to a 60-bit
    * md5-prefix INTEGER key, so every corpus-sized shuffle moves 8-byte
    * keys instead of ~50-byte gram strings — and because BOTH engines
    * derive the identical hash, even a collision (birthday ≈ n²/2⁶¹,
    * immaterial) is mirrored exactly, keeping the oracle hash-exact; the
    * df cap bounds any single gram's pair fan-out at 50², and at 100 TB
    * the same answer comes from each doc's k RAREST grams (df-rank
    * blocking) — implemented as [[containmentPairsRare]] (q115), with
    * top-20 equality spec-pinned at two SFs. Top-20 is a
    * TakeOrderedAndProject on the ROUNDED key (q63 ordering policy). */
  def containmentPairs(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    containmentPairsFrom(keptGramBase(spark, sfDir))
  }

  /** Core of q109 over any (doc_id, text) frame — spec entry point.
    * The kept-gram base is MATERIALIZED (q115's measured fix: the
    * pairing stage reads it ~5×; unmaterialized, each read replayed the
    * dominant explode+distinct chain) — the declared query instead
    * feeds the session-shared memo, which is already cached. */
  private[graft] def containmentPairsOf(docs: DataFrame): DataFrame =
    containmentPairsFrom(keptGramsOf(docs).localCheckpoint())

  /** q109's pairing stage over a (doc_id, gkey, df) kept-gram base. The
    * declared query feeds it the SESSION-SHARED memoized base
    * ([[keptGramBase]]); the self-join's two sides then read one cached
    * frame (pre-round-8 they were identical uncached subplans that
    * ReusedExchange shared within this query but that every OTHER gram
    * query re-derived from the corpus). */
  private def containmentPairsFrom(kept: DataFrame): DataFrame = {
    val keep = kept.select(col("doc_id"), col("gkey"))
    val sz = keep.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = keep.select(col("doc_id").as("doc_a"), col("gkey"))
      .join(keep.select(col("doc_id").as("doc_b"), col("gkey")), "gkey")
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("n_grams_a")),
        "doc_a")
      .select(col("doc_a"), col("doc_b"), col("n_grams_a"), col("n_common"),
        roundVal(col("n_common") / col("n_grams_a").cast("double"), 4)
          .as("containment"))
      .orderBy(col("containment").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** The 8-gram kept-gram oracle base (d → g0 → g CTEs), parameterized
    * by the extra carried columns — ONE definition for the q109/q115/
    * q120 oracle family: the gram construction and the md5-prefix gkey
    * must change in lockstep with [[keptGramsOf]] (ccOracleCtes' rule);
    * previously three hand-synced copies. */
  private def gramBaseCtes(extraCols: String = ""): String = {
    val ec = if (extraCols.isEmpty) "" else s", $extraCols"
    s"""d AS (
       |  SELECT doc_id$ec, string_split(lower(text), ' ') AS w
       |  FROM documents
       |  WHERE len(string_split(lower(text), ' ')) >= 8),
       |g0 AS (
       |  SELECT doc_id$ec, unnest(list_transform(range(1, len(w) - 6),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
       |         w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7])) AS gram
       |  FROM d),
       |g AS (
       |  SELECT DISTINCT doc_id$ec,
       |    ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gkey
       |  FROM g0)""".stripMargin
  }

  private val containmentPairsSql =
    s"""WITH ${gramBaseCtes()},
      |df AS (SELECT gkey, count(*) AS df FROM g GROUP BY gkey),
      |keep AS (
      |  SELECT doc_id, g.gkey FROM g JOIN df USING (gkey) WHERE df <= 50),
      |sz AS (SELECT doc_id, count(*) AS n FROM keep GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      |  FROM keep a JOIN keep b ON a.gkey = b.gkey AND a.doc_id <> b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  CAST(sa.n AS BIGINT) AS n_grams_a,
      |  CAST(n_common AS BIGINT) AS n_common,
      |  ${rv("n_common / CAST(sa.n AS DOUBLE)", 4)} AS containment
      |FROM inter JOIN sz sa ON sa.doc_id = inter.doc_a
      |ORDER BY containment DESC, doc_a, doc_b LIMIT 20""".stripMargin

  // --------------------------------------------------------------- q115
  /** Containment pairs via k-RAREST-GRAM blocking — q109's documented
    * at-scale candidate source, now code: instead of pairing documents
    * through EVERY kept gram (fan-out Σ df² over all grams), each doc
    * nominates only its k lowest-df grams (ties → gkey) and a candidate
    * pair (a,b) exists iff one of a's nominated grams occurs in b's full
    * kept set. Exact containment is then computed ONLY for candidates.
    *
    * Why this preserves the answer: C(a→b) ≥ θ means b misses at most
    * (1−θ)·|G_a| of a's grams, so for the near-1.0 containments that
    * rank top-20 at least one of a's k rarest grams is shared (full
    * containment shares ALL of them); rare grams are also exactly the
    * non-boilerplate ones, so the nomination is biased toward the
    * discriminative evidence. The equality with the full pair source is
    * spec-pinned at two SFs, and ScaleStressSpec measures the candidate
    * reduction on a boilerplate-flooded corpus.
    *
    * Scale: candidate fan-out drops from Σ_grams df² to k·n·df̄(rare) —
    * each doc contributes k probes and each probe lands on a LOW-df gram
    * by construction; the df≤50 informative-gram cap is kept so the
    * containment definition matches q109 exactly. All shuffles key on
    * 8-byte gram keys or (doc_a, doc_b); the exact-verify expansion is
    * |candidates|·|G_a| rows, bounded by the blocking. Deterministic
    * (df, gkey) ranking keeps the whole pipeline oracle-replayable. */
  def containmentPairsRare(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    containmentPairsRareFrom(keptGramBase(spark, sfDir), 8)
  }

  /** Core of q115 over any (doc_id, text) frame — spec entry point.
    * Returns the same shape as [[containmentPairsOf]]. The gram base
    * feeds FIVE consumers (sizes, nomination, candidate probe, both
    * intersection sides); without materialization each one replays the
    * explode+distinct+df chain — measured 4.6→2.0 s at sf0.1, and at
    * 100 TB the re-scans would quintuple the dominant cost.
    * localCheckpoint stores the (doc_id, gkey, df) base once in the
    * executor block store (grams ≤ token count — far smaller than text);
    * the DECLARED query gets the same materialization session-wide from
    * [[keptGramBase]]'s cache instead. */
  private[graft] def containmentPairsRareOf(docs: DataFrame,
      k: Int): DataFrame =
    containmentPairsRareFrom(keptGramsOf(docs).localCheckpoint(), k)

  /** q115's blocking + exact-verify stages over a materialized
    * (doc_id, gkey, df) kept-gram base. */
  private def containmentPairsRareFrom(keep: DataFrame, k: Int): DataFrame = {
    val sz = keep.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val cand = rareCandidatesOf(keep, k)
    val inter = cand
      .join(keep.select(col("doc_id").as("doc_a"), col("gkey")), "doc_a")
      .join(keep.select(col("doc_id").as("doc_b"), col("gkey")),
        Seq("doc_b", "gkey"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("n_grams_a")),
        "doc_a")
      .select(col("doc_a"), col("doc_b"), col("n_grams_a"), col("n_common"),
        roundVal(col("n_common") / col("n_grams_a").cast("double"), 4)
          .as("containment"))
      .orderBy(col("containment").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** q115's candidate source over a (doc_id, gkey, df) gram base: each
    * doc nominates its k lowest-(df, gkey) grams; a directed candidate
    * (a,b) exists iff a nominated gram of a occurs anywhere in b's kept
    * set. Exposed separately so ScaleStressSpec can measure the
    * candidate count against the full Σ df² pair source. */
  private[graft] def rareCandidatesOf(keep: DataFrame, k: Int): DataFrame = {
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("gkey"))
    val rare = keep.withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= k).select(col("doc_id").as("doc_a"), col("gkey"))
    rare
      .join(keep.select(col("doc_id").as("doc_b"), col("gkey")), "gkey")
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** The ONE corpus explode+distinct pass the whole gram family shares:
    * distinct (doc_id, source, gkey) 8-gram keys over any documents
    * frame. PRE-df-cap — q120's novelty needs ALL grams; the containment
    * queries apply the df ≤ 50 informative-gram cap on top
    * ([[keptGramsOf]]). A frame without a `source` column (spec corpora)
    * gets a constant one — source is only consumed by q120, whose
    * fixtures always carry it. */
  private[graft] def rawGramsOf(docs: DataFrame): DataFrame = {
    val src = if (docs.columns.contains("source")) docs
      else docs.withColumn("source", lit("_"))
    src
      .withColumn("w", wsTokens)
      .filter(size(col("w")) >= 8)
      .select(col("doc_id"), col("source"),
        explode(TextOps.wordGramExpr(8)).as("gram"))
      .select(col("doc_id"), col("source"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long")
          .as("gkey"))
      .distinct()
  }

  /** Session-shared gram base for the DECLARED gram family (q109/q115/
    * q120): [[rawGramsOf]] over the documents table, memoized + cached
    * per (session, path). Round 7 ran THREE corpus explode+distinct
    * passes per session — one each for q109, q115, q120 (the verdict's
    * "What's wrong #1"); with the memo the corpus pays the dominant gram
    * scan once, and every consumer reads the cached 8-byte-key frame —
    * the materialized-gram-table pattern a warehouse would use. */
  private def gramBase(spark: SparkSession, sfDir: String): DataFrame =
    Memo.cached(spark, s"textops:gram_base:$sfDir") {
      rawGramsOf(
        GraftSession.spread(Tables.documents(spark, sfDir), col("doc_id")))
    }

  /** df ≤ 50 kept grams derived from [[gramBase]] — itself memoized:
    * q109 and q115 together consume this frame seven times (self-join
    * sides, sizes, nomination, candidate probes). */
  private def keptGramBase(spark: SparkSession, sfDir: String): DataFrame =
    Memo.cached(spark, s"textops:kept_grams:$sfDir") {
      keptFromRaw(gramBase(spark, sfDir))
    }

  /** Shared q109/q115 gram base: distinct informative (df ≤ 50) 60-bit
    * gram keys per doc, with each gram's document frequency attached. */
  private[graft] def keptGramsOf(docs: DataFrame): DataFrame =
    keptFromRaw(rawGramsOf(docs))

  /** The df-cap stage over a raw distinct gram frame: attach document
    * frequency, keep informative (df ≤ 50) grams. The distinct is per
    * (doc, gram), so counting rows per gkey IS the document frequency. */
  private def keptFromRaw(raw: DataFrame): DataFrame = {
    // re-distinct after projecting source away: the raw base is distinct
    // over (doc_id, source, gkey), so a doc_id that ever appeared under
    // two sources would duplicate (doc_id, gkey) rows here and inflate
    // every df count — impossible for well-formed corpora (doc_id is the
    // key), but the invariant belongs to this frame, not to the input
    val grams = raw.select(col("doc_id"), col("gkey")).distinct()
    val df = grams.groupBy(col("gkey")).agg(count(lit(1)).as("df"))
    grams.join(df.filter(col("df") <= 50), "gkey")
      .select(col("doc_id"), col("gkey"), col("df"))
  }

  private val containmentPairsRareSql =
    s"""WITH ${gramBaseCtes()},
      |df AS (SELECT gkey, count(*) AS df FROM g GROUP BY gkey),
      |keep AS (
      |  SELECT doc_id, g.gkey, df FROM g JOIN df USING (gkey) WHERE df <= 50),
      |sz AS (SELECT doc_id, count(*) AS n FROM keep GROUP BY doc_id),
      |rare AS (
      |  SELECT doc_id AS doc_a, gkey FROM (
      |    SELECT doc_id, gkey,
      |      row_number() OVER (PARTITION BY doc_id ORDER BY df, gkey) AS rk
      |    FROM keep) WHERE rk <= 8),
      |cand AS (
      |  SELECT DISTINCT r.doc_a, kb.doc_id AS doc_b
      |  FROM rare r JOIN keep kb ON r.gkey = kb.gkey AND r.doc_a <> kb.doc_id),
      |inter AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS n_common
      |  FROM cand c
      |  JOIN keep ka ON ka.doc_id = c.doc_a
      |  JOIN keep kb ON kb.doc_id = c.doc_b AND kb.gkey = ka.gkey
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |  CAST(sa.n AS BIGINT) AS n_grams_a,
      |  CAST(n_common AS BIGINT) AS n_common,
      |  ${rv("n_common / CAST(sa.n AS DOUBLE)", 4)} AS containment
      |FROM inter JOIN sz sa ON sa.doc_id = inter.doc_a
      |ORDER BY containment DESC, doc_a, doc_b LIMIT 20""".stripMargin

  // --------------------------------------------------------------- q107
  /** Per-document character-entropy screen: the 20 lowest-entropy
    * documents — the information-theoretic OCR-garbage / padding / binary-
    * junk tripwire (a doc of one repeated char scores 0 bits; natural
    * text sits near its language's ~4-bit char entropy; q97's hapax share
    * reads the same damage at corpus level, this reads it per document).
    * H = log2(n) − Σ c·log2(c) / n from exact per-char counts.
    *
    * Scale: the histogram is built IN-ROW — sort the code-point array,
    * read run lengths off the sorted runs with indexed higher-order
    * functions — so the plan has NO per-char generator: at 100 TB a
    * per-char `explode` would feed ~10¹⁴ rows into the map-side
    * combine, where this shape does alphabet-bounded work per document
    * inside whole-stage codegen and shuffles nothing but the final
    * top-20 candidates (TakeOrderedAndProject on the ROUNDED key
    * ([[graft.functions.Rounding.roundVal]](·,4), doc_id) — q63's
    * ordering policy in the cross-engine floor form, so last-ulp
    * `log2` skew cannot flip the cross-engine order). The split is
    * code-POINT-aware (`(?s).` matches a full code point, surrogate
    * pairs included), matching the DuckDB oracle's `string_split`
    * semantics even on astral-plane text. */
  def charEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    charEntropyOf(
      GraftSession.spread(Tables.documents(spark, sfDir), col("doc_id")))
  }

  /** Core of q107 over any (doc_id, lang, text) frame — spec entry point.
    * In-row histogram: sorted code-point array → run starts (positions
    * where the char differs from its predecessor) → run lengths = the
    * exact per-char counts, all inside one projection. */
  private[graft] def charEntropyOf(docs: DataFrame): DataFrame = {
    docs
      .withColumn("cs",
        expr("array_sort(regexp_extract_all(text, '(?s).', 0))"))
      .withColumn("n", size(col("cs")))
      .filter(col("n") > 0) // empty/null docs absent, as in the oracle
      .withColumn("starts", expr(
        "filter(transform(cs, (x, i) -> IF(i = 0 OR x <> cs[i - 1], i, -1)), v -> v >= 0)"))
      .withColumn("counts", expr(
        "transform(starts, (st, j) -> CAST(IF(j + 1 < size(starts), starts[j + 1], size(cs)) - st AS DOUBLE))"))
      .select(col("doc_id"), col("lang"),
        col("n").cast("long").as("n_chars_total"),
        size(col("starts")).cast("long").as("n_distinct_chars"),
        roundVal(log2(col("n").cast("double")) -
          expr("aggregate(counts, CAST(0 AS DOUBLE), (acc, c) -> acc + c * log2(c))") /
            col("n").cast("double"), 4).as("entropy"))
      .orderBy(col("entropy"), col("doc_id"))
      .limit(20)
  }

  private val charEntropySql =
    s"""WITH chars AS (
      |  SELECT doc_id, lang, unnest(string_split(text, '')) AS ch
      |  FROM documents),
      |cnt AS (
      |  SELECT doc_id, lang, ch, count(*) AS c FROM chars
      |  WHERE ch <> '' GROUP BY 1, 2, 3)
      |SELECT doc_id, lang,
      |  CAST(sum(c) AS BIGINT) AS n_chars_total,
      |  CAST(count(*) AS BIGINT) AS n_distinct_chars,
      |  ${rv("log2(CAST(sum(c) AS DOUBLE)) " +
        "- sum(c * log2(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE)", 4)}
      |    AS entropy
      |FROM cnt GROUP BY doc_id, lang
      |ORDER BY entropy, doc_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q120
  /** Per-source 8-gram novelty — the dedup-ROI statistic (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): in
    * doc_id (ingestion) order, which share of each source's distinct
    * doc-grams is seen there FIRST? A source whose grams are mostly
    * first-occurrences adds new content; one near zero re-ships what the
    * corpus already has and is the first candidate to down-weight in the
    * training mix (q70/q87's knob).
    *
    * Novelty is pooled per source: novel = grams whose global
    * first-occurrence doc belongs to the source; total = Σ per-doc
    * distinct grams. Unlike q109/q115 this keeps ALL grams (no df cap) —
    * boilerplate is exactly what novelty must penalize.
    *
    * Scale shape: the (doc_id, gkey) distinct is q109's gram shuffle on
    * 8-byte keys; first-occurrence is a map-combinable `min(struct(doc_id,
    * source))` per gkey (source rides inside the min — functionally
    * dependent on doc_id — so NO join back to the gram base); both
    * aggregates land on a |sources|-row grid joined broadcast-size. No
    * window, no self-join, nothing driver-side. */
  def gramNovelty(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    // the declared query reads the session-shared PRE-cap gram base —
    // q120 is exactly why the base keeps all grams (no df cap)
    gramNoveltyFrom(gramBase(spark, sfDir))
  }

  /** Core of q120 over any (doc_id, source, text) frame — spec entry.
    * localCheckpoint: both the per-source totals and the first-occurrence
    * branch read the gram base — without materialization each branch
    * re-explodes the corpus (2× the dominant cost at scale); the declared
    * query gets the same from [[gramBase]]'s session cache. */
  private[graft] def gramNoveltyOf(docs: DataFrame): DataFrame =
    gramNoveltyFrom(rawGramsOf(docs).localCheckpoint())

  /** q120's aggregation stages over a materialized
    * (doc_id, source, gkey) gram base. */
  private def gramNoveltyFrom(grams: DataFrame): DataFrame = {
    val totals = grams.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("total_grams"))
    val novels = grams
      .groupBy(col("gkey"))
      .agg(min(struct(col("doc_id"), col("source"))).as("first"))
      .groupBy(col("first.source").as("source"))
      .agg(count(lit(1)).as("novel_grams"))
    totals.join(novels, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("novel_grams"), lit(0L)).as("novel_grams"),
        col("total_grams"),
        roundVal(coalesce(col("novel_grams"), lit(0L)) /
          col("total_grams").cast("double"), 4).as("novelty"))
      .orderBy(col("source"))
  }

  private val gramNoveltySql =
    s"""WITH ${gramBaseCtes("source")},
      |f AS (SELECT gkey, min(doc_id) AS first_doc FROM g GROUP BY gkey),
      |novel AS (
      |  SELECT g.source, count(*) AS novel_grams
      |  FROM f JOIN g ON g.gkey = f.gkey AND g.doc_id = f.first_doc
      |  GROUP BY 1),
      |t AS (
      |  SELECT source, count(DISTINCT doc_id) AS n_docs,
      |    count(*) AS total_grams
      |  FROM g GROUP BY 1)
      |SELECT t.source,
      |  CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(coalesce(novel_grams, 0) AS BIGINT) AS novel_grams,
      |  CAST(total_grams AS BIGINT) AS total_grams,
      |  ${rv("coalesce(novel_grams, 0) / CAST(total_grams AS DOUBLE)", 4)}
      |    AS novelty
      |FROM t LEFT JOIN novel ON novel.source = t.source
      |ORDER BY t.source""".stripMargin

  // ---------------------------------------------------------------- q124
  /** Zipf-law fit per source: regress log2(count) on log2(rank) over each
    * source's top-200 tokens — slope, intercept, R² (Spark's built-in
    * `regr_*` aggregates; same Σxy/Σx² closed forms in DuckDB). Natural
    * language sits near slope −1 (Zipf 1949); a flat slope means
    * templated/synthetic text, a cliff means tag soup — a one-row-per-
    * source vocabulary-health diagnostic on top of q97's spectrum.
    *
    * Scale shape: the (source, token) count is the map-combined
    * vocabulary agg; `rank ≤ 200` is a `row_number` predicate that
    * compiles to map-side `WindowGroupLimit(Partial)` per source (q94's
    * law), so the rank exchange carries ≤200 rows per source; the
    * regression itself is a grid agg over ≤200·|sources| points. Doubles
    * appear only inside the regression sums (≤200 terms, 4dp-rounded —
    * q107's log2 cross-engine precedent). */
  def zipfSlope(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    zipfSlopeOf(GraftSession.spread(
      Tables.documents(spark, sfDir), col("doc_id")))
  }

  private[graft] def zipfSlopeOf(docs: DataFrame): DataFrame = {
    val byCount = Window.partitionBy(col("source"))
      .orderBy(col("c").desc, col("w"))
    docs
      .select(col("source"),
        explode(wsTokens).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(byCount))
      .filter(col("r") <= 200)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_ranks"),
        roundVal(expr("regr_slope(log2(c), log2(r))"), 4).as("zipf_slope"),
        roundVal(expr("regr_intercept(log2(c), log2(r))"), 4).as("zipf_intercept"),
        roundVal(expr("regr_r2(log2(c), log2(r))"), 4).as("fit_r2"))
      .orderBy(col("source"))
  }

  private val zipfSlopeSql =
    s"""WITH toks AS (
      |  SELECT source, unnest(string_split(lower(text), ' ')) AS w
      |  FROM documents),
      |counts AS (
      |  SELECT source, w, count(*) AS c FROM toks
      |  WHERE w <> '' GROUP BY 1, 2),
      |ranked AS (
      |  SELECT source, w, c,
      |    row_number() OVER (PARTITION BY source ORDER BY c DESC, w) AS r
      |  FROM counts),
      |top AS (SELECT * FROM ranked WHERE r <= 200)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_ranks,
      |  ${rv("regr_slope(log2(c), log2(r))", 4)} AS zipf_slope,
      |  ${rv("regr_intercept(log2(c), log2(r))", 4)} AS zipf_intercept,
      |  ${rv("regr_r2(log2(c), log2(r))", 4)} AS fit_r2
      |FROM top GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q130
  /** PMI collocation mining (Church & Hanks 1990): the top-20 adjacent
    * word pairs by pointwise mutual information with count ≥ 5 —
    * multi-word expressions whose components co-occur far above chance.
    * Raw bigram frequency (q62) surfaces "the the"-style commons; PMI
    * normalizes by unigram probabilities, so it surfaces the PHRASES —
    * the tokenizer-vocabulary and stop-phrase candidates a curation
    * pipeline mines.
    *
    * PMI is computed as a SUM OF LOGS of exact integer counts —
    * `log2(n_ab) + 2·log2(N1) − log2(N2) − log2(n_a) − log2(n_b)` —
    * never as a ratio of products (n_ab·N1² overflows BIGINT at real
    * corpus sizes); 4dp-rounded with a gram tiebreak (q107's log2
    * cross-engine precedent). Scale shape: two map-combined token aggs
    * (unigrams, bigrams — q62's machinery), totals as 1-row broadcast
    * scalars (q70's pattern), and the bigram↔unigram joins key on the
    * token — vocab-sized sides Catalyst broadcasts when they fit and
    * hash-joins when they don't; the min-count filter prunes the bigram
    * side before any join. */
  def pmiCollocations(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    pmiCollocationsOf(toks(spark, sfDir))
  }

  private[graft] def pmiCollocationsOf(t: DataFrame): DataFrame = {
    val uni = t.select(explode(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val biAll = t
      .filter(size(col("w")) >= 2) // wordGramExpr caller contract
      .select(explode(wordGramExpr(2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n_ab"))
    val totals = uni.agg(sum(col("cnt")).as("n1"))
      .crossJoin(biAll.agg(sum(col("n_ab")).as("n2")))
    biAll.filter(col("n_ab") >= 5)
      .withColumn("a", split(col("gram"), " ").getItem(0))
      .withColumn("b", split(col("gram"), " ").getItem(1))
      .join(uni.select(col("tok").as("a"), col("cnt").as("cnt_a")), "a")
      .join(uni.select(col("tok").as("b"), col("cnt").as("cnt_b")), "b")
      .crossJoin(broadcast(totals))
      .select(col("gram"), col("n_ab"), col("cnt_a"), col("cnt_b"),
        roundVal(log2(col("n_ab")) + lit(2.0) * log2(col("n1"))
          - log2(col("n2")) - log2(col("cnt_a")) - log2(col("cnt_b")), 4)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("gram"))
      .limit(20)
  }

  private val pmiCollocationsSql =
    s"""WITH d AS (
      |  SELECT string_split(lower(text), ' ') AS w FROM documents),
      |ucnt AS (
      |  SELECT tok, count(*) AS cnt
      |  FROM (SELECT unnest(w) AS tok FROM d) GROUP BY tok),
      |bcnt AS (
      |  SELECT gram, count(*) AS n_ab FROM (
      |    SELECT unnest(list_transform(range(1, len(w)),
      |      i -> w[i] || ' ' || w[i+1])) AS gram FROM d)
      |  GROUP BY gram),
      |tot AS (
      |  SELECT (SELECT sum(cnt) FROM ucnt) AS n1,
      |    (SELECT sum(n_ab) FROM bcnt) AS n2)
      |SELECT gram,
      |  CAST(n_ab AS BIGINT) AS n_ab,
      |  CAST(a.cnt AS BIGINT) AS cnt_a,
      |  CAST(b.cnt AS BIGINT) AS cnt_b,
      |  ${rv("log2(n_ab) + 2.0 * log2(n1) - log2(n2) " +
        "- log2(a.cnt) - log2(b.cnt)", 4)} AS pmi
      |FROM bcnt
      |JOIN ucnt a ON a.tok = string_split(gram, ' ')[1]
      |JOIN ucnt b ON b.tok = string_split(gram, ' ')[2], tot
      |WHERE n_ab >= 5
      |ORDER BY pmi DESC, gram LIMIT 20""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("q130_pmi_collocations", pmiCollocations, Some(pmiCollocationsSql),
      "top-20 PMI collocations (count>=5): phrases co-occurring above chance, sum-of-logs exact-count formulation"),
    Op("q124_zipf_slope", zipfSlope, Some(zipfSlopeSql),
      "per-source Zipf fit (regr_slope/intercept/R2 of log-count vs log-rank, top-200 tokens) -- vocabulary-health diagnostic"),
    Op("q120_gram_novelty", gramNovelty, Some(gramNoveltySql),
      "per-source 8-gram novelty share in ingestion order (dedup-ROI / mix down-weighting signal)"),
    Op("q107_char_entropy", charEntropy, Some(charEntropySql),
      "20 lowest char-entropy docs (OCR-garbage/padding tripwire, exact-count entropy, rounded-key ordering)"),
    Op("q109_containment_pairs", containmentPairs, Some(containmentPairsSql),
      "top-20 directed 8-gram containment pairs (partial-duplicate primitive; df<=50 boilerplate-gram stopping)"),
    Op("q115_containment_rare", containmentPairsRare,
      Some(containmentPairsRareSql),
      "q109's at-scale variant: k-rarest-gram (df-rank) blocking as the pair source, exact containment on candidates only"),
    Op("q62_bigram_freq", bigramFreq, Some(bigramFreqSql),
      "custom Generator (UDTF): bigram frequency top-20"),
    Op("q76_repeated_spans", repeatedSpans, Some(repeatedSpansSql),
      "cross-doc repeated 15-token spans (exact substring-dedup signal)"),
    Op("q77_incremental_dedup_bloom", incrementalDedupBloom,
      Some(incrementalDedupBloomSql),
      "arriving-batch dedup screen vs seen-set Bloom sketch; law-flag oracle: exact arrival/dup counts + structural fn=0 + fp<=5% flag"),
    Op("q86_cluster_representatives", clusterRepresentatives,
      Some(clusterRepresentativesSql),
      "keep-best-per-cluster: dedup clusters -> one representative doc by (n_chars, doc_id) policy"),
    Op("q60_dedup_clusters", dedupClusters, Some(dedupClustersSql),
      "near-dup pairs -> connected components (large-star/small-star)"),
    Op("q61_token_estimate", tokenEstimate, Some(tokenEstimateSql),
      "token counting: whitespace vs BPE-ish regex segmentation"),
    Op("q30_dedup_exact", dedupExact, Some(dedupExactSql),
      "exact content dedup summary (hash-groupBy)"),
    Op("q31_dedup_keyed", dedupKeyed, Some(dedupKeyedSql),
      "keyed dedup with deterministic survivor (row_number=1)"),
    Op("q32_neardup_shingle", neardupShingle, Some(neardupShingleSql),
      "near-dup pairs: 3-gram shingle Jaccard >= 0.8, lang-blocked"),
    Op("q33_neardup_minhash", neardupMinhashLsh, Some(neardupMinhashSql),
      "near-dup pairs via MinHash LSH (8x4 bands, md5-affine permutation family replayed in the oracle) + exact verify — scale path"),
    Op("q34_simhash_pairs", simhashPairs, Some(simhashPairsSql),
      "SimHash banded Hamming candidate pairs (<=6 bits, md5 bit-majority fingerprint replayed in the oracle)"),
    Op("q35_token_stats", tokenStats, Some(tokenStatsSql),
      "per-doc token counts / TTR / mean token length"),
    Op("q91_vocab_growth", vocabGrowth, Some(vocabGrowthSql),
      "Heaps'-law vocabulary growth curve via per-word first-occurrence buckets (one pass, no prefix rescans)"),
    Op("q84_heavy_hitters", heavyHitters, Some(heavyHittersSql),
      "exact heavy hitters (≥1/32 of tokens) via Misra-Gries candidate prefilter + bounded second pass"),
    Op("q36_word_freq", wordFreq, Some(wordFreqSql),
      "global word frequency top-20 (explode + agg)"),
    Op("q37_quality_score", qualityScore, Some(qualityScoreSql),
      "per-lang quality heuristics (TTR, stopword ratio)"),
    Op("q38_fingerprints", fingerprints, Some(fingerprintsSql),
      "rolling-hash + md5 content fingerprints per doc (rolling hash replayed hash-exactly in the DuckDB oracle)"),
    Op("q39_lang_id", langId, Some(langIdSql),
      "stopword-profile language-ID confusion matrix (literal profiles -> plain-SQL oracle)"))
}
