package graft.operators

/** Corpus-scaled ANN/LSH parameter derivation (SURVEY §2.3 E13).
  *
  * Through round 4 the ANN queries hard-coded fixture-sized constants
  * (q43 `bits=8`, q45 `nlist=8`, q48 `8×4` bands) — correct on the
  * 500–2k-vector testdata but not functions of the corpus. These
  * derivations make the SAME declared query stay correctly-parameterized
  * from the smallest fixture to a 10¹¹-vector corpus. All pure integer
  * math over a row count the caller supplies (one `count()` on a parquet
  * table — row-group metadata, not a data scan).
  *
  * Each rule is standard public ANN practice: the √n coarse-cell rule is
  * FAISS's guideline for IVF index sizing; the banding inversion is the
  * classic LSH amplification formula (Leskovec/Rajaraman/Ullman, Mining
  * of Massive Datasets §3.6; Indyk–Motwani e2LSH analysis).
  */
object AnnParams {

  /** Single-probe bucket width for q43-style hash-bucket ANN: choose
    * `bits` so the probed bucket holds ~`targetBucket` vectors on
    * average (2^bits ≈ n / targetBucket). The default 40 ≈ 4× a top-10
    * frontier: enough candidates to fill top-k with headroom, while the
    * probe still reads only ~1/2^bits of the corpus. Clamped to
    * [2, 24] bits (2^24 buckets ≈ 16M — beyond that the bucket id
    * itself should become a composite partition key). */
  def lshBits(n: Long, targetBucket: Int = 40): Int = {
    require(targetBucket > 0, s"targetBucket must be positive: $targetBucket")
    val raw = math.round(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.max(2, math.min(24, raw))
  }

  /** IVF coarse-cell count for q45: the √n rule — with nlist = √n cells
    * the probe cost (√n centroid comparisons + one ~√n-row cell scan)
    * balances, and each cell is large enough to be a real partition at
    * scale (partition-pruned cell reads). Clamped to [2, 4096]: at 4096
    * cells × 64 float dims the codebook is ~1 MB — still a broadcast. */
  def ivfCells(n: Long): Int =
    math.max(2, math.min(4096, math.round(math.sqrt(math.max(0L, n).toDouble)).toInt))

  /** Banded hyperplane-LSH shape for q48-style near-dup blocking:
    * `(bands, rowBits)` such that a boundary pair at cosine `threshold`
    * is caught with probability ≥ `targetRecall`, while random
    * (near-orthogonal) pairs stay rare enough that the candidate set is
    * LINEAR in corpus size:
    *
    *  - rowBits r = ⌈log₂ n⌉: a random pair agrees on one sign bit with
    *    probability ~1/2, so it collides in a band with probability
    *    ~(1/2)^r ≈ 1/n — expected random candidates ≈ bands·n, never n².
    *  - bands b = ⌈ln(1−R) / ln(1−p^r)⌉ with p = 1 − acos(threshold)/π:
    *    the inversion of the banding recall formula R = 1−(1−p^r)^b.
    *
    * The LSH exponent is real and worth stating: for fixed threshold,
    * b grows ≈ n^ρ with ρ = ln(1/p)/ln 2 — ≈0.58 at cosine 0.5 but only
    * ≈0.15 at 0.95. LOW thresholds are where banding is expensive;
    * production semantic dedup runs at 0.9+ where b stays small. The
    * 0.5-threshold fixture queries deliberately sit at the hard end.
    *
    * Clamps: r ∈ [2, 24], b ∈ [1, 256]. The b-clamp is a visible cap:
    * when it binds, achieved recall is 1−(1−p^r)^256 < R — callers that
    * must not silently under-recall should check [[bandedRecall]]. */
  def bandedLsh(n: Long, threshold: Double, targetRecall: Double = 0.9): (Int, Int) = {
    require(threshold > -1.0 && threshold < 1.0, s"cosine threshold: $threshold")
    require(targetRecall > 0.0 && targetRecall < 1.0, s"targetRecall: $targetRecall")
    val r = math.max(2, math.min(24,
      math.ceil(math.log(math.max(2.0, n.toDouble)) / math.log(2.0)).toInt))
    val p = 1.0 - math.acos(threshold) / math.Pi
    val pr = math.pow(p, r)
    val b =
      if (pr >= 1.0) 1
      else math.max(1, math.min(256,
        math.ceil(math.log(1.0 - targetRecall) / math.log(1.0 - pr)).toInt))
    (b, r)
  }

  /** Predicted recall of a (bands, rowBits) shape for a pair at cosine
    * `s` — the banding formula, for specs and cap checks. */
  def bandedRecall(bands: Int, rowBits: Int, s: Double): Double = {
    val p = 1.0 - math.acos(s) / math.Pi
    1.0 - math.pow(1.0 - math.pow(p, rowBits), bands)
  }
}
