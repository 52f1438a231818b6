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
    * is caught with probability ≥ `targetRecall`, at balanced cost.
    *
    * For each candidate r, the band count that meets the target is
    * b(r) = ⌈ln(1−R) / ln(1−p^r)⌉ with p = 1 − acos(threshold)/π (the
    * inversion of the banding recall formula R = 1−(1−p^r)^b); the
    * per-vector work of the shape is then
    *
    *   cost(r) ≈ b(r) · (r  +  n/2^r)
    *              hashing    expected random-pair candidates per band
    *              (r plane    (a random pair agrees per sign bit w.p.
    *               dots)       ~1/2 → collides in an r-bit band w.p.
    *                           ~2^-r → ~n/2^r collision partners)
    *
    * and rowBits is the argmin over r ∈ [2, 24]. Pinning candidates
    * linear at any hash price (r = ⌈log₂ n⌉) buys rare candidates with
    * enormous band counts at low thresholds; the argmin lands where one
    * more bit stops paying for itself — at the 2k fixture / threshold
    * 0.5 / recall 0.9 that is 39 bands × 7 bits (vs the round-4 fixed
    * 8×4, whose boundary recall was only ~0.84 and whose 4-bit bands
    * caught a CONSTANT 1/16 of all n² random pairs).
    *
    * The LSH exponent is real and worth stating: for fixed threshold,
    * b grows ≈ n^ρ with ρ = ln(1/p)/ln 2 — ≈0.58 at cosine 0.5 but only
    * ≈0.15 at 0.95. LOW thresholds are where banding is expensive;
    * production semantic dedup runs at 0.9+ where b stays small. The
    * 0.5-threshold fixture queries deliberately sit at the hard end.
    *
    * Clamps: r ∈ [2, 24], b ∈ [1, `maxBands`] (default 256). The b-clamp
    * is a visible cap: when it binds, achieved recall is below R —
    * callers that must not silently under-recall check [[bandedRecall]]
    * (the spec suite does exactly that).
    *
    * Default target is 0.98, not 0.9: declared queries are user-facing
    * deduplication output, and a 1-in-10 boundary miss is a visible wrong
    * answer on a deterministic corpus (round 5 hit exactly this — the
    * sf0.01 fixture's one true pair at cosine 0.513 fell in the 0.9
    * shape's 9% miss mass). 0.9 → 0.98 costs ln(.02)/ln(.1) ≈ 1.7× bands.
    * Multi-probe banding (probe Hamming≤1 buckets, Lv et al. 2007) was
    * evaluated as the alternative: at this operating point (threshold 0.5,
    * p = 2/3, r = 7) it cuts bands 65 → 13 but each probe-side vector
    * emits (1+r)× keys and random-pair collisions rise (1+r)/2^r per
    * band — total cost modeled ≈ 1.2× the single-probe shape, so the
    * simpler family stays. (At HIGH thresholds multi-probe wins; worth
    * revisiting if a 0.9+-threshold declared query ever needs bands cut.) */
  def bandedLsh(n: Long, threshold: Double, targetRecall: Double = 0.98,
      maxBands: Int = 256): (Int, Int) = {
    require(threshold > -1.0 && threshold < 1.0, s"cosine threshold: $threshold")
    require(targetRecall > 0.0 && targetRecall < 1.0, s"targetRecall: $targetRecall")
    val p = 1.0 - math.acos(threshold) / math.Pi
    def bandsFor(r: Int): Double = {
      val pr = math.pow(p, r)
      if (pr >= 1.0) 1.0
      // log1p, NOT log(1.0 - pr): for pr below ~1.1e-16 (low thresholds,
      // large r) 1.0 - pr rounds to exactly 1.0, log gives -0.0, and the
      // quotient is +Infinity-turned--Infinity through ceil — which would
      // win the cost argmin and silently return a near-zero-recall
      // (1, r) shape instead of honoring targetRecall (round-9 review)
      else math.ceil(math.log(1.0 - targetRecall) / math.log1p(-pr))
    }
    val nD = math.max(2.0, n.toDouble)
    val r = (2 to 24).minBy(r => bandsFor(r) * (r + nD / math.pow(2.0, r)))
    val b = math.max(1, math.min(maxBands, bandsFor(r).toInt))
    (b, r)
  }

  /** Predicted recall of a (bands, rowBits) shape for a pair at cosine
    * `s` — the banding formula, for specs and cap checks. */
  def bandedRecall(bands: Int, rowBits: Int, s: Double): Double = {
    val p = 1.0 - math.acos(s) / math.Pi
    1.0 - math.pow(1.0 - math.pow(p, rowBits), bands)
  }

  // ------------------------------------------------------- probe widths
  // The round-8 law-flag oracles (q43/q45/q117/q118) assert driver-checked
  // recall floors against the exact answer ON THE FIXTURES — and the
  // fixture embeddings are near-iid gaussians, ANN's adversarial case,
  // where ANY sublinear method's recall ≈ the candidate fraction it scans
  // (there is no cluster structure for the index to exploit; production
  // corpora have it, which is why FAISS serves nprobe ≪ nlist). A
  // single-probe width that is the right default at 10⁹ vectors therefore
  // measures recall ≈ 0 on a 500-vector iid fixture, making the law
  // vacuous. These derivations widen the probe toward a ~quarter-corpus
  // candidate set at FIXTURE sizes — enough for a meaningful floor — while
  // absolute caps keep the width a constant (and the scanned fraction
  // vanishing) once n outgrows the caps.

  /** Multi-probe Hamming radius for q43 (Lv et al., "Multi-Probe LSH",
    * VLDB 2007): smallest radius whose bucket ball covers ≥ `targetFrac`
    * of the hash space, so the probed candidate set at fixture sizes is
    * ~targetFrac·n. Capped at radius 3 — beyond the fixtures the ball
    * fraction (Σ C(bits,i)/2^bits) shrinks toward 0 as the derived `bits`
    * grows with n, which is the production posture. */
  def lshProbeRadius(bits: Int, targetFrac: Double = 0.25): Int = {
    require(bits >= 1 && bits <= 30, s"bits out of range: $bits")
    val total = math.pow(2.0, bits)
    def choose(n: Int, k: Int): Double =
      (0 until k).map(i => (n - i).toDouble / (i + 1)).product
    def ballFrac(r: Int): Double =
      (0 to r).map(choose(bits, _)).sum / total
    (0 to 3).find(ballFrac(_) >= targetFrac).getOrElse(3)
  }

  /** All bucket ids within Hamming distance `radius` of `bucket` — the
    * probe set q43 scans (at scale: the partition-pruning predicate). */
  def hammingBall(bucket: Int, bits: Int, radius: Int): Seq[Int] = {
    require(bits >= 1 && bits <= 30, s"bits out of range: $bits")
    def flips(start: Int, left: Int, acc: Int): Seq[Int] =
      if (left == 0) Seq(acc)
      else (start until bits).flatMap(i => flips(i + 1, left - 1, acc ^ (1 << i)))
    (0 to radius).flatMap(flips(0, _, bucket)).distinct
  }

  /** Probe-cell count for the IVF family (q45/q118): a quarter of the
    * cells at fixture sizes (recall floor ≈ 0.25 on iid data), capped at
    * 64 absolute — at the 4096-cell cap that is a 1.6% scan, and the cap
    * is the knob production raises per its measured recall target. */
  def ivfProbeCells(nlist: Int): Int =
    math.max(1, math.min(64, (nlist + 3) / 4))

  /** ADC re-rank shortlist budget for q117/q131: a quarter of the corpus
    * at fixture sizes (the shortlist is the only place raw embeddings are
    * read, so at fixture scale a generous budget costs nothing), capped
    * at 4096 rows absolute — vanishing relative to a real corpus, where
    * IVFADC's cell pruning (q118) is the recall lever instead. */
  def adcShortlist(n: Long): Int =
    // clamp in Long BEFORE narrowing: at n ≈ 10¹⁰ the quarter-corpus
    // intermediate overflows Int and would wrap the budget negative,
    // silently collapsing it to the 100 floor at exactly the scale the
    // cap exists for
    math.max(100L, math.min(4096L, (n + 3) / 4)).toInt
}
