package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for document fingerprinting (SURVEY.md §2.3
  * E11/E12 scale path; north-star text-analysis ops). Native expressions
  * rather than Scala UDFs: no Row boxing/encoding per call, null handling
  * from `UnaryExpression`, and an upgrade path to `doGenCode`.
  *
  * Base hash: the low 8 bytes of MD5 read little-endian — bit-for-bit
  * `md5_number_lower()` in DuckDB — so every fingerprint built on it
  * (SimHash bits, MinHash permutation minima) is replayable by the SQL
  * oracle, not just deterministic. MinHash then derives its k
  * "permutations" from ONE base hash via affine universal hashing
  * `(a_i·h + b_i) mod (2^61−1)` (Carter–Wegman; the Mersenne modulus
  * admits a two-multiply fold reduction) instead of k seeded hash passes —
  * one digest per shingle regardless of k, and plain integer arithmetic
  * the oracle reproduces in HUGEINT.
  */
object TextExpressions {

  /** 2^61 − 1 (Mersenne prime): modulus of the MinHash permutation family. */
  val MersenneP: Long = 2305843009213693951L

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Little-endian u64 of md5 bytes 8..15 (as the same 64 bits in a signed
    * long) — exactly DuckDB's `md5_number_lower(s)`, the bridge that makes
    * q33/q34 hash-exact against the oracle. */
  private[functions] def md5Low64(t: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(t.getBytes)
    (d(8) & 0xffL) | ((d(9) & 0xffL) << 8) | ((d(10) & 0xffL) << 16) |
      ((d(11) & 0xffL) << 24) | ((d(12) & 0xffL) << 32) |
      ((d(13) & 0xffL) << 40) | ((d(14) & 0xffL) << 48) |
      ((d(15) & 0xffL) << 56)
  }

  /** Largest signature length the precomputed coefficient tables cover. */
  val MaxMinhashK: Int = 64

  // affine coefficients a_i = (2i+1)·C1 mod p, b_i = i·C2 mod p (C1/C2 the
  // 64-bit golden-ratio / xxhash-prime odd constants; any fixed odd
  // multipliers work — these are replicated verbatim in the q33 oracle SQL)
  private val PermA: Array[Long] = Array.tabulate(MaxMinhashK)(i =>
    ((BigInt(2 * i + 1) * BigInt("11400714819323198485")) mod
      BigInt(MersenneP)).toLong)
  private val PermB: Array[Long] = Array.tabulate(MaxMinhashK)(i =>
    ((BigInt(i) * BigInt("14029467366897019727")) mod
      BigInt(MersenneP)).toLong)

  /** `(a·b) mod (2^61−1)` for a, b ∈ [0, 2^61): 128-bit product via
    * `multiplyHigh`, then the Mersenne fold `2^64 ≡ 8 (mod p)`. */
  private def mulModP(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // operands < 2^61, sign bits clear
    val lo = a * b
    var r = hi * 8L + java.lang.Long.remainderUnsigned(lo, MersenneP) // < 2^62
    if (r >= MersenneP) r -= MersenneP
    if (r >= MersenneP) r -= MersenneP
    r
  }

  /** 64-bit SimHash of a token array: per-bit majority vote over token
    * hashes. Near-identical token multisets → small Hamming distance. */
  case class SimHash64(child: Expression)
      extends UnaryExpression {
    // SortedIntersectCount's rule, same rationale: user-facing SQL
    // function — a non-string array would decode each element's raw bits
    // as UTF8String offsets, silent garbage fingerprints, not an error
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"simhash64 requires an array<string> argument, got ${other.catalogString}")
      }
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      TextExpressions.simhashEval(input.asInstanceOf[ArrayData])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextExpressions.simhashEval($c)")
    override protected def withNewChildInternal(c: Expression): SimHash64 =
      copy(child = c)
    override def prettyName: String = "simhash64"
  }

  /** Static eval used by SimHash64's generated code: one virtual call per
    * row (vs CodegenFallback's boxed `eval` + InternalRow wrapping), keeps
    * the surrounding operators in whole-stage codegen. */
  def simhashEval(arr: ArrayData): Long = {
    val acc = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = md5Low64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          acc(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** MinHash signature: `k` permutation minima over token hashes, the
    * permutations being affine maps `(a_i·h + b_i) mod (2^61−1)` of ONE
    * md5-derived base hash per token (k ≤ [[MaxMinhashK]]). Input
    * array<string>, output array<long> of length k with every element in
    * [0, 2^61−1). Empty input → array of Long.MaxValue (sentinel; callers
    * filter empty token sets before banding so sentinel signatures never
    * collide into one giant bucket). */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        // k is validated HERE (analysis time) rather than per-row in
        // minhashEval: an out-of-range k used to pass the analyzer and
        // then throw from every executor task mid-job (or, for k <= 0,
        // silently emit length-0 signatures that break banding)
        case ArrayType(StringType, _) if k < 1 || k > MaxMinhashK =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"minhash_signature k=$k out of range [1, $MaxMinhashK]")
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"minhash_signature requires an array<string> argument, got ${other.catalogString}")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      TextExpressions.minhashEval(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextExpressions.minhashEval($c, $k)")
    override protected def withNewChildInternal(c: Expression): MinHashSignature =
      copy(child = c)
    override def prettyName: String = "minhash_signature"
  }

  /** Static eval used by MinHashSignature's generated code. k is
    * bounds-checked at analysis time by [[MinHashSignature]]'s
    * `checkInputDataTypes` — no per-row guard in this hot loop. */
  def minhashEval(arr: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill[Long](k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h =
          java.lang.Long.remainderUnsigned(md5Low64(arr.getUTF8String(i)), MersenneP)
        var p = 0
        while (p < k) {
          var v = mulModP(PermA(p), h) + PermB(p) // < 2^62, no overflow
          if (v >= MersenneP) v -= MersenneP
          if (v < sig(p)) sig(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Polynomial rolling hash over a string's UTF-8 bytes — an
    * order-sensitive content fingerprint (two docs with the same words in a
    * different order get different fingerprints, unlike SimHash/MinHash). */
  case class RollingHash64(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"rolling_hash64 requires a string argument, got ${other.catalogString}")
      }
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      TextExpressions.rollingHashEval(input.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextExpressions.rollingHashEval($c)")
    override protected def withNewChildInternal(c: Expression): RollingHash64 =
      copy(child = c)
    override def prettyName: String = "rolling_hash64"
  }

  private val deflaterLocal = new ThreadLocal[java.util.zip.Deflater] {
    // level 6 (zlib default), nowrap raw-deflate — reset() per row below;
    // one native context per executor thread for its lifetime (the same
    // amortization as md5Local — never per-row allocation)
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  /** DEFLATE-compressed length of a string's UTF-8 bytes — the classic
    * compression-ratio quality signal (highly compressible text is
    * repetitive boilerplate/spam; near-incompressible text is noise or
    * already-compressed garbage — the filter family used by Gopher/
    * MassiveText-style curation). A native expression so the hot loop is
    * zlib via one thread-local native context; a UDF would re-box every
    * row and a per-row `new Deflater` would thrash native allocations. */
  case class DeflateLen(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"deflate_len requires a string argument, got ${other.catalogString}")
      }
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any =
      TextExpressions.deflateLenEval(input.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextExpressions.deflateLenEval($c)")
    override protected def withNewChildInternal(c: Expression): DeflateLen =
      copy(child = c)
    override def prettyName: String = "deflate_len"
  }

  /** Static eval for DeflateLen's generated code. */
  def deflateLenEval(str: UTF8String): Int = {
    val bytes = str.getBytes
    val d = deflaterLocal.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Static eval for RollingHash64's generated code. */
  def rollingHashEval(str: UTF8String): Long = {
    val bytes = str.getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = h * 31L + bytes(i)
      i += 1
    }
    h
  }

  /** Count of left-array elements present in the SORTED right array, by
    * per-element binary search — O(|a|·log|b|) per row, no per-row set
    * build. Spark's own `ArrayIntersect.eval` reconstructs a hash set of
    * its arguments on EVERY row, so a stream–static contamination screen
    * joining docs against one large static gram array pays O(|bench|) per
    * arriving document; with this expression the per-doc cost depends on
    * benchmark size only logarithmically. Contract: `right` is
    * ascending-sorted in UTF8 binary order (e.g. `array_sort` output) with
    * no null elements; duplicates in `left` each count once per occurrence,
    * so distinct `left` first if set semantics are intended. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    // fail at ANALYSIS time on non-string arrays — this is registered as a
    // user-facing SQL function, and binary-searching e.g. an int-backed
    // ArrayData via getUTF8String would return silent garbage, not error
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"sorted_intersect_count requires (array<string>, array<string>)" +
              s" arguments, got (${l.catalogString}, ${r.catalogString})")
      }
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any =
      TextExpressions.sortedIntersectEval(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.TextExpressions.sortedIntersectEval($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): SortedIntersectCount =
      copy(left = l, right = r)
    override def prettyName: String = "sorted_intersect_count"
  }

  /** Static eval for SortedIntersectCount's generated code. */
  def sortedIntersectEval(a: ArrayData, b: ArrayData): Int = {
    var m = b.numElements()
    // `array_sort` places nulls LAST: clamp the search below any trailing
    // nulls rather than NPE on a null slot (registered as a user-facing SQL
    // function, so the right array is not guaranteed null-free)
    while (m > 0 && b.isNullAt(m - 1)) m -= 1
    var count = 0
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) {
        val g = a.getUTF8String(i)
        var lo = 0
        var hi = m - 1
        var found = false
        while (lo <= hi && !found) {
          val mid = (lo + hi) >>> 1
          val c = b.getUTF8String(mid).compareTo(g)
          if (c == 0) found = true
          else if (c < 0) lo = mid + 1
          else hi = mid - 1
        }
        if (found) count += 1
      }
      i += 1
    }
    count
  }

  /** Unicode NFC normalization (UAX #15 canonical composition) — the
    * canonical first stage of a text-curation pipeline: visually identical
    * strings with different code-point sequences ("e"+U+0301 vs "é") must
    * hash/dedup/tokenize identically, so everything downstream (exact
    * dedup q30, shingle near-dup q32, token stats q35) assumes NFC input.
    * Spark has no normalization built-in; this wraps `java.text.Normalizer`
    * (the JDK's UAX #15 implementation) as a codegen'd expression with an
    * allocation-free fast path for already-normalized text — at 100 TB the
    * overwhelmingly common case (ASCII is NFC by construction), so the
    * scan stays a near-zero-cost per-row check. */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"nfc_normalize requires a string argument, got ${other.catalogString}")
      }
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      TextExpressions.nfcEval(input.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextExpressions.nfcEval($c)")
    override protected def withNewChildInternal(c: Expression): NfcNormalize =
      copy(child = c)
    override def prettyName: String = "nfc_normalize"
  }

  /** Static eval for NfcNormalize's generated code. `isNormalized` is a
    * single scan with no allocation (and short-circuits on the Latin-1
    * fast path), so already-NFC rows return the INPUT UTF8String as-is. */
  def nfcEval(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  // Column-level wrappers (Spark 4: Column ↔ Expression via GraftBridge)
  import org.apache.spark.sql.GraftBridge.{column => toCol, expression => toExpr}
  def simhash64(c: Column): Column = toCol(SimHash64(toExpr(c)))
  def minhashSignature(c: Column, k: Int): Column =
    toCol(MinHashSignature(toExpr(c), k))
  def rollingHash64(c: Column): Column = toCol(RollingHash64(toExpr(c)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    toCol(SortedIntersectCount(toExpr(a), toExpr(b)))
  def nfcNormalize(c: Column): Column = toCol(NfcNormalize(toExpr(c)))
}
