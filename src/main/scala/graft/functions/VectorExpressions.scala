package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for embedding similarity (SURVEY.md §2.3
  * E13; north-star similarity-search ops). A single fused pass per vector
  * pair — versus three separate higher-order `aggregate()` calls — keeps
  * the hot loop primitive-typed with no per-element lambda dispatch.
  * Accumulation is in Double, in index order, so results are deterministic.
  */
object VectorExpressions {

  private[functions] def floatsOf(a: ArrayData): Array[Float] =
    a.toFloatArray()

  /** Cosine similarity of two float vectors, computed in one pass with
    * double accumulation. Returns null if either side is null; 0.0 if
    * either norm is zero. Full `doGenCode` (not CodegenFallback): the
    * expression runs once per corpus row in brute-force top-k, and a
    * fallback there would break the scan→project→TakeOrdered whole-stage
    * codegen span. Array elements must be non-null (parquet float lists). */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = floatsOf(l.asInstanceOf[ArrayData])
      val b = floatsOf(r.asInstanceOf[ArrayData])
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = (double) $a.getFloat($i);
           |  double $y = (double) $b.getFloat($i);
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |${ev.value} = ($na == 0.0 || $nb == 0.0)
           |  ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
         """.stripMargin
      })
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): CosineSimilarity = copy(l, r)
    override def prettyName: String = "cosine_similarity"
  }

  /** Random-hyperplane LSH bucket of a float vector: `nBits` sign bits of
    * dot products against pseudo-random Rademacher (±1) hyperplanes. The
    * hyperplane components are bits of XXH64(dim-block, seed=plane) — fully
    * deterministic, no stored model, any dimension. Vectors with high cosine
    * similarity collide in buckets with high probability (SimHash LSH family
    * for angular distance). `planeOffset` shifts the plane seeds so banded
    * variants (B independent bucket tables) draw disjoint hyperplanes. */
  case class HyperplaneBucket(child: Expression, nBits: Int,
      planeOffset: Int = 0) extends UnaryExpression {
    require(nBits > 0 && nBits <= 30, "nBits must be in 1..30")
    require(planeOffset >= 0, "planeOffset must be >= 0")
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any =
      VectorExpressions.hyperplaneEval(input.asInstanceOf[ArrayData], nBits,
        planeOffset)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.VectorExpressions.hyperplaneEval($c, $nBits, $planeOffset)")
    override protected def withNewChildInternal(c: Expression): HyperplaneBucket =
      copy(child = c)
    override def prettyName: String = "hyperplane_bucket"
  }

  /** Static eval used by HyperplaneBucket's generated code. */
  def hyperplaneEval(input: ArrayData, nBits: Int, planeOffset: Int): Int = {
    val v = floatsOf(input)
    var bucket = 0
    var p = 0
    while (p < nBits) {
      var s = 0.0
      var i = 0
      var word = 0L
      while (i < v.length) {
        // 64 ±1 components per XXH64 word; the word depends only on the
        // 64-element block index and the plane, so hash once per block
        // boundary, not per element (64x fewer hash calls on the q43/q48
        // hot path; buckets are bit-identical)
        if ((i & 63) == 0)
          word = XXH64.hashLong((i >> 6).toLong, (planeOffset + p).toLong)
        val sign = if (((word >>> (i & 63)) & 1L) == 1L) 1.0 else -1.0
        s += sign * v(i)
        i += 1
      }
      if (s > 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  def cosineSimilarity(a: Column, b: Column): Column =
    toCol(CosineSimilarity(toExpr(a), toExpr(b)))
  def hyperplaneBucket(v: Column, nBits: Int, planeOffset: Int = 0): Column =
    toCol(HyperplaneBucket(toExpr(v), nBits, planeOffset))
}
