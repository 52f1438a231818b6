package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating expression (the UDTF surface, SURVEY.md §2.2):
  * emits one row per word n-gram of a token array — `(pos, ngram)`.
  * A `Generator` is Spark's native UDTF form: the analyzer hoists it into
  * a `Generate` node exactly like the built-in `explode`/`posexplode`, so
  * it composes with lateral views, filters, and aggregation pushdown.
  */
case class NGramGenerator(child: Expression, n: Int)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {
  require(n >= 1, "n must be >= 1")

  // exposed on the SQL surface (GraftFunctions "ngrams"): reject a
  // non-array child at ANALYSIS time — without this a string argument
  // passes the analyzer and every executor task dies mid-scan with an
  // opaque ClassCastException (round-9 review; Spark's own ExplodeBase
  // generators do the same check)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngrams requires an array<string> argument, got ${other.catalogString}")
    }

  override def position: Boolean = false
  override def inline: Boolean = false

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def collectionType: DataType = ArrayType(elementSchema)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val tokens = arr.asInstanceOf[ArrayData]
    val m = tokens.numElements() - n + 1
    if (m <= 0) return Nil
    (0 until m).iterator.flatMap { i =>
      // windows containing null tokens are skipped (elementSchema declares
      // ngram non-nullable, so there is no legal null output)
      if ((0 until n).exists(j => tokens.isNullAt(i + j))) None
      else {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens.getUTF8String(i + j).toString)
          j += 1
        }
        Some(InternalRow(i, UTF8String.fromString(sb.toString)))
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): NGramGenerator =
    copy(child = c)
  override def prettyName: String = "ngrams"
}

object NGramGenerator {
  def ngrams(tokens: Column, n: Int): Column =
    toCol(NGramGenerator(toExpr(tokens), n))
}
