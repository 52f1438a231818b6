package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.3 E19): elementwise sum of float vectors with
  * double accumulation. Registered via `functions.udaf(...)` so Spark plans
  * it like any aggregate — partial (map-side) reduction per partition, then
  * merge — no per-group row materialization.
  *
  * Empty input → empty vector; vectors of differing lengths extend to the
  * longest seen (missing positions treated as 0).
  */
object VectorSumAggregator
    extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  private def grow(buf: Array[Double], n: Int): Array[Double] =
    if (buf.length >= n) buf
    else java.util.Arrays.copyOf(buf, n)

  override def reduce(buf: Array[Double], v: Seq[Float]): Array[Double] = {
    if (v == null) return buf
    val out = grow(buf, v.length)
    var i = 0
    while (i < v.length) {
      out(i) += v(i).toDouble
      i += 1
    }
    out
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    val out = big.clone()
    var i = 0
    while (i < small.length) {
      out(i) += small(i)
      i += 1
    }
    out
  }

  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
