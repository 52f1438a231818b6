package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Minimal WKB (well-known binary) helpers mirroring the reference's
  * spatial surface: point construction (`generate_data.py:15-16`), WKB
  * decode (`app.py:148,172`). Geometry stays `BinaryType` WKB at rest with
  * CRS in column metadata (SURVEY.md §7.4 decision) — no geometry runtime
  * type, full parquet interop.
  *
  * WKB point layout (little-endian): byte order flag 0x01, uint32
  * geometry type 1, float64 x, float64 y — 21 bytes.
  */
object SpatialExpressions {

  private[graft] def encodePoint(x: Double, y: Double): Array[Byte] = {
    val buf = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    buf.array()
  }

  /** Decode a WKB point; returns (x, y) or null if not a valid point. */
  private[graft] def decodePoint(wkb: Array[Byte]): Option[(Double, Double)] = {
    if (wkb == null || wkb.length < 21) return None
    val order =
      if (wkb(0) == 1.toByte) ByteOrder.LITTLE_ENDIAN
      else if (wkb(0) == 0.toByte) ByteOrder.BIG_ENDIAN
      else return None
    val buf = ByteBuffer.wrap(wkb, 1, wkb.length - 1).order(order)
    val geomType = buf.getInt
    // strict: plain 2D WKB point only. EWKB flag bits (SRID/Z/M) change the
    // byte layout after the type word — masking them here would silently
    // read the SRID as half of the x coordinate.
    if (geomType != 1) return None
    Some((buf.getDouble, buf.getDouble))
  }

  /** `st_point(x, y)` → WKB bytes (reference O20). */
  case class StPoint(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(x: Any, y: Any): Any =
      encodePoint(x.asInstanceOf[Double], y.asInstanceOf[Double])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, (x, y) =>
        s"graft.functions.SpatialExpressions.encodePoint($x, $y)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): StPoint = copy(l, r)
    override def prettyName: String = "st_point"
  }

  /** Coordinate extraction from WKB points (reference O7 decode).
    * Codegen via a boxed static helper: invalid WKB → null slot. */
  abstract class PointCoord extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    protected def pick(xy: (Double, Double)): Double
    protected def helperName: String
    override def nullSafeEval(input: Any): Any =
      decodePoint(input.asInstanceOf[Array[Byte]]).map(pick).orNull
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("coord")
        s"""
           |java.lang.Double $tmp = graft.functions.SpatialExpressions.$helperName($c);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.doubleValue(); }
         """.stripMargin
      })
  }

  /** Boxed static helpers for PointCoord generated code. */
  def xOrNull(wkb: Array[Byte]): java.lang.Double =
    decodePoint(wkb).map(p => java.lang.Double.valueOf(p._1)).orNull
  def yOrNull(wkb: Array[Byte]): java.lang.Double =
    decodePoint(wkb).map(p => java.lang.Double.valueOf(p._2)).orNull

  case class StX(child: Expression) extends PointCoord {
    override protected def pick(xy: (Double, Double)): Double = xy._1
    override protected def helperName: String = "xOrNull"
    override protected def withNewChildInternal(c: Expression): StX = copy(c)
    override def prettyName: String = "st_x"
  }

  case class StY(child: Expression) extends PointCoord {
    override protected def pick(xy: (Double, Double)): Double = xy._2
    override protected def helperName: String = "yOrNull"
    override protected def withNewChildInternal(c: Expression): StY = copy(c)
    override def prettyName: String = "st_y"
  }

  /** Validity probe: is this binary a decodable WKB point? Mirrors the
    * reference's tolerant decode (`app.py:145-152` bytes check). */
  case class StIsWkbPoint(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(input: Any): Any =
      decodePoint(input.asInstanceOf[Array[Byte]]).isDefined
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SpatialExpressions.isWkbPoint($c)")
    override protected def withNewChildInternal(c: Expression): StIsWkbPoint =
      copy(c)
    override def prettyName: String = "st_is_wkb_point"
  }

  /** Static helper for StIsWkbPoint's generated code. */
  def isWkbPoint(wkb: Array[Byte]): Boolean = decodePoint(wkb).isDefined

  def stPoint(x: Column, y: Column): Column = toCol(StPoint(toExpr(x), toExpr(y)))
  def stX(wkb: Column): Column = toCol(StX(toExpr(wkb)))
  def stY(wkb: Column): Column = toCol(StY(toExpr(wkb)))
  def stIsWkbPoint(wkb: Column): Column = toCol(StIsWkbPoint(toExpr(wkb)))
}
