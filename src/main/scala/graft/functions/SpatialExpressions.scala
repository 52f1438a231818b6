package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions._
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

  // public (not private[graft]): called from generated Java code, which
  // needs the static forwarder that qualified-private members don't get
  def encodePoint(x: Double, y: Double): Array[Byte] = {
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
    // plain 2D WKB point, or the SRID-flagged EWKB 2D point — the exact
    // bytes [[setSrid]]/PostGIS emit, whose 4-byte SRID payload is
    // SKIPPED explicitly (round-9 review: st_x(st_set_srid(p, 4326))
    // returned null). Z/M flag bits change the coordinate layout itself
    // and stay rejected: blind masking would misread the extra dims.
    if (geomType == 1) ()
    else if (geomType == (1 | EwkbSrid)) {
      if (buf.remaining() < 20) return None
      buf.getInt // skip embedded SRID
    } else return None
    Some((buf.getDouble, buf.getDouble))
  }

  /** `st_point(x, y)` → WKB bytes (reference O20). */
  case class StPoint(left: Expression, right: Expression)
      extends BinaryExpression {
    // WkbInput's rule for the binary-args family: reject wrong types at
    // analysis (the SQL builder casts to double; a raw int from the
    // Scala API used to CCE in eval yet silently widen in codegen)
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (DoubleType, DoubleType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"st_point requires (double, double), got (${l.catalogString}, ${r.catalogString})")
      }
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

  /** Analysis-time binary-input guard shared by every WKB-consuming
    * unary expression here — these are user-facing SQL functions, so a
    * non-binary argument must be an analysis error, not a runtime
    * ClassCastException mid-job (SortedIntersectCount's rule). */
  sealed trait WkbInput extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case BinaryType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires a binary (WKB) argument, got ${other.catalogString}")
      }
  }

  /** Coordinate extraction from WKB points (reference O7 decode).
    * Codegen via a boxed static helper: invalid WKB → null slot. */
  abstract class PointCoord extends UnaryExpression with WkbInput {
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

  // ------------------------------------------------------- general WKB walk

  /** Base geometry type names indexed by WKB code 1–7. */
  private val TypeNames = Array("POINT", "LINESTRING", "POLYGON",
    "MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION")

  private val EwkbZ = 0x80000000
  private val EwkbM = 0x40000000
  private val EwkbSrid = 0x20000000

  /** Structural walk of a WKB/EWKB/ISO-WKB geometry: validates the whole
    * byte layout (every ring, every nested geometry, exact length) and
    * returns the base type code 1–7, or None for anything malformed. The
    * reference decodes arbitrary geometry via GeoPandas
    * (`app.py:148`, fallback `app.py:172`); this is the engine-native
    * equivalent inspection surface. Handles both endiannesses, EWKB flag
    * bits (Z/M/SRID) and ISO type offsets (+1000/+2000/+3000). Never
    * throws — total on arbitrary bytes (property-tested). */
  private[graft] def walkWkb(wkb: Array[Byte]): Option[Int] = {
    if (wkb == null || wkb.length < 5) return None
    val buf = ByteBuffer.wrap(wkb)
    try {
      val t = walkGeometry(buf, depth = 0, requireBase = 0)
      if (t.isDefined && buf.remaining() == 0) t else None
    } catch { case _: java.nio.BufferUnderflowException => None }
  }

  /** Walk one geometry starting at the buffer position. `requireBase` pins
    * the child type inside typed multis (0 = any). */
  private def walkGeometry(buf: ByteBuffer, depth: Int, requireBase: Int): Option[Int] = {
    if (depth > 8) return None // nesting bound: real data is depth ≤ 2
    if (buf.remaining() < 5) return None
    val order = buf.get() match {
      case 1 => ByteOrder.LITTLE_ENDIAN
      case 0 => ByteOrder.BIG_ENDIAN
      case _ => return None
    }
    buf.order(order)
    val raw = buf.getInt
    val isoOffset = (raw & 0x0FFFFFFF) / 1000
    if (isoOffset > 3) return None
    val base = (raw & 0x0FFFFFFF) % 1000
    if (base < 1 || base > 7) return None
    if (requireBase != 0 && base != requireBase) return None
    val dims = 2 +
      (if ((raw & EwkbZ) != 0 || isoOffset == 1 || isoOffset == 3) 1 else 0) +
      (if ((raw & EwkbM) != 0 || isoOffset >= 2) 1 else 0)
    if ((raw & EwkbSrid) != 0) {
      if (buf.remaining() < 4) return None
      buf.getInt // skip embedded SRID (top-level EWKB)
    }
    def skipPoints(n: Int): Boolean = {
      val bytes = n.toLong * dims * 8
      if (n < 0 || bytes > buf.remaining()) false
      else { buf.position(buf.position() + bytes.toInt); true }
    }
    def count(): Int = if (buf.remaining() < 4) -1 else buf.getInt
    base match {
      case 1 => if (skipPoints(1)) Some(1) else None
      case 2 => if (skipPoints(count())) Some(2) else None
      case 3 =>
        val rings = count()
        if (rings < 0) return None
        var i = 0
        while (i < rings) { if (!skipPoints(count())) return None; i += 1 }
        Some(3)
      case _ => // multi/collection: children are full WKB geometries
        val kids = count()
        if (kids < 0) return None
        val childBase = if (base == 7) 0 else base - 3
        var i = 0
        while (i < kids) {
          if (walkGeometry(buf, depth + 1, childBase).isEmpty) return None
          buf.order(order) // child may have flipped the shared buffer order
          i += 1
        }
        Some(base)
    }
  }

  /** Embedded EWKB SRID of the top-level geometry, if the SRID flag is set
    * and the header is well-formed. */
  private[graft] def sridOf(wkb: Array[Byte]): Option[Int] = {
    // full structural walk first: validating only the 9-byte header let
    // st_srid return an arbitrary int for bytes st_is_valid_wkb rejects
    // and st_set_srid refuses to produce (round-9 review) — the trio now
    // agrees on what counts as a geometry
    if (wkb == null || wkb.length < 9 || walkWkb(wkb).isEmpty) return None
    val order = wkb(0) match {
      case 1 => ByteOrder.LITTLE_ENDIAN
      case 0 => ByteOrder.BIG_ENDIAN
      case _ => return None
    }
    val buf = ByteBuffer.wrap(wkb, 1, wkb.length - 1).order(order)
    val raw = buf.getInt
    if ((raw & EwkbSrid) == 0) None else Some(buf.getInt)
  }

  /** Re-tag a geometry with an EWKB SRID: sets the SRID flag in the type
    * word and inserts/replaces the 4-byte SRID after it, preserving the
    * original byte order and body. This is the on-the-wire form PostGIS
    * stores and the reference's `to_postgis` writes (hex EWKB). Returns
    * null for input that fails the structural walk — never fabricates a
    * geometry from garbage. */
  // public: called from generated Java code (needs the static forwarder)
  def setSrid(wkb: Array[Byte], srid: Int): Array[Byte] = {
    if (walkWkb(wkb).isEmpty) return null
    val order = if (wkb(0) == 1.toByte) ByteOrder.LITTLE_ENDIAN
                else ByteOrder.BIG_ENDIAN
    val in = ByteBuffer.wrap(wkb, 1, wkb.length - 1).order(order)
    val raw = in.getInt
    val hadSrid = (raw & EwkbSrid) != 0
    if (hadSrid) in.getInt // drop old SRID
    val body = new Array[Byte](in.remaining())
    in.get(body)
    val out = ByteBuffer.allocate(9 + body.length).order(order)
    out.put(wkb(0)).putInt(raw | EwkbSrid).putInt(srid).put(body)
    out.array()
  }

  // static helpers for generated code (boxed null slots)
  def geometryTypeName(wkb: Array[Byte]): org.apache.spark.unsafe.types.UTF8String =
    walkWkb(wkb).map(t =>
      org.apache.spark.unsafe.types.UTF8String.fromString(TypeNames(t - 1))).orNull
  def isValidWkb(wkb: Array[Byte]): Boolean = walkWkb(wkb).isDefined
  def sridOrNull(wkb: Array[Byte]): java.lang.Integer =
    sridOf(wkb).map(java.lang.Integer.valueOf).orNull

  /** `st_geometrytype(wkb)` → 'POINT' | 'LINESTRING' | … | null. */
  case class StGeometryType(child: Expression)
      extends UnaryExpression with WkbInput {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      geometryTypeName(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("gtype")
        s"""
           |org.apache.spark.unsafe.types.UTF8String $tmp =
           |  graft.functions.SpatialExpressions.geometryTypeName($c);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): StGeometryType =
      copy(c)
    override def prettyName: String = "st_geometrytype"
  }

  /** `st_is_valid_wkb(wkb)`: full structural validation, all 7 base types
    * (the general form of [[StIsWkbPoint]]'s point-only probe). */
  case class StIsValidWkb(child: Expression)
      extends UnaryExpression with WkbInput {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(input: Any): Any =
      isValidWkb(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SpatialExpressions.isValidWkb($c)")
    override protected def withNewChildInternal(c: Expression): StIsValidWkb =
      copy(c)
    override def prettyName: String = "st_is_valid_wkb"
  }

  /** `st_srid(wkb)` → embedded EWKB SRID or null (plain WKB has none). */
  case class StSrid(child: Expression)
      extends UnaryExpression with WkbInput {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val r = sridOrNull(input.asInstanceOf[Array[Byte]])
      if (r == null) null else r.intValue()
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("srid")
        s"""
           |java.lang.Integer $tmp = graft.functions.SpatialExpressions.sridOrNull($c);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.intValue(); }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): StSrid = copy(c)
    override def prettyName: String = "st_srid"
  }

  /** `st_set_srid(wkb, srid)` → EWKB with the SRID embedded (null for
    * structurally invalid input). The PostGIS sink's wire format. */
  case class StSetSrid(left: Expression, right: Expression)
      extends BinaryExpression {
    // analysis-time guard (WkbInput's rule — a string first arg used to
    // fail janino compilation or CCE mid-job instead of analysis)
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, IntegerType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"st_set_srid requires (binary, int), got (${l.catalogString}, ${r.catalogString})")
      }
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def nullSafeEval(wkb: Any, srid: Any): Any =
      setSrid(wkb.asInstanceOf[Array[Byte]], srid.asInstanceOf[Int])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (w, s) => {
        val tmp = ctx.freshName("ewkb")
        s"""
           |byte[] $tmp = graft.functions.SpatialExpressions.setSrid($w, $s);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp; }
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): StSetSrid = copy(l, r)
    override def prettyName: String = "st_set_srid"
  }

  /** Validity probe: is this binary a decodable WKB point? Mirrors the
    * reference's tolerant decode (`app.py:145-152` bytes check). */
  case class StIsWkbPoint(child: Expression)
      extends UnaryExpression with WkbInput {
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
  def stGeometryType(wkb: Column): Column = toCol(StGeometryType(toExpr(wkb)))
  def stIsValidWkb(wkb: Column): Column = toCol(StIsValidWkb(toExpr(wkb)))
  def stSrid(wkb: Column): Column = toCol(StSrid(toExpr(wkb)))
  def stSetSrid(wkb: Column, srid: Column): Column =
    toCol(StSetSrid(toExpr(wkb), toExpr(srid)))
}
