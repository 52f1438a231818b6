package graft

import graft.functions.{SpatialExpressions, TextExpressions}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws (SURVEY.md §5.2-3) over the engine's expression
  * semantics, via ScalaCheck. These exercise the same static eval bodies
  * the generated code calls. */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val finiteDouble: Gen[Double] =
    Gen.chooseNum(-1e12, 1e12).suchThat(d => !d.isNaN && !d.isInfinite)

  test("WKB point encode→decode identity (all finite coordinates)") {
    check(Prop.forAll(finiteDouble, finiteDouble) { (x, y) =>
      SpatialExpressions.decodePoint(SpatialExpressions.encodePoint(x, y))
        .contains((x, y))
    })
  }

  test("WKB decode is total: arbitrary bytes never throw") {
    check(Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      SpatialExpressions.decodePoint(bs.toArray) // Option result, no throw
      true
    })
  }

  // ------------------------------------------------ general WKB structure

  import java.nio.{ByteBuffer, ByteOrder}

  private def wkbHeader(size: Int, geomType: Int): ByteBuffer =
    ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(geomType)

  private def wkbLineString(pts: Seq[(Double, Double)]): Array[Byte] = {
    val buf = wkbHeader(9 + pts.size * 16, 2).putInt(pts.size)
    pts.foreach { case (x, y) => buf.putDouble(x).putDouble(y) }
    buf.array()
  }

  private def wkbPolygon(rings: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    val size = 9 + rings.map(r => 4 + r.size * 16).sum
    val buf = wkbHeader(size, 3).putInt(rings.size)
    rings.foreach { r =>
      buf.putInt(r.size)
      r.foreach { case (x, y) => buf.putDouble(x).putDouble(y) }
    }
    buf.array()
  }

  private def wkbMulti(typeCode: Int, kids: Seq[Array[Byte]]): Array[Byte] = {
    val buf = wkbHeader(9 + kids.map(_.length).sum, typeCode).putInt(kids.size)
    kids.foreach(buf.put)
    buf.array()
  }

  private val coords: Gen[List[(Double, Double)]] =
    Gen.nonEmptyListOf(Gen.zip(finiteDouble, finiteDouble))

  test("general WKB walk names all seven base geometry types") {
    check(Prop.forAll(coords, coords) { (a, b) =>
      val pt = SpatialExpressions.encodePoint(a.head._1, a.head._2)
      val ls = wkbLineString(a)
      val pg = wkbPolygon(Seq(a, b))
      def name(w: Array[Byte]) =
        Option(SpatialExpressions.geometryTypeName(w)).map(_.toString)
      name(pt).contains("POINT") &&
        name(ls).contains("LINESTRING") &&
        name(pg).contains("POLYGON") &&
        name(wkbMulti(4, Seq(pt, pt))).contains("MULTIPOINT") &&
        name(wkbMulti(5, Seq(ls))).contains("MULTILINESTRING") &&
        name(wkbMulti(6, Seq(pg))).contains("MULTIPOLYGON") &&
        name(wkbMulti(7, Seq(pt, ls, pg))).contains("GEOMETRYCOLLECTION")
    })
  }

  test("WKB validity rejects truncation and trailing garbage") {
    check(Prop.forAll(coords) { pts =>
      val ls = wkbLineString(pts)
      SpatialExpressions.isValidWkb(ls) &&
        !SpatialExpressions.isValidWkb(ls.dropRight(1)) &&
        !SpatialExpressions.isValidWkb(ls :+ 0.toByte)
    })
  }

  test("general WKB walk is total: arbitrary bytes never throw") {
    check(Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      SpatialExpressions.walkWkb(bs.toArray) // Option result, no throw
      true
    })
  }

  test("typed multis reject mistyped children (MultiPoint of LineString)") {
    val ls = wkbLineString(Seq((0.0, 0.0), (1.0, 1.0)))
    assert(!SpatialExpressions.isValidWkb(wkbMulti(4, Seq(ls))))
  }

  test("big-endian and ISO-Z points validate") {
    val be = ByteBuffer.allocate(21).order(ByteOrder.BIG_ENDIAN)
      .put(0.toByte).putInt(1).putDouble(3.0).putDouble(4.0).array()
    assert(SpatialExpressions.geometryTypeName(be).toString == "POINT")
    val isoZ = ByteBuffer.allocate(29).order(ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(1001).putDouble(1.0).putDouble(2.0).putDouble(3.0)
      .array()
    assert(SpatialExpressions.geometryTypeName(isoZ).toString == "POINT")
  }

  test("st_set_srid: embeds, round-trips, replaces, preserves the body") {
    check(Prop.forAll(finiteDouble, finiteDouble, Gen.choose(1, 999999)) {
      (x, y, srid) =>
        val wkb = SpatialExpressions.encodePoint(x, y)
        val ewkb = SpatialExpressions.setSrid(wkb, srid)
        val again = SpatialExpressions.setSrid(ewkb, srid + 1)
        SpatialExpressions.sridOf(wkb).isEmpty &&
          SpatialExpressions.sridOf(ewkb).contains(srid) &&
          SpatialExpressions.sridOf(again).contains(srid + 1) &&
          SpatialExpressions.walkWkb(ewkb).contains(1) &&
          ewkb.length == wkb.length + 4 &&
          again.length == ewkb.length
    })
  }

  test("st_set_srid on structurally invalid bytes yields null, not garbage") {
    assert(SpatialExpressions.setSrid(Array[Byte](1, 2, 3), 4326) == null)
  }

  private val token: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private def arrayData(tokens: Seq[String]) =
    new GenericArrayData(tokens.map(t => UTF8String.fromString(t)).toArray[Any])

  test("simhash is permutation-invariant over the token multiset") {
    check(Prop.forAll(Gen.nonEmptyListOf(token), Gen.long) { (toks, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(toks)
      TextExpressions.simhashEval(arrayData(toks)) ==
        TextExpressions.simhashEval(arrayData(shuffled))
    })
  }

  test("minhash signature is permutation-invariant and elementwise-monotone under union") {
    check(Prop.forAll(Gen.nonEmptyListOf(token), Gen.nonEmptyListOf(token), Gen.long) {
      (a, b, seed) =>
        val shuffled = new scala.util.Random(seed).shuffle(a)
        val sigA = TextExpressions.minhashEval(arrayData(a), 16).toLongArray()
        val sigShuffled = TextExpressions.minhashEval(arrayData(shuffled), 16).toLongArray()
        val sigUnion = TextExpressions.minhashEval(arrayData(a ++ b), 16).toLongArray()
        // permutation invariance
        sigA.sameElements(sigShuffled) &&
        // adding elements can only lower (or keep) each permutation minimum
        sigUnion.zip(sigA).forall { case (u, x) => u <= x }
    })
  }

  test("rolling hash: equal strings hash equal; deterministic across calls") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h1 = TextExpressions.rollingHashEval(UTF8String.fromString(s))
      val h2 = TextExpressions.rollingHashEval(UTF8String.fromString(s))
      h1 == h2
    })
  }

  test("rolling hash is order-sensitive (prefix-swap changes the hash)") {
    check(Prop.forAll(token, token) { (a, b) =>
      (a == b) || {
        val ab = TextExpressions.rollingHashEval(UTF8String.fromString(a + "|" + b))
        val ba = TextExpressions.rollingHashEval(UTF8String.fromString(b + "|" + a))
        // collisions are possible in principle; for short alphanumeric
        // tokens a swap collision would indicate a broken mix
        ab != ba
      }
    })
  }

  test("jaccard bounds: 0 <= |A∩B| / |A∪B| <= 1 and self-similarity is 1") {
    check(Prop.forAll(Gen.nonEmptyListOf(token), Gen.nonEmptyListOf(token)) { (a, b) =>
      val sa = a.toSet
      val sb = b.toSet
      val jac = sa.intersect(sb).size.toDouble / sa.union(sb).size
      jac >= 0.0 && jac <= 1.0 &&
        (sa.intersect(sa).size.toDouble / sa.union(sa).size) == 1.0
    })
  }

  test("sorted-intersect law: binary search == per-occurrence set membership") {
    // right side sorted in UTF8String BINARY order (what array_sort emits)
    // — not Java String (UTF-16) order, which differs on multi-byte chars;
    // the generator mixes empty, ASCII, and multi-byte tokens to cover that
    val word = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)), Gen.const(""),
      Gen.const("é"), Gen.const("日本"), Gen.const("zé"))
    check(Prop.forAll(Gen.listOf(word), Gen.listOf(word)) { (a, b) =>
      val sortedB = b.distinct.map(UTF8String.fromString)
        .sortWith(_.compareTo(_) < 0)
      val got = TextExpressions.sortedIntersectEval(
        new GenericArrayData(a.map(UTF8String.fromString).toArray[Any]),
        new GenericArrayData(sortedB.toArray[Any]))
      got == a.count(b.toSet)
    })
  }
}
