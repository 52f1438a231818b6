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
}
