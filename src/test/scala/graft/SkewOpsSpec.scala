package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._

/** Laws for the skew toolkit beyond the oracle: the q112 profiler must
  * flag exactly the planted hot key with exact shares.
  */
class SkewOpsSpec extends SparkSpec {

  test("q112: planted hot key flagged at >10x mean; flat keys are not") {
    import spark.implicits._
    // 1 key with 1000 rows + 100 keys with 10 rows: mean = 2000/101,
    // hot iff cnt*101 > 20000 -> only the planted key
    val rows = Seq.fill(1000)(7L) ++ (100L until 200L).flatMap(k => Seq.fill(10)(k))
    val df = rows.toDF("user_id")
    val out = SkewOps.keySkewProfileOf(df, "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.length == 10)
    assert(out.head == ((7L, 1000L, 0.5, true)), s"hot key row: ${out.head}")
    assert(out.tail.forall(!_._4), "no flat key may be flagged")
    assert(out.tail.forall(_._2 == 10L))
    // deterministic tiebreak among equal-count keys: ascending key order
    assert(out.tail.map(_._1).toSeq == (100L to 108L).toSeq)
  }

  test("q112: fixture run returns 10 rows with shares summing below 1") {
    val out = SkewOps.keySkewProfile(spark, sfDir).collect()
    assert(out.length == 10)
    val shareSum = out.map(_.getDouble(2)).sum
    assert(shareSum > 0 && shareSum <= 1.0)
  }
}
