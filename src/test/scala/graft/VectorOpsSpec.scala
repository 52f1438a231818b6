package graft

import graft.functions.{VectorExpressions, VectorSumAggregator}
import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** Specs for vector similarity: fused cosine expression vs reference math,
  * ANN recall vs brute force, Aggregator correctness. */
class VectorOpsSpec extends SparkSpec {

  test("cosine expression matches reference computation") {
    import spark.implicits._
    val df = Seq(
      (Seq(1f, 0f, 0f), Seq(1f, 0f, 0f), 1.0),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f), 0.0),
      (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f),
        (4.0 + 10.0 + 18.0) / (math.sqrt(14.0) * math.sqrt(77.0))),
      (Seq(0f, 0f, 0f), Seq(1f, 1f, 1f), 0.0) // zero vector -> 0 by contract
    ).toDF("a", "b", "expected")
    val got = df.select(
      VectorExpressions.cosineSimilarity(col("a"), col("b")).as("sim"),
      col("expected")).collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
        s"cosine ${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("ANN LSH results are a subset of brute-force ranking with exact sims") {
    val brute = VectorOps.cosineTopK(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // recompute full brute-force table for sim lookup
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val all = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VectorExpressions.cosineSimilarity(col("embedding"), col("q_emb")), 4)
          .as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = VectorOps.annLsh(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(ann.nonEmpty, "ANN should return candidates from the query bucket")
    ann.foreach { case (id, sim) =>
      assert(all(id) == sim, s"ANN sim for $id diverges from brute force")
    }
    // deterministic across runs
    val again = VectorOps.annLsh(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(again.toSeq == ann.toSeq)
  }

  test("IVF probe returns the exact top-k of its probed cell") {
    val ivf = VectorOps.annIvf(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(ivf.nonEmpty)
    // every returned sim must equal the brute-force sim for that id
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val all = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VectorExpressions.cosineSimilarity(col("embedding"), col("q_emb")), 4)
          .as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach { case (id, sim) => assert(all(id) == sim) }
    // results are sorted desc with id tiebreak and deterministic
    assert(ivf.sortBy { case (id, s) => (-s, id) }.toSeq == ivf.toSeq)
    assert(VectorOps.annIvf(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq == ivf.toSeq)
  }

  test("vector-sum Aggregator equals manual elementwise sum") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1f, 2f)), (0, Seq(3f, 4f)), (1, Seq(0.5f, -0.5f))
    ).toDF("label", "embedding")
    val vecSum = udaf(VectorSumAggregator)
    val got = df.groupBy(col("label"))
      .agg(vecSum(col("embedding")).as("s"))
      .orderBy(col("label"))
      .collect()
    assert(got(0).getSeq[Double](1) == Seq(4.0, 6.0))
    assert(got(1).getSeq[Double](1) == Seq(0.5, -0.5))
  }
}
