package graft

import graft.operators.{AnnParams, IvfIndex, VectorOps}
import org.apache.spark.sql.functions._

/** Specs for the offline IVF artifact (build/probe) and the corpus-scaled
  * ANN parameter derivations behind q43/q45/q48. */
class IvfIndexSpec extends SparkSpec {

  test("AnnParams derivations: monotone, clamped, and recall-sound") {
    // lshBits: bucket count tracks n/target; clamps at both ends
    assert(AnnParams.lshBits(10) == 2)
    assert(AnnParams.lshBits(2000) == 6) // 2^6 buckets ≈ 31/bucket
    assert(AnnParams.lshBits(1L << 40) == 24)
    assert(AnnParams.lshBits(500) <= AnnParams.lshBits(2000))
    // ivfCells: √n rule with clamps
    assert(AnnParams.ivfCells(0) == 2)
    assert(AnnParams.ivfCells(2000) == 45)
    assert(AnnParams.ivfCells(100000000L) == 4096)
    // adcShortlist: quarter-corpus at fixture sizes, 4096 cap survives
    // Int-overflow-scale corpora (10^10 vectors)
    assert(AnnParams.adcShortlist(500) == 125)
    assert(AnnParams.adcShortlist(10) == 100)
    assert(AnnParams.adcShortlist(10000000000L) == 4096)
    // ivfProbeCells: quarter of the cells, capped 64
    assert(AnnParams.ivfProbeCells(22) == 6)
    assert(AnnParams.ivfProbeCells(4096) == 64)
    // bandedLsh: derived shape meets the recall target it was asked for
    // (via the same banding formula), and rowBits tracks log2 n
    for (n <- Seq(300L, 2000L, 100000L); t <- Seq(0.5, 0.7, 0.95)) {
      val (b, r) = AnnParams.bandedLsh(n, t)
      assert(r >= 2 && r <= 24 && b >= 1 && b <= 256)
      if (b < 256) // below the visible clamp the target must be met
        assert(AnnParams.bandedRecall(b, r, t) >= 0.9,
          s"n=$n t=$t -> ($b,$r) misses target")
    }
    // the documented exponent story: high thresholds need FAR less work
    // (bands × bits, the per-vector hash volume)
    val (bLow, rLow) = AnnParams.bandedLsh(2000, 0.5)
    val (bHigh, rHigh) = AnnParams.bandedLsh(2000, 0.95)
    assert(bHigh * rHigh * 4 < bLow * rLow,
      s"work at 0.95 ($bHigh×$rHigh) should be ≪ work at 0.5 ($bLow×$rLow)")
  }

  test("built index round-trips: artifact probe == in-query q45, partition-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val corpus = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    val t0 = System.nanoTime()
    IvfIndex.build(corpus, dir)
    val tBuild = (System.nanoTime() - t0) / 1e9
    // codebook round-trip: loaded == retrained (training is deterministic)
    val loaded = IvfIndex.loadCodebook(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val retrained = IvfIndex.train(corpus)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    assert(loaded == retrained, "codebook must round-trip through parquet")
    assert(loaded.size > 2 && loaded.size <= AnnParams.ivfCells(corpus.count()))
    // artifact probe == the declared q45 (same derived params, same corpus,
    // ±the count including the query row — both sides land on the same k)
    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    // same derived probe width as the in-query core (from the REQUESTED
    // cell count — Lloyd may drop cells, and the core derives from k)
    val nProbe = AnnParams.ivfProbeCells(
      AnnParams.ivfCells(Tables.embeddings(spark, sfDir).count()))
    val t1 = System.nanoTime()
    val served = IvfIndex.probe(spark, dir, q, Some(nProbe)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val tCold = (System.nanoTime() - t1) / 1e9
    val inQuery = VectorOps.annIvfCore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(served == inQuery, "artifact probe must equal the in-query q45 core")
    val t2 = System.nanoTime()
    IvfIndex.probe(spark, dir, q).collect()
    val tWarm = (System.nanoTime() - t2) / 1e9
    info(f"build $tBuild%.2f s; probe cold $tCold%.2f s / warm $tWarm%.2f s " +
      "(training cost lives in build, not in any probe)")
    // the probe plan reads the partitioned assignments with a pruning
    // filter on the cell join key — no training stage, no Lloyd lineage
    val plan = IvfIndex.probe(spark, dir, q).queryExecution.executedPlan.toString
    assert(plan.contains("assignments"), "probe must scan the artifact")
    assert(!plan.toLowerCase.contains("posexplode"),
      "probe plan must not contain training stages")
  }

  test("q132 declared form: exact top-10 + green flags; identity-keyed artifact reused, not rebuilt") {
    val law = VectorOps.ivfIndexProbe(spark, sfDir).collect()
    assert(law.length == 10)
    assert(law.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      "recall_ok/score_ok must hold on the fixture")
    // a second invocation serves from the SAME artifact: identical rows,
    // and the _SUCCESS marker's mtime proves no rebuild happened
    val marker = VectorOps.ivfArtifactDir(sfDir)
      .resolve("assignments").resolve("_SUCCESS")
    val mtime = java.nio.file.Files.getLastModifiedTime(marker).toMillis
    val again = VectorOps.ivfIndexProbe(spark, sfDir).collect()
    assert(again.map(_.toSeq).toSeq == law.map(_.toSeq).toSeq)
    assert(java.nio.file.Files.getLastModifiedTime(marker).toMillis == mtime,
      "second probe must reuse the artifact, not rebuild it")
  }
}
