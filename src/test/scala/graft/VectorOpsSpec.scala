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

  test("int8 quantization: max recon error <= scale/2, saturation sane (q74)") {
    val rows = VectorOps.embeddingQuantize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val nSat = r.getLong(2)
      val err = r.getDouble(3)
      // floor(x/scale + 0.5) is within 0.5 quantization steps of x/scale,
      // so reconstruction error is bounded by scale/2 (plus 6dp rounding)
      assert(err <= scale / 2 + 1e-6,
        s"vec ${r.getLong(0)}: err $err > scale/2 ${scale / 2}")
      // the max-|x| element quantizes to exactly +-127 -> at least one
      // saturated element per vector; 64-dim -> never more than 64
      assert(nSat >= 1 && nSat <= 64, s"vec ${r.getLong(0)}: n_sat $nSat")
      assert(scale > 0)
    }
  }

  test("ANN LSH core: multi-probe results carry exact sims; declared law flags hold") {
    // recompute full brute-force table for sim lookup
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val all = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VectorExpressions.cosineSimilarity(col("embedding"), col("q_emb")), 4)
          .as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = VectorOps.annLshCore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(ann.nonEmpty, "ANN should return candidates from the probe ball")
    ann.foreach { case (id, sim) =>
      assert(all(id) == sim, s"ANN sim for $id diverges from brute force")
    }
    // deterministic across runs
    val again = VectorOps.annLshCore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(again.toSeq == ann.toSeq)
    // the declared law-flag frame: rows are the exact top-10, flags green
    val law = VectorOps.annLsh(spark, sfDir).collect()
    assert(law.length == 10)
    val exactTop = all.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
    assert(law.map(r => r.getLong(0) -> r.getDouble(1)).toSeq == exactTop,
      "law-frame rows must be the exact cosine top-10")
    assert(law.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      "recall_ok/score_ok must hold on the fixture")
  }

  test("q131/q132 degrade to empty reports on a query-only corpus (nothing to index)") {
    // vec_id 0 exists but the corpus behind it is empty: the artifact
    // builders would reject a 0-row training frame, so the declared
    // queries must degrade like q117/q45's cores do, not crash
    val dir = java.nio.file.Files.createTempDirectory("graft_qonly").toString
    Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Tables.documents(spark, sfDir).limit(0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(VectorOps.pqIndexProbe(spark, dir).collect().isEmpty)
    assert(VectorOps.ivfIndexProbe(spark, dir).collect().isEmpty)
  }

  test("ANN law flags are FALSIFIABLE: planted violations flip them") {
    import spark.implicits._
    // a law that cannot fail is decoration — plant each violation class
    // against a tiny exact table and pin the exact flag response
    val exact = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7), (4L, 0.6), (5L, 0.5),
      (6L, 0.45), (7L, 0.4), (8L, 0.35), (9L, 0.3), (10L, 0.25), (11L, 0.2))
      .toDF("vec_id", "sim")
    def law(ann: org.apache.spark.sql.DataFrame, minHits: Int) =
      VectorOps.annLawFrame(exact, "sim", asc = false, ann, minHits,
          // the flag-side scorer over the same tiny exact table — what
          // flagExactCosine/L2 do against the real corpus
          ids => exact.join(broadcast(ids), Seq("vec_id"))
            .select(col("vec_id"), col("sim").as("exact_score")))
        .select("recall_ok", "score_ok").head()
    val good = exact.filter(col("vec_id") <= 10)
    // truthful ANN answer: both flags green
    assert(law(good, 10) == org.apache.spark.sql.Row(true, true))
    // one corrupted score -> score_ok false (recall untouched)
    val corrupt = good.withColumn("sim",
      when(col("vec_id") === 3, lit(0.7001)).otherwise(col("sim")))
    assert(law(corrupt, 10) == org.apache.spark.sql.Row(true, false))
    // an id that does not exist in the corpus -> score_ok false, and the
    // phantom must not count toward recall
    val phantom = good.filter(col("vec_id") =!= 3)
      .unionByName(Seq((99L, 0.99)).toDF("vec_id", "sim"))
    assert(law(phantom, 10) == org.apache.spark.sql.Row(false, false))
    // honest but insufficient recall -> recall_ok false, score_ok true
    val shallow = exact.filter(col("vec_id") >= 6) // only 5 of the top 10
    assert(law(shallow, 10) == org.apache.spark.sql.Row(false, true))
    assert(law(shallow, 5) == org.apache.spark.sql.Row(true, true))
    // empty ANN answer: recall fails at any positive floor; score
    // vacuously holds (nothing reported, nothing wrong)
    assert(law(good.filter(col("vec_id") < 0), 1) ==
      org.apache.spark.sql.Row(false, true))
  }

  test("IVF probe returns the exact top-k of its probed cells; declared law flags hold") {
    val ivf = VectorOps.annIvfCore(spark, sfDir).collect()
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
    assert(VectorOps.annIvfCore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq == ivf.toSeq)
    // the declared law-flag frame: exact top-10 rows, green flags
    val law = VectorOps.annIvf(spark, sfDir).collect()
    assert(law.length == 10)
    assert(law.map(r => r.getLong(0) -> r.getDouble(1)).toSeq ==
      all.toSeq.sortBy { case (id, s) => (-s, id) }.take(10),
      "law-frame rows must be the exact cosine top-10")
    assert(law.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      "recall_ok/score_ok must hold on the fixture")
  }

  test("trained IVF codebook: label-free, recovers planted clusters, probe recall >= 0.9") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    // 8 well-separated clusters of 40 vectors each — NO label column, so
    // this also proves the codebook no longer depends on one existing
    val rnd = new scala.util.Random(19)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian().toFloat * 5f))
    val rows = for (c <- 0 until 8; j <- 0 until 40) yield {
      val v = centers(c).map(x => x + rnd.nextGaussian().toFloat * 0.3f)
      ((c * 40 + j + 1).toLong, v.toSeq)
    }
    val e = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val cb = VectorOps.ivfCodebook(e, k = 8, iters = 3)
    // a trained codebook with farthest-point seeds must keep all 8 cells
    // populated on this corpus (naive first-k-ids seeding collapses: ids
    // 1..8 all sit in cluster 0)
    val cellSizes = VectorOps.assignCells(e, cb)
      .groupBy(col("cell")).count().collect().map(_.getLong(1))
    assert(cellSizes.length == 8, s"expected 8 live cells, got ${cellSizes.length}")
    assert(cellSizes.forall(n => n >= 30 && n <= 50),
      s"cells should track the planted 40-vector clusters: ${cellSizes.toSeq}")
    // probe recall vs brute force, querying a member of one cluster
    val qe = e.filter(col("vec_id") === 1).select(col("embedding").as("q_emb"))
    def sims(df: DataFrame): DataFrame = df.crossJoin(broadcast(qe))
      .select(col("vec_id"),
        VectorExpressions.cosineSimilarity(col("embedding"), col("q_emb")).as("sim"))
    val brute = sims(e.filter(col("vec_id") =!= 1))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val bestCell = cb.crossJoin(broadcast(qe))
      .select(col("cell"),
        VectorExpressions.cosineSimilarity(col("centroid"), col("q_emb")).as("csim"))
      .orderBy(col("csim").desc, col("cell")).limit(1).select(col("cell"))
    val probed = sims(VectorOps.assignCells(e.filter(col("vec_id") =!= 1), cb)
        .join(broadcast(bestCell), "cell"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(probed).size / 10.0
    assert(recall >= 0.9, s"IVF probe recall $recall < 0.9 on planted clusters")
  }

  test("blocked embedding near-dup: sound vs exact, high recall on planted dups") {
    import spark.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // planted corpus: 60 random unit-ish vectors, each with 2 small
    // perturbations (cosine ~0.99 to its base) -> 180 known near-dup pairs
    // among mutually near-orthogonal random directions (64-dim)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).flatMap { g =>
      val base = Array.fill(64)(rnd.nextGaussian().toFloat)
      (0 until 3).map { c =>
        val v = base.map(x => x + (if (c == 0) 0f else rnd.nextGaussian().toFloat * 0.05f))
        ((g * 3 + c).toLong, v.toSeq)
      }
    }
    val e = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val exact = pairs(VectorOps.exactPairs(e, threshold = 0.5))
    val blocked = pairs(VectorOps.lshPairs(e, threshold = 0.5))
    assert(exact.size >= 170, s"expected ~180 planted pairs, got ${exact.size}")
    // soundness: every blocked pair is an exact pair with the identical sim
    blocked.foreach { case (ids, sim) =>
      assert(exact.get(ids).contains(sim),
        s"blocked pair $ids sim $sim not in exact result (${exact.get(ids)})")
    }
    // recall: collide prob for cosine s is 1-(1-p^4)^8 with p=1-acos(s)/pi,
    // ~0.998 at the planted s~0.99 -> demand >=0.95 overall
    val recall = blocked.size.toDouble / exact.size
    assert(recall >= 0.95, f"recall $recall%.3f below 0.95")
    // the real fixture (1 sparse pair at sf0.01, 0 at sf0.001): blocked
    // stays sound there too, and deterministic across runs. Compare against
    // the UNBOUNDED exact pairs with the derived declared-query shape
    val fixtureEmb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val fixtureExact = pairs(VectorOps.exactPairs(fixtureEmb, threshold = 0.5))
    val (db, dr) = graft.operators.AnnParams.bandedLsh(
      Tables.embeddings(spark, sfDir).count(), threshold = 0.5)
    val fixtureBlocked = pairs(VectorOps.lshPairs(fixtureEmb, 0.5, db, dr))
    fixtureBlocked.foreach { case (ids, sim) =>
      assert(fixtureExact.get(ids).contains(sim)) }
    assert(pairs(VectorOps.lshPairs(fixtureEmb, 0.5, db, dr)) == fixtureBlocked)
    // TRIPWIRE (round-8 advisor): q48's oracle asserts lsh_found = TRUE
    // for every exact pair of its DECLARED slice (and q93's asserts
    // cluster-set equality) — contracts that hold because measured LSH
    // recall over those slices is exactly 1.0 on the FROZEN fixtures
    // (bandedLsh targets 0.98; the full sf0.1 corpus at threshold 0.5
    // genuinely carries one missed pair OUTSIDE the slice — 13/14 —
    // which is the 0.98 target doing what it says). This pins the
    // slice-recall measurement at every fixture SF: if it fails after a
    // fixture regeneration, threshold tweak, or Spark hash-seed change,
    // the banding parameters (AnnParams.bandedLsh) are what moved — fix
    // THERE, instead of chasing an opaque driver hash mismatch on
    // q48/q93.
    // (sfDir itself is covered by the declared-q48 block just below —
    // no need to run the multi-second full-LSH query there twice)
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val declared = VectorOps.embeddingNeardupLsh(spark, sf).collect()
      val misses = declared.filterNot(_.getBoolean(3))
      assert(misses.isEmpty,
        s"$sf: q48's oracle asserts lsh_found=TRUE for every exact slice " +
          s"pair; missed ${misses.map(r => (r.getLong(0), r.getLong(1))).toSeq} " +
          "— the banding parameters (AnnParams.bandedLsh) are the first " +
          "suspect, not the oracle hash")
    }
    // declared q48 (law-flag form): rows are the exact slice pairs, and
    // every one the full-corpus LSH found carries lsh_found = TRUE
    val declared = VectorOps.embeddingNeardupLsh(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2), r.getBoolean(3)))
    assert(declared.map(d => d._1 -> d._2).toMap ==
      pairs(VectorOps.exactPairs(fixtureEmb.filter(col("vec_id") < 1000), 0.5)),
      "declared q48 rows must be the exact slice pairs")
    declared.foreach { case (ids, _, found) =>
      assert(found == fixtureBlocked.contains(ids),
        s"lsh_found for $ids must mirror the blocked pair set") }
  }

  test("hyperplane bands: fused one-pass eval == per-band hyperplaneEval for every band") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(23)
    for (len <- Seq(1, 64, 200); (bands, bits) <- Seq((1, 4), (8, 4), (65, 7), (208, 6))) {
      val v = Array.fill(len)(rnd.nextGaussian().toFloat)
      val ad = new GenericArrayData(v.map(x => x: Any))
      val fused = VectorExpressions.hyperplaneBandsEval(ad, bands, bits)
        .toIntArray()
      assert(fused.length == bands)
      for (b <- 0 until bands) {
        assert(fused(b) == VectorExpressions.hyperplaneEval(ad, bits, b * bits),
          s"len=$len bands=$bands bits=$bits band=$b")
      }
    }
  }

  test("hyperplane bucket: cached-plane eval is bit-identical to the definitional form") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // the definitional form, spelled out independently of the production
    // code: plane q's component i is Box–Muller over two counter-mode
    // XXH64 draws (seeds 2q and 2q+1), StrictMath transcendentals; the
    // production eval reads a per-JVM plane cache — buckets must be
    // bit-identical for every vector length and plane offset
    def naive(v: Array[Float], nBits: Int, planeOffset: Int): Int = {
      var bucket = 0
      for (p <- 0 until nBits) {
        val q = planeOffset + p
        var s = 0.0
        for (i <- v.indices) {
          val u1 = ((XXH64.hashLong(i.toLong, 2L * q) >>> 11) + 1).toDouble *
            1.1102230246251565e-16
          val u2 = (XXH64.hashLong(i.toLong, 2L * q + 1) >>> 11).toDouble *
            1.1102230246251565e-16
          val g = StrictMath.sqrt(-2.0 * StrictMath.log(u1)) *
            StrictMath.cos(2.0 * Math.PI * u2)
          s += g * v(i)
        }
        if (s > 0) bucket |= (1 << p)
      }
      bucket
    }
    val rnd = new scala.util.Random(11)
    for (len <- Seq(1, 63, 64, 65, 128, 200); trial <- 0 until 5) {
      val v = Array.fill(len)(rnd.nextGaussian().toFloat)
      val ad = new GenericArrayData(v.map(x => x: Any))
      for ((bits, off) <- Seq((8, 0), (8, 32), (12, 0), (4, 96))) {
        assert(VectorExpressions.hyperplaneEval(ad, bits, off)
          == naive(v, bits, off), s"len=$len bits=$bits off=$off")
      }
    }
    // fixed-vector golden: pins the plane derivation across refactors
    val fixed = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val fixedAd = new GenericArrayData(fixed.map(x => x: Any))
    val golden = VectorExpressions.hyperplaneEval(fixedAd, 8, 0)
    assert(golden == naive(fixed, 8, 0))
    assert(golden == 80, s"golden bucket drifted: $golden")
    // collision law the AnnParams derivation inverts: for Gaussian planes
    // sign-agreement of a pair at angle θ is exactly 1 − θ/π; check the
    // empirical rate over many planes for a known-angle pair (±3σ band)
    val a = Array.tabulate(64)(i => math.cos(i * 0.37).toFloat)
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val b0 = Array.tabulate(64)(i => math.sin(i * 0.59 + 1).toFloat)
    val aU = a.map(_ / na)
    val dotAb = aU.zip(b0).map { case (x, y) => x * y.toDouble }.sum
    val orth = b0.zip(aU).map { case (y, x) => y - (dotAb * x).toFloat }
    val no = math.sqrt(orth.map(x => x.toDouble * x).sum)
    val s0 = 0.5128
    val pair = aU.zip(orth).map { case (x, y) =>
      (s0 * x + math.sqrt(1 - s0 * s0) * y / no).toFloat }
    val adA = new GenericArrayData(aU.map(x => x.toFloat: Any))
    val adB = new GenericArrayData(pair.map(x => x: Any))
    val trials = 4000
    val agree = (0 until trials).count { q =>
      VectorExpressions.hyperplaneEval(adA, 1, q) ==
        VectorExpressions.hyperplaneEval(adB, 1, q)
    }.toDouble / trials
    val pTheory = 1.0 - math.acos(s0) / math.Pi
    val sigma = math.sqrt(pTheory * (1 - pTheory) / trials)
    assert(math.abs(agree - pTheory) <= 3 * sigma,
      f"sign-agreement $agree%.4f vs theory $pTheory%.4f (3σ=${3 * sigma}%.4f)")
  }

  test("semantic dedup clusters == driver-side union-find on the same pairs (q78)") {
    // independent ground truth: collect the exact pair list (308 nodes /
    // 56 components at sf0.001) and run a plain union-find in Scala
    val pairRows = VectorOps.exactPairs(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 1000),
      threshold = 0.35)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairRows.length > 100, s"fixture too sparse: ${pairRows.length} pairs")
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairRows.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairRows.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.map(n => (n, find(n))).sortBy(_._1).toSeq
    val got = VectorOps.semanticDedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    val nClusters = expected.map(_._2).distinct.size
    assert(nClusters > 1 && nClusters < nodes.length,
      s"degenerate fixture: $nClusters components over ${nodes.length} nodes")
    // star rounds are deterministic: a second run is identical
    assert(VectorOps.semanticDedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == got)
  }

  test("q46/q78 declared slice is audit-counted, never silent") {
    // at sf0.001 all 500 ids sit inside the vec_id<1000 slice; at sf0.1
    // half the corpus (ids 1000-1999) is beyond it — the audit count the
    // q46/q78 declarations log must report exactly that ignored volume.
    // (Dataset.observe was tried first and is structurally unreliable
    // here: AQE empty-relation propagation deletes the CollectMetrics
    // node from the final plan whenever q46 finds no pairs.)
    assert(VectorOps.declaredSliceOverflow(spark, sfDir) == (0L, 500L))
    assert(VectorOps.declaredSliceOverflow(spark, "/root/testdata/sf0.1")
      == (1000L, 2000L))
    // and the declarations go through the audited path without disturbing
    // results (q46's oracle-checked output is built on the same slice)
    assert(VectorOps.embeddingNeardup(spark, "/root/testdata/sf0.1").collect()
      .nonEmpty)
  }

  test("q93 LSH-sourced clusters == exact-sourced clusters on the full fixture") {
    // the un-silencing companion: the UNBOUNDED scale-path query must
    // reconstruct the same component structure the exact n² source gives
    // on the whole corpus (deterministic hashes -> a stable equality, not
    // a probabilistic bound; per-pair recall target is 0.99 and CC closes
    // over surviving redundant paths)
    val exact = GraphOps_cc(VectorOps.exactPairs(
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")),
      threshold = 0.35))
    val lsh = VectorOps.semanticDedupLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(lsh == exact,
      s"cluster sets differ: lsh=${lsh.size} rows, exact=${exact.size} rows")
    assert(exact.map(_._2).distinct.size > 1, "degenerate fixture")
  }

  private def GraphOps_cc(pairs: org.apache.spark.sql.DataFrame) =
    graft.operators.GraphOps.connectedComponents(pairs, "id_a", "id_b")
      .select(col("node").as("vec_id"), col("canon").as("canon_id"))
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("q92 centroid outliers: bounds, argmin agreement, label coverage") {
    val rows = VectorOps.centroidOutliers(spark, sfDir).collect()
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    assert(rows.map(_.getInt(0)).toSet == labels, "every label audited")
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_cos")
      val out = r.getAs[Double]("outlier_cos")
      assert(avg >= -1.0001 && avg <= 1.0001)
      assert(out <= avg + 1e-9, s"label ${r.getInt(0)}: outlier $out > avg $avg")
    }
    // argmin agreement with a driver-side brute force for one label
    import org.apache.spark.sql.functions.udaf
    val lbl = labels.min
    val vecSum = udaf(VectorSumAggregator)
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("label") === lbl)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
    val dim = vecs.head._2.length
    val cent = (0 until dim).map(i => vecs.map(_._2(i)).sum / vecs.length)
    def cos(x: Array[Double]) = {
      val dot = x.indices.map(i => x(i) * cent(i)).sum
      val nx = x.map(v => v * v).sum
      val nc = cent.map(v => v * v).sum
      if (nx > 0 && nc > 0) dot / math.sqrt(nx * nc) else 0.0
    }
    val brute = vecs.map { case (id, x) =>
      (BigDecimal(cos(x)).setScale(4, BigDecimal.RoundingMode.HALF_UP), id)
    }.min
    val got = rows.find(_.getInt(0) == lbl).get
    assert(got.getAs[Long]("outlier_vec_id") == brute._2,
      s"label $lbl argmin: op ${got.getAs[Long]("outlier_vec_id")} vs brute ${brute._2}")
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

  test("q117 PQ codebook: full sub-space coverage, valid shapes, deterministic") {
    val e = Tables.embeddings(spark, sfDir)
    val cb = VectorOps.pqCodebook(e, m = 8, dsub = 8, k = 16, iters = 2)
      .collect()
    // every sub-space trained; ≤ k cells each; every centroid dsub-wide
    val bySub = cb.groupBy(_.getInt(0))
    assert(bySub.keySet == (0 until 8).toSet)
    bySub.foreach { case (s, rows) =>
      assert(rows.length <= 16 && rows.nonEmpty, s"sub $s: ${rows.length} cells")
      rows.foreach(r => assert(r.getSeq[Float](2).length == 8))
      assert(rows.map(_.getInt(1)).distinct.length == rows.length,
        s"sub $s: duplicate cell ids")
    }
    val cb2 = VectorOps.pqCodebook(e.repartition(7), m = 8, dsub = 8, k = 16,
      iters = 2).collect()
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toList)
    assert(cb.map(keyOf).toSet == cb2.map(keyOf).toSet,
      "PQ training changed under re-partitioning")
  }

  test("q117 ADC + re-rank: recall >= 0.6 vs exact L2 top-10, map-only serving plan") {
    val e = Tables.embeddings(spark, sfDir)
    val out = VectorOps.pqAdcTopKOf(e, spark, memoKey = None)
    // serving scale law: shortlist + re-rank are both TakeOrderedAndProject
    // passes with NO shuffle anywhere — codes and distance table are plan
    // literals, so nothing joins, nothing exchanges
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"ADC shortlist is not a distributed top-k:\n$plan")
    assert(!plan.contains("Exchange"),
      s"PQ serving plan shuffles — the map-only law broke:\n$plan")
    val got = out.collect()
    assert(got.length == 10)
    // l2 column is the re-rank key and must be non-decreasing
    val l2s = got.map(_.getDouble(2)).toSeq
    assert(l2s == l2s.sorted, s"re-rank order broken: $l2s")
    // exact L2 top-10 (driver-side brute force over the fixture)
    val q = e.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val exact = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val d = v.indices.map(i => (v(i) - q(i)) * (v(i) - q(i))).sum
        (d, r.getLong(0))
      }.sortBy(identity).take(10).map(_._2).toSet
    val recall = got.map(_.getLong(0)).count(exact.contains) / 10.0
    assert(recall >= 0.6,
      s"PQ recall@10 $recall < 0.6 (got ${got.map(_.getLong(0)).toSeq})")
  }

  test("q118 IVFADC: planted clusters -> recall >= 0.9, pruned single-scan serving") {
    import spark.implicits._
    // 8 well-separated clusters of 40; vec_id 0 is a fresh query drawn
    // near cluster 5's center, so its true neighbors all live in one
    // planted cluster — the regime a coarse quantizer exists for
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian().toFloat * 5f))
    val rows = for (c <- 0 until 8; j <- 0 until 40) yield {
      val v = centers(c).map(x => x + rnd.nextGaussian().toFloat * 0.3f)
      ((c * 40 + j + 1).toLong, v.toSeq)
    }
    val q = centers(5).map(x => x + rnd.nextGaussian().toFloat * 0.3f)
    val e = ((0L, q.toSeq) +: rows).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val (cands, qv) = VectorOps.ivfAdcCandidates(e, spark, memoKey = None).get
    // the probe really prunes: candidates are a strict minority (n_probe
    // of ~√n cells), and the serving plan is ONE scan, zero exchanges
    val nCands = cands.count()
    assert(nCands > 0 && nCands <= 160,
      s"IVFADC probe scanned $nCands of 320 — not pruning")
    val plan = cands.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"IVFADC serving plan shuffles:\n$plan")
    // recall vs exact L2 top-10 (driver-side brute force)
    val exact = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val d = v.indices.map(i => (v(i) - qv(i)) * (v(i) - qv(i))).sum
        (d, r.getLong(0))
      }.sortBy(identity).take(10).map(_._2).toSet
    val got = VectorOps.rerank(cands, qv).collect()
    assert(got.length == 10)
    val recall = got.map(_.getLong(0)).count(exact.contains) / 10.0
    assert(recall >= 0.9,
      s"IVFADC recall@10 $recall < 0.9 on planted clusters " +
        s"(got ${got.map(_.getLong(0)).toSeq})")
    // residual-PQ ADC tracks true distance in-cell: every returned
    // row's ADC estimate is within 35% of its exact L2 (32-bit codes —
    // an estimate, not a bound; the exact re-rank absorbs the error)
    got.foreach { r =>
      val adc = r.getDouble(1); val l2 = r.getDouble(2)
      assert(math.abs(adc - l2) / l2 < 0.35,
        s"ADC estimate $adc far from exact $l2 for vec ${r.getLong(0)}")
    }
  }

  test("q122: batched top-5 == per-query brute force; frontier pruned map-side") {
    val out = graft.operators.VectorOps.batchCosineTopK(spark, sfDir)
    // map-side WindowGroupLimit below the exchange — the q94 law: each
    // partition forwards ≤ 5 rows per query before any shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
    assert(plan.contains("Partial"), s"no Partial (map-side) frontier:\n$plan")

    val rows = out.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val all = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val corpus = all.filter(_._1 >= 8)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0
      else BigDecimal(dot / (na * nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    all.filter(_._1 < 8).foreach { case (qid, qv) =>
      val expect = corpus.map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
        .zipWithIndex.map { case ((id, s), i) => (qid, i + 1, id, s) }.toSeq
      val got = rows.filter(_._1 == qid).sortBy(_._2).toSeq
      assert(got == expect, s"query $qid frontier mismatch: $got != $expect")
    }
  }

  test("q127: planted centroid geometry — identical 1.0, orthogonal 0.0, mixed exact") {
    import spark.implicits._
    // sA and sB hold identical vector sets (same centroid -> cos 1.0);
    // sC lives on an orthogonal axis (cos 0.0 vs both); sD is the 45°
    // diagonal (cos 1/√2 with sA and with sC)
    val docs = Seq(
      (1L, "sA"), (2L, "sA"), (3L, "sB"), (4L, "sB"),
      (5L, "sC"), (6L, "sD")).toDF("doc_id", "source")
    val embs = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(3f, 0f)),
      (3L, Seq(1f, 0f)), (4L, Seq(3f, 0f)),
      (5L, Seq(0f, 2f)),
      (6L, Seq(1f, 1f))).toDF("vec_id", "embedding")
    val out = VectorOps.sourceSemanticDistanceOf(docs, embs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("sA", "sB")) == 1.0)
    assert(out(("sA", "sC")) == 0.0 && out(("sB", "sC")) == 0.0)
    val inv = BigDecimal(1.0 / math.sqrt(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("sA", "sD")) == inv && out(("sC", "sD")) == inv)
    assert(out.size == 6, s"upper triangle of 4 sources is 6 pairs: $out")
  }
}
