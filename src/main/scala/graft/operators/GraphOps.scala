package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list, shared by
  * the dedup-cluster operators (q60 over text near-dup pairs, q78 over
  * embedding-similarity pairs).
  *
  * Algorithm: alternating large-star/small-star rounds (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond" — public MapReduce-model
  * algorithm):
  *
  *  - large-star: every node re-points its STRICTLY LARGER neighbors at the
  *    minimum of its closed neighborhood.
  *  - small-star: every node re-points its smaller neighbors (and itself)
  *    at its minimum neighbor.
  *
  * The edge set converges to disjoint stars rooted at component minima in
  * O(log n) rounds — vs O(component diameter) for plain min-label
  * propagation (the round-1 design, whose per-round driver `count()` job
  * over an ever-deeper plan was 33% of the whole bench). Each round here is
  * exactly ONE job: the round's edge set is a LAZY `localCheckpoint`
  * (plan truncation without a materializing job) and the exact
  * set-equality convergence probe is the action that materializes it
  * (round 14 fused the former separate eager-checkpoint + probe jobs —
  * guide §2.4, half the per-round fixed cost); the superseded round's
  * checkpoint storage is freed as soon as the convergence probe has
  * consumed it, so peak executor storage stays ~2×|E| instead of
  * rounds×|E|. No data ever
  * lands on the driver; every step is a shuffle the cluster absorbs at
  * any scale — the per-center neighborhood minima are `groupBy().min`
  * aggregates (map-side combinable, AQE-skew-safe), NOT window functions:
  * a `Window.partitionBy(center)` min has no partial aggregation and
  * would ship every edge of a high-degree hub (dedup graphs routinely
  * have near-clique boilerplate blocks) uncombined into one task.
  */
private[graft] object GraphOps {

  /** Component labels for every node that appears in an edge: returns
    * (node, canon) where canon is the component's minimum node id. Input
    * `pairs` must expose long-id columns `aCol`/`bCol`; orientation and
    * duplicate edges are normalized here. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String)
      : DataFrame =
    ccWithRounds(pairs, aCol, bCol)._1

  /** [[connectedComponents]] plus the number of star rounds it took —
    * exposed so `ScaleStressSpec` can MEASURE the O(log n) convergence
    * claim (a diameter-d chain must converge in ~log d rounds, where plain
    * min-label propagation needs d). */
  private[graft] def ccWithRounds(pairs: DataFrame, aCol: String,
      bCol: String): (DataFrame, Int) = {
    // canonical orientation: u > v (both star steps preserve it).
    // ONE materializing pass for the canonical edge set; the proper-edge
    // and self-node splits below are narrow filters over its cached
    // blocks, not their own checkpoints (round-14 optimization: the old
    // shape paid a second full materialization for `filter(u > v)`).
    val canon = pairs
      .select(greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .distinct()
      .localCheckpoint()
    // DEGENERATE pairs collapse to u == v under greatest/least: a
    // self-pair (x, x) directly, and a half-NULL pair (x, NULL) because
    // both functions skip NULLs. The star steps silently delete such
    // edges, so a node whose ONLY appearance is degenerate would vanish
    // from the output — violating the "labels for every node that
    // appears in an edge" contract (round-9 review). They are split off
    // here: the loop runs on proper edges only (also saving the
    // always-unconverged first round the self-loops caused), and any
    // self-only node re-enters at the end as its own singleton
    // component. Fully-NULL pairs name no node and are dropped.
    val selfNodes = canon
      .filter(col("u") === col("v") && col("u").isNotNull)
      .select(col("u").as("node"))
    var cur = canon.filter(col("u") > col("v"))
    // the checkpoint frame backing `cur`, for storage release (cur itself
    // is a narrow FILTER over it since the round-14 probe fusion below,
    // so unpersisting `cur` would find no LogicalRDD at the root)
    var curCk: DataFrame = canon
    var converged = false
    var round = 0
    val maxRounds = 25 // O(log n) bound; 2^25 nodes ≫ any input here
    while (!converged && round < maxRounds) {
      // ONE job AND one distinct-shaped exchange per round beyond the
      // star aggregations (round-14 optimization, guide §2.4): the
      // small-star output arrives here UN-deduplicated (see smallStar —
      // its final distinct moved into this probe), tagged 1, unioned
      // with the previous round's edge set tagged 2, and ONE
      // groupBy(u, v) pass computes BOTH the deduplicated next edge set
      // (`inN` rows) and the exact set-equality fixpoint verdict (no row
      // may be in one set only). That fused frame is a LAZY
      // localCheckpoint — the plan truncates to a LogicalRDD immediately
      // (star steps reference their input ~5×, so an untruncated chain
      // grows exponentially in rounds — a cache()-based variant of this
      // fusion OOMed on plan strings alone), and the convergence count
      // is the single action that materializes it; `next` is a narrow
      // filter over the same checkpoint, never its own job or storage.
      //
      // TWO alternation pairs per probe was re-tested in round 15 under
      // this fused shape (round-4 tried it pre-fusion; the round-14
      // verdict asked for a re-test) and measured NEGATIVE again —
      // q78 warm 3.3 s → 7.2 s, q93 5.9 → 7.9 at sf0.1/local[32]: the
      // probe's set equality is only observable on even pair counts, and
      // these dedup graphs converge in ~3–6 pairs, so the up-to-2-pair
      // overshoot (4 star exchanges each) plus the 2–3× duplicate growth
      // across an un-deduplicated double pair cost more than the saved
      // probes. Convergence-wise the variant was sound (S2 == S0 implies
      // a fixpoint — a non-fixpoint 2-cycle would contradict Kiveris et
      // al.'s any-start convergence); it is the constant factors that
      // kill it at real round counts.
      val tagged = smallStarRaw(largeStar(cur))
        .select(col("u"), col("v"), lit(1).as("s"))
        .union(cur.select(col("u"), col("v"), lit(2).as("s")))
      val roundCk = tagged.groupBy(col("u"), col("v"))
        .agg(max(when(col("s") === 1, 1)).as("inN"),
          max(when(col("s") === 2, 1)).as("inC"))
        .localCheckpoint(eager = false)
      converged = roundCk
        .filter(col("inN").isNull || col("inC").isNull)
        .count() == 0L
      // the convergence probe was this round's LAST read of the old
      // round's frame — free its checkpoint storage now rather than
      // waiting for nondeterministic driver GC + ContextCleaner (round-9
      // review: without this, a 10-round run holds ~10 materialized
      // edge-set copies in executor storage). The final round's
      // checkpoint is never freed here: the returned labels plan reads
      // it. Round 0's `curCk` is `canon` itself and is NEVER freed —
      // `selfNodes` in the returned plan still reads it after the loop.
      if (round > 0) unpersistCheckpoint(curCk)
      cur = roundCk.filter(col("inN") === 1).select(col("u"), col("v"))
      curCk = roundCk
      round += 1
    }
    require(converged,
      s"large-star/small-star did not converge in $maxRounds rounds — " +
        "impossible for graphs below 2^25 nodes; inputs are corrupt")
    // fixpoint = disjoint stars rooted at component minima: every non-root
    // node appears exactly once as u with its root as v; roots only as v.
    val labels = cur.select(col("u").as("node"), col("v").as("canon"))
      .union(cur.select(col("v").as("node"), col("v").as("canon"))
        .distinct())
    // self-only nodes (no proper edge) are their own components; a node
    // with both a self-pair and a proper edge already has a label
    val singletons = selfNodes
      .join(labels.select(col("node")), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("canon"))
    (labels.union(singletons), round)
  }

  /** Free the executor storage of a superseded `localCheckpoint` frame.
    * A checkpointed Dataset's plan is a `LogicalRDD` over the cached
    * RDD; `Dataset.unpersist()` only consults the cache manager and
    * leaves that RDD alone, so this goes to the RDD directly. No-op for
    * non-checkpoint plans. */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Large-star step: for each center, re-point strictly larger neighbors
    * at the min of the closed neighborhood. Emitted edges keep u > v.
    *
    * Shape: per-center minima as a map-side-combinable aggregate joined
    * back to the edges — for an input edge (u, v) (u > v always) the only
    * strictly-larger neighbor relation is "u is larger than center v", so
    * the emit is exactly {(u, m_v)} and only the v side needs the join.
    *
    * Emits duplicates (round-14, guide §2.4): the min aggregate and join
    * of the following small-star step are duplicate-insensitive and the
    * round's fused dedup+probe groupBy collapses the rest, so the old
    * per-step `.distinct()` exchange was a full extra shuffle per round
    * buying nothing. Output stays ≤ |e| rows (one per input edge). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy(col("u"))
      .agg(least(col("u"), min(col("v"))).as("m"))
    e.join(mins.select(col("u").as("v"), col("m")), "v")
      .select(col("u"), col("m").as("v"))
  }

  /** Small-star step: input edges are (u > v); for each center u, re-point
    * all smaller neighbors AND u itself at u's minimum neighbor. The
    * (center → min) re-point edges are `mins` itself — already one row per
    * center. Duplicate-tolerant on input (min/join are multiplicity-blind)
    * and emits duplicates: the caller's fused dedup+probe groupBy is the
    * one exchange that deduplicates the round (round-14, guide §2.4). */
  private def smallStarRaw(e: DataFrame): DataFrame = {
    // Round-15 also tried a fused-exchange variant here (repartition e by
    // u once; aggregate exchange-free over it and let the join reuse the
    // same exchange): job counts and wall time were UNCHANGED at
    // sf0.1/local[32] — AQE already materializes the aggregate's and the
    // join's independent exchanges in parallel, so the per-round critical
    // path never contained both. Kept in the simpler two-aggregate form.
    val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
    e.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
  }
}
