package graft

import graft.operators.CurationOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the corpus-governance operators (q94–q97) that the DuckDB
  * oracles cannot see: the salted-window equivalence under skew, split
  * stability under re-partitioning, and the spectrum's conservation
  * identities.
  */
class CurationOpsSpec extends SparkSpec {

  test("q94: cap is map-side pruned — Partial WindowGroupLimit sits BELOW the exchange") {
    import spark.implicits._
    // one hot source (Zipf head) + several small ones
    val docs = ((1L to 4000L).map(i => (i, "hot")) ++
      (4001L to 4400L).map(i => (i, s"cold${i % 7}"))).toDF("doc_id", "source")
    val cap = 50
    val out = CurationOps.sourceCapOf(docs, cap)
    // skew-safety evidence: InferWindowGroupLimit must keep each map
    // task's contribution to a hot source bounded at CAP before any
    // shuffle — if the rank predicate ever stops qualifying (e.g. a
    // non-row_number rank or a rewritten filter), the Partial node
    // vanishes and the hot key's reducer sees the full domain again
    val plan = out.queryExecution.executedPlan.toString
    val partialIdx = plan.indexOf("WindowGroupLimit")
    assert(partialIdx >= 0, s"no WindowGroupLimit in plan:\n$plan")
    assert(plan.contains("Partial"), s"no Partial (map-side) group limit:\n$plan")
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.count(_._1 == "hot") == cap)
    assert(rows.groupBy(_._1).values.forall(_.length <= cap))
    // survivor set for the hot source = the cap smallest (h, doc_id)
    val h = (id: Long) => (((id % 2147483648L) * 1103515245L + 12345L) % 1000000007L + 1000000007L) % 1000000007L
    val expectHot = (1L to 4000L).sortBy(id => (h(id), id)).take(cap).toSet
    assert(rows.filter(_._1 == "hot").map(_._2).toSet == expectHot)
  }

  test("q94: kept set is stable under input re-partitioning (hash priority, not arrival order)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = CurationOps.sourceCapOf(docs, cap = 20).collect().toSeq
    val b = CurationOps.sourceCapOf(docs.repartition(13).sortWithinPartitions(col("n_chars")), cap = 20)
      .collect().toSeq
    assert(a == b)
  }

  test("q95: top-3 per source; integer flag agrees with the 20% rate it encodes") {
    val out = CurationOps.boilerplateNgrams(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.values.forall(_.length <= 3))
    rows.foreach { r =>
      val df = r.getLong(2); val n = r.getLong(3)
      assert(r.getBoolean(5) == (df * 5 >= n))
      assert(math.abs(r.getDouble(4) - df.toDouble / n) < 5e-5)
    }
  }

  test("q96: assignment is a pure function of content — stable under re-partition + shares sum to 1") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = CurationOps.splitAssignOf(docs).collect().toSeq
    // same corpus, violently re-ordered and re-keyed upstream (doc_id
    // dropped entirely): assignment hashes content, so nothing may move
    val b = CurationOps.splitAssignOf(
      docs.drop("doc_id").repartition(17).sortWithinPartitions(col("n_chars")))
      .collect().toSeq
    assert(a == b)
    val perLang = a.groupBy(_.getString(1))
    perLang.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sum == rows.head.getLong(3))
      // train must dominate (the 90% bucket) at every lang at this SF
      val train = rows.find(_.getString(0) == "train").map(_.getLong(2)).getOrElse(0L)
      assert(train * 2 > rows.head.getLong(3), s"train share too small: $rows")
    }
  }

  test("q98: coreset == driver-side brute-force greedy; radii non-increasing; counts conserve") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val out = CurationOps.diversityCoresetOf(e, k = 8).collect()
    assert(out.length == 8)
    // brute-force replay with the same rounded-key selection rule
    val vecs = e.collect().map(r => (r.getLong(0),
      r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    def r4(x: Double): Double = math.round(x * 10000.0) / 10000.0
    var centers = Vector(vecs.head)
    var mind = vecs.map(v => d2(v._2, vecs.head._2))
    var expect = Vector[(Long, Option[Double])]((vecs.head._1, None))
    for (_ <- 2 to 8) {
      val pick = vecs.indices.minBy(i => (-r4(mind(i)), vecs(i)._1))
      expect :+= ((vecs(pick)._1, Some(r4(mind(pick)))))
      centers :+= vecs(pick)
      mind = vecs.indices.map(i =>
        math.min(mind(i), d2(vecs(i)._2, vecs(pick)._2))).toArray
    }
    assert(out.map(r => (r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toVector == expect)
    // greedy law: each step closes a smaller (or equal) gap
    val radii = out.drop(1).map(_.getDouble(2))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b })
    assert(out.map(_.getLong(3)).sum == e.count())
    assert(out.map(_.getLong(1)).distinct.length == 8)
  }

  test("q94 streaming twin: stateful admission cap == batch first-cap-by-arrival, state survives batches") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.DocArrival
    implicit val sc = spark.sqlContext
    val cap = 20
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
      .collect().map(r => DocArrival(r.getLong(0), r.getString(1)))
    // two micro-batches in doc_id order: per source, batch-1 ids < batch-2
    // ids, so "first cap arrivals" == "cap smallest doc_ids"
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[DocArrival]
    val (b1, b2) = docs.splitAt(docs.length / 2)
    mem.addData(b1.toSeq)
    mem.addData(b2.toSeq)
    val streamed = StreamingOps.runToMemory(
      StreamingOps.sourceCapStream(mem.toDS(), cap).toDF(), "sourcecap_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    val batch = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= cap)
      .select(col("source"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed == batch)
    // cap actually binds across the batch boundary: no source over cap,
    // and at least one source admitted rows from BOTH micro-batches
    val perSource = streamed.groupBy(_._1).view.mapValues(_.size)
    assert(perSource.values.forall(_ <= cap))
    val boundary = b1.map(_.doc_id).max
    assert(streamed.exists(_._2 > boundary) || docs.length / 2 >= cap * perSource.size,
      "second micro-batch never admitted — the state law went untested")
  }

  test("q99: the composed pipeline reads documents ONCE (no stage re-scans)") {
    val out = CurationOps.curationPipeline(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    val scans = "BatchScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected one documents scan, saw $scans:\n$plan")
    // the length-floor predicate must reach the parquet reader
    assert(plan.contains("GreaterThanOrEqual(n_chars,200)"),
      s"quality gate not pushed to scan:\n$plan")
    // all four stages live: output non-empty and train dominates
    val rows = out.collect()
    assert(rows.nonEmpty)
    val bySplit = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("valid", 0L))
  }

  test("q100: diff statuses partition both snapshots; every planted class is live") {
    val out = CurationOps.snapshotDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val removed = docs.filter(col("doc_id") % 89 === 0).count()
    val added = docs.filter(col("doc_id") % 101 === 0).count()
    val changed = docs.filter(col("doc_id") % 89 =!= 0 &&
      col("doc_id") % 97 === 0).count()
    // v1 rows partition into unchanged/changed/removed; added is disjoint
    assert(out.getOrElse("removed", 0L) == removed)
    assert(out.getOrElse("added", 0L) == added)
    assert(out.getOrElse("changed", 0L) == changed)
    assert(out.getOrElse("unchanged", 0L) == n - removed - changed)
    // non-vacuity: the fixture plants all four classes
    assert(Seq("added", "removed", "changed", "unchanged")
      .forall(s => out.getOrElse(s, 0L) > 0), s"dead status class: $out")
  }

  test("q101: BPE merge semantics — greedy-left, consecutive merges, merged-symbol reuse") {
    import spark.implicits._
    // hand-traceable micro-corpus:
    //   round 1: pairs (a,a)=6 [aaa x3, LEFT-first], (a,b)=4, (b,a)=2 → (a,a)
    //            'aaa' must become (aa, a), NOT (a, aa)
    //   round 2: (a,b)=4 [abab x2 BOTH occurrences], (aa,a)=3 → (a,b)
    //   round 3: (aa,a)=3 vs (ab,ab)=2 → (aa,a) — merged symbols as units
    val wf = Seq(("abab", 2L), ("aaa", 3L)).toDF("word", "freq")
    val out = CurationOps.bpeMergesOf(wf, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "a", "a", 6L),
      (2L, "a", "b", 4L),
      (3L, "aa", "a", 3L)))
  }

  test("q101: engine BPE == plain-Scala reference trainer on random corpora (incl. degenerate)") {
    import spark.implicits._
    // reference trainer over symbol LISTS — no string encoding at all, so
    // a delimiter-handling bug in the engine's replace-based merge cannot
    // be mirrored here
    def reference(words: Seq[(String, Long)], rounds: Int)
        : Seq[(String, String, Long)] = {
      var states = words.map { case (w, f) => (w.split("").toVector, f) }
      (1 to rounds).iterator.map { _ =>
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- states; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
        if (counts.isEmpty) None
        else {
          val ((l, r), cnt) = counts.minBy { case ((a, b), c) => (-c, s"$a $b") }
          states = states.map { case (syms, f) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += (l + r); i += 2 // greedy-left, non-overlapping
              } else { out += syms(i); i += 1 }
            }
            (out.result(), f)
          }
          Some((l, r, cnt))
        }
      }.takeWhile(_.isDefined).flatten.toSeq
    }
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val n = 3 + rng.nextInt(5)
      val words = (1 to n).map { _ =>
        val len = 1 + rng.nextInt(7) // len-1 words make degenerate corpora
        (Seq.fill(len)(('a' + rng.nextInt(3)).toChar).mkString,
          1L + rng.nextInt(5))
      }.distinct
      val engine = CurationOps.bpeMergesOf(words.toDF("word", "freq"), rounds = 3)
        .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      val expect = reference(words, rounds = 3)
      assert(engine == expect, s"trial $trial corpus $words")
    }
  }

  test("q102: compression ledger bounds — words <= bpe tokens < chars, ratios consistent") {
    val r = CurationOps.bpeApply(spark, sfDir).collect()(0)
    val (nWords, ws, bpe, chars) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(ws <= bpe, "a word is at least one token")
    assert(bpe < chars, "10 merges must compress below character count")
    assert(nWords > 0 && ws > 0)
    assert(math.abs(r.getDouble(4) - bpe.toDouble / ws) < 5e-5)
    assert(math.abs(r.getDouble(5) - chars.toDouble / bpe) < 5e-5)
  }

  test("q100 streaming twin: CDC change screen over two snapshots == batch diff's added+changed") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.DocVersion
    implicit val sc = spark.sqlContext
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // v1 and v2 exactly as q100 plants them, fed as two micro-batches
    val v1 = docs.select(col("doc_id"), md5(col("text")).as("h"))
      .collect().map(r => DocVersion(r.getLong(0), 1L, r.getString(1)))
    val v2 = docs.filter(col("doc_id") % 89 =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 97 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text"))).as("h"))
      .unionAll(docs.filter(col("doc_id") % 101 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), md5(col("text")).as("h")))
      .collect().map(r => DocVersion(r.getLong(0), 2L, r.getString(1)))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[DocVersion]
    // two REAL micro-batches: v2 only becomes available after v1's batch
    // is fully processed (a single addData-then-start would coalesce both
    // into one batch and no group would ever see prior state)
    val q = StreamingOps.changeScreenStream(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("changescreen_test")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    val streamed = try {
      mem.addData(v1.toSeq)
      q.processAllAvailable()
      mem.addData(v2.toSeq)
      q.processAllAvailable()
      spark.table("changescreen_test")
        .collect().map(r => (r.getLong(0), r.getString(1)))
    } finally q.stop()
    // batch truth from q100's classification (removal is batch-only)
    val batch = CurationOps.snapshotDiff(spark, sfDir)
    // batch-1 emissions: every v1 doc is 'added'; batch-2: q100's
    // changed set plus the planted re-crawl ids as 'added'
    val expectAdded = v1.map(_.doc_id).toSet ++
      docs.filter(col("doc_id") % 101 === 0)
        .collect().map(_.getLong(0) + 1000000L).toSet
    val expectChanged = docs
      .filter(col("doc_id") % 89 =!= 0 && col("doc_id") % 97 === 0)
      .collect().map(_.getLong(0)).toSet
    assert(streamed.filter(_._2 == "added").map(_._1).toSet == expectAdded)
    assert(streamed.filter(_._2 == "changed").map(_._1).toSet == expectChanged)
    // cardinalities agree with the declared q100 rollup where comparable
    val counts = batch.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed.count(_._2 == "changed") == counts("changed"))
    assert(streamed.count(_._2 == "added").toLong ==
      counts("added") + v1.length)
  }

  test("CDC screen: multi-version doc in ONE batch folds to max-seq hash deterministically") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.DocVersion
    implicit val sc = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[DocVersion]
    // seq 3 delivered BEFORE seq 1/2 in the same batch — fold must pick
    // seq 3's hash regardless of iterator order, so the later re-delivery
    // of hash "c" is suppressed (state already holds it)
    val q = StreamingOps.changeScreenStream(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("changescreen_seq_test")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    val out = try {
      mem.addData(Seq(DocVersion(7L, 3L, "c"), DocVersion(7L, 1L, "a"),
        DocVersion(7L, 2L, "b")))
      q.processAllAvailable()
      mem.addData(Seq(DocVersion(7L, 4L, "c")))
      q.processAllAvailable()
      spark.table("changescreen_seq_test")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    } finally q.stop()
    assert(out == Seq((7L, "added")),
      "net state must be the max-seq hash: re-delivery of 'c' is suppressed")
  }

  test("CDC screen: stale lower-seq redelivery in a LATER batch is dropped, not applied") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.DocVersion
    implicit val sc = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[DocVersion]
    val q = StreamingOps.changeScreenStream(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("changescreen_stale_test")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    val out = try {
      mem.addData(Seq(DocVersion(9L, 2L, "b")))
      q.processAllAvailable()
      // cross-partition sources reorder across batches: the OLD seq-1
      // version and an old tombstone arrive after seq 2 was applied —
      // both must be dropped (no spurious changed/removed, no state
      // regression), and a genuinely newer version still lands
      mem.addData(Seq(DocVersion(9L, 1L, "a")))
      q.processAllAvailable()
      mem.addData(Seq(DocVersion(9L, 1L, "", tombstone = true)))
      q.processAllAvailable()
      mem.addData(Seq(DocVersion(9L, 3L, "c")))
      q.processAllAvailable()
      spark.table("changescreen_stale_test")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    } finally q.stop()
    assert(out == Seq((9L, "added"), (9L, "changed")),
      s"stale redeliveries must be no-ops: $out")
  }

  test("CDC screen: tombstone marker rejects stale pre-tombstone redeliveries (round-9 advisor)") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.DocVersion
    implicit val sc = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[DocVersion]
    val q = StreamingOps.changeScreenStream(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("changescreen_marker_test")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    val out = try {
      mem.addData(Seq(DocVersion(9L, 2L, "b")))
      q.processAllAvailable()
      mem.addData(Seq(DocVersion(9L, 3L, "", tombstone = true)))
      q.processAllAvailable()
      // the round-9 advisor's scenario: a stale PRE-tombstone version
      // redelivered AFTER the removal — the seq-only marker must
      // reject it instead of resurrecting a spurious 'added'
      mem.addData(Seq(DocVersion(9L, 1L, "a")))
      q.processAllAvailable()
      // a tombstone for a NEVER-admitted key also stores a marker
      // (reordering can deliver the delete before its version), so the
      // late pre-tombstone version stays out too
      mem.addData(Seq(DocVersion(11L, 5L, "", tombstone = true)))
      q.processAllAvailable()
      mem.addData(Seq(DocVersion(11L, 4L, "x")))
      q.processAllAvailable()
      // a genuinely NEWER version after the tombstone is re-admitted
      mem.addData(Seq(DocVersion(9L, 4L, "c")))
      q.processAllAvailable()
      spark.table("changescreen_marker_test")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    } finally q.stop()
    assert(out == Seq((9L, "added"), (9L, "removed"), (9L, "added")),
      s"marker must reject stale redeliveries (9/seq1, 11/seq4) and " +
        s"admit the newer 9/seq4: $out")
  }

  test("CDC screen: armed retention expires markers, bounding state (post-retention resurrection re-admitted)") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.DocVersion
    implicit val sc = spark.sqlContext
    // Under parallel-suite IO load the auto-provisioned temp checkpoint's
    // rename can fail (ChecksumCheckpointFileManager.renameTempFile),
    // killing the query — the old form then polled a DEAD query for 30 s
    // and failed with a bare row-count mismatch (round-13 verdict).
    // Hardened three ways: an ISOLATED explicit checkpoint dir per
    // attempt, awaitRows surfaces q.exception the moment the engine
    // dies instead of timing out silently, and an engine death retries
    // ONCE on a fresh stream + checkpoint (a logic mismatch — a plain
    // assertion failure — never retries).
    def attempt(tag: Int): Unit = {
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[DocVersion]
      val name = s"changescreen_expiry_test_$tag"
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_expiry_ckpt_$tag").toString
      // ProcessingTimeTimeout makes the engine run no-data batches
      // continuously (shouldRunAnotherBatch == true), so this test drives
      // by POLLING the sink, never processAllAvailable (which would wait
      // forever for quiescence); a real trigger interval keeps the loop
      // from busy-spinning
      val q = StreamingOps.changeScreenStream(mem.toDS(),
          tombstoneRetentionMs = Some(1L)).toDF()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime("25 milliseconds"))
        .start()
      def rows() = spark.table(name)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      def awaitRows(n: Int): Seq[(Long, String)] = {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var r = rows()
        while (r.size < n && q.exception.isEmpty &&
            System.nanoTime() < deadline) {
          Thread.sleep(25); r = rows()
        }
        q.exception.foreach(e => throw e) // the real cause, not a timeout
        r
      }
      try {
        mem.addData(Seq(DocVersion(9L, 2L, "b")))
        awaitRows(1)
        mem.addData(Seq(DocVersion(9L, 3L, "", tombstone = true)))
        assert(awaitRows(2) == Seq((9L, "added"), (9L, "removed")))
        // the 1 ms retention has long passed after a few trigger cycles:
        // the marker is freed, so even a STALE pre-tombstone version is
        // re-admitted — the documented bounded guarantee, exactly a
        // compacted topic past delete.retention.ms
        Thread.sleep(200)
        mem.addData(Seq(DocVersion(9L, 1L, "a")))
        assert(awaitRows(3) == Seq((9L, "added"), (9L, "removed"),
          (9L, "added")),
          "post-retention resurrection must be re-admitted (marker freed)")
      } finally q.stop()
    }
    try attempt(1)
    catch {
      case e: org.apache.spark.sql.streaming.StreamingQueryException =>
        info(s"attempt 1 died in the engine (${
          String.valueOf(e.getMessage).take(160)}) — retrying once on a " +
          "fresh checkpoint")
        attempt(2)
    }
  }

  test("q103: epoch shuffle is a permutation — unique (shard,pos), contiguous positions, doc set preserved") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = CurationOps.epochShuffleOf(docs, epoch = 1, shards = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == docs.count())
    assert(out.map(t => (t._2, t._3)).distinct.length == out.length,
      "(shard, pos) must be unique — it is a file offset")
    assert(out.forall(t => t._2 >= 0 && t._2 < 16))
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        "in-shard positions must be contiguous from 1")
    }
    assert(out.map(_._1).toSet ==
      docs.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("q103: changing the epoch re-deals; re-partitioning does not") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val e1 = CurationOps.epochShuffleOf(docs, epoch = 1, shards = 16).collect().toSeq
    val e2 = CurationOps.epochShuffleOf(docs, epoch = 2, shards = 16).collect().toSeq
    assert(e1.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet !=
      e2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      "a new epoch must deal a different order")
    val shuffled = CurationOps.epochShuffleOf(
      docs.repartition(13).sortWithinPartitions(col("n_chars")),
      epoch = 1, shards = 16).collect().toSeq
    assert(e1 == shuffled, "order is a pure function of (epoch, doc_id)")
  }

  test("q104: MAD fence catches outliers that MASK a mean+3sd fence") {
    import spark.implicits._
    // 17 docs near 100 chars + 3 concatenation-bug docs at 10k: the
    // outliers inflate sd enough to hide themselves (mean+3sd ≈ 12.5k)
    val lens = Seq.tabulate(17)(i => 95L + i) ++ Seq(10000L, 10000L, 10000L)
    val docs = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, "xx", n) }
      .toDF("doc_id", "lang", "n_chars")
    val out = CurationOps.outlierMadOf(docs).collect()
    assert(out.length == 1)
    assert(out.head.getLong(4) == 3, "MAD fence must flag exactly the planted 3")
    // the masking fact the operator exists for: classic mean+3sd flags NONE
    val stats = docs.agg(avg(col("n_chars")), stddev(col("n_chars"))).head()
    val fence = stats.getDouble(0) + 3 * stats.getDouble(1)
    assert(lens.count(_ > fence) == 0, "mean+3sd must be masked on this data")
  }

  test("q104: fixture run — rates in [0,1], outliers consistent with reported fence") {
    val out = CurationOps.outlierMad(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val rate = r.getDouble(5)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getLong(4) <= r.getLong(1))
    }
  }

  test("q106: planted overlap — exact Jaccard, zero pairs present, within-source dups don't inflate") {
    import spark.implicits._
    val docs = Seq(
      ("A", "t1"), ("A", "t1"), ("A", "t2"), ("A", "t3"),
      ("B", "t2"), ("B", "t3"), ("B", "t4"), ("B", "t5"),
      ("C", "t9"))
      .toDF("source", "text")
    val out = CurationOps.sourceOverlapOf(docs)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")),
      "full grid including zero-overlap pairs")
    assert(out(("A", "B")) == ((3L, 4L, 2L, 0.4)),
      "A∩B = {t2,t3}, |A∪B| = 5; the duplicate t1 row must not inflate nh_a")
    assert(out(("A", "C"))._3 == 0L && out(("A", "C"))._4 == 0.0)
    assert(out(("B", "C"))._3 == 0L)
  }

  test("q108: drift totals reconcile with q100's diff classes; shares sum to 1") {
    val drift = CurationOps.snapshotDrift(spark, sfDir).collect()
    val diff = CurationOps.snapshotDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val v1Total = drift.map(_.getLong(1)).sum
    val v2Total = drift.map(_.getLong(2)).sum
    // same planted v2 in both queries: doc-count movement must agree
    assert(v2Total - v1Total ==
      diff.getOrElse("added", 0L) - diff.getOrElse("removed", 0L),
      s"drift v1=$v1Total v2=$v2Total vs diff=$diff")
    assert(math.abs(drift.map(_.getDouble(7)).sum - 1.0) < 1e-3)
    assert(math.abs(drift.map(_.getDouble(8)).sum - 1.0) < 1e-3)
    drift.foreach { r =>
      assert(r.getLong(5) == r.getLong(2) - r.getLong(1))
      assert(r.getLong(6) == r.getLong(4) - r.getLong(3))
    }
  }

  test("q110: work set == q100's added+changed classes exactly; splits partition it") {
    val inc = CurationOps.incrementalPipeline(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val diff = CurationOps.snapshotDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(inc.keySet == Set("added", "changed"))
    assert(inc("added")._1 == diff("added"),
      "incremental work set must contain exactly the diff's added docs")
    assert(inc("changed")._1 == diff("changed"),
      "incremental work set must contain exactly the diff's changed docs")
    inc.values.foreach { case (n, tr, va, te) => assert(tr + va + te == n) }
  }

  test("q111: KS statistic exact on planted shifts; identical samples score zero") {
    import spark.implicits._
    // disjoint shift: A uniform on 1..100, B uniform on 101..200 -> D = 1
    val a = (1L to 100L).toDF("len")
    val b = (101L to 200L).toDF("len")
    val shifted = CurationOps.lengthDriftKsOf(a, b).head()
    assert(shifted.getDouble(4) == 1.0 && shifted.getBoolean(5))
    // half-overlap: A on 1..100, B on 51..150 -> D = 0.5 at len 100
    val c = (51L to 150L).toDF("len")
    val half = CurationOps.lengthDriftKsOf(a, c).head()
    assert(half.getDouble(4) == 0.5)
    assert(half.getLong(3) == 50L,
      "the 0.5 gap plateaus over len 50..100; ties break to the smallest")
    assert(half.getBoolean(5), "D=0.5 at n=100 clears the 0.05 critical value")
    // identical samples: D = 0, no rejection
    val same = CurationOps.lengthDriftKsOf(a, a.select(col("len"))).head()
    assert(same.getLong(2) == 0L && same.getDouble(4) == 0.0 && !same.getBoolean(5))
  }

  test("q113: restricted set is the union of marker sets; totals match the planted mods") {
    val out = CurationOps.licenseScreen(spark, sfDir).collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    // planted ground truth straight from the mod rules
    val expectNc = docs.count(_ % 41 == 0).toLong
    val expectArr = docs.count(_ % 43 == 0).toLong
    val expectNoai = docs.count(_ % 47 == 0).toLong
    val expectAny = docs.count(d => d % 41 == 0 || d % 43 == 0 || d % 47 == 0).toLong
    assert(out.map(_.getLong(2)).sum == expectNc)
    assert(out.map(_.getLong(3)).sum == expectArr)
    assert(out.map(_.getLong(4)).sum == expectNoai)
    assert(out.map(_.getLong(5)).sum == expectAny,
      "a multi-marker doc must count once in n_restricted")
    out.foreach { r =>
      assert(r.getLong(5) <= r.getLong(2) + r.getLong(3) + r.getLong(4))
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
    }
  }

  test("q97: conservation — sum(freq*n_types) == corpus tokens, sum(n_types) == vocab") {
    val sp = CurationOps.tokenFreqSpectrum(spark, sfDir).collect()
    val tokens = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .count()
    val vocab = sp.head.getLong(2)
    assert(sp.map(r => r.getLong(0) * r.getLong(1)).sum == tokens)
    assert(sp.map(_.getLong(1)).sum == vocab)
    assert(sp.forall(r => r.getLong(2) == vocab))
  }

  test("q116: A-Res draw is a distributed top-k (no global sort), is " +
      "length-biased, and is invariant under re-partitioning") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val out = CurationOps.weightedSampleOf(docs, k = 100)
    // scale law: the selection must be TakeOrderedAndProject — per-
    // partition top-k + k-row merge, never a full Sort+Exchange of the
    // corpus (the property that lets this run in one pass at 100 TB)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"A-Res selection is not a distributed top-k:\n$plan")
    val rows = out.collect()
    assert(rows.length == 100)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 100), "ranks are 1..k dense")
    // weighting really biases the draw: expected inclusion is ∝ n_chars
    // (approximately, at k << n), so the sample must be longer-doc-heavy
    // than a uniform draw by a visible margin on this fixture
    val sampleMean = rows.map(_.getLong(4)).sum.toDouble / rows.length
    val corpusMean = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampleMean > corpusMean * 1.05,
      s"A-Res sample mean $sampleMean not length-biased vs corpus $corpusMean")
    // merge-associativity in practice: the draw is a pure per-row key +
    // global top-k, so partitioning must not change the selection
    val reparted = CurationOps.weightedSampleOf(docs.repartition(13), k = 100)
      .collect()
    assert(reparted.map(_.getLong(1)).toSeq == rows.map(_.getLong(1)).toSeq,
      "sample changed under re-partitioning")
    // without-replacement: all doc_ids distinct
    assert(rows.map(_.getLong(1)).distinct.length == 100)
  }

  test("q121: exact counts replay planted snapshot sets; sketch estimate in tolerance") {
    import spark.implicits._
    // source sA: ids 1,2,3 (none hits the %89/%97/%101 rules) -> v2 == v1
    // except id 97*1? keep ids small so snapshot rules are inert; plant a
    // %97 rewrite via id 97 and a %89 removal via id 89 in source sB
    val docs = (Seq(
      (1L, "sA", "alpha"), (2L, "sA", "beta"), (3L, "sA", "alpha"),
      (89L, "sB", "gone in v2"), (97L, "sB", "rewritten"),
      (5L, "sB", "stable")
    ) ++ (0 until 2000).map(i => (200L + i, "sC", s"doc body $i")))
      .toDF("doc_id", "source", "text")
    val out = CurationOps.sketchDistinctOf(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    // sA: v1 {alpha,beta}=2, v2 same docs -> 2, union 2
    assert(out("sA") == ((2L, 2L, 2L, true)), s"sA wrong: ${out("sA")}")
    // sB: v1 {gone,rewritten,stable}=3; v2 drops 89, rewrites 97 ->
    // {rewritten rev2, stable}=2; union = 4 distinct contents
    assert(out("sB") == ((3L, 2L, 4L, true)), s"sB wrong: ${out("sB")}")
    // sC: 2000 distinct contents, none hit the mod rules except %89/%97/
    // %101 multiples inside 200..2199 — recompute exactly
    val ids = (0 until 2000).map(i => 200L + i)
    val v1C = ids.map(i => s"doc body ${i - 200}").toSet
    val v2C = ids.filter(_ % 89 != 0).map(i =>
      if (i % 97 == 0) s"doc body ${i - 200} rev2" else s"doc body ${i - 200}")
      .toSet ++ ids.filter(_ % 101 == 0).map(i => s"doc body ${i - 200}")
    val (n1, n2, nu) = (v1C.size.toLong, v2C.size.toLong, (v1C ++ v2C).size.toLong)
    assert(out("sC") == ((n1, n2, nu, true)), s"sC wrong: ${out("sC")} != ${(n1, n2, nu)}")
    // tolerance flag is the sketch-path assertion: at 2k+ cardinality the
    // HLL union estimate stayed within 5% of the exact union
    assert(out.values.forall(_._4), "sketch estimate drifted out of tolerance")
  }
}
