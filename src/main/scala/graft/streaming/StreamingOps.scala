package graft.streaming

import graft.functions.TextExpressions
import graft.functions.Rounding.roundVal
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming embodiments of the event-time operators (SURVEY.md
  * §2.3 E16/E17 streaming semantics; the batch twins live in
  * `operators.EventOps`). All transforms are source-agnostic — they take a
  * (possibly streaming) DataFrame with `(ts TIMESTAMP, user_id LONG,
  * event_type STRING, value DOUBLE, event_id LONG)` and work identically
  * when the input is a batch frame, which is exactly how `StreamingSpec`
  * cross-checks them.
  *
  * Scale notes: watermarks bound state; tumbling agg state is per-window
  * per-key and dropped past the watermark; `session_window` merges gap
  * sessions with state cleanup; `mapGroupsWithState` keeps O(1) state per
  * user.
  */
object StreamingOps {

  /** Tumbling 1-hour counts with a 2-hour watermark (E16). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        roundVal(sum(col("value")), 2).as("sum_value"))
      .select(unix_millis(col("window.start")).as("win_start"),
        col("n_events"), col("sum_value"))

  /** Sliding 1-hour windows every 30 minutes with a 2-hour watermark (the
    * streaming twin of batch q22 — E16's sliding variant). Each event lands
    * in two overlapping windows; state is per-(window) and dropped once the
    * watermark passes the window end, so overlap multiplies state by
    * window/slide (2×), not unboundedly. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        roundVal(sum(col("value")), 2).as("sum_value"))
      .select(unix_millis(col("window.start")).as("win_start"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessions via the native `session_window` operator (E17):
    * 30-minute gap, per user — ONE stateful aggregation, so the transform
    * is legal as an actual streaming query (Spark rejects a second
    * non-windowed aggregation chained after a session-window agg in
    * streaming mode; per-user rollups of the emitted sessions belong
    * downstream). In batch mode the per-user rollup of this output must
    * agree with the lag+cumsum formulation of `EventOps.sessionize` —
    * asserted in `StreamingSpec`. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("sess_events"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("sess_start"),
        col("sess_events"))

  /** Watermarked stream–stream interval join: attribute each click to the
    * same user's view events in the preceding hour. This is the one join
    * shape where BOTH sides are unbounded, and it is only legal (and only
    * bounded) because (a) both sides carry a watermark and (b) the join
    * condition constrains the two event times to a finite interval — Spark
    * derives from the pair exactly how long a buffered row can still find a
    * match and evicts it afterwards, so per-side state is O(arrival rate ×
    * interval), independent of stream age. Both inputs keyed on `user_id`:
    * the join is a state-store equi-join on the key, with the interval as a
    * post-filter — no cross-stream broadcast, no unbounded buffer. Works
    * identically on batch frames (an equi+range join), which is how
    * `StreamingSpec` cross-checks it. */
  def viewClickJoin(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val c = clicks.withWatermark("ts", "2 hours")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    v.join(c,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"),
        col("view_id"), col("click_id"),
        unix_millis(col("view_ts")).as("view_ms"),
        unix_millis(col("click_ts")).as("click_ms"))
  }

  /** Streaming exact dedup (north-star dedup, unbounded form):
    * `dropDuplicatesWithinWatermark` on the event key — unlike plain
    * `dropDuplicates("event_id")` (whose state NEVER evicts when the
    * event-time column isn't part of the key), this operator expires each
    * key's state once the watermark passes its event time, so state stays
    * bounded on an unbounded stream. Duplicates re-delivered within the
    * 2-hour watermark are deduped; rows older than the watermark are
    * dropped as late data. Batch twin: plain `dropDuplicates`. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  final case class DocArrival(doc_id: Long, source: String)
  final case class CapState(admitted: Long)
  final case class AdmittedDoc(source: String, doc_id: Long)

  /** Streaming twin of q94's per-source cap, as ADMISSION CONTROL: a
    * stream cannot rank by global hash priority (ranking needs the whole
    * corpus), so the streaming semantics are "first CAP arrivals per
    * source win" — the ingest-quota rule a crawl frontier actually
    * enforces online. `flatMapGroupsWithState` keeps ONE long per source
    * (admitted-so-far); each micro-batch admits in doc_id order (the
    * iterator's order is not contractual, so sorting the micro-batch
    * group makes replays deterministic) and emits only admitted docs.
    * Once a source hits its cap the state stops growing and later
    * arrivals are dropped at the group head — O(#sources) total state,
    * forever. `StreamingSpec` proves stream==batch: fed doc_id-ordered
    * micro-batches, the admitted set equals the batch
    * `row_number over (source ORDER BY doc_id) ≤ cap`. */
  def sourceCapStream(docs: Dataset[DocArrival], cap: Int): Dataset[AdmittedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[CapState, AdmittedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[DocArrival], state: GroupState[CapState]) =>
          val prev = state.getOption.map(_.admitted).getOrElse(0L)
          val room = math.max(0L, cap - prev).toInt
          val admitted =
            if (room == 0) Seq.empty
            else rows.toSeq.sortBy(_.doc_id).take(room)
          if (admitted.nonEmpty) state.update(CapState(prev + admitted.length))
          admitted.iterator.map(d => AdmittedDoc(source, d.doc_id))
      }
  }

  final case class WeightedArrival(bucket: Int, doc_id: Long, rkey: Double)
  final case class ReservoirEntry(rkey: Double, doc_id: Long)
  final case class ReservoirState(seq: Long, entries: List[ReservoirEntry])
  final case class ReservoirSnapshot(bucket: Int, seq: Long,
      entries: Seq[ReservoirEntry])

  /** Streaming twin of q116's A-Res weighted sample — the DISTRIBUTED
    * reservoir from Efraimidis & Spirakis §3: because each item's rank key
    * `-ln(u)/w` is a pure function of the item (u replayed from md5, the
    * ONE shared [[graft.operators.CurationOps.aResKey]] column), "k
    * smallest keys" is merge-associative — any split of the stream into
    * buckets and micro-batches yields the same global sample after a
    * k-smallest merge of the per-bucket reservoirs. So the stream keys by
    * `doc_id % nBuckets` (shuffle parallelism at scale), each bucket's
    * `flatMapGroupsWithState` folds arrivals into a ≤k sorted entry list
    * (micro-batch groups sorted first — iterator order is not
    * contractual, same as `sourceCapStream`), and every touched bucket
    * emits its full current reservoir as a seq-stamped snapshot (Update
    * mode: a reservoir EVICTS, so earlier emissions are superseded, never
    * appended to). The consumer merge is k·nBuckets rows — driver-trivial
    * at any corpus size — and `StreamingSpec` proves the replay law:
    * max-seq snapshots merged by (rkey, doc_id) == the batch q116 sample,
    * under arbitrary batch splits and arrival orders. State is O(k) per
    * bucket, forever. */
  def reservoirStream(docs: DataFrame, k: Int, nBuckets: Int): Dataset[ReservoirSnapshot] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      // A-Res needs w > 0: n_chars NULL or 0 makes aResKey's division
      // yield a NULL rkey, which the non-nullable Double field below
      // turns into an encoder error that KILLS the query — one malformed
      // doc must degrade (zero weight = never sampled), not abort ingest.
      // doc_id NULL dies the same way (null bucket + null md5 rkey into
      // non-nullable fields), so it rides the same degrade filter
      .filter(col("doc_id").isNotNull &&
        col("n_chars").isNotNull && col("n_chars") > 0)
      .select(
        pmod(col("doc_id"), lit(nBuckets)).cast("int").as("bucket"),
        col("doc_id"),
        graft.operators.CurationOps
          .aResKey(col("doc_id"), col("n_chars")).as("rkey"))
      .as[WeightedArrival]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[ReservoirState, ReservoirSnapshot](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (bucket: Int, rows: Iterator[WeightedArrival],
            state: GroupState[ReservoirState]) =>
          val prev = state.getOption.getOrElse(ReservoirState(0L, Nil))
          val merged =
            (prev.entries ++ rows.map(r => ReservoirEntry(r.rkey, r.doc_id)))
              .sortBy(e => (e.rkey, e.doc_id)).take(k)
          val next = ReservoirState(prev.seq + 1, merged)
          state.update(next)
          Iterator.single(ReservoirSnapshot(bucket, next.seq, merged))
      }
  }

  final case class TokenArrival(bucket: Int, tok: String)
  final case class MgState(seq: Long, summary: Map[String, Long])
  final case class MgSnapshot(bucket: Int, seq: Long,
      summary: Map[String, Long])

  /** Streaming twin of q84's heavy-hitter prefilter: a per-bucket
    * Misra–Gries summary as `flatMapGroupsWithState` state — frequent
    * tokens surface ONLINE, with the same guarantee the batch two-pass
    * plan relies on. Tokens key by content hash into `nBuckets` groups
    * (buckets PARTITION the token space, so a globally heavy token's
    * whole count lands in one bucket: count > n/(k+1) ≥ n_b/(k+1) keeps
    * it in that bucket's summary — the partitioned guarantee is at least
    * as strong as the global one); each group folds arrivals through the
    * EXACT SAME [[graft.functions.MisraGriesAggregator]] reduce/merge
    * the batch query uses — one implementation, no twin drift. State is
    * ≤k counters per bucket forever; snapshots are seq-stamped and
    * superseded (Update mode), so the live candidate set is the max-seq
    * summaries' key union, ≤ k·nBuckets strings. Summary CONTENTS are
    * arrival-order-dependent (inherent to MG's decrement rule — batches
    * are sorted before folding so replays are deterministic, like
    * `sourceCapStream`); the CONTAINMENT guarantee is order-free, and
    * that is the only property the exact second pass needs.
    * `StreamingSpec` proves it against the batch exact counts. */
  def heavyHitterStream(tokens: DataFrame, k: Int, nBuckets: Int): Dataset[MgSnapshot] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val mg = new graft.functions.MisraGriesAggregator(k)
    tokens
      .select(pmod(hash(col("tok")), lit(nBuckets)).as("bucket"), col("tok"))
      .as[TokenArrival]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[MgState, MgSnapshot](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (bucket: Int, rows: Iterator[TokenArrival],
            state: GroupState[MgState]) =>
          val prev = state.getOption.getOrElse(MgState(0L, mg.zero))
          // null tokens: MisraGriesAggregator.reduce skips them in the
          // batch plan; drop them BEFORE the sort (Seq[String].sorted
          // NPEs on null, which would kill the whole streaming query)
          val summary = rows.map(_.tok).filter(_ != null).toSeq.sorted
            .foldLeft(prev.summary)(mg.reduce)
          val next = MgState(prev.seq + 1, summary)
          state.update(next)
          Iterator.single(MgSnapshot(bucket, next.seq, summary))
      }
  }

  /** Streaming twin of q121's sketch side: per-source HLL sketches built
    * ONLINE over arriving doc contents with the same built-in
    * `hll_sketch_agg` the batch query uses — a plain streaming aggregate
    * in Update mode, no custom state. Because an HLL sketch is a pure
    * function of the SET of hashed items (insert order and batch split
    * cannot change it — the register array keeps per-bucket maxima), the
    * final streamed sketch is BYTE-level equivalent to the batch sketch
    * and the estimates match exactly, which is the strongest stream==
    * batch law in the file: not "within tolerance", EQUAL. State is one
    * ≤2^lgK-register sketch per source, forever — the online half of the
    * stored-artifact pattern: a running crawl keeps these hot, snapshots
    * them at cut points, and q121's `hll_union` folds them into history
    * without ever re-scanning. */
  def sketchDistinctStream(docs: DataFrame, lgK: Int = 12): DataFrame =
    docs
      .select(col("source"), md5(col("text")).as("h"))
      .groupBy(col("source"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("h"), lit(lgK)))
        .as("est_distinct"))

  /** `tombstone = true` marks a DELETE message (the CDC convention: a
    * key with no value); `content_hash` is ignored on tombstones. */
  final case class DocVersion(doc_id: Long, seq: Long, content_hash: String,
      tombstone: Boolean = false)
  /** `hash = None` is a TOMBSTONE MARKER: the doc was removed but its
    * last-applied `seq` is retained so stale pre-tombstone redeliveries
    * stay rejected (round-9 advisor — `state.remove()` discarded the
    * guard exactly when reordering makes it matter). Markers expire via
    * processing-time timeout after the retention window, mirroring a
    * compacted topic's `delete.retention.ms`. */
  final case class DocHashState(hash: Option[String], seq: Long)
  final case class DocChange(doc_id: Long, status: String)

  /** Streaming twin of q100's snapshot diff, as a CDC upsert+delete
    * screen: docs arrive as (doc_id, content_hash) versions or
    * tombstones; per-key state remembers the last hash and each net
    * arrival is classified `added` (never seen), `changed` (hash
    * moved), or `removed` (tombstone for a live doc — the hash is
    * dropped, so a later higher-seq re-crawl of the id is `added`
    * again; a hash-less marker holds the seq for the retention window
    * so STALE pre-tombstone redeliveries cannot resurrect); unchanged
    * re-deliveries and tombstones for unseen ids are SUPPRESSED (the
    * dedup-at-ingest behavior). All four q100 classes are therefore
    * observable online: added/changed/removed emitted, unchanged =
    * silence. Each version carries a monotonic `seq` (source offset /
    * crawl timestamp); within a micro-batch the group folds to the
    * MAX-seq message per key before emitting the net status — one
    * string of state per doc_id, and a same-batch upsert+tombstone
    * nets to whichever `seq` is later, exactly like a log-compacted
    * topic. The iterator's order inside a group is not contractual, so
    * folding by seq (not `versions.last`) keeps replay-after-failure
    * deterministic — the same reason `sourceCapStream` sorts its group.
    * State is O(#live docs + markers): a tombstone demotes its key's
    * state to a seq-only marker rather than freeing it, so stale
    * pre-tombstone redeliveries cannot resurrect. BE AWARE of the
    * default's trade: with `tombstoneRetentionMs = None` markers are
    * IMMORTAL — a delete-heavy or tombstone-spammy topic grows state
    * monotonically with ever-removed keys. Such deployments MUST pass
    * a retention (arming a processing-time timeout that frees markers
    * — the same bounded-resurrection contract as Kafka's
    * `delete.retention.ms`) AND set a real trigger interval, because
    * ProcessingTimeTimeout makes Spark schedule no-data micro-batches
    * continuously at the trigger rate. The
    * RocksDB provider (spec'd in `StreamingSpec`) is the
    * production backend at corpus scale, exactly the SemDeDup-ingest
    * state-store argument. `CurationOpsSpec` proves the two-batch
    * replay emits exactly the batch diff's added∪changed set;
    * `StreamingSpec` proves the four-class replay law against the
    * batch full-outer-join classification, removals included. */
  def changeScreenStream(docs: Dataset[DocVersion],
      tombstoneRetentionMs: Option[Long] = None): Dataset[DocChange] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Retention expiry is OPT-IN: Spark's ProcessingTimeTimeout makes
    // `FlatMapGroupsWithStateExec.shouldRunAnotherBatch` return true
    // unconditionally, so the query schedules no-data micro-batches
    // CONTINUOUSLY at the trigger rate (a busy loop under the default
    // immediate trigger, and `processAllAvailable` never quiesces).
    // Callers that want markers reclaimed pass a retention AND a real
    // trigger interval; the default keeps markers forever — state
    // grows by one seq-only row per removed key, the documented
    // bound, with NO extra batches.
    val timeoutConf =
      if (tombstoneRetentionMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs.groupByKey(_.doc_id)
      .flatMapGroupsWithState[DocHashState, DocChange](
        OutputMode.Append, timeoutConf) {
        (docId: Long, rows: Iterator[DocVersion], state: GroupState[DocHashState]) =>
          // timeouts fire only for hash-less tombstone markers (live
          // states never arm one, and Spark clears the arm on every
          // data invocation) — retention elapsed, free the key; a
          // yet-staler resurrection after this point is re-admitted,
          // the same bounded guarantee a compacted topic gives once
          // delete.retention.ms passes
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          val net = rows.maxBy(_.seq)
          val prevState = state.getOption
          val prev = prevState.flatMap(_.hash)
          // state carries the last APPLIED seq: a stale lower-seq
          // redelivery arriving in a LATER micro-batch (multi-partition
          // sources do not order across partitions) must be dropped, or
          // it would regress state and emit spurious changed/removed
          // events — including AFTER a removal, which is why a tombstone
          // keeps a hash-less (marker, seq) state for the retention
          // window instead of state.remove() (round-9 advisor).
          if (prevState.exists(_.seq >= net.seq)) {
            // Spark clears the timeout arm on every data invocation —
            // a marker key hit by a stale redelivery must RE-arm or
            // the marker leaks forever instead of expiring
            if (prev.isEmpty && prevState.isDefined)
              tombstoneRetentionMs.foreach(state.setTimeoutDuration)
            Iterator.empty
          }
          else if (net.tombstone) {
            // store/refresh the marker even for a never-admitted key:
            // a reordered source can deliver the tombstone BEFORE the
            // version it deletes, and the marker's seq is what keeps
            // that late pre-tombstone version from resurrecting
            state.update(DocHashState(None, net.seq))
            tombstoneRetentionMs.foreach(state.setTimeoutDuration)
            if (prev.isDefined) Iterator(DocChange(docId, "removed"))
            else Iterator.empty // delete of a doc we never admitted
          } else {
            state.update(DocHashState(Some(net.content_hash), net.seq))
            prev match {
              case None => Iterator(DocChange(docId, "added"))
              case Some(h) if h != net.content_hash =>
                Iterator(DocChange(docId, "changed"))
              case _ => Iterator.empty
            }
          }
          }
      }
  }

  final case class UserEvent(event_id: Long, user_id: Long, ms: Long,
      event_type: String)
  final case class UserState(nEvents: Long, lastMs: Long)
  final case class UserSummary(user_id: Long, n_events: Long, last_ms: Long)

  /** Custom stateful op via `mapGroupsWithState` (the KeyValueGroupedDataset
    * state API): running per-user event counter + last-seen time. O(1)
    * state per key; ProcessingTimeTimeout would expire idle users in a
    * production stream. */
  def userTotals(events: Dataset[UserEvent]): Dataset[UserSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserSummary](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, Long.MinValue))
          var n = prev.nEvents
          var last = prev.lastMs
          rows.foreach { e =>
            n += 1
            if (e.ms > last) last = e.ms
          }
          state.update(UserState(n, last))
          UserSummary(userId, n, last)
      }
  }

  /** Stream–static decontamination screen (the streaming twin of
    * q69_contamination): each ARRIVING document is checked against the
    * static benchmark 8-gram set; contaminated docs are emitted with their
    * shared-gram count. The benchmark set rides as ONE static row holding
    * the distinct gram array (an eval suite, not a corpus — it fits), so
    * the whole screen is a per-row transform + a 1-row stream–static
    * equi-join: STATELESS — no watermark, no state store, append-mode —
    * and therefore runs at ingest rate no matter how much history has
    * streamed past. The batch q69 (`PipelineOps.contamination`) attributes
    * per benchmark doc; the screen answers the ingest-time question
    * "is this doc contaminated at all, and how badly". The overlap count
    * is [[TextExpressions.SortedIntersectCount]] — per-doc-gram binary
    * search over the pre-sorted bench array — NOT `array_intersect`, whose
    * eval rebuilds a hash set of the whole benchmark array per row and
    * would scale per-doc cost linearly in eval-suite size. The gram
    * definition is shared with q69 via [[TextOps.wordGramExpr]], so the
    * spec-asserted screen==q69 equivalence can't silently drift.
    *
    * `docs`: streaming or batch frame with (doc_id LONG, text STRING).
    * `benchGrams`: STATIC 1-row frame (join_key INT, bench_grams
    * ARRAY<STRING>, ascending-sorted) from [[benchmarkGramSet]]. */
  def contaminationScreen(docs: DataFrame, benchGrams: DataFrame): DataFrame =
    TextOps.gramTokenized(docs)
      .withColumn("grams", array_distinct(TextOps.wordGramExpr(8)))
      .withColumn("join_key", lit(1))
      .join(benchGrams, "join_key")
      .withColumn("n_shared",
        TextExpressions.sortedIntersectCount(col("grams"), col("bench_grams")))
      .filter(col("n_shared") > 0)
      .select(col("doc_id"), col("n_shared"))

  /** Collapse a static benchmark corpus to the 1-row distinct-gram-array
    * frame [[contaminationScreen]] joins against (sorted — the screen's
    * binary search requires it). */
  def benchmarkGramSet(bench: DataFrame): DataFrame =
    TextOps.gramTokenized(bench)
      .select(explode(TextOps.wordGramExpr(8)).as("gram"))
      .distinct()
      .agg(array_sort(collect_list(col("gram"))).as("bench_grams"))
      .withColumn("join_key", lit(1))

  /** Stateless ingest-time PII scrub — the streaming twin of q73's scrub
    * stage: each arriving document is emitted with its PII match count and
    * redacted text. A pure per-row map (no watermark, no state store,
    * append-mode), so it runs at ingest rate; the pattern set and
    * replacement order are [[graft.operators.PipelineOps]]'s — ONE shared
    * definition, so the spec-asserted stream==batch equivalence can't
    * drift. Aggregating redaction counts per source (batch q73's output
    * shape) belongs downstream of the scrub in a streaming deployment. */
  def piiScrubStream(docs: DataFrame): DataFrame = {
    import graft.operators.PipelineOps
    docs.select(col("doc_id"),
      PipelineOps.piiCountExpr(col("text")).as("n_redacted"),
      PipelineOps.scrubExpr(col("text")).as("scrubbed"))
  }

  /** Stateless ingest-time unicode normalization — the streaming twin of
    * q83's cleanup stage: each arriving document is emitted with its
    * normalized text and a changed flag. A pure per-row map (no
    * watermark, no state store, append-mode); the transform is
    * [[graft.operators.PipelineOps.normalizeExpr]] — ONE shared
    * definition (q73's single-definition rule), so the spec-asserted
    * stream==batch equivalence can't drift. In a deployment this runs
    * FIRST in the ingest chain, so the dedup/screen stages downstream
    * see canonical bytes. */
  def normalizeStream(docs: DataFrame): DataFrame = {
    import graft.operators.PipelineOps
    docs.select(col("doc_id"), col("text"),
      PipelineOps.normalizeExpr(col("text")).as("norm"))
      .select(col("doc_id"), col("norm"),
        (col("norm") =!= col("text")).as("changed"))
  }

  /** Stream-static anomaly screen — the streaming twin of q88's sweep:
    * arriving pre-aggregated (event_type, hour, cnt) rows (e.g. an
    * upstream tumbling count) are flagged against STATIC per-type stats
    * computed from history, via a stateless broadcast join — the
    * contamination-screen pattern (no watermark, no state store; the
    * stats side is ≤|types| rows). Predicate and z-score are
    * [[graft.operators.EventOps]]'s integer-exact definitions — ONE
    * shared definition, so the spec-asserted stream==batch equivalence
    * can't drift. In production the stats frame refreshes on a cadence
    * (each refresh is a new broadcast); the arriving side never
    * re-shuffles. */
  def anomalyScreenStream(hourCounts: DataFrame, stats: DataFrame)
      : DataFrame = {
    import graft.operators.EventOps
    // LEFT join: an event type absent from the static stats (it appeared
    // after the stats were computed) is the most anomalous signal there
    // is — an inner join would silently drop it, contradicting the
    // emits-EVERY-row contract. Unseen types flag is_anomaly = true
    // with a null z (no fence to score against).
    hourCounts.join(broadcast(stats), Seq("event_type"), "left_outer")
      .select(col("event_type"), col("hour"), col("cnt"),
        when(col("n").isNull, lit(true))
          .otherwise(EventOps.anomalyPredicate).as("is_anomaly"),
        // a type with n=1 in the static stats has zero variance-degrees
        // (n*(n-1) = 0): batch q88 never evaluates z there because it
        // filters on the predicate first, but the screen emits EVERY row,
        // so guard the division rather than emit NaN
        when(col("n") > 1, EventOps.zScoreExpr).as("z"))
  }

  /** Stream-static length-outlier screen — q104's streaming twin:
    * arriving (doc_id, lang, n_chars) documents are flagged against
    * STATIC per-lang median/MAD stats via a stateless broadcast join
    * (the q88/contamination screen pattern — no watermark, no state
    * store; the stats side is ≤|langs| rows). The fence is
    * [[graft.operators.CurationOps.madOutlierPredicate]] — one shared
    * definition, so the spec-asserted stream==batch flag equivalence
    * cannot drift. In production the stats frame refreshes on a crawl
    * cadence; the arriving side never shuffles. */
  def madScreenStream(docs: DataFrame, stats: DataFrame): DataFrame =
    // LEFT join: a doc in a language missing from the static stats has
    // no fence to judge against — it must pass through with a null flag
    // (bloomScreenStream's unscreenable-must-not-vanish rule), not
    // silently disappear from the screen output
    docs.join(broadcast(stats), Seq("lang"), "left_outer")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        graft.operators.CurationOps.madOutlierPredicate.as("is_outlier"))

  /** Stream-static SEMANTIC screen: arriving (vec_id, embedding) rows
    * flagged when cosine to any static center reaches `tau` — the
    * embedding-side admission gate that closes the loop on the batch
    * vector ladder (the centers ARE a bounded batch artifact: q98's
    * diversity coreset or q45's IVF codebook). Like [[seenSketch]], the
    * static side is collected as a BOUNDED artifact (k center vectors,
    * not data) and folded into one per-row `greatest(cos…)` expression,
    * so the stream stays a stateless map — no state store, no watermark,
    * no stream-side shuffle; refreshing the centers on a training
    * cadence just swaps the literal. `max_center_sim` is rounded per the
    * 4-dp policy; the flag compares the UNROUNDED value. */
  def semanticScreenStream(vecs: DataFrame, centers: Seq[Seq[Float]],
      tau: Double): DataFrame = {
    require(centers.nonEmpty, "semantic screen needs at least one center")
    val cosines = centers.map(c =>
      graft.functions.VectorExpressions.cosineSimilarity(
        col("embedding"), typedlit(c)))
    val maxCos = if (cosines.size == 1) cosines.head
      else greatest(cosines: _*)
    vecs.select(col("vec_id"),
      roundVal(maxCos, 4).as("max_center_sim"),
      (maxCos >= lit(tau)).as("is_near"))
  }

  /** Serialized Bloom sketch of a seen corpus's content hashes — the
    * companion of [[bloomScreenStream]] (and the streaming counterpart of
    * batch q77's in-plan scalar subquery). The sketch is BOUNDED by its
    * numBits parameter (128 KB here) no matter how large the seen corpus
    * is, so collecting it to the driver is the sketch pattern — one bounded
    * aggregation result, not a data collect — and it then rides into the
    * stream as a literal. Partial per-partition filters OR-merge
    * (order-free), so the bytes are deterministic. */
  def seenSketch(seen: DataFrame): Array[Byte] = {
    graft.GraftSession.tune(seen.sparkSession) // registers bloom_filter_agg
    val bytes = seen
      .selectExpr("bloom_filter_agg(xxhash64(text), 100000L, 1048576L) AS bf")
      .collect()(0).getAs[Array[Byte]](0)
    // bloom_filter_agg over ZERO rows evaluates to NULL — and a null
    // sketch literal would make might_contain() null for every arriving
    // row, which filter() treats as false: the screen would silently
    // drop the ENTIRE stream at bootstrap instead of passing all novel
    // docs. Fail here, loudly, where the empty corpus is visible.
    require(bytes != null,
      "seenSketch over an EMPTY corpus: a Bloom sketch of nothing cannot " +
        "screen anything — skip the screen at bootstrap (every doc is " +
        "novel) instead of building a null sketch")
    bytes
  }

  /** Stateless ingest-time dedup screen — the streaming deployment of the
    * q77 Bloom screen: each arriving document is tested against the seen
    * sketch and only NOVEL documents survive. A pure per-row predicate (no
    * watermark, no state store, append mode), so it runs at ingest rate
    * with O(1) memory regardless of how much history the sketch summarizes.
    * A Bloom filter has no false negatives, so every true re-delivery is
    * dropped; the accepted cost is that ~fpp of genuinely novel docs are
    * dropped too (mis-flagged as seen) — for corpus curation that trade is
    * almost always right, and fpp is set by the sketch's bits/items.
    * `docs`: streaming or batch (doc_id LONG, text STRING). */
  def bloomScreenStream(docs: DataFrame, sketch: Array[Byte]): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    require(sketch != null, "null seen-sketch (see seenSketch's contract)")
    val mightContain = GraftBridge.column(BloomFilterMightContain(
      Literal(sketch, org.apache.spark.sql.types.BinaryType),
      GraftBridge.expression(xxhash64(col("text")))))
    // xxhash64 is null-INTOLERANT but not null-PROPAGATING: a null text
    // hashes to the seed (42), so the raw might_contain is non-null and
    // a bare filter would screen null-text docs against that constant —
    // silently DROPPING them whenever any seen-corpus row was also null
    // (round-10 review; the old coalesce guard was dead code for exactly
    // this reason). Gate on text presence explicitly: an unscreenable
    // doc must pass as novel — downstream quality gates own the
    // null-text decision
    val maybeSeen = when(col("text").isNotNull, mightContain)
    docs.filter(!coalesce(maybeSeen, lit(false)))
      .select(col("doc_id"), col("text"))
  }

  /** Idempotent per-micro-batch JDBC write — the `foreachBatch` half of an
    * exactly-once streaming JDBC sink (the reference's sink family is JDBC,
    * so this is ITS streaming deployment). Structured Streaming's replay
    * contract: after a failure, the last uncommitted batch is re-delivered
    * with the SAME `batchId`. File sinks dedupe internally; plain JDBC does
    * not — the production pattern is to persist the batch id in a column
    * and make each batch's write a DELETE-then-APPEND keyed on it:
    *
    *   - first delivery: DELETE matches nothing, APPEND lands the rows;
    *   - replay after a mid-append crash: DELETE removes the partial rows,
    *     the re-APPEND lands them once — the END STATE is exactly-once even
    *     though the wire saw the rows twice.
    *
    * The DELETE runs driver-side on one connection (it touches only the
    * replayed batch's rows); the APPEND is Spark's distributed JDBC write —
    * per-partition connections, so sink throughput scales with partitions
    * exactly like the batch ingest path ([[graft.ingest.ParquetIngest]]).
    *
    * Caveat: `batch` must NOT be a lazy read of `table` itself — the
    * DELETE executes before the append evaluates it, so a self-read would
    * see its own rows vanish. Inside `foreachBatch` (the intended call
    * site, [[jdbcSinkStream]]) the batch frame always comes from the
    * streaming source, which is safe. */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, url: String,
      table: String,
      props: java.util.Properties = new java.util.Properties()): Unit = {
    val withId = batch.withColumn("graft_batch_id", lit(batchId))
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      // Probe existence the way the ENGINE resolves the DELETE's
      // unqualified name — by asking it to: a zero-row SELECT against
      // the same identifier. Every metadata formulation of this probe
      // has mis-resolved some engine (getTables case-folding missed
      // Derby vs Postgres; an any-schema pattern matched archive.events
      // for a not-yet-created sink; a getSchema-only pattern missed
      // multi-schema search_path resolution — rounds 9/10 each patched
      // one), because metadata describes STORAGE while the DELETE runs
      // through NAME RESOLUTION. The SELECT shares the DELETE's exact
      // resolution by construction: if it succeeds the DELETE will find
      // the same table; if it fails the engine cannot resolve the name
      // for DML either, so there is nothing to dedupe and Spark's
      // append will create the table. ONLY the undefined-table failure
      // class reads as not-exists: a blanket catch would turn a
      // TRANSIENT probe failure (connection reset, lock timeout) into
      // exists=false, silently skip the replay DELETE, and duplicate
      // the replayed batch — the exact failure this function exists to
      // prevent. Anything else propagates, failing the batch so the
      // checkpoint replays it (exactly-once preserved by retry).
      // States: 42P01 (PostgreSQL undefined_table), 42S02 (SQL/CLI
      // base table not found — MySQL/H2), 42X05 (Derby, which also
      // surfaces as SQLSyntaxErrorException), S0002 (SQL Server/Sybase
      // undefined object). An engine speaking NONE of these falls back
      // to driver metadata, but only to prove ABSENCE — a fresh sink on
      // an unknown engine must not wedge its first batch in a permanent
      // replay loop. Any metadata hit (or a metadata probe that itself
      // fails) rethrows the ORIGINAL error: a transient failure (reset,
      // lock timeout) must fail the batch so the checkpoint replays it,
      // never read as not-exists and skip the dedupe DELETE.
      val exists =
        try {
          val st = conn.createStatement()
          try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0").close(); true }
          finally st.close()
        } catch {
          case e: java.sql.SQLException =>
            val undefinedTable =
              Set("42P01", "42S02", "42X05", "S0002")
                .contains(Option(e.getSQLState).getOrElse("")) ||
                e.isInstanceOf[java.sql.SQLSyntaxErrorException]
            if (undefinedTable) false
            else {
              val last = table.split('.').last
              val anyHit =
                try {
                  val md = conn.getMetaData
                  // getTables' name argument is a LIKE pattern: '_' and
                  // '%' are wildcards, and every graft sink name carries
                  // underscores — unescaped, 'graft_batch' also matches
                  // an unrelated 'graftXbatch', proving "presence" for a
                  // table the DELETE can't see and wedging a fresh sink
                  // on an unknown-SQLState engine in a permanent replay
                  // loop (round-11 advisor). Escape metacharacters with
                  // the driver's own escape string.
                  val esc = md.getSearchStringEscape
                  def quote(n: String): String =
                    if (esc == null || esc.isEmpty) n
                    else n.replace(esc, esc + esc)
                      .replace("_", esc + "_").replace("%", esc + "%")
                  Seq(last, last.toUpperCase, last.toLowerCase).distinct
                    .exists { n =>
                      val rs = md.getTables(null, null, quote(n), null)
                      try rs.next() finally rs.close()
                    }
                } catch { case _: Throwable => true } // cannot prove absence
              if (anyHit) throw e else false
            }
        }
      if (exists) {
        val st = conn.createStatement()
        // quote the way SPARK'S WRITER created the column — per-dialect
        // (ANSI double quotes on Derby/Postgres, backticks on MySQL): a
        // hardcoded "graft_batch_id" parses as a string LITERAL under
        // MySQL's default sql_mode, matching zero rows and silently
        // re-duplicating every replayed batch
        val qcol = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
          .quoteIdentifier("graft_batch_id")
        try st.executeUpdate(
          s"DELETE FROM $table WHERE $qcol = $batchId")
        finally st.close()
      }
    } finally conn.close()
    withId.write.mode(org.apache.spark.sql.SaveMode.Append)
      .jdbc(url, table, props)
  }

  /** Exactly-once streaming JDBC sink: `foreachBatch` over
    * [[writeBatchIdempotent]] with a checkpoint, so batch ids are stable
    * across restarts and replays converge to the same table state. */
  def jdbcSinkStream(stream: DataFrame, url: String, table: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        writeBatchIdempotent(batch.toDF(), id, url, table)
      }
      .start()

  /** Streaming retrieval twin (round-9 verdict item 4): an arriving
    * QUERY stream served against the STATIC [[graft.operators.IvfIndex]]
    * artifact — the online half of the import-then-query lifecycle the
    * whole index family builds offline. Each micro-batch of
    * `(q_id, q_emb)` queries is answered by ONE partition-pruned codes
    * scan ([[graft.operators.IvfIndex.probeBatch]]: union-of-probed-
    * cells literal filter, broadcast routing join, map-side
    * `WindowGroupLimit` frontier) — exactly what an online retrieval
    * tier does with a request queue: micro-batch it, serve each batch
    * in one pruned scan. STATELESS between batches (no watermark, no
    * state store): each query's answer depends only on the immutable
    * artifact, so ingest rate is flat no matter how much query history
    * has streamed past, and the stream==batch law is exact — the union
    * of per-batch answers equals one big [[graft.operators.IvfIndex
    * .probeBatch]] over all queries (per-query independence:
    * `StreamingSpec`). `sink` receives each batch's answer frame
    * (q_id, rnk, vec_id, sim) — a memory table in the spec, a serving
    * log/push channel in production. */
  def ivfServeStream(queries: DataFrame, path: String, nProbe: Int,
      k: Int)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    serveLoop(queries, vecQueryClean) { clean =>
      localized(clean).map(qs => graft.operators.IvfIndex.probeBatch(
        qs.sparkSession, path, qs, nProbe, k))
    }(sink)

  /** ONE definition of the retrieval serve loop shared by all four
    * serve streams (BM25 / IVF / versioned IVF / versioned PQ): each
    * micro-batch is sanitized by `clean` (malformed rows DEGRADE —
    * dropped, never aborting the StreamingQuery into a checkpoint
    * replay loop of the same poison), then a NON-EMPTY clean batch is
    * answered by `answer` (None = nothing answerable survived) and the
    * frame handed to `sink`. Stateless between batches by construction:
    * no watermark, no state store — every answer depends only on the
    * artifact resolved inside `answer`. Previously each wrapper
    * re-spelled this loop and the degrade policies drifted (the static
    * IVF twin filtered nothing); one site, one contract. */
  private def serveLoop(queries: DataFrame, clean: DataFrame => DataFrame)(
      answer: DataFrame => Option[DataFrame])(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    queries.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // emptiness is the ANSWER's call (None), decided from the same
        // driver-side materialization it needs anyway — an isEmpty gate
        // here cost an extra take(1) job per micro-batch on the serving
        // hot path (round-11 review)
        answer(clean(batch.toDF())).foreach(sink)
      }

  /** Collect a micro-batch-sized query frame ONCE and rebuild it as a
    * local relation: the emptiness decision and the probe's query
    * broadcast then share one driver job instead of an isEmpty take(1)
    * plus the broadcast's own collect. Micro-batch-sized by the serve
    * contract — never call this on a data-sized frame. */
  private def localized(df: DataFrame): Option[DataFrame] = {
    val rows = df.collect()
    if (rows.isEmpty) None
    else Some(df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema))
  }

  /** The vector families' shared degrade rule: a query row with a null
    * id or null embedding is unanswerable — drop it. */
  private val vecQueryClean: DataFrame => DataFrame =
    _.filter(col("q_id").isNotNull && col("q_emb").isNotNull)

  /** [[ivfServeStream]] with live index rollover (round-10 verdict item
    * 1, completing the versioned-serving matrix BM25 opened): the query
    * stream is served against a [[graft.operators.VersionedTable]] IVF
    * index, resolving the CURRENT manifest once per micro-batch
    * ([[graft.operators.IvfIndex.probeBatchVersioned]]). A nightly
    * delta publishing mid-stream is picked up at the next batch
    * boundary with NO restart; every query within a batch sees ONE
    * consistent (codebook, assignments) snapshot; vacuum policy must
    * retain the previous version for at least a batch interval
    * ([[bm25ServeStream]]'s exact contract). Malformed query rows (null
    * q_id / q_emb) DEGRADE — dropped, never aborting the stream into a
    * checkpoint replay loop. */
  def ivfServeStreamVersioned(queries: DataFrame, root: String,
      nProbe: Int, k: Int)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    serveLoop(queries, vecQueryClean) { clean =>
      localized(clean).map(qs => graft.operators.IvfIndex
        .probeBatchVersioned(qs.sparkSession, root, qs, nProbe, k))
    }(sink)

  /** Streaming PQ/ADC retrieval with live index rollover — the third
    * family of the versioned-serving matrix. Per micro-batch the
    * CURRENT manifest resolves once
    * ([[graft.operators.PqIndex.probeBatchVersioned]]): codebook, codes
    * and the shortlist budget all ride that one snapshot. The exact
    * re-rank needs RAW embeddings the PQ artifact deliberately does not
    * store, so `corpusOf` maps the resolved snapshot VERSION to the
    * rerank store — the caller binds embeddings consistent with that
    * commit (the version-pairing contract
    * [[graft.operators.PqIndex.probeBatchVersioned]] documents).
    * Malformed query rows degrade as in [[ivfServeStreamVersioned]]. */
  def pqServeStream(queries: DataFrame, root: String,
      corpusOf: Long => DataFrame, k: Int = 10)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    serveLoop(queries, vecQueryClean) { clean =>
      localized(clean).map(qs => graft.operators.PqIndex
        .probeBatchVersioned(qs.sparkSession, root, qs, corpusOf, k))
    }(sink)

  /** Streaming LEXICAL retrieval with live index rollover: an arriving
    * keyword-query stream `(q_id, terms)` served against a
    * [[graft.operators.VersionedTable]] BM25 index, resolving the
    * CURRENT manifest once per micro-batch
    * ([[graft.operators.Bm25Index.probeBatchVersioned]]). That single
    * resolve is the whole online-rollover story: a nightly delta
    * publishing mid-stream is picked up at the next batch boundary with
    * NO stream restart, every query within a batch sees ONE consistent
    * snapshot (postings and corpus stats from the same commit — the
    * atomic-manifest law doing its online job), and a query in flight
    * when the publish lands keeps its already-resolved snapshot
    * (snapshot isolation; vacuum policy must retain the previous
    * version for at least a batch interval). Stateless between batches
    * like [[ivfServeStream]]: flat ingest rate, exact stream==batch
    * law per snapshot (`StreamingSpec` pins pre-publish batches to v1's
    * answers and post-publish batches to v2's). */
  def bm25ServeStream(queries: DataFrame, root: String, k: Int = 20)(
      sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    serveLoop(queries,
      _.filter(col("q_id").isNotNull && col("terms").isNotNull)) { clean =>
      // beyond the shared row-level degrade, null/empty TOKENS inside a
      // surviving query's terms array drop; a query with no usable
      // tokens left has no answerable terms (reservoirStream's
      // degrade-not-abort contract)
      val qs = clean.select("q_id", "terms").collect()
        .map(r => (r.getLong(0),
          r.getSeq[String](1).toSeq.filter(t => t != null && t.nonEmpty)))
        .filter(_._2.nonEmpty).toSeq
      if (qs.isEmpty) None
      else Some(graft.operators.Bm25Index.probeBatchVersioned(
        clean.sparkSession, root, qs, k))
    }(sink)

  /** Streaming CDC tail of a [[graft.operators.VersionedTable]] — the
    * online consumer of [[graft.operators.VersionedTable.changes]]. Each
    * micro-batch of the driving tick stream (any stream; its ROWS are
    * ignored — it is the trigger clock, the way a real tailer runs on a
    * timer) resolves the CURRENT manifest once. If the version advanced
    * past the consumer's cursor, `sink` receives the NET change feed
    * cursor→current ([[graft.operators.VersionedTable.changes]]
    * semantics: per-key insert/delete plus update_pre/update_post image
    * pairs, COW-carried unchanged rows suppressed, multi-commit gaps
    * collapsed to the net diff) plus
    * a `commit_version` column naming the new cursor position; then the
    * cursor advances. A quiet tick (no publish since the cursor) is
    * silent. Within a live stream delivery is in-order with no
    * re-emission; if `sink` throws, the foreachBatch retry re-emits the
    * same span (at-least-once) — exactly-once is the caller pairing an
    * idempotent/transactional sink with the span's `commit_version`
    * (the [[writeBatchIdempotent]] recipe).
    *
    * Cursor scope: in-memory, initialized at `startVersion` — a restart
    * re-tails from the caller's cursor, not from a checkpoint; a
    * production deployment persists the cursor WITH the sink's output
    * and passes it back in. Retention contract: vacuum must keep
    * manifests back to the slowest consumer's cursor (`keepVersions` ≥
    * the tail window) — a vacuumed cursor fails the batch loudly
    * (snapshotAt returns None), never silently re-bases the feed. */
  def changesStream(ticks: DataFrame, root: String,
      schema: org.apache.spark.sql.types.StructType, keyCol: String,
      startVersion: Long)(sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.VersionedTable
    val cursor = new java.util.concurrent.atomic.AtomicLong(startVersion)
    ticks.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        VersionedTable.currentSnapshot(spark, root)
          .filter(_.version > cursor.get()).foreach { cur =>
            val fromV = cursor.get()
            val from = VersionedTable.snapshotAt(spark, root, fromV)
              .getOrElse(throw new IllegalStateException(
                s"changes cursor v$fromV at $root was vacuumed — " +
                  "retention must cover the slowest consumer"))
            sink(VersionedTable.changes(spark, root, from, cur,
                schema, keyCol)
              .withColumn("commit_version", lit(cur.version)))
            cursor.set(cur.version)
          }
      }
  }

  /** Online CDC-maintained downstream aggregate — the STREAMING twin of
    * the nightly's stats step (round-11 verdict item 6: `changesStream`
    * tails the feed, but nothing maintained state FROM it online). Each
    * micro-batch of the driving tick stream resolves the corpus's
    * CURRENT manifest once; if it advanced past the stats table's own
    * committed cursor (the `corpus_version` property of ITS current
    * manifest — [[graft.Nightly]]'s offsets-in-the-transaction slot),
    * the span's [[graft.operators.VersionedTable.changes]] feed is
    * applied as one add/retract delta commit
    * ([[graft.Nightly.applyStatsFeed]] — the SAME maintenance math the
    * nightly runs, one definition), which moves the cursor atomically
    * with the grid it describes.
    *
    * Exactly-once WITHOUT a checkpoint: the cursor is not stream state
    * at all — a replayed or duplicated tick re-resolves, finds
    * `cursor ≥ current`, and no-ops; a crash between the feed read and
    * the commit left the cursor unmoved, so the retry re-applies the
    * same span onto the same base. Restarts resume from the stats
    * table itself. Retention contract: corpus vacuum must keep
    * manifests back to the stats cursor ([[changesStream]]'s same
    * rule) — a vacuumed cursor fails the batch loudly. The stats table
    * must be bootstrapped first (the nightly's bootstrap, or any
    * `publishFull` of the grid carrying the cursor property).
    * `StreamingSpec` pins the stream==batch law: after each committed
    * corpus version, the grid equals a direct recompute (q144's
    * oracle shape). */
  def cdcMaintainStream(ticks: DataFrame, corpusRoot: String,
      statsRoot: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.VersionedTable
    ticks.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        VersionedTable.currentSnapshot(spark, corpusRoot).foreach { cur =>
          val statsCur = VersionedTable.currentSnapshot(spark, statsRoot)
            .getOrElse(throw new IllegalStateException(
              s"stats table at $statsRoot is unborn — bootstrap the grid " +
                "(publishFull with the corpus_version property) first"))
          // Try-parsed like the nightly's reader, but a stream cannot
          // rebuild a grid it doesn't own the bootstrap of — an
          // unreadable cursor fails the batch LOUDLY with the cause,
          // never a NumberFormatException three frames deep
          val raw = statsCur.properties
            .get(graft.Nightly.CorpusVersionProp)
          val cursor = raw.flatMap(v => scala.util.Try(v.toLong).toOption)
            .getOrElse(throw new IllegalStateException(
              s"stats table at $statsRoot carries no readable " +
                s"corpus_version cursor (raw: $raw) — bootstrap it via " +
                "the nightly/publishFull path before tailing"))
          if (cur.version > cursor) {
            val from = VersionedTable.snapshotAt(spark, corpusRoot, cursor)
              .getOrElse(throw new IllegalStateException(
                s"stats cursor v$cursor at $corpusRoot was vacuumed — " +
                  "retention must cover the slowest consumer"))
            // applyStatsFeed re-checks the cursor INSIDE its commit
            // retry: a racing nightly applying the same span makes this
            // tick a no-op, never a double-applied add/retract; a racer
            // that moved the cursor to an INTERMEDIATE version instead
            // (partial overlap — FeedSuperseded) also no-ops here, and
            // the NEXT tick recomputes the feed from the new cursor
            try graft.Nightly.applyStatsFeed(spark, statsRoot,
              VersionedTable.changes(spark, corpusRoot, from, cur,
                graft.Nightly.corpusSchema, "doc_id"), cursor, cur.version)
            catch {
              case graft.Nightly.FeedSuperseded(moved) =>
                org.slf4j.LoggerFactory.getLogger(getClass).info(
                  s"cdcMaintainStream: stats cursor moved to $moved " +
                    s"mid-tick (feed was v$cursor->v${cur.version}) — " +
                    "no-op; the next tick recomputes from the new cursor")
            }
          }
        }
      }
  }

  /** Online CDC-maintained BM25 index — the STREAMING twin of the
    * nightly's lexical step (round-12 verdict item 5: the stats grid
    * synced online, the index families only nightly). Each micro-batch
    * resolves the corpus's CURRENT manifest once; if it advanced past
    * the index's committed `corpus_version` cursor, the span's CDC feed
    * is routed through [[graft.operators.IndexMaintenance
    * .deltaFromChangesIn]] with the LEXICAL modality filter (an
    * embedding-only publish rewrites no postings bucket — the feed's
    * text-unchanged update pairs drop out) and applied via
    * [[graft.operators.Bm25Index.updateFromVersioned]], whose commit
    * carries the new cursor atomically with the postings and stats it
    * describes.
    *
    * Exactly-once WITHOUT a checkpoint, by a DIFFERENT mechanism than
    * [[cdcMaintainStream]]'s: the index update is SET math (upserted
    * keys replace their own old rows, df re-derived against the
    * index's current state), so a crash-retry that re-applies a span
    * converges to the identical content — the cursor pre-check is what
    * makes a replayed tick cheap (zero commits), not what makes it
    * safe. An other-modality-only corpus version still commits (the
    * cursor must advance to mark coverage) but carries over every
    * postings generation untouched — copy-on-write sharing preserved,
    * spec-pinned by generation-id equality. Retention contract:
    * [[changesStream]]'s same rule. `StreamingSpec` pins stream==batch
    * (the online index serves exactly what a fresh build of the
    * current corpus serves) and the replayed-tick no-op. */
  def cdcMaintainBm25Stream(ticks: DataFrame, corpusRoot: String,
      bm25Root: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    cdcMaintainIndexesStream(ticks, corpusRoot, bm25Root = Some(bm25Root))

  /** The whole NIGHTLY consumer set as an online stream (the full form
    * of round-12 verdict item 5 — "at least BM25" done for every
    * family): one micro-batch resolves the corpus's current manifest
    * once, derives ONE CDC feed per distinct consumer cursor
    * (`localCheckpoint`ed and shared, exactly [[graft.Nightly]]'s
    * feedCache — the common case is every consumer on last tick's
    * version, so the span is diffed and key-validated once for all
    * four), routes it per MODALITY ([[graft.operators.IndexMaintenance
    * .deltaFromChangesIn]] — a text-only edit never re-encodes vectors,
    * an embedding-only re-embed never rewrites a postings bucket), and
    * drives each present consumer's versioned update with the cursor
    * committed atomically with its state.
    *
    * Exactly-once story per consumer is inherited: set-math index
    * updates converge under re-application (cursor pre-check makes
    * replays free); the add/retract stats grid refuses superseded feeds
    * ([[graft.Nightly.FeedSuperseded]]) and catches up next tick.
    * `StreamingSpec` pins ONLINE == NIGHTLY: the stream-maintained
    * world content-equals the batch night's on the same v2. */
  def cdcMaintainIndexesStream(ticks: DataFrame, corpusRoot: String,
      bm25Root: Option[String] = None, ivfRoot: Option[String] = None,
      pqRoot: Option[String] = None, statsRoot: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.{Bm25Index, IndexMaintenance, IvfIndex,
      PqIndex, VersionedTable}
    ticks.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        VersionedTable.currentSnapshot(spark, corpusRoot).foreach { cur =>
          // one feed per distinct from-version, shared by every consumer
          // at that cursor; checkpointed because up to four consumers'
          // several actions each would otherwise re-run the CDC join
          val feedCache = scala.collection.mutable.Map[Long, DataFrame]()
          def feedFrom(v: Long): DataFrame =
            feedCache.getOrElseUpdate(v, {
              val from = VersionedTable.snapshotAt(spark, corpusRoot, v)
                .getOrElse(throw new IllegalStateException(
                  s"cursor v$v at $corpusRoot was vacuumed — retention " +
                    "must cover the slowest consumer"))
              VersionedTable.changes(spark, corpusRoot, from, cur,
                graft.Nightly.corpusSchema, "doc_id").localCheckpoint()
            })
          def cursorOf(name: String, root: String): Long = {
            val snap = VersionedTable.currentSnapshot(spark, root)
              .getOrElse(throw new IllegalStateException(
                s"$name at $root is unborn — bootstrap it (buildVersioned/" +
                  "publishFull with the corpus_version property) first"))
            val raw = snap.properties.get(graft.Nightly.CorpusVersionProp)
            raw.flatMap(v => scala.util.Try(v.toLong).toOption)
              .getOrElse(throw new IllegalStateException(
                s"$name at $root carries no readable corpus_version " +
                  s"cursor (raw: $raw) — bootstrap it via the nightly/" +
                  "build path before tailing"))
          }
          val prop = Map(
            graft.Nightly.CorpusVersionProp -> cur.version.toString)
          def sync(name: String, rootOpt: Option[String])(
              apply: (String, DataFrame, Long) => Unit): Unit =
            rootOpt.foreach { root =>
              val cursor = cursorOf(name, root)
              if (cur.version > cursor) apply(root, feedFrom(cursor), cursor)
            }
          def vecRows(df: DataFrame): DataFrame =
            df.select(col("doc_id").as("vec_id"), col("embedding"))
          sync("BM25 index", bm25Root) { (root, feed, _) =>
            val (ups, rem) = IndexMaintenance.deltaFromChangesIn(feed,
              "doc_id", Seq("text"))
            Bm25Index.updateFromVersioned(spark, root,
              ups.select(col("doc_id"), col("text")), rem, prop)
          }
          sync("IVF index", ivfRoot) { (root, feed, _) =>
            val (ups, rem) = IndexMaintenance.deltaFromChangesIn(feed,
              "doc_id", Seq("embedding"))
            IvfIndex.updateFromVersioned(spark, root, vecRows(ups),
              rem.select(col("doc_id").as("vec_id")), prop)
          }
          sync("PQ index", pqRoot) { (root, feed, _) =>
            val (ups, rem) = IndexMaintenance.deltaFromChangesIn(feed,
              "doc_id", Seq("embedding"))
            // the build's vec_id≠0 convention (0 is the query slot)
            PqIndex.updateFromVersioned(spark, root,
              vecRows(ups).filter(col("vec_id") =!= 0),
              rem.select(col("doc_id").as("vec_id")), prop)
          }
          sync("stats grid", statsRoot) { (root, feed, cursor) =>
            try graft.Nightly.applyStatsFeed(spark, root, feed,
              cursor, cur.version)
            catch {
              case graft.Nightly.FeedSuperseded(moved) =>
                org.slf4j.LoggerFactory.getLogger(getClass).info(
                  s"cdcMaintainIndexesStream: stats cursor moved to " +
                    s"$moved mid-tick — no-op; next tick recomputes")
            }
          }
        }
      }
  }

  /** Drive a streaming query over a micro-batched in-memory feed and return
    * the final result table — used by the spec and by `StreamingDemo`. */
  def runToMemory(stream: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    stream.sparkSession.table(name)
  }
}
