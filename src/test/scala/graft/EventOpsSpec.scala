package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._

/** Laws for the batch event operators that their DuckDB oracles cannot
  * see: q105's session-boundary semantics on planted timelines and its
  * one-shuffle window plan shape.
  */
class EventOpsSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "event_type", "ms")
  }

  test("q105: trigrams never cross a session boundary") {
    // one user, four events; 31-min gap before the fourth: session 1 is
    // (a,b,c) -> one trigram, session 2 is just (d) -> none
    val gap = 31 * 60 * 1000L
    val events = frame(Seq(
      (1L, 1L, "a", 0L),
      (1L, 2L, "b", 60000L),
      (1L, 3L, "c", 120000L),
      (1L, 4L, "d", 120000L + gap)))
    val out = EventOps.eventPathsOf(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(("a", "b", "c", 1L)))
  }

  test("q105: within one session every consecutive triple counts, ties ordered deterministically") {
    // a,b,c,d in one session -> (a,b,c) and (b,c,d); a second user
    // repeats (a,b,c) so counts differ
    val events = frame(Seq(
      (1L, 1L, "a", 0L), (1L, 2L, "b", 1000L),
      (1L, 3L, "c", 2000L), (1L, 4L, "d", 3000L),
      (2L, 5L, "a", 0L), (2L, 6L, "b", 1000L), (2L, 7L, "c", 2000L)))
    val out = EventOps.eventPathsOf(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(("a", "b", "c", 2L), ("b", "c", "d", 1L)))
  }

  test("q114: attribution window is bounded, strictly prior, and picks the EARLIEST in-horizon view") {
    // reuse eventPathsOf's frame shape via a direct window evaluation on
    // the same operator body semantics: plant a user with views at
    // t=-8d (expired), -6d, -2d and a purchase at t=0; plus a same-ms
    // view (excluded) and a view-less purchaser
    val day = 86400000L
    val t0 = 100L * day
    import spark.implicits._
    val events = Seq(
      (1L, 1L, "view", t0 - 8 * day),     // outside the 7-day horizon
      (1L, 2L, "view", t0 - 6 * day),     // earliest IN horizon -> winner
      (1L, 3L, "view", t0 - 2 * day),
      (1L, 4L, "view", t0),               // same-ms as purchase: excluded
      (1L, 5L, "purchase", t0),
      (2L, 6L, "purchase", t0))           // no views at all
      .toDF("user_id", "event_id", "event_type", "ms")
    val week = 7L * day
    val lookback = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ms"))
      .rangeBetween(-week, -1L)
    val out = events
      .withColumn("first_view_ms",
        min(when(col("event_type") === "view", col("ms"))).over(lookback))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("first_view_ms"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(5L).contains(t0 - 6 * day),
      "must attribute to the EARLIEST view inside the horizon, not the latest, " +
        "and must ignore the expired and same-ms views")
    assert(out(6L).isEmpty, "a view-less purchase is unattributed")
  }

  test("q105: the two window layers share ONE user_id exchange") {
    val out = EventOps.eventPaths(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    // the session windows cluster on user_id and the lead window on
    // (user_id, sess); hash(user_id) satisfies both, so exactly one
    // exchange may carry user_id partitioning
    val userExchanges = "Exchange hashpartitioning\\([^)]*user_id".r
      .findAllIn(plan).size
    assert(userExchanges == 1,
      s"expected one user_id exchange, got $userExchanges:\n$plan")
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // descending counts with full tiebreak
    val keys = rows.map(r => (-r.getLong(3), r.getString(0), r.getString(1), r.getString(2)))
    assert(keys.sameElements(keys.sorted))
  }

  test("q123: dwell percentiles exact on the fixture; both leads share ONE exchange") {
    val out = EventOps.transitionDwell(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    // next-type and next-ms ride the same (user_id | ms, event_id) window:
    // exactly one user_id exchange, no second sort pass
    val userExchanges = "Exchange hashpartitioning\\([^)]*user_id".r
      .findAllIn(plan).size
    assert(userExchanges == 1,
      s"expected one user_id exchange, got $userExchanges:\n$plan")
    val rows = out.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
    assert(rows.nonEmpty)
    // brute-force replay: per-user (ms, event_id)-ordered gap list per edge
    val evs = Tables.events(spark, sfDir)
      .withColumn("ms", expr("ts div 1000000"))
      .select(col("user_id"), col("event_id"), col("ms"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gaps = evs.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._3, e._2))
      s.zip(s.tail).map { case (a, b) => ((a._4, b._4), b._3 - a._3) }
    }.toSeq.groupBy(_._1).view.mapValues(_.map(_._2.toDouble).sorted).toMap
    def pct(v: Seq[Double], p: Double): Double = {
      val idx = p * (v.length - 1)
      val lo = idx.toInt; val hi = math.min(lo + 1, v.length - 1)
      val x = v(lo) + (idx - lo) * (v(hi) - v(lo))
      BigDecimal(x / 1000.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    rows.foreach { case (edge, (cnt, p50, p90)) =>
      val g = gaps(edge)
      assert(cnt == g.length, s"$edge count ${cnt} != ${g.length}")
      assert(p50 == pct(g, 0.5), s"$edge p50 $p50 != ${pct(g, 0.5)}")
      assert(p90 == pct(g, 0.9), s"$edge p90 $p90 != ${pct(g, 0.9)}")
    }
    assert(rows.length == gaps.size, "every observed edge must be reported")
  }

  test("q125: VARIANT extraction survives corrupt/missing/typed-wrong payloads") {
    import spark.implicits._
    val events = Seq(
      (1L, "view", """{"k": 7}"""),     // well-formed
      (2L, "view", """{"k": 17}"""),    // same bucket as 7
      (3L, "view", """not json at all"""), // corrupt -> try_parse_json NULL
      (4L, "view", """{"other": 1}"""), // missing field -> variant_get NULL
      (5L, "view", """{"k": "text"}"""),// wrong type -> bigint cast NULL
      (6L, "click", null),              // null payload
      // string-then-cast extraction semantics (round-9 review): these
      // MUST drop, exactly as DuckDB's TRY_CAST of the extracted string
      // drops them — the old 'bigint'-typed variant_get would have
      // coerced true -> 1 and truncated 1.5 -> 1, silently diverging
      // from the oracle the day a payload went non-integral
      (7L, "view", """{"k": true}"""),  // boolean -> NULL, not 1
      (8L, "view", """{"k": 1.5}"""),   // fractional -> NULL, not 1
      (9L, "view", """{"k": "7"}""")    // quoted integer -> 7 (both engines)
    ).toDF("event_id", "event_type", "props")
    val out = graft.operators.EventOps.variantExtractOf(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the well-formed rows fold into one (view, 7) cell: 7 + 17 + "7"
    assert(out.toSeq == Seq(("view", 7L, 3L, 31L)),
      s"degradation contract broken: ${out.toSeq}")
    // agreement law: VARIANT path == q20's get_json_object path on the fixture
    val ev = Tables.events(spark, sfDir)
    val variant = graft.operators.EventOps.variantExtractOf(ev).collect().toSeq
    val stringPath = ev
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"), pmod(col("k"), lit(10L)).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"), col("k_mod")).collect().toSeq
    assert(variant == stringPath,
      "variant_get and get_json_object must extract identical values")
  }

  test("q129: recursive BFS scores planted chain hops exactly; unreachable absent") {
    import spark.implicits._
    // one user walks signup -> view -> click -> purchase (a 3-hop chain);
    // a second user emits error -> error, DISCONNECTED from signup
    val events = Seq(
      (1L, 1L, 1000L, "signup"), (1L, 2L, 2000L, "view"),
      (1L, 3L, 3000L, "click"), (1L, 4L, 4000L, "purchase"),
      (2L, 5L, 1000L, "error"), (2L, 6L, 2000L, "error")
    ).toDF("user_id", "event_id", "ms", "event_type")
    val out = graft.operators.EventOps.recursiveReachOf(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("signup" -> 0L, "view" -> 1L, "click" -> 2L,
      "purchase" -> 3L), s"hop map wrong: $out")
    // 'error' is unreachable from signup: must NOT appear
    assert(!out.contains("error"))
  }
}
