package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoization of small, hot intermediate frames — the
  * materialized-intermediate pattern a warehouse would express as a temp
  * table (e.g. the shingled-documents base shared by the whole near-dup
  * family, or the near-dup pair list consumed by both q32 and q60).
  *
  * Hygiene (the round-1 `pairsMemo` had none of this):
  *  - Sessions are WEAK identity keys: a stopped, unreferenced session's
  *    entries become unreachable and its cached RDDs are freed by the
  *    ContextCleaner — no identity-hash reuse hazard, no process-lifetime
  *    pinning.
  *  - The build runs OUTSIDE any map lock (putIfAbsent pattern): a racing
  *    duplicate is unpersisted immediately, never leaked, and no other
  *    caller blocks behind a multi-second Spark job.
  *  - `evict(spark)` drops + unpersists everything for a session — call it
  *    when the files under a memoized path are regenerated mid-session or
  *    ahead of an orderly session close.
  *
  * Scale note: entries persist with the default MEMORY_AND_DISK level, so a
  * memoized frame larger than executor memory spills instead of evicting
  * hot operator state.
  */
object Memo {
  private val bySession =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  private def mapFor(spark: SparkSession) = bySession.synchronized {
    var m = bySession.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
      bySession.put(spark, m)
    }
    m
  }

  /** Memoize `build` under (session, key), cached and materialized. */
  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val m = mapFor(spark)
    val hit = m.get(key)
    if (hit != null) hit
    else {
      val df = build.cache()
      df.count() // materialize once, outside the map lock
      val prev = m.putIfAbsent(key, df)
      if (prev != null) { df.unpersist(blocking = false); prev }
      else df
    }
  }

  /** Unpersist and forget every memoized frame for this session. */
  def evict(spark: SparkSession): Unit = {
    val m = bySession.synchronized(bySession.remove(spark))
    if (m != null) m.values().forEach(_.unpersist(false))
  }
}
