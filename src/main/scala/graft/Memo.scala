package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoization of small, hot intermediate frames — the
  * materialized-intermediate pattern a warehouse would express as a temp
  * table (e.g. the shingled-documents base shared by the whole near-dup
  * family, or the near-dup pair list consumed by both q32 and q60).
  *
  * Hygiene (the round-1 `pairsMemo` had none of this):
  *  - Sessions are WEAK identity keys, and the cached frames are held
  *    through SoftReferences. The indirection is load-bearing: a
  *    DataFrame strongly references its own SparkSession, so a strong
  *    value would pin the weak key forever (the classic WeakHashMap
  *    value-refers-to-key leak — a round-9 review finding). Soft refs
  *    clear only under real memory pressure, so in a healthy heap the
  *    memo stays hot for the whole bench; when one IS cleared, Spark's
  *    ContextCleaner unpersists the orphaned cache blocks once the RDD
  *    object is collected, and the next `cached` call rebuilds.
  *  - Entries of sessions whose SparkContext has STOPPED are swept on
  *    every map access (their cache blocks died with the context; only
  *    the plan trees linger, and only until the sweep or GC pressure).
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
  private type Entries =
    java.util.concurrent.ConcurrentHashMap[String, java.lang.ref.SoftReference[DataFrame]]

  private val bySession = new java.util.WeakHashMap[SparkSession, Entries]()

  private def mapFor(spark: SparkSession): Entries = bySession.synchronized {
    // sweep sessions whose context is gone — their blocks are already
    // freed, this just unpins the plan trees and the session objects
    val it = bySession.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.sparkContext.isStopped) it.remove()
    }
    var m = bySession.get(spark)
    if (m == null) {
      m = new Entries()
      bySession.put(spark, m)
    }
    m
  }

  /** Wall-clock nanos spent MATERIALIZING memo entries in this JVM —
    * the shared-build ledger the bench reports per query as
    * `memo_build_sec` (round-12 verdict: q60's 11 s was ~6 s of shared
    * shingle-pair/CC build that q78/q86 then read back warm; without
    * the ridealong, per-query numbers look like regressions whenever
    * suite order moves the build to a different carrier). Monotonic,
    * never reset; readers take DELTAS around a measured section. Nested
    * builds (a memoized frame whose build reads another memo) count
    * only at the OUTERMOST level, so a delta is the section's true
    * wall-clock build cost, not a double-counted sum. */
  private val buildNanosTotal = new java.util.concurrent.atomic.AtomicLong(0L)
  private val buildDepth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  /** Cumulative memo-build nanos so far (see [[buildNanosTotal]]). */
  def buildNanos: Long = buildNanosTotal.get()

  /** Memoize `build` under (session, key), cached and materialized. */
  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val m = mapFor(spark)
    val hit = m.get(key)
    val live = if (hit != null) hit.get() else null
    if (live != null) live
    else {
      val t0 = System.nanoTime()
      val d = buildDepth.get()
      buildDepth.set(d + 1)
      val df =
        try { val b = build.cache(); b.count(); b } // materialize once,
        finally {                                   // outside the map lock
          buildDepth.set(d)
          if (d == 0) buildNanosTotal.addAndGet(System.nanoTime() - t0)
        }
      val ref = new java.lang.ref.SoftReference(df)
      val raced =
        if (hit != null) !m.replace(key, hit, ref) // stale cleared ref
        else m.putIfAbsent(key, ref) != null
      val result =
        if (raced) {
          val winner = m.get(key)
          val w = if (winner != null) winner.get() else null
          if (w != null) { df.unpersist(blocking = false); w }
          else { m.put(key, ref); df }
        } else df
      // evict() may have removed this session's map between mapFor and
      // the insert above; the entry would then live in an ORPHANED map no
      // future evict can reach, keeping the frame persisted forever.
      // Re-check under the same lock evict holds and honor the eviction
      // (the caller still gets a usable frame — just uncached, like any
      // other post-evict read).
      bySession.synchronized {
        if (bySession.get(spark) ne m) {
          result.unpersist(blocking = false)
          m.clear()
        }
      }
      result
    }
  }

  /** Unpersist and forget every memoized frame for this session. */
  def evict(spark: SparkSession): Unit = {
    val m = bySession.synchronized(bySession.remove(spark))
    if (m != null) m.values().forEach { ref =>
      val df = ref.get()
      if (df != null) df.unpersist(false)
    }
  }
}
