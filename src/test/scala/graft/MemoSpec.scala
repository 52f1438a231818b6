package graft

import org.apache.spark.sql.functions._

/** Session-scoped memoization ([[Memo]]): hit/rebuild/evict semantics and
  * the SoftReference indirection added after the round-9 review found the
  * original strong values pinned their own weak session keys (a DataFrame
  * strongly references its SparkSession, so WeakHashMap could never
  * expunge an entry — stopped sessions and their plan trees accumulated
  * for the JVM lifetime). */
class MemoSpec extends SparkSpec {

  test("cached: builds once, hits return the same frame, evict forces rebuild") {
    var builds = 0
    def build() = { builds += 1; spark.range(10).withColumn("x", lit(1)) }
    val key = s"memo-spec-${System.nanoTime()}"
    val a = Memo.cached(spark, key)(build())
    val b = Memo.cached(spark, key)(build())
    assert(builds == 1, "second call must hit, not rebuild")
    assert(a eq b, "hit returns the SAME cached frame instance")
    Memo.evict(spark)
    val c = Memo.cached(spark, key)(build())
    assert(builds == 2, "evict must force the next call to rebuild")
    assert(c.count() == 10)
    Memo.evict(spark)
  }

  test("entries survive ordinary GC (soft, not weak, references)") {
    val key = s"memo-gc-${System.nanoTime()}"
    Memo.cached(spark, key)(spark.range(5).withColumn("y", lit(2)))
    // ordinary GC with a healthy heap must NOT clear soft references —
    // a weak-valued memo would lose the q60/q86 shared-CC benefit to
    // any full GC mid-bench
    System.gc(); Thread.sleep(50)
    var builds = 0
    val again = Memo.cached(spark, key) {
      builds += 1; spark.range(5).withColumn("y", lit(2))
    }
    assert(builds == 0,
      "a System.gc() with free heap must not evict soft-referenced entries")
    assert(again.count() == 5)
    Memo.evict(spark)
  }

  test("buildNanos ledger: builds count once at the outermost level, hits count nothing") {
    val k1 = s"memo-ledger-a-${System.nanoTime()}"
    val k2 = s"memo-ledger-b-${System.nanoTime()}"
    val before = Memo.buildNanos
    // nested build: k1's build reads k2 (the shingle-base-under-pairs
    // shape) — the ledger must charge the OUTER wall-clock once, not
    // outer + inner
    Memo.cached(spark, k1) {
      Memo.cached(spark, k2)(spark.range(1000).withColumn("y", lit(1)))
        .selectExpr("id", "y + 1 as z")
    }
    val afterBuild = Memo.buildNanos
    assert(afterBuild > before, "a build must move the ledger")
    // hits are free: reading both memoized frames charges nothing
    Memo.cached(spark, k1)(fail("must not rebuild"))
    Memo.cached(spark, k2)(fail("must not rebuild"))
    assert(Memo.buildNanos == afterBuild,
      "memo hits must not move the build ledger")
    Memo.evict(spark)
  }
}
