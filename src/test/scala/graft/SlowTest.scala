package graft

/** Marker for planted-scale / lifecycle-soak tests that dominate the
  * suite's wall clock (round-14 verdict item 2: the default `sbt test`
  * outgrew the driver's verify budget — a gate that times out can hide a
  * real red). Tagged tests are EXCLUDED from the default `sbt test`
  * (see `Test / testOptions` in build.sbt) and run explicitly via
  *
  *   SPARK_GRAFT_SLOW_TESTS=1 sbt test            // everything
  *   sbt "testOnly * -- -n graft.SlowTest"        // only the soaks
  *
  * Tag ONLY tests whose subject is scale behavior already covered at a
  * smaller planted size by an untagged sibling, or whose runtime is
  * dominated by fixture construction — never the sole test of a
  * correctness law.
  */
object SlowTest extends org.scalatest.Tag("graft.SlowTest")
