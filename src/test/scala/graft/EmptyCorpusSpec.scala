package graft

import java.nio.file.Files

/** Robustness sweep: every declared query runs against a ZERO-ROW corpus
  * (all ten tables present with their real schemas, no data). At 100 TB an
  * empty source, an empty partition, or a filter that eliminates
  * everything is routine — an analytics operator that THROWS there turns
  * a boring empty report into a failed pipeline run.
  *
  * Trained/probe operators that by definition need at least one row to
  * exist (a query vector, a codebook, a seeded coreset) are allowlisted
  * with the exception they raise — the sweep pins that the set never
  * grows silently.
  */
class EmptyCorpusSpec extends SparkSpec {

  test("declared queries survive a zero-row corpus (allowlisted trained ops excepted)") {
    val dir = Files.createTempDirectory("graft_empty").toString
    Tables.names.foreach { t =>
      val schema = spark.read.parquet(s"$sfDir/$t.parquet").schema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // Ops that REQUIRE data to define their own parameters. The sweep
    // found every other trained op already degrades to an empty result
    // (query vectors / codebooks / BPE rules derive from bounded frames
    // that simply come back empty); only the greedy coreset driver-side
    // seeds from `head()` of the corpus.
    val needsData: Set[String] = Set(
      "q98_diversity_coreset",    // greedy k-center seed = a corpus row
      // the nightly BOOTSTRAP trains IVF/PQ codebooks — zero vectors
      // cannot define a codebook (PqIndex requires a positive dim), the
      // same class of exception FAISS raises on an empty train set
      "q145_nightly_stats",
      "q146_nightly_bm25",
      // served through the same two-night artifact: no nights can run
      // on zero vectors, so no pin exists to resolve
      "q149_night_pin_read")
    val outcomes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val r = try { fn(spark, dir).collect(); None }
      catch { case e: Throwable => Some(e.getClass.getSimpleName) }
      (name, r)
    }
    val unexpected = outcomes.collect {
      case (n, Some(err)) if !needsData(n) => s"$n: $err"
    }
    assert(unexpected.isEmpty,
      s"queries crashed on an empty corpus:\n${unexpected.mkString("\n")}")
    // the allowlist must stay honest in both directions: everything on it
    // actually needs data (fails empty), or it should come off the list
    val healed = outcomes.collect { case (n, None) if needsData(n) => n }
    assert(healed.isEmpty,
      s"allowlisted ops now survive empty input — remove from list: $healed")
  }
}
