package graft

import java.nio.file.Files

import graft.operators.{PqIndex, VectorOps}
import org.apache.spark.sql.functions._

/** The offline PQ artifact must serve the SAME answers as q117's
  * in-query path, from a 64×-smaller scan. */
class PqIndexSpec extends SparkSpec {

  private lazy val e = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"))

  test("build -> probe == q117's in-query top-10; codes artifact well-formed") {
    val path = Files.createTempDirectory("graft_pq_idx").toString
    PqIndex.build(e, path)

    // artifact shape: dense positional codes, full coverage, m*k bound
    val cb = spark.read.parquet(s"$path/codebook")
    assert(cb.count() <= PqIndex.M.toLong * PqIndex.K)
    assert(cb.select(countDistinct(col("sub"))).head().getLong(0) == PqIndex.M)
    val codes = spark.read.parquet(s"$path/codes")
    val n = e.filter(col("vec_id") =!= 0).count()
    assert(codes.count() == n, "every corpus vector must be encoded")
    val bad = codes.filter(size(col("codes")) =!= PqIndex.M ||
      exists(col("codes"), c => c < 0 || c >= PqIndex.K)).count()
    assert(bad == 0, s"$bad malformed code rows")

    // identical serving answer: training is deterministic, encode argmin
    // and the in-row argmin share the lowest-cell tiebreak
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val fromIndex = PqIndex.probe(spark, path, qv, e).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val inQuery = VectorOps.pqAdcTopKOf(e, spark, memoKey = None).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(fromIndex == inQuery,
      s"artifact probe diverged from q117:\n$fromIndex\n$inQuery")

    // the shortlist stage reads ONLY the codes table: no embedding column
    // in its scan schema, no join below the shortlist limit
    val ids = spark.read.parquet(s"$path/codes").columns.toSeq
    assert(ids == Seq("vec_id", "codes"),
      "codes artifact must hold nothing but ids and codes")
  }

  test("q131 declared form: exact top-10 + green flags; identity-keyed artifact reused, not rebuilt") {
    val law = VectorOps.pqIndexProbe(spark, sfDir).collect()
    assert(law.length == 10)
    assert(law.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      "recall_ok/score_ok must hold on the fixture")
    val marker = VectorOps.pqArtifactDir(sfDir)
      .resolve("codes").resolve("_SUCCESS")
    val mtime = java.nio.file.Files.getLastModifiedTime(marker).toMillis
    val again = VectorOps.pqIndexProbe(spark, sfDir).collect()
    assert(again.map(_.toSeq).toSeq == law.map(_.toSeq).toSeq)
    assert(java.nio.file.Files.getLastModifiedTime(marker).toMillis == mtime,
      "second probe must reuse the artifact, not rebuild it")
  }
}
