package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Robustness sweep: every declared query runs against a corpus where a
  * slice of every nullable column is NULL — real crawls deliver null
  * text, null metadata, and null payloads, and an operator that throws
  * on them fails the whole 100 TB run instead of dropping the row. The
  * fixture tables themselves carry no nulls, so this sweep (not the
  * oracle gate) is what pins null tolerance.
  */
class NullCorpusSpec extends SparkSpec {

  test("declared queries survive nulls planted in every nullable column") {
    val dir = Files.createTempDirectory("graft_nulls").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      // null out every ~7th row's value in each non-key column (keys keep
      // the relational joins meaningful; a null key row is a DIFFERENT
      // test — dropped rows — not a crash test)
      val keys = Set("doc_id", "vec_id", "event_id", "o_orderkey",
        "l_orderkey", "c_custkey", "s_suppkey", "p_partkey", "n_nationkey",
        "r_regionkey", "user_id", "ts")
      val withNulls = df.columns.foldLeft(df) { (acc, c) =>
        if (keys(c)) acc
        else acc.withColumn(c,
          when(abs(hash(col(c), lit(c))) % 7 === 0, lit(null))
            .otherwise(col(c)))
      }
      withNulls.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
        }
    }
    assert(failures.isEmpty,
      s"queries crashed on a null-bearing corpus:\n${failures.mkString("\n")}")
  }
}
