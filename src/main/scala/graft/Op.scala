package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine operator.
  *
  * @param name   stable key, used by the driver (`SparkEntry.queries`)
  * @param build  Spark DataFrame builder `(session, sfDir) => result`
  * @param oracle equivalent DuckDB SQL over the same parquet tables, when
  *               the operator is exactly SQL-expressible and deterministic
  *               (SURVEY.md §2.3 declared-oracle rule). `None` means the
  *               driver records a weaker rows-only check and correctness is
  *               covered by ScalaTest specs instead.
  * @param doc    one-line description for humans / the judge
  * @param whyNoOracle REQUIRED for rows-only ops (enforced by
  *               `SparkEntry.ops`): why no DuckDB oracle can exist and
  *               which spec carries correctness instead — the label is
  *               rendered into OPERATORS.md so a permanent rows-only row
  *               is never silent about what vouches for it
  */
final case class Op(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    doc: String = "",
    whyNoOracle: String = "")

/** A group of related operators (relational, events, text, vectors, ...). */
trait OpCatalog {
  def ops: Seq[Op]
}
