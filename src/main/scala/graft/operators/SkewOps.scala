package graft.operators

import graft.{GraftSession, Op, OpCatalog, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation techniques as first-class, result-identical operators.
  * AQE's skew-join split (enabled in `GraftSession.tune`) is the first
  * line of defense; explicit salting is the portable fallback when a key's
  * rows must still meet a replicated build side (e.g. one user owns 30% of
  * events). Salting changes the PLAN, never the RESULT — so the oracle is
  * the plain join.
  */
object SkewOps extends OpCatalog {

  // ---------------------------------------------------------------- q29
  /** Salted broadcast-free join: events (fact; user_id is the potentially
    * skewed key) ⋈ customer (dim). The dim side is exploded into
    * `salts` replicas, the fact side picks a DETERMINISTIC salt
    * (`event_id % salts` — not rand(), which would break retry/replay
    * determinism), so one hot user's rows spread over `salts` reducers.
    * Aggregation after the join collapses the salt again. */
  def saltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.tune(spark)
    val salts = 8
    val ev = Tables.events(spark, sfDir)
      .withColumn("salt", pmod(col("event_id"), lit(salts)).cast("int"))
    val dim = Tables.customer(spark, sfDir)
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    ev.join(dim,
        ev("user_id") === dim("c_custkey") && ev("salt") === dim("salt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(12,2)")), 2).cast("double")
          .as("sum_value"))
      .orderBy(col("c_mktsegment"))
  }

  private val saltedJoinSql =
    """SELECT c_mktsegment, count(*) AS n_events,
      |  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("q29_salted_join", saltedJoin, Some(saltedJoinSql),
      "skew-salted join (deterministic salt), result == plain join"))
}
