package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Cross-engine decimal rounding for oracle-checked doubles.
  *
  * Every double this engine emits is hash-compared against a DuckDB
  * replay of the same query, and many rank keys are rounded doubles
  * (the q63 rule: rank on the exact value you output). That contract
  * needs ONE rounding definition both engines — and driver-side Scala —
  * compute bit-identically, and SQL `round` is NOT it:
  *
  *   - Spark `round(DOUBLE, n)` HALF_UPs the SHORTEST-DECIMAL rendering
  *     of the double (`BigDecimal.valueOf(x).setScale(n, HALF_UP)`).
  *   - DuckDB `round(DOUBLE, n)` computes `std::round(x·10^n)/10^n`.
  *
  * The two genuinely disagree on half-way doubles: `round(0.00015::
  * DOUBLE, 4)` is 0.0002 in Spark (shortest decimal "1.5E-4" → half-up)
  * but 0.0001 in DuckDB (0.00015·10⁴ = 1.4999999999999998 → rounds
  * down; empirically confirmed on Spark 4.1.2 / DuckDB). Integer ratios
  * land on exactly those doubles (3/20000 IS 0.00015), and shares /
  * rates / jaccards of exact integer counts are this engine's most
  * common emitted double — so a SQL-`round` output can hash-mismatch,
  * and a SQL-`round` rank key can flip a pick, even when both engines
  * computed bit-identical inputs.
  *
  * The floor form `floor(x·10^n + 0.5)` is one multiply, one add and
  * one floor — identical IEEE ops on Spark executors (primitive
  * codegen, no per-row BigDecimal allocation like Spark's `Round`), in
  * DuckDB, and in driver-side `math.floor`. The key is bit-stable
  * cross-engine whenever the input double is; a last-ulp input
  * difference (e.g. differing float-sum orders) can still flip it only
  * when the value lands on an exact unit boundary — probability ~2⁻⁵²,
  * vs `round`'s deterministic divergence on a whole value class.
  * Convention: half-way values round toward +∞ (not away from zero);
  * negative-capable callers (cosines, share shifts) inherit that on
  * both sides symmetrically.
  */
object Rounding {

  /** Half-up rounding to `scale` decimals as an integer rank key:
    * `floor(x·10^scale + 0.5)` (LONG-typed in Spark). */
  def roundKey(c: Column, scale: Int): Column =
    floor(c * math.pow(10, scale) + 0.5)

  /** [[roundKey]] scaled back to a decimal value — for OUTPUT columns
    * hashed by the driver's oracle compare. */
  def roundVal(c: Column, scale: Int): Column =
    roundKey(c, scale) / math.pow(10, scale)

  /** DuckDB twin of [[roundKey]] for oracle SQL. */
  def roundKeySql(e: String, scale: Int): String =
    s"floor(($e) * 1e$scale + 0.5)"

  /** DuckDB twin of [[roundVal]] for oracle SQL. */
  def roundValSql(e: String, scale: Int): String =
    s"(floor(($e) * 1e$scale + 0.5) / 1e$scale)"

  /** Driver-side twin of [[roundVal]] — same IEEE ops as the Column and
    * SQL forms, so a value computed on the driver (e.g. q98's radius)
    * equals the one either engine would emit for the same double. */
  def roundValDouble(x: Double, scale: Int): Double = {
    val p = math.pow(10, scale)
    math.floor(x * p + 0.5) / p
  }
}
