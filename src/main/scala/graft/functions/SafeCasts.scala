package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's permissive scalar-coercion library re-expressed as native
  * `Column` expressions (no UDFs — everything stays inside whole-stage
  * codegen). Semantics follow reference transform.py:12-47 (SURVEY §2.9
  * C8–C17); deliberate deviations are documented per SURVEY §2.12.
  */
object SafeCasts {

  /** C9 `safe_bool` (transform.py:19-27): null→null; a string is true iff
    * lower(s) ∈ {"true","1","yes"}; anything else false. Spark's native
    * `cast("boolean")` maps "yes"→null, so this must stay a when-chain.
    */
  def safeBool(c: Column): Column =
    when(c.isNull, lit(null).cast("boolean"))
      .when(lower(c.cast("string")).isin("true", "1", "yes"), lit(true))
      .otherwise(lit(false))

  /** C10 `safe_numeric` (transform.py:30-37): float(x) else null. `try_cast`
    * returns null on malformed input under BOTH ANSI modes (Spark 4 defaults
    * ANSI on, where a plain cast would throw) — an exact match. */
  def safeNumeric(c: Column): Column = c.try_cast("double")

  /** C11 `safe_int` (transform.py:40-47): int(x) else null. Numeric input
    * truncates (int(3.9)→3 ≡ cast long); string "3.5" → null on both sides. */
  def safeLong(c: Column): Column = c.try_cast("long")

  /** C15 (transform.py:167,257): current version ⇔ no end timestamp. */
  def isCurrent(endAt: Column): Column = endAt.isNull

  /** C16 (transform.py:221-224): null-coalesced aggregate counters. */
  def zeroIfNull(c: Column): Column = coalesce(c, lit(0))

  /** C5 minutes variant (extract.py:172-175): EXTRACT(EPOCH FROM t2-t1)/60
    * rounded to 2dp. Whole-second precision suffices for minutes. */
  def durationMinutes(start: Column, end: Column): Column =
    round((unix_timestamp(end) - unix_timestamp(start)) / 60.0, 2)

  /** C5 seconds variant (extract.py:216-219): 3dp needs sub-second precision,
    * so a double cast of the timestamp — `unix_timestamp` truncates. */
  def durationSeconds(start: Column, end: Column): Column =
    round(end.cast("double") - start.cast("double"), 3)

  // ---------------------------------------------------------------------
  // Cross-engine-deterministic aggregation (house style, SURVEY §7.5).
  //
  // Summing doubles is order-dependent, and Spark's partial/final aggregate
  // order differs run-to-run and engine-to-engine — a hash-compared oracle
  // would flake. Casting each addend to a decimal makes the sum exact and
  // therefore order-independent; the final cast back to double is then a
  // single deterministic conversion. At 100 TB this is also the right
  // answer for money columns: exact, overflow-checked, still codegen'd.
  // ---------------------------------------------------------------------

  /** Order-independent sum of a double column, exact at `scale` decimals. */
  def decimalSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Order-independent mean: exact decimal sum divided by count. */
  def decimalAvg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)

  /** Single-pass, per-row equivalent of [[decimalSum]] over an array<double>:
    * each element goes through the SAME `Cast(double → decimal(18,scale))`
    * the aggregate form uses (so cross-engine rounding agreement carries
    * over verbatim), and exact decimal addition makes the fold equal to any
    * other exact summation of those terms. This replaces the
    * explode → shuffle → re-aggregate pattern for vector math: one narrow
    * map instead of a dim× row inflation. Higher-order functions are
    * interpreted (not codegen'd), but the work is O(dim) per row with no
    * shuffle — the trade you want at scale. */
  def decimalSumArr(arr: Column, scale: Int = 2): Column =
    // accumulator at precision 37 so each Add promotes to exactly (38,scale)
    // — at 38 the promotion would overflow the cap and silently DROP a scale
    // digit (38,scale-1), losing exactness. The cast back to (37,scale) is
    // exact for any sum under 10^(37-scale), far beyond these workloads.
    aggregate(arr,
      lit(0).cast(DecimalType(37, scale)),
      (acc, x) =>
        (acc + x.cast(DecimalType(18, scale))).cast(DecimalType(37, scale)))
      .cast("double")
}
