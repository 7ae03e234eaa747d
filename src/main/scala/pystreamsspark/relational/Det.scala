package pystreamsspark.relational

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for oracle-compared float aggregates (SURVEY.md §7.5).
  *
  * `sum(double)` is reduction-order dependent: a 32-partition Spark plan and
  * single-threaded DuckDB disagree in ulps, and for 1e9-magnitude sums the
  * wobble can cross a round(x, 2) boundary. Instead we cast each addend to
  * DECIMAL(38,6) — decimal addition is exact and order-independent in both
  * engines — then cast the exact sum back to double (deterministic nearest
  * rounding). Result: bit-identical doubles on both sides, at any partition
  * count, at any scale. This is also how you'd write it for a 100 TB run:
  * decimal partial aggregation is codegen'd and exact.
  */
object Det {
  private val D = DecimalType(38, 6)

  /** Correctly-rounded decimal→double via a string round-trip, paired
    * with the STRING route in [[sqlSum]].
    *
    * When the unscaled value exceeds 2^53, a conversion that divides two
    * separately-rounded doubles ((double)unscaled / (double)10^scale)
    * double-rounds up to 1 ulp off. Measured on a 17-digit sum of
    * squares (q_corr_manual's syy, 7096786968835.8685): DUCKDB's direct
    * decimal→double cast takes that path and lands 1 ulp high, while
    * Spark's cast (BigDecimal.doubleValue → Double.parseDouble fallback)
    * is correctly rounded — pinned by DetSpec. Routing BOTH sides
    * through a string→double parse (correctly rounded in both engines)
    * makes the pair bit-identical by construction instead of by luck.
    * The extra cast runs once per GROUP, after aggregation — free at any
    * scale. */
  def d2d(c: Column): Column = c.cast("string").cast("double")

  /** Order-independent sum of a double expression, as double. */
  def dsum(c: Column): Column = d2d(sum(c.cast(D)))

  /** Order-independent mean of a double expression, as double. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL equivalent of [[dsum]] for oracle queries. `STRING` (not
    * VARCHAR) because some queries share one SQL text between engines:
    * DuckDB treats STRING as a VARCHAR alias, and Spark's parser only
    * accepts VARCHAR with a length. */
  def sqlSum(e: String): String =
    s"CAST(CAST(SUM(CAST(($e) AS DECIMAL(38,6))) AS STRING) AS DOUBLE)"

  /** [[sqlSum]] at scale 20 — EXACT (no per-element rounding at all)
    * for FLOAT-derived values of magnitude >= 512: a float's fractional
    * granularity there is >= 2^-14, and every such dyadic is an exact
    * DECIMAL(38,20). Needed because float-promoted doubles land exactly
    * ON the scale-6 rounding tie (odd multiples of 2^-7 in the
    * [2^16, 2^17) range), where Spark's HALF_UP and DuckDB's tie rule
    * disagree — q_evolve_widen's float lineage hit it. */
  def sqlSumF(e: String): String =
    s"CAST(CAST(SUM(CAST(($e) AS DECIMAL(38,20))) AS STRING) AS DOUBLE)"

  /** SQL (DuckDB) equivalent of [[davg]] for oracle queries. */
  def sqlAvg(e: String): String =
    s"(${sqlSum(e)} / COUNT($e))"
}
