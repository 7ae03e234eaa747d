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

  /** Order-independent sum of a double expression, as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Order-independent mean of a double expression, as double. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL (DuckDB) equivalent of [[dsum]] for oracle queries. */
  def sqlSum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(38,6))) AS DOUBLE)"

  /** SQL (DuckDB) equivalent of [[davg]] for oracle queries. */
  def sqlAvg(e: String): String =
    s"(${sqlSum(e)} / COUNT($e))"
}
