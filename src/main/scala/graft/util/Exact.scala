package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic helpers for oracle-parity aggregates.
  *
  * Summing doubles is order-dependent, and Spark's partition-parallel
  * aggregation visits rows in a different order than a single-threaded
  * oracle — so raw `sum(double)` is nondeterministic in its last ulps and
  * can hash-mismatch. The fix: cast money-like inputs to DECIMAL before
  * aggregating (exact, associative, order-independent), and only cast back
  * to double at the very end. The final decimal→double cast and any single
  * IEEE division are bit-identical across engines.
  *
  * This also holds at 100 TB: decimal sums don't accumulate float error as
  * partial aggregates merge across thousands of tasks.
  */
object Exact {
  /** Input column as exact decimal (money-like fixtures carry ≤2 dp). */
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  /** Exact decimal sum, returned as double. */
  def dsum(c: Column, scale: Int = 2): Column = sum(dec(c, scale)).cast("double")

  /** Exact mean: decimal sum divided by count, one IEEE division. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(dec(c, scale)).cast("double") / count(lit(1))
}
