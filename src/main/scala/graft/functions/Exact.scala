package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Order-independent (exact) aggregation helpers.
  *
  * Summing IEEE doubles is order-dependent, and a distributed engine sums in
  * partition order while a single-threaded oracle sums sequentially — the
  * results differ in the last ULP and any hash comparison fails. Casting each
  * addend to a fixed-scale decimal makes the sum exact and therefore
  * order-independent; casting the exact decimal result back to double is a
  * single deterministic IEEE rounding that any engine performs identically.
  *
  * The same trick makes the engine's own results stable run-to-run at any
  * cluster size / partitioning — valuable far beyond oracle parity.
  */
object Exact {

  /** Exact sum of a double expression, carrying `scale` decimal digits. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(38, scale))).cast(DoubleType)

  /** Exact running/window sum (caller applies `.over(w)` on the result of
    * `sum`); kept here for symmetry.
    */
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(38, scale))

  /** Exact average = exact sum / count, computed in double at the end. */
  def davg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(38, scale))).cast(DoubleType) / count(lit(1)))
}
