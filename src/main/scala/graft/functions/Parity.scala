package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric-parity helpers for the DuckDB correctness oracle.
  *
  * Double-precision SUMs are order-dependent (FP addition is not
  * associative), so a shuffle-order change — or a different engine —
  * produces a different last bit. We therefore aggregate money/ratio
  * columns in exact DECIMAL arithmetic (order-independent) and cast the
  * final value to double. The oracle SQL mirrors the exact same decimal
  * widths, so both engines produce bit-identical doubles.
  *
  * Widths are chosen so products stay under DuckDB's 38-digit cap:
  * price(12,4) * rate(7,4) * rate(7,4) = 34 digits max.
  */
object Parity {
  /** price / quantity-like columns: 8 integer digits, 4 fractional. */
  def decP(c: Column): Column = c.cast(DecimalType(12, 4))

  /** rate-like columns (discount, tax) in [0, 2): 2 int digits. */
  def decR(c: Column): Column = c.cast(DecimalType(6, 4))

  /** literal 1 at rate width (so 1 - discount is DECIMAL(7,4)). */
  val oneR: Column = lit(1).cast(DecimalType(6, 4))

  /** exact decimal SUM surfaced as double. */
  def dsum(c: Column): Column = sum(c).cast(DoubleType)

  /** average as double-division of an exact decimal sum by a count —
    * both engines divide the same two numbers, bit-identical result. */
  def davg(c: Column): Column = sum(c).cast(DoubleType) / count(lit(1))
}
