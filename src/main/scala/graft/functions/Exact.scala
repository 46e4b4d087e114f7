package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic helpers for aggregations over double columns.
  *
  * Double summation is order-dependent, and a distributed engine gives
  * no ordering guarantee — the same query can produce last-ulp-different
  * sums run to run (and engine to engine). Queries that must be
  * bit-reproducible (the correctness oracle, incremental re-computation
  * checks) route money-like doubles through fixed-point decimals:
  * decimal addition is exact and therefore order-independent, so the
  * result is identical regardless of partitioning, AQE decisions, or
  * which engine computes it.
  *
  * The input data is price/discount/tax-like with two decimal digits,
  * so a tight decimal cast loses nothing.
  */
object Exact {

  /** Cast to a fixed-point decimal; p/s sized by the caller so that
    * products stay within decimal(38, _) and remain exact. */
  def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))

  /** Exact, order-independent sum of a 2-decimal money column. */
  def sumMoney(c: Column): Column = sum(dec(c, 18, 2)).cast("double")

  /** Exact sum of extendedprice * (1 - discount): dec(12,2) * dec(4,2)
    * is exact at scale 4, well inside decimal(38). */
  def sumRevenue(price: Column, discount: Column): Column =
    sum(dec(price, 12, 2) * dec(lit(1.0) - discount, 4, 2)).cast("double")

  /** Exact sum of price * (1 - discount) * (1 + tax), scale 6. */
  def sumCharge(price: Column, discount: Column, tax: Column): Column =
    sum(dec(price, 12, 2) * dec(lit(1.0) - discount, 4, 2) * dec(lit(1.0) + tax, 4, 2))
      .cast("double")

  /** Mean as exact-sum / count — both engines then divide the same two
    * exact values, giving the same double. */
  def avgMoney(c: Column): Column =
    (sum(dec(c, 18, 2)).cast("double") / count(lit(1)))
}
