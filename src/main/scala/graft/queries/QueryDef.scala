package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.functions._

/** One correctness-gate query: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle statement over the same
  * parquet tables. `headline=true` marks it for the bench set.
  */
final case class QueryDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** Shared helpers for oracle-deterministic arithmetic.
  *
  * Double summation is order-dependent, and Spark's shuffle order differs
  * from DuckDB's scan order — so any `SUM(double)` would hash-mismatch the
  * oracle. The fix used throughout: round each element to an exact
  * DECIMAL first (deterministic per-row), aggregate exactly, and cast the
  * final value back to DOUBLE. Both engines then produce identical bits,
  * at any parallelism — this property is what makes the whole gate safe on
  * a 1000-executor cluster, not just on local[32].
  */
object Q {
  /** Exact 2-dp decimal view of a money-ish double column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact small-scale factor like (1 - l_discount). */
  def fac2(c: Column): Column = c.cast(DecimalType(8, 2))

  /** Order-insensitive SUM of a 2-dp double, returned as DOUBLE. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast("double")

  /** Order-insensitive AVG of a 2-dp double, returned as DOUBLE
    * (exact decimal sum, then one double division — deterministic).
    */
  def avgMoney(c: Column): Column =
    (sum(dec2(c)).cast("double") / count(lit(1)))
}
