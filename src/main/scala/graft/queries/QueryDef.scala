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
  * oracle. The scheme used throughout: scale each money value to an exact
  * integer ("cents") per row, aggregate exactly, and perform exactly one
  * float division at the end. Both engines then produce identical bits at
  * any parallelism — which is what makes the gate safe on a
  * 1000-executor cluster, not just local[32].
  *
  * Why cents-longs and not DECIMAL products: Spark's `Decimal.times` always
  * routes through java.math.BigDecimal (no compact-long fast path), which
  * measured ~4x slower than whole-stage-codegen'd long arithmetic on the
  * bench queries. Long multiply IS codegen'd; the only decimal op kept is
  * SUM's buffer add, which stays on the compact-long fast path (same
  * scale, both compact). The per-row `round(x*100)` is deterministic in
  * both engines (IEEE double ops on identical inputs; money inputs carry
  * exactly 2dp so the value never lands on a .5 boundary).
  *
  * Overflow: per-row cents products are bounded (≤ ~1.2e11 for the triple
  * product); the sum is accumulated as DECIMAL(38,0) (Spark) / HUGEINT
  * (DuckDB SUM(BIGINT)), both 128-bit-exact — safe at 100 TB row counts
  * where a plain long sum would wrap.
  */
object Q {
  /** Exact integer cents of a 2-dp money double (long, codegen'd).
    *
    * `floor(x*100 + 0.5)` rather than `round(x*100)`: Spark's Round on
    * doubles allocates a BigDecimal per row (measured ~3x the whole scan
    * cost), while floor compiles to a primitive `(long) Math.floor`.
    * For 2-dp money the two are identical — the scaled value sits within
    * ±0.5ulp-ish of an integer, never at an exact .5 — and DuckDB's
    * FLOOR is the same primitive IEEE op, so both engines agree bitwise.
    */
  def cents(c: Column): Column = floor(c * 100 + 0.5)

  /** Exact integer percent of a 2-dp fraction like l_discount/l_tax. */
  def pct(c: Column): Column = floor(c * 100 + 0.5)

  /** Overflow-safe exact sum of a long expression with PRIMITIVE per-row
    * cost. The r4-measured formulation `sum(c.cast(DecimalType(38,0)))`
    * pays a per-row long→Decimal cast + Decimal add inside the hash
    * aggregate — 2.2× the whole q02 runtime at 50× sf0.1, and per-row,
    * so it never amortizes. Instead split each long into hi/lo words
    * with primitive bit ops — `c = (c >> 20)·2^20 + (c & (2^20-1))`
    * exactly, any sign (two's complement) — sum both words as plain
    * codegen'd longs, and recombine in 128-bit Decimal once per GROUP.
    * Headroom: |hi| ≤ 2^43 for cents-cubed money values, so the hi sum
    * wraps only beyond ~1e12 rows PER GROUP; lo < 2^20 wraps beyond
    * ~8e12 rows per group — both orders of magnitude past any real
    * partition, and far past where the old per-partition Decimal
    * compact-long fast path would have degraded anyway.
    */
  def exactSum(c: Column): Column =
    sum(shiftright(c, 20)).cast(DecimalType(38, 0)) * (1L << 20) +
      sum(c.bitwiseAND(lit((1L << 20) - 1))).cast(DecimalType(38, 0))

  /** Order-insensitive SUM of a 2-dp money double, returned as DOUBLE. */
  def sumMoney(c: Column): Column =
    exactSum(cents(c)).cast("double") / 100

  /** DuckDB oracle spelling of [[sumMoney]] (SUM(BIGINT) is HUGEINT —
    * 128-bit exact, mirroring exactSum).
    */
  def sumMoneySql(col: String): String =
    s"CAST(SUM(CAST(FLOOR($col*100 + 0.5) AS BIGINT)) AS DOUBLE)/100"

  /** Order-insensitive AVG of a 2-dp money double, returned as DOUBLE
    * (exact integer sum, then one double division — deterministic).
    */
  def avgMoney(c: Column): Column =
    exactSum(cents(c)).cast("double") / 100 / count(lit(1))
}
