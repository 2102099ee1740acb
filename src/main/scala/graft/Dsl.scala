package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers shared by every declared query (SURVEY.md §2.3 D1-D6).
  *
  * The DuckDB oracle hash-compares values, so every floating-point aggregate
  * must be an order-independent exact computation surfaced as a deterministic
  * double, and every temporal output must round-trip identically through both
  * engines' string casts.
  */
object Dsl {

  /** D3: cast monetary/double inputs to exact decimal BEFORE aggregation so the
    * sum is associative and independent of partitioning / parallelism.
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact decimal sum surfaced as double — `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`. */
  def moneySum(c: Column): Column = sum(dec(c)).cast("double")

  /** Narrower decimal for exact multi-factor products: (12,4)·(12,4) → (25,8)
    * → ·(12,4) → (38,12), all within decimal limits, so products of 2-decimal
    * monetary factors are computed EXACTLY. Casting the double product instead
    * would round at the (18,4) boundary, where engines' double→decimal
    * rounding (Spark HALF_UP on shortest string vs DuckDB binary-nearest)
    * disagrees on true midpoints.
    */
  def dec12(c: Column): Column = c.cast(DecimalType(12, 4))

  /** Exact `price · (1 − discount)` revenue term as decimal. */
  def revenueTerm(price: Column, discount: Column): Column =
    dec12(price) * dec12(lit(1) - discount)

  /** Exact `price · (1 − discount) · (1 + tax)` charge term as decimal. */
  def chargeTerm(price: Column, discount: Column, tax: Column): Column =
    dec12(price) * dec12(lit(1) - discount) * dec12(lit(1) + tax)

  /** High-scale decimal sum → double, deterministically: first reduce to scale
    * 4 IN DECIMAL SPACE (exact midpoints round half-up in both engines), then
    * cast. A direct DECIMAL(38,8+)→DOUBLE cast differs by 1 ulp between
    * engines (DuckDB divides an int128 by 10^scale in doubles; Java rounds the
    * decimal correctly); at scale 4 the scaled integer is < 2^53 so both
    * conversions are exactly correct. Oracle twin:
    * `CAST(CAST(SUM(...) AS DECIMAL(38,4)) AS DOUBLE)`.
    */
  def sumExactDouble(term: Column): Column =
    sum(term).cast(DecimalType(38, 4)).cast("double")

  /** Deterministic average: exact decimal sum cast to double, divided by count.
    * Oracle twin: `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)`.
    */
  def moneyAvg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  /** D4: `events.ts` is nanosecond-precision parquet (Spark truncates to micros,
    * DuckDB keeps ns) — truncate to whole seconds before any use.
    */
  def tsec(c: Column): Column = date_trunc("second", c)

  /** Timestamp → epoch seconds (exact on second-truncated inputs). */
  def epochSec(c: Column): Column = c.cast("long")

  /** Midnight-only timestamp (o_orderdate / l_shipdate) → `yyyy-MM-dd` string,
    * identical to DuckDB's `CAST(CAST(x AS DATE) AS VARCHAR)`.
    */
  def dateStr(c: Column): Column = c.cast("date").cast("string")

  /** Timestamp → `yyyy-MM-dd HH:mm:ss` string (fraction-free after tsec/date_trunc),
    * identical in both engines' VARCHAR casts.
    */
  def tsStr(c: Column): Column = c.cast("string")

  /** Output-type discipline: integral outputs are always BIGINT (Spark int32
    * results like `year()`/`row_number()` would otherwise schema-mismatch
    * DuckDB's int64).
    */
  def big(c: Column): Column = c.cast("long")
}
