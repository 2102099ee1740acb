package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot grouping keys.
  *
  * AQE's skew-join splitting handles joins at runtime; for AGGREGATIONS over
  * a heavily skewed key the classic fix is two-phase salting: shuffle on
  * (key, salt) first so a hot key spreads over `salts` reducers, then reduce
  * the partial results on the key alone. Correct for any associative,
  * salt-decomposable aggregate (sum/count/min/max — the decimal money sums
  * included, which is exactly why D3 mandates them).
  */
object Skew {

  /** Two-phase salted sum+count aggregation: returns one row per key with
    * `sum_<value>` (exact decimal surfaced as double) and `cnt`.
    *
    * CONTRACT — associative aggregates only. The salt
    * (`spark_partition_id() + monotonically_increasing_id()`) is
    * NONDETERMINISTIC across runs/retries: the partial grouping differs
    * between executions, which is invisible to sum/count/min/max (salt-
    * decomposable — any partial grouping folds to the same total, and the
    * decimal sum is order-independent) but would be silently wrong for
    * non-decomposable aggregates (median, first-value, collect_list order).
    * Do not extend this helper with such aggregates; give them a
    * deterministic salt (e.g. `pmod(hash(idCols), salts)`) and a merge step
    * that is correct under re-grouping.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     salts: Int = 16): DataFrame = {
    val salted = df.select(key.as("key"), value.as("v"),
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).as("salt"))
    val partial = salted
      .groupBy(col("key"), col("salt"))
      .agg(sum(col("v").cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("psum"),
        count(lit(1)).as("pcnt"))
    partial
      .groupBy(col("key"))
      .agg(sum(col("psum")).cast("double").as("sum_v"), sum(col("pcnt")).as("cnt"))
  }
}
