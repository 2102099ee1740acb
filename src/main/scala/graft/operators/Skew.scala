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

  /** Salt-decomposable aggregates: (partial on the value, merge of partials).
    * The whitelist IS the guard — anything outside it is rejected before the
    * nondeterministic salt can silently mis-aggregate it.
    */
  private val decomposable: Map[String, (Column => Column, Column => Column)] = Map(
    "sum" -> ((v: Column) => sum(v.cast(org.apache.spark.sql.types.DecimalType(18, 4))),
      (p: Column) => sum(p).cast("double")),
    "count" -> ((v: Column) => count(v), (p: Column) => sum(p)),
    "min" -> ((v: Column) => min(v), (p: Column) => min(p)),
    "max" -> ((v: Column) => max(v), (p: Column) => max(p)))

  /** General two-phase salted aggregation over a whitelist of associative,
    * salt-decomposable aggregates. Output: one row per key with `<agg>_v`
    * per requested aggregate. Misuse THROWS: requesting any aggregate
    * outside {sum, count, min, max} (avg, median, first, collect_list, …)
    * raises IllegalArgumentException instead of returning silently wrong
    * results under the nondeterministic salt.
    */
  def saltedAgg(df: DataFrame, key: Column, value: Column,
                aggs: Seq[String], salts: Int = 16): DataFrame = {
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    val unknown = aggs.filterNot(decomposable.contains)
    require(unknown.isEmpty,
      s"saltedAgg supports only associative, salt-decomposable aggregates " +
        s"${decomposable.keys.toSeq.sorted.mkString("{", ", ", "}")}; rejected: " +
        s"${unknown.mkString(", ")}. Non-decomposable aggregates would be " +
        "silently wrong under the nondeterministic salt — use a deterministic " +
        "salt (e.g. pmod(hash(id), salts)) and a re-grouping-safe merge instead.")
    val salted = df.select(key.as("key"), value.as("v"),
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).as("salt"))
    val partials = aggs.map(a => decomposable(a)._1(col("v")).as(s"p_$a"))
    val partial = salted.groupBy(col("key"), col("salt"))
      .agg(partials.head, partials.tail: _*)
    val finals = aggs.map(a => decomposable(a)._2(col(s"p_$a")).as(s"${a}_v"))
    partial.groupBy(col("key")).agg(finals.head, finals.tail: _*)
  }

  /** Salted equi-JOIN for a skewed probe side: the probe gets a
    * DETERMINISTIC salt (`pmod(saltSrc, salts)` — pass a stable row id, so
    * retries re-salt identically), the build side is replicated `salts`×,
    * and the join runs on (key, salt) — one hot key's probe rows spread
    * over `salts` reducers instead of serializing on one. Correct for any
    * 1:N equi-join (every probe row still meets every matching build row,
    * exactly once, in its salt slice). Use where AQE's skew splitting can't
    * reach: it only splits sort-merge shuffle partitions post-hoc, not
    * broadcast-ineligible hash joins mid-pipeline, and replication cost is
    * `salts × |build|` — keep the build side the small one.
    */
  def saltedJoin(probe: DataFrame, probeKey: Column, saltSrc: Column,
                 build: DataFrame, buildKey: Column, salts: Int = 8): DataFrame = {
    require(salts > 0, "salts must be positive")
    val p = probe.withColumn("__salt", pmod(saltSrc, lit(salts)))
    val b = build.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    p.join(b, p("__salt") === b("__salt") && probeKey === buildKey)
      .drop("__salt")
  }
}
