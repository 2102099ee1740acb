package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Evaluation, Events, Extras, Graph, Layout, NorthStar, Relational, Similarity, Stats, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared capability inventory (SURVEY.md §2.3); every
  * entry with an `oracleSql` twin is hash-checked against DuckDB at sf0.01.
  * Entries without an oracle are engine-only (rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q04: 5-way broadcast star join with exact-decimal revenue aggregation.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Events.queries ++ Text.queries ++ Similarity.queries ++
      NorthStar.queries ++ Extras.queries ++ Graph.queries ++ Stats.queries ++ Layout.queries ++ Evaluation.queries ++
      graft.streaming.Windows.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted keys are engine-only → weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Events.oracles ++ Text.oracles ++ Similarity.oracles ++
      NorthStar.oracles ++ Extras.oracles ++ Graph.oracles ++ Stats.oracles ++ Layout.oracles ++ Evaluation.oracles ++
      graft.streaming.Windows.oracles
}
