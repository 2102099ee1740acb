package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._


/** Co-located joins via bucketing: writing both join sides bucketed by the
  * join key lets the sort-merge join read pre-partitioned data with NO
  * exchange on either side — the layout investment that pays for repeated
  * fact-fact joins at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    // default warehouse dir (./spark-warehouse, gitignored) — the setting is
    // static and can't be changed on the shared test session
    spark.sql("DROP TABLE IF EXISTS li_b"); spark.sql("DROP TABLE IF EXISTS o_b")

    Tables(spark, sf0001, "lineitem")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    Tables(spark, sf0001, "orders")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not introduce exchanges: with both sides bucketed
    // on the key, only the aggregation's exchange remains
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected no join exchanges, got $exchanges:\n${plan.take(1200)}")
    assert(joined.count() === 5)

    spark.sql("DROP TABLE IF EXISTS li_b"); spark.sql("DROP TABLE IF EXISTS o_b")
  }

  test("q164: the declared bucketed join plans exchange-free on both sides") {
    // at test SF the sides fit the broadcast threshold, which would hide the
    // layout; at 100 TB both fact sides are far past it, so pin the plan the
    // big-data path takes: sort-merge over co-bucketed, pre-sorted scans
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    val (df, plan) =
      try {
        val df0 = Relational.q164BucketedJoin(spark, sf0001)
        (df0, df0.queryExecution.executedPlan.toString)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    // 8 matching buckets per side -> sort-merge join with NO exchange on
    // either side; only the aggregation may repartition. (The local per-side
    // Sort nodes remain: Spark >= 3.0 doesn't propagate bucket sort order
    // without spark.sql.legacy.bucketedTableScan.outputOrdering, and over
    // one pre-sorted file per bucket they are near-no-op streaming sorts —
    // the shuffle is what the layout eliminates.)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"join introduced exchanges:\n${plan.take(1500)}")
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n${plan.take(800)}")
    assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n${plan.take(1500)}")
    val rows = df.collect()
    assert(rows.length === 5 && rows.map(_.getLong(1)).sum > 0)
    spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_o_bucketed")
  }
}
