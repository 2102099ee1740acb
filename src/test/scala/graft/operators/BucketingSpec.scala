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
}
