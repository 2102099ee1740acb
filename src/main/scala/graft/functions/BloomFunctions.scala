package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Cast}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.LongType

/** Registry surface for Spark's own bloom-filter expressions — the pair the
  * optimizer's InjectRuntimeFilter rule uses internally, exposed as callable
  * functions so a query can declare the bloom-prefilter join pattern
  * EXPLICITLY: build a compact bloom over the selective (dim) side's keys as
  * a scalar subquery, apply `might_contain` on the fact side BEFORE its
  * shuffle, and close the bloom's false positives with the exact join.
  *
  * At 100 TB this is the difference between shuffling every fact row and
  * shuffling only candidate rows: the bloom (a few MB, built from the dim
  * side) broadcasts to every scan task and prunes at the source. Both
  * expressions are codegen'd Catalyst natives (XXH64-based), not UDFs.
  *
  * `graft_bloom_contains`' filter argument must be a scalar subquery or a
  * literal (the expression's own input check) — invoke through `spark.sql`
  * with the bloom built in a scalar subquery.
  */
object BloomFunctions {

  val AggName = "graft_bloom_agg"
  val ContainsName = "graft_bloom_contains"

  /** Idempotently register both bloom functions in this session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      AggName,
      {
        case Seq(child) => new BloomFilterAggregate(child)
        // SQL integer literals parse as INT; the aggregate requires BIGINT
        case Seq(child, est) => new BloomFilterAggregate(child, Cast(est, LongType))
        case other => throw new IllegalArgumentException(
          s"$AggName takes (keyCol[, estimatedNumItems]); got ${other.length} args")
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ContainsName,
      {
        case Seq(bloom, value) => BloomFilterMightContain(bloom, value)
        case other => throw new IllegalArgumentException(
          s"$ContainsName takes (bloom, value); got ${other.length} args")
      },
      "built-in")
  }
}
