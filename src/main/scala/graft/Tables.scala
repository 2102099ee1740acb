package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file per scale factor; at cluster scale the
  * same code reads a directory of many files — `spark.read.parquet` handles
  * both, and all pruning/pushdown flows from the declarative plan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with a D4-canonical `ts2` column: the nanosecond-precision `ts`
    * truncated to whole seconds as a timestamp.
    *
    * Spark 4 rejects TIMESTAMP(NANOS) parquet unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by [[Engine]] /
    * Verify / Bench sessions), which surfaces `ts` as BIGINT epoch-nanos.
    * Conversion uses integral DIV — a double division would lose precision
    * above 2^53 ns (~104 days past epoch).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    val ts2 = raw.schema("ts").dataType match {
      case LongType => timestamp_seconds(expr("ts DIV 1000000000"))
      case _        => date_trunc("second", col("ts"))
    }
    raw.withColumn("ts2", ts2)
  }
}
