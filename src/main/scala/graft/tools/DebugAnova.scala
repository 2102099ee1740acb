package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: dump q501's per-group moment relation to adjudicate the
  * ANOVA oracle mismatch (wave-86 bring-up).
  */
object DebugAnova {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.Tables(spark, sf, "orders")
      .join(graft.Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"), col("o_orderpriority").as("p"),
        (graft.Dsl.dec(col("o_totalprice")) * 100).cast("long").as("cc"))
      .select(col("g"), col("p"), expr("cc DIV 100000").as("y"))
    base.agg(sum(col("y")), sum(col("y") * col("y")), min(col("y")),
      max(col("y")), count(lit(1))).show(false)
    base.groupBy(col("g")).agg(count(lit(1)).as("ng"),
      sum(col("y")).cast("long").as("sg"),
      sum(col("y") * col("y")).cast("long").as("qg")).orderBy(col("g")).show(false)
    spark.stop()
  }
}
