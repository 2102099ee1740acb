package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** q84 recursion-cost shoot-out in one JVM: scalar-subquery bound per level
  * vs bound carried through the recursion vs non-recursive sequence().
  */
object DebugQ84 {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugQ84") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, sfDir, "orders").createOrReplaceTempView("o")

    def variant(name: String)(sql: String): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = Seq.fill(3)(once()).min
      println(f"VARIANT $name%-20s $t%.3f s")
    }

    variant("subquery-per-level")(
      """WITH RECURSIVE months(m) AS (
        |  SELECT (SELECT date_trunc('month', MIN(o_orderdate)) FROM o)
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH FROM months
        |  WHERE m < (SELECT date_trunc('month', MAX(o_orderdate)) FROM o)),
        |agg AS (SELECT date_trunc('month', o_orderdate) AS mm, COUNT(*) AS n FROM o GROUP BY mm)
        |SELECT CAST(CAST(m AS DATE) AS STRING) AS month, CAST(coalesce(n, 0) AS BIGINT) AS n_orders
        |FROM months LEFT JOIN agg ON months.m = agg.mm ORDER BY month""".stripMargin)

    variant("carried-bound")(
      """WITH RECURSIVE bounds AS (
        |  SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
        |         date_trunc('month', MAX(o_orderdate)) AS hi FROM o),
        |months(m, hi) AS (
        |  SELECT lo, hi FROM bounds
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi),
        |agg AS (SELECT date_trunc('month', o_orderdate) AS mm, COUNT(*) AS n FROM o GROUP BY mm)
        |SELECT CAST(CAST(m AS DATE) AS STRING) AS month, CAST(coalesce(n, 0) AS BIGINT) AS n_orders
        |FROM months LEFT JOIN agg ON months.m = agg.mm ORDER BY month""".stripMargin)

    variant("sequence-explode")(
      """WITH bounds AS (
        |  SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
        |         date_trunc('month', MAX(o_orderdate)) AS hi FROM o),
        |months AS (SELECT explode(sequence(lo, hi, INTERVAL 1 MONTH)) AS m FROM bounds),
        |agg AS (SELECT date_trunc('month', o_orderdate) AS mm, COUNT(*) AS n FROM o GROUP BY mm)
        |SELECT CAST(CAST(m AS DATE) AS STRING) AS month, CAST(coalesce(n, 0) AS BIGINT) AS n_orders
        |FROM months LEFT JOIN agg ON months.m = agg.mm ORDER BY month""".stripMargin)

    spark.stop()
  }
}
