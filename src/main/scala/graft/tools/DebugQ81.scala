package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q81 cost breakdown in one JVM: edge build vs checkpoint vs iteration
  * chain, plus formulation variants (no-distinct multigraph semantics are
  * NOT equivalent — measured only to locate the cost, not as a candidate).
  */
object DebugQ81 {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugQ81") {
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

    def li = Tables(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_partkey"))

    def edges: DataFrame =
      li.select(col("l_orderkey"), col("l_partkey").as("src"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("dst")), Seq("l_orderkey"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
        .distinct()

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f; val t1 = System.nanoTime()
      val t2 = System.nanoTime(); f; val t3 = System.nanoTime()
      println(f"STEP $name%-28s ${math.min(t1 - t0, t3 - t2) / 1e9}%.3f s")
    }

    time("edge-build count") { edges.write.format("noop").mode("overwrite").save() }

    time("edge-build + deg + ckpt") {
      val e = edges
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      e.join(deg, Seq("src")).localCheckpoint().count()
    }

    time("full q81") {
      graft.operators.Graph.q81CopurchaseRank(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }

    // iteration chain alone, from a pre-materialized contrib table
    {
      val e = edges
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      val contrib = e.join(deg, Seq("src")).localCheckpoint()
      time("3 iterations from ckpt") {
        var rank = deg.select(col("src").as("node"), lit(1000000L).as("r"))
        for (_ <- 1 to 3) {
          rank = contrib.join(rank, contrib("src") === rank("node"))
            .groupBy(col("dst"))
            .agg((lit(150000L) + expr("(85 * sum(r div d)) div 100")).as("r"))
            .select(col("dst").as("node"), col("r"))
        }
        rank.orderBy(col("r").desc, col("node")).limit(25)
          .write.format("noop").mode("overwrite").save()
      }
      time("1 iteration from ckpt") {
        val rank = deg.select(col("src").as("node"), lit(1000000L).as("r"))
        contrib.join(rank, contrib("src") === rank("node"))
          .groupBy(col("dst"))
          .agg((lit(150000L) + expr("(85 * sum(r div d)) div 100")).as("r"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    // variant: explicit-parallelism edge build (the AQE-CPU-blind fix)
    def edgesPar: DataFrame = {
      val l = li.repartition(spark.sparkContext.defaultParallelism, col("l_orderkey"))
      l.select(col("l_orderkey"), col("l_partkey").as("src"))
        .join(l.select(col("l_orderkey"), col("l_partkey").as("dst")), Seq("l_orderkey"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
        .distinct()
    }
    time("edge-build PAR") { edgesPar.write.format("noop").mode("overwrite").save() }

    {
      val e = edgesPar
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      val par = spark.sparkContext.defaultParallelism
      val contrib = e.join(deg, Seq("src"))
        .repartition(par, col("src")).localCheckpoint()
      time("3 iterations PAR ckpt") {
        var rank = deg.select(col("src").as("node"), lit(1000000L).as("r"))
        for (_ <- 1 to 3) {
          rank = contrib.join(rank, contrib("src") === rank("node"))
            .groupBy(col("dst"))
            .agg((lit(150000L) + expr("(85 * sum(r div d)) div 100")).as("r"))
            .select(col("dst").as("node"), col("r"))
        }
        rank.orderBy(col("r").desc, col("node")).limit(25)
          .write.format("noop").mode("overwrite").save()
      }
      time("full PAR pipeline") {
        val e2 = edgesPar
        val deg2 = e2.groupBy(col("src")).agg(count(lit(1)).as("d"))
        val c2 = e2.join(deg2, Seq("src")).repartition(par, col("src")).localCheckpoint()
        var rank = deg2.select(col("src").as("node"), lit(1000000L).as("r"))
        for (_ <- 1 to 3) {
          rank = c2.join(rank, c2("src") === rank("node"))
            .groupBy(col("dst"))
            .agg((lit(150000L) + expr("(85 * sum(r div d)) div 100")).as("r"))
            .select(col("dst").as("node"), col("r"))
        }
        rank.orderBy(col("r").desc, col("node")).limit(25)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
