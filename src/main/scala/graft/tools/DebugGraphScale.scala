package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure — not just argue — the volume slope of the round-8 graph /
  * bipartite family (q208 degree distribution, q213 decayed top-k, q215
  * k-core, q218 item-item cosine, q221 Adamic-Adar) past bench scale.
  *
  * Fixture: sf0.1's lineitem+orders unioned K times with key-shifted
  * copies (order keys offset by copy·10⁹, part/customer keys offset by
  * copy·10⁸) written to a temp data dir alongside the original dimension
  * tables — so the graph gets K× the orders AND K× the parts/customers,
  * i.e. volume grows ≈K× with the same per-order fan-out and the same
  * degree distribution, which is how a real corpus grows (more baskets,
  * more catalog — NOT denser baskets). A query with an edge-proportional
  * plan should scale ≈K×; anything super-linear means a hidden
  * node²/pair² term the sf0.1 bench was too small to expose.
  *
  * Usage: runMain graft.tools.DebugGraphScale [K] (default 4) — prints
  * per-query wall-clock at 1x and Kx (min of 3 warm, same JVM).
  */
object DebugGraphScale {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugGraphScale") {
    val k = args.headOption.map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = "/root/testdata/sf0.1"
    val tmp = java.nio.file.Files.createTempDirectory("graft_gscale_").toString
    try {
      val li = spark.read.parquet(s"$base/lineitem.parquet")
      val os = spark.read.parquet(s"$base/orders.parquet")
      (0 until k).map { c =>
        li.select(
          (col("l_orderkey") + c * 1000000000L).as("l_orderkey"),
          (col("l_partkey") + c * 100000000L).as("l_partkey"),
          (col("l_suppkey")).as("l_suppkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax"), col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      }.reduce(_.unionAll(_)).write.mode("overwrite")
        .parquet(s"$tmp/lineitem.parquet")
      (0 until k).map { c =>
        os.select(
          (col("o_orderkey") + c * 1000000000L).as("o_orderkey"),
          (col("o_custkey") + c * 100000000L).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
      }.reduce(_.unionAll(_)).write.mode("overwrite")
        .parquet(s"$tmp/orders.parquet")
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "events", "documents", "embeddings"))
        spark.read.parquet(s"$base/$t.parquet")
          .write.mode("overwrite").parquet(s"$tmp/$t.parquet")

      val queries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
        "q208_degree_dist" -> graft.operators.Graph.q208DegreeDist,
        "q213_decayed_topk" -> graft.operators.Extras.q213DecayedTopk,
        "q215_kcore" -> graft.operators.Graph.q215Kcore,
        "q218_item_cosine" -> graft.operators.Graph.q218ItemCosine,
        "q221_adamic_adar" -> graft.operators.Graph.q221AdamicAdar,
        "q237_weighted_sssp" -> graft.operators.Graph.q237WeightedSssp)
      def time(fn: => Unit): Double = {
        val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
      }
      for ((name, q) <- queries) {
        // cold = first run (includes any standing-cache build);
        // warm = min of 3 after (steady-state probe for the cached queries)
        def run(dir: String): (Double, Double) = {
          val cold = time(q(spark, dir).write.mode("overwrite").format("noop").save())
          val warm = (1 to 3).map(_ => time(
            q(spark, dir).write.mode("overwrite").format("noop").save())).min
          (cold, warm)
        }
        val (c1, w1) = run(base)
        val (ck, wk) = run(tmp)
        println(f"[gscale] $name%-20s cold 1x=$c1%7.2fs ${k}x=$ck%7.2fs slope=${ck / c1}%5.2f" +
          f" | warm 1x=$w1%6.2fs ${k}x=$wk%6.2fs slope=${wk / w1}%5.2f")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    spark.stop()
  }
}
