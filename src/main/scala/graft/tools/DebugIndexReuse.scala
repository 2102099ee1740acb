package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B for the build-once IVF index (r5 VERDICT item 3): the
  * q113+q114 pair as the driver sweep runs them — sequentially in one
  * session — with the index cache cleared between queries (the pre-r6
  * behavior: each call rebuilds k-means seeding + 3 materializations) vs
  * shared (q114 reuses q113's index and pays only its pair join + top-k).
  */
object DebugIndexReuse {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugIndexReuse") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def pair(clearBetween: Boolean): Double = {
      graft.similarity.Ann.clearIndexCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q113_embed_dedup_blocked")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      if (clearBetween) graft.similarity.Ann.clearIndexCache()
      graft.SparkEntry.queries("q114_cosine_topk_blocked")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once, then median-of-5 each, interleaved
    pair(clearBetween = true); pair(clearBetween = false)
    val rebuilt = scala.collection.mutable.ArrayBuffer[Double]()
    val shared = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 5) { rebuilt += pair(true); shared += pair(false) }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"AB q113+q114 rebuild-per-query ${med(rebuilt.toSeq)}%.3f s vs shared-index ${med(shared.toSeq)}%.3f s " +
      f"(${(1 - med(shared.toSeq) / med(rebuilt.toSeq)) * 100}%.1f%% saved)")
    println("RAW rebuilt=" + rebuilt.map(t => f"$t%.3f").mkString(",") +
      " shared=" + shared.map(t => f"$t%.3f").mkString(","))
    spark.stop()
  }
}
