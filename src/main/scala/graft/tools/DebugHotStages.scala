package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Collapsed-hot-stage sweep (opt r14): run each named query once warm and
  * report, per query, the stages that are BOTH slow (≥ threshold ms) and
  * narrow (≤ 2 tasks) — the signature of a CPU-dense byte-small exchange
  * that AQE's byte-based coalescing serialized (the q195 class), plus the
  * query's total stage count and wall time. A stage that is slow AND wide
  * is genuine work; a stage that is slow and narrow is a parallelism bug
  * candidate worth a pinned exchange.
  *
  * Usage: SPARK_GRAFT_HOT_QUERIES=q1,q2 SPARK_GRAFT_HOT_MS=300
  *        runMain graft.tools.DebugHotStages
  */
object DebugHotStages {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugHotStages") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val thresholdMs = sys.env.getOrElse("SPARK_GRAFT_HOT_MS", "300").toLong
    val queries = sys.env.get("SPARK_GRAFT_HOT_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        stages.add((dur, si.numTasks))
      }
    })

    def once(n: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }

    for (q <- queries) {
      once(q) // warm (also builds standing caches so steady state is measured)
      stages.clear()
      val wall = once(q)
      Thread.sleep(200) // listener drain
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toList
      val hot = ss.filter { case (d, t) => d >= thresholdMs && t <= 2 }
      val hotSum = hot.map(_._1).sum / 1e3
      println(f"[hot] $q%-36s wall=$wall%6.2f stages=${ss.size}%3d " +
        f"stagesum=${ss.map(_._1).sum / 1e3}%6.2f narrowhot=${hot.size}%2d " +
        f"narrowhot_s=$hotSum%5.2f " +
        s"hot=${hot.sortBy(-_._1).take(5).mkString(",")}")
    }
    spark.stop()
  }
}
