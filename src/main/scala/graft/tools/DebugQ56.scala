package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch stage-level profiler for a declared query (not part of the
  * driver contract). SPARK_GRAFT_QUERY selects the query (default q56).
  */
object DebugQ56 {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugQ56") {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val qname = sys.env.getOrElse("SPARK_GRAFT_QUERY", "q56_dedup_resolve")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(label: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(qname)(spark, d).write.format("noop").mode("overwrite").save()
      println(f"[dbg] $qname $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    once("warmup")

    @volatile var stages = List.empty[(Int, String, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages ::= ((si.stageId, si.name.takeWhile(_ != '\n').take(60), dur, si.numTasks))
      }
    })
    once("timed")
    Thread.sleep(1000)
    println(f"[dbg] stages=${stages.size} total-stage-ms=${stages.map(_._3).sum}")
    stages.sortBy(-_._3).take(15).foreach { case (id, name, ms, nt) =>
      println(f"[dbg] stage $id%4d $ms%6d ms tasks=$nt%3d $name")
    }
    println("[dbg] === plan ===")
    println(SparkEntry.queries(qname)(spark, d).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(8000))
    spark.stop()
  }
}
