package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Shuffle/spill profiler: runs named queries (default: the bench's most
  * expensive family) and reports per-query totals of shuffle bytes
  * written/read, records shuffled, and spill — the numbers that decide
  * whether a plan survives a 100× scale-up. Stage metrics are accumulated
  * with a SparkListener; events are async, so totals settle after a short
  * drain pause (diagnostic tool, not a bench).
  *
  * Usage: runMain graft.tools.Profile [sfDir] [queryName...]
  */
object Profile {

  private final class Acc extends SparkListener {
    val shufWrite = new AtomicLong
    val shufRead = new AtomicLong
    val shufRecords = new AtomicLong
    val spill = new AtomicLong
    val inputBytes = new AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
      }
    }
  }

  def main(args: Array[String]): Unit = BenchLock.exclusive("Profile") {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.tail.toSeq
      else Seq("q56_dedup_resolve", "q72_embed_dedup", "q81_copurchase_rank",
        "q107_dedup_keep_best", "q04_star_join", "q10_hash_agg", "q97_sliding_distinct")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()

    names.foreach { name =>
      run(name) // warm-up: JIT + footer caches, not profiled
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      val t0 = System.nanoTime()
      run(name)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // let the async listener bus drain
      spark.sparkContext.removeSparkListener(acc)
      println(f"PROFILE $name%-24s ${sec}%6.2f s  input ${acc.inputBytes.get / 1e6}%8.1f MB  " +
        f"shufW ${acc.shufWrite.get / 1e6}%8.2f MB  shufR ${acc.shufRead.get / 1e6}%8.2f MB  " +
        f"shufRows ${acc.shufRecords.get}%10d  spill ${acc.spill.get / 1e6}%6.1f MB")
    }
    spark.stop()
  }
}
