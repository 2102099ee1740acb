package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.mutable.ArrayBuffer

/** Streaming drain decomposition (round-10 VERDICT "Next" #2): the most
  * expensive committed rows are all per-batch micro-batch drains (q175
  * stream SCD2, q155 stream ingest dedup, q83 stream outer join, q265
  * stream Bollinger). This tool attributes their wall-clock to
  * FIXED STARTUP (feed write + stream start + result read) vs PER-BATCH
  * work, via a StreamingQueryListener capturing each trigger's
  * `triggerExecution` duration. Prints one line per (query, rep):
  *   query rep total_s n_batches batch_sum_s fixed_s batches_ms=[...]
  * Run warm (rep 0 discarded) with SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS.
  */
object DebugStreamDrain {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugStreamDrain") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val batchMs = ArrayBuffer.empty[Long]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0 || e.progress.batchId == 0)
          batchMs.synchronized { batchMs += e.progress.durationMs.get("triggerExecution") }
    })

    val targets = sys.env.get("SPARK_GRAFT_DRAIN_TARGETS")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq("q175_stream_scd2", "q155_stream_ingest_dedup",
        "q83_stream_outer_join", "q265_stream_bollinger"))
    val reps = 4
    for (name <- targets; rep <- 0 until reps) {
      batchMs.synchronized(batchMs.clear())
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      // give the listener bus a moment to drain its async queue
      Thread.sleep(300)
      val bs = batchMs.synchronized(batchMs.toList)
      val bsum = bs.sum / 1e3
      println(f"[drain] $name rep=$rep total=$total%.2f s batches=${bs.size} " +
        f"batch_sum=$bsum%.2f s fixed=${total - bsum}%.2f s " +
        s"batches_ms=${bs.mkString("[", ",", "]")}")
      val _ = n
    }
    spark.stop()
  }
}
