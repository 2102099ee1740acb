package graft.tools

import graft.Engine

/** q188 IVFPQ recall/cost sweep (round-9 VERDICT next-step #5): runs the
  * SHIPPING [[graft.operators.Similarity.ivfPqReport]] kernel across
  * (nprobe, shortlist, assignReplicas) and prints mean recall@10 over the 5
  * probes plus steady-state seconds (2nd run of each config), so the q188
  * defaults can sit at the measured knee instead of the round-8 guess.
  *
  * Usage: runMain graft.tools.DebugIvfPq [sfDir]
  */
object DebugIvfPq {
  def main(args: Array[String]): Unit = BenchLock.exclusiveWait("DebugIvfPq") {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Engine.session("graft-ivfpq-sweep")
    spark.sparkContext.setLogLevel("WARN")
    println("nprobe,shortlist,replicas,mean_recall10,sec")
    for (replicas <- Seq(2, 4); nprobe <- Seq(4, 6, 8); shortlist <- Seq(50, 100, 200)) {
      def once(): (Double, Double) = {
        val t0 = System.nanoTime()
        val rows = graft.operators.Similarity
          .ivfPqReport(spark, sfDir, nprobe, shortlist, replicas)
          .select("recall10").collect().map(_.getDouble(0))
        ((System.nanoTime() - t0) / 1e9, rows.sum / rows.length)
      }
      once() // warm: index/codebook builds land in the session caches
      val (sec, recall) = once()
      println(f"$nprobe,$shortlist,$replicas,$recall%.3f,$sec%.2f")
    }
    spark.stop()
  }
}
