package graft.tools

import graft.Engine

/** Idle-box A/B for `standing_*` bench rows (round-12 VERDICT #1: the
  * driver record priced standing_jaccard_index at 19.5 s vs 1.9 s
  * committed with no adjudication path). Times each named standing build
  * REPS times in one warm JVM, clearing every index registry between
  * reps so each rep prices a real rebuild, not a cache hit — the same
  * cache-busting graft.Bench's standing re-measure pass uses.
  *
  * usage: DebugStanding [sfDir] [reps] [name1,name2,...]
  */
object DebugStanding {
  def main(args: Array[String]): Unit = BenchLock.exclusiveWait("DebugStanding") {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val only = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = Engine.session("graft-debug-standing")
    spark.sparkContext.setLogLevel("WARN")
    val builds = graft.operators.Standing.builds
      .filter { case (n, _) => only.forall(_.contains(n)) }
    def bust(): Unit = {
      graft.Checkpoints.clearMaterializeCache()
      graft.dedup.JaccardJoin.clearIndexCache()
      graft.similarity.Ann.clearIndexCache()
      graft.similarity.Pq.clearCodebookCache()
    }
    // one untimed full pass first: JIT + codegen + parquet footers
    builds.foreach { case (_, b) => b(spark, sfDir) }
    val rows = builds.map { case (name, b) =>
      val ts = (1 to reps).map { i =>
        bust()
        val t0 = System.nanoTime()
        b(spark, sfDir)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[standing] $name rep=$i ${sec}%.3f s")
        sec
      }.sorted
      val med = if (ts.size % 2 == 1) ts(ts.size / 2) else ts(ts.size / 2 - 1)
      (name, med, ts.head, ts.last)
    }
    println("[standing] name median min max")
    rows.foreach { case (n, med, mn, mx) =>
      println(f"[standing] $n ${med}%.3f ${mn}%.3f ${mx}%.3f")
    }
    spark.stop()
  }
}
