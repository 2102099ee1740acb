package graft.tools

import graft.{Engine, SparkEntry}

/** Time any declared query N times in one JVM (noop sink, Bench's
  * measurement shape) and print per-run seconds + median/min/max — the
  * harness behind per-query stability work (q165's round-10 band fix).
  *
  * Usage: runMain graft.tools.TimeQuery <queryName> [sfDir] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = BenchLock.exclusiveWait("TimeQuery") {
    require(args.nonEmpty, "usage: TimeQuery <queryName> [sfDir] [reps]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    val fn = SparkEntry.queries(name)
    val spark = Engine.session("graft-time-query")
    spark.sparkContext.setLogLevel("WARN")
    val ts = (0 to reps).map { i => // rep 0 = warm-up, excluded below
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name rep=$i ${sec}%.3f s" + (if (i == 0) " (warm)" else ""))
      sec
    }.drop(1).sorted
    // lower-middle for even rep counts — Bench.median's convention, so
    // per-query debugging numbers match the artifact rows (min-of-2 heavies)
    val med = if (ts.size % 2 == 1) ts(ts.size / 2) else ts(ts.size / 2 - 1)
    println(f"[time] $name median=${med}%.3f min=${ts.head}%.3f max=${ts.last}%.3f reps=$reps")
    spark.stop()
  }
}
