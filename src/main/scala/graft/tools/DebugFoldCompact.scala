package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what [[graft.dedup.JaccardJoin.compactFrozen]]'s cadence buys
  * (round-7 VERDICT item 3): per-fold wall time across a 50-fold frozen
  * chain with compaction ON (cadence 8) vs OFF. With compaction off, every
  * fold re-analyzes a union plan one leg deeper — per-fold time ramps with
  * the chain; with the cadence, leg count is bounded and the curve is flat
  * apart from the compaction spikes every 8th fold (the amortized
  * corpus/cadence price the scaladoc declares). Also prints the max leaf
  * count each way — the driver-side quantity that would eventually OOM.
  */
object DebugFoldCompact {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugFoldCompact") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
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
    import graft.dedup.JaccardJoin

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpusA = docs.filter(col("source") =!= "src18" && col("source") =!= "src19")
    val corpusB = docs.filter(col("source") === "src19")
    val nFolds = 50

    def leaves(ix: JaccardJoin.Index): Int =
      Seq(ix.sets, ix.prefix, ix.sh)
        .map(_.queryExecution.logical.collectLeaves().size).max

    def chain(label: String, compactEvery: Int): Unit = {
      var ix = JaccardJoin.buildIndex(corpusA, "doc_id", "text", 1L, 2L)
      var maxL = 0
      val ts = (0 until nFolds).map { i =>
        val batch = corpusB.filter(abs(xxhash64(col("doc_id"))) % nFolds === i)
        val t0 = System.nanoTime()
        ix = JaccardJoin.foldInFrozen(ix, batch, "doc_id", "text", compactEvery)
        val t = (System.nanoTime() - t0) / 1e9
        maxL = math.max(maxL, leaves(ix))
        t
      }
      (0 until nFolds by 10).foreach { i =>
        val w = ts.slice(i, i + 10)
        println(f"FOLD $label folds $i%2d-${i + 9}%2d  mean ${w.sum / w.size}%6.3f s  max ${w.max}%6.3f s")
      }
      println(f"FOLD $label TOTAL ${ts.sum}%7.2f s  first10 ${ts.take(10).sum / 10}%6.3f  " +
        f"last10 ${ts.takeRight(10).sum / 10}%6.3f  ramp ${ts.takeRight(10).sum / ts.take(10).sum}%5.2fx  maxLeaves $maxL")
    }

    val deep = sys.env.get("GRAFT_FOLD_DEEP").map(_.toInt)
    deep match {
      case Some(n) =>
        // analyzer-ramp isolation: n mostly-empty batches so per-fold DATA
        // cost is constant and any growth is plan-depth (analysis) cost
        def deepChain(label: String, compactEvery: Int): Unit = {
          var ix = JaccardJoin.buildIndex(corpusA, "doc_id", "text", 1L, 2L)
          val ts = (0 until n).map { i =>
            val batch = corpusB.filter(abs(xxhash64(col("doc_id"))) % n === i)
            val t0 = System.nanoTime()
            ix = JaccardJoin.foldInFrozen(ix, batch, "doc_id", "text", compactEvery)
            (System.nanoTime() - t0) / 1e9
          }
          (0 until n by 50).foreach { i =>
            val w = ts.slice(i, i + 50)
            println(f"DEEP $label folds $i%3d-${i + 49}%3d  mean ${w.sum / w.size}%6.3f s")
          }
          println(f"DEEP $label TOTAL ${ts.sum}%7.2f s  maxLeaves ${leaves(ix)}")
        }
        deepChain("nocompact", 0)
        deepChain("compact32", 32)
      case None =>
        chain("compact8", 8)
        chain("nocompact", 0)
    }
    spark.stop()
  }
}
