package graft.tools

import graft.streaming.Windows
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** q66 cost attribution: where do the seconds of the typed
  * flatMapGroupsWithState sessionizer go, and does a leaner encoding help?
  * Same-JVM A/B (VERDICT r3 item 4):
  *
  *   A. case-class path as shipped (Ev/SessionState/SessionOut)
  *   B. tuple encodings end-to-end — input (Long, Timestamp), state three
  *      longs, output four longs — the "state as a primitive tuple instead
  *      of a case-class graph" variant
  *   C. the codegen'd session_window twin, as the built-in floor
  *
  * Each variant drives the identical punctuated two-phase drain the q66
  * entry uses. Numbers land in BENCH.md.
  */
object DebugQ66 {

  private def sessionFnTuple: (Long, Iterator[(Long, java.sql.Timestamp)],
      GroupState[(Long, Long, Long)]) => Iterator[(Long, Long, Long, Long)] =
    (userId, rows, state) => {
      if (state.hasTimedOut) {
        val st = state.get
        state.remove()
        Iterator.single((userId, st._1, st._2, st._3))
      } else {
        val sorted = rows.map(_._2.getTime / 1000).toSeq.sorted
        var cur = state.getOption
        val out = Seq.newBuilder[(Long, Long, Long, Long)]
        sorted.foreach { es =>
          cur match {
            case Some(st) if es - st._2 <= 1800 => cur = Some((st._1, es, st._3 + 1))
            case Some(st) =>
              out += ((userId, st._1, st._2, st._3))
              cur = Some((es, es, 1L))
            case None => cur = Some((es, es, 1L))
          }
        }
        cur.foreach { st =>
          state.update(st)
          state.setTimeoutTimestamp((st._2 + 1800) * 1000)
        }
        out.result().iterator
      }
    }

  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugQ66") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    val maxEs = graft.Tables.events(spark, sfDir)
      .agg(max(col("ts2").cast("long"))).head().getLong(0)
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)

    def drive(mk: DataFrame => DataFrame): Long = {
      val punct = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      val punctDf = punct.toDF()
        .select(lit(-1L).as("user_id"), timestamp_seconds(col("value")).as("ts2"))
      val union = Windows.eventsStream(spark, sfDir)
        .select(col("user_id"), col("ts2")).union(punctDf)
      val qn = s"dbg66_${counter.incrementAndGet()}"
      val q = mk(union).writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName(qn).start()
      try {
        q.processAllAvailable()
        punct.addData(maxEs + 2 * 3600 + 1800 + 60)
        q.processAllAvailable()
      } finally q.stop()
      val n = spark.table(qn).count()
      spark.catalog.dropTempView(qn)
      n
    }

    def variant(name: String)(mk: DataFrame => DataFrame): Unit = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = drive(mk)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      once() // warm
      val runs = Seq.fill(3)(once())
      println(f"VARIANT $name%-18s ${runs.map(_._1).min}%.3f s  (rows ${runs.head._2})")
    }

    variant("case-class") { df => Windows.statefulSessions(df).toDF() }

    variant("tuple-primitive") { df =>
      df.withWatermark("ts2", "2 hours")
        .select(col("user_id"), col("ts2")).as[(Long, java.sql.Timestamp)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout)(sessionFnTuple)
        .toDF("user_id", "start_es", "last_es", "n_events")
    }

    variant("session_window") { df =>
      df.withWatermark("ts2", "2 hours")
        .groupBy(session_window(col("ts2"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").cast("long").as("start_es"),
          (col("session_window.end").cast("long") - 1800).as("last_es"),
          col("n_events"))
    }

    spark.stop()
  }
}
