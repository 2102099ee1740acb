package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM adjudication of bench deltas between rounds — r6 edition for
  * the six r4→r5 suspects (VERDICT r5 item 1: q60 0.29→1.14 s, q59
  * 0.79→2.14 s, q61 0.23→0.62 s, q62 0.15→0.33 s, q58 0.49→0.95 s, q78
  * 0.75→1.20 s — all code-unchanged in r5 per the git diff, all matching
  * the load-window signature that the r4 four showed before all four were
  * adjudicated as noise and recovered).
  *
  * Design (the protocol that settled the r4 four): each suspect runs
  * median-of-5 (+IQR) interleaved with two stable sentinels (q01 0.3
  * s-class scan-agg, q04 broadcast star join) whose r4/r5 numbers were
  * flat. If a suspect's same-JVM median sits back at its r4 level while
  * the sentinels sit at theirs, the r5 point was a loaded machine window;
  * if it stays at the r5 level on a quiet box (the bench lock now
  * guarantees quiet), the regression is real and needs a plan-level
  * explanation.
  *
  * Plus one structural check: q78's shingle relation must still be
  * materialized ONCE for its consumers (the checkpoint-reuse discipline
  * its r5 number was suspected of losing).
  */
object DebugDeltas {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugDeltas") {
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

    def medianOf5(f: => Unit): (Double, Double) = {
      f // warm
      val ts = Seq.fill(5) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      (ts(2), ts(3) - ts(1))
    }
    def run(name: String): Unit = {
      val (m, iqr) = medianOf5(
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      println(f"MEASURE $name%-22s median ${m}%.3f s  iqr ${iqr}%.3f s")
    }

    // interleave sentinels around each suspect so a machine-speed drift
    // during this run is visible in the output itself; args override the
    // suspect list for a targeted re-measure (sentinels stay interleaved)
    val suspects =
      if (args.nonEmpty) args.toSeq
      else Seq("q60_cosine_pairs", "q59_conditionals", "q61_skew_salted",
        "q62_stratified", "q58_array_funcs", "q78_contamination")
    val sentinels = Iterator.continually(Seq("q01_scan_filter", "q04_star_join")).flatten
    (suspects.flatMap(s => Seq(sentinels.next(), s)) :+ sentinels.next())
      .foreach(run)

    // q78 structural check: the shingle pair relation feeds its aggregate
    // through ONE materialization — if the checkpoint reuse were lost, the
    // doc-pair generation would re-execute per consumer and the plan would
    // show the expensive join chain more than once
    {
      val plan = graft.SparkEntry.queries("q78_contamination")(spark, sfDir)
        .queryExecution.executedPlan.toString
      val scans = "ExistingRDD|LocalTableScan|Scan ExistingRDD".r
        .findAllIn(plan).length
      val joins = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
        .findAllIn(plan).length
      println(s"CHECK q78 executed plan: $scans checkpoint-scan nodes, " +
        s"$joins join nodes (expensive shingle join must NOT appear — " +
        "it runs once behind the checkpoint)")
    }

    spark.stop()
  }
}
