package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM adjudication of the four r3→r4 bench deltas (VERDICT r4 item 1:
  * q42 2.5×, q50 2.3×, q41 1.9×, q38 1.8× — all spanning the single-run →
  * median-of-5 protocol switch, so "regression" is unproven until measured
  * warm in ONE JVM against queries that did NOT move).
  *
  * Design: each suspect runs median-of-5 (+IQR) interleaved with two stable
  * sentinels (q01 0.3 s-class scan-agg, q04 broadcast star join) whose r3/r4
  * numbers were flat. If a suspect's same-JVM median sits at its r4 level
  * while sentinels sit at theirs, the r4 number is real (machine-honest) and
  * the r3 point was the jitter; if it recovers to the r3 level, r4 caught a
  * slow JVM.
  *
  * Plus per-suspect structural checks:
  *   - q42: the physical plan must contain the 5-language stopword fold
  *     exactly ONCE (the projection barrier vs CollapseProject — BENCH.md's
  *     46× MinHash trap);
  *   - q50: scan parallelism of the pivot input (the one-row-group
  *     lineitem.parquet suspicion) — measured against a variant that
  *     repartitions after the scan;
  *   - q41: assignReplicas=2 (shipped, recall ≥0.8) vs =1 — quantifies the
  *     honest price of the r4 recall fix;
  *   - q38: median + IQR only (r4 IQR was 64% of the median — the
  *     cross-run validation already tags it load-correlated).
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
    // during this run is visible in the output itself
    Seq("q01_scan_filter", "q42_langid", "q04_star_join", "q50_pivot",
      "q01_scan_filter", "q41_ann_ivf", "q04_star_join", "q38_ngram_jaccard",
      "q01_scan_filter").foreach(run)

    // q42 structural check: stopword fold must appear exactly once
    {
      val plan = graft.SparkEntry.queries("q42_langid")(spark, sfDir)
        .queryExecution.executedPlan.toString
      // the fold's signature: the es-profile literal appears once per
      // materialization of the scored array
      val occurrences = "\\bel\\b".r.findAllIn(plan).length
      println(s"CHECK q42 stopword-fold materializations in plan: $occurrences (expect 1)")
    }

    // q50 scan-parallelism A/B: as-shipped vs repartition after scan
    {
      import org.apache.spark.sql.functions._
      import graft.Dsl._
      import graft.Tables
      val parts = Tables(spark, sfDir, "lineitem").rdd.getNumPartitions
      println(s"CHECK q50 lineitem scan partitions: $parts")
      def pivotFrom(li: org.apache.spark.sql.DataFrame): Unit = {
        li.join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sumExactDouble(revenueTerm(col("l_extendedprice"), col("l_discount"))))
          .write.format("noop").mode("overwrite").save()
      }
      val (asIs, i1) = medianOf5(pivotFrom(Tables(spark, sfDir, "lineitem")))
      val (reparted, i2) = medianOf5(pivotFrom(
        Tables(spark, sfDir, "lineitem").repartition(cpus.toInt)))
      println(f"AB q50 as-shipped ${asIs}%.3f s (iqr ${i1}%.3f) vs post-scan repartition ${reparted}%.3f s (iqr ${i2}%.3f)")
    }

    // q41 replica A/B: the r4 recall fix doubled index entries — price it
    {
      import graft.Tables
      def ivf(reps: Int): Unit =
        graft.similarity.Ann.ivfTopK(Tables(spark, sfDir, "embeddings"),
          "vec_id", "embedding", probeId = 0L, assignReplicas = reps)
          .write.format("noop").mode("overwrite").save()
      val (r2, i2) = medianOf5(ivf(2))
      val (r1, i1) = medianOf5(ivf(1))
      println(f"AB q41 assignReplicas=2 ${r2}%.3f s (iqr ${i2}%.3f) vs =1 ${r1}%.3f s (iqr ${i1}%.3f)")
    }

    spark.stop()
  }
}
