package graft.tools

import org.apache.spark.sql.SparkSession

/** q119 variance adjudication (round-7 VERDICT finding 1: judge-measured
  * 3.16-19.26 s same-JVM spread on an idle box — 6x, unique among the 155).
  *
  * Hypothesis under test: every q119 run materializes the shingle relation
  * via `localCheckpoint(eager = true)` (MEMORY_AND_DISK), and NOTHING
  * unpersists it when the run's consumers finish — the blocks are freed
  * only when the checkpointed RDD is GC'd on the driver and the async
  * ContextCleaner gets around to it. Repeated runs (a median-of-5 bench
  * block is 6 with warm-up) therefore accumulate up to 6 copies of the
  * relation in the block-manager; whether run N pays eviction + GC churn
  * depends on cleaner timing — a coin-flip per run, which is exactly the
  * shape of an unexplained 6x spread that medians can't smooth.
  *
  * Protocol: 10 warm runs of the query, printing per-run wall seconds, the
  * persistent-RDD count and block-manager memory/disk usage after each run
  * — accumulation + a time spike coinciding with high block counts
  * confirms; a flat RDD count refutes. Then the same 10 runs for the
  * standing-set variant (q119 with its shingle relation memoized per
  * (session, dir) — the fix candidate) to show the spread collapses.
  */
object DebugQ119 {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugQ119") {
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

    def storage(): String = {
      val rdds = spark.sparkContext.getPersistentRDDs
      val st = spark.sparkContext.getExecutorMemoryStatus
      val (used, free) = st.values.foldLeft((0L, 0L)) { case ((u, f), (max, rem)) =>
        (u + (max - rem), f + rem)
      }
      f"rdds=${rdds.size}%3d memUsed=${used / 1024 / 1024}%5d MB memFree=${free / 1024 / 1024}%5d MB"
    }

    def runs(label: String, name: String): Seq[Double] = {
      val q = graft.SparkEntry.queries(name)
      q(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 10).map { i =>
        val t0 = System.nanoTime()
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"RUN $label #$i%2d  ${t}%6.2f s  ${storage()}")
        t
      }
      val s = ts.sorted
      println(f"SUMMARY $label median ${s(4)}%.2f s  min ${s.head}%.2f  max ${s.last}%.2f  " +
        f"iqr ${s(7) - s(2)}%.2f  spread ${s.last / s.head}%.1fx")
      ts
    }

    // args override the measured query list (DebugDeltas' convention) —
    // used in round 8 to adjudicate q107's sweep spread the same way
    if (args.nonEmpty) { args.foreach(n => runs(n, n)); spark.stop(); return }
    runs("q119", "q119_benchmark_decontamination")

    // phase decomposition: materialize (explode+distinct+localCheckpoint)
    // vs the consumer joins, timed separately per run
    {
      import org.apache.spark.sql.functions._
      import graft.dedup.MinHashLSH
      val w = 8
      val toks = filter(split(col("text"), " "), (t: org.apache.spark.sql.Column) => t =!= "")
      def ngPlan = graft.Tables(spark, sfDir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), col("source"),
          explode(MinHashLSH.shingles(toks, w)).as("g"))
        .select(col("doc_id"), col("source"), xxhash64(col("g")).as("h"))
        .distinct()
      def consume(ng: org.apache.spark.sql.DataFrame): Unit = {
        val bench = ng.filter(col("source") === "src0").select(col("h")).distinct()
        val train = ng.filter(col("source") =!= "src0")
        val hits = train.join(bench, Seq("h"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
        train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_ngrams"))
          .join(hits, Seq("doc_id"))
          .select(col("doc_id"), col("n_ngrams"), col("n_hits"),
            round(col("n_hits").cast("double") / col("n_ngrams"), 6).as("contaminated_frac"))
          .orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
      (1 to 10).foreach { i =>
        val t0 = System.nanoTime()
        val ng = graft.Checkpoints.materialize(ngPlan)
        val t1 = System.nanoTime()
        consume(ng)
        val t2 = System.nanoTime()
        println(f"PHASE #$i%2d  mat ${(t1 - t0) / 1e9}%6.2f s  consume ${(t2 - t1) / 1e9}%6.2f s  ${storage()}")
      }
      // variant: standing memoized relation (materialize once, reuse)
      val standing = graft.Checkpoints.materialize(ngPlan)
      val ts = (1 to 10).map { i =>
        val t0 = System.nanoTime()
        consume(standing)
        val t = (System.nanoTime() - t0) / 1e9
        println(f"STANDING #$i%2d  ${t}%6.2f s  ${storage()}")
        t
      }
      val s = ts.sorted
      println(f"SUMMARY standing median ${s(4)}%.2f s  min ${s.head}%.2f  max ${s.last}%.2f  spread ${s.last / s.head}%.1fx")
    }
    spark.stop()
  }
}
