package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Protocol (BASELINE.md): one untimed warm-up pass per query (JIT +
  * codegen + file-footer caches — otherwise whichever query runs first in a
  * fresh JVM eats ~5-8s of compiler time and the numbers measure Map
  * ordering, not plans), then the MEDIAN OF 5 timed runs, with the
  * inter-quartile range (p75−p25 ≈ sorted(3)−sorted(1)) reported per query
  * so a regression call can be judged against the measured spread instead
  * of single-run jitter (recorded at ±20-30% per BENCH.md). A query that
  * fails reports -1.
  *
  * Self-adjudication: four consecutive rounds of driver sweeps recorded
  * machine contention as phantom 10-20x regressions (round-7 VERDICT
  * adjudicated 9 of the 10 worst deltas back to committed levels on an
  * idle box). The bench therefore measures its own measurement window:
  * single runs of two cheap sentinels with flat cross-round history (q01
  * 0.2 s-class scan-agg, q04 broadcast star join — the DebugDeltas
  * protocol that settled the r4-r7 disputes) are interleaved around every
  * query's 5-run block, and each sentinel's elevation over its session
  * floor (the minimum that sentinel has shown this JVM) estimates external
  * load during that block. A block is DIRTY when BOTH bracketing sentinels
  * are ≥1.4x their floors or the query's IQR/median exceeds 0.5 (for
  * medians ≥0.3 s — below that the ratio is JIT noise); dirty blocks
  * re-measure up to twice, and the first clean block wins. Requiring both
  * brackets discriminates sustained external load (which spans the whole
  * 5-run block, elevating both) from a heavy query's own GC/cleaner
  * shadow (which elevates only the trailing sentinel — the recorded
  * `sentinel` field still reports the max, so the shadow stays visible). A query with no clean block
  * in 3 attempts keeps its fastest attempt flagged `contaminated` — the
  * honest record is "this number is an upper bound taken under load", not
  * a silent 20x. The JSON line carries per-query `iqr` and `sentinel`
  * (max bracketing elevation of the kept block), `reruns`/`contaminated`
  * for the affected queries, and the absolute `sentinel_floor` seconds so
  * cross-round artifacts can also be compared on sentinel levels.
  *
  * The line also carries one importer throughput point: the sf lineitem
  * table round-tripped through a headered CSV and imported with the full
  * schema-file path (the reference's actual use case — multi-GB CSV dumps),
  * reported as rows/sec.
  */
object Bench {

  /** Write the sf lineitem table as ONE headered CSV (unsupported types
    * stringified — the importer's declared surface is the reference's six),
    * then time the full schema-file import back to Parquet.
    */
  private def importerBench(spark: SparkSession, sfDir: String): Option[(Long, Double, Long)] = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench-imp")
    try importerBenchIn(spark, sfDir, tmp)
    catch { case _: Throwable => None }
    finally { // cleanup on BOTH paths — a failed run otherwise leaves ~120 MB in /tmp
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }
  }

  private def importerBenchIn(spark: SparkSession, sfDir: String,
                              tmp: java.nio.file.Path): Option[(Long, Double, Long)] = {
    import org.apache.spark.sql.functions.col
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val supported = Set("long", "integer", "double", "float", "boolean", "string")
    val casted = li0.select(li0.schema.fields.map { f =>
      if (supported(f.dataType.typeName)) col(f.name)
      else col(f.name).cast("string").as(f.name)
    }.toSeq: _*)
    val csvDir = tmp.resolve("csv").toString
    casted.coalesce(1).write.option("header", "true").csv(csvDir)
    val part = new java.io.File(csvDir).listFiles()
      .find(_.getName.endsWith(".csv")).get
    val schemaLines = casted.schema.fields.map { f =>
      val t = f.dataType.typeName match {
        case "long" => "Long"
        case "integer" => "Int"
        case "double" => "Double"
        case "float" => "Float"
        case "boolean" => "Boolean"
        case _ => "String"
      }
      s"${f.name}=$t"
    }
    val schemaFile = tmp.resolve("lineitem.schema")
    java.nio.file.Files.write(schemaFile, schemaLines.mkString("\n").getBytes("UTF-8"))
    val rows = li0.count()
    val bytes = part.length()
    val t0 = System.nanoTime()
    graft.importer.Importer.readCsvWriteParquet(graft.importer.ImportConfig(
      srcFile = part.getAbsolutePath,
      destFile = tmp.resolve("out.parquet").toString,
      schemaFile = Some(schemaFile.toString)))(spark)
    val sec = (System.nanoTime() - t0) / 1e9
    Some((rows, sec, bytes))
  }

  def main(args: Array[String]): Unit = tools.BenchLock.exclusiveWait("Bench") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // contract default: local[32] with shuffle.partitions=32 (capped by the
    // actual core count); SPARK_GRAFT_CPUS overrides for local iteration
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated subset for local iteration (driver sets none)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // noop sink, not count(): count() lets Catalyst prune all projections,
    // under-measuring map-only queries; noop materializes every output column.
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }
    names.foreach(runOnce) // warm-up

    // --- sentinel machinery (scaladoc: self-adjudication) -----------------
    val sentinelNames = Seq("q01_scan_filter", "q04_star_join")
    val floors = scala.collection.mutable.Map.empty[String, Double]
    def sentinelRun(s: String): Double = {
      val t = runOnce(s)
      // floor = session minimum: contention only ever slows a sentinel, so
      // the min is the clean level and later clean runs self-correct a
      // floor primed during an early loaded window
      if (t >= 0) floors(s) = math.min(floors.getOrElse(s, t), t)
      t
    }
    sentinelNames.foreach(s => (1 to 3).foreach(_ => sentinelRun(s)))
    val sentIter = Iterator.continually(sentinelNames).flatten

    final case class Row(median: Double, iqr: Double, sentinel: Double,
                         contaminated: Boolean, reruns: Int)

    // Before a re-measure, wait (bounded) for the contention window to pass:
    // probe the cheap sentinel every 5 s until it sits near its floor. The
    // global budget caps total added wall-clock at 300 s per bench run so a
    // permanently-loaded box degrades to flagged-contaminated rows rather
    // than a hung sweep.
    var quietBudgetMs = 300000L
    def waitForQuiet(): Unit = {
      var tries = 0
      while (tries < 12 && quietBudgetMs > 0) {
        val t = sentinelRun("q01_scan_filter")
        val ratio = if (t > 0 && floors.get("q01_scan_filter").exists(_ > 0))
          t / floors("q01_scan_filter") else 1.0
        if (ratio <= 1.2) return
        Thread.sleep(5000); quietBudgetMs -= 5000; tries += 1
      }
    }

    def measure(name: String): Row = {
      var attempts = List.empty[(Double, Double, Double)] // (median, iqr, ratio)
      var kept = Option.empty[(Double, Double, Double)]
      var n = 0
      while (n < 3 && kept.isEmpty) {
        if (n > 0) waitForQuiet() // a rerun straight into the same load window is wasted
        val s1 = sentIter.next(); val r1 = sentinelRun(s1)
        val ts = Seq.fill(5)(runOnce(name))
        val s2 = sentIter.next(); val r2 = sentinelRun(s2)
        val ratios = Seq((s1, r1), (s2, r2)).collect {
          case (s, t) if t > 0 && floors.get(s).exists(_ > 0) => t / floors(s)
        }
        val ratio = ratios.foldLeft(1.0)(math.max)
        // the DIRTY decision uses the MIN bracket: a sustained external
        // load window (the only kind that can corrupt a 5-run median)
        // elevates BOTH bracketing sentinels, while a heavy query's own
        // GC/cleaner shadow elevates only the TRAILING one — the first
        // full-surface run flagged 9 streaming/dedup heavies purely on
        // their trailing shadow. Max is still RECORDED (the shadow is
        // real information); min decides.
        val ratioMin = if (ratios.isEmpty) 1.0 else ratios.min
        n += 1
        if (ts.exists(_ < 0)) return Row(-1.0, -1.0, ratio, contaminated = false, n - 1)
        val sorted = ts.sorted
        val med = sorted(2); val iqr = sorted(3) - sorted(1)
        attempts = (med, iqr, ratio) :: attempts
        val clean = ratioMin <= 1.4 && (med < 0.3 || iqr / med <= 0.5)
        if (clean) kept = Some((med, iqr, ratio))
      }
      kept match {
        case Some((m, i, r)) => Row(m, i, r, contaminated = false, reruns = n - 1)
        case None => // fastest attempt = tightest upper bound taken under load
          val (m, i, r) = attempts.minBy(_._1)
          Row(m, i, r, contaminated = true, reruns = n - 1)
      }
    }

    val results = names.map(name => name -> measure(name))
    // Locale.ROOT: the f-interpolator honors the default JVM locale, which
    // under e.g. de_DE emits decimal COMMAS and corrupts the JSON contract
    def fmt(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def jmap(kvs: Seq[(String, String)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (k, r) => k -> fmt(r.median) })
    val iqrs = jmap(results.map { case (k, r) => k -> fmt(r.iqr) })
    val sents = jmap(results.map { case (k, r) => k -> fmt(r.sentinel) })
    val reruns = jmap(results.collect { case (k, r) if r.reruns > 0 => k -> r.reruns.toString })
    val contaminated = results.collect { case (k, r) if r.contaminated => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val floorJson = jmap(sentinelNames.map(s => s -> fmt(floors.getOrElse(s, -1.0))))
    val total = results.map(_._2.median).filter(_ >= 0).sum
    // importer throughput point (skipped during SPARK_GRAFT_ONLY iteration)
    val imp = if (only.isEmpty) importerBench(spark, sfDir) else None
    val impJson = imp.map { case (rows, sec, bytes) =>
      val secS = String.format(java.util.Locale.ROOT, "%.2f", Double.box(sec))
      val rps = if (sec > 0) String.format(java.util.Locale.ROOT, "%.0f", Double.box(rows / sec)) else "-1"
      s""","importer":{"rows":$rows,"sec":$secS,"rows_per_sec":$rps,"csv_bytes":$bytes}"""
    }.getOrElse("")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","protocol":"median-of-5-warm-adjudicated","queries":$qs,"iqr":$iqrs,"sentinel":$sents,"sentinel_floor":$floorJson,"reruns":$reruns,"contaminated":$contaminated$impJson,"sf":"$sfDir"}"""
    println(line)
    // stdout passes through sbt's logger ([info] prefixes); also drop the
    // bare line in a file so consumers get clean JSON either way — but
    // NEVER from a SPARK_GRAFT_ONLY subset run, which would silently
    // replace the full-surface record with a partial one
    if (only.isEmpty)
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LAST.json"),
        (line + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () }
    spark.stop()
  }
}
