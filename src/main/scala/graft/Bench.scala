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
    // (median, iqr) over 5 warm runs
    val results = names.map { name =>
      val ts = Seq.fill(5)(runOnce(name))
      if (ts.exists(_ < 0)) name -> (-1.0, -1.0)
      else {
        val s = ts.sorted
        name -> (s(2), s(3) - s(1))
      }
    }
    // Locale.ROOT: the f-interpolator honors the default JVM locale, which
    // under e.g. de_DE emits decimal COMMAS and corrupts the JSON contract
    def fmt(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, (m, _)) => "\"" + k + "\":" + fmt(m) }
      .mkString("{", ",", "}")
    val iqrs = results.map { case (k, (_, i)) => "\"" + k + "\":" + fmt(i) }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    // importer throughput point (skipped during SPARK_GRAFT_ONLY iteration)
    val imp = if (only.isEmpty) importerBench(spark, sfDir) else None
    val impJson = imp.map { case (rows, sec, bytes) =>
      val secS = String.format(java.util.Locale.ROOT, "%.2f", Double.box(sec))
      val rps = if (sec > 0) String.format(java.util.Locale.ROOT, "%.0f", Double.box(rows / sec)) else "-1"
      s""","importer":{"rows":$rows,"sec":$secS,"rows_per_sec":$rps,"csv_bytes":$bytes}"""
    }.getOrElse("")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","protocol":"median-of-5-warm","queries":$qs,"iqr":$iqrs$impJson,"sf":"$sfDir"}"""
    println(line)
    // stdout passes through sbt's logger ([info] prefixes); also drop the
    // bare line in a file so consumers get clean JSON either way
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LAST.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
