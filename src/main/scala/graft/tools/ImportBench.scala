package graft.tools

import graft.{Engine, Tables}
import graft.importer.{ImportConfig, Importer}
import graft.sources.Writers
import java.nio.file.Files

/** Importer throughput measurement (the reference's core workload:
  * multi-GB CSV → partitioned Parquet). Materializes `lineitem` at the given
  * SF as CSV, then times the full pipeline: schema application → date-derived
  * partitioning column → partitioned parquet write.
  *
  * Usage: runMain graft.tools.ImportBench [sfDir] [replication]
  *
  * `replication` unions the sf lineitem N times before the CSV
  * materialization, producing a multi-hundred-MB MULTI-FILE dump — the
  * reference's actual "multi-GB dumps" workload shape (README.md:11) —
  * so the throughput trend line has a point beyond a single small file.
  */
object ImportBench {
  def main(args: Array[String]): Unit = BenchLock.exclusiveWait("ImportBench") {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val spark = Engine.session("graft-import-bench")
    spark.sparkContext.setLogLevel("WARN")
    val work = Files.createTempDirectory("graft-import-bench").toString

    // materialize CSV input (timestamp as string, like real CSV dumps)
    import org.apache.spark.sql.functions._
    val li0 = Tables(spark, sfDir, "lineitem")
      .withColumn("l_shipdate", date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm"))
    val li = Seq.fill(rep)(li0).reduce(_ union _)
    Writers.csv(li, s"$work/lineitem_csv")
    val rows = li.count()
    val csvBytes = new java.io.File(s"$work/lineitem_csv").listFiles()
      .filter(_.getName.endsWith(".csv")).map(_.length()).sum
    val csvFiles = new java.io.File(s"$work/lineitem_csv").listFiles()
      .count(_.getName.endsWith(".csv"))

    val schemaFile = s"$work/lineitem.schema"
    Files.writeString(java.nio.file.Paths.get(schemaFile),
      """l_orderkey=Long
        |l_partkey=Long
        |l_suppkey=Long
        |l_linenumber=Int
        |l_quantity=Double
        |l_extendedprice=Double
        |l_discount=Double
        |l_tax=Double
        |l_returnflag=String
        |l_linestatus=String
        |l_shipdate=String
        |""".stripMargin)

    val t0 = System.nanoTime()
    Importer.readCsvWriteParquet(ImportConfig(
      srcFile = s"$work/lineitem_csv",
      destFile = s"$work/out",
      schemaFile = Some(schemaFile),
      dateEnrich = Some("l_shipdate"),
      sortCols = Seq("l_orderkey"),
      partitionCols = Seq("year")))(spark)
    val sec = (System.nanoTime() - t0) / 1e9
    val outRows = spark.read.parquet(s"$work/out").count()
    println(s"""{"metric":"import_csv_to_partitioned_parquet","rows":$rows,"out_rows":$outRows,"sec":$sec,"rows_per_sec":${(rows / sec).toLong},"csv_bytes":$csvBytes,"csv_files":$csvFiles,"replication":$rep,"sf":"$sfDir"}""")
    // the replicated dump can reach ~0.5 GB — don't leave it in /tmp
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(work)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
