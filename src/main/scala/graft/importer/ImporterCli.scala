package graft.importer

import graft.Engine
import org.apache.spark.sql.SparkSession

/** CLI entry point (reference App.scala:11-36, Config.scala:5-24): same
  * option surface, `k=v,k=v` Spark conf passthrough, `--threads` session
  * control, wall-clock + schema logging.
  *
  * Usage:
  *   ImporterCli --srcFile in.csv --destFile out.parquet [--delimiter ,]
  *     (`--delimeter`, the reference's misspelled long option from
  *     Config.scala, is accepted as an alias so existing invocations work)
  *     [--schemaFile f] [--slashEscapes] [--dateEnrich col]
  *     [--arrayCols a,b] [--removeArraySrc] [--sortCols a,b]
  *     [--partitionCols a,b] [--twitterCleanse] [--sparkOpts k=v,k=v]
  *     [--threads n]
  */
object ImporterCli {

  private[importer] def parseArgs(args: Array[String]): (ImportConfig, Map[String, String], String) = {
    val flags = Set("--slashEscapes", "--removeArraySrc", "--twitterCleanse")
    var opts = Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (!a.startsWith("--")) throw new IllegalArgumentException(s"Unexpected argument '$a'")
      // The reference's long option is the misspelled "--delimeter"
      // (Config.scala:5-24); alias it so reference invocations keep working.
      val key = if (a == "--delimeter") "delimiter" else a.drop(2)
      if (flags.contains(a)) { opts += (key -> "true"); i += 1 }
      else if (i + 1 < args.length) { opts += (key -> args(i + 1)); i += 2 }
      else throw new IllegalArgumentException(s"Missing value for '$a'")
    }
    def list(k: String): Seq[String] =
      opts.get(k).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val conf = ImportConfig(
      srcFile = opts.getOrElse("srcFile", throw new IllegalArgumentException("--srcFile is required")),
      destFile = opts.getOrElse("destFile", throw new IllegalArgumentException("--destFile is required")),
      delimiter = opts.getOrElse("delimiter", ","),
      schemaFile = opts.get("schemaFile"),
      slashEscapes = opts.contains("slashEscapes"),
      dateEnrich = opts.get("dateEnrich"),
      arrayCols = list("arrayCols"),
      removeArraySrc = opts.contains("removeArraySrc"),
      sortCols = list("sortCols"),
      partitionCols = list("partitionCols"),
      twitterCleanse = opts.contains("twitterCleanse"))
    val sparkOpts = list("sparkOpts").map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => k -> v
        case _ => throw new IllegalArgumentException(s"Malformed --sparkOpts entry '$kv'")
      }
    }.toMap
    (conf, sparkOpts, opts.getOrElse("threads", "*"))
  }

  def main(args: Array[String]): Unit = {
    val (conf, sparkOpts, threads) = parseArgs(args)
    val builder = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-importer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    sparkOpts.foreach { case (k, v) => builder.config(k, v) }
    implicit val spark: SparkSession = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val out = Importer.readCsvWriteParquet(conf)
    println(f"Complete in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    out.printSchema()
    spark.stop()
  }
}
