package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke-check for the extensions entry point: builds a session with
  * `spark.sql.extensions=graft.functions.GraftExtensions` and resolves
  * `graft_cosine` from SQL without any manual registration. Run standalone
  * (fresh JVM) — extensions only apply at session construction.
  */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val v = spark.sql(
      "SELECT graft_cosine(array(1.0d, 2.0d), array(2.0d, 4.0d))").collect()(0).getDouble(0)
    println(s"""{"check":"extensions","graft_cosine":$v,"ok":${math.abs(v - 1.0) < 1e-12}}""")
    spark.stop()
  }
}
