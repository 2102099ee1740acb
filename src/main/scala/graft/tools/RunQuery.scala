package graft.tools

import graft.{Engine, SparkEntry}

/** Run any declared query by name against a data directory and print the
  * first rows — the quickest way to eyeball an operator.
  *
  * Usage: runMain graft.tools.RunQuery <queryName> [sfDir] [numRows]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: RunQuery <queryName> [sfDir] [numRows]; " +
      s"queries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val n = if (args.length > 2) args(2).toInt else 20
    val fn = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = Engine.session("graft-run-query")
    spark.sparkContext.setLogLevel("WARN")
    fn(spark, sfDir).show(n, truncate = false)
    spark.stop()
  }
}
