package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named queries (ad-hoc audits). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // a path-looking arg overrides the data dir (else SPARK_GRAFT_SF_DIR)
    val dir = args.find(_.startsWith("/")).getOrElse(sfDir)
    args.filterNot(_.startsWith("/")).foreach { q =>
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
