package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-oriented defaults every entry point shares.
  *
  * AQE is on so runtime statistics drive skew-join splitting, partition
  * coalescing and broadcast demotion at 100 TB; shuffle partitions default to
  * the local core count (the driver overrides via env on a real cluster).
  */
object Engine {
  def session(appName: String = "graft",
              master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
              shufflePartitions: Option[String] = None): SparkSession = {
    val sp = shufflePartitions.getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sp)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
  }
}
