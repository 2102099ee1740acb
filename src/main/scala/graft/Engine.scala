package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
      // coalesce by parallelism, not only bytes: CPU-heavy, byte-small
      // exchanges (tokenize/shingle/hash pipelines) otherwise collapse to
      // one task — byte-based sizing can't see per-row compute cost
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
  }

  /** Register every test table as a temp view (events additionally as
    * `events_ts2` with the canonical D4 timestamp) and the custom functions —
    * after this, the whole declared surface is reachable via `spark.sql`.
    */
  def openCatalog(spark: SparkSession, dir: String): Unit = {
    Tables.all.foreach(n => Tables(spark, dir, n).createOrReplaceTempView(n))
    Tables.events(spark, dir).createOrReplaceTempView("events_ts2")
    graft.functions.VectorFunctions.register(spark)
    graft.functions.BloomFunctions.register(spark)
  }

  /** `openCatalog` + `spark.sql` in one call. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    openCatalog(spark, dir)
    spark.sql(query)
  }
}
