package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Sink helpers beyond the importer's parquet writes: format fan-out and the
  * file-sizing knobs that matter at 100 TB (partition-internal sort for
  * row-group locality, `maxRecordsPerFile` to bound file sizes under
  * dynamic-partition writes).
  */
object Writers {

  /** Partitioned parquet with bounded file sizes and internally-sorted files:
    * one shuffle on the partition columns, per-file record cap, optional
    * within-partition sort so min/max row-group stats enable scan skipping.
    */
  def partitionedParquet(df: DataFrame, dest: String,
                         partitionCols: Seq[String],
                         sortCols: Seq[String] = Nil,
                         maxRecordsPerFile: Long = 0L): Unit = {
    val repart = df.repartition(partitionCols.map(col): _*)
    val sorted =
      if (sortCols.nonEmpty)
        repart.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else repart
    sorted.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(dest)
  }

  /** Single-format writers (overwrite) — csv keeps a header for round-trips
    * with the importer.
    */
  def csv(df: DataFrame, dest: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(dest)

  def json(df: DataFrame, dest: String): Unit =
    df.write.mode("overwrite").json(dest)

  def orc(df: DataFrame, dest: String): Unit =
    df.write.mode("overwrite").orc(dest)

  def parquet(df: DataFrame, dest: String): Unit =
    df.write.mode("overwrite").parquet(dest)
}
