package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Watermark late-data semantics (SURVEY.md §5.2 item 5): events arriving
  * behind the watermark must be dropped from append-mode windowed
  * aggregation. Drives a file-source stream batch-by-batch: the second batch
  * carries an event older than the watermark established by the first.
  */
class LateDataSpec extends SparkSpec {
  import spark.implicits._

  test("append-mode windowed agg drops events behind the watermark") {
    val dir = Files.createTempDirectory("graft-late").toString
    def write(name: String, rows: Seq[(Timestamp, Long)]): Unit =
      rows.toDF("ts2", "user_id").repartition(1)
        .write.mode("append").parquet(dir)
    def t(m: Int, s: Int = 0) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

    // batch 1: events at 10:05 and 10:35 -> watermark advances to 10:25
    write("b1", Seq((t(5), 1L), (t(35), 1L)))

    val stream = spark.readStream
      .schema("ts2 TIMESTAMP, user_id BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withWatermark("ts2", "10 minutes")
      .groupBy(window($"ts2", "10 minutes"), $"user_id")
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".cast("string").as("w"), $"user_id", $"cnt")

    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("late_data_t").start()
    try {
      q.processAllAvailable()
      // batch 2: one LATE event at 10:02 (behind the 10:25 watermark -> must
      // be dropped; its window [10:00,10:10) is already finalized) and one
      // on-time event at 10:50 that pushes the watermark onward
      write("b2", Seq((t(2), 1L), (t(50), 1L)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("late_data_t")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    // the 10:00 window was finalized with ONLY the 10:05 event; the late
    // 10:02 arrival did not resurrect or grow it
    assert(out.get("2024-01-01 10:00:00").contains(1L), s"got $out")
  }
}
