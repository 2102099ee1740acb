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

  test("stream-stream join drops a late click whose view state was evicted") {
    val dir = Files.createTempDirectory("graft-late-join").toString
    def write(rows: Seq[(Timestamp, Long, String)]): Unit =
      rows.toDF("ts2", "user_id", "event_type").repartition(1)
        .write.mode("append").parquet(dir)
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    // batch 1: a matched view/click pair for user 1, plus far-future events
    // on BOTH sides (user 99) so both watermark columns advance to 12:50
    write(Seq((t(10, 0), 1L, "view"), (t(10, 5), 1L, "click"),
      (t(13, 0), 99L, "view"), (t(13, 0), 99L, "click")))

    val ev = spark.readStream
      .schema("ts2 TIMESTAMP, user_id BIGINT, event_type STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts2".as("view_ts"))
      .withWatermark("view_ts", "10 minutes")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("cuser"), $"ts2".as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val joined = views.join(clicks,
      $"user_id" === $"cuser" &&
        $"click_ts" >= $"view_ts" &&
        $"click_ts" <= $"view_ts" + expr("INTERVAL 30 MINUTES"))
      .select($"user_id", $"view_ts".cast("long").as("ves"), $"click_ts".cast("long").as("ces"))

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("late_join_t").start()
    try {
      q.processAllAvailable()
      // batch 2: a click at 10:10 — inside the 10:00 view's 30-min join
      // window, but behind the 12:50 watermark: the view's buffered state
      // was already evicted, so no pair may appear
      write(Seq((t(10, 10), 1L, "click")))
      q.processAllAvailable()
    } finally q.stop()

    val pairs = spark.table("late_join_t")
      .filter($"user_id" === 1L).collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val es = (h: Int, m: Int) => t(h, m).getTime / 1000
    assert(pairs === Set((es(10, 0), es(10, 5))),
      s"late click must not join an evicted view: $pairs")
  }
}
