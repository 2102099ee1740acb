package graft.importer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Twitter-dump row cleanse (reference package.scala:80-93), rebuilt without
  * the driver round-trip: the reference collected suspect ids to the driver
  * and filtered with a literal `NOT IN` list — unbounded at 100 TB
  * (SURVEY.md §3.4). Here the suspect set stays distributed as a left-anti
  * join, preserving the reference's observable semantics exactly:
  *
  *   - rows whose `tweet_time` is null or doesn't match `yyyy-MM-dd HH:mm`
  *     are removed (including OTHER rows sharing the same tweetid — the
  *     `NOT IN` contract);
  *   - rows with NULL `tweetid` are removed IFF the suspect set is non-empty
  *     (SQL three-valued `NOT IN` semantics, the property the reference's test
  *     actually certifies — ImportTest.scala:58-60; with zero suspect rows the
  *     reference skips the filter entirely and NULL ids survive).
  */
object Cleanse {
  /** Reference validity regex (package.scala:84): `yyyy-MM-dd HH:mm`, anchored
    * both ends — the reference's `case pattern(...)` is a whole-string match,
    * so trailing content (seconds, corrupt-row junk) makes a row suspect.
    */
  val TweetTimePattern = "^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}$"

  def twitterCleanse(df: DataFrame): DataFrame = {
    val bad = df
      .filter(col("tweet_time").isNull || !col("tweet_time").rlike(TweetTimePattern))
      .select(col("tweetid"))
    // NULL ids never match the anti join, so they survive it; `NOT IN` drops
    // them only when the list is non-empty. A broadcast 1-row count keeps that
    // conditional fully distributed (no driver-side isEmpty round-trip).
    val badCnt = broadcast(bad.agg(count(lit(1)).as("_graft_bad_cnt")))
    df.join(bad, Seq("tweetid"), "left_anti")
      .crossJoin(badCnt)
      .filter(col("tweetid").isNotNull || col("_graft_bad_cnt") === 0)
      .drop("_graft_bad_cnt")
  }
}
