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
  *   - rows with NULL `tweetid` are removed (SQL three-valued `NOT IN`
  *     semantics, the property the reference's test actually certifies —
  *     ImportTest.scala:58-60).
  */
object Cleanse {
  /** Reference validity regex (package.scala:84): `yyyy-MM-dd HH:mm` prefix. */
  val TweetTimePattern = "^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}"

  def twitterCleanse(df: DataFrame): DataFrame = {
    val bad = df
      .filter(col("tweet_time").isNull || !col("tweet_time").rlike(TweetTimePattern))
      .select(col("tweetid"))
    df.join(bad, Seq("tweetid"), "left_anti")
      .filter(col("tweetid").isNotNull)
  }
}
