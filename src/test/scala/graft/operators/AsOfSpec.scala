package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Crafted-case coverage for the generic as-of join, including the equal-time
  * and tie-break semantics the q09 oracle can't isolate.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    (1L, 100L, 10.0), // key 1: quotes at t=100, 200 (two at 200 -> tiebreak)
    (1L, 200L, 11.0),
    (1L, 200L, 12.0),
    (2L, 500L, 20.0)
  ).toDF("k", "t", "px")

  private def trades = Seq(
    (1L, 150L, "a"), // matches quote@100
    (1L, 200L, "b"), // inclusive: quote@200 (px=12 by tiebreak); strict: quote@100
    (1L, 50L, "c"),  // no prior quote
    (2L, 600L, "d")  // matches quote@500
  ).toDF("k", "t", "tag")

  test("inclusive as-of matches latest right with t <= left.t, tie-broken") {
    val out = AsOf.asofJoin(trades, quotes, "k", "t", "t", strict = false,
      rightTieBreak = Some("px"))
      .select($"tag", $"matched.t".as("qt"), $"matched.px".as("px"))
      .orderBy($"tag").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1), if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    assert(out.toSeq === Seq(
      ("a", 100L, 10.0),
      ("b", 200L, 12.0), // equal time included; larger px wins the tie
      ("c", -1L, -1.0),  // nothing prior
      ("d", 500L, 20.0)))
  }

  test("strict as-of excludes equal-time right rows") {
    val out = AsOf.asofJoin(trades, quotes, "k", "t", "t", strict = true,
      rightTieBreak = Some("px"))
      .select($"tag", $"matched.t".as("qt"))
      .orderBy($"tag").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq === Seq(
      ("a", 100L),
      ("b", 100L), // quote@200 excluded under strict <
      ("c", -1L),
      ("d", 500L)))
  }

  test("generic as-of agrees with q09 on the events data") {
    val e = graft.Tables.events(spark, sf0001)
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts2")
    val signups = e.filter($"event_type" === "signup")
      .select($"event_id".as("s_event_id"), $"user_id", $"ts2".as("s_ts2"))
    val generic = AsOf.asofJoin(purchases, signups, "user_id", "ts2", "s_ts2",
      strict = false, rightTieBreak = Some("s_event_id"))
      .select($"event_id", $"matched.s_ts2".cast("string").as("signup_ts"))
      .orderBy($"event_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val q09 = Events.q09AsofJoin(spark, sf0001)
      .select($"event_id", $"signup_ts")
      .orderBy($"event_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // q09's frame is strictly-preceding in (ts, event_id) stream order; the
    // generic inclusive join only differs if a signup and purchase share a
    // truncated second with inverted ids — assert equality and surface it if
    // the data ever grows such a collision
    assert(generic === q09)
  }
}
