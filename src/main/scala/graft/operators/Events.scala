package graft.operators

import graft.{Dsl, Tables}
import graft.Dsl._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporal / event-stream surface: range & as-of joins, distinct aggregation,
  * grouping sets, JSON extraction, sessionization, tumbling & sliding windows
  * (SURVEY.md §2.3 Q08, Q09, Q11, Q14, Q25, Q31-Q33).
  *
  * D4 applies throughout: `events.ts` is nanosecond parquet, truncated to whole
  * seconds before any comparison or output. The batch formulations here have
  * Structured Streaming twins in [[graft.streaming.Windows]].
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  private def events(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  /** Q08: range (theta) join — pairs of same-user events within (t, t+5min].
    *
    * Banded/binned formulation: time is bucketed into 300-second bins and the
    * left side is exploded to (bin, bin+1), making the range join a pure
    * EQUI-join on (user, bin) plus a residual filter. A plain join on user_id
    * with the range as a filter compares every same-user pair — O(m²) per
    * user, which a hot user (or device firehose) turns into a straggler at
    * 100 TB; binning bounds the work to genuinely-nearby pairs at 2× fan-out.
    */
  def q08RangeJoin: Q = (s, d) => {
    val e = events(s, d)
      .select(col("event_id"), col("user_id"), epochSec(col("ts2")).as("es"))
    val bin = floor(col("es") / 300).cast("long")
    val e1 = e.select(col("event_id").as("id1"), col("user_id").as("u"),
      col("es").as("t1"), explode(array(bin, bin + 1)).as("bin"))
    val e2 = e.select(col("event_id").as("id2"), col("user_id").as("u"),
      col("es").as("t2"), bin.as("bin"))
    e1.join(e2, Seq("u", "bin"))
      .filter(col("t2") > col("t1") && col("t2") <= col("t1") + 300)
      .select(col("id1"), col("id2"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Q09: as-of join — each purchase matched to the latest preceding signup of
    * the same user (stream order = (ts, event_id), strictly-preceding frame).
    * Single windowed pass over the union — no per-row subquery, no shuffle
    * beyond one hash partitioning by user.
    */
  def q09AsofJoin: Q = (s, d) => {
    val e = events(s, d).filter(col("event_type").isin("signup", "purchase"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts2"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("signup_ts",
        last(when(col("event_type") === "signup", col("ts2")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), tsStr(col("ts2")).as("purchase_ts"),
        tsStr(col("signup_ts")).as("signup_ts"))
      .orderBy(col("event_id"))
  }

  /** Q94: FORWARD as-of join with tolerance — q09's mirror: each signup
    * matched to the EARLIEST subsequent purchase of the same user, but only
    * if it lands within 1 hour (the attribution-window shape: does a signup
    * convert quickly). Same single-windowed-pass design as q09 (one hash
    * exchange on user, strictly-following frame, no per-row subquery);
    * the tolerance is a post-filter that nulls out late conversions.
    */
  def q94AsofForward: Q = (s, d) => {
    val e = events(s, d).filter(col("event_type").isin("signup", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        epochSec(col("ts2")).as("es"))
    // GROWING frame over the reversed order, value-identical to
    // first_value over (1, unboundedFollowing) forward: Spark recomputes
    // shrinking frames per row (O(n²) per user — a hot device's firehose
    // would crawl at scale), growing frames incrementally (the q174
    // round-10 lesson)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("es").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("np",
        last(when(col("event_type") === "purchase", col("es")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("es").as("signup_es"),
        when(col("np") <= col("es") + 3600, col("np")).as("purchase_es"))
      .withColumn("gap_sec", col("purchase_es") - col("signup_es"))
      .orderBy(col("event_id"))
  }

  /** Q97: SLIDING DISTINCT — trailing-6-hour distinct users per event type,
    * one row per (type, hour). COUNT(DISTINCT) over a sliding frame is not
    * expressible as a window aggregate in either engine; the scalable
    * formulation is bounded replication: each distinct (type, user, hour)
    * observation is exploded to the 6 window-hours it contributes to
    * (fan-out = window span, map-side), then deduped and counted — two
    * exchanges, no per-row subquery, no self-join. The exact-distinct shape;
    * at extreme cardinalities the sketch path is per-hour HLL merged across
    * the frame (q35's family).
    */
  def q97SlidingDistinct: Q = (s, d) => {
    val base = events(s, d)
      .select(col("event_type"), col("user_id"), epochSec(col("ts2")).as("es"))
      .select(col("event_type"), col("user_id"), expr("es div 3600").as("h"))
      .distinct()
    base.select(col("event_type"), col("user_id"),
        explode(sequence(col("h"), col("h") + 5)).as("wh"))
      .distinct()
      .groupBy(col("event_type"), col("wh"))
      .agg(count(lit(1)).as("uniq_users"))
      .orderBy(col("event_type"), col("wh"))
  }

  /** Q99: volume-anomaly detection — per event type, the 20 hours whose
    * event counts deviate most from that type's mean in z-score terms (the
    * pipeline-monitoring query: traffic spikes and ingestion holes). All
    * moments are exact integer sums (s1, s2 stay < 2^53, so the double
    * conversions are exact and the identical arithmetic shape makes z
    * bit-equal across engines — the q48 discipline); two aggregations plus
    * a broadcast-size join of per-type stats back onto hourly counts.
    */
  def q99HourlyAnomaly: Q = (s, d) => {
    val hourly = events(s, d)
      .select(col("event_type"), epochSec(col("ts2")).as("es"))
      .select(col("event_type"), expr("es div 3600").as("h"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"))
    val st = hourly.groupBy(col("event_type"))
      .agg(sum(col("n")).as("s1"), sum(col("n") * col("n")).as("s2"),
        count(lit(1)).as("cnt"))
    val s1d = col("s1").cast("double")
    val cntd = col("cnt").cast("double")
    val variance = (col("s2").cast("double") - s1d * s1d / cntd) / (cntd - 1)
    hourly.join(broadcast(st), Seq("event_type"))
      .filter(variance > 0)
      .withColumn("z",
        round((col("n").cast("double") - s1d / cntd) / sqrt(variance), 6))
      .select(col("event_type"), col("h"), col("n"), col("z"))
      .orderBy(abs(col("z")).desc, col("event_type"), col("h"))
      .limit(20)
  }

  /** Q11: exact distinct aggregation (D6 — `approx_count_distinct` is the
    * engine-only scale path, tested separately for error bound).
    */
  def q11DistinctAgg: Q = (s, d) => {
    events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("uniq_users"), count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))
  }

  /** Q14: GROUPING SETS — (type), (type, hour), () in one pass. */
  def q14GroupingSets: Q = (s, d) => {
    val e = events(s, d).withColumn("h", date_trunc("hour", col("ts2")).cast("string"))
    e.createOrReplaceTempView("graft_q14_events")
    s.sql(
      """SELECT event_type, h,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  CAST(GROUPING(event_type) AS BIGINT) AS g_t, CAST(GROUPING(h) AS BIGINT) AS g_h
        |FROM graft_q14_events
        |GROUP BY GROUPING SETS ((event_type), (event_type, h), ())
        |ORDER BY g_t, g_h, event_type ASC NULLS FIRST, h ASC NULLS FIRST""".stripMargin)
  }

  /** Q25: JSON extraction + aggregation over the `props` payload. */
  def q25Json: Q = (s, d) => {
    val k = get_json_object(col("props"), "$.k").cast("long")
    events(s, d)
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
        (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
      .orderBy(col("event_type"))
  }

  /** Q31: sessionization (gaps-and-islands): 30-min inactivity gap splits a
    * user's events into sessions; reports per-user session count + average
    * session length in seconds. Two windowed passes + one aggregate, all
    * partitioned by user — scales linearly with users.
    */
  def q31Sessionize: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = events(s, d).select(col("user_id"), col("event_id"), epochSec(col("ts2")).as("es"))
    val flagged = e.withColumn("new_sess",
      when(lag(col("es"), 1).over(w).isNull || col("es") - lag(col("es"), 1).over(w) > 1800, 1L)
        .otherwise(0L))
    val sessions = flagged
      .withColumn("session_id", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg((max(col("es")) - min(col("es"))).as("len_sec"))
    sessions.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        (sum(col("len_sec")).cast("double") / count(lit(1))).as("avg_len_sec"))
      .orderBy(col("user_id"))
  }

  /** Q132: trajectory assembly — turning interaction logs into ordered
    * training sequences (the SFT/agent-trajectory construction step): q31's
    * 30-minute-gap sessionization, then per session the event-type sequence
    * in exact temporal order as one space-joined string, with event count
    * and duration. Order determinism: `collect_list` gives no ordering
    * guarantee under parallel aggregation, so the structs are
    * `array_sort`ed on (es, event_id) AFTER collection — a per-group
    * O(n log n) on bounded session sizes, not a global sort. At 100 TB the
    * shuffle is the same one keyed aggregate as q31; the assembled text
    * rides the existing session partitioning.
    */
  def q132TrajectoryAssembly: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pinned user-keyed exchange (the q195 pattern): the one-row-group scan
    // plus byte-small window input ran the session windows + per-session
    // collect/sort single-task (measured 2×0.4 s at sf0.1 — opt r14)
    val e = events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), epochSec(col("ts2")).as("es"))
      .repartition(s.sparkContext.defaultParallelism, col("user_id"))
    val flagged = e.withColumn("new_sess",
      when(lag(col("es"), 1).over(w).isNull || col("es") - lag(col("es"), 1).over(w) > 1800, 1L)
        .otherwise(0L))
    flagged.withColumn("session_id", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("es")) - min(col("es"))).as("len_sec"),
        array_join(transform(
          array_sort(collect_list(struct(col("es"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), " ").as("trajectory"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Q32: tumbling window (batch analog) — hourly counts and exact-decimal
    * value sums per event type. Streaming twin: `window($"ts", "1 hour")` with
    * a watermark in [[graft.streaming.Windows]].
    */
  def q32Tumbling: Q = (s, d) => {
    events(s, d)
      .withColumn("h", date_trunc("hour", col("ts2")).cast("string"))
      .groupBy(col("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("sum_value"))
      .orderBy(col("h"), col("event_type"))
  }

  /** Q33: sliding window — per-event trailing 10-minute value sum per user,
    * via a RANGE frame over epoch seconds (inclusive 600s lower bound in both
    * engines; decimal sum is order-independent).
    */
  def q33Sliding: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es")).rangeBetween(-600, 0)
    events(s, d)
      .select(col("event_id"), col("user_id"), epochSec(col("ts2")).as("es"), col("value"))
      .withColumn("trailing_sum", sum(dec(col("value"))).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("trailing_sum"))
      .orderBy(col("event_id"))
  }

  /** Q75: cohort retention — users bucketed by their FIRST-seen hour, then
    * counted per (cohort, age) over their distinct active hours: the classic
    * retention table. Two aggregates and one equi-join on user_id; at scale
    * every step shuffles on user_id so the exchanges line up (Catalyst
    * reuses the partitioning between the distinct, the min-aggregate and
    * the join).
    */
  def q75Retention: Q = (s, d) => {
    val ev = events(s, d)
      .select(col("user_id"), (epochSec(col("ts2")) / 3600).cast("long").as("hr"))
    val firstHr = ev.groupBy(col("user_id")).agg(min(col("hr")).as("cohort_hr"))
    ev.distinct()
      .join(firstHr, Seq("user_id"))
      .groupBy(col("cohort_hr"), (col("hr") - col("cohort_hr")).as("age_hours"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_hr"), col("age_hours"))
  }

  /** Q76: strict-order funnel conversion — users whose first view precedes
    * a click precedes a purchase, counted per stage. Each stage is an
    * aggregate + equi-join on user_id (all exchanges align on the same
    * key), so the funnel is three shuffle-sharing hash joins at any scale,
    * never a window over the full event history.
    */
  def q76Funnel: Q = (s, d) => {
    val e = events(s, d)
      .select(col("user_id"), col("event_type"), epochSec(col("ts2")).as("es"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("es")).as("ves"))
    val c = e.filter(col("event_type") === "click").join(v, Seq("user_id"))
      .filter(col("es") >= col("ves"))
      .groupBy(col("user_id")).agg(min(col("es")).as("ces"))
    val p = e.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
      .filter(col("es") >= col("ces"))
      .groupBy(col("user_id")).agg(min(col("es")).as("pes"))
    v.select(lit(1L).as("stage"), lit("view").as("name"), col("user_id"))
      .union(c.select(lit(2L).as("stage"), lit("click").as("name"), col("user_id")))
      .union(p.select(lit(3L).as("stage"), lit("purchase").as("name"), col("user_id")))
      .groupBy(col("stage"), col("name"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("stage"))
  }

  /** Q85: MapType functions — the map-column surface (construction, lookup,
    * keys/values introspection) over a per-event-type hour→count profile.
    * `collect_list` order is partitioning-dependent, so the entries are
    * `array_sort`ed BEFORE `map_from_entries` — the map value is then a pure
    * function of the data (hr is unique per group, making the sort total)
    * and every extraction is deterministic. Lookups of absent keys null-fill
    * through `coalesce`. The collect is per (event_type, hour) AGGREGATE
    * rows — 24 entries per group, bounded regardless of event volume.
    */
  def q85MapFuncs: Q = (s, d) => {
    val h = events(s, d)
      .groupBy(col("event_type"), big(hour(col("ts2"))).as("hr"))
      .agg(count(lit(1)).as("c"))
    h.groupBy(col("event_type"))
      .agg(map_from_entries(array_sort(collect_list(struct(col("hr"), col("c")))))
        .as("hm"))
      .select(col("event_type"),
        big(size(col("hm"))).as("n_keys"),
        big(coalesce(element_at(col("hm"), lit(9L)), lit(0L))).as("c9"),
        big(coalesce(element_at(col("hm"), lit(21L)), lit(0L))).as("c21"),
        big(array_min(map_keys(col("hm")))).as("first_hr"),
        big(array_max(map_values(col("hm")))).as("max_c"))
      .orderBy(col("event_type"))
  }

  /** Q170: SCD Type-2 history construction — the warehouse primitive that
    * turns a change stream into validity intervals: per user, consecutive
    * runs of the same event_type collapse to one [valid_from, valid_to)
    * row with a version number; the current row's valid_to is NULL. Change
    * detection (lag) and interval stitching (lead) ride the same
    * user-partitioned window — bounded by per-user activity, ONE shuffle
    * on user_id, no self-join (the naive formulation joins each row to its
    * successor — a second shuffle and a skew hazard on hot users).
    * Deterministic under timestamp ties via the event_id tiebreak.
    */
  /** The SCD2 kernel over a (user_id, event_id, event_type, ts2) relation —
    * shared by the batch query and q175's per-batch delta-scoped rebuild.
    */
  def scd2History(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts2"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts2"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .where(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_ts", lead(col("ts2"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_type"),
        tsStr(col("ts2")).as("valid_from"),
        tsStr(col("valid_to_ts")).as("valid_to"))
  }

  def q170Scd2: Q = (s, d) =>
    scd2History(Tables.events(s, d)).orderBy(col("user_id"), col("version"))

  /** Q174: time-series resampling with linear interpolation — the alignment
    * step multimodal/sensor pipelines run before fusing streams on a common
    * clock: each user's irregular `value` series is resampled onto the
    * hourly grid spanning their activity, every grid point linearly
    * interpolated between its neighboring events. ONE user-partitioned
    * window over the union of events and grid rows does both directions
    * (running `last` over preceding event rows for the left neighbor, ONE
    * `first` over strictly-following rows for the right) — no as-of
    * self-join, no range join; the grid explodes from a per-user
    * `sequence()` so its size is span-bounded, never event-bounded. Ties:
    * an event at exactly a grid instant sorts BEFORE the grid row, so it
    * becomes the left neighbor (tp = t → the interpolation returns the
    * event's own value) and the denominator tn − tp stays > 0.
    */
  def q174ResampleInterpolate: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), epochSec(col("ts2")).as("es"), col("value"),
        col("event_id").as("eid"))
    val grid = ev.groupBy(col("user_id"))
      .agg(min(col("es")).as("lo"), max(col("es")).as("hi"))
      // integer ceil/floor to the hour — pmod keeps it exact and portable
      .select(col("user_id"),
        (col("lo") + pmod(lit(3600L) - pmod(col("lo"), lit(3600L)), lit(3600L))).as("lo_c"),
        (col("hi") - pmod(col("hi"), lit(3600L))).as("hi_f"))
      .where(col("lo_c") <= col("hi_f"))
      .select(col("user_id"),
        explode(sequence(col("lo_c"), col("hi_f"), lit(3600L))).as("es"))
      .withColumn("is_grid", lit(1)).withColumn("eid", lit(0L))
    val both = ev.withColumn("is_grid", lit(0))
      .unionByName(grid.withColumn("value", lit(null).cast("double")),
        allowMissingColumns = false)
    // eid tiebreak: two events in the same second must resolve to ONE
    // deterministic left neighbor (the larger eid) in both engines
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("es"), col("is_grid"), col("eid"))
    val prevF = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the NEXT-neighbor side runs over the REVERSED order with a GROWING
    // (unboundedPreceding, -1) frame — value-identical to
    // first_value over (1, unboundedFollowing) on the forward order, but
    // Spark evaluates growing frames incrementally in O(n) while a
    // shrinking frame is recomputed per row in O(n²) per partition: this
    // was the whole 10 s cost of the query (round-10 plan audit; measured
    // 10.5 → ~1.5 s at sf0.1). Price: one extra in-partition sort.
    val wRev = Window.partitionBy(col("user_id"))
      .orderBy(col("es").desc, col("is_grid").desc, col("eid").desc)
    val nextF = wRev.rowsBetween(Window.unboundedPreceding, -1)
    val evEs = when(col("is_grid") === 0, col("es"))
    val evV = when(col("is_grid") === 0, col("value"))
    both
      // one select so the two same-frame pairs collapse to two Window nodes
      .select(col("user_id"), col("es"), col("is_grid"),
        last(evEs, ignoreNulls = true).over(prevF).as("tp"),
        last(evV, ignoreNulls = true).over(prevF).as("vp"),
        last(evEs, ignoreNulls = true).over(nextF).as("tn"),
        last(evV, ignoreNulls = true).over(nextF).as("vn"))
      .where(col("is_grid") === 1 && col("tp").isNotNull && col("tn").isNotNull)
      // micro-unit floor, not round(…, 6): floor has no ties, so the output
      // is bit-portable even when the interpolated double lands exactly on
      // a decimal rounding boundary (1 in ~10⁵ grid points did)
      .select(col("user_id"), col("es").as("grid_es"),
        floor((col("vp") + (col("vn") - col("vp"))
          * ((col("es") - col("tp")).cast("double") / (col("tn") - col("tp"))))
          * 1000000d).cast("long").as("v_micro"))
      .orderBy(col("user_id"), col("grid_es"))
  }

  /** Q184: multi-touch marketing attribution — credit each purchase
    * (conversion) to the FIRST and LAST non-purchase touch since the user's
    * previous purchase. The conversion epoch is a running purchase count
    * over the per-user event stream (ROWS frame, `(es, event_id)` total
    * order); touches carry the epoch they sit in, each purchase closes
    * epoch `ep − 1`, and first/last touch are `row_number` endpoints inside
    * the bounded (user, epoch) partition. All windows are user-partitioned
    * — distributed at any scale — and the credited value is an exact
    * decimal sum per channel.
    */
  def q184Attribution: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        dec(col("value")).as("v"), epochSec(col("ts2")).as("es"))
      .withColumn("ep", sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(w))
    val we = Window.partitionBy(col("user_id"), col("ep"))
    val touches = r.filter(col("event_type") =!= "purchase")
      .withColumn("rf", row_number().over(we.orderBy(col("es"), col("event_id"))))
      .withColumn("rl", row_number().over(we.orderBy(col("es").desc, col("event_id").desc)))
    val purchases = r.filter(col("event_type") === "purchase")
      .select(col("user_id"), (col("ep") - 1).as("ep"), col("v"))
    def credit(flagCol: String, prefix: String) =
      purchases.join(touches.filter(col(flagCol) === 1)
          .select(col("user_id"), col("ep"), col("event_type").as("channel")),
        Seq("user_id", "ep"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as(s"${prefix}_convs"),
          sum(col("v")).cast("double").as(s"${prefix}_value"))
    credit("rf", "first").join(credit("rl", "last"), Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("first_convs"), lit(0L)).as("first_convs"),
        coalesce(col("first_value"), lit(0.0)).as("first_value"),
        coalesce(col("last_convs"), lit(0L)).as("last_convs"),
        coalesce(col("last_value"), lit(0.0)).as("last_value"))
      .orderBy(col("channel"))
  }

  /** Q185: first-order Markov transition matrix over per-user event streams
    * — the sequence-mining primitive behind next-event prediction and
    * journey analysis. One per-user `lag` window under the `(es, event_id)`
    * total order, one count aggregate per (prev, next) pair, and row
    * probabilities as integer-over-integer doubles against a ≤5-row
    * broadcast of per-source totals. Shuffle ∝ |event types|², bounded.
    */
  def q185MarkovTransitions: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val tr = events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), epochSec(col("ts2")).as("es"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("cnt"))
    val totals = tr.groupBy(col("prev")).agg(sum(col("cnt")).as("tot"))
    tr.join(broadcast(totals), Seq("prev"))
      .select(col("prev"), col("next"), col("cnt"), col("tot"),
        round(col("cnt").cast("double") / col("tot").cast("double"), 6).as("p"))
      .orderBy(col("prev"), col("next"))
  }

  /** Q195: time-series ML feature generation per user stream — lag-1,
    * rolling mean-of-4, and a 16-tap EWMA with α = 1/2 computed in EXACT
    * DYADIC fixed point: weights 2^(15−k) over integer cents, so the
    * weighted sum is pure long arithmetic (the usual αᵏ float recursion is
    * neither associative nor cross-engine stable; truncating the tail at
    * 16 taps costs < 2⁻¹⁶ of the mass and buys exactness). Early rows
    * normalize by the weight mass of the lags that EXIST (`den`), not the
    * full 2¹⁶−… mass. One per-user window carries all 16 taps; shuffle is
    * one user-keyed exchange.
    */
  def q195TsFeatures: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val wr = w.rowsBetween(-3, 0)
    val cents = (dec(col("value")) * 100).cast("long")
    // Each lag tap is materialized ONCE by the window operator and num/den/
    // ewma are plain projections over the tap columns: the original inline
    // formulation repeated `num` and `den` inside `ewma`, and Spark's
    // window extraction does not deduplicate — the plan carried ~64 window
    // expressions (4 copies of every lag) where 18 suffice (opt r14,
    // guide §1.2 "per-task work"; plans/r14/q195_ts_features_before.txt).
    val tapCols: Seq[Column] = (1 to 15).map(k => lag(col("cents"), k).over(w).as(s"_lg$k"))
    val num = (1 to 15).map(k => coalesce(col(s"_lg$k"), lit(0L)) * (1L << (15 - k)))
      .reduce(_ + _) + col("cents") * (1L << 15)
    val den = (1 to 15).map(k =>
        when(col(s"_lg$k").isNotNull, lit(1L << (15 - k))).otherwise(lit(0L)))
      .reduce(_ + _) + lit(1L << 15)
    // pinned user-keyed exchange: the window input is byte-small but the
    // per-row window work is CPU-dense, and AQE's byte-based coalescing
    // collapsed it to ONE task (measured 3.3 s single-threaded vs 1.2 s
    // wide — the q165 pinned-exchange pattern); REPARTITION_BY_NUM on the
    // window's own partition key satisfies the window's required
    // distribution, so no second exchange is added
    events(s, d)
      .select(col("user_id"), col("event_id"), epochSec(col("ts2")).as("es"),
        col("value"), cents.as("cents"))
      .repartition(s.sparkContext.defaultParallelism, col("user_id"))
      .select(Seq(col("user_id"), col("event_id"), col("es"), col("value"),
        col("cents"),
        lag(col("value"), 1).over(w).as("lag1"),
        (sum(dec(col("value"))).over(wr).cast("double")
          / count(lit(1)).over(wr)).as("roll4")) ++ tapCols: _*)
      .select(col("user_id"), col("event_id"), col("es"), col("value"),
        col("lag1"), col("roll4"),
        num.as("ewma_num"), den.as("ewma_den"),
        round(num.cast("double") / den.cast("double") / 100.0, 6).as("ewma"))
      .orderBy(col("user_id"), col("es"), col("event_id"))
  }

  /** Q198: CUSUM change-point detection on hourly volumes per event type —
    * the monitoring primitive that localizes WHERE a level shift happened
    * (q99's z-score only says THAT an hour is anomalous). Exact integer
    * form: with T hours and total volume V, the cumulative deviation at
    * hour t is `Σ_{i≤t}(T·nᵢ − V) = T·Σnᵢ − t·V` — all longs, no float
    * mean. The change point is the argmax of |CUSUM| under an
    * `(|c| desc, hour asc)` total order, picked by one row_number inside
    * the per-type window; hourly collapse first, so the windows run over
    * the bounded per-type hour summaries.
    */
  def q198Changepoint: Q = (s, d) =>
    changepointFromHourly(
      events(s, d)
        .select(col("event_type"), epochSec(col("ts2")).as("es"))
        .select(col("event_type"), expr("es div 3600").as("h"))
        .groupBy(col("event_type"), col("h"))
        .agg(count(lit(1)).as("n")))

  /** q198's kernel over a mergeable `(event_type, h, n)` hourly summary —
    * shared with the streaming fold (q201): summaries of disjoint row sets
    * merge by summing `n` per (type, hour).
    */
  def changepointFromHourly(hourly: DataFrame): DataFrame = {
    val tot = hourly.groupBy(col("event_type"))
      .agg(sum(col("n")).cast("long").as("v"), count(lit(1)).as("t"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cus = hourly.join(broadcast(tot), Seq("event_type"))
      .withColumn("rt", count(lit(1)).over(w))
      .withColumn("cusum", col("t") * sum(col("n")).over(w) - col("rt") * col("v"))
    val wr = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("cusum")).desc, col("h"))
    cus.withColumn("rn", row_number().over(wr))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("h").as("cp_hour"), col("cusum"),
        col("t").as("n_hours"), col("v").as("total"))
      .orderBy(col("event_type"))
  }

  /** Q199: top session paths — the most frequent length-3 event-type
    * sequences inside 30-minute-gap sessions (q31's sessionization), the
    * journey-mining query behind "how do users actually reach purchase".
    * Session ids are the q31 gap+cumsum windows; trigrams are two lags
    * inside the (user, session) partition; one count aggregate, top-20
    * under `(cnt desc, path)`.
    */
  def q199PathTrigrams: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val ws = Window.partitionBy(col("user_id"), col("sess"))
      .orderBy(col("es"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        epochSec(col("ts2")).as("es"))
      .withColumn("newSess",
        when(col("es") - lag(col("es"), 1).over(w) > 1800
          || lag(col("es"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sess", sum(col("newSess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t1", lag(col("event_type"), 1).over(ws))
      .withColumn("t2", lag(col("event_type"), 2).over(ws))
      .filter(col("t2").isNotNull)
      .select(concat_ws(">", col("t2"), col("t1"), col("event_type")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(20)
  }

  /** Q202: time-weighted average (TWAP) over an IRREGULAR series — the
    * financial/telemetry average that a plain mean gets wrong when
    * observations cluster: each value is weighted by how long it was the
    * current one (Δt to the next same-user event that day). All exact:
    * Δt is integer seconds from a `lead` window, the weighted mass is a
    * decimal·long product summed associatively, and the final division is
    * one double op. Per-(user, day) windows, bounded and distributed.
    */
  def q202Twap: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("es"), col("event_id"))
    val r = events(s, d)
      .select(col("user_id"), col("event_id"), dec(col("value")).as("v"),
        epochSec(col("ts2")).as("es"),
        col("ts2").cast("date").cast("string").as("day"))
      .withColumn("nes", lead(col("es"), 1).over(w))
      .filter(col("nes").isNotNull)
      .withColumn("dt", col("nes") - col("es"))
    r.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt")).cast("long").as("total_dt"),
        sum(col("v") * col("dt")).cast(org.apache.spark.sql.types.DecimalType(38, 4))
          .cast("double").as("mass"))
      .filter(col("total_dt") > 0)
      .select(col("user_id"), col("day"), col("n_intervals"), col("total_dt"),
        round(col("mass") / col("total_dt").cast("double"), 6).as("twap"))
      .orderBy(col("user_id"), col("day"))
  }

  case class BalRow(user_id: Long, event_id: Long, es: Long, delta: java.math.BigDecimal)

  /** Q203: clamped running balance — per-user ledger where purchases add
    * `value`, errors subtract it, and the balance FLOORS at zero (refund /
    * credit semantics). The clamp makes the fold NON-ASSOCIATIVE: no
    * window or aggregate expresses it, so this is the documented typed
    * escape hatch (`groupByKey.flatMapGroups`, the q66 discipline) — the
    * group is one user's bounded stream, sorted in memory under the
    * `(es, event_id)` total order, folded with exact BigDecimal
    * arithmetic. The ORACLE is a recursive CTE stepping all users in
    * lockstep by row number — proof that even the non-associative
    * operator is cross-engine pinned. Shuffle: one user-keyed exchange.
    */
  def q203ClampedBalance: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val rows = events(s, d)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("event_id"), epochSec(col("ts2")).as("es"),
        when(col("event_type") === "purchase", dec(col("value")))
          .otherwise(-dec(col("value"))).as("delta"))
      .as[BalRow]
    rows.groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        var bal = java.math.BigDecimal.ZERO
        var hits = 0L
        it.toSeq.sortBy(r => (r.es, r.event_id)).foreach { r =>
          val next = bal.add(r.delta)
          if (next.signum() < 0) { bal = java.math.BigDecimal.ZERO; hits += 1 }
          else bal = next
        }
        Iterator.single((uid, bal.doubleValue(), hits))
      }
      .toDF("user_id", "final_balance", "floor_hits")
      .orderBy(col("user_id"))
  }

  /** Q206: cohort LTV curves — users cohorted by signup week, cumulative
    * purchase revenue per cohort at each week-age: the
    * lifetime-value curve growth teams read. Revenue mass is an exact
    * decimal sum per (cohort, age) cell; the cumulative curve is a window
    * over the BOUNDED cohort×age cell grid (never the events), and
    * per-user LTV divides by the cohort's fixed user count. Extends q75
    * (retention counts) with monetary mass.
    */
  def q206CohortLtv: Q = (s, d) => {
    val e = events(s, d)
    val cohort = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(expr("CAST(ts2 AS LONG) div 604800")).as("cw"))
    val sizes = cohort.groupBy(col("cw")).agg(count(lit(1)).as("cohort_users"))
    val rev = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), dec(col("value")).as("v"),
        expr("CAST(ts2 AS LONG) div 604800").as("pw"))
      .join(cohort, Seq("user_id"))
      .filter(col("pw") >= col("cw"))
      .groupBy(col("cw"), (col("pw") - col("cw")).as("age"))
      .agg(sum(col("v")).as("wk_rev"))
    val w = Window.partitionBy(col("cw")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.withColumn("cum_rev", sum(col("wk_rev")).over(w))
      .join(broadcast(sizes), Seq("cw"))
      .select(col("cw").as("cohort_week"), col("age"),
        col("wk_rev").cast("double").as("wk_rev"),
        col("cum_rev").cast("double").as("cum_rev"),
        col("cohort_users"),
        round(col("cum_rev").cast("double")
          / col("cohort_users").cast("double"), 6).as("ltv_per_user"))
      .orderBy(col("cohort_week"), col("age"))
  }

  /** Q207: RFM segmentation —each user's recency / frequency / monetary
    * quintile scores, the classic marketing segmentation. The five
    * boundaries per dimension come from ONE exact-percentile aggregate
    * (a 1-row broadcast — no global ntile window, the banned shape);
    * scoring is then a pure map over the per-user summary. Recency is
    * integer days-before-horizon; monetary is an exact decimal sum cast
    * once.
    */
  def q207Rfm: Q = (s, d) => {
    val horizon = 20000L
    val per = events(s, d).filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg((lit(horizon) - max(expr("CAST(ts2 AS LONG) div 86400"))).as("rec"),
        count(lit(1)).as("freq"),
        sum(dec(col("value"))).cast("double").as("mon"))
    // cuts rounded to 4 dp BEFORE comparison: the interpolated percentile
    // is float arithmetic whose ulps may differ across engines, and an
    // unrounded cut could flip a boundary user's score
    val cuts = per.agg(
      expr("transform(percentile(rec, array(0.2, 0.4, 0.6, 0.8)), x -> round(x, 4))").as("rc"),
      expr("transform(percentile(freq, array(0.2, 0.4, 0.6, 0.8)), x -> round(x, 4))").as("fc"),
      expr("transform(percentile(mon, array(0.2, 0.4, 0.6, 0.8)), x -> round(x, 4))").as("mc"))
    def score(v: Column, cutsCol: Column, reverse: Boolean): Column = {
      val raw = lit(1L) + when(v > element_at(cutsCol, 1), 1L).otherwise(0L) +
        when(v > element_at(cutsCol, 2), 1L).otherwise(0L) +
        when(v > element_at(cutsCol, 3), 1L).otherwise(0L) +
        when(v > element_at(cutsCol, 4), 1L).otherwise(0L)
      if (reverse) lit(6L) - raw else raw
    }
    per.crossJoin(broadcast(cuts))
      .select(col("user_id"), col("rec"), col("freq"),
        round(col("mon"), 4).as("mon"),
        score(col("rec").cast("double"), col("rc"), reverse = true).as("r_score"),
        score(col("freq").cast("double"), col("fc"), reverse = false).as("f_score"),
        score(col("mon"), col("mc"), reverse = false).as("m_score"))
      .orderBy(col("user_id"))
  }

  /** Q212: golden-record survivorship merge — entity resolution's last
    * step, distinct from q107's keep-best dedup: q107 elects one whole
    * ROW; survivorship composes the golden record from DIFFERENT source
    * rows under per-field rules. Per customer: RECENCY fields (status and
    * date of the latest order, total order under (date, key) desc),
    * FREQUENCY field (modal order priority, lexicographic tie-break), and
    * EXTREME fields (first date, order count, exact decimal spend total
    * and max).
    *
    * Scale shape: one explicit exchange on `o_custkey` feeds all three
    * rule branches — the recency window, the (cust, priority) mode
    * aggregate, and the extremes aggregate — so the plan reuses a single
    * shuffle (ReusedExchange) and the branch joins are co-partitioned.
    * Everything is keyed by customer; no global state anywhere.
    */
  def q212Survivorship: Q = (s, d) => {
    val par = s.sparkContext.defaultParallelism
    val o = Tables(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("o_totalprice"), col("o_orderdate"))
      .repartition(par, col("o_custkey"))
    val wRec = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val recency = o.withColumn("rn", row_number().over(wRec))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderstatus").as("last_status"),
        dateStr(col("o_orderdate")).as("last_order_date"))
    val wFreq = Window.partitionBy(col("o_custkey"))
      .orderBy(col("c").desc, col("o_orderpriority"))
    val mode = o.groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(wFreq))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderpriority").as("mode_priority"))
    val ext = o.groupBy(col("o_custkey"))
      .agg(big(count(lit(1))).as("n_orders"),
        dateStr(min(col("o_orderdate"))).as("first_order_date"),
        round(moneySum(col("o_totalprice")), 4).as("total_spend"),
        round(max(dec(col("o_totalprice"))).cast("double"), 4).as("max_order"))
    ext.join(recency, Seq("o_custkey")).join(mode, Seq("o_custkey"))
      .select(col("o_custkey"), col("n_orders"), col("first_order_date"),
        col("last_order_date"), col("last_status"), col("mode_priority"),
        col("total_spend"), col("max_order"))
      .orderBy(col("o_custkey"))
  }

  /** Q226: interval sweep-line — max CONCURRENT sessions per day, the
    * capacity question (peak simultaneous load) that no per-row aggregate
    * answers: q31's sessions become +1/−1 boundary points, day-clipped,
    * and the running sum's maximum is the day's peak concurrency.
    * Releases sort before arrivals at the same second (`(t, delta)`
    * order), so touching sessions don't double-count; ties among equal
    * deltas can't perturb the max (a tied block is all +1 or all −1, and
    * the block's END value is order-independent).
    *
    * Scale shape: sessionization is q31's per-user windows; day-splitting
    * is a bounded explode (sessions are gap-bounded, so they span ≤2
    * days); the sweep window partitions by DAY — at warehouse scale a
    * hot day is the honest partition bound, and the two-level refinement
    * (per-(day, shard) sweeps + boundary merge) is the documented scale
    * path, same as q108's for the global-window baselines.
    */
  def q226MaxConcurrency: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events(s, d)
      .select(col("user_id"), col("event_id"), epochSec(col("ts2")).as("es"))
      .withColumn("new_sess",
        when(lag(col("es"), 1).over(w).isNull
          || col("es") - lag(col("es"), 1).over(w) > 1800, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("es")).as("st"), max(col("es")).as("en"))
    val segs = sess
      .select(col("st"), col("en"),
        explode(sequence(expr("st div 86400"), expr("en div 86400"))).as("day"))
      .select(col("day"), greatest(col("st"), col("day") * 86400L).as("t0"),
        least(col("en"), col("day") * 86400L + 86399L).as("t1"))
    val points = segs.select(col("day"), col("t0").as("t"), lit(1L).as("delta"))
      .union(segs.filter(col("t1") < col("day") * 86400L + 86399L)
        .select(col("day"), (col("t1") + 1L).as("t"), lit(-1L).as("delta")))
    val wd = Window.partitionBy(col("day")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    points.withColumn("cum", sum(col("delta")).over(wd))
      .groupBy(col("day"))
      .agg(max(col("cum")).as("max_concurrency"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_sessions"))
      .select(col("day"), col("n_sessions"), col("max_concurrency"))
      .orderBy(col("day"))
  }

  /** Q227: SAX symbolization + motif counting — each active user's event
    * series compressed to an 8-segment PAA (equal-COUNT segments by
    * position), z-normalized against the user's own 8 segment means, and
    * quantized to a 4-letter alphabet at the N(0,1) quartile breakpoints
    * (±0.6745, 0); identical SAX words across users are behavioral
    * MOTIFS, reported top-15. The time-series-mining primitive none of
    * the window family gives.
    *
    * Scale shape: one per-user ordered window, one (user, segment)
    * aggregate, everything after on the bounded 8-rows-per-user relation.
    * Determinism: segment means are rounded to 3 dp and the user moments
    * computed as exact decimals under 2^53 (the scale chosen so BOTH
    * engines' decimal→double conversions are exact — scale 6 already is
    * not, measured at q220's landing); z is one IEEE shape rounded to
    * 4 dp before the fixed-literal breakpoint compares.
    */
  def q227SaxMotifs: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val base = events(s, d)
      .select(col("user_id"), col("event_id"), epochSec(col("ts2")).as("es"),
        dec(col("value")).as("v"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("n") >= 8)
      .withColumn("seg", expr("((rn - 1) * 8) div n"))
    val dec3 = org.apache.spark.sql.types.DecimalType(12, 3)
    val segMeans = base.groupBy(col("user_id"), col("seg"))
      .agg(round(sum(col("v")).cast("double") / count(lit(1)), 3)
        .cast(dec3).as("m3"))
    val wu = Window.partitionBy(col("user_id"))
    val z = segMeans
      .withColumn("s1", sum(col("m3")).over(wu)
        .cast(org.apache.spark.sql.types.DecimalType(38, 3)).cast("double"))
      .withColumn("s2", sum(col("m3") * col("m3")).over(wu)
        .cast(org.apache.spark.sql.types.DecimalType(38, 6)).cast("double"))
      .withColumn("mean", col("s1") / 8)
      .withColumn("vr", col("s2") / 8 - (col("s1") / 8) * (col("s1") / 8))
      .withColumn("z", when(col("vr") <= 0, lit(0.0))
        .otherwise(round((col("m3").cast("double") - col("mean")) / sqrt(col("vr")), 4)))
      .withColumn("sym",
        when(col("z") < -0.6745, "a").when(col("z") < 0, "b")
          .when(col("z") < 0.6745, "c").otherwise("d"))
    z.groupBy(col("user_id"))
      .agg(concat_ws("", transform(array_sort(
        collect_list(struct(col("seg"), col("sym")))),
        t => t.getField("sym"))).as("word"))
      .groupBy(col("word"))
      .agg(big(count(lit(1))).as("n_users"))
      .orderBy(col("n_users").desc, col("word"))
      .limit(15)
  }

  /** Q233: exact audience overlap via BITMAPS — the roaring-bitmap idea
    * in pure relational form: each segment's user set packed into
    * (bucket = id div 64, 64-bit word) rows by `bit_or`, pairwise
    * intersections as popcounts of word-ANDs co-partitioned on bucket.
    * Exact where q35's HLL estimates, and the bitmap relation is 64×
    * smaller than the id set it represents — at warehouse scale this is
    * the difference between shuffling user IDs and shuffling words. The
    * oracle computes the same overlaps from raw DISTINCT id joins, so
    * the packing itself is the thing hash-checked.
    */
  def q233BitmapOverlap: Q = (s, d) => {
    val bm = graft.Checkpoints.materialize(
      events(s, d).select(col("event_type").as("seg"), col("user_id")).distinct()
        // floor-div consistent with pmod: truncating `div` would send a
        // negative id into the same (bucket, bit) slot as a positive one
        // (e.g. -1 and 63), silently undercounting distinct users
        .withColumn("bucket", expr("(user_id - pmod(user_id, 64)) div 64"))
        .withColumn("bit",
          expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 64) AS INT))"))
        .groupBy(col("seg"), col("bucket"))
        .agg(expr("bit_or(bit)").as("bits")))
    val sizes = bm.groupBy(col("seg"))
      .agg(sum(expr("bit_count(bits)")).cast("long").as("nu"))
    val inter = bm.select(col("seg").as("sa"), col("bucket"), col("bits").as("ba"))
      .join(bm.select(col("seg").as("sb"), col("bucket"), col("bits").as("bb")),
        Seq("bucket"))
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(sum(expr("bit_count(ba & bb)")).cast("long").as("n_both"))
    inter
      .join(broadcast(sizes.select(col("seg").as("sa"), col("nu").as("na"))), Seq("sa"))
      .join(broadcast(sizes.select(col("seg").as("sb"), col("nu").as("nb"))), Seq("sb"))
      .select(col("sa"), col("sb"), col("na"), col("nb"), col("n_both"),
        round(col("n_both").cast("double")
          / (col("na") + col("nb") - col("n_both")).cast("double"), 6).as("jaccard"))
      .orderBy(col("sa"), col("sb"))
  }

  /** Q236: seasonal-naive forecast evaluation — the baseline every
    * forecasting effort must beat, evaluated honestly: predict each of
    * the horizon's last 24 hours as the mean count of the SAME hour-of-
    * day over all prior observed hours (per event type), and report MAE
    * and signed bias per type. Missing history predicts 0 (left join +
    * guard), observed-hours-only means are the declared semantics.
    * Determinism: predictions are one `s/c` double division; per-hour
    * errors rounded to 6 dp and summed as decimals (never a raw double
    * sum over groups); closing divisions rounded to 4 dp.
    *
    * Scale shape: one hourly collapse (map-side combined), a 1-row
    * horizon broadcast, one (type, hour-of-day) training aggregate
    * joined back to the 24-hour eval slice — all bounded after the
    * collapse.
    */
  def q236SeasonalNaiveEval: Q = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val hourly = events(s, d)
      .select(col("event_type"), expr("CAST(ts2 AS LONG) div 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("n"))
    val horizon = hourly.agg(max(col("h")).as("hmax"))
    val withH = hourly.crossJoin(broadcast(horizon))
    val train = withH.filter(col("h") <= col("hmax") - 24)
      .withColumn("hod", pmod(col("h"), lit(24L)))
      .groupBy(col("event_type"), col("hod"))
      .agg(sum(col("n")).as("ts"), count(lit(1)).as("tc"))
    val eval = withH.filter(col("h") > col("hmax") - 24)
      .withColumn("hod", pmod(col("h"), lit(24L)))
    eval.join(train, Seq("event_type", "hod"), "left")
      .withColumn("pred", when(coalesce(col("tc"), lit(0L)) === 0L, lit(0.0))
        .otherwise(col("ts").cast("double") / col("tc").cast("double")))
      .withColumn("ae", round(abs(col("n").cast("double") - col("pred")), 6).cast(dec6))
      .withColumn("se", round(col("n").cast("double") - col("pred"), 6).cast(dec6))
      .groupBy(col("event_type"))
      .agg(big(count(lit(1))).as("n_hours"),
        round(sum(col("ae")).cast("double") / count(lit(1)), 4).as("mae"),
        round(sum(col("se")).cast("double") / count(lit(1)), 4).as("bias"))
      .orderBy(col("event_type"))
  }

  /** Q241: calendar gap-fill with forward-fill (LOCF) — the time-series
    * repair q174's interpolation does NOT give (interpolation invents
    * in-between values; last-observation-carried-forward repeats the
    * last known state, the correct semantics for balances/settings):
    * each user's daily last observation, spread over the user's FULL
    * generated day span (q230's sequence technique, per-user bounded),
    * missing days carried forward via `last(_, ignoreNulls)` over the
    * ordered per-user window. Reported per user as the fill audit
    * (days / observed / filled, final carried value).
    */
  def q241ForwardFill: Q = (s, d) => {
    val daily = events(s, d)
      .select(col("user_id"), col("event_id"), dec(col("value")).as("v"),
        expr("CAST(ts2 AS LONG) div 86400").as("day"),
        epochSec(col("ts2")).as("es"))
      .groupBy(col("user_id"), col("day"))
      .agg(max_by(col("v"), struct(col("es"), col("event_id"))).as("v"))
    val span = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span.select(col("user_id"),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    val wFill = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(wFill))
      .groupBy(col("user_id"))
      .agg(big(count(lit(1))).as("n_days"),
        big(sum(when(col("v").isNotNull, 1L).otherwise(0L))).as("n_observed"),
        big(sum(when(col("v").isNull, 1L).otherwise(0L))).as("n_filled"),
        round(max_by(col("filled"), col("day")).cast("double"), 4).as("final_value"))
      .orderBy(col("user_id"))
  }

  /** Q242: NEAREST as-of join — the third as-of semantic after backward
    * (q09) and forward (q94): each error event matched to the same
    * user's temporally CLOSEST purchase within ±30 minutes, either
    * side; ties broken earlier-first then by event id (declared). The
    * band range-join bounds fan-out to the ±30-minute window; errors
    * with no candidate survive as unmatched (left join semantics — the
    * nearest-join contract keeps the probe side whole).
    */
  def q242NearestAsof: Q = (s, d) => {
    val e = events(s, d)
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"),
        epochSec(col("ts2")).as("te"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("match_id"),
        epochSec(col("ts2")).as("tp"))
    val cands = errors.join(purchases, Seq("user_id"))
      .filter(abs(col("tp") - col("te")) <= 1800)
    val wPick = Window.partitionBy(col("error_id"))
      .orderBy(abs(col("tp") - col("te")), col("tp"), col("match_id"))
    val picked = cands.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("error_id"), col("match_id"),
        (col("tp") - col("te")).as("delta_sec"))
    errors.select(col("error_id"))
      .join(picked, Seq("error_id"), "left")
      .orderBy(col("error_id"))
  }

  /** Q243: gaps-and-islands activity streaks — the classic
    * `day − row_number` island trick: a user's distinct active days
    * collapse into consecutive runs because subtracting the ordinal from
    * the day yields one constant per unbroken run; islands aggregate to
    * streaks. Reports per user the longest streak (with its start day)
    * and the streak count — engagement's favorite metric, and a shape
    * (order-sensitive grouping) no plain GROUP BY expresses.
    *
    * Scale shape: one distinct-days collapse, one per-user ordered
    * window, two keyed aggregates — everything user-partitioned.
    */
  def q243Streaks: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val days = events(s, d)
      .select(col("user_id"), expr("CAST(ts2 AS LONG) div 86400").as("day"))
      .distinct()
    val islands = days
      .withColumn("island", col("day") - big(row_number().over(w)))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
    islands.groupBy(col("user_id"))
      .agg(big(count(lit(1))).as("n_streaks"),
        big(sum(col("len"))).as("n_active_days"),
        max(struct(col("len"), col("start_day"))).as("best"))
      .select(col("user_id"), col("n_streaks"), col("n_active_days"),
        big(col("best.len")).as("longest_streak"),
        big(col("best.start_day")).as("longest_start_day"))
      .orderBy(col("user_id"))
  }

  /** Q244: maximum drawdown — the risk metric over each user's running
    * value balance (+purchases, −errors as the synthetic sign
    * convention): cumulative sum in exact decimals, running peak via a
    * window max, drawdown = peak − current, maximum reported with the
    * day it bottomed. Per-user ordered windows over exact decimal
    * arithmetic — no float path at all until the final cast.
    */
  def q244MaxDrawdown: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flows = events(s, d)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("event_id"), epochSec(col("ts2")).as("es"),
        when(col("event_type") === "purchase", dec(col("value")))
          .otherwise(-dec(col("value"))).as("flow"))
    flows
      .withColumn("cum", sum(col("flow")).over(run))
      .withColumn("peak", max(col("cum")).over(run))
      .withColumn("dd", col("peak") - col("cum"))
      .groupBy(col("user_id"))
      .agg(big(count(lit(1))).as("n_flows"),
        round(max(col("cum")).cast("double"), 4).as("peak_balance"),
        round(max(col("dd")).cast("double"), 4).as("max_drawdown"),
        big(max_by(col("es"), struct(col("dd"), lit(0L) - col("es"))))
          .as("trough_es"))
      .orderBy(col("user_id"))
  }

  /** Q246: conversion latency percentiles — signup → first purchase
    * delay per signup-week cohort, reported as exact discrete p50/p90
    * (rank-selected under the (delay, user) total order — the SLA view
    * of q76's funnel counts: not HOW MANY convert but HOW FAST the
    * median and the tail convert. Users without a later purchase are
    * excluded (conversion latency is conditional on converting; the
    * unconditional rate is q76's job).
    */
  def q246ConversionLatency: Q = (s, d) => {
    val e = events(s, d)
    val signups = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(epochSec(col("ts2"))).as("ts_s"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), epochSec(col("ts2")).as("ts_p"))
    val delays = signups.join(purchases, Seq("user_id"))
      .filter(col("ts_p") >= col("ts_s"))
      .groupBy(col("user_id"), col("ts_s"))
      .agg(min(col("ts_p") - col("ts_s")).as("delay"))
      .withColumn("cohort", expr("ts_s div 604800"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("delay"), col("user_id"))
    delays
      .withColumn("rn", big(row_number().over(w)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("cohort"))))
      .groupBy(col("cohort"))
      .agg(big(max(col("n"))).as("n_converted"),
        big(min(when(col("rn") === expr("(n * 50 + 99) div 100"), col("delay"))))
          .as("p50_delay_sec"),
        big(min(when(col("rn") === expr("(n * 90 + 99) div 100"), col("delay"))))
          .as("p90_delay_sec"))
      .orderBy(col("cohort"))
  }

  /** Q252: strict-adjacency funnel — view → click → purchase as three
    * CONSECUTIVE events in a user's stream (no intervening event of any
    * type), the uninterrupted-intent variant of q76's within-a-window
    * funnel: a user who browses elsewhere mid-path doesn't count. Two
    * lags over the per-user total order; per user the occurrence count
    * and first completion time, plus the bottom-line user count rides in
    * every row (1-row broadcast).
    */
  /** q252's per-user kernel over any events relation carrying (user_id,
    * event_id, event_type, ts2) — the window is USER-partitioned, so a
    * user-complete feed slicing can apply it per micro-batch and merge by
    * plain union (disjoint users); shared with the streaming twin q288.
    */
  def strictFunnelPerUser(e: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    e.select(col("user_id"), col("event_id"), col("event_type"),
        epochSec(col("ts2")).as("es"))
      .withColumn("t1", lag(col("event_type"), 2).over(w))
      .withColumn("t2", lag(col("event_type"), 1).over(w))
      .filter(col("t1") === "view" && col("t2") === "click"
        && col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(big(count(lit(1))).as("n_completions"),
        min(col("es")).as("first_completion_es"))
  }

  def q252StrictFunnel: Q = (s, d) => {
    val perUser = strictFunnelPerUser(events(s, d))
    perUser
      .crossJoin(broadcast(perUser.agg(count(lit(1)).as("n_users"))))
      .select(col("user_id"), col("n_completions"),
        big(col("first_completion_es")).as("first_completion_es"),
        big(col("n_users")).as("n_converting_users"))
      .orderBy(col("user_id"))
  }

  /** Q256: Bollinger-band breakout detection — per-part price series
    * (shipdate order), rolling 20-point mean ± 2σ bands over the PRIOR
    * window (rows -20..-1, so the band never sees the evaluated price —
    * the lookahead bug this operator exists to avoid), breakouts counted
    * per brand. The time-series anomaly flag a monitoring pipeline runs,
    * next to q99's z-score and q198's changepoint.
    *
    * Determinism: window moments are exact decimal sums — s2's (12,4)²
    * products carry exactly ≤4 true decimals, so the (38,4) cut is exact
    * and the double conversion stays < 2^53 (20 · maxprice² · 10⁴ ≈
    * 2.2e15); mean/var/σ then follow q99's one-IEEE-expression-tree shape.
    * A `greatest(var, 0)` guards the σ of constant windows against
    * negative float residue. Rows are evaluated only at full windows
    * (n = 20), under the (shipdate, orderkey, linenumber) total order.
    *
    * Scale shape: one part-keyed window pass + one brand aggregate —
    * partition-local sort, no global window, map-side-combined final agg.
    */
  /** q256's per-row breakout kernel over any (l_partkey, l_extendedprice,
    * l_shipdate, l_orderkey, l_linenumber) relation — shared with the
    * streaming twin (q265), whose part-complete feed slicing makes the
    * per-batch application exact.
    */
  private[graft] def bollingerScored(rows: DataFrame): DataFrame = {
    val dec384 = org.apache.spark.sql.types.DecimalType(38, 4)
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(-20, -1)
    val mean = col("s1") / lit(20.0)
    val variance = (col("s2") - col("s1") * col("s1") / lit(20.0)) / lit(19.0)
    val sd = sqrt(greatest(variance, lit(0.0)))
    rows
      .select(col("l_partkey"), col("l_extendedprice").cast("double").as("px"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum(dec(col("px"))).over(w).cast(dec384).cast("double"))
      .withColumn("s2", sum(dec12(col("px")) * dec12(col("px"))).over(w)
        .cast(dec384).cast("double"))
      .filter(col("n") === 20)
      .select(col("l_partkey"),
        (col("px") > mean + lit(2.0) * sd).as("up"),
        (col("px") < mean - lit(2.0) * sd).as("down"))
  }

  /** Brand-level breakout report from a scored relation — q256's tail,
    * shared with q265's post-drain merge (counts are additive, the rate is
    * derived from the merged counts).
    */
  private[graft] def bollingerReport(scored: DataFrame, s: SparkSession,
                                     d: String): DataFrame =
    scored
      .join(Tables(s, d, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(big(count(lit(1))).as("evaluated"),
        big(sum(when(col("up"), lit(1L)).otherwise(lit(0L)))).as("breakouts_up"),
        big(sum(when(col("down"), lit(1L)).otherwise(lit(0L)))).as("breakouts_down"),
        round((sum(when(col("up") || col("down"), lit(1L)).otherwise(lit(0L))))
            .cast("double") / count(lit(1)).cast("double"), 6).as("breakout_rate"))
      .orderBy(col("p_brand"))

  def q256BollingerBreakout: Q = (s, d) => {
    val li = Tables(s, d, "lineitem")
      .select(col("l_partkey"), col("l_extendedprice"), col("l_shipdate"),
        col("l_orderkey"), col("l_linenumber"))
    bollingerReport(bollingerScored(li), s, d)
  }

  /** 20-term EMA weights (1-alpha)^i, alpha = 0.2, built by REPEATED DOUBLE
    * MULTIPLICATION — each step is one IEEE-exact rounding, so the values
    * are bit-identical on every JVM/platform (math.pow carries no such
    * guarantee), and the oracle embeds the same shortest-repr literals.
    */
  private[graft] val emaWeights: Seq[Double] =
    Iterator.iterate(1.0)(_ * 0.8).take(20).toSeq
  private[graft] val emaWeightSum: Double = emaWeights.sum

  /** Momentum scoring kernel shared by q290 (batch) and q295 (streaming):
    * per part, the 20-row bounded exponentially-weighted moving average of
    * extended price under the (shipdate, orderkey, linenumber) total
    * order; rows with the full 20-row history are flagged when price
    * breaks >2% above the EMA. The bounded-window weighted form (not the
    * infinite recursion) is the distributed-honest EMA: per-part windows,
    * no sequential state.
    */
  private[graft] def emaScored(rows: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val px = col("px")
    val terms = emaWeights.zipWithIndex.map { case (wt, i) =>
      (if (i == 0) px else lag(px, i).over(w)) * lit(wt)
    }
    rows
      .select(col("l_partkey"), col("l_extendedprice").cast("double").as("px"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .withColumn("ema", terms.reduce(_ + _) / lit(emaWeightSum))
      .withColumn("h19", lag(px, 19).over(w))
      .filter(col("h19").isNotNull)
      .select(col("l_partkey"), col("px"),
        (col("px") > col("ema") * lit(1.02)).as("sig"))
  }

  /** Brand-level signal report from an EMA-scored relation — additive
    * counts, so q295's post-drain merge shares this tail and q290's
    * oracle.
    */
  private[graft] def emaReport(scored: DataFrame, s: SparkSession,
                               d: String): DataFrame =
    scored
      .join(Tables(s, d, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(big(count(lit(1))).as("evaluated"),
        big(sum(when(col("sig"), lit(1L)).otherwise(lit(0L)))).as("signals"),
        round(sum(when(col("sig"), lit(1L)).otherwise(lit(0L))).cast("double")
          / count(lit(1)).cast("double"), 6).as("signal_rate"))
      .orderBy(col("p_brand"))

  /** Q290: EMA momentum signals — the exponential-moving-average breakout
    * screen (the EMA sibling of q256's Bollinger bands): per part, price
    * vs its 20-row EMA; per brand, how many evaluations broke >2% above
    * trend. Weights are embedded platform-exact doubles (see
    * [[emaWeights]]); the 20-term weighted sum is one left-associated
    * IEEE expression tree written identically in the oracle.
    *
    * Scale shape: per-part windows (millions of independent partitions at
    * warehouse scale), one broadcast dimension join, one map-side-combined
    * brand aggregate.
    */
  def q290EmaSignal: Q = (s, d) => {
    val li = Tables(s, d, "lineitem")
      .select(col("l_partkey"), col("l_extendedprice"), col("l_shipdate"),
        col("l_orderkey"), col("l_linenumber"))
    emaReport(emaScored(li), s, d)
  }

  /** Q321: local-linear-trend breakouts — the Holt-style TREND sibling of
    * q290's EMA level screen: per part, an exact ordinary-least-squares
    * line over the last 20 prices (positions 0,−1,…,−19 under the
    * (shipdate, orderkey, linenumber) total order) extrapolated one step
    * to the current row; rows breaking ±2% off the trend forecast are
    * flagged, reported per brand. Where q290 asks "is price above its
    * smoothed level?", this asks "did price leave its straight-line
    * path?" — the drift detector for trending series the EMA lags on.
    *
    * Determinism: the OLS normal equations have INTEGER constants at a
    * fixed 20-row window (Σx = −190, Σx² = 2470 → denominator 13300), so
    * slope and forecast are one fixed left-associated IEEE tree over the
    * 20 lag terms — the q290 discipline; the oracle writes the identical
    * expression. The bounded-window regression (not the recursive Holt
    * filter) is the distributed-honest form: per-part windows, no
    * sequential state.
    *
    * Scale shape: identical to q290 — per-part windows, one broadcast
    * dimension join, one map-side-combined brand aggregate.
    */
  def q321TrendBreak: Q = (s, d) => {
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val px = col("px")
    val histo = (1 to 20).map(j => lag(px, j).over(w))
    val sy = histo.reduce(_ + _)
    val sxy = (1 until 20).map(k => histo(k) * lit(-k.toDouble)).reduce(_ + _)
    val scored = Tables(s, d, "lineitem")
      .select(col("l_partkey"), col("l_extendedprice").cast("double").as("px"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .withColumn("sy", sy)
      .withColumn("sxy", sxy)
      .withColumn("h20", lag(px, 20).over(w))
      .filter(col("h20").isNotNull)
      .withColumn("b",
        (lit(20.0) * col("sxy") + lit(190.0) * col("sy")) / lit(13300.0))
      .withColumn("f",
        (col("sy") + lit(190.0) * col("b")) / lit(20.0) + col("b"))
      .select(col("l_partkey"), col("px"),
        (col("px") > col("f") * lit(1.02) ||
          col("px") < col("f") * lit(0.98)).as("sig"))
    emaReport(scored, s, d)
  }

  /** Q351: Shapley-value attribution over the 3-channel touch sets — the
    * game-theoretic split of conversion credit (view/click/signup touched
    * before the first purchase), computed EXACTLY: with 3 channels the
    * coalition lattice has 8 nodes, v(S) = conversions whose touch set ⊆ S,
    * and the Shapley weights {2,1,2}/6 make 6·φ_c a pure INTEGER — the
    * multi-touch answer where q184's position rules are heuristics.
    *
    * Scale shape: one per-user first-purchase aggregate, one per-user
    * touch-mask aggregate, an 8-row mask histogram; the whole lattice walk
    * (subset sums, marginal contributions) happens on ≤8-row broadcast
    * relations. The only row-scale work is two keyed aggregates.
    */
  def q351ShapleyAttribution: Q = (s, d) => {
    val ev = events(s, d).select(col("user_id"), col("event_type"),
      epochSec(col("ts2")).as("es"))
    val firstP = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("es")).as("fp"))
    val flag = when(col("event_type") === "view", 1L)
      .when(col("event_type") === "click", 2L)
      .when(col("event_type") === "signup", 4L).otherwise(0L)
    val touch = ev.join(firstP, Seq("user_id"))
      .filter(col("es") < col("fp"))
      .select(col("user_id"), flag.as("fl"))
      .groupBy(col("user_id"))
      .agg((max(when(col("fl") === 1L, 1L).otherwise(0L))
        + max(when(col("fl") === 2L, 2L).otherwise(0L))
        + max(when(col("fl") === 4L, 4L).otherwise(0L))).as("mask"))
    val masks = firstP.join(touch, Seq("user_id"), "left")
      .select(coalesce(col("mask"), lit(0L)).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("nt"))
    val subsets = s.range(0L, 8L).toDF("ss")
    // v(S) = conversions whose touch set is contained in S
    val v = subsets.join(broadcast(masks),
        (col("t").bitwiseAND(col("ss"))) === col("t"), "left")
      .groupBy(col("ss")).agg(coalesce(sum(col("nt")), lit(0L)).as("v"))
    val vM = graft.Checkpoints.materialize(v)
    val channels = Seq(("view", 1L), ("click", 2L), ("signup", 4L))
    channels.map { case (name, c) =>
      // sum over S not containing c of w'(|S ∩ rest|) · (v(S∪c) − v(S)),
      // w' ∈ {2,1,2} so the total is 6·φ_c exactly
      val base = vM.filter((col("ss").bitwiseAND(lit(c))) === 0L)
        .select(col("ss"), col("v").as("vs"))
      val up = vM.select((col("ss").bitwiseAND(lit(~c & 7L))).as("ss0"),
        col("ss"), col("v"))
        .filter((col("ss").bitwiseAND(lit(c))) === lit(c))
        .select(col("ss0").as("ss"), col("v").as("vsc"))
      val bits = (col("ss").bitwiseAND(lit(1L)) +
        (col("ss").bitwiseAND(lit(2L)) / 2L).cast("long") +
        (col("ss").bitwiseAND(lit(4L)) / 4L).cast("long"))
      val w6 = when(bits === 0L, 2L).when(bits === 1L, 1L).otherwise(2L)
      base.join(up, Seq("ss"))
        .agg(sum(w6 * (col("vsc") - col("vs"))).cast("long").as("phi6"))
        .select(lit(name).as("channel"), col("phi6"))
    }.reduce(_.unionByName(_))
      .crossJoin(broadcast(
        vM.agg((max(when(col("ss") === 7L, col("v"))) -
          max(when(col("ss") === 0L, col("v")))).as("attributable"))))
      .select(col("channel"), big(col("phi6")).as("phi6"),
        round(col("phi6").cast("double") / lit(6.0), 6).as("phi"),
        round(when(col("attributable") === 0L, lit(0.0))
          .otherwise(col("phi6").cast("double")
            / (lit(6.0) * col("attributable").cast("double"))), 6).as("share"))
      .orderBy(col("channel"))
  }

  /** q351's oracle: the identical 8-node lattice walk, one generated block
    * per channel (popcount inlined as bit arithmetic).
    */
  private def shapleySql: String = {
    val blocks = Seq(("view", 1L), ("click", 2L), ("signup", 4L)).map {
      case (name, c) =>
        val rest = ~c & 7L
        s"""SELECT '$name' AS channel,
           |  CAST(SUM((CASE (b.ss & 1) + (b.ss & 2) // 2 + (b.ss & 4) // 4
           |    WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END) * (u.v - b.v))
           |    AS BIGINT) AS phi6
           |FROM (SELECT ss, v FROM v WHERE (ss & $c) = 0) b
           |JOIN (SELECT (ss & $rest) AS ss, v FROM v
           |      WHERE (ss & $c) = $c) u USING (ss)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ev AS (
       |  SELECT user_id, event_type,
       |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
       |  FROM events),
       |fp AS (SELECT user_id, MIN(es) AS fp FROM ev
       |       WHERE event_type = 'purchase' GROUP BY 1),
       |touch AS (
       |  SELECT ev.user_id,
       |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |    + MAX(CASE WHEN event_type = 'click' THEN 2 ELSE 0 END)
       |    + MAX(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END) AS mask
       |  FROM ev JOIN fp USING (user_id) WHERE es < fp GROUP BY 1),
       |masks AS (
       |  SELECT COALESCE(mask, 0) AS t, COUNT(*) AS nt
       |  FROM fp LEFT JOIN touch USING (user_id) GROUP BY 1),
       |sbs AS (SELECT CAST(u.r AS BIGINT) AS ss FROM unnest(range(0, 8)) u(r)),
       |v AS MATERIALIZED (
       |  SELECT ss, COALESCE(SUM(nt), 0) AS v
       |  FROM sbs LEFT JOIN masks ON (t & ss) = t GROUP BY 1),
       |phis AS (
       |$blocks),
       |att AS (SELECT MAX(CASE WHEN ss = 7 THEN v END)
       |          - MAX(CASE WHEN ss = 0 THEN v END) AS attributable FROM v)
       |SELECT channel, phi6,
       |  ROUND(CAST(phi6 AS DOUBLE) / CAST('6.0' AS DOUBLE), 6) AS phi,
       |  ROUND(CASE WHEN attributable = 0 THEN 0.0
       |    ELSE CAST(phi6 AS DOUBLE)
       |      / (CAST('6.0' AS DOUBLE) * CAST(attributable AS DOUBLE)) END, 6)
       |    AS share
       |FROM phis, att ORDER BY channel""".stripMargin
  }

  /** q321's oracle: the identical integer-constant OLS tree over the same
    * lag terms, literals CAST from VARCHAR (bare float literals parse as
    * DECIMAL in DuckDB).
    */
  private def trendBreakSql: String = {
    val syTerms = (1 to 20).map(j => s"LAG(px, $j) OVER w").mkString(" + ")
    val sxyTerms = (2 to 20).map(j =>
      s"LAG(px, $j) OVER w * CAST('${-(j - 1).toDouble}' AS DOUBLE)")
      .mkString(" + ")
    s"""WITH p AS (
       |  SELECT l_partkey, CAST(l_extendedprice AS DOUBLE) AS px,
       |    l_shipdate, l_orderkey, l_linenumber
       |  FROM lineitem),
       |s AS (
       |  SELECT l_partkey, px,
       |    ($syTerms) AS sy,
       |    ($sxyTerms) AS sxy,
       |    LAG(px, 20) OVER w AS h20
       |  FROM p
       |  WINDOW w AS (PARTITION BY l_partkey
       |    ORDER BY l_shipdate, l_orderkey, l_linenumber)),
       |s2 AS (
       |  SELECT l_partkey, px, sy,
       |    (CAST('20.0' AS DOUBLE) * sxy + CAST('190.0' AS DOUBLE) * sy)
       |      / CAST('13300.0' AS DOUBLE) AS b
       |  FROM s WHERE h20 IS NOT NULL),
       |s3 AS (
       |  SELECT l_partkey, px,
       |    (sy + CAST('190.0' AS DOUBLE) * b) / CAST('20.0' AS DOUBLE) + b AS f
       |  FROM s2),
       |f AS (
       |  SELECT l_partkey,
       |    px > f * CAST('1.02' AS DOUBLE) OR px < f * CAST('0.98' AS DOUBLE)
       |      AS sig
       |  FROM s3)
       |SELECT p_brand,
       |  CAST(COUNT(*) AS BIGINT) AS evaluated,
       |  CAST(SUM(CASE WHEN sig THEN 1 ELSE 0 END) AS BIGINT) AS signals,
       |  ROUND(CAST(SUM(CASE WHEN sig THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE), 6) AS signal_rate
       |FROM f JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin
  }

  /** q290's oracle, generated from the SAME [[emaWeights]] doubles the
    * Spark plan embeds (shortest-repr literals CAST from VARCHAR — a bare
    * float literal parses as DECIMAL in DuckDB), with the 20-term sum in
    * the same left-associated order.
    */
  private def emaOracleSql: String = {
    val terms = emaWeights.zipWithIndex.map { case (wt, i) =>
      val x = if (i == 0) "px" else s"LAG(px, $i) OVER w"
      s"$x * CAST('$wt' AS DOUBLE)"
    }.mkString(" + ")
    s"""WITH p AS (
       |  SELECT l_partkey, CAST(l_extendedprice AS DOUBLE) AS px,
       |    l_shipdate, l_orderkey, l_linenumber
       |  FROM lineitem),
       |s AS (
       |  SELECT l_partkey, px,
       |    ($terms) / CAST('$emaWeightSum' AS DOUBLE) AS ema,
       |    LAG(px, 19) OVER w AS h19
       |  FROM p
       |  WINDOW w AS (PARTITION BY l_partkey
       |    ORDER BY l_shipdate, l_orderkey, l_linenumber)),
       |f AS (
       |  SELECT l_partkey, px > ema * CAST('1.02' AS DOUBLE) AS sig
       |  FROM s WHERE h19 IS NOT NULL)
       |SELECT p_brand,
       |  CAST(COUNT(*) AS BIGINT) AS evaluated,
       |  CAST(SUM(CASE WHEN sig THEN 1 ELSE 0 END) AS BIGINT) AS signals,
       |  ROUND(CAST(SUM(CASE WHEN sig THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE), 6) AS signal_rate
       |FROM f JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin
  }

  /** Q267: seasonality strength — per event type, how much of the hourly
    * traffic variance the hour-of-day profile explains: strength =
    * max(0, 1 − Var(residual)/Var(total)) over hourly counts, with the
    * seasonal component = the 6-dp-rounded mean count of that hour-of-day.
    * The STL-style decomposition a forecasting pipeline runs before
    * trusting q236's seasonal-naive baseline.
    *
    * Determinism: total variance from exact integer moments (q99's
    * shape); residuals are EXACT DECIMALS (integer count − 6-dp seasonal
    * mean), so Σr and Σr² are exact decimal sums — the (38,6) cut on Σr²
    * is provably midpoint-free (a square of a 6-dp decimal cannot end in
    * …500000·10⁻¹²: k² ≡ 32 (mod 64) has no solution), and the scaled
    * integers stay < 2⁵³ for the exact double conversion.
    *
    * Scale shape: two keyed aggregates (hourly, hour-of-day profile) +
    * one keyed join + one per-type reduction — map-side combined
    * throughout.
    */
  def q267SeasonalityStrength: Q = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val hourly = events(s, d)
      .select(col("event_type"), epochSec(col("ts2")).as("es"))
      .select(col("event_type"), expr("es div 3600").as("h"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hd", expr("pmod(h, 24)"))
    val prof = hourly.groupBy(col("event_type"), col("hd"))
      .agg(round(sum(col("n")).cast("double") / count(lit(1)).cast("double"), 6)
        .cast(dec6).as("s6"))
    val joined = hourly.join(prof, Seq("event_type", "hd"))
      .withColumn("r", col("n").cast(dec6) - col("s6"))
    val a = joined.groupBy(col("event_type"))
      .agg(count(lit(1)).as("c"),
        sum(col("n")).as("s1"), sum(col("n") * col("n")).as("s2"),
        sum(col("r")).cast(org.apache.spark.sql.types.DecimalType(38, 6))
          .cast("double").as("rs1"),
        // cast one operand to (18,6) so the product is exactly (38,12):
        // (19,6)x(19,6) would need (39,12) and allowPrecisionLoss would
        // HALF_UP-round at scale 11, diverging from the oracle's exact
        // product. r is a count-minus-profile residual, far below 10^12,
        // so the downcast is lossless (the q220 trick).
        sum(col("r").cast(dec6) * col("r"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 6))
          .cast("double").as("rs2"))
    val cD = col("c").cast("double")
    val varTot = col("s2").cast("double") / cD -
      (col("s1").cast("double") / cD) * (col("s1").cast("double") / cD)
    val varRes = col("rs2") / cD - (col("rs1") / cD) * (col("rs1") / cD)
    a.select(col("event_type"), big(col("c")).as("n_hours"),
      round(varTot, 6).as("var_total"),
      round(varRes, 6).as("var_resid"),
      round(greatest(lit(0.0), lit(1.0) - varRes / varTot), 6)
        .as("seasonal_strength"))
      .orderBy(col("event_type"))
  }

  /** Q310: traffic burstiness — per event type over observed hourly
    * counts: Fano factor (variance/mean — the overdispersion test against
    * Poisson), coefficient of variation, and the Goh–Barabási burstiness
    * coefficient (σ−μ)/(σ+μ) — the capacity-planning triple that says
    * whether load is smooth, Poisson, or bursty. Exact integer moments
    * (counts and squared counts), one shared closing IEEE tree.
    *
    * Scale shape: one hourly collapse (map-side combined), one per-type
    * moment aggregate — two shuffles at any volume.
    */
  def q310Burstiness: Q = (s, d) => {
    val m = events(s, d)
      .select(col("event_type"), epochSec(col("ts2")).as("es"))
      .select(col("event_type"), expr("es div 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("nh"), sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"))
    val nD = col("nh").cast("double")
    val mean = col("s1").cast("double") / nD
    val vr = col("s2").cast("double") / nD - mean * mean
    val sd = sqrt(greatest(vr, lit(0.0)))
    m.select(col("event_type"), big(col("nh")).as("n_hours"),
      round(mean, 6).as("mean_per_hour"),
      round(vr / mean, 6).as("fano"),
      round(sd / mean, 6).as("cv"),
      round((sd - mean) / (sd + mean), 6).as("burstiness"))
      .orderBy(col("event_type"))
  }

  /** Q367: periodogram — discrete-Fourier power at candidate periods 2–24 h
    * over each event type's hourly count series, the "is there a daily
    * cycle, and at what period?" scan that q267's single-period
    * seasonality strength can't answer. Per (type, period) the cos/sin
    * projections are Σ c_t·cos(2πt/P): the trig factor is ONE libm call
    * rounded to 6 dp (the q208 per-term battery) and multiplied into the
    * integer count under an exact decimal sum, so the only float steps are
    * shared-libm trig + the final power division. Cost: the bounded hourly
    * summary × 23 periods — shuffle ∝ distinct (type, hour), never events.
    */
  def q367Periodogram: Q = (s, d) =>
    periodogramPowers(s, d)
      .orderBy(col("event_type"), col("period_hours"))

  /** The q367 periodogram relation (event_type, period_hours, power) over
    * the bounded hourly collapse — factored so q471's spectral entropy
    * reduces the SAME 4-dp power basis both engines agree on.
    */
  private[operators] def periodogramPowers(s: SparkSession, d: String): DataFrame =
    periodogramPowersFrom(events(s, d)
      .select(col("event_type"), expr("CAST(ts2 AS LONG) div 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c")),
      pinGrid = true)

  /** [[periodogramPowers]] from an already-collapsed (event_type, h, c)
    * hourly relation — the mergeable-cell entry the q477 streaming twin
    * drains through (hourly counts merge by plain sum, q376's argument).
    * `pinGrid` adds a pinned exchange before the ×23-period trig grid:
    * the hourly collapse is byte-small so AQE ran the whole trig/decimal
    * grid on one task (measured ~0.5 s single-task at sf0.1 — opt r14).
    * Batch callers (q367/q471) want it; the q477 per-micro-batch drain
    * does NOT — there the extra exchange per batch costs more latency
    * than the parallelism recovers (measured +0.6 s on the drain), the
    * same trade as the rejected PPJoin verify pin.
    */
  private[graft] def periodogramPowersFrom(hourly: DataFrame,
                                           pinGrid: Boolean = false): DataFrame = {
    val base = hourly.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), count(lit(1)).as("n"))
    val pts0 = hourly.join(base, Seq("event_type"))
      .select(col("event_type"), (col("h") - col("h0")).as("t"), col("c"),
        col("n"))
    val pts = if (pinGrid)
      pts0.repartition(hourly.sparkSession.sparkContext.defaultParallelism,
        col("event_type"), col("t"))
    else pts0
    val periods = hourly.sparkSession.range(2L, 25L).toDF("p")
    val ang = lit(2.0) * lit(math.Pi) * col("t").cast("double") /
      col("p").cast("double")
    val proj = pts.crossJoin(broadcast(periods))
      .groupBy(col("event_type"), col("p"))
      .agg(sum(round(cos(ang), 6).cast(DecimalType(18, 6))
        * col("c").cast(DecimalType(10, 0))).as("cs"),
        sum(round(sin(ang), 6).cast(DecimalType(18, 6))
          * col("c").cast(DecimalType(10, 0))).as("sn"),
        max(col("n")).as("n"))
    proj.select(col("event_type"), big(col("p")).as("period_hours"),
      round((col("cs").cast("double") * col("cs").cast("double") +
        col("sn").cast("double") * col("sn").cast("double")) /
        (col("n").cast("double") * col("n").cast("double")), 4).as("power"))
  }

  /** Q471: normalized spectral entropy — ONE number per event type for
    * "how periodic is this signal" where q367's periodogram gives the
    * whole spectrum: H = −Σp̂ₖln p̂ₖ over the shared 4-dp power basis
    * ([[periodogramPowers]]), normalized by ln K, plus the deterministic
    * peak period (power desc, period asc). Low H_norm = one dominant
    * cycle; ~1 = noise-like. Per-type terms are 8-dp-rounded decimal
    * sums over the 23-row period relation.
    */
  def q471SpectralEntropy: Q = (s, d) =>
    spectralEntropyReport(periodogramPowers(s, d))

  /** The q471 kernel over a periodogram-power relation — shared with the
    * q477 streaming twin's drain.
    */
  private[graft] def spectralEntropyReport(pw: DataFrame): DataFrame = {
    val tot = pw.groupBy(col("event_type"))
      .agg(sum(col("power").cast(DecimalType(18, 4))).as("pt"),
        count(lit(1)).as("k"))
    val j = pw.join(broadcast(tot), Seq("event_type"))
      .filter(col("power") > 0.0)
    val p = col("power") / col("pt").cast("double")
    val term = round(p * log(lit(1.0) / p), 8).cast(DecimalType(38, 8))
    val h = j.groupBy(col("event_type"))
      .agg(max(col("k")).as("k"), sum(term).cast("double").as("h"))
    val wp = Window.partitionBy(col("event_type"))
      .orderBy(col("power").desc, col("period_hours"))
    val peak = pw.withColumn("rn", row_number().over(wp))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("period_hours").as("peak_period"))
    h.join(peak, Seq("event_type"))
      .select(col("event_type"), big(col("k")).as("n_periods"),
        col("peak_period"), round(col("h"), 6).as("h"),
        round(col("h") / log(col("k").cast("double")), 6).as("h_norm"))
      .orderBy(col("event_type"))
  }

  /** Q368: EWMA control chart (λ=0.2, 3σ limits) — the drift-sensitive
    * monitor between q256's Bollinger bands (rolling window, lag-prone)
    * and q198's CUSUM (cumulative, no per-point limits): the smoothed
    * statistic s_t = λx_t + (1−λ)s_{t−1} in CLOSED form — each (t', t≥t')
    * pair contributes round((1−λ)^{t−t'}·coef, 6)·x_{t'} to an exact
    * decimal sum, so no sequential recursion and no order-dependent float
    * accumulation. The time-varying limits use the exact-moment σ and the
    * standard √(λ/(2−λ)(1−(1−λ)^{2t})) width. Cost: the per-type pair
    * join is hours² over the BOUNDED hourly collapse, never events.
    */
  def q368EwmaControl: Q = (s, d) =>
    ewmaReport(events(s, d)
      .select(col("event_type"), expr("CAST(ts2 AS LONG) div 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c")),
      pinJoin = true)

  /** The EWMA-chart kernel from a (event_type, h, c) hourly summary — the
    * mergeable state q376's streaming twin folds per batch (hourly counts
    * of disjoint row sets merge by per-cell sum, q348's argument).
    */
  private[graft] def ewmaReport(counts: DataFrame,
                                pinJoin: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val hourly = counts.withColumn("r", row_number().over(w) - 1)
    val mom = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).cast("long").as("sc"),
        sum(col("c") * col("c")).cast("long").as("scc"))
    val a = hourly.select(col("event_type"), col("r").as("rp"),
      col("c").as("x"))
    val coef = when(col("rp") === 0L, lit(1.0)).otherwise(lit(0.2))
    // lag cap 80 is OUTPUT-IDENTICAL, not approximate: the largest
    // dropped coefficient is 0.8^81 ~ 1.4e-8, which the declared 6-dp
    // per-term rounding maps to exactly 0 — so the pair join is bounded
    // to 81 rows per point (O(n) not O(n^2) in the hour span), the same
    // cap the oracle applies
    // pinned exchange into the per-type lag join (batch path only — the
    // q376 per-micro-batch drain pays more in exchange latency than the
    // parallelism recovers, the periodogramPowersFrom trade): both sides
    // are byte-small hourly summaries but the join expands hours×hours
    // per type before the ≤80-lag filter (measured 2×0.7 s narrow stages
    // at sf0.1 — opt r14); width is bounded by |event types|
    val aP = if (pinJoin)
      a.repartition(a.sparkSession.sparkContext.defaultParallelism,
        col("event_type"))
    else a
    val ew = aP
      .join(hourly.select(col("event_type"), col("r"), col("h"),
        col("c")), Seq("event_type"))
      .filter(col("rp") <= col("r") && col("r") - col("rp") <= 80L)
      .groupBy(col("event_type"), col("h"), col("r"), col("c"))
      .agg(sum(round(pow(lit(0.8), (col("r") - col("rp")).cast("double"))
        * coef, 6).cast(DecimalType(18, 6)) * col("x").cast(DecimalType(10, 0)))
        .cast(DecimalType(38, 6)).cast("double").as("s"))
    val nD = col("n").cast("double")
    val mean = col("sc").cast("double") / nD
    val sd = sqrt((col("scc").cast("double") - col("sc").cast("double")
      * col("sc").cast("double") / nD) / (nD - 1.0))
    val width = lit(3.0) * sd * sqrt(lit(0.2) / lit(1.8)
      * (lit(1.0) - pow(lit(0.8), lit(2.0) * col("r").cast("double"))))
    ew.join(broadcast(mom), Seq("event_type"))
      // r=0 is the s₀ initialization point — its limit width is exactly 0
      // (1−(1−λ)⁰ = 0), so charting it would always flag; the chart starts
      // at the second hour, the standard EWMA convention
      .filter(col("r") > 0L)
      // ewma keeps the FULL 6-dp scale of its decimal sum: a 4-dp cut
      // lands on exact .xxxx50 midpoints (6-dp coefficients x integer
      // counts), where Spark rounds half-up and DuckDB half-even — the
      // recorded decimal-midpoint trap. The sqrt-based limits have no
      // midpoint structure, so 4 dp is safe there.
      .select(col("event_type"), col("h"), big(col("c")).as("c"),
        round(col("s"), 6).as("ewma"),
        round(mean + width, 4).as("ucl"),
        round(mean - width, 4).as("lcl"),
        (round(col("s"), 6) > round(mean + width, 4) ||
          round(col("s"), 6) < round(mean - width, 4)).as("out_of_control"))
      .orderBy(col("event_type"), col("h"))
  }

  /** Q371: Markov stationary distribution — where does the q185 transition
    * chain settle? Eight unrolled power-iteration rounds in integer
    * MICRO-UNITS: π_{t+1}(j) = Σᵢ (πᵢ·cᵢⱼ) div totᵢ, a sum of longs —
    * associative, order-independent, bit-identical in any engine (the q81
    * fixpoint discipline), with the small floor leak a declared part of
    * the semantics. Each round is one broadcast join over the k×k
    * transition matrix (k = |event types|); rounds are materialized so
    * the plan stays flat.
    */
  def q371MarkovStationary: Q = (s, d) =>
    markovPiMicro(markovTrt(s, d))
      .select(col("state"), big(col("r")).as("pi_micro"))
      .orderBy(col("state"))

  /** The (prev, next, cnt, tot) transition relation behind q371/q472 —
    * one sessionized lag pass, materialized once.
    */
  private[operators] def markovTrt(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val tr = events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        epochSec(col("ts2")).as("es"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("cnt"))
    val tot = tr.groupBy(col("prev")).agg(sum(col("cnt")).cast("long").as("tot"))
    graft.Checkpoints.materialize(tr.join(tot, Seq("prev")))
  }

  /** q371's 8-step integer-micro power iteration over [[markovTrt]]. */
  private[operators] def markovPiMicro(trt: DataFrame): DataFrame = {
    var pi = trt.select(col("prev").as("state")).distinct()
      .withColumn("r", lit(1000000L))
    for (_ <- 1 to 8) {
      pi = graft.Checkpoints.materialize(
        pi.join(broadcast(trt), pi("state") === trt("prev"))
          .groupBy(col("next"))
          .agg(sum(expr("(r * cnt) div tot")).cast("long").as("r"))
          .select(col("next").as("state"), col("r")))
    }
    pi
  }

  /** Q472: Markov entropy rate — the single compressibility number for
    * the per-user event-type process q185/q371 describe piecewise:
    * H = Σₛ πₛ Σₜ Pₛₜ ln(1/Pₛₜ) in nats over the stationary weights
    * (q371's exact integer-micro fixpoint) and the exact transition
    * counts, with perplexity eᴴ as the "effective next-event branching
    * factor". The 25-edge reduction uses 8-dp-rounded decimal terms;
    * everything upstream is the shared [[markovTrt]] pass.
    */
  def q472MarkovEntropyRate: Q = (s, d) => {
    val trt = markovTrt(s, d)
    val pi = markovPiMicro(trt)
    val ns = pi.agg(count(lit(1)).as("ns"))
    val j = trt.join(broadcast(pi), col("prev") === col("state"))
    val term = round(col("r").cast("double") / 1.0e6 *
      (col("cnt").cast("double") / col("tot").cast("double")) *
      log(col("tot").cast("double") / col("cnt").cast("double")), 8)
    val red = j.agg(count(lit(1)).as("n_edges"),
      sum(col("cnt")).cast("long").as("n_transitions"),
      sum(term.cast(DecimalType(38, 8))).cast("double").as("h"))
    red.crossJoin(broadcast(ns))
      .select(big(col("ns")).as("n_states"), big(col("n_edges")).as("n_edges"),
        col("n_transitions"),
        round(col("h"), 6).as("entropy_rate_nats"),
        round(exp(col("h")), 4).as("perplexity"))
  }

  /** Q372: Kendall τ-b — per event type, the rank correlation between the
    * hourly VOLUME (count) and the hourly average VALUE: "do busy hours
    * run hotter or cooler?", robust to any monotone transform (q220's
    * Pearson is not). Every pair verdict is EXACT integer/decimal
    * arithmetic: volume compares as c₂−c₁, average value compares by the
    * cleared-denominator cross product sv₂c₁ − sv₁c₂, ties counted per
    * axis for the τ-b denominator; only the final ratio is double. The
    * pair join is per-type over the bounded hourly collapse (the q342
    * S-statistic shape) — hours², never events².
    */
  def q372KendallTau: Q = (s, d) => {
    val hourly = events(s, d)
      .select(col("event_type"), expr("CAST(ts2 AS LONG) div 3600").as("h"),
        Dsl.dec(col("value")).as("v"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("c"), sum(col("v")).as("sv"))
    val a = hourly.select(col("event_type"), col("h").as("h1"),
      col("c").as("c1"), col("sv").as("sv1"))
    val b = hourly.select(col("event_type"), col("h").as("h2"),
      col("c").as("c2"), col("sv").as("sv2"))
    val xcmp = col("c2") - col("c1")
    val ycmp = col("sv2").cast(DecimalType(18, 4)) * col("c1").cast(DecimalType(10, 0)) -
      col("sv1").cast(DecimalType(18, 4)) * col("c2").cast(DecimalType(10, 0))
    // NOTE (opt r14): pinning this per-type pair join like q368's was
    // measured WORSE (1.32→1.74 s same-mix A/B) — the hours² volume here
    // is small enough that the extra exchange latency dominates; left
    // AQE-planned on purpose.
    val pairs = a.join(b, Seq("event_type"))
      .filter(col("h1") < col("h2"))
      .select(col("event_type"),
        when(xcmp > 0L, 1L).when(xcmp < 0L, -1L).otherwise(0L).as("sx"),
        when(ycmp > 0, 1L).when(ycmp < 0, -1L).otherwise(0L).as("sy"))
    val agg = pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n0"),
        sum(when(col("sx") * col("sy") > 0L, 1L).otherwise(0L)).as("conc"),
        sum(when(col("sx") * col("sy") < 0L, 1L).otherwise(0L)).as("disc"),
        sum(when(col("sx") === 0L, 1L).otherwise(0L)).as("tx"),
        sum(when(col("sy") === 0L, 1L).otherwise(0L)).as("ty"))
    agg.select(col("event_type"), big(col("n0")).as("n_pairs"),
      big(col("conc")).as("concordant"), big(col("disc")).as("discordant"),
      round((col("conc") - col("disc")).cast("double") /
        sqrt((col("n0") - col("tx")).cast("double") *
          (col("n0") - col("ty")).cast("double")), 6).as("tau_b"))
      .orderBy(col("event_type"))
  }

  /** Q378: additive seasonal decomposition — per event type, the
    * hour-of-day seasonal index (cell mean − grand mean over the hourly
    * counts) plus the per-type residual standard deviation after removing
    * it: the "what does a NORMAL Tuesday 3pm look like" baseline under
    * q267's strength score. Means are exact rationals cleared to one IEEE
    * expression each; residual squares are per-row rounded and
    * decimal-summed (the q369 discipline).
    */
  def q378SeasonalDecompose: Q = (s, d) => {
    val hourly = events(s, d)
      .select(col("event_type"), expr("CAST(ts2 AS LONG) div 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
      .withColumn("hod", pmod(col("h"), lit(24L)))
    val grand = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).cast("long").as("sc"))
    val cell = hourly.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("nc"), sum(col("c")).cast("long").as("scc"))
    val seas = cell.join(grand, Seq("event_type"))
      .select(col("event_type"), col("hod"), col("nc"),
        round(col("scc").cast("double") / col("nc").cast("double")
          - col("sc").cast("double") / col("n").cast("double"), 6)
          .as("seasonal"))
    val resid = hourly.join(seas, Seq("event_type", "hod"))
      .join(grand, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(sum(round((col("c").cast("double") - col("seasonal")
        - col("sc").cast("double") / col("n").cast("double"))
        * (col("c").cast("double") - col("seasonal")
          - col("sc").cast("double") / col("n").cast("double")), 6)
        .cast(DecimalType(28, 6))).cast("double").as("ssr"),
        count(lit(1)).as("nh"))
    seas.join(broadcast(resid), Seq("event_type"))
      .select(col("event_type"), big(col("hod")).as("hour_of_day"),
        big(col("nc")).as("n_hours"), col("seasonal"),
        round(sqrt(col("ssr") / (col("nh") - 1L).cast("double")), 6)
          .as("residual_sd"))
      .orderBy(col("event_type"), col("hour_of_day"))
  }

  /** Q380: capture–recapture population estimate — the Chapman estimator
    * of the TOTAL user universe (including never-seen users) from the
    * overlap between the first- and second-half active user sets:
    * N̂ = (n₁+1)(n₂+1)/(m+1) − 1. The classic "how big is the population
    * my logs only sample" audit; integer arithmetic up to one final
    * rounded division. Three distinct-aggregates, all keyed on user_id.
    */
  def q380CaptureRecapture: Q = (s, d) => {
    val ev = events(s, d)
      .select(col("user_id"), epochSec(col("ts2")).as("ts"))
    val mid = ev.agg(expr("(MIN(ts) + MAX(ts)) div 2")).head().getLong(0)
    val per = ev.groupBy(col("user_id"))
      .agg(max(when(col("ts") < mid, 1L).otherwise(0L)).as("s1"),
        max(when(col("ts") >= mid, 1L).otherwise(0L)).as("s2"))
    per.agg(sum(col("s1")).cast("long").as("n1"),
      sum(col("s2")).cast("long").as("n2"),
      sum(col("s1") * col("s2")).cast("long").as("m"),
      count(lit(1)).as("n_seen"))
      .select(big(col("n1")).as("n_first"), big(col("n2")).as("n_second"),
        big(col("m")).as("n_both"), big(col("n_seen")).as("n_seen"),
        round((col("n1") + 1L).cast("double") * (col("n2") + 1L).cast("double")
          / (col("m") + 1L).cast("double") - 1.0, 2).as("chapman_estimate"))
  }

  /** Q381: Haar wavelet energy decomposition — per event type, the energy
    * of the hourly-count series at dyadic scales 2/4/8/16 hours (detail
    * coefficients = first-half − second-half block sums), localizing
    * WHERE in frequency the variance lives (spiky vs slow drift) the way
    * q367's global periodogram can't. Entirely INTEGER: block sums and
    * differences of counts, squared and summed as longs — bit-portable
    * with no float step at all. One aggregate per level over the bounded
    * hourly collapse; the first 256 hours per type are the declared
    * analysis window.
    */
  def q381HaarEnergy: Q = (s, d) => {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val hourly = events(s, d)
      .select(col("event_type"), expr("CAST(ts2 AS LONG) div 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(w) - 1)
      .filter(col("r") < 256L)
    val levels = (1 to 4).map { lvl =>
      val half = 1L << (lvl - 1)
      val sign = when(pmod(col("r"), lit(half * 2)) < half, 1L)
        .otherwise(-1L)
      hourly
        .groupBy(col("event_type"), expr(s"r div ${half * 2}").as("blk"))
        .agg(sum(sign * col("c")).cast("long").as("dcoef"),
          count(lit(1)).as("npts"))
        .filter(col("npts") === half * 2) // complete blocks only
        .groupBy(col("event_type"))
        .agg(sum(col("dcoef") * col("dcoef")).cast("long").as("energy"),
          count(lit(1)).as("n_blocks"))
        .select(col("event_type"), lit(lvl.toLong).as("level"),
          lit(half * 2).as("scale_hours"), big(col("n_blocks")).as("n_blocks"),
          big(col("energy")).as("energy"))
    }
    levels.reduce(_ unionAll _)
      .orderBy(col("event_type"), col("level"))
  }

  /** Q382: cross-correlation function — Pearson correlation between the
    * click and purchase hourly-count series at lags −12..+12: "do clicks
    * LEAD purchases, and by how many hours?" — the lead–lag diagnostic
    * q282's single-series ACF can't give. Per lag the moments are exact
    * integer sums over the aligned hour pairs; the correlation is one
    * IEEE expression rounded to 6 dp. The 25-row lag relation broadcasts
    * onto the bounded hourly collapse.
    */
  def q382Ccf: Q = (s, d) => {
    val hourly = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), expr("CAST(ts2 AS LONG) div 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
    val a = hourly.filter(col("event_type") === "click")
      .select(col("h"), col("c").as("ca"))
    val b = hourly.filter(col("event_type") === "purchase")
      .select(col("h").as("hb"), col("c").as("cb"))
    val lags = s.range(-12L, 13L).toDF("lag")
    val joined = a.crossJoin(broadcast(lags))
      .join(b, col("hb") === col("h") + col("lag"))
    val mom = joined.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("ca")).cast("long").as("sa"),
        sum(col("cb")).cast("long").as("sb"),
        sum(col("ca") * col("ca")).cast("long").as("saa"),
        sum(col("cb") * col("cb")).cast("long").as("sbb"),
        sum(col("ca") * col("cb")).cast("long").as("sab"))
    val nD = col("n").cast("double")
    val cov = nD * col("sab").cast("double") -
      col("sa").cast("double") * col("sb").cast("double")
    val va = nD * col("saa").cast("double") -
      col("sa").cast("double") * col("sa").cast("double")
    val vb = nD * col("sbb").cast("double") -
      col("sb").cast("double") * col("sb").cast("double")
    mom.select(big(col("lag")).as("lag_hours"), big(col("n")).as("n_pairs"),
      round(cov / sqrt(va * vb), 6).as("ccf"))
      .orderBy(col("lag_hours"))
  }

  /** Q383: Wald–Wolfowitz runs test — is each type's hourly volume
    * sequence RANDOM around its median, or does it clump (regimes,
    * day/night waves)? Hours dichotomize against the exact rank-picked
    * median (ties to the median drop, the standard treatment); the run
    * count is one lag window; E[R] and Var[R] are closed-form integer
    * expressions; only the final z is double. Complements q342 (monotone
    * trend) with a non-directional randomness check.
    */
  def q383RunsTest: Q = (s, d) =>
    runsReport(events(s, d)
      .select(col("event_type"), expr("CAST(ts2 AS LONG) div 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c")))

  /** The runs-test kernel from a (event_type, h, c) hourly summary — the
    * mergeable state q390's streaming twin folds per batch (q348's
    * hourly-cell argument).
    */
  private[graft] def runsReport(hourly: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val wN = Window.partitionBy(col("event_type"))
    val med = hourly
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("c"), col("h"))))
      .withColumn("nn", count(lit(1)).over(wN))
      .filter(col("rn") === expr("(nn + 1) div 2"))
      .select(col("event_type"), col("c").as("med"))
    val signs = hourly.join(med, Seq("event_type"))
      .filter(col("c") =!= col("med"))
      .select(col("event_type"), col("h"), (col("c") > col("med")).as("up"))
      .withColumn("prev", lag(col("up"), 1).over(w))
    val agg = signs.groupBy(col("event_type"))
      .agg(sum(when(col("up"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("up"), 1L).otherwise(0L)).as("n2"),
        (sum(when(col("prev").isNull || col("prev") =!= col("up"), 1L)
          .otherwise(0L))).cast("long").as("runs"))
      // degenerate series (one-sided or Var[R]=0, possible at tiny SF where
      // most hours tie the median and drop) have no defined z — excluded
      // by the same integer condition in both engines
      .filter(col("n1") >= 1L && col("n2") >= 1L &&
        lit(2L) * col("n1") * col("n2") > col("n1") + col("n2"))
    val n1D = col("n1").cast("double")
    val n2D = col("n2").cast("double")
    val nD = (col("n1") + col("n2")).cast("double")
    val er = lit(2.0) * n1D * n2D / nD + 1.0
    val vr = lit(2.0) * n1D * n2D * (lit(2.0) * n1D * n2D - nD) /
      (nD * nD * (nD - 1.0))
    agg.select(col("event_type"), big(col("n1")).as("n_above"),
      big(col("n2")).as("n_below"), big(col("runs")).as("runs"),
      round(er, 4).as("expected_runs"),
      round((col("runs").cast("double") - er) / sqrt(vr), 6).as("z"),
      (abs(round((col("runs").cast("double") - er) / sqrt(vr), 6))
        > lit(1.96)).as("non_random"))
      .orderBy(col("event_type"))
  }

  /** Q384: Gumbel return level — extreme-value "what hourly volume should
    * we provision for once per 30 days?" per event type: daily block
    * maxima of the hourly counts, Gumbel fit by method of moments
    * (β = s√6/π, μ = m̄ − γβ), and the T=30 return level
    * μ − β·ln(−ln(1−1/T)). Block maxima and their moments are exact
    * integers; the fit is one IEEE expression chain rounded to 4 dp, with
    * π/γ/T entering through the engines' shared libm constants.
    */
  def q384GumbelReturn: Q = (s, d) => {
    val daily = events(s, d)
      .select(col("event_type"), expr("CAST(ts2 AS LONG) div 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"), expr("h div 24").as("day"))
      .agg(max(col("c")).as("mx"))
    val mom = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("mx")).cast("long").as("sm"),
        sum(col("mx") * col("mx")).cast("long").as("smm"))
    val nD = col("n").cast("double")
    val mean = col("sm").cast("double") / nD
    val sd = sqrt((col("smm").cast("double") - col("sm").cast("double")
      * col("sm").cast("double") / nD) / (nD - 1.0))
    val beta = sd * sqrt(lit(6.0)) / lit(math.Pi)
    val mu = mean - lit(0.5772156649) * beta
    val rl = mu - beta * log(-log(lit(1.0) - lit(1.0) / lit(30.0)))
    mom.select(col("event_type"), big(col("n")).as("n_days"),
      round(mean, 4).as("mean_daily_max"),
      round(beta, 4).as("gumbel_beta"),
      round(mu, 4).as("gumbel_mu"),
      round(rl, 4).as("return_level_30d"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "q471_spectral_entropy" -> q471SpectralEntropy,
    "q472_markov_entropy_rate" -> q472MarkovEntropyRate,
    "q378_seasonal_decompose" -> q378SeasonalDecompose,
    "q380_capture_recapture" -> q380CaptureRecapture,
    "q381_haar_energy" -> q381HaarEnergy,
    "q382_ccf" -> q382Ccf,
    "q383_runs_test" -> q383RunsTest,
    "q384_gumbel_return" -> q384GumbelReturn,
    "q367_periodogram" -> q367Periodogram,
    "q368_ewma_control" -> q368EwmaControl,
    "q371_markov_stationary" -> q371MarkovStationary,
    "q372_kendall_tau" -> q372KendallTau,
    "q310_burstiness" -> q310Burstiness,
    "q267_seasonality_strength" -> q267SeasonalityStrength,
    "q256_bollinger_breakout" -> q256BollingerBreakout,
    "q290_ema_signal" -> q290EmaSignal,
    "q321_trend_break" -> q321TrendBreak,
    "q351_shapley_attribution" -> q351ShapleyAttribution,
    "q252_strict_funnel" -> q252StrictFunnel,
    "q246_conversion_latency" -> q246ConversionLatency,
    "q243_streaks" -> q243Streaks,
    "q244_max_drawdown" -> q244MaxDrawdown,
    "q241_forward_fill" -> q241ForwardFill,
    "q242_nearest_asof" -> q242NearestAsof,
    "q236_seasonal_naive_eval" -> q236SeasonalNaiveEval,
    "q233_bitmap_overlap" -> q233BitmapOverlap,
    "q226_max_concurrency" -> q226MaxConcurrency,
    "q227_sax_motifs" -> q227SaxMotifs,
    "q212_survivorship" -> q212Survivorship,
    "q206_cohort_ltv" -> q206CohortLtv,
    "q207_rfm" -> q207Rfm,
    "q202_twap" -> q202Twap,
    "q203_clamped_balance" -> q203ClampedBalance,
    "q198_changepoint" -> q198Changepoint,
    "q199_path_trigrams" -> q199PathTrigrams,
    "q195_ts_features" -> q195TsFeatures,
    "q184_attribution" -> q184Attribution,
    "q185_markov_transitions" -> q185MarkovTransitions,
    "q174_resample_interpolate" -> q174ResampleInterpolate,
    "q170_scd2" -> q170Scd2,
    "q85_map_funcs" -> q85MapFuncs,
    "q76_funnel" -> q76Funnel,
    "q08_range_join" -> q08RangeJoin,
    "q09_asof_join" -> q09AsofJoin,
    "q94_asof_forward" -> q94AsofForward,
    "q97_sliding_distinct" -> q97SlidingDistinct,
    "q99_hourly_anomaly" -> q99HourlyAnomaly,
    "q11_distinct_agg" -> q11DistinctAgg,
    "q14_grouping_sets" -> q14GroupingSets,
    "q25_json" -> q25Json,
    "q31_sessionize" -> q31Sessionize,
    "q132_trajectory_assembly" -> q132TrajectoryAssembly,
    "q32_tumbling" -> q32Tumbling,
    "q33_sliding" -> q33Sliding,
    "q75_retention" -> q75Retention)

  private val ewmaNumSql: String =
    (0 until 16).map { k =>
      val wt = 1L << (15 - k)
      if (k == 0) s"cents * $wt"
      else s"COALESCE(lag(cents, $k) OVER w, 0) * $wt"
    }.mkString(" + ")

  private val ewmaDenSql: String =
    (0 until 16).map { k =>
      val wt = 1L << (15 - k)
      if (k == 0) s"$wt"
      else s"CASE WHEN lag(cents, $k) OVER w IS NOT NULL THEN $wt ELSE 0 END"
    }.mkString(" + ")

  val oracles: Map[String, String] = Map(
    "q471_spectral_entropy" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |base AS (SELECT event_type, MIN(h) AS h0, COUNT(*) AS n
        |         FROM hourly GROUP BY 1),
        |pts AS (
        |  SELECT hourly.event_type, h - h0 AS t, c, n
        |  FROM hourly JOIN base ON hourly.event_type = base.event_type),
        |periods AS (SELECT CAST(u.p AS BIGINT) AS p
        |            FROM unnest(range(2, 25)) u(p)),
        |proj AS (
        |  SELECT event_type, p,
        |    SUM(CAST(ROUND(COS(CAST('2.0' AS DOUBLE) * pi()
        |        * CAST(t AS DOUBLE) / CAST(p AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) * CAST(c AS DECIMAL(10,0))) AS cs,
        |    SUM(CAST(ROUND(SIN(CAST('2.0' AS DOUBLE) * pi()
        |        * CAST(t AS DOUBLE) / CAST(p AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) * CAST(c AS DECIMAL(10,0))) AS sn,
        |    MAX(n) AS n
        |  FROM pts, periods GROUP BY 1, 2),
        |pw AS MATERIALIZED (
        |  SELECT event_type, p AS period_hours,
        |    ROUND((CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
        |      + CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 4) AS power
        |  FROM proj),
        |tot AS (SELECT event_type,
        |    CAST(SUM(CAST(power AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS pt,
        |    COUNT(*) AS k
        |  FROM pw GROUP BY 1),
        |hh AS (SELECT pw.event_type, MAX(k) AS k,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      power / CAST(pt AS DOUBLE)
        |      * LN(CAST('1.0' AS DOUBLE)
        |        / (power / CAST(pt AS DOUBLE))), 8) AS DECIMAL(38,8)))
        |      AS DECIMAL(38,8)) AS DOUBLE) AS h
        |  FROM pw JOIN tot ON pw.event_type = tot.event_type
        |  WHERE power > CAST('0.0' AS DOUBLE)
        |  GROUP BY 1),
        |peak AS (SELECT event_type, period_hours AS peak_period
        |  FROM (SELECT event_type, period_hours,
        |      ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY power DESC, period_hours) AS rn
        |    FROM pw) q WHERE rn = 1)
        |SELECT hh.event_type, CAST(k AS BIGINT) AS n_periods, peak_period,
        |  ROUND(h, 6) AS h,
        |  ROUND(h / LN(CAST(k AS DOUBLE)), 6) AS h_norm
        |FROM hh JOIN peak ON hh.event_type = peak.event_type
        |ORDER BY 1""".stripMargin,
    "q472_markov_entropy_rate" ->
      """WITH seq AS (
        |  SELECT event_type AS next,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch(date_trunc('second', ts)), event_id) AS prev
        |  FROM events),
        |tr AS (SELECT prev, next, COUNT(*) AS cnt FROM seq
        |       WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev, CAST(SUM(cnt) AS BIGINT) AS tot
        |        FROM tr GROUP BY 1),
        |trt AS MATERIALIZED (
        |  SELECT tr.prev, next, cnt, tot
        |  FROM tr JOIN tot ON tr.prev = tot.prev),
        |r0 AS (SELECT DISTINCT prev AS state, CAST(1000000 AS BIGINT) AS r
        |       FROM trt),
        |r1 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r0 JOIN trt ON r0.state = trt.prev GROUP BY 1),
        |r2 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r1 JOIN trt ON r1.state = trt.prev GROUP BY 1),
        |r3 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r2 JOIN trt ON r2.state = trt.prev GROUP BY 1),
        |r4 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r3 JOIN trt ON r3.state = trt.prev GROUP BY 1),
        |r5 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r4 JOIN trt ON r4.state = trt.prev GROUP BY 1),
        |r6 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r5 JOIN trt ON r5.state = trt.prev GROUP BY 1),
        |r7 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r6 JOIN trt ON r6.state = trt.prev GROUP BY 1),
        |r8 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r7 JOIN trt ON r7.state = trt.prev GROUP BY 1),
        |ns AS (SELECT COUNT(*) AS ns FROM r8),
        |red AS (SELECT COUNT(*) AS n_edges,
        |    CAST(SUM(cnt) AS BIGINT) AS n_transitions,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      CAST(r AS DOUBLE) / CAST('1.0e6' AS DOUBLE)
        |      * (CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
        |      * LN(CAST(tot AS DOUBLE) / CAST(cnt AS DOUBLE)), 8)
        |      AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS DOUBLE) AS h
        |  FROM trt JOIN r8 ON trt.prev = r8.state)
        |SELECT CAST(ns AS BIGINT) AS n_states,
        |  CAST(n_edges AS BIGINT) AS n_edges, n_transitions,
        |  ROUND(h, 6) AS entropy_rate_nats,
        |  ROUND(EXP(h), 4) AS perplexity
        |FROM red, ns""".stripMargin,
    "q378_seasonal_decompose" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |h2 AS (SELECT *, h % 24 AS hod FROM hourly),
        |grand AS (SELECT event_type, COUNT(*) AS n,
        |            CAST(SUM(c) AS BIGINT) AS sc FROM h2 GROUP BY 1),
        |cell AS (SELECT event_type, hod, COUNT(*) AS nc,
        |           CAST(SUM(c) AS BIGINT) AS scc FROM h2 GROUP BY 1, 2),
        |seas AS (
        |  SELECT cell.event_type, hod, nc,
        |    ROUND(CAST(scc AS DOUBLE) / CAST(nc AS DOUBLE)
        |      - CAST(sc AS DOUBLE) / CAST(n AS DOUBLE), 6) AS seasonal
        |  FROM cell JOIN grand ON cell.event_type = grand.event_type),
        |resid AS (
        |  SELECT h2.event_type,
        |    CAST(SUM(CAST(ROUND((CAST(c AS DOUBLE) - seasonal
        |        - CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(c AS DOUBLE) - seasonal
        |        - CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |      AS DECIMAL(28,6))) AS DOUBLE) AS ssr,
        |    COUNT(*) AS nh
        |  FROM h2
        |  JOIN seas ON h2.event_type = seas.event_type AND h2.hod = seas.hod
        |  JOIN grand ON h2.event_type = grand.event_type
        |  GROUP BY 1)
        |SELECT seas.event_type, CAST(hod AS BIGINT) AS hour_of_day,
        |  CAST(nc AS BIGINT) AS n_hours, seasonal,
        |  ROUND(SQRT(ssr / CAST(nh - 1 AS DOUBLE)), 6) AS residual_sd
        |FROM seas JOIN resid ON seas.event_type = resid.event_type
        |ORDER BY 1, 2""".stripMargin,
    "q380_capture_recapture" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t
        |  FROM events),
        |m AS (SELECT (MIN(t) + MAX(t)) // 2 AS mid FROM ev),
        |per AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN t < mid THEN 1 ELSE 0 END) AS s1,
        |    MAX(CASE WHEN t >= mid THEN 1 ELSE 0 END) AS s2
        |  FROM ev, m GROUP BY 1)
        |SELECT CAST(SUM(s1) AS BIGINT) AS n_first,
        |  CAST(SUM(s2) AS BIGINT) AS n_second,
        |  CAST(SUM(s1 * s2) AS BIGINT) AS n_both,
        |  CAST(COUNT(*) AS BIGINT) AS n_seen,
        |  ROUND(CAST(SUM(s1) + 1 AS DOUBLE) * CAST(SUM(s2) + 1 AS DOUBLE)
        |    / CAST(SUM(s1 * s2) + 1 AS DOUBLE)
        |    - CAST('1.0' AS DOUBLE), 2) AS chapman_estimate
        |FROM per""".stripMargin,
    "q381_haar_energy" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, c,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) - 1 AS r
        |  FROM hourly),
        |t AS (SELECT * FROM idx WHERE r < 256),
        |l1 AS (SELECT event_type,
        |    CAST(SUM(CASE WHEN r % 2 < 1 THEN c ELSE -c END) AS BIGINT)
        |      AS dcoef, COUNT(*) AS npts
        |  FROM t GROUP BY event_type, r // 2),
        |l2 AS (SELECT event_type,
        |    CAST(SUM(CASE WHEN r % 4 < 2 THEN c ELSE -c END) AS BIGINT)
        |      AS dcoef, COUNT(*) AS npts
        |  FROM t GROUP BY event_type, r // 4),
        |l3 AS (SELECT event_type,
        |    CAST(SUM(CASE WHEN r % 8 < 4 THEN c ELSE -c END) AS BIGINT)
        |      AS dcoef, COUNT(*) AS npts
        |  FROM t GROUP BY event_type, r // 8),
        |l4 AS (SELECT event_type,
        |    CAST(SUM(CASE WHEN r % 16 < 8 THEN c ELSE -c END) AS BIGINT)
        |      AS dcoef, COUNT(*) AS npts
        |  FROM t GROUP BY event_type, r // 16)
        |SELECT * FROM (
        |  SELECT event_type, CAST(1 AS BIGINT) AS level,
        |    CAST(2 AS BIGINT) AS scale_hours,
        |    CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(dcoef * dcoef) AS BIGINT) AS energy
        |  FROM l1 WHERE npts = 2 GROUP BY 1
        |  UNION ALL
        |  SELECT event_type, CAST(2 AS BIGINT), CAST(4 AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT), CAST(SUM(dcoef * dcoef) AS BIGINT)
        |  FROM l2 WHERE npts = 4 GROUP BY 1
        |  UNION ALL
        |  SELECT event_type, CAST(3 AS BIGINT), CAST(8 AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT), CAST(SUM(dcoef * dcoef) AS BIGINT)
        |  FROM l3 WHERE npts = 8 GROUP BY 1
        |  UNION ALL
        |  SELECT event_type, CAST(4 AS BIGINT), CAST(16 AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT), CAST(SUM(dcoef * dcoef) AS BIGINT)
        |  FROM l4 WHERE npts = 16 GROUP BY 1)
        |ORDER BY event_type, level""".stripMargin,
    "q382_ccf" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS c
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2),
        |a AS (SELECT h, c AS ca FROM hourly WHERE event_type = 'click'),
        |b AS (SELECT h AS hb, c AS cb FROM hourly
        |      WHERE event_type = 'purchase'),
        |lags AS (SELECT CAST(u.l AS BIGINT) AS lag
        |         FROM unnest(range(-12, 13)) u(l)),
        |mom AS (
        |  SELECT lag, COUNT(*) AS n,
        |    CAST(SUM(ca) AS BIGINT) AS sa, CAST(SUM(cb) AS BIGINT) AS sb,
        |    CAST(SUM(ca * ca) AS BIGINT) AS saa,
        |    CAST(SUM(cb * cb) AS BIGINT) AS sbb,
        |    CAST(SUM(ca * cb) AS BIGINT) AS sab
        |  FROM a CROSS JOIN lags JOIN b ON hb = a.h + lag
        |  GROUP BY 1)
        |SELECT lag AS lag_hours, CAST(n AS BIGINT) AS n_pairs,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |    / SQRT((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
        |        - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
        |        - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6) AS ccf
        |FROM mom ORDER BY lag_hours""".stripMargin,
    "q383_runs_test" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type, c AS med FROM (
        |    SELECT event_type, c,
        |      ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY c, h) AS rn,
        |      COUNT(*) OVER (PARTITION BY event_type) AS nn
        |    FROM hourly)
        |  WHERE rn = (nn + 1) // 2),
        |signs AS (
        |  SELECT hourly.event_type, h, c > med AS up,
        |    LAG(c > med) OVER (PARTITION BY hourly.event_type
        |      ORDER BY h) AS prev
        |  FROM hourly JOIN med ON hourly.event_type = med.event_type
        |  WHERE c <> med),
        |agg AS (
        |  SELECT * FROM (
        |    SELECT event_type,
        |      CAST(SUM(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |      CAST(SUM(CASE WHEN NOT up THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |      CAST(SUM(CASE WHEN prev IS NULL OR prev <> up THEN 1 ELSE 0 END)
        |        AS BIGINT) AS runs
        |    FROM signs GROUP BY 1)
        |  WHERE n1 >= 1 AND n2 >= 1 AND 2 * n1 * n2 > n1 + n2)
        |SELECT event_type, n1 AS n_above, n2 AS n_below, runs,
        |  ROUND(CAST('2.0' AS DOUBLE) * CAST(n1 AS DOUBLE)
        |    * CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
        |    + CAST('1.0' AS DOUBLE), 4) AS expected_runs,
        |  ROUND((CAST(runs AS DOUBLE)
        |      - (CAST('2.0' AS DOUBLE) * CAST(n1 AS DOUBLE)
        |        * CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
        |        + CAST('1.0' AS DOUBLE)))
        |    / SQRT(CAST('2.0' AS DOUBLE) * CAST(n1 AS DOUBLE)
        |      * CAST(n2 AS DOUBLE)
        |      * (CAST('2.0' AS DOUBLE) * CAST(n1 AS DOUBLE)
        |        * CAST(n2 AS DOUBLE) - CAST(n1 + n2 AS DOUBLE))
        |      / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
        |        * (CAST(n1 + n2 AS DOUBLE) - CAST('1.0' AS DOUBLE)))), 6)
        |    AS z,
        |  ABS(ROUND((CAST(runs AS DOUBLE)
        |      - (CAST('2.0' AS DOUBLE) * CAST(n1 AS DOUBLE)
        |        * CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
        |        + CAST('1.0' AS DOUBLE)))
        |    / SQRT(CAST('2.0' AS DOUBLE) * CAST(n1 AS DOUBLE)
        |      * CAST(n2 AS DOUBLE)
        |      * (CAST('2.0' AS DOUBLE) * CAST(n1 AS DOUBLE)
        |        * CAST(n2 AS DOUBLE) - CAST(n1 + n2 AS DOUBLE))
        |      / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
        |        * (CAST(n1 + n2 AS DOUBLE) - CAST('1.0' AS DOUBLE)))), 6))
        |    > CAST('1.96' AS DOUBLE) AS non_random
        |FROM agg ORDER BY event_type""".stripMargin,
    "q384_gumbel_return" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |daily AS (
        |  SELECT event_type, h // 24 AS day, MAX(c) AS mx
        |  FROM hourly GROUP BY 1, 2),
        |mom AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(mx) AS BIGINT) AS sm,
        |    CAST(SUM(mx * mx) AS BIGINT) AS smm
        |  FROM daily GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  ROUND(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE), 4)
        |    AS mean_daily_max,
        |  ROUND(SQRT((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE)
        |      * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |    * SQRT(CAST('6.0' AS DOUBLE)) / pi(), 4) AS gumbel_beta,
        |  ROUND(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |    - CAST('0.5772156649' AS DOUBLE)
        |      * (SQRT((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE)
        |          * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
        |          / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |        * SQRT(CAST('6.0' AS DOUBLE)) / pi()), 4) AS gumbel_mu,
        |  ROUND(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |    - CAST('0.5772156649' AS DOUBLE)
        |      * (SQRT((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE)
        |          * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
        |          / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |        * SQRT(CAST('6.0' AS DOUBLE)) / pi())
        |    - (SQRT((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE)
        |          * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
        |          / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |        * SQRT(CAST('6.0' AS DOUBLE)) / pi())
        |      * LN(-LN(CAST('1.0' AS DOUBLE)
        |        - CAST('1.0' AS DOUBLE) / CAST('30.0' AS DOUBLE))), 4)
        |    AS return_level_30d
        |FROM mom ORDER BY event_type""".stripMargin,
    "q367_periodogram" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |base AS (SELECT event_type, MIN(h) AS h0, COUNT(*) AS n
        |         FROM hourly GROUP BY 1),
        |pts AS (
        |  SELECT hourly.event_type, h - h0 AS t, c, n
        |  FROM hourly JOIN base ON hourly.event_type = base.event_type),
        |periods AS (SELECT CAST(u.p AS BIGINT) AS p
        |            FROM unnest(range(2, 25)) u(p)),
        |proj AS (
        |  SELECT event_type, p,
        |    SUM(CAST(ROUND(COS(CAST('2.0' AS DOUBLE) * pi()
        |        * CAST(t AS DOUBLE) / CAST(p AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) * CAST(c AS DECIMAL(10,0))) AS cs,
        |    SUM(CAST(ROUND(SIN(CAST('2.0' AS DOUBLE) * pi()
        |        * CAST(t AS DOUBLE) / CAST(p AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) * CAST(c AS DECIMAL(10,0))) AS sn,
        |    MAX(n) AS n
        |  FROM pts, periods GROUP BY 1, 2)
        |SELECT event_type, p AS period_hours,
        |  ROUND((CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
        |    + CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 4) AS power
        |FROM proj ORDER BY 1, 2""".stripMargin,
    "q368_ewma_control" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, h, c,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) - 1 AS r
        |  FROM hourly),
        |mom AS (
        |  SELECT event_type, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS sc,
        |    CAST(SUM(c * c) AS BIGINT) AS scc
        |  FROM hourly GROUP BY 1),
        |ew AS (
        |  SELECT b.event_type, b.h, b.r, b.c,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      POWER(CAST('0.8' AS DOUBLE), CAST(b.r - a.r AS DOUBLE))
        |      * (CASE WHEN a.r = 0 THEN CAST('1.0' AS DOUBLE)
        |         ELSE CAST('0.2' AS DOUBLE) END), 6) AS DECIMAL(18,6))
        |      * CAST(a.c AS DECIMAL(10,0))) AS DECIMAL(38,6)) AS DOUBLE)
        |      AS s
        |  FROM idx a JOIN idx b
        |    ON a.event_type = b.event_type AND a.r <= b.r
        |      AND b.r - a.r <= 80
        |  GROUP BY 1, 2, 3, 4)
        |SELECT ew.event_type, h, CAST(c AS BIGINT) AS c,
        |  ROUND(s, 6) AS ewma,
        |  ROUND(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)
        |    + CAST('3.0' AS DOUBLE)
        |      * SQRT((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE)
        |          * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |      * SQRT(CAST('0.2' AS DOUBLE) / CAST('1.8' AS DOUBLE)
        |        * (CAST('1.0' AS DOUBLE) - POWER(CAST('0.8' AS DOUBLE),
        |          CAST('2.0' AS DOUBLE) * CAST(r AS DOUBLE)))), 4) AS ucl,
        |  ROUND(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)
        |    - CAST('3.0' AS DOUBLE)
        |      * SQRT((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE)
        |          * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |      * SQRT(CAST('0.2' AS DOUBLE) / CAST('1.8' AS DOUBLE)
        |        * (CAST('1.0' AS DOUBLE) - POWER(CAST('0.8' AS DOUBLE),
        |          CAST('2.0' AS DOUBLE) * CAST(r AS DOUBLE)))), 4) AS lcl,
        |  (ROUND(s, 6) >
        |    ROUND(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)
        |      + CAST('3.0' AS DOUBLE)
        |        * SQRT((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE)
        |            * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
        |          / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |        * SQRT(CAST('0.2' AS DOUBLE) / CAST('1.8' AS DOUBLE)
        |          * (CAST('1.0' AS DOUBLE) - POWER(CAST('0.8' AS DOUBLE),
        |            CAST('2.0' AS DOUBLE) * CAST(r AS DOUBLE)))), 4))
        |  OR (ROUND(s, 6) <
        |    ROUND(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)
        |      - CAST('3.0' AS DOUBLE)
        |        * SQRT((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE)
        |            * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
        |          / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |        * SQRT(CAST('0.2' AS DOUBLE) / CAST('1.8' AS DOUBLE)
        |          * (CAST('1.0' AS DOUBLE) - POWER(CAST('0.8' AS DOUBLE),
        |            CAST('2.0' AS DOUBLE) * CAST(r AS DOUBLE)))), 4))
        |    AS out_of_control
        |FROM ew JOIN mom ON ew.event_type = mom.event_type
        |WHERE r > 0
        |ORDER BY ew.event_type, h""".stripMargin,
    "q371_markov_stationary" ->
      """WITH seq AS (
        |  SELECT event_type AS next,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch(date_trunc('second', ts)), event_id) AS prev
        |  FROM events),
        |tr AS (SELECT prev, next, COUNT(*) AS cnt FROM seq
        |       WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev, CAST(SUM(cnt) AS BIGINT) AS tot
        |        FROM tr GROUP BY 1),
        |trt AS MATERIALIZED (
        |  SELECT tr.prev, next, cnt, tot
        |  FROM tr JOIN tot ON tr.prev = tot.prev),
        |r0 AS (SELECT DISTINCT prev AS state, CAST(1000000 AS BIGINT) AS r
        |       FROM trt),
        |r1 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r0 JOIN trt ON r0.state = trt.prev GROUP BY 1),
        |r2 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r1 JOIN trt ON r1.state = trt.prev GROUP BY 1),
        |r3 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r2 JOIN trt ON r2.state = trt.prev GROUP BY 1),
        |r4 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r3 JOIN trt ON r3.state = trt.prev GROUP BY 1),
        |r5 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r4 JOIN trt ON r4.state = trt.prev GROUP BY 1),
        |r6 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r5 JOIN trt ON r5.state = trt.prev GROUP BY 1),
        |r7 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r6 JOIN trt ON r6.state = trt.prev GROUP BY 1),
        |r8 AS MATERIALIZED (
        |  SELECT next AS state, CAST(SUM((r * cnt) // tot) AS BIGINT) AS r
        |  FROM r7 JOIN trt ON r7.state = trt.prev GROUP BY 1)
        |SELECT state, r AS pi_micro FROM r8 ORDER BY state""".stripMargin,
    "q372_kendall_tau" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS c, SUM(CAST(value AS DECIMAL(18,4))) AS sv
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.event_type,
        |    CASE WHEN b.c - a.c > 0 THEN 1
        |         WHEN b.c - a.c < 0 THEN -1 ELSE 0 END AS sx,
        |    CASE WHEN CAST(b.sv AS DECIMAL(18,4)) * CAST(a.c AS DECIMAL(10,0))
        |        - CAST(a.sv AS DECIMAL(18,4)) * CAST(b.c AS DECIMAL(10,0)) > 0
        |      THEN 1
        |      WHEN CAST(b.sv AS DECIMAL(18,4)) * CAST(a.c AS DECIMAL(10,0))
        |        - CAST(a.sv AS DECIMAL(18,4)) * CAST(b.c AS DECIMAL(10,0)) < 0
        |      THEN -1 ELSE 0 END AS sy
        |  FROM hourly a JOIN hourly b
        |    ON a.event_type = b.event_type AND a.h < b.h),
        |agg AS (
        |  SELECT event_type, COUNT(*) AS n0,
        |    CAST(SUM(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS conc,
        |    CAST(SUM(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS disc,
        |    CAST(SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
        |    CAST(SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
        |  FROM pairs GROUP BY 1)
        |SELECT event_type, CAST(n0 AS BIGINT) AS n_pairs,
        |  conc AS concordant, disc AS discordant,
        |  ROUND(CAST(conc - disc AS DOUBLE)
        |    / SQRT(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)), 6)
        |    AS tau_b
        |FROM agg ORDER BY event_type""".stripMargin,
    "q267_seasonality_strength" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |hh AS (SELECT event_type, h, n, h % 24 AS hd FROM hourly),
        |prof AS (
        |  SELECT event_type, hd,
        |    CAST(ROUND(CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) AS s6
        |  FROM hh GROUP BY 1, 2),
        |j AS (
        |  SELECT hh.event_type, hh.n,
        |    CAST(hh.n AS DECIMAL(18,6)) - s6 AS r
        |  FROM hh JOIN prof ON hh.event_type = prof.event_type
        |    AND hh.hd = prof.hd),
        |a AS (
        |  SELECT event_type, COUNT(*) AS c,
        |    CAST(SUM(n) AS BIGINT) AS s1, CAST(SUM(n * n) AS BIGINT) AS s2,
        |    CAST(CAST(SUM(r) AS DECIMAL(38,6)) AS DOUBLE) AS rs1,
        |    CAST(CAST(SUM(CAST(r AS DECIMAL(19,6)) * r) AS DECIMAL(38,6))
        |      AS DOUBLE) AS rs2
        |  FROM j GROUP BY 1)
        |SELECT event_type, CAST(c AS BIGINT) AS n_hours,
        |  ROUND(CAST(s2 AS DOUBLE) / CAST(c AS DOUBLE)
        |    - (CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE))
        |      * (CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE)), 6) AS var_total,
        |  ROUND(rs2 / CAST(c AS DOUBLE)
        |    - (rs1 / CAST(c AS DOUBLE)) * (rs1 / CAST(c AS DOUBLE)), 6)
        |    AS var_resid,
        |  ROUND(GREATEST(CAST(0 AS DOUBLE), CAST(1 AS DOUBLE)
        |    - (rs2 / CAST(c AS DOUBLE)
        |       - (rs1 / CAST(c AS DOUBLE)) * (rs1 / CAST(c AS DOUBLE)))
        |      / (CAST(s2 AS DOUBLE) / CAST(c AS DOUBLE)
        |         - (CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE))
        |           * (CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE)))), 6)
        |    AS seasonal_strength
        |FROM a ORDER BY event_type""".stripMargin,
    "q290_ema_signal" -> emaOracleSql,
    "q321_trend_break" -> trendBreakSql,
    "q351_shapley_attribution" -> shapleySql,
    "q310_burstiness" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, COUNT(*) AS nh, SUM(c) AS s1, SUM(c * c) AS s2
        |  FROM hourly GROUP BY 1)
        |SELECT event_type, CAST(nh AS BIGINT) AS n_hours,
        |  ROUND(CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE), 6) AS mean_per_hour,
        |  ROUND((CAST(s2 AS DOUBLE) / CAST(nh AS DOUBLE)
        |         - (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE)))
        |        / (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE)), 6) AS fano,
        |  ROUND(SQRT(GREATEST(CAST(s2 AS DOUBLE) / CAST(nh AS DOUBLE)
        |         - (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE)), CAST(0.0 AS DOUBLE)))
        |        / (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE)), 6) AS cv,
        |  ROUND((SQRT(GREATEST(CAST(s2 AS DOUBLE) / CAST(nh AS DOUBLE)
        |         - (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE)), CAST(0.0 AS DOUBLE)))
        |         - CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE))
        |        / (SQRT(GREATEST(CAST(s2 AS DOUBLE) / CAST(nh AS DOUBLE)
        |         - (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE)), CAST(0.0 AS DOUBLE)))
        |         + CAST(s1 AS DOUBLE) / CAST(nh AS DOUBLE)), 6) AS burstiness
        |FROM m ORDER BY event_type""".stripMargin,
    "q256_bollinger_breakout" ->
      """WITH s AS (
        |  SELECT l_partkey, CAST(l_extendedprice AS DOUBLE) AS px,
        |    COUNT(*) OVER w AS n,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) OVER w
        |      AS DECIMAL(38,4)) AS DOUBLE) AS s1,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
        |        * CAST(l_extendedprice AS DECIMAL(12,4))) OVER w
        |      AS DECIMAL(38,4)) AS DOUBLE) AS s2
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_partkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |b AS (
        |  SELECT l_partkey, px,
        |    s1 / CAST(20 AS DOUBLE) AS mean,
        |    SQRT(GREATEST((s2 - s1 * s1 / CAST(20 AS DOUBLE))
        |      / CAST(19 AS DOUBLE), CAST(0 AS DOUBLE))) AS sd
        |  FROM s WHERE n = 20),
        |f AS (
        |  SELECT l_partkey,
        |    px > mean + CAST(2 AS DOUBLE) * sd AS up,
        |    px < mean - CAST(2 AS DOUBLE) * sd AS down
        |  FROM b)
        |SELECT p_brand,
        |  CAST(COUNT(*) AS BIGINT) AS evaluated,
        |  CAST(SUM(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS breakouts_up,
        |  CAST(SUM(CASE WHEN down THEN 1 ELSE 0 END) AS BIGINT) AS breakouts_down,
        |  ROUND(CAST(SUM(CASE WHEN up OR down THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS breakout_rate
        |FROM f JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q252_strict_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
        |  FROM events),
        |l AS (
        |  SELECT user_id, event_type, es,
        |    lag(event_type, 2) OVER w AS t1,
        |    lag(event_type, 1) OVER w AS t2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
        |hits AS (SELECT user_id, es FROM l
        |         WHERE t1 = 'view' AND t2 = 'click' AND event_type = 'purchase'),
        |pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_completions,
        |         CAST(MIN(es) AS BIGINT) AS first_completion_es
        |       FROM hits GROUP BY 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM pu)
        |SELECT user_id, n_completions, first_completion_es,
        |  n_users AS n_converting_users
        |FROM pu, t ORDER BY user_id""".stripMargin,
    "q246_conversion_latency" ->
      """WITH s AS (
        |  SELECT user_id,
        |    MIN(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS ts_s
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |p AS (
        |  SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_p
        |  FROM events WHERE event_type = 'purchase'),
        |de AS (
        |  SELECT s.user_id, ts_s, MIN(ts_p - ts_s) AS delay
        |  FROM s JOIN p ON s.user_id = p.user_id AND ts_p >= ts_s
        |  GROUP BY 1, 2),
        |co AS (SELECT user_id, ts_s // 604800 AS cohort, delay FROM de),
        |rk AS (
        |  SELECT cohort, delay,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY cohort
        |      ORDER BY delay, user_id) AS BIGINT) AS rn,
        |    COUNT(*) OVER (PARTITION BY cohort) AS n
        |  FROM co)
        |SELECT cohort, CAST(MAX(n) AS BIGINT) AS n_converted,
        |  CAST(MIN(CASE WHEN rn = (n * 50 + 99) // 100 THEN delay END) AS BIGINT)
        |    AS p50_delay_sec,
        |  CAST(MIN(CASE WHEN rn = (n * 90 + 99) // 100 THEN delay END) AS BIGINT)
        |    AS p90_delay_sec
        |FROM rk GROUP BY 1 ORDER BY cohort""".stripMargin,
    "q243_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
        |  FROM events),
        |isl AS (
        |  SELECT user_id, day,
        |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
        |  FROM days),
        |runs AS (
        |  SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len,
        |    MIN(day) AS start_day
        |  FROM isl GROUP BY 1, 2),
        |best AS (
        |  SELECT user_id, len, start_day, ROW_NUMBER() OVER (
        |    PARTITION BY user_id ORDER BY len DESC, start_day DESC) AS rn
        |  FROM runs)
        |SELECT r.user_id, CAST(COUNT(*) AS BIGINT) AS n_streaks,
        |  CAST(SUM(r.len) AS BIGINT) AS n_active_days,
        |  CAST(MAX(b.len) AS BIGINT) AS longest_streak,
        |  CAST(MAX(b.start_day) AS BIGINT) AS longest_start_day
        |FROM runs r JOIN (SELECT * FROM best WHERE rn = 1) b
        |  ON r.user_id = b.user_id
        |GROUP BY 1 ORDER BY r.user_id""".stripMargin,
    "q244_max_drawdown" ->
      """WITH f AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
        |    CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,4))
        |         ELSE -CAST(value AS DECIMAL(18,4)) END AS flow
        |  FROM events WHERE event_type IN ('purchase', 'error')),
        |c1 AS (
        |  SELECT user_id, event_id, es, SUM(flow) OVER w AS cum
        |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |c AS (
        |  SELECT user_id, event_id, es, cum,
        |    MAX(cum) OVER (PARTITION BY user_id ORDER BY es, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM c1),
        |dd AS (SELECT user_id, es, cum, peak, peak - cum AS dd FROM c),
        |pick AS (
        |  SELECT user_id, es, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY dd DESC, es) AS rn
        |  FROM dd)
        |SELECT dd.user_id, CAST(COUNT(*) AS BIGINT) AS n_flows,
        |  ROUND(CAST(MAX(cum) AS DOUBLE), 4) AS peak_balance,
        |  ROUND(CAST(MAX(dd.dd) AS DOUBLE), 4) AS max_drawdown,
        |  CAST(MAX(p.es) AS BIGINT) AS trough_es
        |FROM dd JOIN (SELECT * FROM pick WHERE rn = 1) p
        |  ON dd.user_id = p.user_id
        |GROUP BY 1 ORDER BY dd.user_id""".stripMargin,
    "q241_forward_fill" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(value AS DECIMAL(18,4)) AS v,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
        |  FROM events),
        |daily AS (
        |  SELECT user_id, day, v FROM (
        |    SELECT user_id, day, v, ROW_NUMBER() OVER (
        |      PARTITION BY user_id, day ORDER BY es DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1),
        |span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        |         FROM daily GROUP BY 1),
        |grid AS (SELECT user_id, u.day FROM span,
        |         UNNEST(generate_series(d0, d1)) AS u(day)),
        |f AS (
        |  SELECT grid.user_id, grid.day, daily.v,
        |    last_value(daily.v IGNORE NULLS) OVER (PARTITION BY grid.user_id
        |      ORDER BY grid.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |  FROM grid LEFT JOIN daily
        |    ON grid.user_id = daily.user_id AND grid.day = daily.day)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_observed,
        |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
        |  ROUND(CAST(arg_max(filled, day) AS DOUBLE), 4) AS final_value
        |FROM f GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q242_nearest_asof" ->
      """WITH er AS (
        |  SELECT user_id, event_id AS error_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS te
        |  FROM events WHERE event_type = 'error'),
        |pu AS (
        |  SELECT user_id, event_id AS match_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tp
        |  FROM events WHERE event_type = 'purchase'),
        |cands AS (
        |  SELECT er.error_id, pu.match_id, pu.tp - er.te AS delta_sec,
        |    ROW_NUMBER() OVER (PARTITION BY er.error_id
        |      ORDER BY ABS(pu.tp - er.te), pu.tp, pu.match_id) AS rn
        |  FROM er JOIN pu ON er.user_id = pu.user_id
        |    AND ABS(pu.tp - er.te) <= 1800)
        |SELECT er.error_id, c.match_id, c.delta_sec
        |FROM er LEFT JOIN (SELECT * FROM cands WHERE rn = 1) c
        |  ON er.error_id = c.error_id
        |ORDER BY er.error_id""".stripMargin,
    "q236_seasonal_naive_eval" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |hz AS (SELECT MAX(h) AS hmax FROM hourly),
        |tr AS (
        |  SELECT event_type, h % 24 AS hod,
        |    CAST(SUM(n) AS BIGINT) AS ts, COUNT(*) AS tc
        |  FROM hourly, hz WHERE h <= hmax - 24 GROUP BY 1, 2),
        |ev AS (SELECT event_type, h % 24 AS hod, n
        |       FROM hourly, hz WHERE h > hmax - 24),
        |j AS (
        |  SELECT ev.event_type, ev.n,
        |    CASE WHEN COALESCE(tc, 0) = 0 THEN 0.0
        |         ELSE CAST(ts AS DOUBLE) / CAST(tc AS DOUBLE) END AS pred
        |  FROM ev LEFT JOIN tr
        |    ON ev.event_type = tr.event_type AND ev.hod = tr.hod),
        |t AS (
        |  SELECT event_type,
        |    CAST(ROUND(ABS(CAST(n AS DOUBLE) - pred), 6) AS DECIMAL(18,6)) AS ae,
        |    CAST(ROUND(CAST(n AS DOUBLE) - pred, 6) AS DECIMAL(18,6)) AS se
        |  FROM j)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |  ROUND(CAST(SUM(ae) AS DOUBLE) / COUNT(*), 4) AS mae,
        |  ROUND(CAST(SUM(se) AS DOUBLE) / COUNT(*), 4) AS bias
        |FROM t GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q233_bitmap_overlap" ->
      """WITH su AS (SELECT DISTINCT event_type AS seg, user_id FROM events),
        |sz AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS nu FROM su GROUP BY 1),
        |iv AS (
        |  SELECT a.seg AS sa, b.seg AS sb, CAST(COUNT(*) AS BIGINT) AS n_both
        |  FROM su a JOIN su b ON a.user_id = b.user_id AND a.seg < b.seg
        |  GROUP BY 1, 2)
        |SELECT sa, sb, x.nu AS na, y.nu AS nb, n_both,
        |  ROUND(CAST(n_both AS DOUBLE) / CAST(x.nu + y.nu - n_both AS DOUBLE), 6)
        |    AS jaccard
        |FROM iv JOIN sz x ON sa = x.seg JOIN sz y ON sb = y.seg
        |ORDER BY sa, sb""".stripMargin,
    "q226_max_concurrency" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, es,
        |    CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
        |s AS (
        |  SELECT user_id, es,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY es, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f),
        |sess AS (SELECT user_id, sid, MIN(es) AS st, MAX(es) AS en
        |         FROM s GROUP BY 1, 2),
        |segs AS (
        |  SELECT u.day, GREATEST(st, u.day * 86400) AS t0,
        |         LEAST(en, u.day * 86400 + 86399) AS t1
        |  FROM sess, UNNEST(generate_series(st // 86400, en // 86400)) AS u(day)),
        |pts AS (
        |  SELECT day, t0 AS t, CAST(1 AS BIGINT) AS delta FROM segs
        |  UNION ALL
        |  SELECT day, t1 + 1, -1 FROM segs WHERE t1 < day * 86400 + 86399),
        |c AS (
        |  SELECT day, delta,
        |    SUM(delta) OVER (PARTITION BY day ORDER BY t, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM pts)
        |SELECT day,
        |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  CAST(MAX(cum) AS BIGINT) AS max_concurrency
        |FROM c GROUP BY day ORDER BY day""".stripMargin,
    "q227_sax_motifs" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
        |    CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events),
        |r AS (
        |  SELECT user_id, v,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY es, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM e),
        |f AS (SELECT user_id, v, ((rn - 1) * 8) // n AS seg FROM r WHERE n >= 8),
        |sg AS (
        |  SELECT user_id, seg,
        |    CAST(ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 3) AS DECIMAL(12,3)) AS m3
        |  FROM f GROUP BY 1, 2),
        |st AS (
        |  SELECT user_id,
        |    CAST(CAST(SUM(m3) AS DECIMAL(38,3)) AS DOUBLE) AS s1,
        |    CAST(CAST(SUM(m3 * m3) AS DECIMAL(38,6)) AS DOUBLE) AS s2
        |  FROM sg GROUP BY 1),
        |z AS (
        |  SELECT sg.user_id, sg.seg,
        |    CASE WHEN s2 / 8 - (s1 / 8) * (s1 / 8) <= 0 THEN 0.0
        |         ELSE ROUND((CAST(m3 AS DOUBLE) - s1 / 8)
        |           / sqrt(s2 / 8 - (s1 / 8) * (s1 / 8)), 4) END AS z
        |  FROM sg JOIN st ON sg.user_id = st.user_id),
        |sym AS (
        |  SELECT user_id, seg,
        |    CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0 THEN 'b'
        |         WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS sy
        |  FROM z),
        |words AS (
        |  SELECT user_id, STRING_AGG(sy, '' ORDER BY seg) AS word
        |  FROM sym GROUP BY 1)
        |SELECT word, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM words GROUP BY 1
        |ORDER BY n_users DESC, word LIMIT 15""".stripMargin,
    "q212_survivorship" ->
      """WITH rec AS (
        |  SELECT o_custkey, o_orderstatus AS last_status,
        |    CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS last_order_date,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders),
        |freq AS (
        |  SELECT o_custkey, o_orderpriority, COUNT(*) AS c FROM orders
        |  GROUP BY 1, 2),
        |md AS (
        |  SELECT o_custkey, o_orderpriority AS mode_priority,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY c DESC, o_orderpriority) AS rn
        |  FROM freq),
        |ext AS (
        |  SELECT o_custkey,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS first_order_date,
        |    ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4)
        |      AS total_spend,
        |    ROUND(CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4)
        |      AS max_order
        |  FROM orders GROUP BY 1)
        |SELECT ext.o_custkey, n_orders, first_order_date, last_order_date,
        |  last_status, mode_priority, total_spend, max_order
        |FROM ext
        |JOIN (SELECT * FROM rec WHERE rn = 1) r ON r.o_custkey = ext.o_custkey
        |JOIN (SELECT * FROM md WHERE rn = 1) m ON m.o_custkey = ext.o_custkey
        |ORDER BY ext.o_custkey""".stripMargin,
    "q206_cohort_ltv" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(value AS DECIMAL(18,4)) AS v,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 604800 AS wk
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, MIN(wk) AS cw FROM e WHERE event_type = 'signup'
        |  GROUP BY user_id),
        |sizes AS (SELECT cw, COUNT(*) AS cohort_users FROM cohort GROUP BY cw),
        |rev AS (
        |  SELECT c.cw, e.wk - c.cw AS age, SUM(e.v) AS wk_rev
        |  FROM e JOIN cohort c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.wk >= c.cw
        |  GROUP BY c.cw, e.wk - c.cw),
        |cum AS (
        |  SELECT cw, age, wk_rev,
        |    SUM(wk_rev) OVER (PARTITION BY cw ORDER BY age
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
        |  FROM rev)
        |SELECT cum.cw AS cohort_week, age,
        |  CAST(wk_rev AS DOUBLE) AS wk_rev,
        |  CAST(cum_rev AS DOUBLE) AS cum_rev,
        |  cohort_users,
        |  ROUND(CAST(cum_rev AS DOUBLE) / CAST(cohort_users AS DOUBLE), 6) AS ltv_per_user
        |FROM cum JOIN sizes ON cum.cw = sizes.cw
        |ORDER BY cohort_week, age""".stripMargin,
    "q207_rfm" ->
      """WITH per AS (
        |  SELECT user_id,
        |    20000 - MAX(CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400) AS rec,
        |    COUNT(*) AS freq,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS mon
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |cuts AS (
        |  SELECT
        |    ROUND(percentile_cont(0.2) WITHIN GROUP (ORDER BY rec), 4) AS r1,
        |    ROUND(percentile_cont(0.4) WITHIN GROUP (ORDER BY rec), 4) AS r2,
        |    ROUND(percentile_cont(0.6) WITHIN GROUP (ORDER BY rec), 4) AS r3,
        |    ROUND(percentile_cont(0.8) WITHIN GROUP (ORDER BY rec), 4) AS r4,
        |    ROUND(percentile_cont(0.2) WITHIN GROUP (ORDER BY freq), 4) AS f1,
        |    ROUND(percentile_cont(0.4) WITHIN GROUP (ORDER BY freq), 4) AS f2,
        |    ROUND(percentile_cont(0.6) WITHIN GROUP (ORDER BY freq), 4) AS f3,
        |    ROUND(percentile_cont(0.8) WITHIN GROUP (ORDER BY freq), 4) AS f4,
        |    ROUND(percentile_cont(0.2) WITHIN GROUP (ORDER BY mon), 4) AS m1,
        |    ROUND(percentile_cont(0.4) WITHIN GROUP (ORDER BY mon), 4) AS m2,
        |    ROUND(percentile_cont(0.6) WITHIN GROUP (ORDER BY mon), 4) AS m3,
        |    ROUND(percentile_cont(0.8) WITHIN GROUP (ORDER BY mon), 4) AS m4
        |  FROM per)
        |SELECT user_id, rec, freq, mon,
        |  CAST(r_score_i AS BIGINT) AS r_score,
        |  CAST(f_score_i AS BIGINT) AS f_score,
        |  CAST(m_score_i AS BIGINT) AS m_score
        |FROM (
        |SELECT user_id, rec, freq, ROUND(mon, 4) AS mon,
        |  6 - (1 + CASE WHEN CAST(rec AS DOUBLE) > r1 THEN 1 ELSE 0 END
        |         + CASE WHEN CAST(rec AS DOUBLE) > r2 THEN 1 ELSE 0 END
        |         + CASE WHEN CAST(rec AS DOUBLE) > r3 THEN 1 ELSE 0 END
        |         + CASE WHEN CAST(rec AS DOUBLE) > r4 THEN 1 ELSE 0 END) AS r_score_i,
        |  1 + CASE WHEN CAST(freq AS DOUBLE) > f1 THEN 1 ELSE 0 END
        |    + CASE WHEN CAST(freq AS DOUBLE) > f2 THEN 1 ELSE 0 END
        |    + CASE WHEN CAST(freq AS DOUBLE) > f3 THEN 1 ELSE 0 END
        |    + CASE WHEN CAST(freq AS DOUBLE) > f4 THEN 1 ELSE 0 END AS f_score_i,
        |  1 + CASE WHEN mon > m1 THEN 1 ELSE 0 END
        |    + CASE WHEN mon > m2 THEN 1 ELSE 0 END
        |    + CASE WHEN mon > m3 THEN 1 ELSE 0 END
        |    + CASE WHEN mon > m4 THEN 1 ELSE 0 END AS m_score_i
        |FROM per, cuts)
        |ORDER BY user_id""".stripMargin,
    "q202_twap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(value AS DECIMAL(18,4)) AS v,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
        |    CAST(CAST(date_trunc('second', ts) AS DATE) AS VARCHAR) AS day
        |  FROM events),
        |r AS (
        |  SELECT *, lead(es) OVER (PARTITION BY user_id, day
        |    ORDER BY es, event_id) - es AS dt
        |  FROM e)
        |SELECT user_id, day, COUNT(*) AS n_intervals,
        |  CAST(SUM(dt) AS BIGINT) AS total_dt,
        |  ROUND(CAST(CAST(SUM(v * dt) AS DECIMAL(38,4)) AS DOUBLE)
        |        / CAST(CAST(SUM(dt) AS BIGINT) AS DOUBLE), 6) AS twap
        |FROM r WHERE dt IS NOT NULL
        |GROUP BY user_id, day HAVING SUM(dt) > 0
        |ORDER BY user_id, day""".stripMargin,
    "q203_clamped_balance" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT), event_id) AS rn,
        |    CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,4))
        |         ELSE -CAST(value AS DECIMAL(18,4)) END AS delta
        |  FROM events WHERE event_type IN ('purchase', 'error')),
        |m AS (SELECT user_id, MAX(rn) AS mx FROM e GROUP BY user_id),
        |r(user_id, rn, bal, hits) AS (
        |  SELECT user_id, CAST(0 AS BIGINT), CAST(0 AS DECIMAL(18,4)), CAST(0 AS BIGINT)
        |  FROM m
        |  UNION ALL
        |  SELECT r.user_id, r.rn + 1,
        |    CAST(CASE WHEN r.bal + e.delta < 0 THEN 0
        |              ELSE r.bal + e.delta END AS DECIMAL(18,4)),
        |    r.hits + CASE WHEN r.bal + e.delta < 0 THEN 1 ELSE 0 END
        |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        |SELECT r.user_id, CAST(r.bal AS DOUBLE) AS final_balance,
        |  CAST(r.hits AS BIGINT) AS floor_hits
        |FROM r JOIN m ON r.user_id = m.user_id AND r.rn = m.mx
        |ORDER BY r.user_id""".stripMargin,
    "q198_changepoint" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS v, COUNT(*) AS t
        |  FROM hourly GROUP BY 1),
        |cus AS (
        |  SELECT hourly.event_type, h, t, v,
        |    t * SUM(n) OVER (PARTITION BY hourly.event_type ORDER BY h
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - (COUNT(*) OVER (PARTITION BY hourly.event_type ORDER BY h
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * v AS cusum
        |  FROM hourly JOIN tot ON hourly.event_type = tot.event_type),
        |r AS (
        |  SELECT event_type, h, cusum, t, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ABS(cusum) DESC, h) AS rn
        |  FROM cus)
        |SELECT event_type, h AS cp_hour, CAST(cusum AS BIGINT) AS cusum,
        |  t AS n_hours, v AS total
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q199_path_trigrams" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
        |    THEN 1 ELSE 0 END AS newSess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
        |g AS (
        |  SELECT *, SUM(newSess) OVER (PARTITION BY user_id ORDER BY es, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM f),
        |t AS (
        |  SELECT lag(event_type, 2) OVER ws AS t2, lag(event_type, 1) OVER ws AS t1,
        |    event_type AS t0
        |  FROM g WINDOW ws AS (PARTITION BY user_id, sess ORDER BY es, event_id))
        |SELECT t2 || '>' || t1 || '>' || t0 AS path, COUNT(*) AS cnt
        |FROM t WHERE t2 IS NOT NULL
        |GROUP BY 1 ORDER BY cnt DESC, path LIMIT 20""".stripMargin,
    "q195_ts_features" ->
      s"""WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
        |    value, CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, es, value,
        |    lag(value, 1) OVER w AS lag1,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id
        |        ORDER BY es, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |      / COUNT(*) OVER (PARTITION BY user_id ORDER BY es, event_id
        |        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS roll4,
        |    CAST($ewmaNumSql AS BIGINT) AS ewma_num,
        |    CAST($ewmaDenSql AS BIGINT) AS ewma_den
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id))
        |SELECT user_id, event_id, es, value, lag1, roll4, ewma_num, ewma_den,
        |  ROUND(CAST(ewma_num AS DOUBLE) / CAST(ewma_den AS DOUBLE) / 100.0, 6) AS ewma
        |FROM f ORDER BY user_id, es, event_id""".stripMargin,
    "q184_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(value AS DECIMAL(18,4)) AS v,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
        |  FROM events),
        |r AS (
        |  SELECT *, SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY es, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ep
        |  FROM e),
        |t AS (
        |  SELECT user_id, ep, event_type,
        |    row_number() OVER (PARTITION BY user_id, ep ORDER BY es, event_id) AS rf,
        |    row_number() OVER (PARTITION BY user_id, ep ORDER BY es DESC, event_id DESC) AS rl
        |  FROM r WHERE event_type <> 'purchase'),
        |p AS (SELECT user_id, ep - 1 AS ep, v FROM r WHERE event_type = 'purchase'),
        |ft AS (
        |  SELECT t.event_type AS channel, COUNT(*) AS first_convs,
        |    CAST(SUM(p.v) AS DOUBLE) AS first_value
        |  FROM p JOIN t ON p.user_id = t.user_id AND p.ep = t.ep AND t.rf = 1
        |  GROUP BY 1),
        |lt AS (
        |  SELECT t.event_type AS channel, COUNT(*) AS last_convs,
        |    CAST(SUM(p.v) AS DOUBLE) AS last_value
        |  FROM p JOIN t ON p.user_id = t.user_id AND p.ep = t.ep AND t.rl = 1
        |  GROUP BY 1)
        |SELECT COALESCE(ft.channel, lt.channel) AS channel,
        |  COALESCE(first_convs, 0) AS first_convs,
        |  COALESCE(first_value, 0.0) AS first_value,
        |  COALESCE(last_convs, 0) AS last_convs,
        |  COALESCE(last_value, 0.0) AS last_value
        |FROM ft FULL OUTER JOIN lt ON ft.channel = lt.channel
        |ORDER BY channel""".stripMargin,
    "q185_markov_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
        |  FROM events),
        |t AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY es, event_id) AS prev,
        |    event_type AS next
        |  FROM e),
        |c AS (SELECT prev, next, COUNT(*) AS cnt FROM t WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev, CAST(SUM(cnt) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.prev, c.next, c.cnt, tot.tot,
        |  ROUND(CAST(c.cnt AS DOUBLE) / CAST(tot.tot AS DOUBLE), 6) AS p
        |FROM c JOIN tot ON c.prev = tot.prev
        |ORDER BY c.prev, c.next""".stripMargin,
    "q174_resample_interpolate" ->
      """WITH e AS (SELECT user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
        |    value, 0 AS is_grid, event_id AS eid FROM events),
        |b AS (SELECT user_id,
        |        MIN(es) + (3600 - MIN(es) % 3600) % 3600 AS lo_c,
        |        MAX(es) - MAX(es) % 3600 AS hi_f
        |      FROM e GROUP BY 1),
        |g AS (SELECT user_id, u.es AS es, CAST(NULL AS DOUBLE) AS value,
        |        1 AS is_grid, CAST(0 AS BIGINT) AS eid
        |      FROM b, unnest(range(lo_c, hi_f + 1, 3600)) AS u(es)
        |      WHERE lo_c <= hi_f),
        |un AS (SELECT * FROM e UNION ALL SELECT * FROM g),
        |wn AS (SELECT user_id, es, is_grid,
        |        last_value(CASE WHEN is_grid = 0 THEN es END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY es, is_grid, eid
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
        |        last_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY es, is_grid, eid
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
        |        first_value(CASE WHEN is_grid = 0 THEN es END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY es, is_grid, eid
        |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS tn,
        |        first_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY es, is_grid, eid
        |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS vn
        |       FROM un)
        |SELECT user_id, es AS grid_es,
        |  CAST(floor((vp + (vn - vp) * (CAST(es - tp AS DOUBLE) / (tn - tp)))
        |    * 1000000) AS BIGINT) AS v_micro
        |FROM wn WHERE is_grid = 1 AND tp IS NOT NULL AND tn IS NOT NULL
        |ORDER BY user_id, grid_es""".stripMargin,
    "q170_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |             date_trunc('second', ts) AS ts2 FROM events),
        |c AS (SELECT *, lag(event_type) OVER
        |        (PARTITION BY user_id ORDER BY ts2, event_id) AS prev FROM e),
        |ch AS (SELECT user_id, event_id, event_type, ts2 FROM c
        |       WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts2, event_id)
        |    AS BIGINT) AS version,
        |  event_type,
        |  CAST(ts2 AS VARCHAR) AS valid_from,
        |  CAST(lead(ts2) OVER (PARTITION BY user_id ORDER BY ts2, event_id)
        |    AS VARCHAR) AS valid_to
        |FROM ch ORDER BY user_id, version""".stripMargin,
    "q85_map_funcs" ->
      """WITH h AS (
        |  SELECT event_type, CAST(hour(date_trunc('second', ts)) AS BIGINT) AS hr, COUNT(*) AS c
        |  FROM events GROUP BY event_type, hr),
        |m AS (
        |  SELECT event_type,
        |    map_from_entries(list_sort(list((hr, c)))) AS hm
        |  FROM h GROUP BY event_type)
        |SELECT event_type,
        |  CAST(cardinality(hm) AS BIGINT) AS n_keys,
        |  CAST(coalesce(map_extract(hm, 9)[1], 0) AS BIGINT) AS c9,
        |  CAST(coalesce(map_extract(hm, 21)[1], 0) AS BIGINT) AS c21,
        |  CAST(list_min(map_keys(hm)) AS BIGINT) AS first_hr,
        |  CAST(list_max(map_values(hm)) AS BIGINT) AS max_c
        |FROM m ORDER BY event_type""".stripMargin,
    "q76_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
        |  FROM events),
        |v AS (SELECT user_id, MIN(es) AS ves FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(es) AS ces FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND es >= ves GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(es) AS pes FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND es >= ces GROUP BY e.user_id),
        |st AS (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS name, user_id FROM v
        |  UNION ALL SELECT 2, 'click', user_id FROM c
        |  UNION ALL SELECT 3, 'purchase', user_id FROM p)
        |SELECT stage, name, COUNT(DISTINCT user_id) AS n_users
        |FROM st GROUP BY stage, name ORDER BY stage""".stripMargin,
    "q75_retention" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS hr
        |  FROM events),
        |f AS (SELECT user_id, MIN(hr) AS cohort_hr FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, hr FROM e)
        |SELECT cohort_hr, hr - cohort_hr AS age_hours,
        |  COUNT(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY cohort_hr, age_hours
        |ORDER BY cohort_hr, age_hours""".stripMargin,
    "q08_range_join" ->
      """SELECT e1.event_id AS id1, e2.event_id AS id2
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND date_trunc('second', e2.ts) > date_trunc('second', e1.ts)
        | AND date_trunc('second', e2.ts) <= date_trunc('second', e1.ts) + INTERVAL 5 MINUTE
        |ORDER BY id1, id2""".stripMargin,
    "q09_asof_join" ->
      """SELECT event_id, user_id,
        |  CAST(ts2 AS VARCHAR) AS purchase_ts, CAST(signup_ts AS VARCHAR) AS signup_ts
        |FROM (
        |  SELECT event_id, user_id, event_type, date_trunc('second', ts) AS ts2,
        |    last_value(CASE WHEN event_type = 'signup' THEN date_trunc('second', ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY date_trunc('second', ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS signup_ts
        |  FROM events WHERE event_type IN ('signup', 'purchase'))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q11_distinct_agg" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS uniq_users, COUNT(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q99_hourly_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS n
        |  FROM events GROUP BY event_type, h),
        |st AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS s1,
        |    CAST(SUM(n * n) AS BIGINT) AS s2, COUNT(*) AS cnt
        |  FROM hourly GROUP BY event_type)
        |SELECT h.event_type, h.h, h.n,
        |  ROUND((CAST(h.n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE))
        |    / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE))
        |           / (CAST(cnt AS DOUBLE) - 1)), 6) AS z
        |FROM hourly h JOIN st USING (event_type)
        |WHERE (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE))
        |      / (CAST(cnt AS DOUBLE) - 1) > 0
        |ORDER BY abs(z) DESC, h.event_type, h.h LIMIT 20""".stripMargin,
    "q97_sliding_distinct" ->
      """WITH b AS (
        |  SELECT DISTINCT event_type, user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h
        |  FROM events),
        |x AS (
        |  SELECT DISTINCT event_type, user_id, u.wh
        |  FROM b, unnest(range(h, h + 6)) AS u(wh))
        |SELECT event_type, wh, COUNT(*) AS uniq_users
        |FROM x GROUP BY event_type, wh ORDER BY event_type, wh""".stripMargin,
    "q94_asof_forward" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
        |  FROM events WHERE event_type IN ('signup', 'purchase')),
        |f AS (
        |  SELECT event_id, user_id, event_type, es,
        |    first_value(CASE WHEN event_type = 'purchase' THEN es END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY es, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np
        |  FROM e)
        |SELECT event_id, user_id, es AS signup_es,
        |  CASE WHEN np <= es + 3600 THEN np END AS purchase_es,
        |  CASE WHEN np <= es + 3600 THEN np END - es AS gap_sec
        |FROM f WHERE event_type = 'signup' ORDER BY event_id""".stripMargin,
    "q14_grouping_sets" ->
      """SELECT event_type, CAST(date_trunc('hour', ts) AS VARCHAR) AS h,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  CAST(GROUPING(event_type) AS BIGINT) AS g_t,
        |  CAST(GROUPING(CAST(date_trunc('hour', ts) AS VARCHAR)) AS BIGINT) AS g_h
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (event_type, CAST(date_trunc('hour', ts) AS VARCHAR)), ())
        |ORDER BY g_t, g_h, event_type ASC NULLS FIRST, h ASC NULLS FIRST""".stripMargin,
    "q25_json" ->
      """SELECT event_type,
        |  CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k,
        |  CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q31's session derivation; unique event_id totally orders each
    // session, so string_agg(ORDER BY es, event_id) ≡ Spark's post-collect
    // array_sort on (es, event_id, event_type) structs
    "q132_trajectory_assembly" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, event_type, es,
        |    CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
        |s AS (
        |  SELECT user_id, event_id, event_type, es,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY es, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  COUNT(*) AS n_events, MAX(es) - MIN(es) AS len_sec,
        |  string_agg(event_type, ' ' ORDER BY es, event_id) AS trajectory
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q31_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, es,
        |    CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
        |s AS (
        |  SELECT user_id, es,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY es, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM f),
        |g AS (
        |  SELECT user_id, session_id, MAX(es) - MIN(es) AS len_sec
        |  FROM s GROUP BY user_id, session_id)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(SUM(len_sec) AS DOUBLE) / COUNT(*) AS avg_len_sec
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q32_tumbling" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS h, event_type,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin,
    "q33_sliding" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4)))
        |    OVER (PARTITION BY user_id ORDER BY CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |          RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_sum
        |FROM events ORDER BY event_id""".stripMargin)
}
