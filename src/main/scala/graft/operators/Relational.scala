package graft.operators

import graft.{Dsl, Tables}
import graft.Dsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational surface: scans, joins, aggregates, windows, set ops
  * (SURVEY.md §2.3 Q01-Q07, Q10-Q13, Q15-Q20, Q22-Q23).
  *
  * Every query is a pure function of (session, data dir) that declares a
  * Catalyst logical plan; no driver-side collects anywhere, so every plan
  * scales with executors. Dimension tables are broadcast explicitly; fact-fact
  * joins are left to Catalyst + AQE (sort-merge with runtime skew handling).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** Q01: scan + projection + filter — pushed down to the parquet scan. */
  def q01ScanFilter: Q = (s, d) => {
    Tables(s, d, "lineitem")
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"), big(col("l_linenumber")).as("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Q02: string predicates (LIKE / upper / prefix) — pushable to the scan. */
  def q02StringPred: Q = (s, d) => {
    Tables(s, d, "part")
      .filter(col("p_name").contains("red") && upper(col("p_type")).startsWith("S"))
      .select(col("p_partkey"), col("p_name"), col("p_type"))
      .orderBy(col("p_partkey"))
  }

  /** Q03: 2-way inner equi-join + aggregate. Customer is the small side —
    * broadcast so the orders scan never shuffles.
    */
  def q03JoinAgg: Q = (s, d) => {
    val orders = Tables(s, d, "orders")
    val customer = Tables(s, d, "customer")
    orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("order_cnt"), moneySum(col("o_totalprice")).as("total_price"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q164: co-located fact-fact join over BUCKETED tables — the layout
    * investment that removes the shuffle q04 pays on lineitem⋈orders. Both
    * sides are written `bucketBy(8, key).sortBy(key)` as managed tables
    * (one shuffle each, paid ONCE at ingest), then the join reads
    * pre-partitioned buckets: sort-merge with NO exchange on either side —
    * at 100 TB the join cost is a co-partitioned streamed merge, and every
    * later join on the same key rides the same layout for free. (The
    * per-side Sort nodes survive — Spark ≥3.0 only propagates bucket sort
    * order under a legacy flag — but over one pre-sorted file per bucket
    * they are near-no-op local sorts; the ELIMINATED shuffle is the cost
    * that matters.) BucketingSpec pins the exchange-free plan; the oracle
    * pins that the layout changes nothing semantically. Tables live in the
    * session warehouse under fixed names and are overwritten per run
    * (idempotent re-ingest, the q90 upsert discipline).
    */
  def q164BucketedJoin: Q = (s, d) => {
    // the default catalog is in-memory: a PREVIOUS JVM's table dirs survive
    // in the warehouse while its catalog entries don't, so clear both
    Seq("graft_li_bucketed", "graft_o_bucketed").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val dir = java.nio.file.Paths.get(wh).resolve(t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    // repartition by the bucket key first: one file per bucket, so the scan
    // is both co-partitioned AND per-bucket sorted (no small files, and the
    // join needs neither exchange nor sort)
    Tables(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .repartition(8, col("l_orderkey"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_li_bucketed")
    Tables(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .repartition(8, col("o_orderkey"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_o_bucketed")
    s.table("graft_li_bucketed")
      .join(s.table("graft_o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sumExactDouble(revenueTerm(col("l_extendedprice"), col("l_discount")))
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q171: salted skew JOIN — q61's two-phase salting applied to the join
    * side of the problem: the events fact table concentrates on few hot
    * user_ids (~67 events/user at sf0.01, arbitrarily hot in production),
    * so the equi-join to customer runs through [[Skew.saltedJoin]]: probe
    * rows deterministically salted on event_id, the small build side
    * replicated 8×, join on (key, salt) — a hot key spreads over 8 reducers
    * instead of serializing on one. The oracle is the PLAIN join + aggregate
    * (salting must change nothing semantically); the broadcast threshold is
    * untouched, so at test SF Spark may still broadcast — the salted SHAPE
    * is what the query declares and the spec pins the row-spread property.
    */
  def q171SaltedJoin: Q = (s, d) => {
    val ev = Tables(s, d, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val cust = Tables(s, d, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    Skew.saltedJoin(ev, col("user_id"), col("event_id"), cust, col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("total_value"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q04: 5-way star join. All three dimension chains broadcast; the only
    * shuffle is lineitem⋈orders (AQE may broadcast orders at small SF).
    */
  def q04StarJoin: Q = (s, d) => {
    val li = Tables(s, d, "lineitem")
    val orders = Tables(s, d, "orders")
    val customer = Tables(s, d, "customer")
    val nation = Tables(s, d, "nation")
    val region = Tables(s, d, "region")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(sumExactDouble(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))
  }

  /** Q05: left outer join preserving customers with zero orders. */
  def q05LeftJoin: Q = (s, d) => {
    val customer = Tables(s, d, "customer")
    val orders = Tables(s, d, "orders")
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("order_cnt"))
      .orderBy(col("c_custkey"))
  }

  /** Q06: left semi join (EXISTS) — customers with ≥1 order above 450k. */
  def q06SemiJoin: Q = (s, d) => {
    val customer = Tables(s, d, "customer")
    val orders = Tables(s, d, "orders").filter(col("o_totalprice") > 450000)
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Q07: left anti join (NOT EXISTS) — customers with no order above 450k.
    * Generalizes the reference's `NOT IN` cleanse (R8) without the driver
    * round-trip of collected ids (reference package.scala:88-92).
    */
  def q07AntiJoin: Q = (s, d) => {
    val customer = Tables(s, d, "customer")
    val orders = Tables(s, d, "orders").filter(col("o_totalprice") > 450000)
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Q64: FULL OUTER join — wealthy customers vs their high-value order
    * aggregates, keeping unmatched rows from BOTH sides (the one outer
    * variant q05/q06/q07 don't cover). The order side is pre-aggregated to
    * one row per key, so the join is 1:1 and the output deterministic.
    */
  def q64FullOuter: Q = (s, d) => {
    val cust = Tables(s, d, "customer").filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_acctbal"))
    val ords = Tables(s, d, "orders").filter(col("o_totalprice") > 450000)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("big_orders"), moneySum(col("o_totalprice")).as("big_total"))
    cust.join(ords, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_acctbal"), coalesce(col("big_orders"), lit(0L)).as("big_orders"),
        col("big_total"))
      .orderBy(col("custkey"))
  }

  /** Q10: TPC-H Q1-shaped hash aggregate with partial (map-side) aggregation.
    * All monetary math goes through exact decimal (D3) so results are
    * partitioning-independent.
    */
  def q10HashAgg: Q = (s, d) => {
    val li = Tables(s, d, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sumExactDouble(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
        sumExactDouble(chargeTerm(col("l_extendedprice"), col("l_discount"), col("l_tax"))).as("sum_charge"),
        moneyAvg(col("l_quantity")).as("avg_qty"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        moneyAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Q12: ROLLUP with grouping flags over the star-join revenue. */
  def q12Rollup: Q = (s, d) => {
    starBase(s, d)
      .rollup(col("r_name"), col("n_name"))
      .agg(sumExactDouble(col("revenue_item")).as("revenue"),
        big(grouping(col("r_name"))).as("g_r"),
        big(grouping(col("n_name"))).as("g_n"))
      .select(col("r_name"), col("n_name"), col("revenue"), col("g_r"), col("g_n"))
      .orderBy(col("g_r"), col("g_n"), col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Q13: CUBE with grouping flags. */
  def q13Cube: Q = (s, d) => {
    Tables(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        big(grouping(col("l_returnflag"))).as("g_f"),
        big(grouping(col("l_linestatus"))).as("g_s"))
      .select(col("l_returnflag"), col("l_linestatus"), col("cnt"), col("g_f"), col("g_s"))
      .orderBy(col("g_f"), col("g_s"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Shared star-join input for Q12 (pre-computed per-item revenue). */
  private def starBase(s: SparkSession, d: String): DataFrame = {
    val li = Tables(s, d, "lineitem")
    val orders = Tables(s, d, "orders")
    val customer = Tables(s, d, "customer")
    val nation = Tables(s, d, "nation")
    val region = Tables(s, d, "region")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"),
        revenueTerm(col("l_extendedprice"), col("l_discount")).as("revenue_item"))
  }

  /** Q15: HAVING — users with above-typical event counts. */
  def q15Having: Q = (s, d) => {
    Tables(s, d, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 70)
      .orderBy(col("user_id"))
  }

  /** Q16: ranking window functions + per-group top-k (top 3 per segment). */
  def q16RankTopK: Q = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables(s, d, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        big(row_number().over(w)).as("rn"),
        big(rank().over(w)).as("rnk"),
        big(dense_rank().over(w)).as("drnk"))
      .filter(col("rn") <= 3)
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** Q17: analytic windows — lag/lead over each customer's order history. */
  def q17LagLead: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), dateStr(col("o_orderdate")).as("o_date"),
        dateStr(lag(col("o_orderdate"), 1).over(w)).as("prev_date"),
        dateStr(lead(col("o_orderdate"), 1).over(w)).as("next_date"))
      .orderBy(col("o_custkey"), col("o_date"), col("o_orderkey"))
  }

  /** Q18: frame specs — running sum (unbounded→current) + 4-row moving average. */
  def q18Frames: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val moving = w.rowsBetween(-3, Window.currentRow)
    Tables(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        sum(dec(col("o_totalprice"))).over(running).cast("double").as("running_sum"),
        (sum(dec(col("o_totalprice"))).over(moving).cast("double") / count(lit(1)).over(moving)).as("moving_avg"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Q19: global top-k — planned as TakeOrderedAndProject (no full sort
    * materialization; each partition keeps k rows, driver merges k·p).
    */
  def q19TopK: Q = (s, d) => {
    Tables(s, d, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), dateStr(col("o_orderdate")).as("o_date"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Q20: set operations — UNION ALL / UNION / INTERSECT / EXCEPT of two
    * customer-key predicates, tagged and stacked into one deterministic result.
    */
  def q20SetOps: Q = (s, d) => {
    val customer = Tables(s, d, "customer")
    val a = customer.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    val b = customer.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val tagged =
      a.union(b).select(lit("1_union_all").as("op"), col("c_custkey"))
        .union(a.union(b).distinct().select(lit("2_union").as("op"), col("c_custkey")))
        .union(a.intersect(b).select(lit("3_intersect").as("op"), col("c_custkey")))
        .union(a.except(b).select(lit("4_except").as("op"), col("c_custkey")))
    tagged.groupBy(col("op"), col("c_custkey")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("op"), col("c_custkey"))
  }

  /** Q65: multiset set ops — INTERSECT ALL / EXCEPT ALL preserve
    * multiplicities (min / truncated difference of per-value counts), the
    * ALL variants q20's distinct set ops don't cover.
    */
  def q65SetOpsAll: Q = (s, d) => {
    val li = Tables(s, d, "lineitem")
    val a = li.filter(col("l_quantity") > 45).select(col("l_orderkey"))
    val b = li.filter(col("l_discount") > 0.08).select(col("l_orderkey"))
    val tagged =
      a.intersectAll(b).select(lit("1_intersect_all").as("op"), col("l_orderkey"))
        .union(a.exceptAll(b).select(lit("2_except_all").as("op"), col("l_orderkey")))
    tagged.groupBy(col("op"), col("l_orderkey")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("op"), col("l_orderkey"))
  }

  /** Q22: date/time functions over midnight-precision order dates. */
  def q22DateTime: Q = (s, d) => {
    val od = col("o_orderdate")
    Tables(s, d, "orders")
      .select(col("o_orderkey"),
        big(year(od)).as("y"), big(month(od)).as("m"), big(dayofmonth(od)).as("dom"),
        dateStr(date_trunc("month", od)).as("month_start"),
        big(datediff(od, lit("1995-01-01").cast("date"))).as("days_since"),
        date_add(od.cast("date"), 30).cast("string").as("plus_30"))
      .orderBy(col("o_orderkey"))
  }

  /** Q23: math functions. Rounding goes through exact decimal (never raw
    * doubles) so half-way cases agree across engines.
    */
  def q23Math: Q = (s, d) => {
    Tables(s, d, "lineitem")
      .select(col("l_orderkey"), big(col("l_linenumber")).as("l_linenumber"),
        round(dec(col("l_extendedprice")), 1).cast("double").as("price_r1"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        big(ceil(col("l_discount") * 100)).as("disc_ceil"),
        big(floor(col("l_tax") * 100)).as("tax_floor"),
        (col("l_orderkey") % 7).as("key_mod"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Q86: NULL-semantics battery over outer-join misses — the classic
    * cross-engine divergence corner pinned under the oracle hash: null-safe
    * equality (`<=>` / IS NOT DISTINCT FROM), `coalesce` fill, `nullif`
    * round-trip, CASE-on-NULL, and an EXPLICIT `NULLS FIRST` order (Spark
    * defaults nulls first on ASC, DuckDB defaults nulls last — D2 requires
    * spelling it out in both engines).
    */
  def q86NullSemantics: Q = (s, d) => {
    val c = Tables(s, d, "customer").select(col("c_custkey"))
    val o = Tables(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    c.join(o, col("c_custkey") === col("o_custkey") && col("o_totalprice") > 300000,
        "left_outer")
      .select(col("c_custkey"), col("o_orderkey"),
        (col("o_orderkey") <=> lit(null).cast("long")).as("is_miss"),
        coalesce(col("o_totalprice"), lit(-1.0)).as("price_f"),
        nullif(coalesce(col("o_totalprice"), lit(0.0)), lit(0.0)).isNull.as("zeroed"),
        when(col("o_orderkey").isNull, "none").otherwise("some").as("tag"))
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
  }

  /** Q106: incremental aggregate maintenance — the materialized-view delta
    * pattern: yesterday's aggregate state plus today's delta rows produce
    * the updated aggregate WITHOUT rescanning the base, because
    * sum/count partials merge associatively (exact decimal sums, the same
    * property D3 buys). Declared as partial(base) ∪ partial(delta) →
    * re-reduce; the oracle is the full recompute, so the merge's
    * exactness — not approximate refresh — is what the hash pins. At
    * 100 TB this is the difference between an O(delta) nightly refresh
    * and an O(corpus) rescan.
    */
  def q106IncrementalAgg: Q = (s, d) => {
    val orders = Tables(s, d, "orders")
    def partial(df: DataFrame) = df.groupBy(col("o_orderpriority"))
      .agg(sum(dec(col("o_totalprice"))).as("psum"), count(lit(1)).as("pcnt"))
    val base = partial(orders.filter(col("o_orderkey") % 10 =!= 0))
    val delta = partial(orders.filter(col("o_orderkey") % 10 === 0))
    base.union(delta)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("psum")).cast("double").as("sum_price"), sum(col("pcnt")).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q245: share-of-parent hierarchy report — every nation's revenue with
    * its share of the parent region AND of the grand total, the
    * ratio-to-parent presentation a BI rollup renders. Parent sums are a
    * region-partitioned window over the bounded nation grain (25 rows)
    * and a 1-row broadcast total — exact decimal sums everywhere, the
    * two ratios are single double divisions. One aggregate over the
    * star join; the hierarchy math never touches row scale.
    */
  def q245ShareOfParent: Q = (s, d) => {
    val rev = Tables(s, d, "orders")
      .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(Tables(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
    val wRegion = Window.partitionBy(col("r_name"))
    val tot = rev.agg(sum(col("rev")).as("total"))
    rev.withColumn("region_rev", sum(col("rev")).over(wRegion))
      .crossJoin(broadcast(tot))
      .select(col("r_name"), col("n_name"),
        round(col("rev").cast("double"), 4).as("revenue"),
        round(col("rev").cast("double") / col("region_rev").cast("double"), 6)
          .as("share_of_region"),
        round(col("rev").cast("double") / col("total").cast("double"), 6)
          .as("share_of_total"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Q247: year-over-year growth with same-month alignment — monthly
    * revenue joined to itself 12 months back (an equi-join on the
    * bounded month grid, not a lag window — the join states the
    * alignment explicitly and drops months without a prior-year twin,
    * which a lag over a gappy grid would silently mis-align). Growth is
    * one double ratio off exact decimal sums, 6-dp rounded.
    */
  def q247YoyGrowth: Q = (s, d) => {
    val monthly = Tables(s, d, "orders")
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("m"))
      .agg(count(lit(1)).as("n_orders"), sum(dec(col("o_totalprice"))).as("rev"))
    monthly.as("cur")
      .join(monthly.select((col("m") + 12).as("m"), col("rev").as("rev_prior"))
        .as("pri"), Seq("m"))
      .select(col("m").as("month_idx"), big(col("n_orders")).as("n_orders"),
        round(col("rev").cast("double"), 4).as("revenue"),
        round(col("rev_prior").cast("double"), 4).as("revenue_prior_year"),
        round(col("rev").cast("double") / col("rev_prior").cast("double")
          - lit(1.0), 6).as("yoy_growth"))
      .orderBy(col("month_idx"))
  }

  /** Q271: the SQL ENTRY PATH — the same engine through `spark.sql` text
    * over registered temp views (CTEs + joins + exact-decimal aggregate +
    * window + top-k), the surface the reference explicitly lacks
    * (SURVEY §2.2: "no SQL parser"). The query is a TPC-H-Q3-shaped
    * shipping-priority report; semantics follow every D-rule (D2 total
    * order, D3 decimal-before-sum with the exact-cut (38,4) surface, the
    * dateStr cast discipline). The rank window runs over the
    * TakeOrdered-bounded 10-row top relation, never the order population.
    */
  def q271SqlSurface: Q = (s, d) => {
    Tables(s, d, "customer").createOrReplaceTempView("q271_customer")
    Tables(s, d, "orders").createOrReplaceTempView("q271_orders")
    Tables(s, d, "lineitem").createOrReplaceTempView("q271_lineitem")
    s.sql(
      """WITH cust AS (
        |  SELECT c_custkey FROM q271_customer WHERE c_mktsegment = 'BUILDING'),
        |rev AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |      * CAST(1 - l_discount AS DECIMAL(12,4))) AS DECIMAL(38,4))
        |      AS DOUBLE) AS revenue
        |  FROM q271_orders JOIN cust ON o_custkey = c_custkey
        |  JOIN q271_lineitem ON l_orderkey = o_orderkey
        |  GROUP BY o_orderkey, CAST(o_orderdate AS DATE)),
        |top AS (
        |  SELECT o_orderkey, CAST(odate AS STRING) AS order_date, revenue
        |  FROM rev ORDER BY revenue DESC, o_orderkey LIMIT 10)
        |SELECT o_orderkey, order_date, revenue,
        |  CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, o_orderkey)
        |    AS BIGINT) AS rk
        |FROM top ORDER BY rk""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q271_sql_surface" -> q271SqlSurface,
    "q247_yoy_growth" -> q247YoyGrowth,
    "q245_share_of_parent" -> q245ShareOfParent,
    "q106_incremental_agg" -> q106IncrementalAgg,
    "q86_null_semantics" -> q86NullSemantics,
    "q01_scan_filter" -> q01ScanFilter,
    "q02_string_pred" -> q02StringPred,
    "q03_join_agg" -> q03JoinAgg,
    "q04_star_join" -> q04StarJoin,
    "q164_bucketed_join" -> q164BucketedJoin,
    "q171_salted_join" -> q171SaltedJoin,
    "q05_left_join" -> q05LeftJoin,
    "q64_full_outer" -> q64FullOuter,
    "q06_semi_join" -> q06SemiJoin,
    "q07_anti_join" -> q07AntiJoin,
    "q10_hash_agg" -> q10HashAgg,
    "q12_rollup" -> q12Rollup,
    "q13_cube" -> q13Cube,
    "q15_having" -> q15Having,
    "q16_rank_topk" -> q16RankTopK,
    "q17_lag_lead" -> q17LagLead,
    "q18_frames" -> q18Frames,
    "q19_topk" -> q19TopK,
    "q20_set_ops" -> q20SetOps,
    "q65_set_ops_all" -> q65SetOpsAll,
    "q22_datetime" -> q22DateTime,
    "q23_math" -> q23Math)

  val oracles: Map[String, String] = Map(
    "q271_sql_surface" ->
      """WITH cust AS (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |rev AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |      * CAST(1 - l_discount AS DECIMAL(12,4))) AS DECIMAL(38,4))
        |      AS DOUBLE) AS revenue
        |  FROM orders JOIN cust ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY o_orderkey, CAST(o_orderdate AS DATE)),
        |top AS (
        |  SELECT o_orderkey, CAST(odate AS VARCHAR) AS order_date, revenue
        |  FROM rev ORDER BY revenue DESC, o_orderkey LIMIT 10)
        |SELECT o_orderkey, order_date, revenue,
        |  CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, o_orderkey)
        |    AS BIGINT) AS rk
        |FROM top ORDER BY rk""".stripMargin,
    "q247_yoy_growth" ->
      """WITH m AS (
        |  SELECT YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS m,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT CAST(cur.m AS BIGINT) AS month_idx, cur.n_orders,
        |  ROUND(CAST(cur.rev AS DOUBLE), 4) AS revenue,
        |  ROUND(CAST(pri.rev AS DOUBLE), 4) AS revenue_prior_year,
        |  ROUND(CAST(cur.rev AS DOUBLE) / CAST(pri.rev AS DOUBLE) - 1.0, 6)
        |    AS yoy_growth
        |FROM m cur JOIN m pri ON cur.m = pri.m + 12
        |ORDER BY month_idx""".stripMargin,
    "q245_share_of_parent" ->
      """WITH rev AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT r_name, n_name, rev,
        |    SUM(rev) OVER (PARTITION BY r_name) AS region_rev,
        |    (SELECT SUM(rev) FROM rev) AS total
        |  FROM rev)
        |SELECT r_name, n_name,
        |  ROUND(CAST(rev AS DOUBLE), 4) AS revenue,
        |  ROUND(CAST(rev AS DOUBLE) / CAST(region_rev AS DOUBLE), 6)
        |    AS share_of_region,
        |  ROUND(CAST(rev AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share_of_total
        |FROM w ORDER BY r_name, n_name""".stripMargin,
    "q106_incremental_agg" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q86_null_semantics" ->
      """SELECT c.c_custkey, o.o_orderkey,
        |  (o.o_orderkey IS NOT DISTINCT FROM NULL) AS is_miss,
        |  coalesce(o.o_totalprice, -1.0) AS price_f,
        |  nullif(coalesce(o.o_totalprice, 0.0), 0.0) IS NULL AS zeroed,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'none' ELSE 'some' END AS tag
        |FROM customer c LEFT JOIN orders o
        |  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000
        |ORDER BY c.c_custkey ASC, o.o_orderkey ASC NULLS FIRST""".stripMargin,
    "q01_scan_filter" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
        |FROM lineitem WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_string_pred" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name LIKE '%red%' AND upper(p_type) LIKE 'S%'
        |ORDER BY p_partkey""".stripMargin,
    "q171_salted_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q164_bucketed_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |      * CAST(1 - l_discount AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment, COUNT(*) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q04_star_join" ->
      """SELECT r_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(12,4))), 4) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q05_left_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q64_full_outer" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_acctbal,
        |  COALESCE(big_orders, 0) AS big_orders, big_total
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) c
        |FULL OUTER JOIN (
        |  SELECT o_custkey, COUNT(*) AS big_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS big_total
        |  FROM orders WHERE o_totalprice > 450000 GROUP BY o_custkey) o
        |ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q10_hash_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(12,4)) * CAST(1 + l_tax AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q12_rollup" ->
      """SELECT r_name, n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(12,4))), 4) AS DOUBLE) AS revenue,
        |  CAST(GROUPING(r_name) AS BIGINT) AS g_r, CAST(GROUPING(n_name) AS BIGINT) AS g_n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q13_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_f, CAST(GROUPING(l_linestatus) AS BIGINT) AS g_s
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_f, g_s, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q15_having" ->
      """SELECT user_id, COUNT(*) AS cnt FROM events
        |GROUP BY user_id HAVING COUNT(*) > 70 ORDER BY user_id""".stripMargin,
    "q16_rank_topk" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  CAST(rn AS BIGINT) AS rn, CAST(rnk AS BIGINT) AS rnk, CAST(drnk AS BIGINT) AS drnk
        |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
        |        row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        |      FROM customer
        |      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey))
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "q17_lag_lead" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_date,
        |  CAST(CAST(lag(o_orderdate) OVER w AS DATE) AS VARCHAR) AS prev_date,
        |  CAST(CAST(lead(o_orderdate) OVER w AS DATE) AS VARCHAR) AS next_date
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_date, o_orderkey""".stripMargin,
    "q18_frames" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_avg
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q19_topk" ->
      """SELECT o_orderkey, o_totalprice, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_date
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q20_set_ops" ->
      """WITH a AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        |     b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     tagged AS (
        |       SELECT '1_union_all' AS op, c_custkey FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
        |       UNION ALL SELECT '2_union' AS op, c_custkey FROM (SELECT * FROM a UNION SELECT * FROM b)
        |       UNION ALL SELECT '3_intersect' AS op, c_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |       UNION ALL SELECT '4_except' AS op, c_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
        |SELECT op, c_custkey, COUNT(*) AS cnt FROM tagged
        |GROUP BY op, c_custkey ORDER BY op, c_custkey""".stripMargin,
    "q65_set_ops_all" ->
      """WITH a AS (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45),
        |     b AS (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.08),
        |     tagged AS (
        |       SELECT '1_intersect_all' AS op, l_orderkey
        |       FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |       UNION ALL
        |       SELECT '2_except_all' AS op, l_orderkey
        |       FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
        |SELECT op, l_orderkey, COUNT(*) AS cnt FROM tagged
        |GROUP BY op, l_orderkey ORDER BY op, l_orderkey""".stripMargin,
    "q22_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
        |  CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
        |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS plus_30
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q23_math" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)), 1) AS DOUBLE) AS price_r1,
        |  ABS(l_quantity - 25) AS qty_dev,
        |  CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_ceil,
        |  CAST(FLOOR(l_tax * 100) AS BIGINT) AS tax_floor,
        |  l_orderkey % 7 AS key_mod
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
