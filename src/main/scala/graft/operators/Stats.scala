package graft.operators

import graft.Tables
import graft.Dsl._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical analytics and data-quality auditing — the regression /
  * hypothesis-test / robust-statistics / profiling family a warehouse
  * ships as built-ins and a training-data pipeline runs as gates.
  *
  * Determinism: every statistic reduces to exact decimal moments (the q48
  * recipe) surfaced as doubles, with the final float arithmetic written in
  * the SAME textual shape in the oracle SQL — one IEEE expression tree, so
  * both engines round identically; medians are LOWER medians (the sorted
  * element at position `(n+1) div 2` under a total order), never the
  * float average of two middles.
  */
object Stats {
  type Q = (SparkSession, String) => DataFrame

  /** Q177: per-group simple linear regression (slope / intercept / R²) of
    * extended price on quantity, from exact decimal moments — the
    * `REGR_SLOPE` family computed the deterministic way. One pass, one
    * shuffle on the 3-value group key; every moment is an associative
    * decimal sum, so the result is partitioning-independent — at 100 TB
    * this is a map-side-combined aggregate, nothing else.
    */
  def q177GroupLinreg: Q = (s, d) => {
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    val sxx = sum(dec(x) * dec(x)).cast(DecimalType(38, 4)).cast("double")
    val syy = sum(dec(y) * dec(y)).cast(DecimalType(38, 4)).cast("double")
    val sxy = sum(dec(x) * dec(y)).cast(DecimalType(38, 4)).cast("double")
    val a = Tables(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(dec(x)).cast("double").as("sx"),
        sum(dec(y)).cast("double").as("sy"),
        sxx.as("sxx"), syy.as("syy"), sxy.as("sxy"))
    val nD = col("n").cast("double")
    val den = nD * col("sxx") - col("sx") * col("sx")
    val num = nD * col("sxy") - col("sx") * col("sy")
    a.select(col("l_returnflag"), col("n"),
      round(num / den, 6).as("slope"),
      round((col("sy") * col("sxx") - col("sx") * col("sxy")) / den, 6).as("intercept"),
      round(num * num / (den * (nD * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  /** Q178: Welch's two-sample t-test of each experiment arm against the
    * `view` baseline over event values — the A/B-test primitive. Arm
    * moments are exact decimal sums; the t statistic and
    * Welch–Satterthwaite df are one shared IEEE expression tree over
    * those moments. The baseline is a 1-row broadcast; total cost is one
    * group-by over events.
    */
  def q178AbWelch: Q = (s, d) => {
    val v = col("value")
    val s2e = sum(dec(v) * dec(v)).cast(DecimalType(38, 4)).cast("double")
    val arms = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(v)).cast("double").as("s1"), s2e.as("s2"))
    def vr(s1: Column, s2: Column, n: Column): Column =
      (s2 - s1 * s1 / n) / (n - lit(1.0))
    val base = arms.filter(col("event_type") === "view")
      .select(col("n").as("n0"), col("s1").as("b1"), col("s2").as("b2"))
    val j = arms.filter(col("event_type") =!= "view").crossJoin(broadcast(base))
    val n1 = col("n").cast("double")
    val n0 = col("n0").cast("double")
    val v1 = vr(col("s1"), col("s2"), n1)
    val v0 = vr(col("b1"), col("b2"), n0)
    val se2 = v1 / n1 + v0 / n0
    j.select(col("event_type"), col("n"),
      round(col("s1") / n1, 6).as("mean"),
      round((col("s1") / n1 - col("b1") / n0) / sqrt(se2), 6).as("t"),
      round(se2 * se2 / (v1 / n1 * (v1 / n1) / (n1 - lit(1.0))
        + v0 / n0 * (v0 / n0) / (n0 - lit(1.0))), 4).as("df"))
      .orderBy(col("event_type"))
  }

  /** Q179: robust outlier detection per event type via median / MAD — the
    * quality gate that survives heavy tails where mean/stddev (q99's
    * z-score) saturates. Both medians are LOWER medians under the total
    * order `(value, event_id)`, picked by row_number inside the bounded
    * per-type window; deviations are exact decimals, and the outlier
    * predicate `|x − med| > 3·MAD` is pure decimal arithmetic. Two
    * windowed passes + two ≤5-row broadcast joins; per-type partitions
    * keep the windows distributed at any scale.
    */
  def q179MadOutliers: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("event_type"), col("event_id"), dec(col("value")).as("v"))
    val w1 = Window.partitionBy(col("event_type")).orderBy(col("v"), col("event_id"))
    val wc = Window.partitionBy(col("event_type"))
    val r1 = e.withColumn("rn", row_number().over(w1)).withColumn("cnt", count(lit(1)).over(wc))
    val med = r1.filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("event_type"), col("v").as("med"))
    val dev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("ad", abs(col("v") - col("med")))
    val w2 = Window.partitionBy(col("event_type")).orderBy(col("ad"), col("event_id"))
    val r2 = dev.withColumn("rn", row_number().over(w2)).withColumn("cnt", count(lit(1)).over(wc))
    val mad = r2.filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("event_type"), col("ad").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(when(col("ad") > col("mad") * 3, 1)).as("n_outliers"))
      .join(broadcast(med), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .select(col("event_type"), col("n"),
        col("med").cast("double").as("med"),
        col("mad").cast("double").as("mad"), col("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** Q180: association rules over order baskets — pair support /
    * confidence / lift, the market-basket mining primitive. The Apriori
    * property is the scale story: item supports are computed FIRST and
    * items below min-support (5) are pruned BEFORE the pair self-join, so
    * the join fans out only over frequent items × small baskets (TPC-H
    * baskets ≤ 7 lines) — the same bounded-expansion discipline as q56's
    * prefix filter. Lift compares pair frequency against independence;
    * all ratios are integer-over-integer doubles.
    */
  def q180AssocRules: Q = (s, d) => {
    val minSup = 5
    val items = Tables(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item")).distinct()
    val nOrders = items.select(col("o")).distinct().agg(count(lit(1)).as("n_orders"))
    val supp = items.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minSup)
    val freq = items.join(supp, Seq("item"))
    val pairs = freq.select(col("o"), col("item").as("a"), col("cnt").as("ca"))
      .join(freq.select(col("o"), col("item").as("b"), col("cnt").as("cb")), Seq("o"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("ca"), col("cb"))
      .agg(count(lit(1)).as("pc"))
    pairs.crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("pc"), col("ca"), col("cb"),
        round(col("pc").cast("double") / col("ca").cast("double"), 6).as("conf"),
        round(col("pc").cast("double") * col("n_orders").cast("double")
          / (col("ca").cast("double") * col("cb").cast("double")), 6).as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(30)
  }

  /** Q186: column profiling (ANALYZE) over `customer` — per-column row /
    * null / distinct counts, min/max, and the modal value with a
    * deterministic `(count desc, value asc)` tie-break. Numeric min/max
    * surface as doubles; the mode is profiled only for discrete columns
    * (keys, codes, names — a continuous double's mode is noise, and its
    * string form is engine-dependent). Each column is one scan-side
    * aggregate plus one TakeOrdered(1) mode pass — embarrassingly
    * parallel per column, the shape ANALYZE TABLE runs at any scale.
    */
  def q186ColumnProfile: Q = (s, d) => {
    val t = Tables(s, d, "customer")
    val numeric = Seq("c_custkey", "c_nationkey", "c_acctbal")
    val discrete = Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val parts = cols.map { c =>
      val isNum = numeric.contains(c)
      val agg = t.agg(
        count(lit(1)).as("n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("ndv"),
        (if (isNum) round(min(col(c)).cast("double"), 4) else lit(null).cast("double")).as("min_num"),
        (if (isNum) round(max(col(c)).cast("double"), 4) else lit(null).cast("double")).as("max_num"),
        (if (isNum) lit(null).cast("string") else min(col(c))).as("min_str"),
        (if (isNum) lit(null).cast("string") else max(col(c))).as("max_str"))
      val withMode =
        if (discrete.contains(c)) {
          val mode = t.groupBy(col(c).cast("string").as("top_val"))
            .agg(count(lit(1)).as("top_cnt"))
            .orderBy(col("top_cnt").desc, col("top_val"))
            .limit(1)
          agg.crossJoin(broadcast(mode))
        } else {
          agg.withColumn("top_val", lit(null).cast("string"))
            .withColumn("top_cnt", lit(null).cast("long"))
        }
      withMode.select(lit(c).as("col_name"), col("n"), col("n_null"), col("ndv"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"),
        col("top_val"), col("top_cnt"))
    }
    parts.reduce(_.unionAll(_)).orderBy(col("col_name"))
  }

  /** Q187: referential-integrity audit — orphan detection across every
    * foreign-key edge of the schema, the data-quality gate an ingest
    * pipeline runs before publishing. Each edge is one anti-join of the
    * child against a broadcast parent key set (dims are the small side by
    * construction); the output is one row per edge with child cardinality
    * and orphan row / key counts. Seven independent bounded jobs — at
    * 100 TB each edge is a broadcast-hash anti-join over one fact scan.
    */
  def q187FkAudit: Q = (s, d) => {
    def edge(name: String, child: DataFrame, fk: String,
             parent: DataFrame, pk: String): DataFrame = {
      val keys = parent.select(col(pk)).distinct()
      val orphans = child.join(broadcast(keys), col(fk) === col(pk), "left_anti")
      val tot = child.agg(count(lit(1)).as("child_rows"))
      val orp = orphans.agg(count(lit(1)).as("orphan_rows"),
        countDistinct(col(fk)).as("orphan_keys"))
      tot.crossJoin(broadcast(orp))
        .select(lit(name).as("fk_edge"), col("child_rows"),
          col("orphan_rows"), col("orphan_keys"))
    }
    val li = Tables(s, d, "lineitem")
    val o = Tables(s, d, "orders")
    val c = Tables(s, d, "customer")
    val p = Tables(s, d, "part")
    val su = Tables(s, d, "supplier")
    val n = Tables(s, d, "nation")
    val r = Tables(s, d, "region")
    Seq(
      edge("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
      edge("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey"),
      edge("lineitem.l_suppkey->supplier", li, "l_suppkey", su, "s_suppkey"),
      edge("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
      edge("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"),
      edge("supplier.s_nationkey->nation", su, "s_nationkey", n, "n_nationkey"),
      edge("nation.n_regionkey->region", n, "n_regionkey", r, "r_regionkey"))
      .reduce(_.unionAll(_))
      .orderBy(col("fk_edge"))
  }

  /** Q193: weighted median per group — the smallest price whose cumulative
    * quantity reaches half the group's total (lower weighted median, the
    * q179 convention). Prices collapse to a per-(group, price) weight
    * summary FIRST, the cumulative weight runs over that summary inside
    * the group partition, and the threshold compare is pure decimal
    * (`2·cw ≥ tw`) — no float boundary. Shuffle ∝ distinct prices per
    * group, never line items.
    */
  def q193WeightedMedian: Q = (s, d) => {
    val byPrice = Tables(s, d, "lineitem")
      .select(col("l_returnflag").as("flag"),
        dec(col("l_extendedprice")).as("price"), dec(col("l_quantity")).as("w"))
      .groupBy(col("flag"), col("price"))
      .agg(sum(col("w")).as("wsum"))
    val win = Window.partitionBy(col("flag")).orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byPrice.withColumn("cw", sum(col("wsum")).over(win))
    val tot = byPrice.groupBy(col("flag")).agg(sum(col("wsum")).as("tw"))
    cum.join(broadcast(tot), Seq("flag"))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(col("flag"))
      .agg(min(col("price")).cast("double").as("wmedian"),
        min(col("tw")).cast("double").as("total_weight"))
      .orderBy(col("flag"))
  }

  /** Q194: Gini coefficient of order value per priority class — the
    * concentration metric, exact:
    * `G = 2·Σ(rankᵢ·xᵢ) / (n·Σx) − (n+1)/n` with x ascending under the
    * `(price, orderkey)` total order. The rank-weighted sum is an exact
    * decimal (rank · decimal price, summed associatively); the window is
    * partitioned per priority class.
    */
  def q194Gini: Q = (s, d) => {
    val w = Window.partitionBy(col("pri")).orderBy(col("x"), col("o_orderkey"))
    // pinned exchange on the window key (the q373 pattern): the rank sort +
    // rank-weighted decimal sum over all orders ran single-task (measured
    // 3.0 s stage at sf0.1 — opt r14); width bounded by |priorities|
    val r = Tables(s, d, "orders")
      .select(col("o_orderpriority").as("pri"), col("o_orderkey"),
        dec(col("o_totalprice")).as("x"))
      .repartition(s.sparkContext.defaultParallelism, col("pri"))
      .withColumn("rn", row_number().over(w))
    val a = r.groupBy(col("pri"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("rn") * col("x")).cast(DecimalType(38, 4)).cast("double").as("srx"))
    val nD = col("n").cast("double")
    a.select(col("pri"), col("n"),
      round(col("srx") * 2.0 / (nD * col("sx")) - (nD + 1.0) / nD, 6).as("gini"))
      .orderBy(col("pri"))
  }

  /** Leading-digit Benford expectations `log10(1 + 1/d)`, shared between
    * the Spark plan and the oracle as IDENTICAL double literals.
    */
  private val benford: Seq[(Int, Double)] = Seq(
    1 -> 0.3010299956639812, 2 -> 0.17609125905568124, 3 -> 0.12493873660829992,
    4 -> 0.09691001300805642, 5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
    7 -> 0.05799194697768673, 8 -> 0.05115252244738129, 9 -> 0.04575749056067514)

  /** Q204: Benford's-law first-digit audit over order totals — the fraud /
    * synthetic-data screen. The leading digit is extracted in pure integer
    * arithmetic (exact cents, integer division, then the first character
    * of the integer's string form — identical in both engines; a
    * float log10 would straddle power-of-ten boundaries differently per
    * engine). One 9-group aggregate + a 1-row broadcast total; expected
    * shares are fixed double literals.
    */
  def q204Benford: Q = (s, d) => {
    val cents = (dec(col("o_totalprice")) * 100).cast("long")
    val counts = Tables(s, d, "orders")
      .select(cents.as("cents"))
      .select(substring(expr("CAST(cents div 100 AS STRING)"), 1, 1).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    benfordReport(counts)
  }

  /** q204's report tail over a (digit, n) count relation — factored out so
    * the streaming twin (q284, which MERGES additive per-batch digit
    * counts) shares the identical share/expected/delta arithmetic and
    * therefore q204's oracle verbatim (the q254/q264 sharing pattern).
    */
  def benfordReport(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("n")).cast("long").as("total"))
    val expected = benford.tail.foldLeft(
      when(col("digit") === benford.head._1.toString, lit(benford.head._2))) {
      case (acc, (dg, p)) => acc.when(col("digit") === dg.toString, lit(p))
    }
    counts.crossJoin(broadcast(tot))
      .withColumn("share", round(col("n").cast("double") / col("total").cast("double"), 6))
      .withColumn("expected", expected)
      .select(col("digit"), col("n").cast("long").as("n"), col("share"),
        col("expected"), round(col("share") - col("expected"), 6).as("delta"))
      .orderBy(col("digit"))
  }

  /** Q205: join-key skew diagnosis — the report that decides WHEN q171's
    * salted join (or AQE skew handling) is worth its replication cost.
    * For each candidate key column, one count aggregate derives the key
    * histogram; from it: cardinality, mean/max key mass, the top key and
    * its share, and the skew factor `max/mean`. Everything integer or a
    * single double ratio; per-column work is one shuffle ∝ distinct keys,
    * and the per-column summaries are 1-row relations unioned into the
    * report. A planner consults exactly this shape before choosing a
    * distribution strategy.
    */
  def q205SkewReport: Q = (s, d) => {
    def report(table: String, column: String): DataFrame = {
      val hist = Tables(s, d, table)
        .groupBy(col(column).as("k")).agg(count(lit(1)).as("n"))
      val top = hist.orderBy(col("n").desc, col("k")).limit(1)
        .select(col("k").cast("string").as("top_key"), col("n").as("top_n"))
      hist.agg(count(lit(1)).as("n_keys"),
        sum(col("n")).cast("long").as("rows"),
        max(col("n")).as("max_n"))
        .crossJoin(broadcast(top))
        .select(lit(s"$table.$column").as("key_col"),
          col("n_keys"), col("rows"), col("max_n"), col("top_key"), col("top_n"),
          round(col("max_n").cast("double")
            / (col("rows").cast("double") / col("n_keys").cast("double")), 4).as("skew_factor"))
    }
    Seq(
      report("lineitem", "l_orderkey"),
      report("lineitem", "l_partkey"),
      report("lineitem", "l_suppkey"),
      report("orders", "o_custkey"),
      report("events", "user_id"),
      report("events", "event_type"))
      .reduce(_.unionAll(_))
      .orderBy(col("key_col"))
  }

  /** Q210: Kaplan-Meier survival curve for customer lifetime — the
    * right-censored retention estimator q75's retention table can't give
    * (it drops customers still active at the horizon; KM keeps them in the
    * at-risk set until censoring). Lifetime is months from first to last
    * order; a customer whose last order is > 6 months before the corpus
    * horizon "churned" (death at that duration), anyone else is censored.
    * S(t) = Π_{s≤t, deaths>0} (1 − d_s/n_s), the product-limit estimator.
    *
    * Scale shape: one per-customer aggregate (map-side-combined), then
    * everything else — at-risk counts, the log-sum product, the survival
    * curve — lives on the duration GRID: one row per distinct lifetime
    * month, bounded by the corpus month span (≤ ~81 rows at any sf), so the
    * global ordered window runs over the bounded summary, never customers.
    * Determinism: the product is exp(Σ ln-factors) with each per-step ln
    * rounded to 6 dp and summed as DECIMAL(18,6) (exact, associative — the
    * q208 log-log discipline); a step that kills the whole at-risk set
    * pins survival to exactly 0 thereafter instead of exp(−∞).
    */
  def q210KaplanMeier: Q = (s, d) => {
    def mIdx(c: Column) = (year(c) * 12 + month(c)).cast("long")
    val per = Tables(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(mIdx(col("o_orderdate"))).as("m0"),
        max(mIdx(col("o_orderdate"))).as("ml"))
    val horizon = per.agg(max(col("ml")).as("mmax"))
    val durs = per.crossJoin(broadcast(horizon))
      .select(
        when(col("mmax") - col("ml") > 6, col("ml") - col("m0"))
          .otherwise(col("mmax") - col("m0")).as("dur"),
        when(col("mmax") - col("ml") > 6, 1L).otherwise(0L).as("death"))
    val grid = durs.groupBy(col("dur"))
      .agg(sum(col("death")).as("n_deaths"),
        sum(lit(1L) - col("death")).as("n_censored"))
    val w = Window.orderBy(col("dur"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec6 = DecimalType(18, 6)
    grid
      .withColumn("total", sum(col("n_deaths") + col("n_censored")).over(wAll))
      .withColumn("n_risk", col("total")
        - coalesce(sum(col("n_deaths") + col("n_censored")).over(wPrev), lit(0L)))
      .withColumn("term",
        when(col("n_deaths") === 0 || col("n_deaths") >= col("n_risk"),
          lit(0).cast(dec6))
          .otherwise(round(log((col("n_risk") - col("n_deaths")).cast("double")
            / col("n_risk").cast("double")), 6).cast(dec6)))
      .withColumn("wiped",
        max(when(col("n_deaths") >= col("n_risk"), 1L).otherwise(0L)).over(wCum))
      .withColumn("survival", when(col("wiped") === 1, lit(0.0))
        .otherwise(round(exp(sum(col("term")).over(wCum).cast("double")), 4)))
      .select(col("dur"), col("n_risk"), col("n_deaths"), col("n_censored"),
        col("survival"))
      .orderBy(col("dur"))
  }

  /** Q216: mutual information between event type and UTC hour-of-day —
    * the dependence screen a feature-selection pass runs before modeling
    * (is behavior time-patterned, and which event type carries the
    * pattern?). Reports each type's contribution to
    * I(type; hour) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))), its entropy-style
    * marginal count, and the pointwise-MI extremes.
    *
    * Scale shape: one scan feeds three map-side-combined aggregates
    * (cells, type marginals, hour marginals — 120/|types|/24 rows); all
    * arithmetic then happens on the bounded cell grid with broadcast
    * joins. Determinism: the ln ratio is computed in DOUBLES with one
    * fixed expression shape (counts as doubles — at warehouse scale the
    * integer product n_x·n_y would overflow a long), rounded to 6 dp,
    * weighted by the exact long n_xy into a DECIMAL sum, with the single
    * closing division by N in doubles — the q208/q210 log discipline.
    */
  def q216MutualInfo: Q = (s, d) => {
    val base = Tables.events(s, d)
      .select(col("event_type"), expr("pmod(CAST(ts2 AS LONG) div 3600, 24)").as("hr"))
    val cells = base.groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("nxy"))
    val byType = base.groupBy(col("event_type")).agg(count(lit(1)).as("nx"))
    val byHour = base.groupBy(col("hr")).agg(count(lit(1)).as("ny"))
    val tot = base.agg(count(lit(1)).as("nn"))
    val dec6 = DecimalType(18, 6)
    val pmi = round(log((col("nxy").cast("double") * col("nn").cast("double"))
      / (col("nx").cast("double") * col("ny").cast("double"))), 6)
    cells.join(byType, Seq("event_type")).join(broadcast(byHour), Seq("hr"))
      .crossJoin(broadcast(tot))
      .withColumn("pmi", pmi)
      .groupBy(col("event_type"))
      .agg(max(col("nx")).as("n_events"),
        big(count(lit(1))).as("n_cells"),
        round((sum(col("nxy") * col("pmi").cast(dec6))
          .cast(DecimalType(38, 6)).cast("double"))
          / max(col("nn")).cast("double"), 6).as("mi_contrib"),
        max(col("pmi")).as("max_pmi"),
        min(col("pmi")).as("min_pmi"))
      .orderBy(col("event_type"))
  }

  /** Q217: information-gain decision stump — the supervised split search
    * under every tree learner's hood, run as a data-parallel screen:
    * which single test on (price bucket, order month, order status) best
    * separates URGENT orders? Numeric features contribute one "≤ b"
    * split per bucket boundary (cumulative class counts over the ordered
    * bucket summary), the categorical feature one one-vs-rest split per
    * value; gain = H(parent) − weighted child entropies.
    *
    * Scale shape: one pass over orders builds per-feature (bucket, class)
    * count summaries (map-side combined, ≤16 rows each); every window is
    * partitioned BY FEATURE over those bounded summaries; the price-range
    * normalizer is a 1-row broadcast and bucket arithmetic is integer
    * cents. Determinism: gain·n expands to Σ ±x·ln x of COUNTS — each ln
    * rounded to 6 dp, weighted by the exact long count into decimals, one
    * closing /n double — so no float ever multiplies a float (the
    * q216/q210 discipline applied to entropy).
    */
  def q217InfoGainStump: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val dec28 = DecimalType(28, 6)
    def xlx(c: Column): Column =
      when(c === 0L, lit(0).cast(dec28))
        .otherwise((c * round(log(c.cast("double")), 6).cast(dec6)).cast(dec28))
    val o = Tables(s, d, "orders").select(
      (col("o_orderpriority") === "1-URGENT").cast("long").as("y"),
      col("o_orderstatus"),
      month(col("o_orderdate")).cast("long").as("mon"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
    val mm = o.agg(min(col("cents")).as("cmin"), max(col("cents")).as("cmax"))
    val bucketed = o.crossJoin(broadcast(mm))
      .withColumn("price_b", expr("((cents - cmin) * 16) div (cmax - cmin + 1)"))
    def numSummary(b: Column, name: String) = bucketed
      .groupBy(b.as("b"))
      .agg(sum(col("y")).as("c1"), sum(lit(1L) - col("y")).as("c0"))
      .withColumn("feature", lit(name))
    val wOrd = Window.partitionBy(col("feature")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("feature"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val numSplits = numSummary(col("price_b"), "price16")
      .union(numSummary(col("mon"), "month"))
      .withColumn("l1", sum(col("c1")).over(wOrd))
      .withColumn("l0", sum(col("c0")).over(wOrd))
      .withColumn("p1", sum(col("c1")).over(wAll))
      .withColumn("p0", sum(col("c0")).over(wAll))
      .withColumn("maxb", max(col("b")).over(wAll))
      .filter(col("b") < col("maxb"))
      .select(col("feature"), concat(lit("<="), col("b")).as("split"),
        col("l1"), col("l0"),
        (col("p1") - col("l1")).as("r1"), (col("p0") - col("l0")).as("r0"))
    // a `PARTITION BY lit("status")` window would constant-fold into a
    // GLOBAL window (caught by the plan audit at landing) — the parent
    // totals come from a 1-row broadcast instead
    val statusSum = bucketed.groupBy(col("o_orderstatus").as("v"))
      .agg(sum(col("y")).as("c1"), sum(lit(1L) - col("y")).as("c0"))
    val statusTot = statusSum.agg(sum(col("c1")).as("p1"), sum(col("c0")).as("p0"))
    val catSplits = statusSum.crossJoin(broadcast(statusTot))
      .select(lit("status").as("feature"), col("v").as("split"),
        col("c1").as("l1"), col("c0").as("l0"),
        (col("p1") - col("c1")).as("r1"), (col("p0") - col("c0")).as("r0"))
    val nTot = col("l1") + col("l0") + col("r1") + col("r0")
    val gainNum = xlx(nTot) -
      xlx(col("l1") + col("r1")) - xlx(col("l0") + col("r0")) -
      xlx(col("l1") + col("l0")) - xlx(col("r1") + col("r0")) +
      xlx(col("l1")) + xlx(col("l0")) + xlx(col("r1")) + xlx(col("r0"))
    val wBest = Window.partitionBy(col("feature"))
      .orderBy(col("gain").desc, col("split"))
    numSplits.union(catSplits)
      .withColumn("gain", round(gainNum.cast("double") / nTot.cast("double"), 6))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("feature"), col("split"),
        (col("l1") + col("l0")).as("n_left"),
        (col("r1") + col("r0")).as("n_right"),
        col("l1").as("n_left_pos"), col("r1").as("n_right_pos"), col("gain"))
      .orderBy(col("feature"))
  }

  /** Q220: Pearson correlation matrix over derived per-order features
    * (total price, line count, total quantity, distinct parts) — the
    * multivariate screen q177's single-pair regression doesn't give. All
    * 4 first moments and 10 second moments ride ONE map-side-combined
    * aggregate over the per-order feature relation (one lineitem
    * aggregate + one orders join); the six correlations are then 1-row
    * arithmetic unpivoted with `stack`. Moments follow the q177/q48
    * discipline: exact DECIMAL(18,4) products summed to (38,4), surfaced
    * as doubles, with the r formula written in one identical IEEE shape
    * in both engines.
    */
  def q220CorrMatrix: Q = (s, d) => {
    val per = Tables(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("f_lines"),
        sum(col("l_quantity").cast("long")).as("f_qty"),
        countDistinct(col("l_partkey")).as("f_parts"))
    val feats = Tables(s, d, "orders")
      .select(col("o_orderkey"), col("o_totalprice").as("f_price"))
      .join(per, col("o_orderkey") === col("l_orderkey"))
    val fns = Seq("price", "lines", "qty", "parts")
    val firsts = fns.map(f => sum(dec(col(s"f_$f"))).cast("double").as(s"s_$f"))
    val seconds = for {
      (a, i) <- fns.zipWithIndex; (b, j) <- fns.zipWithIndex if i <= j
      // (19,4)·(12,4): the 19-digit side forces DuckDB's multiply into
      // int128 (two 12/18-digit operands overflow its int64 fast path on
      // price², caught at landing); all products have <= 4 true decimals,
      // so the (38,4) reduction is EXACT, not a rounding
    } yield sum(col(s"f_$a").cast(DecimalType(19, 4)) * dec12(col(s"f_$b")))
      .cast(DecimalType(38, 4)).cast("double").as(s"s_${a}_$b")
    val a = feats.agg(count(lit(1)).as("n"),
      (firsts ++ seconds): _*)
    val nD = col("n").cast("double")
    def r(x: String, y: String): Column =
      round((nD * col(s"s_${x}_$y") - col(s"s_$x") * col(s"s_$y"))
        / (sqrt(nD * col(s"s_${x}_$x") - col(s"s_$x") * col(s"s_$x"))
          * sqrt(nD * col(s"s_${y}_$y") - col(s"s_$y") * col(s"s_$y"))), 6)
    val pairs = for {
      (x, i) <- fns.zipWithIndex; (y, j) <- fns.zipWithIndex if i < j
    } yield (x, y)
    val withR = a.select(col("n") +: pairs.map { case (x, y) =>
      r(x, y).as(s"r_${x}_$y") }: _*)
    val stackArgs = pairs.map { case (x, y) => s"'$x', '$y', r_${x}_$y" }
      .mkString(s"stack(${pairs.length}, ", ", ", ") AS (feat_a, feat_b, r)")
    withR.select(col("n"), expr(stackArgs))
      .select(col("feat_a"), col("feat_b"), col("n"), col("r"))
      .orderBy(col("feat_a"), col("feat_b"))
  }

  /** Q232: winsorization — the robust preprocessing step between q179's
    * outlier DETECTION and modeling: clip order totals per priority to
    * the group's exact discrete [p05, p95] (percentile_disc semantics —
    * smallest rank with cume_dist ≥ p, under the total order
    * (value, orderkey)), and report the clip audit: cut points, clipped
    * counts both sides, mean before/after. Clipping happens in exact
    * decimals; the means are decimal sums with one closing division.
    * Per-priority windows (5 bounded partitions at any scale... of the
    * GROUP count — at warehouse scale the per-group sort is the honest
    * cost, same as q102's, and the q108-style summary refinement is the
    * documented alternative).
    */
  def q232Winsorize: Q = (s, d) => {
    val wp = Window.partitionBy(col("p")).orderBy(col("vd"), col("o_orderkey"))
    val base = Tables(s, d, "orders")
      .select(col("o_orderpriority").as("p"), col("o_orderkey"),
        dec(col("o_totalprice")).as("vd"))
    // group sizes as a 5-row broadcast instead of a second unbounded window
    // pass, and the rank window evaluated ONCE (the clip pass below joins
    // cuts back onto the UNWINDOWED scan — it needs values, not ranks):
    // the original shape referenced the windowed relation twice and paid
    // the per-group sort twice
    val nper = base.groupBy(col("p")).agg(count(lit(1)).as("n"))
    val cuts = base
      .withColumn("rn", big(row_number().over(wp)))
      .join(broadcast(nper), Seq("p"))
      .groupBy(col("p"))
      .agg(min(when(col("rn") === expr("(n * 5 + 99) div 100"), col("vd"))).as("lo"),
        min(when(col("rn") === expr("(n * 95 + 99) div 100"), col("vd"))).as("hi"))
    base.join(broadcast(cuts), Seq("p"))
      .withColumn("vc", least(greatest(col("vd"), col("lo")), col("hi")))
      .groupBy(col("p"))
      .agg(big(count(lit(1))).as("n"),
        max(col("lo")).cast("double").as("p05"),
        max(col("hi")).cast("double").as("p95"),
        big(sum(when(col("vd") < col("lo"), 1L).otherwise(0L))).as("n_clipped_low"),
        big(sum(when(col("vd") > col("hi"), 1L).otherwise(0L))).as("n_clipped_high"),
        round(sum(col("vd")).cast("double") / count(lit(1)), 6).as("mean_before"),
        round(sum(col("vc")).cast("double") / count(lit(1)), 6).as("mean_after"))
      .withColumnRenamed("p", "priority")
      .orderBy(col("priority"))
  }

  /** Q238: Wilson score intervals — the right way to put error bars on a
    * proportion (urgent-order rate per market segment): unlike the normal
    * approximation, Wilson never leaves [0,1] and stays honest at small n
    * or extreme rates. z = 1.96 as a fixed literal; everything else is
    * one closed-form IEEE expression over exact integer (k, n) — no
    * simulation, no bootstrap, deterministic in any engine.
    *
    * Scale shape: one orders⋈customer join (dimension broadcast), one
    * map-side-combined aggregate per segment, 5 output rows.
    */
  def q238WilsonCi: Q = (s, d) => {
    val z = lit(1.96)
    val n = col("n").cast("double")
    val k = col("k").cast("double")
    val p = k / n
    val denom = lit(1.0) + z * z / n
    val center = (p + z * z / (lit(2.0) * n)) / denom
    val half = z * sqrt(p * (lit(1.0) - p) / n
      + z * z / (lit(4.0) * n * n)) / denom
    Tables(s, d, "orders")
      .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("k"))
      .select(col("c_mktsegment"), big(col("n")).as("n"), big(col("k")).as("k"),
        round(p, 6).as("rate"),
        round(center - half, 6).as("ci_lo"),
        round(center + half, 6).as("ci_hi"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q249: behavioral entropy — per-user Shannon entropy of the
    * event-type distribution (is this account a one-note bot or a
    * diverse human?), in exact count arithmetic: H = (n·ln n − Σc·ln c)/n
    * with every ln 6-dp-rounded and weighted into decimal sums (the q217
    * xlx discipline), normalized by ln(#types observed) into [0,1] where
    * defined. One (user, type) aggregate, one per-user rollup.
    */
  def q249BehaviorEntropy: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val dec28 = DecimalType(28, 6)
    def xlx(c: Column): Column =
      when(c === 0L, lit(0).cast(dec28))
        .otherwise((c * round(log(c.cast("double")), 6).cast(dec6)).cast(dec28))
    val tc = Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("c"))
    tc.groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("k"),
        sum(xlx(col("c"))).cast(DecimalType(38, 6)).cast("double").as("sclc"))
      .withColumn("h", (xlx(col("n")).cast("double") - col("sclc"))
        / col("n").cast("double"))
      .select(col("user_id"), big(col("n")).as("n_events"), big(col("k")).as("n_types"),
        round(col("h"), 4).as("entropy"),
        when(col("k") === 1L, lit(0.0))
          .otherwise(round(col("h") / log(col("k").cast("double")), 4))
          .as("norm_entropy"))
      .orderBy(col("user_id"))
  }

  /** Q250: price elasticity of demand — the log-log regression slope of
    * quantity on price over the 16 equi-width price buckets (q217's
    * integer-cents bucketing): elasticity ≈ d ln(qty)/d ln(price). The
    * regression runs over the BOUNDED 16-point (ln avg-price, ln qty)
    * summary with q208's closed-form moments (6-dp-rounded logs, decimal
    * sums) — one corpus aggregate, then 16-row arithmetic.
    */
  def q250PriceElasticity: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val li = Tables(s, d, "lineitem").select(
      (col("l_extendedprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"),
      col("l_quantity").cast("long").as("q"))
    val mm = li.agg(min(col("cents")).as("cmin"), max(col("cents")).as("cmax"))
    val pts = li.crossJoin(broadcast(mm))
      .withColumn("b", expr("((cents - cmin) * 16) div (cmax - cmin + 1)"))
      .groupBy(col("b"))
      .agg(sum(col("cents")).as("sc"), count(lit(1)).as("n"), sum(col("q")).as("sq"))
      .select(
        round(log(col("sc").cast("double") / col("n").cast("double")), 6)
          .cast(dec6).as("lx"),
        round(log(col("sq").cast("double")), 6).cast(dec6).as("ly"))
    val a = pts.agg(count(lit(1)).as("k"),
      sum(col("lx")).cast("double").as("sx"), sum(col("ly")).cast("double").as("sy"),
      sum(col("lx") * col("lx")).cast(DecimalType(38, 6)).cast("double").as("sxx"),
      sum(col("lx") * col("ly")).cast(DecimalType(38, 6)).cast("double").as("sxy"),
      sum(col("ly") * col("ly")).cast(DecimalType(38, 6)).cast("double").as("syy"))
    val kD = col("k").cast("double")
    val den = kD * col("sxx") - col("sx") * col("sx")
    val num = kD * col("sxy") - col("sx") * col("sy")
    a.select(big(col("k")).as("n_buckets"),
      round(num / den, 6).as("elasticity"),
      round((col("sy") * col("sxx") - col("sx") * col("sxy")) / den, 6).as("intercept"),
      round(num * num / (den * (kD * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
  }

  /** Q254: k-anonymity audit — the privacy gate a dataset release runs
    * before publishing quasi-identifiers: group customers by their QI tuple
    * at two generalization levels (level 0: nation × segment × $1000
    * balance band; level 1: region × segment × $5000 band — one step up the
    * generalization lattice) and report, for k ∈ {2, 5, 10}, how many
    * equivalence classes fall below k and what fraction of ROWS sits in
    * them (re-identification risk). The level-1 rows quantify how much risk
    * the generalization step buys down.
    *
    * Scale shape: two keyed aggregates over one customer scan, then a
    * 3-way `explode` of the bounded class-size relation (no join, no
    * cross product) into one final tiny aggregate — at 100 TB this is two
    * map-side-combined groupBys. Determinism: bands via FLOOR on exactly-
    * converted doubles (DECIMAL(15,2) cents < 2^53), identical in both
    * engines including negative balances (floor, not truncation).
    */
  def q254Kanonymity: Q = (s, d) => {
    val base = Tables(s, d, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        col("c_acctbal"))
      .join(Tables(s, d, "nation")
          .select(col("n_nationkey"), col("n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_nationkey"), col("n_regionkey"), col("c_mktsegment"),
        floor(col("c_acctbal").cast("double") / lit(1000.0)).as("b1"),
        floor(col("c_acctbal").cast("double") / lit(5000.0)).as("b5"))
    val l0 = base.groupBy(col("c_nationkey"), col("c_mktsegment"), col("b1"))
      .agg(count(lit(1)).as("sz")).select(lit(0L).as("lvl"), col("sz"))
    val l1 = base.groupBy(col("n_regionkey"), col("c_mktsegment"), col("b5"))
      .agg(count(lit(1)).as("sz")).select(lit(1L).as("lvl"), col("sz"))
    l0.union(l1)
      .withColumn("k", explode(array(lit(2L), lit(5L), lit(10L))))
      .groupBy(col("lvl"), col("k"))
      .agg(big(count(lit(1))).as("n_classes"),
        big(sum(when(col("sz") < col("k"), lit(1L)).otherwise(lit(0L))))
          .as("classes_below"),
        big(sum(when(col("sz") < col("k"), col("sz")).otherwise(lit(0L))))
          .as("rows_below"),
        big(sum(col("sz"))).as("n_rows"),
        round(sum(when(col("sz") < col("k"), col("sz")).otherwise(lit(0L)))
            .cast("double") / sum(col("sz")).cast("double"), 6).as("risk_pct"))
      .orderBy(col("lvl"), col("k"))
  }

  /** Q318: l-diversity audit — the k-anonymity follow-up (q254): a class
    * of k identical quasi-identifiers still leaks if all k rows share ONE
    * sensitive value. Per QI class (nation × 1k-account-balance band, the
    * q254 level-0 grid with the segment REMOVED from the QI — it is the
    * sensitive attribute here), l = distinct sensitive values; for each
    * required l ∈ {2,3,5}: how many classes (and rows) fall below. The
    * release gate a privacy review actually applies after k-anonymity
    * passes.
    *
    * Scale shape: one exact distinct-count aggregate per QI class (the
    * class grid is the bounded domain), then a 3-way explode over the
    * bounded class summary — shuffle ∝ classes, never rows.
    */
  def q318Ldiversity: Q = (s, d) => {
    val cls = Tables(s, d, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal").cast("double") / lit(1000.0)).as("b1"))
      .groupBy(col("c_nationkey"), col("b1"))
      .agg(count(lit(1)).as("sz"), countDistinct(col("c_mktsegment")).as("l"))
    cls.withColumn("l_req", explode(array(lit(2L), lit(3L), lit(5L))))
      .groupBy(col("l_req"))
      .agg(big(count(lit(1))).as("n_classes"),
        big(sum(when(col("l") < col("l_req"), 1L).otherwise(0L)))
          .as("classes_below"),
        big(sum(when(col("l") < col("l_req"), col("sz")).otherwise(0L)))
          .as("rows_below"),
        big(sum(col("sz"))).as("n_rows"),
        round(sum(when(col("l") < col("l_req"), col("sz")).otherwise(0L))
          .cast("double") / sum(col("sz")).cast("double"), 6).as("risk_pct"))
      .orderBy(col("l_req"))
  }

  /** One declared FD candidate's audit row: n (non-null determinant rows),
    * distinct determinants, distinct (det, dep) pairs, whether the FD
    * holds exactly, the g3 violation count (minimum rows to delete so it
    * holds — Σ per-determinant (count − majority-dependent count)), and
    * confidence = (n − g3)/n. Two keyed aggregates per pair, both on the
    * bounded (det, dep) summary.
    */
  /** The FD audit row from a (A, B, c) pair-count summary — the mergeable
    * state q326's streaming fold relies on (pair counts of disjoint row
    * sets merge by per-cell sum, exactly like q315's confusion cells).
    */
  private[graft] def fdFromPairCounts(g: DataFrame, table: String,
      det: String, dep: String): DataFrame = {
    val perA = g.groupBy(col("A"))
      .agg(sum(col("c")).as("ca"), max(col("c")).as("ma"),
        count(lit(1)).as("nb"))
    perA.agg(
      sum(col("ca")).cast("long").as("n"),
      count(lit(1)).cast("long").as("na"),
      sum(col("nb")).cast("long").as("nab"),
      sum(col("ca") - col("ma")).cast("long").as("g3"))
      .select(lit(table).as("rel"), lit(det).as("determinant"),
        lit(dep).as("dependent"), col("n"), col("na").as("n_det"),
        col("nab").as("n_pairs"), (col("nab") === col("na")).as("holds"),
        col("g3").as("g3_violations"),
        round((col("n") - col("g3")).cast("double") / col("n").cast("double"), 6)
          .as("confidence"))
  }

  private def fdAudit(s: SparkSession, d: String, table: String,
      det: String, dep: String): DataFrame =
    fdFromPairCounts(
      Tables(s, d, table)
        .select(col(det).as("A"), col(dep).as("B"))
        .filter(col("A").isNotNull)
        .groupBy(col("A"), col("B")).agg(count(lit(1)).as("c")),
      table, det, dep)

  /** Q319: functional-dependency discovery over a declared candidate set —
    * the schema-inference audit (does brand determine type? is orderkey
    * really a key?) behind constraint mining and data-contract checks.
    * Reports exact hold/violate plus the g3 error (minimum row deletions
    * to repair) and its confidence — the standard TANE/g3 measures,
    * computed exactly.
    *
    * Scale shape: each pair is two map-side-combined aggregates whose
    * shuffle is bounded by the (det, dep) VALUE domain, never rows; the
    * six audited pairs union into one 6-row report.
    */
  def q319FdDiscovery: Q = (s, d) => {
    val pairs = Seq(
      ("part", "p_brand", "p_type"), ("part", "p_name", "p_brand"),
      ("part", "p_partkey", "p_name"), ("part", "p_type", "p_size"),
      ("orders", "o_orderkey", "o_orderstatus"),
      ("orders", "o_custkey", "o_orderpriority"))
    pairs.map { case (t, a, b) => fdAudit(s, d, t, a, b) }
      .reduce(_.unionByName(_))
      .orderBy(col("rel"), col("determinant"), col("dependent"))
  }

  /** Q323: sample-ratio-mismatch audit — the first gate of every A/B
    * readout: do the portable-hash assignment counts match the declared
    * split? Both the 50/50 and 90/10 designs are checked with the exact
    * 1-df chi-square in ALL-INTEGER form — 50/50: χ² = (a−b)²/n; 90/10:
    * χ² = (10a−9n)²/(9n·10)·(10/10)… reduced to d²/(9n) with d = 10a−9n —
    * so the only floating op is one division of exact BIGINTs, compared
    * against the 3.841 (p=0.05) critical value.
    *
    * Scale shape: ONE map-side-combined aggregate over the scan computes
    * both designs' arm counts; the two report rows project from that
    * single 1-row summary.
    */
  def q323Srm: Q = (s, d) => {
    val bk = TrainingOps.portableBucket(col("o_orderkey"))
    srmReport(Tables(s, d, "orders")
      .select(bk.as("bk"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("bk") % 2 === 0, 1L).otherwise(0L)).as("even"),
        sum(when(col("bk") < 9000, 1L).otherwise(0L)).as("big")))
  }

  /** The SRM report from a 1-row (n, even, big) arm-count summary — the
    * mergeable state q329's streaming fold relies on (arm counts of
    * disjoint row sets merge by plain sum).
    */
  private[graft] def srmReport(agg: DataFrame): DataFrame = {
    val r5050 = agg.select(lit("50/50").as("design"),
      big(col("n")).as("n"), big(col("even")).as("arm_a"),
      big(col("n") - col("even")).as("arm_b"),
      round(col("n").cast("double") * lit(0.5), 6).as("expected_a"),
      round(((col("even") - (col("n") - col("even")))
        * (col("even") - (col("n") - col("even")))).cast("double")
        / col("n").cast("double"), 6).as("chi2"))
    val r9010 = agg.select(lit("90/10").as("design"),
      big(col("n")).as("n"), big(col("big")).as("arm_a"),
      big(col("n") - col("big")).as("arm_b"),
      round(col("n").cast("double") * lit(0.9), 6).as("expected_a"),
      round(((lit(10L) * col("big") - lit(9L) * col("n"))
        * (lit(10L) * col("big") - lit(9L) * col("n"))).cast("double")
        / (lit(9L) * col("n")).cast("double"), 6).as("chi2"))
    r5050.unionByName(r9010)
      .withColumn("srm", col("chi2") > lit(3.841))
      .orderBy(col("design"))
  }

  /** Q327: caliper-matched treatment-effect estimate (ATT) — every URGENT
    * order matched WITH REPLACEMENT to its nearest non-urgent order by
    * total price (within a 100.00 caliper, ties → lower control price
    * then lower key — a total order), then the average difference in
    * line-item counts between each treated order and its match. The
    * observational-causal workhorse when q281's diff-in-diff has no time
    * axis: compare like-priced orders across the "treatment".
    * With-replacement nearest matching is the DISTRIBUTED-honest form —
    * greedy without-replacement matching is inherently sequential.
    *
    * Scale shape: the caliper join is a BUCKET BAND JOIN — treated rows
    * explode into their 10000-cent bucket ±1 (every control within the
    * caliper shares one of the three), so candidate fan-out is bounded by
    * per-bucket control density, never all-pairs; one per-treated
    * row_number pick; exact integer cents and line counts end in two IEEE
    * divisions.
    */
  def q327AttMatching: Q = (s, d) => {
    val items = Tables(s, d, "lineitem").groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("y"))
    val ord = Tables(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      .join(items, col("o_orderkey") === col("l_orderkey"))
    val treated = ord.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("tid"), col("cents").as("tc"),
        col("y").as("ty"))
    val control = ord.filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_orderkey").as("cid"), col("cents").as("cc"),
        col("y").as("cy"))
      .withColumn("cb", expr("cc div 10000"))
    val cands = treated
      .withColumn("tb0", expr("tc div 10000"))
      .withColumn("cb", explode(array(col("tb0") - 1, col("tb0"), col("tb0") + 1)))
      .join(control, Seq("cb"))
      .filter(abs(col("cc") - col("tc")) <= 10000L)
    val wPick = Window.partitionBy(col("tid"))
      .orderBy(abs(col("cc") - col("tc")), col("cc"), col("cid"))
    val picked = cands.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
    val nt = treated.agg(count(lit(1)).as("n_treated"))
    picked.agg(
      count(lit(1)).as("n_matched"),
      sum(col("ty") - col("cy")).cast("long").as("dsum"),
      sum(abs(col("cc") - col("tc"))).cast("long").as("gapsum"))
      .crossJoin(broadcast(nt))
      .select(big(col("n_treated")).as("n_treated"),
        big(col("n_matched")).as("n_matched"),
        round(col("n_matched").cast("double")
          / col("n_treated").cast("double"), 6).as("match_rate"),
        round(col("dsum").cast("double")
          / col("n_matched").cast("double"), 6).as("att_lines"),
        round(col("gapsum").cast("double")
          / col("n_matched").cast("double") / 100.0, 6).as("mean_price_gap"))
  }

  /** Q328: jackknife CI for a ratio-of-sums metric — revenue per event as
    * Σ_u y_u / Σ_u x_u over USER totals (the unit of randomization), with
    * the leave-one-user-out variance that the naive per-event CI gets
    * wrong under within-user correlation. Each replicate has the closed
    * form R₍ᵤ₎ = (Y−y_u)/(X−x_u) — one pass, no resampling loop; the q263
    * bootstrap's analytic sibling.
    *
    * Determinism: replicates are 6-dp-rounded decimals; Σr and Σr² are
    * exact decimal sums (the (38,6) cut on Σr² is midpoint-free — squares
    * of 6-dp decimals cannot end …5·10⁻⁷·10⁻⁶, the q267 argument) and the
    * variance/CI is one fixed IEEE tree with the 1.96 literal CAST from
    * VARCHAR on the oracle side.
    *
    * Scale shape: one per-user aggregate, a 1-row total broadcast onto
    * the user summary, one reduction — shuffle ∝ users.
    */
  def q328JackknifeRatio: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val per = Tables.events(s, d).groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", dec(col("value")))
        .otherwise(dec(lit(0)))).as("yu"),
        count(lit(1)).as("xu"))
    val tot = per.agg(sum(col("yu")).as("yy"), sum(col("xu")).as("xx"),
      count(lit(1)).as("nu"))
    val reps = per.crossJoin(broadcast(tot))
      .select(round((col("yy") - col("yu")).cast("double")
        / (col("xx") - col("xu")).cast("double"), 6).cast(dec6).as("r6"))
    val red = reps.agg(
      count(lit(1)).as("n"),
      sum(col("r6")).cast("double").as("s1"),
      sum(col("r6") * col("r6")).cast(DecimalType(38, 6)).cast("double").as("s2"))
    red.crossJoin(broadcast(tot))
      .select(big(col("nu")).as("n_users"), big(col("xx")).as("n_events"),
        round(col("yy").cast("double") / col("xx").cast("double"), 6).as("ratio"),
        round(sqrt((col("s2") - col("s1") * col("s1") / col("n").cast("double"))
          * (col("n").cast("double") - lit(1.0)) / col("n").cast("double")), 6)
          .as("se_jack"),
        round(col("yy").cast("double") / col("xx").cast("double")
          - lit(1.96) * sqrt((col("s2") - col("s1") * col("s1") / col("n").cast("double"))
            * (col("n").cast("double") - lit(1.0)) / col("n").cast("double")), 6)
          .as("ci_lo"),
        round(col("yy").cast("double") / col("xx").cast("double")
          + lit(1.96) * sqrt((col("s2") - col("s1") * col("s1") / col("n").cast("double"))
            * (col("n").cast("double") - lit(1.0)) / col("n").cast("double")), 6)
          .as("ci_hi"))
  }

  /** Q331: two-proportion z-test, each segment against the REST — the
    * pairwise readout behind q325's descriptive ratios: is this segment's
    * URGENT-selection rate significantly different from everyone else's,
    * under the pooled-variance normal approximation, at |z| > 1.96? The
    * q238 Wilson machinery turned into a comparison test.
    *
    * Scale shape: the q325 count build, one 1-row total broadcast, one
    * fixed IEEE tree per 5-row segment.
    */
  def q331TwoProportionZ: Q = (s, d) => {
    val pos = Tables(s, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val per = Tables(s, d, "customer")
      .join(pos, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_custkey").isNotNull, 1L).otherwise(0L)).as("np"))
    val tot = per.agg(sum(col("n")).as("nt"), sum(col("np")).as("npt"))
    val p1 = col("np").cast("double") / col("n").cast("double")
    val p2 = (col("npt") - col("np")).cast("double") /
      (col("nt") - col("n")).cast("double")
    val pp = col("npt").cast("double") / col("nt").cast("double")
    val se = sqrt(pp * (lit(1.0) - pp)
      * (lit(1.0) / col("n").cast("double")
        + lit(1.0) / (col("nt") - col("n")).cast("double")))
    per.crossJoin(broadcast(tot))
      .select(col("c_mktsegment"), big(col("n")).as("n"),
        big(col("np")).as("n_selected"),
        round(p1, 6).as("rate"), round(p2, 6).as("rest_rate"),
        round((p1 - p2) / se, 6).as("z"),
        (abs(round((p1 - p2) / se, 6)) > lit(1.96)).as("significant"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q332: 5-fold cross-validated MAE — the model-selection loop run the
    * distributed-honest way: fold assignment is the portable hash, and
    * every fold's TRAIN mean comes from the complement identity
    * μ_(type, −f) = (S_type − s_{type,f}) / (N_type − n_{type,f}) — one
    * keyed aggregate and one broadcast, never 5 scans (the q328 jackknife
    * trick applied to CV). Per-fold MAE plus the cross-fold mean ± SD row
    * (fold = −1) that model selection actually reads.
    *
    * Determinism: fold sums are exact decimals; per-row |y − μ| is
    * 6-dp-rounded into dec6 before the exact MAE sum; the 5 fold MAEs
    * reduce through exact dec6 sums with the q267 midpoint-free-squares
    * cut; NULL sd on fold rows in both engines.
    */
  def q332KfoldCv: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("value"),
        (TrainingOps.portableBucket(col("event_id")) / lit(2000L))
          .cast("long").as("fold"))
    val perTf = ev.groupBy(col("event_type"), col("fold"))
      .agg(sum(dec(col("value"))).as("sf"), count(lit(1)).as("nf"))
    val perT = perTf.groupBy(col("event_type"))
      .agg(sum(col("sf")).as("st"), sum(col("nf")).as("nt"))
    val mu = perTf.join(broadcast(perT), Seq("event_type"))
      .select(col("event_type"), col("fold"),
        ((col("st") - col("sf")).cast("double")
          / (col("nt") - col("nf")).cast("double")).as("mu"))
    val folds = ev.join(broadcast(mu), Seq("event_type", "fold"))
      .select(col("fold"),
        round(abs(col("value") - col("mu")), 6).cast(dec6).as("ae"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("ne"),
        round(sum(col("ae")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("mae"))
    val red = folds
      .select(col("ne"), col("mae"), col("mae").cast(dec6).as("m6"))
      .agg(sum(col("ne")).as("ne"), count(lit(1)).as("k"),
        sum(col("m6")).cast("double").as("s1"),
        sum(col("m6") * col("m6")).cast(DecimalType(38, 6)).cast("double")
          .as("s2"))
    val overall = red.select(lit(-1L).as("fold"), big(col("ne")).as("n_eval"),
      round(col("s1") / col("k").cast("double"), 6).as("mae"),
      round(sqrt((col("s2") - col("s1") * col("s1") / col("k").cast("double"))
        / (col("k").cast("double") - lit(1.0))), 6).as("mae_sd"))
    folds.select(big(col("fold")).as("fold"), big(col("ne")).as("n_eval"),
      col("mae"), lit(null).cast("double").as("mae_sd"))
      .unionByName(overall)
      .orderBy(col("fold"))
  }

  /** Q333: population-stability index — THE industry score-drift gate:
    * the event-score distribution of the LATER time half against the
    * earlier half over the fixed q189 bin grid, PSI = Σ (p−q)·ln(p/q)
    * with Laplace-smoothed shares (+1/bin, +10/total — a zero bin must
    * not blow up the log). Complements q168's L1 drift with the metric
    * risk teams actually threshold (0.1 watch / 0.25 act).
    *
    * Determinism: integer bin counts; shares and the log ratio are one
    * fixed IEEE tree per bin, 6-dp-rounded into dec6 BEFORE the exact
    * total sum (the q221 log discipline); the time split point is exact
    * integer epoch-second midpoint.
    */
  def q333Psi: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(epochSec(col("ts2")).as("t"), dec(col("value")).as("v"))
    val rng = ev.agg(expr("(MIN(t) + MAX(t)) div 2").as("mid"))
    psiReport(ev.crossJoin(broadcast(rng))
      .select(least(lit(9L), expr("CAST(v * 100 AS BIGINT) div 3300")).as("bin"),
        (col("t") >= col("mid")).as("cur"))
      .groupBy(col("bin"))
      .agg(sum(when(!col("cur"), 1L).otherwise(0L)).as("nb"),
        sum(when(col("cur"), 1L).otherwise(0L)).as("nc")))
  }

  /** The PSI report from a (bin, nb, nc) count summary — the mergeable
    * state q337's streaming fold relies on (bin×half counts of disjoint
    * row sets merge by per-cell sum).
    */
  private[graft] def psiReport(binned: DataFrame): DataFrame = {
    val dec6 = DecimalType(18, 6)
    val tot = binned.agg(sum(col("nb")).as("tb"), sum(col("nc")).as("tc"))
    val p = (col("nb") + 1L).cast("double") / (col("tb") + 10L).cast("double")
    val q = (col("nc") + 1L).cast("double") / (col("tc") + 10L).cast("double")
    val rows = binned.crossJoin(broadcast(tot))
      .select(col("bin"), big(col("nb")).as("n_base"), big(col("nc")).as("n_cur"),
        round(p, 6).as("p_base"), round(q, 6).as("p_cur"),
        round((p - q) * log(p / q), 6).cast(dec6).as("c6"))
    val total = rows.agg(big(sum(col("n_base"))).as("n_base"),
      big(sum(col("n_cur"))).as("n_cur"))
      .select(lit(-1L).as("bin"), col("n_base"), col("n_cur"),
        lit(null).cast("double").as("p_base"),
        lit(null).cast("double").as("p_cur"),
        lit(null).cast(dec6).as("c6"))
    val psi = rows.agg(round(sum(col("c6")).cast("double"), 6).as("psi"))
    rows.unionByName(total)
      .crossJoin(broadcast(psi))
      .select(col("bin"), col("n_base"), col("n_cur"), col("p_base"),
        col("p_cur"), col("c6").cast("double").as("contribution"),
        when(col("bin") === -1L, col("psi")).otherwise(lit(null).cast("double"))
          .as("psi"))
      .orderBy(col("bin"))
  }

  /** Q340: stratified average treatment effect — q327's matching question
    * answered by STRATIFICATION instead: orders bucketed by total price
    * (500.00-wide strata), the per-stratum treated-vs-control line-count
    * difference weighted by stratum mass over the strata holding BOTH
    * arms, reported against the confounded naive difference. The other
    * standard observational estimator, one aggregate instead of a join —
    * the cheaper tool when strata are dense.
    *
    * Determinism: per-stratum terms are integer-exact ratios 6-dp-rounded
    * into dec6 before the exact weighted sum; coverage counts are plain
    * integers.
    */
  def q340StratifiedAte: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val items = Tables(s, d, "lineitem").groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("y"))
    val ord = Tables(s, d, "orders")
      .select(col("o_orderkey"),
        (col("o_orderpriority") === "1-URGENT").as("tr"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      .join(items, col("o_orderkey") === col("l_orderkey"))
    val strata = ord
      .groupBy(expr("cents div 50000").as("stratum"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("tr"), 1L).otherwise(0L)).as("nt"),
        sum(when(col("tr"), col("y")).otherwise(0L)).as("syt"),
        sum(when(!col("tr"), col("y")).otherwise(0L)).as("syc"))
    val used = strata.filter(col("nt") > 0L && col("nt") < col("n"))
    val nUsed = used.agg(sum(col("n")).as("nu"),
      count(lit(1)).as("k_used"))
    val terms = used.crossJoin(broadcast(nUsed))
      .select(round(col("n").cast("double") / col("nu").cast("double")
        * (col("syt").cast("double") / col("nt").cast("double")
          - col("syc").cast("double") / (col("n") - col("nt")).cast("double")), 6)
        .cast(dec6).as("c6"))
      .agg(sum(col("c6")).cast("double").as("ate"))
    val glob = ord.agg(count(lit(1)).as("n"),
      sum(when(col("tr"), 1L).otherwise(0L)).as("nt"),
      sum(when(col("tr"), col("y")).otherwise(0L)).as("syt"),
      sum(when(!col("tr"), col("y")).otherwise(0L)).as("syc"))
    val kAll = strata.agg(count(lit(1)).as("k_all"))
    glob.crossJoin(broadcast(terms)).crossJoin(broadcast(nUsed))
      .crossJoin(broadcast(kAll))
      .select(big(col("n")).as("n_orders"), big(col("nt")).as("n_treated"),
        round(col("syt").cast("double") / col("nt").cast("double")
          - col("syc").cast("double") / (col("n") - col("nt")).cast("double"), 6)
          .as("naive_diff"),
        big(col("k_all")).as("n_strata"), big(col("k_used")).as("n_strata_used"),
        round(col("nu").cast("double") / col("n").cast("double"), 6)
          .as("coverage"),
        round(col("ate"), 6).as("ate_strat"))
  }

  /** Q341: group-sequential monitoring with O'Brien–Fleming boundaries —
    * the interim-analysis discipline: the experiment (portable-hash
    * 50/50 arms, outcome = order has ≥4 line items) is peeked at five
    * calendar looks, each with the cumulative pooled two-proportion z
    * against the OBF boundary 2.04·√(K/k), which spends almost no alpha
    * early. Under this null experiment (arms independent of outcome by
    * construction) NO look should cross — the no-false-stop property the
    * spec pins; a naive fixed 1.96 at every look would false-stop ~14%
    * of the time.
    *
    * Scale shape: looks are CALENDAR spans (integer arithmetic on the
    * date range — no global row window); one (look × arm) aggregate,
    * cumulative sums over the 5-row collapse, one fixed IEEE tree per
    * look.
    */
  def q341GroupSequential: Q = (s, d) => {
    val items = Tables(s, d, "lineitem").groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("ly"))
    val ord = Tables(s, d, "orders")
      .select(col("o_orderkey"),
        col("o_orderdate").cast("timestamp").cast("long").as("t"))
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("t"), (col("ly") >= 4L).as("y"),
        (TrainingOps.portableBucket(col("o_orderkey")) % 2 === 0).as("armA"))
    val rng = ord.agg(min(col("t")).as("t0"), max(col("t")).as("t1"))
    val looks = ord.crossJoin(broadcast(rng))
      .select(least(lit(4L), (lit(5L) * (col("t") - col("t0")))
        .cast("long") / (col("t1") - col("t0") + 1L)).cast("long").as("lk"),
        col("y"), col("armA"))
      .groupBy(col("lk"))
      .agg(sum(when(col("armA"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("armA"), 1L).otherwise(0L)).as("nb"),
        sum(when(col("armA") && col("y"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("armA") && col("y"), 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy(col("lk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = looks.select((col("lk") + 1L).as("k"),
      sum(col("na")).over(w).as("na"), sum(col("nb")).over(w).as("nb"),
      sum(col("ca")).over(w).as("ca"), sum(col("cb")).over(w).as("cb"))
    val p1 = col("ca").cast("double") / col("na").cast("double")
    val p2 = col("cb").cast("double") / col("nb").cast("double")
    val pp = (col("ca") + col("cb")).cast("double") /
      (col("na") + col("nb")).cast("double")
    val se = sqrt(pp * (lit(1.0) - pp)
      * (lit(1.0) / col("na").cast("double") + lit(1.0) / col("nb").cast("double")))
    val bd = lit(2.04) * sqrt(lit(5.0) / col("k").cast("double"))
    cum.select(big(col("k")).as("look"), big(col("na")).as("n_a"),
      big(col("nb")).as("n_b"), big(col("ca")).as("conv_a"),
      big(col("cb")).as("conv_b"),
      round((p1 - p2) / se, 6).as("z"),
      round(bd, 6).as("boundary"),
      (abs(round((p1 - p2) / se, 6)) > round(bd, 6)).as("crossed"))
      .orderBy(col("look"))
  }

  /** Q346: deterministic permutation test — the assumption-free
    * significance check for the arm difference in mean event value: 32
    * pseudo-permutations re-deal the arm labels by an id-shifted MINSTD
    * chain (the q263 deterministic-resampling discipline), and the
    * add-one p-value counts permuted |diffs| at least as extreme as the
    * observed one. The test to reach for when q178's Welch normality
    * assumption is in doubt.
    *
    * Scale shape: one 32-way rep explode into a single map-side-combined
    * (rep × arm) aggregate — the declared 32× scan cost; diffs are exact
    * decimal sums with one IEEE division each; the extreme count is an
    * integer compare over the 32-row summary.
    */
  def q346PermutationTest: Q = (s, d) => {
    val p = 2147483647L
    val ev = Tables.events(s, d)
      .select(col("event_id"), dec(col("value")).as("v"))
    val obs = ev
      .select((TrainingOps.portableBucket(col("event_id")) % 2 === 0).as("a"),
        col("v"))
      .groupBy(col("a"))
      .agg(count(lit(1)).cast("long").as("n"), sum(col("v")).as("sv"))
    val reps = s.range(1L, 33L).toDF("rep")
    val permArm = pmod((pmod(pmod(col("event_id") + col("rep"), lit(p))
      * 48271L, lit(p)) + 1L) * 16807L, lit(p)) % 2 === 0
    // fan out the 32×|events| permutation grid: the events scan is one
    // task (single row group — the BENCH.md one-row-group-scan trap), so
    // the hash-chain + 32-rep expansion ran single-threaded (measured
    // 1.5 s in one task at sf0.1 — opt r14); the aggregate is map-side
    // partial so the repartition adds no extra pass
    val perm = ev
      .repartition(s.sparkContext.defaultParallelism, col("event_id"))
      .crossJoin(broadcast(reps))
      .select(col("rep"), permArm.as("a"), col("v"))
      .groupBy(col("rep"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).cast("long").as("pna"),
        sum(when(col("a"), col("v"))).as("psva"),
        sum(when(!col("a"), 1L).otherwise(0L)).cast("long").as("pnb"),
        sum(when(!col("a"), col("v"))).as("psvb"))
    permutationReport(perm, obs)
  }

  /** The permutation-test report from the two mergeable summaries — the
    * per-rep (counts, exact decimal sums) relation and the observed-arm
    * relation; both merge by per-cell sum, which is what q354's streaming
    * fold relies on.
    */
  private[graft] def permutationReport(perm: DataFrame,
      obs: DataFrame): DataFrame = {
    val diff = perm.select(
      (col("psva").cast("double") / col("pna").cast("double")
        - col("psvb").cast("double") / col("pnb").cast("double")).as("diff"))
    val oa = obs.filter(col("a"))
      .select(col("n").as("na"), col("sv").as("sva"))
    val ob = obs.filter(!col("a"))
      .select(col("n").as("nb"), col("sv").as("svb"))
    val o = oa.crossJoin(broadcast(ob))
      .select(col("na"), col("nb"),
        (col("sva").cast("double") / col("na").cast("double")
          - col("svb").cast("double") / col("nb").cast("double")).as("dobs"),
        (col("sva").cast("double") / col("na").cast("double")).as("ma"),
        (col("svb").cast("double") / col("nb").cast("double")).as("mb"))
    val ext = diff.crossJoin(broadcast(o))
      .agg(sum(when(abs(col("diff")) >= abs(col("dobs")), 1L).otherwise(0L))
        .cast("long").as("n_extreme"))
    o.crossJoin(broadcast(ext))
      .select(big(col("na")).as("n_a"), big(col("nb")).as("n_b"),
        round(col("ma"), 6).as("mean_a"), round(col("mb"), 6).as("mean_b"),
        round(col("dobs"), 6).as("diff_obs"),
        lit(32L).as("n_perms"), big(col("n_extreme")).as("n_extreme"),
        round((col("n_extreme") + 1L).cast("double") / lit(33.0), 6)
          .as("p_value"))
  }

  /** Q352: James–Stein / empirical-Bayes rate shrinkage — per-segment
    * URGENT-selection rates partially pooled toward the grand rate, with
    * the shrink weight B_s = σ²_s/(σ²_s + τ̂²) derived from the data
    * itself (method-of-moments between-group variance, clamped at 0).
    * Small segments shrink hard, big ones barely move — q306's fixed-m
    * target encoding with the smoothing STRENGTH estimated instead of
    * declared. The estimator every per-slice dashboard should apply
    * before ranking slices by rate.
    *
    * Determinism: counts are exact integers; τ̂², B_s and the shrunk rates
    * are one fixed IEEE tree over the bounded 5-segment summary.
    */
  def q352JamesStein: Q = (s, d) => {
    val pos = Tables(s, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val per = Tables(s, d, "customer")
      .join(pos, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_custkey").isNotNull, 1L).otherwise(0L)).as("y"))
    val tot = per.agg(sum(col("n")).as("nt"), sum(col("y")).as("yt"),
      count(lit(1)).as("k"))
    val pbar = col("yt").cast("double") / col("nt").cast("double")
    val ps = col("y").cast("double") / col("n").cast("double")
    val sigma2 = pbar * (lit(1.0) - pbar) / col("n").cast("double")
    val j = per.crossJoin(broadcast(tot))
    // the two 5-term sums are rounded into exact decimals first (12 dp) so
    // accumulation order cannot flip a bit between engines
    val dec12s = DecimalType(20, 12)
    val tau2rel = j.agg(
      (sum(round((ps - pbar) * (ps - pbar), 12).cast(dec12s)).cast("double")
        / (max(col("k")).cast("double") - lit(1.0))
        - sum(round(sigma2, 12).cast(dec12s)).cast("double")
        / max(col("k")).cast("double"))
        .as("tau2raw"))
      .select(greatest(col("tau2raw"), lit(0.0)).as("tau2"))
    j.crossJoin(broadcast(tau2rel))
      .select(col("c_mktsegment"), big(col("n")).as("n"), big(col("y")).as("y"),
        round(ps, 6).as("raw_rate"),
        round(pbar, 6).as("grand_rate"),
        round(sigma2 / (sigma2 + col("tau2")), 6).as("shrink_b"),
        round(pbar + (lit(1.0) - sigma2 / (sigma2 + col("tau2")))
          * (ps - pbar), 6).as("shrunk_rate"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q353: delta-method CI for the q328 ratio metric — the closed-form
    * first-order variance `Var(R̂) ≈ Σ(y_u − R·x_u)² / ((n−1)·n·x̄²)` from
    * one pass of exact moments, against the same ±1.96 band. The cheap
    * estimator q328's jackknife validates: when they disagree, the
    * linearization is breaking and the resampling number is the one to
    * trust.
    *
    * Determinism: y carries ≤2 true decimals so y² has ≤4 — every moment
    * is an exact decimal/integer sum with the provably exact (38,4) cut —
    * and the CI is one fixed IEEE tree.
    */
  def q353DeltaMethod: Q = (s, d) => {
    val per = Tables.events(s, d).groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", dec(col("value")))
        .otherwise(dec(lit(0)))).as("yu"),
        count(lit(1)).as("xu"))
    val m = per.agg(count(lit(1)).as("n"),
      sum(col("yu")).cast(DecimalType(38, 4)).cast("double").as("sy"),
      sum(col("xu")).cast("long").as("sx"),
      sum(col("yu") * col("yu")).cast(DecimalType(38, 4)).cast("double")
        .as("syy"),
      sum(col("yu") * col("xu")).cast(DecimalType(38, 4)).cast("double")
        .as("syx"),
      sum(col("xu") * col("xu")).cast("long").as("sxx"))
    val nD = col("n").cast("double")
    val r = col("sy") / col("sx").cast("double")
    val xbar = col("sx").cast("double") / nD
    val ssr = col("syy") - lit(2.0) * r * col("syx") +
      r * r * col("sxx").cast("double")
    val se = sqrt(ssr / (nD - lit(1.0)) / nD / (xbar * xbar))
    m.select(big(col("n")).as("n_users"), big(col("sx")).as("n_events"),
      round(r, 6).as("ratio"),
      round(se, 6).as("se_delta"),
      round(r - lit(1.96) * se, 6).as("ci_lo"),
      round(r + lit(1.96) * se, 6).as("ci_hi"))
  }

  /** Q355: Laplace-mechanism release plumbing — per-nation customer counts
    * with inverse-CDF Laplace noise at ε = 0.5 (sensitivity 1 for a count),
    * the ε accounting columns a privacy ledger records. The DRAW here is a
    * seeded deterministic PRG keyed by the cell (the testability harness —
    * a production release keys the same PRG from a secret seed; the
    * mechanism arithmetic, clamping and accounting are exactly what ships).
    *
    * Determinism: u = (h + 0.5)/p from the MINSTD chain, noise =
    * −b·sign(u−½)·ln(1−2|u−½|) as one fixed IEEE tree, 6-dp-rounded;
    * released = max(0, true + noise) — the standard post-processing clamp.
    */
  def q355LaplaceMechanism: Q = (s, d) => {
    val p = 2147483647L
    val per = Tables(s, d, "customer")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("c"))
    val h = pmod((pmod(pmod(col("c_nationkey"), lit(p)) * 48271L, lit(p))
      + 1L) * 16807L, lit(p))
    val u = (h.cast("double") + lit(0.5)) / lit(2147483647.0)
    val b = lit(2.0) // 1/epsilon, epsilon = 0.5, sensitivity 1
    val noise = round(-b * signum(u - lit(0.5))
      * log(lit(1.0) - lit(2.0) * abs(u - lit(0.5))), 6)
    per.select(big(col("c_nationkey")).as("nation"),
      big(col("c")).as("true_count"),
      noise.as("noise"),
      round(greatest(col("c").cast("double") + noise, lit(0.0)), 6)
        .as("released_count"),
      lit(0.5).as("epsilon"), lit(1L).as("sensitivity"))
      .orderBy(col("nation"))
  }

  /** One complementary-suppression pass over the bounded grid: any GROUP
    * (row or column) left with exactly one suppressed cell also hides its
    * smallest published cell (count asc, key asc), or the lone suppression
    * is recoverable from the group marginal.
    */
  private def suppressPass(df: DataFrame, groupCol: String, keyCol: String,
      label: String): DataFrame = {
    val wg = Window.partitionBy(col(groupCol))
    // candidates must be published: suppressed sorts last (false < true),
    // so rank 1 in (suppressed, n, key) order is the smallest published cell
    val wp = Window.partitionBy(col(groupCol))
      .orderBy(col("suppressed"), col("n"), col(keyCol))
    df.withColumn("supN", sum(when(col("suppressed"), 1L).otherwise(0L)).over(wg))
      .withColumn("rkPub", row_number().over(wp))
      .withColumn("newly",
        col("supN") === 1L && !col("suppressed") && col("rkPub") === 1L)
      .select(df.columns.map(col) :+
        when(col("newly"), lit(label)).as("newReason"): _*)
      .withColumn("reason", coalesce(col("reason"), col("newReason")))
      .withColumn("suppressed", col("suppressed") || col("newReason").isNotNull)
      .drop("newReason")
  }

  /** Q356: small-cell suppression with complementary protection — the
    * statistical-disclosure-control step before publishing the
    * nation × segment count grid: cells under 7 are hidden (primary), and
    * four alternating row/column passes hide the smallest published cell
    * of any group left with a LONE suppression — otherwise the marginal
    * arithmetic re-reveals it. The declared pass schedule (row, col, row,
    * col) is part of the contract; the spec asserts no singleton group
    * survives it on this grid.
    *
    * Scale shape: everything after the one keyed count runs on the
    * bounded 25 × 5 grid.
    */
  def q356CellSuppression: Q = (s, d) => {
    val grid = Tables(s, d, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .withColumn("suppressed", col("n") < 7L)
      .withColumn("reason",
        when(col("n") < 7L, lit("primary")).otherwise(lit(null).cast("string")))
    val p1 = suppressPass(grid, "c_nationkey", "c_mktsegment", "row_comp_1")
    val p2 = suppressPass(p1, "c_mktsegment", "c_nationkey", "col_comp_1")
    val p3 = suppressPass(p2, "c_nationkey", "c_mktsegment", "row_comp_2")
    val p4 = suppressPass(p3, "c_mktsegment", "c_nationkey", "col_comp_2")
    p4.select(big(col("c_nationkey")).as("nation"), col("c_mktsegment"),
      big(col("n")).as("n"), col("suppressed"),
      coalesce(col("reason"), lit("published")).as("reason"))
      .orderBy(col("nation"), col("c_mktsegment"))
  }

  /** Q357: Nelson–Aalen cumulative hazard — the q210 survival grid's
    * other standard estimator: H(t) = Σ_{i≤t} d_i/n_i over the same
    * monthly duration grid, censoring handled identically. Where KM gives
    * survival probability, the cumulative hazard is the quantity hazard-
    * ratio models are built on — reported together they bracket the
    * churn story.
    *
    * Determinism: per-duration hazard terms are 6-dp-rounded decimals
    * summed EXACTLY by the cumulative window (the q210 discipline);
    * risk sets are pure prefix integers over the bounded duration grid.
    */
  def q357NelsonAalen: Q = (s, d) => {
    def mIdx(c: Column) = (year(c) * 12 + month(c)).cast("long")
    val per = Tables(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(mIdx(col("o_orderdate"))).as("m0"),
        max(mIdx(col("o_orderdate"))).as("ml"))
    val horizon = per.agg(max(col("ml")).as("mmax"))
    val durs = per.crossJoin(broadcast(horizon))
      .select(
        when(col("mmax") - col("ml") > 6, col("ml") - col("m0"))
          .otherwise(col("mmax") - col("m0")).as("dur"),
        when(col("mmax") - col("ml") > 6, 1L).otherwise(0L).as("death"))
    val grid = durs.groupBy(col("dur"))
      .agg(sum(col("death")).as("n_deaths"),
        sum(lit(1L) - col("death")).as("n_censored"))
    val w = Window.orderBy(col("dur"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec6 = DecimalType(18, 6)
    grid
      .withColumn("total", sum(col("n_deaths") + col("n_censored")).over(wAll))
      .withColumn("n_risk", col("total")
        - coalesce(sum(col("n_deaths") + col("n_censored")).over(wPrev), lit(0L)))
      .withColumn("h6",
        round(col("n_deaths").cast("double") / col("n_risk").cast("double"), 6)
          .cast(dec6))
      .withColumn("ch", sum(col("h6")).over(wCum))
      .select(big(col("dur")).as("dur_months"), big(col("n_risk")).as("n_risk"),
        big(col("n_deaths")).as("n_deaths"),
        big(col("n_censored")).as("n_censored"),
        col("h6").cast("double").as("hazard"),
        round(col("ch").cast("double"), 6).as("cum_hazard"))
      .orderBy(col("dur_months"))
  }

  /** Q359: Qini uplift curve — cumulative incremental conversions when
    * "treating" the top score-deciles first: at each decile of the
    * o_totalprice ranking, Qini(d) = Y_t(d) − Y_c(d)·N_t(d)/N_c(d)
    * (treated conversions beyond the scaled control), against the
    * straight-line random-targeting baseline. The uplift-model eval that
    * decides whether a targeting score beats mailing everyone; here the
    * price score is the audited candidate and URGENT priority the
    * treatment.
    *
    * Scale shape: one (score-bucket) collapse with cumulative sums over
    * the bounded bucket grid DESC, decile picks via the q312 crossing
    * rule (cum·10 ≥ d·N on the strictly increasing prefix), all integer
    * until the final scaled-control subtraction.
    */
  def q359QiniCurve: Q = (s, d) => {
    val items = Tables(s, d, "lineitem").groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("ly"))
    val ord = Tables(s, d, "orders")
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_orderpriority") === "1-URGENT").as("tr"),
        (col("ly") >= 4L).as("y"),
        ((dec(col("o_totalprice")) * 100).cast("long") / 1000L).cast("long")
          .as("b"))
    val grid = ord.groupBy(col("b")).agg(
      count(lit(1)).as("n"),
      sum(when(col("tr"), 1L).otherwise(0L)).as("nt"),
      sum(when(col("tr") && col("y"), 1L).otherwise(0L)).as("yt"),
      sum(when(!col("tr"), 1L).otherwise(0L)).as("nc"),
      sum(when(!col("tr") && col("y"), 1L).otherwise(0L)).as("yc"))
    val w = Window.orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NOTE (opt r14): materializing `cum` for its two consumers was
    // measured WORSE (2.12→2.76 s same-mix A/B) — the localCheckpoint job
    // costs more than the re-run it saves; left as-is on purpose.
    val cum = grid.select(
      sum(col("n")).over(w).as("cn"), sum(col("nt")).over(w).as("cnt"),
      sum(col("yt")).over(w).as("cyt"), sum(col("nc")).over(w).as("cnc"),
      sum(col("yc")).over(w).as("cyc"))
    val tot = grid.agg(sum(col("n")).as("nn"))
    val decs = s.range(1, 11).toDF("dd")
    val picks = cum.crossJoin(broadcast(tot)).crossJoin(broadcast(decs))
      .filter(col("cn") * 10L >= col("dd") * col("nn"))
      .groupBy(col("dd")).agg(min(col("cn")).as("cn"))
    val at = picks.join(cum.crossJoin(broadcast(tot)), Seq("cn"))
    val qini = when(col("cnc") === 0L, col("cyt").cast("double"))
      .otherwise(col("cyt").cast("double") - col("cyc").cast("double")
        * col("cnt").cast("double") / col("cnc").cast("double"))
    val full = at.filter(col("dd") === 10L)
      .select(qini.as("qtot"))
    at.crossJoin(broadcast(full))
      .select(big(col("dd")).as("decile"), big(col("cn")).as("n_cum"),
        big(col("cnt")).as("nt_cum"), big(col("cyt")).as("yt_cum"),
        big(col("cnc")).as("nc_cum"), big(col("cyc")).as("yc_cum"),
        round(qini, 6).as("qini"),
        round(qini - col("qtot") * col("dd").cast("double") / lit(10.0), 6)
          .as("above_random"))
      .orderBy(col("decile"))
  }

  /** Q342: Mann–Kendall trend test — is hourly traffic monotonically
    * trending, per event type, judged nonparametrically? S sums the
    * signs of all hour-pair count differences (EXACT integers over the
    * bounded hourly collapse — never the events), the variance carries
    * the full tie correction, and the continuity-corrected z flags
    * trends at 1.96. The test a capacity-planning review runs where
    * q279's Theil–Sen gives the slope.
    *
    * Scale shape: the pair join is hourly-summary × hourly-summary per
    * type (time-span bounded, the q297 argument); everything else is
    * keyed aggregates.
    */
  def q342MannKendall: Q = (s, d) =>
    mkReport(Tables.events(s, d)
      .select(col("event_type"), expr("CAST(ts2 AS LONG) div 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c")))

  /** The Mann–Kendall report from a (event_type, h, c) hourly summary —
    * the mergeable state q348's streaming fold relies on (hourly counts
    * of disjoint row sets merge by per-cell sum).
    */
  private[graft] def mkReport(hourly: DataFrame): DataFrame = {
    val a = hourly.select(col("event_type"), col("h").as("h1"), col("c").as("c1"))
    val b = hourly.select(col("event_type"), col("h").as("h2"), col("c").as("c2"))
    val sRel = a.join(b, Seq("event_type"))
      .filter(col("h1") < col("h2"))
      .groupBy(col("event_type"))
      .agg(sum(signum((col("c2") - col("c1")).cast("double")).cast("long"))
        .as("sS"))
    val nRel = hourly.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val ties = hourly.groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L))
        .cast("long").as("tsum"))
    val vr = (col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L)
      - col("tsum")).cast("double") / lit(18.0)
    val z = when(col("sS") > 0L, (col("sS") - 1L).cast("double") / sqrt(vr))
      .when(col("sS") < 0L, (col("sS") + 1L).cast("double") / sqrt(vr))
      .otherwise(lit(0.0))
    sRel.join(nRel, Seq("event_type")).join(ties, Seq("event_type"))
      .select(col("event_type"), big(col("n")).as("n_hours"),
        big(col("sS")).as("s"),
        round(vr, 6).as("var_s"),
        round(z, 6).as("z"),
        (abs(round(z, 6)) > lit(1.96)).as("trending"))
      .orderBy(col("event_type"))
  }

  /** Q344: quantile treatment effects — the q340 ATE question asked at
    * every decile: urgent vs non-urgent order-value distributions
    * compared at d10…d90 (10.00-resolution value buckets, declared), the
    * readout that shows WHERE in the distribution a treatment acts when
    * the mean hides it.
    *
    * Scale shape: per-arm cumulative windows run over the bounded
    * (arm × 10.00-bucket) collapse — bounded by the price domain, not
    * rows (the q312 decile-pick discipline) — and the 9 deciles join on
    * the 9-row broadcast.
    */
  def q344Qte: Q = (s, d) => {
    val ord = Tables(s, d, "orders")
      .select((col("o_orderpriority") === "1-URGENT").as("tr"),
        ((dec(col("o_totalprice")) * 100).cast("long") / 1000L).cast("long")
          .as("b"))
      .groupBy(col("tr"), col("b")).agg(count(lit(1)).as("c"))
    val decs = s.range(1, 10).toDF("dd")
    val w = Window.partitionBy(col("tr")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = ord.select(col("tr"), col("b"), sum(col("c")).over(w).as("cum"))
    val tot = ord.groupBy(col("tr")).agg(sum(col("c")).as("n"))
    val qs = cum.join(broadcast(tot), Seq("tr"))
      .crossJoin(broadcast(decs))
      .filter(col("cum") * 10L >= col("dd") * col("n"))
      .groupBy(col("tr"), col("dd"))
      .agg(min(col("b")).as("qb"))
    val t = qs.filter(col("tr")).select(col("dd"), col("qb").as("qt"))
    val c = qs.filter(!col("tr")).select(col("dd"), col("qb").as("qc"))
    t.join(c, Seq("dd"))
      .select(big(col("dd")).as("decile"),
        round(col("qt").cast("double") * 10.0, 2).as("q_treated"),
        round(col("qc").cast("double") * 10.0, 2).as("q_control"),
        round((col("qt") - col("qc")).cast("double") * 10.0, 2).as("qte"))
      .orderBy(col("decile"))
  }

  /** Q334: Cohen's d effect sizes for every event-type pair — the
    * magnitude companion to q297's KS decision: pooled-SD standardized
    * mean difference from EXACT decimal moments (2-dp values → 4-dp
    * squares, both sums exact), one fixed tree through the final sqrt
    * and division. The "is the difference big enough to matter?" readout
    * an experimentation review demands next to any p-value.
    *
    * Scale shape: one map-side-combined per-type moment aggregate; the
    * 5×5 pair build is a bounded broadcast self-join (q297's shape).
    */
  def q334CohensD: Q = (s, d) => {
    val mom = Tables.events(s, d)
      .select(col("event_type"), dec12(col("value")).as("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).cast(DecimalType(38, 4)).cast("double").as("sy"),
        sum(col("v") * col("v")).cast(DecimalType(38, 4)).cast("double")
          .as("syy"))
    val a = mom.select(col("event_type").as("type_a"), col("n").as("na"),
      col("sy").as("sya"), col("syy").as("syya"))
    val b = mom.select(col("event_type").as("type_b"), col("n").as("nb"),
      col("sy").as("syb"), col("syy").as("syyb"))
    val va = (col("syya") - col("sya") * col("sya") / col("na").cast("double")) /
      (col("na").cast("double") - lit(1.0))
    val vb = (col("syyb") - col("syb") * col("syb") / col("nb").cast("double")) /
      (col("nb").cast("double") - lit(1.0))
    val sp = sqrt(((col("na").cast("double") - lit(1.0)) * va
      + (col("nb").cast("double") - lit(1.0)) * vb)
      / (col("na").cast("double") + col("nb").cast("double") - lit(2.0)))
    a.crossJoin(broadcast(b))
      .filter(col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"), big(col("na")).as("n_a"),
        big(col("nb")).as("n_b"),
        round(col("sya") / col("na").cast("double"), 6).as("mean_a"),
        round(col("syb") / col("nb").cast("double"), 6).as("mean_b"),
        round((col("sya") / col("na").cast("double")
          - col("syb") / col("nb").cast("double")) / sp, 6).as("cohens_d"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Q324: pinball-loss quantile evaluation — fit P50/P90 per event type
    * on the portable-hash FIT half (exact ⌈q·(n+1)⌉ ranks under the
    * (value, event_id) total order — q313's pick), score them on the
    * disjoint EVAL half with the quantile loss a forecasting pipeline is
    * actually graded on, plus the empirical coverage of each pick. The
    * q313 interval story at specific quantiles instead of a symmetric
    * band.
    *
    * Determinism: pinball terms are INTEGER-SCALED exact decimals —
    * 10·Lq = qn·(y−ŷ)⁺ + (10−qn)·(ŷ−y)⁺ with qn ∈ {5,9}, values carry ≤2
    * true decimals so the (38,4) cut is exact — one division per reported
    * loss.
    *
    * Scale shape: one rank window per type on the fit half; the 5-row
    * (type → qhat50, qhat90) summary broadcasts onto one eval-half
    * aggregate.
    */
  def q324Pinball: Q = (s, d) => {
    val bk = TrainingOps.portableBucket(col("event_id"))
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("event_id"), col("value"),
        (bk < 5000).as("isFit"))
    val wr = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val fit = ev.filter(col("isFit"))
      .withColumn("rn", row_number().over(wr).cast("long"))
    val nfit = fit.groupBy(col("event_type")).agg(max(col("rn")).as("nf"))
    val qh = fit.join(broadcast(nfit), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("nf")).as("n_fit"),
        max(when(col("rn") ===
          least(expr("(5 * (nf + 1) + 9) div 10"), col("nf")), col("value")))
          .as("qhat50"),
        max(when(col("rn") ===
          least(expr("(9 * (nf + 1) + 9) div 10"), col("nf")), col("value")))
          .as("qhat90"))
    val y = dec(col("value"))
    def pin(qn: Int, qhat: Column): Column = {
      val h = dec(qhat)
      sum(when(y >= h, lit(qn) * (y - h)).otherwise(lit(10 - qn) * (h - y)))
        .cast(org.apache.spark.sql.types.DecimalType(38, 4)).cast("double")
    }
    ev.filter(!col("isFit"))
      .join(broadcast(qh), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(big(max(col("n_fit"))).as("n_fit"),
        big(count(lit(1))).as("n_eval"),
        round(max(col("qhat50")), 6).as("qhat50"),
        round(max(col("qhat90")), 6).as("qhat90"),
        round(pin(5, col("qhat50")) / 10.0 / count(lit(1)).cast("double"), 6)
          .as("loss50"),
        round(pin(9, col("qhat90")) / 10.0 / count(lit(1)).cast("double"), 6)
          .as("loss90"),
        round(sum(when(col("value") <= col("qhat90"), lit(1L))
          .otherwise(lit(0L))).cast("double") / count(lit(1)).cast("double"), 6)
          .as("cover90"))
      .orderBy(col("event_type"))
  }

  /** Q325: disparate-impact audit (the four-fifths rule) — per market
    * segment, the share of customers with an URGENT-priority order,
    * each segment's selection rate RATIOED against the most-selected
    * segment, flagged under 0.8. The fairness gate a selection pipeline
    * runs per protected group; exact integer counts, two IEEE divisions
    * in one shared tree.
    *
    * Scale shape: one distinct on the filtered fact side, one keyed
    * count join, a 5-row summary and its 1-row max broadcast.
    */
  def q325DisparateImpact: Q = (s, d) => {
    val pos = Tables(s, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val per = Tables(s, d, "customer")
      .join(pos, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_custkey").isNotNull, 1L).otherwise(0L)).as("np"))
      .withColumn("rate", col("np").cast("double") / col("n").cast("double"))
    val mx = per.agg(max(col("rate")).as("max_rate"))
    per.crossJoin(broadcast(mx))
      .select(col("c_mktsegment"), big(col("n")).as("n"),
        big(col("np")).as("n_selected"),
        round(col("rate"), 6).as("rate"),
        round(col("rate") / col("max_rate"), 6).as("di_ratio"),
        (round(col("rate") / col("max_rate"), 6) < lit(0.8)).as("below_four_fifths"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q263: deterministic Poisson bootstrap — a 32-replicate confidence
    * interval for mean document length WITHOUT an RNG: each (doc,
    * replicate) pair draws its resample weight from
    * [[TrainingOps.portableBucket]] (the MINSTD arithmetic hash every
    * engine can replicate) mapped through the Poisson(1) inverse CDF with
    * FIXED cut points (⌊cum·10⁴⌋: 3679, 7358, 9197, 9810, 9963, 9994,
    * 9999 — the declared constants, so the draw is a pure function of
    * (doc_id, replicate) and survives any repartitioning, unlike
    * rand(seed)). Replicate means are exact integer sums surfaced as
    * 6-dp doubles; the report is the percentile interval (2nd / 16th /
    * 31st order statistics of 32) next to the full-sample point estimate.
    *
    * Scale shape: one explode×32 pass with a map-side-combined 32-key
    * aggregate — the classic Poisson-bootstrap trick that makes resampling
    * a single scan instead of 32; the order statistics run on the bounded
    * 32-row relation.
    */
  def q263BootstrapCi: Q = (s, d) => {
    val cuts = Seq(3679L, 7358L, 9197L, 9810L, 9963L, 9994L, 9999L)
    val docs = Tables(s, d, "documents").select(col("doc_id"), col("n_chars"))
    val bk = TrainingOps.portableBucket(col("doc_id") * 100L + col("b"))
    val w = cuts.zipWithIndex.tail
      .foldLeft(when(bk < cuts.head, lit(0L))) { case (acc, (c, i)) =>
        acc.when(bk < c, lit(i.toLong))
      }.otherwise(lit(7L))
    val means = docs
      .withColumn("b", explode(sequence(lit(0L), lit(31L))))
      .withColumn("w", w)
      .groupBy(col("b"))
      .agg(round(sum(col("w") * col("n_chars")).cast("double")
        / sum(col("w")).cast("double"), 6).as("m"))
    val arr = means.agg(sort_array(collect_list(col("m"))).as("ms"))
    val pt = docs.agg(round(sum(col("n_chars")).cast("double")
      / count(lit(1)).cast("double"), 6).as("point_estimate"))
    arr.crossJoin(broadcast(pt))
      .select(lit(32L).as("n_replicates"), col("point_estimate"),
        element_at(col("ms"), 2).as("ci_lo"),
        element_at(col("ms"), 16).as("ci_median"),
        element_at(col("ms"), 31).as("ci_hi"))
  }

  /** Q266: chi-square independence test + Cramér's V over q216's
    * (event_type × hour-of-day) contingency grid — the effect-size summary
    * next to q216's per-type mutual information: χ² = Σ (observed −
    * expected)²/expected over the bounded cell grid, V = √(χ²/(n·min(r−1,
    * c−1))) ∈ [0,1]. Per-cell terms are 6-dp-rounded into exact decimals
    * before the sum (the q216 discipline — a raw double sum over cells
    * would be partition-order dependent).
    *
    * Scale shape: identical to q216 — three keyed aggregates over one
    * event scan, then arithmetic on the ≤ |types|·24-cell grid with 1-row
    * broadcasts.
    */
  def q266CramersV: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val base = Tables.events(s, d)
      .select(col("event_type"), expr("pmod(CAST(ts2 AS LONG) div 3600, 24)").as("hr"))
    val cells = base.groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("nxy"))
    val byType = base.groupBy(col("event_type")).agg(count(lit(1)).as("nx"))
    val byHour = base.groupBy(col("hr")).agg(count(lit(1)).as("ny"))
    val tot = base.agg(count(lit(1)).as("nn"))
    val dims = byType.agg(count(lit(1)).as("r"))
      .crossJoin(broadcast(byHour.agg(count(lit(1)).as("c"))))
    val e = col("nx").cast("double") * col("ny").cast("double") /
      col("nn").cast("double")
    val term = round((col("nxy").cast("double") - e)
      * (col("nxy").cast("double") - e) / e, 6).cast(dec6)
    val a = cells.join(byType, Seq("event_type"))
      .join(broadcast(byHour), Seq("hr"))
      .crossJoin(broadcast(tot))
      .agg(sum(term).as("chis"), big(max(col("nn"))).as("n"),
        big(count(lit(1))).as("n_cells"))
    a.crossJoin(broadcast(dims))
      .select(col("n"), big(col("r")).as("r"), big(col("c")).as("c"),
        col("n_cells"),
        round(col("chis").cast("double"), 6).as("chi2"),
        round(sqrt(col("chis").cast("double")
          / (col("n").cast("double")
            * least(col("r") - 1, col("c") - 1).cast("double"))), 6)
          .as("cramers_v"))
  }

  /** Q273: joinable-key discovery — the data-catalog pass that finds WHICH
    * columns join: pairwise containment (|A∩B| / |A|, both directions) of
    * the distinct-value sets of every declared key-typed column across
    * the warehouse, reporting pairs where either direction reaches 0.5.
    * Finds the FK edges q187 audits without being told them — and any
    * accidental key overlap a migration introduced.
    *
    * Scale shape: ONE union of per-column distinct sets (each map-side
    * distinct), one value-keyed self-join whose fan-out is bounded by the
    * column count (≤ 14 tags per value ⇒ ≤ 91 pairs), two broadcast-size
    * count joins. Shuffle ∝ Σ distinct values, never rows².
    */
  def q273JoinDiscovery: Q = (s, d) => {
    val keyCols = Seq(
      ("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
      ("lineitem", "l_suppkey"), ("orders", "o_orderkey"),
      ("orders", "o_custkey"), ("customer", "c_custkey"),
      ("customer", "c_nationkey"), ("part", "p_partkey"),
      ("supplier", "s_suppkey"), ("nation", "n_nationkey"),
      ("nation", "n_regionkey"), ("region", "r_regionkey"),
      ("documents", "doc_id"), ("embeddings", "vec_id"))
    val sets = graft.Checkpoints.materialize(
      keyCols.map { case (t, c) =>
        Tables(s, d, t)
          .select(lit(s"$t.$c").as("cname"), col(c).cast("long").as("v"))
          .distinct()
      }.reduce(_ unionByName _))
    val counts = sets.groupBy(col("cname")).agg(count(lit(1)).as("n"))
    val inter = sets.select(col("cname").as("ca"), col("v"))
      .join(sets.select(col("cname").as("cb"), col("v")), Seq("v"))
      .filter(col("ca") < col("cb"))
      .groupBy(col("ca"), col("cb")).agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col("cname").as("ca"), col("n").as("na")), Seq("ca"))
      .join(counts.select(col("cname").as("cb"), col("n").as("nb")), Seq("cb"))
      .withColumn("containment_ab",
        round(col("inter").cast("double") / col("na").cast("double"), 6))
      .withColumn("containment_ba",
        round(col("inter").cast("double") / col("nb").cast("double"), 6))
      .filter(greatest(col("containment_ab"), col("containment_ba")) >= 0.5)
      .select(col("ca").as("col_a"), col("cb").as("col_b"),
        big(col("na")).as("n_a"), big(col("nb")).as("n_b"),
        big(col("inter")).as("n_common"),
        col("containment_ab"), col("containment_ba"))
      .orderBy(col("col_a"), col("col_b"))
  }

  /** Q279: Theil–Sen robust trend per order priority — the median of all
    * pairwise slopes between MONTHLY revenue points, per segment: the
    * trend estimate that survives the outlier months where q177's
    * least-squares line is dragged. Beside the slope, the Theil–Sen
    * intercept (median of `y − slope·x` over the months).
    *
    * Determinism: monthly revenue is an exact-decimal cents sum (BIGINT);
    * each pair slope is ONE IEEE division rounded to 6 dp; both medians
    * are LOWER medians picked by row_number under a total order — no
    * interpolation, no float accumulation.
    *
    * Scale shape: revenue collapses to the (priority × month) grid FIRST
    * (one keyed agg over orders), so the pair join is grid² per segment —
    * bounded by the calendar span (80 months ⇒ ≤3,160 pairs/segment at ANY
    * data volume), an equi-join on priority with an inequality residual,
    * never a row-level self-join. Median windows are priority-partitioned;
    * the slope join back is a ≤5-row broadcast.
    */
  def q279TheilSen: Q = (s, d) => {
    val monthly = Tables(s, d, "orders")
      .groupBy(col("o_orderpriority"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("x"))
      .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
        .cast("long").as("cents"))
    val grid = graft.Checkpoints.materialize(monthly)
    val a = grid.select(col("o_orderpriority"), col("x").as("x1"), col("cents").as("y1"))
    val b = grid.select(col("o_orderpriority"), col("x").as("x2"), col("cents").as("y2"))
    val pairs = a.join(b, Seq("o_orderpriority")).filter(col("x2") > col("x1"))
      .select(col("o_orderpriority"), col("x1"), col("x2"),
        round((col("y2") - col("y1")).cast("double")
          / (col("x2") - col("x1")).cast("double"), 6).as("slope"))
    val wp = Window.partitionBy(col("o_orderpriority"))
    val bySlope = wp.orderBy(col("slope"), col("x1"), col("x2"))
    val med = pairs
      .withColumn("rn", row_number().over(bySlope))
      .withColumn("cnt", count(lit(1)).over(wp))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("o_orderpriority"), col("cnt").as("n_pairs"), col("slope"))
    val resid = grid.join(broadcast(med), Seq("o_orderpriority"))
      .withColumn("r0", round(col("cents").cast("double")
        - col("slope") * col("x").cast("double"), 6))
    val byResid = wp.orderBy(col("r0"), col("x"))
    resid
      .withColumn("rn", row_number().over(byResid))
      .withColumn("nm", count(lit(1)).over(wp))
      .filter(col("rn") === expr("(nm + 1) div 2"))
      .select(col("o_orderpriority"), big(col("nm")).as("n_months"),
        big(col("n_pairs")).as("n_pairs"),
        col("slope").as("slope_cents_per_month"),
        col("r0").as("intercept_cents"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q281: difference-in-differences — the causal-inference workhorse for
    * "did the change help?": purchase-event value, treatment cohort =
    * even `user_id`, intervention at 2024-01-16 (the fixture's midpoint).
    * The estimate is the treated pre→post mean change MINUS the control
    * change — removing the shared time trend a naive before/after
    * comparison conflates.
    *
    * Determinism: cell sums are exact decimals; each cell mean is one IEEE
    * division rounded to 6 dp; the DiD estimate is pure arithmetic over
    * the four ROUNDED means (round-before-combine, the declared q277
    * convention).
    *
    * Scale shape: ONE conditional-aggregation scan over events — four
    * (sum, count) cell pairs in a single reduce, no join, no window, no
    * shuffle beyond the 1-row final agg.
    */
  def q281DiffInDiff: Q = (s, d) => {
    val e = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("value"), (col("user_id") % 2 === 0).as("t"),
        (col("ts2") >= lit("2024-01-16").cast("timestamp")).as("p"))
    val wide = e.agg(
      count(when(col("t") && !col("p"), 1)).as("n_pre_t"),
      round(sum(when(col("t") && !col("p"), dec(col("value")))).cast("double")
        / count(when(col("t") && !col("p"), 1)), 6).as("mean_pre_t"),
      count(when(col("t") && col("p"), 1)).as("n_post_t"),
      round(sum(when(col("t") && col("p"), dec(col("value")))).cast("double")
        / count(when(col("t") && col("p"), 1)), 6).as("mean_post_t"),
      count(when(!col("t") && !col("p"), 1)).as("n_pre_c"),
      round(sum(when(!col("t") && !col("p"), dec(col("value")))).cast("double")
        / count(when(!col("t") && !col("p"), 1)), 6).as("mean_pre_c"),
      count(when(!col("t") && col("p"), 1)).as("n_post_c"),
      round(sum(when(!col("t") && col("p"), dec(col("value")))).cast("double")
        / count(when(!col("t") && col("p"), 1)), 6).as("mean_post_c"))
    wide.select(col("n_pre_t"), col("mean_pre_t"), col("n_post_t"),
      col("mean_post_t"), col("n_pre_c"), col("mean_pre_c"),
      col("n_post_c"), col("mean_post_c"),
      round((col("mean_post_t") - col("mean_pre_t"))
        - (col("mean_post_c") - col("mean_pre_c")), 6).as("did_estimate"))
  }

  /** Q282: autocorrelation function — Pearson correlation of daily revenue
    * with itself at lags 1..7 days, the seasonality/momentum diagnostic
    * read before q236's seasonal-naive baseline is trusted (a high lag-7
    * ACF is WHY weekly seasonal-naive works). Pairs are taken over days
    * where both endpoints exist (no imputation — the choice is declared).
    *
    * Determinism: daily revenue is an exact DECIMAL(18,2) sum; per-lag
    * moments are exact decimal sums cast to double once (q177's moment
    * discipline); the Pearson ratio is one shared IEEE expression rounded
    * to 6 dp.
    *
    * Scale shape: orders collapse to the bounded day grid FIRST (one keyed
    * agg), the grid is materialized once, and the lag join is grid × 7 —
    * an equi-join on shifted day index, bounded by the calendar span at
    * any data volume. One 7-group aggregate finishes.
    */
  def q282Acf: Q = (s, d) => {
    // shared calendar-bounded day grid — memoized across the whole battery
    val grid = dailyRevenue(s, d)
    val lagged = grid
      .withColumn("lag", explode(array((1 to 7).map(l => lit(l.toLong)): _*)))
      .select(col("lag"), (col("x") + col("lag")).as("x2"), col("r").as("rx"))
    val pairs = lagged.join(
      grid.select(col("x").as("x2"), col("r").as("ry")), Seq("x2"))
    val m = pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("rx")).cast("double").as("sx"),
        sum(col("ry")).cast("double").as("sy"),
        sum(col("rx") * col("rx")).cast(DecimalType(38, 4)).cast("double").as("sxx"),
        sum(col("ry") * col("ry")).cast(DecimalType(38, 4)).cast("double").as("syy"),
        sum(col("rx") * col("ry")).cast(DecimalType(38, 4)).cast("double").as("sxy"))
    val nD = col("n_pairs").cast("double")
    m.select(col("lag"), col("n_pairs"),
      round((nD * col("sxy") - col("sx") * col("sy"))
        / sqrt((nD * col("sxx") - col("sx") * col("sx"))
          * (nD * col("syy") - col("sy") * col("sy"))), 6).as("acf"))
      .orderBy(col("lag"))
  }

  /** Q289: decile report — customers NTILE(10)-bucketed by exact total
    * spend within their market segment, with per-decile population, spend
    * range, and share of segment revenue: the classic value-segmentation
    * cut (and the shape of a training-data "quality decile" report).
    * Total order (spend, custkey) makes bucket assignment deterministic;
    * NTILE's first-(n mod 10)-buckets-get-one-extra split is ANSI
    * semantics in both engines.
    *
    * Scale shape: one map-side-combined per-customer aggregate, one
    * dimension join, then the rank window partitioned by segment — 5
    * bounded partitions of the CUSTOMER aggregate (not raw rows; the
    * q232/q102 defended shape). Shares stay in exact decimals through the
    * bounded 50-row window sum.
    */
  def q289NtileDeciles: Q = (s, d) => {
    val spend = Tables(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).cast(DecimalType(38, 4)).as("sp"))
    val seg = Tables(s, d, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("sp"), col("o_custkey"))
    val agg = spend.join(seg, col("o_custkey") === col("c_custkey"))
      .withColumn("decile", big(ntile(10).over(w)))
      .groupBy(col("c_mktsegment"), col("decile"))
      .agg(big(count(lit(1))).as("n_customers"),
        min(col("sp")).cast("double").as("spend_min"),
        max(col("sp")).cast("double").as("spend_max"),
        sum(col("sp")).cast(DecimalType(38, 4)).as("spt"))
    val ws = Window.partitionBy(col("c_mktsegment"))
    agg
      .withColumn("segtot", sum(col("spt")).over(ws))
      .select(col("c_mktsegment"), col("decile"), col("n_customers"),
        col("spend_min"), col("spend_max"),
        col("spt").cast("double").as("spend_total"),
        round(col("spt").cast("double") / col("segtot").cast("double"), 6)
          .as("share"))
      .orderBy(col("c_mktsegment"), col("decile"))
  }

  /** Q291: CUPED variance reduction — the experimentation-platform
    * workhorse: adjust each user's experiment-period metric by their
    * PRE-period covariate (theta = cov(X,Y)/var(X)) and report how much
    * metric variance the adjustment removes (exactly corr(X,Y)²). The
    * pre/post split is the integer midpoint of the observed time range;
    * per-user sums are exact decimals, global moments follow the q220
    * product recipe, and every derived statistic is one shared IEEE
    * expression tree.
    *
    * Scale shape: one 1-row min/max broadcast, one user-keyed aggregate
    * (map-side combined), one 1-row moment reduce. Nothing else — CUPED
    * at 100 TB is two aggregates.
    */
  def q291Cuped: Q = (s, d) => {
    val zero = lit(0).cast(DecimalType(18, 4))
    val ev = Tables.events(s, d)
      .select(col("user_id"), epochSec(col("ts2")).as("es"), col("value"))
    val split = ev.agg(min(col("es")).as("lo"), max(col("es")).as("hi"))
      .select(expr("(lo + hi) div 2").as("split"))
    val per = ev.crossJoin(broadcast(split))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("es") < col("split"), dec(col("value"))).otherwise(zero))
          .cast(DecimalType(18, 4)).as("x"),
        sum(when(col("es") >= col("split"), dec(col("value"))).otherwise(zero))
          .cast(DecimalType(18, 4)).as("y"))
    val m = per.agg(count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x").cast(DecimalType(19, 4)) * dec12(col("x")))
        .cast(DecimalType(38, 4)).cast("double").as("sxx"),
      sum(col("y").cast(DecimalType(19, 4)) * dec12(col("y")))
        .cast(DecimalType(38, 4)).cast("double").as("syy"),
      sum(col("x").cast(DecimalType(19, 4)) * dec12(col("y")))
        .cast(DecimalType(38, 4)).cast("double").as("sxy"))
    val nD = col("n").cast("double")
    val varX = col("sxx") / nD - (col("sx") / nD) * (col("sx") / nD)
    val varY = col("syy") / nD - (col("sy") / nD) * (col("sy") / nD)
    val covXY = col("sxy") / nD - (col("sx") / nD) * (col("sy") / nD)
    m.select(big(col("n")).as("n_users"),
      round(covXY / varX, 6).as("theta"),
      round(varY, 6).as("var_y"),
      round(varY - covXY * covXY / varX, 6).as("var_y_adj"),
      round(lit(100.0) * covXY * covXY / (varX * varY), 4)
        .as("reduction_pct"))
  }

  /** Q292: Simpson's-paradox detector — per-group correlation of discount
    * vs quantity versus the pooled correlation, flagging groups whose sign
    * FLIPS against the aggregate (the aggregation trap every dashboard
    * should test for). One `rollup` pass produces group and pooled moments
    * together; the pooled row broadcasts back for the flip comparison.
    *
    * Scale shape: one rollup aggregate over lineitem (map-side combined),
    * a 1-row broadcast join — distributed at any scale.
    */
  def q292SimpsonsParadox: Q = (s, d) => {
    val x = col("l_discount")
    val y = col("l_quantity")
    val m = Tables(s, d, "lineitem")
      .rollup(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(dec(x)).cast("double").as("sx"),
        sum(dec(y)).cast("double").as("sy"),
        sum(dec12(x) * dec12(x)).cast(DecimalType(38, 4)).cast("double").as("sxx"),
        sum(dec12(y) * dec12(y)).cast(DecimalType(38, 4)).cast("double").as("syy"),
        sum(dec12(x) * dec12(y)).cast(DecimalType(38, 4)).cast("double").as("sxy"))
      .withColumn("scope", coalesce(col("l_returnflag"), lit("ALL")))
    val nD = col("n").cast("double")
    val r = round((nD * col("sxy") - col("sx") * col("sy"))
      / (sqrt(nD * col("sxx") - col("sx") * col("sx"))
        * sqrt(nD * col("syy") - col("sy") * col("sy"))), 6)
    val scored = m.select(col("scope"), col("n"), r.as("r"))
    val overall = scored.filter(col("scope") === "ALL")
      .select(col("r").as("r_all"))
    scored.crossJoin(broadcast(overall))
      .select(col("scope"), big(col("n")).as("n"), col("r"), col("r_all"),
        (col("scope") =!= "ALL" &&
          ((col("r") > 0) =!= (col("r_all") > 0))).as("sign_flipped"))
      .orderBy(col("scope"))
  }

  /** Q296: isotonic calibration — pool-adjacent-violators regression of
    * purchase rate on event value, computed via the CLOSED minimax form
    * instead of the sequential merge loop: over 20 equal-width score bins,
    * iso(i) = max_{j<=i} min_{l>=i} avg(j..l), where avg(j..l) is the
    * pooled positive rate of bins j..l from integer cumulative counts —
    * the PAV fixpoint as three bounded joins over a <=20-row relation, no
    * driver iteration at all. Rates are exact-integer divisions; min/max
    * over doubles are order-independent.
    *
    * Scale shape: one pass bins arbitrarily many events into <=20 rows
    * (map-side combined); the minimax triple join is 20^3 bounded rows.
    * The per-bin window runs on the 20-row relation (allow-listed bounded
    * window).
    */
  /** Bin an events relation into <=20 (bin, n, k) calibration rows against
    * the given [lo, hi] range — additive counts, so q300's per-batch bins
    * merge exactly at any trigger slicing.
    */
  private[graft] def isotonicBins(ev: DataFrame, mm: DataFrame): DataFrame =
    ev.select(col("value"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .crossJoin(broadcast(mm))
      .withColumn("bin", least(lit(19L),
        floor((col("value") - col("lo")) / (col("hi") - col("lo"))
          * lit(20.0)).cast("long")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("k"))

  /** The PAV minimax tail over a <=20-row binned relation — shared by q296
    * (batch) and q300 (post-drain merge).
    */
  private[graft] def isotonicReport(binned: DataFrame): DataFrame = {
    val wb = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = graft.Checkpoints.materialize(
      binned.select(col("bin"), col("n"), col("k"),
        sum(col("n")).over(wb).as("cn"), sum(col("k")).over(wb).as("ck")))
    // avg(j..l) over NONEMPTY bins from cumulative counts; the j side needs
    // the cumulative BEFORE bin j, i.e. cn - n of bin j itself
    val spans = cum.select(col("bin").as("j"), (col("cn") - col("n")).as("cnj"),
        (col("ck") - col("k")).as("ckj"))
      .join(cum.select(col("bin").as("l"), col("cn").as("cnl"), col("ck").as("ckl")),
        col("j") <= col("l"))
    val iso = spans
      .join(cum.select(col("bin").as("i")),
        col("j") <= col("i") && col("i") <= col("l"))
      .select(col("i"), col("j"),
        ((col("ckl") - col("ckj")).cast("double")
          / (col("cnl") - col("cnj")).cast("double")).as("avg"))
      .groupBy(col("i"), col("j")).agg(min(col("avg")).as("mn"))
      .groupBy(col("i")).agg(max(col("mn")).as("iso"))
    binned.join(iso, col("bin") === col("i"))
      .select(col("bin"), big(col("n")).as("n"), big(col("k")).as("k"),
        round(col("k").cast("double") / col("n").cast("double"), 6)
          .as("rate_raw"),
        round(col("iso"), 6).as("rate_iso"))
      .orderBy(col("bin"))
  }

  def q296IsotonicCalibration: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val mm = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    isotonicReport(isotonicBins(ev, mm))
  }

  /** Q297: pairwise two-sample Kolmogorov–Smirnov tests — for every
    * unordered pair of event types, the exact KS statistic between their
    * value distributions, computed ENTIRELY in integers: D = max |c1·n2 −
    * c2·n1| / (n1·n2) over per-value cumulative counts, with the location
    * reported as the smallest value attaining the max. The drift gate for
    * "did these two segments draw from the same distribution".
    *
    * Scale shape: one (type, value) collapse, a 10-row pair broadcast, and
    * cumulative windows partitioned per pair — bounded partition count,
    * the defended q232-class per-group sort; every comparison is int64
    * (counts < 2^31, products < 2^62).
    */
  def q297KsPairwise: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val types = ev.select(col("event_type")).distinct()
    val prs = types.select(col("event_type").as("ta"))
      .join(types.select(col("event_type").as("tb")), col("ta") < col("tb"))
    val vc = ev.groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("c"))
    // two equi BROADCAST HASH joins instead of one OR-condition join: the
    // disjunction planned as BroadcastNestedLoopJoin — every (type, value)
    // row scanned ALL |types|² pairs (~11M predicate evaluations at sf0.1
    // in a byte-small coalesced stage). ta < tb is strict, so a row never
    // matches both sides and the union reproduces the OR's matches exactly
    // (opt r14, guide §3.1).
    val tagged = vc.join(broadcast(prs), col("event_type") === col("ta"))
      .select(col("ta"), col("tb"), col("value"), col("c").as("ca"), lit(0L).as("cb"))
      .unionByName(
        vc.join(broadcast(prs), col("event_type") === col("tb"))
          .select(col("ta"), col("tb"), col("value"), lit(0L).as("ca"), col("c").as("cb")))
      .groupBy(col("ta"), col("tb"), col("value"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    val wp = Window.partitionBy(col("ta"), col("tb")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = tagged
      .select(col("ta"), col("tb"), col("value"),
        sum(col("ca")).over(wp).as("fa"), sum(col("cb")).over(wp).as("fb"))
    val tot = cum.groupBy(col("ta"), col("tb"))
      .agg(max(col("fa")).as("na"), max(col("fb")).as("nb"))
    val num = cum.join(broadcast(tot), Seq("ta", "tb"))
      .select(col("ta"), col("tb"), col("value"), col("na"), col("nb"),
        abs(col("fa") * col("nb") - col("fb") * col("na")).as("num"))
    val dmax = num.groupBy(col("ta"), col("tb"))
      .agg(max(col("num")).as("dnum"))
    num.join(broadcast(dmax), Seq("ta", "tb"))
      .filter(col("num") === col("dnum"))
      .groupBy(col("ta"), col("tb"))
      .agg(big(max(col("na"))).as("n_a"), big(max(col("nb"))).as("n_b"),
        round(max(col("dnum")).cast("double")
          / (max(col("na")) * max(col("nb"))).cast("double"), 6).as("d"),
        min(col("value")).as("at_value"))
      .orderBy(col("ta"), col("tb"))
  }

  /** Q305: V-optimal histogram — the optimizer-statistics advisor: choose
    * the 4-bucket split of the event-value domain (boundaries restricted
    * to 20 observed equi-width fine bins) minimizing total within-bucket
    * SSE, by EXHAUSTIVE enumeration of the C(19,3)-bounded boundary
    * combinations over exact decimal prefix moments — the dynamic program
    * replaced by a bounded join, which is how an advisor actually runs on
    * a cluster. SSE per segment is `s2 − s1²/n` in doubles from
    * exact-decimal cumulative moments (q177's recipe); ties break on the
    * boundary triple.
    *
    * Scale shape: one pass collapses any volume to <=20 bins; everything
    * after is bounded (<=969-row combo join, TakeOrdered(1)).
    */
  def q305VoptimalHistogram: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("value").as("v"))
    val mm = ev.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val binned = ev.crossJoin(broadcast(mm))
      .withColumn("bin", least(lit(19L),
        floor((col("v") - col("lo")) / (col("hi") - col("lo"))
          * lit(20.0)).cast("long")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("v"))).cast(DecimalType(38, 4)).as("s1"),
        sum(dec12(col("v")) * dec12(col("v"))).cast(DecimalType(38, 4)).as("s2"))
    val wb = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = graft.Checkpoints.materialize(
      binned.select(col("bin"),
        sum(col("n")).over(wb).as("cn"),
        sum(col("s1")).over(wb).cast(DecimalType(38, 4)).as("cs1"),
        sum(col("s2")).over(wb).cast(DecimalType(38, 4)).as("cs2")))
    val tot = cum.orderBy(col("bin").desc).limit(1)
      .select(col("bin").as("maxbin"), col("cn").as("tn"),
        col("cs1").as("ts1"), col("cs2").as("ts2"))
    def sse(n: Column, s1: Column, s2: Column): Column =
      s2.cast("double") - s1.cast("double") * s1.cast("double") / n.cast("double")
    val c1 = cum.select(col("bin").as("e1"), col("cn").as("n1"),
      col("cs1").as("a1"), col("cs2").as("b1"))
    val c2 = cum.select(col("bin").as("e2"), col("cn").as("n2"),
      col("cs1").as("a2"), col("cs2").as("b2"))
    val c3 = cum.select(col("bin").as("e3"), col("cn").as("n3"),
      col("cs1").as("a3"), col("cs2").as("b3"))
    val sse1 = sse(col("n1"), col("a1"), col("b1"))
    val sse2 = sse(col("n2") - col("n1"), col("a2") - col("a1"), col("b2") - col("b1"))
    val sse3 = sse(col("n3") - col("n2"), col("a3") - col("a2"), col("b3") - col("b2"))
    val sse4 = sse(col("tn") - col("n3"), col("ts1") - col("a3"), col("ts2") - col("b3"))
    val best = graft.Checkpoints.materialize(
      c1.join(c2, col("e1") < col("e2"))
        .join(c3, col("e2") < col("e3"))
        .crossJoin(broadcast(tot))
        .filter(col("e3") < col("maxbin"))
        .withColumn("sse", sse1 + sse2 + sse3 + sse4)
        .orderBy(col("sse"), col("e1"), col("e2"), col("e3"))
        .limit(1))
    best.select(explode(array(
        struct(lit(1L).as("segment"), col("e1").as("end_bin"),
          big(col("n1")).as("n"), round(sse1, 6).as("sse")),
        struct(lit(2L).as("segment"), col("e2").as("end_bin"),
          big(col("n2") - col("n1")).as("n"), round(sse2, 6).as("sse")),
        struct(lit(3L).as("segment"), col("e3").as("end_bin"),
          big(col("n3") - col("n2")).as("n"), round(sse3, 6).as("sse")),
        struct(lit(4L).as("segment"), col("maxbin").as("end_bin"),
          big(col("tn") - col("n3")).as("n"), round(sse4, 6).as("sse"))))
        .as("seg"))
      .select(col("seg.segment").as("segment"), col("seg.end_bin").as("end_bin"),
        col("seg.n").as("n"), col("seg.sse").as("sse"))
      .orderBy(col("segment"))
  }

  /** Q306: smoothed target encoding — the leakage-safe categorical feature
    * every tabular pipeline ships: per category (order priority), the
    * late-order rate shrunk toward the global prior with pseudo-count
    * m = 50: enc = (k + m·prior) / (n + m). Exact integer (k, n) per
    * category, 1-row prior broadcast, one shared closing expression tree.
    *
    * Scale shape: one map-side-combined aggregate + a 1-row broadcast.
    */
  def q306TargetEncoding: Q = (s, d) => {
    val lbl = when(col("o_orderstatus") === "F", 1L).otherwise(0L)
    val per = Tables(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(lbl).as("k"))
    val g = per.agg(sum(col("n")).as("tn"), sum(col("k")).as("tk"))
    val prior = col("tk").cast("double") / col("tn").cast("double")
    per.crossJoin(broadcast(g))
      .select(col("o_orderpriority").as("priority"),
        big(col("n")).as("n"), big(col("k")).as("k"),
        round(col("k").cast("double") / col("n").cast("double"), 6).as("rate_raw"),
        round((col("k").cast("double") + lit(50.0) * prior)
          / (col("n").cast("double") + lit(50.0)), 6).as("rate_encoded"))
      .orderBy(col("priority"))
  }

  /** Q311: join-cardinality estimator audit — the optimizer-statistics
    * question "how big is this self-join" answered three ways and scored
    * against the truth: the UNIFORM estimate n²/d, the HEAVY-HITTER
    * estimate (top-100 keys exact + uniformity over the rest — the
    * histogram estimators databases actually ship), and the exact answer
    * Σc² — with signed relative error per estimator. Exact integer
    * moments; heavy-hitter set is a deterministic TakeOrdered(100).
    *
    * Scale shape: one key collapse, two bounded aggregates, 1-row
    * broadcasts; the audit never materializes the join itself.
    */
  def q311JoinCardEstimate: Q = (s, d) => {
    val ck = Tables(s, d, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    val tot = ck.agg(sum(col("c")).as("n"),
      count(lit(1)).as("dk"),
      sum(col("c") * col("c")).as("actual"))
    val topAgg = ck.orderBy(col("c").desc, col("l_partkey")).limit(100)
      .agg(sum(col("c")).as("topn"), count(lit(1)).as("topk"),
        sum(col("c") * col("c")).as("topsq"))
    val nD = col("n").cast("double"); val dD = col("dk").cast("double")
    val restN = (col("n") - col("topn")).cast("double")
    val restD = (col("dk") - col("topk")).cast("double")
    val estU = nD * nD / dD
    val estH = col("topsq").cast("double") + restN * restN / restD
    val aD = col("actual").cast("double")
    tot.crossJoin(broadcast(topAgg))
      .select(explode(array(
        struct(lit("uniform").as("estimator"), round(estU, 4).as("est"),
          big(col("actual")).as("actual"),
          round((estU - aD) / aD, 6).as("rel_err")),
        struct(lit("heavy_hitter").as("estimator"), round(estH, 4).as("est"),
          big(col("actual")).as("actual"),
          round((estH - aD) / aD, 6).as("rel_err")))).as("r"))
      .select(col("r.estimator").as("estimator"), col("r.est").as("est"),
        col("r.actual").as("actual"), col("r.rel_err").as("rel_err"))
      .orderBy(col("estimator"))
  }

  /** Q312: cross-source quantile normalization map — for every source,
    * its inner-decile document lengths against the POOLED corpus deciles
    * (percentile_disc semantics: smallest value with cumulative count ≥
    * ⌈d·n/10⌉), with the per-decile shift — the table a curation pipeline
    * uses to re-map one feed's score distribution onto the corpus before
    * mixing. All-integer ranks and thresholds.
    *
    * Scale shape: one (source, length) collapse; per-source cumulative
    * windows partition by source; the pooled cumulative window runs over
    * the DISTINCT-LENGTH summary (bounded value domain — the q138
    * count-of-counts argument), never the documents; decile thresholds
    * are a 9-row broadcast.
    */
  def q312QuantileNormalization: Q = (s, d) => {
    val vc = Tables(s, d, "documents")
      .groupBy(col("source"), col("n_chars")).agg(count(lit(1)).as("c"))
    val decs = s.range(1, 10).toDF("dd")
    // per-source cumulative + totals
    val ws = Window.partitionBy(col("source")).orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumS = vc.select(col("source"), col("n_chars"),
      sum(col("c")).over(ws).as("cum"))
    val totS = vc.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val srcQ = cumS.join(broadcast(totS), Seq("source"))
      .crossJoin(broadcast(decs))
      .filter(col("cum") * 10L >= col("dd") * col("n"))
      .groupBy(col("source"), col("dd"))
      .agg(min(col("n_chars")).as("src_value"))
    // pooled cumulative over the bounded distinct-length summary
    val pooled = vc.groupBy(col("n_chars")).agg(sum(col("c")).as("cp"))
    val wp = Window.orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumP = pooled.select(col("n_chars"), sum(col("cp")).over(wp).as("cum"))
    val totP = pooled.agg(sum(col("cp")).as("tn"))
    val poolQ = cumP.crossJoin(broadcast(totP))
      .crossJoin(broadcast(decs))
      .filter(col("cum") * 10L >= col("dd") * col("tn"))
      .groupBy(col("dd"))
      .agg(min(col("n_chars")).as("pooled_value"))
    srcQ.join(broadcast(poolQ), Seq("dd"))
      .select(col("source"), big(col("dd")).as("decile"),
        big(col("src_value")).as("src_value"),
        big(col("pooled_value")).as("pooled_value"),
        big(col("src_value") - col("pooled_value")).as("shift"))
      .orderBy(col("source"), col("decile"))
  }

  /** Q313: split-conformal prediction intervals — the distribution-free
    * coverage guarantee, evaluated honestly on three disjoint portable-
    * hash splits: FIT (per-type mean predictor), CALIBRATE (q-hat = the
    * ⌈0.9·(n+1)⌉-th smallest absolute residual under the (r, event_id)
    * total order), EVALUATE (empirical coverage of mean ± q-hat on the
    * held-out third). A calibrated 90% interval must cover ≈90% — the
    * test every uncertainty-quantification pipeline owes its users.
    *
    * Scale shape: three filtered aggregates; the calibration rank window
    * partitions per event type; means are 5-row broadcasts.
    */
  def q313ConformalInterval: Q = (s, d) => {
    val b = TrainingOps.portableBucket(col("event_id"))
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("event_id"), col("value"),
        when(b < 3333, "fit").when(b < 6666, "cal").otherwise("eval").as("split"))
    val mu = ev.filter(col("split") === "fit")
      .groupBy(col("event_type"))
      .agg((sum(dec(col("value"))).cast("double") / count(lit(1))).as("mu"))
    val wr = Window.partitionBy(col("event_type"))
      .orderBy(col("r"), col("event_id"))
    val cal = ev.filter(col("split") === "cal")
      .join(broadcast(mu), Seq("event_type"))
      .select(col("event_type"), col("event_id"),
        abs(col("value") - col("mu")).as("r"))
      .withColumn("rn", row_number().over(wr).cast("long"))
    val ncal = cal.groupBy(col("event_type")).agg(max(col("rn")).as("ncal"))
    val qhat = cal.join(broadcast(ncal), Seq("event_type"))
      .filter(col("rn") === least(expr("(9 * (ncal + 1) + 9) div 10"), col("ncal")))
      .select(col("event_type"), col("r").as("qhat"), col("ncal"))
    ev.filter(col("split") === "eval")
      .join(broadcast(mu), Seq("event_type"))
      .join(broadcast(qhat), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(big(max(col("ncal"))).as("n_cal"),
        big(count(lit(1))).as("n_eval"),
        round(max(col("mu")), 6).as("mu"),
        round(max(col("qhat")), 6).as("qhat"),
        big(sum(when(abs(col("value") - col("mu")) <= col("qhat"), 1L)
          .otherwise(0L))).as("n_covered"),
        round(sum(when(abs(col("value") - col("mu")) <= col("qhat"), 1L)
          .otherwise(0L)).cast("double") / count(lit(1)).cast("double"), 6)
          .as("coverage"))
      .orderBy(col("event_type"))
  }

  /** Shared rank machinery for the rank tests (q361/q362): order values
    * $10-bucketed (the q344 trick — a BOUNDED value summary at any corpus
    * size, so the global rank window runs over ≤O(price-range) rows, never
    * the orders), with 2×-SCALED average ranks so ties stay in exact
    * integer arithmetic: for a bucket of `t` tied values starting at
    * overall position `s` (1-based), avg rank = (2s + t − 1)/2, so
    * rank2 = 2s + t − 1 is a plain long. Returns one row per
    * (group, bucket): n in group, rank2, and the per-bucket tie count.
    */
  private def rankedBuckets(s: SparkSession, d: String,
                            group: Column): DataFrame = {
    val ord = Tables(s, d, "orders")
      .select(group.as("g"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) div 1000")
          .as("b"))
    val byB = ord.groupBy(col("b")).agg(count(lit(1)).as("t"))
    val wB = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byB
      .withColumn("before", coalesce(sum(col("t")).over(wB), lit(0L)))
      .select(col("b"), col("t"),
        (lit(2L) * (col("before") + 1L) + col("t") - 1L).as("rank2"))
    ord.groupBy(col("g"), col("b")).agg(count(lit(1)).as("ng"))
      .join(ranked, Seq("b"))
  }

  /** Q361: Mann–Whitney U — the nonparametric two-sample location test
    * (is URGENT order value stochastically larger?): rank-sum over the
    * $10-bucketed values with average-rank ties, U = R₁ − n₁(n₁+1)/2,
    * tie-corrected normal approximation. Everything until the final z is
    * exact integer/decimal via the 2×-scaled ranks ([[rankedBuckets]]);
    * the bucket summary is bounded by the price range, so the one global
    * rank window never sees the orders relation itself.
    */
  def q361MannWhitney: Q = (s, d) => {
    val rb = rankedBuckets(s, d, col("o_orderpriority") === "1-URGENT")
    val agg = rb.agg(
      sum(when(col("g"), col("ng")).otherwise(0L)).cast("long").as("n1"),
      sum(when(!col("g"), col("ng")).otherwise(0L)).cast("long").as("n2"),
      sum(when(col("g"), col("ng") * col("rank2")).otherwise(0L))
        .cast(DecimalType(38, 0)).as("r1x2"))
    // tie term Σ(t³−t) over every bucket, from the deduped bucket relation
    val ties = rb.groupBy(col("b")).agg(max(col("t")).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t"))
        .cast(DecimalType(38, 0)).as("tsum"))
    val nD = (col("n1") + col("n2")).cast("double")
    val u = col("r1x2").cast("double") / 2.0 -
      col("n1").cast("double") * (col("n1") + 1L).cast("double") / 2.0
    val mu = col("n1").cast("double") * col("n2").cast("double") / 2.0
    val varU = col("n1").cast("double") * col("n2").cast("double") / 12.0 *
      ((nD + 1.0) - col("tsum").cast("double") / (nD * (nD - 1.0)))
    agg.crossJoin(broadcast(ties))
      .select(big(col("n1")).as("n_urgent"), big(col("n2")).as("n_rest"),
        round(u, 4).as("u"),
        round(varU, 4).as("var_u"),
        round((u - mu) / sqrt(varU), 6).as("z"),
        (abs(round((u - mu) / sqrt(varU), 6)) > lit(1.96)).as("significant"))
  }

  /** Q362: Kruskal–Wallis H — the k-group extension of q361 (does order
    * value differ across the five priorities?): H = 12/(N(N+1)) Σ R²g/ng
    * − 3(N+1), divided by the tie correction 1 − Σ(t³−t)/(N³−N). Shares
    * [[rankedBuckets]]' exact 2×-scaled ranks; per-group rank sums stay
    * decimal-exact; only the final H is double.
    */
  def q362KruskalWallis: Q = (s, d) => {
    val rb = rankedBuckets(s, d, col("o_orderpriority"))
    val per = rb.groupBy(col("g"))
      .agg(sum(col("ng")).cast("long").as("ng"),
        sum(col("ng") * col("rank2")).cast(DecimalType(38, 0)).as("r2"))
    val ties = rb.groupBy(col("b")).agg(max(col("t")).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t"))
        .cast(DecimalType(38, 0)).as("tsum"))
    // per-group R²/n as ONE IEEE expression each, 4-dp rounded, then an
    // exact decimal sum — never a decimal division (engines disagree on
    // result scales) and never an order-dependent double sum
    val tot = per.agg(sum(col("ng")).cast("long").as("n"),
      sum(round(col("r2").cast("double") * col("r2").cast("double")
        / col("ng").cast("double"), 4).cast(DecimalType(38, 4)))
        .cast("double").as("srq"))
    val nD = col("n").cast("double")
    val h = (lit(12.0) / (nD * (nD + 1.0)) * col("srq") / 4.0 -
      lit(3.0) * (nD + 1.0)) /
      (lit(1.0) - col("tsum").cast("double") / (nD * nD * nD - nD))
    val k = per.agg(count(lit(1)).as("k"))
    tot.crossJoin(broadcast(ties)).crossJoin(broadcast(k))
      .select(big(col("n")).as("n"), big(col("k")).as("k_groups"),
        round(h, 6).as("h"),
        // chi-square 0.95 critical value at k−1 = 4 df
        (round(h, 6) > lit(9.488)).as("significant"))
  }

  /** Q363: 1-D Wasserstein (earth-mover) distance between the first- and
    * second-half `value` distributions — the drift metric PSI (q333) can't
    * give: W₁ = ∫|F₁−F₂| dx, which sees HOW FAR mass moved, not only that
    * bins changed. Values are cent-bucketed (bounded support), and the
    * whole integral is computed in EXACT integers by clearing
    * denominators: |c₁N₂ − c₂N₁| · gap summed over the merged support,
    * reported as that integer plus the /(N₁·N₂·100) double. One keyed
    * aggregate + one bounded window — shuffle ∝ distinct cents, never rows.
    */
  def q363Wasserstein: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(epochSec(col("ts2")).as("ts"),
        (dec(col("value")) * 100).cast("long").as("c"))
    val mid = ev.agg(expr("(MIN(ts) + MAX(ts)) div 2").as("m")).head().getLong(0)
    wassersteinReport(ev.groupBy(col("c"))
      .agg(sum(when(col("ts") < mid, 1L).otherwise(0L)).as("c1"),
        sum(when(col("ts") >= mid, 1L).otherwise(0L)).as("c2")))
  }

  /** The W₁ kernel from a (cent value, baseline count, current count)
    * summary — the mergeable state q375's streaming twin folds per batch
    * (per-cent counts of disjoint row sets merge by plain sum).
    */
  private[graft] def wassersteinReport(byC: DataFrame): DataFrame = {
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byC.agg(sum(col("c1")).cast("long").as("n1"),
      sum(col("c2")).cast("long").as("n2"))
    val steps = byC
      .withColumn("f1", sum(col("c1")).over(w))
      .withColumn("f2", sum(col("c2")).over(w))
      .withColumn("gap", lead(col("c"), 1).over(Window.orderBy(col("c"))) - col("c"))
      .filter(col("gap").isNotNull)
    steps.crossJoin(broadcast(tot))
      .agg(max(col("n1")).as("na"), max(col("n2")).as("nb"),
        sum(abs(col("f1") * col("n2") - col("f2") * col("n1")) * col("gap"))
          .cast(DecimalType(38, 0)).as("w1_scaled"))
      .select(big(col("na")).as("n_first"), big(col("nb")).as("n_second"),
        col("w1_scaled").cast("string").as("w1_scaled"),
        round(col("w1_scaled").cast("double")
          / (col("na").cast("double") * col("nb").cast("double") * 100.0), 6)
          .as("w1"))
  }

  /** Q364: one-way ANOVA F — the parametric complement to q362 over the
    * same design (order value by priority): between/within sums of squares
    * from per-group (n, Σy, Σy²) in integer cents — one map-side-combined
    * aggregate over orders, exact until the final F division. The classic
    * "does the mean differ anywhere" gate before pairwise tests.
    */
  def q364AnovaF: Q = (s, d) => {
    // moments in mixed units sized so every decimal→double conversion is
    // a <2^53 scaled integer (the q227 scale-sizing rule): Σy in exact
    // integer cents; Σy² per row as ONE IEEE kilodollar² expression
    // rounded to 4 dp (deterministic, portable) then decimal-summed
    val yk = col("y").cast("double") / 100000.0
    val per = Tables(s, d, "orders")
      .select(col("o_orderpriority").as("g"),
        (dec(col("o_totalprice")) * 100).cast("long").as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).cast(DecimalType(38, 0)).as("syc"),
        sum(round(yk * yk, 4).cast(DecimalType(38, 4))).as("syy"))
    // per-group (Σy)²/n in kilodollar², 4-dp rounded, decimal sum — no
    // decimal division (engines disagree on result scales) and no
    // unordered double sum
    val gk = col("syc").cast("double") / 100000.0
    val tot = per.agg(sum(col("n")).cast("long").as("nt"),
      sum(col("syc")).as("syt"),
      sum(col("syy")).cast(DecimalType(38, 4)).cast("double").as("syyt"),
      count(lit(1)).as("k"),
      sum(round(gk * gk / col("n").cast("double"), 4)
        .cast(DecimalType(38, 4))).cast("double").as("sgrp"))
    val totk = col("syt").cast("double") / 100000.0
    val grand = totk * totk / col("nt").cast("double")
    val ssb = col("sgrp") - grand
    val ssw = col("syyt") - col("sgrp")
    val f = (ssb / (col("k") - 1L).cast("double")) /
      (ssw / (col("nt") - col("k")).cast("double"))
    tot.select(big(col("nt")).as("n"), big(col("k")).as("k_groups"),
      round(ssb, 4).as("ss_between_kusd2"),
      round(ssw, 4).as("ss_within_kusd2"),
      round(f, 6).as("f"),
      // F(4, large) 0.95 critical value
      (round(f, 6) > lit(2.372)).as("significant"))
  }

  /** Q365: Benjamini–Hochberg FDR over a family of per-event-type
    * permutation tests — the multiple-comparisons closer the single-test
    * queries (q331/q346) need at scale, where one dashboard runs hundreds
    * of metric tests per day. Per type, a q346-style 32-rep permutation
    * test (portable LCG arms, exact decimal sums) yields the exact
    * rational p = (1+extremes)/33; the BH step-up then runs in PURE
    * INTEGER arithmetic (p ≤ k·q/m at q=0.05 ⟺ 20·m·num ≤ 33·k), so
    * discovery flags are bit-portable. Shuffles: one 32× rep aggregate
    * (map-side combined to 32·|types| rows) + bounded windows.
    */
  def q365FdrBh: Q = (s, d) => {
    val p = 2147483647L
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), dec(col("value")).as("v"))
    val obs = ev
      .select(col("event_type"),
        (TrainingOps.portableBucket(col("event_id")) % 2 === 0).as("a"), col("v"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).cast("long").as("na"),
        sum(when(col("a"), col("v"))).as("sva"),
        sum(when(!col("a"), 1L).otherwise(0L)).cast("long").as("nb"),
        sum(when(!col("a"), col("v"))).as("svb"))
    val reps = s.range(1L, 33L).toDF("rep")
    val permArm = pmod((pmod(pmod(col("event_id") + col("rep"), lit(p))
      * 48271L, lit(p)) + 1L) * 16807L, lit(p)) % 2 === 0
    // fan out the 32×|events| rep grid (the q346 single-task measurement;
    // map-side partial agg makes the repartition pass-free — opt r14)
    val perm = ev
      .repartition(s.sparkContext.defaultParallelism, col("event_id"))
      .crossJoin(broadcast(reps))
      .select(col("event_type"), col("rep"), permArm.as("a"), col("v"))
      .groupBy(col("event_type"), col("rep"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).cast("long").as("pna"),
        sum(when(col("a"), col("v"))).as("psva"),
        sum(when(!col("a"), 1L).otherwise(0L)).cast("long").as("pnb"),
        sum(when(!col("a"), col("v"))).as("psvb"))
    val pdiff = col("psva").cast("double") / col("pna").cast("double") -
      col("psvb").cast("double") / col("pnb").cast("double")
    val odiff = col("sva").cast("double") / col("na").cast("double") -
      col("svb").cast("double") / col("nb").cast("double")
    val pv = perm.join(obs, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg((sum(when(abs(pdiff) >= abs(odiff), 1L).otherwise(0L)) + 1L)
        .cast("long").as("pnum"))
    val m = pv.agg(count(lit(1)).as("m"))
    val wRank = Window.orderBy(col("pnum"), col("event_type"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    pv.crossJoin(broadcast(m))
      .withColumn("k", row_number().over(wRank))
      .withColumn("passes",
        when(lit(20L) * col("m") * col("pnum") <= lit(33L) * col("k"), col("k"))
          .otherwise(0L))
      .withColumn("kmax", max(col("passes")).over(wAll))
      .select(col("event_type"), big(col("pnum")).as("p_numerator_33rds"),
        round(col("pnum").cast("double") / 33.0, 6).as("p_value"),
        big(col("k")).as("rank"),
        (col("k") <= col("kmax")).as("discovery"))
      .orderBy(col("k"))
  }

  /** Q366: Herfindahl–Hirschman concentration index — per-nation supplier
    * concentration of supply revenue ("is this nation's supply base a
    * monopoly?"): HHI = Σ share² over suppliers, ×10000 (the antitrust
    * scale). Revenue in exact integer cents; the share-square sum clears
    * denominators (Σ rev²/tot²) with decimal numerators, one double
    * division at the end. Two keyed aggregates, both map-side combined.
    */
  def q366Hhi: Q = (s, d) => {
    val rev = Tables(s, d, "lineitem")
      .join(Tables(s, d, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").as("nation"), col("s_suppkey"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
      .groupBy(col("nation"), col("s_suppkey"))
      .agg(sum(col("cents")).cast(DecimalType(38, 0)).as("r"))
    val tot = rev.groupBy(col("nation"))
      .agg(sum(col("r")).as("tot"))
    // per-supplier share² as one IEEE expression (both operands are exact
    // <2^53 integers in double), 12-dp rounded, decimal-summed — the q208
    // per-term battery, so the Σ over suppliers is order-independent
    rev.join(tot, Seq("nation"))
      .groupBy(col("nation"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(round(col("r").cast("double") / col("tot").cast("double")
          * (col("r").cast("double") / col("tot").cast("double")), 12)
          .cast(DecimalType(28, 12))).cast("double").as("sq"))
      .select(col("nation"), big(col("n_suppliers")).as("n_suppliers"),
        round(col("sq") * 10000.0, 4).as("hhi"))
      .orderBy(col("nation"))
  }

  /** Q369: log-rank test — does customer survival (q210's lifetime
    * definition: months from first to last order, death = inactive >6
    * months before the horizon) differ between the BUILDING market
    * segment and the rest? At each distinct death time: observed vs
    * expected group-1 deaths under the null (E₁ = n₁·d/n), variance
    * n₁n₂d(n−d)/(n²(n−1)); χ² = (ΣO−E)²/ΣV. At-risk counts come from
    * reverse cumulative sums over the BOUNDED duration grid (≤ months
    * range), so the test costs two keyed aggregates + one small window
    * regardless of customer count.
    */
  def q369LogRank: Q = (s, d) => {
    def mIdx(c: Column) = (year(c) * 12 + month(c)).cast("long")
    val seg = Tables(s, d, "customer")
      .select(col("c_custkey"), (col("c_mktsegment") === "BUILDING").as("g1"))
    val per = Tables(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(mIdx(col("o_orderdate"))).as("m0"),
        max(mIdx(col("o_orderdate"))).as("ml"))
      .join(seg, col("o_custkey") === col("c_custkey"))
    val horizon = per.agg(max(col("ml")).as("mmax"))
    val durs = per.crossJoin(broadcast(horizon))
      .select(col("g1"),
        when(col("mmax") - col("ml") > 6, col("ml") - col("m0"))
          .otherwise(col("mmax") - col("m0")).as("dur"),
        when(col("mmax") - col("ml") > 6, 1L).otherwise(0L).as("death"))
    val grid = durs.groupBy(col("dur"))
      .agg(sum(when(col("g1"), col("death")).otherwise(0L)).as("d1"),
        sum(when(!col("g1"), col("death")).otherwise(0L)).as("d2"),
        sum(when(col("g1"), 1L).otherwise(0L)).as("e1"),
        sum(when(!col("g1"), 1L).otherwise(0L)).as("e2"))
    val wGe = Window.orderBy(col("dur"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val terms = grid
      .withColumn("n1", sum(col("e1")).over(wGe))
      .withColumn("n2", sum(col("e2")).over(wGe))
      .filter(col("d1") + col("d2") > 0L)
      .select(col("d1"), col("d2"), col("n1"), col("n2"),
        (col("n1") + col("n2")).as("nr"), (col("d1") + col("d2")).as("dd"))
    // per-time terms are ONE IEEE expression each, 6-dp rounded, then an
    // exact decimal sum — a raw double SUM over the grid would be
    // partition-order-dependent
    terms
      .agg(sum(col("d1")).cast("long").as("o1"),
        sum(round(col("n1").cast("double") * col("dd").cast("double")
          / col("nr").cast("double"), 6).cast(DecimalType(28, 6)))
          .cast("double").as("exp1"),
        sum(round(when(col("nr") > 1L,
          col("n1").cast("double") * col("n2").cast("double")
            * col("dd").cast("double") * (col("nr") - col("dd")).cast("double")
            / (col("nr").cast("double") * col("nr").cast("double")
              * (col("nr") - 1L).cast("double"))).otherwise(lit(0.0)), 6)
          .cast(DecimalType(28, 6))).cast("double").as("v"))
      .select(big(col("o1")).as("observed_building"),
        round(col("exp1"), 6).as("expected_building"),
        round(col("v"), 6).as("variance"),
        round((col("o1").cast("double") - col("exp1"))
          * (col("o1").cast("double") - col("exp1")) / col("v"), 6)
          .as("chi2"),
        (round((col("o1").cast("double") - col("exp1"))
          * (col("o1").cast("double") - col("exp1")) / col("v"), 6)
          > lit(3.841)).as("significant"))
  }

  /** Q370: regression-discontinuity estimate — the causal jump at a
    * natural cutoff: customers cross "in good standing" at acctbal 0, so
    * fit spend ~ acctbal by OLS separately on each side within a ±$500
    * bandwidth and report the intercept gap at the cutoff. Moments are
    * exact integer-cents sums (the q177 discipline); the closed-form OLS
    * algebra is the only double step. One join + one two-group aggregate;
    * no windows.
    */
  def q370Rdd: Q = (s, d) => {
    val spend = Tables(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long"))
        .cast(DecimalType(38, 0)).as("y"))
    val side = Tables(s, d, "customer")
      .select(col("c_custkey"), (dec(col("c_acctbal")) * 100).cast("long").as("x"))
      .filter(col("x") >= -50000L && col("x") < 50000L)
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select((col("x") >= 0L).as("treated"), col("x"),
        coalesce(col("y"), lit(0L).cast(DecimalType(38, 0))).as("y"))
    // OLS in mixed units sized for exact <2^53 conversions (the q227
    // rule): x in DOLLARS (from exact integer cents), y in KILODOLLARS;
    // the one per-row product x·y_k is a single IEEE expression rounded
    // to 2 dp and decimal-summed, so every moment is order-independent
    val xd = col("x").cast("double") / 100.0
    val yk = col("y").cast("double") / 100000.0
    val per = side.groupBy(col("treated"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("long").as("sxc"),
        sum(col("x") * col("x")).cast(DecimalType(38, 0)).as("sxxc"),
        sum(col("y")).as("syc"),
        sum(round(xd * yk, 2).cast(DecimalType(38, 2))).as("sxy"))
    val nD = col("n").cast("double")
    val sxD = col("sxc").cast("double") / 100.0
    val sxxD = col("sxxc").cast("double") / 10000.0
    val syK = col("syc").cast("double") / 100000.0
    val slope = (nD * col("sxy").cast("double") - sxD * syK) /
      (nD * sxxD - sxD * sxD)
    val icept = (syK - slope * sxD) / nD
    val fits = per.select(col("treated"), big(col("n")).as("n"),
      round(slope, 8).as("slope_kusd_per_usd"),
      round(icept * 1000.0, 4).as("intercept_usd"))
    val l = fits.filter(!col("treated"))
      .select(col("n").as("n_left"),
        col("slope_kusd_per_usd").as("slope_left"),
        col("intercept_usd").as("intercept_left"))
    val r = fits.filter(col("treated"))
      .select(col("n").as("n_right"),
        col("slope_kusd_per_usd").as("slope_right"),
        col("intercept_usd").as("intercept_right"))
    l.crossJoin(broadcast(r))
      .select(col("n_left"), col("n_right"),
        col("intercept_left"), col("intercept_right"),
        col("slope_left"), col("slope_right"),
        round(col("intercept_right") - col("intercept_left"), 4)
          .as("rdd_jump_usd"))
  }

  /** Q373: MAD robust outliers — median absolute deviation per order
    * priority and the robust-z outlier count |0.6745(x−med)/MAD| > 3.5
    * (the Iglewicz–Hoberg rule), the robust alternative to q179's
    * mean/stddev fences. Both medians are EXACT lower-middle rank picks
    * (row_number over the partitioned sort — no percentile
    * interpolation to diverge on), in integer cents throughout; only the
    * final z threshold is double.
    */
  def q373MadOutliers: Q = (s, d) => {
    val ord = Tables(s, d, "orders")
      .select(col("o_orderpriority").as("g"),
        (dec(col("o_totalprice")) * 100).cast("long").as("y"))
    def medianOf(df: DataFrame, valueCol: String): DataFrame = {
      val w = Window.partitionBy(col("g")).orderBy(col(valueCol))
      val wN = Window.partitionBy(col("g"))
      // pinned exchange on the window key: byte-based coalescing ran the
      // per-priority rank sorts on one task (2 × ~0.7 s at sf0.1 —
      // opt r14); width is bounded by |priorities| but 5 tasks beat 1
      df.repartition(df.sparkSession.sparkContext.defaultParallelism, col("g"))
        .withColumn("rn", row_number().over(w))
        .withColumn("nn", count(lit(1)).over(wN))
        .filter(col("rn") === expr("(nn + 1) div 2"))
        .select(col("g"), col(valueCol).as("med"))
    }
    val med = medianOf(ord, "y")
    val dev = ord.join(med, Seq("g"))
      .select(col("g"), col("y"), abs(col("y") - col("med")).as("ad"),
        col("med"))
    val mad = medianOf(dev.select(col("g"), col("ad")), "ad")
      .withColumnRenamed("med", "mad")
    dev.join(mad, Seq("g"))
      .groupBy(col("g"))
      .agg(big(count(lit(1))).as("n"),
        round(max(col("med")).cast("double") / 100.0, 2).as("median_usd"),
        round(max(col("mad")).cast("double") / 100.0, 2).as("mad_usd"),
        big(sum(when(abs(lit(0.6745) * (col("y") - col("med")).cast("double")
          / col("mad").cast("double")) > 3.5, 1L).otherwise(0L)))
          .as("n_outliers"))
      .orderBy(col("g"))
  }

  /** Q374: Lorenz curve — cumulative spend share at each customer decile
    * PER MARKET SEGMENT (q194's Gini is the area summary; this is the
    * curve itself, the "top 10% hold X%" readout). Deciles are exact
    * integer rank arithmetic `(rn−1)·10 div n`; cumulative and total
    * spend are exact integer cents (both <2^53, so the one share division
    * converts exactly). Windows are PARTITIONED by segment (the q289
    * NTILE treatment) — no global sort at any scale.
    */
  def q374LorenzCurve: Q = (s, d) => {
    val spend = Tables(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long"))
        .cast(DecimalType(38, 0)).as("y"))
      .join(Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg")),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("seg")).orderBy(col("y"), col("o_custkey"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("seg"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    spend
      .withColumn("rn", row_number().over(w))
      .withColumn("cum", sum(col("y")).over(wCum))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("y")).over(wAll))
      .withColumn("decile", expr("((rn - 1) * 10) div n"))
      .groupBy(col("seg"), col("decile"))
      .agg(big(count(lit(1))).as("n_customers"),
        round(max(col("cum")).cast("double") / max(col("tot")).cast("double"), 6)
          .as("cum_share"))
      .orderBy(col("seg"), col("decile"))
  }

  /** Q377: SPRT — Wald's sequential probability ratio test, the
    * "stop the experiment as soon as the evidence is in" monitor that
    * q341's group-sequential looks approximate with 5 fixed peeks: per
    * market segment, orders arrive in key order and each contributes an
    * integer MICRO-unit log-likelihood increment for H₁ p=0.35 vs H₀
    * p=0.25 on "order is URGENT" (ln-ratio constants pre-rounded to 6 dp
    * and scaled ×10⁶, so the cumulative walk is a sum of longs — exact,
    * portable). Decision at the first crossing of ±ln(19) (α=β=0.05).
    * One partitioned window + one keyed aggregate.
    */
  def q377Sprt: Q = (s, d) => {
    // micro-LLR increments: ln(0.35/0.25)=0.336472, ln(0.65/0.75)=-0.143101
    val seg = Tables(s, d, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
    val w = Window.partitionBy(col("seg")).orderBy(col("o_orderkey"))
    val walk = Tables(s, d, "orders")
      .join(seg, col("o_custkey") === col("c_custkey"))
      .select(col("seg"), col("o_orderkey"),
        when(col("o_orderpriority") === "1-URGENT", 336472L)
          .otherwise(-143101L).as("inc"))
      .withColumn("rn", row_number().over(w))
      .withColumn("llr",
        sum(col("inc")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val bound = 2944439L // ln(19) in micro-units
    val crossings = walk
      .filter(abs(col("llr")) >= bound)
      .groupBy(col("seg")).agg(min(col("rn")).as("n_dec"))
    val at = walk.join(crossings, Seq("seg"))
      .filter(col("rn") === col("n_dec"))
      .select(col("seg"), col("n_dec"), col("llr"))
    walk.groupBy(col("seg")).agg(count(lit(1)).as("n_total"))
      .join(at, Seq("seg"), "left")
      .select(col("seg"), big(col("n_total")).as("n_total"),
        big(coalesce(col("n_dec"), col("n_total"))).as("n_at_decision"),
        big(coalesce(col("llr"), lit(0L))).as("llr_micro"),
        when(col("llr").isNull, "continue")
          .when(col("llr") >= bound, "accept_h1")
          .otherwise("accept_h0").as("decision"))
      .orderBy(col("seg"))
  }

  /** Q379: IPW average treatment effect — inverse-propensity weighting
    * with BUCKET propensities (order month is the confounder): within
    * each month bucket the weighted treated/control means clear their
    * denominators to exact rationals (Σy·n_x/n_tx), each bucket term one
    * IEEE expression rounded to 4 dp and decimal-summed. The
    * non-matching estimator complement to q327's caliper ATT and q340's
    * stratified ATE. Buckets with a missing arm drop (standard
    * positivity trim), reported in the output.
    */
  def q379IpwAte: Q = (s, d) => {
    val ord = Tables(s, d, "orders")
      .select((month(col("o_orderdate")) + year(col("o_orderdate")) * 12)
        .as("b"),
        (col("o_orderpriority") === "1-URGENT").as("t"),
        (dec(col("o_totalprice")) * 100).cast("long").as("y"))
    val byB = ord.groupBy(col("b"))
      .agg(count(lit(1)).as("nx"),
        sum(when(col("t"), 1L).otherwise(0L)).as("n1x"),
        sum(when(col("t"), col("y")).otherwise(0L)).cast(DecimalType(38, 0))
          .as("sy1"),
        sum(when(!col("t"), col("y")).otherwise(0L)).cast(DecimalType(38, 0))
          .as("sy0"))
    val ok = byB.filter(col("n1x") > 0L && col("n1x") < col("nx"))
    val term1 = round(col("sy1").cast("double") / 100000.0
      * col("nx").cast("double") / col("n1x").cast("double"), 4)
    val term0 = round(col("sy0").cast("double") / 100000.0
      * col("nx").cast("double") / (col("nx") - col("n1x")).cast("double"), 4)
    val tots = ok.agg(sum(col("nx")).cast("long").as("n"),
      sum(term1.cast(DecimalType(38, 4))).cast("double").as("t1"),
      sum(term0.cast(DecimalType(38, 4))).cast("double").as("t0"),
      count(lit(1)).as("n_buckets"))
    val dropped = byB.agg(count(lit(1)).as("nb"))
    tots.crossJoin(broadcast(dropped))
      .select(big(col("n")).as("n_orders"),
        big(col("n_buckets")).as("n_buckets"),
        big(col("nb") - col("n_buckets")).as("n_buckets_dropped"),
        round(col("t1") / col("n").cast("double") * 1000.0, 4)
          .as("mean_treated_usd"),
        round(col("t0") / col("n").cast("double") * 1000.0, 4)
          .as("mean_control_usd"),
        round((col("t1") - col("t0")) / col("n").cast("double") * 1000.0, 4)
          .as("ipw_ate_usd"))
  }

  /** Q391: partial autocorrelation (lags 1–4) — the AR-order diagnostic
    * q282's raw ACF can't give (PACF cuts off sharply at the true AR
    * order; ACF only decays): Durbin–Levinson unrolled over q282's daily
    * revenue ACF, every φ ROUNDED to 6 dp in both engines so the scalar
    * recursion is a short chain of identical IEEE steps on identical
    * 6-dp inputs. The expensive part is q282's bounded lag-join; the
    * recursion itself runs on one 4-value row.
    */
  def q391Pacf: Q = (s, d) => {
    // shared calendar-bounded day grid — memoized across the whole battery
    val grid = dailyRevenue(s, d)
    val lagged = grid
      .withColumn("lag", explode(array((1 to 4).map(l => lit(l.toLong)): _*)))
      .select(col("lag"), (col("x") + col("lag")).as("x2"), col("r").as("rx"))
    val pairs = lagged.join(
      grid.select(col("x").as("x2"), col("r").as("ry")), Seq("x2"))
    val m = pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("rx")).cast("double").as("sx"),
        sum(col("ry")).cast("double").as("sy"),
        sum(col("rx") * col("rx")).cast(DecimalType(38, 4)).cast("double").as("sxx"),
        sum(col("ry") * col("ry")).cast(DecimalType(38, 4)).cast("double").as("syy"),
        sum(col("rx") * col("ry")).cast(DecimalType(38, 4)).cast("double").as("sxy"))
    val nD = col("n_pairs").cast("double")
    val acf = m.select(col("lag"),
      round((nD * col("sxy") - col("sx") * col("sy"))
        / sqrt((nD * col("sxx") - col("sx") * col("sx"))
          * (nD * col("syy") - col("sy") * col("sy"))), 6).as("acf"))
    val one = acf.groupBy()
      .agg(max(when(col("lag") === 1L, col("acf"))).as("r1"),
        max(when(col("lag") === 2L, col("acf"))).as("r2"),
        max(when(col("lag") === 3L, col("acf"))).as("r3"),
        max(when(col("lag") === 4L, col("acf"))).as("r4"))
    val f11 = col("r1")
    val f22 = round((col("r2") - f11 * f11) / (lit(1.0) - f11 * f11), 6)
    val f21 = round(f11 - f22 * f11, 6)
    val f33 = round((col("r3") - f21 * col("r2") - f22 * col("r1"))
      / (lit(1.0) - f21 * col("r1") - f22 * col("r2")), 6)
    val f31 = round(f21 - f33 * f22, 6)
    val f32 = round(f22 - f33 * f21, 6)
    val f44 = round((col("r4") - f31 * col("r3") - f32 * col("r2")
      - f33 * col("r1"))
      / (lit(1.0) - f31 * col("r1") - f32 * col("r2") - f33 * col("r3")), 6)
    one.select(posexplode(array(f11, f22, f33, f44)).as(Seq("i", "pacf")))
      .select((col("i") + 1).cast("long").as("lag"), col("pacf"))
      .orderBy(col("lag"))
  }

  /** Q394: Hill tail-index estimator — how heavy is the order-value tail?
    * Over the top k=500 values (TakeOrdered-bounded, ties by key),
    * Hill = mean ln(xᵢ/x₍ₖ₊₁₎) and α = 1/Hill; α < 2 means infinite
    * variance (provision for extremes), α > 3 means a tame tail — the
    * parametric complement to q208's Zipf slope and q384's Gumbel block
    * maxima. Per-term logs are 6-dp rounded under a decimal sum (q208's
    * battery); everything upstream is exact integer cents.
    */
  def q394HillTail: Q = (s, d) => {
    val k = 500
    val top = graft.Checkpoints.materialize(
      Tables(s, d, "orders")
        .select((dec(col("o_totalprice")) * 100).cast("long").as("y"),
          col("o_orderkey"))
        .orderBy(col("y").desc, col("o_orderkey"))
        .limit(k + 1))
    val thr = top.agg(min(col("y")).as("x_k1"))
    top.crossJoin(broadcast(thr))
      .filter(col("y") > col("x_k1"))
      .agg(count(lit(1)).as("n_tail"), max(col("x_k1")).as("xk"),
        sum(round(log(col("y").cast("double") / col("x_k1").cast("double")), 6)
          .cast(DecimalType(28, 6))).cast("double").as("hsum"))
      .select(big(col("n_tail")).as("k"),
        round(col("xk").cast("double") / 100.0, 2).as("threshold_usd"),
        round(col("hsum") / col("n_tail").cast("double"), 6).as("hill"),
        round(col("n_tail").cast("double") / col("hsum"), 6).as("alpha"))
  }

  /** Daily revenue grid (x = days since 1995-01-01, r = exact 2-dp revenue
    * sum) — the shared day-grid series behind the time-series battery
    * (q282 ACF, q391 PACF, q393 Ljung–Box, q396 Durbin–Watson, q397 Hurst
    * R/S, q399 permutation entropy). The grid is bounded by the CALENDAR
    * SPAN (~2400 rows at any SF — the scalable work is the map-side-
    * combined daily aggregate riding the scan), and session-memoized so
    * the battery builds it once per (session, corpus).
    */
  private[operators] def dailyRevenue(s: SparkSession, d: String): DataFrame =
    graft.Checkpoints.materializeCached(
      Tables(s, d, "orders")
        .groupBy(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("x"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DecimalType(18, 2)).as("r")))

  /** Daily event grid (x = days since 2024-01-01, cnt, exact 4-dp value
    * sum) — the q398/q400 twin of [[dailyRevenue]] over the events table.
    */
  private[operators] def dailyEvents(s: SparkSession, d: String): DataFrame =
    graft.Checkpoints.materializeCached(
      graft.Tables.events(s, d)
        .groupBy(datediff(col("ts2").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("x"))
        .agg(count(lit(1)).as("cnt"), sum(dec(col("value"))).as("sv")))

  /** Q393: Ljung–Box portmanteau test — is the daily-revenue series white
    * noise, or autocorrelated enough that i.i.d.-assuming samplers and
    * CIs are invalid? For k = 1..10: the mean-centered autocorrelation
    * ρ_k over the (t, t+k) day-pair relation, and the cumulative
    * Q(k) = n(n+2) Σ_{j≤k} ρ_j²/(n−j) to compare against χ²_k. All sums
    * are exact decimals; ρ is one deterministic scalar expression on the
    * moment row; the Q cumsum runs over 6-dp-rounded decimal terms on the
    * 10-row lag relation (order-independent by exactness).
    *
    * Scale shape: the pair join is (day grid × 10 lags) — calendar-
    * bounded, never row-proportional; the daily aggregate is the only
    * data-sized pass.
    */
  def q393LjungBox: Q = (s, d) =>
    ljungBoxKernel(dailyRevenue(s, d))

  /** The q393 Ljung–Box kernel over a (x, r) daily-revenue grid —
    * factored so the q437 streaming twin can run the SAME kernel over
    * micro-batch-merged cells (exact decimal partial sums merge
    * additively).
    */
  private[graft] def ljungBoxKernel(grid: DataFrame): DataFrame = {
    val tot = grid.agg(count(lit(1)).as("n"),
      sum(col("r")).cast("double").as("sx"),
      sum(col("r") * col("r")).cast(DecimalType(38, 4)).cast("double").as("srr"))
    val lagged = grid
      .withColumn("lag", explode(array((1 to 10).map(l => lit(l.toLong)): _*)))
      .select(col("lag"), (col("x") + col("lag")).as("x2"), col("r").as("rx"))
    val pairs = lagged.join(
      grid.select(col("x").as("x2"), col("r").as("ry")), Seq("x2"))
    val m = pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("c"),
        sum(col("rx")).cast("double").as("sxk"),
        sum(col("ry")).cast("double").as("syk"),
        sum(col("rx") * col("ry")).cast(DecimalType(38, 4)).cast("double").as("sxyk"))
    val nD = col("n").cast("double")
    val ybar = col("sx") / nD
    val rho = round(
      (col("sxyk") - ybar * (col("sxk") + col("syk"))
        + col("c").cast("double") * ybar * ybar)
        / (col("srr") - col("sx") * col("sx") / nD), 6)
    val wq = Window.orderBy(col("lag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    m.crossJoin(broadcast(tot))
      .select(col("lag"), rho.as("rho"), col("n"))
      .withColumn("term",
        round(col("rho") * col("rho") / (col("n") - col("lag")).cast("double"), 12)
          .cast(DecimalType(38, 12)))
      .withColumn("q_lb",
        round(nD * (nD + lit(2.0)) * sum(col("term")).over(wq).cast("double"), 4))
      .select(col("lag"), col("rho"), col("q_lb"))
      .orderBy(col("lag"))
  }

  /** Q396: Durbin–Watson statistic — first-order residual autocorrelation
    * of the daily-revenue linear trend (DW ≈ 2 means uncorrelated; ≪ 2
    * means the OLS trend's standard errors are understated). Closed-form
    * OLS from exact integer/decimal moments; residuals are one
    * deterministic scalar expression per day; numerator pairs come from
    * the (t, t+1) day join (no window), and both quadratic sums use the
    * 6-dp-rounded-term decimal battery.
    */
  /** Daily-revenue OLS residual relation (x, e) carrying the closed-form
    * trend moments (n, sx, sxx, b) — the shared kernel behind the
    * regression-diagnostics battery: q396 Durbin–Watson, q425 Cook's
    * distance, q426 Breusch–Pagan, q427 Jarque–Bera. One calendar-bounded
    * grid pass; the residual is one deterministic scalar per day.
    */
  private[operators] def dailyOlsResiduals(s: SparkSession, d: String): DataFrame = {
    val grid = dailyRevenue(s, d)
    val mom = grid.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("r")).cast("double").as("sy"),
      sum(col("r") * col("x").cast(DecimalType(10, 0)))
        .cast(DecimalType(38, 2)).cast("double").as("sxy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val slope = (nD * col("sxy") - sxD * col("sy")) /
      (nD * col("sxx").cast("double") - sxD * sxD)
    grid.crossJoin(broadcast(
        mom.select(col("n"), col("sx"), col("sxx"), col("sy"), slope.as("b"))))
      .select(col("x"), col("n"), col("sx"), col("sxx"), col("b"),
        (col("r").cast("double")
          - (col("sy") - col("b") * col("sx").cast("double")) / col("n").cast("double")
          - col("b") * col("x").cast("double")).as("e"))
  }

  def q396DurbinWatson: Q = (s, d) => {
    val e = dailyOlsResiduals(s, d)
    val den = e.agg(
      sum(round(col("e") * col("e"), 6).cast(DecimalType(38, 6)))
        .cast("double").as("den"),
      max(col("b")).as("b"), max(col("n")).as("n"))
    val num = e.select((col("x") + 1).as("x2"), col("e").as("e1"))
      .join(e.select(col("x").as("x2"), col("e").as("e2")), Seq("x2"))
      .agg(sum(round((col("e2") - col("e1")) * (col("e2") - col("e1")), 6)
        .cast(DecimalType(38, 6))).cast("double").as("num"),
        count(lit(1)).as("n_pairs"))
    num.crossJoin(broadcast(den))
      .select(col("n"), col("n_pairs"), round(col("b"), 6).as("slope"),
        round(col("num") / col("den"), 6).as("dw"))
  }

  /** Q397: Hurst exponent by rescaled-range (R/S) analysis — long-range
    * dependence of daily revenue (H ≈ 0.5 random walk increments; H > 0.5
    * persistent). For block sizes w ∈ {8,16,32,64} days: partition the
    * row-numbered day grid into full blocks, per block compute the range
    * R of cumulative mean-deviations (exact decimal cumsums; the
    * deviation is one scalar double per row) and the population σ from
    * exact moments, average R/S over blocks (6-dp-rounded decimal mean),
    * then fit log R/S ~ log w by closed-form OLS over the 4-point relation
    * (12-dp-rounded log terms under decimal sums).
    *
    * Scale shape: every window is over the calendar-bounded day grid
    * (q210's argument), never the orders; the daily aggregate is the only
    * data-sized pass.
    */
  def q397HurstRs: Q = (s, d) =>
    hurstKernel(dailyRevenue(s, d))

  /** The q397 Hurst R/S kernel over a (x, r) daily grid — factored so the
    * q441 streaming twin can run the SAME kernel over micro-batch-merged
    * cells.
    */
  private[graft] def hurstKernel(grid: DataFrame): DataFrame = {
    val t = grid.select(col("x"), col("r"),
      row_number().over(Window.orderBy(col("x"))).cast("long").as("t"))
    val ws = t
      .withColumn("w", explode(array(Seq(8, 16, 32, 64).map(v => lit(v.toLong)): _*)))
      .withColumn("blk",
        floor((col("t") - 1).cast("double") / col("w").cast("double")).cast("long"))
      .withColumn("i", col("t") - col("blk") * col("w"))
    val wCum = Window.partitionBy(col("w"), col("blk")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("w"), col("blk"))
    val en = ws
      .withColumn("cum", sum(col("r")).over(wCum))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .withColumn("sr", sum(col("r")).over(wAll).cast("double"))
      .withColumn("srr",
        sum(col("r") * col("r")).over(wAll).cast(DecimalType(38, 4)).cast("double"))
      .filter(col("cnt") === col("w"))
      .withColumn("dev",
        col("cum").cast("double")
          - col("i").cast("double") * (col("sr") / col("w").cast("double")))
    val wD = col("w").cast("double")
    val blocks = en.groupBy(col("w"), col("blk"), col("sr"), col("srr"))
      .agg((max(col("dev")) - min(col("dev"))).as("rng"))
      .withColumn("sdev",
        sqrt((col("srr") - col("sr") * col("sr") / wD) / wD))
      .filter(col("sdev") > 0.0)
    val perW = blocks.groupBy(col("w"))
      .agg(count(lit(1)).as("n_blocks"),
        round(sum(round(col("rng") / col("sdev"), 6).cast(DecimalType(18, 6)))
          .cast("double") / count(lit(1)).cast("double"), 6).as("rs_avg"))
    val pts = perW.select(col("w"), col("n_blocks"), col("rs_avg"),
      round(log(col("w").cast("double")), 12).as("lw"),
      round(log(col("rs_avg")), 12).as("lr"))
    val fit = pts.agg(count(lit(1)).cast("double").as("k"),
      sum(col("lw").cast(DecimalType(28, 12))).cast("double").as("slw"),
      sum(col("lr").cast(DecimalType(28, 12))).cast("double").as("slr"),
      sum(round(col("lw") * col("lw"), 12).cast(DecimalType(28, 12)))
        .cast("double").as("slww"),
      sum(round(col("lw") * col("lr"), 12).cast(DecimalType(28, 12)))
        .cast("double").as("slwr"))
    pts.crossJoin(broadcast(fit))
      .select(col("w"), col("n_blocks"), col("rs_avg"),
        round((col("k") * col("slwr") - col("slw") * col("slr"))
          / (col("k") * col("slww") - col("slw") * col("slw")), 6).as("hurst"))
      .orderBy(col("w"))
  }

  /** Q398: Allan variance of the daily event-count series — the
    * clock-stability statistic repurposed as a rate-stability profile:
    * AVAR(τ) = Σ(ȳ_{i+1} − ȳ_i)² / (2·#diffs) over means of τ-day bins,
    * for τ ∈ {1,2,4,8}. White noise decays 1/τ; a flat or rising profile
    * flags drifting ingest rates. Bin means are exact integer-count sums
    * over one double division; squared diffs use the 6-dp-rounded decimal
    * battery. Everything after the daily aggregate is calendar-bounded.
    */
  def q398AllanVariance: Q = (s, d) => {
    val grid = dailyEvents(s, d)
    val t = grid.select(col("cnt"),
      row_number().over(Window.orderBy(col("x"))).cast("long").as("t"))
    val bins = t
      .withColumn("tau", explode(array(Seq(1, 2, 4, 8).map(v => lit(v.toLong)): _*)))
      .withColumn("bin",
        floor((col("t") - 1).cast("double") / col("tau").cast("double")).cast("long"))
      .groupBy(col("tau"), col("bin"))
      .agg(count(lit(1)).as("nb"), sum(col("cnt")).as("sc"))
      .filter(col("nb") === col("tau"))
      .select(col("tau"), col("bin"),
        (col("sc").cast("double") / col("tau").cast("double")).as("y"))
    val m = bins.groupBy(col("tau")).agg(count(lit(1)).as("m_bins"))
    val diffs = bins.select(col("tau"), (col("bin") + 1).as("bin"), col("y").as("y1"))
      .join(bins.select(col("tau"), col("bin"), col("y").as("y2")), Seq("tau", "bin"))
      .groupBy(col("tau"))
      .agg(count(lit(1)).as("nd"),
        sum(round((col("y2") - col("y1")) * (col("y2") - col("y1")), 6)
          .cast(DecimalType(28, 6))).cast("double").as("sd2"))
    diffs.join(m, Seq("tau"))
      .select(col("tau"), col("m_bins"),
        round(col("sd2") / (lit(2.0) * col("nd").cast("double")), 6).as("avar"))
      .orderBy(col("tau"))
  }

  /** Q399: permutation entropy (order 3) of the daily-revenue series —
    * the ordinal-pattern complexity measure: each consecutive day triple
    * maps to the permutation that sorts it (ties broken by position, so
    * the pattern is an exact integer computed from exact decimal
    * comparisons), and PE = −Σ p ln p / ln 3! over the 6 pattern
    * frequencies. Near 1 ⇒ the series is ordinally random; low values
    * expose deterministic motifs that invalidate shuffling-based
    * samplers. ln p terms are 12-dp rounded under a decimal sum; ln 6 is
    * a shared exact double literal (no cross-libm constant).
    */
  def q399PermutationEntropy: Q = (s, d) => {
    val grid = dailyRevenue(s, d)
    val t = grid.select(col("r"),
      row_number().over(Window.orderBy(col("x"))).cast("long").as("t"))
    val tri = t.select(col("t"), col("r").as("y1"))
      .join(t.select((col("t") - 1).as("t"), col("r").as("y2")), Seq("t"))
      .join(t.select((col("t") - 2).as("t"), col("r").as("y3")), Seq("t"))
    def before(ya: Column, yb: Column, posALtB: Boolean): Column =
      when(ya < yb || (ya === yb && lit(posALtB)), 1).otherwise(0)
    // oi = how many of the other two sort strictly before element i
    val o1 = (before(col("y2"), col("y1"), posALtB = true)
      + before(col("y3"), col("y1"), posALtB = true)).as("o1")
    val o2 = (before(col("y1"), col("y2"), posALtB = false)
      + before(col("y3"), col("y2"), posALtB = true)).as("o2")
    val o3 = (before(col("y1"), col("y3"), posALtB = false)
      + before(col("y2"), col("y3"), posALtB = false)).as("o3")
    val pats = tri.select(o1, o2, o3)
      .select(concat(col("o1").cast("string"),
        col("o2").cast("string"), col("o3").cast("string")).as("pattern"))
      .groupBy(col("pattern")).agg(count(lit(1)).as("cnt"))
    val tot = pats.agg(sum(col("cnt")).as("ntri"))
    val withP = pats.crossJoin(broadcast(tot))
      .select(col("pattern"), col("cnt"),
        (col("cnt").cast("double") / col("ntri").cast("double")).as("p"))
    val h = withP.agg(
      sum(round(col("p") * log(col("p")), 12).cast(DecimalType(28, 12)))
        .cast("double").as("sh"))
    withP.crossJoin(broadcast(h))
      .select(col("pattern"), col("cnt"), round(col("p"), 6).as("p"),
        round(negate(col("sh")) / lit(1.791759469228055), 6).as("pe"))
      .orderBy(col("pattern"))
  }

  /** Q400: Page–Hinkley drift detector over the daily mean event value —
    * the sequential change-of-mean test: m_T = Σ_{t≤T}(v_t − v̄_t − δ)
    * (v̄_t = running mean), alarm when max_{s≤T} m_s − m_T > λ. The
    * detector a streaming ingest monitor would run; here the batch
    * replica over the calendar-bounded day grid. Daily means are
    * 6-dp-rounded decimals so every cumsum is exact; the running-mean
    * terms are 6-dp-rounded before their decimal cumsum; δ = 0.05,
    * λ = 2.0 as shared exact literals.
    */
  def q400PageHinkley: Q = (s, d) =>
    pageHinkleyKernel(dailyEvents(s, d))

  /** The q400 PH kernel over a (x, cnt, sv) daily-cell relation — factored
    * so the q417 streaming twin can run the SAME kernel over micro-batch-
    * merged cells (counts and exact decimal value sums merge additively).
    */
  private[graft] def pageHinkleyKernel(grid: DataFrame): DataFrame = {
    val v = grid.select(col("x"),
      round(col("sv").cast("double") / col("cnt").cast("double"), 6)
        .cast(DecimalType(18, 6)).as("v"),
      row_number().over(Window.orderBy(col("x"))).cast("long").as("t"))
    val wc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = v
      .withColumn("cum", sum(col("v")).over(wc))
      .withColumn("mt",
        round(col("cum").cast("double") / col("t").cast("double"), 6)
          .cast(DecimalType(18, 6)))
      .withColumn("cms", sum(col("mt")).over(wc))
      .withColumn("m",
        round(col("cum").cast("double") - col("cms").cast("double")
          - col("t").cast("double") * lit(0.05), 6))
    m.withColumn("mx", max(col("m")).over(wc))
      .select(col("x"), col("t"), col("m"),
        round(col("mx") - col("m"), 6).as("ph"),
        (round(col("mx") - col("m"), 6) > lit(2.0)).as("alarm"))
      .orderBy(col("t"))
  }

  /** Q406: sample L-moments per order priority — the order-statistics
    * alternative to classical moments (robust to heavy tails, the basis
    * of regional frequency analysis): λ1 (L-mean), λ2 (L-scale), and the
    * ratios τ3 (L-skewness), τ4 (L-kurtosis) from probability-weighted
    * moments b_r = Σ_j (j−1)⋯(j−r) x_(j) / (n (n−1)⋯(n−r)). The falling-
    * factorial weights are exact int64 (j ≤ n), their products with the
    * 2-dp values are exact decimals, and each b is one double division —
    * no sorting beyond the per-group rank window.
    */
  def q406Lmoments: Q = (s, d) => {
    val y = col("o_totalprice").cast(DecimalType(18, 2))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val ranked = Tables(s, d, "orders")
      .select(col("o_orderpriority").as("prio"), y.as("y"),
        row_number().over(w).cast("long").as("j"))
    val dec19 = DecimalType(19, 0)
    val m = ranked.groupBy(col("prio")).agg(
      count(lit(1)).as("n"),
      sum(col("y")).cast("double").as("s0"),
      sum(((col("j") - 1)).cast(dec19) * col("y"))
        .cast(DecimalType(38, 2)).cast("double").as("s1"),
      sum(((col("j") - 1) * (col("j") - 2)).cast(dec19) * col("y"))
        .cast(DecimalType(38, 2)).cast("double").as("s2"),
      sum(((col("j") - 1) * (col("j") - 2) * (col("j") - 3)).cast(dec19) * col("y"))
        .cast(DecimalType(38, 2)).cast("double").as("s3"))
    val nD = col("n").cast("double")
    val b0 = col("s0") / nD
    val b1 = col("s1") / (nD * (nD - lit(1.0)))
    val b2 = col("s2") / (nD * (nD - lit(1.0)) * (nD - lit(2.0)))
    val b3 = col("s3") / (nD * (nD - lit(1.0)) * (nD - lit(2.0)) * (nD - lit(3.0)))
    val l2 = lit(2.0) * b1 - b0
    val l3 = lit(6.0) * b2 - lit(6.0) * b1 + b0
    val l4 = lit(20.0) * b3 - lit(30.0) * b2 + lit(12.0) * b1 - b0
    m.select(col("prio"), col("n"),
      round(b0, 4).as("l1"), round(l2, 4).as("l2"),
      round(l3 / l2, 6).as("t3"), round(l4 / l2, 6).as("t4"))
      .orderBy(col("prio"))
  }

  /** Q407: Brown–Forsythe variance-homogeneity test across order
    * priorities — the robust Levene variant: one-way ANOVA F on the
    * absolute deviations z = |x − median_g| from the per-group LOWER
    * median (row_number-exact in both engines; the repo's even-count
    * median convention). z is an exact 2-dp decimal, so every sum of
    * squares is the 6-dp-rounded decimal battery and F is one scalar
    * expression on the 1-row collapse. Guards q364's ANOVA against
    * heteroscedastic groups.
    */
  def q407BrownForsythe: Q = (s, d) => {
    val x = col("o_totalprice").cast(DecimalType(18, 2))
    val base = Tables(s, d, "orders")
      .select(col("o_orderpriority").as("prio"), x.as("x"), col("o_orderkey"))
    val w = Window.partitionBy(col("prio"))
      .orderBy(col("x"), col("o_orderkey"))
    val med = base
      .select(col("prio"), col("x"), row_number().over(w).cast("long").as("rn"),
        count(lit(1)).over(Window.partitionBy(col("prio"))).as("cnt"))
      .filter(col("rn") === floor((col("cnt") + 1) / 2))
      .select(col("prio"), col("x").as("med"))
    val z = base.join(broadcast(med), Seq("prio"))
      .select(col("prio"), abs(col("x") - col("med")).as("z"))
    val g = z.groupBy(col("prio")).agg(count(lit(1)).as("ng"),
      sum(col("z")).as("sz"),
      sum(col("z") * col("z")).cast(DecimalType(38, 4)).as("szz"))
    val terms = g.select(col("ng"), col("sz"), col("szz"),
      round(col("sz").cast("double") * col("sz").cast("double")
        / col("ng").cast("double"), 6).cast(DecimalType(38, 6)).as("a"))
    val mom = terms.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
      sum(col("a")).cast("double").as("sa"),
      sum(col("sz")).cast("double").as("szt"),
      sum(col("szz")).cast("double").as("szzt"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val ssb = col("sa") - col("szt") * col("szt") / nD
    val ssw = col("szzt") - col("sa")
    mom.select(col("k"), col("n"),
      round((ssb / (kD - lit(1.0))) / (ssw / (nD - kD)), 6).as("f_bf"))
  }

  /** Q408: Granger causality (lag 1) — do yesterday's clicks help predict
    * today's purchases beyond yesterday's purchases? F-test of the
    * restricted AR(1) model against the full model with the click
    * regressor, both solved in closed form (2×2 / 3×3 normal equations by
    * Cramer's rule) from EXACT integer daily-count moments; the RSS
    * identities keep everything one scalar expression on the 1-row
    * moment relation. The day-pair join is calendar-bounded.
    */
  /** Daily (click count, purchase count) grid — shared by q408 Granger and
    * q424 Spearman; session-memoized like [[dailyRevenue]].
    */
  private[operators] def dailyClickPurchase(s: SparkSession, d: String): DataFrame =
    graft.Checkpoints.materializeCached(
      graft.Tables.events(s, d)
        .groupBy(datediff(col("ts2").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("x"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("b")))

  def q408Granger: Q = (s, d) => {
    val daily = dailyClickPurchase(s, d)
    val rows = daily.select((col("x") + 1).as("x2"),
        col("a").as("a1"), col("b").as("y1"))
      .join(daily.select(col("x").as("x2"), col("b").as("y")), Seq("x2"))
    val m = rows.agg(count(lit(1)).as("n"),
      sum(col("y")).as("sy"), sum(col("y1")).as("s1"), sum(col("a1")).as("s2"),
      sum(col("y") * col("y")).as("syy"), sum(col("y1") * col("y1")).as("s11"),
      sum(col("a1") * col("a1")).as("s22"), sum(col("y1") * col("a1")).as("s12"),
      sum(col("y") * col("y1")).as("s1y"), sum(col("y") * col("a1")).as("s2y"))
    val nD = col("n").cast("double")
    def D(c: Column): Column = c.cast("double")
    // restricted: y = c + φ y1
    val phiR = (nD * D(col("s1y")) - D(col("sy")) * D(col("s1"))) /
      (nD * D(col("s11")) - D(col("s1")) * D(col("s1")))
    val cR = (D(col("sy")) - phiR * D(col("s1"))) / nD
    val rssR = D(col("syy")) - cR * D(col("sy")) - phiR * D(col("s1y"))
    // full: y = c + φ y1 + β a1 — Cramer on [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]
    val det = nD * (D(col("s11")) * D(col("s22")) - D(col("s12")) * D(col("s12"))) -
      D(col("s1")) * (D(col("s1")) * D(col("s22")) - D(col("s12")) * D(col("s2"))) +
      D(col("s2")) * (D(col("s1")) * D(col("s12")) - D(col("s11")) * D(col("s2")))
    val detC = D(col("sy")) * (D(col("s11")) * D(col("s22")) - D(col("s12")) * D(col("s12"))) -
      D(col("s1")) * (D(col("s1y")) * D(col("s22")) - D(col("s12")) * D(col("s2y"))) +
      D(col("s2")) * (D(col("s1y")) * D(col("s12")) - D(col("s11")) * D(col("s2y")))
    val detP = nD * (D(col("s1y")) * D(col("s22")) - D(col("s12")) * D(col("s2y"))) -
      D(col("sy")) * (D(col("s1")) * D(col("s22")) - D(col("s12")) * D(col("s2"))) +
      D(col("s2")) * (D(col("s1")) * D(col("s2y")) - D(col("s1y")) * D(col("s2")))
    val detB = nD * (D(col("s11")) * D(col("s2y")) - D(col("s1y")) * D(col("s12"))) -
      D(col("s1")) * (D(col("s1")) * D(col("s2y")) - D(col("s1y")) * D(col("s2"))) +
      D(col("sy")) * (D(col("s1")) * D(col("s12")) - D(col("s11")) * D(col("s2")))
    val cF = detC / det
    val phiF = detP / det
    val betaF = detB / det
    val rssF = D(col("syy")) - cF * D(col("sy")) - phiF * D(col("s1y")) - betaF * D(col("s2y"))
    m.select(col("n"), round(phiF, 6).as("phi"), round(betaF, 6).as("beta"),
      round((rssR - rssF) / (rssF / (nD - lit(3.0))), 4).as("f_granger"))
  }

  /** Q409: Chow structural-break test on the daily-revenue trend — did
    * the linear model change at the fixed break day 1200? Pooled and
    * per-segment OLS in closed form from exact moments (the pooled
    * moments are the EXACT decimal/integer sums of the two segment rows,
    * so no third pass); F = ((RSS_p − RSS_1 − RSS_2)/k) /
    * ((RSS_1 + RSS_2)/(n − 2k)), k = 2.
    */
  def q409Chow: Q = (s, d) => {
    val grid = dailyRevenue(s, d)
    val seg = grid.select(col("x"), col("r"),
      when(col("x") < 1200L, lit(0L)).otherwise(lit(1L)).as("seg"))
    val g = seg.groupBy(col("seg")).agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
      sum(col("r")).as("sy"),
      sum(col("r") * col("x").cast(DecimalType(10, 0)))
        .cast(DecimalType(38, 2)).as("sxy"),
      sum(col("r") * col("r")).cast(DecimalType(38, 4)).as("syy"))
    def rss(n: Column, sx: Column, sxx: Column, sy: Column, sxy: Column,
            syy: Column): (Column, Column) = {
      val nD = n.cast("double")
      val b = (nD * sxy.cast("double") - sx.cast("double") * sy.cast("double")) /
        (nD * sxx.cast("double") - sx.cast("double") * sx.cast("double"))
      val a = (sy.cast("double") - b * sx.cast("double")) / nD
      (b, syy.cast("double") - a * sy.cast("double") - b * sxy.cast("double"))
    }
    val pooled = g.agg(sum(col("n")).as("n"), sum(col("sx")).as("sx"),
      sum(col("sxx")).as("sxx"), sum(col("sy")).as("sy"),
      sum(col("sxy")).as("sxy"), sum(col("syy")).as("syy"))
    val (_, rssP) = rss(col("n"), col("sx"), col("sxx"), col("sy"),
      col("sxy"), col("syy"))
    val pRow = pooled.select(col("n").as("n_all"), rssP.as("rss_p"))
    val (bS, rssS) = rss(col("n"), col("sx"), col("sxx"), col("sy"),
      col("sxy"), col("syy"))
    val sRows = g.select(col("seg"), col("n"), bS.as("b"), rssS.as("rss"))
    val two = sRows.agg(
      max(when(col("seg") === 0L, col("n"))).as("na"),
      max(when(col("seg") === 1L, col("n"))).as("nb"),
      max(when(col("seg") === 0L, col("b"))).as("ba"),
      max(when(col("seg") === 1L, col("b"))).as("bb"),
      max(when(col("seg") === 0L, col("rss"))).as("rssa"),
      max(when(col("seg") === 1L, col("rss"))).as("rssb"))
    two.crossJoin(broadcast(pRow))
      .select(col("na").as("n1"), col("nb").as("n2"),
        round(col("ba"), 6).as("slope_pre"), round(col("bb"), 6).as("slope_post"),
        round(((col("rss_p") - col("rssa") - col("rssb")) / lit(2.0))
          / ((col("rssa") + col("rssb"))
            / (col("n_all").cast("double") - lit(4.0))), 4).as("f_chow"))
  }

  /** Q410: method-comparison battery — Deming regression (λ = 1) and
    * Bland–Altman limits of agreement between two measurements of the
    * same order value: the header `o_totalprice` vs the lineitem charge
    * roll-up Σ price·(1−disc)·(1+tax). The per-order roll-up is exact
    * decimal; quadratic moments use the 4-dp-rounded-term battery on
    * exactly-converted doubles; β, α, and the limits are scalar
    * expressions on the 1-row moment relation. One shuffle (the order-key
    * roll-up), one broadcast join.
    */
  def q410Deming: Q = (s, d) => {
    val li = Tables(s, d, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"),
        chargeTerm(col("l_extendedprice"), col("l_discount"), col("l_tax")).as("c"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("c")).cast(DecimalType(24, 6)).as("yv"))
    val j = Tables(s, d, "orders")
      .select(col("o_orderkey"), col("o_totalprice").cast(DecimalType(18, 2)).as("xv"))
      .join(li, Seq("o_orderkey"))
      .select(col("xv").cast("double").as("xd"), col("yv").cast("double").as("yd"),
        col("xv"), col("yv"))
    val m = j.agg(count(lit(1)).as("n"),
      sum(col("xv")).cast("double").as("sx"),
      // y terms 4-dp rounded: a scale-6 decimal sum would exceed 2^53
      // scaled and hit the engines' decimal→double conversion divergence
      sum(round(col("yd"), 4).cast(DecimalType(38, 4))).cast("double").as("sy"),
      sum(col("xv") * col("xv")).cast(DecimalType(38, 4)).cast("double").as("sxx"),
      sum(round(col("yd") * col("yd"), 4).cast(DecimalType(38, 4)))
        .cast("double").as("syy"),
      sum(round(col("xd") * col("yd"), 4).cast(DecimalType(38, 4)))
        .cast("double").as("sxy"),
      sum(round((col("yd") - col("xd")) * (col("yd") - col("xd")), 4)
        .cast(DecimalType(38, 4))).cast("double").as("sdd"))
    val nD = col("n").cast("double")
    val sxxC = col("sxx") - col("sx") * col("sx") / nD
    val syyC = col("syy") - col("sy") * col("sy") / nD
    val sxyC = col("sxy") - col("sx") * col("sy") / nD
    val beta = (syyC - sxxC +
      sqrt((syyC - sxxC) * (syyC - sxxC) + lit(4.0) * sxyC * sxyC)) /
      (lit(2.0) * sxyC)
    val alpha = col("sy") / nD - beta * (col("sx") / nD)
    val meanD = (col("sy") - col("sx")) / nD
    val sdD = sqrt((col("sdd") - (col("sy") - col("sx")) * (col("sy") - col("sx")) / nD)
      / (nD - lit(1.0)))
    m.select(col("n"), round(beta, 6).as("deming_beta"),
      round(alpha, 4).as("deming_alpha"), round(meanD, 4).as("ba_mean"),
      round(meanD - lit(1.96) * sdD, 4).as("ba_lo"),
      round(meanD + lit(1.96) * sdD, 4).as("ba_hi"))
  }

  /** Q411: rank-biased overlap (p = 1/2) between the revenue and quantity
    * top-50 part rankings — the top-weighted ranking agreement measure
    * (q302's Kendall complement weights all positions equally; RBO
    * emphasizes the head, which is what catalog/eval ranking drift cares
    * about). With p = 1/2 every weight p^d/d is a DYADIC rational —
    * 1/(2^d·d) via exact integer shifts, no libm pow — so each matched
    * part contributes Σ_{d≥max(ra,rb)} 1/(2^d·d), 12-dp rounded under a
    * decimal sum. Both rankings are TakeOrdered-bounded 50-row relations.
    */
  def q411Rbo: Q = (s, d) => {
    val li = Tables(s, d, "lineitem")
    val byRev = li.groupBy(col("l_partkey"))
      .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("m"))
      .orderBy(col("m").desc, col("l_partkey")).limit(50)
    val byQty = li.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("m"))
      .orderBy(col("m").desc, col("l_partkey")).limit(50)
    val ra = byRev.select(col("l_partkey").as("pk"),
      row_number().over(Window.orderBy(col("m").desc, col("l_partkey")))
        .cast("long").as("ra"))
    val rb = byQty.select(col("l_partkey").as("pk"),
      row_number().over(Window.orderBy(col("m").desc, col("l_partkey")))
        .cast("long").as("rb"))
    val dd = ra.join(rb, Seq("pk"))
      .withColumn("dpth", explode(sequence(greatest(col("ra"), col("rb")), lit(50L))))
    dd.agg(countDistinct(col("pk")).as("n_common"),
        sum(round(lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), CAST(dpth AS INT))")
          .cast("double") / col("dpth").cast("double"), 12)
          .cast(DecimalType(28, 12)))
          .cast("double").as("raw"))
      .select(col("n_common"), round(col("raw"), 6).as("rbo"),
        (col("n_common").cast("double") / lit(50.0)).as("overlap_50"))
  }

  /** Q412: Neyman allocation — how a stratified sampler should split a
    * budget of 1000 draws across order priorities (n_h ∝ N_h·σ_h), with
    * the integer seats assigned by the largest-remainder (Hamilton)
    * method so they sum EXACTLY to 1000 (q111's apportionment
    * discipline). Stratum σ from exact moments; weights 2-dp rounded so
    * the normalizing sum is an exact decimal.
    */
  def q412NeymanAllocation: Q = (s, d) => {
    val x = col("o_totalprice").cast(DecimalType(18, 2))
    val g = Tables(s, d, "orders")
      .select(col("o_orderpriority").as("prio"), x.as("x"))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_h"), sum(col("x")).cast("double").as("sx"),
        sum(col("x") * col("x")).cast(DecimalType(38, 4)).cast("double").as("sxx"))
    val nD = col("n_h").cast("double")
    val sd = sqrt((col("sxx") - col("sx") * col("sx") / nD) / (nD - lit(1.0)))
    val wts = g.select(col("prio"), col("n_h"), round(sd, 6).as("sd"),
      round(nD * sd, 2).as("wh"))
    val tot = wts.agg(sum(col("wh").cast(DecimalType(28, 2)))
      .cast("double").as("wsum"))
    val q = wts.crossJoin(broadcast(tot))
      .withColumn("quota", lit(1000.0) * col("wh") / col("wsum"))
      .withColumn("base", floor(col("quota")))
      .withColumn("rem", col("quota") - col("base").cast("double"))
    val lo = q.agg((lit(1000L) - sum(col("base"))).as("leftover"))
    q.crossJoin(broadcast(lo))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("rem").desc, col("prio"))).cast("long"))
      .select(col("prio"), col("n_h"), col("sd"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L)).as("alloc"))
      .orderBy(col("prio"))
  }

  /** Q413: Hodges–Lehmann estimator of the weekday effect — the median of
    * all pairwise means between Monday-slot and Friday-slot daily
    * revenues (day-of-week via x mod 7 on the epoch-anchored day index —
    * no engine dayofweek convention involved). The pairwise-mean relation
    * is (calendar-bounded)², the rank is the repo's lower-median, and the
    * estimate is the exact decimal pair sum halved in one dyadic double
    * division (no rounding needed — the result is exactly representable).
    */
  def q413HodgesLehmann: Q = (s, d) => {
    val grid = dailyRevenue(s, d)
    val a = grid.filter(pmod(col("x"), lit(7L)) === 1L)
      .select(col("x").as("xa"), col("r").as("ra"))
    val b = grid.filter(pmod(col("x"), lit(7L)) === 5L)
      .select(col("x").as("xb"), col("r").as("rb"))
    val pairs = graft.Checkpoints.materialize(
      a.crossJoin(broadcast(b))
        .select((col("ra") + col("rb")).as("s2"), col("xa"), col("xb")))
    val tot = pairs.agg(count(lit(1)).as("np"))
    val n1 = a.agg(count(lit(1)).as("n1"))
    val n2 = b.agg(count(lit(1)).as("n2"))
    pairs
      .withColumn("rn", row_number()
        .over(Window.orderBy(col("s2"), col("xa"), col("xb"))).cast("long"))
      .crossJoin(broadcast(tot))
      .filter(col("rn") === floor((col("np") + 1) / 2))
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .select(col("n1"), col("n2"), col("np").as("n_pairs"),
        (col("s2").cast("double") / lit(2.0)).as("hl"))
  }

  /** Q415: Cliff's delta and Vargha–Delaney Â between document sources —
    * the nonparametric effect sizes behind q361's Mann–Whitney U: over
    * the bounded n_chars value domain, #(x>y), ties, and #(x<y) come from
    * cumulative counts on the merged value grid (exact integers, never
    * explicit pairs), so δ = (gt − lt)/(n_a·n_b) and
    * Â = (gt + ties/2)/(n_a·n_b) are exact rationals surfaced as one
    * double expression each. Six pairs over src0..src3.
    */
  def q415CliffsDelta: Q = (s, d) => {
    val docs = Tables(s, d, "documents")
      .filter(col("source").isin("src0", "src1", "src2", "src3"))
      .select(col("source"), col("n_chars").cast("long").as("v"))
    val cnts = graft.Checkpoints.materialize(
      docs.groupBy(col("source"), col("v")).agg(count(lit(1)).as("c")))
    val srcs = cnts.select(col("source")).distinct()
    val vals = cnts.select(col("v")).distinct()
    val grid = srcs.select(col("source").as("src_a"))
      .crossJoin(broadcast(srcs.select(col("source").as("src_b"))))
      .filter(col("src_a") < col("src_b"))
      .crossJoin(broadcast(vals))
    val joined = grid
      .join(cnts.select(col("source").as("src_a"), col("v"), col("c").as("ca")),
        Seq("src_a", "v"), "left")
      .join(cnts.select(col("source").as("src_b"), col("v"), col("c").as("cb")),
        Seq("src_b", "v"), "left")
      .select(col("src_a"), col("src_b"), col("v"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val w = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = joined.withColumn("cumb", sum(col("cb")).over(w) - col("cb"))
    val m = cum.groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum(col("ca") * col("cumb")).as("gt"),
        sum(col("ca") * col("cb")).as("ties"))
    val nm = (col("n_a") * col("n_b")).cast("double")
    val lt = col("n_a") * col("n_b") - col("gt") - col("ties")
    m.select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
      round((col("gt") - lt).cast("double") / nm, 6).as("delta"),
      round((col("gt").cast("double") + lit(0.5) * col("ties").cast("double")) / nm, 6)
        .as("vd_a"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Q416: Grubbs' max-deviation statistic per order priority —
    * G = max|x − x̄|/s with the arg-max order identified (ties by key).
    * The single-outlier screen that precedes q373's MAD battery when the
    * contamination is expected to be one gross error; exact moments, one
    * broadcast join, one partitioned rank window.
    */
  def q416Grubbs: Q = (s, d) => {
    val x = col("o_totalprice").cast(DecimalType(18, 2))
    val base = Tables(s, d, "orders")
      .select(col("o_orderpriority").as("prio"), x.as("x"), col("o_orderkey"))
    val g = base.groupBy(col("prio")).agg(count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("x") * col("x")).cast(DecimalType(38, 4)).cast("double").as("sxx"))
    val nD = col("n").cast("double")
    val withM = base.join(broadcast(g), Seq("prio"))
      .withColumn("dev",
        abs(col("x").cast("double") - col("sx") / col("n").cast("double")))
    val w = Window.partitionBy(col("prio")).orderBy(col("dev").desc, col("o_orderkey"))
    withM.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("prio"), col("n"), col("o_orderkey").as("outlier_key"),
        round(col("dev")
          / sqrt((col("sxx") - col("sx") * col("sx") / nD) / (nD - lit(1.0))), 6)
          .as("g"))
      .orderBy(col("prio"))
  }

  /** Q420: Friedman test + Kendall's W across event types over daily
    * blocks — the repeated-measures rank test: within each day the five
    * event-type counts are ranked with AVERAGE ranks for ties carried as
    * the exact integer 2·rank + ties − 1 (so rank sums, their squares,
    * and the tie-corrected χ²_F = (k−1)·Σ(2R_j − n(k+1))²/(ΣR2² −
    * nk(k+1)²) are ALL integer until one double division). W = χ²/(n(k−1))
    * is the agreement coefficient. Missing (day, type) cells are zero-
    * filled on the bounded grid so blocks stay complete.
    */
  def q420Friedman: Q = (s, d) => {
    val daily = graft.Tables.events(s, d)
      .groupBy(datediff(col("ts2").cast("date"), lit("2024-01-01").cast("date"))
        .cast("long").as("x"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val days = daily.select(col("x")).distinct()
    val types = daily.select(col("event_type")).distinct()
    val grid = days.crossJoin(broadcast(types))
      .join(daily, Seq("x", "event_type"), "left")
      .select(col("x"), col("event_type"), coalesce(col("c"), lit(0L)).as("c"))
    val wb = Window.partitionBy(col("x")).orderBy(col("c"))
    val we = Window.partitionBy(col("x"), col("c"))
    val r2 = grid
      .withColumn("rmin", rank().over(wb).cast("long"))
      .withColumn("ties", count(lit(1)).over(we))
      .select(col("x"), col("event_type"),
        (lit(2L) * col("rmin") + col("ties") - 1L).as("r2"))
    val perType = r2.groupBy(col("event_type"))
      .agg(sum(col("r2")).as("sr2"), sum(col("r2") * col("r2")).as("sr22"),
        count(lit(1)).as("nb"))
    val nb = perType.agg(max(col("nb")).as("n"), count(lit(1)).as("k"),
      sum(col("sr22")).as("sa2"))
    val m = perType.crossJoin(broadcast(nb))
      .select(col("n"), col("k"), col("sa2"),
        ((col("sr2") - col("n") * (col("k") + 1L))
          * (col("sr2") - col("n") * (col("k") + 1L))).as("dev2"))
      .groupBy(col("n"), col("k"), col("sa2"))
      .agg(sum(col("dev2")).as("sdev2"))
    val chi = (col("k") - 1L).cast("double") * col("sdev2").cast("double") /
      (col("sa2") - col("n") * col("k") * (col("k") + 1L) * (col("k") + 1L))
        .cast("double")
    m.select(col("n").as("n_blocks"), col("k"),
      round(chi, 6).as("chi2_f"),
      round(chi / (col("n") * (col("k") - 1L)).cast("double"), 6).as("kendalls_w"))
  }

  /** Q423: Anderson–Darling and Cramér–von Mises uniformity of the CENT
    * fraction of order prices — the q204-Benford companion for the low
    * digits (price-ending manipulation / synthetic-data tells). Both EDF
    * statistics collapse to the bounded 100-value cent domain: per value
    * the order-statistic index sums Σ(2j−1), Σ(2j−1)² are closed-form
    * exact integers, so A² and ω² are sums of one scalar term per cent
    * value (4/12-dp rounded under decimal sums) — never a data-sized
    * sort.
    */
  def q423AndersonDarling: Q = (s, d) => {
    val cents = Tables(s, d, "orders")
      .select(pmod((dec(col("o_totalprice")) * 100).cast("long"), lit(100L)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("m"))
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cents.agg(sum(col("m")).as("n"))
    val withS = cents
      .withColumn("s", sum(col("m")).over(w) - col("m"))
      .crossJoin(broadcast(tot))
    val nD = col("n").cast("double")
    val u = (col("c").cast("double") + lit(0.5)) / lit(100.0)
    val av = col("m") * (lit(2L) * col("s") + col("m"))
    val bv = col("m") * (lit(2L) * (col("n") - col("s")) - col("m"))
    // Σ_{j=1..t} (2j−1)² = t(2t−1)(2t+1)/3 — INTEGER division (`div`): the
    // product is always divisible by 3 and exceeds 2^53, so a double
    // detour would lose exactness
    val sj2 = expr("((s + m) * (2*(s + m) - 1) * (2*(s + m) + 1)" +
      " - s * (2*s - 1) * (2*s + 1)) div 3")
    val adTerm = round(av.cast("double") * log(u) + bv.cast("double") * log(lit(1.0) - u), 4)
      .cast(DecimalType(38, 4))
    val w2Term = round(col("m").cast("double") * u * u
      - (av.cast("double") / nD) * u
      + sj2.cast("double") / (lit(4.0) * nD * nD), 12).cast(DecimalType(38, 12))
    withS.groupBy(col("n"))
      .agg(sum(adTerm).cast("double").as("sad"),
        sum(w2Term).cast("double").as("sw2"))
      .select(col("n"),
        round(negate(nD) - col("sad") / nD, 4).as("a2"),
        round(lit(1.0) / (lit(12.0) * nD) + col("sw2"), 6).as("w2"))
  }

  /** Q424: Spearman rank correlation between daily click and purchase
    * counts — the monotone-association complement to q372's Kendall τ-b,
    * over the shared [[dailyClickPurchase]] grid. Average tie ranks are
    * carried as the exact integer 2·rank + ties − 1 (the q420 trick), so
    * ρ is Pearson on integer rank moments: exact until one division.
    */
  def q424Spearman: Q = (s, d) =>
    spearmanKernel(dailyClickPurchase(s, d))

  /** Q425: Cook's distance — the five most influential days of the daily-
    * revenue trend fit, D_i = e_i²·h_i/(p·s²·(1−h_i)²) with leverage
    * h_i = 1/n + (x−x̄)²/Sxx (p = 2). Regression diagnostics over the
    * shared [[dailyOlsResiduals]] kernel: everything is one scalar
    * expression per day on the calendar-bounded grid, ranked by the
    * 6-dp-rounded D (ties by day) under a TakeOrdered top-5.
    */
  def q425CooksDistance: Q = (s, d) => {
    val e = dailyOlsResiduals(s, d)
    val den = e.agg(
      sum(round(col("e") * col("e"), 6).cast(DecimalType(38, 6)))
        .cast("double").as("rss"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val sxxC = col("sxx").cast("double") - sxD * sxD / nD
    val h = lit(1.0) / nD + (col("x").cast("double") - sxD / nD) *
      (col("x").cast("double") - sxD / nD) / sxxC
    val s2 = col("rss") / (nD - lit(2.0))
    val dcook = col("e") * col("e") * h /
      (lit(2.0) * s2 * (lit(1.0) - h) * (lit(1.0) - h))
    e.crossJoin(broadcast(den))
      .select(col("x"), round(col("e"), 4).as("resid"),
        round(h, 6).as("leverage"), round(dcook, 6).as("cooks_d"))
      .orderBy(col("cooks_d").desc, col("x")).limit(5)
  }

  /** Q426: Breusch–Pagan heteroscedasticity test — regress the squared
    * daily-trend residuals on the day index; LM = n·R² ~ χ²(1) flags
    * variance growing with time (the q396 companion: DW catches serial
    * correlation, BP catches fanning). Squared residuals are 4-dp-rounded
    * decimals, so the auxiliary OLS moments are exact sums.
    */
  def q426BreuschPagan: Q = (s, d) => {
    val e = dailyOlsResiduals(s, d)
    val g = e.select(col("x"), col("n"),
      round(col("e") * col("e"), 4).as("g"))
    val m = g.agg(max(col("n")).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("g").cast(DecimalType(38, 4))).cast("double").as("sg"),
      sum(round(col("x").cast("double") * col("g"), 4).cast(DecimalType(38, 4)))
        .cast("double").as("sxg"),
      sum(round(col("g") * col("g"), 4).cast(DecimalType(38, 4)))
        .cast("double").as("sgg"))
    val nD = col("n").cast("double")
    val num = nD * col("sxg") - col("sx").cast("double") * col("sg")
    val r2 = num * num /
      ((nD * col("sxx").cast("double")
        - col("sx").cast("double") * col("sx").cast("double"))
        * (nD * col("sgg") - col("sg") * col("sg")))
    m.select(col("n"), round(r2, 6).as("r2"), round(nD * r2, 4).as("lm"))
  }

  /** Q427: Jarque–Bera normality of the daily-trend residuals —
    * JB = n/6·(S² + (K−3)²/4) from the 3rd/4th residual moments
    * (per-term-rounded decimal sums; e³/e⁴ fit DECIMAL(38,0) at the SF
    * gates). Closes the q396/q425/q426 diagnostics battery: serial
    * correlation, influence, heteroscedasticity, and now non-normality.
    */
  def q427JarqueBera: Q = (s, d) => {
    val e = dailyOlsResiduals(s, d)
    val m = e.agg(max(col("n")).as("n"),
      sum(round(col("e") * col("e"), 4).cast(DecimalType(38, 4)))
        .cast("double").as("s2"),
      sum(round(col("e") * col("e") * col("e"), 0).cast(DecimalType(38, 0)))
        .cast("double").as("s3"),
      sum(round(col("e") * col("e") * col("e") * col("e"), 0).cast(DecimalType(38, 0)))
        .cast("double").as("s4"))
    val nD = col("n").cast("double")
    val m2 = col("s2") / nD
    val skew = (col("s3") / nD) / sqrt(m2 * m2 * m2)
    val kurt = (col("s4") / nD) / (m2 * m2)
    m.select(col("n"), round(skew, 6).as("skew"), round(kurt, 6).as("kurt"),
      round(nD / lit(6.0)
        * (skew * skew + (kurt - lit(3.0)) * (kurt - lit(3.0)) / lit(4.0)), 4)
        .as("jb"))
  }

  /** Daily (click, view, purchase) count grid — q428's three-series twin
    * of [[dailyClickPurchase]].
    */
  private[operators] def dailyCvp(s: SparkSession, d: String): DataFrame =
    graft.Checkpoints.materializeCached(
      graft.Tables.events(s, d)
        .groupBy(datediff(col("ts2").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("x"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("b")))

  /** Q428: partial correlation — does the click→purchase association
    * survive controlling for views (shared traffic volume)?
    * r_ab·v = (r_ab − r_av·r_bv)/√((1−r_av²)(1−r_bv²)) from exact integer
    * daily-count moments; the confounder check q408's Granger F doesn't
    * give. One 1-row moment relation.
    */
  def q428PartialCorrelation: Q = (s, d) => {
    val daily = dailyCvp(s, d)
    val m = daily.agg(count(lit(1)).as("n"),
      sum(col("a")).as("sa"), sum(col("v")).as("sv"), sum(col("b")).as("sb"),
      sum(col("a") * col("a")).as("saa"), sum(col("v") * col("v")).as("svv"),
      sum(col("b") * col("b")).as("sbb"), sum(col("a") * col("v")).as("sav"),
      sum(col("a") * col("b")).as("sab"), sum(col("v") * col("b")).as("svb"))
    val nD = col("n").cast("double")
    def D(c: String): Column = col(c).cast("double")
    def r(sxy: String, sx: String, sy: String, sxx: String, syy: String): Column =
      (nD * D(sxy) - D(sx) * D(sy)) /
        sqrt((nD * D(sxx) - D(sx) * D(sx)) * (nD * D(syy) - D(sy) * D(sy)))
    val rab = r("sab", "sa", "sb", "saa", "sbb")
    val rav = r("sav", "sa", "sv", "saa", "svv")
    val rbv = r("svb", "sv", "sb", "svv", "sbb")
    m.select(col("n"), round(rab, 6).as("r_ab"),
      round(rav, 6).as("r_av"), round(rbv, 6).as("r_bv"),
      round((rab - rav * rbv) /
        sqrt((lit(1.0) - rav * rav) * (lit(1.0) - rbv * rbv)), 6)
        .as("r_ab_given_v"))
  }

  /** Q429: Engle–Granger cointegration screen — are CUMULATIVE clicks and
    * purchases tied to a common trend? Stage 1: closed-form OLS of the
    * purchase level on the click level (both exact integer cumsums over
    * the day grid). Stage 2: Dickey–Fuller φ on the stage-1 residuals
    * (Δz_t = φ·z_{t−1}) with its t-statistic — a strongly negative DF
    * rejects a unit root in the residual, i.e. the levels co-move. Both
    * stages are moment arithmetic; residual products are 4-dp-rounded
    * decimal sums.
    */
  def q429EngleGranger: Q = (s, d) => {
    val daily = dailyClickPurchase(s, d)
    val wc = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lev = graft.Checkpoints.materialize(
      daily.select(col("x"), sum(col("a")).over(wc).as("cx"),
        sum(col("b")).over(wc).as("cy")))
    val mom = lev.agg(count(lit(1)).as("n"), sum(col("cx")).as("sx"),
      sum(col("cy")).as("sy"), sum(col("cx") * col("cx")).as("sxx"),
      sum(col("cx") * col("cy")).as("sxy"))
    val nD = col("n").cast("double")
    val beta = (nD * col("sxy").cast("double")
      - col("sx").cast("double") * col("sy").cast("double")) /
      (nD * col("sxx").cast("double")
        - col("sx").cast("double") * col("sx").cast("double"))
    val z = lev.crossJoin(broadcast(mom.select(col("n"), col("sx"), col("sy"),
        beta.as("bt"))))
      .select(col("x"), col("n"), col("bt"),
        (col("cy").cast("double")
          - (col("sy").cast("double") - col("bt") * col("sx").cast("double"))
            / col("n").cast("double")
          - col("bt") * col("cx").cast("double")).as("z"))
    val pairs = z.select((col("x") + 1).as("x2"), col("z").as("z1"),
        col("n"), col("bt"))
      .join(z.select(col("x").as("x2"), col("z").as("z2")), Seq("x2"))
    val df = pairs.agg(max(col("n")).as("n"), max(col("bt")).as("bt"),
      count(lit(1)).as("np"),
      sum(round(col("z1") * (col("z2") - col("z1")), 4).cast(DecimalType(38, 4)))
        .cast("double").as("szd"),
      sum(round(col("z1") * col("z1"), 4).cast(DecimalType(38, 4)))
        .cast("double").as("szz"),
      sum(round((col("z2") - col("z1")) * (col("z2") - col("z1")), 4)
        .cast(DecimalType(38, 4))).cast("double").as("sdd"))
    val phi = col("szd") / col("szz")
    val npD = col("np").cast("double")
    val s2 = (col("sdd") - phi * phi * col("szz")
      - lit(2.0) * phi * (col("szd") - phi * col("szz"))) / (npD - lit(1.0))
    df.select(col("n"), round(col("bt"), 6).as("beta"),
      round(phi, 6).as("phi"),
      round(phi / sqrt(s2 / col("szz")), 4).as("df_stat"))
  }

  /** Q432: Theil T and Atkinson(1) inequality of order values per
    * priority — the decomposable complements to q194's Gini and q374's
    * Lorenz curve: T = mean((x/μ)·ln(x/μ)), A₁ = 1 − geomean/μ. Per-row
    * log terms 8-dp rounded under decimal sums; one scalar expression on
    * the per-group moment row.
    */
  def q432Inequality: Q = (s, d) => {
    val x = col("o_totalprice").cast(DecimalType(18, 2))
    val base = Tables(s, d, "orders")
      .select(col("o_orderpriority").as("prio"), x.cast("double").as("xd"))
    val g = base.groupBy(col("prio")).agg(count(lit(1)).as("n"),
      sum(round(col("xd"), 2).cast(DecimalType(18, 2))).cast("double").as("sx"),
      sum(round(log(col("xd")), 8).cast(DecimalType(28, 8)))
        .cast("double").as("slog"))
    val mu = col("sx") / col("n").cast("double")
    val withMu = base.join(broadcast(
        g.select(col("prio"), col("n"), col("sx"), mu.as("mu"))), Seq("prio"))
      .groupBy(col("prio"), col("n"), col("mu"))
      .agg(sum(round((col("xd") / col("mu")) * log(col("xd") / col("mu")), 8)
        .cast(DecimalType(28, 8))).cast("double").as("st"))
    val theil = col("st") / col("n").cast("double")
    withMu.join(g.select(col("prio"), col("slog")), Seq("prio"))
      .select(col("prio"), col("n"), round(theil, 6).as("theil_t"),
        round(lit(1.0) - exp(col("slog") / col("n").cast("double")) / col("mu"), 6)
          .as("atkinson_1"))
      .orderBy(col("prio"))
  }

  /** Q433: Bartlett's variance-homogeneity test across order priorities —
    * the normal-theory companion to q407's Brown–Forsythe (Bartlett is
    * more powerful under normality, BF robust to heavy tails; disagreement
    * between the two is itself a non-normality signal). Group variances
    * from exact moments; the k-term log sums are 8-dp-rounded decimal
    * sums over the 5-row collapse.
    */
  def q433Bartlett: Q = (s, d) => {
    val x = col("o_totalprice").cast(DecimalType(18, 2))
    val g = Tables(s, d, "orders")
      .select(col("o_orderpriority").as("prio"), x.as("x"))
      .groupBy(col("prio")).agg(count(lit(1)).as("ng"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("x") * col("x")).cast(DecimalType(38, 4)).cast("double").as("sxx"))
    val ngD = col("ng").cast("double")
    val v = (col("sxx") - col("sx") * col("sx") / ngD) / (ngD - lit(1.0))
    val terms = g.select(col("ng"),
      round((ngD - lit(1.0)) * log(v), 8).cast(DecimalType(28, 8)).as("lt"),
      round((ngD - lit(1.0)) * v, 4).cast(DecimalType(38, 4)).as("wv"),
      round(lit(1.0) / (ngD - lit(1.0)), 12).cast(DecimalType(28, 12)).as("inv"))
    val m = terms.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
      sum(col("lt")).cast("double").as("slt"),
      sum(col("wv")).cast("double").as("swv"),
      sum(col("inv")).cast("double").as("sinv"))
    val kD = col("k").cast("double")
    val nD = col("n").cast("double")
    val sp2 = col("swv") / (nD - kD)
    val chi = ((nD - kD) * log(sp2) - col("slt")) /
      (lit(1.0) + (col("sinv") - lit(1.0) / (nD - kD)) / (lit(3.0) * (kD - lit(1.0))))
    m.select(col("k"), col("n"), round(chi, 4).as("chi2_bartlett"))
  }

  /** The q424 Spearman kernel over a (x, a, b) daily-cell relation —
    * factored so the q434 streaming twin can run the SAME kernel over
    * micro-batch-merged cells.
    */
  private[graft] def spearmanKernel(daily: DataFrame): DataFrame = {
    def r2(c: String, out: String): Column = {
      val wb = Window.orderBy(col(c))
      val we = Window.partitionBy(col(c))
      (lit(2L) * rank().over(wb).cast("long") + count(lit(1)).over(we) - 1L).as(out)
    }
    val ranked = daily.select(r2("a", "ra"), r2("b", "rb"))
    val m = ranked.agg(count(lit(1)).as("n"),
      sum(col("ra")).as("sa"), sum(col("rb")).as("sb"),
      sum(col("ra") * col("ra")).as("saa"), sum(col("rb") * col("rb")).as("sbb"),
      sum(col("ra") * col("rb")).as("sab"))
    val nD = col("n").cast("double")
    m.select(col("n"),
      round((nD * col("sab").cast("double")
        - col("sa").cast("double") * col("sb").cast("double"))
        / sqrt((nD * col("saa").cast("double")
          - col("sa").cast("double") * col("sa").cast("double"))
          * (nD * col("sbb").cast("double")
            - col("sb").cast("double") * col("sb").cast("double"))), 6).as("rho"))
  }

  /** Q436: ordinal association battery — Goodman–Kruskal γ, Somers' d
    * (price|priority), and Stuart's τ-c between order priority (ordinal
    * 1..5) and fixed price quartile buckets. Concordant/discordant/tied
    * pair counts come from the bounded 5×4 contingency table's self-join
    * (20×20 cell pairs — never row pairs), all exact int64 until the
    * final divisions. The ordinal complement to q266's nominal Cramér's V
    * and q372's interval Kendall τ-b.
    */
  def q436OrdinalAssociation: Q = (s, d) => {
    val cells = Tables(s, d, "orders")
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("xo"),
        least(lit(3L), floor(col("o_totalprice").cast(DecimalType(18, 2))
          .cast("double") / lit(75000.0)).cast("long")).as("yo"))
      .groupBy(col("xo"), col("yo")).agg(count(lit(1)).as("m"))
    val cc = graft.Checkpoints.materialize(cells)
    val a = cc.select(col("xo").as("x1"), col("yo").as("y1"), col("m").as("m1"))
    val b = cc.select(col("xo").as("x2"), col("yo").as("y2"), col("m").as("m2"))
    val pairs = a.crossJoin(broadcast(b))
    val m = pairs.agg(
      sum(when(col("x2") > col("x1") && col("y2") > col("y1"),
        col("m1") * col("m2")).otherwise(0L)).as("c2"),
      sum(when(col("x2") > col("x1") && col("y2") < col("y1"),
        col("m1") * col("m2")).otherwise(0L)).as("d2"),
      sum(when(col("x2") > col("x1") && col("y2") === col("y1"),
        col("m1") * col("m2")).otherwise(0L)).as("ty2"))
    val tot = cc.agg(sum(col("m")).as("n"))
    val cD = col("c2").cast("double")
    val dD = col("d2").cast("double")
    m.crossJoin(broadcast(tot))
      .select(col("n"),
        round((cD - dD) / (cD + dD), 6).as("gamma"),
        round((cD - dD) / (cD + dD + col("ty2").cast("double")), 6).as("somers_d"),
        round(lit(2.0) * lit(4.0) * (cD - dD)
          / (col("n").cast("double") * col("n").cast("double") * lit(3.0)), 6)
          .as("tau_c"))
  }

  /** Q438: Poisson dispersion (index-of-dispersion) test on daily event
    * counts — χ² = Σ(c−c̄)²/c̄ against df = n−1; VMR ≫ 1 means the
    * arrival process is overdispersed (bursty) and Poisson-based capacity
    * planning understates tail load. Exact integer moments; the q398/q310
    * family's formal test.
    */
  def q438PoissonDispersion: Q = (s, d) => {
    val m = dailyEvents(s, d).agg(count(lit(1)).as("n"),
      sum(col("cnt")).as("sc"), sum(col("cnt") * col("cnt")).as("scc"))
    val nD = col("n").cast("double")
    val mean = col("sc").cast("double") / nD
    val ss = col("scc").cast("double") -
      col("sc").cast("double") * col("sc").cast("double") / nD
    m.select(col("n"),
      round((ss / (nD - lit(1.0))) / mean, 6).as("vmr"),
      round(ss / mean, 4).as("chi2"))
  }

  /** Q439: rolling 8-day regression beta of purchases on clicks — the
    * time-varying sensitivity a static q408 Granger can't show. Window
    * moments are exact integer sums over the calendar-bounded day grid;
    * each day's β is one closed-form scalar (full windows only).
    */
  def q439RollingBeta: Q = (s, d) => {
    val daily = dailyClickPurchase(s, d)
    val t = daily.select(col("x"), col("a"), col("b"),
      row_number().over(Window.orderBy(col("x"))).cast("long").as("t"))
    val w8 = Window.orderBy(col("t")).rowsBetween(-7, Window.currentRow)
    val withM = t
      .withColumn("n8", count(lit(1)).over(w8))
      .withColumn("sa", sum(col("a")).over(w8))
      .withColumn("sb", sum(col("b")).over(w8))
      .withColumn("saa", sum(col("a") * col("a")).over(w8))
      .withColumn("sab", sum(col("a") * col("b")).over(w8))
      .filter(col("n8") === 8L)
    val n8 = col("n8").cast("double")
    withM.select(col("x"),
      round((n8 * col("sab").cast("double")
        - col("sa").cast("double") * col("sb").cast("double"))
        / (n8 * col("saa").cast("double")
          - col("sa").cast("double") * col("sa").cast("double")), 6).as("beta"))
      .orderBy(col("x"))
  }

  /** Q442: difference-sign test on daily revenue — count upward
    * day-over-day moves P against E[P] = (n−1)/2, Var = (n+1)/12; a
    * significant z flags monotone trend that q383's median-runs test
    * (which is location-based, not difference-based) can miss. Exact
    * decimal comparisons on the consecutive-day join; one scalar z.
    */
  def q442DifferenceSign: Q = (s, d) => {
    val grid = dailyRevenue(s, d)
    val pairs = grid.select((col("x") + 1).as("x2"), col("r").as("r1"))
      .join(grid.select(col("x").as("x2"), col("r").as("r2")), Seq("x2"))
    val m = pairs.agg(count(lit(1)).as("n_diffs"),
      sum(when(col("r2") > col("r1"), 1L).otherwise(0L)).as("n_up"))
    val nD = col("n_diffs").cast("double")
    m.select(col("n_diffs"), col("n_up"),
      round((col("n_up").cast("double") - nD / lit(2.0))
        / sqrt((nD + lit(1.0)) / lit(12.0)), 4).as("z"))
  }

  /** Q443: turning-points test — count local extrema T of the daily
    * series against E[T] = 2(n−2)/3, Var = (16n−29)/90 (the classical
    * randomness test; too FEW turning points means momentum, too many
    * means negative autocorrelation). Exact decimal triple comparisons
    * on the q399-style consecutive-day joins.
    */
  def q443TurningPoints: Q = (s, d) => {
    val grid = dailyRevenue(s, d)
    val t = grid.select(col("r"),
      row_number().over(Window.orderBy(col("x"))).cast("long").as("t"))
    val tri = t.select(col("t"), col("r").as("y1"))
      .join(t.select((col("t") - 1).as("t"), col("r").as("y2")), Seq("t"))
      .join(t.select((col("t") - 2).as("t"), col("r").as("y3")), Seq("t"))
    val isTp = (col("y2") > col("y1") && col("y2") > col("y3")) ||
      (col("y2") < col("y1") && col("y2") < col("y3"))
    val m = tri.agg(count(lit(1)).as("n_triples"),
      sum(when(isTp, 1L).otherwise(0L)).as("t_count"))
    val nD = (col("n_triples") + 2L).cast("double")
    m.select(col("n_triples"), col("t_count"),
      round((col("t_count").cast("double")
        - lit(2.0) * (nD - lit(2.0)) / lit(3.0))
        / sqrt((lit(16.0) * nD - lit(29.0)) / lit(90.0)), 4).as("z"))
  }

  /** Q444: Weibull fit of order-to-ship latency by median-rank regression
    * — the reliability-engineering duration model: over the bounded
    * day-latency domain, grouped median ranks F_v = (S_v + (m_v+1)/2 −
    * 0.3)/(n + 0.4) feed the classical ln(−ln(1−F)) ~ ln(d) OLS, weighted
    * by the bucket counts (12-dp-rounded decimal moment sums). Shape < 1
    * means infant mortality (fast shipments dominate); > 1 wear-out-like
    * queueing. Never a data-sized sort — the cumsum runs on the ≤130-value
    * latency collapse.
    */
  def q444WeibullFit: Q = (s, d) => {
    val dur = Tables(s, d, "lineitem")
      .join(Tables(s, d, "orders").select(col("o_orderkey").as("l_orderkey"),
        col("o_orderdate")), Seq("l_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("dd"))
      .filter(col("dd") >= 1L)
      .groupBy(col("dd")).agg(count(lit(1)).as("m"))
    val w = Window.orderBy(col("dd"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = dur.agg(sum(col("m")).as("n"))
    val withF = dur
      .withColumn("s", sum(col("m")).over(w) - col("m"))
      .crossJoin(broadcast(tot))
      .select(col("dd"), col("m"), col("n"),
        ((col("s").cast("double") + (col("m") + 1L).cast("double") / lit(2.0)
          - lit(0.3)) / (col("n").cast("double") + lit(0.4))).as("f"))
    val pts = withF
      .select(col("m"), col("n"),
        round(log(col("dd").cast("double")), 10).as("lx"),
        round(log(negate(log(lit(1.0) - col("f")))), 10).as("ly"))
    val dec12 = DecimalType(30, 12)
    val mom = pts.agg(max(col("n")).as("n"),
      sum(col("m")).cast("double").as("sw"),
      sum(round(col("m").cast("double") * col("lx"), 10).cast(dec12))
        .cast("double").as("sx"),
      sum(round(col("m").cast("double") * col("ly"), 10).cast(dec12))
        .cast("double").as("sy"),
      sum(round(col("m").cast("double") * col("lx") * col("lx"), 10).cast(dec12))
        .cast("double").as("sxx"),
      sum(round(col("m").cast("double") * col("lx") * col("ly"), 10).cast(dec12))
        .cast("double").as("sxy"),
      sum(round(col("m").cast("double") * col("ly") * col("ly"), 10).cast(dec12))
        .cast("double").as("syy"))
    val shape = (col("sw") * col("sxy") - col("sx") * col("sy")) /
      (col("sw") * col("sxx") - col("sx") * col("sx"))
    val icept = (col("sy") - shape * col("sx")) / col("sw")
    val r2num = col("sw") * col("sxy") - col("sx") * col("sy")
    val r2 = r2num * r2num /
      ((col("sw") * col("sxx") - col("sx") * col("sx"))
        * (col("sw") * col("syy") - col("sy") * col("sy")))
    mom.select(col("n"), round(shape, 4).as("shape"),
      round(exp(negate(icept) / shape), 4).as("scale_days"),
      round(r2, 4).as("r2"))
  }

  /** Q445: variance inflation factors among the daily click/view/purchase
    * series — multicollinearity screen for q408/q428-style regressions:
    * VIF_j = 1/(1−R²_j) with each R² in closed form from the 3×3
    * correlation structure. Exact integer moments, one 1-row collapse.
    */
  def q445Vif: Q = (s, d) => {
    val daily = dailyCvp(s, d)
    val m = daily.agg(count(lit(1)).as("n"),
      sum(col("a")).as("sa"), sum(col("v")).as("sv"), sum(col("b")).as("sb"),
      sum(col("a") * col("a")).as("saa"), sum(col("v") * col("v")).as("svv"),
      sum(col("b") * col("b")).as("sbb"), sum(col("a") * col("v")).as("sav"),
      sum(col("a") * col("b")).as("sab"), sum(col("v") * col("b")).as("svb"))
    val nD = col("n").cast("double")
    def D(c: String): Column = col(c).cast("double")
    def r(sxy: String, sx: String, sy: String, sxx: String, syy: String): Column =
      (nD * D(sxy) - D(sx) * D(sy)) /
        sqrt((nD * D(sxx) - D(sx) * D(sx)) * (nD * D(syy) - D(sy) * D(sy)))
    val rav = r("sav", "sa", "sv", "saa", "svv")
    val rab = r("sab", "sa", "sb", "saa", "sbb")
    val rvb = r("svb", "sv", "sb", "svv", "sbb")
    def r2of(rxy: Column, rxz: Column, ryz: Column): Column =
      (rxy * rxy + rxz * rxz - lit(2.0) * rxy * rxz * ryz) /
        (lit(1.0) - ryz * ryz)
    m.select(col("n"),
      round(lit(1.0) / (lit(1.0) - r2of(rav, rab, rvb)), 4).as("vif_click"),
      round(lit(1.0) / (lit(1.0) - r2of(rav, rvb, rab)), 4).as("vif_view"),
      round(lit(1.0) / (lit(1.0) - r2of(rab, rvb, rav)), 4).as("vif_purchase"))
  }

  /** Q447: two-proportion power analysis — the per-arm sample size to
    * detect a 10% relative lift on the observed purchase rate at
    * α = 0.05 (two-sided), power 0.8:
    * n = (z_{α/2}√(2p̄q̄) + z_β√(p₁q₁+p₂q₂))²/(p₁−p₂)². The
    * experiment-sizing step upstream of q331's two-proportion z and
    * q323's SRM; z constants are shared exact double literals (no
    * cross-engine quantile functions). One map-side count pass.
    */
  def q447PowerAnalysis: Q = (s, d) => {
    val m = graft.Tables.events(s, d).agg(count(lit(1)).as("n"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
    val p1 = col("np").cast("double") / col("n").cast("double")
    val p2 = p1 * lit(1.1)
    val pbar = (p1 + p2) / lit(2.0)
    val za = lit(1.959963984540054)
    val zb = lit(0.8416212335729143)
    val num = za * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar)) +
      zb * sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
    m.select(col("n"), round(p1, 6).as("p1"), round(p2, 6).as("p2"),
      ceil(num * num / ((p1 - p2) * (p1 - p2))).cast("long").as("n_per_arm"))
  }

  /** Q448: odds ratio with its Woolf log-CI — evening exposure (hour ≥
    * 12) vs purchase outcome on the exact 2×2 integer table:
    * OR = ad/bc, CI = exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)). The
    * effect-size view q331's z-test doesn't give. One map-side pass.
    */
  def q448OddsRatio: Q = (s, d) => {
    val ev = graft.Tables.events(s, d)
      .select((hour(col("ts2")) >= 12).cast("long").as("e"),
        (col("event_type") === "purchase").cast("long").as("y"))
    val m = ev.agg(
      sum(when(col("e") === 1L && col("y") === 1L, 1L).otherwise(0L)).as("a"),
      sum(when(col("e") === 1L && col("y") === 0L, 1L).otherwise(0L)).as("b"),
      sum(when(col("e") === 0L && col("y") === 1L, 1L).otherwise(0L)).as("c"),
      sum(when(col("e") === 0L && col("y") === 0L, 1L).otherwise(0L)).as("dd"))
    def D(c: String): Column = col(c).cast("double")
    val or = D("a") * D("dd") / (D("b") * D("c"))
    val se = sqrt(lit(1.0) / D("a") + lit(1.0) / D("b")
      + lit(1.0) / D("c") + lit(1.0) / D("dd"))
    m.select(col("a"), col("b"), col("c"), col("dd").as("d"),
      round(or, 4).as("odds_ratio"),
      round(exp(log(or) - lit(1.96) * se), 4).as("ci_lo"),
      round(exp(log(or) + lit(1.96) * se), 4).as("ci_hi"))
  }

  /** Q455: Dunn's post-hoc test — q362's Kruskal–Wallis says SOME priority
    * differs in order value; Dunn's pairwise rank z (with the tie-corrected
    * variance and the Bonferroni bar for 10 comparisons) says WHICH:
    * z_ij = (R̄ᵢ−R̄ⱼ)/√((N(N+1)/12 − Σ(t³−t)/(12(N−1)))(1/nᵢ+1/nⱼ)).
    * Shares [[rankedBuckets]]' exact 2×-scaled average ranks; the pair
    * relation is the 5-row group summary self-joined (bounded broadcast).
    */
  def q455DunnsTest: Q = (s, d) => {
    val rb = rankedBuckets(s, d, col("o_orderpriority"))
    val per = rb.groupBy(col("g"))
      .agg(sum(col("ng")).cast("long").as("ng"),
        sum(col("ng") * col("rank2")).cast(DecimalType(38, 0)).as("r2"))
    val ties = rb.groupBy(col("b")).agg(max(col("t")).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t"))
        .cast(DecimalType(38, 0)).as("tsum"))
    val tot = per.agg(sum(col("ng")).cast("long").as("n"))
    val a = per.select(col("g").as("g1"), col("ng").as("n1"), col("r2").as("ra"))
    val b = per.select(col("g").as("g2"), col("ng").as("n2"), col("r2").as("rb"))
    val pairs = a.crossJoin(broadcast(b)).filter(col("g1") < col("g2"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(ties))
    val nD = col("n").cast("double")
    val mean1 = col("ra").cast("double") / (lit(2.0) * col("n1").cast("double"))
    val mean2 = col("rb").cast("double") / (lit(2.0) * col("n2").cast("double"))
    val varTerm = (nD * (nD + 1.0) / 12.0
      - col("tsum").cast("double") / (lit(12.0) * (nD - 1.0))) *
      (lit(1.0) / col("n1").cast("double") + lit(1.0) / col("n2").cast("double"))
    val z = (mean1 - mean2) / sqrt(varTerm)
    pairs.select(col("g1"), col("g2"), col("n1"), col("n2"),
      round(z, 6).as("z"),
      // Bonferroni-adjusted two-sided 0.05 bar for k(k-1)/2 = 10 pairs
      (abs(round(z, 6)) > lit(2.807)).as("significant"))
      .orderBy(col("g1"), col("g2"))
  }

  /** Q456: Kendall's W — do the five market segments AGREE on how the
    * seven weekday slots rank by revenue (concordance across rankers)?
    * Cell revenues are exact decimal sums from one orders⋈customer
    * aggregate; within-ranker average ranks use the 2×-scaled integer
    * trick (rank2 = 2s+t−1, exact under ties); W gets the tie correction
    * m·ΣT and the χ² = m(n−1)W companion. Day-of-week is `x mod 7` on the
    * epoch-anchored day index (q413's engine-agnostic convention). All
    * post-scan state is the 35-cell relation.
    */
  /** (segment × weekday-slot) revenue cells ranked WITHIN each segment
    * with 2×-scaled average ranks — the shared block-design machinery
    * behind q456's Kendall W and q467's Page trend test.
    */
  private[operators] def weekdayRankCells(s: SparkSession, d: String): DataFrame = {
    val cells = Tables(s, d, "orders")
      .join(Tables(s, d, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("g"),
        pmod(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long"), lit(7L)).as("slot"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
        .cast(DecimalType(18, 2)).as("rev"))
    val wRank = Window.partitionBy(col("g")).orderBy(col("rev"))
    val wTie = Window.partitionBy(col("g"), col("rev"))
    cells
      .withColumn("s", rank().over(wRank).cast("long"))
      .withColumn("t", count(lit(1)).over(wTie))
      .select(col("g"), col("slot"),
        (lit(2L) * col("s") + col("t") - 1L).as("rank2"), col("t"))
  }

  def q456KendallsW: Q = (s, d) => {
    val ranked = weekdayRankCells(s, d)
    val perSlot = ranked.groupBy(col("slot"))
      .agg(sum(col("rank2")).cast("long").as("rs2"))
    val sums = perSlot.agg(count(lit(1)).as("n"),
      sum(col("rs2") * col("rs2")).cast("long").as("sr2"))
    val tiesPer = ranked.groupBy(col("g"), col("rank2"))
      .agg(max(col("t")).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).cast("long").as("tt"))
    val m = ranked.select(col("g")).distinct().agg(count(lit(1)).as("m"))
    val j = sums.crossJoin(broadcast(tiesPer)).crossJoin(broadcast(m))
    val nD = col("n").cast("double")
    val mD = col("m").cast("double")
    val w = (lit(3.0) * col("sr2").cast("double")
      - lit(3.0) * mD * mD * nD * (nD + 1.0) * (nD + 1.0)) /
      (mD * mD * (nD * nD * nD - nD) - mD * col("tt").cast("double"))
    j.select(big(col("m")).as("m_rankers"), big(col("n")).as("n_items"),
      round(w, 6).as("w"),
      round(mD * (nD - 1.0) * w, 4).as("chi2"),
      // chi-square 0.95 critical value at n−1 = 6 df
      (round(mD * (nD - 1.0) * w, 4) > lit(12.592)).as("significant"))
  }

  /** Q467: Page's L trend test — q456 asks whether segments AGREE on the
    * weekday ranking at all; Page's L asks whether revenue trends
    * MONOTONICALLY across the week (slots as the ordered alternative):
    * L = Σⱼ sⱼRⱼ over the shared [[weekdayRankCells]] 2×-scaled ranks,
    * z = (L−mn(n+1)²/4)/√(mn²(n+1)(n²−1)/144). Exact integers until z.
    */
  def q467PageTrend: Q = (s, d) => {
    val ranked = weekdayRankCells(s, d)
    val perSlot = ranked.groupBy(col("slot"))
      .agg(sum(col("rank2")).cast("long").as("rs2"))
    val sums = perSlot.agg(count(lit(1)).as("n"),
      sum((col("slot") + 1L) * col("rs2")).cast("long").as("l2"))
    val m = ranked.select(col("g")).distinct().agg(count(lit(1)).as("m"))
    val j = sums.crossJoin(broadcast(m))
    val nD = col("n").cast("double")
    val mD = col("m").cast("double")
    val lD = col("l2").cast("double") / 2.0
    val e = mD * nD * (nD + 1.0) * (nD + 1.0) / 4.0
    val v = mD * nD * nD * (nD + 1.0) * (nD * nD - 1.0) / 144.0
    j.select(big(col("m")).as("m_blocks"), big(col("n")).as("n_slots"),
      round(lD, 1).as("l"),
      round((lD - e) / sqrt(v), 4).as("z"),
      (abs(round((lD - e) / sqrt(v), 4)) > lit(1.96)).as("significant"))
  }

  /** Q468: Jonckheere–Terpstra ordered-alternative test — q362's
    * Kruskal–Wallis has no direction; J-T tests whether order value
    * rises WITH priority order: J = Σᵢ<ⱼ Uᵢⱼ summed via per-bucket
    * cumulative counts over the shared $10 collapse (2×-scaled so
    * bucket ties contribute exactly ½): J₂ = Σ_b cⱼ(2·CumPrevᵢ + cᵢ).
    * z uses the standard no-tie null variance (documented; ties only
    * sharpen significance here). Shuffle ∝ bucket support × the 10
    * ordered group pairs, never orders².
    */
  def q468Jonckheere: Q = (s, d) => {
    val o = Tables(s, d, "orders").select(
      substring(col("o_orderpriority"), 1, 1).cast("long").as("g"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) div 1000")
        .as("b"))
    // materialized: `gb` feeds four consumers (the grid's two distinct
    // sides, the pair join, the per-group totals), each otherwise
    // re-running the bucket collapse from the one-task scan (measured 4
    // narrow-hot stages at sf0.1 — opt r14)
    val gb = graft.Checkpoints.materialize(
      o.groupBy(col("g"), col("b")).agg(count(lit(1)).as("c")))
    // zero-filled (group × merged-support) grid: a bucket where only ONE
    // group has mass still advances the other's CDF, so the cumulative
    // must run over the full support, not each group's own buckets
    val filled = gb.select(col("b")).distinct()
      .crossJoin(broadcast(gb.select(col("g")).distinct()))
      .join(gb, Seq("g", "b"), "left")
      .withColumn("c0", coalesce(col("c"), lit(0L)))
    val wg = Window.partitionBy(col("g")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = filled.withColumn("cp", coalesce(sum(col("c0")).over(wg), lit(0L)))
    val pairs = cum.select(col("g").as("gi"), col("b"),
        col("c0").as("ci"), col("cp").as("cpi"))
      .join(gb.select(col("g").as("gj"), col("b"), col("c").as("cj")), Seq("b"))
      .filter(col("gi") < col("gj"))
    val red = pairs.agg(
      sum(col("cj") * (lit(2L) * col("cpi") + col("ci")))
        .cast(DecimalType(38, 0)).as("j2"))
    val per = gb.groupBy(col("g")).agg(sum(col("c")).cast("long").as("ng"))
    val tots = per.agg(sum(col("ng")).cast("long").as("n"),
      sum(col("ng") * col("ng")).cast("long").as("sn2"),
      sum(col("ng") * col("ng") * (lit(2L) * col("ng") + 3L))
        .cast(DecimalType(38, 0)).as("sn23"))
    val jn = red.crossJoin(broadcast(tots))
    val nD = col("n").cast("double")
    val jD = col("j2").cast("double") / 2.0
    val e = (nD * nD - col("sn2").cast("double")) / 4.0
    val v = (nD * nD * (lit(2.0) * nD + 3.0) - col("sn23").cast("double")) / 72.0
    jn.select(big(col("n")).as("n"), round(jD, 1).as("j"),
      round((jD - e) / sqrt(v), 4).as("z"),
      (abs(round((jD - e) / sqrt(v), 4)) > lit(1.96)).as("significant"))
  }

  /** Q470: Theil inequality decomposition — how much order-value
    * inequality lives BETWEEN market segments vs WITHIN them (the
    * decomposition q374's Lorenz curve and q432's summary indices don't
    * give): T = Σ(xᵢ/X)ln(xᵢN/X) = T_between + Σ(X_g/X)·T_g. Per-row
    * and per-group entropy terms are single IEEE expressions rounded
    * 8 dp and decimal-summed (order-independent); the reported
    * `identity_gap` pins the decomposition closure under that rounding.
    * One orders⋈customer pass + a 5-row group reduction.
    */
  def q470TheilDecomposition: Q = (s, d) => {
    // materialized + fanned: `base` feeds three consumers (per / the total
    // entropy pass / the per-group pass), each otherwise re-running the
    // orders⋈customer join from the one-task scan, and the per-row
    // log-term partial aggs ran single-task (measured 3 narrow-hot stages
    // totalling 1.9 s at sf0.1 — opt r14); keyed by the high-cardinality
    // cents value so the fan-out avoids round-robin's pre-shuffle sort
    val base = graft.Checkpoints.materialize(
      Tables(s, d, "orders")
        .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"),
          (dec(col("o_totalprice")) * 100).cast("long").as("x"))
        .repartition(s.sparkContext.defaultParallelism, col("x")))
    val per = base.groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("x")).cast(DecimalType(38, 0)).as("xg"))
    val tot = per.agg(sum(col("ng")).cast("long").as("n"),
      sum(col("xg")).cast(DecimalType(38, 0)).as("xx"))
    val dec8 = DecimalType(38, 8)
    // total: Σ (x/X)·ln(x·N/X) over rows
    val withTot = base.crossJoin(broadcast(tot))
    val xD = col("x").cast("double")
    val term = xD / col("xx").cast("double") *
      log(xD * col("n").cast("double") / col("xx").cast("double"))
    val tTotal = withTot.agg(max(col("n")).as("n"),
      sum(round(term, 8).cast(dec8)).cast("double").as("t_total"))
    // within group g: Σ (x/X_g)·ln(x·N_g/X_g), weighted by X_g/X
    val withG = base.join(broadcast(per), Seq("g"))
    val termG = xD / col("xg").cast("double") *
      log(xD * col("ng").cast("double") / col("xg").cast("double"))
    val tg = withG.groupBy(col("g"))
      .agg(max(col("ng")).as("ng"), max(col("xg")).as("xg"),
        sum(round(termG, 8).cast(dec8)).cast("double").as("tg"))
    val tWithin = tg.crossJoin(broadcast(tot))
      .agg(sum(round(col("xg").cast("double") / col("xx").cast("double")
        * col("tg"), 8).cast(dec8)).cast("double").as("t_within"),
        sum(round(col("xg").cast("double") / col("xx").cast("double")
          * log(col("xg").cast("double") / col("xx").cast("double")
            * (col("n").cast("double") / col("ng").cast("double"))), 8)
          .cast(dec8)).cast("double").as("t_between"))
    // `+ 0.0` normalizes IEEE -0.0 → 0.0: DuckDB's ROUND keeps the sign of
    // a tiny negative gap while Spark's BigDecimal round can't represent
    // -0.0, and the driver's hash compares float BITS (r11's only red row).
    tTotal.crossJoin(broadcast(tWithin))
      .select(col("n"), (round(col("t_total"), 6) + 0.0).as("t_total"),
        (round(col("t_between"), 6) + 0.0).as("t_between"),
        (round(col("t_within"), 6) + 0.0).as("t_within"),
        (round(col("t_total") - col("t_between") - col("t_within"), 6) + 0.0)
          .as("identity_gap"))
  }

  /** Q457: Lo–MacKinlay variance-ratio test (q = 5) — is daily revenue a
    * random walk, or mean-reverting/trending? VR = σ̂²₅/(5σ̂²₁) over
    * overlapping 5-day sums, z = (VR−1)/√(4.8/n). Denominators are
    * cleared exactly: ẽ = n·c − C and d = n·M₅ − 5C are exact longs in
    * cents·n, their squares exact DECIMAL(19,0)² products, so the n²
    * factors cancel in the ratio and only the final VR/z are doubles.
    * The 5-day sums ride ONE bounded window over the calendar day grid
    * (the q397/q429 argument) — the daily aggregate is the only
    * data-sized pass.
    */
  def q457VarianceRatio: Q = (s, d) => {
    val grid = dailyRevenue(s, d)
      .select(col("x"), (col("r") * 100).cast("long").as("c"))
    val tot = grid.agg(count(lit(1)).as("n"), sum(col("c")).cast("long").as("cc"))
    val w5 = Window.orderBy(col("x")).rowsBetween(-4, Window.currentRow)
    val m5 = grid
      .withColumn("m5", sum(col("c")).over(w5))
      .withColumn("w", count(lit(1)).over(w5))
    val g2 = grid.crossJoin(broadcast(tot))
    val e = col("n") * col("c") - col("cc")
    val b1 = g2.agg(sum(e.cast(DecimalType(19, 0)) * e.cast(DecimalType(19, 0)))
      .cast(DecimalType(38, 0)).as("b"))
    val dd = col("n") * col("m5") - lit(5L) * col("cc")
    val d2 = m5.filter(col("w") === 5L).crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("mw"),
        sum(dd.cast(DecimalType(19, 0)) * dd.cast(DecimalType(19, 0)))
          .cast(DecimalType(38, 0)).as("dsq"))
    val jn = tot.crossJoin(broadcast(b1)).crossJoin(broadcast(d2))
    val nD = col("n").cast("double")
    val mD = col("mw").cast("double")
    val vr = (col("dsq").cast("double") / (mD - 1.0)) /
      (lit(5.0) * col("b").cast("double") / (nD - 1.0))
    val z = (vr - 1.0) / sqrt(lit(4.8) / nD)
    jn.select(big(col("n")).as("n_days"), big(col("mw")).as("n_windows"),
      round(vr, 6).as("vr"), round(z, 4).as("z"),
      (abs(round(z, 4)) > lit(1.96)).as("significant"))
  }

  /** Q458: KPSS level-stationarity test — the complement to q429's
    * Engle–Granger ADF direction: null = STATIONARY, so together they
    * bracket the unit-root question. η = ΣS²ₜ/(n²s²(l)) with Bartlett
    * weights at l = 4 collapses to η = A/(n(B + 0.4·W₅)) after the
    * ẽ = n·c − C denominator clearing: A = ΣS̃², B = Σẽ² and the
    * integer-weighted W₅ = Σ(5−j)Gⱼ are ALL exact DECIMAL(19,0)² sums
    * (2Σ(1−j/5)Gⱼ = 0.4·W₅ keeps the Bartlett fold in integers); the Gⱼ
    * come from (day, day+j) lag joins (q393's pair shape). Only the final
    * η division is floating. One calendar-bounded grid pass + 4 bounded
    * lag joins.
    */
  def q458Kpss: Q = (s, d) => {
    val grid = dailyRevenue(s, d)
      .select(col("x"), (col("r") * 100).cast("long").as("c"))
    val tot = grid.agg(count(lit(1)).as("n"), sum(col("c")).cast("long").as("cc"))
    val g2 = grid.crossJoin(broadcast(tot))
      .select(col("x"), (col("n") * col("c") - col("cc")).as("e"), col("n"))
    val wc = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sCum = sum(col("e")).over(wc)
    val aRed = g2.withColumn("s", sCum)
      .agg(sum(col("s").cast(DecimalType(19, 0)) * col("s").cast(DecimalType(19, 0)))
        .cast(DecimalType(38, 0)).cast("double").as("a"), max(col("n")).as("n"))
    val bRed = g2.agg(sum(col("e").cast(DecimalType(19, 0))
      * col("e").cast(DecimalType(19, 0))).cast(DecimalType(38, 0)).as("b"))
    val lagged = g2
      .withColumn("lag", explode(array((1 to 4).map(l => lit(l.toLong)): _*)))
      .select(col("lag"), (col("x") + col("lag")).as("x2"), col("e").as("e1"))
    val gj = lagged.join(g2.select(col("x").as("x2"), col("e").as("e2")), Seq("x2"))
      .groupBy(col("lag"))
      .agg(sum(col("e1").cast(DecimalType(19, 0)) * col("e2").cast(DecimalType(19, 0)))
        .cast(DecimalType(38, 0)).as("g"))
    // Bartlett fold in exact integers: 2·Σ(1−j/5)·G_j = 0.4·Σ(5−j)·G_j
    val gSum = gj.agg(sum((lit(5L) - col("lag")).cast(DecimalType(2, 0)) * col("g"))
      .cast(DecimalType(38, 0)).cast("double").as("wg5"))
    val jn = aRed.crossJoin(broadcast(bRed)).crossJoin(broadcast(gSum))
    val nD = col("n").cast("double")
    val eta = col("a") /
      (nD * (col("b").cast("double") + lit(0.4) * col("wg5")))
    jn.select(big(col("n")).as("n_days"), round(eta, 6).as("eta"),
      // 5% critical value for the level-stationarity KPSS
      (round(eta, 6) <= lit(0.463)).as("level_stationary"))
  }

  /** Q459: sample entropy SampEn(m=2, r=0.2σ) of the daily order-count
    * series — the regularity/complexity gauge q399's permutation entropy
    * approximates ordinally: −ln(A/B) over template pairs, where B counts
    * pairs matching for 2 consecutive days within tolerance r and A for
    * 3. Templates come from two calendar-adjacency self-joins on the day
    * grid (gaps drop templates, documented); the pair relation is
    * (calendar-bounded)² — the q413 argument — so cost is SF-independent.
    * σ and r are one IEEE tree over exact integer moments; every match
    * test compares exact integer differences against r.
    */
  def q459SampleEntropy: Q = (s, d) => {
    val grid = Tables(s, d, "orders")
      .groupBy(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("x"))
      .agg(count(lit(1)).as("cnt"))
    val mom = grid.agg(count(lit(1)).as("n"),
      sum(col("cnt")).cast("long").as("s1"),
      sum(col("cnt") * col("cnt")).cast("long").as("s2"))
    val nD = col("n").cast("double")
    val sd = sqrt((nD * col("s2").cast("double")
      - col("s1").cast("double") * col("s1").cast("double")) / (nD * (nD - 1.0)))
    val tol = mom.select(col("n"), (lit(0.2) * sd).as("r"))
    val g1 = grid.select((col("x") - 1L).as("x"), col("cnt").as("v1"))
    val g2 = grid.select((col("x") - 2L).as("x"), col("cnt").as("v2"))
    val trip = grid.select(col("x"), col("cnt").as("v"))
      .join(g1, Seq("x")).join(g2, Seq("x"))
    val b = trip.select(col("x").as("xb"), col("v").as("vb"),
      col("v1").as("v1b"), col("v2").as("v2b"))
    val pairs = trip.crossJoin(broadcast(b)).filter(col("x") < col("xb"))
      .crossJoin(broadcast(tol))
    val m2 = abs(col("v") - col("vb")).cast("double") <= col("r") &&
      abs(col("v1") - col("v1b")).cast("double") <= col("r")
    val m3 = m2 && abs(col("v2") - col("v2b")).cast("double") <= col("r")
    val red = pairs.agg(max(col("n")).as("n"), count(lit(1)).as("np"),
      sum(when(m2, 1L).otherwise(0L)).as("bm"),
      sum(when(m3, 1L).otherwise(0L)).as("am"))
    red.select(big(col("n")).as("n_days"), big(col("np")).as("n_pairs"),
      col("bm").as("b_matches"), col("am").as("a_matches"),
      round(log(col("bm").cast("double") / col("am").cast("double")), 6)
        .as("sampen"))
  }

  /** Q460: D'Agostino K² normality omnibus on order values — the
    * transformed-moment refinement of q427's Jarque–Bera (exact finite-n
    * null moments instead of the asymptotic 6/n, 24/n): Z₁ from the
    * D'Agostino skewness transform, Z₂ from the Anscombe–Glynn kurtosis
    * transform, K² = Z₁²+Z₂² ~ χ²₂. Power sums are 10-dp-rounded
    * megadollar terms decimal-summed (the q364 recipe at the q227-sized
    * scale); everything after is one IEEE tree on the single moment row.
    * One map-side-combined pass.
    */
  def q460DagostinoK2: Q = (s, d) => {
    val y = (dec(col("o_totalprice")) * 100).cast("long").cast("double") / 1.0e8
    def p10(c: Column): Column = round(c, 10).cast(DecimalType(38, 10))
    val m = Tables(s, d, "orders").agg(count(lit(1)).as("n"),
      sum((dec(col("o_totalprice")) * 100).cast("long")).cast("long").as("s1"),
      sum(p10(y * y)).cast("double").as("s2"),
      sum(p10(y * y * y)).cast("double").as("s3"),
      sum(p10(y * y * y * y)).cast("double").as("s4"))
    val nD = col("n").cast("double")
    val mu = col("s1").cast("double") / 1.0e8 / nD
    val m2 = col("s2") / nD - mu * mu
    val m3 = col("s3") / nD - lit(3.0) * mu * (col("s2") / nD) +
      lit(2.0) * mu * mu * mu
    val m4 = col("s4") / nD - lit(4.0) * mu * (col("s3") / nD) +
      lit(6.0) * mu * mu * (col("s2") / nD) - lit(3.0) * mu * mu * mu * mu
    val g1 = m3 / (m2 * sqrt(m2))
    val b2 = m4 / (m2 * m2)
    // D'Agostino (1970) skewness transform
    val yy = g1 * sqrt((nD + 1.0) * (nD + 3.0) / (lit(6.0) * (nD - 2.0)))
    val beta2 = lit(3.0) * (nD * nD + lit(27.0) * nD - 70.0) * (nD + 1.0) *
      (nD + 3.0) / ((nD - 2.0) * (nD + 5.0) * (nD + 7.0) * (nD + 9.0))
    val w2 = sqrt(lit(2.0) * (beta2 - 1.0)) - 1.0
    val dl = lit(1.0) / sqrt(log(sqrt(w2)))
    val alpha = sqrt(lit(2.0) / (w2 - 1.0))
    val z1 = dl * log(yy / alpha + sqrt(yy / alpha * (yy / alpha) + 1.0))
    // Anscombe-Glynn (1983) kurtosis transform
    val eb2 = lit(3.0) * (nD - 1.0) / (nD + 1.0)
    val vb2 = lit(24.0) * nD * (nD - 2.0) * (nD - 3.0) /
      ((nD + 1.0) * (nD + 1.0) * (nD + 3.0) * (nD + 5.0))
    val xs = (b2 - eb2) / sqrt(vb2)
    val sb1 = lit(6.0) * (nD * nD - lit(5.0) * nD + 2.0) /
      ((nD + 7.0) * (nD + 9.0)) *
      sqrt(lit(6.0) * (nD + 3.0) * (nD + 5.0) / (nD * (nD - 2.0) * (nD - 3.0)))
    val aa = lit(6.0) + lit(8.0) / sb1 *
      (lit(2.0) / sb1 + sqrt(lit(1.0) + lit(4.0) / (sb1 * sb1)))
    val z2 = ((lit(1.0) - lit(2.0) / (lit(9.0) * aa)) -
      cbrt((lit(1.0) - lit(2.0) / aa) /
        (lit(1.0) + xs * sqrt(lit(2.0) / (aa - 4.0))))) /
      sqrt(lit(2.0) / (lit(9.0) * aa))
    val k2 = z1 * z1 + z2 * z2
    m.select(big(col("n")).as("n"),
      round(g1, 6).as("skew"), round(b2, 6).as("kurt"),
      round(z1, 4).as("z_skew"), round(z2, 4).as("z_kurt"),
      round(k2, 4).as("k2"),
      // chi-square 0.95 critical value at 2 df
      (round(k2, 4) > lit(5.991)).as("non_normal"))
  }

  /** Q466: t-closeness audit — completes the q254/q318 privacy trio: a
    * k-anonymous, l-diverse release can still leak if a QI class's
    * sensitive-value DISTRIBUTION diverges from the global one. For each
    * (nation, segment) class, the ordered-EMD t = Σ|cumdiff|/((k−1)·N·n_c)
    * between its $1000-balance-bucket distribution and the corpus-wide
    * one, with denominators cleared so every cumulative term is an exact
    * integer (cb·N − nb·n_c). The grid is classes × global buckets
    * (zero-filled — missing buckets carry mass 0), the cumsum is
    * partitioned per class; top-10 worst classes at the t > 0.2 bar.
    */
  def q466TCloseness: Q = (s, d) => {
    val base = Tables(s, d, "customer")
      .select(col("c_nationkey").cast("long").as("nk"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal").cast("double") / lit(1000.0)).cast("long").as("b"))
    tClosenessReport(base.groupBy(col("nk"), col("seg"), col("b"))
      .agg(count(lit(1)).as("cb")))
  }

  /** The q466 t-closeness kernel over a (nk, seg, b, cb) cell collapse —
    * factored so the q469 streaming twin runs the SAME kernel over
    * micro-batch-merged cells (class×bucket cells merge by plain sum).
    */
  private[graft] def tClosenessReport(cellCnt: DataFrame): DataFrame = {
    val classes = cellCnt.groupBy(col("nk"), col("seg"))
      .agg(sum(col("cb")).cast("long").as("nc"))
    val glob = cellCnt.groupBy(col("b")).agg(sum(col("cb")).cast("long").as("nb"))
    val tot = glob.agg(sum(col("nb")).cast("long").as("nn"),
      count(lit(1)).as("k"))
    val grid = classes.crossJoin(broadcast(glob))
      .join(cellCnt, Seq("nk", "seg", "b"), "left")
      .withColumn("cb", coalesce(col("cb"), lit(0L)))
    val wcl = Window.partitionBy(col("nk"), col("seg")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stepped = grid.crossJoin(broadcast(tot))
      .withColumn("dcum",
        sum(col("cb") * col("nn") - col("nb") * col("nc")).over(wcl))
    val per = stepped.groupBy(col("nk"), col("seg"))
      .agg(max(col("nc")).as("nc"), max(col("nn")).as("nn"),
        max(col("k")).as("k"),
        sum(abs(col("dcum"))).cast(DecimalType(38, 0)).as("sd"))
    val t = round(col("sd").cast("double") /
      ((col("k").cast("double") - 1.0) * col("nn").cast("double")
        * col("nc").cast("double")), 6)
    per.select(col("nk").as("nationkey"), col("seg").as("segment"),
      col("nc").as("class_size"), t.as("t"),
      (t > lit(0.2)).as("violates"))
      .orderBy(col("t").desc, col("nationkey"), col("segment"))
      .limit(10)
  }

  /** Q479: 1-D DBSCAN over the value cent-support — density clusters of
    * transaction values with ε = 3 cents, minPts = 50: maximal runs of
    * occupied cents with inter-value gap ≤ ε, mass-filtered into core
    * clusters vs noise. In one dimension the DBSCAN fixpoint collapses to
    * a gaps-and-islands pass over the BOUNDED support (the q363
    * argument) — no iteration, no pairwise distances; exactly how a
    * price-point/denomination structure audit should run at any corpus
    * size. Top-10 clusters by mass, deterministic order.
    */
  def q479Dbscan1d: Q = (s, d) => {
    val byc = Tables.events(s, d)
      .select((dec(col("value")) * 100).cast("long").as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("t"))
    val w = Window.orderBy(col("c"))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isl = byc
      .withColumn("gap", col("c") - lag(col("c"), 1).over(w))
      .withColumn("nw", when(col("gap").isNull || col("gap") > 3L, 1L)
        .otherwise(0L))
      .withColumn("cl", sum(col("nw")).over(wc))
    isl.groupBy(col("cl"))
      .agg(min(col("c")).as("lo_cents"), max(col("c")).as("hi_cents"),
        count(lit(1)).as("n_values"), sum(col("t")).cast("long").as("mass"))
      .select(col("lo_cents"), col("hi_cents"), big(col("n_values")).as("n_values"),
        col("mass"), (col("mass") >= 50L).as("core"))
      .orderBy(col("mass").desc, col("lo_cents"))
      .limit(10)
  }

  /** Q480: Mahalanobis outlier days — which days' (clicks, purchases)
    * pair is jointly anomalous once their correlation is priced in (the
    * 2-D sharpening of q373's univariate MAD): d² = (x−μ)ᵀΣ⁻¹(x−μ) with
    * μ/Σ from exact integer daily moments and the 2×2 inverse in closed
    * form — one IEEE tree per day. Flag at the χ²₂ 0.999 bar. One
    * calendar-bounded grid pass + a 1-row moment broadcast.
    */
  def q480Mahalanobis: Q = (s, d) => {
    val daily = dailyCvp(s, d).select(col("x"), col("a"), col("b"))
    val mom = daily.agg(count(lit(1)).as("n"),
      sum(col("a")).cast("long").as("sa"), sum(col("b")).cast("long").as("sb"),
      sum(col("a") * col("a")).cast("long").as("saa"),
      sum(col("b") * col("b")).cast("long").as("sbb"),
      sum(col("a") * col("b")).cast("long").as("sab"))
    val j = daily.crossJoin(broadcast(mom))
    val nD = col("n").cast("double")
    val mua = col("sa").cast("double") / nD
    val mub = col("sb").cast("double") / nD
    val vaa = col("saa").cast("double") / nD - mua * mua
    val vbb = col("sbb").cast("double") / nD - mub * mub
    val vab = col("sab").cast("double") / nD - mua * mub
    val det = vaa * vbb - vab * vab
    val da = col("a").cast("double") - mua
    val db = col("b").cast("double") - mub
    val d2 = (da * (vbb * da - vab * db) + db * (vaa * db - vab * da)) / det
    j.select(col("x").as("day"), col("a").as("clicks"), col("b").as("purchases"),
        round(d2, 4).as("d2"),
        // chi-square 0.999 critical value at 2 df
        (round(d2, 4) > lit(13.816)).as("outlier"))
      .orderBy(col("d2").desc, col("day"))
      .limit(10)
  }

  /** Q481: deterministic 1-D Gaussian-mixture EM (2 components, 5
    * unrolled iterations) over the transaction-value cent support — the
    * model-based clustering q479's density runs can't give (overlapping
    * components, soft assignment, a parametric read of the value
    * structure). Every E-step responsibility γ is ONE IEEE expression
    * rounded to 8 dp; every M-step moment is a decimal sum of per-bucket
    * rounded terms with scales SIZED so each (38,s) sum's scaled integer
    * stays < 2⁵³ (γ·t at 8 dp, γ·t·v at 4, γ·t·v² at 2 — the q227/q364
    * rule), so the reduction is order-independent and the decimal→double
    * exits are exact in both engines; the second component's sums come
    * by subtraction from the exact global integer moments. The fixpoint
    * replays bit-for-bit in the oracle's 5 unrolled MATERIALIZED CTEs
    * (the q371 discipline). Initialization is the exact lower quartiles
    * + pooled variance. Per iteration: one bounded-support aggregate
    * under a 1-row parameter broadcast.
    */
  def q481Gmm1d: Q = (s, d) =>
    gmmReport(graft.Checkpoints.materialize(
      Tables.events(s, d)
        .select((dec(col("value")) * 100).cast("long").as("c"))
        .groupBy(col("c")).agg(count(lit(1)).as("t"))))

  /** The q481 EM kernel over a (c, t) cent-count collapse — factored so
    * the q484 streaming twin runs the SAME 5-iteration fixpoint over
    * micro-batch-merged cells (cent cells merge by plain sum).
    */
  private[graft] def gmmReport(byc: DataFrame): DataFrame = {
    val tot = byc.agg(sum(col("t")).cast("long").as("n"),
      sum(col("t") * col("c")).cast("long").as("sv"),
      sum(col("t") * col("c") * col("c")).cast("long").as("sq"))
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byc.withColumn("cum", sum(col("t")).over(w))
      .crossJoin(broadcast(tot))
    def quant(pct: Int): DataFrame = cum
      .filter(expr(s"cum >= ($pct * n + 99) div 100"))
      .agg(min(col("c")).as(s"q$pct"))
    val nD = col("n").cast("double")
    val varAll = col("sq").cast("double") / nD -
      col("sv").cast("double") / nD * (col("sv").cast("double") / nD)
    var params = graft.Checkpoints.materialize(
      tot.crossJoin(broadcast(quant(25))).crossJoin(broadcast(quant(75)))
        .select(col("n"), col("sv"), col("sq"),
          lit(0.5).as("p1"),
          col("q25").cast("double").as("mu1"), varAll.as("s1"),
          col("q75").cast("double").as("mu2"), varAll.as("s2")))
    for (_ <- 1 to 5) {
      val j = byc.crossJoin(broadcast(params))
      val vD = col("c").cast("double")
      val l1 = col("p1") / sqrt(col("s1")) *
        exp((vD - col("mu1")) * (vD - col("mu1")) / (lit(-2.0) * col("s1")))
      val l2 = (lit(1.0) - col("p1")) / sqrt(col("s2")) *
        exp((vD - col("mu2")) * (vD - col("mu2")) / (lit(-2.0) * col("s2")))
      val g = round(l1 / (l1 + l2), 8)
      val tD = col("t").cast("double")
      val red = j.agg(max(col("n")).as("n"), max(col("sv")).as("sv"),
        max(col("sq")).as("sq"),
        sum(round(tD * g, 8).cast(DecimalType(38, 8)))
          .cast("double").as("n1"),
        sum(round(tD * vD * g, 4).cast(DecimalType(38, 4)))
          .cast("double").as("sv1"),
        sum(round(tD * vD * vD * g, 2).cast(DecimalType(38, 2)))
          .cast("double").as("sq1"))
      val n1D = col("n1")
      val sv1D = col("sv1")
      val sq1D = col("sq1")
      val n2D = col("n").cast("double") - n1D
      val sv2D = col("sv").cast("double") - sv1D
      val sq2D = col("sq").cast("double") - sq1D
      params = graft.Checkpoints.materialize(
        red.select(col("n"), col("sv"), col("sq"),
          (n1D / col("n").cast("double")).as("p1"),
          (sv1D / n1D).as("mu1"),
          (sq1D / n1D - sv1D / n1D * (sv1D / n1D)).as("s1"),
          (sv2D / n2D).as("mu2"),
          (sq2D / n2D - sv2D / n2D * (sv2D / n2D)).as("s2")))
    }
    params.select(col("n"),
      round(col("p1"), 6).as("pi1"),
      round(col("mu1") / 100.0, 4).as("mu1_dollars"),
      round(sqrt(col("s1")) / 100.0, 4).as("sigma1_dollars"),
      round(col("mu2") / 100.0, 4).as("mu2_dollars"),
      round(sqrt(col("s2")) / 100.0, 4).as("sigma2_dollars"),
      round(abs(col("mu2") - col("mu1")) /
        sqrt((col("s1") + col("s2")) / 2.0), 4).as("separation"))
  }

  /** Q485: negative-binomial fit of the daily order-count series — the
    * overdispersion-aware count model q438's Poisson dispersion test says
    * you need when D > 1: method-of-moments r = μ²/(σ²−μ), p = μ/σ²,
    * from exact integer moments with the sample (n−1) variance; one
    * calendar-bounded grid pass. Reported with the Poisson-vs-NB variance
    * ratio so the fit's justification rides along.
    */
  def q485NegbinFit: Q = (s, d) => {
    val mom = Tables(s, d, "orders")
      .groupBy(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("x"))
      .agg(count(lit(1)).as("v"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("long").as("s1"),
        sum(col("v") * col("v")).cast("long").as("s2"))
    val nD = col("n").cast("double")
    val mu = col("s1").cast("double") / nD
    val v = (col("s2").cast("double") - col("s1").cast("double")
      * col("s1").cast("double") / nD) / (nD - 1.0)
    mom.select(big(col("n")).as("n_days"),
      round(mu, 4).as("mean"), round(v, 4).as("variance"),
      round(v / mu, 4).as("dispersion"),
      round(mu * mu / (v - mu), 4).as("nb_r"),
      round(mu / v, 6).as("nb_p"),
      (round(v / mu, 4) > lit(1.0)).as("overdispersed"))
  }

  /** Q482: Hampel filter — the rolling-median outlier annotation of the
    * daily order-count series (robust where q368's EWMA is mean-based and
    * q373's MAD is global, not local): per day, the LOWER median and MAD
    * of the ±3-calendar-day window (edge windows truncate, documented),
    * flagged where |v−med|·10⁴ > 44478·MAD — the 3·1.4826 Gaussian-
    * consistent bar in EXACT integer arithmetic, no float compare. The
    * window members come from a 7-offset calendar join; per-center medians
    * sort ≤7-element arrays (bounded). Output is the full annotated grid.
    */
  def q482Hampel: Q = (s, d) => {
    val grid = Tables(s, d, "orders")
      .groupBy(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("x"))
      .agg(count(lit(1)).as("v"))
    val off = grid
      .withColumn("o", explode(array((-3 to 3).map(i => lit(i.toLong)): _*)))
      .select((col("x") + col("o")).as("xc"), col("v"))
    val med = off.groupBy(col("xc"))
      .agg(sort_array(collect_list(col("v"))).as("arr"))
      .select(col("xc"),
        element_at(col("arr"), expr("CAST((size(arr) + 1) div 2 AS INT)")).as("med"))
    val mad = off.join(med, Seq("xc"))
      .select(col("xc"), abs(col("v") - col("med")).as("ad"), col("med"))
      .groupBy(col("xc"))
      .agg(max(col("med")).as("med"),
        sort_array(collect_list(col("ad"))).as("arr2"))
      .select(col("xc"), col("med"),
        element_at(col("arr2"), expr("CAST((size(arr2) + 1) div 2 AS INT)")).as("mad"))
    grid.join(mad, col("x") === col("xc"))
      .select(col("x").as("day"), col("v").as("orders"), col("med"),
        col("mad"),
        (abs(col("v") - col("med")) * 10000L > col("mad") * 44478L)
          .as("outlier"))
      .orderBy(col("day"))
  }

  /** Q483: Western Electric run rules — the full SPC rule battery over
    * per-type hourly volume z-scores (q368's EWMA sees slow drift; the WE
    * rules catch the patterns a single limit misses): R1 |z|>3, R2 two of
    * three consecutive beyond 2σ same side, R3 four of five beyond 1σ
    * same side, R4 eight consecutive on one side. z comes from exact
    * per-type integer moments (one IEEE tree); the rules are lag-window
    * counts over OBSERVED hours (gap semantics documented), partitioned
    * per type over the bounded hourly collapse. Output: violating hours.
    */
  def q483WesternElectric: Q = (s, d) => {
    val hourly = Tables.events(s, d)
      .select(col("event_type"), expr("CAST(ts2 AS LONG) div 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
    val mom = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nh"), sum(col("c")).cast("long").as("sc"),
        sum(col("c") * col("c")).cast("long").as("scc"))
    val j = hourly.join(mom, Seq("event_type"))
    val nD = col("nh").cast("double")
    val mu = col("sc").cast("double") / nD
    val sigma = sqrt(col("scc").cast("double") / nD - mu * mu)
    val z = (col("c").cast("double") - mu) / sigma
    val zd = j.select(col("event_type"), col("h"), col("c"), z.as("z"))
    def cnt(w: org.apache.spark.sql.expressions.WindowSpec, cond: Column): Column =
      sum(when(cond, 1L).otherwise(0L)).over(w)
    def wLast(k: Int) = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-(k - 1), Window.currentRow)
    val r1 = abs(col("z")) > 3.0
    val r2 = cnt(wLast(3), col("z") > 2.0) >= 2L || cnt(wLast(3), col("z") < -2.0) >= 2L
    val r3 = cnt(wLast(5), col("z") > 1.0) >= 4L || cnt(wLast(5), col("z") < -1.0) >= 4L
    val r4 = cnt(wLast(8), col("z") > 0.0) >= 8L || cnt(wLast(8), col("z") < 0.0) >= 8L
    zd.select(col("event_type"), col("h"), col("c"), round(col("z"), 4).as("z"),
        r1.as("r1"), r2.as("r2"), r3.as("r3"), r4.as("r4"))
      .filter(col("r1") || col("r2") || col("r3") || col("r4"))
      .orderBy(col("event_type"), col("h"))
  }

  /** Q449: Mantel–Haenszel pooled odds ratio across strata — q448's 2×2
    * (high-value exposure × fulfilled outcome) stratified by order
    * priority, so priority-mix confounding is adjusted out: OR_MH =
    * Σ(aᵏdᵏ/nᵏ)/Σ(bᵏcᵏ/nᵏ) with the MH chi-square (Σa − ΣE)²/ΣV.
    * Cells are exact integers from ONE map-side-combined aggregate over
    * orders; the per-stratum R/S/E/V terms are each one IEEE expression
    * rounded at 6 dp and decimal-summed (the q362 srq recipe), so the
    * reduction is order-independent at any partitioning. The 5-row
    * stratum relation is the only post-scan state — at 100 TB this is
    * still one aggregate.
    */
  def q449MantelHaenszel: Q = (s, d) => {
    val o = Tables(s, d, "orders").select(
      col("o_orderpriority").as("g"),
      (col("o_totalprice") >= 150000.0).as("e"),
      (col("o_orderstatus") === "F").as("y"))
    val per = o.groupBy(col("g")).agg(
      sum(when(col("e") && col("y"), 1L).otherwise(0L)).as("a"),
      sum(when(col("e") && !col("y"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("e") && col("y"), 1L).otherwise(0L)).as("c"),
      sum(when(!col("e") && !col("y"), 1L).otherwise(0L)).as("dd"))
    def D(c: String): Column = col(c).cast("double")
    val nD = D("a") + D("b") + D("c") + D("dd")
    def term6(x: Column): Column = round(x, 6).cast(DecimalType(38, 6))
    val m = per.agg(count(lit(1)).as("k"),
      sum(col("a") + col("b") + col("c") + col("dd")).cast("long").as("n"),
      sum(col("a")).cast("long").as("suma"),
      sum(term6(D("a") * D("dd") / nD)).cast("double").as("sr"),
      sum(term6(D("b") * D("c") / nD)).cast("double").as("ss"),
      sum(term6((D("a") + D("b")) * (D("a") + D("c")) / nD)).cast("double").as("se"),
      sum(term6((D("a") + D("b")) * (D("c") + D("dd")) * (D("a") + D("c"))
        * (D("b") + D("dd")) / (nD * nD * (nD - lit(1.0))))).cast("double").as("sv"))
    val chi2 = (col("suma").cast("double") - col("se")) *
      (col("suma").cast("double") - col("se")) / col("sv")
    m.select(big(col("k")).as("k_strata"), col("n"), col("suma").as("exposed_cases"),
      round(col("sr") / col("ss"), 4).as("or_mh"),
      round(chi2, 4).as("chi2_mh"),
      (round(chi2, 4) > lit(3.841)).as("significant"))
  }

  /** Q450: Mood's median test — does account balance differ across market
    * segments in LOCATION, nonparametrically: counts above/below the
    * pooled LOWER median (sorted element at position (n+1) div 2, the
    * repo's median convention), chi-square over the 2×k table. The
    * median comes from a cumulative window over the CENT-VALUE collapse
    * (support bounded by the balance domain, ≤1.1M cents at any corpus
    * size — the q363 argument), never the customer relation; the 1-row
    * median then broadcasts back onto the scan. Per-segment chi terms
    * are single IEEE expressions rounded 6 dp, decimal-summed.
    */
  def q450MoodMedian: Q = (s, d) => {
    val cents = Tables(s, d, "customer").select(col("c_mktsegment").as("g"),
      (dec(col("c_acctbal")) * 100).cast("long").as("c"))
    val byc = cents.groupBy(col("c")).agg(count(lit(1)).as("t"))
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byc.agg(sum(col("t")).cast("long").as("n"))
    val med = byc.withColumn("cum", sum(col("t")).over(w))
      .crossJoin(broadcast(tot))
      .filter(expr("cum >= (n + 1) div 2"))
      .agg(min(col("c")).as("med"))
    val seg = cents.crossJoin(broadcast(med)).groupBy(col("g"))
      .agg(count(lit(1)).as("ng"),
        sum(when(col("c") > col("med"), 1L).otherwise(0L)).as("ag"))
    val totals = seg.agg(sum(col("ng")).cast("long").as("n"),
      sum(col("ag")).cast("long").as("aa"), count(lit(1)).as("k"))
    val jt = seg.crossJoin(broadcast(totals))
    val nD = col("n").cast("double")
    val aD = col("aa").cast("double")
    val ngD = col("ng").cast("double")
    val agD = col("ag").cast("double")
    val eA = ngD * aD / nD
    val eB = ngD * (nD - aD) / nD
    val term = round((agD - eA) * (agD - eA) / eA
      + ((ngD - agD) - eB) * ((ngD - agD) - eB) / eB, 6)
    val agg = jt.agg(max(col("n")).as("n"), max(col("k")).as("k"),
      sum(term.cast(DecimalType(38, 6))).cast("double").as("chi2"))
    agg.crossJoin(broadcast(med))
      .select(col("n"), big(col("k")).as("k_segments"),
        round(col("med").cast("double") / 100.0, 2).as("median_acctbal"),
        round(col("chi2"), 6).as("chi2"),
        // chi-square 0.95 critical value at k−1 = 4 df
        (round(col("chi2"), 6) > lit(9.488)).as("significant"))
  }

  /** Q451: Cochran–Armitage trend test — does purchase propensity TREND
    * monotonically across ordered time-of-day buckets (hour div 6, scores
    * 0..3)? T = Σsᵏ(aᵏ − nᵏp̄) with Var = p̄(1−p̄)(Σs²n − (Σsn)²/N); all
    * five sufficient sums are exact integers from ONE map-side-combined
    * pass over events, the z is one final IEEE tree. The dose-response
    * sharpening of q331's two-proportion z.
    */
  def q451CochranArmitage: Q = (s, d) => {
    val sc = expr("CAST(hour(ts2) AS BIGINT) div 6")
    val y = when(col("event_type") === "purchase", 1L).otherwise(0L)
    val m = Tables.events(s, d).select(sc.as("s"), y.as("y"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("a"),
        sum(col("s") * col("y")).as("sa"), sum(col("s")).as("sn1"),
        sum(col("s") * col("s")).as("sn2"))
    def D(c: String): Column = col(c).cast("double")
    val pbar = D("a") / D("n")
    val t = D("sa") - pbar * D("sn1")
    val v = pbar * (lit(1.0) - pbar) * (D("sn2") - D("sn1") * D("sn1") / D("n"))
    m.select(big(col("n")).as("n"), big(col("a")).as("purchases"),
      round(t / sqrt(v), 6).as("z"),
      (abs(round(t / sqrt(v), 6)) > lit(1.96)).as("significant"))
  }

  /** Q452: energy distance between the first- and second-half `value`
    * distributions — the rotation/scale-sensitive drift companion to
    * q363's W₁ (energy sees shape changes W₁ underweights): D² = 2E|X−Y|
    * − E|X−X′| − E|Y−Y′|, each expectation computed EXACTLY over the
    * bounded cent-support collapse via the CDF identity E|X−Y| =
    * ∫(F₁+F₂−2F₁F₂)dt with denominators cleared: per merged-support gap,
    * integer numerators f₁(N₂−f₂)+f₂(N₁−f₁) (cross), 2f₁(N₁−f₁) and
    * 2f₂(N₂−f₂) (within), decimal-summed. Long arithmetic is exact while
    * Nᵢ·support·gap < 2⁶³ (documented like q363's kernel; promote to
    * decimal multiplies past ~1e9 rows/side). Shuffle ∝ distinct cents.
    */
  def q452EnergyDistance: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(epochSec(col("ts2")).as("t"),
        (dec(col("value")) * 100).cast("long").as("c"))
    val m = ev.agg(expr("(MIN(t) + MAX(t)) div 2").as("mid"))
    energyReport(ev.crossJoin(broadcast(m)).groupBy(col("c"))
      .agg(sum(when(col("t") < col("mid"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("t") >= col("mid"), 1L).otherwise(0L)).as("c2")))
  }

  /** The q452 energy-distance kernel over a (c, c1, c2) cent-count
    * collapse — factored so the q465 streaming twin runs the SAME kernel
    * over micro-batch-merged cells (cent cells merge by plain sum).
    */
  private[graft] def energyReport(byc: DataFrame): DataFrame = {
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byc.agg(sum(col("c1")).cast("long").as("n1"),
      sum(col("c2")).cast("long").as("n2"))
    val steps = byc
      .withColumn("f1", sum(col("c1")).over(w))
      .withColumn("f2", sum(col("c2")).over(w))
      .withColumn("gap", lead(col("c"), 1).over(Window.orderBy(col("c"))) - col("c"))
      .filter(col("gap").isNotNull)
    val red = steps.crossJoin(broadcast(tot)).agg(
      max(col("n1")).as("na"), max(col("n2")).as("nb"),
      sum(((col("f1") * (col("n2") - col("f2"))
        + col("f2") * (col("n1") - col("f1"))) * col("gap"))
        .cast(DecimalType(38, 0))).as("across"),
      sum((lit(2L) * col("f1") * (col("n1") - col("f1")) * col("gap"))
        .cast(DecimalType(38, 0))).as("within1"),
      sum((lit(2L) * col("f2") * (col("n2") - col("f2")) * col("gap"))
        .cast(DecimalType(38, 0))).as("within2"))
    val naD = col("na").cast("double")
    val nbD = col("nb").cast("double")
    val eD = (lit(2.0) * col("across").cast("double") / (naD * nbD)
      - col("within1").cast("double") / (naD * naD)
      - col("within2").cast("double") / (nbD * nbD)) / 100.0
    red.select(big(col("na")).as("n_first"), big(col("nb")).as("n_second"),
      col("across").cast("string").as("across_scaled"),
      col("within1").cast("string").as("within1_scaled"),
      col("within2").cast("string").as("within2_scaled"),
      round(eD, 6).as("energy_distance"))
  }

  /** Q453: two-sample Cramér–von Mises — URGENT vs rest order values over
    * the $10-bucket collapse (q361's bounded support): T = Σtₖ(F₁−F₂)²·
    * N₁N₂/(N₁+N₂)² with the CDF gap computed from the exact long
    * f₁N₂−f₂N₁ (< 2⁵³, so its double image is exact; so is N₁·N₂), the
    * per-bucket tₖ(F₁−F₂)² term ONE IEEE expression rounded 8 dp and
    * decimal-summed (Σ terms ≤ N, so the (38,8) scaled integer stays
    * < 2⁵³ — the q227 scale-sizing rule). Where q297's KS sees only the
    * max CDF gap, CvM integrates ALL of it — more power against spread
    * differences.
    */
  def q453CramerVonMises: Q = (s, d) => {
    val o = Tables(s, d, "orders").select(
      (col("o_orderpriority") === "1-URGENT").as("g"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) div 1000")
        .as("b"))
    val byb = o.groupBy(col("b")).agg(
      sum(when(col("g"), 1L).otherwise(0L)).as("c1"),
      sum(when(!col("g"), 1L).otherwise(0L)).as("c2"))
    val w = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byb.agg(sum(col("c1")).cast("long").as("n1"),
      sum(col("c2")).cast("long").as("n2"))
    val steps = byb
      .withColumn("f1", sum(col("c1")).over(w))
      .withColumn("f2", sum(col("c2")).over(w))
    val dd = (col("f1") * col("n2") - col("f2") * col("n1")).cast("double") /
      (col("n1").cast("double") * col("n2").cast("double"))
    val term = round(dd * dd * (col("c1") + col("c2")).cast("double"), 8)
    val red = steps.crossJoin(broadcast(tot)).agg(
      max(col("n1")).as("n1"), max(col("n2")).as("n2"),
      sum(term.cast(DecimalType(38, 8))).cast("double").as("srq"))
    val n1D = col("n1").cast("double")
    val n2D = col("n2").cast("double")
    val t = col("srq") * n1D * n2D /
      ((n1D + n2D) * (n1D + n2D))
    red.select(big(col("n1")).as("n_urgent"), big(col("n2")).as("n_rest"),
      round(t, 6).as("t"),
      // asymptotic 0.95 critical value of the two-sample CvM statistic
      (round(t, 6) > lit(0.461)).as("significant"))
  }

  /** Q454: nominal-association battery — Goodman–Kruskal λ (both
    * directions, exact integer modal-count arithmetic) and Theil's
    * uncertainty coefficient U (entropy-based, per-cell terms rounded
    * 6 dp and decimal-summed) between event type and time-of-day bucket.
    * The PRE/information complements to q266's Cramér's V: λ answers
    * "how much better do I guess Y knowing X", U is asymmetric mutual
    * information as a fraction of H. One groupBy over events to the
    * bounded |types|×|buckets| cell relation; everything after runs on
    * ≤20 rows.
    */
  def q454NominalAssociation: Q = (s, d) => {
    val cells = Tables.events(s, d)
      .select(col("event_type").as("x"),
        expr("CAST(hour(ts2) AS BIGINT) div 6").as("yb"))
      .groupBy(col("x"), col("yb")).agg(count(lit(1)).as("nxy"))
    val xm = cells.groupBy(col("x")).agg(sum(col("nxy")).cast("long").as("nx"),
      max(col("nxy")).cast("long").as("mx"))
    val ym = cells.groupBy(col("yb")).agg(sum(col("nxy")).cast("long").as("ny"),
      max(col("nxy")).cast("long").as("my"))
    val tots = xm.agg(sum(col("nx")).cast("long").as("n"),
      sum(col("mx")).cast("long").as("smx"), max(col("nx")).cast("long").as("maxnx"))
    val toty = ym.agg(sum(col("my")).cast("long").as("smy"),
      max(col("ny")).cast("long").as("maxny"))
    def h6(p: Column, q: Column): Column =
      round(p.cast("double") / q.cast("double")
        * log(q.cast("double") / p.cast("double")), 6).cast(DecimalType(38, 6))
    // H(Y) and H(X) from the margins; H(Y|X)/H(X|Y) from the cells
    val hy = ym.crossJoin(broadcast(tots))
      .agg(sum(h6(col("ny"), col("n"))).cast("double").as("hy"))
    val hx = xm.select(col("nx")).crossJoin(broadcast(tots))
      .agg(sum(h6(col("nx"), col("n"))).cast("double").as("hx"))
    // H(Y|X) = Σ_xy (n_xy/N)·ln(n_x/n_xy): weight by N, condition on n_x
    def hc6(marg: Column): Column =
      round(col("nxy").cast("double") / col("n").cast("double")
        * log(marg.cast("double") / col("nxy").cast("double")), 6)
        .cast(DecimalType(38, 6))
    val hyx = cells.join(broadcast(xm), Seq("x")).crossJoin(broadcast(tots))
      .agg(sum(hc6(col("nx"))).cast("double").as("hyx"))
    val hxy = cells.join(broadcast(ym), Seq("yb")).crossJoin(broadcast(tots))
      .agg(sum(hc6(col("ny"))).cast("double").as("hxy"))
    tots.crossJoin(broadcast(toty))
      .crossJoin(broadcast(hy)).crossJoin(broadcast(hx))
      .crossJoin(broadcast(hyx)).crossJoin(broadcast(hxy))
      .select(col("n"),
        round((col("smx") - col("maxny")).cast("double")
          / (col("n") - col("maxny")).cast("double"), 6).as("lambda_y_x"),
        round((col("smy") - col("maxnx")).cast("double")
          / (col("n") - col("maxnx")).cast("double"), 6).as("lambda_x_y"),
        round((col("hy") - col("hyx")) / col("hy"), 6).as("theil_u_y_x"),
        round((col("hx") - col("hxy")) / col("hx"), 6).as("theil_u_x_y"))
  }

  /** Q487: matrix-profile discords (m = 7) over the daily-revenue series —
    * the shape-based anomaly view q482's Hampel (pointwise) and q198's
    * CUSUM (single retrospective break) can't give: for every 7-day
    * subsequence, the z-normalized distance to its nearest non-trivial
    * match (|i−j| ≥ ⌈m/2⌉ exclusion); the top-10 largest profile values
    * are the weeks unlike ANY other week (discords). Revenue is floored
    * to whole dollars so every window moment (S, Q, dot) is an exact
    * int64 ≤ ~4·10¹⁵ < 2⁵³ — both engines derive the distance from
    * IDENTICAL doubles; the denominator is the mirrored shape
    * √vₐ·√vᵦ (NOT √(vₐvᵦ), whose product overflows 2⁵³). Constant
    * windows (zero variance) carry no z-normalization and are dropped on
    * both engines. The pair join is bounded by the CALENDAR GRID (~2.4k
    * windows → ~5.8M pairs), never the orders — at 100 TB the grid is
    * unchanged, so the profile cost is constant once the daily collapse
    * (the only data-sized pass) is done.
    */
  def q487MatrixProfile: Q = (s, d) =>
    matrixProfileReport(dailyRevenue(s, d)
      .select(col("x"), floor(col("r")).cast("long").as("c")))

  /** q487's profile kernel over a merged (x, whole-dollars) daily grid —
    * factored so the streaming twin q499 runs the IDENTICAL arithmetic
    * over its merged `batch=<id>` cells (the q375 shared-kernel pattern).
    */
  private[graft] def matrixProfileReport(grid: DataFrame): DataFrame = {
    // Magnitude guard (round-12 ADVICE). Two bands matter here:
    //
    //   1. int64 OVERFLOW — the HARD precondition. Every intermediate is
    //      bounded by 98·max(c)² (|num| = |7·dot − ss·sj| ≤ 14·qq ≤
    //      98·max(c)²), so |c| ≤ 3e8 keeps all int64 arithmetic below
    //      2^63 ≈ 9.2e18. Past it the moments WRAP SILENTLY — hence this
    //      loud in-data-path guard (not a droppable side column, so
    //      pruning can't erase it).
    //   2. 2^53 DOUBLE-IDENTITY — the ORACLE-scale property: the DuckDB
    //      twin computes the same moments over DOUBLE[], so cross-engine
    //      bit-identity needs every intermediate < 2^53, i.e.
    //      max(qq) ≤ 2^53/14 ≈ 6.4e14. That holds with ~25× margin at
    //      sf0.01 where the oracle gate runs (max qq ≈ 2.6e13; pinned in
    //      StatsSpec) and is already EXCEEDED at sf0.1 (daily c reaches
    //      1.9e7 → qq ≈ 2.7e15), where no oracle compares: past 2^53 the
    //      Spark side stays exact int64 and merely rounds once at the
    //      final double cast, while a double-based engine may drift by
    //      ulps — deterministic either way, just not bit-joint.
    val cGuard = when(abs(col("c")) <= lit(300000000L), col("c"))
      .otherwise(raise_error(concat(
        lit("graft matrix-profile: |daily value| "), col("c").cast("string"),
        lit(" exceeds the int64-overflow band (max 3e8): the exact window" +
          " moments would wrap silently"))))
    val wp = Window.orderBy(col("x"))
    val pos = grid.select(col("x"), cGuard.as("c"))
      .withColumn("i", row_number().over(wp).cast("long"))
    val w7 = Window.orderBy(col("i")).rowsBetween(Window.currentRow, 6)
    val sub = graft.Checkpoints.materialize(pos
      .withColumn("arr", collect_list(col("c")).over(w7))
      .withColumn("ss", sum(col("c")).over(w7))
      .withColumn("qq", sum(col("c") * col("c")).over(w7))
      .filter(size(col("arr")) === 7)
      .filter(lit(7L) * col("qq") - col("ss") * col("ss") > 0)
      .select(col("i"), col("x"), col("arr"), col("ss"), col("qq")))
    val b = sub.select(col("i").as("j"), col("arr").as("brr"),
      col("ss").as("sj"), col("qq").as("qj"))
    // fan the pair kernel out: `sub` comes out of a GLOBAL ordered window,
    // i.e. one partition, so the ~5.8M-pair compare grid ran on one task
    // (measured 2.5 s single-task at sf0.1 — opt r14); the nested-loop
    // join's parallelism is the streamed side's partition count (the
    // exactCosinePairs lesson). Grid rows are a few KB — the exchange is
    // free relative to the pair compute, at any sf.
    val pairs = sub
      .repartition(sub.sparkSession.sparkContext.defaultParallelism, col("i"))
      .crossJoin(broadcast(b))
      .filter(abs(col("i") - col("j")) >= 4)
    // explicit 7-term product sum, NOT zip_with+aggregate: HOFs are
    // interpreted, and over the ~5.8M-pair grid the lambda tree costs
    // ~7 s; element_at products stay inside whole-stage codegen
    val dot = (1 to 7).map(t =>
      element_at(col("arr"), t) * element_at(col("brr"), t))
      .reduce(_ + _)
    val num = (lit(7L) * dot - col("ss") * col("sj")).cast("double")
    val va = (lit(7L) * col("qq") - col("ss") * col("ss")).cast("double")
    val vb = (lit(7L) * col("qj") - col("sj") * col("sj")).cast("double")
    val dist = round(sqrt(greatest(lit(0.0),
      lit(14.0) * (lit(1.0) - num / (sqrt(va) * sqrt(vb))))), 6)
    pairs.select(col("i"), col("x"), dist.as("dd"))
      .groupBy(col("i"), col("x"))
      .agg(min(col("dd")).as("profile"))
      .orderBy(col("profile").desc, col("i"))
      .limit(10)
      .select(col("i").as("pos"), col("x").as("day"), col("profile"))
  }

  /** Q490: tabular one-sided CUSUM alarm chart over daily revenue — the
    * SEQUENTIAL drift detector q198's retrospective argmax and q483's
    * memoryless WE rules don't give: Sₜ = max(0, Sₜ₋₁ + xₜ − μ − k)
    * accumulates small persistent upward shifts. The recursion is NOT a
    * Spark window — but it collapses to pure prefix algebra:
    * Sₜ = Pₜ − min₍s≤t₎ Pₛ with Pₜ = Σ(xₜ − μ − k), i.e. ONE cumulative
    * sum and ONE running min over the calendar-bounded day grid (both
    * engines compute ordered-prefix windows sequentially → bit-identical;
    * the per-day term is 4-dp-quantized so the prefix sums are exact
    * decimals). Allowance k = 0.5 % and decision interval H = 5 % of the
    * historical mean level (the σ-free parameterization: the daily-cents
    * second moment overflows the 2⁵³ decimal→double band, so the chart
    * is scaled to the mean, which is exact). Output: the top-10 alarm
    * days by CUSUM height.
    */
  def q490CusumAlarm: Q = (s, d) =>
    cusumReport(dailyRevenue(s, d)
      .select(col("x"), (col("r") * 100).cast("long").as("c")))

  /** q490's CUSUM kernel over a merged (x, cents) daily relation —
    * factored so the streaming twin q498 runs the IDENTICAL arithmetic
    * over its merged `batch=<id>` cells (the q375 shared-kernel pattern).
    */
  private[graft] def cusumReport(grid: DataFrame): DataFrame = {
    val tot = grid.agg(count(lit(1)).as("n"), sum(col("c")).cast("long").as("cc"))
    val mu = col("cc").cast("double") / col("n").cast("double")
    val g2 = grid.crossJoin(broadcast(tot))
      .select(col("x"), col("c"),
        round(col("c").cast("double") - mu * 1.005, 4)
          .cast(DecimalType(28, 4)).as("y"),
        round(mu * 0.05, 4).cast(DecimalType(28, 4)).as("h"))
    val wc = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the prefix-min must include the EMPTY prefix (P₀ = 0): S₁ = max(0, y₁)
    // = P₁ − min(0, P₁), but a window min over rows 1..t alone would give
    // S₁ = 0 whenever y₁ > 0 — hence least(pmin, 0)
    val st = g2
      .withColumn("p", sum(col("y")).over(wc).cast(DecimalType(38, 4)))
      .withColumn("pmin", min(col("p")).over(wc).cast(DecimalType(38, 4)))
      .select(col("x"), col("c"),
        (col("p") - least(col("pmin"), lit(0).cast(DecimalType(38, 4))))
          .cast(DecimalType(38, 4)).as("s"), col("h"))
    st.select(col("x").as("day"), col("c").as("cents"),
        col("s").cast("double").as("cusum"),
        (col("s") > col("h")).as("alarm"))
      .orderBy(col("cusum").desc, col("day"))
      .limit(10)
  }

  /** Q492: deterministic Poisson-bootstrap confidence interval for the
    * mean order value — THE at-scale bootstrap: true multinomial
    * resampling needs a global draw, but with n large each row's
    * replicate count is ≈ Poisson(1), so every (row, replica) weight is
    * an INDEPENDENT pure function of (key, replica) and the whole B=32
    * bootstrap is one explode + one aggregation, embarrassingly
    * parallel at any corpus size. Weights come from the inverse
    * Poisson(1) CDF on [[TrainingOps.portableBucket]]'s 10⁴ grid
    * (integer thresholds 3679/7358/9197/9810/9963/9994 — both engines
    * compare exact ints). Replica means are exact-int ratios rounded
    * 4 dp; the percentile CI takes ranks 2 and 31 of the 32 sorted
    * means (p5/p95); the bootstrap SE is computed from CENTERED 4-dp
    * decimal deviations so every sum stays inside the 2⁵³ cast band.
    */
  def q492BootstrapCi: Q = (s, d) => {
    val base = Tables(s, d, "orders")
      .select(col("o_orderkey").as("k"),
        (dec(col("o_totalprice")) * 100).cast("long").as("c"))
    val reps = s.range(0, 32).select(col("id").as("b"))
    val u = TrainingOps.portableBucket(col("k") * 37L + col("b"))
    val w = when(u < 3679, 0L).when(u < 7358, 1L).when(u < 9197, 2L)
      .when(u < 9810, 3L).when(u < 9963, 4L).when(u < 9994, 5L)
      .otherwise(6L)
    // fan out the 32×|orders| replica grid (single-row-group scan = one
    // task otherwise; measured 1.4 s single-task at sf0.1 — opt r14)
    val means = base
      .repartition(s.sparkContext.defaultParallelism, col("k"))
      .crossJoin(broadcast(reps))
      .select(col("b"), col("c"), w.as("w"))
      .groupBy(col("b"))
      .agg(sum(col("w") * col("c")).cast("long").as("swc"),
        sum(col("w")).cast("long").as("sw"))
      .select(col("b"),
        round(col("swc").cast("double") / col("sw").cast("double"), 4)
          .cast(DecimalType(18, 4)).as("m"))
    val point = base.agg(
      round(sum(col("c")).cast("long").cast("double")
        / count(lit(1)).cast("double"), 4).cast(DecimalType(18, 4)).as("pt"))
    val dm = means.crossJoin(broadcast(point))
      .select(col("b"), col("m"), col("pt"),
        (col("m") - col("pt")).cast(DecimalType(18, 4)).as("dm"))
    val wrk = Window.orderBy(col("m"), col("b"))
    val ranked = dm.withColumn("rn", row_number().over(wrk))
    val lo = ranked.filter(col("rn") === 2)
      .select(col("m").cast("double").as("ci_lo"))
    val hi = ranked.filter(col("rn") === 31)
      .select(col("m").cast("double").as("ci_hi"))
    val se = dm.agg(max(col("pt")).as("pt"),
        count(lit(1)).as("nb"),
        sum(col("dm")).cast(DecimalType(28, 4)).as("sdm"),
        sum(round(col("dm").cast("double") * col("dm").cast("double"), 4)
          .cast(DecimalType(28, 4))).cast(DecimalType(38, 4)).as("sdm2"))
      .select(col("pt"), col("nb"),
        round(sqrt((col("sdm2").cast("double")
          - col("sdm").cast("double") * col("sdm").cast("double")
            / col("nb").cast("double")) / (col("nb").cast("double") - 1.0)), 4)
          .as("se"))
    se.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .select(col("nb").as("n_replicas"), col("pt").cast("double").as("mean_cents"),
        col("ci_lo"), col("ci_hi"), col("se"))
  }

  /** Q493: weekday seasonal decomposition of daily revenue — trend
    * (centered 7-day MA), weekday seasonal indices, and a strength-of-
    * seasonality statistic (1 − Var(resid)/Var(detrended), the STL
    * diagnostic) that q367's periodogram peak and q485's dispersion
    * don't give. Revenue is floored to THOUSANDS of dollars and the
    * detrended series kept in SEVENTHS (d7 = 7c − Σwindow, an exact
    * int64) so every moment stays inside the 2⁵³ decimal→double band;
    * d7/7 and the 4-dp rounds are the only float steps, mirrored
    * shape-for-shape. Interior days only (full 7-day windows) — edge
    * truncation is documented, not silently averaged. One bounded
    * window over the calendar grid + a 7-row weekday collapse.
    */
  def q493SeasonalDecompose: Q = (s, d) => {
    // thousands of dollars via integer DIV on exact cents — decimal
    // division scales/rounds differently across engines, int DIV doesn't
    val grid = dailyRevenue(s, d)
      .select(col("x"), (col("r") * 100).cast("long").as("cc"))
      .select(col("x"), expr("cc DIV 100000").as("c"))
    val w7 = Window.orderBy(col("x")).rowsBetween(-3, 3)
    val det = grid
      .withColumn("sw", sum(col("c")).over(w7))
      .withColumn("cw", count(lit(1)).over(w7))
      .filter(col("cw") === 7)
      .select(col("x"), pmod(col("x"), lit(7L)).as("wd"),
        (lit(7L) * col("c") - col("sw")).as("d7"))
    val seas = det.groupBy(col("wd"))
      .agg(count(lit(1)).as("n_days"), sum(col("d7")).cast("long").as("sd7"))
      .select(col("wd"), col("n_days"),
        round(col("sd7").cast("double") / col("n_days").cast("double") / 7.0, 4)
          .cast(DecimalType(18, 4)).as("seasonal"))
    val resid = det.join(broadcast(seas), Seq("wd"))
      .select(col("wd"),
        round(col("d7").cast("double") / 7.0, 4)
          .cast(DecimalType(18, 4)).as("dd"),
        (round(col("d7").cast("double") / 7.0, 4)
          .cast(DecimalType(18, 4)) - col("seasonal"))
          .cast(DecimalType(18, 4)).as("rr"))
    val glob = resid.agg(count(lit(1)).as("n"),
        sum(col("dd")).cast(DecimalType(28, 4)).as("sdd"),
        sum(round(col("dd").cast("double") * col("dd").cast("double"), 4)
          .cast(DecimalType(28, 4))).cast(DecimalType(38, 4)).as("sdd2"),
        sum(col("rr")).cast(DecimalType(28, 4)).as("srr"),
        sum(round(col("rr").cast("double") * col("rr").cast("double"), 4)
          .cast(DecimalType(28, 4))).cast(DecimalType(38, 4)).as("srr2"))
    val nD = col("n").cast("double")
    val vd = (col("sdd2").cast("double")
      - col("sdd").cast("double") * col("sdd").cast("double") / nD) / (nD - 1.0)
    val vr = (col("srr2").cast("double")
      - col("srr").cast("double") * col("srr").cast("double") / nD) / (nD - 1.0)
    val strength = glob.select(
      round(greatest(lit(0.0), lit(1.0) - vr / vd), 6).as("seasonal_strength"))
    seas.crossJoin(broadcast(strength))
      .select(col("wd").as("weekday"), col("n_days"),
        col("seasonal").cast("double").as("seasonal_k"),
        col("seasonal_strength"))
      .orderBy(col("weekday"))
  }

  /** Q494: Granger causality at lag 1 — does yesterday's ORDER COUNT
    * improve today's REVENUE forecast beyond yesterday's revenue alone
    * (the bivariate lead/lag question q429's cointegration and q439's
    * rolling beta don't answer)? Unrestricted OLS rₜ ~ rₜ₋₁ + nₜ₋₁ via
    * the 3×3 normal equations solved in CRAMER form, restricted rₜ ~
    * rₜ₋₁ in closed form, F = (RSSᵣ − RSSᵤ)/(RSSᵤ/(n−3)). Revenue in
    * THOUSANDS of dollars keeps every raw moment an exact int64 double
    * (< 2⁵³), so both engines enter the determinant tree — mirrored
    * term-for-term in the oracle — with identical operands. One lag
    * window over the calendar grid, one moment collapse.
    */
  def q494GrangerCausality: Q = (s, d) =>
    grangerReport(Tables(s, d, "orders")
      .groupBy(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("x"))
      .agg((sum(dec(col("o_totalprice"))) * 100).cast("long").as("rc"),
        count(lit(1)).as("cnt"))
      .select(col("x"), expr("rc DIV 100000").as("r"), col("cnt")))

  /** q494's OLS kernel over a merged (x, thousand-dollar revenue, count)
    * daily grid — factored so the streaming twin q500 runs the IDENTICAL
    * arithmetic over its merged `batch=<id>` cells.
    */
  private[graft] def grangerReport(grid: DataFrame): DataFrame = {
    val wl = Window.orderBy(col("x"))
    val lagged = grid
      .withColumn("r1", lag(col("r"), 1).over(wl))
      .withColumn("n1", lag(col("cnt"), 1).over(wl))
      .filter(col("r1").isNotNull)
    val m = lagged.agg(count(lit(1)).as("n"),
      sum(col("r")).cast("long").as("sy"),
      sum(col("r1")).cast("long").as("s1"),
      sum(col("n1")).cast("long").as("s2"),
      sum(col("r1") * col("r1")).cast("long").as("s11"),
      sum(col("n1") * col("n1")).cast("long").as("s22"),
      sum(col("r1") * col("n1")).cast("long").as("s12"),
      sum(col("r") * col("r1")).cast("long").as("sy1"),
      sum(col("r") * col("n1")).cast("long").as("sy2"),
      sum(col("r") * col("r")).cast("long").as("syy"))
    val n = col("n").cast("double"); val sy = col("sy").cast("double")
    val s1 = col("s1").cast("double"); val s2 = col("s2").cast("double")
    val s11 = col("s11").cast("double"); val s22 = col("s22").cast("double")
    val s12 = col("s12").cast("double"); val sy1 = col("sy1").cast("double")
    val sy2 = col("sy2").cast("double"); val syy = col("syy").cast("double")
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val da = sy * (s11 * s22 - s12 * s12) - s1 * (sy1 * s22 - s12 * sy2) +
      s2 * (sy1 * s12 - s11 * sy2)
    val db = n * (sy1 * s22 - s12 * sy2) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * sy2 - sy1 * s2)
    val dc = n * (s11 * sy2 - sy1 * s12) - s1 * (s1 * sy2 - sy1 * s2) +
      sy * (s1 * s12 - s11 * s2)
    val rssU = syy - (da * sy + db * sy1 + dc * sy2) / det
    val br = (n * sy1 - s1 * sy) / (n * s11 - s1 * s1)
    val ar = (sy - br * s1) / n
    val rssR = syy - ar * sy - br * sy1
    val f = (rssR - rssU) / (rssU / (n - 3.0))
    m.select(big(col("n")).as("n"),
      round(db / det, 6).as("beta_rev_lag"),
      round(dc / det, 6).as("beta_cnt_lag"),
      round(f, 4).as("f_stat"),
      (round(f, 4) > lit(3.8415)).as("granger_significant"))
  }

  /** Q495: binary-segmentation changepoints (depth 2, min segment 7) on
    * the daily-revenue series — the MULTI-break structure q198's single
    * CUSUM argmax can't give: split at the k minimizing
    * SSE_L(k)+SSE_R(k), then the best split inside each half, all three
    * reported with their SSE reductions. Every candidate cost is ONE
    * IEEE expression over exact prefix moments (P, Q cumsums of
    * thousand-dollar ints), rounded 6 dp before the argmin, ties to the
    * earliest k — so both engines pick identical splits. The level-1
    * pass reuses the SAME prefix sums with segment-relative offsets
    * from a broadcast 2-row segment relation: one cumsum window over
    * the calendar grid, no per-segment rescan.
    */
  def q495BinarySegmentation: Q = (s, d) => {
    val grid = dailyRevenue(s, d)
      .select(col("x"), (col("r") * 100).cast("long").as("cc"))
      .select(col("x"), expr("cc DIV 100000").as("v"))
    val wp = Window.orderBy(col("x"))
    val wc = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = graft.Checkpoints.materialize(grid
      .withColumn("i", row_number().over(wp).cast("long"))
      .withColumn("p", sum(col("v")).over(wc).cast("long"))
      .withColumn("q", sum(col("v") * col("v")).over(wc).cast("long"))
      .select(col("i"), col("x"), col("p"), col("q")))
    val tot = pre.agg(max(col("i")).as("n"), max(col("p")).as("pn"),
      max(col("q")).as("qn"))
    def cost(k: Column, pk: Column, qk: Column, a: Column, pa: Column,
             qa: Column, b: Column, pb: Column, qb: Column): Column = {
      val mL = (k - a).cast("double"); val mR = (b - k).cast("double")
      val dL = (pk - pa).cast("double"); val dR = (pb - pk).cast("double")
      round((qk - qa).cast("double") - dL * dL / mL
        + ((qb - qk).cast("double") - dR * dR / mR), 6)
    }
    // level 0: global best split
    val c0 = pre.crossJoin(broadcast(tot))
      .filter(col("i") >= 7 && col("i") <= col("n") - 7)
      .select(col("i"), col("x"),
        cost(col("i"), col("p"), col("q"), lit(0L), lit(0L), lit(0L),
          col("n"), col("pn"), col("qn")).as("cost"))
    val w0 = Window.orderBy(col("cost"), col("i"))
    val best0 = graft.Checkpoints.materialize(
      c0.withColumn("rn", row_number().over(w0)).filter(col("rn") === 1)
        .select(col("i").as("k0"), col("x").as("x0"), col("cost").as("cost0")))
    val split = pre.join(broadcast(best0), col("i") === col("k0"))
      .select(col("k0"), col("x0"), col("cost0"),
        col("p").as("pk0"), col("q").as("qk0"))
    // the 2-row segment relation (a, b bounds with their prefix sums)
    val segs = split.crossJoin(broadcast(tot))
      .select(col("k0"), col("x0"), col("cost0"), explode(array(
        struct(lit(1L).as("seg"), lit(0L).as("a"), lit(0L).as("pa"),
          lit(0L).as("qa"), col("k0").as("b"), col("pk0").as("pb"),
          col("qk0").as("qb")),
        struct(lit(2L).as("seg"), col("k0").as("a"), col("pk0").as("pa"),
          col("qk0").as("qa"), col("n").as("b"), col("pn").as("pb"),
          col("qn").as("qb")))).as("sg"))
      .select(col("k0"), col("x0"), col("cost0"), col("sg.*"))
    val c1 = pre.crossJoin(broadcast(segs))
      .filter(col("i") >= col("a") + 7 && col("i") <= col("b") - 7)
      .select(col("seg"), col("i"), col("x"),
        cost(col("i"), col("p"), col("q"), col("a"), col("pa"), col("qa"),
          col("b"), col("pb"), col("qb")).as("cost"),
        // the segment's own SSE before splitting, for the reduction column
        round((col("qb") - col("qa")).cast("double")
          - (col("pb") - col("pa")).cast("double")
            * (col("pb") - col("pa")).cast("double")
            / (col("b") - col("a")).cast("double"), 6).as("sse0"))
    val w1 = Window.partitionBy(col("seg")).orderBy(col("cost"), col("i"))
    val best1 = c1.withColumn("rn", row_number().over(w1))
      .filter(col("rn") === 1)
      .select(col("seg").as("level"), col("x").as("split_day"),
        round(col("sse0") - col("cost"), 6).as("sse_reduction"))
    val row0 = split.crossJoin(broadcast(tot))
      .select(lit(0L).as("level"), col("x0").as("split_day"),
        round(round((col("qn").cast("double")
          - col("pn").cast("double") * col("pn").cast("double")
            / col("n").cast("double")), 6) - col("cost0"), 6)
          .as("sse_reduction"))
    row0.unionAll(best1).orderBy(col("level"))
  }

  /** Q497: CUPED variance reduction for an order-value experiment — the
    * modern A/B pattern q447's power analysis assumes but can't deliver:
    * customers split by the portable id hash, post-period (1996+) spend
    * as the metric, PRE-period spend as the covariate, and the CUPED
    * adjustment Yadj = Y − θ(X − X̄) with θ = cov(X,Y)/var(X) pooled.
    * Reports the raw and adjusted treatment-control differences and the
    * variance-reduction ratio. Spend is floored to thousands of dollars
    * (customer-level products then stay < 2⁵³) and every moment is an
    * exact int64, so θ and the report are mirrored IEEE trees. One
    * orders pass + one customer-grain collapse; the assignment is a
    * pure function of the id (no data movement to randomize).
    */
  def q497Cuped: Q = (s, d) => {
    val ords = Tables(s, d, "orders")
      .select(col("o_custkey").as("ck"),
        (dec(col("o_totalprice")) * 100).cast("long").as("c"),
        (year(col("o_orderdate")) >= 1996).as("post"))
    val per = ords.groupBy(col("ck"))
      .agg(sum(when(col("post"), col("c")).otherwise(0L)).cast("long").as("yc"),
        sum(when(!col("post"), col("c")).otherwise(0L)).cast("long").as("xc"))
    val units = Tables(s, d, "customer")
      .select(col("c_custkey").as("ck"))
      .join(per, Seq("ck"), "left")
      .select(col("ck"),
        coalesce(expr("yc DIV 100000"), lit(0L)).as("y"),
        coalesce(expr("xc DIV 100000"), lit(0L)).as("x"),
        (TrainingOps.portableBucket(col("ck")) < 5000).as("t"))
    val m = units.agg(count(lit(1)).as("n"),
      sum(col("x")).cast("long").as("sx"),
      sum(col("y")).cast("long").as("sy"),
      sum(col("x") * col("x")).cast("long").as("sxx"),
      sum(col("x") * col("y")).cast("long").as("sxy"),
      sum(col("y") * col("y")).cast("long").as("syy"),
      sum(when(col("t"), 1L).otherwise(0L)).cast("long").as("nt"),
      sum(when(col("t"), col("y")).otherwise(0L)).cast("long").as("syt"),
      sum(when(col("t"), col("x")).otherwise(0L)).cast("long").as("sxt"))
    val n = col("n").cast("double"); val sx = col("sx").cast("double")
    val sy = col("sy").cast("double"); val sxx = col("sxx").cast("double")
    val sxy = col("sxy").cast("double"); val syy = col("syy").cast("double")
    val nt = col("nt").cast("double"); val nc = n - nt
    val syt = col("syt").cast("double"); val sxt = col("sxt").cast("double")
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val diff = syt / nt - (sy - syt) / nc
    val diffAdj = diff - theta * (sxt / nt - (sx - sxt) / nc)
    val varY = (n * syy - sy * sy) / (n * n)
    val varAdj = varY - theta * theta * ((n * sxx - sx * sx) / (n * n))
    m.select(big(col("n")).as("n_units"), big(col("nt")).as("n_treat"),
      round(theta, 6).as("theta"),
      round(diff, 4).as("diff_raw_k"),
      round(diffAdj, 4).as("diff_cuped_k"),
      round(lit(1.0) - varAdj / varY, 6).as("var_reduction"))
  }

  /** Q496: pairwise mutual-information matrix over the orders
    * categorical/derived columns — the data-profiling dependency scan
    * q454's single-pair Theil's U doesn't give: all 6 column pairs of
    * {orderstatus, orderpriority, order year, order month} in ONE scan
    * (each row emits its 6 pair cells through a single explode — no
    * 6-pass rescan), then MI = ΣΣ (c/n)·ln(c·n/(cᵢ·cⱼ)) and
    * NMI = MI/min(Hᵢ,Hⱼ) from exact cell/margin counts. Cell relations
    * are bounded by the category-domain products (≤ 84 cells), so
    * everything after the collapse is constant-size at any corpus scale.
    */
  def q496MiMatrix: Q = (s, d) => {
    val li = Tables(s, d, "orders")
      .select(col("o_orderstatus").as("st"), col("o_orderpriority").as("pr"),
        year(col("o_orderdate")).cast("string").as("yr"),
        month(col("o_orderdate")).cast("string").as("mo"))
    val pairsOf = Seq(
      ("status_priority", col("st"), col("pr")),
      ("status_year", col("st"), col("yr")),
      ("status_month", col("st"), col("mo")),
      ("priority_year", col("pr"), col("yr")),
      ("priority_month", col("pr"), col("mo")),
      ("year_month", col("yr"), col("mo")))
    // NOTE (opt r14): fanning the explode + materializing `cells` was
    // measured WORSE (1.68→2.24 s same-mix A/B) despite 10 narrow-hot
    // stages — those stages run concurrently under AQE, so their sum
    // overstates wall impact, and the localCheckpoint job is pure added
    // latency; left as-is on purpose.
    val stacked = li.select(explode(array(pairsOf.map { case (nm, a, b) =>
      struct(lit(nm).as("pair"), a.as("va"), b.as("vb"))
    }: _*)).as("s")).select(col("s.*"))
    val cells = stacked.groupBy(col("pair"), col("va"), col("vb"))
      .agg(count(lit(1)).as("c"))
    val ma = cells.groupBy(col("pair"), col("va")).agg(sum(col("c")).cast("long").as("ca"))
    val mb = cells.groupBy(col("pair"), col("vb")).agg(sum(col("c")).cast("long").as("cb"))
    val tot = cells.groupBy(col("pair")).agg(sum(col("c")).cast("long").as("n"))
    val nD = col("n").cast("double")
    val mi = cells.join(ma, Seq("pair", "va")).join(mb, Seq("pair", "vb"))
      .join(broadcast(tot), Seq("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_cells"),
        sum(round(col("c").cast("double") / nD
          * log(col("c").cast("double") * nD
            / (col("ca").cast("double") * col("cb").cast("double"))), 8)
          .cast(DecimalType(18, 8))).cast(DecimalType(38, 8))
          .cast("double").as("mi"))
    def ent(m: DataFrame, cnt: String): DataFrame =
      m.join(broadcast(tot), Seq("pair"))
        .groupBy(col("pair"))
        .agg(sum(round(col(cnt).cast("double") / nD
          * log(col(cnt).cast("double") / nD) * -1.0, 8)
          .cast(DecimalType(18, 8))).cast(DecimalType(38, 8))
          .cast("double").as(cnt + "_h"))
    mi.join(ent(ma, "ca"), Seq("pair")).join(ent(mb, "cb"), Seq("pair"))
      .select(col("pair"), col("n_cells"),
        round(col("mi"), 6).as("mi_nats"),
        round(col("mi") / least(col("ca_h"), col("cb_h")), 6).as("nmi"))
      .orderBy(col("pair"))
  }

  /** The (unit, thousand-dollar value, segment, priority) relation behind
    * q501/q502/q503 — order values with the customer's market segment,
    * floored to exact thousand-dollar ints (q494's magnitude argument:
    * y ≤ ~600 k$, so Σy² stays far inside the 2⁵³ cast band).
    */
  private def segValues(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "orders")
      .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"), col("o_orderpriority").as("p"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cc"))
      .select(col("g"), col("p"), expr("cc DIV 100000").as("y"))

  /** Q501: one-way ANOVA of order value by market segment — the classic
    * F test the battery somehow never declared (q362's Kruskal–Wallis is
    * its rank-free cousin; q179 gives per-group variances but no
    * between/within decomposition): F = (SSB/(k−1))/(SSW/(n−k)) plus the
    * η² and ω² effect sizes. All sums of squares come from exact
    * thousand-dollar int64 moments — SSB/SSW are single IEEE trees
    * mirrored in the oracle. One join + one 5-row group collapse.
    */
  def q501AnovaOneway: Q = (s, d) => {
    val per = segValues(s, d).groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("y")).cast("long").as("sg"),
        sum(col("y") * col("y")).cast("long").as("qg"))
    val m = per.agg(count(lit(1)).as("k"), sum(col("ng")).cast("long").as("n"),
      sum(col("sg")).cast("long").as("st"), sum(col("qg")).cast("long").as("qt"),
      sum(round(col("sg").cast("double") * col("sg").cast("double")
        / col("ng").cast("double"), 6).cast(DecimalType(28, 6)))
        .cast(DecimalType(38, 6)).cast("double").as("sbterm"))
    val nD = col("n").cast("double"); val kD = col("k").cast("double")
    val ssTot = col("qt").cast("double") -
      col("st").cast("double") * col("st").cast("double") / nD
    val ssB = col("sbterm") - col("st").cast("double") * col("st").cast("double") / nD
    val ssW = ssTot - ssB
    val f = (ssB / (kD - 1.0)) / (ssW / (nD - kD))
    m.select(big(col("n")).as("n"), big(col("k")).as("k_groups"),
      round(ssB, 4).as("ss_between"), round(ssW, 4).as("ss_within"),
      round(f, 4).as("f_stat"),
      round(ssB / ssTot, 6).as("eta_sq"),
      (round((ssB - (kD - 1.0) * (ssW / (nD - kD)))
        / (ssTot + ssW / (nD - kD)), 6) + 0.0).as("omega_sq"),
      (round(f, 4) > lit(2.3719)).as("significant"))
  }

  /** Q502: Shapley (LMG) R² decomposition of order value over the two
    * categorical predictors {segment, priority} — WHICH dimension
    * explains the value variance, fairly averaged over entry orders
    * (φ_seg = ½R²(seg) + ½(R²(both) − R²(pri)), the 2-player Shapley):
    * the attribution question q501's single-factor ANOVA and q351's
    * funnel Shapley (different object — touch-set conversion counts)
    * don't answer. Each R² is between-SS/total-SS with cell means over
    * the predictor set — three bounded collapses (5, 5, 25 cells) from
    * ONE exact-moment pass, every ratio a mirrored IEEE tree.
    */
  def q502ShapleyR2: Q = (s, d) => {
    val base = segValues(s, d)
    val cells = base.groupBy(col("g"), col("p"))
      .agg(count(lit(1)).as("ngp"), sum(col("y")).cast("long").as("sgp"),
        sum(col("y") * col("y")).cast("long").as("qgp"))
    def sbOf(df: DataFrame, nc: String, sc: String): DataFrame =
      df.agg(sum(round(col(sc).cast("double") * col(sc).cast("double")
        / col(nc).cast("double"), 6).cast(DecimalType(28, 6)))
        .cast(DecimalType(38, 6)).cast("double").as("sb"))
    val bySeg = sbOf(cells.groupBy(col("g"))
      .agg(sum(col("ngp")).as("ng"), sum(col("sgp")).cast("long").as("sg")),
      "ng", "sg").select(col("sb").as("sb_seg"))
    val byPri = sbOf(cells.groupBy(col("p"))
      .agg(sum(col("ngp")).as("np"), sum(col("sgp")).cast("long").as("sp")),
      "np", "sp").select(col("sb").as("sb_pri"))
    val byBoth = sbOf(cells, "ngp", "sgp").select(col("sb").as("sb_both"))
    val tot = cells.agg(sum(col("ngp")).cast("long").as("n"),
      sum(col("sgp")).cast("long").as("st"),
      sum(col("qgp")).cast("long").as("qt"))
    val nD = col("n").cast("double")
    val cm = col("st").cast("double") * col("st").cast("double") / nD
    val ssTot = col("qt").cast("double") - cm
    val r2s = (col("sb_seg") - cm) / ssTot
    val r2p = (col("sb_pri") - cm) / ssTot
    val r2b = (col("sb_both") - cm) / ssTot
    tot.crossJoin(broadcast(bySeg)).crossJoin(broadcast(byPri))
      .crossJoin(broadcast(byBoth))
      .select(big(col("n")).as("n"),
        round(r2s, 6).as("r2_segment"),
        round(r2p, 6).as("r2_priority"),
        round(r2b, 6).as("r2_both"),
        (round(r2s * 0.5 + (r2b - r2p) * 0.5, 6) + 0.0).as("shapley_segment"),
        (round(r2p * 0.5 + (r2b - r2s) * 0.5, 6) + 0.0).as("shapley_priority"))
  }

  /** Q503: Brown–Forsythe variance-homogeneity test by segment — the
    * robust Levene variant (deviations from the group MEDIAN) that
    * checks q501's equal-variance assumption: group medians come from
    * the $10-bucket support collapse (the q450/q361 bounded-domain
    * argument — medians over value BUCKETS, identical on both engines),
    * then the test is a one-way ANOVA on |y − med_g|. Deviations are
    * exact ints (bucket units), so the F tree mirrors exactly. Two
    * bounded collapses + one broadcast-median join.
    */
  def q503BrownForsythe: Q = (s, d) => {
    val vals = segValues(s, d)
      .select(col("g"), col("y"))
    // $-bucket support per group (y already in k$ ints: the support IS
    // bounded); group median = lower median over the per-group counts
    val sup = vals.groupBy(col("g"), col("y")).agg(count(lit(1)).as("c"))
    val wcum = Window.partitionBy(col("g")).orderBy(col("y"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = sup.groupBy(col("g")).agg(sum(col("c")).cast("long").as("ntot"))
    val med = sup.join(broadcast(tot), Seq("g"))
      .withColumn("cum", sum(col("c")).over(wcum).cast("long"))
      .filter(col("cum") >= expr("(ntot + 1) DIV 2"))
      .groupBy(col("g")).agg(min(col("y")).as("medg"))
    val dev = vals.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("y") - col("medg")).as("z"))
    val per = dev.groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("z")).cast("long").as("sg"),
        sum(col("z") * col("z")).cast("long").as("qg"))
    val m = per.agg(count(lit(1)).as("k"), sum(col("ng")).cast("long").as("n"),
      sum(col("sg")).cast("long").as("st"), sum(col("qg")).cast("long").as("qt"),
      sum(round(col("sg").cast("double") * col("sg").cast("double")
        / col("ng").cast("double"), 6).cast(DecimalType(28, 6)))
        .cast(DecimalType(38, 6)).cast("double").as("sbterm"))
    val nD = col("n").cast("double"); val kD = col("k").cast("double")
    val ssTot = col("qt").cast("double") -
      col("st").cast("double") * col("st").cast("double") / nD
    val ssB = col("sbterm") - col("st").cast("double") * col("st").cast("double") / nD
    val ssW = ssTot - ssB
    val f = (ssB / (kD - 1.0)) / (ssW / (nD - kD))
    m.select(big(col("n")).as("n"), big(col("k")).as("k_groups"),
      round(f, 4).as("bf_stat"),
      (round(f, 4) > lit(2.3719)).as("heteroscedastic"))
  }

  /** Q504: effect-size battery between the two LARGEST market segments —
    * the "is it big, not just significant" readout q501's F can't give:
    * Cohen's d (pooled SD), Hedges' g (small-sample corrected), Glass's
    * Δ (control-SD scaled), and the common-language effect size
    * P(X > Y) + ½P(X = Y) computed EXACTLY from the bounded k$-support
    * cross (the q361 bucket argument — dominance pair counts are exact
    * int64 products, never a normal approximation). Group choice is
    * deterministic: the two largest ng, ties by name.
    */
  def q504EffectSizes: Q = (s, d) => {
    val vals = segValues(s, d).select(col("g"), col("y"))
    val per = vals.groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("y")).cast("long").as("sg"),
        sum(col("y") * col("y")).cast("long").as("qg"))
    val wr = Window.orderBy(col("ng").desc, col("g"))
    val two = graft.Checkpoints.materialize(
      per.withColumn("rk", row_number().over(wr)).filter(col("rk") <= 2))
    val a = two.filter(col("rk") === 1)
      .select(col("g").as("g1"), col("ng").as("n1"), col("sg").as("s1"),
        col("qg").as("q1"))
    val b = two.filter(col("rk") === 2)
      .select(col("g").as("g2"), col("ng").as("n2"), col("sg").as("s2"),
        col("qg").as("q2"))
    // dominance counts from the bounded support cross
    val sup = vals.join(broadcast(two.select(col("g"), col("rk"))), Seq("g"))
      .groupBy(col("rk"), col("y")).agg(count(lit(1)).as("c"))
    val supA = sup.filter(col("rk") === 1).select(col("y").as("ya"), col("c").as("ca"))
    val supB = sup.filter(col("rk") === 2).select(col("y").as("yb"), col("c").as("cb"))
    val dom = supA.crossJoin(broadcast(supB)).agg(
      sum(when(col("ya") > col("yb"), col("ca") * col("cb")).otherwise(0L))
        .cast(DecimalType(38, 0)).as("gt"),
      sum(when(col("ya") === col("yb"), col("ca") * col("cb")).otherwise(0L))
        .cast(DecimalType(38, 0)).as("eqc"))
    val j = a.crossJoin(broadcast(b)).crossJoin(broadcast(dom))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val m1 = col("s1").cast("double") / n1
    val m2 = col("s2").cast("double") / n2
    val v1 = (col("q1").cast("double") - col("s1").cast("double")
      * col("s1").cast("double") / n1) / (n1 - 1.0)
    val v2 = (col("q2").cast("double") - col("s2").cast("double")
      * col("s2").cast("double") / n2) / (n2 - 1.0)
    val sp = sqrt(((n1 - 1.0) * v1 + (n2 - 1.0) * v2) / (n1 + n2 - 2.0))
    val dd = (m1 - m2) / sp
    val corr = lit(1.0) - lit(3.0) / (lit(4.0) * (n1 + n2) - lit(9.0))
    val cles = (col("gt").cast("double") +
      col("eqc").cast("double") * 0.5) / (n1 * n2)
    j.select(col("g1"), col("g2"),
      (round(dd, 6) + 0.0).as("cohens_d"),
      (round(dd * corr, 6) + 0.0).as("hedges_g"),
      (round((m1 - m2) / sqrt(v2), 6) + 0.0).as("glass_delta"),
      round(cles, 6).as("cles"))
  }

  /** Q505: Tukey–Kramer HSD post-hoc — WHICH segment pairs differ after
    * q501's omnibus F (the parametric twin of q455's rank-based Dunn
    * battery): all 10 pairwise mean differences against the studentized-
    * range threshold q·√(MSW/2·(1/nᵢ+1/nⱼ)) with q₀.₀₅(5,∞) = 3.858.
    * MSW comes from the SAME exact-moment collapse as q501; each pair
    * row is one mirrored IEEE tree over the broadcast 5-row relation.
    */
  def q505TukeyHsd: Q = (s, d) => {
    val per = graft.Checkpoints.materialize(segValues(s, d).groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("y")).cast("long").as("sg"),
        sum(col("y") * col("y")).cast("long").as("qg")))
    val m = per.agg(count(lit(1)).as("k"), sum(col("ng")).cast("long").as("n"),
      sum(col("qg")).cast("long").as("qt"),
      sum(round(col("sg").cast("double") * col("sg").cast("double")
        / col("ng").cast("double"), 6).cast(DecimalType(28, 6)))
        .cast(DecimalType(38, 6)).cast("double").as("sbterm"))
      .select(col("k"), col("n"),
        ((col("qt").cast("double") - col("sbterm"))
          / (col("n").cast("double") - col("k").cast("double"))).as("msw"))
    val pairs = per.select(col("g").as("ga"), col("ng").as("na"), col("sg").as("sa"))
      .join(broadcast(per.select(col("g").as("gb"), col("ng").as("nb"),
        col("sg").as("sb2"))), col("ga") < col("gb"))
      .crossJoin(broadcast(m))
    val na = col("na").cast("double"); val nb = col("nb").cast("double")
    val diff = col("sa").cast("double") / na - col("sb2").cast("double") / nb
    val se = sqrt(col("msw") / 2.0 * (lit(1.0) / na + lit(1.0) / nb))
    pairs.select(col("ga"), col("gb"),
        (round(diff, 4) + 0.0).as("mean_diff"),
        round(lit(3.858) * se, 4).as("hsd"),
        (abs(round(diff, 4) + 0.0) > round(lit(3.858) * se, 4)).as("significant"))
      .orderBy(col("ga"), col("gb"))
  }

  /** Q506: two-way ANOVA (segment × priority) with interaction — does
    * priority change the VALUE EFFECT of segment (the question q501's
    * single factor and q502's additive Shapley shares can't ask)? The
    * hierarchical cell decomposition: SS_A, SS_B, SS_cells from the
    * marginal/cell between-terms; SS_AB = SS_cells − SS_A − SS_B
    * (exact for the balanced-ish design and DOCUMENTED as the
    * hierarchical convention on observed cells); F for each against
    * MSW from the full-cell residual. One 25-cell collapse, mirrored
    * trees throughout.
    */
  def q506TwowayAnova: Q = (s, d) => {
    val cells = graft.Checkpoints.materialize(
      segValues(s, d).groupBy(col("g"), col("p"))
        .agg(count(lit(1)).as("ngp"), sum(col("y")).cast("long").as("sgp"),
          sum(col("y") * col("y")).cast("long").as("qgp")))
    def sb(df: DataFrame, nc: String, sc: String, as: String): DataFrame =
      df.agg(count(lit(1)).as(as + "_lv"),
        sum(round(col(sc).cast("double") * col(sc).cast("double")
          / col(nc).cast("double"), 6).cast(DecimalType(28, 6)))
          .cast(DecimalType(38, 6)).cast("double").as(as))
    val byA = sb(cells.groupBy(col("g"))
      .agg(sum(col("ngp")).as("ng"), sum(col("sgp")).cast("long").as("sg")),
      "ng", "sg", "sba")
    val byB = sb(cells.groupBy(col("p"))
      .agg(sum(col("ngp")).as("np"), sum(col("sgp")).cast("long").as("sp")),
      "np", "sp", "sbb")
    val byC = sb(cells, "ngp", "sgp", "sbc")
    val tot = cells.agg(sum(col("ngp")).cast("long").as("n"),
      sum(col("sgp")).cast("long").as("st"),
      sum(col("qgp")).cast("long").as("qt"))
    val j = tot.crossJoin(broadcast(byA)).crossJoin(broadcast(byB))
      .crossJoin(broadcast(byC))
    val nD = col("n").cast("double")
    val cm = col("st").cast("double") * col("st").cast("double") / nD
    val ssA = col("sba") - cm
    val ssB = col("sbb") - cm
    val ssC = col("sbc") - cm
    val ssAB = ssC - ssA - ssB
    val ssW = col("qt").cast("double") - col("sbc")
    val dfa = col("sba_lv").cast("double") - 1.0
    val dfb = col("sbb_lv").cast("double") - 1.0
    val dfab = dfa * dfb
    val dfw = nD - col("sbc_lv").cast("double")
    val msw = ssW / dfw
    j.select(big(col("n")).as("n"),
      round(ssA, 4).as("ss_segment"), round(ssB, 4).as("ss_priority"),
      (round(ssAB, 4) + 0.0).as("ss_interaction"), round(ssW, 4).as("ss_within"),
      round(ssA / dfa / msw, 4).as("f_segment"),
      round(ssB / dfb / msw, 4).as("f_priority"),
      (round(ssAB / dfab / msw, 4) + 0.0).as("f_interaction"))
  }

  val queries: Map[String, Q] = Map(
    "q487_matrix_profile" -> q487MatrixProfile,
    "q490_cusum_alarm" -> q490CusumAlarm,
    "q495_binary_segmentation" -> q495BinarySegmentation,
    "q496_mi_matrix" -> q496MiMatrix,
    "q497_cuped" -> q497Cuped,
    "q501_anova_oneway" -> q501AnovaOneway,
    "q502_shapley_r2" -> q502ShapleyR2,
    "q503_brown_forsythe" -> q503BrownForsythe,
    "q504_effect_sizes" -> q504EffectSizes,
    "q505_tukey_hsd" -> q505TukeyHsd,
    "q506_twoway_anova" -> q506TwowayAnova,
    "q492_bootstrap_ci" -> q492BootstrapCi,
    "q493_seasonal_decompose" -> q493SeasonalDecompose,
    "q494_granger_causality" -> q494GrangerCausality,
    "q481_gmm_1d" -> q481Gmm1d,
    "q485_negbin_fit" -> q485NegbinFit,
    "q482_hampel" -> q482Hampel,
    "q483_western_electric" -> q483WesternElectric,
    "q479_dbscan_1d" -> q479Dbscan1d,
    "q480_mahalanobis" -> q480Mahalanobis,
    "q467_page_trend" -> q467PageTrend,
    "q468_jonckheere" -> q468Jonckheere,
    "q470_theil_decomposition" -> q470TheilDecomposition,
    "q466_t_closeness" -> q466TCloseness,
    "q459_sample_entropy" -> q459SampleEntropy,
    "q460_dagostino_k2" -> q460DagostinoK2,
    "q455_dunns_test" -> q455DunnsTest,
    "q456_kendalls_w" -> q456KendallsW,
    "q457_variance_ratio" -> q457VarianceRatio,
    "q458_kpss" -> q458Kpss,
    "q449_mantel_haenszel" -> q449MantelHaenszel,
    "q450_mood_median" -> q450MoodMedian,
    "q451_cochran_armitage" -> q451CochranArmitage,
    "q452_energy_distance" -> q452EnergyDistance,
    "q453_cramer_von_mises" -> q453CramerVonMises,
    "q454_nominal_association" -> q454NominalAssociation,
    "q447_power_analysis" -> q447PowerAnalysis,
    "q448_odds_ratio" -> q448OddsRatio,
    "q442_difference_sign" -> q442DifferenceSign,
    "q443_turning_points" -> q443TurningPoints,
    "q444_weibull_fit" -> q444WeibullFit,
    "q445_vif" -> q445Vif,
    "q436_ordinal_association" -> q436OrdinalAssociation,
    "q438_poisson_dispersion" -> q438PoissonDispersion,
    "q439_rolling_beta" -> q439RollingBeta,
    "q428_partial_correlation" -> q428PartialCorrelation,
    "q429_engle_granger" -> q429EngleGranger,
    "q432_inequality" -> q432Inequality,
    "q433_bartlett" -> q433Bartlett,
    "q420_friedman" -> q420Friedman,
    "q423_anderson_darling" -> q423AndersonDarling,
    "q424_spearman" -> q424Spearman,
    "q425_cooks_distance" -> q425CooksDistance,
    "q426_breusch_pagan" -> q426BreuschPagan,
    "q427_jarque_bera" -> q427JarqueBera,
    "q411_rbo" -> q411Rbo,
    "q412_neyman_allocation" -> q412NeymanAllocation,
    "q413_hodges_lehmann" -> q413HodgesLehmann,
    "q415_cliffs_delta" -> q415CliffsDelta,
    "q416_grubbs" -> q416Grubbs,
    "q406_lmoments" -> q406Lmoments,
    "q407_brown_forsythe" -> q407BrownForsythe,
    "q408_granger" -> q408Granger,
    "q409_chow" -> q409Chow,
    "q410_deming" -> q410Deming,
    "q393_ljung_box" -> q393LjungBox,
    "q396_durbin_watson" -> q396DurbinWatson,
    "q397_hurst_rs" -> q397HurstRs,
    "q398_allan_variance" -> q398AllanVariance,
    "q399_permutation_entropy" -> q399PermutationEntropy,
    "q400_page_hinkley" -> q400PageHinkley,
    "q391_pacf" -> q391Pacf,
    "q394_hill_tail" -> q394HillTail,
    "q377_sprt" -> q377Sprt,
    "q379_ipw_ate" -> q379IpwAte,
    "q361_mann_whitney" -> q361MannWhitney,
    "q362_kruskal_wallis" -> q362KruskalWallis,
    "q363_wasserstein" -> q363Wasserstein,
    "q364_anova_f" -> q364AnovaF,
    "q365_fdr_bh" -> q365FdrBh,
    "q366_hhi" -> q366Hhi,
    "q369_log_rank" -> q369LogRank,
    "q370_rdd" -> q370Rdd,
    "q373_mad_outliers" -> q373MadOutliers,
    "q374_lorenz_curve" -> q374LorenzCurve,
    "q318_ldiversity" -> q318Ldiversity,
    "q319_fd_discovery" -> q319FdDiscovery,
    "q323_srm" -> q323Srm,
    "q324_pinball" -> q324Pinball,
    "q325_disparate_impact" -> q325DisparateImpact,
    "q327_att_matching" -> q327AttMatching,
    "q328_jackknife_ratio" -> q328JackknifeRatio,
    "q331_two_proportion_z" -> q331TwoProportionZ,
    "q332_kfold_cv" -> q332KfoldCv,
    "q333_psi" -> q333Psi,
    "q334_cohens_d" -> q334CohensD,
    "q340_stratified_ate" -> q340StratifiedAte,
    "q341_group_sequential" -> q341GroupSequential,
    "q342_mann_kendall" -> q342MannKendall,
    "q344_qte" -> q344Qte,
    "q346_permutation_test" -> q346PermutationTest,
    "q352_james_stein" -> q352JamesStein,
    "q353_delta_method" -> q353DeltaMethod,
    "q355_laplace_mechanism" -> q355LaplaceMechanism,
    "q359_qini_curve" -> q359QiniCurve,
    "q356_cell_suppression" -> q356CellSuppression,
    "q357_nelson_aalen" -> q357NelsonAalen,
    "q312_quantile_normalization" -> q312QuantileNormalization,
    "q313_conformal_interval" -> q313ConformalInterval,
    "q311_join_cardinality" -> q311JoinCardEstimate,
    "q305_voptimal_histogram" -> q305VoptimalHistogram,
    "q306_target_encoding" -> q306TargetEncoding,
    "q296_isotonic_calibration" -> q296IsotonicCalibration,
    "q297_ks_pairwise" -> q297KsPairwise,
    "q289_ntile_deciles" -> q289NtileDeciles,
    "q291_cuped" -> q291Cuped,
    "q292_simpsons_paradox" -> q292SimpsonsParadox,
    "q282_acf" -> q282Acf,
    "q281_diff_in_diff" -> q281DiffInDiff,
    "q279_theil_sen" -> q279TheilSen,
    "q273_join_discovery" -> q273JoinDiscovery,
    "q266_cramers_v" -> q266CramersV,
    "q263_bootstrap_ci" -> q263BootstrapCi,
    "q254_kanonymity" -> q254Kanonymity,
    "q249_behavior_entropy" -> q249BehaviorEntropy,
    "q250_price_elasticity" -> q250PriceElasticity,
    "q238_wilson_ci" -> q238WilsonCi,
    "q232_winsorize" -> q232Winsorize,
    "q220_corr_matrix" -> q220CorrMatrix,
    "q217_infogain_stump" -> q217InfoGainStump,
    "q216_mutual_info" -> q216MutualInfo,
    "q210_kaplan_meier" -> q210KaplanMeier,
    "q205_skew_report" -> q205SkewReport,
    "q204_benford" -> q204Benford,
    "q193_weighted_median" -> q193WeightedMedian,
    "q194_gini" -> q194Gini,
    "q177_group_linreg" -> q177GroupLinreg,
    "q178_ab_welch" -> q178AbWelch,
    "q179_mad_outliers" -> q179MadOutliers,
    "q180_assoc_rules" -> q180AssocRules,
    "q186_column_profile" -> q186ColumnProfile,
    "q187_fk_audit" -> q187FkAudit)

  /** q356's oracle: the four complementary passes generated as CTE layers
    * (row, col, row, col), each the same window shape the Spark pass uses.
    */
  private val cellSuppressionSql: String = {
    def pass(prev: String, out: String, group: String, key: String,
        label: String): String =
      s"""$out AS (
         |  SELECT nation, seg, n,
         |    suppressed OR newly AS suppressed,
         |    COALESCE(reason, CASE WHEN newly THEN '$label' END) AS reason
         |  FROM (
         |    SELECT *,
         |      SUM(CASE WHEN suppressed THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY $group) = 1
         |      AND NOT suppressed
         |      AND ROW_NUMBER() OVER (PARTITION BY $group
         |        ORDER BY suppressed, n, $key) = 1 AS newly
         |    FROM $prev))""".stripMargin
    s"""WITH g0 AS (
       |  SELECT c_nationkey AS nation, c_mktsegment AS seg, COUNT(*) AS n,
       |    COUNT(*) < 7 AS suppressed,
       |    CASE WHEN COUNT(*) < 7 THEN 'primary' END AS reason
       |  FROM customer GROUP BY 1, 2),
       |${pass("g0", "g1", "nation", "seg", "row_comp_1")},
       |${pass("g1", "g2", "seg", "nation", "col_comp_1")},
       |${pass("g2", "g3", "nation", "seg", "row_comp_2")},
       |${pass("g3", "g4", "seg", "nation", "col_comp_2")}
       |SELECT CAST(nation AS BIGINT) AS nation, seg AS c_mktsegment,
       |  CAST(n AS BIGINT) AS n, suppressed,
       |  COALESCE(reason, 'published') AS reason
       |FROM g4 ORDER BY nation, c_mktsegment""".stripMargin
  }

  private val benfordCaseSql: String =
    benford.map { case (dg, p) => s"WHEN digit = '$dg' THEN CAST($p AS DOUBLE)" }
      .mkString("CASE ", " ", " END")

  /** `x·ln(x)` with 0·ln 0 = 0, the 6-dp-rounded-ln decimal shape of the
    * Spark side, as oracle SQL.
    */
  private def xlxSql(c: String): String =
    s"CASE WHEN ($c) = 0 THEN CAST(0 AS DECIMAL(28,6)) " +
      s"ELSE CAST(($c) * CAST(ROUND(LN(CAST(($c) AS DOUBLE)), 6) AS DECIMAL(18,6)) AS DECIMAL(28,6)) END"

  private val stumpSql: String = {
    val gainNum = Seq(
      ("+", "l1 + l0 + r1 + r0"),
      ("-", "l1 + r1"), ("-", "l0 + r0"),
      ("-", "l1 + l0"), ("-", "r1 + r0"),
      ("+", "l1"), ("+", "l0"), ("+", "r1"), ("+", "r0"))
      .map { case (sg, e) => s"$sg ${xlxSql(e)}" }.mkString(" ")
    s"""WITH o AS (
       |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y,
       |    o_orderstatus,
       |    CAST(MONTH(o_orderdate) AS BIGINT) AS mon,
       |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM orders),
       |mm AS (SELECT MIN(cents) AS cmin, MAX(cents) AS cmax FROM o),
       |b AS (SELECT y, o_orderstatus, mon,
       |        ((cents - cmin) * 16) // (cmax - cmin + 1) AS price_b
       |      FROM o, mm),
       |sp AS (SELECT 'price16' AS feature, price_b AS bk,
       |         CAST(SUM(y) AS BIGINT) AS c1, CAST(SUM(1 - y) AS BIGINT) AS c0
       |       FROM b GROUP BY 2
       |       UNION ALL
       |       SELECT 'month', mon, CAST(SUM(y) AS BIGINT),
       |         CAST(SUM(1 - y) AS BIGINT) FROM b GROUP BY 2),
       |num AS (
       |  SELECT feature, '<=' || CAST(bk AS VARCHAR) AS split,
       |    CAST(SUM(c1) OVER (PARTITION BY feature ORDER BY bk) AS BIGINT) AS l1,
       |    CAST(SUM(c0) OVER (PARTITION BY feature ORDER BY bk) AS BIGINT) AS l0,
       |    CAST(SUM(c1) OVER (PARTITION BY feature) AS BIGINT) AS p1,
       |    CAST(SUM(c0) OVER (PARTITION BY feature) AS BIGINT) AS p0,
       |    MAX(bk) OVER (PARTITION BY feature) AS maxb, bk
       |  FROM sp),
       |numsp AS (SELECT feature, split, l1, l0, p1 - l1 AS r1, p0 - l0 AS r0
       |          FROM num WHERE bk < maxb),
       |cat0 AS (SELECT 'status' AS feature, o_orderstatus AS split,
       |           CAST(SUM(y) AS BIGINT) AS c1, CAST(SUM(1 - y) AS BIGINT) AS c0
       |         FROM b GROUP BY 2),
       |catsp AS (SELECT feature, split, c1 AS l1, c0 AS l0,
       |            CAST(SUM(c1) OVER () - c1 AS BIGINT) AS r1,
       |            CAST(SUM(c0) OVER () - c0 AS BIGINT) AS r0 FROM cat0),
       |alls AS (SELECT * FROM numsp UNION ALL SELECT * FROM catsp),
       |g AS (SELECT feature, split, l1, l0, r1, r0,
       |        ROUND(CAST(($gainNum) AS DOUBLE)
       |          / CAST(l1 + l0 + r1 + r0 AS DOUBLE), 6) AS gain
       |      FROM alls),
       |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY feature
       |         ORDER BY gain DESC, split) AS rn FROM g)
       |SELECT feature, split, CAST(l1 + l0 AS BIGINT) AS n_left,
       |  CAST(r1 + r0 AS BIGINT) AS n_right,
       |  l1 AS n_left_pos, r1 AS n_right_pos, gain
       |FROM rk WHERE rn = 1 ORDER BY feature""".stripMargin
  }

  private val corrSql: String = {
    val fns = Seq("price", "lines", "qty", "parts")
    val firsts = fns.map(f =>
      s"CAST(SUM(CAST(f_$f AS DECIMAL(18,4))) AS DOUBLE) AS s_$f")
    val seconds = for {
      (a, i) <- fns.zipWithIndex; (b, j) <- fns.zipWithIndex if i <= j
    } yield s"CAST(CAST(SUM(CAST(f_$a AS DECIMAL(19,4)) * CAST(f_$b AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS s_${a}_$b"
    def r(x: String, y: String) =
      s"ROUND((CAST(n AS DOUBLE) * s_${x}_$y - s_$x * s_$y) / " +
        s"(sqrt(CAST(n AS DOUBLE) * s_${x}_$x - s_$x * s_$x) * " +
        s"sqrt(CAST(n AS DOUBLE) * s_${y}_$y - s_$y * s_$y)), 6)"
    val pairRows = (for {
      (x, i) <- fns.zipWithIndex; (y, j) <- fns.zipWithIndex if i < j
    } yield s"SELECT '$x' AS feat_a, '$y' AS feat_b, n, ${r(x, y)} AS r FROM a")
      .mkString("\n", "\nUNION ALL ", "")
    s"""WITH per AS MATERIALIZED (
       |  SELECT l_orderkey, COUNT(*) AS f_lines,
       |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS f_qty,
       |    COUNT(DISTINCT l_partkey) AS f_parts
       |  FROM lineitem GROUP BY 1),
       |feats AS MATERIALIZED (
       |  SELECT o_totalprice AS f_price, f_lines, f_qty, f_parts
       |  FROM orders JOIN per ON o_orderkey = l_orderkey),
       |a AS MATERIALIZED (
       |  SELECT COUNT(*) AS n, ${(firsts ++ seconds).mkString(",\n    ")}
       |  FROM feats)
       |SELECT feat_a, feat_b, n, r FROM ($pairRows)
       |ORDER BY feat_a, feat_b""".stripMargin
  }

  /** The q238 oracle: every float literal wrapped `CAST(x AS DOUBLE)` —
    * a bare `1.96` parses as DECIMAL(3,2) in DuckDB and its exact
    * decimal z² diverges from the engine's double·double by 1 ulp.
    */
  private val wilsonSql: String = {
    def D(x: String) = s"CAST($x AS DOUBLE)"
    val z = D("1.96"); val nD = D("n"); val kD = D("k")
    val p = s"$kD / $nD"
    val denom = s"(${D("1.0")} + $z * $z / $nD)"
    val center = s"($p + $z * $z / (${D("2.0")} * $nD)) / $denom"
    val half = s"$z * sqrt($p * (${D("1.0")} - $p) / $nD" +
      s" + $z * $z / (${D("4.0")} * $nD * $nD)) / $denom"
    s"""WITH a AS (
       |  SELECT c_mktsegment,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS k
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  GROUP BY 1)
       |SELECT c_mktsegment, n, k,
       |  ROUND($p, 6) AS rate,
       |  ROUND($center - $half, 6) AS ci_lo,
       |  ROUND($center + $half, 6) AS ci_hi
       |FROM a ORDER BY c_mktsegment""".stripMargin
  }

  /** The q319/q326 oracle generator: the identical per-pair g3 chain,
    * generated per declared candidate and UNION ALL'd.
    */
  private[graft] def fdBlocksSql(pairs: Seq[(String, String, String)]): String = {
    val blocks = pairs.map { case (t, a, b) =>
      s"""SELECT '$t' AS rel, '$a' AS determinant, '$b' AS dependent,
         |  CAST(SUM(ca) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS n_det,
         |  CAST(SUM(nb) AS BIGINT) AS n_pairs,
         |  SUM(nb) = COUNT(*) AS holds,
         |  CAST(SUM(ca - ma) AS BIGINT) AS g3_violations,
         |  ROUND(CAST(SUM(ca) - SUM(ca - ma) AS DOUBLE)
         |        / CAST(SUM(ca) AS DOUBLE), 6) AS confidence
         |FROM (SELECT A, SUM(c) AS ca, MAX(c) AS ma, COUNT(*) AS nb
         |      FROM (SELECT $a AS A, $b AS B, COUNT(*) AS c FROM $t
         |            WHERE $a IS NOT NULL GROUP BY 1, 2)
         |      GROUP BY 1)""".stripMargin
    }
    blocks.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY rel, determinant, dependent")
  }

  private val fdDiscoverySql: String = fdBlocksSql(Seq(
    ("part", "p_brand", "p_type"), ("part", "p_name", "p_brand"),
    ("part", "p_partkey", "p_name"), ("part", "p_type", "p_size"),
    ("orders", "o_orderkey", "o_orderstatus"),
    ("orders", "o_custkey", "o_orderpriority")))

  /** The q481 oracle: q371's unrolled-fixpoint discipline — 5 MATERIALIZED
    * (E-step, M-step) CTE pairs over the cent collapse, every float shape
    * textually identical to the Spark kernel.
    */
  private val gmmSql: String = {
    def lExpr(p: String, mu: String, sv: String): String =
      s"$p / SQRT($sv) * EXP((CAST(c AS DOUBLE) - $mu) " +
        s"* (CAST(c AS DOUBLE) - $mu) / (CAST('-2.0' AS DOUBLE) * $sv))"
    def iter(i: Int): String = {
      val pv = s"p${i - 1}"
      val l1 = lExpr(s"$pv.p1", s"$pv.mu1", s"$pv.s1")
      val l2 = lExpr(s"(CAST('1.0' AS DOUBLE) - $pv.p1)", s"$pv.mu2", s"$pv.s2")
      s"""m$i AS MATERIALIZED (
         |  SELECT
         |    CAST(CAST(SUM(CAST(ROUND(CAST(t AS DOUBLE) * g, 8)
         |      AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS DOUBLE) AS n1,
         |    CAST(CAST(SUM(CAST(ROUND(CAST(t AS DOUBLE) * CAST(c AS DOUBLE)
         |      * g, 4) AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sv1,
         |    CAST(CAST(SUM(CAST(ROUND(CAST(t AS DOUBLE) * CAST(c AS DOUBLE)
         |      * CAST(c AS DOUBLE) * g, 2) AS DECIMAL(38,2)))
         |      AS DECIMAL(38,2)) AS DOUBLE) AS sq1
         |  FROM (SELECT t, c,
         |      ROUND($l1 / ($l1 + $l2), 8) AS g
         |    FROM byc, $pv) x),
         |p$i AS MATERIALIZED (
         |  SELECT t2.n, t2.sv, t2.sq,
         |    n1 / CAST(t2.n AS DOUBLE) AS p1,
         |    sv1 / n1 AS mu1,
         |    sq1 / n1 - sv1 / n1 * (sv1 / n1) AS s1,
         |    (CAST(t2.sv AS DOUBLE) - sv1)
         |      / (CAST(t2.n AS DOUBLE) - n1) AS mu2,
         |    (CAST(t2.sq AS DOUBLE) - sq1) / (CAST(t2.n AS DOUBLE) - n1)
         |      - (CAST(t2.sv AS DOUBLE) - sv1) / (CAST(t2.n AS DOUBLE) - n1)
         |        * ((CAST(t2.sv AS DOUBLE) - sv1)
         |          / (CAST(t2.n AS DOUBLE) - n1)) AS s2
         |  FROM m$i, tot t2)""".stripMargin
    }
    val varSql = "CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) " +
      "- CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) " +
      "* (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))"
    s"""WITH byc AS MATERIALIZED (SELECT
       |    CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) AS c,
       |    CAST(COUNT(*) AS BIGINT) AS t
       |  FROM events GROUP BY 1),
       |tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
       |    CAST(SUM(t * c) AS BIGINT) AS sv,
       |    CAST(SUM(t * c * c) AS BIGINT) AS sq FROM byc),
       |cum AS (SELECT c, SUM(t) OVER (ORDER BY c
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM byc),
       |q25c AS (SELECT MIN(c) AS q25 FROM cum, tot
       |  WHERE cum >= (25 * n + 99) // 100),
       |q75c AS (SELECT MIN(c) AS q75 FROM cum, tot
       |  WHERE cum >= (75 * n + 99) // 100),
       |p0 AS MATERIALIZED (SELECT n, sv, sq,
       |    CAST('0.5' AS DOUBLE) AS p1,
       |    CAST(q25 AS DOUBLE) AS mu1, $varSql AS s1,
       |    CAST(q75 AS DOUBLE) AS mu2, $varSql AS s2
       |  FROM tot, q25c, q75c),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT n, ROUND(p1, 6) AS pi1,
       |  ROUND(mu1 / CAST('100.0' AS DOUBLE), 4) AS mu1_dollars,
       |  ROUND(SQRT(s1) / CAST('100.0' AS DOUBLE), 4) AS sigma1_dollars,
       |  ROUND(mu2 / CAST('100.0' AS DOUBLE), 4) AS mu2_dollars,
       |  ROUND(SQRT(s2) / CAST('100.0' AS DOUBLE), 4) AS sigma2_dollars,
       |  ROUND(ABS(mu2 - mu1) / SQRT((s1 + s2) / CAST('2.0' AS DOUBLE)), 4)
       |    AS separation
       |FROM p5""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q504_effect_sizes" ->
      """WITH base AS MATERIALIZED (SELECT c_mktsegment AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |      // 100000 AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |per AS MATERIALIZED (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(y) AS BIGINT) AS sg, CAST(SUM(y * y) AS BIGINT) AS qg
        |  FROM base GROUP BY 1),
        |two AS MATERIALIZED (SELECT g, ng, sg, qg, rk FROM (
        |  SELECT g, ng, sg, qg,
        |    row_number() OVER (ORDER BY ng DESC, g) AS rk FROM per)
        |  WHERE rk <= 2),
        |a AS (SELECT g AS g1, ng AS n1, sg AS s1, qg AS q1 FROM two
        |  WHERE rk = 1),
        |b AS (SELECT g AS g2, ng AS n2, sg AS s2, qg AS q2 FROM two
        |  WHERE rk = 2),
        |sup AS MATERIALIZED (SELECT rk, y, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM base JOIN two ON base.g = two.g GROUP BY 1, 2),
        |dom AS (SELECT
        |    CAST(SUM(CASE WHEN sa.y > sb.y THEN sa.c * sb.c ELSE 0 END)
        |      AS DECIMAL(38,0)) AS gt,
        |    CAST(SUM(CASE WHEN sa.y = sb.y THEN sa.c * sb.c ELSE 0 END)
        |      AS DECIMAL(38,0)) AS eqc
        |  FROM (SELECT y, c FROM sup WHERE rk = 1) sa,
        |       (SELECT y, c FROM sup WHERE rk = 2) sb),
        |md AS (SELECT g1, g2,
        |    CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
        |    (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |      / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE)
        |        - CAST('1.0' AS DOUBLE)) AS v1,
        |    (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
        |      / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE)
        |        - CAST('1.0' AS DOUBLE)) AS v2,
        |    gt, eqc
        |  FROM a, b, dom)
        |SELECT g1, g2,
        |  ROUND((m1 - m2) / SQRT(((n1d - CAST('1.0' AS DOUBLE)) * v1
        |    + (n2d - CAST('1.0' AS DOUBLE)) * v2)
        |    / (n1d + n2d - CAST('2.0' AS DOUBLE))), 6)
        |    + CAST('0.0' AS DOUBLE) AS cohens_d,
        |  ROUND((m1 - m2) / SQRT(((n1d - CAST('1.0' AS DOUBLE)) * v1
        |    + (n2d - CAST('1.0' AS DOUBLE)) * v2)
        |    / (n1d + n2d - CAST('2.0' AS DOUBLE)))
        |    * (CAST('1.0' AS DOUBLE) - CAST('3.0' AS DOUBLE)
        |      / (CAST('4.0' AS DOUBLE) * (n1d + n2d)
        |        - CAST('9.0' AS DOUBLE))), 6)
        |    + CAST('0.0' AS DOUBLE) AS hedges_g,
        |  ROUND((m1 - m2) / SQRT(v2), 6) + CAST('0.0' AS DOUBLE)
        |    AS glass_delta,
        |  ROUND((CAST(gt AS DOUBLE) + CAST(eqc AS DOUBLE)
        |    * CAST('0.5' AS DOUBLE)) / (n1d * n2d), 6) AS cles
        |FROM md""".stripMargin,
    "q505_tukey_hsd" ->
      """WITH base AS MATERIALIZED (SELECT c_mktsegment AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |      // 100000 AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |per AS MATERIALIZED (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(y) AS BIGINT) AS sg, CAST(SUM(y * y) AS BIGINT) AS qg
        |  FROM base GROUP BY 1),
        |m AS (SELECT (CAST(qt AS DOUBLE) - sbterm)
        |      / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS msw
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |      CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(qg) AS BIGINT) AS qt,
        |      CAST(CAST(SUM(CAST(ROUND(CAST(sg AS DOUBLE)
        |        * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE), 6)
        |        AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sbterm
        |    FROM per))
        |SELECT a.g AS ga, b.g AS gb,
        |  ROUND(CAST(a.sg AS DOUBLE) / CAST(a.ng AS DOUBLE)
        |    - CAST(b.sg AS DOUBLE) / CAST(b.ng AS DOUBLE), 4)
        |    + CAST('0.0' AS DOUBLE) AS mean_diff,
        |  ROUND(CAST('3.858' AS DOUBLE) * SQRT(msw / CAST('2.0' AS DOUBLE)
        |    * (CAST('1.0' AS DOUBLE) / CAST(a.ng AS DOUBLE)
        |      + CAST('1.0' AS DOUBLE) / CAST(b.ng AS DOUBLE))), 4) AS hsd,
        |  (ABS(ROUND(CAST(a.sg AS DOUBLE) / CAST(a.ng AS DOUBLE)
        |    - CAST(b.sg AS DOUBLE) / CAST(b.ng AS DOUBLE), 4)
        |    + CAST('0.0' AS DOUBLE))
        |    > ROUND(CAST('3.858' AS DOUBLE) * SQRT(msw
        |      / CAST('2.0' AS DOUBLE)
        |      * (CAST('1.0' AS DOUBLE) / CAST(a.ng AS DOUBLE)
        |        + CAST('1.0' AS DOUBLE) / CAST(b.ng AS DOUBLE))), 4))
        |    AS significant
        |FROM per a JOIN per b ON a.g < b.g CROSS JOIN m
        |ORDER BY ga, gb""".stripMargin,
    "q506_twoway_anova" ->
      """WITH base AS MATERIALIZED (SELECT c_mktsegment AS g,
        |    o_orderpriority AS p,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |      // 100000 AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |cells AS MATERIALIZED (SELECT g, p, CAST(COUNT(*) AS BIGINT) AS ngp,
        |    CAST(SUM(y) AS BIGINT) AS sgp, CAST(SUM(y * y) AS BIGINT) AS qgp
        |  FROM base GROUP BY 1, 2),
        |bya AS (SELECT CAST(COUNT(*) AS BIGINT) AS sba_lv,
        |    CAST(CAST(SUM(CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |      / CAST(ng AS DOUBLE), 6) AS DECIMAL(28,6))) AS DECIMAL(38,6))
        |      AS DOUBLE) AS sba
        |  FROM (SELECT g, CAST(SUM(ngp) AS BIGINT) AS ng,
        |      CAST(SUM(sgp) AS BIGINT) AS sg FROM cells GROUP BY 1)),
        |byb AS (SELECT CAST(COUNT(*) AS BIGINT) AS sbb_lv,
        |    CAST(CAST(SUM(CAST(ROUND(CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)
        |      / CAST(np AS DOUBLE), 6) AS DECIMAL(28,6))) AS DECIMAL(38,6))
        |      AS DOUBLE) AS sbb
        |  FROM (SELECT p, CAST(SUM(ngp) AS BIGINT) AS np,
        |      CAST(SUM(sgp) AS BIGINT) AS sp FROM cells GROUP BY 1)),
        |byc AS (SELECT CAST(COUNT(*) AS BIGINT) AS sbc_lv,
        |    CAST(CAST(SUM(CAST(ROUND(CAST(sgp AS DOUBLE)
        |      * CAST(sgp AS DOUBLE) / CAST(ngp AS DOUBLE), 6)
        |      AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sbc
        |  FROM cells),
        |tot AS (SELECT CAST(SUM(ngp) AS BIGINT) AS n,
        |    CAST(SUM(sgp) AS BIGINT) AS st, CAST(SUM(qgp) AS BIGINT) AS qt
        |  FROM cells),
        |md AS (SELECT n,
        |    sba - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS ssa,
        |    sbb - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS ssb,
        |    (sbc - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |      / CAST(n AS DOUBLE))
        |      - (sba - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |        / CAST(n AS DOUBLE))
        |      - (sbb - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |        / CAST(n AS DOUBLE)) AS ssab,
        |    CAST(qt AS DOUBLE) - sbc AS ssw,
        |    CAST(sba_lv AS DOUBLE) - CAST('1.0' AS DOUBLE) AS dfa,
        |    CAST(sbb_lv AS DOUBLE) - CAST('1.0' AS DOUBLE) AS dfb,
        |    (CAST(sba_lv AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |      * (CAST(sbb_lv AS DOUBLE) - CAST('1.0' AS DOUBLE)) AS dfab,
        |    CAST(n AS DOUBLE) - CAST(sbc_lv AS DOUBLE) AS dfw
        |  FROM tot, bya, byb, byc)
        |SELECT n, ROUND(ssa, 4) AS ss_segment, ROUND(ssb, 4) AS ss_priority,
        |  ROUND(ssab, 4) + CAST('0.0' AS DOUBLE) AS ss_interaction,
        |  ROUND(ssw, 4) AS ss_within,
        |  ROUND(ssa / dfa / (ssw / dfw), 4) AS f_segment,
        |  ROUND(ssb / dfb / (ssw / dfw), 4) AS f_priority,
        |  ROUND(ssab / dfab / (ssw / dfw), 4) + CAST('0.0' AS DOUBLE)
        |    AS f_interaction
        |FROM md""".stripMargin,
    "q501_anova_oneway" ->
      """WITH base AS MATERIALIZED (SELECT c_mktsegment AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |      // 100000 AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(y) AS BIGINT) AS sg, CAST(SUM(y * y) AS BIGINT) AS qg
        |  FROM base GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS st,
        |    CAST(SUM(qg) AS BIGINT) AS qt,
        |    CAST(CAST(SUM(CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |      / CAST(ng AS DOUBLE), 6) AS DECIMAL(28,6))) AS DECIMAL(38,6))
        |      AS DOUBLE) AS sbterm
        |  FROM per),
        |md AS (SELECT n, k, CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd,
        |    sbterm - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS ssb,
        |    (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |      / CAST(n AS DOUBLE))
        |      - (sbterm - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |        / CAST(n AS DOUBLE)) AS ssw,
        |    CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS sstot
        |  FROM m)
        |SELECT n, k AS k_groups,
        |  ROUND(ssb, 4) AS ss_between, ROUND(ssw, 4) AS ss_within,
        |  ROUND((ssb / (kd - CAST('1.0' AS DOUBLE)))
        |    / (ssw / (nd - kd)), 4) AS f_stat,
        |  ROUND(ssb / sstot, 6) AS eta_sq,
        |  ROUND((ssb - (kd - CAST('1.0' AS DOUBLE)) * (ssw / (nd - kd)))
        |    / (sstot + ssw / (nd - kd)), 6) + CAST('0.0' AS DOUBLE)
        |    AS omega_sq,
        |  (ROUND((ssb / (kd - CAST('1.0' AS DOUBLE)))
        |    / (ssw / (nd - kd)), 4) > CAST('2.3719' AS DOUBLE))
        |    AS significant
        |FROM md""".stripMargin,
    "q502_shapley_r2" ->
      """WITH base AS MATERIALIZED (SELECT c_mktsegment AS g,
        |    o_orderpriority AS p,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |      // 100000 AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |cells AS MATERIALIZED (SELECT g, p, CAST(COUNT(*) AS BIGINT) AS ngp,
        |    CAST(SUM(y) AS BIGINT) AS sgp, CAST(SUM(y * y) AS BIGINT) AS qgp
        |  FROM base GROUP BY 1, 2),
        |byseg AS (SELECT CAST(CAST(SUM(CAST(ROUND(
        |      CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE), 6)
        |      AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sb_seg
        |  FROM (SELECT g, CAST(SUM(ngp) AS BIGINT) AS ng,
        |      CAST(SUM(sgp) AS BIGINT) AS sg FROM cells GROUP BY 1)),
        |bypri AS (SELECT CAST(CAST(SUM(CAST(ROUND(
        |      CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(np AS DOUBLE), 6)
        |      AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sb_pri
        |  FROM (SELECT p, CAST(SUM(ngp) AS BIGINT) AS np,
        |      CAST(SUM(sgp) AS BIGINT) AS sp FROM cells GROUP BY 1)),
        |byboth AS (SELECT CAST(CAST(SUM(CAST(ROUND(
        |      CAST(sgp AS DOUBLE) * CAST(sgp AS DOUBLE)
        |      / CAST(ngp AS DOUBLE), 6)
        |      AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sb_both
        |  FROM cells),
        |tot AS (SELECT CAST(SUM(ngp) AS BIGINT) AS n,
        |    CAST(SUM(sgp) AS BIGINT) AS st, CAST(SUM(qgp) AS BIGINT) AS qt
        |  FROM cells),
        |md AS (SELECT n,
        |    (sb_seg - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |      / CAST(n AS DOUBLE))
        |      / (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |        / CAST(n AS DOUBLE)) AS r2s,
        |    (sb_pri - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |      / CAST(n AS DOUBLE))
        |      / (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |        / CAST(n AS DOUBLE)) AS r2p,
        |    (sb_both - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |      / CAST(n AS DOUBLE))
        |      / (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |        / CAST(n AS DOUBLE)) AS r2b
        |  FROM tot, byseg, bypri, byboth)
        |SELECT n, ROUND(r2s, 6) AS r2_segment, ROUND(r2p, 6) AS r2_priority,
        |  ROUND(r2b, 6) AS r2_both,
        |  ROUND(r2s * CAST('0.5' AS DOUBLE)
        |    + (r2b - r2p) * CAST('0.5' AS DOUBLE), 6)
        |    + CAST('0.0' AS DOUBLE) AS shapley_segment,
        |  ROUND(r2p * CAST('0.5' AS DOUBLE)
        |    + (r2b - r2s) * CAST('0.5' AS DOUBLE), 6)
        |    + CAST('0.0' AS DOUBLE) AS shapley_priority
        |FROM md""".stripMargin,
    "q503_brown_forsythe" ->
      """WITH base AS MATERIALIZED (SELECT c_mktsegment AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |      // 100000 AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |sup AS MATERIALIZED (SELECT g, y, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2),
        |tot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS ntot FROM sup GROUP BY 1),
        |med AS MATERIALIZED (SELECT g, MIN(y) AS medg FROM (
        |  SELECT sup.g, y, ntot,
        |    CAST(SUM(c) OVER (PARTITION BY sup.g ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM sup JOIN tot ON sup.g = tot.g)
        |  WHERE cum >= (ntot + 1) // 2 GROUP BY 1),
        |dev AS (SELECT base.g, ABS(y - medg) AS z
        |  FROM base JOIN med ON base.g = med.g),
        |per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(z) AS BIGINT) AS sg, CAST(SUM(z * z) AS BIGINT) AS qg
        |  FROM dev GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS st,
        |    CAST(SUM(qg) AS BIGINT) AS qt,
        |    CAST(CAST(SUM(CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |      / CAST(ng AS DOUBLE), 6) AS DECIMAL(28,6))) AS DECIMAL(38,6))
        |      AS DOUBLE) AS sbterm
        |  FROM per),
        |md AS (SELECT n, k, CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd,
        |    sbterm - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS ssb,
        |    (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |      / CAST(n AS DOUBLE))
        |      - (sbterm - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |        / CAST(n AS DOUBLE)) AS ssw
        |  FROM m)
        |SELECT n, k AS k_groups,
        |  ROUND((ssb / (kd - CAST('1.0' AS DOUBLE)))
        |    / (ssw / (nd - kd)), 4) AS bf_stat,
        |  (ROUND((ssb / (kd - CAST('1.0' AS DOUBLE)))
        |    / (ssw / (nd - kd)), 4) > CAST('2.3719' AS DOUBLE))
        |    AS heteroscedastic
        |FROM md""".stripMargin,
    "q495_binary_segmentation" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000 AS v
        |  FROM orders GROUP BY 1),
        |pre AS MATERIALIZED (SELECT x,
        |    CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS i,
        |    CAST(SUM(v) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p,
        |    CAST(SUM(v * v) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS q
        |  FROM daily),
        |tot AS (SELECT MAX(i) AS n, MAX(p) AS pn, MAX(q) AS qn FROM pre),
        |c0 AS (SELECT i, x,
        |    ROUND(CAST(q AS DOUBLE)
        |      - CAST(p AS DOUBLE) * CAST(p AS DOUBLE) / CAST(i AS DOUBLE)
        |      + (CAST(qn - q AS DOUBLE)
        |        - CAST(pn - p AS DOUBLE) * CAST(pn - p AS DOUBLE)
        |          / CAST(n - i AS DOUBLE)), 6) AS cost
        |  FROM pre, tot WHERE i >= 7 AND i <= n - 7),
        |best0 AS MATERIALIZED (SELECT i AS k0, x AS x0, cost AS cost0 FROM (
        |  SELECT i, x, cost, row_number() OVER (ORDER BY cost, i) AS rn
        |  FROM c0) WHERE rn = 1),
        |split AS MATERIALIZED (SELECT k0, x0, cost0, p AS pk0, q AS qk0
        |  FROM pre JOIN best0 ON i = k0),
        |segs AS MATERIALIZED (
        |  SELECT k0, x0, cost0, CAST(1 AS BIGINT) AS seg,
        |    CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS pa,
        |    CAST(0 AS BIGINT) AS qa, k0 AS b, pk0 AS pb, qk0 AS qb
        |  FROM split
        |  UNION ALL
        |  SELECT k0, x0, cost0, CAST(2 AS BIGINT), k0, pk0, qk0, n, pn, qn
        |  FROM split, tot),
        |c1 AS (SELECT seg, i, x,
        |    ROUND(CAST(q - qa AS DOUBLE)
        |      - CAST(p - pa AS DOUBLE) * CAST(p - pa AS DOUBLE)
        |        / CAST(i - a AS DOUBLE)
        |      + (CAST(qb - q AS DOUBLE)
        |        - CAST(pb - p AS DOUBLE) * CAST(pb - p AS DOUBLE)
        |          / CAST(b - i AS DOUBLE)), 6) AS cost,
        |    ROUND(CAST(qb - qa AS DOUBLE)
        |      - CAST(pb - pa AS DOUBLE) * CAST(pb - pa AS DOUBLE)
        |        / CAST(b - a AS DOUBLE), 6) AS sse0
        |  FROM pre, segs WHERE i >= a + 7 AND i <= b - 7),
        |best1 AS (SELECT seg AS level, x AS split_day,
        |    ROUND(sse0 - cost, 6) AS sse_reduction FROM (
        |  SELECT seg, x, cost, sse0,
        |    row_number() OVER (PARTITION BY seg ORDER BY cost, i) AS rn
        |  FROM c1) WHERE rn = 1),
        |row0 AS (SELECT CAST(0 AS BIGINT) AS level, x0 AS split_day,
        |    ROUND(ROUND(CAST(qn AS DOUBLE)
        |      - CAST(pn AS DOUBLE) * CAST(pn AS DOUBLE)
        |        / CAST(n AS DOUBLE), 6) - cost0, 6) AS sse_reduction
        |  FROM split, tot)
        |SELECT level, split_day, sse_reduction FROM (
        |  SELECT * FROM row0 UNION ALL SELECT * FROM best1)
        |ORDER BY level""".stripMargin,
    "q496_mi_matrix" ->
      """WITH src AS MATERIALIZED (SELECT o_orderstatus AS st,
        |    o_orderpriority AS pr,
        |    CAST(year(CAST(o_orderdate AS DATE)) AS VARCHAR) AS yr,
        |    CAST(month(CAST(o_orderdate AS DATE)) AS VARCHAR) AS mo
        |  FROM orders),
        |stacked AS MATERIALIZED (
        |  SELECT 'status_priority' AS pair, st AS va, pr AS vb FROM src
        |  UNION ALL SELECT 'status_year', st, yr FROM src
        |  UNION ALL SELECT 'status_month', st, mo FROM src
        |  UNION ALL SELECT 'priority_year', pr, yr FROM src
        |  UNION ALL SELECT 'priority_month', pr, mo FROM src
        |  UNION ALL SELECT 'year_month', yr, mo FROM src),
        |cells AS MATERIALIZED (SELECT pair, va, vb,
        |    CAST(COUNT(*) AS BIGINT) AS c FROM stacked GROUP BY 1, 2, 3),
        |ma AS MATERIALIZED (SELECT pair, va, CAST(SUM(c) AS BIGINT) AS ca
        |  FROM cells GROUP BY 1, 2),
        |mb AS MATERIALIZED (SELECT pair, vb, CAST(SUM(c) AS BIGINT) AS cb
        |  FROM cells GROUP BY 1, 2),
        |tot AS MATERIALIZED (SELECT pair, CAST(SUM(c) AS BIGINT) AS n
        |  FROM cells GROUP BY 1),
        |mi AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_cells,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
        |      * LN(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
        |        / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))), 8)
        |      AS DECIMAL(18,8))) AS DECIMAL(38,8)) AS DOUBLE) AS mi
        |  FROM cells JOIN ma USING (pair, va) JOIN mb USING (pair, vb)
        |    JOIN tot USING (pair)
        |  GROUP BY 1),
        |ha AS (SELECT pair,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      CAST(ca AS DOUBLE) / CAST(n AS DOUBLE)
        |      * LN(CAST(ca AS DOUBLE) / CAST(n AS DOUBLE))
        |      * CAST('-1.0' AS DOUBLE), 8)
        |      AS DECIMAL(18,8))) AS DECIMAL(38,8)) AS DOUBLE) AS ha
        |  FROM ma JOIN tot USING (pair) GROUP BY 1),
        |hb AS (SELECT pair,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)
        |      * LN(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
        |      * CAST('-1.0' AS DOUBLE), 8)
        |      AS DECIMAL(18,8))) AS DECIMAL(38,8)) AS DOUBLE) AS hb
        |  FROM mb JOIN tot USING (pair) GROUP BY 1)
        |SELECT pair, n_cells, ROUND(mi, 6) AS mi_nats,
        |  ROUND(mi / LEAST(ha, hb), 6) AS nmi
        |FROM mi JOIN ha USING (pair) JOIN hb USING (pair)
        |ORDER BY pair""".stripMargin,
    "q497_cuped" ->
      """WITH per AS MATERIALIZED (SELECT o_custkey AS ck,
        |    CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) >= 1996
        |      THEN CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS yc,
        |    CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) < 1996
        |      THEN CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS xc
        |  FROM orders GROUP BY 1),
        |units AS MATERIALIZED (SELECT c_custkey AS ck,
        |    COALESCE(yc // 100000, 0) AS y, COALESCE(xc // 100000, 0) AS x,
        |    (((((c_custkey % 2147483647) * 48271) % 2147483647 + 1)
        |      * 16807 % 2147483647 % 10000) < 5000) AS t
        |  FROM customer LEFT JOIN per ON c_custkey = ck),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(SUM(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) AS syt,
        |    CAST(SUM(CASE WHEN t THEN x ELSE 0 END) AS BIGINT) AS sxt
        |  FROM units),
        |md AS (SELECT n AS nb, nt AS ntb, CAST(n AS DOUBLE) AS n,
        |    CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
        |    CAST(sxx AS DOUBLE) AS sxx, CAST(sxy AS DOUBLE) AS sxy,
        |    CAST(syy AS DOUBLE) AS syy, CAST(nt AS DOUBLE) AS nt,
        |    CAST(syt AS DOUBLE) AS syt, CAST(sxt AS DOUBLE) AS sxt
        |  FROM m)
        |SELECT nb AS n_units, ntb AS n_treat,
        |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS theta,
        |  ROUND(syt / nt - (sy - syt) / (n - nt), 4) AS diff_raw_k,
        |  ROUND(syt / nt - (sy - syt) / (n - nt)
        |    - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
        |      * (sxt / nt - (sx - sxt) / (n - nt)), 4) AS diff_cuped_k,
        |  ROUND(CAST('1.0' AS DOUBLE)
        |    - ((n * syy - sy * sy) / (n * n)
        |      - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
        |        * ((n * sxy - sx * sy) / (n * sxx - sx * sx))
        |        * ((n * sxx - sx * sx) / (n * n)))
        |      / ((n * syy - sy * sy) / (n * n)), 6) AS var_reduction
        |FROM md""".stripMargin,
    "q492_bootstrap_ci" ->
      """WITH base AS MATERIALIZED (SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |reps AS (SELECT u.b AS b FROM unnest(range(0, 32)) AS u(b)),
        |wtd AS (SELECT b, c,
        |    (CASE WHEN u < 3679 THEN 0 WHEN u < 7358 THEN 1
        |      WHEN u < 9197 THEN 2 WHEN u < 9810 THEN 3
        |      WHEN u < 9963 THEN 4 WHEN u < 9994 THEN 5 ELSE 6 END) AS w
        |  FROM (SELECT b, c,
        |      ((((k * 37 + b) % 2147483647) * 48271) % 2147483647 + 1)
        |        * 16807 % 2147483647 % 10000 AS u
        |    FROM base CROSS JOIN reps)),
        |means AS MATERIALIZED (SELECT b,
        |    CAST(ROUND(CAST(SUM(w * c) AS DOUBLE)
        |      / CAST(SUM(w) AS DOUBLE), 4) AS DECIMAL(18,4)) AS m
        |  FROM wtd GROUP BY b),
        |pt AS (SELECT CAST(ROUND(CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 4) AS DECIMAL(18,4)) AS pt
        |  FROM base),
        |dm AS MATERIALIZED (SELECT b, m, pt,
        |    CAST(m - pt AS DECIMAL(18,4)) AS dm FROM means, pt),
        |ranked AS (SELECT m, row_number() OVER (ORDER BY m, b) AS rn FROM dm),
        |lo AS (SELECT CAST(m AS DOUBLE) AS ci_lo FROM ranked WHERE rn = 2),
        |hi AS (SELECT CAST(m AS DOUBLE) AS ci_hi FROM ranked WHERE rn = 31),
        |se AS (SELECT MAX(pt) AS pt, CAST(COUNT(*) AS BIGINT) AS nb,
        |    CAST(SUM(dm) AS DECIMAL(28,4)) AS sdm,
        |    CAST(SUM(CAST(ROUND(CAST(dm AS DOUBLE) * CAST(dm AS DOUBLE), 4)
        |      AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS sdm2
        |  FROM dm)
        |SELECT nb AS n_replicas, CAST(pt AS DOUBLE) AS mean_cents,
        |  ci_lo, ci_hi,
        |  ROUND(SQRT((CAST(sdm2 AS DOUBLE)
        |    - CAST(sdm AS DOUBLE) * CAST(sdm AS DOUBLE)
        |      / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE)
        |        - CAST('1.0' AS DOUBLE))), 4) AS se
        |FROM se, lo, hi""".stripMargin,
    "q493_seasonal_decompose" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000 AS c
        |  FROM orders GROUP BY 1),
        |det AS MATERIALIZED (SELECT x,
        |    ((x % 7) + 7) % 7 AS wd, 7 * c - sw AS d7
        |  FROM (SELECT x, c,
        |      CAST(SUM(c) OVER w AS BIGINT) AS sw, COUNT(*) OVER w AS cw
        |    FROM daily
        |    WINDOW w AS (ORDER BY x ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
        |  WHERE cw = 7),
        |seas AS MATERIALIZED (SELECT wd, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(ROUND(CAST(CAST(SUM(d7) AS BIGINT) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) / CAST('7.0' AS DOUBLE), 4)
        |      AS DECIMAL(18,4)) AS seasonal
        |  FROM det GROUP BY wd),
        |resid AS (SELECT det.wd,
        |    CAST(ROUND(CAST(d7 AS DOUBLE) / CAST('7.0' AS DOUBLE), 4)
        |      AS DECIMAL(18,4)) AS dd,
        |    CAST(CAST(ROUND(CAST(d7 AS DOUBLE) / CAST('7.0' AS DOUBLE), 4)
        |      AS DECIMAL(18,4)) - seasonal AS DECIMAL(18,4)) AS rr
        |  FROM det JOIN seas ON det.wd = seas.wd),
        |gmo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(dd) AS DECIMAL(28,4)) AS sdd,
        |    CAST(SUM(CAST(ROUND(CAST(dd AS DOUBLE) * CAST(dd AS DOUBLE), 4)
        |      AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS sdd2,
        |    CAST(SUM(rr) AS DECIMAL(28,4)) AS srr,
        |    CAST(SUM(CAST(ROUND(CAST(rr AS DOUBLE) * CAST(rr AS DOUBLE), 4)
        |      AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS srr2
        |  FROM resid),
        |strength AS (SELECT ROUND(GREATEST(CAST('0.0' AS DOUBLE),
        |    CAST('1.0' AS DOUBLE)
        |    - ((CAST(srr2 AS DOUBLE) - CAST(srr AS DOUBLE)
        |        * CAST(srr AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |      / ((CAST(sdd2 AS DOUBLE) - CAST(sdd AS DOUBLE)
        |        * CAST(sdd AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))), 6)
        |    AS seasonal_strength FROM gmo)
        |SELECT wd AS weekday, n_days, CAST(seasonal AS DOUBLE) AS seasonal_k,
        |  seasonal_strength
        |FROM seas, strength ORDER BY weekday""".stripMargin,
    "q494_granger_causality" ->
      """WITH grid AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) * 100 AS BIGINT) // 100000 AS r,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1),
        |lagged AS MATERIALIZED (SELECT r, r1, n1 FROM (
        |    SELECT r, lag(r, 1) OVER (ORDER BY x) AS r1,
        |      lag(cnt, 1) OVER (ORDER BY x) AS n1
        |    FROM grid) WHERE r1 IS NOT NULL),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(r) AS BIGINT) AS sy, CAST(SUM(r1) AS BIGINT) AS s1,
        |    CAST(SUM(n1) AS BIGINT) AS s2,
        |    CAST(SUM(r1 * r1) AS BIGINT) AS s11,
        |    CAST(SUM(n1 * n1) AS BIGINT) AS s22,
        |    CAST(SUM(r1 * n1) AS BIGINT) AS s12,
        |    CAST(SUM(r * r1) AS BIGINT) AS sy1,
        |    CAST(SUM(r * n1) AS BIGINT) AS sy2,
        |    CAST(SUM(r * r) AS BIGINT) AS syy
        |  FROM lagged),
        |md AS (SELECT CAST(n AS DOUBLE) AS n, CAST(sy AS DOUBLE) AS sy,
        |    CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
        |    CAST(s11 AS DOUBLE) AS s11, CAST(s22 AS DOUBLE) AS s22,
        |    CAST(s12 AS DOUBLE) AS s12, CAST(sy1 AS DOUBLE) AS sy1,
        |    CAST(sy2 AS DOUBLE) AS sy2, CAST(syy AS DOUBLE) AS syy,
        |    CAST(n AS BIGINT) AS nb
        |  FROM m),
        |cr AS (SELECT nb, n, s1, sy1, sy2, sy, syy,
        |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2) AS det,
        |    sy * (s11 * s22 - s12 * s12) - s1 * (sy1 * s22 - s12 * sy2)
        |      + s2 * (sy1 * s12 - s11 * sy2) AS da,
        |    n * (sy1 * s22 - s12 * sy2) - sy * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * sy2 - sy1 * s2) AS db,
        |    n * (s11 * sy2 - sy1 * s12) - s1 * (s1 * sy2 - sy1 * s2)
        |      + sy * (s1 * s12 - s11 * s2) AS dc,
        |    (n * sy1 - s1 * sy) / (n * s11 - s1 * s1) AS br
        |  FROM md),
        |fin AS (SELECT nb, db / det AS bb, dc / det AS cc2,
        |    syy - (da * sy + db * sy1 + dc * sy2) / det AS rssu,
        |    syy - ((sy - br * s1) / n) * sy - br * sy1 AS rssr, n
        |  FROM cr)
        |SELECT nb AS n, ROUND(bb, 6) AS beta_rev_lag,
        |  ROUND(cc2, 6) AS beta_cnt_lag,
        |  ROUND((rssr - rssu) / (rssu / (n - CAST('3.0' AS DOUBLE))), 4)
        |    AS f_stat,
        |  (ROUND((rssr - rssu) / (rssu / (n - CAST('3.0' AS DOUBLE))), 4)
        |    > CAST('3.8415' AS DOUBLE)) AS granger_significant
        |FROM fin""".stripMargin,
    "q487_matrix_profile" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2))) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |pos AS MATERIALIZED (SELECT x, c,
        |    CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS i FROM daily),
        |sub AS MATERIALIZED (
        |  SELECT i, x, list(c) OVER w AS arr,
        |    CAST(SUM(c) OVER w AS BIGINT) AS ss,
        |    CAST(SUM(c * c) OVER w AS BIGINT) AS qq,
        |    COUNT(*) OVER w AS cnt
        |  FROM pos
        |  WINDOW w AS (ORDER BY i ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING)),
        |sub2 AS MATERIALIZED (SELECT i, x, arr, ss, qq FROM sub
        |  WHERE cnt = 7 AND 7 * qq - ss * ss > 0),
        |pairs AS (SELECT a.i, a.x,
        |    ROUND(SQRT(GREATEST(CAST('0.0' AS DOUBLE),
        |      CAST('14.0' AS DOUBLE) * (CAST('1.0' AS DOUBLE)
        |        - CAST(7 * CAST(list_dot_product(CAST(a.arr AS DOUBLE[]),
        |              CAST(b.arr AS DOUBLE[])) AS BIGINT)
        |            - a.ss * b.ss AS DOUBLE)
        |          / (SQRT(CAST(7 * a.qq - a.ss * a.ss AS DOUBLE))
        |           * SQRT(CAST(7 * b.qq - b.ss * b.ss AS DOUBLE)))))), 6) AS dd
        |  FROM sub2 a JOIN sub2 b ON ABS(a.i - b.i) >= 4)
        |SELECT i AS pos, x AS day, MIN(dd) AS profile
        |FROM pairs GROUP BY i, x
        |ORDER BY profile DESC, i LIMIT 10""".stripMargin,
    "q490_cusum_alarm" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS cc FROM daily),
        |g2 AS (SELECT x, c,
        |    CAST(ROUND(CAST(c AS DOUBLE)
        |      - (CAST(cc AS DOUBLE) / CAST(n AS DOUBLE))
        |        * CAST('1.005' AS DOUBLE), 4) AS DECIMAL(28,4)) AS y,
        |    CAST(ROUND((CAST(cc AS DOUBLE) / CAST(n AS DOUBLE))
        |      * CAST('0.05' AS DOUBLE), 4) AS DECIMAL(28,4)) AS h
        |  FROM daily, tot),
        |p1 AS MATERIALIZED (SELECT x, c, h,
        |    CAST(SUM(y) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DECIMAL(38,4)) AS p
        |  FROM g2),
        |st AS (SELECT x, c, h, p,
        |    CAST(MIN(p) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DECIMAL(38,4)) AS pmin
        |  FROM p1)
        |SELECT x AS day, c AS cents,
        |  CAST(CAST(p - LEAST(pmin, CAST('0' AS DECIMAL(38,4)))
        |    AS DECIMAL(38,4)) AS DOUBLE) AS cusum,
        |  (CAST(p - LEAST(pmin, CAST('0' AS DECIMAL(38,4)))
        |    AS DECIMAL(38,4)) > h) AS alarm
        |FROM st ORDER BY cusum DESC, day LIMIT 10""".stripMargin,
    "q481_gmm_1d" -> gmmSql,
    "q485_negbin_fit" ->
      """WITH grid AS (SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(COUNT(*) AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(v) AS BIGINT) AS s1,
        |    CAST(SUM(v * v) AS BIGINT) AS s2 FROM grid)
        |SELECT n AS n_days,
        |  ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean,
        |  ROUND((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |      * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)), 4) AS variance,
        |  ROUND(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |      * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |    / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 4) AS dispersion,
        |  ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
        |    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |    / ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |        * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |      - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 4) AS nb_r,
        |  ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
        |    / ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |        * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE))), 6) AS nb_p,
        |  (ROUND(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |      * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |    / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 4)
        |    > CAST('1.0' AS DOUBLE)) AS overdispersed
        |FROM mom""".stripMargin,
    "q482_hampel" ->
      """WITH grid AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(COUNT(*) AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |off AS MATERIALIZED (SELECT x + o AS xc, v
        |  FROM grid, (SELECT UNNEST([-3, -2, -1, 0, 1, 2, 3]) AS o) oo),
        |med AS MATERIALIZED (SELECT xc,
        |    list_sort(list(v))[(len(list(v)) + 1) // 2] AS med
        |  FROM off GROUP BY 1),
        |mad AS (SELECT o.xc, MAX(m.med) AS med,
        |    list_sort(list(ABS(o.v - m.med)))
        |      [(len(list(ABS(o.v - m.med))) + 1) // 2] AS mad
        |  FROM off o JOIN med m ON o.xc = m.xc GROUP BY 1)
        |SELECT g.x AS day, g.v AS orders, mad.med, mad.mad,
        |  (ABS(g.v - mad.med) * 10000 > mad.mad * 44478) AS outlier
        |FROM grid g JOIN mad ON g.x = mad.xc
        |ORDER BY day""".stripMargin,
    "q483_western_electric" ->
      """WITH hourly AS (SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |mom AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nh,
        |    CAST(SUM(c) AS BIGINT) AS sc,
        |    CAST(SUM(c * c) AS BIGINT) AS scc
        |  FROM hourly GROUP BY 1),
        |zd AS (SELECT hourly.event_type, h, c,
        |    (CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / CAST(nh AS DOUBLE))
        |    / SQRT(CAST(scc AS DOUBLE) / CAST(nh AS DOUBLE)
        |      - CAST(sc AS DOUBLE) / CAST(nh AS DOUBLE)
        |        * (CAST(sc AS DOUBLE) / CAST(nh AS DOUBLE))) AS z
        |  FROM hourly JOIN mom ON hourly.event_type = mom.event_type),
        |rules AS (SELECT event_type, h, c, z,
        |    (ABS(z) > CAST('3.0' AS DOUBLE)) AS r1,
        |    (SUM(CASE WHEN z > CAST('2.0' AS DOUBLE) THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY event_type ORDER BY h
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) >= 2
        |      OR SUM(CASE WHEN z < CAST('-2.0' AS DOUBLE) THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY event_type ORDER BY h
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) >= 2) AS r2,
        |    (SUM(CASE WHEN z > CAST('1.0' AS DOUBLE) THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY event_type ORDER BY h
        |          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) >= 4
        |      OR SUM(CASE WHEN z < CAST('-1.0' AS DOUBLE) THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY event_type ORDER BY h
        |          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) >= 4) AS r3,
        |    (SUM(CASE WHEN z > CAST('0.0' AS DOUBLE) THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY event_type ORDER BY h
        |          ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) >= 8
        |      OR SUM(CASE WHEN z < CAST('0.0' AS DOUBLE) THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY event_type ORDER BY h
        |          ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) >= 8) AS r4
        |  FROM zd)
        |SELECT event_type, h, c, ROUND(z, 4) AS z, r1, r2, r3, r4
        |FROM rules
        |WHERE r1 OR r2 OR r3 OR r4
        |ORDER BY event_type, h""".stripMargin,
    "q479_dbscan_1d" ->
      """WITH byc AS (SELECT
        |    CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) AS c,
        |    CAST(COUNT(*) AS BIGINT) AS t
        |  FROM events GROUP BY 1),
        |isl AS (SELECT c, t,
        |    CASE WHEN c - LAG(c) OVER (ORDER BY c) IS NULL
        |      OR c - LAG(c) OVER (ORDER BY c) > 3 THEN 1 ELSE 0 END AS nw
        |  FROM byc),
        |cl AS (SELECT c, t,
        |    SUM(nw) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cl
        |  FROM isl)
        |SELECT MIN(c) AS lo_cents, MAX(c) AS hi_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_values,
        |  CAST(SUM(t) AS BIGINT) AS mass,
        |  (CAST(SUM(t) AS BIGINT) >= 50) AS core
        |FROM cl GROUP BY cl.cl
        |ORDER BY mass DESC, lo_cents LIMIT 10""".stripMargin,
    "q480_mahalanobis" ->
      """WITH daily AS (SELECT
        |    CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(date_trunc('second', ts) AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b
        |  FROM events GROUP BY 1),
        |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
        |    CAST(SUM(a * a) AS BIGINT) AS saa,
        |    CAST(SUM(b * b) AS BIGINT) AS sbb,
        |    CAST(SUM(a * b) AS BIGINT) AS sab
        |  FROM daily)
        |SELECT x AS day, a AS clicks, b AS purchases,
        |  ROUND(((CAST(a AS DOUBLE) - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ((CAST(sbb AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * (CAST(a AS DOUBLE) - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
        |      - (CAST(sab AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * (CAST(b AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))
        |    + (CAST(b AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ((CAST(saa AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * (CAST(b AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
        |      - (CAST(sab AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * (CAST(a AS DOUBLE) - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))))
        |    / ((CAST(saa AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * (CAST(sbb AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))
        |      - (CAST(sab AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * (CAST(sab AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))), 4) AS d2,
        |  (ROUND(((CAST(a AS DOUBLE) - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ((CAST(sbb AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * (CAST(a AS DOUBLE) - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
        |      - (CAST(sab AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * (CAST(b AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))
        |    + (CAST(b AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ((CAST(saa AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * (CAST(b AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
        |      - (CAST(sab AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * (CAST(a AS DOUBLE) - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))))
        |    / ((CAST(saa AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * (CAST(sbb AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))
        |      - (CAST(sab AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * (CAST(sab AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))), 4)
        |    > CAST('13.816' AS DOUBLE)) AS outlier
        |FROM daily, mom
        |ORDER BY d2 DESC, day LIMIT 10""".stripMargin,
    "q467_page_trend" ->
      """WITH cells AS MATERIALIZED (
        |  SELECT c_mktsegment AS g,
        |    CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) % 7 AS slot,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |      AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |ranked AS MATERIALIZED (
        |  SELECT g, slot,
        |    2 * CAST(RANK() OVER (PARTITION BY g ORDER BY rev) AS BIGINT)
        |      + CAST(COUNT(*) OVER (PARTITION BY g, rev) AS BIGINT) - 1
        |      AS rank2
        |  FROM cells),
        |perslot AS (SELECT slot, CAST(SUM(rank2) AS BIGINT) AS rs2
        |  FROM ranked GROUP BY 1),
        |sums AS (SELECT COUNT(*) AS n,
        |    CAST(SUM((slot + 1) * rs2) AS BIGINT) AS l2 FROM perslot),
        |m AS (SELECT COUNT(*) AS m FROM (SELECT DISTINCT g FROM ranked) v)
        |SELECT CAST(m AS BIGINT) AS m_blocks, CAST(n AS BIGINT) AS n_slots,
        |  ROUND(CAST(l2 AS DOUBLE) / CAST('2.0' AS DOUBLE), 1) AS l,
        |  ROUND((CAST(l2 AS DOUBLE) / CAST('2.0' AS DOUBLE)
        |    - CAST(m AS DOUBLE) * CAST(n AS DOUBLE)
        |      * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |      * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |      / CAST('4.0' AS DOUBLE))
        |    / SQRT(CAST(m AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        - CAST('1.0' AS DOUBLE))
        |      / CAST('144.0' AS DOUBLE)), 4) AS z,
        |  (ABS(ROUND((CAST(l2 AS DOUBLE) / CAST('2.0' AS DOUBLE)
        |    - CAST(m AS DOUBLE) * CAST(n AS DOUBLE)
        |      * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |      * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |      / CAST('4.0' AS DOUBLE))
        |    / SQRT(CAST(m AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        - CAST('1.0' AS DOUBLE))
        |      / CAST('144.0' AS DOUBLE)), 4)) > CAST('1.96' AS DOUBLE))
        |    AS significant
        |FROM sums, m""".stripMargin,
    "q468_jonckheere" ->
      """WITH o AS (SELECT
        |    CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) // 1000
        |      AS b
        |  FROM orders),
        |gb AS MATERIALIZED (SELECT g, b, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM o GROUP BY 1, 2),
        |filled AS (SELECT gs.g, sp.b, COALESCE(gb.c, 0) AS c0
        |  FROM (SELECT DISTINCT b FROM gb) sp
        |  CROSS JOIN (SELECT DISTINCT g FROM gb) gs
        |  LEFT JOIN gb ON gb.g = gs.g AND gb.b = sp.b),
        |cum AS (SELECT g, b, c0,
        |    COALESCE(SUM(c0) OVER (PARTITION BY g ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cp
        |  FROM filled),
        |red AS (SELECT CAST(SUM(j.c * (2 * i.cp + i.c0)) AS DECIMAL(38,0))
        |    AS j2
        |  FROM cum i JOIN gb j ON i.b = j.b AND i.g < j.g),
        |per AS (SELECT g, CAST(SUM(c) AS BIGINT) AS ng FROM gb GROUP BY 1),
        |tots AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(SUM(ng * ng) AS BIGINT) AS sn2,
        |    CAST(SUM(ng * ng * (2 * ng + 3)) AS DECIMAL(38,0)) AS sn23
        |  FROM per)
        |SELECT n, ROUND(CAST(j2 AS DOUBLE) / CAST('2.0' AS DOUBLE), 1) AS j,
        |  ROUND((CAST(j2 AS DOUBLE) / CAST('2.0' AS DOUBLE)
        |    - (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      - CAST(sn2 AS DOUBLE)) / CAST('4.0' AS DOUBLE))
        |    / SQRT((CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      * (CAST('2.0' AS DOUBLE) * CAST(n AS DOUBLE)
        |        + CAST('3.0' AS DOUBLE))
        |      - CAST(sn23 AS DOUBLE)) / CAST('72.0' AS DOUBLE)), 4) AS z,
        |  (ABS(ROUND((CAST(j2 AS DOUBLE) / CAST('2.0' AS DOUBLE)
        |    - (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      - CAST(sn2 AS DOUBLE)) / CAST('4.0' AS DOUBLE))
        |    / SQRT((CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      * (CAST('2.0' AS DOUBLE) * CAST(n AS DOUBLE)
        |        + CAST('3.0' AS DOUBLE))
        |      - CAST(sn23 AS DOUBLE)) / CAST('72.0' AS DOUBLE)), 4))
        |    > CAST('1.96' AS DOUBLE)) AS significant
        |FROM red, tots""".stripMargin,
    "q470_theil_decomposition" ->
      """WITH base AS MATERIALIZED (SELECT c_mktsegment AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |per AS MATERIALIZED (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(x) AS DECIMAL(38,0)) AS xg FROM base GROUP BY 1),
        |tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(SUM(xg) AS DECIMAL(38,0)) AS xx FROM per),
        |ttotal AS (SELECT MAX(n) AS n,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      CAST(x AS DOUBLE) / CAST(xx AS DOUBLE)
        |      * LN(CAST(x AS DOUBLE) * CAST(n AS DOUBLE)
        |        / CAST(xx AS DOUBLE)), 8) AS DECIMAL(38,8)))
        |      AS DECIMAL(38,8)) AS DOUBLE) AS t_total
        |  FROM base, tot),
        |tg AS (SELECT b.g, MAX(ng) AS ng, MAX(xg) AS xg,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      CAST(x AS DOUBLE) / CAST(xg AS DOUBLE)
        |      * LN(CAST(x AS DOUBLE) * CAST(ng AS DOUBLE)
        |        / CAST(xg AS DOUBLE)), 8) AS DECIMAL(38,8)))
        |      AS DECIMAL(38,8)) AS DOUBLE) AS tg
        |  FROM base b JOIN per p ON b.g = p.g GROUP BY 1),
        |tw AS (SELECT
        |    CAST(CAST(SUM(CAST(ROUND(
        |      CAST(xg AS DOUBLE) / CAST(xx AS DOUBLE) * tg, 8)
        |      AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS DOUBLE) AS t_within,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      CAST(xg AS DOUBLE) / CAST(xx AS DOUBLE)
        |      * LN(CAST(xg AS DOUBLE) / CAST(xx AS DOUBLE)
        |        * (CAST(n AS DOUBLE) / CAST(ng AS DOUBLE))), 8)
        |      AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS DOUBLE) AS t_between
        |  FROM tg, tot)
        |SELECT n,
        |  ROUND(t_total, 6) + CAST('0.0' AS DOUBLE) AS t_total,
        |  ROUND(t_between, 6) + CAST('0.0' AS DOUBLE) AS t_between,
        |  ROUND(t_within, 6) + CAST('0.0' AS DOUBLE) AS t_within,
        |  ROUND(t_total - t_between - t_within, 6)
        |    + CAST('0.0' AS DOUBLE) AS identity_gap
        |FROM ttotal, tw""".stripMargin,
    "q466_t_closeness" ->
      """WITH base AS (SELECT CAST(c_nationkey AS BIGINT) AS nk,
        |    c_mktsegment AS seg,
        |    CAST(FLOOR(CAST(c_acctbal AS DOUBLE)
        |      / CAST('1000.0' AS DOUBLE)) AS BIGINT) AS b
        |  FROM customer),
        |cellcnt AS MATERIALIZED (SELECT nk, seg, b,
        |    CAST(COUNT(*) AS BIGINT) AS cb FROM base GROUP BY 1, 2, 3),
        |classes AS (SELECT nk, seg, CAST(SUM(cb) AS BIGINT) AS nc
        |  FROM cellcnt GROUP BY 1, 2),
        |gl AS MATERIALIZED (SELECT b, CAST(SUM(cb) AS BIGINT) AS nb
        |  FROM cellcnt GROUP BY 1),
        |tot AS (SELECT CAST(SUM(nb) AS BIGINT) AS nn, COUNT(*) AS k
        |  FROM gl),
        |grid AS (SELECT c.nk, c.seg, c.nc, g.b, g.nb,
        |    COALESCE(cc.cb, 0) AS cb
        |  FROM classes c CROSS JOIN gl g
        |  LEFT JOIN cellcnt cc
        |    ON cc.nk = c.nk AND cc.seg = c.seg AND cc.b = g.b),
        |stepped AS (SELECT nk, seg, nc,
        |    SUM(cb * nn - nb * nc) OVER (PARTITION BY nk, seg ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dcum,
        |    nn, k
        |  FROM grid, tot),
        |per AS (SELECT nk, seg, MAX(nc) AS nc, MAX(nn) AS nn, MAX(k) AS k,
        |    CAST(SUM(ABS(dcum)) AS DECIMAL(38,0)) AS sd
        |  FROM stepped GROUP BY 1, 2)
        |SELECT nk AS nationkey, seg AS segment, nc AS class_size,
        |  ROUND(CAST(sd AS DOUBLE)
        |    / ((CAST(k AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |      * CAST(nn AS DOUBLE) * CAST(nc AS DOUBLE)), 6) AS t,
        |  (ROUND(CAST(sd AS DOUBLE)
        |    / ((CAST(k AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |      * CAST(nn AS DOUBLE) * CAST(nc AS DOUBLE)), 6)
        |    > CAST('0.2' AS DOUBLE)) AS violates
        |FROM per
        |ORDER BY t DESC, nationkey, segment
        |LIMIT 10""".stripMargin,
    "q459_sample_entropy" ->
      """WITH grid AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1),
        |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cnt) AS BIGINT) AS s1,
        |    CAST(SUM(cnt * cnt) AS BIGINT) AS s2 FROM grid),
        |tol AS (SELECT n, CAST('0.2' AS DOUBLE)
        |    * SQRT((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |      / (CAST(n AS DOUBLE)
        |        * (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))) AS r
        |  FROM mom),
        |trip AS MATERIALIZED (
        |  SELECT g.x, g.cnt AS v, g1.cnt AS v1, g2.cnt AS v2
        |  FROM grid g JOIN grid g1 ON g1.x = g.x + 1
        |  JOIN grid g2 ON g2.x = g.x + 2),
        |red AS (SELECT MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS np,
        |    CAST(SUM(CASE WHEN ABS(a.v - b.v) <= r
        |      AND ABS(a.v1 - b.v1) <= r THEN 1 ELSE 0 END) AS BIGINT) AS bm,
        |    CAST(SUM(CASE WHEN ABS(a.v - b.v) <= r
        |      AND ABS(a.v1 - b.v1) <= r
        |      AND ABS(a.v2 - b.v2) <= r THEN 1 ELSE 0 END) AS BIGINT) AS am
        |  FROM trip a JOIN trip b ON a.x < b.x, tol)
        |SELECT n AS n_days, np AS n_pairs, bm AS b_matches, am AS a_matches,
        |  ROUND(LN(CAST(bm AS DOUBLE) / CAST(am AS DOUBLE)), 6) AS sampen
        |FROM red""".stripMargin,
    "q460_dagostino_k2" ->
      """WITH m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100
        |      AS BIGINT)) AS BIGINT) AS s1,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |        AS DOUBLE) / CAST('1.0e8' AS DOUBLE)
        |      * (CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |        AS DOUBLE) / CAST('1.0e8' AS DOUBLE)), 10)
        |      AS DECIMAL(38,10))) AS DECIMAL(38,10)) AS DOUBLE) AS s2,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |        AS DOUBLE) / CAST('1.0e8' AS DOUBLE)
        |      * (CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |        AS DOUBLE) / CAST('1.0e8' AS DOUBLE))
        |      * (CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |        AS DOUBLE) / CAST('1.0e8' AS DOUBLE)), 10)
        |      AS DECIMAL(38,10))) AS DECIMAL(38,10)) AS DOUBLE) AS s3,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |        AS DOUBLE) / CAST('1.0e8' AS DOUBLE)
        |      * (CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |        AS DOUBLE) / CAST('1.0e8' AS DOUBLE))
        |      * (CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |        AS DOUBLE) / CAST('1.0e8' AS DOUBLE))
        |      * (CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |        AS DOUBLE) / CAST('1.0e8' AS DOUBLE)), 10)
        |      AS DECIMAL(38,10))) AS DECIMAL(38,10)) AS DOUBLE) AS s4
        |  FROM orders),
        |c1 AS (SELECT n, CAST(n AS DOUBLE) AS nd,
        |    CAST(s1 AS DOUBLE) / CAST('1.0e8' AS DOUBLE) / CAST(n AS DOUBLE)
        |      AS mu, s2, s3, s4 FROM m),
        |c2 AS (SELECT *,
        |    s2 / nd - mu * mu AS m2,
        |    s3 / nd - CAST('3.0' AS DOUBLE) * mu * (s2 / nd)
        |      + CAST('2.0' AS DOUBLE) * mu * mu * mu AS m3,
        |    s4 / nd - CAST('4.0' AS DOUBLE) * mu * (s3 / nd)
        |      + CAST('6.0' AS DOUBLE) * mu * mu * (s2 / nd)
        |      - CAST('3.0' AS DOUBLE) * mu * mu * mu * mu AS m4
        |  FROM c1),
        |c3 AS (SELECT *, m3 / (m2 * SQRT(m2)) AS g1,
        |    m4 / (m2 * m2) AS b2 FROM c2),
        |c4 AS (SELECT *,
        |    g1 * SQRT((nd + CAST('1.0' AS DOUBLE))
        |      * (nd + CAST('3.0' AS DOUBLE))
        |      / (CAST('6.0' AS DOUBLE) * (nd - CAST('2.0' AS DOUBLE)))) AS yy,
        |    CAST('3.0' AS DOUBLE)
        |      * (nd * nd + CAST('27.0' AS DOUBLE) * nd
        |        - CAST('70.0' AS DOUBLE))
        |      * (nd + CAST('1.0' AS DOUBLE)) * (nd + CAST('3.0' AS DOUBLE))
        |      / ((nd - CAST('2.0' AS DOUBLE)) * (nd + CAST('5.0' AS DOUBLE))
        |        * (nd + CAST('7.0' AS DOUBLE)) * (nd + CAST('9.0' AS DOUBLE)))
        |      AS beta2
        |  FROM c3),
        |c5 AS (SELECT *,
        |    SQRT(CAST('2.0' AS DOUBLE) * (beta2 - CAST('1.0' AS DOUBLE)))
        |      - CAST('1.0' AS DOUBLE) AS w2 FROM c4),
        |c6 AS (SELECT *,
        |    CAST('1.0' AS DOUBLE) / SQRT(LN(SQRT(w2))) AS dl,
        |    SQRT(CAST('2.0' AS DOUBLE) / (w2 - CAST('1.0' AS DOUBLE)))
        |      AS alpha FROM c5),
        |c7 AS (SELECT *,
        |    dl * LN(yy / alpha + SQRT(yy / alpha * (yy / alpha)
        |      + CAST('1.0' AS DOUBLE))) AS z1,
        |    CAST('3.0' AS DOUBLE) * (nd - CAST('1.0' AS DOUBLE))
        |      / (nd + CAST('1.0' AS DOUBLE)) AS eb2,
        |    CAST('24.0' AS DOUBLE) * nd * (nd - CAST('2.0' AS DOUBLE))
        |      * (nd - CAST('3.0' AS DOUBLE))
        |      / ((nd + CAST('1.0' AS DOUBLE)) * (nd + CAST('1.0' AS DOUBLE))
        |        * (nd + CAST('3.0' AS DOUBLE)) * (nd + CAST('5.0' AS DOUBLE)))
        |      AS vb2,
        |    CAST('6.0' AS DOUBLE)
        |      * (nd * nd - CAST('5.0' AS DOUBLE) * nd
        |        + CAST('2.0' AS DOUBLE))
        |      / ((nd + CAST('7.0' AS DOUBLE)) * (nd + CAST('9.0' AS DOUBLE)))
        |      * SQRT(CAST('6.0' AS DOUBLE) * (nd + CAST('3.0' AS DOUBLE))
        |        * (nd + CAST('5.0' AS DOUBLE))
        |        / (nd * (nd - CAST('2.0' AS DOUBLE))
        |          * (nd - CAST('3.0' AS DOUBLE)))) AS sb1
        |  FROM c6),
        |c8 AS (SELECT *, (b2 - eb2) / SQRT(vb2) AS xs,
        |    CAST('6.0' AS DOUBLE) + CAST('8.0' AS DOUBLE) / sb1
        |      * (CAST('2.0' AS DOUBLE) / sb1
        |        + SQRT(CAST('1.0' AS DOUBLE)
        |          + CAST('4.0' AS DOUBLE) / (sb1 * sb1))) AS aa
        |  FROM c7),
        |c9 AS (SELECT *,
        |    ((CAST('1.0' AS DOUBLE) - CAST('2.0' AS DOUBLE)
        |        / (CAST('9.0' AS DOUBLE) * aa))
        |      - CBRT((CAST('1.0' AS DOUBLE) - CAST('2.0' AS DOUBLE) / aa)
        |        / (CAST('1.0' AS DOUBLE) + xs
        |          * SQRT(CAST('2.0' AS DOUBLE)
        |            / (aa - CAST('4.0' AS DOUBLE))))))
        |      / SQRT(CAST('2.0' AS DOUBLE) / (CAST('9.0' AS DOUBLE) * aa))
        |      AS z2
        |  FROM c8)
        |SELECT n, ROUND(g1, 6) AS skew, ROUND(b2, 6) AS kurt,
        |  ROUND(z1, 4) AS z_skew, ROUND(z2, 4) AS z_kurt,
        |  ROUND(z1 * z1 + z2 * z2, 4) AS k2,
        |  (ROUND(z1 * z1 + z2 * z2, 4) > CAST('5.991' AS DOUBLE))
        |    AS non_normal
        |FROM c9""".stripMargin,
    "q455_dunns_test" ->
      """WITH ord AS (
        |  SELECT o_orderpriority AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) // 1000
        |      AS b
        |  FROM orders),
        |byb AS MATERIALIZED (SELECT b, COUNT(*) AS t FROM ord GROUP BY 1),
        |ranked AS (
        |  SELECT b, t,
        |    2 * (COALESCE(SUM(t) OVER (ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1)
        |      + t - 1 AS rank2
        |  FROM byb),
        |per AS MATERIALIZED (
        |  SELECT g, CAST(SUM(ng) AS BIGINT) AS ng,
        |    CAST(SUM(ng * rank2) AS DECIMAL(38,0)) AS r2
        |  FROM (SELECT g, b, COUNT(*) AS ng FROM ord GROUP BY 1, 2) gb
        |  JOIN ranked ON gb.b = ranked.b
        |  GROUP BY g),
        |ties AS (SELECT CAST(SUM(t*t*t - t) AS DECIMAL(38,0)) AS tsum FROM byb),
        |tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n FROM per)
        |SELECT a.g AS g1, b.g AS g2, a.ng AS n1, b.ng AS n2,
        |  ROUND((CAST(a.r2 AS DOUBLE)
        |      / (CAST('2.0' AS DOUBLE) * CAST(a.ng AS DOUBLE))
        |    - CAST(b.r2 AS DOUBLE)
        |      / (CAST('2.0' AS DOUBLE) * CAST(b.ng AS DOUBLE)))
        |    / SQRT((CAST(n AS DOUBLE)
        |        * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |        / CAST('12.0' AS DOUBLE)
        |      - CAST(tsum AS DOUBLE)
        |        / (CAST('12.0' AS DOUBLE)
        |          * (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE))))
        |      * (CAST('1.0' AS DOUBLE) / CAST(a.ng AS DOUBLE)
        |        + CAST('1.0' AS DOUBLE) / CAST(b.ng AS DOUBLE))), 6) AS z,
        |  (ABS(ROUND((CAST(a.r2 AS DOUBLE)
        |      / (CAST('2.0' AS DOUBLE) * CAST(a.ng AS DOUBLE))
        |    - CAST(b.r2 AS DOUBLE)
        |      / (CAST('2.0' AS DOUBLE) * CAST(b.ng AS DOUBLE)))
        |    / SQRT((CAST(n AS DOUBLE)
        |        * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |        / CAST('12.0' AS DOUBLE)
        |      - CAST(tsum AS DOUBLE)
        |        / (CAST('12.0' AS DOUBLE)
        |          * (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE))))
        |      * (CAST('1.0' AS DOUBLE) / CAST(a.ng AS DOUBLE)
        |        + CAST('1.0' AS DOUBLE) / CAST(b.ng AS DOUBLE))), 6))
        |    > CAST('2.807' AS DOUBLE)) AS significant
        |FROM per a, per b, tot, ties
        |WHERE a.g < b.g
        |ORDER BY 1, 2""".stripMargin,
    "q456_kendalls_w" ->
      """WITH cells AS MATERIALIZED (
        |  SELECT c_mktsegment AS g,
        |    CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) % 7 AS slot,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |      AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |ranked AS MATERIALIZED (
        |  SELECT g, slot,
        |    2 * CAST(RANK() OVER (PARTITION BY g ORDER BY rev) AS BIGINT)
        |      + CAST(COUNT(*) OVER (PARTITION BY g, rev) AS BIGINT) - 1
        |      AS rank2,
        |    CAST(COUNT(*) OVER (PARTITION BY g, rev) AS BIGINT) AS t
        |  FROM cells),
        |perslot AS (SELECT slot, CAST(SUM(rank2) AS BIGINT) AS rs2
        |  FROM ranked GROUP BY 1),
        |sums AS (SELECT COUNT(*) AS n,
        |    CAST(SUM(rs2 * rs2) AS BIGINT) AS sr2 FROM perslot),
        |tiesper AS (SELECT CAST(SUM(t*t*t - t) AS BIGINT) AS tt
        |  FROM (SELECT g, rank2, MAX(t) AS t FROM ranked GROUP BY 1, 2) u),
        |m AS (SELECT COUNT(*) AS m FROM (SELECT DISTINCT g FROM ranked) v)
        |SELECT CAST(m AS BIGINT) AS m_rankers, CAST(n AS BIGINT) AS n_items,
        |  ROUND((CAST('3.0' AS DOUBLE) * CAST(sr2 AS DOUBLE)
        |    - CAST('3.0' AS DOUBLE) * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
        |      * CAST(n AS DOUBLE)
        |      * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |      * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE)))
        |    / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
        |      * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        - CAST(n AS DOUBLE))
        |      - CAST(m AS DOUBLE) * CAST(tt AS DOUBLE)), 6) AS w,
        |  ROUND(CAST(m AS DOUBLE)
        |    * (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |    * ((CAST('3.0' AS DOUBLE) * CAST(sr2 AS DOUBLE)
        |    - CAST('3.0' AS DOUBLE) * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
        |      * CAST(n AS DOUBLE)
        |      * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |      * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE)))
        |    / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
        |      * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        - CAST(n AS DOUBLE))
        |      - CAST(m AS DOUBLE) * CAST(tt AS DOUBLE))), 4) AS chi2,
        |  (ROUND(CAST(m AS DOUBLE)
        |    * (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |    * ((CAST('3.0' AS DOUBLE) * CAST(sr2 AS DOUBLE)
        |    - CAST('3.0' AS DOUBLE) * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
        |      * CAST(n AS DOUBLE)
        |      * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |      * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE)))
        |    / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
        |      * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        - CAST(n AS DOUBLE))
        |      - CAST(m AS DOUBLE) * CAST(tt AS DOUBLE))), 4)
        |    > CAST('12.592' AS DOUBLE)) AS significant
        |FROM sums, tiesper, m""".stripMargin,
    "q457_variance_ratio" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS cc FROM daily),
        |m5 AS (SELECT
        |    SUM(c) OVER (ORDER BY x
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS m5,
        |    COUNT(*) OVER (ORDER BY x
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS w
        |  FROM daily),
        |b1 AS (SELECT CAST(SUM(CAST(n * c - cc AS DECIMAL(19,0))
        |    * CAST(n * c - cc AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS b
        |  FROM daily, tot),
        |d2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS mw,
        |    CAST(SUM(CAST(n * m5 - 5 * cc AS DECIMAL(19,0))
        |      * CAST(n * m5 - 5 * cc AS DECIMAL(19,0))) AS DECIMAL(38,0))
        |      AS dsq
        |  FROM m5, tot WHERE w = 5)
        |SELECT n AS n_days, mw AS n_windows,
        |  ROUND((CAST(dsq AS DOUBLE)
        |      / (CAST(mw AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |    / (CAST('5.0' AS DOUBLE) * CAST(b AS DOUBLE)
        |      / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE))), 6) AS vr,
        |  ROUND(((CAST(dsq AS DOUBLE)
        |      / (CAST(mw AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |    / (CAST('5.0' AS DOUBLE) * CAST(b AS DOUBLE)
        |      / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |    - CAST('1.0' AS DOUBLE))
        |    / SQRT(CAST('4.8' AS DOUBLE) / CAST(n AS DOUBLE)), 4) AS z,
        |  (ABS(ROUND(((CAST(dsq AS DOUBLE)
        |      / (CAST(mw AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |    / (CAST('5.0' AS DOUBLE) * CAST(b AS DOUBLE)
        |      / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |    - CAST('1.0' AS DOUBLE))
        |    / SQRT(CAST('4.8' AS DOUBLE) / CAST(n AS DOUBLE)), 4))
        |    > CAST('1.96' AS DOUBLE)) AS significant
        |FROM tot, b1, d2""".stripMargin,
    "q458_kpss" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS cc FROM daily),
        |g2 AS MATERIALIZED (SELECT x, n * c - cc AS e, n FROM daily, tot),
        |ared AS (SELECT
        |    CAST(CAST(SUM(CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS DOUBLE) AS a,
        |    MAX(n) AS n
        |  FROM (SELECT n, SUM(e) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |    FROM g2) p),
        |bred AS (SELECT CAST(SUM(CAST(e AS DECIMAL(19,0))
        |    * CAST(e AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS b FROM g2),
        |gj AS (SELECT lag,
        |    CAST(SUM(CAST(e1 AS DECIMAL(19,0)) * CAST(e2 AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS g
        |  FROM (SELECT l.lag, a.e AS e1, b.e AS e2
        |    FROM g2 a
        |    CROSS JOIN (SELECT UNNEST([1, 2, 3, 4]) AS lag) l
        |    JOIN g2 b ON b.x = a.x + l.lag) p
        |  GROUP BY 1),
        |gsum AS (SELECT
        |    CAST(CAST(SUM(CAST(5 - lag AS DECIMAL(2,0)) * g)
        |      AS DECIMAL(38,0)) AS DOUBLE) AS wg5
        |  FROM gj)
        |SELECT n AS n_days,
        |  ROUND(a / (CAST(n AS DOUBLE)
        |    * (CAST(b AS DOUBLE) + CAST('0.4' AS DOUBLE) * wg5)), 6) AS eta,
        |  (ROUND(a / (CAST(n AS DOUBLE)
        |    * (CAST(b AS DOUBLE) + CAST('0.4' AS DOUBLE) * wg5)), 6)
        |    <= CAST('0.463' AS DOUBLE)) AS level_stationary
        |FROM ared, bred, gsum""".stripMargin,
    "q449_mantel_haenszel" ->
      """WITH o AS (SELECT o_orderpriority AS g,
        |    (o_totalprice >= CAST('150000.0' AS DOUBLE)) AS e,
        |    (o_orderstatus = 'F') AS y FROM orders),
        |per AS (SELECT g,
        |    CAST(SUM(CASE WHEN e AND y THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN e AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(SUM(CASE WHEN NOT e AND y THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN NOT e AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS dd
        |  FROM o GROUP BY 1),
        |m AS (SELECT COUNT(*) AS k, CAST(SUM(a + b + c + dd) AS BIGINT) AS n,
        |    CAST(SUM(a) AS BIGINT) AS suma,
        |    CAST(CAST(SUM(CAST(ROUND(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
        |      / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE) + CAST(c AS DOUBLE)
        |        + CAST(dd AS DOUBLE)), 6) AS DECIMAL(38,6)))
        |      AS DECIMAL(38,6)) AS DOUBLE) AS sr,
        |    CAST(CAST(SUM(CAST(ROUND(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
        |      / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE) + CAST(c AS DOUBLE)
        |        + CAST(dd AS DOUBLE)), 6) AS DECIMAL(38,6)))
        |      AS DECIMAL(38,6)) AS DOUBLE) AS ss,
        |    CAST(CAST(SUM(CAST(ROUND((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
        |      * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE))
        |      / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE) + CAST(c AS DOUBLE)
        |        + CAST(dd AS DOUBLE)), 6) AS DECIMAL(38,6)))
        |      AS DECIMAL(38,6)) AS DOUBLE) AS se,
        |    CAST(CAST(SUM(CAST(ROUND((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
        |      * (CAST(c AS DOUBLE) + CAST(dd AS DOUBLE))
        |      * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE))
        |      * (CAST(b AS DOUBLE) + CAST(dd AS DOUBLE))
        |      / ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE) + CAST(c AS DOUBLE)
        |          + CAST(dd AS DOUBLE))
        |        * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE) + CAST(c AS DOUBLE)
        |          + CAST(dd AS DOUBLE))
        |        * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE) + CAST(c AS DOUBLE)
        |          + CAST(dd AS DOUBLE) - CAST('1.0' AS DOUBLE))), 6)
        |      AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sv
        |  FROM per)
        |SELECT CAST(k AS BIGINT) AS k_strata, n, suma AS exposed_cases,
        |  ROUND(sr / ss, 4) AS or_mh,
        |  ROUND((CAST(suma AS DOUBLE) - se) * (CAST(suma AS DOUBLE) - se) / sv,
        |    4) AS chi2_mh,
        |  (ROUND((CAST(suma AS DOUBLE) - se) * (CAST(suma AS DOUBLE) - se) / sv,
        |    4) > CAST('3.841' AS DOUBLE)) AS significant
        |FROM m""".stripMargin,
    "q450_mood_median" ->
      """WITH cents AS MATERIALIZED (SELECT c_mktsegment AS g,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 100 AS BIGINT) AS c
        |  FROM customer),
        |byc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS t FROM cents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n FROM byc),
        |med AS MATERIALIZED (SELECT MIN(c) AS med FROM (
        |    SELECT c, SUM(t) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM byc) s, tot
        |  WHERE cum >= (n + 1) // 2),
        |seg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(CASE WHEN c > med THEN 1 ELSE 0 END) AS BIGINT) AS ag
        |  FROM cents, med GROUP BY 1),
        |totals AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(SUM(ag) AS BIGINT) AS aa, COUNT(*) AS k FROM seg),
        |agg AS (SELECT MAX(n) AS n, MAX(k) AS k,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      (CAST(ag AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(aa AS DOUBLE)
        |        / CAST(n AS DOUBLE))
        |      * (CAST(ag AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(aa AS DOUBLE)
        |        / CAST(n AS DOUBLE))
        |      / (CAST(ng AS DOUBLE) * CAST(aa AS DOUBLE) / CAST(n AS DOUBLE))
        |      + ((CAST(ng AS DOUBLE) - CAST(ag AS DOUBLE))
        |        - CAST(ng AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(aa AS DOUBLE))
        |          / CAST(n AS DOUBLE))
        |      * ((CAST(ng AS DOUBLE) - CAST(ag AS DOUBLE))
        |        - CAST(ng AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(aa AS DOUBLE))
        |          / CAST(n AS DOUBLE))
        |      / (CAST(ng AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(aa AS DOUBLE))
        |        / CAST(n AS DOUBLE)), 6) AS DECIMAL(38,6)))
        |      AS DECIMAL(38,6)) AS DOUBLE) AS chi2
        |  FROM seg, totals)
        |SELECT n, CAST(k AS BIGINT) AS k_segments,
        |  ROUND(CAST(med AS DOUBLE) / CAST('100.0' AS DOUBLE), 2)
        |    AS median_acctbal,
        |  ROUND(chi2, 6) AS chi2,
        |  (ROUND(chi2, 6) > CAST('9.488' AS DOUBLE)) AS significant
        |FROM agg, med""".stripMargin,
    "q451_cochran_armitage" ->
      """WITH ev AS (SELECT
        |    CAST(hour(date_trunc('second', ts)) AS BIGINT) // 6 AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS a,
        |    CAST(SUM(s * y) AS BIGINT) AS sa, CAST(SUM(s) AS BIGINT) AS sn1,
        |    CAST(SUM(s * s) AS BIGINT) AS sn2 FROM ev)
        |SELECT n, a AS purchases,
        |  ROUND((CAST(sa AS DOUBLE)
        |      - CAST(a AS DOUBLE) / CAST(n AS DOUBLE) * CAST(sn1 AS DOUBLE))
        |    / SQRT(CAST(a AS DOUBLE) / CAST(n AS DOUBLE)
        |      * (CAST('1.0' AS DOUBLE) - CAST(a AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(sn2 AS DOUBLE) - CAST(sn1 AS DOUBLE) * CAST(sn1 AS DOUBLE)
        |        / CAST(n AS DOUBLE))), 6) AS z,
        |  (ABS(ROUND((CAST(sa AS DOUBLE)
        |      - CAST(a AS DOUBLE) / CAST(n AS DOUBLE) * CAST(sn1 AS DOUBLE))
        |    / SQRT(CAST(a AS DOUBLE) / CAST(n AS DOUBLE)
        |      * (CAST('1.0' AS DOUBLE) - CAST(a AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(sn2 AS DOUBLE) - CAST(sn1 AS DOUBLE) * CAST(sn1 AS DOUBLE)
        |        / CAST(n AS DOUBLE))), 6)) > CAST('1.96' AS DOUBLE))
        |    AS significant
        |FROM m""".stripMargin,
    "q452_energy_distance" ->
      """WITH ev AS (
        |  SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) AS c
        |  FROM events),
        |m AS (SELECT (MIN(t) + MAX(t)) // 2 AS mid FROM ev),
        |byc AS (
        |  SELECT c,
        |    CAST(SUM(CASE WHEN t < mid THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN t >= mid THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM ev, m GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |               CAST(SUM(c2) AS BIGINT) AS n2 FROM byc),
        |steps AS (
        |  SELECT c,
        |    SUM(c1) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
        |    SUM(c2) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2,
        |    LEAD(c) OVER (ORDER BY c) - c AS gap
        |  FROM byc),
        |red AS (
        |  SELECT MAX(n1) AS na, MAX(n2) AS nb,
        |    CAST(SUM((f1 * (n2 - f2) + f2 * (n1 - f1)) * gap)
        |      AS DECIMAL(38,0)) AS across,
        |    CAST(SUM(2 * f1 * (n1 - f1) * gap) AS DECIMAL(38,0)) AS within1,
        |    CAST(SUM(2 * f2 * (n2 - f2) * gap) AS DECIMAL(38,0)) AS within2
        |  FROM steps, tot WHERE gap IS NOT NULL)
        |SELECT na AS n_first, nb AS n_second,
        |  CAST(across AS VARCHAR) AS across_scaled,
        |  CAST(within1 AS VARCHAR) AS within1_scaled,
        |  CAST(within2 AS VARCHAR) AS within2_scaled,
        |  ROUND((CAST('2.0' AS DOUBLE) * CAST(across AS DOUBLE)
        |      / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
        |    - CAST(within1 AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE))
        |    - CAST(within2 AS DOUBLE) / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)))
        |    / CAST('100.0' AS DOUBLE), 6) AS energy_distance
        |FROM red""".stripMargin,
    "q453_cramer_von_mises" ->
      """WITH o AS (SELECT (o_orderpriority = '1-URGENT') AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) // 1000
        |      AS b
        |  FROM orders),
        |byb AS (SELECT b,
        |    CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN NOT g THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM o GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |               CAST(SUM(c2) AS BIGINT) AS n2 FROM byb),
        |steps AS (SELECT c1, c2,
        |    SUM(c1) OVER (ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
        |    SUM(c2) OVER (ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2
        |  FROM byb),
        |red AS (SELECT MAX(n1) AS n1, MAX(n2) AS n2,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      CAST(f1 * n2 - f2 * n1 AS DOUBLE)
        |        / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
        |      * (CAST(f1 * n2 - f2 * n1 AS DOUBLE)
        |        / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
        |      * CAST(c1 + c2 AS DOUBLE), 8) AS DECIMAL(38,8)))
        |      AS DECIMAL(38,8)) AS DOUBLE) AS srq
        |  FROM steps, tot)
        |SELECT n1 AS n_urgent, n2 AS n_rest,
        |  ROUND(srq * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |    / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |      * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))), 6) AS t,
        |  (ROUND(srq * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |    / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |      * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))), 6)
        |    > CAST('0.461' AS DOUBLE)) AS significant
        |FROM red""".stripMargin,
    "q454_nominal_association" ->
      """WITH cells AS MATERIALIZED (SELECT event_type AS x,
        |    CAST(hour(date_trunc('second', ts)) AS BIGINT) // 6 AS yb,
        |    CAST(COUNT(*) AS BIGINT) AS nxy
        |  FROM events GROUP BY 1, 2),
        |xm AS MATERIALIZED (SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx,
        |    CAST(MAX(nxy) AS BIGINT) AS mx FROM cells GROUP BY 1),
        |ym AS MATERIALIZED (SELECT yb, CAST(SUM(nxy) AS BIGINT) AS ny,
        |    CAST(MAX(nxy) AS BIGINT) AS my FROM cells GROUP BY 1),
        |tots AS (SELECT CAST(SUM(nx) AS BIGINT) AS n,
        |    CAST(SUM(mx) AS BIGINT) AS smx,
        |    CAST(MAX(nx) AS BIGINT) AS maxnx FROM xm),
        |toty AS (SELECT CAST(SUM(my) AS BIGINT) AS smy,
        |    CAST(MAX(ny) AS BIGINT) AS maxny FROM ym),
        |hy AS (SELECT CAST(CAST(SUM(CAST(ROUND(
        |    CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)
        |    * LN(CAST(n AS DOUBLE) / CAST(ny AS DOUBLE)), 6) AS DECIMAL(38,6)))
        |    AS DECIMAL(38,6)) AS DOUBLE) AS hy FROM ym, tots),
        |hx AS (SELECT CAST(CAST(SUM(CAST(ROUND(
        |    CAST(nx AS DOUBLE) / CAST(n AS DOUBLE)
        |    * LN(CAST(n AS DOUBLE) / CAST(nx AS DOUBLE)), 6) AS DECIMAL(38,6)))
        |    AS DECIMAL(38,6)) AS DOUBLE) AS hx FROM xm, tots),
        |hyx AS (SELECT CAST(CAST(SUM(CAST(ROUND(
        |    CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)
        |    * LN(CAST(nx AS DOUBLE) / CAST(nxy AS DOUBLE)), 6) AS DECIMAL(38,6)))
        |    AS DECIMAL(38,6)) AS DOUBLE) AS hyx
        |  FROM cells JOIN xm USING (x), tots),
        |hxy AS (SELECT CAST(CAST(SUM(CAST(ROUND(
        |    CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)
        |    * LN(CAST(ny AS DOUBLE) / CAST(nxy AS DOUBLE)), 6) AS DECIMAL(38,6)))
        |    AS DECIMAL(38,6)) AS DOUBLE) AS hxy
        |  FROM cells JOIN ym USING (yb), tots)
        |SELECT n,
        |  ROUND(CAST(smx - maxny AS DOUBLE) / CAST(n - maxny AS DOUBLE), 6)
        |    AS lambda_y_x,
        |  ROUND(CAST(smy - maxnx AS DOUBLE) / CAST(n - maxnx AS DOUBLE), 6)
        |    AS lambda_x_y,
        |  ROUND((hy - hyx) / hy, 6) AS theil_u_y_x,
        |  ROUND((hx - hxy) / hx, 6) AS theil_u_x_y
        |FROM tots, toty, hy, hx, hyx, hxy""".stripMargin,
    "q447_power_analysis" ->
      """WITH m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np
        |  FROM events)
        |SELECT n,
        |  ROUND(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p1,
        |  ROUND(CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |    * CAST('1.1' AS DOUBLE), 6) AS p2,
        |  CAST(CEIL(
        |    (CAST('1.959963984540054' AS DOUBLE)
        |      * SQRT(CAST('2.0' AS DOUBLE)
        |        * ((CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |          + CAST(np AS DOUBLE) / CAST(n AS DOUBLE) * CAST('1.1' AS DOUBLE))
        |          / CAST('2.0' AS DOUBLE))
        |        * (CAST('1.0' AS DOUBLE)
        |          - (CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |            + CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |              * CAST('1.1' AS DOUBLE)) / CAST('2.0' AS DOUBLE)))
        |     + CAST('0.8416212335729143' AS DOUBLE)
        |      * SQRT(CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST('1.0' AS DOUBLE) - CAST(np AS DOUBLE) / CAST(n AS DOUBLE))
        |        + CAST(np AS DOUBLE) / CAST(n AS DOUBLE) * CAST('1.1' AS DOUBLE)
        |          * (CAST('1.0' AS DOUBLE) - CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |            * CAST('1.1' AS DOUBLE))))
        |    * (CAST('1.959963984540054' AS DOUBLE)
        |      * SQRT(CAST('2.0' AS DOUBLE)
        |        * ((CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |          + CAST(np AS DOUBLE) / CAST(n AS DOUBLE) * CAST('1.1' AS DOUBLE))
        |          / CAST('2.0' AS DOUBLE))
        |        * (CAST('1.0' AS DOUBLE)
        |          - (CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |            + CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |              * CAST('1.1' AS DOUBLE)) / CAST('2.0' AS DOUBLE)))
        |     + CAST('0.8416212335729143' AS DOUBLE)
        |      * SQRT(CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |          * (CAST('1.0' AS DOUBLE) - CAST(np AS DOUBLE) / CAST(n AS DOUBLE))
        |        + CAST(np AS DOUBLE) / CAST(n AS DOUBLE) * CAST('1.1' AS DOUBLE)
        |          * (CAST('1.0' AS DOUBLE) - CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |            * CAST('1.1' AS DOUBLE))))
        |    / ((CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(np AS DOUBLE) / CAST(n AS DOUBLE) * CAST('1.1' AS DOUBLE))
        |      * (CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(np AS DOUBLE) / CAST(n AS DOUBLE) * CAST('1.1' AS DOUBLE)))
        |  ) AS BIGINT) AS n_per_arm
        |FROM m""".stripMargin,
    "q448_odds_ratio" ->
      """WITH ev AS (SELECT
        |    CASE WHEN hour(date_trunc('second', ts)) >= 12 THEN 1 ELSE 0 END AS e,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |m AS (SELECT
        |    CAST(SUM(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(SUM(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd
        |  FROM ev)
        |SELECT a, b, c, dd AS d,
        |  ROUND(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
        |    / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)), 4) AS odds_ratio,
        |  ROUND(EXP(LN(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
        |      / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
        |    - CAST('1.96' AS DOUBLE) * SQRT(CAST('1.0' AS DOUBLE) / CAST(a AS DOUBLE)
        |      + CAST('1.0' AS DOUBLE) / CAST(b AS DOUBLE)
        |      + CAST('1.0' AS DOUBLE) / CAST(c AS DOUBLE)
        |      + CAST('1.0' AS DOUBLE) / CAST(dd AS DOUBLE))), 4) AS ci_lo,
        |  ROUND(EXP(LN(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
        |      / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
        |    + CAST('1.96' AS DOUBLE) * SQRT(CAST('1.0' AS DOUBLE) / CAST(a AS DOUBLE)
        |      + CAST('1.0' AS DOUBLE) / CAST(b AS DOUBLE)
        |      + CAST('1.0' AS DOUBLE) / CAST(c AS DOUBLE)
        |      + CAST('1.0' AS DOUBLE) / CAST(dd AS DOUBLE))), 4) AS ci_hi
        |FROM m""".stripMargin,
    "q442_difference_sign" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
        |  FROM orders GROUP BY 1),
        |p AS (SELECT a.r AS r1, b.r AS r2
        |  FROM daily a JOIN daily b ON b.x = a.x + 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_diffs,
        |    CAST(SUM(CASE WHEN r2 > r1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up
        |  FROM p)
        |SELECT n_diffs, n_up,
        |  ROUND((CAST(n_up AS DOUBLE) - CAST(n_diffs AS DOUBLE) / CAST('2.0' AS DOUBLE))
        |    / SQRT((CAST(n_diffs AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |      / CAST('12.0' AS DOUBLE)), 4) AS z
        |FROM m""".stripMargin,
    "q443_turning_points" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
        |  FROM orders GROUP BY 1),
        |t AS MATERIALIZED (SELECT r,
        |    CAST(ROW_NUMBER() OVER (ORDER BY x) AS BIGINT) AS t FROM daily),
        |tri AS (SELECT a.r AS y1, b.r AS y2, c.r AS y3
        |  FROM t a JOIN t b ON b.t = a.t + 1 JOIN t c ON c.t = a.t + 2),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triples,
        |    CAST(SUM(CASE WHEN (y2 > y1 AND y2 > y3) OR (y2 < y1 AND y2 < y3)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS t_count
        |  FROM tri)
        |SELECT n_triples, t_count,
        |  ROUND((CAST(t_count AS DOUBLE)
        |    - CAST('2.0' AS DOUBLE) * (CAST(n_triples + 2 AS DOUBLE)
        |      - CAST('2.0' AS DOUBLE)) / CAST('3.0' AS DOUBLE))
        |    / SQRT((CAST('16.0' AS DOUBLE) * CAST(n_triples + 2 AS DOUBLE)
        |      - CAST('29.0' AS DOUBLE)) / CAST('90.0' AS DOUBLE)), 4) AS z
        |FROM m""".stripMargin,
    "q444_weibull_fit" ->
      """WITH dur AS (SELECT dd, CAST(COUNT(*) AS BIGINT) AS m FROM (
        |    SELECT CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
        |      CAST(l.l_shipdate AS DATE)) AS BIGINT) AS dd
        |    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
        |  WHERE dd >= 1 GROUP BY 1),
        |tot AS (SELECT CAST(SUM(m) AS BIGINT) AS n FROM dur),
        |wf AS (SELECT dd, m, n,
        |    ((CAST(CAST(SUM(m) OVER (ORDER BY dd
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - m
        |        AS DOUBLE)
        |      + CAST(m + 1 AS DOUBLE) / CAST('2.0' AS DOUBLE)
        |      - CAST('0.3' AS DOUBLE))
        |     / (CAST(n AS DOUBLE) + CAST('0.4' AS DOUBLE))) AS f
        |  FROM dur CROSS JOIN tot),
        |pts AS (SELECT m, n, ROUND(LN(CAST(dd AS DOUBLE)), 10) AS lx,
        |    ROUND(LN(-LN(CAST('1.0' AS DOUBLE) - f)), 10) AS ly
        |  FROM wf),
        |mom AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
        |    CAST(SUM(m) AS DOUBLE) AS sw,
        |    CAST(SUM(CAST(ROUND(CAST(m AS DOUBLE) * lx, 10) AS DECIMAL(30,12)))
        |      AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(ROUND(CAST(m AS DOUBLE) * ly, 10) AS DECIMAL(30,12)))
        |      AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(ROUND(CAST(m AS DOUBLE) * lx * lx, 10)
        |      AS DECIMAL(30,12))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(ROUND(CAST(m AS DOUBLE) * lx * ly, 10)
        |      AS DECIMAL(30,12))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(ROUND(CAST(m AS DOUBLE) * ly * ly, 10)
        |      AS DECIMAL(30,12))) AS DOUBLE) AS syy
        |  FROM pts),
        |f2 AS (SELECT n,
        |    (sw * sxy - sx * sy) / (sw * sxx - sx * sx) AS shape, sw, sx, sy,
        |    (sw * sxy - sx * sy) * (sw * sxy - sx * sy)
        |      / ((sw * sxx - sx * sx) * (sw * syy - sy * sy)) AS r2
        |  FROM mom)
        |SELECT n, ROUND(shape, 4) AS shape,
        |  ROUND(EXP(-((sy - shape * sx) / sw) / shape), 4) AS scale_days,
        |  ROUND(r2, 4) AS r2
        |FROM f2""".stripMargin,
    "q445_vif" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(v) AS BIGINT) AS sv,
        |    CAST(SUM(b) AS BIGINT) AS sb, CAST(SUM(a * a) AS BIGINT) AS saa,
        |    CAST(SUM(v * v) AS BIGINT) AS svv, CAST(SUM(b * b) AS BIGINT) AS sbb,
        |    CAST(SUM(a * v) AS BIGINT) AS sav, CAST(SUM(a * b) AS BIGINT) AS sab,
        |    CAST(SUM(v * b) AS BIGINT) AS svb
        |  FROM daily),
        |rr AS (SELECT n,
        |    (CAST(n AS DOUBLE) * CAST(sav AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sv AS DOUBLE))
        |      / SQRT((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
        |        - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
        |          - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))) AS rav,
        |    (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |      / SQRT((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
        |        - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
        |          - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))) AS rab,
        |    (CAST(n AS DOUBLE) * CAST(svb AS DOUBLE)
        |      - CAST(sv AS DOUBLE) * CAST(sb AS DOUBLE))
        |      / SQRT((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
        |        - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
        |          - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))) AS rvb
        |  FROM m)
        |SELECT n,
        |  ROUND(CAST('1.0' AS DOUBLE) / (CAST('1.0' AS DOUBLE)
        |    - (rav * rav + rab * rab
        |      - CAST('2.0' AS DOUBLE) * rav * rab * rvb)
        |      / (CAST('1.0' AS DOUBLE) - rvb * rvb)), 4) AS vif_click,
        |  ROUND(CAST('1.0' AS DOUBLE) / (CAST('1.0' AS DOUBLE)
        |    - (rav * rav + rvb * rvb
        |      - CAST('2.0' AS DOUBLE) * rav * rvb * rab)
        |      / (CAST('1.0' AS DOUBLE) - rab * rab)), 4) AS vif_view,
        |  ROUND(CAST('1.0' AS DOUBLE) / (CAST('1.0' AS DOUBLE)
        |    - (rab * rab + rvb * rvb
        |      - CAST('2.0' AS DOUBLE) * rab * rvb * rav)
        |      / (CAST('1.0' AS DOUBLE) - rav * rav)), 4) AS vif_purchase
        |FROM rr""".stripMargin,
    "q436_ordinal_association" ->
      """WITH cells AS MATERIALIZED (
        |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS xo,
        |    LEAST(3, CAST(FLOOR(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
        |      / CAST('75000.0' AS DOUBLE)) AS BIGINT)) AS yo,
        |    CAST(COUNT(*) AS BIGINT) AS m
        |  FROM orders GROUP BY 1, 2),
        |p AS (SELECT a.xo AS x1, a.yo AS y1, a.m AS m1,
        |    b.xo AS x2, b.yo AS y2, b.m AS m2
        |  FROM cells a CROSS JOIN cells b),
        |agg AS (SELECT
        |    CAST(SUM(CASE WHEN x2 > x1 AND y2 > y1 THEN m1 * m2 ELSE 0 END)
        |      AS BIGINT) AS c2,
        |    CAST(SUM(CASE WHEN x2 > x1 AND y2 < y1 THEN m1 * m2 ELSE 0 END)
        |      AS BIGINT) AS d2,
        |    CAST(SUM(CASE WHEN x2 > x1 AND y2 = y1 THEN m1 * m2 ELSE 0 END)
        |      AS BIGINT) AS ty2
        |  FROM p),
        |tot AS (SELECT CAST(SUM(m) AS BIGINT) AS n FROM cells)
        |SELECT n,
        |  ROUND((CAST(c2 AS DOUBLE) - CAST(d2 AS DOUBLE))
        |    / (CAST(c2 AS DOUBLE) + CAST(d2 AS DOUBLE)), 6) AS gamma,
        |  ROUND((CAST(c2 AS DOUBLE) - CAST(d2 AS DOUBLE))
        |    / (CAST(c2 AS DOUBLE) + CAST(d2 AS DOUBLE) + CAST(ty2 AS DOUBLE)), 6)
        |    AS somers_d,
        |  ROUND(CAST('2.0' AS DOUBLE) * CAST('4.0' AS DOUBLE)
        |    * (CAST(c2 AS DOUBLE) - CAST(d2 AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST('3.0' AS DOUBLE)), 6)
        |    AS tau_c
        |FROM agg CROSS JOIN tot""".stripMargin,
    "q438_poisson_dispersion" ->
      """WITH daily AS (SELECT CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS x, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cnt) AS BIGINT) AS sc,
        |    CAST(SUM(cnt * cnt) AS BIGINT) AS scc FROM daily)
        |SELECT n,
        |  ROUND(((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |    / (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS vmr,
        |  ROUND((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)), 4)
        |    AS chi2
        |FROM m""".stripMargin,
    "q439_rolling_beta" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM events GROUP BY 1),
        |t AS (SELECT x, a, b, CAST(ROW_NUMBER() OVER (ORDER BY x) AS BIGINT) AS t
        |  FROM daily),
        |wm AS (SELECT x,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS n8,
        |    CAST(SUM(a) OVER w AS BIGINT) AS sa, CAST(SUM(b) OVER w AS BIGINT) AS sb,
        |    CAST(SUM(a * a) OVER w AS BIGINT) AS saa,
        |    CAST(SUM(a * b) OVER w AS BIGINT) AS sab
        |  FROM t WINDOW w AS (ORDER BY t ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
        |SELECT x,
        |  ROUND((CAST(n8 AS DOUBLE) * CAST(sab AS DOUBLE)
        |    - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |    / (CAST(n8 AS DOUBLE) * CAST(saa AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)), 6) AS beta
        |FROM wm WHERE n8 = 8 ORDER BY x""".stripMargin,
    "q428_partial_correlation" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(v) AS BIGINT) AS sv,
        |    CAST(SUM(b) AS BIGINT) AS sb, CAST(SUM(a * a) AS BIGINT) AS saa,
        |    CAST(SUM(v * v) AS BIGINT) AS svv, CAST(SUM(b * b) AS BIGINT) AS sbb,
        |    CAST(SUM(a * v) AS BIGINT) AS sav, CAST(SUM(a * b) AS BIGINT) AS sab,
        |    CAST(SUM(v * b) AS BIGINT) AS svb
        |  FROM daily),
        |rr AS (SELECT n,
        |    (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |      / SQRT((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
        |        - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
        |          - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))) AS rab,
        |    (CAST(n AS DOUBLE) * CAST(sav AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sv AS DOUBLE))
        |      / SQRT((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
        |        - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
        |          - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))) AS rav,
        |    (CAST(n AS DOUBLE) * CAST(svb AS DOUBLE)
        |      - CAST(sv AS DOUBLE) * CAST(sb AS DOUBLE))
        |      / SQRT((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
        |        - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
        |          - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))) AS rbv
        |  FROM m)
        |SELECT n, ROUND(rab, 6) AS r_ab, ROUND(rav, 6) AS r_av,
        |  ROUND(rbv, 6) AS r_bv,
        |  ROUND((rab - rav * rbv) / SQRT((CAST('1.0' AS DOUBLE) - rav * rav)
        |    * (CAST('1.0' AS DOUBLE) - rbv * rbv)), 6) AS r_ab_given_v
        |FROM rr""".stripMargin,
    "q429_engle_granger" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM events GROUP BY 1),
        |lev AS MATERIALIZED (SELECT x,
        |    CAST(SUM(a) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cx,
        |    CAST(SUM(b) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cy
        |  FROM daily),
        |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cx) AS BIGINT) AS sx,
        |    CAST(SUM(cy) AS BIGINT) AS sy, CAST(SUM(cx * cx) AS BIGINT) AS sxx,
        |    CAST(SUM(cx * cy) AS BIGINT) AS sxy FROM lev),
        |bb AS (SELECT n, sx, sy,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS bt
        |  FROM mom),
        |z AS MATERIALIZED (SELECT x, n, bt,
        |    CAST(cy AS DOUBLE) - (CAST(sy AS DOUBLE) - bt * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) - bt * CAST(cx AS DOUBLE) AS z
        |  FROM lev CROSS JOIN bb),
        |p AS (SELECT z1.n, z1.bt, z1.z AS z1, z2.z AS z2
        |  FROM z z1 JOIN z z2 ON z2.x = z1.x + 1),
        |df AS (SELECT CAST(MAX(n) AS BIGINT) AS n, MAX(bt) AS bt,
        |    CAST(COUNT(*) AS BIGINT) AS np,
        |    CAST(SUM(CAST(ROUND(z1 * (z2 - z1), 4) AS DECIMAL(38,4))) AS DOUBLE) AS szd,
        |    CAST(SUM(CAST(ROUND(z1 * z1, 4) AS DECIMAL(38,4))) AS DOUBLE) AS szz,
        |    CAST(SUM(CAST(ROUND((z2 - z1) * (z2 - z1), 4) AS DECIMAL(38,4)))
        |      AS DOUBLE) AS sdd
        |  FROM p)
        |SELECT n, ROUND(bt, 6) AS beta, ROUND(szd / szz, 6) AS phi,
        |  ROUND((szd / szz) / SQRT(((sdd - (szd / szz) * (szd / szz) * szz
        |    - CAST('2.0' AS DOUBLE) * (szd / szz) * (szd - (szd / szz) * szz))
        |    / (CAST(np AS DOUBLE) - CAST('1.0' AS DOUBLE))) / szz), 4) AS df_stat
        |FROM df""".stripMargin,
    "q432_inequality" ->
      """WITH base AS MATERIALIZED (SELECT o_orderpriority AS prio,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS xd FROM orders),
        |g AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(ROUND(xd, 2) AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(ROUND(LN(xd), 8) AS DECIMAL(28,8))) AS DOUBLE) AS slog
        |  FROM base GROUP BY 1),
        |wm AS (SELECT b.prio, g.n, g.sx / CAST(g.n AS DOUBLE) AS mu, g.slog, b.xd
        |  FROM base b JOIN g USING (prio)),
        |t AS (SELECT prio, n, mu, slog,
        |    CAST(SUM(CAST(ROUND((xd / mu) * LN(xd / mu), 8) AS DECIMAL(28,8)))
        |      AS DOUBLE) AS st
        |  FROM wm GROUP BY 1, 2, 3, 4)
        |SELECT prio, n, ROUND(st / CAST(n AS DOUBLE), 6) AS theil_t,
        |  ROUND(CAST('1.0' AS DOUBLE) - EXP(slog / CAST(n AS DOUBLE)) / mu, 6)
        |    AS atkinson_1
        |FROM t ORDER BY prio""".stripMargin,
    "q433_bartlett" ->
      """WITH g AS (SELECT o_orderpriority AS prio, CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,4))
        |      * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        |  FROM orders GROUP BY 1),
        |t AS (SELECT ng,
        |    CAST(ROUND((CAST(ng AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |      * LN((sxx - sx * sx / CAST(ng AS DOUBLE))
        |        / (CAST(ng AS DOUBLE) - CAST('1.0' AS DOUBLE))), 8)
        |      AS DECIMAL(28,8)) AS lt,
        |    CAST(ROUND((CAST(ng AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |      * ((sxx - sx * sx / CAST(ng AS DOUBLE))
        |        / (CAST(ng AS DOUBLE) - CAST('1.0' AS DOUBLE))), 4)
        |      AS DECIMAL(38,4)) AS wv,
        |    CAST(ROUND(CAST('1.0' AS DOUBLE)
        |      / (CAST(ng AS DOUBLE) - CAST('1.0' AS DOUBLE)), 12)
        |      AS DECIMAL(28,12)) AS inv
        |  FROM g),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(SUM(lt) AS DOUBLE) AS slt, CAST(SUM(wv) AS DOUBLE) AS swv,
        |    CAST(SUM(inv) AS DOUBLE) AS sinv FROM t)
        |SELECT k, n,
        |  ROUND(((CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
        |      * LN(swv / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) - slt)
        |    / (CAST('1.0' AS DOUBLE)
        |      + (sinv - CAST('1.0' AS DOUBLE)
        |          / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
        |        / (CAST('3.0' AS DOUBLE)
        |          * (CAST(k AS DOUBLE) - CAST('1.0' AS DOUBLE)))), 4)
        |    AS chi2_bartlett
        |FROM m""".stripMargin,
    "q420_friedman" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS x, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |days AS (SELECT DISTINCT x FROM daily),
        |types AS (SELECT DISTINCT event_type FROM daily),
        |grid AS (SELECT days.x, types.event_type, COALESCE(d.c, 0) AS c
        |  FROM days CROSS JOIN types
        |  LEFT JOIN daily d ON d.x = days.x AND d.event_type = types.event_type),
        |r2 AS (SELECT x, event_type,
        |    2 * CAST(RANK() OVER (PARTITION BY x ORDER BY c) AS BIGINT)
        |      + CAST(COUNT(*) OVER (PARTITION BY x, c) AS BIGINT) - 1 AS r2
        |  FROM grid),
        |pt AS (SELECT event_type, CAST(SUM(r2) AS BIGINT) AS sr2,
        |    CAST(SUM(r2 * r2) AS BIGINT) AS sr22, CAST(COUNT(*) AS BIGINT) AS nb
        |  FROM r2 GROUP BY 1),
        |nb AS (SELECT CAST(MAX(nb) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(sr22) AS BIGINT) AS sa2 FROM pt),
        |m AS (SELECT n, k, sa2,
        |    CAST(SUM((sr2 - n * (k + 1)) * (sr2 - n * (k + 1))) AS BIGINT) AS sdev2
        |  FROM pt CROSS JOIN nb GROUP BY 1, 2, 3)
        |SELECT n AS n_blocks, k,
        |  ROUND(CAST(k - 1 AS DOUBLE) * CAST(sdev2 AS DOUBLE)
        |    / CAST(sa2 - n * k * (k + 1) * (k + 1) AS DOUBLE), 6) AS chi2_f,
        |  ROUND((CAST(k - 1 AS DOUBLE) * CAST(sdev2 AS DOUBLE)
        |    / CAST(sa2 - n * k * (k + 1) * (k + 1) AS DOUBLE))
        |    / CAST(n * (k - 1) AS DOUBLE), 6) AS kendalls_w
        |FROM m""".stripMargin,
    "q423_anderson_darling" ->
      """WITH cnts AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM (
        |    SELECT CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) % 100 AS c
        |    FROM orders) GROUP BY 1),
        |tot AS (SELECT CAST(SUM(m) AS BIGINT) AS n FROM cnts),
        |ws AS (SELECT c, m,
        |    CAST(SUM(m) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - m AS s
        |  FROM cnts),
        |t AS (SELECT ws.m, tot.n,
        |    (CAST(ws.c AS DOUBLE) + CAST('0.5' AS DOUBLE))
        |      / CAST('100.0' AS DOUBLE) AS u,
        |    ws.m * (2 * ws.s + ws.m) AS av,
        |    ws.m * (2 * (tot.n - ws.s) - ws.m) AS bv,
        |    ((ws.s + ws.m) * (2 * (ws.s + ws.m) - 1) * (2 * (ws.s + ws.m) + 1)
        |      - ws.s * (2 * ws.s - 1) * (2 * ws.s + 1)) // 3 AS sj2
        |  FROM ws CROSS JOIN tot),
        |agg AS (SELECT n,
        |    CAST(SUM(CAST(ROUND(CAST(av AS DOUBLE) * LN(u)
        |      + CAST(bv AS DOUBLE) * LN(CAST('1.0' AS DOUBLE) - u), 4)
        |      AS DECIMAL(38,4))) AS DOUBLE) AS sad,
        |    CAST(SUM(CAST(ROUND(CAST(m AS DOUBLE) * u * u
        |      - (CAST(av AS DOUBLE) / CAST(n AS DOUBLE)) * u
        |      + CAST(sj2 AS DOUBLE)
        |        / (CAST('4.0' AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 12)
        |      AS DECIMAL(38,12))) AS DOUBLE) AS sw2
        |  FROM t GROUP BY 1)
        |SELECT n, ROUND(-CAST(n AS DOUBLE) - sad / CAST(n AS DOUBLE), 4) AS a2,
        |  ROUND(CAST('1.0' AS DOUBLE) / (CAST('12.0' AS DOUBLE) * CAST(n AS DOUBLE))
        |    + sw2, 6) AS w2
        |FROM agg""".stripMargin,
    "q424_spearman" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM events GROUP BY 1),
        |ranked AS (SELECT
        |    2 * CAST(RANK() OVER (ORDER BY a) AS BIGINT)
        |      + CAST(COUNT(*) OVER (PARTITION BY a) AS BIGINT) - 1 AS ra,
        |    2 * CAST(RANK() OVER (ORDER BY b) AS BIGINT)
        |      + CAST(COUNT(*) OVER (PARTITION BY b) AS BIGINT) - 1 AS rb
        |  FROM daily),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(ra) AS BIGINT) AS sa,
        |    CAST(SUM(rb) AS BIGINT) AS sb, CAST(SUM(ra * ra) AS BIGINT) AS saa,
        |    CAST(SUM(rb * rb) AS BIGINT) AS sbb, CAST(SUM(ra * rb) AS BIGINT) AS sab
        |  FROM ranked)
        |SELECT n,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
        |    - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |    / SQRT((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
        |        - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6) AS rho
        |FROM m""".stripMargin,
    "q425_cooks_distance" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
        |  FROM orders GROUP BY 1),
        |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(r) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(r * CAST(x AS DECIMAL(10,0))) AS DECIMAL(38,2)) AS DOUBLE) AS sxy
        |  FROM daily),
        |bb AS (SELECT n, sx, sxx, sy,
        |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
        |  FROM mom),
        |e AS MATERIALIZED (SELECT x, n, sx, sxx, b,
        |    CAST(r AS DOUBLE) - (sy - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |      - b * CAST(x AS DOUBLE) AS e
        |  FROM daily CROSS JOIN bb),
        |den AS (SELECT
        |    CAST(SUM(CAST(ROUND(e * e, 6) AS DECIMAL(38,6))) AS DOUBLE) AS rss FROM e),
        |t AS (SELECT x, e,
        |    CAST('1.0' AS DOUBLE) / CAST(n AS DOUBLE)
        |      + (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |        / (CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS h,
        |    rss / (CAST(n AS DOUBLE) - CAST('2.0' AS DOUBLE)) AS s2
        |  FROM e CROSS JOIN den)
        |SELECT x, ROUND(e, 4) AS resid, ROUND(h, 6) AS leverage,
        |  ROUND(e * e * h / (CAST('2.0' AS DOUBLE) * s2
        |    * (CAST('1.0' AS DOUBLE) - h) * (CAST('1.0' AS DOUBLE) - h)), 6) AS cooks_d
        |FROM t ORDER BY cooks_d DESC, x LIMIT 5""".stripMargin,
    "q426_breusch_pagan" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
        |  FROM orders GROUP BY 1),
        |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(r) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(r * CAST(x AS DECIMAL(10,0))) AS DECIMAL(38,2)) AS DOUBLE) AS sxy
        |  FROM daily),
        |bb AS (SELECT n, sx, sxx, sy,
        |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
        |  FROM mom),
        |e AS (SELECT x, n,
        |    CAST(r AS DOUBLE) - (sy - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |      - b * CAST(x AS DOUBLE) AS e
        |  FROM daily CROSS JOIN bb),
        |g AS MATERIALIZED (SELECT x, n, ROUND(e * e, 4) AS g FROM e),
        |m AS (SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(CAST(g AS DECIMAL(38,4))) AS DOUBLE) AS sg,
        |    CAST(SUM(CAST(ROUND(CAST(x AS DOUBLE) * g, 4) AS DECIMAL(38,4)))
        |      AS DOUBLE) AS sxg,
        |    CAST(SUM(CAST(ROUND(g * g, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sgg
        |  FROM g)
        |SELECT n,
        |  ROUND((CAST(n AS DOUBLE) * sxg - CAST(sx AS DOUBLE) * sg)
        |    * (CAST(n AS DOUBLE) * sxg - CAST(sx AS DOUBLE) * sg)
        |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * sgg - sg * sg)), 6) AS r2,
        |  ROUND(CAST(n AS DOUBLE)
        |    * ((CAST(n AS DOUBLE) * sxg - CAST(sx AS DOUBLE) * sg)
        |    * (CAST(n AS DOUBLE) * sxg - CAST(sx AS DOUBLE) * sg)
        |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * sgg - sg * sg))), 4) AS lm
        |FROM m""".stripMargin,
    "q427_jarque_bera" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
        |  FROM orders GROUP BY 1),
        |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(r) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(r * CAST(x AS DECIMAL(10,0))) AS DECIMAL(38,2)) AS DOUBLE) AS sxy
        |  FROM daily),
        |bb AS (SELECT n, sx, sy,
        |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
        |  FROM mom),
        |e AS (SELECT n,
        |    CAST(r AS DOUBLE) - (sy - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |      - b * CAST(x AS DOUBLE) AS e
        |  FROM daily CROSS JOIN bb),
        |m AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
        |    CAST(SUM(CAST(ROUND(e * e, 4) AS DECIMAL(38,4))) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(ROUND(e * e * e, 0) AS DECIMAL(38,0))) AS DOUBLE) AS s3,
        |    CAST(SUM(CAST(ROUND(e * e * e * e, 0) AS DECIMAL(38,0))) AS DOUBLE) AS s4
        |  FROM e),
        |k AS (SELECT n,
        |    (s3 / CAST(n AS DOUBLE)) / SQRT((s2 / CAST(n AS DOUBLE))
        |      * (s2 / CAST(n AS DOUBLE)) * (s2 / CAST(n AS DOUBLE))) AS skew,
        |    (s4 / CAST(n AS DOUBLE))
        |      / ((s2 / CAST(n AS DOUBLE)) * (s2 / CAST(n AS DOUBLE))) AS kurt
        |  FROM m)
        |SELECT n, ROUND(skew, 6) AS skew, ROUND(kurt, 6) AS kurt,
        |  ROUND(CAST(n AS DOUBLE) / CAST('6.0' AS DOUBLE)
        |    * (skew * skew + (kurt - CAST('3.0' AS DOUBLE))
        |      * (kurt - CAST('3.0' AS DOUBLE)) / CAST('4.0' AS DOUBLE)), 4) AS jb
        |FROM k""".stripMargin,
    "q411_rbo" ->
      """WITH byrev AS (SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |      * CAST(1 - l_discount AS DECIMAL(12,4))) AS m
        |  FROM lineitem GROUP BY 1 ORDER BY m DESC, l_partkey LIMIT 50),
        |ra AS (SELECT l_partkey AS pk,
        |    CAST(ROW_NUMBER() OVER (ORDER BY m DESC, l_partkey) AS BIGINT) AS ra
        |  FROM byrev),
        |byqty AS (SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS m
        |  FROM lineitem GROUP BY 1 ORDER BY m DESC, l_partkey LIMIT 50),
        |rb AS (SELECT l_partkey AS pk,
        |    CAST(ROW_NUMBER() OVER (ORDER BY m DESC, l_partkey) AS BIGINT) AS rb
        |  FROM byqty),
        |mt AS (SELECT ra.pk, ra.ra, rb.rb FROM ra JOIN rb USING (pk)),
        |dd AS (SELECT pk, CAST(u.d AS BIGINT) AS dpth
        |  FROM mt, unnest(generate_series(GREATEST(ra, rb), 50)) AS u(d))
        |SELECT CAST(COUNT(DISTINCT pk) AS BIGINT) AS n_common,
        |  ROUND(CAST(SUM(CAST(ROUND(CAST('1.0' AS DOUBLE)
        |    / CAST(CAST(1 AS BIGINT) << dpth AS DOUBLE) / CAST(dpth AS DOUBLE), 12)
        |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS rbo,
        |  CAST(COUNT(DISTINCT pk) AS DOUBLE) / CAST('50.0' AS DOUBLE) AS overlap_50
        |FROM dd""".stripMargin,
    "q412_neyman_allocation" ->
      """WITH g AS (SELECT o_orderpriority AS prio, CAST(COUNT(*) AS BIGINT) AS n_h,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,4))
        |      * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        |  FROM orders GROUP BY 1),
        |wts AS MATERIALIZED (SELECT prio, n_h,
        |    ROUND(SQRT((sxx - sx * sx / CAST(n_h AS DOUBLE))
        |      / (CAST(n_h AS DOUBLE) - CAST('1.0' AS DOUBLE))), 6) AS sd,
        |    ROUND(CAST(n_h AS DOUBLE) * SQRT((sxx - sx * sx / CAST(n_h AS DOUBLE))
        |      / (CAST(n_h AS DOUBLE) - CAST('1.0' AS DOUBLE))), 2) AS wh
        |  FROM g),
        |tot AS (SELECT CAST(SUM(CAST(wh AS DECIMAL(28,2))) AS DOUBLE) AS wsum
        |  FROM wts),
        |q AS MATERIALIZED (SELECT prio, n_h, sd,
        |    CAST('1000.0' AS DOUBLE) * wh / wsum AS quota,
        |    CAST(FLOOR(CAST('1000.0' AS DOUBLE) * wh / wsum) AS BIGINT) AS base
        |  FROM wts CROSS JOIN tot),
        |lo AS (SELECT 1000 - CAST(SUM(base) AS BIGINT) AS leftover FROM q),
        |rk AS (SELECT *, CAST(ROW_NUMBER() OVER (
        |    ORDER BY quota - CAST(base AS DOUBLE) DESC, prio) AS BIGINT) AS rk
        |  FROM q)
        |SELECT prio, n_h, sd,
        |  base + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END) AS alloc
        |FROM rk CROSS JOIN lo ORDER BY prio""".stripMargin,
    "q413_hodges_lehmann" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
        |  FROM orders GROUP BY 1),
        |a AS MATERIALIZED (SELECT x AS xa, r AS ra FROM daily WHERE x % 7 = 1),
        |b AS MATERIALIZED (SELECT x AS xb, r AS rb FROM daily WHERE x % 7 = 5),
        |pairs AS MATERIALIZED (SELECT ra + rb AS s2, xa, xb FROM a CROSS JOIN b),
        |rk AS (SELECT s2,
        |    CAST(ROW_NUMBER() OVER (ORDER BY s2, xa, xb) AS BIGINT) AS rn
        |  FROM pairs),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM pairs),
        |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1 FROM a),
        |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2 FROM b)
        |SELECT n1, n2, np AS n_pairs,
        |  CAST(s2 AS DOUBLE) / CAST('2.0' AS DOUBLE) AS hl
        |FROM rk CROSS JOIN tot CROSS JOIN na CROSS JOIN nb
        |WHERE rn = FLOOR((np + 1) / 2)""".stripMargin,
    "q415_cliffs_delta" ->
      """WITH docs AS (SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2', 'src3')),
        |cnts AS MATERIALIZED (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM docs GROUP BY 1, 2),
        |srcs AS (SELECT DISTINCT source FROM cnts),
        |vals AS (SELECT DISTINCT v FROM cnts),
        |grid AS (SELECT a.source AS src_a, b.source AS src_b, vals.v
        |  FROM srcs a CROSS JOIN srcs b CROSS JOIN vals
        |  WHERE a.source < b.source),
        |j AS (SELECT g.src_a, g.src_b, g.v,
        |    COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
        |  FROM grid g
        |    LEFT JOIN cnts ca ON ca.source = g.src_a AND ca.v = g.v
        |    LEFT JOIN cnts cb ON cb.source = g.src_b AND cb.v = g.v),
        |cum AS (SELECT *, SUM(cb) OVER (PARTITION BY src_a, src_b ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cb AS cumb
        |  FROM j),
        |m AS (SELECT src_a, src_b, CAST(SUM(ca) AS BIGINT) AS n_a,
        |    CAST(SUM(cb) AS BIGINT) AS n_b, CAST(SUM(ca * cumb) AS BIGINT) AS gt,
        |    CAST(SUM(ca * cb) AS BIGINT) AS ties
        |  FROM cum GROUP BY 1, 2)
        |SELECT src_a, src_b, n_a, n_b,
        |  ROUND(CAST(gt - (n_a * n_b - gt - ties) AS DOUBLE)
        |    / CAST(n_a * n_b AS DOUBLE), 6) AS delta,
        |  ROUND((CAST(gt AS DOUBLE) + CAST('0.5' AS DOUBLE) * CAST(ties AS DOUBLE))
        |    / CAST(n_a * n_b AS DOUBLE), 6) AS vd_a
        |FROM m ORDER BY src_a, src_b""".stripMargin,
    "q416_grubbs" ->
      """WITH base AS (SELECT o_orderpriority AS prio,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS x, o_orderkey FROM orders),
        |g AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(x AS DECIMAL(19,4)) * x) AS DOUBLE) AS sxx
        |  FROM base GROUP BY 1),
        |dv AS (SELECT b.prio, b.o_orderkey, g.n, g.sx, g.sxx,
        |    ABS(CAST(b.x AS DOUBLE) - g.sx / CAST(g.n AS DOUBLE)) AS dev
        |  FROM base b JOIN g USING (prio)),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY prio
        |    ORDER BY dev DESC, o_orderkey) AS rk FROM dv)
        |SELECT prio, n, o_orderkey AS outlier_key,
        |  ROUND(dev / SQRT((sxx - sx * sx / CAST(n AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE))), 6) AS g
        |FROM rk WHERE rk = 1 ORDER BY prio""".stripMargin,
    "q406_lmoments" ->
      """WITH ranked AS (SELECT o_orderpriority AS prio,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS y,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS j
        |  FROM orders),
        |m AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS DOUBLE) AS s0,
        |    CAST(CAST(SUM(CAST(j - 1 AS DECIMAL(19,0)) * y)
        |      AS DECIMAL(38,2)) AS DOUBLE) AS s1,
        |    CAST(CAST(SUM(CAST((j - 1) * (j - 2) AS DECIMAL(19,0)) * y)
        |      AS DECIMAL(38,2)) AS DOUBLE) AS s2,
        |    CAST(CAST(SUM(CAST((j - 1) * (j - 2) * (j - 3) AS DECIMAL(19,0)) * y)
        |      AS DECIMAL(38,2)) AS DOUBLE) AS s3
        |  FROM ranked GROUP BY 1),
        |b AS (SELECT prio, n, s0 / CAST(n AS DOUBLE) AS b0,
        |    s1 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE))) AS b1,
        |    s2 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |      * (CAST(n AS DOUBLE) - CAST('2.0' AS DOUBLE))) AS b2,
        |    s3 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |      * (CAST(n AS DOUBLE) - CAST('2.0' AS DOUBLE))
        |      * (CAST(n AS DOUBLE) - CAST('3.0' AS DOUBLE))) AS b3
        |  FROM m)
        |SELECT prio, n, ROUND(b0, 4) AS l1,
        |  ROUND(CAST('2.0' AS DOUBLE) * b1 - b0, 4) AS l2,
        |  ROUND((CAST('6.0' AS DOUBLE) * b2 - CAST('6.0' AS DOUBLE) * b1 + b0)
        |    / (CAST('2.0' AS DOUBLE) * b1 - b0), 6) AS t3,
        |  ROUND((CAST('20.0' AS DOUBLE) * b3 - CAST('30.0' AS DOUBLE) * b2
        |      + CAST('12.0' AS DOUBLE) * b1 - b0)
        |    / (CAST('2.0' AS DOUBLE) * b1 - b0), 6) AS t4
        |FROM b ORDER BY prio""".stripMargin,
    "q407_brown_forsythe" ->
      """WITH base AS MATERIALIZED (SELECT o_orderpriority AS prio,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS x, o_orderkey FROM orders),
        |rk AS (SELECT prio, x, CAST(ROW_NUMBER() OVER (PARTITION BY prio
        |      ORDER BY x, o_orderkey) AS BIGINT) AS rn,
        |    COUNT(*) OVER (PARTITION BY prio) AS cnt FROM base),
        |med AS (SELECT prio, x AS med FROM rk WHERE rn = FLOOR((cnt + 1) / 2)),
        |z AS (SELECT b.prio, ABS(b.x - m.med) AS z FROM base b JOIN med m USING (prio)),
        |g AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS ng, SUM(z) AS sz,
        |    CAST(SUM(CAST(z AS DECIMAL(19,4)) * z) AS DECIMAL(38,4)) AS szz
        |  FROM z GROUP BY 1),
        |t AS (SELECT ng, sz, szz,
        |    CAST(ROUND(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
        |      / CAST(ng AS DOUBLE), 6) AS DECIMAL(38,6)) AS a FROM g),
        |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(SUM(a) AS DOUBLE) AS sa, CAST(SUM(sz) AS DOUBLE) AS szt,
        |    CAST(SUM(szz) AS DOUBLE) AS szzt FROM t)
        |SELECT k, n,
        |  ROUND(((sa - szt * szt / CAST(n AS DOUBLE))
        |      / (CAST(k AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |    / ((szzt - sa) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_bf
        |FROM mom""".stripMargin,
    "q408_granger" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM events GROUP BY 1),
        |pr AS (SELECT p.a AS a1, p.b AS y1, c.b AS y
        |  FROM daily p JOIN daily c ON c.x = p.x + 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS syi,
        |    CAST(SUM(y1) AS BIGINT) AS s1i, CAST(SUM(a1) AS BIGINT) AS s2i,
        |    CAST(SUM(y * y) AS BIGINT) AS syyi, CAST(SUM(y1 * y1) AS BIGINT) AS s11i,
        |    CAST(SUM(a1 * a1) AS BIGINT) AS s22i, CAST(SUM(y1 * a1) AS BIGINT) AS s12i,
        |    CAST(SUM(y * y1) AS BIGINT) AS s1yi, CAST(SUM(y * a1) AS BIGINT) AS s2yi
        |  FROM pr),
        |dd AS (SELECT n, CAST(n AS DOUBLE) AS nd, CAST(syi AS DOUBLE) AS sy,
        |    CAST(s1i AS DOUBLE) AS s1, CAST(s2i AS DOUBLE) AS s2,
        |    CAST(syyi AS DOUBLE) AS syy, CAST(s11i AS DOUBLE) AS s11,
        |    CAST(s22i AS DOUBLE) AS s22, CAST(s12i AS DOUBLE) AS s12,
        |    CAST(s1yi AS DOUBLE) AS s1y, CAST(s2yi AS DOUBLE) AS s2y FROM m),
        |r1 AS (SELECT *, (nd * s1y - sy * s1) / (nd * s11 - s1 * s1) AS phir FROM dd),
        |r2 AS (SELECT *, (sy - phir * s1) / nd AS cr FROM r1),
        |r3 AS (SELECT *, syy - cr * sy - phir * s1y AS rssr FROM r2),
        |f1 AS (SELECT *,
        |    nd * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2) AS det,
        |    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
        |      + s2 * (s1y * s12 - s11 * s2y) AS detc,
        |    nd * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s2y - s1y * s2) AS detp,
        |    nd * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
        |      + sy * (s1 * s12 - s11 * s2) AS detb
        |  FROM r3),
        |f2 AS (SELECT *, detc / det AS cf, detp / det AS phif, detb / det AS betaf
        |  FROM f1),
        |f3 AS (SELECT *, syy - cf * sy - phif * s1y - betaf * s2y AS rssf FROM f2)
        |SELECT n, ROUND(phif, 6) AS phi, ROUND(betaf, 6) AS beta,
        |  ROUND((rssr - rssf) / (rssf / (nd - CAST('3.0' AS DOUBLE))), 4) AS f_granger
        |FROM f3""".stripMargin,
    "q409_chow" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
        |  FROM orders GROUP BY 1),
        |seg AS (SELECT x, r, CASE WHEN x < 1200 THEN 0 ELSE 1 END AS seg FROM daily),
        |g AS MATERIALIZED (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    SUM(r) AS sy,
        |    CAST(SUM(r * CAST(x AS DECIMAL(10,0))) AS DECIMAL(38,2)) AS sxy,
        |    CAST(SUM(CAST(r AS DECIMAL(19,4)) * r) AS DECIMAL(38,4)) AS syy
        |  FROM seg GROUP BY 1),
        |sr AS (SELECT seg, n, sx, sy, sxy, syy,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
        |  FROM g),
        |sr2 AS (SELECT seg, n, b,
        |    CAST(syy AS DOUBLE)
        |      - ((CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))
        |        * CAST(sy AS DOUBLE)
        |      - b * CAST(sxy AS DOUBLE) AS rss
        |  FROM sr),
        |pm AS (SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sx) AS BIGINT) AS sx,
        |    CAST(SUM(sxx) AS BIGINT) AS sxx, SUM(sy) AS sy, SUM(sxy) AS sxy,
        |    SUM(syy) AS syy FROM g),
        |pb AS (SELECT n AS n_all, sx, sy, sxy, syy,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
        |  FROM pm),
        |pr AS (SELECT n_all,
        |    CAST(syy AS DOUBLE)
        |      - ((CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n_all AS DOUBLE))
        |        * CAST(sy AS DOUBLE)
        |      - b * CAST(sxy AS DOUBLE) AS rss_p
        |  FROM pb),
        |two AS (SELECT MAX(CASE WHEN seg = 0 THEN n END) AS na,
        |    MAX(CASE WHEN seg = 1 THEN n END) AS nb,
        |    MAX(CASE WHEN seg = 0 THEN b END) AS ba,
        |    MAX(CASE WHEN seg = 1 THEN b END) AS bb,
        |    MAX(CASE WHEN seg = 0 THEN rss END) AS rssa,
        |    MAX(CASE WHEN seg = 1 THEN rss END) AS rssb
        |  FROM sr2)
        |SELECT na AS n1, nb AS n2, ROUND(ba, 6) AS slope_pre,
        |  ROUND(bb, 6) AS slope_post,
        |  ROUND(((rss_p - rssa - rssb) / CAST('2.0' AS DOUBLE))
        |    / ((rssa + rssb)
        |      / (CAST(n_all AS DOUBLE) - CAST('4.0' AS DOUBLE))), 4) AS f_chow
        |FROM two CROSS JOIN pr""".stripMargin,
    "q410_deming" ->
      """WITH li AS (SELECT l_orderkey AS o_orderkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |      * CAST(1 - l_discount AS DECIMAL(12,4))
        |      * CAST(1 + l_tax AS DECIMAL(12,4))) AS DECIMAL(24,6)) AS yv
        |  FROM lineitem GROUP BY 1),
        |j AS (SELECT CAST(o.xv AS DOUBLE) AS xd, CAST(li.yv AS DOUBLE) AS yd,
        |    o.xv, li.yv
        |  FROM (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS xv
        |    FROM orders) o
        |  JOIN li USING (o_orderkey)),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(xv) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(ROUND(yd, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(xv AS DECIMAL(19,4)) * xv) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(ROUND(yd * yd, 4) AS DECIMAL(38,4))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(ROUND(xd * yd, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(ROUND((yd - xd) * (yd - xd), 4) AS DECIMAL(38,4)))
        |      AS DOUBLE) AS sdd
        |  FROM j),
        |c AS (SELECT *, CAST(n AS DOUBLE) AS nd FROM m),
        |c2 AS (SELECT *, sxx - sx * sx / nd AS sxxc, syy - sy * sy / nd AS syyc,
        |    sxy - sx * sy / nd AS sxyc FROM c),
        |c3 AS (SELECT *, (syyc - sxxc + SQRT((syyc - sxxc) * (syyc - sxxc)
        |      + CAST('4.0' AS DOUBLE) * sxyc * sxyc))
        |    / (CAST('2.0' AS DOUBLE) * sxyc) AS beta FROM c2),
        |c4 AS (SELECT *, (sy - sx) / nd AS meand,
        |    SQRT((sdd - (sy - sx) * (sy - sx) / nd)
        |      / (nd - CAST('1.0' AS DOUBLE))) AS sd FROM c3)
        |SELECT n, ROUND(beta, 6) AS deming_beta,
        |  ROUND(sy / nd - beta * (sx / nd), 4) AS deming_alpha,
        |  ROUND(meand, 4) AS ba_mean,
        |  ROUND(meand - CAST('1.96' AS DOUBLE) * sd, 4) AS ba_lo,
        |  ROUND(meand + CAST('1.96' AS DOUBLE) * sd, 4) AS ba_hi
        |FROM c4""".stripMargin,
    "q393_ljung_box" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(r) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(r AS DECIMAL(19,4)) * r) AS DOUBLE) AS srr
        |  FROM daily),
        |lags AS (SELECT CAST(u.l AS BIGINT) AS lag
        |         FROM unnest([1,2,3,4,5,6,7,8,9,10]) AS u(l)),
        |p AS (SELECT lags.lag, a.r AS rx, b.r AS ry
        |  FROM daily a CROSS JOIN lags JOIN daily b ON b.x = a.x + lags.lag),
        |m AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(SUM(rx) AS DOUBLE) AS sxk, CAST(SUM(ry) AS DOUBLE) AS syk,
        |    CAST(SUM(CAST(rx AS DECIMAL(19,4)) * ry) AS DOUBLE) AS sxyk
        |  FROM p GROUP BY 1),
        |r AS (SELECT lag, n,
        |    ROUND((sxyk - (sx / CAST(n AS DOUBLE)) * (sxk + syk)
        |      + CAST(c AS DOUBLE) * (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)))
        |      / (srr - sx * sx / CAST(n AS DOUBLE)), 6) AS rho
        |  FROM m CROSS JOIN tot),
        |t AS (SELECT lag, n, rho,
        |    CAST(ROUND(rho * rho / CAST(n - lag AS DOUBLE), 12) AS DECIMAL(38,12)) AS term
        |  FROM r)
        |SELECT lag, rho,
        |  ROUND(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + CAST('2.0' AS DOUBLE))
        |    * CAST(SUM(term) OVER (ORDER BY lag
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS q_lb
        |FROM t ORDER BY lag""".stripMargin,
    "q396_durbin_watson" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
        |  FROM orders GROUP BY 1),
        |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(r) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(r * CAST(x AS DECIMAL(10,0))) AS DECIMAL(38,2)) AS DOUBLE) AS sxy
        |  FROM daily),
        |bb AS (SELECT n, sx, sy,
        |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
        |  FROM mom),
        |e AS MATERIALIZED (SELECT x, n, b,
        |    CAST(r AS DOUBLE) - (sy - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |      - b * CAST(x AS DOUBLE) AS e
        |  FROM daily CROSS JOIN bb),
        |den AS (SELECT
        |    CAST(SUM(CAST(ROUND(e * e, 6) AS DECIMAL(38,6))) AS DOUBLE) AS den,
        |    MAX(b) AS b, MAX(n) AS n FROM e),
        |num AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CAST(ROUND((e2.e - e1.e) * (e2.e - e1.e), 6)
        |      AS DECIMAL(38,6))) AS DOUBLE) AS num
        |  FROM e e1 JOIN e e2 ON e2.x = e1.x + 1)
        |SELECT n, n_pairs, ROUND(b, 6) AS slope, ROUND(num / den, 6) AS dw
        |FROM num CROSS JOIN den""".stripMargin,
    "q397_hurst_rs" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
        |  FROM orders GROUP BY 1),
        |t AS (SELECT x, r, CAST(ROW_NUMBER() OVER (ORDER BY x) AS BIGINT) AS t
        |  FROM daily),
        |ws AS (SELECT t.t, t.r, CAST(u.w AS BIGINT) AS w
        |  FROM t CROSS JOIN unnest([8,16,32,64]) AS u(w)),
        |bi AS (SELECT w, r, t,
        |    CAST(FLOOR(CAST(t - 1 AS DOUBLE) / CAST(w AS DOUBLE)) AS BIGINT) AS blk
        |  FROM ws),
        |bi2 AS (SELECT w, blk, r, t - blk * w AS i FROM bi),
        |en AS (SELECT w, blk, i,
        |    SUM(r) OVER (PARTITION BY w, blk ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    COUNT(*) OVER (PARTITION BY w, blk) AS cnt,
        |    CAST(SUM(r) OVER (PARTITION BY w, blk) AS DOUBLE) AS sr,
        |    CAST(SUM(CAST(r AS DECIMAL(19,4)) * r)
        |      OVER (PARTITION BY w, blk) AS DOUBLE) AS srr
        |  FROM bi2),
        |dv AS (SELECT w, blk, sr, srr,
        |    CAST(cum AS DOUBLE) - CAST(i AS DOUBLE) * (sr / CAST(w AS DOUBLE)) AS dev
        |  FROM en WHERE cnt = w),
        |blocks AS (SELECT w, blk, sr, srr, MAX(dev) - MIN(dev) AS rng
        |  FROM dv GROUP BY 1, 2, 3, 4),
        |sb AS (SELECT w, rng,
        |    SQRT((srr - sr * sr / CAST(w AS DOUBLE)) / CAST(w AS DOUBLE)) AS sdev
        |  FROM blocks),
        |perw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    ROUND(CAST(SUM(CAST(ROUND(rng / sdev, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE), 6) AS rs_avg
        |  FROM sb WHERE sdev > 0 GROUP BY 1),
        |pts AS MATERIALIZED (SELECT w, n_blocks, rs_avg,
        |    ROUND(LN(CAST(w AS DOUBLE)), 12) AS lw,
        |    ROUND(LN(rs_avg), 12) AS lr
        |  FROM perw),
        |fit AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k,
        |    CAST(SUM(CAST(lw AS DECIMAL(28,12))) AS DOUBLE) AS slw,
        |    CAST(SUM(CAST(lr AS DECIMAL(28,12))) AS DOUBLE) AS slr,
        |    CAST(SUM(CAST(ROUND(lw * lw, 12) AS DECIMAL(28,12))) AS DOUBLE) AS slww,
        |    CAST(SUM(CAST(ROUND(lw * lr, 12) AS DECIMAL(28,12))) AS DOUBLE) AS slwr
        |  FROM pts)
        |SELECT w, n_blocks, rs_avg,
        |  ROUND((k * slwr - slw * slr) / (k * slww - slw * slw), 6) AS hurst
        |FROM pts CROSS JOIN fit ORDER BY w""".stripMargin,
    "q398_allan_variance" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS x,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |t AS (SELECT cnt, CAST(ROW_NUMBER() OVER (ORDER BY x) AS BIGINT) AS t
        |  FROM daily),
        |taus AS (SELECT CAST(u.v AS BIGINT) AS tau FROM unnest([1,2,4,8]) AS u(v)),
        |bins AS (SELECT tau,
        |    CAST(FLOOR(CAST(t - 1 AS DOUBLE) / CAST(tau AS DOUBLE)) AS BIGINT) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS nb, CAST(SUM(cnt) AS BIGINT) AS sc
        |  FROM t CROSS JOIN taus GROUP BY 1, 2),
        |fb AS MATERIALIZED (SELECT tau, bin,
        |    CAST(sc AS DOUBLE) / CAST(tau AS DOUBLE) AS y
        |  FROM bins WHERE nb = tau),
        |m AS (SELECT tau, CAST(COUNT(*) AS BIGINT) AS m_bins FROM fb GROUP BY 1),
        |diffs AS (SELECT a.tau, CAST(COUNT(*) AS BIGINT) AS nd,
        |    CAST(SUM(CAST(ROUND((b.y - a.y) * (b.y - a.y), 6)
        |      AS DECIMAL(28,6))) AS DOUBLE) AS sd2
        |  FROM fb a JOIN fb b ON b.tau = a.tau AND b.bin = a.bin + 1 GROUP BY 1)
        |SELECT d.tau, m.m_bins,
        |  ROUND(d.sd2 / (CAST('2.0' AS DOUBLE) * CAST(d.nd AS DOUBLE)), 6) AS avar
        |FROM diffs d JOIN m ON m.tau = d.tau ORDER BY d.tau""".stripMargin,
    "q399_permutation_entropy" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
        |  FROM orders GROUP BY 1),
        |t AS MATERIALIZED (SELECT r,
        |    CAST(ROW_NUMBER() OVER (ORDER BY x) AS BIGINT) AS t FROM daily),
        |tri AS (SELECT a.r AS y1, b.r AS y2, c.r AS y3
        |  FROM t a JOIN t b ON b.t = a.t + 1 JOIN t c ON c.t = a.t + 2),
        |os AS (SELECT
        |    (CASE WHEN y2 <= y1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN y3 <= y1 THEN 1 ELSE 0 END) AS o1,
        |    (CASE WHEN y1 < y2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN y3 <= y2 THEN 1 ELSE 0 END) AS o2,
        |    (CASE WHEN y1 < y3 THEN 1 ELSE 0 END)
        |      + (CASE WHEN y2 < y3 THEN 1 ELSE 0 END) AS o3
        |  FROM tri),
        |pc AS (SELECT CAST(o1 AS VARCHAR) || CAST(o2 AS VARCHAR)
        |    || CAST(o3 AS VARCHAR) AS pattern, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM os GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS ntri FROM pc),
        |wp AS MATERIALIZED (SELECT pattern, cnt,
        |    CAST(cnt AS DOUBLE) / CAST(ntri AS DOUBLE) AS p
        |  FROM pc CROSS JOIN tot),
        |h AS (SELECT CAST(SUM(CAST(ROUND(p * LN(p), 12) AS DECIMAL(28,12)))
        |    AS DOUBLE) AS sh FROM wp)
        |SELECT pattern, cnt, ROUND(p, 6) AS p,
        |  ROUND(-sh / CAST('1.791759469228055' AS DOUBLE), 6) AS pe
        |FROM wp CROSS JOIN h ORDER BY pattern""".stripMargin,
    "q400_page_hinkley" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS x,
        |    CAST(COUNT(*) AS BIGINT) AS cnt,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
        |  FROM events GROUP BY 1),
        |v AS (SELECT x,
        |    CAST(ROUND(CAST(sv AS DOUBLE) / CAST(cnt AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) AS v,
        |    CAST(ROW_NUMBER() OVER (ORDER BY x) AS BIGINT) AS t
        |  FROM daily),
        |c1 AS (SELECT x, t, v, SUM(v) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM v),
        |c2 AS (SELECT *, CAST(ROUND(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE), 6)
        |    AS DECIMAL(18,6)) AS mt FROM c1),
        |c3 AS (SELECT *, SUM(mt) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cms FROM c2),
        |c4 AS (SELECT x, t,
        |    ROUND(CAST(cum AS DOUBLE) - CAST(cms AS DOUBLE)
        |      - CAST(t AS DOUBLE) * CAST('0.05' AS DOUBLE), 6) AS m
        |  FROM c3),
        |c5 AS (SELECT *, MAX(m) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx FROM c4)
        |SELECT x, t, m, ROUND(mx - m, 6) AS ph,
        |  ROUND(mx - m, 6) > CAST('2.0' AS DOUBLE) AS alarm
        |FROM c5 ORDER BY t""".stripMargin,
    "q391_pacf" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
        |  FROM orders GROUP BY 1),
        |lags AS (SELECT CAST(u.l AS BIGINT) AS lag
        |         FROM unnest([1, 2, 3, 4]) AS u(l)),
        |p AS (
        |  SELECT lags.lag, a.r AS rx, b.r AS ry
        |  FROM daily a CROSS JOIN lags JOIN daily b ON b.x = a.x + lags.lag),
        |m AS (
        |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(rx) AS DOUBLE) AS sx, CAST(SUM(ry) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(rx AS DECIMAL(19,4)) * rx) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(ry AS DECIMAL(19,4)) * ry) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(rx AS DECIMAL(19,4)) * ry) AS DOUBLE) AS sxy
        |  FROM p GROUP BY 1),
        |acf AS (
        |  SELECT lag,
        |    ROUND((n_pairs * sxy - sx * sy)
        |      / SQRT((n_pairs * sxx - sx * sx)
        |        * (n_pairs * syy - sy * sy)), 6) AS acf
        |  FROM m),
        |one AS (
        |  SELECT MAX(CASE WHEN lag = 1 THEN acf END) AS r1,
        |    MAX(CASE WHEN lag = 2 THEN acf END) AS r2,
        |    MAX(CASE WHEN lag = 3 THEN acf END) AS r3,
        |    MAX(CASE WHEN lag = 4 THEN acf END) AS r4
        |  FROM acf),
        |d1 AS (SELECT *, r1 AS f11,
        |  ROUND((r2 - r1 * r1)
        |    / (CAST('1.0' AS DOUBLE) - r1 * r1), 6) AS f22 FROM one),
        |d2 AS (SELECT *, ROUND(f11 - f22 * f11, 6) AS f21 FROM d1),
        |d3 AS (SELECT *,
        |  ROUND((r3 - f21 * r2 - f22 * r1)
        |    / (CAST('1.0' AS DOUBLE) - f21 * r1 - f22 * r2), 6) AS f33
        |  FROM d2),
        |d4 AS (SELECT *, ROUND(f21 - f33 * f22, 6) AS f31,
        |  ROUND(f22 - f33 * f21, 6) AS f32 FROM d3),
        |d5 AS (SELECT *,
        |  ROUND((r4 - f31 * r3 - f32 * r2 - f33 * r1)
        |    / (CAST('1.0' AS DOUBLE) - f31 * r1 - f32 * r2 - f33 * r3), 6)
        |    AS f44
        |  FROM d4)
        |SELECT CAST(u.i AS BIGINT) AS lag, [f11, f22, f33, f44][u.i] AS pacf
        |FROM d5, unnest(range(1, 5)) AS u(i) ORDER BY lag""".stripMargin,
    "q394_hill_tail" ->
      """WITH topv AS MATERIALIZED (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |      AS y, o_orderkey
        |  FROM orders ORDER BY y DESC, o_orderkey LIMIT 501),
        |thr AS (SELECT MIN(y) AS xk1 FROM topv),
        |a AS (
        |  SELECT COUNT(*) AS n_tail, MAX(xk1) AS xk,
        |    CAST(SUM(CAST(ROUND(LN(CAST(y AS DOUBLE) / CAST(xk1 AS DOUBLE)),
        |      6) AS DECIMAL(28,6))) AS DOUBLE) AS hsum
        |  FROM topv, thr WHERE y > xk1)
        |SELECT CAST(n_tail AS BIGINT) AS k,
        |  ROUND(CAST(xk AS DOUBLE) / CAST('100.0' AS DOUBLE), 2)
        |    AS threshold_usd,
        |  ROUND(hsum / CAST(n_tail AS DOUBLE), 6) AS hill,
        |  ROUND(CAST(n_tail AS DOUBLE) / hsum, 6) AS alpha
        |FROM a""".stripMargin,
    "q377_sprt" ->
      """WITH walk AS (
        |  SELECT c_mktsegment AS seg, o_orderkey,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 336472
        |         ELSE -143101 END AS inc
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |w2 AS (
        |  SELECT seg,
        |    ROW_NUMBER() OVER (PARTITION BY seg ORDER BY o_orderkey) AS rn,
        |    SUM(inc) OVER (PARTITION BY seg ORDER BY o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr
        |  FROM walk),
        |crossings AS (
        |  SELECT seg, MIN(rn) AS n_dec FROM w2
        |  WHERE ABS(llr) >= 2944439 GROUP BY 1),
        |att AS (
        |  SELECT w2.seg, n_dec, llr
        |  FROM w2 JOIN crossings
        |    ON w2.seg = crossings.seg AND rn = n_dec),
        |tot AS (SELECT seg, COUNT(*) AS n_total FROM w2 GROUP BY 1)
        |SELECT tot.seg, CAST(n_total AS BIGINT) AS n_total,
        |  CAST(COALESCE(n_dec, n_total) AS BIGINT) AS n_at_decision,
        |  CAST(COALESCE(llr, 0) AS BIGINT) AS llr_micro,
        |  CASE WHEN llr IS NULL THEN 'continue'
        |       WHEN llr >= 2944439 THEN 'accept_h1'
        |       ELSE 'accept_h0' END AS decision
        |FROM tot LEFT JOIN att ON tot.seg = att.seg
        |ORDER BY tot.seg""".stripMargin,
    "q379_ipw_ate" ->
      """WITH ord AS (
        |  SELECT month(o_orderdate) + year(o_orderdate) * 12 AS b,
        |    o_orderpriority = '1-URGENT' AS t,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS y
        |  FROM orders),
        |byb AS (
        |  SELECT b, COUNT(*) AS nx,
        |    CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n1x,
        |    CAST(SUM(CASE WHEN t THEN y ELSE 0 END) AS DECIMAL(38,0)) AS sy1,
        |    CAST(SUM(CASE WHEN NOT t THEN y ELSE 0 END) AS DECIMAL(38,0))
        |      AS sy0
        |  FROM ord GROUP BY 1),
        |ok AS (SELECT * FROM byb WHERE n1x > 0 AND n1x < nx),
        |tots AS (
        |  SELECT CAST(SUM(nx) AS BIGINT) AS n,
        |    CAST(SUM(CAST(ROUND(CAST(sy1 AS DOUBLE)
        |      / CAST('100000.0' AS DOUBLE) * CAST(nx AS DOUBLE)
        |      / CAST(n1x AS DOUBLE), 4) AS DECIMAL(38,4))) AS DOUBLE) AS t1,
        |    CAST(SUM(CAST(ROUND(CAST(sy0 AS DOUBLE)
        |      / CAST('100000.0' AS DOUBLE) * CAST(nx AS DOUBLE)
        |      / CAST(nx - n1x AS DOUBLE), 4) AS DECIMAL(38,4))) AS DOUBLE)
        |      AS t0,
        |    COUNT(*) AS n_buckets
        |  FROM ok),
        |dropped AS (SELECT COUNT(*) AS nb FROM byb)
        |SELECT n AS n_orders, CAST(n_buckets AS BIGINT) AS n_buckets,
        |  CAST(nb - n_buckets AS BIGINT) AS n_buckets_dropped,
        |  ROUND(t1 / CAST(n AS DOUBLE) * CAST('1000.0' AS DOUBLE), 4)
        |    AS mean_treated_usd,
        |  ROUND(t0 / CAST(n AS DOUBLE) * CAST('1000.0' AS DOUBLE), 4)
        |    AS mean_control_usd,
        |  ROUND((t1 - t0) / CAST(n AS DOUBLE) * CAST('1000.0' AS DOUBLE), 4)
        |    AS ipw_ate_usd
        |FROM tots, dropped""".stripMargin,
    "q361_mann_whitney" ->
      """WITH ord AS (
        |  SELECT o_orderpriority = '1-URGENT' AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) // 1000
        |      AS b
        |  FROM orders),
        |byb AS (SELECT b, COUNT(*) AS t FROM ord GROUP BY 1),
        |ranked AS (
        |  SELECT b, t,
        |    2 * (COALESCE(SUM(t) OVER (ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1)
        |      + t - 1 AS rank2
        |  FROM byb),
        |j AS (
        |  SELECT g, gb.b, ng, rank2
        |  FROM (SELECT g, b, COUNT(*) AS ng FROM ord GROUP BY 1, 2) gb
        |  JOIN ranked ON gb.b = ranked.b),
        |agg AS (
        |  SELECT CAST(SUM(CASE WHEN g THEN ng ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN NOT g THEN ng ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN g THEN ng * rank2 ELSE 0 END)
        |      AS DECIMAL(38,0)) AS r1x2
        |  FROM j),
        |ties AS (SELECT CAST(SUM(t*t*t - t) AS DECIMAL(38,0)) AS tsum FROM byb)
        |SELECT n1 AS n_urgent, n2 AS n_rest,
        |  ROUND(CAST(r1x2 AS DOUBLE) / CAST('2.0' AS DOUBLE)
        |    - CAST(n1 AS DOUBLE) * CAST(n1 + 1 AS DOUBLE)
        |      / CAST('2.0' AS DOUBLE), 4) AS u,
        |  ROUND(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      / CAST('12.0' AS DOUBLE)
        |    * ((CAST(n1 + n2 AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |      - CAST(tsum AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)
        |        * (CAST(n1 + n2 AS DOUBLE) - CAST('1.0' AS DOUBLE)))), 4)
        |    AS var_u,
        |  ROUND((CAST(r1x2 AS DOUBLE) / CAST('2.0' AS DOUBLE)
        |      - CAST(n1 AS DOUBLE) * CAST(n1 + 1 AS DOUBLE)
        |        / CAST('2.0' AS DOUBLE)
        |      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        / CAST('2.0' AS DOUBLE))
        |    / SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        / CAST('12.0' AS DOUBLE)
        |      * ((CAST(n1 + n2 AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |        - CAST(tsum AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)
        |          * (CAST(n1 + n2 AS DOUBLE) - CAST('1.0' AS DOUBLE))))), 6)
        |    AS z,
        |  ABS(ROUND((CAST(r1x2 AS DOUBLE) / CAST('2.0' AS DOUBLE)
        |      - CAST(n1 AS DOUBLE) * CAST(n1 + 1 AS DOUBLE)
        |        / CAST('2.0' AS DOUBLE)
        |      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        / CAST('2.0' AS DOUBLE))
        |    / SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        / CAST('12.0' AS DOUBLE)
        |      * ((CAST(n1 + n2 AS DOUBLE) + CAST('1.0' AS DOUBLE))
        |        - CAST(tsum AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)
        |          * (CAST(n1 + n2 AS DOUBLE) - CAST('1.0' AS DOUBLE))))), 6))
        |    > CAST('1.96' AS DOUBLE) AS significant
        |FROM agg, ties""".stripMargin,
    "q362_kruskal_wallis" ->
      """WITH ord AS (
        |  SELECT o_orderpriority AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) // 1000
        |      AS b
        |  FROM orders),
        |byb AS (SELECT b, COUNT(*) AS t FROM ord GROUP BY 1),
        |ranked AS (
        |  SELECT b, t,
        |    2 * (COALESCE(SUM(t) OVER (ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1)
        |      + t - 1 AS rank2
        |  FROM byb),
        |per AS (
        |  SELECT g, CAST(SUM(ng) AS BIGINT) AS ng,
        |    CAST(SUM(ng * rank2) AS DECIMAL(38,0)) AS r2
        |  FROM (SELECT g, b, COUNT(*) AS ng FROM ord GROUP BY 1, 2) gb
        |  JOIN ranked ON gb.b = ranked.b
        |  GROUP BY g),
        |ties AS (SELECT CAST(SUM(t*t*t - t) AS DECIMAL(38,0)) AS tsum FROM byb),
        |tot AS (
        |  SELECT CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(SUM(CAST(ROUND(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
        |      / CAST(ng AS DOUBLE), 4) AS DECIMAL(38,4))) AS DOUBLE) AS srq,
        |    COUNT(*) AS k
        |  FROM per)
        |SELECT n, CAST(k AS BIGINT) AS k_groups,
        |  ROUND((CAST('12.0' AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE)))
        |      * srq / CAST('4.0' AS DOUBLE)
        |      - CAST('3.0' AS DOUBLE) * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE)))
        |    / (CAST('1.0' AS DOUBLE) - CAST(tsum AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        - CAST(n AS DOUBLE))), 6) AS h,
        |  ROUND((CAST('12.0' AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE)))
        |      * srq / CAST('4.0' AS DOUBLE)
        |      - CAST('3.0' AS DOUBLE) * (CAST(n AS DOUBLE) + CAST('1.0' AS DOUBLE)))
        |    / (CAST('1.0' AS DOUBLE) - CAST(tsum AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        - CAST(n AS DOUBLE))), 6) > CAST('9.488' AS DOUBLE)
        |    AS significant
        |FROM tot, ties""".stripMargin,
    "q363_wasserstein" ->
      """WITH ev AS (
        |  SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) AS c
        |  FROM events),
        |m AS (SELECT (MIN(t) + MAX(t)) // 2 AS mid FROM ev),
        |byc AS (
        |  SELECT c,
        |    CAST(SUM(CASE WHEN t < mid THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN t >= mid THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM ev, m GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |               CAST(SUM(c2) AS BIGINT) AS n2 FROM byc),
        |steps AS (
        |  SELECT c,
        |    SUM(c1) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
        |    SUM(c2) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2,
        |    LEAD(c) OVER (ORDER BY c) - c AS gap
        |  FROM byc),
        |w AS (
        |  SELECT MAX(n1) AS na, MAX(n2) AS nb,
        |    CAST(SUM(ABS(f1 * n2 - f2 * n1) * gap) AS DECIMAL(38,0))
        |      AS w1_scaled
        |  FROM steps, tot WHERE gap IS NOT NULL)
        |SELECT na AS n_first, nb AS n_second,
        |  CAST(w1_scaled AS VARCHAR) AS w1_scaled,
        |  ROUND(CAST(w1_scaled AS DOUBLE)
        |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
        |      * CAST('100.0' AS DOUBLE)), 6) AS w1
        |FROM w""".stripMargin,
    "q364_anova_f" ->
      """WITH ord AS (
        |  SELECT o_orderpriority AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS y
        |  FROM orders),
        |per AS (
        |  SELECT g, COUNT(*) AS n,
        |    CAST(SUM(y) AS DECIMAL(38,0)) AS syc,
        |    CAST(SUM(CAST(ROUND(CAST(y AS DOUBLE) / CAST('100000.0' AS DOUBLE)
        |      * (CAST(y AS DOUBLE) / CAST('100000.0' AS DOUBLE)), 4)
        |      AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS syy
        |  FROM ord GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS nt,
        |    CAST(SUM(syc) AS DECIMAL(38,0)) AS syt,
        |    CAST(CAST(SUM(syy) AS DECIMAL(38,4)) AS DOUBLE) AS syyt,
        |    COUNT(*) AS k,
        |    CAST(SUM(CAST(ROUND(CAST(syc AS DOUBLE) / CAST('100000.0' AS DOUBLE)
        |      * (CAST(syc AS DOUBLE) / CAST('100000.0' AS DOUBLE))
        |      / CAST(n AS DOUBLE), 4) AS DECIMAL(38,4))) AS DOUBLE) AS sgrp
        |  FROM per)
        |SELECT nt AS n, CAST(k AS BIGINT) AS k_groups,
        |  ROUND(sgrp - CAST(syt AS DOUBLE) / CAST('100000.0' AS DOUBLE)
        |    * (CAST(syt AS DOUBLE) / CAST('100000.0' AS DOUBLE))
        |    / CAST(nt AS DOUBLE), 4) AS ss_between_kusd2,
        |  ROUND(syyt - sgrp, 4) AS ss_within_kusd2,
        |  ROUND(((sgrp - CAST(syt AS DOUBLE) / CAST('100000.0' AS DOUBLE)
        |      * (CAST(syt AS DOUBLE) / CAST('100000.0' AS DOUBLE))
        |      / CAST(nt AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
        |    / ((syyt - sgrp) / CAST(nt - k AS DOUBLE)), 6) AS f,
        |  ROUND(((sgrp - CAST(syt AS DOUBLE) / CAST('100000.0' AS DOUBLE)
        |      * (CAST(syt AS DOUBLE) / CAST('100000.0' AS DOUBLE))
        |      / CAST(nt AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
        |    / ((syyt - sgrp) / CAST(nt - k AS DOUBLE)), 6)
        |    > CAST('2.372' AS DOUBLE) AS significant
        |FROM tot""".stripMargin,
    "q365_fdr_bh" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events),
        |obs AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN ((((event_id % 2147483647) * 48271)
        |      % 2147483647 + 1) * 16807) % 2147483647 % 10000 % 2 = 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    SUM(CASE WHEN ((((event_id % 2147483647) * 48271)
        |      % 2147483647 + 1) * 16807) % 2147483647 % 10000 % 2 = 0
        |      THEN v END) AS sva,
        |    CAST(SUM(CASE WHEN ((((event_id % 2147483647) * 48271)
        |      % 2147483647 + 1) * 16807) % 2147483647 % 10000 % 2 <> 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |    SUM(CASE WHEN ((((event_id % 2147483647) * 48271)
        |      % 2147483647 + 1) * 16807) % 2147483647 % 10000 % 2 <> 0
        |      THEN v END) AS svb
        |  FROM ev GROUP BY 1),
        |reps AS (SELECT CAST(u.r AS BIGINT) AS rep
        |         FROM unnest(range(1, 33)) u(r)),
        |perm AS (
        |  SELECT event_type, rep,
        |    CAST(SUM(CASE WHEN (((((event_id + rep) % 2147483647) * 48271)
        |      % 2147483647 + 1) * 16807) % 2147483647 % 2 = 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS pna,
        |    SUM(CASE WHEN (((((event_id + rep) % 2147483647) * 48271)
        |      % 2147483647 + 1) * 16807) % 2147483647 % 2 = 0
        |      THEN v END) AS psva,
        |    CAST(SUM(CASE WHEN (((((event_id + rep) % 2147483647) * 48271)
        |      % 2147483647 + 1) * 16807) % 2147483647 % 2 <> 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS pnb,
        |    SUM(CASE WHEN (((((event_id + rep) % 2147483647) * 48271)
        |      % 2147483647 + 1) * 16807) % 2147483647 % 2 <> 0
        |      THEN v END) AS psvb
        |  FROM ev, reps GROUP BY 1, 2),
        |pv AS (
        |  SELECT perm.event_type,
        |    CAST(SUM(CASE WHEN ABS(CAST(psva AS DOUBLE) / CAST(pna AS DOUBLE)
        |        - CAST(psvb AS DOUBLE) / CAST(pnb AS DOUBLE))
        |      >= ABS(CAST(sva AS DOUBLE) / CAST(na AS DOUBLE)
        |        - CAST(svb AS DOUBLE) / CAST(nb AS DOUBLE))
        |      THEN 1 ELSE 0 END) + 1 AS BIGINT) AS pnum
        |  FROM perm JOIN obs ON perm.event_type = obs.event_type
        |  GROUP BY 1),
        |m AS (SELECT COUNT(*) AS m FROM pv),
        |rk AS (
        |  SELECT event_type, pnum,
        |    ROW_NUMBER() OVER (ORDER BY pnum, event_type) AS k
        |  FROM pv),
        |km AS (
        |  SELECT MAX(CASE WHEN 20 * m.m * pnum <= 33 * k THEN k ELSE 0 END)
        |    AS kmax
        |  FROM rk, m)
        |SELECT event_type, pnum AS p_numerator_33rds,
        |  ROUND(CAST(pnum AS DOUBLE) / CAST('33.0' AS DOUBLE), 6) AS p_value,
        |  k AS rank, k <= kmax AS discovery
        |FROM rk, km
        |ORDER BY k""".stripMargin,
    "q366_hhi" ->
      """WITH rev AS (
        |  SELECT s_nationkey AS nation, s_suppkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100
        |      AS BIGINT)) AS DECIMAL(38,0)) AS r
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |tot AS (SELECT nation, CAST(SUM(r) AS DECIMAL(38,0)) AS tot
        |        FROM rev GROUP BY 1)
        |SELECT rev.nation, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |  ROUND(CAST(SUM(CAST(ROUND(CAST(r AS DOUBLE) / CAST(tot AS DOUBLE)
        |    * (CAST(r AS DOUBLE) / CAST(tot AS DOUBLE)), 12)
        |    AS DECIMAL(28,12))) AS DOUBLE) * CAST('10000.0' AS DOUBLE), 4)
        |    AS hhi
        |FROM rev JOIN tot ON rev.nation = tot.nation
        |GROUP BY rev.nation
        |ORDER BY rev.nation""".stripMargin,
    "q369_log_rank" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    MIN(CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT))
        |      AS m0,
        |    MAX(CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT))
        |      AS ml
        |  FROM orders GROUP BY 1),
        |withseg AS (
        |  SELECT per.*, c_mktsegment = 'BUILDING' AS g1
        |  FROM per JOIN customer ON o_custkey = c_custkey),
        |h AS (SELECT MAX(ml) AS mmax FROM withseg),
        |durs AS (
        |  SELECT g1,
        |    CASE WHEN mmax - ml > 6 THEN ml - m0 ELSE mmax - m0 END AS dur,
        |    CASE WHEN mmax - ml > 6 THEN 1 ELSE 0 END AS death
        |  FROM withseg, h),
        |grid AS (
        |  SELECT dur,
        |    CAST(SUM(CASE WHEN g1 THEN death ELSE 0 END) AS BIGINT) AS d1,
        |    CAST(SUM(CASE WHEN NOT g1 THEN death ELSE 0 END) AS BIGINT) AS d2,
        |    CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS e1,
        |    CAST(SUM(CASE WHEN NOT g1 THEN 1 ELSE 0 END) AS BIGINT) AS e2
        |  FROM durs GROUP BY 1),
        |terms AS (
        |  SELECT d1, d2,
        |    SUM(e1) OVER (ORDER BY dur
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n1,
        |    SUM(e2) OVER (ORDER BY dur
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n2
        |  FROM grid),
        |t2 AS (
        |  SELECT d1, d2, n1, n2, n1 + n2 AS nr, d1 + d2 AS dd
        |  FROM terms WHERE d1 + d2 > 0),
        |a AS (
        |  SELECT CAST(SUM(d1) AS BIGINT) AS o1,
        |    CAST(SUM(CAST(ROUND(CAST(n1 AS DOUBLE) * CAST(dd AS DOUBLE)
        |      / CAST(nr AS DOUBLE), 6) AS DECIMAL(28,6))) AS DOUBLE) AS exp1,
        |    CAST(SUM(CAST(ROUND(CASE WHEN nr > 1
        |      THEN CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        * CAST(dd AS DOUBLE) * CAST(nr - dd AS DOUBLE)
        |        / (CAST(nr AS DOUBLE) * CAST(nr AS DOUBLE)
        |          * CAST(nr - 1 AS DOUBLE))
        |      ELSE CAST('0.0' AS DOUBLE) END, 6) AS DECIMAL(28,6)))
        |      AS DOUBLE) AS v
        |  FROM t2)
        |SELECT o1 AS observed_building,
        |  ROUND(exp1, 6) AS expected_building,
        |  ROUND(v, 6) AS variance,
        |  ROUND((CAST(o1 AS DOUBLE) - exp1) * (CAST(o1 AS DOUBLE) - exp1)
        |    / v, 6) AS chi2,
        |  ROUND((CAST(o1 AS DOUBLE) - exp1) * (CAST(o1 AS DOUBLE) - exp1)
        |    / v, 6) > CAST('3.841' AS DOUBLE) AS significant
        |FROM a""".stripMargin,
    "q370_rdd" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100
        |      AS BIGINT)) AS DECIMAL(38,0)) AS y
        |  FROM orders GROUP BY 1),
        |side AS (
        |  SELECT x >= 0 AS treated, x,
        |    COALESCE(y, CAST(0 AS DECIMAL(38,0))) AS y
        |  FROM (SELECT c_custkey,
        |          CAST(CAST(c_acctbal AS DECIMAL(12,4)) * 100 AS BIGINT) AS x
        |        FROM customer) c
        |  LEFT JOIN spend ON c_custkey = o_custkey
        |  WHERE x >= -50000 AND x < 50000),
        |per AS (
        |  SELECT treated, COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sxc,
        |    CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxxc,
        |    CAST(SUM(y) AS DECIMAL(38,0)) AS syc,
        |    CAST(SUM(CAST(ROUND(CAST(x AS DOUBLE) / CAST('100.0' AS DOUBLE)
        |      * (CAST(y AS DOUBLE) / CAST('100000.0' AS DOUBLE)), 2)
        |      AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS sxy
        |  FROM side GROUP BY 1),
        |fits AS (
        |  SELECT treated, CAST(n AS BIGINT) AS n,
        |    ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sxc AS DOUBLE) / CAST('100.0' AS DOUBLE)
        |          * (CAST(syc AS DOUBLE) / CAST('100000.0' AS DOUBLE)))
        |      / (CAST(n AS DOUBLE) * (CAST(sxxc AS DOUBLE)
        |          / CAST('10000.0' AS DOUBLE))
        |        - CAST(sxc AS DOUBLE) / CAST('100.0' AS DOUBLE)
        |          * (CAST(sxc AS DOUBLE) / CAST('100.0' AS DOUBLE))), 8)
        |      AS slope,
        |    ROUND((CAST(syc AS DOUBLE) / CAST('100000.0' AS DOUBLE)
        |        - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |            - CAST(sxc AS DOUBLE) / CAST('100.0' AS DOUBLE)
        |              * (CAST(syc AS DOUBLE) / CAST('100000.0' AS DOUBLE)))
        |          / (CAST(n AS DOUBLE) * (CAST(sxxc AS DOUBLE)
        |              / CAST('10000.0' AS DOUBLE))
        |            - CAST(sxc AS DOUBLE) / CAST('100.0' AS DOUBLE)
        |              * (CAST(sxc AS DOUBLE) / CAST('100.0' AS DOUBLE))))
        |          * (CAST(sxc AS DOUBLE) / CAST('100.0' AS DOUBLE)))
        |      / CAST(n AS DOUBLE) * CAST('1000.0' AS DOUBLE), 4)
        |      AS intercept_usd
        |  FROM per)
        |SELECT l.n AS n_left, r.n AS n_right,
        |  l.intercept_usd AS intercept_left,
        |  r.intercept_usd AS intercept_right,
        |  l.slope AS slope_left, r.slope AS slope_right,
        |  ROUND(r.intercept_usd - l.intercept_usd, 4) AS rdd_jump_usd
        |FROM (SELECT * FROM fits WHERE NOT treated) l,
        |     (SELECT * FROM fits WHERE treated) r""".stripMargin,
    "q373_mad_outliers" ->
      """WITH ord AS (
        |  SELECT o_orderpriority AS g,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS y
        |  FROM orders),
        |med AS (
        |  SELECT g, y AS med FROM (
        |    SELECT g, y, ROW_NUMBER() OVER (PARTITION BY g ORDER BY y) AS rn,
        |      COUNT(*) OVER (PARTITION BY g) AS nn
        |    FROM ord)
        |  WHERE rn = (nn + 1) // 2),
        |dev AS (
        |  SELECT ord.g, y, ABS(y - med) AS ad, med
        |  FROM ord JOIN med ON ord.g = med.g),
        |mad AS (
        |  SELECT g, ad AS mad FROM (
        |    SELECT g, ad, ROW_NUMBER() OVER (PARTITION BY g ORDER BY ad) AS rn,
        |      COUNT(*) OVER (PARTITION BY g) AS nn
        |    FROM dev)
        |  WHERE rn = (nn + 1) // 2)
        |SELECT dev.g, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(CAST(MAX(med) AS DOUBLE) / CAST('100.0' AS DOUBLE), 2)
        |    AS median_usd,
        |  ROUND(CAST(MAX(mad) AS DOUBLE) / CAST('100.0' AS DOUBLE), 2)
        |    AS mad_usd,
        |  CAST(SUM(CASE WHEN ABS(CAST('0.6745' AS DOUBLE)
        |      * CAST(y - med AS DOUBLE) / CAST(mad AS DOUBLE))
        |      > CAST('3.5' AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev JOIN mad ON dev.g = mad.g
        |GROUP BY dev.g
        |ORDER BY dev.g""".stripMargin,
    "q374_lorenz_curve" ->
      """WITH spend AS (
        |  SELECT o_custkey, c_mktsegment AS seg,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100
        |      AS BIGINT)) AS DECIMAL(38,0)) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT seg,
        |    ROW_NUMBER() OVER (PARTITION BY seg ORDER BY y, o_custkey) AS rn,
        |    SUM(y) OVER (PARTITION BY seg ORDER BY y, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    COUNT(*) OVER (PARTITION BY seg) AS n,
        |    SUM(y) OVER (PARTITION BY seg) AS tot
        |  FROM spend)
        |SELECT seg, ((rn - 1) * 10) // n AS decile,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  ROUND(CAST(MAX(cum) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE), 6)
        |    AS cum_share
        |FROM r
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q318_ldiversity" ->
      """WITH cls AS (
        |  SELECT c_nationkey, FLOOR(CAST(c_acctbal AS DOUBLE) / 1000.0) AS b1,
        |    COUNT(*) AS sz, COUNT(DISTINCT c_mktsegment) AS l
        |  FROM customer GROUP BY 1, 2),
        |req AS (SELECT CAST(u.r AS BIGINT) AS l_req
        |        FROM (VALUES (2), (3), (5)) u(r))
        |SELECT l_req, CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(SUM(CASE WHEN l < l_req THEN 1 ELSE 0 END) AS BIGINT)
        |    AS classes_below,
        |  CAST(SUM(CASE WHEN l < l_req THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_below,
        |  CAST(SUM(sz) AS BIGINT) AS n_rows,
        |  ROUND(CAST(SUM(CASE WHEN l < l_req THEN sz ELSE 0 END) AS DOUBLE)
        |        / CAST(SUM(sz) AS DOUBLE), 6) AS risk_pct
        |FROM cls, req GROUP BY 1 ORDER BY l_req""".stripMargin,
    "q319_fd_discovery" -> fdDiscoverySql,
    "q323_srm" ->
      """WITH b AS (
        |  SELECT ((((o_orderkey % 2147483647) * 48271) % 2147483647 + 1)
        |          * 16807) % 2147483647 % 10000 AS bk
        |  FROM orders),
        |a AS (SELECT COUNT(*) AS n,
        |  SUM(CASE WHEN bk % 2 = 0 THEN 1 ELSE 0 END) AS ev,
        |  SUM(CASE WHEN bk < 9000 THEN 1 ELSE 0 END) AS bg FROM b),
        |rows2 AS (
        |  SELECT '50/50' AS design, CAST(n AS BIGINT) AS n,
        |    CAST(ev AS BIGINT) AS arm_a, CAST(n - ev AS BIGINT) AS arm_b,
        |    ROUND(CAST(n AS DOUBLE) * CAST('0.5' AS DOUBLE), 6) AS expected_a,
        |    ROUND(CAST((ev - (n - ev)) * (ev - (n - ev)) AS DOUBLE)
        |          / CAST(n AS DOUBLE), 6) AS chi2
        |  FROM a
        |  UNION ALL
        |  SELECT '90/10', CAST(n AS BIGINT), CAST(bg AS BIGINT),
        |    CAST(n - bg AS BIGINT),
        |    ROUND(CAST(n AS DOUBLE) * CAST('0.9' AS DOUBLE), 6),
        |    ROUND(CAST((10 * bg - 9 * n) * (10 * bg - 9 * n) AS DOUBLE)
        |          / CAST(9 * n AS DOUBLE), 6)
        |  FROM a)
        |SELECT design, n, arm_a, arm_b, expected_a, chi2,
        |  chi2 > CAST('3.841' AS DOUBLE) AS srm
        |FROM rows2 ORDER BY design""".stripMargin,
    "q324_pinball" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, value,
        |    ((((event_id % 2147483647) * 48271) % 2147483647 + 1)
        |     * 16807) % 2147483647 % 10000 < 5000 AS isfit
        |  FROM events),
        |fit AS (
        |  SELECT event_type, event_id, value,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS BIGINT) AS rn
        |  FROM ev WHERE isfit),
        |nf AS (SELECT event_type, MAX(rn) AS nf FROM fit GROUP BY 1),
        |qh AS (
        |  SELECT fit.event_type, MAX(nf) AS n_fit,
        |    MAX(CASE WHEN rn = LEAST((5 * (nf + 1) + 9) // 10, nf)
        |        THEN value END) AS qhat50,
        |    MAX(CASE WHEN rn = LEAST((9 * (nf + 1) + 9) // 10, nf)
        |        THEN value END) AS qhat90
        |  FROM fit JOIN nf USING (event_type) GROUP BY 1)
        |SELECT ev.event_type, CAST(MAX(n_fit) AS BIGINT) AS n_fit,
        |  CAST(COUNT(*) AS BIGINT) AS n_eval,
        |  ROUND(MAX(qhat50), 6) AS qhat50, ROUND(MAX(qhat90), 6) AS qhat90,
        |  ROUND(CAST(CAST(SUM(CASE
        |      WHEN CAST(value AS DECIMAL(18,4)) >= CAST(qhat50 AS DECIMAL(18,4))
        |      THEN 5 * (CAST(value AS DECIMAL(18,4)) - CAST(qhat50 AS DECIMAL(18,4)))
        |      ELSE 5 * (CAST(qhat50 AS DECIMAL(18,4)) - CAST(value AS DECIMAL(18,4)))
        |      END) AS DECIMAL(38,4)) AS DOUBLE)
        |    / CAST('10.0' AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS loss50,
        |  ROUND(CAST(CAST(SUM(CASE
        |      WHEN CAST(value AS DECIMAL(18,4)) >= CAST(qhat90 AS DECIMAL(18,4))
        |      THEN 9 * (CAST(value AS DECIMAL(18,4)) - CAST(qhat90 AS DECIMAL(18,4)))
        |      ELSE 1 * (CAST(qhat90 AS DECIMAL(18,4)) - CAST(value AS DECIMAL(18,4)))
        |      END) AS DECIMAL(38,4)) AS DOUBLE)
        |    / CAST('10.0' AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS loss90,
        |  ROUND(CAST(SUM(CASE WHEN value <= qhat90 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS cover90
        |FROM ev JOIN qh USING (event_type) WHERE NOT isfit
        |GROUP BY 1 ORDER BY ev.event_type""".stripMargin,
    "q325_disparate_impact" ->
      """WITH pos AS (SELECT DISTINCT o_custkey FROM orders
        |             WHERE o_orderpriority = '1-URGENT'),
        |per AS (
        |  SELECT c_mktsegment, COUNT(*) AS n,
        |    SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS np
        |  FROM customer LEFT JOIN pos ON c_custkey = o_custkey GROUP BY 1),
        |r AS (SELECT c_mktsegment, n, np,
        |        CAST(np AS DOUBLE) / CAST(n AS DOUBLE) AS rate FROM per),
        |m AS (SELECT MAX(rate) AS mr FROM r)
        |SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
        |  CAST(np AS BIGINT) AS n_selected,
        |  ROUND(rate, 6) AS rate, ROUND(rate / mr, 6) AS di_ratio,
        |  ROUND(rate / mr, 6) < CAST('0.8' AS DOUBLE) AS below_four_fifths
        |FROM r, m ORDER BY c_mktsegment""".stripMargin,
    "q332_kfold_cv" ->
      """WITH ev AS (
        |  SELECT event_type, value,
        |    ((((event_id % 2147483647) * 48271) % 2147483647 + 1)
        |     * 16807) % 2147483647 % 10000 // 2000 AS fold
        |  FROM events),
        |ptf AS (
        |  SELECT event_type, fold, SUM(CAST(value AS DECIMAL(18,4))) AS sf,
        |    COUNT(*) AS nf
        |  FROM ev GROUP BY 1, 2),
        |pt AS (SELECT event_type, SUM(sf) AS st, SUM(nf) AS nt
        |       FROM ptf GROUP BY 1),
        |mu AS (
        |  SELECT event_type, fold,
        |    CAST(st - sf AS DOUBLE) / CAST(nt - nf AS DOUBLE) AS mu
        |  FROM ptf JOIN pt USING (event_type)),
        |folds AS (
        |  SELECT fold, COUNT(*) AS ne,
        |    ROUND(CAST(SUM(CAST(ROUND(ABS(value - mu), 6) AS DECIMAL(18,6)))
        |               AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mae
        |  FROM ev JOIN mu USING (event_type, fold) GROUP BY 1),
        |red AS (
        |  SELECT SUM(ne) AS ne, COUNT(*) AS k,
        |    CAST(SUM(CAST(mae AS DECIMAL(18,6))) AS DOUBLE) AS s1,
        |    CAST(CAST(SUM(CAST(mae AS DECIMAL(18,6)) * CAST(mae AS DECIMAL(18,6)))
        |         AS DECIMAL(38,6)) AS DOUBLE) AS s2
        |  FROM folds)
        |SELECT * FROM (
        |  SELECT CAST(fold AS BIGINT) AS fold, CAST(ne AS BIGINT) AS n_eval,
        |    mae, CAST(NULL AS DOUBLE) AS mae_sd
        |  FROM folds
        |  UNION ALL
        |  SELECT -1, CAST(ne AS BIGINT),
        |    ROUND(s1 / CAST(k AS DOUBLE), 6),
        |    ROUND(SQRT((s2 - s1 * s1 / CAST(k AS DOUBLE))
        |          / (CAST(k AS DOUBLE) - CAST('1.0' AS DOUBLE))), 6)
        |  FROM red)
        |ORDER BY fold""".stripMargin,
    "q333_psi" ->
      """WITH ev AS (
        |  SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
        |    CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events),
        |rng AS (SELECT (MIN(t) + MAX(t)) // 2 AS mid FROM ev),
        |b AS (
        |  SELECT LEAST(9, CAST(v * 100 AS BIGINT) // 3300) AS bin,
        |    SUM(CASE WHEN t < mid THEN 1 ELSE 0 END) AS nb,
        |    SUM(CASE WHEN t >= mid THEN 1 ELSE 0 END) AS nc
        |  FROM ev, rng GROUP BY 1),
        |tt AS (SELECT SUM(nb) AS tb, SUM(nc) AS tc FROM b),
        |rows2 AS (
        |  SELECT bin, CAST(nb AS BIGINT) AS n_base, CAST(nc AS BIGINT) AS n_cur,
        |    ROUND(CAST(nb + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE), 6) AS p_base,
        |    ROUND(CAST(nc + 1 AS DOUBLE) / CAST(tc + 10 AS DOUBLE), 6) AS p_cur,
        |    CAST(ROUND((CAST(nb + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE)
        |         - CAST(nc + 1 AS DOUBLE) / CAST(tc + 10 AS DOUBLE))
        |      * LN((CAST(nb + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE))
        |          / (CAST(nc + 1 AS DOUBLE) / CAST(tc + 10 AS DOUBLE))), 6)
        |      AS DECIMAL(18,6)) AS c6
        |  FROM b, tt),
        |ps AS (SELECT ROUND(CAST(SUM(c6) AS DOUBLE), 6) AS psi FROM rows2)
        |SELECT * FROM (
        |  SELECT bin, n_base, n_cur, p_base, p_cur,
        |    CAST(c6 AS DOUBLE) AS contribution, CAST(NULL AS DOUBLE) AS psi
        |  FROM rows2
        |  UNION ALL
        |  SELECT -1, CAST(SUM(n_base) AS BIGINT), CAST(SUM(n_cur) AS BIGINT),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    (SELECT psi FROM ps)
        |  FROM rows2)
        |ORDER BY bin""".stripMargin,
    "q334_cohens_d" ->
      """WITH mom AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DECIMAL(38,4))
        |      AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))
        |      * CAST(value AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE)
        |      AS syy
        |  FROM events GROUP BY 1)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
        |  ROUND(a.sy / CAST(a.n AS DOUBLE), 6) AS mean_a,
        |  ROUND(b.sy / CAST(b.n AS DOUBLE), 6) AS mean_b,
        |  ROUND((a.sy / CAST(a.n AS DOUBLE) - b.sy / CAST(b.n AS DOUBLE))
        |    / SQRT(((CAST(a.n AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |        * ((a.syy - a.sy * a.sy / CAST(a.n AS DOUBLE))
        |           / (CAST(a.n AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |      + (CAST(b.n AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |        * ((b.syy - b.sy * b.sy / CAST(b.n AS DOUBLE))
        |           / (CAST(b.n AS DOUBLE) - CAST('1.0' AS DOUBLE))))
        |      / (CAST(a.n AS DOUBLE) + CAST(b.n AS DOUBLE)
        |         - CAST('2.0' AS DOUBLE))), 6) AS cohens_d
        |FROM mom a JOIN mom b ON a.event_type < b.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    "q359_qini_curve" ->
      """WITH items AS (SELECT l_orderkey, COUNT(*) AS ly
        |               FROM lineitem GROUP BY 1),
        |ord AS (
        |  SELECT o_orderpriority = '1-URGENT' AS tr, ly >= 4 AS y,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |      // 1000 AS b
        |  FROM orders JOIN items ON o_orderkey = l_orderkey),
        |grid AS (
        |  SELECT b, COUNT(*) AS n,
        |    SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS nt,
        |    SUM(CASE WHEN tr AND y THEN 1 ELSE 0 END) AS yt,
        |    SUM(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS nc,
        |    SUM(CASE WHEN NOT tr AND y THEN 1 ELSE 0 END) AS yc
        |  FROM ord GROUP BY 1),
        |cum AS (
        |  SELECT SUM(n) OVER w AS cn, SUM(nt) OVER w AS cnt,
        |    SUM(yt) OVER w AS cyt, SUM(nc) OVER w AS cnc,
        |    SUM(yc) OVER w AS cyc
        |  FROM grid
        |  WINDOW w AS (ORDER BY b DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT SUM(n) AS nn FROM grid),
        |decs AS (SELECT CAST(u.d AS BIGINT) AS dd
        |         FROM unnest(range(1, 11)) u(d)),
        |picks AS (
        |  SELECT dd, MIN(cn) AS cn
        |  FROM cum, tot, decs WHERE cn * 10 >= dd * nn GROUP BY 1),
        |at2 AS (SELECT picks.dd, cum.* FROM picks JOIN cum USING (cn)),
        |full2 AS (
        |  SELECT CASE WHEN cnc = 0 THEN CAST(cyt AS DOUBLE)
        |    ELSE CAST(cyt AS DOUBLE) - CAST(cyc AS DOUBLE)
        |      * CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE) END AS qtot
        |  FROM at2 WHERE dd = 10)
        |SELECT CAST(dd AS BIGINT) AS decile, CAST(cn AS BIGINT) AS n_cum,
        |  CAST(cnt AS BIGINT) AS nt_cum, CAST(cyt AS BIGINT) AS yt_cum,
        |  CAST(cnc AS BIGINT) AS nc_cum, CAST(cyc AS BIGINT) AS yc_cum,
        |  ROUND(CASE WHEN cnc = 0 THEN CAST(cyt AS DOUBLE)
        |    ELSE CAST(cyt AS DOUBLE) - CAST(cyc AS DOUBLE)
        |      * CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE) END, 6) AS qini,
        |  ROUND((CASE WHEN cnc = 0 THEN CAST(cyt AS DOUBLE)
        |    ELSE CAST(cyt AS DOUBLE) - CAST(cyc AS DOUBLE)
        |      * CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE) END)
        |    - qtot * CAST(dd AS DOUBLE) / CAST('10.0' AS DOUBLE), 6)
        |    AS above_random
        |FROM at2, full2 ORDER BY decile""".stripMargin,
    "q355_laplace_mechanism" ->
      """WITH per AS (SELECT c_nationkey, COUNT(*) AS c
        |             FROM customer GROUP BY 1),
        |n AS (
        |  SELECT c_nationkey, c,
        |    (CAST((((CAST(c_nationkey AS BIGINT) % 2147483647) * 48271)
        |        % 2147483647 + 1) * 16807 % 2147483647 AS DOUBLE)
        |      + CAST('0.5' AS DOUBLE))
        |      / CAST('2147483647.0' AS DOUBLE) AS u
        |  FROM per),
        |z AS (
        |  SELECT c_nationkey, c,
        |    ROUND(-CAST('2.0' AS DOUBLE) * SIGN(u - CAST('0.5' AS DOUBLE))
        |      * LN(CAST('1.0' AS DOUBLE)
        |        - CAST('2.0' AS DOUBLE) * ABS(u - CAST('0.5' AS DOUBLE))), 6)
        |      AS noise
        |  FROM n)
        |SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |  CAST(c AS BIGINT) AS true_count, noise,
        |  ROUND(GREATEST(CAST(c AS DOUBLE) + noise, CAST('0.0' AS DOUBLE)), 6)
        |    AS released_count,
        |  CAST('0.5' AS DOUBLE) AS epsilon, CAST(1 AS BIGINT) AS sensitivity
        |FROM z ORDER BY nation""".stripMargin,
    "q356_cell_suppression" -> cellSuppressionSql,
    "q357_nelson_aalen" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    MIN(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)) AS m0,
        |    MAX(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)) AS ml
        |  FROM orders GROUP BY 1),
        |h AS (SELECT MAX(ml) AS mmax FROM per),
        |durs AS (
        |  SELECT CASE WHEN mmax - ml > 6 THEN CAST(ml - m0 AS BIGINT)
        |              ELSE CAST(mmax - m0 AS BIGINT) END AS dur,
        |         CASE WHEN mmax - ml > 6 THEN 1 ELSE 0 END AS death
        |  FROM per, h),
        |grid AS (SELECT dur, CAST(SUM(death) AS BIGINT) AS n_deaths,
        |                CAST(SUM(1 - death) AS BIGINT) AS n_censored
        |         FROM durs GROUP BY dur),
        |g2 AS (SELECT dur, n_deaths, n_censored,
        |         SUM(n_deaths + n_censored) OVER () AS total,
        |         COALESCE(SUM(n_deaths + n_censored) OVER (ORDER BY dur
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
        |       FROM grid),
        |g3 AS (SELECT dur, n_deaths, n_censored,
        |              CAST(total - prev AS BIGINT) AS n_risk FROM g2),
        |g4 AS (SELECT *,
        |         CAST(ROUND(CAST(n_deaths AS DOUBLE)
        |           / CAST(n_risk AS DOUBLE), 6) AS DECIMAL(18,6)) AS h6
        |       FROM g3)
        |SELECT dur AS dur_months, n_risk, n_deaths, n_censored,
        |  CAST(h6 AS DOUBLE) AS hazard,
        |  ROUND(CAST(SUM(h6) OVER (ORDER BY dur
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
        |    AS cum_hazard
        |FROM g4 ORDER BY dur_months""".stripMargin,
    "q352_james_stein" ->
      """WITH pos AS (SELECT DISTINCT o_custkey FROM orders
        |             WHERE o_orderpriority = '1-URGENT'),
        |per AS (
        |  SELECT c_mktsegment, COUNT(*) AS n,
        |    SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS y
        |  FROM customer LEFT JOIN pos ON c_custkey = o_custkey GROUP BY 1),
        |tot AS (SELECT SUM(n) AS nt, SUM(y) AS yt, COUNT(*) AS k FROM per),
        |tau AS (
        |  SELECT GREATEST(
        |    CAST(SUM(CAST(ROUND((CAST(y AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (CAST(y AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE)), 12)
        |      AS DECIMAL(20,12))) AS DOUBLE)
        |      / (CAST(MAX(k) AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |    - CAST(SUM(CAST(ROUND((CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE))
        |        * (CAST('1.0' AS DOUBLE) - CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE))
        |        / CAST(n AS DOUBLE), 12) AS DECIMAL(20,12))) AS DOUBLE)
        |      / CAST(MAX(k) AS DOUBLE),
        |    CAST('0.0' AS DOUBLE)) AS tau2
        |  FROM per, tot)
        |SELECT c_mktsegment, CAST(n AS BIGINT) AS n, CAST(y AS BIGINT) AS y,
        |  ROUND(CAST(y AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
        |  ROUND(CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS grand_rate,
        |  ROUND((CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (CAST('1.0' AS DOUBLE) - CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE))
        |      / CAST(n AS DOUBLE)
        |    / ((CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (CAST('1.0' AS DOUBLE) - CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE))
        |      / CAST(n AS DOUBLE) + tau2), 6) AS shrink_b,
        |  ROUND(CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE)
        |    + (CAST('1.0' AS DOUBLE)
        |      - (CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE))
        |        * (CAST('1.0' AS DOUBLE) - CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE))
        |        / CAST(n AS DOUBLE)
        |      / ((CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE))
        |        * (CAST('1.0' AS DOUBLE) - CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE))
        |        / CAST(n AS DOUBLE) + tau2))
        |    * (CAST(y AS DOUBLE) / CAST(n AS DOUBLE)
        |      - CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE)), 6) AS shrunk_rate
        |FROM per, tot, tau ORDER BY c_mktsegment""".stripMargin,
    "q353_delta_method" ->
      """WITH per AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN event_type = 'purchase'
        |        THEN CAST(value AS DECIMAL(18,4))
        |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS yu,
        |    COUNT(*) AS xu
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(CAST(SUM(yu) AS DECIMAL(38,4)) AS DOUBLE) AS sy,
        |    CAST(SUM(xu) AS BIGINT) AS sx,
        |    CAST(CAST(SUM(yu * yu) AS DECIMAL(38,4)) AS DOUBLE) AS syy,
        |    CAST(CAST(SUM(yu * xu) AS DECIMAL(38,4)) AS DOUBLE) AS syx,
        |    CAST(SUM(xu * xu) AS BIGINT) AS sxx
        |  FROM per)
        |SELECT CAST(n AS BIGINT) AS n_users, sx AS n_events,
        |  ROUND(sy / CAST(sx AS DOUBLE), 6) AS ratio,
        |  ROUND(SQRT((syy - CAST('2.0' AS DOUBLE) * (sy / CAST(sx AS DOUBLE)) * syx
        |      + (sy / CAST(sx AS DOUBLE)) * (sy / CAST(sx AS DOUBLE))
        |        * CAST(sxx AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)) / CAST(n AS DOUBLE)
        |    / ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))), 6) AS se_delta,
        |  ROUND(sy / CAST(sx AS DOUBLE) - CAST('1.96' AS DOUBLE)
        |    * SQRT((syy - CAST('2.0' AS DOUBLE) * (sy / CAST(sx AS DOUBLE)) * syx
        |      + (sy / CAST(sx AS DOUBLE)) * (sy / CAST(sx AS DOUBLE))
        |        * CAST(sxx AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)) / CAST(n AS DOUBLE)
        |    / ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))), 6) AS ci_lo,
        |  ROUND(sy / CAST(sx AS DOUBLE) + CAST('1.96' AS DOUBLE)
        |    * SQRT((syy - CAST('2.0' AS DOUBLE) * (sy / CAST(sx AS DOUBLE)) * syx
        |      + (sy / CAST(sx AS DOUBLE)) * (sy / CAST(sx AS DOUBLE))
        |        * CAST(sxx AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE)) / CAST(n AS DOUBLE)
        |    / ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))), 6) AS ci_hi
        |FROM m""".stripMargin,
    "q346_permutation_test" ->
      """WITH ev AS (
        |  SELECT event_id, CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |obs AS (
        |  SELECT
        |    ((((event_id % 2147483647) * 48271) % 2147483647 + 1)
        |     * 16807) % 2147483647 % 10000 % 2 = 0 AS a,
        |    COUNT(*) AS n, SUM(v) AS sv
        |  FROM ev GROUP BY 1),
        |o AS (
        |  SELECT x.n AS na, y.n AS nb,
        |    CAST(x.sv AS DOUBLE) / CAST(x.n AS DOUBLE)
        |      - CAST(y.sv AS DOUBLE) / CAST(y.n AS DOUBLE) AS dobs,
        |    CAST(x.sv AS DOUBLE) / CAST(x.n AS DOUBLE) AS ma,
        |    CAST(y.sv AS DOUBLE) / CAST(y.n AS DOUBLE) AS mb
        |  FROM (SELECT * FROM obs WHERE a) x, (SELECT * FROM obs WHERE NOT a) y),
        |reps AS (SELECT CAST(u.r AS BIGINT) AS rep
        |         FROM unnest(range(1, 33)) u(r)),
        |perm AS (
        |  SELECT rep,
        |    SUM(CASE WHEN (((((event_id + rep) % 2147483647) * 48271)
        |        % 2147483647 + 1) * 16807) % 2147483647 % 2 = 0
        |      THEN v END) AS sva,
        |    SUM(CASE WHEN (((((event_id + rep) % 2147483647) * 48271)
        |        % 2147483647 + 1) * 16807) % 2147483647 % 2 = 0
        |      THEN 1 ELSE 0 END) AS na,
        |    SUM(CASE WHEN (((((event_id + rep) % 2147483647) * 48271)
        |        % 2147483647 + 1) * 16807) % 2147483647 % 2 <> 0
        |      THEN v END) AS svb,
        |    SUM(CASE WHEN (((((event_id + rep) % 2147483647) * 48271)
        |        % 2147483647 + 1) * 16807) % 2147483647 % 2 <> 0
        |      THEN 1 ELSE 0 END) AS nb
        |  FROM ev, reps GROUP BY 1),
        |ext AS (
        |  SELECT CAST(SUM(CASE
        |    WHEN ABS(CAST(perm.sva AS DOUBLE) / CAST(perm.na AS DOUBLE)
        |      - CAST(perm.svb AS DOUBLE) / CAST(perm.nb AS DOUBLE))
        |      >= ABS(o.dobs)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        |  FROM perm, o)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
        |  ROUND(dobs, 6) AS diff_obs,
        |  CAST(32 AS BIGINT) AS n_perms, n_extreme,
        |  ROUND(CAST(n_extreme + 1 AS DOUBLE) / CAST('33.0' AS DOUBLE), 6)
        |    AS p_value
        |FROM o, ext""".stripMargin,
    "q341_group_sequential" ->
      """WITH items AS (SELECT l_orderkey, COUNT(*) AS ly
        |               FROM lineitem GROUP BY 1),
        |ord AS (
        |  SELECT o_orderkey,
        |    CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT) AS t,
        |    ly >= 4 AS y,
        |    ((((o_orderkey % 2147483647) * 48271) % 2147483647 + 1)
        |     * 16807) % 2147483647 % 10000 % 2 = 0 AS arma
        |  FROM orders JOIN items ON o_orderkey = l_orderkey),
        |rng AS (SELECT MIN(t) AS t0, MAX(t) AS t1 FROM ord),
        |lk AS (
        |  SELECT LEAST(4, 5 * (t - t0) // (t1 - t0 + 1)) AS lk, y, arma
        |  FROM ord, rng),
        |looks AS (
        |  SELECT lk,
        |    SUM(CASE WHEN arma THEN 1 ELSE 0 END) AS na,
        |    SUM(CASE WHEN NOT arma THEN 1 ELSE 0 END) AS nb,
        |    SUM(CASE WHEN arma AND y THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN NOT arma AND y THEN 1 ELSE 0 END) AS cb
        |  FROM lk GROUP BY 1),
        |cum AS (
        |  SELECT lk + 1 AS k,
        |    SUM(na) OVER w AS na, SUM(nb) OVER w AS nb,
        |    SUM(ca) OVER w AS ca, SUM(cb) OVER w AS cb
        |  FROM looks
        |  WINDOW w AS (ORDER BY lk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT CAST(k AS BIGINT) AS look, CAST(na AS BIGINT) AS n_a,
        |  CAST(nb AS BIGINT) AS n_b, CAST(ca AS BIGINT) AS conv_a,
        |  CAST(cb AS BIGINT) AS conv_b,
        |  ROUND((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
        |    - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
        |    / SQRT((CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
        |      * (CAST('1.0' AS DOUBLE)
        |         - CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
        |      * (CAST('1.0' AS DOUBLE) / CAST(na AS DOUBLE)
        |        + CAST('1.0' AS DOUBLE) / CAST(nb AS DOUBLE))), 6) AS z,
        |  ROUND(CAST('2.04' AS DOUBLE)
        |    * SQRT(CAST('5.0' AS DOUBLE) / CAST(k AS DOUBLE)), 6) AS boundary,
        |  ABS(ROUND((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
        |    - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
        |    / SQRT((CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
        |      * (CAST('1.0' AS DOUBLE)
        |         - CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
        |      * (CAST('1.0' AS DOUBLE) / CAST(na AS DOUBLE)
        |        + CAST('1.0' AS DOUBLE) / CAST(nb AS DOUBLE))), 6))
        |    > ROUND(CAST('2.04' AS DOUBLE)
        |      * SQRT(CAST('5.0' AS DOUBLE) / CAST(k AS DOUBLE)), 6) AS crossed
        |FROM cum ORDER BY look""".stripMargin,
    "q342_mann_kendall" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 AS h,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |srel AS (
        |  SELECT a.event_type, CAST(SUM(SIGN(b.c - a.c)) AS BIGINT) AS s
        |  FROM hourly a JOIN hourly b
        |    ON a.event_type = b.event_type AND a.h < b.h
        |  GROUP BY 1),
        |nrel AS (SELECT event_type, COUNT(*) AS n FROM hourly GROUP BY 1),
        |ties AS (
        |  SELECT event_type,
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
        |  FROM (SELECT event_type, c, COUNT(*) AS t FROM hourly GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_hours, s,
        |  ROUND(CAST(n * (n - 1) * (2 * n + 5) - tsum AS DOUBLE)
        |    / CAST('18.0' AS DOUBLE), 6) AS var_s,
        |  ROUND(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
        |      / SQRT(CAST(n * (n - 1) * (2 * n + 5) - tsum AS DOUBLE)
        |             / CAST('18.0' AS DOUBLE))
        |    WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
        |      / SQRT(CAST(n * (n - 1) * (2 * n + 5) - tsum AS DOUBLE)
        |             / CAST('18.0' AS DOUBLE))
        |    ELSE 0.0 END, 6) AS z,
        |  ABS(ROUND(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
        |      / SQRT(CAST(n * (n - 1) * (2 * n + 5) - tsum AS DOUBLE)
        |             / CAST('18.0' AS DOUBLE))
        |    WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
        |      / SQRT(CAST(n * (n - 1) * (2 * n + 5) - tsum AS DOUBLE)
        |             / CAST('18.0' AS DOUBLE))
        |    ELSE 0.0 END, 6)) > CAST('1.96' AS DOUBLE) AS trending
        |FROM srel JOIN nrel USING (event_type) JOIN ties USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "q344_qte" ->
      """WITH ord AS (
        |  SELECT o_orderpriority = '1-URGENT' AS tr,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |      // 1000 AS b,
        |    COUNT(*) AS c
        |  FROM orders GROUP BY 1, 2),
        |decs AS (SELECT CAST(u.d AS BIGINT) AS dd
        |         FROM unnest(range(1, 10)) AS u(d)),
        |cum AS (
        |  SELECT tr, b,
        |    SUM(c) OVER (PARTITION BY tr ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM ord),
        |tot AS (SELECT tr, SUM(c) AS n FROM ord GROUP BY 1),
        |qs AS (
        |  SELECT tr, dd, MIN(b) AS qb
        |  FROM cum JOIN tot USING (tr), decs
        |  WHERE cum * 10 >= dd * n GROUP BY 1, 2)
        |SELECT t.dd AS decile,
        |  ROUND(CAST(t.qb AS DOUBLE) * CAST('10.0' AS DOUBLE), 2) AS q_treated,
        |  ROUND(CAST(c.qb AS DOUBLE) * CAST('10.0' AS DOUBLE), 2) AS q_control,
        |  ROUND(CAST(t.qb - c.qb AS DOUBLE) * CAST('10.0' AS DOUBLE), 2) AS qte
        |FROM (SELECT dd, qb FROM qs WHERE tr) t
        |JOIN (SELECT dd, qb FROM qs WHERE NOT tr) c USING (dd)
        |ORDER BY decile""".stripMargin,
    "q340_stratified_ate" ->
      """WITH items AS (SELECT l_orderkey, COUNT(*) AS y
        |               FROM lineitem GROUP BY 1),
        |ord AS (
        |  SELECT o_orderkey, o_orderpriority = '1-URGENT' AS tr,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents,
        |    y
        |  FROM orders JOIN items ON o_orderkey = l_orderkey),
        |strata AS (
        |  SELECT cents // 50000 AS stratum, COUNT(*) AS n,
        |    SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS nt,
        |    SUM(CASE WHEN tr THEN y ELSE 0 END) AS syt,
        |    SUM(CASE WHEN NOT tr THEN y ELSE 0 END) AS syc
        |  FROM ord GROUP BY 1),
        |used AS (SELECT * FROM strata WHERE nt > 0 AND nt < n),
        |nu AS (SELECT SUM(n) AS nu, COUNT(*) AS k_used FROM used),
        |terms AS (
        |  SELECT CAST(SUM(CAST(ROUND(CAST(n AS DOUBLE) / CAST(nu AS DOUBLE)
        |    * (CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
        |       - CAST(syc AS DOUBLE) / CAST(n - nt AS DOUBLE)), 6)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS ate
        |  FROM used, nu),
        |g2 AS (
        |  SELECT COUNT(*) AS n, SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS nt,
        |    SUM(CASE WHEN tr THEN y ELSE 0 END) AS syt,
        |    SUM(CASE WHEN NOT tr THEN y ELSE 0 END) AS syc
        |  FROM ord),
        |ka AS (SELECT COUNT(*) AS k_all FROM strata)
        |SELECT CAST(n AS BIGINT) AS n_orders, CAST(nt AS BIGINT) AS n_treated,
        |  ROUND(CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
        |    - CAST(syc AS DOUBLE) / CAST(n - nt AS DOUBLE), 6) AS naive_diff,
        |  CAST(k_all AS BIGINT) AS n_strata,
        |  CAST(k_used AS BIGINT) AS n_strata_used,
        |  ROUND(CAST(nu AS DOUBLE) / CAST(n AS DOUBLE), 6) AS coverage,
        |  ROUND(ate, 6) AS ate_strat
        |FROM g2, terms, nu, ka""".stripMargin,
    "q327_att_matching" ->
      """WITH items AS (SELECT l_orderkey, COUNT(*) AS y
        |               FROM lineitem GROUP BY 1),
        |ord AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents,
        |    y
        |  FROM orders JOIN items ON o_orderkey = l_orderkey),
        |t AS (SELECT o_orderkey AS tid, cents AS tc, y AS ty,
        |        cents // 10000 AS tb0
        |      FROM ord WHERE o_orderpriority = '1-URGENT'),
        |c AS (SELECT o_orderkey AS cid, cents AS cc, y AS cy,
        |        cents // 10000 AS cb
        |      FROM ord WHERE o_orderpriority <> '1-URGENT'),
        |cand AS (
        |  SELECT tid, tc, ty, cid, cc, cy,
        |    ROW_NUMBER() OVER (PARTITION BY tid
        |      ORDER BY ABS(cc - tc), cc, cid) AS rn
        |  FROM t JOIN c ON c.cb BETWEEN t.tb0 - 1 AND t.tb0 + 1
        |  WHERE ABS(cc - tc) <= 10000),
        |p AS (SELECT * FROM cand WHERE rn = 1),
        |nt AS (SELECT COUNT(*) AS n_treated FROM t)
        |SELECT CAST(n_treated AS BIGINT) AS n_treated,
        |  CAST(COUNT(*) AS BIGINT) AS n_matched,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(n_treated AS DOUBLE), 6)
        |    AS match_rate,
        |  ROUND(CAST(SUM(ty - cy) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS att_lines,
        |  ROUND(CAST(SUM(ABS(cc - tc)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    / CAST('100.0' AS DOUBLE), 6) AS mean_price_gap
        |FROM p, nt GROUP BY n_treated""".stripMargin,
    "q328_jackknife_ratio" ->
      """WITH per AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN event_type = 'purchase'
        |        THEN CAST(value AS DECIMAL(18,4))
        |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS yu,
        |    COUNT(*) AS xu
        |  FROM events GROUP BY 1),
        |tot AS (SELECT SUM(yu) AS yy, SUM(xu) AS xx, COUNT(*) AS nu FROM per),
        |reps AS (
        |  SELECT CAST(ROUND(CAST(yy - yu AS DOUBLE)
        |    / CAST(xx - xu AS DOUBLE), 6) AS DECIMAL(18,6)) AS r6
        |  FROM per, tot),
        |red AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(r6) AS DOUBLE) AS s1,
        |    CAST(CAST(SUM(r6 * r6) AS DECIMAL(38,6)) AS DOUBLE) AS s2
        |  FROM reps)
        |SELECT CAST(nu AS BIGINT) AS n_users, CAST(xx AS BIGINT) AS n_events,
        |  ROUND(CAST(yy AS DOUBLE) / CAST(xx AS DOUBLE), 6) AS ratio,
        |  ROUND(SQRT((s2 - s1 * s1 / CAST(n AS DOUBLE))
        |    * (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |    / CAST(n AS DOUBLE)), 6) AS se_jack,
        |  ROUND(CAST(yy AS DOUBLE) / CAST(xx AS DOUBLE)
        |    - CAST('1.96' AS DOUBLE) * SQRT((s2 - s1 * s1 / CAST(n AS DOUBLE))
        |      * (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |      / CAST(n AS DOUBLE)), 6) AS ci_lo,
        |  ROUND(CAST(yy AS DOUBLE) / CAST(xx AS DOUBLE)
        |    + CAST('1.96' AS DOUBLE) * SQRT((s2 - s1 * s1 / CAST(n AS DOUBLE))
        |      * (CAST(n AS DOUBLE) - CAST('1.0' AS DOUBLE))
        |      / CAST(n AS DOUBLE)), 6) AS ci_hi
        |FROM red, tot""".stripMargin,
    "q331_two_proportion_z" ->
      """WITH pos AS (SELECT DISTINCT o_custkey FROM orders
        |             WHERE o_orderpriority = '1-URGENT'),
        |per AS (
        |  SELECT c_mktsegment, COUNT(*) AS n,
        |    SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS np
        |  FROM customer LEFT JOIN pos ON c_custkey = o_custkey GROUP BY 1),
        |tot AS (SELECT SUM(n) AS nt, SUM(np) AS npt FROM per)
        |SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
        |  CAST(np AS BIGINT) AS n_selected,
        |  ROUND(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
        |  ROUND(CAST(npt - np AS DOUBLE) / CAST(nt - n AS DOUBLE), 6)
        |    AS rest_rate,
        |  ROUND((CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |    - CAST(npt - np AS DOUBLE) / CAST(nt - n AS DOUBLE))
        |    / SQRT((CAST(npt AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (CAST('1.0' AS DOUBLE) - CAST(npt AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (CAST('1.0' AS DOUBLE) / CAST(n AS DOUBLE)
        |        + CAST('1.0' AS DOUBLE) / CAST(nt - n AS DOUBLE))), 6) AS z,
        |  ABS(ROUND((CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |    - CAST(npt - np AS DOUBLE) / CAST(nt - n AS DOUBLE))
        |    / SQRT((CAST(npt AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (CAST('1.0' AS DOUBLE) - CAST(npt AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (CAST('1.0' AS DOUBLE) / CAST(n AS DOUBLE)
        |        + CAST('1.0' AS DOUBLE) / CAST(nt - n AS DOUBLE))), 6))
        |    > CAST('1.96' AS DOUBLE) AS significant
        |FROM per, tot ORDER BY c_mktsegment""".stripMargin,
    "q312_quantile_normalization" ->
      """WITH vc AS (SELECT source, n_chars, COUNT(*) AS c
        |            FROM documents GROUP BY 1, 2),
        |decs AS (SELECT CAST(u.d AS BIGINT) AS dd
        |         FROM unnest(range(1, 10)) AS u(d)),
        |cums AS (
        |  SELECT source, n_chars,
        |    SUM(c) OVER (PARTITION BY source ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM vc),
        |tots AS (SELECT source, SUM(c) AS n FROM vc GROUP BY 1),
        |srcq AS (
        |  SELECT source, dd, MIN(n_chars) AS src_value
        |  FROM cums JOIN tots USING (source), decs
        |  WHERE cum * 10 >= dd * n GROUP BY 1, 2),
        |pooled AS (SELECT n_chars, SUM(c) AS cp FROM vc GROUP BY 1),
        |cump AS (
        |  SELECT n_chars,
        |    SUM(cp) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM pooled),
        |totp AS (SELECT SUM(cp) AS tn FROM pooled),
        |poolq AS (
        |  SELECT dd, MIN(n_chars) AS pooled_value
        |  FROM cump, totp, decs WHERE cum * 10 >= dd * tn GROUP BY 1)
        |SELECT source, dd AS decile,
        |  CAST(src_value AS BIGINT) AS src_value,
        |  CAST(pooled_value AS BIGINT) AS pooled_value,
        |  CAST(src_value - pooled_value AS BIGINT) AS shift
        |FROM srcq JOIN poolq USING (dd)
        |ORDER BY source, decile""".stripMargin,
    "q313_conformal_interval" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, value,
        |    CASE WHEN ((((event_id % 2147483647) * 48271) % 2147483647 + 1)
        |               * 16807) % 2147483647 % 10000 < 3333 THEN 'fit'
        |         WHEN ((((event_id % 2147483647) * 48271) % 2147483647 + 1)
        |               * 16807) % 2147483647 % 10000 < 6666 THEN 'cal'
        |         ELSE 'eval' END AS split
        |  FROM events),
        |mu AS (
        |  SELECT event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS mu
        |  FROM ev WHERE split = 'fit' GROUP BY 1),
        |cal AS (
        |  SELECT ev.event_type, event_id, ABS(value - mu) AS r,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY ev.event_type
        |      ORDER BY ABS(value - mu), event_id) AS BIGINT) AS rn
        |  FROM ev JOIN mu USING (event_type) WHERE split = 'cal'),
        |ncal AS (SELECT event_type, MAX(rn) AS ncal FROM cal GROUP BY 1),
        |qh AS (
        |  SELECT cal.event_type, r AS qhat, ncal
        |  FROM cal JOIN ncal USING (event_type)
        |  WHERE rn = LEAST((9 * (ncal + 1) + 9) // 10, ncal))
        |SELECT ev.event_type,
        |  CAST(MAX(ncal) AS BIGINT) AS n_cal,
        |  CAST(COUNT(*) AS BIGINT) AS n_eval,
        |  ROUND(MAX(mu), 6) AS mu,
        |  ROUND(MAX(qhat), 6) AS qhat,
        |  CAST(SUM(CASE WHEN ABS(value - mu) <= qhat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |  ROUND(CAST(SUM(CASE WHEN ABS(value - mu) <= qhat THEN 1 ELSE 0 END) AS DOUBLE)
        |        / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
        |FROM ev JOIN mu USING (event_type) JOIN qh USING (event_type)
        |WHERE split = 'eval' GROUP BY 1 ORDER BY ev.event_type""".stripMargin,
    "q311_join_cardinality" ->
      """WITH ck AS (SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |tot AS (SELECT SUM(c) AS n, COUNT(*) AS dk, SUM(c * c) AS actual FROM ck),
        |topa AS (
        |  SELECT SUM(c) AS topn, COUNT(*) AS topk, SUM(c * c) AS topsq
        |  FROM (SELECT c FROM ck ORDER BY c DESC, l_partkey LIMIT 100)),
        |u AS (SELECT * FROM tot, topa)
        |SELECT x.estimator,
        |  CASE x.estimator
        |    WHEN 'heavy_hitter' THEN ROUND(CAST(topsq AS DOUBLE)
        |      + CAST(n - topn AS DOUBLE) * CAST(n - topn AS DOUBLE) / CAST(dk - topk AS DOUBLE), 4)
        |    ELSE ROUND(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) / CAST(dk AS DOUBLE), 4)
        |  END AS est,
        |  CAST(actual AS BIGINT) AS actual,
        |  CASE x.estimator
        |    WHEN 'heavy_hitter' THEN ROUND(((CAST(topsq AS DOUBLE)
        |      + CAST(n - topn AS DOUBLE) * CAST(n - topn AS DOUBLE) / CAST(dk - topk AS DOUBLE))
        |      - CAST(actual AS DOUBLE)) / CAST(actual AS DOUBLE), 6)
        |    ELSE ROUND((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) / CAST(dk AS DOUBLE)
        |      - CAST(actual AS DOUBLE)) / CAST(actual AS DOUBLE), 6)
        |  END AS rel_err
        |FROM u, unnest(['heavy_hitter', 'uniform']) AS x(estimator)
        |ORDER BY x.estimator""".stripMargin,
    "q305_voptimal_histogram" ->
      """WITH ev AS (SELECT value AS v FROM events),
        |mm AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM ev),
        |binned AS (
        |  SELECT LEAST(19, CAST(FLOOR((v - lo) / (hi - lo) * 20.0) AS BIGINT)) AS bin,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS s1,
        |    CAST(SUM(CAST(v AS DECIMAL(12,4)) * CAST(v AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS s2
        |  FROM ev, mm GROUP BY 1),
        |cum AS MATERIALIZED (
        |  SELECT bin,
        |    SUM(n) OVER w AS cn,
        |    CAST(SUM(s1) OVER w AS DECIMAL(38,4)) AS cs1,
        |    CAST(SUM(s2) OVER w AS DECIMAL(38,4)) AS cs2
        |  FROM binned
        |  WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT bin AS maxbin, cn AS tn, cs1 AS ts1, cs2 AS ts2
        |        FROM cum ORDER BY bin DESC LIMIT 1),
        |best AS (
        |  SELECT c1.bin AS e1, c1.cn AS n1, c1.cs1 AS a1, c1.cs2 AS b1,
        |    c2.bin AS e2, c2.cn AS n2, c2.cs1 AS a2, c2.cs2 AS b2,
        |    c3.bin AS e3, c3.cn AS n3, c3.cs1 AS a3, c3.cs2 AS b3,
        |    maxbin, tn, ts1, ts2,
        |    (CAST(b1 AS DOUBLE) - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |    + (CAST(b2 - b1 AS DOUBLE) - CAST(a2 - a1 AS DOUBLE) * CAST(a2 - a1 AS DOUBLE) / CAST(n2 - n1 AS DOUBLE))
        |    + (CAST(b3 - b2 AS DOUBLE) - CAST(a3 - a2 AS DOUBLE) * CAST(a3 - a2 AS DOUBLE) / CAST(n3 - n2 AS DOUBLE))
        |    + (CAST(ts2 - b3 AS DOUBLE) - CAST(ts1 - a3 AS DOUBLE) * CAST(ts1 - a3 AS DOUBLE) / CAST(tn - n3 AS DOUBLE)) AS sse
        |  FROM cum c1 JOIN cum c2 ON c1.bin < c2.bin
        |  JOIN cum c3 ON c2.bin < c3.bin, tot
        |  WHERE c3.bin < maxbin
        |  ORDER BY sse, e1, e2, e3 LIMIT 1)
        |SELECT u.seg AS segment,
        |  CASE u.seg WHEN 1 THEN e1 WHEN 2 THEN e2 WHEN 3 THEN e3 ELSE maxbin END AS end_bin,
        |  CAST(CASE u.seg WHEN 1 THEN n1 WHEN 2 THEN n2 - n1
        |       WHEN 3 THEN n3 - n2 ELSE tn - n3 END AS BIGINT) AS n,
        |  CASE u.seg
        |    WHEN 1 THEN ROUND(CAST(b1 AS DOUBLE) - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6)
        |    WHEN 2 THEN ROUND(CAST(b2 - b1 AS DOUBLE) - CAST(a2 - a1 AS DOUBLE) * CAST(a2 - a1 AS DOUBLE) / CAST(n2 - n1 AS DOUBLE), 6)
        |    WHEN 3 THEN ROUND(CAST(b3 - b2 AS DOUBLE) - CAST(a3 - a2 AS DOUBLE) * CAST(a3 - a2 AS DOUBLE) / CAST(n3 - n2 AS DOUBLE), 6)
        |    ELSE ROUND(CAST(ts2 - b3 AS DOUBLE) - CAST(ts1 - a3 AS DOUBLE) * CAST(ts1 - a3 AS DOUBLE) / CAST(tn - n3 AS DOUBLE), 6)
        |  END AS sse
        |FROM best, unnest([CAST(1 AS BIGINT), 2, 3, 4]) AS u(seg)
        |ORDER BY segment""".stripMargin,
    "q306_target_encoding" ->
      """WITH per AS (
        |  SELECT o_orderpriority AS priority, COUNT(*) AS n,
        |    SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS k
        |  FROM orders GROUP BY 1),
        |g AS (SELECT SUM(n) AS tn, SUM(k) AS tk FROM per)
        |SELECT priority, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  ROUND(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate_raw,
        |  ROUND((CAST(k AS DOUBLE) + CAST(50.0 AS DOUBLE)
        |           * (CAST(tk AS DOUBLE) / CAST(tn AS DOUBLE)))
        |        / (CAST(n AS DOUBLE) + CAST(50.0 AS DOUBLE)), 6) AS rate_encoded
        |FROM per, g ORDER BY priority""".stripMargin,
    "q296_isotonic_calibration" ->
      """WITH ev AS (
        |  SELECT value AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |mm AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM ev),
        |binned AS (
        |  SELECT LEAST(19, CAST(FLOOR((v - lo) / (hi - lo) * 20.0) AS BIGINT)) AS bin,
        |    COUNT(*) AS n, SUM(y) AS k
        |  FROM ev, mm GROUP BY 1),
        |cum AS (
        |  SELECT bin, n, k,
        |    SUM(n) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
        |    SUM(k) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ck
        |  FROM binned),
        |spans AS (
        |  SELECT j.bin AS j, j.cn - j.n AS cnj, j.ck - j.k AS ckj,
        |    l.bin AS l, l.cn AS cnl, l.ck AS ckl
        |  FROM cum j JOIN cum l ON j.bin <= l.bin),
        |iso AS (
        |  SELECT i, MAX(mn) AS iso FROM (
        |    SELECT c.bin AS i, s.j,
        |      MIN(CAST(s.ckl - s.ckj AS DOUBLE) / CAST(s.cnl - s.cnj AS DOUBLE)) AS mn
        |    FROM cum c JOIN spans s ON s.j <= c.bin AND c.bin <= s.l
        |    GROUP BY 1, 2)
        |  GROUP BY i)
        |SELECT bin, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  ROUND(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate_raw,
        |  ROUND(iso, 6) AS rate_iso
        |FROM binned JOIN iso ON bin = i ORDER BY bin""".stripMargin,
    "q297_ks_pairwise" ->
      """WITH ty AS (SELECT DISTINCT event_type AS t FROM events),
        |prs AS (SELECT a.t AS ta, b.t AS tb FROM ty a JOIN ty b ON a.t < b.t),
        |vc AS (SELECT event_type, value, COUNT(*) AS c
        |       FROM events GROUP BY 1, 2),
        |tagged AS (
        |  SELECT ta, tb, value,
        |    SUM(CASE WHEN event_type = ta THEN c ELSE 0 END) AS ca,
        |    SUM(CASE WHEN event_type = tb THEN c ELSE 0 END) AS cb
        |  FROM vc JOIN prs ON event_type = ta OR event_type = tb
        |  GROUP BY 1, 2, 3),
        |cum AS (
        |  SELECT ta, tb, value,
        |    SUM(ca) OVER w AS fa, SUM(cb) OVER w AS fb
        |  FROM tagged
        |  WINDOW w AS (PARTITION BY ta, tb ORDER BY value
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT ta, tb, MAX(fa) AS na, MAX(fb) AS nb
        |        FROM cum GROUP BY 1, 2),
        |num AS (
        |  SELECT cum.ta, cum.tb, value, na, nb,
        |    ABS(fa * nb - fb * na) AS num
        |  FROM cum JOIN tot ON cum.ta = tot.ta AND cum.tb = tot.tb),
        |dmax AS (SELECT ta, tb, MAX(num) AS dnum FROM num GROUP BY 1, 2)
        |SELECT num.ta, num.tb,
        |  CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
        |  ROUND(CAST(MAX(dnum) AS DOUBLE)
        |        / CAST(MAX(na) * MAX(nb) AS DOUBLE), 6) AS d,
        |  MIN(value) AS at_value
        |FROM num JOIN dmax ON num.ta = dmax.ta AND num.tb = dmax.tb
        |  AND num.num = dmax.dnum
        |GROUP BY 1, 2 ORDER BY num.ta, num.tb""".stripMargin,
    "q289_ntile_deciles" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sp
        |  FROM orders GROUP BY o_custkey),
        |j AS (
        |  SELECT c_mktsegment, o_custkey, sp
        |  FROM spend JOIN customer ON o_custkey = c_custkey),
        |dd AS (
        |  SELECT c_mktsegment, sp,
        |    NTILE(10) OVER (PARTITION BY c_mktsegment
        |                    ORDER BY sp, o_custkey) AS decile
        |  FROM j),
        |agg AS (
        |  SELECT c_mktsegment, CAST(decile AS BIGINT) AS decile,
        |    COUNT(*) AS n_customers,
        |    CAST(MIN(sp) AS DOUBLE) AS spend_min,
        |    CAST(MAX(sp) AS DOUBLE) AS spend_max,
        |    CAST(SUM(sp) AS DECIMAL(38,4)) AS spt
        |  FROM dd GROUP BY 1, 2)
        |SELECT c_mktsegment, decile, n_customers, spend_min, spend_max,
        |  CAST(spt AS DOUBLE) AS spend_total,
        |  ROUND(CAST(spt AS DOUBLE)
        |        / CAST(SUM(spt) OVER (PARTITION BY c_mktsegment) AS DOUBLE),
        |        6) AS share
        |FROM agg ORDER BY c_mktsegment, decile""".stripMargin,
    "q291_cuped" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es,
        |    CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events),
        |sp AS (SELECT (MIN(es) + MAX(es)) // 2 AS split FROM ev),
        |per AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN es < split THEN v
        |             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS x,
        |    CAST(SUM(CASE WHEN es >= split THEN v
        |             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS y
        |  FROM ev, sp GROUP BY user_id),
        |m AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx,
        |    CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(x AS DECIMAL(19,4)) * CAST(x AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(y AS DECIMAL(19,4)) * CAST(y AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS syy,
        |    CAST(CAST(SUM(CAST(x AS DECIMAL(19,4)) * CAST(y AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sxy
        |  FROM per)
        |SELECT CAST(n AS BIGINT) AS n_users,
        |  ROUND((sxy / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
        |        / (sxx / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))), 6) AS theta,
        |  ROUND(syy / CAST(n AS DOUBLE) - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)), 6) AS var_y,
        |  ROUND((syy / CAST(n AS DOUBLE) - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
        |        - (sxy / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
        |          * (sxy / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
        |          / (sxx / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))), 6) AS var_y_adj,
        |  ROUND(CAST(100.0 AS DOUBLE)
        |        * (sxy / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
        |        * (sxy / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
        |        / ((sxx / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)))
        |           * (syy / CAST(n AS DOUBLE) - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))), 4) AS reduction_pct
        |FROM m""".stripMargin,
    "q292_simpsons_paradox" ->
      """WITH m AS (
        |  SELECT COALESCE(l_returnflag, 'ALL') AS scope, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS syy,
        |    CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY ROLLUP (l_returnflag)),
        |scored AS (
        |  SELECT scope, n,
        |    ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
        |          / (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx)
        |             * SQRT(CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r
        |  FROM m),
        |o AS (SELECT r AS r_all FROM scored WHERE scope = 'ALL')
        |SELECT scope, CAST(n AS BIGINT) AS n, r, r_all,
        |  (scope <> 'ALL' AND ((r > 0) <> (r_all > 0))) AS sign_flipped
        |FROM scored, o ORDER BY scope""".stripMargin,
    "q282_acf" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS r
        |  FROM orders GROUP BY 1),
        |lags AS (SELECT CAST(u.l AS BIGINT) AS lag
        |         FROM unnest([1, 2, 3, 4, 5, 6, 7]) AS u(l)),
        |p AS (
        |  SELECT lags.lag, a.r AS rx, b.r AS ry
        |  FROM daily a CROSS JOIN lags JOIN daily b ON b.x = a.x + lags.lag),
        |m AS (
        |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(rx) AS DOUBLE) AS sx, CAST(SUM(ry) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(rx AS DECIMAL(19,4)) * rx) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(ry AS DECIMAL(19,4)) * ry) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(rx AS DECIMAL(19,4)) * ry) AS DOUBLE) AS sxy
        |  FROM p GROUP BY 1)
        |SELECT lag, n_pairs,
        |  ROUND((n_pairs * sxy - sx * sy)
        |    / SQRT((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy)), 6)
        |    AS acf
        |FROM m ORDER BY lag""".stripMargin,
    "q279_theil_sen" ->
      """WITH grid AS MATERIALIZED (
        |  SELECT o_orderpriority,
        |    CAST((EXTRACT(YEAR FROM o_orderdate) - 1995) * 12
        |       + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1, 2),
        |pairs AS MATERIALIZED (
        |  SELECT a.o_orderpriority, a.x AS x1, b.x AS x2,
        |    ROUND(CAST(b.cents - a.cents AS DOUBLE)
        |        / CAST(b.x - a.x AS DOUBLE), 6) AS slope
        |  FROM grid a JOIN grid b
        |    ON a.o_orderpriority = b.o_orderpriority AND b.x > a.x),
        |med AS (
        |  SELECT o_orderpriority, cnt AS n_pairs, slope FROM (
        |    SELECT o_orderpriority, slope,
        |      ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |        ORDER BY slope, x1, x2) AS rn,
        |      COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
        |    FROM pairs) WHERE rn = (cnt + 1) // 2),
        |resid AS (
        |  SELECT g.o_orderpriority, m.n_pairs, m.slope,
        |    ROUND(CAST(g.cents AS DOUBLE) - m.slope * CAST(g.x AS DOUBLE), 6)
        |      AS r0, g.x
        |  FROM grid g JOIN med m ON g.o_orderpriority = m.o_orderpriority)
        |SELECT o_orderpriority, CAST(nm AS BIGINT) AS n_months,
        |  CAST(n_pairs AS BIGINT) AS n_pairs,
        |  slope AS slope_cents_per_month, r0 AS intercept_cents
        |FROM (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY r0, x) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS nm
        |  FROM resid) WHERE rn = (nm + 1) // 2
        |ORDER BY o_orderpriority""".stripMargin,
    "q281_diff_in_diff" ->
      """WITH e AS (
        |  SELECT CAST(value AS DECIMAL(18,4)) AS v,
        |    user_id % 2 = 0 AS t,
        |    ts >= TIMESTAMP '2024-01-16' AS p
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT
        |    COUNT(CASE WHEN t AND NOT p THEN 1 END) AS n_pre_t,
        |    ROUND(CAST(SUM(CASE WHEN t AND NOT p THEN v END) AS DOUBLE)
        |      / COUNT(CASE WHEN t AND NOT p THEN 1 END), 6) AS mean_pre_t,
        |    COUNT(CASE WHEN t AND p THEN 1 END) AS n_post_t,
        |    ROUND(CAST(SUM(CASE WHEN t AND p THEN v END) AS DOUBLE)
        |      / COUNT(CASE WHEN t AND p THEN 1 END), 6) AS mean_post_t,
        |    COUNT(CASE WHEN NOT t AND NOT p THEN 1 END) AS n_pre_c,
        |    ROUND(CAST(SUM(CASE WHEN NOT t AND NOT p THEN v END) AS DOUBLE)
        |      / COUNT(CASE WHEN NOT t AND NOT p THEN 1 END), 6) AS mean_pre_c,
        |    COUNT(CASE WHEN NOT t AND p THEN 1 END) AS n_post_c,
        |    ROUND(CAST(SUM(CASE WHEN NOT t AND p THEN v END) AS DOUBLE)
        |      / COUNT(CASE WHEN NOT t AND p THEN 1 END), 6) AS mean_post_c
        |  FROM e)
        |SELECT n_pre_t, mean_pre_t, n_post_t, mean_post_t,
        |  n_pre_c, mean_pre_c, n_post_c, mean_post_c,
        |  ROUND((mean_post_t - mean_pre_t) - (mean_post_c - mean_pre_c), 6)
        |    AS did_estimate
        |FROM w""".stripMargin,
    "q273_join_discovery" ->
      """WITH sets AS MATERIALIZED (
        |  SELECT DISTINCT 'lineitem.l_orderkey' AS cname, CAST(l_orderkey AS BIGINT) AS v FROM lineitem
        |  UNION ALL
        |  SELECT DISTINCT 'lineitem.l_partkey' AS cname, CAST(l_partkey AS BIGINT) AS v FROM lineitem
        |  UNION ALL
        |  SELECT DISTINCT 'lineitem.l_suppkey' AS cname, CAST(l_suppkey AS BIGINT) AS v FROM lineitem
        |  UNION ALL
        |  SELECT DISTINCT 'orders.o_orderkey' AS cname, CAST(o_orderkey AS BIGINT) AS v FROM orders
        |  UNION ALL
        |  SELECT DISTINCT 'orders.o_custkey' AS cname, CAST(o_custkey AS BIGINT) AS v FROM orders
        |  UNION ALL
        |  SELECT DISTINCT 'customer.c_custkey' AS cname, CAST(c_custkey AS BIGINT) AS v FROM customer
        |  UNION ALL
        |  SELECT DISTINCT 'customer.c_nationkey' AS cname, CAST(c_nationkey AS BIGINT) AS v FROM customer
        |  UNION ALL
        |  SELECT DISTINCT 'part.p_partkey' AS cname, CAST(p_partkey AS BIGINT) AS v FROM part
        |  UNION ALL
        |  SELECT DISTINCT 'supplier.s_suppkey' AS cname, CAST(s_suppkey AS BIGINT) AS v FROM supplier
        |  UNION ALL
        |  SELECT DISTINCT 'nation.n_nationkey' AS cname, CAST(n_nationkey AS BIGINT) AS v FROM nation
        |  UNION ALL
        |  SELECT DISTINCT 'nation.n_regionkey' AS cname, CAST(n_regionkey AS BIGINT) AS v FROM nation
        |  UNION ALL
        |  SELECT DISTINCT 'region.r_regionkey' AS cname, CAST(r_regionkey AS BIGINT) AS v FROM region
        |  UNION ALL
        |  SELECT DISTINCT 'documents.doc_id' AS cname, CAST(doc_id AS BIGINT) AS v FROM documents
        |  UNION ALL
        |  SELECT DISTINCT 'embeddings.vec_id' AS cname, CAST(vec_id AS BIGINT) AS v FROM embeddings),
        |counts AS (SELECT cname, COUNT(*) AS n FROM sets GROUP BY 1),
        |inter AS (
        |  SELECT a.cname AS ca, b.cname AS cb, COUNT(*) AS inter
        |  FROM sets a JOIN sets b ON a.v = b.v AND a.cname < b.cname
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT ca AS col_a, cb AS col_b,
        |    CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
        |    CAST(inter AS BIGINT) AS n_common,
        |    ROUND(CAST(inter AS DOUBLE) / CAST(na.n AS DOUBLE), 6) AS containment_ab,
        |    ROUND(CAST(inter AS DOUBLE) / CAST(nb.n AS DOUBLE), 6) AS containment_ba
        |  FROM inter JOIN counts na ON ca = na.cname
        |    JOIN counts nb ON cb = nb.cname)
        |SELECT * FROM j
        |WHERE GREATEST(containment_ab, containment_ba) >= 0.5
        |ORDER BY col_a, col_b""".stripMargin,
    "q266_cramers_v" ->
      """WITH base AS (
        |  SELECT event_type,
        |    (CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600) % 24 AS hr
        |  FROM events),
        |cells AS (SELECT event_type, hr, COUNT(*) AS nxy FROM base GROUP BY 1, 2),
        |bt AS (SELECT event_type, COUNT(*) AS nx FROM base GROUP BY 1),
        |bh AS (SELECT hr, COUNT(*) AS ny FROM base GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS nn FROM base),
        |j AS (
        |  SELECT c0.nxy, nn,
        |    CAST(ROUND((CAST(c0.nxy AS DOUBLE)
        |        - CAST(bt.nx AS DOUBLE) * CAST(bh.ny AS DOUBLE) / CAST(nn AS DOUBLE))
        |      * (CAST(c0.nxy AS DOUBLE)
        |        - CAST(bt.nx AS DOUBLE) * CAST(bh.ny AS DOUBLE) / CAST(nn AS DOUBLE))
        |      / (CAST(bt.nx AS DOUBLE) * CAST(bh.ny AS DOUBLE) / CAST(nn AS DOUBLE)),
        |      6) AS DECIMAL(18,6)) AS term
        |  FROM cells c0 JOIN bt USING (event_type) JOIN bh USING (hr), tot),
        |a AS (SELECT CAST(SUM(term) AS DOUBLE) AS chis,
        |        CAST(MAX(nn) AS BIGINT) AS n,
        |        CAST(COUNT(*) AS BIGINT) AS n_cells FROM j),
        |dims AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bt) AS r,
        |                (SELECT CAST(COUNT(*) AS BIGINT) FROM bh) AS c)
        |SELECT n, r, c, n_cells, ROUND(chis, 6) AS chi2,
        |  ROUND(SQRT(chis / (CAST(n AS DOUBLE)
        |    * CAST(LEAST(r - 1, c - 1) AS DOUBLE))), 6) AS cramers_v
        |FROM a, dims""".stripMargin,
    "q263_bootstrap_ci" ->
      """WITH d AS (SELECT doc_id, n_chars FROM documents),
        |h AS (
        |  SELECT b, n_chars,
        |    ((((doc_id * 100 + b) % 2147483647) * 48271 % 2147483647 + 1)
        |      * 16807 % 2147483647) % 10000 AS bk
        |  FROM d, (SELECT UNNEST(range(0, 32)) AS b)),
        |hw AS (
        |  SELECT b, n_chars,
        |    CASE WHEN bk < 3679 THEN 0 WHEN bk < 7358 THEN 1
        |         WHEN bk < 9197 THEN 2 WHEN bk < 9810 THEN 3
        |         WHEN bk < 9963 THEN 4 WHEN bk < 9994 THEN 5
        |         WHEN bk < 9999 THEN 6 ELSE 7 END AS w
        |  FROM h),
        |means AS (
        |  SELECT b, ROUND(CAST(SUM(w * n_chars) AS DOUBLE)
        |    / CAST(SUM(w) AS DOUBLE), 6) AS m
        |  FROM hw GROUP BY b),
        |arr AS (SELECT list_sort(list(m)) AS ms FROM means),
        |pt AS (SELECT ROUND(CAST(SUM(n_chars) AS DOUBLE)
        |  / CAST(COUNT(*) AS DOUBLE), 6) AS point_estimate FROM d)
        |SELECT CAST(32 AS BIGINT) AS n_replicates, point_estimate,
        |  ms[2] AS ci_lo, ms[16] AS ci_median, ms[31] AS ci_hi
        |FROM arr, pt""".stripMargin,
    "q254_kanonymity" ->
      """WITH base AS (
        |  SELECT c_nationkey, n_regionkey, c_mktsegment,
        |    FLOOR(CAST(c_acctbal AS DOUBLE) / 1000.0) AS b1,
        |    FLOOR(CAST(c_acctbal AS DOUBLE) / 5000.0) AS b5
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |l0 AS (SELECT 0 AS lvl, COUNT(*) AS sz FROM base
        |       GROUP BY c_nationkey, c_mktsegment, b1),
        |l1 AS (SELECT 1 AS lvl, COUNT(*) AS sz FROM base
        |       GROUP BY n_regionkey, c_mktsegment, b5),
        |classes AS (SELECT * FROM l0 UNION ALL SELECT * FROM l1),
        |x AS (SELECT lvl, k, sz FROM classes
        |      CROSS JOIN (SELECT UNNEST([2, 5, 10]) AS k))
        |SELECT CAST(lvl AS BIGINT) AS lvl, CAST(k AS BIGINT) AS k,
        |  CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(SUM(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS classes_below,
        |  CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_below,
        |  CAST(SUM(sz) AS BIGINT) AS n_rows,
        |  ROUND(CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(sz) AS DOUBLE), 6) AS risk_pct
        |FROM x GROUP BY lvl, k ORDER BY lvl, k""".stripMargin,
    "q249_behavior_entropy" ->
      (s"""WITH tc AS (
          |  SELECT user_id, event_type, COUNT(*) AS c
          |  FROM events GROUP BY 1, 2),
          |a AS (
          |  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
          |    CAST(COUNT(*) AS BIGINT) AS k,
          |    CAST(CAST(SUM(${xlxSql("c")}) AS DECIMAL(38,6)) AS DOUBLE) AS sclc
          |  FROM tc GROUP BY 1),
          |h AS (
          |  SELECT user_id, n, k,
          |    (CAST(${xlxSql("n")} AS DOUBLE) - sclc) / CAST(n AS DOUBLE) AS h
          |  FROM a)
          |SELECT user_id, n AS n_events, k AS n_types,
          |  ROUND(h, 4) AS entropy,
          |  CASE WHEN k = 1 THEN 0.0
          |       ELSE ROUND(h / LN(CAST(k AS DOUBLE)), 4) END AS norm_entropy
          |FROM h ORDER BY user_id""".stripMargin),
    "q250_price_elasticity" ->
      """WITH li AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS cents, CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem),
        |mm AS (SELECT MIN(cents) AS cmin, MAX(cents) AS cmax FROM li),
        |pts AS (
        |  SELECT ((cents - cmin) * 16) // (cmax - cmin + 1) AS b,
        |    CAST(SUM(cents) AS BIGINT) AS sc, COUNT(*) AS n,
        |    CAST(SUM(q) AS BIGINT) AS sq
        |  FROM li, mm GROUP BY 1),
        |lp AS (
        |  SELECT
        |    CAST(ROUND(LN(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS lx,
        |    CAST(ROUND(LN(CAST(sq AS DOUBLE)), 6) AS DECIMAL(18,6)) AS ly
        |  FROM pts),
        |a AS (
        |  SELECT COUNT(*) AS k,
        |    CAST(SUM(lx) AS DOUBLE) AS sx, CAST(SUM(ly) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(lx * lx) AS DECIMAL(38,6)) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(lx * ly) AS DECIMAL(38,6)) AS DOUBLE) AS sxy,
        |    CAST(CAST(SUM(ly * ly) AS DECIMAL(38,6)) AS DOUBLE) AS syy
        |  FROM lp)
        |SELECT CAST(k AS BIGINT) AS n_buckets,
        |  ROUND((CAST(k AS DOUBLE) * sxy - sx * sy)
        |    / (CAST(k AS DOUBLE) * sxx - sx * sx), 6) AS elasticity,
        |  ROUND((sy * sxx - sx * sxy)
        |    / (CAST(k AS DOUBLE) * sxx - sx * sx), 6) AS intercept,
        |  ROUND((CAST(k AS DOUBLE) * sxy - sx * sy) * (CAST(k AS DOUBLE) * sxy - sx * sy)
        |    / ((CAST(k AS DOUBLE) * sxx - sx * sx)
        |       * (CAST(k AS DOUBLE) * syy - sy * sy)), 6) AS r2
        |FROM a""".stripMargin,
    "q238_wilson_ci" -> wilsonSql,
    "q232_winsorize" ->
      """WITH base AS (
        |  SELECT o_orderpriority AS p, o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(18,4)) AS vd,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(o_totalprice AS DECIMAL(18,4)), o_orderkey) AS BIGINT) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders),
        |cuts AS (
        |  SELECT p,
        |    MIN(CASE WHEN rn = (n * 5 + 99) // 100 THEN vd END) AS lo,
        |    MIN(CASE WHEN rn = (n * 95 + 99) // 100 THEN vd END) AS hi
        |  FROM base GROUP BY 1),
        |j AS (
        |  SELECT base.p, vd, LEAST(GREATEST(vd, lo), hi) AS vc, lo, hi
        |  FROM base JOIN cuts ON base.p = cuts.p)
        |SELECT p AS priority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MAX(lo) AS DOUBLE) AS p05, CAST(MAX(hi) AS DOUBLE) AS p95,
        |  CAST(SUM(CASE WHEN vd < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        |  CAST(SUM(CASE WHEN vd > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
        |  ROUND(CAST(SUM(vd) AS DOUBLE) / COUNT(*), 6) AS mean_before,
        |  ROUND(CAST(SUM(vc) AS DOUBLE) / COUNT(*), 6) AS mean_after
        |FROM j GROUP BY 1 ORDER BY priority""".stripMargin,
    "q220_corr_matrix" -> corrSql,
    "q217_infogain_stump" -> stumpSql,
    "q216_mutual_info" ->
      """WITH base AS (
        |  SELECT event_type,
        |    (CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600) % 24 AS hr
        |  FROM events),
        |cells AS (SELECT event_type, hr, COUNT(*) AS nxy FROM base GROUP BY 1, 2),
        |bt AS (SELECT event_type, COUNT(*) AS nx FROM base GROUP BY 1),
        |bh AS (SELECT hr, COUNT(*) AS ny FROM base GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS nn FROM base),
        |j AS (
        |  SELECT c.event_type, c.nxy, bt.nx, bh.ny, nn,
        |    ROUND(LN((CAST(c.nxy AS DOUBLE) * CAST(nn AS DOUBLE))
        |      / (CAST(bt.nx AS DOUBLE) * CAST(bh.ny AS DOUBLE))), 6) AS pmi
        |  FROM cells c JOIN bt USING (event_type) JOIN bh USING (hr), tot)
        |SELECT event_type, CAST(MAX(nx) AS BIGINT) AS n_events,
        |  CAST(COUNT(*) AS BIGINT) AS n_cells,
        |  ROUND(CAST(CAST(SUM(nxy * CAST(pmi AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
        |    / CAST(MAX(nn) AS DOUBLE), 6) AS mi_contrib,
        |  MAX(pmi) AS max_pmi, MIN(pmi) AS min_pmi
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q210_kaplan_meier" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    MIN(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)) AS m0,
        |    MAX(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)) AS ml
        |  FROM orders GROUP BY 1),
        |h AS (SELECT MAX(ml) AS mmax FROM per),
        |durs AS (
        |  SELECT CASE WHEN mmax - ml > 6 THEN CAST(ml - m0 AS BIGINT)
        |              ELSE CAST(mmax - m0 AS BIGINT) END AS dur,
        |         CASE WHEN mmax - ml > 6 THEN 1 ELSE 0 END AS death
        |  FROM per, h),
        |grid AS (SELECT dur, CAST(SUM(death) AS BIGINT) AS n_deaths,
        |                CAST(SUM(1 - death) AS BIGINT) AS n_censored
        |         FROM durs GROUP BY dur),
        |g2 AS (SELECT dur, n_deaths, n_censored,
        |         SUM(n_deaths + n_censored) OVER () AS total,
        |         COALESCE(SUM(n_deaths + n_censored) OVER (ORDER BY dur
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
        |       FROM grid),
        |g3 AS (SELECT dur, n_deaths, n_censored,
        |              CAST(total - prev AS BIGINT) AS n_risk FROM g2),
        |g4 AS (SELECT *,
        |         CASE WHEN n_deaths = 0 OR n_deaths >= n_risk
        |              THEN CAST(0 AS DECIMAL(18,6))
        |              ELSE CAST(ROUND(LN(CAST(n_risk - n_deaths AS DOUBLE)
        |                / CAST(n_risk AS DOUBLE)), 6) AS DECIMAL(18,6)) END AS term,
        |         CASE WHEN n_deaths >= n_risk THEN 1 ELSE 0 END AS wf
        |       FROM g3),
        |g5 AS (SELECT dur, n_deaths, n_censored, n_risk,
        |         MAX(wf) OVER (ORDER BY dur
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wiped,
        |         SUM(term) OVER (ORDER BY dur
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |       FROM g4)
        |SELECT dur, n_risk, n_deaths, n_censored,
        |  CASE WHEN wiped = 1 THEN 0.0
        |       ELSE ROUND(EXP(CAST(cum AS DOUBLE)), 4) END AS survival
        |FROM g5 ORDER BY dur""".stripMargin,
    "q205_skew_report" ->
      """WITH
        |h1 AS (SELECT l_orderkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
        |h2 AS (SELECT l_partkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
        |h3 AS (SELECT l_suppkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
        |h4 AS (SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY 1),
        |h5 AS (SELECT user_id AS k, COUNT(*) AS n FROM events GROUP BY 1),
        |h6 AS (SELECT event_type AS k, COUNT(*) AS n FROM events GROUP BY 1),
        |t1 AS (SELECT CAST(k AS VARCHAR) AS top_key, n AS top_n FROM h1 ORDER BY n DESC, k LIMIT 1),
        |t2 AS (SELECT CAST(k AS VARCHAR) AS top_key, n AS top_n FROM h2 ORDER BY n DESC, k LIMIT 1),
        |t3 AS (SELECT CAST(k AS VARCHAR) AS top_key, n AS top_n FROM h3 ORDER BY n DESC, k LIMIT 1),
        |t4 AS (SELECT CAST(k AS VARCHAR) AS top_key, n AS top_n FROM h4 ORDER BY n DESC, k LIMIT 1),
        |t5 AS (SELECT CAST(k AS VARCHAR) AS top_key, n AS top_n FROM h5 ORDER BY n DESC, k LIMIT 1),
        |t6 AS (SELECT CAST(k AS VARCHAR) AS top_key, n AS top_n FROM h6 ORDER BY n DESC, k LIMIT 1),
        |r AS (
        |  SELECT 'lineitem.l_orderkey' AS key_col, COUNT(*) AS n_keys,
        |    CAST(SUM(n) AS BIGINT) AS rows, MAX(n) AS max_n,
        |    (SELECT top_key FROM t1) AS top_key, (SELECT top_n FROM t1) AS top_n
        |  FROM h1
        |  UNION ALL SELECT 'lineitem.l_partkey', COUNT(*), CAST(SUM(n) AS BIGINT), MAX(n),
        |    (SELECT top_key FROM t2), (SELECT top_n FROM t2) FROM h2
        |  UNION ALL SELECT 'lineitem.l_suppkey', COUNT(*), CAST(SUM(n) AS BIGINT), MAX(n),
        |    (SELECT top_key FROM t3), (SELECT top_n FROM t3) FROM h3
        |  UNION ALL SELECT 'orders.o_custkey', COUNT(*), CAST(SUM(n) AS BIGINT), MAX(n),
        |    (SELECT top_key FROM t4), (SELECT top_n FROM t4) FROM h4
        |  UNION ALL SELECT 'events.user_id', COUNT(*), CAST(SUM(n) AS BIGINT), MAX(n),
        |    (SELECT top_key FROM t5), (SELECT top_n FROM t5) FROM h5
        |  UNION ALL SELECT 'events.event_type', COUNT(*), CAST(SUM(n) AS BIGINT), MAX(n),
        |    (SELECT top_key FROM t6), (SELECT top_n FROM t6) FROM h6)
        |SELECT key_col, n_keys, rows, max_n, top_key, top_n,
        |  ROUND(CAST(max_n AS DOUBLE)
        |        / (CAST(rows AS DOUBLE) / CAST(n_keys AS DOUBLE)), 4) AS skew_factor
        |FROM r ORDER BY key_col""".stripMargin,
    "q204_benford" ->
      s"""WITH c AS (
        |  SELECT SUBSTR(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) // 100 AS VARCHAR), 1, 1) AS digit
        |  FROM orders),
        |g AS (SELECT digit, COUNT(*) AS n FROM c GROUP BY digit),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g),
        |r AS (
        |  SELECT digit, n,
        |    ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
        |    $benfordCaseSql AS expected
        |  FROM g, t)
        |SELECT digit, n, share, expected, ROUND(share - expected, 6) AS delta
        |FROM r ORDER BY digit""".stripMargin,
    "q193_weighted_median" ->
      """WITH bp AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(l_extendedprice AS DECIMAL(18,4)) AS price,
        |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS wsum
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT flag, price, wsum,
        |    SUM(wsum) OVER (PARTITION BY flag ORDER BY price
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
        |  FROM bp),
        |t AS (SELECT flag, SUM(wsum) AS tw FROM bp GROUP BY 1)
        |SELECT c.flag,
        |  CAST(MIN(price) AS DOUBLE) AS wmedian,
        |  CAST(MIN(t.tw) AS DOUBLE) AS total_weight
        |FROM c JOIN t ON c.flag = t.flag
        |WHERE cw * 2 >= t.tw
        |GROUP BY c.flag ORDER BY c.flag""".stripMargin,
    "q194_gini" ->
      """WITH r AS (
        |  SELECT o_orderpriority AS pri, o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(18,4)) AS x,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(o_totalprice AS DECIMAL(18,4)), o_orderkey) AS rn
        |  FROM orders),
        |a AS (
        |  SELECT pri, COUNT(*) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(rn * x) AS DECIMAL(38,4)) AS DOUBLE) AS srx
        |  FROM r GROUP BY pri)
        |SELECT pri, n,
        |  ROUND(srx * 2.0 / (CAST(n AS DOUBLE) * sx)
        |        - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
        |FROM a ORDER BY pri""".stripMargin,
    "q177_group_linreg" ->
      """WITH a AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DECIMAL(38,4)) AS DOUBLE) AS syy,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
        |        / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
        |  ROUND((sy * sxx - sx * sxy)
        |        / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS intercept,
        |  ROUND((CAST(n AS DOUBLE) * sxy - sx * sy) * (CAST(n AS DOUBLE) * sxy - sx * sy)
        |        / ((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r2
        |FROM a ORDER BY l_returnflag""".stripMargin,
    "q178_ab_welch" ->
      """WITH arms AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s1,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(19,4)) * CAST(value AS DECIMAL(19,4))) AS DECIMAL(38,4)) AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type),
        |b AS (SELECT n AS n0, s1 AS b1, s2 AS b2 FROM arms WHERE event_type = 'view'),
        |j AS (
        |  SELECT event_type, n,
        |    CAST(n AS DOUBLE) AS n1, CAST(n0 AS DOUBLE) AS n0d, s1, b1,
        |    (s2 - s1 * s1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v1,
        |    (b2 - b1 * b1 / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0) AS v0
        |  FROM arms, b WHERE event_type <> 'view')
        |SELECT event_type, n,
        |  ROUND(s1 / n1, 6) AS mean,
        |  ROUND((s1 / n1 - b1 / n0d) / SQRT(v1 / n1 + v0 / n0d), 6) AS t,
        |  ROUND((v1 / n1 + v0 / n0d) * (v1 / n1 + v0 / n0d)
        |        / (v1 / n1 * (v1 / n1) / (n1 - 1.0)
        |           + v0 / n0d * (v0 / n0d) / (n0d - 1.0)), 4) AS df
        |FROM j ORDER BY event_type""".stripMargin,
    "q179_mad_outliers" ->
      """WITH e AS (
        |  SELECT event_type, event_id, CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events),
        |r1 AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM e),
        |med AS (SELECT event_type, v AS med FROM r1 WHERE rn = (cnt + 1) // 2),
        |dev AS (
        |  SELECT e.event_type, e.event_id, e.v, ABS(e.v - med.med) AS ad, med.med
        |  FROM e JOIN med ON e.event_type = med.event_type),
        |r2 AS (
        |  SELECT event_type, ad,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ad, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM dev),
        |mad AS (SELECT event_type, ad AS mad FROM r2 WHERE rn = (cnt + 1) // 2)
        |SELECT dev.event_type, COUNT(*) AS n,
        |  CAST(MIN(med.med) AS DOUBLE) AS med,
        |  CAST(MIN(mad.mad) AS DOUBLE) AS mad,
        |  COUNT(*) FILTER (WHERE dev.ad > mad.mad * 3) AS n_outliers
        |FROM dev
        |  JOIN med ON dev.event_type = med.event_type
        |  JOIN mad ON dev.event_type = mad.event_type
        |GROUP BY dev.event_type ORDER BY dev.event_type""".stripMargin,
    "q180_assoc_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
        |no AS (SELECT COUNT(DISTINCT o) AS n_orders FROM items),
        |supp AS (
        |  SELECT item, COUNT(*) AS cnt FROM items GROUP BY item HAVING COUNT(*) >= 5),
        |freq AS (SELECT i.o, i.item, s.cnt FROM items i JOIN supp s ON i.item = s.item),
        |pairs AS (
        |  SELECT a.item AS a, b.item AS b, a.cnt AS ca, b.cnt AS cb, COUNT(*) AS pc
        |  FROM freq a JOIN freq b ON a.o = b.o AND a.item < b.item
        |  GROUP BY a.item, b.item, a.cnt, b.cnt)
        |SELECT a, b, pc, ca, cb,
        |  ROUND(CAST(pc AS DOUBLE) / CAST(ca AS DOUBLE), 6) AS conf,
        |  ROUND(CAST(pc AS DOUBLE) * CAST(n_orders AS DOUBLE)
        |        / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)), 6) AS lift
        |FROM pairs, no
        |ORDER BY lift DESC, a, b LIMIT 30""".stripMargin,
    "q186_column_profile" ->
      """WITH
        |m_custkey AS (SELECT CAST(c_custkey AS VARCHAR) AS top_val, COUNT(*) AS top_cnt
        |  FROM customer GROUP BY 1 ORDER BY top_cnt DESC, top_val LIMIT 1),
        |m_name AS (SELECT CAST(c_name AS VARCHAR) AS top_val, COUNT(*) AS top_cnt
        |  FROM customer GROUP BY 1 ORDER BY top_cnt DESC, top_val LIMIT 1),
        |m_nationkey AS (SELECT CAST(c_nationkey AS VARCHAR) AS top_val, COUNT(*) AS top_cnt
        |  FROM customer GROUP BY 1 ORDER BY top_cnt DESC, top_val LIMIT 1),
        |m_mktsegment AS (SELECT CAST(c_mktsegment AS VARCHAR) AS top_val, COUNT(*) AS top_cnt
        |  FROM customer GROUP BY 1 ORDER BY top_cnt DESC, top_val LIMIT 1)
        |SELECT 'c_custkey' AS col_name, COUNT(*) AS n,
        |  CAST(COALESCE(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_null,
        |  COUNT(DISTINCT c_custkey) AS ndv,
        |  ROUND(CAST(MIN(c_custkey) AS DOUBLE), 4) AS min_num,
        |  ROUND(CAST(MAX(c_custkey) AS DOUBLE), 4) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
        |  (SELECT top_val FROM m_custkey) AS top_val,
        |  (SELECT top_cnt FROM m_custkey) AS top_cnt
        |FROM customer
        |UNION ALL
        |SELECT 'c_acctbal', COUNT(*),
        |  CAST(COALESCE(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
        |  COUNT(DISTINCT c_acctbal),
        |  ROUND(CAST(MIN(c_acctbal) AS DOUBLE), 4), ROUND(CAST(MAX(c_acctbal) AS DOUBLE), 4),
        |  NULL, NULL, NULL, NULL
        |FROM customer
        |UNION ALL
        |SELECT 'c_name', COUNT(*),
        |  CAST(COALESCE(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
        |  COUNT(DISTINCT c_name),
        |  NULL, NULL, MIN(c_name), MAX(c_name),
        |  (SELECT top_val FROM m_name), (SELECT top_cnt FROM m_name)
        |FROM customer
        |UNION ALL
        |SELECT 'c_nationkey', COUNT(*),
        |  CAST(COALESCE(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
        |  COUNT(DISTINCT c_nationkey),
        |  ROUND(CAST(MIN(c_nationkey) AS DOUBLE), 4), ROUND(CAST(MAX(c_nationkey) AS DOUBLE), 4),
        |  NULL, NULL,
        |  (SELECT top_val FROM m_nationkey), (SELECT top_cnt FROM m_nationkey)
        |FROM customer
        |UNION ALL
        |SELECT 'c_mktsegment', COUNT(*),
        |  CAST(COALESCE(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
        |  COUNT(DISTINCT c_mktsegment),
        |  NULL, NULL, MIN(c_mktsegment), MAX(c_mktsegment),
        |  (SELECT top_val FROM m_mktsegment), (SELECT top_cnt FROM m_mktsegment)
        |FROM customer
        |ORDER BY col_name""".stripMargin,
    "q187_fk_audit" ->
      """SELECT 'lineitem.l_orderkey->orders' AS fk_edge, COUNT(*) AS child_rows,
        |  COUNT(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS orphan_rows,
        |  COUNT(DISTINCT l_orderkey) FILTER (WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS orphan_keys
        |FROM lineitem l
        |UNION ALL
        |SELECT 'lineitem.l_partkey->part', COUNT(*),
        |  COUNT(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
        |  COUNT(DISTINCT l_partkey) FILTER (WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |FROM lineitem l
        |UNION ALL
        |SELECT 'lineitem.l_suppkey->supplier', COUNT(*),
        |  COUNT(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
        |  COUNT(DISTINCT l_suppkey) FILTER (WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        |FROM lineitem l
        |UNION ALL
        |SELECT 'orders.o_custkey->customer', COUNT(*),
        |  COUNT(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |  COUNT(DISTINCT o_custkey) FILTER (WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |FROM orders o
        |UNION ALL
        |SELECT 'customer.c_nationkey->nation', COUNT(*),
        |  COUNT(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
        |  COUNT(DISTINCT c_nationkey) FILTER (WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        |FROM customer c
        |UNION ALL
        |SELECT 'supplier.s_nationkey->nation', COUNT(*),
        |  COUNT(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)),
        |  COUNT(DISTINCT s_nationkey) FILTER (WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
        |FROM supplier s
        |UNION ALL
        |SELECT 'nation.n_regionkey->region', COUNT(*),
        |  COUNT(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)),
        |  COUNT(DISTINCT n_regionkey) FILTER (WHERE NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
        |FROM nation n
        |ORDER BY fk_edge""".stripMargin)
}
