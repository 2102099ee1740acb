package graft.operators

import graft.Tables
import graft.Dsl._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph analytics over relations — the iterative-fixpoint operator class
  * beyond [[graft.dedup.Components]]' label propagation. The graph is
  * DERIVED from the relational data (co-purchase: parts sharing an order),
  * so the operator demonstrates both bounded graph construction and an
  * iterative scoring loop, each expressed as plain joins + aggregations the
  * optimizer can plan.
  *
  * Determinism: ranks are integer FIXED-POINT (micro-units, damping 0.85 as
  * `(85 · x) div 100`), so every iteration is a sum of longs — associative,
  * order-independent, and bit-identical in any engine; no float drift across
  * partitionings, and a DuckDB oracle replicates the whole fixpoint with
  * unrolled CTEs.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  /** Raw co-purchase edge relation — parts sharing an order, one row per
    * DIRECTED edge — built ONCE per (session, sf dir) and shared by every
    * query that consumes the raw graph (q81/q165/q176/q208/q275): a full
    * sweep was paying the same ~3-5 s self-join edge build four times over
    * (round-9 VERDICT, "What's missing" #2). The build self-joins lineitem
    * on `l_orderkey` (fan-out bounded by order size² — q81's argument)
    * behind an explicit-count repartition (the one-row-group-scan trap
    * recorded in BENCH.md), dedups to one row per directed edge, and lands
    * in [[graft.Checkpoints.materializeCached]] — the standing-relation
    * treatment the co≥2 pair relation already gets (q218/q343/q358).
    */
  private[operators] def coEdges(s: SparkSession, d: String): DataFrame = {
    val par = s.sparkContext.defaultParallelism
    val li = Tables(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      .repartition(par, col("l_orderkey"))
    graft.Checkpoints.materializeCached(
      li.select(col("l_orderkey"), col("l_partkey").as("src"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("dst")), Seq("l_orderkey"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
        .distinct())
  }

  /** [[coEdges]] restricted to src<dst — one row per UNDIRECTED edge; a
    * plain filter over the already-materialized directed relation, so it
    * rides the single shared build instead of re-running the self-join.
    */
  private[operators] def coEdgesUndirected(s: SparkSession, d: String): DataFrame =
    coEdges(s, d).filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))

  /** Per-node degree over [[coEdges]]. The co-purchase graph is symmetric
    * (both directions present), so the directed out-degree IS the
    * undirected node degree; one cached aggregate serves q81's fixpoint,
    * q165's orientation, q208's histogram and q275's seeding.
    */
  private[operators] def coDegrees(s: SparkSession, d: String): DataFrame =
    graft.Checkpoints.materializeCached(
      coEdges(s, d).groupBy(col("src")).agg(count(lit(1)).as("d")))

  /** Edge × source-degree relation driving the q81/q275 rank fixpoints —
    * identical in both, so it too is a standing relation: one copy per
    * session, pre-partitioned on the iteration join key.
    */
  private[operators] def coContrib(s: SparkSession, d: String): DataFrame = {
    val par = s.sparkContext.defaultParallelism
    graft.Checkpoints.materializeCached(
      coEdges(s, d).join(coDegrees(s, d), Seq("src"))
        .repartition(par, col("src")))
  }

  /** Undirected co-occurrence counts — `(u < v, co = #orders sharing both)`
    * — the trained item-item model behind the q218/q343/q358 recommender
    * family. A STANDING relation (trained once, probed per request):
    * one shared semantics-cached copy serves all three queries instead of
    * each re-running the order self-join per sweep rep.
    */
  private[operators] def coPairs(s: SparkSession, d: String): DataFrame = {
    val items = Tables(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item")).distinct()
    graft.Checkpoints.materializeCached(
      items.select(col("o"), col("item").as("u"))
        .join(items.select(col("o"), col("item").as("v")), Seq("o"))
        .filter(col("u") < col("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("co")))
  }

  /** [[coEdges]] under (u, v) names, pre-partitioned on the BFS frontier
    * join key — q176's iteration input, factored so the standing-relation
    * bench row ([[Standing]]) forces the same semantic plan the query uses.
    */
  private[operators] def coEdgesByU(s: SparkSession, d: String): DataFrame = {
    val par = s.sparkContext.defaultParallelism
    graft.Checkpoints.materializeCached(
      coEdges(s, d).select(col("src").as("u"), col("dst").as("v"))
        .repartition(par, col("u")))
  }

  /** Q81: co-purchase PageRank — 3 damped iterations of integer fixed-point
    * PageRank over the "parts bought in the same order" graph; top-25 parts.
    *
    * Scale shape: the edge build is a self-join on `l_orderkey` whose
    * fan-out is bounded by order size squared (TPC-H ≤ 7 lines/order; a
    * retail basket is similarly small — this is NOT an unbounded self-join),
    * deduped to one row per directed edge. Edges are materialized once via
    * [[graft.Checkpoints]]: they feed the degree aggregate and all three
    * iterations, and an uncached subplan behind reuse re-executes per
    * consumer (the recorded round-2 lesson); setting `graft.checkpointDir`
    * flips the materialization to reliable durable-storage checkpoints. Each
    * iteration is one shuffle proportional to EDGES (join rank → groupBy
    * dst); rank/degree relations are one row per NODE. The co-purchase
    * graph is symmetric, so every node has in-edges and no dangling-mass
    * correction is needed.
    */
  def q81CopurchaseRank: Q = (s, d) => {
    val deg = coDegrees(s, d)
    val contrib = coContrib(s, d)
    var rank = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    for (_ <- 1 to 3) {
      rank = contrib.join(rank, contrib("src") === rank("node"))
        .groupBy(col("dst"))
        .agg((lit(150000L) + expr("(85 * sum(r div d)) div 100")).as("r"))
        .select(col("dst").as("node"), col("r"))
    }
    rank.select(col("node"), big(col("r")).as("r"))
      .orderBy(col("r").desc, col("node"))
      .limit(25)
  }

  /** Q165: triangle counting over the co-purchase graph — the clustering
    * primitive (community strength, recommendation quality) done the way it
    * survives scale: DEGREE-ORIENTED. Every undirected edge is directed from
    * its lower-(degree, id) endpoint to the higher, a total order so the
    * orientation is acyclic and each triangle closes exactly once; the
    * 2-path join then fans out from LOW-degree sources only, bounding
    * intermediate paths by Σ outdeg² with outdeg = O(√m) instead of the
    * unbounded Σ deg² a naive id-orientation pays on skewed graphs (the
    * hub node never fans out — it only terminates paths). Three shuffles:
    * degree agg, 2-path join on the middle node, closing join on the
    * (src, dst) pair. Output: top-20 parts by triangle participation.
    */
  def q165Triangles: Q = (s, d) => {
    val par = s.sparkContext.defaultParallelism
    val e = coEdgesUndirected(s, d)
    val deg = coDegrees(s, d).select(col("src").as("x"), col("d").as("dg"))
    // orient each edge from the endpoint with smaller (degree, id) to the
    // larger; the edge relation is reused 3 times -> materialize once
    val o = graft.Checkpoints.materialize(
      e.join(deg.withColumnRenamed("x", "u").withColumnRenamed("dg", "du"), Seq("u"))
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("dg", "dv"), Seq("v"))
        .select(
          when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
            .otherwise(col("v")).as("s"),
          when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
            .otherwise(col("u")).as("t")))
    // PINNED exchanges on the 2-path and closing joins: the path expansion
    // is CPU-heavy per input BYTE (quadratic fan-out from the oriented
    // edges), so AQE's byte-based coalescing of the tiny materialized `o`
    // under-parallelized it unpredictably — the recorded 5.8-13.9 s band
    // (round-9 VERDICT finding 1). REPARTITION_BY_NUM shuffles are exempt
    // from AQE coalescing, so the expansion always runs at full width.
    val paths = o.select(col("s").as("a"), col("t").as("b"))
      .repartition(par, col("b"))
      .join(o.select(col("s").as("b"), col("t").as("c"))
        .repartition(par, col("b")), Seq("b"))
    val tri = paths.repartition(par, col("a"), col("c"))
      .join(o.select(col("s").as("a"), col("t").as("c"))
        .repartition(par, col("a"), col("c")), Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("part"))
      .limit(20)
  }

  /** Q176: bounded-hop BFS — minimum hop count from a seed set (the 3
    * smallest co-purchase nodes) out to 3 hops, the reachability primitive
    * behind blast-radius and recommendation-expansion queries. FRONTIER
    * form: each round joins only the nodes SETTLED LAST ROUND against the
    * edge relation, dedups candidates, and anti-joins the settled set — so
    * per-round shuffle is ∝ frontier-adjacent edges, never re-expanding
    * settled nodes (the difference between O(hops·reached) and
    * O(hops·graph) at scale). Frontier and settled relations are
    * materialized per round ([[graft.Checkpoints]]) — an uncached
    * iterative plan re-executes the whole prefix per round and grows
    * analyzer-depth linearly (the q81 lesson).
    */
  def q176BfsHops: Q = (s, d) => {
    val edges = coEdgesByU(s, d)
    val seeds = edges.select(col("u").as("node")).distinct()
      .orderBy(col("node")).limit(3)
    var settled = graft.Checkpoints.materialize(seeds.withColumn("hops", lit(0L)))
    var frontier = settled
    for (h <- 1 to 3) {
      val cand = frontier.select(col("node"))
        .join(edges, col("node") === col("u"))
        .select(col("v").as("node")).distinct()
      frontier = graft.Checkpoints.materialize(
        cand.join(settled.select(col("node")), Seq("node"), "left_anti")
          .withColumn("hops", lit(h.toLong)))
      settled = graft.Checkpoints.materialize(settled.unionAll(frontier))
    }
    settled.orderBy(col("hops"), col("node"))
  }

  /** Q197: generic connected components, exposed as a query — the
    * [[graft.dedup.Components]] min-label-with-pointer-jumping kernel
    * (O(log diameter) rounds, reliable-checkpoint mode via the one-conf
    * switch) run over the FREQUENT co-purchase graph: edges are part
    * pairs co-bought in ≥ 3 orders, which is sparse where the raw
    * co-purchase graph is one giant blob (measured: 119 nodes / 56
    * components at sf0.01 vs a 1 860-node single component at ≥ 2). The
    * support prune IS the q180 apriori discipline, so edge construction
    * stays bounded. The oracle computes the same components by recursive
    * reachability closure — tractable exactly because the frequent graph
    * is small; the Spark side never materializes reachability, only
    * labels.
    */
  def q197ConnectedComponents: Q = (s, d) => {
    val items = Tables(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item")).distinct()
    val edges = items.select(col("o"), col("item").as("u"))
      .join(items.select(col("o"), col("item").as("v")), Seq("o"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("pc"))
      .filter(col("pc") >= 3)
      .select(col("u"), col("v"))
    graft.dedup.Components.connectedComponents(edges, "u", "v")
      .withColumnRenamed("comp", "component")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("n_nodes").desc, col("component"))
  }

  /** Q208: degree distribution + power-law tail diagnosis — the graph
    * shape report (is there a hub problem? does q165's degree-oriented
    * bound matter here?). The co-purchase degree histogram collapses to a
    * count-of-counts summary (degree → #nodes, the q138 argument:
    * bounded by O(√m) distinct degrees), and the log-log tail slope is
    * q177's closed-form regression over `(ln degree, ln count)` of that
    * bounded summary — a slope near −2..−3 is the power-law signature.
    * Log terms are rounded to 6 dp before the moment sums so the float
    * path stays cross-engine stable on the ≤O(√m)-row summary.
    */
  def q208DegreeDist: Q = (s, d) => {
    val deg = coDegrees(s, d).select(col("src").as("x"), col("d").as("dg"))
    val hist = deg.groupBy(col("dg")).agg(count(lit(1)).as("cnt"))
    // per-point logs are rounded to 6 dp then summed as DECIMALS: the
    // moment sums stay associative/partition-independent, so the only
    // float step is the per-point ln (shared libm, 6-dp-rounded).
    // Regression moments AND graph totals come out of ONE aggregate over
    // the bounded histogram — the expensive co-purchase self-join upstream
    // runs exactly once (the first cut consumed `deg` twice and re-ran it).
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val pts = hist.select(col("dg"), col("cnt"),
      round(log(col("dg").cast("double")), 6).cast(dec6).as("lx"),
      round(log(col("cnt").cast("double")), 6).cast(dec6).as("ly"))
    val a = pts.agg(count(lit(1)).as("n"),
      sum(col("lx")).cast("double").as("sx"), sum(col("ly")).cast("double").as("sy"),
      sum(col("lx") * col("lx")).cast(org.apache.spark.sql.types.DecimalType(38, 6))
        .cast("double").as("sxx"),
      sum(col("lx") * col("ly")).cast(org.apache.spark.sql.types.DecimalType(38, 6))
        .cast("double").as("sxy"),
      sum(col("cnt")).as("n_nodes"),
      max(col("dg")).as("max_degree"),
      sum(col("dg") * col("cnt")).cast("long").as("degree_mass"))
    val nD = col("n").cast("double")
    a.select(col("n_nodes"), col("max_degree"), col("degree_mass"),
      col("n").as("n_degrees"),
      round((nD * col("sxy") - col("sx") * col("sy"))
        / (nD * col("sxx") - col("sx") * col("sx")), 4).as("tail_slope"))
  }

  /** Q215: k-core decomposition membership (k = 3, BOUNDED 12 peel
    * rounds) — the density-pruning step between q208's degree report and
    * q197's components: repeatedly remove nodes of degree < k until the
    * dense core remains. The round bound is part of the DECLARED
    * semantics (the q176 bounded-hop discipline): both engines run
    * exactly 12 restriction rounds — enough for full convergence at the
    * oracle scale (measured: 11 rounds at sf0.01) and deterministic
    * regardless; the spec asserts convergence within the bound at
    * sf0.001.
    *
    * Scale shape: each round is one degree aggregate + two semi-shaped
    * joins against the shrinking keep-set, all edge-proportional, with
    * the round result materialized ([[graft.Checkpoints]]) so round r+1
    * consumes a lineage-cut relation instead of a 2^r-deep plan — the
    * q197 pointer-jumping discipline. A converged round is a no-op join
    * on the (small) final core. The support-2 co-purchase graph keeps
    * edge construction bounded (order-size² fan-out, q81's argument).
    */
  def q215Kcore: Q = (s, d) => {
    val k = 3
    val items = Tables(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item")).distinct()
    val pe = items.select(col("o"), col("item").as("u"))
      .join(items.select(col("o"), col("item").as("v")), Seq("o"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("pc"))
      .filter(col("pc") >= 2)
      .select(col("u"), col("v"))
    var edges = graft.Checkpoints.materialize(
      pe.union(pe.select(col("v"), col("u"))).toDF("u", "v"))
    // early exit is SEMANTICS-preserving, not approximate: peeling only
    // ever removes edges, so an unchanged count means the restriction was
    // the identity and every remaining declared round would be too
    var prev = edges.count()
    var r = 0
    var stable = false
    while (r < 12 && !stable) {
      val keep = edges.groupBy(col("u")).agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= k).select(col("u"))
      edges = graft.Checkpoints.materialize(
        edges.join(keep, Seq("u"))
          .join(keep.withColumnRenamed("u", "v"), Seq("v"))
          .select(col("u"), col("v")))
      val c = edges.count()
      stable = c == prev
      prev = c
      r += 1
    }
    edges.groupBy(col("u"))
      .agg(big(count(lit(1))).as("core_deg"))
      .select(col("u").as("node"), col("core_deg"))
      .orderBy(col("node"))
  }

  /** Q218: item-item cosine recommender — "customers who bought X also
    * bought Y" scored properly: co-occurrence normalized by both items'
    * basket counts, `cos(i,j) = co(i,j) / √(deg_i · deg_j)`, which q180's
    * lift and q81's PageRank don't give (lift over-ranks rare
    * coincidences; rank isn't pairwise). Per probe item (the 20
    * highest-degree parts, tie by key) the top-5 neighbors.
    *
    * Scale shape: pair counts are the bounded co-purchase build (order
    * size² fan-out, q81's argument), degrees one aggregate; the u<v pair
    * relation is consumed in both directions via a union BEFORE the probe
    * semi-join, so only probe-incident pairs survive into scoring, and
    * the per-probe top-5 is a window over probe-bounded partitions. The
    * probe set is a 20-row broadcast. Determinism: integer co/deg, one
    * `co / √(di·dj)` double expression, 6-dp round, (cos desc, j) ties.
    */
  def q218ItemCosine: Q = (s, d) => {
    val items = Tables(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item")).distinct()
    // the co-occurrence model is a STANDING relation (trained once, probed
    // per recommendation request) and is consumed twice here by the
    // symmetric union — semantics-cached, or the order self-join runs twice
    val pairs = coPairs(s, d)
    val deg = items.groupBy(col("item")).agg(count(lit(1)).as("dg"))
    val probes = deg.orderBy(col("dg").desc, col("item")).limit(20)
      .select(col("item").as("i"), col("dg").as("di"))
    val sym = pairs.select(col("u").as("i"), col("v").as("j"), col("co"))
      .union(pairs.select(col("v"), col("u"), col("co")))
    val scored = sym.join(broadcast(probes), Seq("i"))
      .join(deg.withColumnRenamed("item", "j").withColumnRenamed("dg", "dj"), Seq("j"))
      .withColumn("cos", round(col("co").cast("double")
        / sqrt((col("di") * col("dj")).cast("double")), 6))
    val w = Window.partitionBy(col("i")).orderBy(col("cos").desc, col("j"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("i").as("item"), big(col("rn")).as("rank"), col("j").as("rec"),
        col("co"), col("cos"))
      .orderBy(col("item"), col("rank"))
  }

  /** Q221: Adamic-Adar link prediction over the customer–part bipartite
    * graph — which customer pairs share SURPRISING purchases? Each shared
    * part contributes `1/ln(customers(part))`, so rare parts dominate —
    * the signal q218's cosine dilutes and raw co-count misses entirely.
    * Top-20 customer pairs.
    *
    * Scale shape: pair generation fans out per part as customers(part)²,
    * so parts are BOUNDED to 2..64 distinct buyers before the self-join —
    * the q169 fingerprint-guard discipline, and principled here: a
    * ubiquitous part's AA term is ~0 while its fan-out is quadratic. The
    * per-part weight relation is bounded (distinct buyer-counts), the
    * pair aggregate shuffles edge-proportionally, TakeOrdered closes.
    * Determinism: weights are 6-dp-rounded `1/ln(c)` decimals summed
    * exactly; counts are longs; the output score is the exact decimal
    * surfaced as double.
    */
  def q221AdamicAdar: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    // pinned exchange under the distinct: the bipartite-build stage was
    // AQE-coalesced to ~10 tasks while carrying the join+dedup CPU
    // (measured 1.75 s stage at sf0.1 — opt r14); the distinct reuses the
    // pinned partitioning, so no extra shuffle
    val cp = Tables(s, d, "lineitem")
      .join(Tables(s, d, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .repartition(s.sparkContext.defaultParallelism, col("c"), col("p"))
      .distinct()
    val pc = cp.groupBy(col("p")).agg(count(lit(1)).as("nc"))
      .filter(col("nc") >= 2 && col("nc") <= 64)
      .withColumn("w", round(lit(1.0) / log(col("nc").cast("double")), 6).cast(dec6))
    // both self-join sides consume the guarded bipartite relation —
    // materialized once (and pre-partitioned on the join key) or the
    // lineitem⋈orders+distinct upstream runs twice
    val bounded = graft.Checkpoints.materialize(
      cp.join(broadcast(pc), Seq("p"))
        .repartition(s.sparkContext.defaultParallelism, col("p")))
    bounded.select(col("p"), col("c").as("c1"), col("w"))
      .join(bounded.select(col("p"), col("c").as("c2")), Seq("p"))
      .filter(col("c1") < col("c2"))
      .groupBy(col("c1"), col("c2"))
      .agg(big(count(lit(1))).as("shared_parts"),
        sum(col("w")).cast(DecimalType(38, 6)).cast("double").as("aa_score"))
      .orderBy(col("aa_score").desc, col("c1"), col("c2"))
      .limit(20)
  }

  /** Shared leakage-free recommender run behind q234 (hit rate) and q253
    * (NDCG@5 / MRR): hold out each customer's LAST order (by date, then
    * key), build the co-purchase cosine model from the remaining orders
    * only, anchor each customer on their most recent training part, and
    * rank its top-5 cosine neighbors. Returns
    * (anchors(o_custkey, anchor), custRecs(o_custkey, j, rk),
    * hoParts(o_custkey, l_partkey)). Determinism: cosine 6-dp-rounded,
    * (cos desc, j) ties, anchor = max (date, order, part) triple.
    */
  private def holdoutRecRun(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    // STANDING (opt r14): q234 and q253 evaluate the SAME leakage-free
    // holdout model run, and each was re-building it per bench run
    // (training-slice window, item relation, co-pair model, rec ranking —
    // ~2.3 s at sf0.1). The trained model + holdout sets are build-once
    // artifacts (exactly the IVF/PQ index argument), so the four base
    // relations get the explicit-key session cache, priced together as
    // the `standing_holdout_rec` bench row.
    def li = Tables(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    def marked = {
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val wLast = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      o.withColumn("rn", row_number().over(wLast))
    }
    val items = graft.Checkpoints.materializeCachedByKey(s, s"holdoutItems|$d") {
      val train = marked.filter(col("rn") > 1)
        .select(col("o_orderkey").as("tr_key"), col("o_custkey"),
          col("o_orderdate"))
      li.join(train, col("l_orderkey") === col("tr_key"))
        .select(col("tr_key").as("o"), col("l_partkey").as("item"),
          col("o_custkey"), col("o_orderdate")).distinct()
    }
    val anchors = graft.Checkpoints.materializeCachedByKey(s, s"holdoutAnchors|$d") {
      items
        .groupBy(col("o_custkey"))
        .agg(max(struct(col("o_orderdate"), col("o"), col("item"))).as("a"))
        .select(col("o_custkey"), col("a.item").as("anchor"))
    }
    val recs = graft.Checkpoints.materializeCachedByKey(s, s"holdoutRecs|$d") {
      val pairs = items.select(col("o"), col("item").as("u"))
        .join(items.select(col("o"), col("item").as("v")), Seq("o"))
        .filter(col("u") < col("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("co"))
      val deg = items.select(col("o"), col("item")).distinct()
        .groupBy(col("item")).agg(count(lit(1)).as("dg"))
      val sym = pairs.select(col("u").as("i"), col("v").as("j"), col("co"))
        .union(pairs.select(col("v"), col("u"), col("co")))
      val scored = sym
        .join(deg.select(col("item").as("i"), col("dg").as("di")), Seq("i"))
        .join(deg.select(col("item").as("j"), col("dg").as("dj")), Seq("j"))
        .withColumn("cos", round(col("co").cast("double")
          / sqrt((col("di") * col("dj")).cast("double")), 6))
      val wRec = Window.partitionBy(col("i")).orderBy(col("cos").desc, col("j"))
      scored.withColumn("rk", row_number().over(wRec))
        .filter(col("rk") <= 5).select(col("i"), col("j"), col("rk"))
    }
    val hoParts = graft.Checkpoints.materializeCachedByKey(s, s"holdoutHoParts|$d") {
      val holdout = marked.filter(col("rn") === 1)
        .select(col("o_orderkey").as("ho_key"), col("o_custkey"))
      li.join(holdout, col("l_orderkey") === col("ho_key"))
        .select(col("o_custkey"), col("l_partkey")).distinct()
    }
    val custRecs = anchors.join(recs, col("anchor") === col("i"))
      .select(col("o_custkey"), col("j"), col("rk"))
    (anchors, custRecs, hoParts)
  }

  /** Force the [[holdoutRecRun]] standing caches (the [[Standing]] row). */
  private[operators] def holdoutRecStanding(s: SparkSession, d: String): Unit = {
    val _ = holdoutRecRun(s, d)
  }

  /** Q253: graded ranking evaluation — NDCG@5 and MRR over the SAME
    * leakage-free holdout run q234 hit-rates (shared [[holdoutRecRun]]):
    * the metrics a retrieval/recommender pipeline actually reports, where
    * POSITION matters (a relevant item at rank 1 vs rank 5 is invisible to
    * hit rate). Eval set = anchored customers with ≥1 ranked rec and ≥1
    * held-out part (NDCG is undefined on an empty ideal list).
    *
    * Determinism: the per-rank discount 1/log2(rank+1) and reciprocal 1/rank
    * are 9-dp-rounded DECIMAL constants (both engines compute the identical
    * IEEE log2 then round the same non-midpoint digits), so per-customer DCG
    * is an EXACT decimal sum — order-free; NDCG divides the exactly-cast
    * doubles (scaled integers < 2^53) and is 6-dp-rounded per customer
    * BEFORE the exact-decimal segment mean (the Dsl discipline — a raw
    * double mean would be partition-order dependent).
    *
    * Scale shape: the model build is q234's bounded plan; everything after
    * is keyed aggregates over the ≤5-row-per-customer rec relation — one
    * customer-keyed shuffle, no windows, no broadcast-nested loops.
    */
  def q253NdcgMrr: Q = (s, d) => {
    val dec9 = DecimalType(18, 9)
    def c(k: Int): Column =
      round(lit(1.0) / log2(lit((k + 1).toDouble)), 9).cast(dec9)
    def m(k: Int): Column = round(lit(1.0) / lit(k.toDouble), 9).cast(dec9)
    def p(k: Int): Column = (1 to k).map(c).reduce(_ + _)
    val (_, custRecs, hoParts) = holdoutRecRun(s, d)
    val ho = hoParts.select(col("o_custkey").as("hc"), col("l_partkey").as("hp"))
    val rel = custRecs
      .join(ho, custRecs("o_custkey") === col("hc") && col("j") === col("hp"),
        "left")
      .select(custRecs("o_custkey"), col("rk"), col("hp").isNotNull.as("hit"))
    val cRk = (2 to 5).foldLeft(when(col("rk") === 1, c(1))) { (a, k) =>
      a.when(col("rk") === k, c(k))
    }
    val perC = rel.groupBy(col("o_custkey")).agg(
      sum(when(col("hit"), cRk).otherwise(lit(0).cast(dec9))).as("dcg"),
      min(when(col("hit"), col("rk"))).as("minrk"))
    val nrel = ho.groupBy(col("hc"))
      .agg(least(count(lit(1)), lit(5L)).as("nr"))
    val idcgCase = (2 to 5).foldLeft(when(col("nr") === 1, p(1))) { (a, k) =>
      a.when(col("nr") === k, p(k))
    }
    val rrCase = (2 to 5).foldLeft(when(col("minrk") === 1, m(1))) { (a, k) =>
      a.when(col("minrk") === k, m(k))
    }.otherwise(lit(0).cast(dec9))
    val perCust = perC.join(nrel, perC("o_custkey") === col("hc"))
      .select(perC("o_custkey"),
        round(col("dcg").cast("double") / idcgCase.cast("double"), 6)
          .cast(DecimalType(18, 6)).as("ndcg6"),
        rrCase.as("rr"))
    perCust
      .join(Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
        perCust("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(big(count(lit(1))).as("n_eval"),
        round(sum(col("ndcg6")).cast("double")
          / count(lit(1)).cast("double"), 6).as("ndcg_at_5"),
        round(sum(col("rr")).cast("double")
          / count(lit(1)).cast("double"), 6).as("mrr"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q234: recommender hold-out evaluation — the END-TO-END check q218's
    * scores exist for: hit rate per market segment over the
    * [[holdoutRecRun]] recs (a hit = any held-out part in the top-5 list;
    * q253 reports the position-graded metrics on the same run).
    *
    * Scale shape: the model build is q218's bounded co-purchase plan on
    * the training slice; anchors join the symmetric pair relation keyed
    * by anchor part (per-anchor bounded windows); the final eval is one
    * semi-join of 5-row rec lists against held-out parts.
    */
  def q234RecHoldoutEval: Q = (s, d) => {
    val (anchors, custRecs0, hoParts) = holdoutRecRun(s, d)
    val custRecs = custRecs0.select(col("o_custkey"), col("j"))
    val hits = custRecs.join(hoParts,
      custRecs("o_custkey") === hoParts("o_custkey")
        && col("j") === col("l_partkey"))
      .select(custRecs("o_custkey")).distinct()
      .withColumn("hit", lit(1L))
    anchors.select(col("o_custkey"))
      .join(hits, Seq("o_custkey"), "left")
      .join(Tables(s, d, "customer").select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(big(count(lit(1))).as("n_eval"),
        big(sum(coalesce(col("hit"), lit(0L)))).as("n_hits"),
        round(sum(coalesce(col("hit"), lit(0L))).cast("double")
          / count(lit(1)).cast("double"), 6).as("hit_rate"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q237: weighted single-source shortest paths (bounded Bellman-Ford) —
    * the WEIGHTED companion to q176's unweighted BFS: edge cost
    * `1/co-count` (frequently co-bought = close), distances from the
    * minimum frequent-graph node, 8 relaxation rounds as DECLARED
    * semantics (converged ⇒ later rounds are no-ops; the spec asserts
    * convergence within the bound at sf0.001). Costs are exact
    * DECIMAL(18,6) (6-dp-rounded reciprocals summed exactly), so
    * relaxation minima are total-order stable — no float-sum drift
    * across rounds or engines.
    *
    * Scale shape: each round is one edges⋈dist join + one min aggregate
    * (edge-proportional), materialized per round (the q197/q215
    * discipline) with count-based early exit — EXACT here because
    * round r+1's distance set can only improve: an unchanged
    * (node, dist) relation is the fixpoint.
    */
  def q237WeightedSssp: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val items = Tables(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item")).distinct()
    val pe = items.select(col("o"), col("item").as("u"))
      .join(items.select(col("o"), col("item").as("v")), Seq("o"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("co"))
      .filter(col("co") >= 2)
    val edges = graft.Checkpoints.materialize(
      pe.select(col("u"), col("v"), col("co"))
        .union(pe.select(col("v"), col("u"), col("co")))
        .withColumn("w", round(lit(1.0) / col("co").cast("double"), 6).cast(dec6))
        .select(col("u"), col("v"), col("w")))
    val src = edges.agg(min(col("u")).as("s0"))
    var dist = graft.Checkpoints.materialize(
      src.select(col("s0").as("node"), lit(0).cast(dec6).as("dist")))
    var prevCount = 1L
    var r = 0
    var stable = false
    while (r < 8 && !stable) {
      val relaxed = edges.join(dist, edges("u") === dist("node"))
        .select(col("v").as("node"), (col("dist") + col("w")).cast(dec6).as("dist"))
        .union(dist.select(col("node"), col("dist")))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      val next = graft.Checkpoints.materialize(relaxed)
      val c = next.count()
      // distances only ever improve; equal count alone is not fixpoint
      // proof (a shorter path keeps the count), so also check sum of
      // distances — strictly decreasing until converged, exact decimals
      stable = c == prevCount &&
        next.agg(sum(col("dist"))).head().getDecimal(0) ==
          dist.agg(sum(col("dist"))).head().getDecimal(0)
      prevCount = c
      dist = next
      r += 1
    }
    dist.select(col("node"), col("dist").cast("double").as("distance"))
      .orderBy(col("node"))
  }

  /** Q275: personalized PageRank — q81's integer fixed-point loop with the
    * RESTART MASS confined to a seed set (the 5 highest-degree co-purchase
    * parts, ties by id): the "related to THESE items" relevance ranking a
    * recommender serves, where q81 ranks global importance. Non-seed nodes
    * receive mass only through links, so the ranking localizes around the
    * seeds; 3 damped iterations, all long arithmetic (base 150000 on
    * seeds, `(85·Σ r div d) div 100` propagation), top-25.
    *
    * Scale shape: q81's edge build + per-iteration edge-keyed join/agg,
    * plus one broadcast 5-row seed join per iteration.
    */
  def q275PersonalizedPagerank: Q = (s, d) => {
    val deg = coDegrees(s, d)
    val contrib = coContrib(s, d)
    val seeds = graft.Checkpoints.materialize(
      deg.orderBy(col("d").desc, col("src")).limit(5)
        .select(col("src").as("seed")))
    var rank = deg.join(seeds, deg("src") === col("seed"), "left")
      .select(col("src").as("node"),
        when(col("seed").isNotNull, lit(1000000L)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to 3) {
      rank = contrib.join(rank, contrib("src") === rank("node"))
        .groupBy(col("dst"))
        .agg(expr("(85 * sum(r div d)) div 100").as("prop"))
        .join(broadcast(seeds), col("dst") === col("seed"), "left")
        .select(col("dst").as("node"),
          (when(col("seed").isNotNull, lit(150000L)).otherwise(lit(0L))
            + col("prop")).as("r"))
    }
    rank.filter(col("r") > 0L)
      .select(col("node"), big(col("r")).as("r"))
      .orderBy(col("r").desc, col("node"))
      .limit(25)
  }

  /** Q304: HITS hubs and authorities over the bipartite customer→part
    * purchase graph — "which customers' baskets define the catalog, and
    * which parts those baskets anoint": two mutual-reinforcement rounds
    * (a = Aᵀh, h = Aa) in the SAME scaled-integer arithmetic as q81/q275
    * (scores ×10⁶, max-normalized by integer division each half-step), so
    * the fixpoint is bit-portable and the oracle unrolls it exactly. Top
    * 15 of each side, labeled.
    *
    * Scale shape: edge-keyed joins and keyed aggregates per half-step
    * (shuffle ∝ edges), 1-row max broadcasts for normalization,
    * materialized per round — the q275 iterative discipline.
    */
  def q304Hits: Q = (s, d) => {
    val par = s.sparkContext.defaultParallelism
    val edges = graft.Checkpoints.materialize(
      Tables(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(Tables(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
        .repartition(par, col("c")))
    var hubs = edges.select(col("c")).distinct()
      .select(col("c"), lit(1000000L).as("h"))
    var auths: org.apache.spark.sql.DataFrame = null
    for (_ <- 1 to 2) {
      val a0 = edges.join(hubs, Seq("c")).groupBy(col("p"))
        .agg(sum(col("h")).as("a0"))
      val amax = a0.agg(max(col("a0")).as("am"))
      auths = graft.Checkpoints.materialize(
        a0.crossJoin(broadcast(amax))
          .select(col("p"), expr("(a0 * 1000000) div am").as("a")))
      val h0 = edges.join(auths, Seq("p")).groupBy(col("c"))
        .agg(sum(col("a")).as("h0"))
      val hmax = h0.agg(max(col("h0")).as("hm"))
      hubs = graft.Checkpoints.materialize(
        h0.crossJoin(broadcast(hmax))
          .select(col("c"), expr("(h0 * 1000000) div hm").as("h")))
    }
    val topH = hubs.orderBy(col("h").desc, col("c")).limit(15)
      .select(lit("hub").as("side"), col("c").as("node"), big(col("h")).as("score"))
    val topA = auths.orderBy(col("a").desc, col("p")).limit(15)
      .select(lit("authority").as("side"), col("p").as("node"), big(col("a")).as("score"))
    topA.unionByName(topH).orderBy(col("side"), col("score").desc, col("node"))
  }

  /** Q277: brand modularity — Newman modularity of the BRAND partition
    * over the co-purchase graph: Q = Σ_b (e_bb/2m − (d_b/2m)²), "do
    * same-brand parts co-purchase more than chance?" — the attribute-
    * assortativity question a catalog team asks of basket data. Per-brand
    * contributions plus the exact-decimal total in the `(total)` row
    * (parenthesis sorts first; contributions are 6-dp-rounded decimals
    * BEFORE the total sum, the declared convention).
    *
    * Scale shape: the bounded co-purchase pair build (order-size-bounded
    * fan-out), two broadcast brand joins, three keyed counts and a 1-row
    * edge-mass broadcast — integer arithmetic until the final division.
    */
  def q277BrandModularity: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val items = Tables(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item")).distinct()
    val pe = items.select(col("o"), col("item").as("u"))
      .join(items.select(col("o"), col("item").as("v")), Seq("o"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("co"))
      .filter(col("co") >= 2)
    val brands = Tables(s, d, "part")
      .select(col("p_partkey"), col("p_brand"))
    val sym = pe.select(col("u"), col("v"))
      .union(pe.select(col("v"), col("u")))
      .join(broadcast(brands.select(col("p_partkey").as("u"),
        col("p_brand").as("bu"))), Seq("u"))
      .join(broadcast(brands.select(col("p_partkey").as("v"),
        col("p_brand").as("bv"))), Seq("v"))
    val m2 = sym.agg(count(lit(1)).as("m2"))
    val perBrand = sym.groupBy(col("bu"))
      .agg(count(lit(1)).as("deg_mass"),
        sum(when(col("bu") === col("bv"), 1L).otherwise(0L)).as("within"))
      .crossJoin(broadcast(m2))
      .select(col("bu").as("p_brand"), big(col("within")).as("within_edges"),
        big(col("deg_mass")).as("degree_mass"),
        round(col("within").cast("double") / col("m2").cast("double")
          - (col("deg_mass").cast("double") / col("m2").cast("double"))
            * (col("deg_mass").cast("double") / col("m2").cast("double")), 6)
          .cast(dec6).as("c6"))
    val total = perBrand.agg(
      big(sum(col("within_edges"))).as("within_edges"),
      big(sum(col("degree_mass"))).as("degree_mass"),
      round(sum(col("c6")).cast("double"), 6).as("contribution"))
      .select(lit("(total)").as("p_brand"), col("within_edges"),
        col("degree_mass"), col("contribution"))
    perBrand
      .select(col("p_brand"), col("within_edges"), col("degree_mass"),
        col("c6").cast("double").as("contribution"))
      .unionByName(total)
      .orderBy(col("p_brand"))
  }

  /** Q278: label-propagation communities — synchronous LPA over the
    * co-purchase graph (q277's `co >= 2` edge set): every node starts as
    * its own label, and each of 3 rounds replaces a node's label with the
    * MODE of its neighbors' labels (ties broken by the smallest label —
    * the classic determinism fix for LPA's tie chaos). Communities emerge
    * without choosing k or a distance metric; beside q197's connected
    * components (pure reachability) this finds DENSITY clusters inside one
    * component — the "which products form a basket theme" question.
    *
    * Determinism: labels are node ids (longs), the mode pick is a total
    * order `(count desc, label asc)`, and rounds are synchronous (every
    * round reads only the previous round's labels) — so the fixpoint
    * prefix is identical in any engine and a DuckDB oracle unrolls the 3
    * rounds as CTEs (the q215/q237 technique).
    *
    * Scale shape: the bounded co-purchase edge build (order-size-bounded
    * fan-out), then per round one edge-keyed join + one (node,label) count
    * + one node-partitioned row_number — every shuffle is edge- or
    * node-proportional, no global structure. Edges are materialized once
    * and reused by all rounds.
    */
  def q278LabelPropagation: Q = (s, d) => {
    val items = Tables(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item")).distinct()
    val pe = items.select(col("o"), col("item").as("u"))
      .join(items.select(col("o"), col("item").as("v")), Seq("o"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("co"))
      .filter(col("co") >= 2)
    val edges = graft.Checkpoints.materialize(
      pe.select(col("u"), col("v")).union(pe.select(col("v"), col("u"))))
    var labels = edges.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    val byMode = Window.partitionBy(col("u"))
      .orderBy(col("cnt").desc, col("nl"))
    for (_ <- 1 to 3) {
      labels = edges.join(labels, edges("v") === labels("node"))
        .select(col("u"), col("lbl").as("nl"))
        .groupBy(col("u"), col("nl")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(byMode))
        .filter(col("rn") === 1)
        .select(col("u").as("node"), col("nl").as("lbl"))
    }
    labels.select(col("node"), big(col("lbl")).as("community"))
      .orderBy(col("node"))
  }

  /** Q314: local clustering coefficient — per-node `2·T / (d·(d−1))` over
    * the FREQUENT co-purchase graph (pairs co-purchased in ≥2 orders, the
    * q277 edge set — the co≥2 floor keeps the pair build order-size-bounded
    * and drops the one-off noise edges that would drown the coefficient).
    * The "is my neighborhood a clique?" primitive behind community
    * tightness and recommendation-diversity scoring, where the global
    * triangle count (q165) is too coarse.
    *
    * Scale shape: the q165 degree-oriented triangle kernel — every edge
    * directed low-(degree,id) → high, so 2-path fan-out is bounded by
    * Σ outdeg² with outdeg O(√m) instead of hub-degree²; per-node triangle
    * participation is one explode+count over the closed triangles; the
    * coefficient is exact-integer `2T` against `d(d−1)` with one final
    * IEEE division. Top-20 by (cc, triangles, node) — a deterministic
    * total order.
    */
  def q314LocalClustering: Q = (s, d) => {
    val items = Tables(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item")).distinct()
    val e = items.select(col("o"), col("item").as("u"))
      .join(items.select(col("o"), col("item").as("v")), Seq("o"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("co"))
      .filter(col("co") >= 2)
      .select(col("u"), col("v"))
    // edges feed the degree agg AND both orientation joins — one pass
    val eM = graft.Checkpoints.materialize(e)
    val deg = eM.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("dg"))
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = graft.Checkpoints.materialize(
      eM.join(deg.select(col("x").as("u"), col("dg").as("du")), Seq("u"))
        .join(deg.select(col("x").as("v"), col("dg").as("dv")), Seq("v"))
        .select(when(fwd, col("u")).otherwise(col("v")).as("s1"),
          when(fwd, col("v")).otherwise(col("u")).as("t1")))
    val paths = o.select(col("s1").as("a"), col("t1").as("b"))
      .join(o.select(col("s1").as("b"), col("t1").as("c")), Seq("b"))
    val tri = paths.join(o.select(col("s1").as("a"), col("t1").as("c")), Seq("a", "c"))
    val triN = tri.select(explode(array(col("a"), col("b"), col("c"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("t"))
    deg.filter(col("dg") >= 2)
      .join(triN, Seq("x"), "left")
      .select(big(col("x")).as("part"), big(col("dg")).as("degree"),
        big(coalesce(col("t"), lit(0L))).as("n_tri"),
        round((coalesce(col("t"), lit(0L)) * 2L).cast("double")
          / (col("dg") * (col("dg") - 1L)).cast("double"), 6).as("cc"))
      .orderBy(col("cc").desc, col("n_tri").desc, col("part"))
      .limit(20)
  }

  /** Q322: common-neighbor Jaccard link prediction — for NON-adjacent node
    * pairs of the frequent co-purchase graph, `|N(u)∩N(v)| / |N(u)∪N(v)|`:
    * the "these two parts should co-sell but don't yet" candidate list a
    * recommender seeds from, and the structural sibling of q221's
    * Adamic-Adar (which scores by rarity of the shared neighbor; Jaccard
    * scores by overlap share).
    *
    * Scale shape: the 2-path join runs on the DEGREE-CAPPED induced
    * subgraph (both endpoints ≤64 — the q221 bound, declared): candidate
    * volume is Σ deg² ≤ 64·2m instead of unbounded hub fan-out; the edge
    * anti-join removes existing links; degrees/overlaps are exact
    * integers with one final IEEE division. Top-20 by (jaccard, common,
    * pair) — a deterministic total order.
    */
  def q322LinkPrediction: Q = (s, d) => {
    val items = Tables(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item")).distinct()
    val e = items.select(col("o"), col("item").as("u"))
      .join(items.select(col("o"), col("item").as("v")), Seq("o"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("co"))
      .filter(col("co") >= 2)
      .select(col("u"), col("v"))
    val eM = graft.Checkpoints.materialize(e)
    val deg = eM.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("dg"))
    val ok = deg.filter(col("dg") <= 64)
    // induced subgraph on the degree-capped nodes; degrees recomputed
    // WITHIN it so overlap and union counts refer to the same graph
    val e2 = graft.Checkpoints.materialize(
      eM.join(ok.select(col("x").as("u")), Seq("u"))
        .join(ok.select(col("x").as("v")), Seq("v"))
        .select(col("u"), col("v")))
    val deg2 = e2.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("dg"))
    val adj = e2.select(col("u").as("n"), col("v").as("m"))
      .union(e2.select(col("v").as("n"), col("u").as("m")))
    val common = adj.select(col("m").as("via"), col("n").as("p1"))
      .join(adj.select(col("m").as("via"), col("n").as("p2")), Seq("via"))
      .filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("cn"))
    val cand = common.join(e2,
      common("p1") === e2("u") && common("p2") === e2("v"), "left_anti")
    cand
      .join(deg2.select(col("x").as("p1"), col("dg").as("d1")), Seq("p1"))
      .join(deg2.select(col("x").as("p2"), col("dg").as("d2")), Seq("p2"))
      .select(big(col("p1")).as("p1"), big(col("p2")).as("p2"),
        big(col("cn")).as("common"),
        big(col("d1") + col("d2") - col("cn")).as("union_size"),
        round(col("cn").cast("double")
          / (col("d1") + col("d2") - col("cn")).cast("double"), 6)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("common").desc, col("p1"), col("p2"))
      .limit(20)
  }

  /** Q343: reciprocal best match — item pairs that are EACH OTHER's top
    * cosine neighbor in the q218 co-purchase model (rank-1 both ways,
    * the standard high-precision pairing rule in entity matching and
    * bilingual-lexicon induction: one-sided top-1 lists are noisy, the
    * mutual constraint filters them to near-certain matches).
    *
    * Scale shape: q218's bounded co-occurrence model; the top-1 window
    * partitions per item; the mutuality check is one self-join on the
    * (item → best) relation — rows ∝ items, never pairs².
    */
  def q343MutualTop1: Q = (s, d) => {
    val items = Tables(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item")).distinct()
    val pairs = coPairs(s, d)
    val deg = items.groupBy(col("item")).agg(count(lit(1)).as("dg"))
    val sym = pairs.select(col("u").as("i"), col("v").as("j"), col("co"))
      .union(pairs.select(col("v"), col("u"), col("co")))
    val scored = sym
      .join(deg.select(col("item").as("i"), col("dg").as("di")), Seq("i"))
      .join(deg.select(col("item").as("j"), col("dg").as("dj")), Seq("j"))
      .withColumn("cos", round(col("co").cast("double")
        / sqrt((col("di") * col("dj")).cast("double")), 6))
    val w = Window.partitionBy(col("i")).orderBy(col("cos").desc, col("j"))
    val best = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("i"), col("j"), col("co"), col("cos"))
    best.filter(col("i") < col("j"))
      .join(best.select(col("j").as("i"), col("i").as("j")), Seq("i", "j"),
        "left_semi")
      .select(big(col("i")).as("item_a"), big(col("j")).as("item_b"),
        big(col("co")).as("co_orders"), col("cos"))
      .orderBy(col("item_a"))
  }

  /** Q347: degree assortativity — the Pearson correlation of endpoint
    * degrees over the symmetrized co≥2 co-purchase edge list: do hubs
    * link to hubs (r > 0, social-network-like) or to leaves (r < 0,
    * hub-and-spoke)? The one-number topology fingerprint that decides
    * whether hub-targeted sampling or degree capping is the right scale
    * strategy for this graph.
    *
    * Determinism & scale shape: all five moments are EXACT integer sums
    * over the symmetric edge relation (degrees are bounded integers); the
    * correlation is one fixed IEEE tree. Two keyed aggregates + one
    * reduction.
    */
  def q347DegreeAssortativity: Q = (s, d) => {
    val items = Tables(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item")).distinct()
    val e = items.select(col("o"), col("item").as("u"))
      .join(items.select(col("o"), col("item").as("v")), Seq("o"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("co"))
      .filter(col("co") >= 2)
      .select(col("u"), col("v"))
    val eM = graft.Checkpoints.materialize(e)
    val deg = eM.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("dg"))
    val sym = eM.select(col("u").as("a"), col("v").as("b"))
      .union(eM.select(col("v").as("a"), col("u").as("b")))
      .join(deg.select(col("x").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("x").as("b"), col("dg").as("db")), Seq("b"))
    val m = sym.agg(count(lit(1)).as("m2"),
      sum(col("da")).cast("long").as("sj"),
      sum(col("db")).cast("long").as("sk"),
      sum(col("da") * col("db")).cast("long").as("sjk"),
      sum(col("da") * col("da")).cast("long").as("sjj"),
      sum(col("db") * col("db")).cast("long").as("skk"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val mD = col("m2").cast("double")
    val r = (col("sjk").cast("double") - col("sj").cast("double")
      * col("sk").cast("double") / mD) /
      sqrt((col("sjj").cast("double") - col("sj").cast("double")
        * col("sj").cast("double") / mD)
        * (col("skk").cast("double") - col("sk").cast("double")
          * col("sk").cast("double") / mD))
    m.crossJoin(broadcast(nNodes))
      .select(big(col("n_nodes")).as("n_nodes"),
        big(col("m2") / 2L).as("n_edges"),
        round(r, 6).as("assortativity"))
  }

  /** Q358: intra-list diversity of the q218 recommendation lists — for
    * each probe item's top-5, the mean pairwise (1 − cosine) among the
    * RECOMMENDED items (10 pairs, cosine 0 when the pair never
    * co-occurs), plus the overall mean. The accuracy/diversity trade-off
    * readout: a list of five near-identical substitutes scores high on
    * cosine and useless on discovery — this is the number a rec review
    * reads next to q234's hit rate.
    *
    * Scale shape: the ≤100-row rec relation self-joins per probe (10
    * pairs each), looks pair cosines up in the bounded co-occurrence
    * model, and the overall mean is an exact 6-dp decimal sum over the
    * 20-row per-probe report.
    */
  def q358RecDiversity: Q = (s, d) => {
    val dec6 = DecimalType(18, 6)
    val items = Tables(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("item")).distinct()
    val pairs = coPairs(s, d)
    val deg = items.groupBy(col("item")).agg(count(lit(1)).as("dg"))
    val probes = deg.orderBy(col("dg").desc, col("item")).limit(20)
      .select(col("item").as("i"), col("dg").as("di"))
    val sym = pairs.select(col("u").as("i"), col("v").as("j"), col("co"))
      .union(pairs.select(col("v"), col("u"), col("co")))
    val scored = sym.join(broadcast(probes), Seq("i"))
      .join(deg.withColumnRenamed("item", "j").withColumnRenamed("dg", "dj"), Seq("j"))
      .withColumn("cos", round(col("co").cast("double")
        / sqrt((col("di") * col("dj")).cast("double")), 6))
    val w = Window.partitionBy(col("i")).orderBy(col("cos").desc, col("j"))
    val recs = graft.Checkpoints.materialize(
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("i"), col("j")))
    // pairwise similarity among the recommended items: model lookup, 0
    // when the pair never co-occurs
    val recPairs = recs.select(col("i"), col("j").as("a"))
      .join(recs.select(col("i"), col("j").as("b")), Seq("i"))
      .filter(col("a") < col("b"))
    val withCos = recPairs
      .join(pairs.select(col("u").as("a"), col("v").as("b"), col("co")),
        Seq("a", "b"), "left")
      .join(deg.select(col("item").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("item").as("b"), col("dg").as("db")), Seq("b"))
      .withColumn("pc", coalesce(round(col("co").cast("double")
        / sqrt((col("da") * col("db")).cast("double")), 6), lit(0.0)))
    val perProbe = withCos.groupBy(col("i"))
      .agg(count(lit(1)).as("n_pairs"),
        round(lit(1.0) - sum(col("pc").cast(dec6)).cast("double")
          / count(lit(1)).cast("double"), 6).as("ild"))
    val overall = perProbe.agg(
      big(count(lit(1))).as("n_probes"),
      round(sum(col("ild").cast(dec6)).cast("double")
        / count(lit(1)).cast("double"), 6).as("mean_ild"))
    perProbe.select(big(col("i")).as("probe"), big(col("n_pairs")).as("n_pairs"),
      col("ild"))
      .unionByName(overall.select(lit(-1L).as("probe"),
        col("n_probes").as("n_pairs"), col("mean_ild").as("ild")))
      .orderBy(col("probe"))
  }

  /** Q462: rich-club coefficient — do the co-purchase graph's hubs link
    * to EACH OTHER more densely than the graph overall (the
    * hub-interconnection view q347's assortativity only summarizes as
    * one correlation)? φ(k) = E₍>k₎/(N₍>k₎(N₍>k₎−1)) over directed edges
    * among nodes with degree > k, at the 50/75/90th degree percentiles
    * (lower-quantile convention via the bounded degree-support cumsum —
    * SF-robust where absolute k is not). Rides the standing [[coEdges]]/
    * [[coDegrees]] relations; the only new work is one edge×degree join
    * and three bounded threshold probes.
    */
  def q462RichClub: Q = (s, d) => {
    val deg = coDegrees(s, d)
    val byD = deg.groupBy(col("d")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byD.agg(sum(col("cnt")).cast("long").as("nn"))
    val th = byD.withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("pct", explode(array(Seq(50L, 75L, 90L).map(lit): _*)))
      .filter(expr("cum >= (pct * nn + 99) div 100"))
      .groupBy(col("pct")).agg(min(col("d")).as("k"))
    val nc = deg.crossJoin(broadcast(th)).filter(col("d") > col("k"))
      .groupBy(col("pct")).agg(count(lit(1)).as("n_nodes"))
    val ds = deg.select(col("src"), col("d").as("dsrc"))
    val dd = deg.select(col("src").as("dst"), col("d").as("ddst"))
    val ec = coEdges(s, d).join(ds, Seq("src")).join(dd, Seq("dst"))
      .crossJoin(broadcast(th))
      .filter(col("dsrc") > col("k") && col("ddst") > col("k"))
      .groupBy(col("pct")).agg(count(lit(1)).as("ne"))
    val nD = col("n_nodes").cast("double")
    th.join(nc, Seq("pct")).join(ec, Seq("pct"))
      .select(col("pct"), col("k").as("k_threshold"), col("n_nodes"),
        col("ne").as("n_edges_directed"),
        round(col("ne").cast("double") / (nD * (nD - 1.0)), 6).as("phi"))
      .orderBy(col("pct"))
  }

  val queries: Map[String, Q] = Map(
    "q462_rich_club" -> q462RichClub,
    "q358_rec_diversity" -> q358RecDiversity,
    "q347_degree_assortativity" -> q347DegreeAssortativity,
    "q343_mutual_top1" -> q343MutualTop1,
    "q322_link_prediction" -> q322LinkPrediction,
    "q314_local_clustering" -> q314LocalClustering,
    "q278_label_propagation" -> q278LabelPropagation,
    "q277_brand_modularity" -> q277BrandModularity,
    "q275_personalized_pagerank" -> q275PersonalizedPagerank,
    "q304_hits" -> q304Hits,
    "q253_ndcg_mrr" -> q253NdcgMrr,
    "q237_weighted_sssp" -> q237WeightedSssp,
    "q234_rec_holdout_eval" -> q234RecHoldoutEval,
    "q221_adamic_adar" -> q221AdamicAdar,
    "q218_item_cosine" -> q218ItemCosine,
    "q215_kcore" -> q215Kcore,
    "q208_degree_dist" -> q208DegreeDist,
    "q81_copurchase_rank" -> q81CopurchaseRank,
    "q165_triangles" -> q165Triangles,
    "q176_bfs_hops" -> q176BfsHops,
    "q197_connected_components" -> q197ConnectedComponents)

  /** The q215 oracle: the same 12 peel rounds unrolled as CTEs (the q176
    * unrolled-BFS technique, generated instead of hand-written).
    */
  private val kcoreSql: String = {
    // AS MATERIALIZED: each round references the previous round twice
    // (degree pass + restriction), so inlined CTEs would re-evaluate e0
    // 2^12 times — materialization keeps the oracle linear in rounds
    val rounds = (1 to 12).map { i =>
      s"""d$i AS MATERIALIZED (SELECT u, COUNT(*) AS dg FROM e${i - 1} GROUP BY u),
         |k$i AS MATERIALIZED (SELECT u FROM d$i WHERE dg >= 3),
         |e$i AS MATERIALIZED (SELECT e.u, e.v FROM e${i - 1} e
         |        JOIN k$i a ON e.u = a.u JOIN k$i b ON e.v = b.u)""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
       |pe AS MATERIALIZED (
       |  SELECT a.item AS u, b.item AS v
       |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |e0 AS MATERIALIZED (SELECT u, v FROM pe UNION ALL SELECT v, u FROM pe),
       |$rounds
       |SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
       |FROM e12 GROUP BY u ORDER BY node""".stripMargin
  }

  /** The q237 oracle: 8 Bellman-Ford rounds unrolled as MATERIALIZED CTEs
    * (each round references the previous twice — the q215 inlining lesson).
    */
  private val ssspSql: String = {
    val rounds = (1 to 8).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT node, MIN(dist) AS dist FROM (
         |    SELECT e.v AS node, CAST(d.dist + e.w AS DECIMAL(18,6)) AS dist
         |    FROM e JOIN d${i - 1} d ON e.u = d.node
         |    UNION ALL SELECT node, dist FROM d${i - 1})
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
       |pe AS MATERIALIZED (
       |  SELECT a.item AS u, b.item AS v, COUNT(*) AS co
       |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |e AS MATERIALIZED (
       |  SELECT u, v,
       |    CAST(ROUND(CAST(1 AS DOUBLE) / CAST(co AS DOUBLE), 6) AS DECIMAL(18,6)) AS w
       |  FROM (SELECT u, v, co FROM pe UNION ALL SELECT v, u, co FROM pe)),
       |d0 AS (SELECT MIN(u) AS node, CAST(0 AS DECIMAL(18,6)) AS dist FROM e),
       |$rounds
       |SELECT node, CAST(dist AS DOUBLE) AS distance FROM d8 ORDER BY node""".stripMargin
  }

  /** The q253 oracle: q234's CTE chain with the rec RANK kept, then the
    * exact-decimal NDCG/MRR arithmetic — 9-dp-rounded discount constants
    * (generated, the kcoreSql technique), 6-dp per-customer round before the
    * exact-decimal segment mean: the identical shape the Spark side computes.
    */
  private val ndcgSql: String = {
    def c(k: Int) =
      s"CAST(ROUND(CAST(1 AS DOUBLE) / LOG2(CAST(${k + 1} AS DOUBLE)), 9) AS DECIMAL(18,9))"
    def mm(k: Int) =
      s"CAST(ROUND(CAST(1 AS DOUBLE) / CAST($k AS DOUBLE), 9) AS DECIMAL(18,9))"
    def pp(k: Int) = (1 to k).map(c).mkString("(", " + ", ")")
    val dcgCase = (1 to 5).map(k => s"WHEN rk = $k THEN ${c(k)}").mkString(" ")
    val idcgCase = (1 to 5).map(k => s"WHEN nr = $k THEN ${pp(k)}").mkString(" ")
    val rrCase = (1 to 5).map(k => s"WHEN minrk = $k THEN ${mm(k)}").mkString(" ")
    s"""WITH mk AS (
       |  SELECT o_orderkey, o_custkey, o_orderdate,
       |    ROW_NUMBER() OVER (PARTITION BY o_custkey
       |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
       |  FROM orders),
       |ho AS (SELECT o_orderkey AS ho_key, o_custkey FROM mk WHERE rn = 1),
       |tr AS (SELECT o_orderkey AS tr_key, o_custkey, o_orderdate
       |       FROM mk WHERE rn > 1),
       |items AS MATERIALIZED (
       |  SELECT DISTINCT tr_key AS o, l_partkey AS item, o_custkey, o_orderdate
       |  FROM lineitem JOIN tr ON l_orderkey = tr_key),
       |pairs AS MATERIALIZED (
       |  SELECT a.item AS u, b.item AS v, COUNT(*) AS co
       |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
       |  GROUP BY 1, 2),
       |deg AS (SELECT item, COUNT(*) AS dg
       |        FROM (SELECT DISTINCT o, item FROM items) GROUP BY 1),
       |anch AS (
       |  SELECT o_custkey, item AS anchor FROM (
       |    SELECT o_custkey, item, ROW_NUMBER() OVER (PARTITION BY o_custkey
       |      ORDER BY o_orderdate DESC, o DESC, item DESC) AS rn
       |    FROM items) WHERE rn = 1),
       |sym AS (SELECT u AS i, v AS j, co FROM pairs
       |        UNION ALL SELECT v, u, co FROM pairs),
       |sc AS (
       |  SELECT s.i, s.j,
       |    ROUND(CAST(co AS DOUBLE) / SQRT(CAST(d1.dg * d2.dg AS DOUBLE)), 6) AS cos
       |  FROM sym s JOIN deg d1 ON s.i = d1.item JOIN deg d2 ON s.j = d2.item),
       |recs AS (SELECT i, j, rk FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY i
       |    ORDER BY cos DESC, j) AS rk FROM sc) WHERE rk <= 5),
       |cr AS (SELECT o_custkey, j, rk FROM anch JOIN recs ON anchor = i),
       |hop AS (SELECT DISTINCT ho.o_custkey AS hc, l_partkey AS hp
       |        FROM lineitem JOIN ho ON l_orderkey = ho_key),
       |relv AS (
       |  SELECT cr.o_custkey, cr.rk, hp IS NOT NULL AS hit
       |  FROM cr LEFT JOIN hop ON cr.o_custkey = hop.hc AND cr.j = hop.hp),
       |perc AS (
       |  SELECT o_custkey,
       |    SUM(CASE WHEN hit THEN CASE $dcgCase END
       |        ELSE CAST(0 AS DECIMAL(18,9)) END) AS dcg,
       |    MIN(CASE WHEN hit THEN rk END) AS minrk
       |  FROM relv GROUP BY 1),
       |nrel AS (SELECT hc, LEAST(COUNT(*), 5) AS nr FROM hop GROUP BY 1),
       |sc2 AS (
       |  SELECT p.o_custkey,
       |    CAST(ROUND(CAST(dcg AS DOUBLE)
       |      / CAST(CASE $idcgCase END AS DOUBLE), 6) AS DECIMAL(18,6)) AS ndcg6,
       |    CASE $rrCase ELSE CAST(0 AS DECIMAL(18,9)) END AS rr
       |  FROM perc p JOIN nrel ON p.o_custkey = nrel.hc)
       |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_eval,
       |  ROUND(CAST(SUM(ndcg6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS ndcg_at_5,
       |  ROUND(CAST(SUM(rr) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mrr
       |FROM sc2 JOIN customer ON o_custkey = c_custkey
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The q278 oracle: 3 synchronous LPA rounds unrolled as MATERIALIZED
    * CTEs (the q215/q237 technique); the mode pick is the same
    * `(count desc, label asc)` row_number total order.
    */
  private val lpaSql: String = {
    val rounds = (1 to 3).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT e.u, l.lbl AS nl, COUNT(*) AS cnt
         |  FROM e JOIN l${i - 1} l ON e.v = l.node GROUP BY 1, 2),
         |l$i AS MATERIALIZED (
         |  SELECT u AS node, nl AS lbl FROM (
         |    SELECT u, nl, ROW_NUMBER() OVER (PARTITION BY u
         |      ORDER BY cnt DESC, nl) AS rn FROM c$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
       |pe AS MATERIALIZED (
       |  SELECT a.item AS u, b.item AS v
       |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |e AS MATERIALIZED (SELECT u, v FROM pe UNION ALL SELECT v, u FROM pe),
       |l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl FROM e),
       |$rounds
       |SELECT node, CAST(lbl AS BIGINT) AS community
       |FROM l3 ORDER BY node""".stripMargin
  }

  /** The q304 oracle: the 2-round HITS fixpoint unrolled, same scaled-
    * integer normalization (`//` and Spark's `div` agree on positives).
    */
  private val hitsSql: String = {
    val rounds = (1 to 2).map { r =>
      val ph = if (r == 1) "h0" else s"h${r - 1}"
      s"""a${r}r AS MATERIALIZED (
         |  SELECT p, SUM(h) AS s FROM e JOIN $ph USING (c) GROUP BY p),
         |a$r AS MATERIALIZED (
         |  SELECT p, (s * 1000000) // am AS a
         |  FROM a${r}r, (SELECT MAX(s) AS am FROM a${r}r)),
         |h${r}r AS MATERIALIZED (
         |  SELECT c, SUM(a) AS s FROM e JOIN a$r USING (p) GROUP BY c),
         |h$r AS MATERIALIZED (
         |  SELECT c, (s * 1000000) // hm AS h
         |  FROM h${r}r, (SELECT MAX(s) AS hm FROM h${r}r))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |h0 AS (SELECT c, CAST(1000000 AS BIGINT) AS h FROM (SELECT DISTINCT c FROM e)),
       |$rounds,
       |ta AS (SELECT 'authority' AS side, p AS node, CAST(a AS BIGINT) AS score
       |       FROM a2 ORDER BY a DESC, p LIMIT 15),
       |th AS (SELECT 'hub' AS side, c AS node, CAST(h AS BIGINT) AS score
       |       FROM h2 ORDER BY h DESC, c LIMIT 15)
       |SELECT side, node, score FROM (SELECT * FROM ta UNION ALL SELECT * FROM th)
       |ORDER BY side, score DESC, node""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q462_rich_club" ->
      """WITH e AS MATERIALIZED (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS MATERIALIZED (
        |  SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1),
        |byd AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt FROM deg GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS nn FROM byd),
        |cum AS (SELECT d, SUM(cnt) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM byd),
        |th AS MATERIALIZED (SELECT CAST(pct AS BIGINT) AS pct, MIN(d) AS k
        |  FROM cum, tot, (SELECT UNNEST([50, 75, 90]) AS pct) p
        |  WHERE cum >= (pct * nn + 99) // 100 GROUP BY 1),
        |nc AS (SELECT pct, CAST(COUNT(*) AS BIGINT) AS n_nodes
        |  FROM deg, th WHERE d > k GROUP BY 1),
        |ec AS (SELECT pct, CAST(COUNT(*) AS BIGINT) AS ne
        |  FROM e JOIN deg ds ON e.src = ds.src
        |  JOIN deg dd ON e.dst = dd.src, th
        |  WHERE ds.d > k AND dd.d > k GROUP BY 1)
        |SELECT th.pct, th.k AS k_threshold, n_nodes,
        |  ne AS n_edges_directed,
        |  ROUND(CAST(ne AS DOUBLE) / (CAST(n_nodes AS DOUBLE)
        |    * (CAST(n_nodes AS DOUBLE) - CAST('1.0' AS DOUBLE))), 6) AS phi
        |FROM th JOIN nc USING (pct) JOIN ec USING (pct)
        |ORDER BY 1""".stripMargin,
    "q358_rec_diversity" ->
      """WITH items AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
        |pe AS MATERIALIZED (
        |  SELECT a.item AS u, b.item AS v, COUNT(*) AS co
        |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
        |  GROUP BY 1, 2),
        |deg AS MATERIALIZED (
        |  SELECT item, COUNT(*) AS dg FROM items GROUP BY 1),
        |probes AS (SELECT item AS i, dg AS di FROM deg
        |           ORDER BY dg DESC, item LIMIT 20),
        |sym AS (SELECT u AS i, v AS j, co FROM pe
        |        UNION ALL SELECT v, u, co FROM pe),
        |scored AS (
        |  SELECT sym.i, sym.j,
        |    ROUND(CAST(co AS DOUBLE)
        |      / SQRT(CAST(p.di * dj.dg AS DOUBLE)), 6) AS cos
        |  FROM sym JOIN probes p ON sym.i = p.i
        |  JOIN deg dj ON sym.j = dj.item),
        |recs AS MATERIALIZED (
        |  SELECT i, j FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY i
        |      ORDER BY cos DESC, j) AS rn FROM scored)
        |  WHERE rn <= 5),
        |rp AS (
        |  SELECT a.i, a.j AS a, b.j AS b
        |  FROM recs a JOIN recs b ON a.i = b.i AND a.j < b.j),
        |wc AS (
        |  SELECT rp.i,
        |    COALESCE(ROUND(CAST(pe.co AS DOUBLE)
        |      / SQRT(CAST(da.dg * db.dg AS DOUBLE)), 6),
        |      CAST('0.0' AS DOUBLE)) AS pc
        |  FROM rp
        |  LEFT JOIN pe ON rp.a = pe.u AND rp.b = pe.v
        |  JOIN deg da ON rp.a = da.item JOIN deg db ON rp.b = db.item),
        |per AS (
        |  SELECT i, COUNT(*) AS n_pairs,
        |    ROUND(CAST('1.0' AS DOUBLE)
        |      - CAST(SUM(CAST(pc AS DECIMAL(18,6))) AS DOUBLE)
        |        / CAST(COUNT(*) AS DOUBLE), 6) AS ild
        |  FROM wc GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(i AS BIGINT) AS probe, CAST(n_pairs AS BIGINT) AS n_pairs,
        |    ild
        |  FROM per
        |  UNION ALL
        |  SELECT -1, CAST(COUNT(*) AS BIGINT),
        |    ROUND(CAST(SUM(CAST(ild AS DECIMAL(18,6))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE), 6)
        |  FROM per)
        |ORDER BY probe""".stripMargin,
    "q347_degree_assortativity" ->
      """WITH items AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
        |e AS MATERIALIZED (
        |  SELECT a.item AS u, b.item AS v
        |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS MATERIALIZED (
        |  SELECT x, COUNT(*) AS dg FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) GROUP BY 1),
        |sym AS (
        |  SELECT da.dg AS da, db.dg AS db
        |  FROM (SELECT u AS a, v AS b FROM e
        |        UNION ALL SELECT v AS a, u AS b FROM e) s
        |  JOIN deg da ON s.a = da.x JOIN deg db ON s.b = db.x),
        |m AS (
        |  SELECT COUNT(*) AS m2,
        |    CAST(SUM(da) AS BIGINT) AS sj, CAST(SUM(db) AS BIGINT) AS sk,
        |    CAST(SUM(da * db) AS BIGINT) AS sjk,
        |    CAST(SUM(da * da) AS BIGINT) AS sjj,
        |    CAST(SUM(db * db) AS BIGINT) AS skk
        |  FROM sym),
        |nn AS (SELECT COUNT(*) AS n_nodes FROM deg)
        |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
        |  CAST(m2 // 2 AS BIGINT) AS n_edges,
        |  ROUND((CAST(sjk AS DOUBLE) - CAST(sj AS DOUBLE) * CAST(sk AS DOUBLE)
        |      / CAST(m2 AS DOUBLE))
        |    / SQRT((CAST(sjj AS DOUBLE) - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE)
        |        / CAST(m2 AS DOUBLE))
        |      * (CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE)
        |        / CAST(m2 AS DOUBLE))), 6) AS assortativity
        |FROM m, nn""".stripMargin,
    "q343_mutual_top1" ->
      """WITH items AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
        |pe AS MATERIALIZED (
        |  SELECT a.item AS u, b.item AS v, COUNT(*) AS co
        |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
        |  GROUP BY 1, 2),
        |sym AS (SELECT u AS i, v AS j, co FROM pe
        |        UNION ALL SELECT v, u, co FROM pe),
        |deg AS MATERIALIZED (
        |  SELECT item, COUNT(*) AS dg FROM items GROUP BY 1),
        |scored AS (
        |  SELECT i, j, co,
        |    ROUND(CAST(co AS DOUBLE)
        |      / SQRT(CAST(a.dg * b.dg AS DOUBLE)), 6) AS cos
        |  FROM sym JOIN deg a ON sym.i = a.item JOIN deg b ON sym.j = b.item),
        |best AS MATERIALIZED (
        |  SELECT i, j, co, cos FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY i
        |      ORDER BY cos DESC, j) AS rn FROM scored)
        |  WHERE rn = 1)
        |SELECT CAST(i AS BIGINT) AS item_a, CAST(j AS BIGINT) AS item_b,
        |  CAST(co AS BIGINT) AS co_orders, cos
        |FROM best b WHERE i < j
        |  AND EXISTS (SELECT 1 FROM best m WHERE m.i = b.j AND m.j = b.i)
        |ORDER BY item_a""".stripMargin,
    "q322_link_prediction" ->
      """WITH items AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
        |e AS MATERIALIZED (
        |  SELECT a.item AS u, b.item AS v
        |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS MATERIALIZED (
        |  SELECT x, COUNT(*) AS dg FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) GROUP BY 1),
        |e2 AS MATERIALIZED (
        |  SELECT u, v FROM e
        |  WHERE u IN (SELECT x FROM deg WHERE dg <= 64)
        |    AND v IN (SELECT x FROM deg WHERE dg <= 64)),
        |deg2 AS MATERIALIZED (
        |  SELECT x, COUNT(*) AS dg FROM (
        |    SELECT u AS x FROM e2 UNION ALL SELECT v AS x FROM e2) GROUP BY 1),
        |adj AS MATERIALIZED (
        |  SELECT u AS n, v AS m FROM e2 UNION ALL SELECT v AS n, u AS m FROM e2),
        |com AS MATERIALIZED (
        |  SELECT a.n AS p1, b.n AS p2, COUNT(*) AS cn
        |  FROM adj a JOIN adj b ON a.m = b.m AND a.n < b.n
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT p1, p2, cn FROM com c
        |  WHERE NOT EXISTS (SELECT 1 FROM e2 WHERE u = c.p1 AND v = c.p2))
        |SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
        |  CAST(cn AS BIGINT) AS common,
        |  CAST(d1.dg + d2.dg - cn AS BIGINT) AS union_size,
        |  ROUND(CAST(cn AS DOUBLE) / CAST(d1.dg + d2.dg - cn AS DOUBLE), 6)
        |    AS jaccard
        |FROM cand JOIN deg2 d1 ON cand.p1 = d1.x JOIN deg2 d2 ON cand.p2 = d2.x
        |ORDER BY jaccard DESC, common DESC, p1, p2 LIMIT 20""".stripMargin,
    "q314_local_clustering" ->
      """WITH items AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
        |e AS MATERIALIZED (
        |  SELECT a.item AS u, b.item AS v
        |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS MATERIALIZED (
        |  SELECT x, COUNT(*) AS dg FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) GROUP BY 1),
        |o AS MATERIALIZED (
        |  SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS s1,
        |         CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS t1
        |  FROM (SELECT e.u, e.v, a.dg AS du, b.dg AS dv
        |        FROM e JOIN deg a ON e.u = a.x JOIN deg b ON e.v = b.x)),
        |tri AS (
        |  SELECT p.a, p.b, p.c FROM
        |    (SELECT o1.s1 AS a, o1.t1 AS b, o2.t1 AS c
        |     FROM o o1 JOIN o o2 ON o1.t1 = o2.s1) p
        |  JOIN o o3 ON p.a = o3.s1 AND p.c = o3.t1),
        |trin AS (
        |  SELECT x, COUNT(*) AS t FROM (
        |    SELECT a AS x FROM tri UNION ALL SELECT b AS x FROM tri
        |    UNION ALL SELECT c AS x FROM tri) GROUP BY 1)
        |SELECT CAST(x AS BIGINT) AS part, CAST(dg AS BIGINT) AS degree,
        |  CAST(COALESCE(t, 0) AS BIGINT) AS n_tri,
        |  ROUND(CAST(COALESCE(t, 0) * 2 AS DOUBLE)
        |        / CAST(dg * (dg - 1) AS DOUBLE), 6) AS cc
        |FROM deg LEFT JOIN trin USING (x) WHERE dg >= 2
        |ORDER BY cc DESC, n_tri DESC, part LIMIT 20""".stripMargin,
    "q304_hits" -> hitsSql,
    "q278_label_propagation" -> lpaSql,
    "q277_brand_modularity" ->
      """WITH items AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
        |pe AS MATERIALIZED (
        |  SELECT a.item AS u, b.item AS v
        |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |sym AS (
        |  SELECT e.u, e.v, pu.p_brand AS bu, pv.p_brand AS bv
        |  FROM (SELECT u, v FROM pe UNION ALL SELECT v, u FROM pe) e
        |  JOIN part pu ON e.u = pu.p_partkey
        |  JOIN part pv ON e.v = pv.p_partkey),
        |m2 AS (SELECT COUNT(*) AS m2 FROM sym),
        |pb AS (
        |  SELECT bu AS p_brand,
        |    CAST(SUM(CASE WHEN bu = bv THEN 1 ELSE 0 END) AS BIGINT)
        |      AS within_edges,
        |    CAST(COUNT(*) AS BIGINT) AS degree_mass,
        |    CAST(ROUND(CAST(SUM(CASE WHEN bu = bv THEN 1 ELSE 0 END) AS DOUBLE)
        |        / CAST(m2 AS DOUBLE)
        |      - (CAST(COUNT(*) AS DOUBLE) / CAST(m2 AS DOUBLE))
        |        * (CAST(COUNT(*) AS DOUBLE) / CAST(m2 AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS c6
        |  FROM sym, m2 GROUP BY bu, m2),
        |tot AS (
        |  SELECT '(total)' AS p_brand,
        |    CAST(SUM(within_edges) AS BIGINT) AS within_edges,
        |    CAST(SUM(degree_mass) AS BIGINT) AS degree_mass,
        |    ROUND(CAST(SUM(c6) AS DOUBLE), 6) AS contribution
        |  FROM pb)
        |SELECT p_brand, within_edges, degree_mass,
        |  CAST(c6 AS DOUBLE) AS contribution FROM pb
        |UNION ALL SELECT * FROM tot
        |ORDER BY p_brand""".stripMargin,
    "q275_personalized_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS (SELECT src, COUNT(*) AS d FROM pairs GROUP BY src),
        |seeds AS (SELECT src AS seed FROM deg ORDER BY d DESC, src LIMIT 5),
        |r0 AS (SELECT deg.src AS node,
        |         CASE WHEN seed IS NOT NULL THEN CAST(1000000 AS BIGINT)
        |              ELSE CAST(0 AS BIGINT) END AS r
        |       FROM deg LEFT JOIN seeds ON deg.src = seed),
        |r1 AS (
        |  SELECT p.dst AS node,
        |    CAST(CASE WHEN s.seed IS NOT NULL THEN 150000 ELSE 0 END
        |      + (85 * SUM(r.r // d.d)) // 100 AS BIGINT) AS r
        |  FROM pairs p JOIN r0 r ON p.src = r.node JOIN deg d ON p.src = d.src
        |  LEFT JOIN seeds s ON p.dst = s.seed
        |  GROUP BY p.dst, s.seed),
        |r2 AS (
        |  SELECT p.dst AS node,
        |    CAST(CASE WHEN s.seed IS NOT NULL THEN 150000 ELSE 0 END
        |      + (85 * SUM(r.r // d.d)) // 100 AS BIGINT) AS r
        |  FROM pairs p JOIN r1 r ON p.src = r.node JOIN deg d ON p.src = d.src
        |  LEFT JOIN seeds s ON p.dst = s.seed
        |  GROUP BY p.dst, s.seed),
        |r3 AS (
        |  SELECT p.dst AS node,
        |    CAST(CASE WHEN s.seed IS NOT NULL THEN 150000 ELSE 0 END
        |      + (85 * SUM(r.r // d.d)) // 100 AS BIGINT) AS r
        |  FROM pairs p JOIN r2 r ON p.src = r.node JOIN deg d ON p.src = d.src
        |  LEFT JOIN seeds s ON p.dst = s.seed
        |  GROUP BY p.dst, s.seed)
        |SELECT node, r FROM r3 WHERE r > 0
        |ORDER BY r DESC, node LIMIT 25""".stripMargin,
    "q253_ndcg_mrr" -> ndcgSql,
    "q237_weighted_sssp" -> ssspSql,
    "q234_rec_holdout_eval" ->
      """WITH mk AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders),
        |ho AS (SELECT o_orderkey AS ho_key, o_custkey FROM mk WHERE rn = 1),
        |tr AS (SELECT o_orderkey AS tr_key, o_custkey, o_orderdate
        |       FROM mk WHERE rn > 1),
        |items AS MATERIALIZED (
        |  SELECT DISTINCT tr_key AS o, l_partkey AS item, o_custkey, o_orderdate
        |  FROM lineitem JOIN tr ON l_orderkey = tr_key),
        |pairs AS MATERIALIZED (
        |  SELECT a.item AS u, b.item AS v, COUNT(*) AS co
        |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
        |  GROUP BY 1, 2),
        |deg AS (SELECT item, COUNT(*) AS dg
        |        FROM (SELECT DISTINCT o, item FROM items) GROUP BY 1),
        |anch AS (
        |  SELECT o_custkey, item AS anchor FROM (
        |    SELECT o_custkey, item, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o DESC, item DESC) AS rn
        |    FROM items) WHERE rn = 1),
        |sym AS (SELECT u AS i, v AS j, co FROM pairs
        |        UNION ALL SELECT v, u, co FROM pairs),
        |sc AS (
        |  SELECT s.i, s.j,
        |    ROUND(CAST(co AS DOUBLE) / SQRT(CAST(d1.dg * d2.dg AS DOUBLE)), 6) AS cos
        |  FROM sym s JOIN deg d1 ON s.i = d1.item JOIN deg d2 ON s.j = d2.item),
        |recs AS (SELECT i, j FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY i
        |    ORDER BY cos DESC, j) AS rk FROM sc) WHERE rk <= 5),
        |cr AS (SELECT o_custkey, j FROM anch JOIN recs ON anchor = i),
        |hop AS (SELECT DISTINCT ho.o_custkey, l_partkey
        |        FROM lineitem JOIN ho ON l_orderkey = ho_key),
        |hits AS (SELECT DISTINCT cr.o_custkey
        |         FROM cr JOIN hop ON cr.o_custkey = hop.o_custkey
        |           AND cr.j = hop.l_partkey)
        |SELECT c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_eval,
        |  CAST(SUM(CASE WHEN hits.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hits,
        |  ROUND(CAST(SUM(CASE WHEN hits.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS hit_rate
        |FROM anch LEFT JOIN hits ON anch.o_custkey = hits.o_custkey
        |JOIN customer ON anch.o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q221_adamic_adar" ->
      """WITH cp AS (
        |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |pc AS (SELECT p, COUNT(*) AS nc FROM cp GROUP BY 1
        |       HAVING COUNT(*) BETWEEN 2 AND 64),
        |pw AS (SELECT p,
        |         CAST(ROUND(CAST(1 AS DOUBLE) / LN(CAST(nc AS DOUBLE)), 6)
        |           AS DECIMAL(18,6)) AS w
        |       FROM pc),
        |b AS (SELECT cp.p, cp.c, w FROM cp JOIN pw ON cp.p = pw.p),
        |pairs AS (
        |  SELECT a.c AS c1, b2.c AS c2, COUNT(*) AS sp, SUM(a.w) AS aa
        |  FROM b a JOIN b b2 ON a.p = b2.p AND a.c < b2.c
        |  GROUP BY 1, 2)
        |SELECT c1, c2, CAST(sp AS BIGINT) AS shared_parts,
        |  CAST(CAST(aa AS DECIMAL(38,6)) AS DOUBLE) AS aa_score
        |FROM pairs ORDER BY aa_score DESC, c1, c2 LIMIT 20""".stripMargin,
    "q218_item_cosine" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
        |pairs AS (
        |  SELECT a.item AS u, b.item AS v, COUNT(*) AS co
        |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
        |  GROUP BY 1, 2),
        |deg AS (SELECT item, COUNT(*) AS dg FROM items GROUP BY 1),
        |probes AS (SELECT item AS i, dg AS di FROM deg
        |           ORDER BY dg DESC, item LIMIT 20),
        |sym AS (SELECT u AS i, v AS j, co FROM pairs
        |        UNION ALL SELECT v, u, co FROM pairs),
        |scored AS (
        |  SELECT s.i, s.j, s.co, p.di, d.dg AS dj,
        |    ROUND(CAST(s.co AS DOUBLE)
        |      / SQRT(CAST(p.di * d.dg AS DOUBLE)), 6) AS cos
        |  FROM sym s JOIN probes p ON s.i = p.i JOIN deg d ON s.j = d.item),
        |rk AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY i
        |    ORDER BY cos DESC, j) AS rn FROM scored)
        |SELECT i AS item, CAST(rn AS BIGINT) AS rank, j AS rec, co, cos
        |FROM rk WHERE rn <= 5 ORDER BY item, rank""".stripMargin,
    "q215_kcore" -> kcoreSql,
    "q208_degree_dist" ->
      """WITH pe AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (SELECT x, COUNT(*) AS dg
        |        FROM (SELECT u AS x FROM pe UNION ALL SELECT v FROM pe)
        |        GROUP BY x),
        |hist AS (SELECT dg, COUNT(*) AS cnt FROM deg GROUP BY dg),
        |pts AS (
        |  SELECT CAST(ROUND(LN(CAST(dg AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lx,
        |         CAST(ROUND(LN(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS ly
        |  FROM hist),
        |a AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(lx) AS DOUBLE) AS sx, CAST(SUM(ly) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(lx * lx) AS DECIMAL(38,6)) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(lx * ly) AS DECIMAL(38,6)) AS DOUBLE) AS sxy
        |  FROM pts),
        |g AS (SELECT COUNT(*) AS n_nodes, MAX(dg) AS max_degree,
        |      CAST(SUM(dg) AS BIGINT) AS degree_mass FROM deg)
        |SELECT n_nodes, max_degree, degree_mass, n AS n_degrees,
        |  ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
        |        / (CAST(n AS DOUBLE) * sxx - sx * sx), 4) AS tail_slope
        |FROM a, g""".stripMargin,
    "q197_connected_components" ->
      """WITH RECURSIVE items AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
        |pe AS (
        |  SELECT a.item AS u, b.item AS v
        |  FROM items a JOIN items b ON a.o = b.o AND a.item < b.item
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |e AS (SELECT u, v FROM pe UNION ALL SELECT v, u FROM pe),
        |reach(node, r) AS (
        |  SELECT u AS node, u AS r FROM e
        |  UNION
        |  SELECT e.u AS node, reach.r FROM e JOIN reach ON reach.node = e.v),
        |comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
        |SELECT component, CAST(COUNT(*) AS BIGINT) AS n_nodes
        |FROM comp GROUP BY component
        |ORDER BY n_nodes DESC, component""".stripMargin,
    "q176_bfs_hops" ->
      """WITH e0 AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |seeds AS (SELECT u AS node FROM e0 GROUP BY u ORDER BY u LIMIT 3),
        |h0 AS (SELECT node, 0 AS hops FROM seeds),
        |n1 AS (SELECT DISTINCT e0.v AS node FROM h0 JOIN e0 ON e0.u = h0.node),
        |h1 AS (SELECT node, 1 AS hops FROM n1
        |       WHERE node NOT IN (SELECT node FROM h0)),
        |a1 AS (SELECT * FROM h0 UNION ALL SELECT * FROM h1),
        |n2 AS (SELECT DISTINCT e0.v AS node FROM h1 JOIN e0 ON e0.u = h1.node),
        |h2 AS (SELECT node, 2 AS hops FROM n2
        |       WHERE node NOT IN (SELECT node FROM a1)),
        |a2 AS (SELECT * FROM a1 UNION ALL SELECT * FROM h2),
        |n3 AS (SELECT DISTINCT e0.v AS node FROM h2 JOIN e0 ON e0.u = h2.node),
        |h3 AS (SELECT node, 3 AS hops FROM n3
        |       WHERE node NOT IN (SELECT node FROM a2)),
        |a3 AS (SELECT * FROM a2 UNION ALL SELECT * FROM h3)
        |SELECT node, CAST(hops AS BIGINT) AS hops FROM a3 ORDER BY hops, node""".stripMargin,
    "q165_triangles" ->
      """WITH pe AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (SELECT x, COUNT(*) AS dg
        |        FROM (SELECT u AS x FROM pe UNION ALL SELECT v FROM pe)
        |        GROUP BY x),
        |o AS (SELECT CASE WHEN (du.dg, u) < (dv.dg, v) THEN u ELSE v END AS s,
        |             CASE WHEN (du.dg, u) < (dv.dg, v) THEN v ELSE u END AS t
        |      FROM pe JOIN deg du ON du.x = u JOIN deg dv ON dv.x = v),
        |tri AS (SELECT p1.s AS a, p1.t AS b, p2.t AS c
        |        FROM o p1 JOIN o p2 ON p1.t = p2.s
        |        JOIN o p3 ON p3.s = p1.s AND p3.t = p2.t)
        |SELECT part, CAST(COUNT(*) AS BIGINT) AS n_tri
        |FROM (SELECT unnest([a, b, c]) AS part FROM tri)
        |GROUP BY part ORDER BY n_tri DESC, part LIMIT 20""".stripMargin,
    "q81_copurchase_rank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS (SELECT src, COUNT(*) AS d FROM pairs GROUP BY src),
        |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
        |r1 AS (
        |  SELECT p.dst AS node, CAST(150000 + (85 * SUM(r.r // d.d)) // 100 AS BIGINT) AS r
        |  FROM pairs p JOIN r0 r ON p.src = r.node JOIN deg d ON p.src = d.src
        |  GROUP BY p.dst),
        |r2 AS (
        |  SELECT p.dst AS node, CAST(150000 + (85 * SUM(r.r // d.d)) // 100 AS BIGINT) AS r
        |  FROM pairs p JOIN r1 r ON p.src = r.node JOIN deg d ON p.src = d.src
        |  GROUP BY p.dst),
        |r3 AS (
        |  SELECT p.dst AS node, CAST(150000 + (85 * SUM(r.r // d.d)) // 100 AS BIGINT) AS r
        |  FROM pairs p JOIN r2 r ON p.src = r.node JOIN deg d ON p.src = d.src
        |  GROUP BY p.dst)
        |SELECT node, r FROM r3 ORDER BY r DESC, node LIMIT 25""".stripMargin)
}
