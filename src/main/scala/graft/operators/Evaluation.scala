package graft.operators

import graft.Tables
import graft.Dsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation analytics — the metrics a reward-model / classifier /
  * retrieval pipeline computes over scored examples at corpus scale:
  * reliability (calibration) bins, exact tie-corrected ROC AUC, and the
  * precision/recall curve. The "model score" is the event `value` column
  * scaled to [0,1] and the "label" is `event_type = 'purchase'` — the
  * fixture is synthetic but every formula is the production one, in exact
  * decimal/integer arithmetic with one shared IEEE tree for the final
  * ratios (the Stats.scala discipline).
  */
object Evaluation {
  type Q = (SparkSession, String) => DataFrame

  private def scored(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      dec(col("value")).as("v"),
      (col("event_type") === "purchase").cast("int").as("y"))

  /** Q189: reliability diagram — 10 fixed score bins, per-bin mean
    * normalized score vs empirical positive rate, and the per-bin
    * calibration gap. One map-side-combined aggregate over the scan; the
    * normalizing constant (330 = the declared score ceiling) is part of
    * the operator contract, not data-derived, so bins are stable across
    * ingest batches.
    */
  def q189CalibrationBins: Q = (s, d) => {
    val b = scored(s, d)
      .withColumn("bin", least(lit(9L), expr("CAST(v * 100 AS BIGINT) div 3300")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).cast("long").as("n_pos"),
        sum(col("v")).cast("double").as("sv"))
    b.select(col("bin"), col("n"), col("n_pos"),
      round(col("sv") / col("n") / 330.0, 6).as("mean_s"),
      round(col("n_pos").cast("double") / col("n").cast("double"), 6).as("frac_pos"),
      round(abs(col("sv") / col("n") / 330.0
        - col("n_pos").cast("double") / col("n").cast("double")), 6).as("gap"))
      .orderBy(col("bin"))
  }

  /** Q190: exact ROC AUC via the Mann–Whitney statistic with tie
    * correction — `AUC = (concordant + ties/2) / (n_pos · n_neg)` — WITHOUT
    * an O(n²) pair join and WITHOUT a global window over the rows: scores
    * collapse to a (score → n_pos, n_neg) SUMMARY first (values carry 2
    * decimals, so the summary is bounded by the score domain, the q138
    * count-of-counts argument), the cumulative negative count runs over
    * that summary, and concordant/tie masses are one aggregate over it.
    * Shuffle ∝ distinct scores, never rows.
    */
  def q190Auc: Q = (s, d) => aucFromSummary(scoreSummary(scored(s, d)))

  /** The mergeable AUC state: `(v → cp, cn)`. Summaries of disjoint row
    * sets MERGE by summing counts per score — the property q192's
    * streaming fold relies on.
    */
  def scoreSummary(rows: DataFrame): DataFrame =
    rows.groupBy(col("v"))
      .agg(sum(col("y")).cast("long").as("cp"),
        sum(lit(1) - col("y")).cast("long").as("cn"))

  /** AUC from a (v, cp, cn) summary — q190's kernel, shared with the
    * streaming fold (q192).
    */
  def aucFromSummary(byScore: DataFrame): DataFrame = {
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val cum = byScore.withColumn("negBelow",
      coalesce(sum(col("cn")).over(w), lit(0L)))
    val agg = cum.agg(
      sum(col("cp")).cast("long").as("n_pos"),
      sum(col("cn")).cast("long").as("n_neg"),
      sum(col("cp") * col("negBelow")).cast("long").as("concordant"),
      sum(col("cp") * col("cn")).cast("long").as("tie_pairs"))
    agg.select(col("n_pos"), col("n_neg"), col("concordant"), col("tie_pairs"),
      round((col("concordant").cast("double")
        + col("tie_pairs").cast("double") / 2.0)
        / (col("n_pos").cast("double") * col("n_neg").cast("double")), 6).as("auc"))
  }

  /** Q191: precision/recall curve at 10 fixed thresholds — ONE pass over
    * the scan computing every threshold's confusion counts as conditional
    * aggregates (map-side combined to a single row), materialized once,
    * then unpivoted to a 10-row curve. No threshold × rows join touches
    * the shuffle.
    */
  def q191PrCurve: Q = (s, d) => {
    val ths = (0 until 10).map(_ * 33L)
    val aggs = ths.flatMap { t =>
      Seq(count(when(col("v") >= t && col("y") === 1, 1)).as(s"tp_$t"),
        count(when(col("v") >= t && col("y") === 0, 1)).as(s"fp_$t"))
    } :+ sum(col("y")).cast("long").as("npos")
    val one = graft.Checkpoints.materialize(
      scored(s, d).agg(aggs.head, aggs.tail: _*))
    ths.map { t =>
      one.select(lit(t).as("threshold"),
        col(s"tp_$t").as("tp"), col(s"fp_$t").as("fp"),
        (col("npos") - col(s"tp_$t")).as("fn"),
        round(col(s"tp_$t").cast("double")
          / (col(s"tp_$t") + col(s"fp_$t")).cast("double"), 6).as("precision"),
        round(col(s"tp_$t").cast("double") / col("npos").cast("double"), 6).as("recall"))
    }.reduce(_.unionAll(_)).orderBy(col("threshold"))
  }

  /** Q223: k-NN classifier evaluation — the embedding-quality check a
    * retrieval pipeline runs before trusting its vectors: classify each of
    * the first 100 vectors by the majority label of its 5 exact nearest
    * neighbors (self excluded) and report the confusion matrix. High
    * off-diagonal mass means the embedding space doesn't separate labels
    * and every downstream ANN result is suspect.
    *
    * Scale shape: probes are a BOUNDED broadcast (100 rows) against one
    * corpus scan; per-probe winners ride the O(k)-state
    * [[graft.functions.TopKByScore]] aggregator (q69's plan — no per-group
    * sort, corpus-size-independent state); voting and the confusion
    * aggregate run on the bounded 100×5 relation. Determinism: scores
    * 6-dp-rounded (q30's cosine-parity shape), neighbor ties by id,
    * vote ties by smallest label.
    */
  def q223KnnEval: Q = (s, d) => {
    import s.implicits._
    graft.functions.VectorFunctions.register(s)
    val emb = Tables(s, d, "embeddings")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("ev"),
        big(col("label")).as("label"))
    val labels = emb.select(col("vec_id").as("id"), col("label"))
    val probes = emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("pid"), col("ev").as("pv"), col("label").as("true_label"))
    val top = emb.crossJoin(broadcast(probes.select(col("pid"), col("pv"))))
      .filter(col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id").as("id"),
        round(graft.functions.VectorFunctions.cosineSim(col("ev"), col("pv")), 6).as("score"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => graft.functions.ScoredId(r._2, r._3))
      .agg(new graft.functions.TopKByScore(5).toColumn)
      .toDF("pid", "neighbors")
    val votes = top.select(col("pid"), explode(col("neighbors")).as("nb"))
      .select(col("pid"), col("nb.id").as("id"))
      .join(broadcast(labels), Seq("id"))
      .groupBy(col("pid"), col("label")).agg(count(lit(1)).as("cnt"))
    val wVote = Window.partitionBy(col("pid"))
      .orderBy(col("cnt").desc, col("label"))
    votes.withColumn("rn", row_number().over(wVote))
      .filter(col("rn") === 1)
      .select(col("pid"), col("label").as("pred_label"))
      .join(broadcast(probes.select(col("pid"), col("true_label"))), Seq("pid"))
      .groupBy(col("true_label"), col("pred_label"))
      .agg(big(count(lit(1))).as("n"))
      .orderBy(col("true_label"), col("pred_label"))
  }

  /** Q235: cumulative gains / lift curve — the campaign-targeting view of
    * q190's ranking quality: if you contact the top d/10 of the
    * score-ranked population, what share of all positives do you reach,
    * and at what lift over random? Computed ENTIRELY on the bounded
    * (score → counts) summary (q190's collapse — the 2-decimal score
    * domain bounds it): decile boundary ranks are integer arithmetic,
    * and a boundary falling INSIDE a score group splits it under the
    * DECLARED positives-first tie rule — `cum_pos(r) = cp_before +
    * least(pos_in_group, r − rank_before)` — expressible identically in
    * both engines, so the curve never depends on arbitrary row order
    * among equal scores (the thing a row-level ntile silently does).
    */
  def q235GainsCurve: Q = (s, d) => {
    val g = scored(s, d).groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).cast("long").as("pos"))
    val w = Window.orderBy(col("v").desc)
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val summary = g
      .withColumn("cs", coalesce(sum(col("cnt")).over(wPrev), lit(0L)))
      .withColumn("cp", coalesce(sum(col("pos")).over(wPrev), lit(0L)))
    val tot = g.agg(sum(col("cnt")).as("n"), sum(col("pos")).as("np"))
    val deciles = tot.select(explode(sequence(lit(1L), lit(10L))).as("decile"),
      col("n"), col("np"))
      .withColumn("r", expr("(decile * n) div 10"))
    deciles.join(summary,
      col("cs") < col("r") && col("r") <= col("cs") + col("cnt"))
      .select(col("decile"), col("r").as("rank"),
        (col("cp") + least(col("pos"), col("r") - col("cs"))).as("cum_pos"),
        round((col("cp") + least(col("pos"), col("r") - col("cs"))).cast("double")
          / col("np").cast("double"), 6).as("gain"),
        round((col("cp") + least(col("pos"), col("r") - col("cs"))).cast("double")
          * col("n").cast("double")
          / (col("r").cast("double") * col("np").cast("double")), 6).as("lift"))
      .orderBy(col("decile"))
  }

  /** Q257: per-class precision / recall / F1 + macro averages from q223's
    * kNN confusion matrix — the summary a multi-class eval actually
    * reports (macro-F1 weights every class equally, so minority-class
    * collapse is visible where q223's raw matrix and micro-accuracy hide
    * it). Classes = union of true and predicted labels; a never-predicted
    * class scores precision 0, an absent-from-truth class recall 0. The
    * final `label = -1` row carries the micro totals and the macro means.
    *
    * Determinism: precision/recall are 6-dp-rounded BEFORE F1 (declared
    * semantics — one shared IEEE tree on identical rounded inputs), F1 and
    * the macro means are 6-dp-rounded exact-decimal sums over the bounded
    * class relation.
    *
    * Scale shape: everything after q223's bounded kNN runs on the ≤
    * |classes|²-row confusion relation — driver-scale arithmetic expressed
    * as keyed joins, no new corpus pass.
    */
  def q257MacroF1: Q = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val cm = q223KnnEval(s, d)
    val cls = cm.select(col("true_label").as("label"))
      .union(cm.select(col("pred_label"))).distinct()
    val tp = cm.filter(col("true_label") === col("pred_label"))
      .select(col("true_label").as("label"), col("n").as("tp"))
    val act = cm.groupBy(col("true_label"))
      .agg(sum(col("n")).as("support"))
      .select(col("true_label").as("label"), col("support"))
    val prd = cm.groupBy(col("pred_label"))
      .agg(sum(col("n")).as("predicted"))
      .select(col("pred_label").as("label"), col("predicted"))
    val m = cls.join(tp, Seq("label"), "left")
      .join(act, Seq("label"), "left")
      .join(prd, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("predicted"), lit(0L)).as("predicted"))
    val pr = m.select(col("label"), col("tp"), col("support"), col("predicted"),
      round(when(col("predicted") === 0L, lit(0.0))
        .otherwise(col("tp").cast("double") / col("predicted").cast("double")), 6)
        .cast(dec6).as("p6"),
      round(when(col("support") === 0L, lit(0.0))
        .otherwise(col("tp").cast("double") / col("support").cast("double")), 6)
        .cast(dec6).as("r6"))
    val f = pr.withColumn("f16",
      round(when(col("p6").cast("double") + col("r6").cast("double") === 0.0,
        lit(0.0))
        .otherwise(lit(2.0) * col("p6").cast("double") * col("r6").cast("double")
          / (col("p6").cast("double") + col("r6").cast("double"))), 6)
        .cast(dec6))
    val perClass = f.select(big(col("label")).as("label"), big(col("tp")).as("tp"),
      big(col("support")).as("support"), big(col("predicted")).as("predicted"),
      col("p6").cast("double").as("prec"), col("r6").cast("double").as("rec"),
      col("f16").cast("double").as("f1"))
    val macroRow = f.agg(
      big(sum(col("tp"))).as("tp"),
      big(sum(col("support"))).as("support"),
      big(sum(col("predicted"))).as("predicted"),
      round(sum(col("p6")).cast("double") / count(lit(1)).cast("double"), 6)
        .as("prec"),
      round(sum(col("r6")).cast("double") / count(lit(1)).cast("double"), 6)
        .as("rec"),
      round(sum(col("f16")).cast("double") / count(lit(1)).cast("double"), 6)
        .as("f1"))
      .select(lit(-1L).as("label"), col("tp"), col("support"), col("predicted"),
        col("prec"), col("rec"), col("f1"))
    perClass.unionByName(macroRow).orderBy(col("label"))
  }

  /** The two deterministic document "raters" behind q315/q320 — declared
    * fixture rules (a length rule and a whitespace-token rule), standing in
    * for two annotation pipelines whose agreement a labeling team audits.
    * Both are pure per-row integer predicates, identical in both engines.
    */
  def raterLabels(docs: DataFrame): DataFrame = {
    val spaces = length(col("text")) - length(regexp_replace(col("text"), " ", ""))
    docs.select(col("source"),
      when(col("n_chars") >= 400, "long")
        .when(col("n_chars") >= 200, "mid").otherwise("short").as("la"),
      when(spaces >= 72, "long")
        .when(spaces >= 36, "mid").otherwise("short").as("lb"))
  }

  /** Cohen's kappa from a (source, la, lb, n) confusion relation — the
    * mergeable state q320's streaming fold relies on (counts of disjoint
    * row sets merge by per-cell sum). ALL-INTEGER identity:
    * `kappa = (agree·n − pe_num) / (n² − pe_num)` where
    * `pe_num = Σ_label rowsum·colsum`, so the only floating op is the final
    * division of two exact BIGINTs — no per-rater probability rounding.
    */
  def kappaFromConfusion(conf: DataFrame): DataFrame = {
    val tot = conf.groupBy(col("source")).agg(
      sum(col("n")).cast("long").as("n"),
      sum(when(col("la") === col("lb"), col("n")).otherwise(lit(0L)))
        .cast("long").as("agree"))
    val ra = conf.groupBy(col("source"), col("la").as("lbl"))
      .agg(sum(col("n")).as("ra"))
    val cb = conf.groupBy(col("source"), col("lb").as("lbl"))
      .agg(sum(col("n")).as("cb"))
    val pe = ra.join(cb, Seq("source", "lbl"))
      .groupBy(col("source"))
      .agg(sum(col("ra") * col("cb")).cast("long").as("pe_num"))
    tot.join(pe, Seq("source"))
      .select(col("source"), big(col("n")).as("n"), big(col("agree")).as("n_agree"),
        big(col("pe_num")).as("pe_num"),
        round(when(col("n") * col("n") === col("pe_num"), lit(0.0))
          .otherwise((col("agree") * col("n") - col("pe_num")).cast("double")
            / (col("n") * col("n") - col("pe_num")).cast("double")), 6)
          .as("kappa"))
      .orderBy(col("source"))
  }

  /** Q315: Cohen's kappa — chance-corrected inter-rater agreement between
    * two deterministic annotation rules, per source feed. The audit every
    * multi-pipeline labeling effort owes itself: raw agreement flatters
    * whenever one class dominates; kappa subtracts the agreement the
    * marginals produce by chance.
    *
    * Scale shape: one map-side-combined 3×3-per-source confusion aggregate
    * over the scan, then ≤9-row-per-source marginal joins — shuffle ∝
    * sources × 9, never rows. The confusion state is additively mergeable
    * (q320 folds it over micro-batches and shares this oracle).
    */
  def q315CohensKappa: Q = (s, d) =>
    kappaFromConfusion(
      raterLabels(Tables(s, d, "documents"))
        .groupBy(col("source"), col("la"), col("lb"))
        .agg(count(lit(1)).as("n")))

  /** Q316: McNemar's paired test — do two classifiers (marker-word
    * heuristics predicting `lang = 'en'`) differ, judged ONLY on the
    * discordant pairs, per true language. The paired-eval discipline:
    * accuracy deltas on shared data are correlated, so the test statistic
    * is `(max(|b−c|−1, 0))² / (b+c)` (continuity-corrected) over the
    * disagreement counts alone. All-integer counts; the statistic is one
    * division of exact BIGINTs.
    */
  def q316Mcnemar: Q = (s, d) => {
    val p = Tables(s, d, "documents").select(
      col("lang"),
      (col("lang") === "en").as("truth"),
      col("text").contains(" the ").as("pa"),
      col("text").contains(" a ").as("pb"))
    val c = p.groupBy(col("lang")).agg(
      count(lit(1)).as("n"),
      sum(when(col("pa") === col("truth"), 1L).otherwise(0L)).as("a_correct"),
      sum(when(col("pb") === col("truth"), 1L).otherwise(0L)).as("b_correct"),
      sum(when(col("pa") === col("truth") && col("pb") =!= col("truth"), 1L)
        .otherwise(0L)).as("b_disc"),
      sum(when(col("pa") =!= col("truth") && col("pb") === col("truth"), 1L)
        .otherwise(0L)).as("c_disc"))
    val adj = greatest(abs(col("b_disc") - col("c_disc")) - 1, lit(0L))
    c.select(col("lang"), big(col("n")).as("n"),
      big(col("a_correct")).as("a_correct"), big(col("b_correct")).as("b_correct"),
      big(col("b_disc")).as("b_disc"), big(col("c_disc")).as("c_disc"),
      round(when(col("b_disc") + col("c_disc") === 0L, lit(0.0))
        .otherwise((adj * adj).cast("double")
          / (col("b_disc") + col("c_disc")).cast("double")), 6).as("chi2"))
      .orderBy(col("lang"))
  }

  /** Q317: Brier score with the Murphy decomposition — reliability −
    * resolution + uncertainty over the q189 bin grid, plus the within-bin
    * variance gap (brier − rel + res − unc ≥ 0) that the binned
    * decomposition leaves behind. The one-number calibration story:
    * REL says "how far each bin's mean forecast sits from its hit rate",
    * RES says "how much the bins separate the base rate", UNC is the
    * irreducible ȳ(1−ȳ).
    *
    * Determinism: the row-level Brier sum is an EXACT decimal sum of
    * (v − 330y)² terms (err bounded by 330 → (12,4); squares (25,8); the
    * (38,4)→double reduction is the Dsl.sumExactDouble discipline, and the
    * scale-8→4 cut is EXACT — scores carry 2 true decimals so err² has ≤4,
    * the q220 argument — so the HALF_UP-vs-half-even engine divergence on
    * true midpoints can never trigger); the
    * 10 per-bin decomposition contributions are 6-dp-rounded decimals
    * summed exactly before the single final division — no
    * partition-order-dependent float accumulation anywhere.
    */
  def q317BrierDecomposition: Q = (s, d) => {
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val rows = scored(s, d)
    val err = (col("v") - lit(330) * col("y"))
      .cast(org.apache.spark.sql.types.DecimalType(12, 4))
    val brierAgg = rows.agg(
      count(lit(1)).as("n"),
      sum(col("y")).cast("long").as("pos"),
      sum(err * err).cast(org.apache.spark.sql.types.DecimalType(38, 4))
        .cast("double").as("sq"))
    val bins = rows
      .withColumn("bin", least(lit(9L), expr("CAST(v * 100 AS BIGINT) div 3300")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("nk"),
        sum(col("y")).cast("long").as("pk"),
        sum(col("v")).cast("double").as("sv"))
    val g = brierAgg.select(col("n"), col("pos"), col("sq"),
      (col("pos").cast("double") / col("n").cast("double")).as("ybar"))
    val contrib = bins.crossJoin(broadcast(g))
      .select(
        round(col("nk").cast("double")
          * (col("sv") / col("nk") / 330.0 - col("pk").cast("double") / col("nk").cast("double"))
          * (col("sv") / col("nk") / 330.0 - col("pk").cast("double") / col("nk").cast("double")), 6)
          .cast(dec6).as("relc"),
        round(col("nk").cast("double")
          * (col("pk").cast("double") / col("nk").cast("double") - col("ybar"))
          * (col("pk").cast("double") / col("nk").cast("double") - col("ybar")), 6)
          .cast(dec6).as("resc"))
      .agg(sum(col("relc")).cast("double").as("rels"),
        sum(col("resc")).cast("double").as("ress"))
    g.crossJoin(broadcast(contrib))
      .select(big(col("n")).as("n"), big(col("pos")).as("n_pos"),
        round(col("ybar"), 6).as("ybar"),
        round(col("sq") / (col("n").cast("double") * 108900.0), 6).as("brier"),
        round(col("rels") / col("n").cast("double"), 6).as("reliability"),
        round(col("ress") / col("n").cast("double"), 6).as("resolution"),
        round(col("ybar") * (lit(1.0) - col("ybar")), 6).as("uncertainty"),
        round(col("sq") / (col("n").cast("double") * 108900.0)
          - col("rels") / col("n").cast("double")
          + col("ress") / col("n").cast("double")
          - col("ybar") * (lit(1.0) - col("ybar")), 6).as("within_gap"))
  }

  /** Q335: quadratic-weighted kappa — q315's agreement audit made
    * ORDINAL-aware: the rater labels are ordered (short < mid < long), so
    * a short↔long disagreement should cost 4× a short↔mid one. Weights
    * w_ij = (i−j)² keep the whole statistic INTEGER:
    * κ_w = 1 − n·Σw·O / Σ_ij w_ij·r_i·c_j — one division of exact
    * BIGINTs, like q315. The eval-metric standard for ordinal labeling
    * (severity grades, quality tiers).
    *
    * Scale shape: the q315 confusion aggregate; the expectation term is a
    * ≤9-cell-per-source marginal join.
    */
  def q335WeightedKappa: Q = (s, d) => {
    val ordv: org.apache.spark.sql.Column => org.apache.spark.sql.Column = c =>
      when(c === "short", 0L).when(c === "mid", 1L).otherwise(2L)
    val conf = raterLabels(Tables(s, d, "documents"))
      .groupBy(col("source"), col("la"), col("lb"))
      .agg(count(lit(1)).as("n"))
      .select(col("source"), ordv(col("la")).as("i"), ordv(col("lb")).as("j"),
        col("n"))
    val tot = conf.groupBy(col("source")).agg(
      sum(col("n")).cast("long").as("nn"),
      sum((col("i") - col("j")) * (col("i") - col("j")) * col("n"))
        .cast("long").as("wo"))
    val ra = conf.groupBy(col("source"), col("i"))
      .agg(sum(col("n")).as("ri"))
    val cb = conf.groupBy(col("source"), col("j"))
      .agg(sum(col("n")).as("cj"))
    val we = ra.join(cb, Seq("source"))
      .groupBy(col("source"))
      .agg(sum((col("i") - col("j")) * (col("i") - col("j"))
        * col("ri") * col("cj")).cast("long").as("we_num"))
    tot.join(we, Seq("source"))
      .select(col("source"), big(col("nn")).as("n"), big(col("wo")).as("wo"),
        big(col("we_num")).as("we_num"),
        round(when(col("we_num") === 0L, lit(0.0))
          .otherwise(lit(1.0) - (col("nn") * col("wo")).cast("double")
            / col("we_num").cast("double")), 6).as("kappa_w"))
      .orderBy(col("source"))
  }

  /** Q336: feature→target AUC scan — the leakage detector: every declared
    * candidate feature scored against the purchase label with the exact
    * tie-corrected Mann–Whitney AUC (the q190 kernel, one bounded
    * (value → counts) summary per feature). A feature whose single-column
    * AUC is implausibly high is leaking the target; one near 0.5 carries
    * no signal — the triage every feature-store addition should pass
    * before training sees it (q147's split-leakage check, applied to
    * COLUMNS instead of rows).
    *
    * Scale shape: per feature, one map-side-combined summary collapse
    * (bounded by the feature's value domain) + the q190 cumsum over that
    * summary; four features union into a 4-row report.
    */
  def q336FeatureAucScan: Q = (s, d) => {
    val base = Tables.events(s, d).select(
      epochSec(col("ts2")).as("t"), col("user_id"),
      dec(col("value")).as("vv"),
      (col("event_type") === "purchase").cast("int").as("y"))
    val feats: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      ("day_of_week", expr("t div 86400 % 7")),
      ("hour_of_day", expr("t div 3600 % 24")),
      ("user_bucket", pmod(col("user_id"), lit(16L))),
      ("value", col("vv")))
    feats.map { case (name, c) =>
      aucFromSummary(scoreSummary(base.select(c.as("v"), col("y"))))
        .select(lit(name).as("feature"), col("n_pos"), col("n_neg"),
          col("concordant"), col("tie_pairs"), col("auc"))
    }.reduce(_.unionByName(_))
      .orderBy(col("feature"))
  }

  /** Q440: DeLong standard error and Wald CI for q190's AUC — the
    * uncertainty q190's point estimate lacks. The DeLong structural
    * components collapse onto the bounded score summary: every positive
    * at score v shares V10 = (negBelow + cn/2)/n_neg and every negative
    * shares V01 = (posAbove + cp/2)/n_pos, so the component variances are
    * cp/cn-weighted moments over the score grid (12-dp-rounded decimal
    * sums), never per-row state. SE² = S10/m + S01/n.
    */
  def q440AucDelong: Q = (s, d) => {
    val byScore = scoreSummary(scored(s, d))
    val wUp = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    // posAbove via the GROWING frame (m − cumPos≤v): a literal
    // (1, unboundedFollowing) frame is the O(n²)-per-partition shrinking
    // frame the q174/q94 rewrite exists for — 4.5 s vs 0.5 s at sf0.1
    val wUpIncl = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byScore.agg(sum(col("cp")).cast("long").as("m"),
      sum(col("cn")).cast("long").as("nn"))
    val dec12 = org.apache.spark.sql.types.DecimalType(30, 12)
    val j = byScore.crossJoin(broadcast(tot))
      .withColumn("negBelow", coalesce(sum(col("cn")).over(wUp), lit(0L)))
      .withColumn("posAbove", col("m") - sum(col("cp")).over(wUpIncl))
    val v10 = (col("negBelow").cast("double")
      + col("cn").cast("double") / lit(2.0)) / col("nn").cast("double")
    val v01 = (col("posAbove").cast("double")
      + col("cp").cast("double") / lit(2.0)) / col("m").cast("double")
    val mom = j.agg(max(col("m")).as("m"), max(col("nn")).as("nn"),
      sum(round(col("cp").cast("double") * v10, 12).cast(dec12))
        .cast("double").as("s10"),
      sum(round(col("cp").cast("double") * v10 * v10, 12).cast(dec12))
        .cast("double").as("s10q"),
      sum(round(col("cn").cast("double") * v01, 12).cast(dec12))
        .cast("double").as("s01"),
      sum(round(col("cn").cast("double") * v01 * v01, 12).cast(dec12))
        .cast("double").as("s01q"))
    val mD = col("m").cast("double")
    val nD = col("nn").cast("double")
    val auc = col("s10") / mD
    val var10 = (col("s10q") - col("s10") * col("s10") / mD) / (mD - lit(1.0))
    val var01 = (col("s01q") - col("s01") * col("s01") / nD) / (nD - lit(1.0))
    val se = sqrt(var10 / mD + var01 / nD)
    mom.select(col("m").as("n_pos"), col("nn").as("n_neg"),
      round(auc, 6).as("auc"), round(se, 6).as("se_delong"),
      round(auc - lit(1.96) * se, 6).as("ci_lo"),
      round(auc + lit(1.96) * se, 6).as("ci_hi"))
  }

  /** Q446: thresholded-classifier battery at the fixed operating point
    * v ≥ 100 — MCC, F1, balanced accuracy, and Youden's J from the exact
    * integer confusion matrix (the threshold-free q190/q440 ROC view's
    * deployment complement: a live filter runs at ONE threshold). MCC's
    * four-factor denominator is a product of exact doubles under one
    * sqrt; everything else is exact ratios.
    */
  def q446MccBattery: Q = (s, d) => {
    val m = scored(s, d)
      .select(col("y"), (col("v") >= 100).cast("long").as("p"))
      .agg(sum(when(col("p") === 1L && col("y") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("p") === 1L && col("y") === 0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("p") === 0L && col("y") === 1, 1L).otherwise(0L)).as("fn"),
        sum(when(col("p") === 0L && col("y") === 0, 1L).otherwise(0L)).as("tn"))
    def D(c: String): org.apache.spark.sql.Column = col(c).cast("double")
    val mcc = (D("tp") * D("tn") - D("fp") * D("fn")) /
      sqrt((D("tp") + D("fp")) * (D("tp") + D("fn"))
        * (D("tn") + D("fp")) * (D("tn") + D("fn")))
    val tpr = D("tp") / (D("tp") + D("fn"))
    val tnr = D("tn") / (D("tn") + D("fp"))
    m.select(col("tp"), col("fp"), col("fn"), col("tn"),
      round(mcc, 6).as("mcc"),
      round(lit(2.0) * D("tp") / (lit(2.0) * D("tp") + D("fp") + D("fn")), 6)
        .as("f1"),
      round((tpr + tnr) / lit(2.0), 6).as("balanced_acc"),
      round(tpr + tnr - lit(1.0), 6).as("youden_j"))
  }

  /** Q461: Spiegelhalter's z calibration test — does the add-one-smoothed
    * hourly purchase model p̂ₕ = (aₕ+1)/(nₕ+2) systematically mis-state
    * its own probabilities? z = Σ(o−p)(1−2p)/√(Σ(1−2p)²p(1−p)), which
    * collapses per hour bucket to (aₕ−nₕp̂)(1−2p̂) — the sharpness-aware
    * complement to q189's binned ECE view (a model can have small bins
    * yet fail Spiegelhalter). The smoothing is what keeps the in-sample
    * test non-degenerate (an exactly-fitted rate makes every bucket term
    * 0 by construction). One groupBy to 24 rows; 8-dp-rounded terms
    * decimal-summed.
    */
  /** The (hour, nh, ah) bucket relation behind the q461/q475 calibration
    * pair — one groupBy over events.
    */
  private def hourlyOutcomes(s: SparkSession, d: String): DataFrame =
    graft.Tables.events(s, d)
      .select(expr("CAST(hour(ts2) AS BIGINT)").as("h"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("nh"), sum(col("y")).as("ah"))

  def q461SpiegelhalterZ: Q = (s, d) => {
    val per = hourlyOutcomes(s, d)
    val p = (col("ah") + 1L).cast("double") / (col("nh") + 2L).cast("double")
    val num = (col("ah").cast("double") - col("nh").cast("double") * p) *
      (lit(1.0) - lit(2.0) * p)
    val den = col("nh").cast("double") * ((lit(1.0) - lit(2.0) * p) *
      (lit(1.0) - lit(2.0) * p)) * p * (lit(1.0) - p)
    val dec8 = org.apache.spark.sql.types.DecimalType(38, 8)
    val red = per.agg(sum(col("nh")).cast("long").as("n"),
      sum(round(num, 8).cast(dec8)).cast("double").as("sn"),
      sum(round(den, 8).cast(dec8)).cast("double").as("sd"))
    val z = col("sn") / sqrt(col("sd"))
    red.select(col("n"), round(z, 4).as("z"),
      (abs(round(z, 4)) <= lit(1.96)).as("calibrated"))
  }

  /** Q475: calibration-in-the-large + calibration slope — the weak-OLS
    * recalibration summary read alongside q461's z: regress the binary
    * outcome on q461's smoothed hourly prediction p̂ₕ; slope ≈ 1 and
    * intercept ≈ 0 mean the model needs no recalibration, slope < 1
    * means over-confident spread. With p̂ constant per bucket the OLS
    * moments collapse to per-bucket sums (Σnp, Σnp², Σa·p̂) — one
    * groupBy + a 24-row reduction of 8-dp-rounded decimal terms.
    */
  def q475CalibrationSlope: Q = (s, d) => {
    val per = hourlyOutcomes(s, d)
    val p = (col("ah") + 1L).cast("double") / (col("nh") + 2L).cast("double")
    val dec8 = org.apache.spark.sql.types.DecimalType(38, 8)
    val red = per.agg(sum(col("nh")).cast("long").as("n"),
      sum(col("ah")).cast("long").as("so"),
      sum(round(col("nh").cast("double") * p, 8).cast(dec8))
        .cast("double").as("sp"),
      sum(round(col("nh").cast("double") * p * p, 8).cast(dec8))
        .cast("double").as("spp"),
      sum(round(col("ah").cast("double") * p, 8).cast(dec8))
        .cast("double").as("spo"))
    val nD = col("n").cast("double")
    val soD = col("so").cast("double")
    val slope = (nD * col("spo") - col("sp") * soD) /
      (nD * col("spp") - col("sp") * col("sp"))
    red.select(col("n"),
      round(slope, 6).as("cal_slope"),
      round((soD - slope * col("sp")) / nD, 6).as("cal_intercept"),
      round(soD / nD - col("sp") / nD, 6).as("cal_in_the_large"))
  }

  val queries: Map[String, Q] = Map(
    "q475_calibration_slope" -> q475CalibrationSlope,
    "q461_spiegelhalter_z" -> q461SpiegelhalterZ,
    "q446_mcc_battery" -> q446MccBattery,
    "q440_auc_delong" -> q440AucDelong,
    "q336_feature_auc_scan" -> q336FeatureAucScan,
    "q335_weighted_kappa" -> q335WeightedKappa,
    "q257_macro_f1" -> q257MacroF1,
    "q235_gains_curve" -> q235GainsCurve,
    "q223_knn_eval" -> q223KnnEval,
    "q189_calibration_bins" -> q189CalibrationBins,
    "q190_auc" -> q190Auc,
    "q191_pr_curve" -> q191PrCurve,
    "q315_cohens_kappa" -> q315CohensKappa,
    "q316_mcnemar" -> q316Mcnemar,
    "q317_brier_decomposition" -> q317BrierDecomposition)

  /** The q257 oracle: q223's kNN confusion chain verbatim, then the
    * per-class P/R/F1 arithmetic (6-dp rounds BEFORE F1, decimal sums for
    * the macro means — the identical shape the Spark side computes).
    */
  private val macroF1Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev,
      |             CAST(label AS BIGINT) AS label FROM embeddings),
      |p AS (SELECT vec_id AS pid, ev AS pv, label AS true_label
      |      FROM e WHERE vec_id < 100),
      |sc AS (
      |  SELECT p.pid, e.vec_id AS id, e.label,
      |    ROUND(list_dot_product(ev, pv)
      |      / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(pv, pv))), 6) AS score
      |  FROM e, p WHERE e.vec_id <> p.pid),
      |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY pid
      |         ORDER BY score DESC, id) AS rn FROM sc),
      |votes AS (SELECT pid, label, COUNT(*) AS cnt FROM rk
      |          WHERE rn <= 5 GROUP BY 1, 2),
      |pred AS (SELECT pid, label AS pred_label,
      |           ROW_NUMBER() OVER (PARTITION BY pid
      |             ORDER BY cnt DESC, label) AS vr FROM votes),
      |cm AS (SELECT p.true_label, pred.pred_label, CAST(COUNT(*) AS BIGINT) AS n
      |       FROM pred JOIN p ON pred.pid = p.pid WHERE vr = 1 GROUP BY 1, 2),
      |cls AS (SELECT DISTINCT label FROM (
      |  SELECT true_label AS label FROM cm UNION ALL SELECT pred_label FROM cm)),
      |tpr AS (SELECT true_label AS label, n AS tp FROM cm
      |        WHERE true_label = pred_label),
      |act AS (SELECT true_label AS label, CAST(SUM(n) AS BIGINT) AS support
      |        FROM cm GROUP BY 1),
      |prd AS (SELECT pred_label AS label, CAST(SUM(n) AS BIGINT) AS predicted
      |        FROM cm GROUP BY 1),
      |m AS (SELECT c.label, COALESCE(tp, 0) AS tp,
      |        COALESCE(support, 0) AS support,
      |        COALESCE(predicted, 0) AS predicted
      |      FROM cls c LEFT JOIN tpr ON c.label = tpr.label
      |        LEFT JOIN act ON c.label = act.label
      |        LEFT JOIN prd ON c.label = prd.label),
      |pr AS (SELECT label, tp, support, predicted,
      |  CAST(ROUND(CASE WHEN predicted = 0 THEN CAST(0 AS DOUBLE)
      |    ELSE CAST(tp AS DOUBLE) / CAST(predicted AS DOUBLE) END, 6)
      |    AS DECIMAL(18,6)) AS p6,
      |  CAST(ROUND(CASE WHEN support = 0 THEN CAST(0 AS DOUBLE)
      |    ELSE CAST(tp AS DOUBLE) / CAST(support AS DOUBLE) END, 6)
      |    AS DECIMAL(18,6)) AS r6
      |  FROM m),
      |f AS (SELECT *, CAST(ROUND(CASE
      |    WHEN CAST(p6 AS DOUBLE) + CAST(r6 AS DOUBLE) = CAST(0 AS DOUBLE)
      |      THEN CAST(0 AS DOUBLE)
      |    ELSE CAST(2 AS DOUBLE) * CAST(p6 AS DOUBLE) * CAST(r6 AS DOUBLE)
      |      / (CAST(p6 AS DOUBLE) + CAST(r6 AS DOUBLE)) END, 6)
      |    AS DECIMAL(18,6)) AS f16
      |  FROM pr),
      |percls AS (SELECT CAST(label AS BIGINT) AS label, CAST(tp AS BIGINT) AS tp,
      |  support, predicted, CAST(p6 AS DOUBLE) AS prec, CAST(r6 AS DOUBLE) AS rec,
      |  CAST(f16 AS DOUBLE) AS f1 FROM f),
      |mac AS (SELECT CAST(-1 AS BIGINT) AS label, CAST(SUM(tp) AS BIGINT) AS tp,
      |  CAST(SUM(support) AS BIGINT) AS support,
      |  CAST(SUM(predicted) AS BIGINT) AS predicted,
      |  ROUND(CAST(SUM(p6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS prec,
      |  ROUND(CAST(SUM(r6) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS rec,
      |  ROUND(CAST(SUM(f16) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS f1
      |  FROM f)
      |SELECT * FROM (SELECT * FROM percls UNION ALL SELECT * FROM mac)
      |ORDER BY label""".stripMargin

  /** q336's oracle: the q190 AUC chain generated once per declared
    * feature expression, UNION ALL'd.
    */
  private val featureAucSql: String = {
    val feats = Seq(
      ("day_of_week",
        "CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 % 7"),
      ("hour_of_day",
        "CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 3600 % 24"),
      ("user_bucket", "user_id % 16"),
      ("value", "CAST(value AS DECIMAL(18,4))"))
    val blocks = feats.map { case (name, vexpr) =>
      s"""SELECT '$name' AS feature, n_pos, n_neg, concordant, tie_pairs, auc
         |FROM (
         |  WITH e AS (
         |    SELECT $vexpr AS v,
         |      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |    FROM events),
         |  s AS (
         |    SELECT v, CAST(SUM(y) AS BIGINT) AS cp,
         |      CAST(SUM(1 - y) AS BIGINT) AS cn
         |    FROM e GROUP BY v),
         |  c AS (
         |    SELECT cp, cn,
         |      COALESCE(SUM(cn) OVER (ORDER BY v
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS negBelow
         |    FROM s)
         |  SELECT CAST(SUM(cp) AS BIGINT) AS n_pos, CAST(SUM(cn) AS BIGINT) AS n_neg,
         |    CAST(SUM(cp * negBelow) AS BIGINT) AS concordant,
         |    CAST(SUM(cp * cn) AS BIGINT) AS tie_pairs,
         |    ROUND((CAST(SUM(cp * negBelow) AS DOUBLE) + CAST(SUM(cp * cn) AS DOUBLE) / 2.0)
         |          / (CAST(SUM(cp) AS DOUBLE) * CAST(SUM(cn) AS DOUBLE)), 6) AS auc
         |  FROM c)""".stripMargin
    }
    blocks.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY feature")
  }

  val oracles: Map[String, String] = Map(
    "q475_calibration_slope" ->
      """WITH per AS (SELECT
        |    CAST(hour(date_trunc('second', ts)) AS BIGINT) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS nh,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ah
        |  FROM events GROUP BY 1),
        |red AS (SELECT CAST(SUM(nh) AS BIGINT) AS n,
        |    CAST(SUM(ah) AS BIGINT) AS so,
        |    CAST(CAST(SUM(CAST(ROUND(CAST(nh AS DOUBLE)
        |      * (CAST(ah + 1 AS DOUBLE) / CAST(nh + 2 AS DOUBLE)), 8)
        |      AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS DOUBLE) AS sp,
        |    CAST(CAST(SUM(CAST(ROUND(CAST(nh AS DOUBLE)
        |      * (CAST(ah + 1 AS DOUBLE) / CAST(nh + 2 AS DOUBLE))
        |      * (CAST(ah + 1 AS DOUBLE) / CAST(nh + 2 AS DOUBLE)), 8)
        |      AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS DOUBLE) AS spp,
        |    CAST(CAST(SUM(CAST(ROUND(CAST(ah AS DOUBLE)
        |      * (CAST(ah + 1 AS DOUBLE) / CAST(nh + 2 AS DOUBLE)), 8)
        |      AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS DOUBLE) AS spo
        |  FROM per)
        |SELECT n,
        |  ROUND((CAST(n AS DOUBLE) * spo - sp * CAST(so AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * spp - sp * sp), 6) AS cal_slope,
        |  ROUND((CAST(so AS DOUBLE)
        |    - (CAST(n AS DOUBLE) * spo - sp * CAST(so AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * spp - sp * sp) * sp)
        |    / CAST(n AS DOUBLE), 6) AS cal_intercept,
        |  ROUND(CAST(so AS DOUBLE) / CAST(n AS DOUBLE)
        |    - sp / CAST(n AS DOUBLE), 6) AS cal_in_the_large
        |FROM red""".stripMargin,
    "q461_spiegelhalter_z" ->
      """WITH per AS (SELECT
        |    CAST(hour(date_trunc('second', ts)) AS BIGINT) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS nh,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ah
        |  FROM events GROUP BY 1),
        |red AS (SELECT CAST(SUM(nh) AS BIGINT) AS n,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      (CAST(ah AS DOUBLE) - CAST(nh AS DOUBLE)
        |        * (CAST(ah + 1 AS DOUBLE) / CAST(nh + 2 AS DOUBLE)))
        |      * (CAST('1.0' AS DOUBLE) - CAST('2.0' AS DOUBLE)
        |        * (CAST(ah + 1 AS DOUBLE) / CAST(nh + 2 AS DOUBLE))), 8)
        |      AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS DOUBLE) AS sn,
        |    CAST(CAST(SUM(CAST(ROUND(
        |      CAST(nh AS DOUBLE)
        |      * ((CAST('1.0' AS DOUBLE) - CAST('2.0' AS DOUBLE)
        |          * (CAST(ah + 1 AS DOUBLE) / CAST(nh + 2 AS DOUBLE)))
        |        * (CAST('1.0' AS DOUBLE) - CAST('2.0' AS DOUBLE)
        |          * (CAST(ah + 1 AS DOUBLE) / CAST(nh + 2 AS DOUBLE))))
        |      * (CAST(ah + 1 AS DOUBLE) / CAST(nh + 2 AS DOUBLE))
        |      * (CAST('1.0' AS DOUBLE)
        |        - CAST(ah + 1 AS DOUBLE) / CAST(nh + 2 AS DOUBLE)), 8)
        |      AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS DOUBLE) AS sd
        |  FROM per)
        |SELECT n, ROUND(sn / SQRT(sd), 4) AS z,
        |  (ABS(ROUND(sn / SQRT(sd), 4)) <= CAST('1.96' AS DOUBLE))
        |    AS calibrated
        |FROM red""".stripMargin,
    "q446_mcc_battery" ->
      """WITH e AS (
        |  SELECT CAST(value AS DECIMAL(18,4)) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |m AS (SELECT
        |    CAST(SUM(CASE WHEN v >= 100 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN v >= 100 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN v < 100 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(SUM(CASE WHEN v < 100 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM e)
        |SELECT tp, fp, fn, tn,
        |  ROUND((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
        |    - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
        |    / SQRT((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
        |      * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
        |      * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
        |      * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))), 6) AS mcc,
        |  ROUND(CAST('2.0' AS DOUBLE) * CAST(tp AS DOUBLE)
        |    / (CAST('2.0' AS DOUBLE) * CAST(tp AS DOUBLE)
        |      + CAST(fp AS DOUBLE) + CAST(fn AS DOUBLE)), 6) AS f1,
        |  ROUND((CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
        |    + CAST(tn AS DOUBLE) / (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE)))
        |    / CAST('2.0' AS DOUBLE), 6) AS balanced_acc,
        |  ROUND(CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
        |    + CAST(tn AS DOUBLE) / (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
        |    - CAST('1.0' AS DOUBLE), 6) AS youden_j
        |FROM m""".stripMargin,
    "q440_auc_delong" ->
      """WITH e AS (
        |  SELECT CAST(value AS DECIMAL(18,4)) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |s AS (
        |  SELECT v, CAST(SUM(y) AS BIGINT) AS cp,
        |    CAST(SUM(1 - y) AS BIGINT) AS cn
        |  FROM e GROUP BY v),
        |c AS (
        |  SELECT cp, cn,
        |    COALESCE(CAST(SUM(cn) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      AS negBelow,
        |    COALESCE(CAST(SUM(cp) OVER (ORDER BY v
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS BIGINT), 0)
        |      AS posAbove
        |  FROM s),
        |tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS m, CAST(SUM(cn) AS BIGINT) AS nn
        |  FROM s),
        |mom AS (SELECT CAST(MAX(m) AS BIGINT) AS m, CAST(MAX(nn) AS BIGINT) AS nn,
        |    CAST(SUM(CAST(ROUND(CAST(cp AS DOUBLE)
        |      * ((CAST(negBelow AS DOUBLE) + CAST(cn AS DOUBLE)
        |          / CAST('2.0' AS DOUBLE)) / CAST(nn AS DOUBLE)), 12)
        |      AS DECIMAL(30,12))) AS DOUBLE) AS s10,
        |    CAST(SUM(CAST(ROUND(CAST(cp AS DOUBLE)
        |      * ((CAST(negBelow AS DOUBLE) + CAST(cn AS DOUBLE)
        |          / CAST('2.0' AS DOUBLE)) / CAST(nn AS DOUBLE))
        |      * ((CAST(negBelow AS DOUBLE) + CAST(cn AS DOUBLE)
        |          / CAST('2.0' AS DOUBLE)) / CAST(nn AS DOUBLE)), 12)
        |      AS DECIMAL(30,12))) AS DOUBLE) AS s10q,
        |    CAST(SUM(CAST(ROUND(CAST(cn AS DOUBLE)
        |      * ((CAST(posAbove AS DOUBLE) + CAST(cp AS DOUBLE)
        |          / CAST('2.0' AS DOUBLE)) / CAST(m AS DOUBLE)), 12)
        |      AS DECIMAL(30,12))) AS DOUBLE) AS s01,
        |    CAST(SUM(CAST(ROUND(CAST(cn AS DOUBLE)
        |      * ((CAST(posAbove AS DOUBLE) + CAST(cp AS DOUBLE)
        |          / CAST('2.0' AS DOUBLE)) / CAST(m AS DOUBLE))
        |      * ((CAST(posAbove AS DOUBLE) + CAST(cp AS DOUBLE)
        |          / CAST('2.0' AS DOUBLE)) / CAST(m AS DOUBLE)), 12)
        |      AS DECIMAL(30,12))) AS DOUBLE) AS s01q
        |  FROM c CROSS JOIN tot),
        |f AS (SELECT m, nn, s10 / CAST(m AS DOUBLE) AS auc,
        |    SQRT(((s10q - s10 * s10 / CAST(m AS DOUBLE))
        |        / (CAST(m AS DOUBLE) - CAST('1.0' AS DOUBLE))) / CAST(m AS DOUBLE)
        |      + ((s01q - s01 * s01 / CAST(nn AS DOUBLE))
        |        / (CAST(nn AS DOUBLE) - CAST('1.0' AS DOUBLE)))
        |        / CAST(nn AS DOUBLE)) AS se
        |  FROM mom)
        |SELECT m AS n_pos, nn AS n_neg, ROUND(auc, 6) AS auc,
        |  ROUND(se, 6) AS se_delong,
        |  ROUND(auc - CAST('1.96' AS DOUBLE) * se, 6) AS ci_lo,
        |  ROUND(auc + CAST('1.96' AS DOUBLE) * se, 6) AS ci_hi
        |FROM f""".stripMargin,
    "q336_feature_auc_scan" -> featureAucSql,
    "q335_weighted_kappa" ->
      """WITH lab AS (
        |  SELECT source,
        |    CASE WHEN n_chars >= 400 THEN 2
        |         WHEN n_chars >= 200 THEN 1 ELSE 0 END AS i,
        |    CASE WHEN length(text) - length(replace(text, ' ', '')) >= 72 THEN 2
        |         WHEN length(text) - length(replace(text, ' ', '')) >= 36 THEN 1
        |         ELSE 0 END AS j
        |  FROM documents),
        |conf AS (SELECT source, i, j, COUNT(*) AS n FROM lab GROUP BY 1, 2, 3),
        |tot AS (SELECT source, SUM(n) AS nn,
        |          SUM((i - j) * (i - j) * n) AS wo
        |        FROM conf GROUP BY 1),
        |ra AS (SELECT source, i, SUM(n) AS ri FROM conf GROUP BY 1, 2),
        |cb AS (SELECT source, j, SUM(n) AS cj FROM conf GROUP BY 1, 2),
        |we AS (SELECT source, SUM((i - j) * (i - j) * ri * cj) AS we_num
        |       FROM ra JOIN cb USING (source) GROUP BY 1)
        |SELECT source, CAST(nn AS BIGINT) AS n, CAST(wo AS BIGINT) AS wo,
        |  CAST(we_num AS BIGINT) AS we_num,
        |  ROUND(CASE WHEN we_num = 0 THEN 0.0
        |    ELSE CAST('1.0' AS DOUBLE)
        |         - CAST(nn * wo AS DOUBLE) / CAST(we_num AS DOUBLE) END, 6)
        |    AS kappa_w
        |FROM tot JOIN we USING (source) ORDER BY source""".stripMargin,
    "q315_cohens_kappa" ->
      """WITH lab AS (
        |  SELECT source,
        |    CASE WHEN n_chars >= 400 THEN 'long'
        |         WHEN n_chars >= 200 THEN 'mid' ELSE 'short' END AS la,
        |    CASE WHEN length(text) - length(replace(text, ' ', '')) >= 72 THEN 'long'
        |         WHEN length(text) - length(replace(text, ' ', '')) >= 36 THEN 'mid'
        |         ELSE 'short' END AS lb
        |  FROM documents),
        |conf AS (SELECT source, la, lb, COUNT(*) AS n FROM lab GROUP BY 1, 2, 3),
        |tot AS (SELECT source, SUM(n) AS n,
        |          SUM(CASE WHEN la = lb THEN n ELSE 0 END) AS agree
        |        FROM conf GROUP BY 1),
        |ra AS (SELECT source, la AS lbl, SUM(n) AS ra FROM conf GROUP BY 1, 2),
        |cb AS (SELECT source, lb AS lbl, SUM(n) AS cb FROM conf GROUP BY 1, 2),
        |pe AS (SELECT source, SUM(ra * cb) AS pe_num
        |       FROM ra JOIN cb USING (source, lbl) GROUP BY 1)
        |SELECT source, CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT) AS n_agree,
        |  CAST(pe_num AS BIGINT) AS pe_num,
        |  ROUND(CASE WHEN n * n = pe_num THEN 0.0
        |    ELSE CAST(agree * n - pe_num AS DOUBLE)
        |         / CAST(n * n - pe_num AS DOUBLE) END, 6) AS kappa
        |FROM tot JOIN pe USING (source) ORDER BY source""".stripMargin,
    "q316_mcnemar" ->
      """WITH p AS (
        |  SELECT lang, (lang = 'en') AS truth,
        |    (text LIKE '% the %') AS pa, (text LIKE '% a %') AS pb
        |  FROM documents),
        |c AS (SELECT lang, COUNT(*) AS n,
        |  SUM(CASE WHEN pa = truth THEN 1 ELSE 0 END) AS a_correct,
        |  SUM(CASE WHEN pb = truth THEN 1 ELSE 0 END) AS b_correct,
        |  SUM(CASE WHEN pa = truth AND pb <> truth THEN 1 ELSE 0 END) AS b_disc,
        |  SUM(CASE WHEN pa <> truth AND pb = truth THEN 1 ELSE 0 END) AS c_disc
        |  FROM p GROUP BY 1)
        |SELECT lang, CAST(n AS BIGINT) AS n,
        |  CAST(a_correct AS BIGINT) AS a_correct,
        |  CAST(b_correct AS BIGINT) AS b_correct,
        |  CAST(b_disc AS BIGINT) AS b_disc, CAST(c_disc AS BIGINT) AS c_disc,
        |  ROUND(CASE WHEN b_disc + c_disc = 0 THEN 0.0
        |    ELSE CAST(GREATEST(ABS(b_disc - c_disc) - 1, 0)
        |              * GREATEST(ABS(b_disc - c_disc) - 1, 0) AS DOUBLE)
        |         / CAST(b_disc + c_disc AS DOUBLE) END, 6) AS chi2
        |FROM c ORDER BY lang""".stripMargin,
    "q317_brier_decomposition" ->
      """WITH e AS (
        |  SELECT CAST(value AS DECIMAL(18,4)) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |er AS (SELECT v, y, CAST(v - 330 * y AS DECIMAL(12,4)) AS err FROM e),
        |g AS (SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos,
        |        CAST(CAST(SUM(err * err) AS DECIMAL(38,4)) AS DOUBLE) AS sq,
        |        CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ybar
        |      FROM er),
        |b AS (SELECT LEAST(9, CAST(v * 100 AS BIGINT) // 3300) AS bin,
        |        COUNT(*) AS nk, CAST(SUM(y) AS BIGINT) AS pk,
        |        CAST(SUM(v) AS DOUBLE) AS sv
        |      FROM e GROUP BY 1),
        |con AS (
        |  SELECT
        |    CAST(ROUND(CAST(nk AS DOUBLE)
        |      * (sv / nk / 330.0 - CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE))
        |      * (sv / nk / 330.0 - CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS relc,
        |    CAST(ROUND(CAST(nk AS DOUBLE)
        |      * (CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE) - ybar)
        |      * (CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE) - ybar), 6)
        |      AS DECIMAL(18,6)) AS resc
        |  FROM b, g),
        |cs AS (SELECT CAST(SUM(relc) AS DOUBLE) AS rels,
        |         CAST(SUM(resc) AS DOUBLE) AS ress FROM con)
        |SELECT CAST(n AS BIGINT) AS n, pos AS n_pos,
        |  ROUND(ybar, 6) AS ybar,
        |  ROUND(sq / (CAST(n AS DOUBLE) * 108900.0), 6) AS brier,
        |  ROUND(rels / CAST(n AS DOUBLE), 6) AS reliability,
        |  ROUND(ress / CAST(n AS DOUBLE), 6) AS resolution,
        |  ROUND(ybar * (1.0 - ybar), 6) AS uncertainty,
        |  ROUND(sq / (CAST(n AS DOUBLE) * 108900.0)
        |    - rels / CAST(n AS DOUBLE) + ress / CAST(n AS DOUBLE)
        |    - ybar * (1.0 - ybar), 6) AS within_gap
        |FROM g, cs""".stripMargin,
    "q257_macro_f1" -> macroF1Sql,
    "q235_gains_curve" ->
      """WITH e AS (
        |  SELECT CAST(value AS DECIMAL(18,4)) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |g AS (SELECT v, COUNT(*) AS cnt, CAST(SUM(y) AS BIGINT) AS pos
        |      FROM e GROUP BY 1),
        |su AS (
        |  SELECT v, cnt, pos,
        |    CAST(COALESCE(SUM(cnt) OVER (ORDER BY v DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cs,
        |    CAST(COALESCE(SUM(pos) OVER (ORDER BY v DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cp
        |  FROM g),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
        |               CAST(SUM(pos) AS BIGINT) AS np FROM g),
        |dec AS (SELECT u.d AS decile, n, np, (u.d * n) // 10 AS r
        |        FROM tot, UNNEST(generate_series(1, 10)) AS u(d))
        |SELECT CAST(decile AS BIGINT) AS decile, CAST(r AS BIGINT) AS rank,
        |  CAST(cp + LEAST(pos, r - cs) AS BIGINT) AS cum_pos,
        |  ROUND(CAST(cp + LEAST(pos, r - cs) AS DOUBLE) / CAST(np AS DOUBLE), 6)
        |    AS gain,
        |  ROUND(CAST(cp + LEAST(pos, r - cs) AS DOUBLE) * CAST(n AS DOUBLE)
        |    / (CAST(r AS DOUBLE) * CAST(np AS DOUBLE)), 6) AS lift
        |FROM dec JOIN su ON cs < r AND r <= cs + cnt
        |ORDER BY decile""".stripMargin,
    "q223_knn_eval" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev,
        |             CAST(label AS BIGINT) AS label FROM embeddings),
        |p AS (SELECT vec_id AS pid, ev AS pv, label AS true_label
        |      FROM e WHERE vec_id < 100),
        |sc AS (
        |  SELECT p.pid, e.vec_id AS id, e.label,
        |    ROUND(list_dot_product(ev, pv)
        |      / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(pv, pv))), 6) AS score
        |  FROM e, p WHERE e.vec_id <> p.pid),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY pid
        |         ORDER BY score DESC, id) AS rn FROM sc),
        |votes AS (SELECT pid, label, COUNT(*) AS cnt FROM rk
        |          WHERE rn <= 5 GROUP BY 1, 2),
        |pred AS (SELECT pid, label AS pred_label,
        |           ROW_NUMBER() OVER (PARTITION BY pid
        |             ORDER BY cnt DESC, label) AS vr FROM votes)
        |SELECT p.true_label, pred.pred_label, CAST(COUNT(*) AS BIGINT) AS n
        |FROM pred JOIN p ON pred.pid = p.pid
        |WHERE vr = 1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q189_calibration_bins" ->
      """WITH e AS (
        |  SELECT CAST(value AS DECIMAL(18,4)) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |b AS (
        |  SELECT LEAST(9, CAST(v * 100 AS BIGINT) // 3300) AS bin, COUNT(*) AS n,
        |    CAST(SUM(y) AS BIGINT) AS n_pos,
        |    CAST(SUM(v) AS DOUBLE) AS sv
        |  FROM e GROUP BY 1)
        |SELECT bin, n, n_pos,
        |  ROUND(sv / n / 330.0, 6) AS mean_s,
        |  ROUND(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos,
        |  ROUND(ABS(sv / n / 330.0 - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS gap
        |FROM b ORDER BY bin""".stripMargin,
    "q190_auc" ->
      """WITH e AS (
        |  SELECT CAST(value AS DECIMAL(18,4)) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |s AS (
        |  SELECT v, CAST(SUM(y) AS BIGINT) AS cp,
        |    CAST(SUM(1 - y) AS BIGINT) AS cn
        |  FROM e GROUP BY v),
        |c AS (
        |  SELECT cp, cn,
        |    COALESCE(SUM(cn) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS negBelow
        |  FROM s)
        |SELECT CAST(SUM(cp) AS BIGINT) AS n_pos, CAST(SUM(cn) AS BIGINT) AS n_neg,
        |  CAST(SUM(cp * negBelow) AS BIGINT) AS concordant,
        |  CAST(SUM(cp * cn) AS BIGINT) AS tie_pairs,
        |  ROUND((CAST(SUM(cp * negBelow) AS DOUBLE) + CAST(SUM(cp * cn) AS DOUBLE) / 2.0)
        |        / (CAST(SUM(cp) AS DOUBLE) * CAST(SUM(cn) AS DOUBLE)), 6) AS auc
        |FROM c""".stripMargin,
    "q191_pr_curve" ->
      """WITH e AS (
        |  SELECT CAST(value AS DECIMAL(18,4)) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |th AS (SELECT CAST(t AS BIGINT) AS threshold
        |       FROM (VALUES (0),(33),(66),(99),(132),(165),(198),(231),(264),(297)) x(t)),
        |np AS (SELECT CAST(SUM(y) AS BIGINT) AS npos FROM e)
        |SELECT threshold,
        |  COUNT(*) FILTER (WHERE v >= threshold AND y = 1) AS tp,
        |  COUNT(*) FILTER (WHERE v >= threshold AND y = 0) AS fp,
        |  (SELECT npos FROM np) - COUNT(*) FILTER (WHERE v >= threshold AND y = 1) AS fn,
        |  ROUND(CAST(COUNT(*) FILTER (WHERE v >= threshold AND y = 1) AS DOUBLE)
        |        / CAST(COUNT(*) FILTER (WHERE v >= threshold AND y = 1)
        |               + COUNT(*) FILTER (WHERE v >= threshold AND y = 0) AS DOUBLE), 6) AS precision,
        |  ROUND(CAST(COUNT(*) FILTER (WHERE v >= threshold AND y = 1) AS DOUBLE)
        |        / CAST((SELECT npos FROM np) AS DOUBLE), 6) AS recall
        |FROM e, th GROUP BY threshold ORDER BY threshold""".stripMargin)
}
