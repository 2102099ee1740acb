package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force replays for the evaluation family: the AUC against the
  * O(n²) pairwise definition, bins and curve against sequential counting.
  */
class EvaluationSpec extends SparkSpec {

  private def scored = graft.Tables.events(spark, sf0001)
    .select(col("value"), col("event_type")).collect()
    .map(r => (BigDecimal(r.getDouble(0)).setScale(4),
      if (r.getString(1) == "purchase") 1 else 0))

  test("q190 AUC equals the O(n^2) pairwise Mann-Whitney definition") {
    val xs = scored
    val pos = xs.filter(_._2 == 1).map(_._1)
    val neg = xs.filter(_._2 == 0).map(_._1)
    var conc = 0L; var ties = 0L
    for (p <- pos; n <- neg) {
      if (p > n) conc += 1 else if (p == n) ties += 1
    }
    val wantAuc = (conc.toDouble + ties.toDouble / 2.0) / (pos.length.toDouble * neg.length)
    val r = Evaluation.q190Auc(spark, sf0001).head()
    assert(r.getLong(0) === pos.length.toLong && r.getLong(1) === neg.length.toLong)
    assert(r.getLong(2) === conc && r.getLong(3) === ties)
    assert(math.abs(r.getDouble(4) - wantAuc) < 1e-6)
  }

  test("q189 reliability bins match a sequential count; bins partition the rows") {
    val xs = scored
    val want = xs.groupBy { case (v, _) =>
      math.min(9L, (v * 100).toLongExact / 3300L)
    }
    val got = Evaluation.q189CalibrationBins(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._2).sum === xs.length)
    got.foreach { case (bin, n, nPos, meanS, fracPos) =>
      val g = want(bin)
      assert(g.length === n, s"bin $bin count")
      assert(g.count(_._2 == 1) === nPos, s"bin $bin positives")
      val wantMean = (g.map(_._1).sum / g.length / 330).toDouble
      assert(math.abs(meanS - wantMean) < 1e-5, s"bin $bin mean score")
      assert(math.abs(fracPos - g.count(_._2 == 1).toDouble / g.length) < 1e-6)
    }
  }

  test("q191 PR curve: confusion counts replay; recall non-increasing in threshold") {
    val xs = scored
    val npos = xs.count(_._2 == 1)
    val got = Evaluation.q191PrCurve(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5)))
    assert(got.map(_._1).toSeq === (0 until 10).map(_ * 33L))
    got.foreach { case (t, tp, fp, fn, _) =>
      assert(tp === xs.count(x => x._1 >= BigDecimal(t) && x._2 == 1).toLong, s"t=$t tp")
      assert(fp === xs.count(x => x._1 >= BigDecimal(t) && x._2 == 0).toLong, s"t=$t fp")
      assert(fn === (npos - tp), s"t=$t fn")
    }
    assert(got.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      "recall must be non-increasing as the threshold rises")
    assert(got.head._2 === npos.toLong, "threshold 0 must recall every positive")
  }

  private def ratedDocs = graft.Tables(spark, sf0001, "documents")
    .select(col("source"), col("text"), col("n_chars")).collect()
    .map { r =>
      val (src, text, nc) = (r.getString(0), r.getString(1), r.getLong(2))
      val la = if (nc >= 400) "long" else if (nc >= 200) "mid" else "short"
      val sp = text.count(_ == ' ').toLong
      val lb = if (sp >= 72) "long" else if (sp >= 36) "mid" else "short"
      (src, la, lb)
    }

  test("q315 kappa: all-integer identity equals a per-source confusion replay") {
    val bySrc = ratedDocs.groupBy(_._1)
    val got = Evaluation.q315CohensKappa(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.map(_._1).toSeq === bySrc.keys.toSeq.sorted)
    got.foreach { case (src, n, agree, peNum, kappa) =>
      val g = bySrc(src)
      assert(n === g.length.toLong, s"$src n")
      assert(agree === g.count(t => t._2 == t._3).toLong, s"$src agree")
      val labels = (g.map(_._2) ++ g.map(_._3)).distinct
      val wantPe = labels.map(l =>
        g.count(_._2 == l).toLong * g.count(_._3 == l).toLong).sum
      assert(peNum === wantPe, s"$src pe_num")
      val wantK = if (n * n == wantPe) 0.0
        else BigDecimal((agree * n - wantPe).toDouble / (n * n - wantPe).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(kappa === wantK, s"$src kappa")
    }
    assert(got.exists(t => t._5 != 0.0 && t._5 != 1.0),
      "every kappa trivial — vacuous fixture")
    // the raters must genuinely disagree somewhere or kappa measures nothing
    assert(ratedDocs.exists(t => t._2 != t._3), "raters never disagree")
  }

  test("q335 weighted kappa: ordinal statistic matches an all-integer replay; penalizes distance") {
    def ord(l: String): Long = l match {
      case "short" => 0L; case "mid" => 1L; case _ => 2L
    }
    val bySrc = ratedDocs.map(t => (t._1, ord(t._2), ord(t._3))).groupBy(_._1)
    val got = Evaluation.q335WeightedKappa(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.map(_._1).toSeq === bySrc.keys.toSeq.sorted)
    got.foreach { case (src, n, wo, weNum, kw) =>
      val g = bySrc(src)
      assert(n === g.length.toLong)
      val wantWo = g.map(t => (t._2 - t._3) * (t._2 - t._3)).sum
      assert(wo === wantWo, s"$src wo")
      val wantWe = (for (i <- 0L to 2L; j <- 0L to 2L) yield
        (i - j) * (i - j) * g.count(_._2 == i) * g.count(_._3 == j)).sum
      assert(weNum === wantWe, s"$src we_num")
      val want = if (wantWe == 0) 0.0
        else BigDecimal(1.0 - (n * wantWo).toDouble / wantWe)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(kw === want, s"$src kappa_w")
    }
    // ordinal property: a short<->long disagreement costs 4x a short<->mid
    // one, so on the shared fixture kappa_w must differ from plain kappa
    // somewhere (they coincide only on weight-degenerate confusions)
    val plain = Evaluation.q315CohensKappa(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(4))).toMap
    assert(got.exists(g => math.abs(g._5 - plain(g._1)) > 1e-6),
      "weighted and unweighted kappa identical everywhere — weights vacuous")
  }

  test("q336 feature AUC scan: per-feature AUCs match pairwise replays; value row equals q190") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(graft.Dsl.epochSec(col("ts2")), col("user_id"), col("value"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(4), r.getString(3) == "purchase"))
    def pairAuc(scores: Seq[(BigDecimal, Boolean)]): Double = {
      val pos = scores.filter(_._2).map(_._1)
      val neg = scores.filterNot(_._2).map(_._1)
      var conc = 0L; var ties = 0L
      for (p <- pos; n <- neg) { if (p > n) conc += 1 else if (p == n) ties += 1 }
      (conc.toDouble + ties.toDouble / 2.0) / (pos.length.toDouble * neg.length)
    }
    val feats: Map[String, Seq[(BigDecimal, Boolean)]] = Map(
      "day_of_week" -> ev.map(e => (BigDecimal(e._1 / 86400 % 7), e._4)).toSeq,
      "hour_of_day" -> ev.map(e => (BigDecimal(e._1 / 3600 % 24), e._4)).toSeq,
      "user_bucket" -> ev.map(e => (BigDecimal(e._2 % 16), e._4)).toSeq,
      "value" -> ev.map(e => (e._3, e._4)).toSeq)
    val got = Evaluation.q336FeatureAucScan(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(5))).toMap
    assert(got.keySet === feats.keySet)
    feats.foreach { case (name, scores) =>
      assert(math.abs(got(name) - pairAuc(scores)) < 2e-6, s"$name auc")
    }
    val q190 = Evaluation.q190Auc(spark, sf0001).head().getDouble(4)
    assert(got("value") === q190, "value row must equal the q190 AUC exactly")
    assert(got.values.toSeq.distinct.length > 1,
      "every feature scored identically — scan vacuous")
    assert(got.values.forall(a => a >= 0.0 && a <= 1.0))
  }

  test("q316 mcnemar: discordant counts and statistic equal a paired replay") {
    val docs = graft.Tables(spark, sf0001, "documents")
      .select(col("lang"), col("text")).collect()
      .map { r =>
        val truth = r.getString(0) == "en"
        val pa = r.getString(1).contains(" the ")
        val pb = r.getString(1).contains(" a ")
        (r.getString(0), truth, pa, pb)
      }
    val got = Evaluation.q316Mcnemar(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.map(_._1).toSeq === docs.map(_._1).distinct.sorted.toSeq)
    got.foreach { case (lang, n, aCor, bCor, bD, cD, chi2) =>
      val g = docs.filter(_._1 == lang)
      assert(n === g.length.toLong)
      assert(aCor === g.count(t => t._3 == t._2).toLong, s"$lang a_correct")
      assert(bCor === g.count(t => t._4 == t._2).toLong, s"$lang b_correct")
      assert(bD === g.count(t => t._3 == t._2 && t._4 != t._2).toLong)
      assert(cD === g.count(t => t._3 != t._2 && t._4 == t._2).toLong)
      val want = if (bD + cD == 0) 0.0
        else {
          val adj = math.max(math.abs(bD - cD) - 1, 0L)
          BigDecimal((adj * adj).toDouble / (bD + cD).toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      assert(chi2 === want, s"$lang chi2")
    }
    assert(got.exists(t => t._5 + t._6 > 0), "no discordant pairs — vacuous")
  }

  test("q317 brier decomposition: terms replay; the binned identity closes via within_gap") {
    val xs = scored.map { case (v, y) => (v.toDouble / 330.0, y) }
    val n = xs.length
    val ybar = xs.map(_._2).sum.toDouble / n
    val brier = xs.map { case (s, y) => (s - y) * (s - y) }.sum / n
    val bins = scored.groupBy { case (v, _) =>
      math.min(9L, ((v * 100).toBigInt / 3300).toLong)
    }
    def relres = {
      var rel = 0.0; var res = 0.0
      bins.values.foreach { g =>
        val nk = g.length
        val sk = g.map(_._1).sum.toDouble / nk / 330.0
        val yk = g.count(_._2 == 1).toDouble / nk
        rel += nk * (sk - yk) * (sk - yk)
        res += nk * (yk - ybar) * (yk - ybar)
      }
      (rel / n, res / n)
    }
    val (wantRel, wantRes) = relres
    val r = Evaluation.q317BrierDecomposition(spark, sf0001).head()
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === xs.map(_._2).sum.toLong)
    assert(math.abs(r.getDouble(2) - ybar) < 1e-6, "ybar")
    assert(math.abs(r.getDouble(3) - brier) < 1e-5, "brier")
    assert(math.abs(r.getDouble(4) - wantRel) < 1e-4, "reliability")
    assert(math.abs(r.getDouble(5) - wantRes) < 1e-4, "resolution")
    assert(math.abs(r.getDouble(6) - ybar * (1 - ybar)) < 1e-6, "uncertainty")
    // Murphy: brier = REL - RES + UNC + within-bin variance, gap >= 0
    assert(r.getDouble(7) >= -1e-6, "within_gap must be non-negative")
    assert(math.abs(r.getDouble(3) - (r.getDouble(4) - r.getDouble(5)
      + r.getDouble(6) + r.getDouble(7))) < 5e-6,
      "reported terms must close the decomposition identity")
  }

  test("q461 Spiegelhalter z: matches the per-event closed-form replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(expr("CAST(hour(ts2) AS BIGINT)"),
        (col("event_type") === "purchase").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byH = ev.groupBy(_._1)
    val p = byH.view.mapValues(g => (g.map(_._2).sum + 1.0) / (g.length + 2.0)).toMap
    val num = ev.map { case (h, o) => (o - p(h)) * (1 - 2 * p(h)) }.sum
    val den = ev.map { case (h, _) => math.pow(1 - 2 * p(h), 2) * p(h) * (1 - p(h)) }.sum
    val want = num / math.sqrt(den)
    val r = Evaluation.q461SpiegelhalterZ(spark, sf0001).collect().head
    assert(r.getLong(0) == ev.length)
    assert(math.abs(r.getDouble(1) - want) < 1e-3, s"z ${r.getDouble(1)} vs $want")
  }

  test("q475 calibration slope: matches the per-event OLS replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(expr("CAST(hour(ts2) AS BIGINT)"),
        (col("event_type") === "purchase").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byH = ev.groupBy(_._1)
    val p = byH.view.mapValues(g => (g.map(_._2).sum + 1.0) / (g.length + 2.0)).toMap
    val xs = ev.map { case (h, o) => (p(h), o.toDouble) }
    val n = xs.length.toDouble
    val sp = xs.map(_._1).sum
    val so = xs.map(_._2).sum
    val spp = xs.map(t => t._1 * t._1).sum
    val spo = xs.map(t => t._1 * t._2).sum
    val slope = (n * spo - sp * so) / (n * spp - sp * sp)
    val r = Evaluation.q475CalibrationSlope(spark, sf0001).collect().head
    assert(r.getLong(0) == ev.length)
    assert(math.abs(r.getDouble(1) - slope) < 1e-3, s"slope ${r.getDouble(1)} vs $slope")
    assert(math.abs(r.getDouble(2) - (so - slope * sp) / n) < 1e-3, "intercept")
    assert(math.abs(r.getDouble(3) - (so / n - sp / n)) < 1e-4, "citl")
  }
}
