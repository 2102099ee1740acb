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
}
