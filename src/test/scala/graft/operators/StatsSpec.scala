package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force replay pins for the Stats family (q177-q180, q186-q187):
  * each statistic is recomputed in plain Scala from collected sf0.001 rows
  * and compared against the distributed result. The DuckDB oracle owns the
  * bit-exact cross-engine check; these pins prove the SEMANTICS (the right
  * formula, the right median convention, the right pruning) independent of
  * the oracle's SQL.
  */
class StatsSpec extends SparkSpec {

  private def rd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def dailyDollars(): Seq[(Long, Long)] =
    graft.Tables(spark, sf0001, "orders")
      .select(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("x"), col("o_totalprice").cast("decimal(18,2)").as("p"))
      .collect()
      .map(r => (r.getLong(0), r.getDecimal(1)))
      .groupBy(_._1).view
      .mapValues(_.map(t => BigDecimal(t._2)).sum.setScale(0,
        BigDecimal.RoundingMode.FLOOR).toLong)
      .toSeq.sortBy(_._1)

  test("q487 matrix profile: matches a brute-force z-norm replay with identical ties") {
    val grid = dailyDollars()
    val subs = grid.indices.dropRight(6).map { k =>
      val w = grid.slice(k, k + 7).map(_._2)
      val ss = w.sum; val qq = w.map(v => v * v).sum
      (k + 1L, grid(k)._1, w, ss, qq) // i is 1-based row position
    }.filter { case (_, _, _, ss, qq) => 7 * qq - ss * ss > 0 }
    val prof = subs.map { case (i, x, w, ss, qq) =>
      val dists = subs.filter { case (j, _, _, _, _) => math.abs(i - j) >= 4 }
        .map { case (_, _, w2, sj, qj) =>
          val dot = w.zip(w2).map { case (a, b) => a * b }.sum
          val num = (7L * dot - ss * sj).toDouble
          val va = (7L * qq - ss * ss).toDouble
          val vb = (7L * qj - sj * sj).toDouble
          rd6(math.sqrt(math.max(0.0,
            14.0 * (1.0 - num / (math.sqrt(va) * math.sqrt(vb))))))
        }
      (i, x, dists.min)
    }
    val want = prof.sortBy { case (i, _, p) => (-p, i) }.take(10)
    val got = Stats.q487MatrixProfile(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want, s"matrix profile mismatch:\n got=$got\n want=$want")
  }

  test("q487 kernel: the int64-overflow guard fails loudly past the band") {
    // intermediates are bounded by 98·max(c)², so |c| <= 3e8 keeps the
    // exact int64 moments below 2^63. In band: runs; out of band:
    // raise_error instead of silent wraparound.
    import spark.implicits._
    def grid(maxC: Long) = (1L to 20L).map(i => (i, if (i == 13) maxC else i * 100L))
      .toDF("x", "c")
    assert(Stats.matrixProfileReport(grid(300000000L)).collect().nonEmpty)
    val ex = intercept[Exception] {
      Stats.matrixProfileReport(grid(300000001L)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("int64-overflow")),
      s"expected the overflow guard message, got: ${msgs(ex).mkString(" | ")}")
  }

  test("q487 oracle scale stays inside the 2^53 double-identity band") {
    // the DuckDB twin computes the window moments over DOUBLE[]; the
    // cross-engine hash identity needs every intermediate < 2^53, i.e.
    // max(qq) <= 2^53/14. This pins that the sf0.01 corpus (where the
    // oracle gate runs) actually sits inside the band — if a future
    // testdata regeneration inflates daily revenue past it, this fails
    // BEFORE the oracle flakes mysteriously.
    import org.apache.spark.sql.expressions.Window
    val grid = Stats.dailyRevenue(spark, "/root/testdata/sf0.01")
      .select(col("x"), floor(col("r")).cast("long").as("c"))
    val w7 = Window.orderBy(col("x")).rowsBetween(Window.currentRow, 6)
    val maxQq = grid.withColumn("qq", sum(col("c") * col("c")).over(w7))
      .agg(max(col("qq"))).collect().head.getLong(0)
    info(f"sf0.01 max window qq = $maxQq%,d (band max ${9007199254740992L / 14}%,d)")
    assert(maxQq <= 9007199254740992L / 14,
      s"sf0.01 window moments left the 2^53/14 identity band: $maxQq")
  }

  test("q490 CUSUM: the prefix-min identity reproduces the max(0,.) recursion") {
    val cents = graft.Tables(spark, sf0001, "orders")
      .select(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("x"), col("o_totalprice").cast("decimal(18,2)").as("p"))
      .collect()
      .map(r => (r.getLong(0), r.getDecimal(1)))
      .groupBy(_._1).view
      .mapValues(_.map(t => BigDecimal(t._2)).sum * 100)
      .toSeq.map { case (x, c) => (x, c.toLong) }.sortBy(_._1)
    val n = cents.size; val cc = cents.map(_._2).sum
    val mu = cc.toDouble / n
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val h = r4(mu * 0.05)
    // the recursion the query claims to compute, replayed directly
    var sPrev = BigDecimal(0)
    val rec = cents.map { case (x, c) =>
      val y = r4(c.toDouble - mu * 1.005)
      sPrev = (sPrev + y).max(BigDecimal(0))
      (x, c, sPrev.toDouble, sPrev > h)
    }
    val want = rec.sortBy { case (x, _, s, _) => (-s, x) }.take(10)
      .map { case (x, c, s, a) => (x, c, s, a) }
    val got = Stats.q490CusumAlarm(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
    assert(got == want, s"CUSUM identity mismatch:\n got=$got\n want=$want")
  }

  test("q492 bootstrap: weights, replica means and CI match a hash replay") {
    val base = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"), (col("o_totalprice").cast("decimal(18,4)") * 100)
        .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val p = 2147483647L
    def bucket(x: Long): Long = {
      val h1 = ((x % p) * 48271L) % p
      ((h1 + 1L) * 16807L) % p % 10000L
    }
    def w(u: Long): Long =
      if (u < 3679) 0 else if (u < 7358) 1 else if (u < 9197) 2
      else if (u < 9810) 3 else if (u < 9963) 4 else if (u < 9994) 5 else 6
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val means = (0L until 32L).map { b =>
      val ws = base.map { case (k, c) => (w(bucket(k * 37L + b)), c) }
      (b, r4(ws.map { case (wt, c) => wt * c }.sum.toDouble
        / ws.map(_._1).sum))
    }
    val pt = r4(base.map(_._2).sum.toDouble / base.length)
    val sortedM = means.sortBy { case (b, m) => (m, b) }.map(_._2)
    val dms = means.map(_._2 - pt)
    val sdm = dms.sum
    val sdm2 = dms.map(dm => r4(dm.toDouble * dm.toDouble)).sum
    val se = r4(math.sqrt((sdm2.toDouble - sdm.toDouble * sdm.toDouble / 32.0)
      / 31.0)).toDouble
    val got = Stats.q492BootstrapCi(spark, sf0001).collect()(0)
    assert(got.getLong(0) == 32L)
    assert(got.getDouble(1) == pt.toDouble, "point estimate")
    assert(got.getDouble(2) == sortedM(1).toDouble, "ci_lo (rank 2)")
    assert(got.getDouble(3) == sortedM(30).toDouble, "ci_hi (rank 31)")
    assert(got.getDouble(4) == se, "bootstrap se")
  }

  test("q493 seasonal decomposition: indices and strength match a replay") {
    val grid = dailyDollars().map { case (x, dol) => (x, dol / 1000L) }
    val det = grid.indices.collect {
      case k if k >= 3 && k + 3 < grid.size =>
        val win = grid.slice(k - 3, k + 4).map(_._2).sum
        (grid(k)._1, ((grid(k)._1 % 7) + 7) % 7, 7L * grid(k)._2 - win)
    }
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val seas = det.groupBy(_._2).view.mapValues { g =>
      (g.size.toLong, r4(g.map(_._3).sum.toDouble / g.size / 7.0))
    }.toMap
    val resid = det.map { case (_, wd, d7) =>
      val dd = r4(d7.toDouble / 7.0)
      (dd, dd - seas(wd)._2)
    }
    def varOf(vs: Seq[BigDecimal]): Double = {
      val n = vs.size.toDouble
      val s = vs.sum; val s2 = vs.map(v => r4(v.toDouble * v.toDouble)).sum
      (s2.toDouble - s.toDouble * s.toDouble / n) / (n - 1.0)
    }
    val strength = BigDecimal(math.max(0.0,
      1.0 - varOf(resid.map(_._2)) / varOf(resid.map(_._1))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Stats.q493SeasonalDecompose(spark, sf0001).collect()
    assert(got.length == 7)
    got.foreach { r =>
      val (n, s) = seas(r.getLong(0))
      assert(r.getLong(1) == n, s"n_days(${r.getLong(0)})")
      assert(r.getDouble(2) == s.toDouble, s"seasonal(${r.getLong(0)})")
      assert(r.getDouble(3) == strength, "strength")
    }
  }

  test("q494 Granger: F statistic matches an OLS replay on the lag pairs") {
    val grid = graft.Tables(spark, sf0001, "orders")
      .groupBy(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("x"))
      .agg((sum(col("o_totalprice").cast("decimal(18,4)")) * 100)
        .cast("long").as("rc"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / 100000L, r.getLong(2)))
      .sortBy(_._1)
    val lagged = grid.sliding(2).filter(_.length == 2)
      .map(p => (p(1)._2, p(0)._2, p(0)._3)).toSeq // (y, y1, x1)
    val n = lagged.size.toDouble
    def s(f: ((Long, Long, Long)) => Long) = lagged.map(f).sum.toDouble
    val sy = s(_._1); val s1 = s(_._2); val s2 = s(_._3)
    val s11 = s(t => t._2 * t._2); val s22 = s(t => t._3 * t._3)
    val s12 = s(t => t._2 * t._3); val sy1 = s(t => t._1 * t._2)
    val sy2 = s(t => t._1 * t._3); val syy = s(t => t._1 * t._1)
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
    val rssR = syy - ((sy - br * s1) / n) * sy - br * sy1
    val f = (rssR - rssU) / (rssU / (n - 3.0))
    def r(x: Double, sc: Int) =
      BigDecimal(x).setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Stats.q494GrangerCausality(spark, sf0001).collect()(0)
    assert(got.getLong(0) == lagged.size.toLong)
    assert(got.getDouble(1) == r(db / det, 6), "beta_rev_lag")
    assert(got.getDouble(2) == r(dc / det, 6), "beta_cnt_lag")
    assert(got.getDouble(3) == r(f, 4), "f_stat")
    // the lag join must add information only through the lagged columns:
    // RSS_u <= RSS_r by construction
    assert(rssU <= rssR + 1e-6)
  }

  test("q495 binary segmentation: splits match an exhaustive SSE replay") {
    val vs = dailyDollars().map { case (x, dol) => (x, dol / 1000L) }
    val n = vs.size
    val pArr = vs.map(_._2).scanLeft(0L)(_ + _).toArray // P(0..n)
    val qArr = vs.map(v => v._2 * v._2).scanLeft(0L)(_ + _).toArray
    def rd(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cost(k: Int, a: Int, b: Int): Double = {
      val dL = (pArr(k) - pArr(a)).toDouble; val mL = (k - a).toDouble
      val dR = (pArr(b) - pArr(k)).toDouble; val mR = (b - k).toDouble
      rd((qArr(k) - qArr(a)).toDouble - dL * dL / mL
        + ((qArr(b) - qArr(k)).toDouble - dR * dR / mR), 6)
    }
    def sse(a: Int, b: Int): Double = {
      val dd = (pArr(b) - pArr(a)).toDouble
      rd((qArr(b) - qArr(a)).toDouble - dd * dd / (b - a), 6)
    }
    def best(a: Int, b: Int): (Int, Double) =
      (a + 7 to b - 7).map(k => (k, cost(k, a, b))).minBy { case (k, c) => (c, k) }
    val (k0, c0) = best(0, n)
    val want = Seq(
      (0L, vs(k0 - 1)._1, rd(sse(0, n) - c0, 6)),
      (1L, vs(best(0, k0)._1 - 1)._1, rd(sse(0, k0) - best(0, k0)._2, 6)),
      (2L, vs(best(k0, n)._1 - 1)._1, rd(sse(k0, n) - best(k0, n)._2, 6)))
    val got = Stats.q495BinarySegmentation(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want, s"segmentation mismatch:\n got=$got\n want=$want")
  }

  test("q496 MI matrix: MI/NMI match a contingency replay; MI bounds hold") {
    val rows = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority"),
        year(col("o_orderdate")).cast("string"),
        month(col("o_orderdate")).cast("string"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val cols = Map("status" -> rows.map(_._1), "priority" -> rows.map(_._2),
      "year" -> rows.map(_._3), "month" -> rows.map(_._4))
    def r8(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    def ent(vs: Seq[String]): BigDecimal = {
      val n = vs.size.toDouble
      vs.groupBy(identity).values
        .map(g => r8(g.size / n * math.log(g.size / n) * -1.0)).sum
    }
    val got = Stats.q496MiMatrix(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.size == 6)
    got.foreach { case (pair, (nCells, mi, nmi)) =>
      val Array(an, bn) = pair.split("_")
      val a = cols(an); val b = cols(bn)
      val joint = a.zip(b)
      val n = joint.size.toDouble
      val cj = joint.groupBy(identity).view.mapValues(_.size).toMap
      val ca = a.groupBy(identity).view.mapValues(_.size).toMap
      val cb = b.groupBy(identity).view.mapValues(_.size).toMap
      assert(nCells == cj.size.toLong, s"n_cells($pair)")
      val miW = cj.map { case ((x, y), c) =>
        r8(c / n * math.log(c * n / (ca(x).toDouble * cb(y).toDouble)))
      }.sum
      assert(mi == BigDecimal(miW.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"mi($pair)")
      val nmiW = miW.toDouble / math.min(ent(a).toDouble, ent(b).toDouble)
      assert(math.abs(nmi - nmiW) < 1e-5, s"nmi($pair)")
      assert(mi >= -1e-9 && nmi <= 1.0 + 1e-6, s"bounds($pair)")
    }
  }

  test("q497 CUPED: theta, diffs and variance reduction match a unit replay") {
    val p = 2147483647L
    def bucket(x: Long): Long = {
      val h1 = ((x % p) * 48271L) % p
      ((h1 + 1L) * 16807L) % p % 10000L
    }
    val per = graft.Tables(spark, sf0001, "orders")
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,4)") * 100).cast("long"),
        (year(col("o_orderdate")) >= 1996))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val custs = graft.Tables(spark, sf0001, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val byC = per.groupBy(_._1)
    val units = custs.map { ck =>
      val os = byC.getOrElse(ck, Array.empty[(Long, Long, Boolean)])
      val y = os.filter(_._3).map(_._2).sum / 100000L
      val x = os.filterNot(_._3).map(_._2).sum / 100000L
      (x, y, bucket(ck) < 5000L)
    }
    val n = units.length.toDouble
    val sx = units.map(_._1).sum.toDouble; val sy = units.map(_._2).sum.toDouble
    val sxx = units.map(u => u._1 * u._1).sum.toDouble
    val sxy = units.map(u => u._1 * u._2).sum.toDouble
    val syy = units.map(u => u._2 * u._2).sum.toDouble
    val nt = units.count(_._3).toDouble
    val syt = units.filter(_._3).map(_._2).sum.toDouble
    val sxt = units.filter(_._3).map(_._1).sum.toDouble
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val diff = syt / nt - (sy - syt) / (n - nt)
    val diffAdj = diff - theta * (sxt / nt - (sx - sxt) / (n - nt))
    val varY = (n * syy - sy * sy) / (n * n)
    val varAdj = varY - theta * theta * ((n * sxx - sx * sx) / (n * n))
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Stats.q497Cuped(spark, sf0001).collect()(0)
    assert(got.getLong(0) == units.length.toLong)
    assert(got.getLong(1) == nt.toLong)
    assert(got.getDouble(2) == r(theta, 6), "theta")
    assert(got.getDouble(3) == r(diff, 4), "diff_raw")
    assert(got.getDouble(4) == r(diffAdj, 4), "diff_cuped")
    assert(got.getDouble(5) == r(1.0 - varAdj / varY, 6), "var_reduction")
    // CUPED must not increase variance
    assert(varAdj <= varY + 1e-9)
  }

  private def segValuesReplay(): Seq[(String, String, Long)] = {
    val custSeg = graft.Tables(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    graft.Tables(spark, sf0001, "orders")
      .select(col("o_custkey"), col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,4)") * 100).cast("long"))
      .collect()
      .map(r => (custSeg(r.getLong(0)), r.getString(1), r.getLong(2) / 100000L))
  }

  test("q501/q503: ANOVA and Brown-Forsythe match group-moment replays") {
    // q501 — the ssTot continuation bug regression: ss_within must be
    // ssTot - ssB, NOT qt - ssB (a leading-minus Scala line break once
    // silently dropped the correction term; the oracle caught it)
    val vals = segValuesReplay().map(t => (t._1, t._3))
    def anovaOf(vs: Seq[(String, Long)]): (Double, Double, Double) = {
      val n = vs.size.toDouble; val k = vs.map(_._1).distinct.size.toDouble
      val st = vs.map(_._2).sum.toDouble
      val qt = vs.map(v => v._2 * v._2).sum.toDouble
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val sbterm = vs.groupBy(_._1).values
        .map { g => r6(g.map(_._2).sum.toDouble * g.map(_._2).sum / g.size) }
        .sum.toDouble
      val ssTot = qt - st * st / n
      val ssB = sbterm - st * st / n
      val ssW = ssTot - ssB
      (ssB, ssW, (ssB / (k - 1.0)) / (ssW / (n - k)))
    }
    val (ssB, ssW, f) = anovaOf(vals)
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Stats.q501AnovaOneway(spark, sf0001).collect()(0)
    assert(got.getDouble(2) == r(ssB, 4), "ss_between")
    assert(got.getDouble(3) == r(ssW, 4), "ss_within")
    assert(got.getDouble(4) == r(f, 4), "f_stat")
    // q503: the same ANOVA on |y - group median| deviations
    val meds = vals.groupBy(_._1).view.mapValues { g =>
      val s = g.map(_._2).sorted; s((s.size + 1) / 2 - 1)
    }.toMap
    val devs = vals.map { case (g, y) => (g, math.abs(y - meds(g))) }
    val (_, _, bf) = anovaOf(devs)
    val got3 = Stats.q503BrownForsythe(spark, sf0001).collect()(0)
    assert(got3.getDouble(2) == r(bf, 4), "bf_stat")
  }

  test("q502 Shapley R2: efficiency axiom holds and R2s match an eta-sq replay") {
    val vals = segValuesReplay()
    def r2Of(key: ((String, String, Long)) => String): Double = {
      val n = vals.size.toDouble
      val st = vals.map(_._3).sum.toDouble
      val qt = vals.map(v => v._3 * v._3).sum.toDouble
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val sb = vals.groupBy(key).values
        .map(g => r6(g.map(_._3).sum.toDouble * g.map(_._3).sum / g.size))
        .sum.toDouble
      (sb - st * st / n) / (qt - st * st / n)
    }
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r2s = r2Of(_._1); val r2p = r2Of(_._2)
    val r2b = r2Of(t => t._1 + " " + t._2)
    val got = Stats.q502ShapleyR2(spark, sf0001).collect()(0)
    assert(got.getDouble(1) == r(r2s, 6), "r2_segment")
    assert(got.getDouble(2) == r(r2p, 6), "r2_priority")
    assert(got.getDouble(3) == r(r2b, 6), "r2_both")
    // efficiency: the two Shapley shares sum to R2(both)
    assert(math.abs(got.getDouble(4) + got.getDouble(5) - got.getDouble(3)) < 2e-6)
    // monotone containment: the pair explains at least each single
    assert(r2b >= r2s - 1e-9 && r2b >= r2p - 1e-9)
  }

  test("q504/q505/q506: effect sizes, Tukey pairs and two-way SS match replays") {
    val vals = segValuesReplay()
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    // q504 — two largest segments by count (ties by name)
    val byG = vals.groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    val two = byG.toSeq.sortBy { case (g, ys) => (-ys.size, g) }.take(2)
    val (g1, ys1) = two(0); val (g2, ys2) = two(1)
    val n1 = ys1.size.toDouble; val n2 = ys2.size.toDouble
    val m1 = ys1.sum.toDouble / n1; val m2 = ys2.sum.toDouble / n2
    def varOf(ys: Seq[Long], n: Double) =
      (ys.map(y => y * y).sum.toDouble - ys.sum.toDouble * ys.sum / n) / (n - 1.0)
    val v1 = varOf(ys1, n1); val v2 = varOf(ys2, n2)
    val sp = math.sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
    val gt = (for (a <- ys1; b <- ys2 if a > b) yield 1L).sum
    val eqc = (for (a <- ys1; b <- ys2 if a == b) yield 1L).sum
    val got4 = Stats.q504EffectSizes(spark, sf0001).collect()(0)
    assert(got4.getString(0) == g1 && got4.getString(1) == g2)
    assert(got4.getDouble(2) == r((m1 - m2) / sp, 6), "cohens_d")
    assert(got4.getDouble(5) == r((gt + 0.5 * eqc) / (n1 * n2), 6), "cles")
    // q505 — every pair's verdict against the replayed MSW threshold
    val n = vals.size.toDouble; val k = byG.size.toDouble
    val qt = vals.map(v => v._3 * v._3).sum.toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val sbterm = byG.values
      .map(ys => r6(ys.sum.toDouble * ys.sum / ys.size)).sum.toDouble
    val msw = (qt - sbterm) / (n - k)
    val got5 = Stats.q505TukeyHsd(spark, sf0001).collect()
    assert(got5.length == k.toInt * (k.toInt - 1) / 2)
    got5.foreach { row =>
      val ya = byG(row.getString(0)); val yb = byG(row.getString(1))
      val diff = ya.sum.toDouble / ya.size - yb.sum.toDouble / yb.size
      val hsd = 3.858 * math.sqrt(msw / 2.0 * (1.0 / ya.size + 1.0 / yb.size))
      assert(row.getDouble(2) == r(diff, 4), s"diff ${row.getString(0)}")
      assert(row.getDouble(3) == r(hsd, 4), s"hsd ${row.getString(0)}")
      assert(row.getBoolean(4) == (math.abs(r(diff, 4)) > r(hsd, 4)))
    }
    // q506 — the hierarchical decomposition closes and F matches
    val got6 = Stats.q506TwowayAnova(spark, sf0001).collect()(0)
    val st = vals.map(_._3).sum.toDouble
    val cm = st * st / n
    def sbOf(key: ((String, String, Long)) => String) = vals.groupBy(key).values
      .map(ys => r6(ys.map(_._3).sum.toDouble * ys.map(_._3).sum / ys.size))
      .sum.toDouble
    val ssA = sbOf(_._1) - cm; val ssB = sbOf(_._2) - cm
    val sbc = sbOf(t => t._1 + "|" + t._2)
    val ssC = sbc - cm; val ssW = qt - sbc
    assert(got6.getDouble(1) == r(ssA, 4), "ss_segment")
    assert(got6.getDouble(2) == r(ssB, 4), "ss_priority")
    assert(got6.getDouble(3) == r(ssC - ssA - ssB, 4), "ss_interaction")
    assert(got6.getDouble(4) == r(ssW, 4), "ss_within")
    // decomposition closure: SS_A + SS_B + SS_AB + SS_W = SS_total
    val ssTot = qt - cm
    assert(math.abs(ssA + ssB + (ssC - ssA - ssB) + ssW - ssTot) < 1e-3)
  }

  test("q177 linreg: slope/intercept/r2 match closed-form on collected rows") {
    val rows = graft.Tables(spark, sf0001, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val got = Stats.q177GroupLinreg(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (flag, n, slope, intercept, r2) =>
      val g = rows.filter(_._1 == flag)
      assert(g.length == n)
      val nn = g.length.toDouble
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxx = g.map(t => t._2 * t._2).sum
      val syy = g.map(t => t._3 * t._3).sum
      val sxy = g.map(t => t._2 * t._3).sum
      val den = nn * sxx - sx * sx
      val wantSlope = (nn * sxy - sx * sy) / den
      val wantIcpt = (sy * sxx - sx * sxy) / den
      val wantR2 = math.pow(nn * sxy - sx * sy, 2) / (den * (nn * syy - sy * sy))
      assert(math.abs(slope - wantSlope) < 1e-4, s"$flag slope $slope vs $wantSlope")
      assert(math.abs(intercept - wantIcpt) < 1e-2, s"$flag intercept")
      assert(math.abs(r2 - wantR2) < 1e-4, s"$flag r2")
    }
  }

  test("q178 welch: means match, t sign tracks mean delta, df within bounds") {
    val vals = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val base = vals.filter(_._1 == "view").map(_._2)
    val m0 = base.sum / base.length
    val got = Stats.q178AbWelch(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSet == Set("click", "error", "purchase", "signup"))
    got.foreach { case (arm, n, mean, t, df) =>
      val g = vals.filter(_._1 == arm).map(_._2)
      assert(g.length == n)
      val m1 = g.sum / g.length
      assert(math.abs(mean - m1) < 1e-6, s"$arm mean")
      assert(t == 0.0 || (t > 0) == (m1 > m0), s"$arm t sign")
      assert(df >= math.min(n, base.length) - 1 && df <= n + base.length - 2.0, s"$arm df")
    }
  }

  test("q179 MAD: lower median and MAD match a sorted-array replay") {
    val vals = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDouble(2)).setScale(4)))
    def lowerMedian(xs: Seq[BigDecimal]): BigDecimal = {
      val s = xs.sorted
      s((s.length + 1) / 2 - 1)
    }
    val got = Stats.q179MadOutliers(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    got.foreach { case (tpe, n, med, mad, nOut) =>
      val g = vals.filter(_._1 == tpe)
      assert(g.length == n)
      val wantMed = lowerMedian(g.map(_._3))
      val devs = g.map(t => (t._3 - wantMed).abs)
      val wantMad = lowerMedian(devs)
      assert(BigDecimal(med).setScale(4) == wantMed, s"$tpe med $med vs $wantMed")
      assert(BigDecimal(mad).setScale(4) == wantMad, s"$tpe mad")
      assert(nOut == devs.count(_ > wantMad * 3), s"$tpe outliers")
    }
  }

  test("q180 assoc rules: supports exact, apriori prune honored, lift formula holds") {
    val items = graft.Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = items.map(_._1).distinct.length
    val supp = items.groupBy(_._2).map { case (k, v) => k -> v.length }
    val baskets = items.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val got = Stats.q180AssocRules(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))
    assert(got.nonEmpty && got.length <= 30)
    got.foreach { case (a, b, pc, ca, cb, conf, lift) =>
      assert(a < b)
      assert(ca >= 5 && cb >= 5, "apriori prune violated")
      assert(supp(a) == ca && supp(b) == cb, s"support mismatch for ($a,$b)")
      val wantPc = baskets.values.count(s => s.contains(a) && s.contains(b))
      assert(wantPc == pc, s"pair count ($a,$b): $pc vs $wantPc")
      assert(math.abs(conf - pc.toDouble / ca) < 1e-6)
      assert(math.abs(lift - pc.toDouble * nOrders / (ca.toDouble * cb)) < 1e-6)
    }
    // descending lift order
    assert(got.map(_._7).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q186 profile: counts, ndv, and modal value match brute force") {
    val cust = graft.Tables(spark, sf0001, "customer").collect()
    val got = Stats.q186ColumnProfile(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    got.values.foreach(r => assert(r.getLong(1) == cust.length && r.getLong(2) == 0L))
    val seg = got("c_mktsegment")
    val segCounts = cust.groupBy(_.getAs[String]("c_mktsegment")).map { case (k, v) => k -> v.length }
    assert(seg.getLong(3) == segCounts.size) // ndv
    val wantMode = segCounts.toSeq.sortBy { case (v, c) => (-c, v) }.head
    assert(seg.getString(8) == wantMode._1 && seg.getLong(9) == wantMode._2)
    // continuous double column: no mode profiled, numeric min/max populated
    val bal = got("c_acctbal")
    assert(bal.isNullAt(8) && bal.isNullAt(9) && !bal.isNullAt(4) && !bal.isNullAt(5))
  }

  test("q193 weighted median: matches a sequential cumulative-weight walk") {
    val rows = graft.Tables(spark, sf0001, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(4),
        BigDecimal(r.getDouble(2)).setScale(4)))
    val got = Stats.q193WeightedMedian(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq === Seq("A", "N", "R"))
    got.foreach { case (flag, wmed, tw) =>
      val g = rows.filter(_._1 == flag).groupBy(_._2).toSeq
        .map { case (p, v) => (p, v.map(_._3).sum) }.sortBy(_._1)
      val total = g.map(_._2).sum
      assert(BigDecimal(tw).setScale(4) === total)
      var cw = BigDecimal(0)
      val want = g.find { case (_, w) => { cw += w; cw * 2 >= total } }.get._1
      assert(BigDecimal(wmed).setScale(4) === want, s"$flag weighted median")
    }
  }

  test("q194 Gini: matches the sorted-rank formula; bounds hold") {
    val rows = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val got = Stats.q194Gini(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (pri, n, gini) =>
      val xs = rows.filter(_._1 == pri).sortBy(t => (t._3, t._2)).map(_._3)
      assert(xs.length == n)
      val sx = xs.sum
      val srx = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val want = srx * 2.0 / (n * sx) - (n + 1.0) / n
      assert(math.abs(gini - want) < 1e-4, s"$pri gini $gini vs $want")
      assert(gini >= 0.0 && gini < 1.0, s"$pri gini out of range")
    }
  }

  test("q205 skew report: histogram stats match brute force; constant column is maximally skewed") {
    val got = Stats.q205SkewReport(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5), r.getDouble(6)))
    assert(got.length === 6)
    val li = graft.Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey")).collect().map(_.getLong(0))
    val hist = li.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val row = got.find(_._1 == "lineitem.l_orderkey").get
    assert(row._2 === hist.size.toLong && row._3 === li.length.toLong)
    assert(row._4 === hist.values.max)
    val wantTop = hist.toSeq.sortBy { case (k, n) => (-n, k) }.head
    assert(row._5 === wantTop._1.toString && row._6 === wantTop._2)
    assert(math.abs(row._7 - hist.values.max.toDouble
      / (li.length.toDouble / hist.size)) < 1e-3)
    // event_type has 5 keys over ~1000 rows: near-uniform, skew_factor ~1;
    // every factor is >= 1 by construction
    got.foreach(r => assert(r._7 >= 1.0, s"${r._1} factor < 1"))
  }

  test("q187 fk audit: clean reference data has zero orphans on every edge") {
    val got = Stats.q187FkAudit(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 7)
    val li = graft.Tables(spark, sf0001, "lineitem").count()
    assert(got.filter(_._1.startsWith("lineitem.")).forall(_._2 == li))
    got.foreach { case (edge, _, orows, okeys) =>
      assert(orows == 0L && okeys == 0L, s"$edge unexpectedly has orphans")
    }
  }

  test("q187 fk audit detects injected orphans (crafted fixture semantics)") {
    // the edge kernel is an anti-join against the parent key set; replay it
    // on crafted frames to pin that orphans are counted by ROW and by KEY
    import spark.implicits._
    val child = Seq((1L, 10L), (2L, 10L), (3L, 99L), (4L, 98L), (5L, 99L))
      .toDF("id", "fk")
    val parent = Seq(10L).toDF("pk")
    val orphans = child.join(broadcast(parent), col("fk") === col("pk"), "left_anti")
    assert(orphans.count() == 3)
    assert(orphans.select(countDistinct(col("fk"))).head().getLong(0) == 2)
  }

  test("q267 seasonality strength: variance decomposition matches an hourly replay; strength in [0,1]") {
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), expr("CAST(ts2 AS LONG) div 3600").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val got = graft.operators.Events.q267SeasonalityStrength(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (t, nHours, varTot, varRes, strength) =>
      val hourly = rows.filter(_._1 == t).groupBy(_._2)
        .map { case (h, v) => (h, v.length.toLong) }.toSeq
      assert(nHours === hourly.size.toLong)
      val c = hourly.size.toDouble
      val s1 = hourly.map(_._2).sum.toDouble
      val s2 = hourly.map(x => x._2 * x._2).sum.toDouble
      val vt = s2 / c - (s1 / c) * (s1 / c)
      val prof = hourly.groupBy(_._1 % 24).map { case (hd, v) =>
        hd -> r6(v.map(_._2).sum.toDouble / v.length) }
      val res = hourly.map { case (h, n) => BigDecimal(n) - prof(h % 24) }
      val rs1 = res.sum.toDouble
      val rs2 = res.map(r0 => r0 * r0).sum.toDouble
      val vr = rs2 / c - (rs1 / c) * (rs1 / c)
      assert(math.abs(varTot - vt) < 2e-5, s"$t var_total")
      assert(math.abs(varRes - vr) < 2e-5, s"$t var_resid")
      assert(math.abs(strength - math.max(0.0, 1.0 - vr / vt)) < 2e-5, s"$t strength")
      assert(strength >= 0.0 && strength <= 1.0)
      assert(varRes <= varTot + 1e-9,
        s"$t conditioning on hour-of-day cannot add variance")
    }
  }

  test("q268 embedding whitening: per-dim moments match an exact-decimal replay") {
    val vecs = graft.Tables(spark, sf0001, "embeddings")
      .select(Similarity.asDouble(col("embedding"))).collect()
      .map(_.getSeq[Double](0).toArray)
    def d8(x: Double) = BigDecimal.valueOf(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val got = Similarity.q268EmbeddingWhitening(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4), r.getBoolean(5)))
    assert(got.length === 64)
    got.foreach { case (dim, n, mean, std, drifted, lowVar) =>
      val xs = vecs.map(v => d8(v(dim.toInt - 1)))
      assert(n === vecs.length.toLong)
      val c = vecs.length.toDouble
      val s1 = xs.sum.toDouble
      val s2 = xs.map(x => x * x).sum.toDouble
      val m = s1 / c
      val v0 = s2 / c - m * m
      assert(math.abs(mean - m) < 2e-6, s"dim $dim mean")
      assert(math.abs(std - math.sqrt(math.max(v0, 0.0))) < 2e-6, s"dim $dim std")
      assert(drifted === (math.abs(r6(m)) > 0.05), s"dim $dim drifted")
      assert(lowVar === (r6(math.sqrt(math.max(v0, 0.0))) < 0.1), s"dim $dim low_var")
    }
  }

  test("q273 join discovery: containments match a set replay; FK edges surface at 1.0") {
    val keyCols = Seq(
      ("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
      ("lineitem", "l_suppkey"), ("orders", "o_orderkey"),
      ("orders", "o_custkey"), ("customer", "c_custkey"),
      ("customer", "c_nationkey"), ("part", "p_partkey"),
      ("supplier", "s_suppkey"), ("nation", "n_nationkey"),
      ("nation", "n_regionkey"), ("region", "r_regionkey"),
      ("documents", "doc_id"), ("embeddings", "vec_id"))
    val sets = keyCols.map { case (t, c) =>
      s"$t.$c" -> graft.Tables(spark, sf0001, t)
        .select(col(c).cast("long")).collect().map(_.getLong(0)).toSet
    }.toMap
    val got = Stats.q273JoinDiscovery(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
    got.foreach { case ((a, b), (na, nb, common, cab, cba)) =>
      assert(a < b)
      val (sa, sb) = (sets(a), sets(b))
      val inter = (sa & sb).size.toLong
      assert(na === sa.size.toLong && nb === sb.size.toLong && common === inter)
      assert(math.abs(cab - inter.toDouble / sa.size) < 2e-6)
      assert(math.abs(cba - inter.toDouble / sb.size) < 2e-6)
      assert(math.max(cab, cba) >= 0.5 - 1e-9)
    }
    // the true FK edges must surface with full containment on the FK side
    val gmap = got.toMap
    def c(a: String, b: String) = gmap(if (a < b) (a, b) else (b, a))
    assert(c("lineitem.l_orderkey", "orders.o_orderkey")._4 >= 0.999 ||
      c("lineitem.l_orderkey", "orders.o_orderkey")._5 >= 0.999)
    assert(c("orders.o_custkey", "customer.c_custkey")._4 >= 0.999 ||
      c("orders.o_custkey", "customer.c_custkey")._5 >= 0.999)
  }

  test("q274 dictionary advisor: byte model matches a replay; flags split by cardinality") {
    val specs = Seq(("lineitem", "l_returnflag"), ("orders", "o_orderpriority"),
      ("customer", "c_mktsegment"), ("customer", "c_name"),
      ("part", "p_brand"), ("part", "p_type"),
      ("documents", "lang"), ("documents", "source"))
    val got = graft.operators.Layout.q274DictionaryAdvisor(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(got.length === specs.length)
    val bySpec = got.map(t => t._1 -> t).toMap
    specs.foreach { case (t, c) =>
      val vals = graft.Tables(spark, sf0001, t)
        .select(col(c)).collect().map(_.getString(0))
      val (_, n, nd, raw, dict, savings, rec) = bySpec(s"$t.$c")
      assert(n === vals.length.toLong)
      assert(nd === vals.distinct.length.toLong)
      assert(raw === vals.map(_.length.toLong).sum)
      val codeBytes = if (vals.distinct.length <= 256) 1L else 2L
      assert(dict === vals.distinct.map(_.length.toLong).sum
        + codeBytes * vals.length)
      assert(savings === raw - dict)
      assert(rec === (savings > 0))
    }
    // low-cardinality WIDE values win; near-unique names and 1-char flags
    // lose (a 1-byte code cannot beat a 1-char value — honest physics)
    assert(bySpec("orders.o_orderpriority")._7 === true)
    assert(bySpec("customer.c_name")._7 === false)
    assert(bySpec("lineitem.l_returnflag")._7 === false)
  }

  test("q266 cramers v: chi-square and effect size match a contingency replay; V in [0,1]") {
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("event_type"),
        expr("pmod(CAST(ts2 AS LONG) div 3600, 24)").as("hr"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val n = rows.length.toDouble
    val cells = rows.groupBy(identity).map { case (k, v) => k -> v.length }
    val nx = rows.groupBy(_._1).map { case (k, v) => k -> v.length }
    val ny = rows.groupBy(_._2).map { case (k, v) => k -> v.length }
    val chi = cells.map { case ((t, h), o) =>
      val e = nx(t).toDouble * ny(h).toDouble / n
      r6((o - e) * (o - e) / e)
    }.foldLeft(BigDecimal(0))(_ + _).doubleValue
    val v = math.sqrt(chi / (n * math.min(nx.size - 1, ny.size - 1)))
    val got = Stats.q266CramersV(spark, sf0001).collect()
    assert(got.length === 1)
    val g = got.head
    assert(g.getLong(0) === rows.length.toLong)
    assert(g.getLong(1) === nx.size.toLong && g.getLong(2) === ny.size.toLong)
    assert(g.getLong(3) === cells.size.toLong)
    assert(math.abs(g.getDouble(4) - chi) < 2e-6)
    assert(math.abs(g.getDouble(5) - v) < 2e-6)
    assert(g.getDouble(5) >= 0.0 && g.getDouble(5) <= 1.0)
  }

  test("q254 k-anonymity: class counts and row risk match a driver replay; generalization monotone") {
    val rows = graft.Tables(spark, sf0001, "customer")
      .join(graft.Tables(spark, sf0001, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_nationkey").cast("long"), col("n_regionkey").cast("long"),
        col("c_mktsegment"), col("c_acctbal").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    def audit(classSizes: Seq[Long], k: Long): (Long, Long, Long, Long) = {
      val below = classSizes.filter(_ < k)
      (classSizes.length.toLong, below.length.toLong, below.sum,
        classSizes.sum)
    }
    val l0 = rows.groupBy(t => (t._1, t._3, math.floor(t._4 / 1000.0)))
      .values.map(_.length.toLong).toSeq
    val l1 = rows.groupBy(t => (t._2, t._3, math.floor(t._4 / 5000.0)))
      .values.map(_.length.toLong).toSeq
    val got = Stats.q254Kanonymity(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    assert(got.size == 6)
    for (k <- Seq(2L, 5L, 10L); (lvl, cls) <- Seq(0L -> l0, 1L -> l1)) {
      val (nc, cb, rb, nr) = audit(cls, k)
      val (gnc, gcb, grb, gnr, grisk) = got((lvl, k))
      assert(gnc == nc && gcb == cb && grb == rb && gnr == nr,
        s"level $lvl k=$k counts")
      assert(math.abs(grisk - rb.toDouble / nr.toDouble) < 2e-6)
    }
    // generalizing (level 0 -> 1) can only merge classes: fewer classes,
    // and at-risk mass never grows for any k
    for (k <- Seq(2L, 5L, 10L)) {
      assert(got((1L, k))._1 <= got((0L, k))._1)
      assert(got((1L, k))._3 <= got((0L, k))._3, s"k=$k risk mass grew under generalization")
    }
  }

  test("q279 theil-sen: slope and intercept match an all-pairs median replay per priority") {
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val rows = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderpriority"), year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), (r.getInt(1) - 1995) * 12L + r.getInt(2) - 1,
        BigDecimal.valueOf(r.getDouble(3))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (prio, g) =>
      val grid = g.groupBy(_._2).map { case (x, xs) =>
        (x, (xs.map(_._3).sum * 100).toLongExact)
      }.toSeq.sortBy(_._1)
      val pairs = for {
        (x1, y1) <- grid; (x2, y2) <- grid if x2 > x1
      } yield (x1, x2, r6((y2 - y1).toDouble / (x2 - x1).toDouble))
      val sorted = pairs.sortBy { case (x1, x2, sl) => (sl, x1, x2) }
      val slope = sorted((sorted.length + 1) / 2 - 1)._3
      val resid = grid.map { case (x, y) => (x, r6(y.toDouble - slope * x)) }
        .sortBy { case (x, r0) => (r0, x) }
      val intercept = resid((resid.length + 1) / 2 - 1)._2
      (prio, grid.length.toLong, sorted.length.toLong, slope, intercept)
    }
    val got = Stats.q279TheilSen(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === want)
    assert(got.forall { case (_, nm, np, _, _) => np == nm * (nm - 1) / 2 },
      "pair count must be n-months choose 2 - the grid collapse regressed")
  }

  test("q282 acf: per-lag pearson matches an exact-moment replay; lag-0 sanity") {
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val epoch = java.time.LocalDate.of(1995, 1, 1).toEpochDay
    val daily = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderdate").cast("date"), col("o_totalprice"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay - epoch,
        BigDecimal.valueOf(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (x, xs) => x -> xs.map(_._2).sum }
    val want = (1L to 7L).map { lag =>
      val ps = daily.toSeq.flatMap { case (x, rx) =>
        daily.get(x + lag).map(ry => (rx, ry))
      }
      val n = ps.length.toDouble
      val sx = ps.map(_._1).sum.toDouble
      val sy = ps.map(_._2).sum.toDouble
      val sxx = ps.map(p => p._1 * p._1).sum.toDouble
      val syy = ps.map(p => p._2 * p._2).sum.toDouble
      val sxy = ps.map(p => p._1 * p._2).sum.toDouble
      (lag, ps.length.toLong,
        r6((n * sxy - sx * sy)
          / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))))
    }
    val got = Stats.q282Acf(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === want)
    assert(got.forall { case (_, n, a) => n > 0 && a >= -1.0 && a <= 1.0 })
  }

  test("q281 diff-in-diff: cell means and the estimate match a four-cell replay") {
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val rows = graft.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts2"), col("value"))
      .collect()
      .map(r => (r.getLong(0) % 2 == 0, !r.getTimestamp(1).before(cut),
        BigDecimal.valueOf(r.getDouble(2))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)))
    def cell(t: Boolean, p: Boolean) = {
      val xs = rows.filter(r => r._1 == t && r._2 == p)
      (xs.length.toLong, r6(xs.map(_._3).sum.toDouble / xs.length))
    }
    val (nPreT, mPreT) = cell(t = true, p = false)
    val (nPostT, mPostT) = cell(t = true, p = true)
    val (nPreC, mPreC) = cell(t = false, p = false)
    val (nPostC, mPostC) = cell(t = false, p = true)
    val got = Stats.q281DiffInDiff(spark, sf0001).collect()
    assert(got.length === 1)
    val g = got.head
    assert(g.getLong(0) === nPreT && g.getLong(2) === nPostT
      && g.getLong(4) === nPreC && g.getLong(6) === nPostC)
    assert(g.getDouble(1) === mPreT && g.getDouble(3) === mPostT
      && g.getDouble(5) === mPreC && g.getDouble(7) === mPostC)
    assert(g.getDouble(8) === r6((mPostT - mPreT) - (mPostC - mPreC)))
    // all four cells populated - the estimate is non-vacuous
    assert(nPreT > 0 && nPostT > 0 && nPreC > 0 && nPostC > 0)
  }

  private def r6(x: Double): Double = BigDecimal.valueOf(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue

  test("q289 deciles: NTILE split, ranges, and shares match a sorted replay") {
    val spend = graft.Tables(spark, sf0001, "orders")
      .select(col("o_custkey"), col("o_totalprice").cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1)
      .map { case (ck, g) =>
        ck -> g.map(t => BigDecimal.valueOf(t._2)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      }
    val seg = graft.Tables(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val got = Stats.q289NtileDeciles(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    val bySeg = spend.toSeq.map { case (ck, sp) => (seg(ck), ck, sp) }
      .groupBy(_._1)
    assert(bySeg.keySet === got.keysIterator.map(_._1).toSet)
    bySeg.foreach { case (sg, members) =>
      val sorted = members.sortBy(t => (t._3, t._2)).toIndexedSeq
      val n = sorted.length
      val q = n / 10; val rmd = n % 10
      var pos = 0
      val segTotal = sorted.map(_._3).sum
      for (b <- 1 to 10) {
        val sz = if (b <= rmd) q + 1 else q
        val bucket = sorted.slice(pos, pos + sz); pos += sz
        if (sz > 0) {
          val (gn, gmin, gmax, gtot, gshare) = got((sg, b.toLong))
          assert(gn === sz.toLong, s"$sg decile $b size")
          assert(gmin === bucket.head._3.toDouble && gmax === bucket.last._3.toDouble,
            s"$sg decile $b range")
          val tot = bucket.map(_._3).sum
          assert(gtot === tot.toDouble, s"$sg decile $b total")
          assert(math.abs(gshare - r6(tot.toDouble / segTotal.toDouble)) < 2e-6,
            s"$sg decile $b share")
        }
      }
    }
  }

  test("q291 cuped: theta/variances match a per-user replay; reduction equals 100*corr^2") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts2").cast("long"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val lo = ev.map(_._2).min; val hi = ev.map(_._2).max
    val split = Math.floorDiv(lo + hi, 2L)
    def d4(x: Double) = BigDecimal.valueOf(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val per = ev.groupBy(_._1).map { case (_, g) =>
      (g.filter(_._2 < split).map(t => d4(t._3)).sum.toDouble,
        g.filter(_._2 >= split).map(t => d4(t._3)).sum.toDouble)
    }.toSeq
    val n = per.length.toDouble
    val sx = per.map(_._1).sum; val sy = per.map(_._2).sum
    val sxx = per.map(t => t._1 * t._1).sum
    val syy = per.map(t => t._2 * t._2).sum
    val sxy = per.map(t => t._1 * t._2).sum
    val varX = sxx / n - (sx / n) * (sx / n)
    val varY = syy / n - (sy / n) * (sy / n)
    val cov = sxy / n - (sx / n) * (sy / n)
    val g = Stats.q291Cuped(spark, sf0001).collect().head
    assert(g.getLong(0) === per.length.toLong)
    assert(math.abs(g.getDouble(1) - cov / varX) < 1e-4, "theta")
    assert(math.abs(g.getDouble(2) - varY) < 1e-3, "var_y")
    assert(math.abs(g.getDouble(3) - (varY - cov * cov / varX)) < 1e-3, "var_y_adj")
    val corr2 = cov * cov / (varX * varY)
    assert(math.abs(g.getDouble(4) - 100.0 * corr2) < 1e-2, "reduction = 100*corr^2")
    // the adjustment never increases variance, and the identity links the columns
    assert(g.getDouble(3) <= g.getDouble(2) + 1e-9)
    assert(corr2 > 0.0, "zero correlation - vacuous fixture")
  }

  test("q310 burstiness: moments replay; Poisson-like traffic sits near fano 1") {
    val hours = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), (col("ts2").cast("long") / 3600).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = graft.operators.Events.queries("q310_burstiness")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.nonEmpty)
    got.foreach { case (ty, nh, mean, fano, cv, b) =>
      val cs = hours.filter(_._1 == ty).groupBy(_._2).map(_._2.length.toLong).toSeq
      assert(nh === cs.length.toLong, s"$ty hour count")
      val m = cs.sum.toDouble / cs.length
      val v = cs.map(c => c.toDouble * c).sum / cs.length - m * m
      assert(math.abs(mean - m) < 1e-4, s"$ty mean")
      assert(math.abs(fano - v / m) < 1e-4, s"$ty fano")
      assert(math.abs(cv - math.sqrt(v) / m) < 1e-4, s"$ty cv")
      assert(math.abs(b - (math.sqrt(v) - m) / (math.sqrt(v) + m)) < 1e-4, s"$ty burstiness")
      assert(b >= -1.0 && b <= 1.0)
    }
  }

  test("q311 join cardinality: estimates and truth replay from key counts") {
    val counts = graft.Tables(spark, sf0001, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = counts.map(_._2).sum; val dk = counts.length.toLong
    val actual = counts.map(t => t._2 * t._2).sum
    val top = counts.sortBy(t => (-t._2, t._1)).take(100)
    val (topn, topk, topsq) = (top.map(_._2).sum, top.length.toLong,
      top.map(t => t._2 * t._2).sum)
    val estU = n.toDouble * n / dk
    val estH = topsq.toDouble +
      (n - topn).toDouble * (n - topn) / (dk - topk)
    val gotMap = Stats.q311JoinCardEstimate(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(gotMap.keySet === Set("uniform", "heavy_hitter"))
    // heavy-hitter must dominate uniform on a skewed key (or at worst tie)
    val (hu, hh) = (gotMap("uniform"), gotMap("heavy_hitter"))
    assert(hu._2 === actual && hh._2 === actual)
    assert(math.abs(hu._1 - estU) < 1.0 && math.abs(hh._1 - estH) < 1.0)
    assert(math.abs(hu._3 - (estU - actual) / actual) < 1e-4)
    assert(math.abs(hh._3 - (estH - actual) / actual) < 1e-4)
    assert(math.abs(hh._3) <= math.abs(hu._3) + 1e-9,
      "heavy-hitter estimator must not be worse than uniform here")
  }

  test("q312 quantile normalization: decile picks replay; source deciles shift against pooled") {
    val rows = graft.Tables(spark, sf0001, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def deciles(vs: Seq[Long]): Map[Long, Long] = {
      val sorted = vs.sorted; val n = sorted.length.toLong
      (1L to 9L).map { d =>
        // smallest value whose cumulative count reaches d*n/10
        val idx = sorted.indices.find(i => (i + 1).toLong * 10L >= d * n).get
        d -> sorted(idx)
      }.toMap
    }
    val pooled = deciles(rows.map(_._2).toSeq)
    val got = Stats.q312QuantileNormalization(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val sources = rows.map(_._1).distinct.sorted
    assert(got.size === sources.length * 9)
    sources.foreach { src =>
      val ds = deciles(rows.filter(_._1 == src).map(_._2).toSeq)
      (1L to 9L).foreach { d =>
        val (sv, pv, sh) = got((src, d))
        assert(sv === ds(d), s"$src d$d source decile")
        assert(pv === pooled(d), s"$src d$d pooled decile")
        assert(sh === sv - pv, s"$src d$d shift")
      }
    }
    assert(got.values.exists(_._3 != 0L),
      "every source matches pooled exactly - vacuous normalization fixture")
  }

  test("q313 conformal: q-hat replays from the calibration ranks and coverage lands near 90%") {
    val p = 2147483647L
    def bucket(id: Long): Long = ((id % p) * 48271 % p + 1) * 16807 % p % 10000
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def d4(x: Double) = BigDecimal.valueOf(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val got = Stats.q313ConformalInterval(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6)))
    assert(got.nonEmpty)
    got.foreach { case (ty, ncal, neval, mu, qhat, ncov, cov) =>
      val g = ev.filter(_._1 == ty)
      val fit = g.filter(t => bucket(t._2) < 3333)
      val cal = g.filter(t => { val b = bucket(t._2); b >= 3333 && b < 6666 })
      val ee = g.filter(t => bucket(t._2) >= 6666)
      val wantMu = fit.map(t => d4(t._3)).sum.toDouble / fit.length
      assert(ncal === cal.length.toLong && neval === ee.length.toLong, s"$ty split sizes")
      assert(math.abs(mu - wantMu) < 1e-4, s"$ty mu")
      val ranked = cal.map(t => (math.abs(t._3 - wantMu), t._2)).sorted
      val target = math.min((9 * (cal.length + 1) + 9) / 10, cal.length)
      val wantQ = ranked(target - 1)._1
      assert(math.abs(qhat - wantQ) < 1e-4, s"$ty qhat")
      val covered = ee.count(t => math.abs(t._3 - wantMu) <= wantQ)
      assert(ncov === covered.toLong, s"$ty covered")
      assert(math.abs(cov - covered.toDouble / ee.length) < 2e-6, s"$ty coverage")
      assert(cov > 0.7 && cov <= 1.0, s"$ty coverage $cov implausibly far from nominal 90%")
    }
  }

  test("q296 isotonic: minimax replay matches, output is monotone, pooled mean preserved") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("value"),
        when(col("event_type") === "purchase", 1L).otherwise(0L))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val lo = ev.map(_._1).min; val hi = ev.map(_._1).max
    val binned = ev.groupBy { case (v, _) =>
      math.min(19L, math.floor((v - lo) / (hi - lo) * 20.0).toLong)
    }.map { case (b, g) => (b, g.length.toLong, g.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val n = binned.map(_._2); val k = binned.map(_._3)
    val cn = n.scanLeft(0L)(_ + _); val ck = k.scanLeft(0L)(_ + _)
    val m = binned.length
    def avg(j: Int, l: Int): Double = // bins j..l inclusive, 0-based
      (ck(l + 1) - ck(j)).toDouble / (cn(l + 1) - cn(j)).toDouble
    val iso = (0 until m).map { i =>
      (0 to i).map { j => (i until m).map(l => avg(j, l)).min }.max
    }
    val got = Stats.q296IsotonicCalibration(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.map(_._1).toSeq === binned.map(_._1))
    got.zipWithIndex.foreach { case ((b, gn, gk, raw, gi), i) =>
      assert(gn === binned(i)._2 && gk === binned(i)._3, s"bin $b counts")
      assert(math.abs(raw - k(i).toDouble / n(i)) < 2e-6, s"bin $b raw rate")
      assert(math.abs(gi - iso(i)) < 2e-6, s"bin $b iso")
    }
    // PAV properties: monotone non-decreasing, pooled mean preserved
    got.map(_._5).sliding(2).foreach { case Array(a, b) =>
      assert(a <= b + 1e-9, "iso output must be monotone") }
    val pooled = k.sum.toDouble / n.sum
    val isoMean = got.map(t => t._5 * t._2).sum / n.sum
    assert(math.abs(isoMean - pooled) < 1e-4, "PAV preserves the pooled mean")
    assert(got.map(_._4).sliding(2).exists { case Array(a, b) => a > b },
      "raw rates already monotone - vacuous PAV fixture")
  }

  test("q297 ks: integer statistic and argmax location match a merged-cdf replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val types = ev.map(_._1).distinct.sorted
    val got = Stats.q297KsPairwise(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    val wantPairs = for {
      (a, i) <- types.zipWithIndex; b <- types.drop(i + 1)
    } yield (a, b)
    assert(got.keySet === wantPairs.toSet)
    wantPairs.foreach { case (a, b) =>
      val va = ev.filter(_._1 == a).map(_._2).sorted
      val vb = ev.filter(_._1 == b).map(_._2).sorted
      val (na, nb) = (va.length.toLong, vb.length.toLong)
      val values = (va ++ vb).distinct.sorted
      var best = -1L; var bestAt = Double.NaN
      values.foreach { x =>
        val fa = va.count(_ <= x).toLong; val fb = vb.count(_ <= x).toLong
        val num = math.abs(fa * nb - fb * na)
        if (num > best) { best = num; bestAt = x }
      }
      val (gna, gnb, gd, gat) = got((a, b))
      assert(gna === na && gnb === nb, s"($a,$b) sizes")
      assert(math.abs(gd - best.toDouble / (na * nb)) < 2e-6, s"($a,$b) D")
      assert(gat === bestAt, s"($a,$b) argmax location")
      assert(best > 0, s"($a,$b) zero D - vacuous")
    }
  }

  test("q292 simpsons: per-scope r matches replay and flip flags compare against the pooled row") {
    val rows = graft.Tables(spark, sf0001, "lineitem")
      .select(col("l_returnflag"), col("l_discount").cast("double"),
        col("l_quantity").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def corr(g: Seq[(Double, Double)]): Double = {
      val n = g.length.toDouble
      val sx = g.map(_._1).sum; val sy = g.map(_._2).sum
      val sxx = g.map(t => t._1 * t._1).sum
      val syy = g.map(t => t._2 * t._2).sum
      val sxy = g.map(t => t._1 * t._2).sum
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val all = corr(rows.map(t => (t._2, t._3)).toSeq)
    val got = Stats.q292SimpsonsParadox(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4)))
    val gAll = got.find(_._1 == "ALL").get
    assert(gAll._2 === rows.length.toLong)
    assert(math.abs(gAll._3 - all) < 1e-4)
    assert(!gAll._5, "ALL row must not be flagged")
    got.filter(_._1 != "ALL").foreach { case (scope, n, r, rAll, flipped) =>
      val g = rows.filter(_._1 == scope)
      assert(n === g.length.toLong)
      assert(math.abs(r - corr(g.map(t => (t._2, t._3)).toSeq)) < 1e-4, scope)
      assert(rAll === gAll._3, s"$scope carries the pooled r")
      assert(flipped === ((r > 0) != (rAll > 0)), s"$scope flip flag")
    }
  }

  test("q318 l-diversity: per-class distinct-sensitive counts match a replay; risk monotone in l") {
    val rows = graft.Tables(spark, sf0001, "customer")
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        col("c_acctbal").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val classes = rows.groupBy(t => (t._1, math.floor(t._3 / 1000.0)))
      .values.map(g => (g.length.toLong, g.map(_._2).distinct.length.toLong))
      .toSeq
    val got = Stats.q318Ldiversity(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.map(_._1).toSeq === Seq(2L, 3L, 5L))
    got.foreach { case (lReq, nCls, clsBelow, rowsBelow, nRows, risk) =>
      val below = classes.filter(_._2 < lReq)
      assert(nCls === classes.length.toLong, s"l=$lReq classes")
      assert(clsBelow === below.length.toLong, s"l=$lReq below")
      assert(rowsBelow === below.map(_._1).sum, s"l=$lReq rows below")
      assert(nRows === rows.length.toLong)
      assert(math.abs(risk - below.map(_._1).sum.toDouble / rows.length) < 1e-6)
    }
    // tightening l can only grow the failing set
    assert(got.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    assert(got.last._3 > got.head._3,
      "l=2 and l=5 audits identical — vacuous fixture")
  }

  test("q319 FD discovery: g3 and hold verdicts match brute-force per-pair replays") {
    val pairs = Seq(
      ("part", "p_brand", "p_type"), ("part", "p_name", "p_brand"),
      ("part", "p_partkey", "p_name"), ("part", "p_type", "p_size"),
      ("orders", "o_orderkey", "o_orderstatus"),
      ("orders", "o_custkey", "o_orderpriority"))
    val got = Stats.q319FdDiscovery(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6),
          r.getLong(7), r.getDouble(8)))).toMap
    assert(got.keySet === pairs.map(p => (p._1, p._2, p._3)).toSet)
    pairs.foreach { case (t, a, b) =>
      val rows = graft.Tables(spark, sf0001, t)
        .select(col(a).cast("string"), col(b).cast("string")).collect()
        .map(r => (r.getString(0), r.getString(1))).filter(_._1 != null)
      val byA = rows.groupBy(_._1)
      val n = rows.length.toLong
      val na = byA.size.toLong
      val nab = rows.distinct.length.toLong
      val g3 = byA.values.map { g =>
        g.length.toLong - g.groupBy(_._2).values.map(_.length).max
      }.sum
      val (gn, gna, gnab, gHolds, gG3, gConf) = got((t, a, b))
      assert(gn === n && gna === na && gnab === nab, s"$a->$b counts")
      assert(gHolds === (na == nab), s"$a->$b holds")
      assert(gG3 === g3, s"$a->$b g3")
      assert(math.abs(gConf - (n - g3).toDouble / n) < 1e-6, s"$a->$b confidence")
    }
    assert(got.values.exists(_._4) && got.values.exists(!_._4),
      "all FDs hold or all fail — vacuous candidate set")
  }

  private def minstdBucket(id: Long): Long = {
    val p = 2147483647L
    val h1 = ((id % p) * 48271L) % p
    ((h1 + 1L) * 16807L) % p % 10000L
  }

  test("q323 SRM: both designs' chi-squares match the exact integer identities") {
    val bks = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderkey")).collect().map(r => minstdBucket(r.getLong(0)))
    val n = bks.length.toLong
    val even = bks.count(_ % 2 == 0).toLong
    val bg = bks.count(_ < 9000).toLong
    val got = Stats.q323Srm(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(got.map(_._1).toSeq === Seq("50/50", "90/10"))
    val Seq(g50, g90) = got.toSeq
    assert(g50._2 === n && g50._3 === even && g50._4 === n - even)
    val chi50 = ((even - (n - even)) * (even - (n - even))).toDouble / n
    assert(math.abs(g50._6 - chi50) < 1e-6)
    assert(g50._7 === (g50._6 > 3.841))
    assert(g90._2 === n && g90._3 === bg && g90._4 === n - bg)
    val d = 10 * bg - 9 * n
    assert(math.abs(g90._6 - d.toDouble * d / (9 * n)) < 1e-6)
    assert(g90._7 === (g90._6 > 3.841))
    // the identity reduction is right: d^2/(9n) == sum (obs-exp)^2/exp
    val full = math.pow(bg - 0.9 * n, 2) / (0.9 * n) +
      math.pow((n - bg) - 0.1 * n, 2) / (0.1 * n)
    assert(math.abs(g90._6 - full) < 1e-4, "90/10 reduction diverged")
  }

  test("q324 pinball: rank picks and losses match a sorted replay; coverage near nominal") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val got = Stats.q324Pinball(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(got.keySet === ev.map(_._1).distinct.toSet)
    ev.groupBy(_._1).foreach { case (t, g) =>
      val fit = g.filter(x => minstdBucket(x._2) < 5000)
        .sortBy(x => (x._3, x._2))
      val eval = g.filter(x => minstdBucket(x._2) >= 5000)
      val nf = fit.length.toLong
      def pick(qn: Long): Double =
        fit(((math.min((qn * (nf + 1) + 9) / 10, nf)) - 1).toInt)._3
      val (q50, q90) = (pick(5), pick(9))
      val (gnf, gne, gq50, gq90, gl50, gl90, gcov) = got(t)
      assert(gnf === nf && gne === eval.length.toLong, s"$t sizes")
      assert(gq50 === q50 && gq90 === q90, s"$t quantile picks")
      def pinball(qn: Long, qh: Double): Double = {
        val cents = eval.map { x =>
          val yd = BigDecimal(x._3).setScale(4)
          val hd = BigDecimal(qh).setScale(4)
          if (yd >= hd) qn * (yd - hd) else (10 - qn) * (hd - yd)
        }.sum
        (cents.toDouble / 10.0) / eval.length
      }
      assert(math.abs(gl50 - pinball(5, q50)) < 2e-6, s"$t loss50")
      assert(math.abs(gl90 - pinball(9, q90)) < 2e-6, s"$t loss90")
      val cov = eval.count(_._3 <= q90).toDouble / eval.length
      assert(math.abs(gcov - cov) < 1e-6, s"$t coverage")
      assert(cov > 0.8 && cov < 1.0, s"$t coverage $cov not near nominal 0.9")
      assert(gl90 > 0 && gl50 > 0, s"$t zero loss — degenerate")
    }
  }

  test("q325 disparate impact: rates, ratios and 4/5 flags match a replay") {
    val urgent = graft.Tables(spark, sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val cust = graft.Tables(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val per = cust.groupBy(_._2).map { case (seg, g) =>
      (seg, g.length.toLong, g.count(c => urgent(c._1)).toLong)
    }.toSeq
    val rates = per.map { case (seg, n, np) => (seg, n, np, np.toDouble / n) }
    val mx = rates.map(_._4).max
    val got = Stats.q325DisparateImpact(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    assert(got.map(_._1) === rates.map(_._1).sorted)
    got.foreach { case (seg, n, np, rate, di, flag) =>
      val w = rates.find(_._1 == seg).get
      assert(n === w._2 && np === w._3, s"$seg counts")
      assert(math.abs(rate - w._4) < 1e-6, s"$seg rate")
      val wantDi = BigDecimal(w._4 / mx).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(di === wantDi, s"$seg ratio")
      assert(flag === (di < 0.8), s"$seg flag")
    }
    assert(got.exists(_._5 == 1.0), "no reference segment at ratio 1.0")
  }

  test("q327 ATT matching: picks equal a brute-force nearest-control replay") {
    val items = graft.Tables(spark, sf0001, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ord = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .map { r =>
        val cents = (BigDecimal(r.getDouble(2)).setScale(4) * 100).toLongExact
        (r.getLong(0), r.getString(1), cents)
      }
      .filter(t => items.contains(t._1))
    val treated = ord.filter(_._2 == "1-URGENT")
    val control = ord.filter(_._2 != "1-URGENT")
    var matched = 0L; var dsum = 0L; var gapsum = 0L
    treated.foreach { case (tid, _, tc) =>
      val cands = control.filter(c => math.abs(c._3 - tc) <= 10000L)
      if (cands.nonEmpty) {
        val (cid, _, cc) = cands.minBy(c => (math.abs(c._3 - tc), c._3, c._1))
        matched += 1
        dsum += items(tid) - items(cid)
        gapsum += math.abs(cc - tc)
      }
    }
    val r = Stats.q327AttMatching(spark, sf0001).head()
    assert(r.getLong(0) === treated.length.toLong, "n_treated")
    assert(r.getLong(1) === matched, "n_matched")
    assert(math.abs(r.getDouble(2) - matched.toDouble / treated.length) < 1e-6)
    assert(math.abs(r.getDouble(3) - dsum.toDouble / matched) < 1e-6, "att")
    assert(math.abs(r.getDouble(4) - gapsum.toDouble / matched / 100.0) < 1e-6)
    assert(matched > 0, "no match inside the caliper — vacuous")
    assert(dsum != 0L, "treated and matched line counts identical — effect vacuous")
  }

  test("q328 jackknife: ratio, replicates and CI match a per-user replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(4)))
    val per = ev.groupBy(_._1).map { case (_, g) =>
      (g.filter(_._2 == "purchase").map(_._3).sum, g.length.toLong)
    }.toSeq
    val yy = per.map(_._1).sum
    val xx = per.map(_._2).sum
    val n = per.length
    val reps = per.map { case (yu, xu) =>
      BigDecimal((yy - yu).toDouble / (xx - xu))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val s1 = reps.sum.toDouble
    val s2 = reps.map(r => (r * r).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    val varJ = (s2 - s1 * s1 / n) * (n - 1.0) / n
    val ratio = yy.toDouble / xx
    val r = Stats.q328JackknifeRatio(spark, sf0001).head()
    assert(r.getLong(0) === n.toLong && r.getLong(1) === xx)
    assert(math.abs(r.getDouble(2) - ratio) < 1e-6, "ratio")
    assert(math.abs(r.getDouble(3) - math.sqrt(varJ)) < 1e-5, "se")
    assert(math.abs(r.getDouble(4) - (ratio - 1.96 * math.sqrt(varJ))) < 1e-4)
    assert(math.abs(r.getDouble(5) - (ratio + 1.96 * math.sqrt(varJ))) < 1e-4)
    assert(r.getDouble(3) > 0, "zero jackknife variance — vacuous")
    assert(r.getDouble(4) < r.getDouble(2) && r.getDouble(2) < r.getDouble(5))
  }

  test("q331 two-proportion z: statistics match a replay and agree with q325's rates") {
    val urgent = graft.Tables(spark, sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val cust = graft.Tables(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val per = cust.groupBy(_._2).map { case (seg, g) =>
      (seg, g.length.toLong, g.count(c => urgent(c._1)).toLong)
    }
    val nt = per.map(_._2).sum
    val npt = per.map(_._3).sum
    val got = Stats.q331TwoProportionZ(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(got.map(_._1).toSeq === per.map(_._1).toSeq.sorted)
    got.foreach { case (seg, n, np, rate, rest, z, sig) =>
      val w = per.find(_._1 == seg).get
      assert(n === w._2 && np === w._3, s"$seg counts")
      val p1 = np.toDouble / n
      val p2 = (npt - np).toDouble / (nt - n)
      val pp = npt.toDouble / nt
      val se = math.sqrt(pp * (1.0 - pp) * (1.0 / n + 1.0 / (nt - n)))
      assert(math.abs(rate - p1) < 1e-6 && math.abs(rest - p2) < 1e-6, seg)
      assert(math.abs(z - (p1 - p2) / se) < 1e-5, s"$seg z")
      assert(sig === (math.abs(z) > 1.96), s"$seg flag")
    }
    assert(got.exists(g => g._6 != 0.0), "all z exactly zero — vacuous")
  }

  test("q332 k-fold CV: complement means, fold MAEs and the summary row match a replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), minstdBucket(r.getLong(1)) / 2000L,
        r.getDouble(2)))
    val byType = ev.groupBy(_._1)
    val maes = (0L until 5L).map { f =>
      val evalRows = ev.filter(_._2 == f)
      val aes = evalRows.map { case (t, _, y) =>
        val train = byType(t).filter(_._2 != f)
        val mu = train.map(x => BigDecimal(x._3).setScale(4)).sum.toDouble /
          train.length
        BigDecimal(math.abs(y - mu)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      (f, evalRows.length.toLong,
        BigDecimal(aes.sum.toDouble / evalRows.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Stats.q332KfoldCv(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) null else Double.box(r.getDouble(3))))
    assert(got.map(_._1).toSeq === (-1L +: (0L until 5L)).sorted)
    maes.foreach { case (f, n, mae) =>
      val g = got.find(_._1 == f).get
      assert(g._2 === n, s"fold $f size")
      assert(math.abs(g._3 - mae) < 2e-6, s"fold $f mae")
      assert(g._4 === null, s"fold $f must carry NULL sd")
    }
    val overall = got.find(_._1 == -1L).get
    val ms = maes.map(_._3)
    val mean = ms.sum / 5
    val sd = math.sqrt(ms.map(m => (m - mean) * (m - mean)).sum / 4)
    assert(overall._2 === maes.map(_._2).sum)
    assert(math.abs(overall._3 - mean) < 2e-6, "cv mean")
    assert(math.abs(overall._4.asInstanceOf[Double] - sd) < 1e-4, "cv sd")
    assert(ms.max > ms.min, "all folds identical — vacuous split")
  }

  test("q333 PSI: smoothed contributions and the total match a replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(graft.Dsl.epochSec(col("ts2")), col("value")).collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(4)))
    val mid = (ev.map(_._1).min + ev.map(_._1).max) / 2
    val bins = ev.groupBy(t => math.min(9L, ((t._2 * 100).toBigInt / 3300).toLong))
    val tb = ev.count(_._1 < mid).toLong
    val tc = ev.length - tb
    val got = Stats.q333Psi(spark, sf0001).collect()
    val rows = got.filter(_.getLong(0) >= 0)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    var psi6 = BigDecimal(0)
    rows.foreach { case (bin, nb, nc, contrib) =>
      val g = bins(bin)
      val wb = g.count(_._1 < mid).toLong
      val wc = g.length - wb
      assert(nb === wb && nc === wc, s"bin $bin counts")
      val p = (wb + 1).toDouble / (tb + 10)
      val q = (wc + 1).toDouble / (tc + 10)
      val want = BigDecimal((p - q) * math.log(p / q))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(math.abs(contrib - want.toDouble) < 2e-6, s"bin $bin contribution")
      psi6 += want
    }
    val totalRow = got.find(_.getLong(0) == -1L).get
    assert(totalRow.getLong(1) === tb && totalRow.getLong(2) === tc)
    assert(math.abs(totalRow.getDouble(6) - psi6.toDouble) < 2e-6, "psi total")
    assert(rows.exists(_._4 != 0.0), "zero drift everywhere — vacuous")
  }

  test("q334 Cohen's d: pooled-SD effect sizes match an exact-moment replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(4)))
    val mom = ev.groupBy(_._1).map { case (t, g) =>
      val sy = g.map(_._2).sum.toDouble
      val syy = g.map(x => x._2 * x._2).sum.toDouble
      (t, g.length.toLong, sy, syy)
    }.toSeq.sortBy(_._1)
    val got = Stats.q334CohensD(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    val pairs = for {
      (a, i) <- mom.zipWithIndex; b <- mom.drop(i + 1)
    } yield (a, b)
    assert(got.keySet === pairs.map(p => (p._1._1, p._2._1)).toSet)
    pairs.foreach { case ((ta, na, sya, syya), (tbn, nb, syb, syyb)) =>
      val (gna, gnb, gma, gmb, gd) = got((ta, tbn))
      assert(gna === na && gnb === nb)
      val (ma, mb) = (sya / na, syb / nb)
      val va = (syya - sya * sya / na) / (na - 1.0)
      val vb = (syyb - syb * syb / nb) / (nb - 1.0)
      val sp = math.sqrt(((na - 1.0) * va + (nb - 1.0) * vb) / (na + nb - 2.0))
      assert(math.abs(gma - ma) < 1e-6 && math.abs(gmb - mb) < 1e-6)
      assert(math.abs(gd - (ma - mb) / sp) < 1e-5, s"($ta,$tbn) d")
    }
    assert(got.values.exists(v => math.abs(v._5) > 0.01),
      "every effect negligible — vacuous")
  }

  test("q340 stratified ATE: per-stratum weighting matches a replay and de-confounds vs naive") {
    val items = graft.Tables(spark, sf0001, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ord = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .flatMap { r =>
        items.get(r.getLong(0)).map { y =>
          val cents = (BigDecimal(r.getDouble(2)).setScale(4) * 100).toLongExact
          (r.getString(1) == "1-URGENT", cents / 50000, y)
        }
      }
    val strata = ord.groupBy(_._2)
    val used = strata.filter { case (_, g) =>
      val nt = g.count(_._1); nt > 0 && nt < g.length
    }
    val nu = used.values.map(_.length.toLong).sum
    var ate6 = BigDecimal(0)
    used.values.foreach { g =>
      val t = g.filter(_._1); val c = g.filterNot(_._1)
      val term = g.length.toDouble / nu *
        (t.map(_._3).sum.toDouble / t.length - c.map(_._3).sum.toDouble / c.length)
      ate6 += BigDecimal(term).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val nt = ord.count(_._1).toLong
    val naive = ord.filter(_._1).map(_._3).sum.toDouble / nt -
      ord.filterNot(_._1).map(_._3).sum.toDouble / (ord.length - nt)
    val r = Stats.q340StratifiedAte(spark, sf0001).head()
    assert(r.getLong(0) === ord.length.toLong && r.getLong(1) === nt)
    assert(math.abs(r.getDouble(2) - naive) < 1e-6, "naive")
    assert(r.getLong(3) === strata.size.toLong)
    assert(r.getLong(4) === used.size.toLong)
    assert(math.abs(r.getDouble(5) - nu.toDouble / ord.length) < 1e-6)
    assert(math.abs(r.getDouble(6) - ate6.toDouble) < 2e-6, "ate")
    assert(used.nonEmpty && used.size < strata.size,
      "every stratum two-armed or none — coverage accounting vacuous")
  }

  test("q341 group sequential: cumulative looks replay; null experiment never crosses OBF") {
    val items = graft.Tables(spark, sf0001, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ord = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"),
        col("o_orderdate").cast("timestamp").cast("long")).collect()
      .flatMap { r =>
        items.get(r.getLong(0)).map { ly =>
          (r.getLong(0), r.getLong(1), ly >= 4)
        }
      }
    val t0 = ord.map(_._2).min; val t1 = ord.map(_._2).max
    val looks = ord.map { case (k, t, y) =>
      (math.min(4L, 5 * (t - t0) / (t1 - t0 + 1)),
        minstdBucket(k) % 2 == 0, y)
    }
    val got = Stats.q341GroupSequential(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7)))
    assert(got.map(_._1).toSeq === (1L to 5L))
    got.foreach { case (k, na, nb, ca, cb, z, bd, crossed) =>
      val upto = looks.filter(_._1 < k)
      assert(na === upto.count(_._2).toLong, s"look $k na")
      assert(nb === upto.count(!_._2).toLong, s"look $k nb")
      assert(ca === upto.count(t => t._2 && t._3).toLong, s"look $k ca")
      assert(cb === upto.count(t => !t._2 && t._3).toLong, s"look $k cb")
      val p1 = ca.toDouble / na; val p2 = cb.toDouble / nb
      val pp = (ca + cb).toDouble / (na + nb)
      val se = math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
      assert(math.abs(z - (p1 - p2) / se) < 1e-5, s"look $k z")
      assert(math.abs(bd - 2.04 * math.sqrt(5.0 / k)) < 1e-6, s"look $k boundary")
      assert(crossed === (math.abs(z) > bd), s"look $k crossing")
      assert(!crossed,
        s"look $k false-stopped a null experiment — boundary arithmetic wrong")
    }
    assert(got.map(_._2).toSeq === got.map(_._2).toSeq.sorted,
      "cumulative arm sizes must be non-decreasing")
  }

  test("q342 mann-kendall: S, tie-corrected variance and z match a pairwise replay") {
    val hourly = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), expr("CAST(ts2 AS LONG) div 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = Stats.q342MannKendall(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))).toMap
    hourly.groupBy(_._1).foreach { case (t, g) =>
      val pts = g.sortBy(_._2).map(_._3)
      val n = pts.length.toLong
      var s = 0L
      for (i <- pts.indices; j <- i + 1 until pts.length)
        s += java.lang.Long.signum(pts(j) - pts(i))
      val tsum = pts.groupBy(identity).values
        .map { v => val tl = v.length.toLong; tl * (tl - 1) * (2 * tl + 5) }.sum
      val varS = (n * (n - 1) * (2 * n + 5) - tsum).toDouble / 18.0
      val z = if (s > 0) (s - 1) / math.sqrt(varS)
        else if (s < 0) (s + 1) / math.sqrt(varS) else 0.0
      val (gn, gs, gv, gz, gt) = got(t)
      assert(gn === n && gs === s, s"$t n/S")
      assert(math.abs(gv - varS) < 1e-4, s"$t var")
      assert(math.abs(gz - z) < 1e-5, s"$t z")
      assert(gt === (math.abs(gz) > 1.96), s"$t flag")
    }
    assert(got.values.exists(_._2 != 0L), "every S zero — vacuous")
  }

  test("q344 QTE: per-arm decile picks replay at the declared bucket resolution") {
    val ord = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map { r =>
        val cents = (BigDecimal(r.getDouble(1)).setScale(4) * 100).toLongExact
        (r.getString(0) == "1-URGENT", cents / 1000)
      }
    def decile(arm: Seq[Long], dd: Long): Long = {
      val sorted = arm.sorted
      val n = sorted.length.toLong
      sorted.find { b =>
        sorted.count(_ <= b) * 10L >= dd * n
      }.get
    }
    val t = ord.filter(_._1).map(_._2).toSeq
    val c = ord.filterNot(_._1).map(_._2).toSeq
    val got = Stats.q344Qte(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq === (1L to 9L))
    got.foreach { case (dd, qt, qc, qte) =>
      assert(qt === decile(t, dd) * 10.0, s"d$dd treated")
      assert(qc === decile(c, dd) * 10.0, s"d$dd control")
      assert(qte === qt - qc, s"d$dd qte")
    }
    assert(got.map(_._2).toSeq === got.map(_._2).toSeq.sorted,
      "treated quantiles must be non-decreasing in decile")
  }

  test("q346 permutation test: observed diff, permuted diffs and p-value replay exactly") {
    val p = 2147483647L
    def permArm(id: Long, rep: Long): Boolean =
      ((((id + rep) % p) * 48271L % p + 1L) * 16807L % p) % 2 == 0
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(4)))
    val (ga, gb) = ev.partition(e => minstdBucket(e._1) % 2 == 0)
    val dobs = ga.map(_._2).sum.toDouble / ga.length -
      gb.map(_._2).sum.toDouble / gb.length
    val diffs = (1L to 32L).map { rep =>
      val (pa, pb) = ev.partition(e => permArm(e._1, rep))
      pa.map(_._2).sum.toDouble / pa.length -
        pb.map(_._2).sum.toDouble / pb.length
    }
    val nExtreme = diffs.count(x => math.abs(x) >= math.abs(dobs)).toLong
    val r = Stats.q346PermutationTest(spark, sf0001).head()
    assert(r.getLong(0) === ga.length.toLong && r.getLong(1) === gb.length.toLong)
    assert(math.abs(r.getDouble(4) - dobs) < 1e-6, "observed diff")
    assert(r.getLong(5) === 32L)
    assert(r.getLong(6) === nExtreme, "extreme count")
    assert(math.abs(r.getDouble(7) - (nExtreme + 1).toDouble / 33.0) < 1e-6)
    // null experiment: hash arms are exchangeable with the permuted ones,
    // so the p-value must not be extreme
    assert(r.getDouble(7) > 1.0 / 33.0 - 1e-9,
      "add-one p-value below its floor — arithmetic wrong")
    assert(diffs.distinct.length > 1, "all permuted diffs identical — vacuous")
  }

  test("q352 james-stein: tau2, shrink weights and pooled rates match a replay; order preserved") {
    val urgent = graft.Tables(spark, sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val cust = graft.Tables(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val per = cust.groupBy(_._2).map { case (seg, g) =>
      (seg, g.length.toLong, g.count(c => urgent(c._1)).toLong)
    }.toSeq.sortBy(_._1)
    val nt = per.map(_._2).sum; val yt = per.map(_._3).sum
    val k = per.length
    val pbar = yt.toDouble / nt
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val s1 = per.map { case (_, n, y) =>
      val d = y.toDouble / n - pbar; r12(d * d)
    }.sum.toDouble
    val s2 = per.map { case (_, n, _) => r12(pbar * (1 - pbar) / n) }.sum.toDouble
    val tau2 = math.max(0.0, s1 / (k - 1.0) - s2 / k)
    val got = Stats.q352JamesStein(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.map(_._1).toSeq === per.map(_._1))
    got.foreach { case (seg, n, y, raw, grand, b, shrunk) =>
      val w = per.find(_._1 == seg).get
      assert(n === w._2 && y === w._3, s"$seg counts")
      assert(math.abs(raw - w._3.toDouble / w._2) < 1e-6)
      assert(math.abs(grand - pbar) < 1e-6)
      val sg2 = pbar * (1 - pbar) / n
      assert(math.abs(b - sg2 / (sg2 + tau2)) < 1e-5, s"$seg shrink weight")
      assert(math.abs(shrunk - (pbar + (1 - sg2 / (sg2 + tau2)) * (raw - grand)))
        < 1e-5, s"$seg shrunk rate")
      // shrinkage moves toward the grand mean, never past it
      assert((shrunk - grand) * (raw - grand) >= -1e-9, s"$seg overshoot")
      assert(math.abs(shrunk - grand) <= math.abs(raw - grand) + 1e-9, s"$seg")
    }
    assert(got.exists(g => math.abs(g._7 - g._4) > 1e-6),
      "no segment actually shrunk — vacuous")
  }

  test("q353 delta method: moments replay; agrees with the jackknife to first order") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(4)))
    val per = ev.groupBy(_._1).map { case (_, g) =>
      (g.filter(_._2 == "purchase").map(_._3).sum, g.length.toLong)
    }.toSeq
    val n = per.length
    val sy = per.map(_._1).sum.toDouble
    val sx = per.map(_._2).sum
    val syy = per.map(t => t._1 * t._1).sum.toDouble
    val syx = per.map(t => t._1 * BigDecimal(t._2)).sum.toDouble
    val sxx = per.map(t => t._2 * t._2).sum
    val rr = sy / sx
    val xbar = sx.toDouble / n
    val ssr = syy - 2.0 * rr * syx + rr * rr * sxx
    val se = math.sqrt(ssr / (n - 1.0) / n / (xbar * xbar))
    val r = Stats.q353DeltaMethod(spark, sf0001).head()
    assert(r.getLong(0) === n.toLong && r.getLong(1) === sx)
    assert(math.abs(r.getDouble(2) - rr) < 1e-6)
    assert(math.abs(r.getDouble(3) - se) < 1e-6, "se_delta")
    assert(math.abs(r.getDouble(4) - (rr - 1.96 * se)) < 1e-4)
    assert(math.abs(r.getDouble(5) - (rr + 1.96 * se)) < 1e-4)
    // first-order agreement with the resampling estimator it approximates
    val seJack = Stats.q328JackknifeRatio(spark, sf0001).head().getDouble(3)
    assert(se > 0 && seJack > 0)
    assert(math.abs(se - seJack) / seJack < 0.5,
      s"delta se $se and jackknife se $seJack disagree wildly")
  }

  test("q355 laplace mechanism: inverse-CDF noise replays; clamp and accounting hold") {
    val per = graft.Tables(spark, sf0001, "customer")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("c")).collect()
      .map(r => (r.get(0).toString.toLong, r.getLong(1)))
    val got = Stats.q355LaplaceMechanism(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    assert(got.map(g => g._1 -> g._2).toMap === per.toMap)
    got.foreach { case (nation, c, noise, released, eps, sens) =>
      val h = (((nation % 2147483647L) * 48271L % 2147483647L) + 1L) *
        16807L % 2147483647L
      val u = (h + 0.5) / 2147483647.0
      val want = BigDecimal(-2.0 * math.signum(u - 0.5)
        * math.log(1.0 - 2.0 * math.abs(u - 0.5)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(noise === want, s"nation $nation noise")
      assert(math.abs(released - math.max(0.0, c + noise)) < 1e-6)
      assert(released >= 0.0, "clamp violated")
      assert(eps === 0.5 && sens === 1L)
    }
    assert(got.exists(_._3 > 0) && got.exists(_._3 < 0),
      "noise all one-signed — inverse CDF wrong")
  }

  test("q356 cell suppression: passes replay and no singleton group survives") {
    // sf0.01: the sf0.001 grid is degenerate (nearly every cell below the
    // threshold, so primary suppression alone satisfies the property and
    // the complementary passes would be vacuous)
    val sf001 = "/root/testdata/sf0.01"
    val got = Stats.q356CellSuppression(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3),
        r.getString(4)))
    val cells = graft.Tables(spark, sf001, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.get(0).toString.toLong, r.getString(1)), r.getLong(2))).toMap
    assert(got.map(g => ((g._1, g._2), g._3)).toMap === cells)
    // primary rule (threshold 7)
    got.filter(_._3 < 7).foreach(g => assert(g._4, s"${g._1}/${g._2} missed"))
    got.filter(g => g._5 == "primary").foreach(g => assert(g._3 < 7))
    got.filter(g => !g._4).foreach(g => assert(g._5 === "published"))
    // the SDC property the passes exist for: no row or column carries
    // exactly one suppressed cell
    got.groupBy(_._1).values.foreach { row =>
      assert(row.count(_._4) != 1, s"row ${row.head._1} lone suppression")
    }
    got.groupBy(_._2).values.foreach { colG =>
      assert(colG.count(_._4) != 1, s"col ${colG.head._2} lone suppression")
    }
    assert(got.exists(g => g._5.startsWith("row_comp") || g._5.startsWith("col_comp")),
      "no complementary suppression triggered — passes untested")
    assert(got.exists(!_._4), "everything suppressed — grid degenerate")
  }

  test("q357 nelson-aalen: hazard grid replays and shares q210's risk sets") {
    val km = Stats.q210KaplanMeier(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = Stats.q357NelsonAalen(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    // identical duration grid and risk sets as the KM estimator
    assert(got.map(g => (g._1, g._2, g._3)).toSeq === km,
      "NA and KM disagree on the shared survival grid")
    var cum = BigDecimal(0)
    got.foreach { case (dur, nRisk, nDeaths, _, hz, ch) =>
      val want = BigDecimal(nDeaths.toDouble / nRisk)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(hz === want.toDouble, s"dur $dur hazard")
      cum += want
      assert(math.abs(ch - cum.toDouble) < 1e-9, s"dur $dur cumulative")
    }
    assert(got.map(_._6).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      "cumulative hazard must be non-decreasing")
    assert(got.last._6 > 0, "zero total hazard — vacuous")
  }

  test("q359 qini: decile picks and uplift values replay; curve anchors at the endpoints") {
    val items = graft.Tables(spark, sf0001, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ord = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .flatMap { r =>
        items.get(r.getLong(0)).map { ly =>
          val b = (BigDecimal(r.getDouble(2)).setScale(4) * 100).toLongExact / 1000
          (r.getString(1) == "1-URGENT", ly >= 4, b)
        }
      }
    val byB = ord.groupBy(_._3).toSeq.sortBy(-_._1)
    val n = ord.length.toLong
    var cn = 0L; var cnt = 0L; var cyt = 0L; var cnc = 0L; var cyc = 0L
    val prefix = byB.map { case (_, g) =>
      cn += g.length; cnt += g.count(_._1); cyt += g.count(t => t._1 && t._2)
      cnc += g.count(!_._1); cyc += g.count(t => !t._1 && t._2)
      (cn, cnt, cyt, cnc, cyc)
    }
    def qini(p: (Long, Long, Long, Long, Long)): Double =
      if (p._4 == 0) p._3.toDouble
      else p._3.toDouble - p._5.toDouble * p._2 / p._4
    val wantAt = (1L to 10L).map { dd =>
      dd -> prefix.find(_._1 * 10 >= dd * n).get
    }.toMap
    val got = Stats.q359QiniCurve(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(got.keySet === (1L to 10L).toSet)
    val qtot = qini(wantAt(10L))
    (1L to 10L).foreach { dd =>
      val w = wantAt(dd)
      val g = got(dd)
      assert((g._1, g._2, g._3, g._4, g._5) === w, s"d$dd prefix")
      assert(math.abs(g._6 - qini(w)) < 1e-6, s"d$dd qini")
      assert(math.abs(g._7 - (qini(w) - qtot * dd / 10.0)) < 1e-6, s"d$dd delta")
    }
    // anchors: the full-population point sits ON the random diagonal
    assert(math.abs(got(10L)._7) < 1e-9, "qini(100%) must equal the diagonal")
    assert(got(10L)._1 === n, "final decile must cover everything")
  }

  test("q449 Mantel-Haenszel: pooled OR and chi2 match the textbook replay") {
    val rows = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderstatus"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1) >= 150000.0, r.getString(2) == "F"))
    val strata = rows.groupBy(_._1).values.toSeq
    def cells(g: Seq[(String, Boolean, Boolean)]) = (
      g.count(t => t._2 && t._3).toDouble, g.count(t => t._2 && !t._3).toDouble,
      g.count(t => !t._2 && t._3).toDouble, g.count(t => !t._2 && !t._3).toDouble)
    val terms = strata.map { g =>
      val (a, b, c, dd) = cells(g)
      val n = a + b + c + dd
      (a, a * dd / n, b * c / n, (a + b) * (a + c) / n,
        (a + b) * (c + dd) * (a + c) * (b + dd) / (n * n * (n - 1)))
    }
    val suma = terms.map(_._1).sum
    val wantOr = terms.map(_._2).sum / terms.map(_._3).sum
    val wantChi = math.pow(suma - terms.map(_._4).sum, 2) / terms.map(_._5).sum
    val got = Stats.q449MantelHaenszel(spark, sf0001).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == strata.length, "k_strata")
    assert(r.getLong(1) == rows.length, "n")
    assert(r.getLong(2) == suma.toLong, "exposed cases")
    assert(math.abs(r.getDouble(3) - wantOr) < 1e-3, s"or ${r.getDouble(3)} vs $wantOr")
    assert(math.abs(r.getDouble(4) - wantChi) < 1e-3, s"chi2 ${r.getDouble(4)} vs $wantChi")
  }

  test("q452 energy distance: matches the O(n^2) pairwise replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("ts2").cast("long"), col("value"))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    val mid = (ev.map(_._1).min + ev.map(_._1).max) / 2
    val x = ev.filter(_._1 < mid).map(_._2)
    val y = ev.filter(_._1 >= mid).map(_._2)
    def meanAbs(u: Array[Long], v: Array[Long]): Double =
      u.flatMap(a => v.map(b => math.abs(a - b).toDouble)).sum / (u.length.toDouble * v.length)
    val want = (2 * meanAbs(x, y) - meanAbs(x, x) - meanAbs(y, y)) / 100.0
    val r = Stats.q452EnergyDistance(spark, sf0001).collect().head
    assert(r.getLong(0) == x.length && r.getLong(1) == y.length)
    assert(math.abs(r.getDouble(5) - want) < 1e-6,
      s"energy ${r.getDouble(5)} vs $want")
    assert(r.getDouble(5) >= 0.0, "energy distance is nonnegative")
  }

  test("q453 CvM: matches the per-observation EDF replay on $10 buckets") {
    val o = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getString(0) == "1-URGENT",
        math.round(r.getDouble(1) * 100) / 1000))
    val xs = o.filter(_._1).map(_._2).sorted
    val ys = o.filterNot(_._1).map(_._2).sorted
    val n1 = xs.length.toDouble
    val n2 = ys.length.toDouble
    def edf(s: Array[Long], v: Long): Double = s.count(_ <= v) / s.length.toDouble
    val support = (xs ++ ys).distinct
    val want = support.map { v =>
      val t = xs.count(_ == v) + ys.count(_ == v)
      t * math.pow(edf(xs, v) - edf(ys, v), 2)
    }.sum * n1 * n2 / math.pow(n1 + n2, 2)
    val r = Stats.q453CramerVonMises(spark, sf0001).collect().head
    assert(r.getLong(0) == xs.length && r.getLong(1) == ys.length)
    assert(math.abs(r.getDouble(2) - want) < 1e-4, s"t ${r.getDouble(2)} vs $want")
  }

  test("q455 Dunn: pairwise z matches the average-rank replay") {
    val o = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100) / 1000))
    val n = o.length.toDouble
    // average ranks over the $10 buckets
    val byB = o.map(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val sortedB = byB.keys.toArray.sorted
    var before = 0L
    val avgRank = sortedB.map { b =>
      val t = byB(b)
      val r = before + (t + 1) / 2.0
      before += t
      b -> r
    }.toMap
    val tsum = byB.values.map(t => t.toDouble * t * t - t).sum
    val groups = o.groupBy(_._1)
    val means = groups.map { case (g, rows) =>
      g -> (rows.map(r => avgRank(r._2)).sum / rows.length, rows.length)
    }
    val varBase = n * (n + 1) / 12.0 - tsum / (12.0 * (n - 1))
    val got = Stats.q455DunnsTest(spark, sf0001).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val (m1, n1) = means(r.getString(0))
      val (m2, n2) = means(r.getString(1))
      val want = (m1 - m2) / math.sqrt(varBase * (1.0 / n1 + 1.0 / n2))
      assert(math.abs(r.getDouble(4) - want) < 1e-4,
        s"${r.getString(0)} vs ${r.getString(1)}: ${r.getDouble(4)} vs $want")
    }
  }

  test("q456 Kendall W: matches the rank-replay and lives in [0,1]") {
    val rows = graft.Tables(spark, sf0001, "orders")
      .join(graft.Tables(spark, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        pmod(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long"), lit(7L)),
        col("o_totalprice").cast("decimal(18,2)"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    val cells = rows.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(v => BigDecimal(v._3)).sum).toMap
    val segs = cells.keys.map(_._1).toSeq.distinct
    val slots = cells.keys.map(_._2).toSeq.distinct.sorted
    val m = segs.length.toDouble
    val nn = slots.length.toDouble
    // average ranks within each segment
    val ranks = segs.flatMap { g =>
      val revs = slots.map(sl => sl -> cells((g, sl)))
      revs.map { case (sl, rv) =>
        val below = revs.count(_._2 < rv)
        val eq = revs.count(_._2 == rv)
        (g, sl) -> (below + (eq + 1) / 2.0)
      }
    }.toMap
    val rj = slots.map(sl => segs.map(g => ranks((g, sl))).sum)
    val sumSq = rj.map(r => math.pow(r - m * (nn + 1) / 2, 2)).sum
    val tcorr = segs.map { g =>
      slots.map(sl => cells((g, sl))).groupBy(identity).values
        .map(ts => math.pow(ts.size, 3) - ts.size).sum
    }.sum
    val wantW = 12 * sumSq / (m * m * (nn * nn * nn - nn) - m * tcorr)
    val r = Stats.q456KendallsW(spark, sf0001).collect().head
    assert(r.getLong(0) == segs.length && r.getLong(1) == slots.length)
    assert(math.abs(r.getDouble(2) - wantW) < 1e-6, s"w ${r.getDouble(2)} vs $wantW")
    assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
  }

  test("q457 VR and q458 KPSS: match the daily-series replays") {
    val daily = graft.Tables(spark, sf0001, "orders")
      .groupBy(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("x"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("r"))
      .collect().map(r => (r.getLong(0), (BigDecimal(r.getDecimal(1)) * 100).toLongExact))
      .sortBy(_._1)
    val xs = daily.map(_._2)
    val n = xs.length
    val mu = xs.sum.toDouble / n
    val e = xs.map(_ - mu)
    // VR(5): the declared window is the previous 4 OBSERVATIONS in x
    // order (ROWS frame), not calendar days — mirror that here
    val m5 = xs.sliding(5).map(_.sum.toDouble).toArray
    val s1 = e.map(v => v * v).sum / (n - 1)
    val sq = m5.map(v => math.pow(v - 5 * mu, 2)).sum / (m5.length - 1)
    val wantVr = sq / (5 * s1)
    val rv = Stats.q457VarianceRatio(spark, sf0001).collect().head
    assert(rv.getLong(0) == n && rv.getLong(1) == m5.length)
    assert(math.abs(rv.getDouble(2) - wantVr) < 1e-3, s"vr ${rv.getDouble(2)} vs $wantVr")
    // KPSS eta with Bartlett l=4 (lag pairs at x offsets honor gaps too)
    val partial = e.scanLeft(0.0)(_ + _).drop(1)
    val aSum = partial.map(v => v * v).sum
    val b = e.map(v => v * v).sum
    val exMap = daily.map { case (x, v) => x -> (v - mu) }.toMap
    val gjs = (1 to 4).map { j =>
      daily.flatMap { case (x, v) =>
        exMap.get(x + j).map(e2 => (v - mu) * e2)
      }.sum
    }
    val s2 = (b + 2 * gjs.zipWithIndex.map { case (g, i) => (1.0 - (i + 1) / 5.0) * g }.sum) / n
    val wantEta = aSum / (n.toDouble * n * s2)
    val rk = Stats.q458Kpss(spark, sf0001).collect().head
    assert(rk.getLong(0) == n)
    assert(math.abs(rk.getDouble(1) - wantEta) < 1e-3, s"eta ${rk.getDouble(1)} vs $wantEta")
  }

  test("q459 SampEn: matches the O(n^2) template replay") {
    val daily = graft.Tables(spark, sf0001, "orders")
      .groupBy(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("x"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length
    val mu = daily.map(_._2).sum.toDouble / n
    val sd = math.sqrt(daily.map(v => (v._2 - mu) * (v._2 - mu)).sum / (n - 1))
    val r = 0.2 * sd
    val byX = daily.toMap
    val trips = daily.flatMap { case (x, v) =>
      for (v1 <- byX.get(x + 1); v2 <- byX.get(x + 2)) yield (x, v, v1, v2)
    }
    var bm = 0L; var am = 0L
    for (i <- trips.indices; j <- (i + 1) until trips.length) {
      val a = trips(i); val b = trips(j)
      if (math.abs(a._2 - b._2) <= r && math.abs(a._3 - b._3) <= r) {
        bm += 1
        if (math.abs(a._4 - b._4) <= r) am += 1
      }
    }
    val row = Stats.q459SampleEntropy(spark, sf0001).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(2) == bm, s"B ${row.getLong(2)} vs $bm")
    assert(row.getLong(3) == am, s"A ${row.getLong(3)} vs $am")
    assert(math.abs(row.getDouble(4) - math.log(bm.toDouble / am)) < 1e-5)
  }

  test("q460 K2: skew/kurt match the moment replay; K2 = Z1^2 + Z2^2") {
    val ys = graft.Tables(spark, sf0001, "orders")
      .select(col("o_totalprice")).collect()
      .map(r => math.round(r.getDouble(0) * 100) / 1.0e8)
    val n = ys.length.toDouble
    val mu = ys.sum / n
    def ctr(k: Int): Double = ys.map(y => math.pow(y - mu, k)).sum / n
    val g1 = ctr(3) / math.pow(ctr(2), 1.5)
    val b2 = ctr(4) / (ctr(2) * ctr(2))
    val row = Stats.q460DagostinoK2(spark, sf0001).collect().head
    assert(row.getLong(0) == ys.length)
    assert(math.abs(row.getDouble(1) - g1) < 1e-4, s"skew ${row.getDouble(1)} vs $g1")
    assert(math.abs(row.getDouble(2) - b2) < 1e-4, s"kurt ${row.getDouble(2)} vs $b2")
    val k2 = row.getDouble(5)
    // z1/z2 are reported 4-dp rounded while k2 is computed unrounded, so
    // the identity holds to ~2|z|·5e-5 per component
    assert(math.abs(k2 - (math.pow(row.getDouble(3), 2) + math.pow(row.getDouble(4), 2))) < 1e-2)
    assert(k2 >= 0)
  }

  test("q454 lambda/U: exact PRE identities hold and match plain replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), expr("CAST(hour(ts2) AS BIGINT) div 6"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = ev.length.toDouble
    val cells = ev.groupBy(identity).map { case (k, v) => (k._1, k._2, v.length) }.toSeq
    val smx = cells.groupBy(_._1).values.map(_.map(_._3).max).sum.toDouble
    val ny = cells.groupBy(_._2).mapValues(_.map(_._3).sum)
    val maxny = ny.values.max.toDouble
    val wantLyx = (smx - maxny) / (n - maxny)
    def h(ps: Iterable[Double]): Double = ps.map(p => -p / n * math.log(p / n)).sum
    val hy = h(ny.values.map(_.toDouble))
    val hyx = cells.groupBy(_._1).values.flatMap { g =>
      val nx = g.map(_._3).sum.toDouble
      g.map(c => -c._3 / n * math.log(c._3 / nx))
    }.sum
    val r = Stats.q454NominalAssociation(spark, sf0001).collect().head
    assert(r.getLong(0) == ev.length)
    assert(math.abs(r.getDouble(1) - wantLyx) < 1e-5, "lambda(Y|X)")
    assert(math.abs(r.getDouble(3) - (hy - hyx) / hy) < 1e-4, "U(Y|X)")
    // PRE measures live in [0,1]
    Seq(1, 2, 3, 4).foreach(i => assert(r.getDouble(i) >= 0 && r.getDouble(i) <= 1))
  }

  test("q466 t-closeness: per-class EMD matches the zero-filled CDF replay") {
    val rows = graft.Tables(spark, sf0001, "customer")
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        floor(col("c_acctbal").cast("double") / lit(1000.0)).cast("long"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
    val buckets = rows.map(_._2).distinct.sorted
    val k = buckets.length
    val n = rows.length.toDouble
    val globCnt = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byClass = rows.groupBy(_._1)
    def tOf(cls: (Long, String)): Double = {
      val g = byClass(cls)
      val nc = g.length.toDouble
      val cnt = g.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      var cum = 0.0
      var acc = 0.0
      buckets.foreach { b =>
        cum += cnt.getOrElse(b, 0L) / nc - globCnt(b) / n
        acc += math.abs(cum)
      }
      acc / (k - 1)
    }
    val got = Stats.q466TCloseness(spark, sf0001).collect()
    assert(got.length == math.min(10, byClass.size))
    got.foreach { r =>
      val want = tOf((r.getLong(0), r.getString(1)))
      assert(math.abs(r.getDouble(3) - want) < 1e-4,
        s"class ${r.getLong(0)}/${r.getString(1)}: ${r.getDouble(3)} vs $want")
    }
    // the output is the TOP of the t ordering: every reported t must be >=
    // the best unreported class's t
    val reported = got.map(r => (r.getLong(0), r.getString(1))).toSet
    val maxUnreported = byClass.keys.filterNot(reported)
      .map(tOf).foldLeft(0.0)(math.max)
    assert(got.map(_.getDouble(3)).min >= maxUnreported - 1e-4)
  }

  test("q467 Page L and q468 Jonckheere: match ordered-alternative replays") {
    // Page: recompute L from the collected (segment, slot, revenue) cells
    val cells = graft.Tables(spark, sf0001, "orders")
      .join(graft.Tables(spark, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        pmod(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long"), lit(7L)))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)"))
      .collect().map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
    val bySeg = cells.groupBy(_._1)
    val rankOf = bySeg.view.mapValues { g =>
      g.map { case (_, slot, rev) =>
        val below = g.count(_._3 < rev)
        val eq = g.count(_._3 == rev)
        slot -> (below + (eq + 1) / 2.0)
      }.toMap
    }.toMap
    val slots = cells.map(_._2).distinct.sorted
    val wantL = slots.map(sl =>
      (sl + 1) * bySeg.keys.toSeq.map(g => rankOf(g)(sl)).sum).sum
    val rp = Stats.q467PageTrend(spark, sf0001).collect().head
    assert(rp.getLong(0) == bySeg.size && rp.getLong(1) == slots.length)
    assert(math.abs(rp.getDouble(2) - wantL) < 1e-6, s"L ${rp.getDouble(2)} vs $wantL")
    // Jonckheere: brute-force pair count over the $10 buckets
    val o = graft.Tables(spark, sf0001, "orders")
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getString(0).substring(0, 1).toLong,
        math.round(r.getDouble(1) * 100) / 1000))
    val groups = o.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val gs = groups.keys.toSeq.sorted
    var j = 0.0
    for (i <- gs.indices; jj <- (i + 1) until gs.length) {
      val (xi, xj) = (groups(gs(i)), groups(gs(jj)))
      j += xi.map(a => xj.count(_ > a) + 0.5 * xj.count(_ == a)).sum
    }
    val rj = Stats.q468Jonckheere(spark, sf0001).collect().head
    assert(rj.getLong(0) == o.length)
    assert(math.abs(rj.getDouble(1) - j) < 1e-6, s"J ${rj.getDouble(1)} vs $j")
  }

  test("q470 Theil: total/between/within close the decomposition identity") {
    val rows = graft.Tables(spark, sf0001, "orders")
      .join(graft.Tables(spark, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100).toDouble))
    val n = rows.length
    val xx = rows.map(_._2).sum
    val wantT = rows.map { case (_, x) => x / xx * math.log(x * n / xx) }.sum
    val byG = rows.groupBy(_._1)
    val wantBetween = byG.values.map { g =>
      val xg = g.map(_._2).sum
      xg / xx * math.log(xg / xx * (n.toDouble / g.length))
    }.sum
    val r = Stats.q470TheilDecomposition(spark, sf0001).collect().head
    assert(r.getLong(0) == n)
    assert(math.abs(r.getDouble(1) - wantT) < 1e-4, s"T ${r.getDouble(1)} vs $wantT")
    assert(math.abs(r.getDouble(2) - wantBetween) < 1e-4, "between")
    assert(math.abs(r.getDouble(4)) < 1e-4, "identity gap must be ~0")
    assert(r.getDouble(1) >= 0 && r.getDouble(3) >= 0)
  }

  test("q479 DBSCAN-1D and q480 Mahalanobis: match collected replays") {
    val vals = graft.Tables.events(spark, sf0001)
      .select((col("value").cast("decimal(18,4)") * 100).cast("long")).collect()
      .map(_.getLong(0))
    val support = vals.distinct.sorted
    val cnt = vals.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // islands with gap <= 3
    val clusters = support.foldLeft(List.empty[List[Long]]) { (acc, c) =>
      acc match {
        case h :: t if c - h.head <= 3 => (c :: h) :: t
        case _ => List(c) :: acc
      }
    }.map(_.reverse)
    val want = clusters.map(cl => (cl.head, cl.last, cl.length.toLong,
        cl.map(cnt).sum))
      .sortBy(t => (-t._4, t._1)).take(10)
    val got = Stats.q479Dbscan1d(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want, s"clusters")
    // q480: d2 replay
    val daily = graft.Tables.events(spark, sf0001)
      .groupBy(datediff(col("ts2").cast("date"), lit("2024-01-01").cast("date"))
        .cast("long").as("x"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = daily.length.toDouble
    val mua = daily.map(_._2).sum / n
    val mub = daily.map(_._3).sum / n
    val vaa = daily.map(t => t._2 * t._2).sum / n - mua * mua
    val vbb = daily.map(t => t._3 * t._3).sum / n - mub * mub
    val vab = daily.map(t => t._2.toDouble * t._3).sum / n - mua * mub
    val det = vaa * vbb - vab * vab
    def d2(a: Long, b: Long): Double = {
      val da = a - mua; val db = b - mub
      (da * (vbb * da - vab * db) + db * (vaa * db - vab * da)) / det
    }
    val gm = Stats.q480Mahalanobis(spark, sf0001).collect()
    assert(gm.length == math.min(10, daily.length))
    gm.foreach { r =>
      assert(math.abs(r.getDouble(3) - d2(r.getLong(1), r.getLong(2))) < 1e-3,
        s"day ${r.getLong(0)}")
    }
    val ds = gm.map(_.getDouble(3)).toSeq
    assert(ds == ds.sorted.reverse, "descending d2 order")
  }

  test("q481 GMM: mixture identities hold against exact sample moments") {
    val vals = graft.Tables.events(spark, sf0001)
      .select((col("value").cast("decimal(18,4)") * 100).cast("long")).collect()
      .map(_.getLong(0).toDouble)
    val n = vals.length
    val mean = vals.sum / n / 100.0
    val r = Stats.q481Gmm1d(spark, sf0001).collect().head
    assert(r.getLong(0) == n)
    val pi1 = r.getDouble(1)
    val mu1 = r.getDouble(2); val s1 = r.getDouble(3)
    val mu2 = r.getDouble(4); val s2 = r.getDouble(5)
    assert(pi1 > 0 && pi1 < 1, s"pi1 $pi1")
    assert(s1 > 0 && s2 > 0, "component sigmas must be positive")
    // EM preserves the mixture mean at every iteration (up to the term
    // rounding): pi1*mu1 + (1-pi1)*mu2 == sample mean
    val mixMean = pi1 * mu1 + (1 - pi1) * mu2
    assert(math.abs(mixMean - mean) < 0.02, s"mixture mean $mixMean vs $mean")
    // and the mixture second moment stays below/at the sample variance +
    // between-component spread identity: pooled variance decomposition
    val varAll = vals.map(v => math.pow(v / 100.0 - mean, 2)).sum / n
    val mixVar = pi1 * (s1 * s1 + mu1 * mu1) + (1 - pi1) * (s2 * s2 + mu2 * mu2) - mixMean * mixMean
    assert(math.abs(mixVar - varAll) < 0.05, s"mixture var $mixVar vs $varAll")
    assert(r.getDouble(6) >= 0, "separation")
  }

  test("q482 Hampel and q483 WE rules: match windowed replays") {
    val grid = graft.Tables(spark, sf0001, "orders")
      .groupBy(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("x"))
      .agg(count(lit(1)).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
    val got = Stats.q482Hampel(spark, sf0001).collect()
    assert(got.length == grid.size)
    got.take(200).foreach { r =>
      val x = r.getLong(0)
      val wvals = (-3L to 3L).flatMap(o => grid.get(x + o))
      val med = lowerMedian(wvals)
      val mad = lowerMedian(wvals.map(v => math.abs(v - med)))
      assert(r.getLong(2) == med, s"med($x)")
      assert(r.getLong(3) == mad, s"mad($x)")
      assert(r.getBoolean(4) == (math.abs(r.getLong(1) - med) * 10000 > mad * 44478))
    }
    // q483: every flagged row satisfies at least one rule; z matches moments
    val hourly = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), (col("ts2").cast("long") / 3600).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byType = hourly.groupBy(_._1._1)
    val gwe = Stats.q483WesternElectric(spark, sf0001).collect()
    gwe.foreach { r =>
      assert(r.getBoolean(4) || r.getBoolean(5) || r.getBoolean(6) || r.getBoolean(7))
      val cs = byType(r.getString(0)).values.toSeq
      val nh = cs.length.toDouble
      val mu = cs.sum / nh
      val sd = math.sqrt(cs.map(c => c * c.toDouble).sum / nh - mu * mu)
      assert(math.abs(r.getDouble(3) - (r.getLong(2) - mu) / sd) < 1e-3,
        s"z at ${r.getString(0)}/${r.getLong(1)}")
    }
  }
}
