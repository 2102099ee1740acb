package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Replay pins for the Layout family: the skyline against a brute-force
  * dominance scan, the Morton interleave against a bit-twiddling replay,
  * and the pruning audit against an in-memory bucket walk.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def orderXY = Tables(spark, sf0001, "orders")
    .select($"o_custkey",
      datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date")).cast("long"))
    .collect().map(r => (r.getLong(0), r.getLong(1)))

  private def morton(x: Long, y: Long): Long =
    (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  private def normalized(xs: Array[(Long, Long)]): Array[(Long, Long, Long, Long)] = {
    val xmin = xs.map(_._1).min; val xmax = xs.map(_._1).max
    val ymin = xs.map(_._2).min; val ymax = xs.map(_._2).max
    xs.map { case (x, y) =>
      (x, y, (x - xmin) * 65535 / math.max(xmax - xmin, 1),
        (y - ymin) * 65535 / math.max(ymax - ymin, 1))
    }
  }

  test("q181 skyline equals the brute-force dominance scan") {
    val parts = Tables(spark, sf0001, "part")
      .select($"p_partkey", $"p_retailprice", $"p_size".cast("long"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val want = parts.filter { case (_, pi, si) =>
      !parts.exists { case (_, pj, sj) =>
        pj <= pi && sj >= si && (pj < pi || sj > si)
      }
    }.map(_._1).sorted
    val got = Layout.q181Skyline(spark, sf0001).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq)
    // skyline sanity for (min price, max size): each pricier front point
    // must be strictly larger, else the cheaper one would dominate it
    val sky = Layout.q181Skyline(spark, sf0001).collect()
      .map(r => (r.getDouble(1), r.getLong(2)))
    assert(sky.sliding(2).forall(w => w.length < 2 ||
      (w(0)._1 < w(1)._1 && w(0)._2 < w(1)._2) ||
      (w(0)._1 == w(1)._1 && w(0)._2 == w(1)._2)))
  }

  test("q182 z-order buckets match a bit-twiddling replay; all rows accounted") {
    val xs = normalized(orderXY)
    val wantBuckets = xs.groupBy { case (_, _, xb, yb) => morton(xb, yb) / 67108864L }
    val got = Layout.q182Zorder(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.map(_._2).sum === xs.length)
    assert(got.length === wantBuckets.size)
    got.foreach { case (b, n, xmin, xmax, ymin, ymax) =>
      val g = wantBuckets(b)
      assert(g.length === n, s"bucket $b count")
      assert(xmin === g.map(_._1).min && xmax === g.map(_._1).max, s"bucket $b x-envelope")
      assert(ymin === g.map(_._2).min && ymax === g.map(_._2).max, s"bucket $b y-envelope")
    }
  }

  test("q196: Hilbert expression matches a Scala replay; Hilbert beats Z on locality") {
    graft.functions.VectorFunctions.register(spark)
    def hilbertReplay(x0: Long, y0: Long): Long = {
      var x = x0 & 0xFFFFL; var y = y0 & 0xFFFFL; var d = 0L; var s = 32768L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0L) {
          if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    // the codegen'd expression against the replay, over a corner + random grid
    val pts = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 2L), (32768L, 32767L), (12345L, 54321L), (40000L, 20000L))
    val df = pts.toDF("xb", "yb")
      .select($"xb", $"yb",
        graft.functions.VectorFunctions.hilbert($"xb", $"yb").as("h"))
      .collect()
    df.foreach(r => assert(r.getLong(2) === hilbertReplay(r.getLong(0), r.getLong(1)),
      s"hilbert(${r.getLong(0)}, ${r.getLong(1)})"))
    // the curve is a bijection on a small grid: 16x16 distinct cells -> 256 distinct indexes
    val grid = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield (x * 4096, y * 4096)).toDF("xb", "yb")
      .select(graft.functions.VectorFunctions.hilbert($"xb", $"yb")).distinct().count()
    assert(grid === 256L)
    // the measured locality claim, pinned
    val got = Layout.q196Hilbert(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("hilbert")._2 <= got("zorder")._2,
      "Hilbert lost to Z-order on total extent")
    assert(got("hilbert")._3 <= got("zorder")._3,
      "Hilbert lost to Z-order on worst-bucket extent")
  }

  test("q200 compaction: content preserved bit-for-bit, file count collapses to target") {
    val r = Layout.q200Compaction(spark, sf0001).head()
    val (fb, fa, rb, ra) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (chars, diff, target) = (r.getLong(4), r.getLong(5), r.getLong(6))
    assert(rb === ra, "compaction changed the row count")
    assert(diff === 0L, "compaction changed row CONTENT")
    assert(fa === target, s"wrote $fa files, sized $target")
    assert(fa < fb, "compaction did not reduce the file count")
    assert(target === math.max(1L, (chars + 199999L) / 200000L))
    assert(rb === graft.Tables(spark, sf0001, "documents").count())
  }

  test("q183 pruning audit matches an in-memory bucket walk; zorder never scans more") {
    val xs = normalized(orderXY)
    val trueRows = xs.count { case (x, y, _, _) => x >= 100 && x <= 199 && y >= 730 && y <= 1094 }
    def replay(bucketOf: ((Long, Long, Long, Long)) => Long): (Long, Long, Long) = {
      val bs = xs.groupBy(bucketOf)
      val kept = bs.filter { case (_, g) =>
        g.map(_._1).min <= 199 && g.map(_._1).max >= 100 &&
          g.map(_._2).min <= 1094 && g.map(_._2).max >= 730
      }
      (bs.size.toLong, kept.size.toLong, kept.values.map(_.length.toLong).sum)
    }
    val wantDate = replay { case (_, y, _, _) => y / 38 }
    val wantZ = replay { case (_, _, xb, yb) => morton(xb, yb) / 67108864L }
    val got = Layout.q183MinmaxPrune(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("date") === ((wantDate._1, wantDate._2, wantDate._3, trueRows.toLong)))
    assert(got("zorder") === ((wantZ._1, wantZ._2, wantZ._3, trueRows.toLong)))
    assert(got("zorder")._3 <= got("date")._3,
      "z-order layout scanned MORE rows than the single-dimension layout")
  }

  test("q350 range-partition audit: quantile cuts, shares and skew match a prefix replay") {
    val buckets = graft.Tables(spark, sf0001, "orders")
      .select($"o_totalprice").collect()
      .map(r => (BigDecimal(r.getDouble(0)).setScale(4) * 100).toLongExact / 1000)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    val n = buckets.map(_._2).sum
    var cum = 0L
    val assigned = buckets.map { case (b, c) =>
      val pid = math.min(31L, cum * 32 / n)
      cum += c
      (pid, b, c)
    }
    val want = assigned.groupBy(_._1).toSeq.sortBy(_._1).map { case (pid, g) =>
      val rows = g.map(_._3).sum
      (pid, g.length.toLong, rows,
        BigDecimal(rows.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(rows.toDouble * 32.0 / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Layout.q350RangePartitionAudit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got === want)
    assert(got.map(_._3).sum === n, "partition rows must cover every order")
    assert(got.length >= 16, "fewer than half the target partitions realized")
    assert(got.map(_._5).max > 1.0 && got.map(_._5).min < 1.0,
      "perfectly uniform partitioning — skew audit vacuous")
  }

  test("q474 pruning curve: counts match a collected-envelope replay") {
    val rows = graft.Tables(spark, sf0001, "orders")
      .select(col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val xmin = rows.map(_._1).min; val xmax = rows.map(_._1).max
    val ymin = rows.map(_._2).min; val ymax = rows.map(_._2).max
    def nb(v: Long, lo: Long, hi: Long) =
      ((v - lo) * 65535) / math.max(hi - lo, 1)
    def z(xb: Long, yb: Long): Long =
      (0 until 16).map(i => (((xb >> i) & 1) << (2 * i)) +
        (((yb >> i) & 1) << (2 * i + 1))).sum
    val dated = rows.groupBy { case (x, y) => (nb(y, ymin, ymax) * 64) / 65536 }
    val zed = rows.groupBy { case (x, y) =>
      z(nb(x, xmin, xmax), nb(y, ymin, ymax)) / 67108864 }
    def envs(m: Map[Long, Array[(Long, Long)]]) = m.values.map { g =>
      (g.map(_._1).min, g.map(_._1).max, g.map(_._2).min, g.map(_._2).max, g.length.toLong)
    }.toSeq
    val probes = (0L until 16L).map { i =>
      (xmin + ((xmax - xmin) * ((i * 5) % 16)) / 16,
        xmin + ((xmax - xmin) * (((i * 5) % 16) + 2)) / 16,
        ymin + ((ymax - ymin) * i) / 16,
        ymin + ((ymax - ymin) * (i + 2)) / 16, i)
    }
    def scanned(fs: Seq[(Long, Long, Long, Long, Long)], pr: (Long, Long, Long, Long, Long)) =
      fs.filter(f => f._1 <= pr._2 && f._2 >= pr._1 && f._3 <= pr._4 && f._4 >= pr._3)
    val got = Layout.q474PruningSelectivity(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.size == 32)
    probes.foreach { pr =>
      val wantD = scanned(envs(dated), pr)
      val wantZ = scanned(envs(zed), pr)
      assert(got(("date_sort", pr._5))._2 == wantD.length, s"date files p${pr._5}")
      assert(got(("date_sort", pr._5))._3 == wantD.map(_._5).sum, s"date rows p${pr._5}")
      assert(got(("zorder", pr._5))._2 == wantZ.length, s"z files p${pr._5}")
      assert(got(("zorder", pr._5))._3 == wantZ.map(_._5).sum, s"z rows p${pr._5}")
    }
    // the whole point: across the grid, z-order must scan no more rows
    // in total than the single-dimension layout
    val totZ = probes.map(pr => got(("zorder", pr._5))._3).sum
    val totD = probes.map(pr => got(("date_sort", pr._5))._3).sum
    assert(totZ <= totD, s"zorder $totZ should prune at least as well as date $totD")
  }
}
