package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Equivalence properties for the scale-safe twins of the three
  * global-window exactness baselines (VERDICT r4 item 2), run at sf0.01 —
  * the same scale the driver's oracle gate uses.
  *
  *   - q108 vs q91 (equi-depth bins): the sketch-cutoff path must land
  *     within the GK error envelope of the exact ntile bins;
  *   - q109 vs q93 (key gaps): the gap set is partition-invariant, so the
  *     twins must agree EXACTLY (q109 also shares q93's DuckDB oracle);
  *   - q110 vs q96 (packing): shard-local packing must conserve the token
  *     mass and keep every non-tail sequence exactly full per shard.
  */
class ScaleTwinsSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  test("q108 equi-depth twin: bins within the sketch error envelope of exact q91") {
    val exact = Extras.q91EquidepthBins(spark, sf001).collect()
    val approx = Extras.q108EquidepthScale(spark, sf001).collect()
    assert(approx.map(_.getLong(0)).toSeq === (1L to 10L),
      "twin must produce exactly bins 1..10")
    val n = exact.map(_.getLong(1)).sum
    assert(approx.map(_.getLong(1)).sum === n, "twin must bin every row exactly once")
    // approx_percentile accuracy 10000 ⇒ rank error ≤ n/10000 per cutoff;
    // each bin is bounded by two cutoffs, plus ties all land in one bin
    // where ntile splits them — allow 1% of the ideal bin population
    val ideal = n / 10.0
    for (r <- approx) {
      val dev = math.abs(r.getLong(1) - ideal)
      assert(dev <= math.max(5.0, 0.01 * ideal),
        s"bin ${r.getLong(0)} holds ${r.getLong(1)} rows vs ideal $ideal — " +
          s"outside the sketch error envelope")
    }
    // bins are value-disjoint and ordered: hi(b) <= lo(b+1)
    val sorted = approx.sortBy(_.getLong(0))
    for (Array(a, b) <- sorted.sliding(2).map(_.toArray)) {
      assert(a.getDouble(3) <= b.getDouble(2),
        s"bins ${a.getLong(0)} and ${b.getLong(0)} overlap in value range")
    }
  }

  test("q108 heavy-tie input: duplicate cutoffs merge bins, never skip rows") {
    // one value spans >10% of rows ⇒ approx_percentile returns duplicate
    // cutoffs; the operator dedupes them so the affected deciles MERGE into
    // one wider bin (ids stay dense 1..m, m < 10) instead of leaving empty
    // bins and skipping tied values past them
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q108-ties").toString
    val n = 10000
    // 40% of rows tied at 100.0 ⇒ cutoffs 0.3/0.4/0.5/0.6 all duplicate
    val rows = (1 to n).map { i =>
      val v = if (i <= n * 4 / 10) 100.0 else 100.0 + i
      (i.toLong, v)
    }
    rows.toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val bins = Extras.q108EquidepthScale(spark, dir).collect()
    val ids = bins.map(_.getLong(0)).toSeq
    assert(ids === (1L to ids.length), s"bin ids not dense: $ids")
    assert(ids.length < 10, "duplicate cutoffs must merge bins on heavy ties")
    assert(bins.map(_.getLong(1)).sum === n, "every row binned exactly once")
    assert(bins.forall(_.getLong(1) > 0), "merged binning leaves no empty bin")
    // the tie bin holds the whole tie group (plus any sketch error)
    val tieBin = bins.filter(r => r.getDouble(2) <= 100.0 && r.getDouble(3) >= 100.0)
    assert(tieBin.length === 1 && tieBin.head.getLong(1) >= n * 4 / 10,
      "tie group must land in one bin")
  }

  test("q108 is bit-reproducible across shuffle parallelisms") {
    // the sixth engine-only query joins the determinism contract of the
    // other five (NorthStarSpec): the GK sketch's partial merges run in
    // partition-index order, so the cutoffs — and therefore every bin —
    // must be identical whether exchanges land on 8 or 32 partitions
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def run() = Extras.q108EquidepthScale(spark, sf001).collect().toSeq
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val at8 = run()
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val at32 = run()
      assert(at8.nonEmpty)
      assert(at8 === at32, "q108 bins differ across shuffle parallelisms")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q109 key-gap twin: exactly equal to the global-window baseline") {
    def rows(r: Array[Row]) = r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    val exact = rows(Extras.q93KeyGaps(spark, sf001).collect())
    val scaled = rows(Extras.q109KeyGapsScale(spark, sf001).collect())
    assert(scaled === exact,
      "per-partition gaps + boundary exchange must reproduce the exact gap report")
  }

  test("q113 IVF-blocked dedup: precision 1.0, recall pinned vs exact q72 pairs") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables(spark, sf001, "embeddings")
    // exact >= 0.4 pair set (q72's own candidate relation)
    val withNorm = emb
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("ev"))
      .withColumn("nrm", sqrt(Similarity.dot(col("ev"), col("ev"))))
    val exact = Similarity.exactCosinePairs(withNorm)
      .filter(round(col("cos"), 6) >= 0.4)
      .select(col("id1"), col("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = NorthStar.ivfBlockedPairs(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "baseline produced no pairs — threshold drifted")
    // precision 1.0: blocking may MISS pairs, never invent them
    assert(blocked.subsetOf(exact),
      s"blocked pairs not a subset of exact: ${(blocked -- exact).take(5)}")
    // recall: the K=√n / r=4 blocking must keep nearly all true pairs at
    // sf0.01 (r6 curve: 0.983 measured at r=4, up from r=3's 0.847 for
    // 1.57x compare volume; bound leaves margin for corpus jitter)
    val recall = blocked.size.toDouble / exact.size
    info(f"q113 blocking recall: ${recall}%.3f (${blocked.size}/${exact.size} pairs)")
    assert(recall >= 0.9, f"blocking recall $recall%.3f fell below 0.9")
  }

  test("q114 blocked top-k pairs: exact scores, recall@50 pinned vs exact q60") {
    val exactTop = Similarity.q60CosinePairs(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blockedTop = NorthStar.q114CosineTopkBlocked(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (blockedTop & exactTop).size.toDouble / exactTop.size
    info(f"q114 recall@50: ${recall}%.3f")
    // r6 curve: 0.980 measured at r=4 (was 0.82 at r=3); margin for jitter
    assert(recall >= 0.9, f"blocked top-50 recall $recall%.3f fell below 0.9")
  }

  test("q486 blocked LOF: 5-NN recall, score drift, top-15 agreement vs exact q478") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // measured at pin time (DebugLof, r=6, sf0.01): edge recall 0.991,
    // drift p95 0.0037 / max 0.0146, top-15 hit 14/15; floors leave
    // margin for corpus jitter. The top-15 SET alone is ill-conditioned
    // (the exact LOF surface here is a flat 1.03-1.06 band), so the twin
    // is pinned on what blocking actually controls: k-NN completeness
    // and per-id score fidelity over the WHOLE corpus.
    val exPairs = Similarity.exactLofPairs(spark, sf001)
    val blPairs = Similarity.blockedLofPairs(spark, sf001, replicas = 6)
    val wk = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("nid"))
    def knn(p: org.apache.spark.sql.DataFrame) = p
      .withColumn("rn", row_number().over(wk)).filter(col("rn") <= 5)
      .select(col("vec_id"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exKnn = knn(exPairs)
    val edgeRecall = (exKnn & knn(blPairs)).size.toDouble / exKnn.size
    info(f"q486 true-5NN edge recall: $edgeRecall%.4f")
    assert(edgeRecall >= 0.95, f"5-NN edge recall $edgeRecall%.4f fell below 0.95")

    val exact = Similarity.lofScores(exPairs).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val blocked = Similarity.lofScores(blPairs).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(blocked.keySet == exact.keySet, "blocked LOF must score every id")
    val drifts = exact.keys.toSeq
      .map(id => math.abs(exact(id) - blocked(id))).sorted
    val p95 = drifts(((drifts.size - 1) * 0.95).round.toInt)
    info(f"q486 LOF drift: p95=$p95%.5f max=${drifts.last}%.5f")
    assert(p95 <= 0.01, f"LOF drift p95 $p95%.5f exceeds 0.01")
    assert(drifts.last <= 0.05, f"LOF drift max ${drifts.last}%.5f exceeds 0.05")

    def top15(m: Map[Long, Double]) =
      m.toSeq.sortBy { case (id, l) => (-l, id) }.take(15).map(_._1).toSet
    val hit = (top15(exact) & top15(blocked)).size
    info(f"q486 top-15 agreement: $hit/15")
    assert(hit >= 12, s"blocked LOF top-15 agreement $hit/15 fell below 12")
  }

  test("q507 blocked TwoNN: 2-NN edge recall and id_mle drift vs exact q414") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // 2-NN is a strictly easier target than q486's 5-NN at the same r=6
    // operating point (measured 5-NN edge recall 0.991), so the floor
    // carries the same margin
    val exPairs = Similarity.exactLofPairs(spark, sf001)
    val blPairs = Similarity.blockedLofPairs(spark, sf001, replicas = 6)
    val wk = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("nid"))
    def nn2(p: org.apache.spark.sql.DataFrame) = p
      .withColumn("rn", row_number().over(wk)).filter(col("rn") <= 2)
      .select(col("vec_id"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exNn = nn2(exPairs)
    val recall = (exNn & nn2(blPairs)).size.toDouble / exNn.size
    info(f"q507 true-2NN edge recall: $recall%.4f")
    assert(recall >= 0.95, f"2-NN edge recall $recall%.4f fell below 0.95")

    val exact = Similarity.q414TwoNN(spark, sf001).collect().head
    val blocked = Similarity.q507TwoNNBlocked(spark, sf001).collect().head
    assert(blocked.getLong(0) === exact.getLong(0),
      "blocked TwoNN must use every point the exact estimator uses")
    val drift = math.abs(blocked.getDouble(2) - exact.getDouble(2))
    info(f"q507 id_mle: blocked=${blocked.getDouble(2)}%.4f " +
      f"exact=${exact.getDouble(2)}%.4f drift=$drift%.4f")
    assert(drift <= 0.05 * math.abs(exact.getDouble(2)),
      f"id_mle drift $drift%.4f exceeds 5%% of the exact estimate")
  }

  test("q508 blocked hubness: in-degree fidelity and skew drift vs exact q431") {
    val exact = Similarity.q431Hubness(spark, sf001).collect().head
    val blocked = Similarity.q508HubnessBlocked(spark, sf001).collect().head
    assert(blocked.getLong(0) === exact.getLong(0),
      "blocked hubness must score the full id universe")
    // max in-degree and orphan count ride the recalled 5-NN edges — at the
    // measured 0.991 edge recall they stay within a small absolute band
    assert(math.abs(blocked.getLong(1) - exact.getLong(1)) <= 2,
      s"max_deg drifted: blocked=${blocked.getLong(1)} exact=${exact.getLong(1)}")
    assert(math.abs(blocked.getLong(2) - exact.getLong(2)) <= 5,
      s"n_orphans drifted: blocked=${blocked.getLong(2)} exact=${exact.getLong(2)}")
    val drift = math.abs(blocked.getDouble(3) - exact.getDouble(3))
    info(f"q508 skew_k5: blocked=${blocked.getDouble(3)}%.4f " +
      f"exact=${exact.getDouble(3)}%.4f drift=$drift%.4f")
    assert(drift <= 0.1, f"skew_k5 drift $drift%.4f exceeds 0.1")
  }

  test("q509 sampled concentration: stable vs full-corpus q435") {
    // the 256-id hash cut must reproduce the full-corpus concentration
    // diagnostics at sf0.01 (500 ids) within a sampling-noise band — the
    // pin that makes the fixed cut a trustworthy 100 TB stand-in
    val full = Similarity.q435DistanceConcentration(spark, sf001).collect().head
    val samp = Similarity.q509ConcentrationSampled(spark, sf001).collect().head
    assert(samp.getLong(0) === 256L, "sample cut must keep exactly 256 ids")
    val cDrift = math.abs(samp.getDouble(2) - full.getDouble(2))
    val rDrift = math.abs(samp.getDouble(3) - full.getDouble(3))
    info(f"q509 concentration: sampled=${samp.getDouble(2)}%.4f " +
      f"full=${full.getDouble(2)}%.4f drift=$cDrift%.4f")
    info(f"q509 mean_rel_contrast: sampled=${samp.getDouble(3)}%.4f " +
      f"full=${full.getDouble(3)}%.4f drift=$rDrift%.4f")
    assert(cDrift <= 0.1 * full.getDouble(2),
      f"concentration drift $cDrift%.4f exceeds 10%% of full")
    assert(rDrift <= 0.15 * math.abs(full.getDouble(3)),
      f"mean_rel_contrast drift $rDrift%.4f exceeds 15%% of full")
  }

  test("q110 packing twin: conserves token mass and packs every shard fully") {
    val exact = NorthStar.q96SamplePacking(spark, sf001).collect()
    val sharded = NorthStar.q110PackingShard(spark, sf001).collect()
    // token conservation: both pack the identical corpus token mass
    val exactTokens = exact.map(_.getLong(2)).sum
    assert(sharded.map(_.getLong(3)).sum === exactTokens,
      "shard-local packing lost or duplicated tokens vs the exact baseline")
    // within each shard: every sequence but the last is exactly full (2048)
    val byShard = sharded.groupBy(_.getLong(0))
    assert(byShard.size === 8, "doc_id mod 8 must populate all 8 shards at sf0.01")
    for ((shard, rows) <- byShard) {
      val ordered = rows.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(1)).toSeq === ordered.indices.map(_.toLong),
        s"shard $shard sequence ids must be dense from 0")
      for (r <- ordered.dropRight(1))
        assert(r.getLong(3) === 2048L,
          s"shard $shard seq ${r.getLong(1)} holds ${r.getLong(3)} tokens — " +
            s"non-tail sequences must be exactly full")
      assert(ordered.last.getLong(3) <= 2048L)
    }
  }
}
