package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Fast regression net for the whole declared surface: every query must run
  * at sf0.001 with stable shape and non-degenerate output. The DuckDB oracle
  * (driver-side) owns value-level correctness; this suite catches broken
  * plans, schema drift, and empty results in plain `sbt test`.
  */
class QueriesGoldenSpec extends SparkSpec {

  /** Queries legitimately empty at sf0.001 (thresholds tuned for sf0.01+). */
  private val mayBeEmpty = Set("q15_having",
    // at sf0.001 most hours tie the per-type median count (c=1), and the
    // runs test's drop-ties dichotomy can leave every type one-sided —
    // the degenerate-series filter then legitimately empties the result
    // (q390 is its streaming twin over the same kernel)
    "q383_runs_test", "q390_stream_runs")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 with stable shape") {
      val df = fn(spark, sf0001)
      val cols = df.columns.toSeq
      assert(cols.nonEmpty && cols.distinct == cols, s"bad columns: $cols")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query and aliases match the contract") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query is oracle-checked or in the DOCUMENTED engine-only set") {
    // the declared engine-only queries (SURVEY §2.4): approximate or
    // sketch-cutoff by design, each carrying property + reproducibility
    // tests instead of a DuckDB hash. A new query missing its oracle must
    // be added HERE deliberately, not slip through silently unchecked.
    val engineOnly = Set(
      "q35_approx_distinct", "q37_minhash_pairs", "q39_simhash_pairs",
      "q40_ann_lsh", "q41_ann_ivf", "q108_equidepth_scale",
      "q113_embed_dedup_blocked", "q114_cosine_topk_blocked",
      "q124_ann_ivf_batch", "q153_ann_ivf_foldin",
      // q166: a 10-step BPE merge fixpoint has no single-SQL twin; pinned
      // by hand-computed merges on a crafted corpus (UtilitiesSpec)
      "q166_bpe_merges",
      // q294: precision/recall of MinHash-LSH candidates vs the exact pair
      // set — the MinHash seeds aren't portable SQL; NorthStarSpec pins
      // the recall floor and the containment identities
      "q294_minhash_quality_eval",
      // q172: a Lloyd kmeans fixpoint has no single-SQL twin; PqSpec pins
      // determinism under re-partitioning, distortion descent, code
      // validity, and the energy upper bound
      "q172_pq_codebook",
      // q173: ADC search over the q172 codebooks (kmeans-derived, no SQL
      // twin); PqSpec pins determinism and the recall floor
      "q173_pq_adc_recall",
      // q188: IVF cells x PQ codes composition (kmeans fixpoints on both
      // levels); PqSpec pins candidate containment, an ADC-over-candidates
      // replay, and the recall floor
      "q188_ivfpq",
      // q200: file counts live outside SQL's data model; LayoutSpec pins
      // rows/content preserved and files_after = target <= files_before
      "q200_compaction",
      // q214: BPE ENCODING with q166's merges (sequential rule application,
      // q166's no-SQL-twin argument); UtilitiesSpec replays the encode in
      // Scala at sf0.001 and pins crafted merges + token round-trip
      "q214_bpe_fertility",
      // q486: LOF over q113's IVF-blocked candidate neighborhoods (the
      // kmeans fixpoint has no SQL twin); ScaleTwinsSpec pins top-15
      // agreement vs the exact q478 baseline
      "q486_lof_blocked",
      // q507/q508: TwoNN / hubness over the same IVF-blocked candidate
      // relation as q486 (same no-SQL-twin argument); ScaleTwinsSpec pins
      // edge recall and statistic drift vs the exact q414/q431 baselines
      "q507_twonn_blocked", "q508_hubness_blocked",
      // q518: match-normalized dedup uses NFKC + Java locale-free case
      // folding, which measurably diverges from DuckDB's utf8proc fold
      // (UtilitiesSpec records upper of sharp-s and lower of dotted-I at
      // pin time) — no portable SQL twin can exist; UtilitiesSpec pins the
      // expression battery, idempotency, and the exact q518 counts
      "q518_match_norm_dedup")
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked === engineOnly,
      s"oracle-less queries drifted from the documented engine-only set; " +
        s"undocumented: ${unchecked -- engineOnly}; stale: ${engineOnly -- unchecked}")
  }
}
