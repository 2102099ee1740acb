package graft.operators

import graft.{Dsl, Tables}
import graft.Dsl._
import graft.dedup.{Components, MinHashLSH, SimHash}
import graft.multimodal.Multimodal
import graft.similarity.Ann
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Engine-only north-star operators (no DuckDB oracle — rows-only check;
  * correctness is property-tested in NorthStarSpec instead): approximate
  * distinct, MinHash/SimHash near-dup, ANN, language ID, rolling-hash
  * fingerprints, multimodal decode.
  */
object NorthStar {
  type Q = (SparkSession, String) => DataFrame

  /** Q35: approx_count_distinct (HLL) next to the exact count — the scale
    * path for D6; the spec asserts the documented error bound.
    */
  def q35ApproxDistinct: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy(col("event_type"))
  }

  /** Q37: MinHash-LSH near-duplicate candidates over documents — top pairs
    * by estimated Jaccard (banded LSH; no O(n²) cross join).
    */
  def q37MinhashPairs: Q = (s, d) => {
    MinHashLSH.candidatePairs(Tables(s, d, "documents"), "doc_id", "text")
      .orderBy(col("est_jaccard").desc, col("id1"), col("id2"))
      .limit(50)
  }

  /** Q39: SimHash fingerprints — all candidate pairs within Hamming radius 7
    * via 8-bit-chunk bucketing. maxDist (7) < blocks (8) keeps the pigeonhole
    * completeness guarantee: every pair within the radius collides on ≥1
    * exact chunk, so the result is the COMPLETE ≤7-bit pair set, not a
    * partial-recall sample (the round-1 maxDist=40/blocks=4 combination
    * silently missed pairs beyond distance 3).
    */
  def q39SimhashPairs: Q = (s, d) => {
    SimHash.candidatePairs(Tables(s, d, "documents"), "doc_id", "text",
        maxDist = 7, blocks = 8)
      .orderBy(col("hamming"), col("id1"), col("id2"))
      .limit(50)
  }

  /** Q40: embedding near-dup pairs via random-hyperplane LSH buckets,
    * exact-cosine verified.
    */
  def q40AnnLsh: Q = (s, d) => {
    Ann.lshNearDupPairs(Tables(s, d, "embeddings"), "vec_id", "embedding")
      .orderBy(col("cos").desc, col("id1"), col("id2"))
      .limit(50)
  }

  /** Q41: IVF top-k probe around vec_id 0 — searches only the nearest
    * clusters (the 100 TB path where brute force stops being free).
    */
  def q41AnnIvf: Q = (s, d) =>
    Ann.ivfTopK(Tables(s, d, "embeddings"), "vec_id", "embedding", probeId = 0L)

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Q42: heuristic language ID — stopword-profile scoring, highest score
    * wins (ties break to the lexicographically larger tag, deterministically).
    */
  def q42LangId: Q = (s, d) => {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words: _*))).as("score"), lit(lang).as("lang"))
    }
    Tables(s, d, "documents")
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        array_max(array(scored: _*)).getField("lang").as("pred_lang"),
        array_max(array(scored: _*)).getField("score").as("score"))
      .orderBy(col("doc_id"))
  }

  /** Q43: rolling-hash document fingerprint (position-sensitive, unlike the
    * md5 content hash of Q36): left-to-right polynomial fold of token hashes
    * modulo a large prime — keeps every step within long range (Spark 4's
    * ANSI mode raises on silent wraparound).
    */
  def q43RollingFp: Q = (s, d) => {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val p = lit(1000000007L)
    val fp = aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * 1000003L + pmod(xxhash64(t), p), p))
    Tables(s, d, "documents")
      .select(col("doc_id"), fp.as("rolling_fp"))
      .groupBy(col("rolling_fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("keep_id"))
  }

  /** Q44: multimodal decode pipeline — binary payloads + typed metadata,
    * stub-decoded per partition, aggregated per format.
    */
  def q44Multimodal: Q = (s, d) => {
    Multimodal.features(s, Tables(s, d, "documents")).toDF()
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        (sum(dec(col("mean_byte"))).cast("double") / count(lit(1))).as("avg_mean_byte"),
        sum(col("frames")).as("total_frames"))
      .orderBy(col("format"))
  }

  /** Q53: deterministic hash-based train/test split + per-split stats —
    * training-pipeline plumbing (reproducible at any parallelism, unlike
    * rand(seed); see [[TrainingOps]]).
    */
  def q53TrainTestSplit: Q = (s, d) => {
    Tables(s, d, "documents")
      .withColumn("split", TrainingOps.splitLabel("doc_id", 0.2))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_id"))
      .orderBy(col("split"))
  }

  /** Q56: full dedup resolution — MinHash-LSH pairs → connected components
    * → one canonical survivor per near-dup group; reports group-size stats.
    */
  def q56DedupResolve: Q = (s, d) => {
    val docs = Tables(s, d, "documents")
    val pairs = MinHashLSH.candidatePairs(docs, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5).select(col("id1"), col("id2"))
    Components.resolveDuplicates(docs, "doc_id", pairs)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("group_size"),
        min(col("doc_id")).as("survivor"))
      .groupBy(col("group_size"))
      .agg(count(lit(1)).as("n_groups"))
      .orderBy(col("group_size"))
  }

  val queries: Map[String, Q] = Map(
    "q53_train_test_split" -> q53TrainTestSplit,
    "q56_dedup_resolve" -> q56DedupResolve,
    "q35_approx_distinct" -> q35ApproxDistinct,
    "q37_minhash_pairs" -> q37MinhashPairs,
    "q39_simhash_pairs" -> q39SimhashPairs,
    "q40_ann_lsh" -> q40AnnLsh,
    "q41_ann_ivf" -> q41AnnIvf,
    "q42_langid" -> q42LangId,
    "q43_rolling_fp" -> q43RollingFp,
    "q44_multimodal" -> q44Multimodal)

  /** Engine-only: no oracle entries. */
  val oracles: Map[String, String] = Map.empty
}
