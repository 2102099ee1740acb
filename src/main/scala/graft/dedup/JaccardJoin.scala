package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT Jaccard similarity self-join via prefix filtering (the AllPairs /
  * PPJoin family) — the complete counterpart to [[MinHashLSH]]'s estimated
  * candidates: every unordered document pair with shingle-set Jaccard ≥ t is
  * returned, with its exact score.
  *
  * Why this scales where naive formulations don't:
  *   - joining on "any shared shingle" is complete but quadratic in the
  *     hottest shingle's document frequency (stop-shingles pair everything);
  *   - prefix filtering orders each document's shingles by ascending global
  *     document frequency (rarest first) and joins only on each document's
  *     first `|S| - ceil(t·|S|) + 1` shingles. Completeness: J(A,B) ≥ t
  *     implies |A∩B| ≥ t·|A| (since |B| ≥ |A∩B|), so fewer than
  *     `|A| - ceil(t·|A|) + 1` prefix elements can't swallow the whole
  *     intersection — the globally-smallest shared shingle lands in BOTH
  *     prefixes and the prefix-prefix equi-join finds the pair. Rare-first
  *     ordering makes those join keys the LOW-frequency shingles, so bucket
  *     sizes (and shuffle fan-out) collapse;
  *   - candidates are pruned IN the join condition by the PPJoin length
  *     filter (t·|A| ≤ |B| when |A| ≤ |B|) and positional filter (at the
  *     globally-smallest shared shingle, ranked i in A and j in B, overlap
  *     can't exceed 1 + min(|A|−i, |B|−j) — every other shared shingle sits
  *     after it in BOTH lists because the order is global);
  *   - verification joins each surviving pair to two per-document sorted
  *     shingle-hash arrays and counts `array_intersect` in one codegen'd
  *     expression — no row-explosion re-join of the shingle table.
  *
  * Shingles are compared through xxhash64: deterministic, and with k
  * distinct shingles the probability of ANY colliding pair is ≈ k²/2⁶⁵
  * (< 10⁻⁷ even at 10⁹ shingles), in which case the oracle cross-check
  * would flag it — observed exact on all test corpora.
  *
  * All set arithmetic is integer-exact; the Jaccard threshold is applied as
  * `(tNum+tDen)·|A∩B| ≥ tNum·(|A|+|B|)` on longs, so an oracle engine
  * reproduces the pair set bit-for-bit with no float-boundary flakes.
  */
object JaccardJoin {

  /** (id, shingle-hash), deduped and materialized — it feeds sizes,
    * frequencies, ranking AND verification (localCheckpoint caches the
    * shuffle output and truncates lineage; on a production cluster with
    * executor churn, prefer checkpoint() to reliable storage).
    * Repartition BEFORE the explode: a small-file corpus otherwise tokenizes
    * on however few input splits the scan produced (1 task for a single
    * parquet file); the raw-text shuffle is cheap relative to shingling and
    * a no-op burden at scale where the scan already has thousands of splits.
    * The partition count is EXPLICIT because AQE would coalesce a
    * byte-small exchange back to one partition — the work here is CPU per
    * row (tokenize + shingle + hash), which byte-based coalescing can't see.
    */
  private def shingleRel(df: DataFrame, idCol: String, textCol: String,
                         shingleWidth: Int): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).cast("long").as("id"),
        explode(MinHashLSH.shingles(toks, shingleWidth)).as("shs"))
      .select(col("id"), xxhash64(col("shs")).as("sh"))
      .distinct()
      .transform(graft.Checkpoints.materialize(_))
  }

  /** Per-document sorted shingle-hash array + set size (verification side). */
  private def setsOf(sh: DataFrame): DataFrame =
    sh.groupBy(col("id"))
      .agg(sort_array(collect_list(col("sh"))).as("hs"), count(lit(1)).as("n"))

  /** Prefix relation (id, sh, rk, n) under the GIVEN global rare-first
    * order: rank each document's shingles by ascending `freq` df (hash
    * tiebreak for determinism) and keep the first |S| - ceil(t·|S|) + 1.
    * The `freq` relation must span every document that will be joined —
    * completeness needs both sides of a pair ranked under the SAME order.
    */
  private def prefixOf(sh: DataFrame, freq: DataFrame, sets: DataFrame,
                       tNum: Long, tDen: Long): DataFrame = {
    val ranked = sh.join(freq, Seq("sh"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("sh"))))
      .drop("df")
      .join(sets.select(col("id"), col("n")), Seq("id"))
    // prefix length |S| - ceil(t|S|) + 1; ceil on longs (Spark's `/` is
    // double division, so `div`)
    val ceilTn = expr(s"(n * $tNum + ${tDen - 1L}) div $tDen")
    ranked
      .filter(col("rk") <= col("n") - ceilTn + 1L)
      .select(col("id"), col("sh"), col("rk"), col("n"))
      .transform(graft.Checkpoints.materialize(_))
  }

  /** PPJoin candidate join + exact verify between two prefix relations;
    * `cond` carries the caller's pair constraint (id1 < id2 for the
    * symmetric self-join; none for the asymmetric two-corpus join).
    */
  private def joinVerified(prefixA: DataFrame, prefixB: DataFrame,
                           setsA: DataFrame, setsB: DataFrame,
                           tNum: Long, tDen: Long,
                           symmetric: Boolean): DataFrame = {
    val a = prefixA.select(col("id").as("id1"), col("sh"),
      col("rk").as("rk1"), col("n").as("n1"))
    val b = prefixB.select(col("id").as("id2"), col("sh"),
      col("rk").as("rk2"), col("n").as("n2"))
    val minSuffix = least(col("n1") - col("rk1"), col("n2") - col("rk2"))
    val base = a("sh") === b("sh") &&
      // length filter: t·max ≤ min
      col("n1") * tNum <= col("n2") * tDen && col("n2") * tNum <= col("n1") * tDen &&
      // positional filter at this (possibly smallest) shared shingle
      (minSuffix + 1L) * (tNum + tDen) >= (col("n1") + col("n2")) * tNum
    val cand = a.join(b, if (symmetric) base && col("id1") < col("id2") else base)
      .select(col("id1"), col("id2"))
      .distinct()
    // verify: one sorted-array intersection per candidate pair
    val s1 = setsA.select(col("id").as("id1"), col("hs").as("hs1"), col("n").as("n1"))
    val s2 = setsB.select(col("id").as("id2"), col("hs").as("hs2"), col("n").as("n2"))
    cand.join(s1, Seq("id1")).join(s2, Seq("id2"))
      .withColumn("inter", size(array_intersect(col("hs1"), col("hs2"))).cast("long"))
      .filter(col("inter") * (tNum + tDen) >= (col("n1") + col("n2")) * tNum)
      .select(col("id1"), col("id2"), col("inter"), col("n1"), col("n2"),
        round(col("inter").cast("double")
          / (col("n1") + col("n2") - col("inter")), 6).as("jaccard"))
  }

  /** Exact-Jaccard pairs (id1 < id2, jaccard ≥ tNum/tDen) over word-level
    * w-shingles of `textCol`. Returns (id1, id2, inter, n1, n2, jaccard)
    * with jaccard rounded to 6 dp (D5) — the threshold itself is integer.
    */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            tNum: Long, tDen: Long, shingleWidth: Int = 3): DataFrame = {
    val sh = shingleRel(df, idCol, textCol, shingleWidth)
    val sets = setsOf(sh)
    // global rare-first order; ties broken by hash value for determinism
    val freq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val prefix = prefixOf(sh, freq, sets, tNum, tDen)
    joinVerified(prefix, prefix, sets, sets, tNum, tDen, symmetric = true)
  }

  /** Asymmetric exact-Jaccard join: every (left id, right id) pair with
    * jaccard ≥ tNum/tDen — the INCREMENTAL dedup shape (today's crawl delta
    * vs the standing corpus): compare volume is delta-prefix × corpus-prefix
    * joins, never corpus × corpus, so a daily increment against a 100 TB
    * standing index costs ∝ |delta|'s rare-shingle joins, not the corpus
    * quadratic. The document-frequency order spans BOTH sides (one shared
    * `freq` relation): the prefix-filtering completeness proof needs the
    * globally-smallest shared shingle of a qualifying pair to land in both
    * prefixes under the SAME order, which per-side frequencies would break.
    * Left and right ids must be disjoint (they are distinct corpora).
    */
  def pairsBetween(left: DataFrame, right: DataFrame,
                   idCol: String, textCol: String,
                   tNum: Long, tDen: Long, shingleWidth: Int = 3): DataFrame = {
    val shL = shingleRel(left, idCol, textCol, shingleWidth)
    val shR = shingleRel(right, idCol, textCol, shingleWidth)
    // (id, sh) rows are distinct per side and ids are disjoint across sides,
    // so the plain union double-counts nothing
    val freq = shL.union(shR).groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val setsL = setsOf(shL)
    val setsR = setsOf(shR)
    val pL = prefixOf(shL, freq, setsL, tNum, tDen)
    val pR = prefixOf(shR, freq, setsR, tNum, tDen)
    joinVerified(pL, pR, setsL, setsR, tNum, tDen, symmetric = false)
  }

  /** A prebuilt standing-corpus index for repeated [[pairsAgainst]] probes:
    * the corpus's shingle frequencies (which DEFINE the rare-first order),
    * verification sets and prefix relation, each materialized once.
    */
  final case class Index(freq: DataFrame, sets: DataFrame, prefix: DataFrame,
                         tNum: Long, tDen: Long, shingleWidth: Int)

  /** Build the standing-corpus side once — the continuous-ingest shape:
    * every arriving delta batch probes this index instead of re-shingling
    * and re-ranking the corpus per batch.
    */
  def buildIndex(corpus: DataFrame, idCol: String, textCol: String,
                 tNum: Long, tDen: Long, shingleWidth: Int = 3): Index = {
    val sh = shingleRel(corpus, idCol, textCol, shingleWidth)
    val freq = graft.Checkpoints.materialize(
      sh.groupBy(col("sh")).agg(count(lit(1)).as("df")))
    val sets = setsOf(sh)
    Index(freq, sets, prefixOf(sh, freq, sets, tNum, tDen), tNum, tDen, shingleWidth)
  }

  private final case class IndexKey(session: String, semanticHash: Int,
                                    idCol: String, textCol: String,
                                    tNum: Long, tDen: Long, shingleWidth: Int)

  // same shape as Ann's IVF index cache: entries hold materialized
  // (lineage-cut) relations, at most 8 retained, LRU; the key is the
  // canonicalized corpus PLAN (semanticHash + sameSemantics to rule out
  // collisions), not a data snapshot — clearIndexCache() after overwriting
  // the files behind the plan
  private val indexCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[IndexKey, (DataFrame, Index)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[IndexKey, (DataFrame, Index)]): Boolean =
        size() > 8
    })

  /** Build-once view of [[buildIndex]]: memoizes per (session, corpus plan,
    * params) so repeated probes in one session — a streaming drain's
    * micro-batches, a sweep running several delta checks — pay the corpus
    * shingling/ranking once.
    */
  def buildIndexCached(corpus: DataFrame, idCol: String, textCol: String,
                       tNum: Long, tDen: Long, shingleWidth: Int = 3): Index = {
    val key = IndexKey(System.identityHashCode(corpus.sparkSession).toString,
      corpus.semanticHash(), idCol, textCol, tNum, tDen, shingleWidth)
    val hit = indexCache.get(key)
    if (hit != null && (hit._1.sparkSession eq corpus.sparkSession) &&
        hit._1.sameSemantics(corpus)) hit._2
    else {
      val built = buildIndex(corpus, idCol, textCol, tNum, tDen, shingleWidth)
      indexCache.put(key, (corpus, built))
      built
    }
  }

  /** Drop every memoized index (use after overwriting an input table). */
  def clearIndexCache(): Unit = indexCache.clear()

  /** Exact-Jaccard pairs between a (small) delta and a prebuilt corpus
    * index: (delta id, corpus id, inter, n1, n2, jaccard ≥ tNum/tDen).
    * The total order here is the INDEX's — corpus document frequency with
    * hash tiebreak; delta shingles unseen in the corpus take df = 0 and
    * rank rarest-first. Any fixed total order satisfies the prefix-filter
    * completeness theorem (the globally-smallest shared shingle of a
    * qualifying pair lands in both prefixes), and the exact verify step
    * makes the emitted pair set identical to [[pairsBetween]]'s regardless
    * of which order generated the candidates — pinned in JaccardJoinSpec.
    * This is also why per-micro-batch probes compose: the pair set is a
    * per-pair predicate, so probing batch-by-batch unions to exactly the
    * whole-delta result at any batch slicing.
    */
  def pairsAgainst(index: Index, delta: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val shL = shingleRel(delta, idCol, textCol, index.shingleWidth)
    val setsL = setsOf(shL)
    // rank under the index's order; corpus-unseen shingles get df 0
    val ranked = shL.join(index.freq, Seq("sh"), "left_outer")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("sh"))))
      .drop("df")
      .join(setsL.select(col("id"), col("n")), Seq("id"))
    val ceilTn = expr(s"(n * ${index.tNum} + ${index.tDen - 1L}) div ${index.tDen}")
    val pL = ranked
      .filter(col("rk") <= col("n") - ceilTn + 1L)
      .select(col("id"), col("sh"), col("rk"), col("n"))
    joinVerified(pL, index.prefix, setsL, index.sets,
      index.tNum, index.tDen, symmetric = false)
  }
}
