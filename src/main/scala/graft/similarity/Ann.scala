package graft.similarity

import graft.functions.VectorFunctions
import graft.operators.Similarity.asDouble
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Approximate nearest-neighbor scale paths over an embedding column —
  * complements the exact brute-force probe (Q30). Two variants:
  *
  *   - Random-hyperplane LSH: sign-bit signatures from deterministic
  *     pseudo-random planes; same-bucket vectors are candidates. Many-to-many
  *     near-dup discovery without the O(n²) cross join.
  *   - IVF (inverted file): vectors clustered to the nearest of K centroids
  *     (fixed-id seeds + deterministic k-means refinement); a probe searches
  *     only the closest `nprobe` clusters.
  *
  * Everything is deterministic at any parallelism: planes and seed centroids
  * are hash/id-derived, and centroid means use exact decimal per-dimension
  * sums (order-independent) before the double division.
  */
object Ann {

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * derived from xxhash64(plane, dim) — no RNG state, reproducible anywhere.
    */
  private def planeComponent(plane: Column, dim: Column): Column =
    (pmod(xxhash64(lit("plane"), plane, dim), lit(2000001L)) - 1000000L).cast("double") / 1000000.0

  /** `nPlanes`-bit LSH signature of an embedding (sign of projection per plane). */
  def lshSignature(emb: Column, nPlanes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(nPlanes - 1)), p =>
        when(aggregate(
          zip_with(emb, sequence(lit(0), size(emb) - 1),
            (x, i) => x * planeComponent(p, i)),
          lit(0.0), (acc, x) => acc + x) >= 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  /** Candidate near-dup pairs from same-bucket LSH collisions, verified with
    * exact cosine. Returns (id1, id2, cos) sorted by similarity.
    */
  def lshNearDupPairs(emb: DataFrame, idCol: String, embCol: String,
                      nPlanes: Int = 8): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    // repartitioned so signature projection parallelizes on few-split
    // corpora; materialized so the bucket self-join doesn't compute the
    // nPlanes×dim signature fold once per side
    val sig = graft.Checkpoints.materialize(emb
      .repartition(emb.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("id"), asDouble(col(embCol)).as("ev"),
        lshSignature(asDouble(col(embCol)), nPlanes).as("bucket")))
    val a = sig.select(col("bucket"), col("id").as("id1"), col("ev").as("ev1"))
    val b = sig.select(col("bucket"), col("id").as("id2"), col("ev").as("ev2"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), round(VectorFunctions.cosineSim(col("ev1"), col("ev2")), 6).as("cos"))
  }

  /** Assign each vector to its `replicas` most-similar centroids (broadcast
    * K rows; deterministic tie-break toward the smaller centroid id).
    * `crank` = 1 is the primary assignment (used for refinement); ranks 2..r
    * are index REPLICAS — the standard IVF multi-assignment trade: r× index
    * entries buy recall at a fixed nprobe, because near-boundary vectors sit
    * in every cluster they straddle instead of exactly one.
    */
  private def assignTo(vecs: DataFrame, centroids: DataFrame,
                       replicas: Int = 1): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("sim").desc, col("cid"))
    vecs.crossJoin(broadcast(centroids))
      .select(col("id"), col("ev"), col("cid"),
        VectorFunctions.cosineSim(col("ev"), col("cv")).as("sim"))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= replicas)
      .select(col("id"), col("cid"), col("ev"), col("crank"))
  }

  /** One deterministic Lloyd step: per-cluster per-dimension means via exact
    * decimal sums (order-independent at any partitioning), reassembled into
    * centroid vectors ordered by dimension. Empty clusters drop out.
    */
  private def refineCentroids(assigned: DataFrame): DataFrame = {
    val byDim = assigned
      .select(col("cid"), posexplode(col("ev")))
      .groupBy(col("cid"), col("pos"))
      .agg((sum(col("col").cast(DecimalType(28, 14))).cast("double") / count(lit(1))).as("m"))
    byDim.groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cv"))
  }

  /** Farthest-point seeds (k-means++-style, deterministic): a BOUNDED
    * hash-ordered sample (distributed top-`sampleSize` by xxhash64 — constant
    * driver memory at ANY corpus size, ~256 KB at 512×64 doubles) is swept
    * greedily, always adding the vector least similar to its closest chosen
    * seed. Replaces first-k-ids seeding, which at round 3 measured 0.60
    * recall@10 — ids cluster by insertion order, so whole regions of the
    * corpus got no seed and their neighborhoods split across foreign
    * clusters (numbers in BENCH.md).
    */
  private def farthestPointSeeds(vecs: DataFrame, k: Int,
                                 sampleSize: Int = 512): Array[(Long, Array[Double])] = {
    val sample = vecs
      .orderBy(xxhash64(lit("seed"), col("id")), col("id"))
      .limit(sampleSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    if (sample.isEmpty) return Array.empty
    val chosen = scala.collection.mutable.ArrayBuffer(sample.minBy(_._1))
    while (chosen.size < k && chosen.size < sample.length) {
      val next = sample.iterator
        .filterNot(s => chosen.exists(_._1 == s._1))
        .minBy(s => chosen.iterator.map(c => cos(s._2, c._2)).max)
      chosen += next
    }
    chosen.toArray
  }

  /** IVF index: (assignments, centroids) after deterministic farthest-point
    * seeding and `refineIters` deterministic k-means refinements.
    */
  def ivfIndex(emb: DataFrame, idCol: String, embCol: String,
               k: Int = 16, refineIters: Int = 1,
               assignReplicas: Int = 1): (DataFrame, DataFrame) = {
    VectorFunctions.register(emb.sparkSession)
    val spark = emb.sparkSession
    import spark.implicits._
    // materialized per step: assignments feed refinement AND multiple probe
    // consumers, and iteration would otherwise stack re-executed crossJoin+
    // aggregate lineage per refinement round
    val vecs = emb.select(col(idCol).as("id"), asDouble(col(embCol)).as("ev"))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism, col("id"))
    var centroids = farthestPointSeeds(vecs, k).toSeq
      .map { case (id, v) => (id, v.toSeq) }.toDF("cid", "cv")
    // replicas from the FIRST assignment: refinement filters to crank === 1
    // anyway (identical primaries at any replica count), and computing the
    // single-replica assignment separately would be a wasted crossJoin+window
    // pass when refineIters == 0
    var assigned = graft.Checkpoints.materialize(assignTo(vecs, centroids, assignReplicas))
    for (_ <- 0 until refineIters) {
      // refinement means use PRIMARY assignments only — replicas would
      // double-count boundary vectors and drag centroids together
      centroids = graft.Checkpoints.materialize(
        refineCentroids(assigned.filter(col("crank") === 1)))
      assigned = graft.Checkpoints.materialize(assignTo(vecs, centroids, assignReplicas))
    }
    (assigned, centroids)
  }

  /** Backward-compatible assignment-only view of [[ivfIndex]]. */
  def ivfAssign(emb: DataFrame, idCol: String, embCol: String, k: Int): DataFrame =
    ivfIndex(emb, idCol, embCol, k, refineIters = 0)._1

  private final case class IndexKey(sessionUUID: String, semanticHash: Int,
                                    idCol: String, embCol: String,
                                    k: Int, refineIters: Int, assignReplicas: Int)

  // small LRU: each value is a MATERIALIZED assignment relation (the
  // dominant fixed cost of every blocked/probed consumer), so the cache is
  // deliberately tiny — a pipeline rarely runs more than a few corpora at
  // once, and eviction only drops a lineage-cut handle, not live state
  private val indexCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[IndexKey, (DataFrame, DataFrame, DataFrame)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[IndexKey, (DataFrame, DataFrame, DataFrame)]): Boolean =
        size() > 8
    })

  /** Build-once view of [[ivfIndex]]: memoizes the built (assignments,
    * centroids) per (session, input PLAN, params), so several queries over
    * the same embeddings relation — e.g. the q113 blocked dedup and the
    * q114 blocked top-k in one sweep — share ONE k-means seeding +
    * assignment instead of each paying the index build, which the sf0.1
    * crossover analysis measured as the dominant fixed cost (BENCH.md).
    * The key is the canonicalized logical plan (`semanticHash` +
    * `sameSemantics` to rule out hash collisions), NOT a data snapshot: if
    * the files behind the plan are overwritten mid-session, call
    * [[clearIndexCache]]. Entries hold materialized (lineage-cut)
    * DataFrames; at most 8 are retained, LRU.
    */
  def ivfIndexCached(emb: DataFrame, idCol: String, embCol: String,
                     k: Int, refineIters: Int = 1,
                     assignReplicas: Int = 1): (DataFrame, DataFrame) = {
    val key = IndexKey(System.identityHashCode(emb.sparkSession).toString,
      emb.semanticHash(), idCol, embCol, k, refineIters, assignReplicas)
    val hit = indexCache.get(key)
    if (hit != null && (hit._1.sparkSession eq emb.sparkSession) &&
        hit._1.sameSemantics(emb)) (hit._2, hit._3)
    else {
      val (assigned, centroids) =
        ivfIndex(emb, idCol, embCol, k, refineIters, assignReplicas)
      indexCache.put(key, (emb, assigned, centroids))
      (assigned, centroids)
    }
  }

  /** Drop every memoized index (use after overwriting an input table). */
  def clearIndexCache(): Unit = indexCache.clear()

  /** Order-independent corpus fingerprint (count + sum of per-row hash
    * residues over (id, embedding)) for persisted-index validation: one
    * scan of the raw embeddings, no index math — cheap enough for every
    * load. Same scheme as JaccardJoin's.
    */
  private def corpusFingerprint(emb: DataFrame,
                                idCol: String, embCol: String): (Long, Long) = {
    val r = emb.agg(
      count(lit(1)),
      coalesce(sum(pmod(xxhash64(col(idCol), col(embCol)), lit(1000000007L))), lit(0L)))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Persist an IVF index (assignments + centroids + one-row meta with the
    * corpus fingerprint) so a daily pipeline stops paying the per-session
    * k-means rebuild — [[ivfIndexCached]] only memoizes within a session.
    */
  def saveIvfIndex(index: (DataFrame, DataFrame), emb: DataFrame,
                   idCol: String, embCol: String, dir: String): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (fpN, fpSum) = corpusFingerprint(emb, idCol, embCol)
    index._1.write.mode("overwrite").parquet(s"$dir/assigned")
    index._2.write.mode("overwrite").parquet(s"$dir/centroids")
    Seq((fpN, fpSum)).toDF("fpCount", "fpSum")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a persisted IVF index; relations are served from the parquet
    * scans — the scan replaces the rebuild.
    */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   dir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/assigned"), spark.read.parquet(s"$dir/centroids"))

  /** [[loadIvfIndex]] + validity check against the current corpus: a stale
    * index silently misassigns new/changed vectors (recall loss with no
    * error), so a fingerprint mismatch refuses loudly instead.
    */
  def loadIvfIndexValidated(spark: org.apache.spark.sql.SparkSession, dir: String,
                            emb: DataFrame,
                            idCol: String, embCol: String): (DataFrame, DataFrame) = {
    val m = spark.read.parquet(s"$dir/meta").head()
    val (fpN, fpSum) = corpusFingerprint(emb, idCol, embCol)
    if (m.getAs[Long]("fpCount") != fpN || m.getAs[Long]("fpSum") != fpSum)
      throw new IllegalStateException(
        s"persisted IVF index at $dir was built from a different corpus " +
          s"(stored (${m.getAs[Long]("fpCount")}, ${m.getAs[Long]("fpSum")}) vs " +
          s"current ($fpN, $fpSum)) — rebuild with ivfIndex or point at the " +
          "matching corpus snapshot")
    loadIvfIndex(spark, dir)
  }

  /** Fold NEW vectors into a standing IVF index — the update half of the
    * continuous-ingest story, [[graft.dedup.JaccardJoin.foldIn]]'s ANN
    * twin: the delta is assigned to the EXISTING centroids (one bounded
    * broadcast join, the only per-delta cost — never a re-cluster of the
    * corpus) and unioned into the assignment relation. Centroids are
    * deliberately NOT re-fit: assignment is per-vector, so probing the
    * folded index is EXACTLY probing an index whose assignments were
    * computed over corpus ∪ delta against the same centroids (pinned in
    * NorthStarSpec, along with fold-in order invariance). What a k-means
    * refit would change is centroid PLACEMENT — as folded deltas shift the
    * distribution, frozen centroids drift from it and recall at fixed
    * nprobe decays; the decay is MEASURED (BENCH.md round-8 drift curve:
    * robust at nprobe=4 through full decorrelation, a 26% recall gap at
    * nprobe=1) and the rebuild trigger is [[assignQuality]] +
    * [[shouldRebuildIvf]] — the same trade as JaccardJoin.foldIn's prefix
    * re-rank note, now with its cadence instrument. Delta ids must be
    * disjoint from the standing index's (distinct corpora).
    */
  def foldInIvf(index: (DataFrame, DataFrame), delta: DataFrame,
                idCol: String, embCol: String,
                assignReplicas: Int = 1): (DataFrame, DataFrame) = {
    val (assigned, centroids) = index
    VectorFunctions.register(delta.sparkSession)
    val vecs = delta.select(col(idCol).as("id"), asDouble(col(embCol)).as("ev"))
      .repartition(delta.sparkSession.sparkContext.defaultParallelism, col("id"))
    val deltaAssigned =
      graft.Checkpoints.materialize(assignTo(vecs, centroids, assignReplicas))
    (assigned.unionByName(deltaAssigned), centroids)
  }

  /** Index-health statistic behind the fold-drift REBUILD TRIGGER: the mean
    * cosine between vectors and their PRIMARY centroid, over `assigned`
    * (slice it to the rows of interest — the whole index for a baseline,
    * one fold's ids for a delta check). One bounded broadcast join against
    * the K-row centroid relation + one aggregate — cheap enough per fold.
    *
    * The trigger (measured drift curve in BENCH.md round 8): at build
    * time record `base = assignQuality(assigned, centroids)`; after each
    * fold compare the FOLD's own quality — rebuild when
    * `deltaQuality / base < 0.85` ([[shouldRebuildIvf]]'s default). On the
    * measured biased-drift fixture the ratio tracks recall tightly:
    * recall@10 stays ≥ 0.9 of its fold-0 level while the ratio holds
    * above 0.85 and collapses with it beyond; an unbiased (in-distribution)
    * delta never trips the trigger.
    */
  def assignQuality(assigned: DataFrame, centroids: DataFrame): Double =
    assigned.filter(col("crank") === 1)
      .join(broadcast(centroids), Seq("cid"))
      .agg(avg(VectorFunctions.cosineSim(col("ev"), col("cv"))))
      .head().getDouble(0)

  /** The fold-drift rebuild decision (see [[assignQuality]]): true when the
    * folded delta assigns this much worse than the standing baseline.
    */
  def shouldRebuildIvf(baselineQuality: Double, deltaQuality: Double,
                       ratio: Double = 0.85): Boolean =
    deltaQuality < baselineQuality * ratio

  /** IVF probe: search only the `nprobe` clusters nearest to the query
    * vector; exact cosine within them; top-k out (replica hits dedup'd by
    * id before ranking).
    *
    * Knobs (measured on the sf0.01 embeddings, recall@10 averaged over 4
    * probes — see BENCH.md round-3): nprobe=4/k=16 with single assignment
    * ≈ 0.65; raising nprobe to 6 ≈ 0.78; assignReplicas=2 at nprobe=4
    * ≥ 0.8 for ~2× index entries — the default here. Recall rises with
    * nprobe (linear probe cost) and with assignReplicas (index size);
    * exactness is q30's brute-force path.
    */
  def ivfTopK(emb: DataFrame, idCol: String, embCol: String,
              probeId: Long, k: Int = 16, nprobe: Int = 4, topK: Int = 10,
              refineIters: Int = 1, assignReplicas: Int = 2): DataFrame =
    ivfProbe(ivfIndex(emb, idCol, embCol, k, refineIters, assignReplicas),
      probeId, nprobe, topK)

  /** Probe a PREBUILT IVF index — the batch-probe API: a pipeline that
    * searches many times builds the index once ([[ivfIndex]] or
    * [[ivfIndexCached]]) and pays only nprobe-cluster scans per probe,
    * instead of [[ivfTopK]]'s build-per-call (which remains the declared
    * cold-probe semantics of q41).
    */
  /** Batched IVF probe — the pipeline shape [[ivfProbe]]'s single-id API
    * only models one row of: a whole RELATION of query ids resolved to
    * their top-k in ONE pass (the ANN twin of q69's exact multi-probe).
    * Per stage: probe vectors come from one broadcast semi-join against
    * the primary assignments; each query ranks the K broadcast centroids
    * and keeps its `nprobe` nearest; ONE join of that (qid, cluster)
    * relation against the index yields all candidates, deduped per
    * (qid, id) across replicas, exact-cosine scored, and top-k'd by a
    * per-qid window (state bounded by candidate count per query, never a
    * global sort). The probe side is broadcast throughout — it is the
    * small side by design (a query batch vs the corpus index); a probe
    * relation too big to broadcast is corpus-sized and wants the q113
    * blocked-pairs shape instead. Returns (qid, rank, id, score); each
    * qid's rows equal [[ivfProbe]] of that id verbatim (pinned in
    * NorthStarSpec).
    */
  def ivfProbeAll(index: (DataFrame, DataFrame), probeIds: DataFrame,
                  nprobe: Int = 4, topK: Int = 10): DataFrame = {
    val (assigned, centroids) = index
    val probes = assigned.filter(col("crank") === 1)
      .join(broadcast(probeIds.select(col(probeIds.columns.head).cast("long").as("qid"))),
        col("id") === col("qid"))
      .select(col("qid"), col("ev").as("pv"))
    val wN = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("csim").desc, col("cid2"))
    val near = probes.crossJoin(broadcast(centroids))
      .select(col("qid"), col("pv"), col("cid").as("cid2"),
        VectorFunctions.cosineSim(col("cv"), col("pv")).as("csim"))
      .withColumn("nrk", row_number().over(wN))
      .filter(col("nrk") <= nprobe)
      .select(col("qid"), col("pv"), col("cid2"))
    val wK = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    assigned
      .join(broadcast(near), col("cid") === col("cid2"))
      .select(col("qid"), col("id"), col("ev"), col("pv"))
      .dropDuplicates("qid", "id")
      .select(col("qid"), col("id"),
        round(VectorFunctions.cosineSim(col("ev"), col("pv")), 6).as("score"))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("id"), col("score"))
      .orderBy(col("qid"), col("rank"))
  }

  def ivfProbe(index: (DataFrame, DataFrame),
               probeId: Long, nprobe: Int = 4, topK: Int = 10): DataFrame = {
    val (assigned, centroids) = index
    val probe = assigned.filter(col("id") === probeId && col("crank") === 1)
      .select(col("ev").as("pv"))
    val nearClusters = centroids.crossJoin(broadcast(probe))
      .select(col("cid").as("cid2"), VectorFunctions.cosineSim(col("cv"), col("pv")).as("csim"))
      .orderBy(col("csim").desc, col("cid2")).limit(nprobe)
    assigned
      .join(broadcast(nearClusters), col("cid") === col("cid2"))
      .select(col("id"), col("ev")).dropDuplicates("id")
      .crossJoin(broadcast(probe))
      .select(col("id"), round(VectorFunctions.cosineSim(col("ev"), col("pv")), 6).as("score"))
      .orderBy(col("score").desc, col("id")).limit(topK)
  }
}
