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
    val sig = emb
      .repartition(emb.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("id"), asDouble(col(embCol)).as("ev"),
        lshSignature(asDouble(col(embCol)), nPlanes).as("bucket"))
      .localCheckpoint(true)
    val a = sig.select(col("bucket"), col("id").as("id1"), col("ev").as("ev1"))
    val b = sig.select(col("bucket"), col("id").as("id2"), col("ev").as("ev2"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), round(VectorFunctions.cosineSim(col("ev1"), col("ev2")), 6).as("cos"))
  }

  /** Assign each vector to its most-similar centroid (broadcast K rows;
    * deterministic tie-break toward the smaller centroid id).
    */
  private def assignTo(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .select(col("id"), col("ev"), col("cid"),
        VectorFunctions.cosineSim(col("ev"), col("cv")).as("sim"))
      .groupBy(col("id"))
      .agg(max_by(col("cid"), struct(col("sim"), -col("cid"))).as("cid"),
        first(col("ev")).as("ev"))

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

  /** IVF index: (assignments, centroids) after seeding with the K smallest
    * ids and `refineIters` deterministic k-means refinements.
    */
  def ivfIndex(emb: DataFrame, idCol: String, embCol: String,
               k: Int = 16, refineIters: Int = 1): (DataFrame, DataFrame) = {
    VectorFunctions.register(emb.sparkSession)
    // materialized per step: assignments feed refinement AND multiple probe
    // consumers, and iteration would otherwise stack re-executed crossJoin+
    // aggregate lineage per refinement round
    val vecs = emb.select(col(idCol).as("id"), asDouble(col(embCol)).as("ev"))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism, col("id"))
    var centroids = vecs.filter(col("id") < k).select(col("id").as("cid"), col("ev").as("cv"))
    var assigned = assignTo(vecs, centroids).localCheckpoint(true)
    for (_ <- 0 until refineIters) {
      centroids = refineCentroids(assigned).localCheckpoint(true)
      assigned = assignTo(vecs, centroids).localCheckpoint(true)
    }
    (assigned, centroids)
  }

  /** Backward-compatible assignment-only view of [[ivfIndex]]. */
  def ivfAssign(emb: DataFrame, idCol: String, embCol: String, k: Int): DataFrame =
    ivfIndex(emb, idCol, embCol, k, refineIters = 0)._1

  /** IVF probe: search only the `nprobe` clusters nearest to the query
    * vector; exact cosine within them; top-k out.
    */
  def ivfTopK(emb: DataFrame, idCol: String, embCol: String,
              probeId: Long, k: Int = 16, nprobe: Int = 4, topK: Int = 10,
              refineIters: Int = 1): DataFrame = {
    val (assigned, centroids) = ivfIndex(emb, idCol, embCol, k, refineIters)
    val probe = assigned.filter(col("id") === probeId).select(col("ev").as("pv"))
    val nearClusters = centroids.crossJoin(broadcast(probe))
      .select(col("cid").as("cid2"), VectorFunctions.cosineSim(col("cv"), col("pv")).as("csim"))
      .orderBy(col("csim").desc, col("cid2")).limit(nprobe)
    assigned
      .join(broadcast(nearClusters), col("cid") === col("cid2"))
      .crossJoin(broadcast(probe))
      .select(col("id"), round(VectorFunctions.cosineSim(col("ev"), col("pv")), 6).as("score"))
      .orderBy(col("score").desc, col("id")).limit(topK)
  }
}
