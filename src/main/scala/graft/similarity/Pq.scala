package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Product quantization — the memory side of ANN at 100 TB: a 64-dim float
  * vector (256 B) compresses to M=8 one-byte codes by quantizing each 8-dim
  * subspace against its own K=16 codebook, a 32× shrink that lets a
  * 100 TB embedding corpus hold its code table in a fraction of cluster
  * RAM while IVF (q41/q124/q153) prunes candidates and exact re-ranking
  * (q60's kernel) runs on the survivors only.
  *
  * Everything is deterministic by construction so the engine-only pins can
  * demand bit-stable output under ANY partitioning: seeds are the K
  * smallest vec_ids' subvectors, Lloyd assignment breaks distance ties on
  * the smaller centroid id via one struct-min, and centroid refinement
  * averages through DECIMAL(28,12) sums — exact, associative,
  * order-independent (the float-mean of a parallel kmeans is famously NOT).
  * Empty clusters drop (standard Lloyd; k_used ≤ K is reported per
  * subspace).
  *
  * Scale shape: the codebook relation is M·K ≤ 128 rows — always broadcast;
  * assignment and refinement are one keyed aggregate each per iteration,
  * shuffle ∝ corpus (refinement moves only (m, cid, dim) partial sums after
  * map-side combine, never vectors).
  */
object Pq {

  /** Squared L2 between equal-length double arrays — codegen'd HOF fold. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** (vec_id, m, sub): the corpus split into `mSub` subvectors of `subDim`. */
  def subvectors(emb: DataFrame, idCol: String, embCol: String,
                 mSub: Int, subDim: Int): DataFrame = {
    val ev = transform(col(embCol), x => x.cast("double"))
    emb.select(col(idCol).as("vec_id"), posexplode(
      array((0 until mSub).map(m => slice(ev, m * subDim + 1, subDim)): _*))
      .as(Seq("m", "sub")))
  }

  /** Nearest-centroid assignment: per (vec_id, m) the (dist, cid) struct-min
    * — ties go to the smaller centroid id. `sub` is constant within the
    * group, so `first` is deterministic here.
    */
  def assign(subs: DataFrame, centroids: DataFrame): DataFrame =
    subs.join(broadcast(centroids), Seq("m"))
      .select(col("vec_id"), col("m"), col("sub"),
        struct(l2sq(col("sub"), col("cv")).as("dist"), col("cid")).as("sc"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(col("sc")).as("sc"), first(col("sub")).as("sub"))
      .select(col("vec_id"), col("m"), col("sc.cid").as("cid"),
        col("sc.dist").as("dist"), col("sub"))

  /** Per-(m, cid) centroid = per-dimension exact decimal mean of members. */
  def refine(assigned: DataFrame): DataFrame =
    assigned.select(col("m"), col("cid"), posexplode(col("sub")).as(Seq("dim", "x")))
      .groupBy(col("m"), col("cid"), col("dim"))
      .agg((sum(col("x").cast(DecimalType(28, 12))) / count(lit(1)))
        .cast("double").as("v"))
      .groupBy(col("m"), col("cid"))
      .agg(array_sort(collect_list(struct(col("dim"), col("v")))).as("sv"))
      .select(col("m"), col("cid"),
        transform(col("sv"), e => e.getField("v")).as("cv"))

  /** Train the codebooks: deterministic seeds (the K smallest vec_ids'
    * subvectors), `iters` Lloyd rounds, final assignment returned alongside.
    */
  def codebook(emb: DataFrame, idCol: String, embCol: String,
               mSub: Int = 8, subDim: Int = 8, k: Int = 16,
               iters: Int = 2): (DataFrame, DataFrame) = {
    val subs = subvectors(emb, idCol, embCol, mSub, subDim)
    var centroids = subs.filter(col("vec_id") < k)
      .select(col("m"), col("vec_id").cast("int").as("cid"), col("sub").as("cv"))
    // materialize the ≤ M·K-row codebook per round: each refine chains a
    // join + two aggregates, and an unmaterialized loop re-executes every
    // prior round per consumer (the q81 lesson)
    for (_ <- 1 to iters)
      centroids = graft.Checkpoints.materialize(refine(assign(subs, centroids)))
    (centroids, assign(subs, centroids))
  }

  private final case class CbKey(sessionUUID: String, semanticHash: Int,
                                 idCol: String, embCol: String,
                                 mSub: Int, subDim: Int, k: Int, iters: Int)

  private val cbCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[CbKey, (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[CbKey, (org.apache.spark.sql.DataFrame,
            org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]): Boolean =
        size() > 8
    })

  /** Train-once view of [[codebook]] — the [[graft.similarity.Ann
    * .ivfIndexCached]] discipline applied to the PQ side: q172 (codebook
    * audit), q173 (ADC recall) and q188 (IVFPQ) all train over the same
    * embeddings relation, and the 2-round Lloyd fixpoint is their shared
    * dominant fixed cost. Keyed by (session, canonical plan, params) with
    * `sameSemantics` confirming the hash; both relations are materialized
    * (lineage-cut) before caching. Overwrite the input table →
    * [[clearCodebookCache]].
    */
  def codebookCached(emb: DataFrame, idCol: String, embCol: String,
                     mSub: Int = 8, subDim: Int = 8, k: Int = 16,
                     iters: Int = 2): (DataFrame, DataFrame) = {
    val key = CbKey(System.identityHashCode(emb.sparkSession).toString,
      emb.semanticHash(), idCol, embCol, mSub, subDim, k, iters)
    val hit = cbCache.get(key)
    if (hit != null && (hit._1.sparkSession eq emb.sparkSession) &&
        hit._1.sameSemantics(emb)) (hit._2, hit._3)
    else {
      val (centroids, assigned) = codebook(emb, idCol, embCol, mSub, subDim, k, iters)
      val cM = graft.Checkpoints.materialize(centroids)
      val aM = graft.Checkpoints.materialize(assigned)
      cbCache.put(key, (emb, cM, aM))
      (cM, aM)
    }
  }

  /** Drop every memoized codebook (use after overwriting an input table). */
  def clearCodebookCache(): Unit = cbCache.clear()
}
