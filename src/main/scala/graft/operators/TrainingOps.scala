package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data pipeline plumbing: splits, shuffles and samples that are
  * HASH-based rather than RNG-based — `rand(seed)` depends on partition
  * layout, so its results change under repartitioning, AQE re-planning or
  * input file re-bucketing; `xxhash64(id, salt)` is a pure function of the
  * row, giving splits that are reproducible on any cluster at any
  * parallelism, stable across reruns, and consistent when new data arrives
  * (a row never silently migrates between train and test).
  */
object TrainingOps {

  private def bucket(id: Column, salt: Long, buckets: Int = 10000): Column =
    pmod(xxhash64(id, lit(salt)), lit(buckets))

  /** Portable arithmetic id-hash bucket in [0, buckets): two multiplicative-
    * congruential rounds mod the Mersenne prime 2^31-1. Every intermediate
    * stays below 2^62, so the arithmetic is exact (and ANSI-overflow-safe) in
    * any engine's 64-bit integers — unlike xxhash64, a DuckDB oracle can
    * replicate it in plain SQL. Mixing is weaker than xxhash64 but plenty for
    * split assignment (MINSTD constants 48271/16807).
    */
  def portableBucket(id: Column, buckets: Int = 10000): Column = {
    val p = 2147483647L
    val h1 = pmod(pmod(id, lit(p)) * 48271L, lit(p))
    val h2 = pmod((h1 + 1L) * 16807L, lit(p))
    pmod(h2, lit(buckets.toLong))
  }

  /** Split-label column via [[portableBucket]] — same contract as
    * [[splitLabel]] (pure function of the id, reproducible at any
    * parallelism) but DuckDB-oracle-checkable.
    */
  def portableSplitLabel(idCol: String, testFraction: Double): Column =
    when(portableBucket(col(idCol)) < math.round(testFraction * 10000).toInt, "test")
      .otherwise("train")

  /** Deterministic disjoint train/test split by id hash. */
  def trainTestSplit(df: DataFrame, idCol: String, testFraction: Double,
                     salt: Long = 0L): (DataFrame, DataFrame) = {
    val cut = math.round(testFraction * 10000).toInt
    val b = bucket(col(idCol), salt)
    (df.filter(b >= cut), df.filter(b < cut))
  }

  /** Split-label column (train/test) for single-pass pipelines. */
  def splitLabel(idCol: String, testFraction: Double, salt: Long = 0L): Column =
    when(bucket(col(idCol), salt) < math.round(testFraction * 10000).toInt, "test")
      .otherwise("train")

  /** Deterministic global shuffle: order by id hash — same permutation on
    * any cluster, unlike `orderBy(rand(seed))`.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long = 0L): DataFrame =
    df.orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))

  /** Deterministic per-stratum sampling: within each stratum value, keep the
    * given fraction of ids by hash threshold (absent strata keep 0).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       fractions: Map[String, Double], salt: Long = 0L): DataFrame = {
    val cutExpr = fractions.foldLeft(lit(0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, math.round(f * 10000).toInt).otherwise(acc)
    }
    df.filter(bucket(col(idCol), salt) < cutExpr)
  }

  /** Deterministic weight-proportional sampling: inclusion probability
    * `baseFraction · min(w, cap)/cap` — long documents are kept more often,
    * the quality/length-weighted corpus-subsampling shape. Decided as a
    * pure integer comparison (`bucket·cap < frac₁₀ₖ·min(w,cap)` — no
    * division anywhere), so the kept-row set is exact, reproducible at any
    * parallelism, and replicable by a SQL oracle with 64-bit arithmetic.
    */
  def portableWeightedSample(df: DataFrame, idCol: String, weightCol: String,
                             baseFraction: Double = 0.25, cap: Long = 800L): DataFrame =
    df.filter(portableBucket(col(idCol)) * cap <
      lit(math.round(baseFraction * 10000)) * least(col(weightCol), lit(cap)))

  /** [[stratifiedSample]] over [[portableBucket]] — same contract, but a
    * DuckDB oracle can replicate the kept-row set exactly in SQL.
    */
  def portableStratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                               fractions: Map[String, Double]): DataFrame = {
    val cutExpr = fractions.toSeq.sortBy(_._1).foldLeft(lit(0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, math.round(f * 10000).toInt).otherwise(acc)
    }
    df.filter(portableBucket(col(idCol)) < cutExpr)
  }
}
