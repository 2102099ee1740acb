package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure — not just argue — the exact-vs-blocked dedup crossover (r5
  * VERDICT item 4): one synthetic corpus past the claimed break-even,
  * comparing the exact all-pairs path (q72's chunked-broadcast compare,
  * n²/2 cosine evals) against the IVF-blocked path (q113's, ~r²·n^1.5/2)
  * on wall-clock AND counted compare volume.
  *
  * Corpus: n 64-dim vectors, fully deterministic (xxhash64-derived
  * components — the library's no-RNG discipline). 2% of ids are
  * near-copies of an earlier seed id (component jitter ±0.01) so a real
  * near-dup relation exists; the rest are hash-uniform, the WORST case
  * for IVF blocking (no cluster structure to exploit), which keeps the
  * cost comparison honest. Threshold 0.6: uniform 64-dim cosines sit at
  * ~N(0, 0.125), so random pairs essentially never cross it and the pair
  * set is dominated by the seeded near-dups.
  *
  * Usage: runMain graft.tools.DebugCrossover [n] [blocked-only]
  * (default 50000). `blocked-only` skips the exact n²/2 path — the mode for
  * n where exact is infeasible BY DESIGN (that's the point of the blocked
  * twin): it reports the blocked wall-clock and counted compare volume, so
  * the volume-fraction slope (≈ r²/√n) can be confirmed past the last point
  * where the exact baseline was measurable.
  */
object DebugCrossover {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugCrossover") {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val blockedOnly = args.contains("blocked-only")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic corpus: seed(id) = id for originals; for the 2% tail,
    // seed cycles back over the head so each tail id is a near-copy pair
    // partner. Components in [-1, 1), jitter ±0.01 keyed by the id itself.
    val nSeeds = math.max(1, n * 49 / 50)
    val emb = spark.range(n.toLong).toDF("vec_id")
      .withColumn("seed",
        when(col("vec_id") < nSeeds, col("vec_id"))
          .otherwise(pmod(col("vec_id") * 2654435761L, lit(nSeeds.toLong))))
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          (pmod(xxhash64(lit("v"), col("seed"), d), lit(2000001L)) - 1000000L)
            .cast("double") / 1000000.0
          + (pmod(xxhash64(lit("j"), col("vec_id"), d), lit(2001L)) - 1000L)
            .cast("double") / 100000.0).as("ev"))
      .withColumn("nrm", sqrt(graft.operators.Similarity.dot(col("ev"), col("ev"))))
    val mat = graft.Checkpoints.materialize(
      emb.repartition(cpus.toInt, col("vec_id")))
    println(s"CORPUS n=${mat.count()} dims=64 seeds=$nSeeds")

    val minCos = 0.6

    // blocked path (q113's): index build + within-cluster verify
    val embCol = mat.select(col("vec_id"), col("ev").as("embedding"))
    graft.similarity.Ann.clearIndexCache()
    val t1 = System.nanoTime()
    val blocked = graft.operators.NorthStar.ivfBlockedPairs(embCol, minCos = minCos)
      .count()
    val blockedSec = (System.nanoTime() - t1) / 1e9
    // counted compare volume: candidate pairs before the cosine filter
    val k = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    val (assigned, _) = graft.similarity.Ann.ivfIndexCached(
      embCol, "vec_id", "embedding", k = k, refineIters = 1, assignReplicas = 4)
    val a = assigned.select(col("cid"), col("id").as("id1"))
    val b = assigned.select(col("cid"), col("id").as("id2"))
    val blockedVolume = a.join(b, Seq("cid")).filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct().count()
    println(f"BLOCKED wall ${blockedSec}%.1f s, pairs >=${minCos} $blocked, " +
      f"compare volume $blockedVolume (${blockedVolume * 100.0 / (n.toDouble * n / 2)}%.2f%% of n²/2)")

    if (blockedOnly) {
      // the seeded near-dup relation size is known by construction (each
      // tail id is a jittered copy of one seed), so recall against the
      // DESIGNED pair count still gets reported without the n²/2 scan
      val seeded = (n - nSeeds).toLong
      println(f"BLOCKED-ONLY n=$n: ${blockedSec}%.1f s, found $blocked of ~$seeded seeded " +
        f"near-dup pairs (${blocked.toDouble / math.max(1L, seeded)}%.3f); " +
        f"volume fraction ${blockedVolume * 100.0 / (n.toDouble * n / 2)}%.2f%% " +
        "(exact path skipped: infeasible at this n by design)")
    } else {
      // exact path (q72's): chunked-broadcast all-pairs
      val t2 = System.nanoTime()
      val exact = graft.operators.Similarity.exactCosinePairs(mat)
        .filter(round(col("cos"), 6) >= minCos).count()
      val exactSec = (System.nanoTime() - t2) / 1e9
      val exactVolume = n.toDouble * n / 2
      println(f"EXACT   wall ${exactSec}%.1f s, pairs >=${minCos} $exact, " +
        f"compare volume ${exactVolume}%.0f")
      println(f"CROSSOVER n=$n: blocked ${blockedSec}%.1f s vs exact ${exactSec}%.1f s " +
        f"(${exactSec / blockedSec}%.1fx); recall ${blocked.toDouble / math.max(1, exact)}%.3f")
    }
    spark.stop()
  }
}
