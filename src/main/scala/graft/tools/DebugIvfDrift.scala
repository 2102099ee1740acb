package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures IVF fold-in drift (round-7 VERDICT item 6): recall under frozen
  * centroids as folded deltas shift the distribution, and the assignment-
  * quality statistic [[graft.similarity.Ann.assignQuality]] that serves as
  * the rebuild trigger.
  *
  * Fixture: the sf0.01 embeddings (500×64) are the standing corpus; each
  * fold derives a 50-vector delta from corpus vectors by adding a growing
  * bias along one fixed direction (deterministic — `ev[0] += s·t` then the
  * fold's vectors renormalize through cosine anyway), modeling a corpus
  * whose new data walks away from the clustered distribution. Per fold:
  *   - recall@10 of the folded-index IVF probe vs brute-force exact
  *     top-10 over the SAME current corpus, probes = 5 of the fold's own
  *     (drifted) vectors — the frontier where frozen centroids are
  *     weakest;
  *   - the fold's assignQuality over the frozen centroids, as a ratio to
  *     the standing baseline.
  * A control run folds UNBIASED deltas (s = 0) to show the trigger stays
  * quiet in-distribution.
  */
object DebugIvfDrift {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugIvfDrift") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.similarity.Ann
    graft.functions.VectorFunctions.register(spark)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    // drift = interpolation toward a fixed coordinate PERMUTATION of the
    // vector (cyclic shift by 7): preserves within-fold neighbor structure
    // (every vector permutes the same way) while walking the fold away from
    // the corpus distribution the centroids were fit on — at a = α·t = 1
    // the fold is fully decorrelated from every centroid. A single-
    // direction additive shift does NOT model this (measured first: the
    // drifted mass stays compact, assigns coherently, and recall holds at
    // 0.84-0.96 even at ratio 0.78 — coherent drift is survivable; what
    // kills IVF recall is drift that DISPERSES the new mass across frozen
    // clusters, which the interpolation produces).
    def drifted(t: Int, alpha: Double): DataFrame = {
      val a = alpha * t
      emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + lit(100000L * t)).as("vec_id"),
          transform(col("embedding"),
            (x, i) => lit(1.0 - a) * x + lit(a) *
              element_at(col("embedding"), ((i + 7) % 64 + 1).cast("int")))
            .as("embedding"))
    }

    def run(label: String, alpha: Double, nprobe: Int): Unit = {
      val standing = Ann.ivfIndex(emb, "vec_id", "embedding",
        k = 16, refineIters = 1, assignReplicas = 2)
      val base = Ann.assignQuality(standing._1, standing._2)
      var idx = standing
      var all = emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("ev"))
      (1 to 10).foreach { t =>
        val delta = drifted(t, alpha)
        idx = Ann.foldInIvf(idx, delta, "vec_id", "embedding", assignReplicas = 2)
        all = all.unionByName(delta.select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("ev")))
        val cur = graft.Checkpoints.materialize(all)
        val probes = (0 until 5).map(i => 100000L * t + i)
        // exact ground truth: brute-force cosine top-10 over the current corpus
        val pv = cur.filter(col("id").isin(probes: _*))
          .select(col("id").as("qid"), col("ev").as("pv"))
        val wK = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
        val exact = cur.crossJoin(broadcast(pv))
          .select(col("qid"), col("id"),
            graft.functions.VectorFunctions.cosineSim(col("ev"), col("pv")).as("score"))
          .withColumn("rk", row_number().over(wK)).filter(col("rk") <= 10)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val got = Ann.ivfProbeAll(idx,
            spark.createDataFrame(probes.map(Tuple1(_))).toDF("qid"), nprobe = nprobe)
          .collect().map(r => (r.getLong(0), r.getLong(2)))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val hits = probes.map(p => (got.getOrElse(p, Set.empty[Long])
          intersect exact.getOrElse(p, Set.empty[Long])).size)
        val dq = Ann.assignQuality(
          idx._1.filter(col("id") >= 100000L * t), idx._2)
        println(f"DRIFT $label np$nprobe fold $t%2d  recall ${hits.sum}%2d/50  " +
          f"deltaQ ${dq}%.4f  ratio ${dq / base}%.4f  " +
          f"rebuild=${Ann.shouldRebuildIvf(base, dq)}")
      }
      println(f"DRIFT $label baselineQ ${base}%.4f")
    }

    run("biased", alpha = 0.1, nprobe = 4)
    run("control", alpha = 0.0, nprobe = 4)
    run("biased", alpha = 0.1, nprobe = 1)
    run("control", alpha = 0.0, nprobe = 1)
    spark.stop()
  }
}
