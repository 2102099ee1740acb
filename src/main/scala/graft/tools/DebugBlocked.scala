package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q113 cost split + refineIters A/B: is the Lloyd refinement pass worth
  * its materialization barriers for BLOCKING (vs probe-recall where it
  * matters)? Recall measured against the exact pair set at sf0.01.
  */
object DebugBlocked {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugBlocked") {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf001 = "/root/testdata/sf0.01"
    val sf01 = "/root/testdata/sf0.1"

    // exact pair baseline at sf0.01
    val emb001 = graft.Tables(spark, sf001, "embeddings")
    val withNorm = emb001
      .select(col("vec_id"), graft.operators.Similarity.asDouble(col("embedding")).as("ev"))
      .withColumn("nrm", sqrt(graft.operators.Similarity.dot(col("ev"), col("ev"))))
    val exact = graft.operators.Similarity.exactCosinePairs(withNorm)
      .filter(round(col("cos"), 6) >= 0.4)
      .select(col("id1"), col("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def blockedPairs(emb: org.apache.spark.sql.DataFrame, refine: Int,
                     replicas: Int = 3) = {
      val k = math.max(16, math.ceil(math.sqrt(emb.count().toDouble)).toInt)
      val (assigned, _) = graft.similarity.Ann.ivfIndex(
        emb, "vec_id", "embedding", k = k, refineIters = refine, assignReplicas = replicas)
      val a = assigned.select(col("cid"), col("id").as("id1"), col("ev").as("ev1"))
      val b = assigned.select(col("cid"), col("id").as("id2"), col("ev").as("ev2"))
      a.join(b, Seq("cid")).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          graft.functions.VectorFunctions.cosineSim(col("ev1"), col("ev2")).as("cos"))
        .filter(round(col("cos"), 6) >= 0.4)
        .dropDuplicates("id1", "id2")
    }
    for (refine <- Seq(0, 1, 2)) {
      val got = blockedPairs(emb001, refine).select(col("id1"), col("id2"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"RECALL refineIters=$refine: ${got.size.toDouble / exact.size}%.3f (${got.size}/${exact.size}); precision_ok=${got.subsetOf(exact)}")
    }

    // replica curve (r5 VERDICT item 6): recall + candidate-pair compare
    // volume per assignReplicas at refine=1 — the compare volume scales as
    // r², so each recall point must be priced against it
    for (reps <- Seq(2, 3, 4, 5)) {
      val k = math.max(16, math.ceil(math.sqrt(emb001.count().toDouble)).toInt)
      val (assigned, _) = graft.similarity.Ann.ivfIndex(
        emb001, "vec_id", "embedding", k = k, refineIters = 1, assignReplicas = reps)
      val a = assigned.select(col("cid"), col("id").as("id1"))
      val b = assigned.select(col("cid"), col("id").as("id2"))
      val candidates = a.join(b, Seq("cid")).filter(col("id1") < col("id2"))
        .select("id1", "id2").distinct().count()
      val got = blockedPairs(emb001, 1, reps).select(col("id1"), col("id2"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"CURVE replicas=$reps: recall ${got.size.toDouble / exact.size}%.3f " +
        f"(${got.size}/${exact.size}), candidate pairs $candidates, precision_ok=${got.subsetOf(exact)}")
    }

    // wall-clock split at sf0.1
    val emb01 = graft.Tables(spark, sf01, "embeddings")
    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = Seq.fill(3) { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }.sorted
      println(f"STEP $name%-26s median ${ts(1)}%.3f s")
    }
    for (refine <- Seq(0, 1)) {
      time(s"index-only refine=$refine") {
        val k = math.max(16, math.ceil(math.sqrt(emb01.count().toDouble)).toInt)
        graft.similarity.Ann.ivfIndex(emb01, "vec_id", "embedding", k = k,
          refineIters = refine, assignReplicas = 3)._1
          .write.format("noop").mode("overwrite").save()
      }
      time(s"full pairs refine=$refine") {
        blockedPairs(emb01, refine).write.format("noop").mode("overwrite").save()
      }
    }
    // replica wall-clock price at sf0.1 (cold index per run — no cache)
    for (reps <- Seq(3, 4)) {
      time(s"full pairs replicas=$reps") {
        blockedPairs(emb01, 1, reps).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
