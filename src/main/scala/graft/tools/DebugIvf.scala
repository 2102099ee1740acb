package graft.tools

import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.Similarity
import graft.similarity.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF recall grid: seeding strategy × refineIters, recall@10 on 3 probes. */
object DebugIvf {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugIvf") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    VectorFunctions.register(spark)
    val emb = Tables(spark, sfDir, "embeddings")

    def exactTop10(probe: Long): Set[Long] = {
      val e = emb.withColumn("ev", Similarity.asDouble(col("embedding")))
      val p = e.filter(col("vec_id") === probe).select(col("ev").as("pv"))
      e.crossJoin(broadcast(p))
        .select(col("vec_id"), VectorFunctions.cosineSim(col("ev"), col("pv")).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(10)
        .select("vec_id").as[Long].collect().toSet
    }
    val probes = Seq(0L, 101L, 250L, 499L)
    val truth = probes.map(p => p -> exactTop10(p)).toMap

    for (iters <- Seq(1); nprobe <- Seq(4, 6); reps <- Seq(1, 2, 3)) {
      val recalls = probes.map { p =>
        val ivf = Ann.ivfTopK(emb, "vec_id", "embedding", probeId = p,
          nprobe = nprobe, refineIters = iters, assignReplicas = reps)
          .select("id").as[Long].collect().toSet
        (ivf intersect truth(p)).size / 10.0
      }
      println(f"IVF iters=$iters nprobe=$nprobe reps=$reps recalls=${probes.zip(recalls)} avg=${recalls.sum / recalls.size}%.2f")
    }
    spark.stop()
  }
}
