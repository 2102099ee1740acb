package graft.tools

import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.Similarity
import graft.similarity.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugIvf2 {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugIvf2") {
    val spark = SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    VectorFunctions.register(spark)
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    println("label distribution:")
    emb.groupBy($"label").count().orderBy($"label").show()
    println("vec_id -> label around seeds & probes:")
    emb.filter($"vec_id" < 20 || $"vec_id".isin(101L, 2500L)).select($"vec_id", $"label").orderBy($"vec_id").show(30)
    val (assigned, centroids) = Ann.ivfIndex(emb, "vec_id", "embedding", 16, 1)
    println("cluster sizes:")
    assigned.groupBy($"cid").count().orderBy($"count".desc).show(20)
    // probe 2500 truth
    val e = emb.withColumn("ev", Similarity.asDouble(col("embedding")))
    val p = e.filter($"vec_id" === 2500).select($"ev".as("pv"))
    val top = e.crossJoin(broadcast(p))
      .select($"vec_id", VectorFunctions.cosineSim($"ev", $"pv").as("score"))
      .orderBy($"score".desc, $"vec_id").limit(10)
    println("probe 2500 exact top-10 with labels + their assigned cid:")
    top.join(emb.select($"vec_id", $"label"), "vec_id")
      .join(assigned.select($"id".as("vec_id"), $"cid"), "vec_id")
      .orderBy($"score".desc).show()
    val nearClusters = centroids.crossJoin(broadcast(p))
      .select($"cid", VectorFunctions.cosineSim($"cv", $"pv").as("csim"))
      .orderBy($"csim".desc)
    println("cluster ranking for probe 2500:")
    nearClusters.show(16)
    spark.stop()
  }
}
