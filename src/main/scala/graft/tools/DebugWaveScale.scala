package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure — not just argue — the volume slope of the round-8 wave-23+
  * document/embedding operators (k-center coreset, blocked fuzzy join,
  * TextRank, greedy max-cover, fuzzy dedup clusters, whitening audit,
  * frame dedup) past bench scale.
  *
  * Fixture: documents grow K× via the GenStressDocs mutation (each replica
  * keeps the token sequence but deterministically rewrites ~30% of tokens
  * from the corpus vocabulary), so token/shingle DISTRIBUTIONS stay
  * corpus-like — blocking keys spread instead of stacking, rare shingles
  * stay rare — which is how a real scrape grows. Embeddings grow K× via
  * id-shifted copies (distance/moment costs are structure-independent).
  * A query with a volume-proportional plan should scale ≈K× warm; the one
  * DECLARED super-linear term is the blocked fuzzy join's candidate count
  * when the blocking vocabulary saturates — measured here, not hidden.
  *
  * Usage: runMain graft.tools.DebugWaveScale [K] (default 4).
  */
object DebugWaveScale {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugWaveScale") {
    val k = args.headOption.map(_.toInt).getOrElse(4)
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
    val base = "/root/testdata/sf0.1"
    val tmp = java.nio.file.Files.createTempDirectory("graft_wscale_").toString
    try {
      val docs = graft.Tables(spark, base, "documents")
      val n = docs.count()
      val vocab = docs
        .select(explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
        .distinct().orderBy(col("tok")).collect().map(_.getString(0))
      val vocabCol = array(vocab.map(lit): _*)
      val reps = spark.range(k.toLong).toDF("r")
      docs.crossJoin(reps)
        .select(
          (col("doc_id") + col("r") * n).as("doc_id"),
          when(col("r") === 0, col("text")).otherwise(
            array_join(
              transform(filter(split(col("text"), " "), t => t =!= ""),
                t => when(
                  pmod(xxhash64(lit("mut"), col("doc_id"), col("r"), t), lit(10L)) < 3,
                  element_at(vocabCol,
                    (pmod(xxhash64(lit("pick"), col("doc_id"), col("r"), t),
                      lit(vocab.length.toLong)) + 1).cast("int"))
                ).otherwise(t)),
              " ")).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      val nv = emb.count()
      (0 until k).map { c =>
        emb.withColumn("vec_id", col("vec_id") + lit(c * nv))
      }.reduce(_.unionAll(_)).write.mode("overwrite")
        .parquet(s"$tmp/embeddings.parquet")
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events"))
        spark.read.parquet(s"$base/$t.parquet")
          .write.mode("overwrite").parquet(s"$tmp/$t.parquet")

      val queries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
        "q255_kcenter_coreset" -> graft.operators.Similarity.q255KcenterCoreset,
        "q258_fuzzy_blocked_join" -> graft.operators.Text.q258FuzzyBlockedJoin,
        "q272_fuzzy_join_capped" -> graft.operators.Text.q272FuzzyJoinCapped,
        "q259_textrank_keywords" -> graft.operators.Text.q259TextrankKeywords,
        "q261_greedy_maxcover" -> graft.operators.Text.q261GreedyMaxcover,
        "q262_fuzzy_dedup_clusters" -> graft.operators.Text.q262FuzzyDedupClusters,
        "q268_embedding_whitening" -> graft.operators.Similarity.q268EmbeddingWhitening,
        "q269_frame_dedup" -> graft.operators.NorthStar.q269FrameDedup)
      def time(fn: => Unit): Double = {
        val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
      }
      for ((name, q) <- queries) {
        def run(dir: String): (Double, Double) = {
          val cold = time(q(spark, dir).write.mode("overwrite").format("noop").save())
          val warm = (1 to 3).map(_ => time(
            q(spark, dir).write.mode("overwrite").format("noop").save())).min
          (cold, warm)
        }
        val (c1, w1) = run(base)
        val (ck, wk) = run(tmp)
        println(f"[wscale] $name%-26s cold 1x=$c1%7.2fs ${k}x=$ck%7.2fs slope=${ck / c1}%5.2f" +
          f" | warm 1x=$w1%6.2fs ${k}x=$wk%6.2fs slope=${wk / w1}%5.2f")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    spark.stop()
  }
}
