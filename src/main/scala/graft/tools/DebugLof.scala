package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off adjudication harness for the q486 blocked-LOF twin: measures
  * true-5NN edge recall, full-corpus per-id LOF score drift, and the
  * exact-rank positions of the blocked top-15, so the ScaleTwinsSpec
  * floors are pinned on measured behavior, not guesses. (The top-15 SET
  * overlap alone is ill-conditioned here: the exact LOF surface on this
  * corpus is nearly flat, 1.03-1.06, so the cut boundary is a tie band.)
  */
object DebugLof {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity

    val exPairs = Similarity.exactLofPairs(spark, sf)
    val exScores = Similarity.lofScores(exPairs).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    for (r <- Seq(4, 6, 8)) {
      println(s"=== replicas=$r ===")
      runOne(spark, sf, exPairs, exScores, r)
    }
    spark.stop()
  }

  private def runOne(spark: SparkSession, sf: String,
                     exPairs: org.apache.spark.sql.DataFrame,
                     exScores: Map[Long, Double], replicas: Int): Unit = {
    import graft.operators.Similarity
    val blPairs = Similarity.blockedLofPairs(spark, sf, replicas)
    val blScores = Similarity.lofScores(blPairs).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    println(s"n exact=${exScores.size} blocked=${blScores.size} candPairs=${blPairs.count() / 2}")

    // true-5NN edge recall: is each point's blocked candidate set a
    // superset of its true 5-NN?
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("nid"))
    def knn(p: org.apache.spark.sql.DataFrame) = p
      .withColumn("rn", row_number().over(wk)).filter(col("rn") <= 5)
      .select(col("vec_id"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exKnn = knn(exPairs)
    val blKnn = knn(blPairs)
    val edgeRecall = (exKnn & blKnn).size.toDouble / exKnn.size
    println(f"true-5NN edge recall: $edgeRecall%.4f (${(exKnn & blKnn).size}/${exKnn.size})")
    val completePts = exKnn.groupBy(_._1).count { case (id, es) => es.forall(blKnn) }
    println(f"points with COMPLETE true 5-NN: $completePts/${exScores.size}")

    val drifts = exScores.keys.toSeq
      .map(id => math.abs(exScores(id) - blScores.getOrElse(id, Double.NaN))).sorted
    def q(p: Double) = drifts((p * (drifts.size - 1)).round.toInt)
    println(f"score drift: mean=${drifts.sum / drifts.size}%.5f p50=${q(0.5)}%.5f p95=${q(0.95)}%.5f max=${drifts.last}%.5f")

    // rank tolerance: where do the blocked top-15 sit in the exact ranking?
    val exRank = exScores.toSeq.sortBy { case (id, l) => (-l, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val blTop = blScores.toSeq.sortBy { case (id, l) => (-l, id) }.take(15).map(_._1)
    println("blocked top-15 exact ranks: " + blTop.map(exRank).sorted.mkString(","))
  }
}
