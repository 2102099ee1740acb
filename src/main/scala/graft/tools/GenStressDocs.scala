package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generate a ~10× documents corpus for the dedup-family stress point (r5
  * VERDICT item 8): each replica r keeps the source doc's token sequence
  * but rewrites ~30% of tokens deterministically (xxhash64-keyed draws
  * from the corpus vocabulary), so replicas of one doc are related-but-
  * distinct texts — shingle distribution stays corpus-like, some replica
  * pairs land near the Jaccard threshold, and most fall below it, like a
  * real scraped corpus. Replica 0 is the original. Fully deterministic,
  * no RNG.
  *
  * Usage: runMain graft.tools.GenStressDocs [outDir] [replicas] [srcDir]
  */
object GenStressDocs {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft-stress")
    val replicas = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val srcDir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, srcDir, "documents")
    val n = docs.count()
    // corpus vocabulary as a broadcast-able literal array (generator-side
    // collect: the vocab of the synthetic corpus is small and bounded)
    val vocab = docs
      .select(explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
      .distinct().orderBy(col("tok"))
      .collect().map(_.getString(0))
    println(s"GEN vocab=${vocab.length} docs=$n replicas=$replicas")
    val vocabCol = array(vocab.map(lit): _*)
    val reps = spark.range(replicas.toLong).toDF("r")
    val out = docs.crossJoin(reps)
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
        col("lang"),
        col("source"),
        col("n_chars"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    out.repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val written = spark.read.parquet(s"$outDir/documents.parquet")
    println(s"GEN wrote ${written.count()} docs to $outDir/documents.parquet")
    spark.stop()
  }
}
