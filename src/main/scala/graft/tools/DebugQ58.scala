package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q58 formulation shoot-out in one JVM: single-projection (r2) vs fully
  * staged vs minimally staged.
  */
object DebugQ58 {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugQ58") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = Tables(spark, sfDir, "documents")

    def variant(name: String)(mk: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = Seq.fill(5)(once()).min
      println(f"VARIANT $name%-16s $t%.3f s")
    }

    variant("single-proj r2") {
      val toks = split(col("text"), " ")
      docs.select(
        col("doc_id"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        element_at(array_sort(filter(toks, t => t =!= "")), 1).as("first_sorted"),
        element_at(array_sort(filter(toks, t => t =!= "")), -1).as("last_sorted"),
        size(slice(toks, 1, 5)).cast("long").as("n_head5"),
        array_join(slice(array_sort(array_distinct(filter(toks, t => t =!= ""))), 1, 3), "|").as("top3_alpha"))
        .orderBy(col("doc_id"))
    }
    variant("staged-4") {
      docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"),
          size(array_distinct(col("tk"))).cast("long").as("n_distinct"),
          size(slice(col("tk"), 1, 5)).cast("long").as("n_head5"),
          filter(col("tk"), t => t =!= "").as("tkf"))
        .select(col("doc_id"), col("n_distinct"), col("n_head5"),
          array_sort(col("tkf")).as("sorted"),
          array_sort(array_distinct(col("tkf"))).as("sdist"))
        .select(col("doc_id"), col("n_distinct"),
          element_at(col("sorted"), 1).as("first_sorted"),
          element_at(col("sorted"), -1).as("last_sorted"),
          col("n_head5"),
          array_join(slice(col("sdist"), 1, 3), "|").as("top3_alpha"))
        .orderBy(col("doc_id"))
    }
    variant("staged-2") {
      val toks = split(col("text"), " ")
      docs.select(col("doc_id"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        size(slice(toks, 1, 5)).cast("long").as("n_head5"),
        array_sort(filter(toks, t => t =!= "")).as("sorted"))
        .select(col("doc_id"), col("n_distinct"),
          element_at(col("sorted"), 1).as("first_sorted"),
          element_at(col("sorted"), -1).as("last_sorted"),
          col("n_head5"),
          array_join(slice(array_distinct(col("sorted")), 1, 3), "|").as("top3_alpha"))
        .orderBy(col("doc_id"))
    }
    spark.stop()
  }
}
