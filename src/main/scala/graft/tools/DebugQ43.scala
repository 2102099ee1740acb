package graft.tools

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q43 cost attribution: the md5-per-token portable hash vs the r1 xxhash64
  * non-portable lower bound vs a distinct-token dictionary join. Run with
  * SPARK_GRAFT_SF_DIR to pick the scale.
  */
object DebugQ43 {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugQ43") {
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

    val p = lit(1000000007L)
    def toks(c: Column) = filter(split(c, " "), t => t =!= "")
    def fold(tokHash: Column => Column)(c: Column): Column =
      aggregate(toks(c), lit(0L), (acc, t) => pmod(acc * 1000003L + tokHash(t), p))

    val md5Hash = (t: Column) =>
      pmod(conv(substring(md5(t.cast("binary")), 1, 8), 16, 10).cast("long"), p)
    val xxHash = (t: Column) => pmod(xxhash64(t), p)
    val crcHash = (t: Column) => pmod(crc32(t.cast("binary")), p)

    def agg(df: DataFrame) = df
      .groupBy(col("rolling_fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))

    def docs = Tables(spark, sfDir, "documents")

    def variant(name: String)(mk: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = Seq.fill(3)(once()).min
      println(f"VARIANT $name%-22s $t%.3f s")
    }

    // token stats first
    val stats = docs.select(explode(toks(col("text"))).as("t"))
      .agg(count(lit(1)).as("occ"), countDistinct(col("t")).as("dist")).head()
    println(s"token occurrences=${stats.getLong(0)} distinct=${stats.getLong(1)}")

    variant("md5 fold (current)") {
      agg(docs.select(col("doc_id"), fold(md5Hash)(col("text")).as("rolling_fp")))
    }
    variant("xxhash64 fold (r1)") {
      agg(docs.select(col("doc_id"), fold(xxHash)(col("text")).as("rolling_fp")))
    }
    variant("crc32 fold") {
      agg(docs.select(col("doc_id"), fold(crcHash)(col("text")).as("rolling_fp")))
    }
    variant("md5 row-memoized map") {
      val uniq = array_distinct(col("tk"))
      agg(docs.select(col("doc_id"), toks(col("text")).as("tk"))
        .select(col("doc_id"), col("tk"),
          map_from_arrays(uniq, transform(uniq, md5Hash)).as("hm"))
        .select(col("doc_id"),
          aggregate(col("tk"), lit(0L),
            (acc, t) => pmod(acc * 1000003L + element_at(col("hm"), t), p))
            .as("rolling_fp")))
    }
    variant("dict join + regroup") {
      val tok = docs.select(col("doc_id"), posexplode(toks(col("text"))))
        .toDF("doc_id", "pos", "t")
      val dict = tok.select(col("t")).distinct()
        .withColumn("h", md5Hash(col("t")))
      val joined = tok.join(broadcast(dict), "t")
      val folded = joined.groupBy(col("doc_id"))
        .agg(aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("h")))),
            s => s.getField("h")),
          lit(0L), (acc, h) => pmod(acc * 1000003L + h, p)).as("rolling_fp"))
      agg(folded)
    }
    spark.stop()
  }
}
