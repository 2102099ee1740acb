package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Warm same-JVM A/B of runtime-mutable SQL confs over a query list — the
  * only comparison shape trustworthy at sub-second magnitudes (BENCH.md:
  * JVM-to-JVM jitter is ±20%). For each variant (a `k=v[;k=v...]` conf
  * set), every query runs `reps` times after a shared warm-up; the min and
  * median per (variant, query) are printed plus per-variant totals.
  *
  * Usage: runMain graft.tools.DebugConfAB <variant1> <variant2> ...
  *   SPARK_GRAFT_AB_QUERIES=q56_dedup_resolve,q107_dedup_keep_best
  *   SPARK_GRAFT_AB_REPS=3  SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as usual.
  * A variant named "base" applies no overrides. Variants alternate
  * (ABAB... per rep round) so slow drift hits both sides equally.
  */
object DebugConfAB {
  def main(args: Array[String]): Unit = BenchLock.exclusive("DebugConfAB") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "3").toInt
    val queries = sys.env.getOrElse("SPARK_GRAFT_AB_QUERIES", "q56_dedup_resolve")
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val variants: Seq[(String, Map[String, String])] = args.toSeq.map { v =>
      if (v == "base") "base" -> Map.empty[String, String]
      else v -> v.split(";").map { kv =>
        val Array(k, value) = kv.split("=", 2); k -> value
      }.toMap
    }
    require(variants.nonEmpty, "pass at least one variant (use 'base')")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val defaults: Map[String, Option[String]] =
      variants.flatMap(_._2.keys).distinct
        .map(k => k -> (try Some(spark.conf.get(k)) catch { case _: Throwable => None }))
        .toMap
    def applyConf(m: Map[String, String]): Unit = {
      defaults.foreach { case (k, dv) =>
        m.get(k) match {
          case Some(v) => spark.conf.set(k, v)
          case None => dv match {
            case Some(v) => spark.conf.set(k, v)
            case None => spark.conf.unset(k)
          }
        }
      }
    }
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up under base conf
    queries.foreach(once)
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; (vn, conf) <- variants) {
      applyConf(conf)
      queries.foreach { q => acc((vn, q)) = once(q) :: acc((vn, q)) }
    }
    for ((vn, _) <- variants) {
      var tot = 0.0
      for (q <- queries) {
        val ts = acc((vn, q)).sorted
        val med = ts(ts.size / 2)
        tot += med
        println(f"[ab] $vn%-40s $q%-34s min=${ts.head}%.3f med=$med%.3f")
      }
      println(f"[ab] $vn%-40s TOTAL(med) $tot%.3f s")
    }
    spark.stop()
  }
}
