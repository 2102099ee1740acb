package graft.functions

import graft.{SparkSpec, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The custom codegen'd cosine expression must be bit-identical to the
  * composable higher-order-function formulation (same index-ascending double
  * folds) — that contract is what lets query paths swap it in without
  * perturbing D5-rounded oracle scores.
  */
class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  test("bit-identical to the HOF cosine on all embeddings") {
    VectorFunctions.register(spark)
    val emb = Tables(spark, sf0001, "embeddings")
      .withColumn("ev", Similarity.asDouble($"embedding"))
    val probe = emb.filter($"vec_id" === 0).select($"ev".as("pv"))
    val both = emb.crossJoin(broadcast(probe))
      .select(
        VectorFunctions.cosineSim($"ev", $"pv").as("fast"),
        Similarity.cosine($"ev", $"pv").as("hof"))
      .collect()
    assert(both.length === 500)
    both.foreach { r =>
      // exact bit equality, not tolerance — same fold order by construction
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot is bit-identical to the HOF dot product on all embeddings") {
    VectorFunctions.register(spark)
    val emb = Tables(spark, sf0001, "embeddings")
      .withColumn("ev", Similarity.asDouble($"embedding"))
    val probe = emb.filter($"vec_id" === 0).select($"ev".as("pv"))
    val both = emb.crossJoin(broadcast(probe))
      .select(
        VectorFunctions.dotProduct($"ev", $"pv").as("fast"),
        Similarity.dot($"ev", $"pv").as("hof"))
      .collect()
    assert(both.length === 500)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null input yields null; zero vector yields NaN; SQL name resolves") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0))),
      (None: Option[Seq[Double]], Some(Seq(1.0, 2.0))),
      (Some(Seq(0.0, 0.0)), Some(Seq(1.0, 2.0))))
      .toDF("a", "b")
    val out = df.select(VectorFunctions.cosineSim($"a", $"b")).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-15)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0).isNaN)
    df.createOrReplaceTempView("cosine_expr_test")
    val sqlOut = spark.sql(
      "SELECT graft_cosine(a, b) FROM cosine_expr_test WHERE a IS NOT NULL ORDER BY 1").collect()
    assert(sqlOut.length === 2)
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    VectorFunctions.register(spark)
    // join-free scan+project: no AQE indirection, WSCG span directly visible
    val plan = Tables(spark, sf0001, "embeddings")
      .withColumn("ev", Similarity.asDouble($"embedding"))
      .select(VectorFunctions.cosineSim($"ev", $"ev").as("s"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen spans in the plan string;
    // the graft_cosine projection must be inside one
    assert(plan.linesIterator.exists(l => l.contains("graft_cosine") && l.trim.startsWith("*")),
      plan.take(500))
  }

  test("chunked exact pair scan equals the single-broadcast pair set") {
    // force multiple bounded-broadcast chunks (500 vectors / 100-row cap = 5)
    // and assert the block-nested-loop union reproduces exactly the pairs of
    // the one-chunk plan — the q60 degrade-gracefully contract
    val emb = Tables(spark, sf0001, "embeddings")
      .select($"vec_id", Similarity.asDouble($"embedding").as("ev"))
      .withColumn("nrm", sqrt(Similarity.dot($"ev", $"ev")))
    def pairSet(maxRows: Long) =
      Similarity.exactCosinePairs(emb, maxRows)
        .select($"id1", $"id2", round($"cos", 6).as("score"))
        .as[(Long, Long, Double)].collect().toSet
    val chunked = pairSet(100L)
    val single = pairSet(Long.MaxValue)
    assert(chunked.size === 500 * 499 / 2)
    assert(chunked === single)
  }
}
