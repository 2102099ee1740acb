package graft.operators

import graft.Tables
import graft.Dsl._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector / similarity-search surface over `embeddings` (SURVEY.md §2.3 Q24,
  * Q30 + north-star ANN). The exact cosine kernel is pure higher-order-function
  * arithmetic (`zip_with` + `aggregate`), fully codegen'd — float elements are
  * cast to double first so both engines fold the identical double sequence
  * left-to-right, making scores bit-deterministic before the D5 rounding.
  *
  * Scale path: the brute-force probe is a broadcast of ONE row against an
  * arbitrarily large table (embarrassingly parallel, no shuffle); LSH/IVF
  * variants for many-to-many live in [[graft.dedup]] / engine-only queries.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** Embedding column with elements cast to double (exact on floats). */
  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Left-to-right dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity composed from built-in higher-order functions — the
    * reference formulation that [[graft.functions.CosineSimilarity]] must
    * match bit-for-bit (CosineExprSpec asserts it); query paths use the fused
    * codegen'd expression.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Q24: array functions — size / element_at (positive + negative index) /
    * per-element access on the 64-dim embedding vectors.
    */
  def q24Array: Q = (s, d) => {
    Tables(s, d, "embeddings").select(
      col("vec_id"),
      big(size(col("embedding"))).as("dim"),
      element_at(col("embedding"), 1).cast("double").as("first_val"),
      element_at(col("embedding"), -1).cast("double").as("last_val"),
      big(col("label")).as("label"))
      .orderBy(col("vec_id"))
  }

  /** Q30: brute-force exact cosine top-10 around the probe vector (vec_id 0).
    * The probe is a 1-row broadcast — no collect, no shuffle; top-k plans as
    * TakeOrderedAndProject. D5: scores rounded to 6 dp, ties broken by vec_id.
    */
  def q30CosineTopK: Q = (s, d) => {
    VectorFunctions.register(s)
    val emb = Tables(s, d, "embeddings").withColumn("ev", asDouble(col("embedding")))
    val probe = emb.filter(col("vec_id") === 0).select(col("ev").as("pv"))
    emb.crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(VectorFunctions.cosineSim(col("ev"), col("pv")), 6).as("score"),
        big(col("label")).as("label"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10)
  }

  /** Batch multi-probe exact top-k: every probe row gets its k nearest
    * neighbors in one pass — probes broadcast against the (arbitrarily
    * large) corpus, per-probe winners kept by the bounded-state
    * [[graft.functions.TopKByScore]] aggregator instead of a rank window
    * (no per-group full sort; state is O(k) per probe at any corpus size).
    */
  def topKNeighbors(corpus: DataFrame, probes: DataFrame,
                    idCol: String, embCol: String, k: Int = 10): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    VectorFunctions.register(s)
    val c = corpus.select(col(idCol).as("id"), asDouble(col(embCol)).as("ev"))
    val p = probes.select(col(idCol).as("pid"), asDouble(col(embCol)).as("pv"))
    c.crossJoin(broadcast(p))
      .select(col("pid"), col("id"),
        round(VectorFunctions.cosineSim(col("ev"), col("pv")), 6).as("score"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => graft.functions.ScoredId(r._2, r._3))
      .agg(new graft.functions.TopKByScore(k).toColumn)
      .toDF("pid", "neighbors")
  }

  val queries: Map[String, Q] = Map(
    "q24_array" -> q24Array,
    "q30_cosine_topk" -> q30CosineTopK)

  val oracles: Map[String, String] = Map(
    "q24_array" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_val,
        |  CAST(embedding[-1] AS DOUBLE) AS last_val,
        |  CAST(label AS BIGINT) AS label
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q30_cosine_topk" ->
      """WITH p AS (SELECT CAST(embedding AS DOUBLE[]) AS pv FROM embeddings WHERE vec_id = 0),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev, label FROM embeddings)
        |SELECT vec_id,
        |  ROUND(list_dot_product(ev, pv)
        |        / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(pv, pv))), 6) AS score,
        |  CAST(label AS BIGINT) AS label
        |FROM e, p
        |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin)
}
