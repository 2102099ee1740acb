package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The typed top-k aggregator must agree with the SQL top-k paths and
  * support per-group usage with bounded state.
  */
class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("global top-10 by score equals orderBy+limit") {
    val orders = Tables(spark, sf0001, "orders")
    val scored = orders.select($"o_orderkey".as("id"), $"o_totalprice".as("score")).as[ScoredId]
    val viaAgg = scored.groupByKey(_ => 0)
      .agg(new TopKByScore(10).toColumn)
      .collect().head._2.map(s => (s.id, s.score)).toSeq
    val viaSort = orders.orderBy($"o_totalprice".desc, $"o_orderkey")
      .select($"o_orderkey", $"o_totalprice").limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaAgg === viaSort)
  }

  test("batch multi-probe neighbors agree with the single-probe q30") {
    val emb = Tables(spark, sf0001, "embeddings")
    val probes = emb.filter($"vec_id".isin(0L, 7L, 42L))
    val batch = graft.operators.Similarity
      .topKNeighbors(emb, probes, "vec_id", "embedding", k = 10)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(s => (s.getLong(0), s.getDouble(1)))).toMap
    // probe 0's neighbor list must equal the declared q30 result exactly
    val q30 = graft.operators.Similarity.q30CosineTopK(spark, sf0001)
      .select($"vec_id", $"score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(batch(0L) === q30)
    assert(batch.keySet === Set(0L, 7L, 42L))
    assert(batch.values.forall(_.length === 10))
    // every probe is its own best neighbor at score 1.0
    batch.foreach { case (pid, ns) => assert(ns.head._1 === pid && ns.head._2 === 1.0) }
  }

  test("per-group top-3 equals the rank-window filter (q16 semantics)") {
    val cust = Tables(spark, sf0001, "customer")
    val perGroup = cust
      .select($"c_mktsegment", $"c_custkey".as("id"), $"c_acctbal".as("score"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(v => ScoredId(v._2, v._3))
      .agg(new TopKByScore(3).toColumn)
      .collect().toMap
    // cross-check against the declared ranking-window query
    val q16 = graft.operators.Relational.q16RankTopK(spark, sf0001)
      .select($"c_mktsegment", $"c_custkey", $"rn").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq).toMap
    q16.foreach { case (seg, expected) =>
      assert(perGroup(seg).map(_.id) === expected, s"segment $seg")
    }
  }
}
