package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Automated plan-regression net: the BENCH.md plan audits, as assertions.
  *
  * Every batch query's physical plan must be free of unbounded cross
  * products: `CartesianProduct` is banned outright, and
  * `BroadcastNestedLoopJoin` is allowed only where the design DELIBERATELY
  * broadcasts a bounded side (1-row scalar relations, K centroids, bounded
  * chunks). A refactor that silently turns an equi-join into a cross
  * product — the classic 100 TB plan regression — now fails `sbt test`
  * instead of surfacing in a bench.
  *
  * Streaming queries are excluded: invoking them drains a stream and the
  * returned relation is a memory-sink scan whose plan carries no join
  * shape.
  */
class PlanAuditSpec extends SparkSpec {

  /** Deliberate bounded broadcast-nested-loop sides, each documented at the
    * query: 1-row probe/total relations or K-row centroid/chunk tables.
    */
  private val boundedCross = Set(
    "q30_cosine_topk",   // 1-row probe vector
    "q60_cosine_pairs",  // bounded chunk (block-nested-loop by design)
    "q69_multi_topk",    // 5-row probe set
    "q82_tfidf",         // 1-row corpus-size N
    "q95_collocations",  // 1-row bigram total
    "q41_ann_ivf",       // K centroids + 1-row probe
    "q40_ann_lsh",       // K-plane signature relation
    "q72_embed_dedup",   // bounded chunk scan (q60 family)
    "q74_prep_pipeline", // 1-row stats relation in the composition
    "q53_train_test_split", // 1-row split-total relation
    "q62_stratified")    // 1-row per-stratum totals

  private val streaming = Set(
    "q45_stream_tumbling", "q46_stream_sessions", "q54_stream_sliding",
    "q55_stream_dedup", "q66_stream_stateful", "q71_stream_join",
    "q83_stream_outer_join", "q98_stream_merge", "q101_stream_static")

  SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot { case (name, _) => streaming(name) }
    .foreach { case (name, fn) =>
      test(s"$name plan has no unbounded cross product") {
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"$name plans a CartesianProduct — an unbounded cross join reached the physical plan")
        if (!boundedCross(name))
          assert(!plan.contains("BroadcastNestedLoopJoin"),
            s"$name plans a BroadcastNestedLoopJoin but is not in the documented bounded-broadcast set")
      }
    }
}
