package graft.similarity

import graft.{SparkSpec, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Engine-only pins for the product-quantization codebook (q172): the Lloyd
  * fixpoint has no SQL oracle, so the contract is (1) bit-stable output
  * under re-partitioning, (2) distortion strictly improves on the seed
  * codebook, (3) every (vector, subspace) gets exactly one valid code,
  * (4) total distortion is bounded by the corpus energy (the all-zeros
  * codebook's distortion).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables(spark, sf0001, "embeddings")

  test("q172 output is bit-stable under adversarial re-partitioning") {
    val a = Similarity.q172PqCodebook(spark, sf0001).collect().map(_.toSeq).toSeq
    val shuffled = emb.repartition(7, pmod($"vec_id", lit(3)))
    val (_, assigned) = Pq.codebook(shuffled, "vec_id", "embedding")
    val b = assigned
      .select($"m", $"cid",
        round($"dist", 12).cast(org.apache.spark.sql.types.DecimalType(28, 12)).as("e12"))
      .groupBy($"m")
      .agg(countDistinct($"cid").as("k_used"), count(lit(1)).as("n_vecs"),
        round(sum($"e12").cast("double"), 6).as("total_sq_err"))
      .select($"m".cast("long"), $"k_used".cast("long"), $"n_vecs".cast("long"),
        $"total_sq_err")
      .orderBy($"m").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("Lloyd rounds strictly reduce distortion vs the seed codebook") {
    def distortion(iters: Int): Double = {
      val (_, assigned) = Pq.codebook(emb, "vec_id", "embedding", iters = iters)
      assigned.agg(sum(round($"dist", 12)
        .cast(org.apache.spark.sql.types.DecimalType(28, 12))))
        .head.getDecimal(0).doubleValue
    }
    val d0 = distortion(0)
    val d2 = distortion(2)
    assert(d2 < d0, s"refinement did not improve: $d2 >= $d0")
  }

  test("every (vector, subspace) gets exactly one code in [0, 16)") {
    val (_, assigned) = Pq.codebook(emb, "vec_id", "embedding")
    val n = emb.count()
    assert(assigned.count() === n * 8)
    assert(assigned.groupBy($"vec_id", $"m").count().filter($"count" =!= 1).count() === 0)
    val cids = assigned.select($"cid").distinct().collect().map(_.getInt(0))
    assert(cids.forall(c => c >= 0 && c < 16))
  }

  test("q173 ADC search: full top-10 lists, recall floor, self as top-1, deterministic") {
    val rows = Similarity.q173PqAdcRecall(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === (0L to 4L).toSeq)
    rows.foreach { case (pid, nAdc, recall, top1) =>
      assert(nAdc === 10L, s"probe $pid ADC list not full")
      // the deterministic pipeline makes observed recall a stable regression
      // pin; random 64-dim data is PQ's worst case. Floors sit just under
      // the round-11 measured level (per-probe 0.2-0.7, mean 0.40 at
      // sf0.001) — the q188 treatment; the old 0.1/0.3 floors predate the
      // post-knee codebooks and would let a silent ADC regression to ~0.35
      // mean recall pass (round-10 VERDICT finding 2)
      assert(recall >= 0.2, s"probe $pid recall collapsed: $recall")
      // ADC quantizes the probe's OWN codes too, but its cell stays nearest
      assert(top1 === pid, s"probe $pid ADC top-1 drifted to $top1")
    }
    assert(rows.map(_._3).sum / 5 >= 0.38, "mean recall@10 below the pinned floor")
    val again = Similarity.q173PqAdcRecall(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(again.toSeq === rows.toSeq)
  }

  test("q188 IVFPQ: pruned candidates, re-rank recall floor, self top-1, deterministic") {
    val corpus = emb.count()
    val rows = Similarity.q188IvfPq(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === (0L to 4L).toSeq)
    rows.foreach { case (pid, nCand, recall, top1) =>
      // the IVF prune must be REAL: candidates strictly below the corpus,
      // even with assignReplicas = 2 doubling index entries
      assert(nCand < corpus, s"probe $pid scanned the whole corpus")
      assert(nCand > 0, s"probe $pid has no candidates")
      // exact re-rank of the 200-deep ADC shortlist recovers quantization
      // error; what remains is the IVF cell ceiling. Floors sit at the
      // round-10 measured knee (nprobe=8/shortlist=200/replicas=2:
      // per-probe 0.8-1.0, mean 0.94 at sf0.001 — deterministic pipeline,
      // so these are stable regression pins, up from the round-9 0.3/0.5)
      assert(recall >= 0.8, s"probe $pid recall collapsed: $recall")
      assert(top1 === pid, s"probe $pid top-1 drifted to $top1")
    }
    assert(rows.map(_._3).sum / 5 >= 0.9, "mean recall@10 below the pinned floor")
    val again = Similarity.q188IvfPq(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(again.toSeq === rows.toSeq)
  }

  test("distortion is bounded by corpus energy and k_used stays near K") {
    val rows = Similarity.q172PqCodebook(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === (0L to 7L).toSeq)
    val energy = Pq.subvectors(emb, "vec_id", "embedding", 8, 8)
      .select($"m", Pq.l2sq($"sub", array((0 until 8).map(_ => lit(0.0)): _*)).as("e"))
      .groupBy($"m").agg(sum($"e").as("en"))
      .collect().map(r => r.getInt(0).toLong -> r.getDouble(1)).toMap
    rows.foreach { case (m, kUsed, nVecs, err) =>
      assert(err >= 0 && err < energy(m), s"subspace $m distortion not below energy")
      assert(kUsed >= 8 && kUsed <= 16, s"subspace $m collapsed to $kUsed cells")
      assert(nVecs === emb.count())
    }
  }
}
