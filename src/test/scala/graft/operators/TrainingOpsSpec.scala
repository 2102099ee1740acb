package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Hash-based split/shuffle/sample invariants: disjoint, complete,
  * fraction-accurate, and bit-reproducible across runs and repartitionings.
  */
class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("train/test split is disjoint, complete, near-fraction, reproducible") {
    val docs = Tables(spark, sf0001, "documents")
    val (train, test) = TrainingOps.trainTestSplit(docs, "doc_id", 0.2)
    val (nTrain, nTest, nAll) = (train.count(), test.count(), docs.count())
    assert(nTrain + nTest === nAll)
    assert(math.abs(nTest.toDouble / nAll - 0.2) < 0.06) // 500 rows, hash-binomial
    val trainIds = train.select("doc_id").as[Long].collect().toSet
    val testIds = test.select("doc_id").as[Long].collect().toSet
    assert((trainIds intersect testIds).isEmpty)
    // identical under repartitioning (a rand(seed) split would not be)
    val (train2, _) = TrainingOps.trainTestSplit(docs.repartition(13), "doc_id", 0.2)
    assert(train2.select("doc_id").as[Long].collect().toSet === trainIds)
    // a different salt moves rows
    val (train3, _) = TrainingOps.trainTestSplit(docs, "doc_id", 0.2, salt = 7)
    assert(train3.select("doc_id").as[Long].collect().toSet !== trainIds)
  }

  test("portable split: near-fraction, complete, and pure-arithmetic (oracle-replicable)") {
    val docs = Tables(spark, sf0001, "documents")
    val labeled = docs.withColumn("split", TrainingOps.portableSplitLabel("doc_id", 0.2))
    val byLabel = labeled.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byLabel.keySet === Set("train", "test"))
    assert(byLabel.values.sum === docs.count())
    assert(math.abs(byLabel("test").toDouble / docs.count() - 0.2) < 0.06)
    // the bucket is the documented closed-form arithmetic on the id — verify
    // against a Scala reimplementation (this is the DuckDB-oracle contract)
    val p = 2147483647L
    def bucket(id: Long): Long = ((((id % p) * 48271 % p) + 1) * 16807) % p % 10000
    labeled.select($"doc_id", $"split").as[(Long, String)].collect().foreach {
      case (id, split) =>
        assert(split === (if (bucket(id) < 2000) "test" else "train"), s"id $id")
    }
  }

  test("deterministic shuffle is a stable permutation") {
    val docs = Tables(spark, sf0001, "documents")
    val once = TrainingOps.deterministicShuffle(docs, "doc_id")
      .select("doc_id").as[Long].collect().toSeq
    val twice = TrainingOps.deterministicShuffle(docs.repartition(7), "doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(once === twice)
    assert(once.sorted === (0L until 500L))
    assert(once !== once.sorted) // actually shuffled
  }

  test("stratified sample respects per-stratum fractions deterministically") {
    val docs = Tables(spark, sf0001, "documents")
    val fractions = Map("en" -> 0.5, "de" -> 0.1) // other langs -> 0
    val sampled = TrainingOps.stratifiedSample(docs, "lang", "doc_id", fractions)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet.subsetOf(Set("en", "de")))
    assert(math.abs(byLang("en").toDouble / totals("en") - 0.5) < 0.15)
    assert(byLang.getOrElse("de", 0L).toDouble / totals("de") < 0.3)
    // reproducible
    val again = TrainingOps.stratifiedSample(docs, "lang", "doc_id", fractions)
      .select("doc_id").as[Long].collect().toSet
    assert(again === sampled.select("doc_id").as[Long].collect().toSet)
  }
}
