package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Fast regression net for the whole declared surface: every query must run
  * at sf0.001 with stable shape and non-degenerate output. The DuckDB oracle
  * (driver-side) owns value-level correctness; this suite catches broken
  * plans, schema drift, and empty results in plain `sbt test`.
  */
class QueriesGoldenSpec extends SparkSpec {

  /** Queries legitimately empty at sf0.001 (thresholds tuned for sf0.01+). */
  private val mayBeEmpty = Set("q15_having")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 with stable shape") {
      val df = fn(spark, sf0001)
      val cols = df.columns.toSeq
      assert(cols.nonEmpty && cols.distinct == cols, s"bad columns: $cols")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query and aliases match the contract") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
