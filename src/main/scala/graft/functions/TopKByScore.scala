package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored row for the top-k aggregator. */
case class ScoredId(id: Long, score: Double)

/** Typed top-k-by-score aggregator (SURVEY.md §4.3): bounded O(k) state per
  * partition, merged pairwise — score descending, ties broken by ascending
  * id (D5 discipline). `TakeOrderedAndProject` covers the global SQL top-k;
  * this is the Dataset-native form composable inside `groupByKey.agg`, i.e.
  * per-GROUP top-k without a rank window's full sort of every group.
  */
class TopKByScore(k: Int) extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def trim(xs: List[ScoredId]): List[ScoredId] =
    xs.sortWith(better).take(k)

  override def zero: List[ScoredId] = Nil
  override def reduce(buf: List[ScoredId], x: ScoredId): List[ScoredId] = trim(x :: buf)
  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] = trim(a ++ b)
  override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf.sortWith(better)
  override def bufferEncoder: Encoder[List[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
