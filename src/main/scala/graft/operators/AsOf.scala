package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join: each left row matched to the latest right row with
  * `rightTime <= leftTime` (or strictly earlier) on the same key.
  *
  * Implemented as union → single windowed pass — ONE shuffle on the key, no
  * per-left-row subquery and no range fan-out, so it scales with ordinary
  * hash partitioning (the classic stream-merge formulation). Right rows sort
  * before/after left rows at equal timestamps depending on `strict`.
  *
  * All right columns come back packed in a nullable `matched` struct (null ⇒
  * no prior right row). `rightTieBreak` orders equal-time right rows (the
  * LAST one in that order wins) — pass a unique column for determinism.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               strict: Boolean = false,
               rightTieBreak: Option[String] = None): DataFrame = {
    val rightPayload = struct(right.columns.map(col).toSeq: _*)
    val rightType = right.select(rightPayload.as("r")).schema("r").dataType
    val leftPayload = struct(left.columns.map(col).toSeq: _*)
    val leftType = left.select(leftPayload.as("l")).schema("l").dataType

    // at equal times: side orders right rows before left rows for inclusive
    // (<=) semantics, after them for strict (<) semantics
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)
    val tie = rightTieBreak.map(col).getOrElse(lit(null).cast("int"))

    val r = right.select(col(key).as("__k"), col(rightTime).as("__t"),
      lit(rightSide).as("__side"), tie.as("__tie"),
      rightPayload.as("__r"), lit(null).cast(leftType).as("__l"))
    val l = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(leftSide).as("__side"), lit(null).as("__tie"),
      lit(null).cast(rightType).as("__r"), leftPayload.as("__l"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide)
      .select(col("__l.*"), col("__m").as("matched"))
  }
}
