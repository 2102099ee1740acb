package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encoder: applies a FIXED, foldable merge-rule list (as trained
  * by q166's merge loop) to a word, returning its subword tokens — the step
  * that turns the learned tokenizer into per-document token counts.
  *
  * WHY a custom Expression and not column arithmetic: one merge rule is a
  * left-to-right splice over a variable-length symbol array, and a rule list
  * applies SEQUENTIALLY (rule r+1 operates on rule r's output) — as nested
  * higher-order-function columns the expression tree grows multiplicatively
  * per rule exactly like the Hilbert rotation steps ([[HilbertIndex]]), and
  * the aggregate/filter HOF encoding of "splice adjacent pairs" is
  * quadratic per rule. Here it is a plain O(rules · |word|) Java loop
  * invoked from generated code, inside whole-stage codegen.
  *
  * The merge argument must be FOLDABLE (an array literal of "lhs rhs"
  * strings): the rules are parsed once per plan, not per row. Symbols never
  * contain spaces (they are concatenations of non-space word characters),
  * so the single-space encoding is unambiguous.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType &&
      right.dataType.isInstanceOf[ArrayType] &&
      right.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, foldable ARRAY<STRING>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  @transient private lazy val merges: Array[(String, String)] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val s = arr.getUTF8String(i).toString
      val cut = s.indexOf(' ')
      require(cut > 0 && cut < s.length - 1, s"malformed merge rule '$s'")
      (s.substring(0, cut), s.substring(cut + 1))
    }.toArray
  }

  /** Apply the merge rules in order: each rule splices every left-to-right
    * non-overlapping (lhs, rhs) adjacency into the merged symbol.
    */
  def doEncode(w: UTF8String): ArrayData = {
    var syms: Array[String] = w.toString.map(_.toString).toArray
    var r = 0
    while (r < merges.length) {
      val (l, rr) = merges(r)
      if (syms.length > 1) {
        val buf = new collection.mutable.ArrayBuffer[String](syms.length)
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rr) {
            buf += l + rr; i += 2
          } else { buf += syms(i); i += 1 }
        }
        syms = buf.toArray
      }
      r += 1
    }
    new GenericArrayData(syms.map(UTF8String.fromString))
  }

  override def nullSafeEval(w: Any, m: Any): Any =
    doEncode(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, _) => {
      val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncode].getName)
      s"${ev.value} = $ref.doEncode($w);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}
