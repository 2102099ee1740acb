package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native byte-walk Levenshtein distance of two STRING columns — the
  * multibyte-capable edit distance the q258/q262/q272 fuzzy family needs
  * to extend its oracle past ASCII.
  *
  * WHY: Spark's built-in `levenshtein` counts CODEPOINT edits while
  * DuckDB's counts UTF-8 BYTE edits ('é'→'e' is 1 vs 2) — equal on
  * ASCII, divergent on any multibyte input (pinned in UtilitiesSpec
  * since round 13; the q510 JaroWinkler conformance work proved the
  * byte-walk treatment closes exactly this gap). This expression is the
  * DuckDB semantic: a classic two-row DP over the raw UTF-8 bytes,
  * verified value-for-value against DuckDB `levenshtein` on a 14-case
  * Cyrillic/CJK/kana/emoji/combining battery at pin time and re-checked
  * cross-engine by the q517 oracle every round. As with [[JaroWinkler]],
  * a byte walk can differ from the better LINGUISTIC distance for CJK
  * (one substituted ideograph costs 3), but engine-portable determinism
  * is the declared contract here.
  *
  * O(|a|·|b|) time, O(min) space, single allocation; inside whole-stage
  * codegen via the [[JaroWinkler]] reference-object pattern.
  */
case class ByteLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, STRING), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  def distance(ua: UTF8String, ub: UTF8String): Int = {
    if (ua.equals(ub)) return 0
    // keep the shorter string on the inner (allocated) dimension
    val (a, b) = {
      val x = ua.getBytes; val y = ub.getBytes
      if (x.length >= y.length) (x, y) else (y, x)
    }
    val la = a.length
    val lb = b.length
    if (lb == 0) return la
    val prev = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= la) {
      var diag = prev(0) // prev(j-1) from the PREVIOUS row
      prev(0) = i
      val ai = a(i - 1)
      j = 1
      while (j <= lb) {
        val up = prev(j)
        val cost = if (ai == b(j - 1)) diag else {
          val s = diag + 1
          val d = if (up < prev(j - 1)) up else prev(j - 1)
          if (s < d + 1) s else d + 1
        }
        prev(j) = cost
        diag = up
        j += 1
      }
      i += 1
    }
    prev(lb)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("blev", this, classOf[ByteLevenshtein].getName)
      s"${ev.value} = $ref.distance($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteLevenshtein =
    copy(left = newLeft, right = newRight)
}
