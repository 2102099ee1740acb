package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity of two STRING columns — the
  * entity-resolution scorer behind q463's blocked name-dedup audit.
  *
  * WHY a custom Expression and not column arithmetic: the Jaro match step
  * is a greedy two-pointer walk with a per-position match window and a
  * used-flag array over BOTH strings — as higher-order-function columns
  * that is a quadratic expression-tree encoding (the [[BpeEncode]]
  * argument); here it is the plain O(|a|·window) Java loop inside
  * whole-stage codegen.
  *
  * Semantics (pinned by UtilitiesSpec against hand-checked pairs and by
  * the q463 oracle against DuckDB's `jaro_winkler_similarity`):
  * classic Jaro with match window max(|a|,|b|)/2 − 1, transpositions
  * counted over matched sequences halved, and the Winkler prefix boost
  * l·0.1·(1−j) for l ≤ 4 applied ONLY when j > 0.7 (the rapidfuzz
  * threshold variant DuckDB ships, verified empirically — boosting
  * unconditionally diverges below j = 0.7).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, STRING), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    // byte-level walk: the comparison is per UTF-8 byte — which is
    // EXACTLY DuckDB's semantic, not an ASCII-only approximation of it:
    // DuckDB's jaro_winkler_similarity walks UTF-8 bytes too (verified
    // empirically on Cyrillic/CJK/kana/emoji pairs — e.g. 'Пётр'/'Петр'
    // scores 0.822222, the byte walk, where a codepoint walk gives 0.85).
    // The q510 multibyte conformance battery oracle-pins this equivalence
    // every round; UtilitiesSpec carries the recorded values. A
    // codepoint-based walk would be the better LINGUISTIC similarity for
    // CJK (shared lead bytes inflate byte-level matches) but would
    // diverge from the declared DuckDB-compatible semantic.
    val a = ua.getBytes
    val b = ub.getBytes
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    if (ua.equals(ub)) return 1.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, l2)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!f2(j) && a(i) == b(j)) {
          f1(i) = true; f2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val halfT = t / 2
    val mD = m.toDouble
    val jaro = (mD / l1 + mD / l2 + (mD - halfT) / mD) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(l1, l2))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("jw", this, classOf[JaroWinkler].getName)
      s"${ev.value} = $ref.similarity($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
