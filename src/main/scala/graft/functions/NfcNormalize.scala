package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a STRING column — the canonical-composition
  * pass a multilingual dedup pipeline needs BEFORE exact/minhash content
  * hashing: 'café' composed (U+00E9) and decomposed (e + U+0301) are the
  * same text to every reader but different bytes to every hash, so an
  * unnormalized dedup silently keeps both copies (and an unnormalized
  * benchmark-decontamination n-gram probe misses the overlap).
  *
  * WHY a custom Expression: Spark ships no normalization builtin; a Scala
  * UDF would force serialization out of the codegen pipeline. This wraps
  * `java.text.Normalizer` (ICU-equivalent canonical composition, same
  * Unicode data as DuckDB's utf8proc `nfc_normalize` — cross-engine
  * equality verified empirically on composed/decomposed/compat samples and
  * oracle-pinned by q511) behind `doGenCode`, so the normalize call sits
  * inline in whole-stage codegen like [[JaroWinkler]].
  *
  * ASCII fast path: `numBytes == numChars` means no codepoint can compose
  * or reorder (NFC is identity on ASCII), so the dominant all-ASCII case
  * returns the input UTF8String without materializing a java.lang.String.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  def normalize(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s // ASCII: NFC is identity
    val str = s.toString
    val out = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
    if (out == str) s else UTF8String.fromString(out)
  }

  override def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalize].getName)
      s"$ref.normalize($c)"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
