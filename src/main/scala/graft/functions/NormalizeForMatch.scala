package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Match-normalization of a STRING column: NFKC compatibility folding +
  * locale-free case folding — the OTHER half of the text-canonicalization
  * a multilingual dedup runs, completing what [[NfcNormalize]] (canonical
  * composition only) started: 'ﬁle'/'file', 'ℕ²'/'N2', '㎞'/'km',
  * 'STRASSE'/'straße' are the same text to a matching pipeline but
  * distinct under NFC alone.
  *
  * Semantic (deterministic, locale-free, JVM-only by declaration):
  *   1. NFKC via `java.text.Normalizer` (compatibility decomposition +
  *      canonical composition — folds ligatures, width/position variants,
  *      super/subscripts, circled digits, unit glyphs);
  *   2. case fold as `toUpperCase(ROOT).toLowerCase(ROOT)` — the
  *      upper-then-lower round trip approximates full Unicode case
  *      folding where a single lowercase does not ('ß' → 'SS' → 'ss'
  *      matches UCD full folding; final sigma 'ς' and medial 'σ' both
  *      land on the same form via 'Σ'); Locale.ROOT keeps Turkish-i and
  *      friends out of the semantic;
  *   3. NFKC again — case mapping can emit decomposed/compat sequences,
  *      so one more pass restores the normal form and makes the whole
  *      function IDEMPOTENT (spec-pinned).
  *
  * ENGINE-ONLY by design, unlike [[NfcNormalize]]'s oracle-pinned NFC:
  * DuckDB's utf8proc case ops measurably diverge from Java's (recorded at
  * round-13 pin time: DuckDB upper('ß') = 'ẞ' vs Java 'SS'; DuckDB
  * lower('İ') = 'i' vs Java 'i' + U+0307), so a cross-engine hash can
  * never gate this function — UtilitiesSpec carries the value battery and
  * the idempotency/agreement pins instead, and q518's dedup report is in
  * the documented engine-only set.
  *
  * ASCII fast path: `numBytes == numChars` means NFKC is identity and the
  * fold is plain ASCII lowercasing — an explicit uppercase-byte scan
  * returns the input instance untouched when there is nothing to fold
  * (measured: `UTF8String.toLowerCase` allocates even on already-lower
  * ASCII), so the dominant all-ASCII case never materializes a
  * java.lang.String and usually not even a copy.
  */
case class NormalizeForMatch(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  def normalize(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) { // ASCII: NFKC identity, fold = lower
      val n = s.numBytes
      var i = 0
      while (i < n) {
        val b = s.getByte(i)
        if (b >= 'A' && b <= 'Z') return s.toLowerCase
        i += 1
      }
      return s
    }
    val str = s.toString
    import java.text.Normalizer
    val n1 = Normalizer.normalize(str, Normalizer.Form.NFKC)
    val folded = n1.toUpperCase(java.util.Locale.ROOT)
      .toLowerCase(java.util.Locale.ROOT)
    val out = Normalizer.normalize(folded, Normalizer.Form.NFKC)
    if (out == str) s else UTF8String.fromString(out)
  }

  override def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("nfm", this, classOf[NormalizeForMatch].getName)
      s"$ref.normalize($c)"
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeForMatch =
    copy(child = newChild)
}
