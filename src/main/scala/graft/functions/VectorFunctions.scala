package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration + Column-API surface for the custom vector expressions.
  *
  * Expressions are exposed through the session `FunctionRegistry` (temp
  * functions) and invoked via `call_function` — the registry path keeps the
  * Column API version-stable and also makes the function available to
  * `spark.sql("... graft_cosine(a, b) ...")`.
  */
object VectorFunctions {

  val CosineName = "graft_cosine"
  val DotName = "graft_dot"
  val HilbertName = "graft_hilbert"
  val BpeName = "graft_bpe"
  val JaroWinklerName = "graft_jaro_winkler"
  val NfcName = "graft_nfc"
  val ByteLevenshteinName = "graft_levenshtein"
  val NormalizeForMatchName = "graft_norm_match"

  /** Idempotently register the vector functions in this session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NfcName, exprs => NfcNormalize(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      JaroWinklerName, exprs => JaroWinkler(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ByteLevenshteinName, exprs => ByteLevenshtein(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NormalizeForMatchName, exprs => NormalizeForMatch(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      BpeName, exprs => BpeEncode(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      CosineName, exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName, exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      HilbertName, exprs => HilbertIndex(exprs.head, exprs(1)), "built-in")
  }

  /** Cosine similarity of two ARRAY<DOUBLE> columns (requires [[register]]). */
  def cosineSim(a: Column, b: Column): Column = call_function(CosineName, a, b)

  /** Dot product of two ARRAY<DOUBLE> columns (requires [[register]]). */
  def dotProduct(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** 16-bit Hilbert-curve index of two BIGINT coordinates (requires [[register]]). */
  def hilbert(x: Column, y: Column): Column = call_function(HilbertName, x, y)

  /** BPE-encode a STRING word with a foldable ARRAY<STRING> of "lhs rhs"
    * merge rules, returning its subword tokens (requires [[register]]).
    */
  def bpe(word: Column, merges: Column): Column =
    call_function(BpeName, word, merges)

  /** Jaro–Winkler similarity of two STRING columns (requires [[register]]). */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function(JaroWinklerName, a, b)

  /** Byte-walk (DuckDB-semantic) Levenshtein distance of two STRING
    * columns (requires [[register]]).
    */
  def byteLevenshtein(a: Column, b: Column): Column =
    call_function(ByteLevenshteinName, a, b)

  /** Unicode NFC normalization of a STRING column (requires [[register]]). */
  def nfc(s: Column): Column = call_function(NfcName, s)

  /** NFKC + locale-free casefold match-normalization of a STRING column
    * (requires [[register]]; engine-only semantic — see
    * [[NormalizeForMatch]]).
    */
  def normMatch(s: Column): Column = call_function(NormalizeForMatchName, s)
}
