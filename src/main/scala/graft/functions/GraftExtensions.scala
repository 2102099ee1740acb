package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions at session build time, so any deployment can opt in with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (spark-submit,
  * thrift server, notebooks) without calling [[VectorFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier(VectorFunctions.CosineName),
      new ExpressionInfo(classOf[CosineSimilarity].getName, VectorFunctions.CosineName),
      exprs => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier(VectorFunctions.DotName),
      new ExpressionInfo(classOf[DotProduct].getName, VectorFunctions.DotName),
      exprs => DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier(VectorFunctions.HilbertName),
      new ExpressionInfo(classOf[HilbertIndex].getName, VectorFunctions.HilbertName),
      exprs => HilbertIndex(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier(VectorFunctions.BpeName),
      new ExpressionInfo(classOf[BpeEncode].getName, VectorFunctions.BpeName),
      exprs => BpeEncode(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier(VectorFunctions.JaroWinklerName),
      new ExpressionInfo(classOf[JaroWinkler].getName, VectorFunctions.JaroWinklerName),
      exprs => JaroWinkler(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier(VectorFunctions.NfcName),
      new ExpressionInfo(classOf[NfcNormalize].getName, VectorFunctions.NfcName),
      exprs => NfcNormalize(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier(VectorFunctions.ByteLevenshteinName),
      new ExpressionInfo(classOf[ByteLevenshtein].getName, VectorFunctions.ByteLevenshteinName),
      exprs => ByteLevenshtein(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier(VectorFunctions.NormalizeForMatchName),
      new ExpressionInfo(classOf[NormalizeForMatch].getName, VectorFunctions.NormalizeForMatchName),
      exprs => NormalizeForMatch(exprs.head)))
  }
}
