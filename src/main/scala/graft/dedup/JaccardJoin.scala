package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT Jaccard similarity self-join via prefix filtering (the AllPairs /
  * PPJoin family) — the complete counterpart to [[MinHashLSH]]'s estimated
  * candidates: every unordered document pair with shingle-set Jaccard ≥ t is
  * returned, with its exact score.
  *
  * Why this scales where naive formulations don't:
  *   - joining on "any shared shingle" is complete but quadratic in the
  *     hottest shingle's document frequency (stop-shingles pair everything);
  *   - prefix filtering orders each document's shingles by ascending global
  *     document frequency (rarest first) and joins only on each document's
  *     first `|S| - ceil(t·|S|) + 1` shingles. Completeness: J(A,B) ≥ t
  *     implies |A∩B| ≥ t·|A| (since |B| ≥ |A∩B|), so fewer than
  *     `|A| - ceil(t·|A|) + 1` prefix elements can't swallow the whole
  *     intersection — the globally-smallest shared shingle lands in BOTH
  *     prefixes and the prefix-prefix equi-join finds the pair. Rare-first
  *     ordering makes those join keys the LOW-frequency shingles, so bucket
  *     sizes (and shuffle fan-out) collapse.
  *
  * All set arithmetic is integer-exact; the Jaccard threshold is applied as
  * `(1+t)·|A∩B| ≥ t·(|A|+|B|)` on longs (t rational), so an oracle engine
  * reproduces the pair set bit-for-bit with no float-boundary flakes.
  */
object JaccardJoin {

  /** Exact-Jaccard pairs (id1 < id2, jaccard ≥ tNum/tDen) over word-level
    * w-shingles of `textCol`. Returns (id1, id2, inter, n1, n2, jaccard)
    * with jaccard rounded to 6 dp (D5) — the threshold itself is integer.
    */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            tNum: Long, tDen: Long, shingleWidth: Int = 3): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    val sh = df
      .select(col(idCol).cast("long").as("id"),
        explode(MinHashLSH.shingles(toks, shingleWidth)).as("sh"))
      .distinct()
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    // global rare-first order; ties broken by shingle text for determinism
    val freq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val ranked = sh.join(freq, Seq("sh"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("sh"))))
      .join(sizes, Seq("id"))
    // prefix length |S| - ceil(t|S|) + 1; ceil(n·t) on longs via try_divide-
    // free integer arithmetic (Spark's `/` is double division, so `div`)
    val ceilTn = expr(s"(n * $tNum + ${tDen - 1L}) div $tDen")
    val prefix = ranked
      .filter(col("rk") <= col("n") - ceilTn + 1L)
      .select(col("id"), col("sh"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    // verify candidates with exact intersection counts over the FULL sets
    val inter = cand
      .join(sh.select(col("id").as("id1"), col("sh")), Seq("id1"))
      .join(sh.select(col("id").as("id2"), col("sh")), Seq("id2", "sh"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id1"), col("n").as("n1")), Seq("id1"))
      .join(sizes.select(col("id").as("id2"), col("n").as("n2")), Seq("id2"))
      .filter(col("inter") * (tNum + tDen) >= (col("n1") + col("n2")) * tNum)
      .select(col("id1"), col("id2"), col("inter"), col("n1"), col("n2"),
        round(col("inter").cast("double")
          / (col("n1") + col("n2") - col("inter")), 6).as("jaccard"))
  }
}
