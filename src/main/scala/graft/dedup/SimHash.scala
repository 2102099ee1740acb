package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash fingerprinting + Hamming-distance near-dup candidates.
  *
  * A document's 64-bit SimHash is the sign vector of per-bit sums of its
  * token hashes (+1 when the token's hash has the bit set, −1 otherwise);
  * near-identical documents differ in few bits. Pair search splits the 64
  * bits into `blocks` chunks and bucket-joins on (block, chunk-value): by
  * pigeonhole, any pair within Hamming distance < blocks collides on ≥1
  * exact chunk — no O(n²) scan.
  */
object SimHash {

  /** 64-bit SimHash of a token array, as a signed long (single-expression
    * form — fine for one-off columns; [[fingerprints]] is the scale path).
    */
  def simhash(tokens: Column): Column = {
    val counts = aggregate(
      tokens,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          b => when(call_function("shiftright", xxhash64(t), b).bitwiseAND(1) === 1, 1).otherwise(-1)),
        (a, x) => a + x))
    packBits(counts)
  }

  /** Sign-vector counts → packed 64-bit fingerprint. */
  private def packBits(counts: Column): Column =
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, b) => when(c > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  /** Per-document fingerprints as explode → 64 partial-aggregated bit sums —
    * the scale formulation (map-side combine; each token hashed ONCE, not
    * re-evaluated per projection reference; one exchange by doc id).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // explicit-count repartition before the explode: small-file corpora
    // otherwise tokenize on however few splits the scan produced, and AQE's
    // byte-based coalescing can't see per-row CPU cost (see JaccardJoin)
    val hashed = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("id"),
        explode(filter(split(col(textCol), " "), t => t =!= "")).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val bitSums = hashed.groupBy(col("id"))
      .agg(sum(when(col("h").bitwiseAND(1L) =!= 0, 1).otherwise(-1)).as("c0"),
        (1 until 64).map(b =>
          sum(when(col("h").bitwiseAND(1L << b) =!= 0, 1).otherwise(-1)).as(s"c$b")): _*)
    bitSums.select(col("id"),
      packBits(array((0 until 64).map(b => col(s"c$b").cast("int")): _*)).as("fp"))
  }

  /** Hamming distance between two 64-bit fingerprints (as BIGINT). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")

  /** Near-dup candidate pairs with Hamming distance ≤ maxDist.
    *
    * Recall contract: COMPLETE only for maxDist < blocks — a pair differing
    * in d bits has at most d non-matching chunks, so d < blocks forces ≥1
    * exact chunk collision (pigeonhole). For maxDist ≥ blocks recall is
    * partial (pairs whose differing bits touch every chunk are missed);
    * callers wanting a larger radius must raise `blocks` accordingly.
    * Trade-off at scale: chunk width is 64/blocks bits, so bucket count per
    * block is 2^(64/blocks) — more blocks = full recall at larger radii but
    * coarser buckets (blocks=8 → 256-value chunks, fine to ~10⁹ docs;
    * blocks=4 → 65536-value chunks for the tightest-radius scale path).
    */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     maxDist: Int = 3, blocks: Int = 4): DataFrame = {
    val w = 64 / blocks
    val fp = fingerprints(df, idCol, textCol)
    // materialized: the bucket self-join below would otherwise execute the
    // whole fingerprint aggregation once per side
    val chunked = fp.select(col("id"), col("fp"),
      posexplode(transform(sequence(lit(0), lit(blocks - 1)),
        b => call_function("shiftrightunsigned", col("fp"), b * lit(w)).bitwiseAND((1L << w) - 1))))
      .withColumnRenamed("pos", "block").withColumnRenamed("col", "chunk")
      .transform(graft.Checkpoints.materialize(_))
    val a = chunked.select(col("block"), col("chunk"), col("id").as("id1"), col("fp").as("fp1"))
    val b = chunked.select(col("block"), col("chunk"), col("id").as("id2"), col("fp").as("fp2"))
    a.join(b, Seq("block", "chunk"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), hamming(col("fp1"), col("fp2")).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }
}
