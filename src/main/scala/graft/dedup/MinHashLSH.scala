package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection over a text column —
  * the scale path for corpus dedup (exact pairwise Jaccard is O(n²);
  * LSH only pairs documents that collide in ≥1 band bucket).
  *
  * Everything is native Catalyst higher-order functions over arrays:
  * shingling (`slice` over a `sequence`), per-seed minhash (`array_min` of
  * `xxhash64`), banding (`slice` + `xxhash64`), bucket pairing (equi-join on
  * (band, hash)), and signature-agreement Jaccard estimation (`zip_with`).
  * No UDFs, no driver-side state; all shuffles are hash joins on bucket keys.
  *
  * Determinism: `xxhash64` is a fixed algorithm; seeds are literal ints.
  */
object MinHashLSH {

  /** Word-level w-shingles of a token array, joined with single spaces. */
  def shingles(tokens: Column, w: Int): Column =
    when(size(tokens) < w, array(array_join(tokens, " ")))
      .otherwise(transform(
        sequence(lit(0), size(tokens) - w),
        i => array_join(slice(tokens, i + lit(1), lit(w)), " ")))

  /** k-permutation MinHash signature of a shingle array. */
  def signature(sh: Column, k: Int): Column =
    array((0 until k).map(seed =>
      array_min(transform(sh, s => xxhash64(lit(seed), s)))): _*)

  /** Candidate pairs + estimated Jaccard from banded LSH.
    *
    * @param df        input with `idCol` and `textCol`
    * @param k         signature length (bands × rowsPerBand)
    * @param bands     number of bands; more bands → lower collision threshold
    * @return (id1, id2, est_jaccard) for pairs colliding in ≥1 band
    */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 32, bands: Int = 8, shingleWidth: Int = 3): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val sig = df
      .select(col(idCol).as("id"),
        signature(shingles(filter(split(col(textCol), " "), t => t =!= ""), shingleWidth), k).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(lit("band"), b, array_join(slice(col("sig"), b * r + lit(1), lit(r)), ",")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"), col("id").as("id1"), col("sig").as("sig1"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id2"), col("sig").as("sig2"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (aggregate(zip_with(col("sig1"), col("sig2"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / k).as("est_jaccard"))
      .distinct()
  }
}
