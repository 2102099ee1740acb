package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection over a text column —
  * the scale path for corpus dedup (exact pairwise Jaccard is O(n²);
  * LSH only pairs documents that collide in ≥1 band bucket).
  *
  * Formulated as explode → partial aggregate, the shape that scales AND
  * avoids a Catalyst trap: computing the k-permutation signature as one
  * nested array expression gets duplicated by projection collapse (the whole
  * k×shingles hash loop re-evaluates per reference — observed 50× slowdowns).
  * Here each (doc, shingle) row is hashed once per seed inside a hash
  * aggregate with map-side combine; the only shuffles are the per-doc
  * aggregation and the band-bucket join.
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

  /** Per-document k-minimum signature as k partial-aggregated mins over
    * exploded shingles (duplicate shingles don't affect the min — no
    * distinct needed).
    */
  def signatures(df: DataFrame, idCol: String, textCol: String,
                 k: Int, shingleWidth: Int): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    // explicit-count repartition before the explode (see JaccardJoin): keeps
    // shingling parallel on single-file corpora where AQE/scan splits won't
    val exploded = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("id"),
        explode(shingles(toks, shingleWidth)).as("sh"))
    exploded.groupBy(col("id"))
      .agg(min(xxhash64(lit(0), col("sh"))).as("m0"),
        (1 until k).map(j => min(xxhash64(lit(j), col("sh"))).as(s"m$j")): _*)
      .select(col("id"), array((0 until k).map(j => col(s"m$j")): _*).as("sig"))
  }

  /** Candidate pairs + estimated Jaccard from banded LSH.
    *
    * @param k     signature length (bands × rowsPerBand)
    * @param bands number of bands; more bands → lower collision threshold
    * @return (id1, id2, est_jaccard) for pairs colliding in ≥1 band
    */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 32, bands: Int = 8, shingleWidth: Int = 3): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val sig = signatures(df, idCol, textCol, k, shingleWidth)
    // materialized: the bucket self-join below would otherwise execute the
    // whole signature aggregation once per side
    val banded = sig.select(col("id"), col("sig"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(lit("band"), b, array_join(slice(col("sig"), b * r + lit(1), lit(r)), ",")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .transform(graft.Checkpoints.materialize(_))
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
