package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The codegen'd BPE encoder must apply merge rules exactly like the q166
  * trainer's splice (sequential, left-to-right, non-overlapping) and must be
  * lossless: concatenating the emitted tokens rebuilds the word.
  */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference splice, byte-for-byte the q166 trainer's inner loop. */
  private def refEncode(w: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Array[String] = w.map(_.toString).toArray
    merges.foreach { case (l, r) =>
      val buf = collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          buf += l + r; i += 2
        } else { buf += syms(i); i += 1 }
      }
      syms = buf.toArray
    }
    syms.toSeq
  }

  test("crafted merges: sequential application, non-overlap, later rules see earlier output") {
    VectorFunctions.register(spark)
    val merges = Seq(("a", "b"), ("ab", "c"), ("d", "d"))
    val cases = Seq(
      "abc" -> Seq("abc"), // a+b then ab+c
      "ababc" -> Seq("ab", "abc"), // left-to-right, non-overlapping
      "dddd" -> Seq("dd", "dd"), // pair splice never re-overlaps
      "ddd" -> Seq("dd", "d"),
      "xaby" -> Seq("x", "ab", "y"),
      "a" -> Seq("a"),
      "" -> Seq())
    val got = cases.map(_._1).toDF("w")
      .select(VectorFunctions.bpe($"w", typedlit(merges.map { case (l, r) => s"$l $r" })).as("t"))
      .collect().map(_.getSeq[String](0).toSeq)
    cases.zip(got).foreach { case ((w, want), g) =>
      assert(g === want, s"encode($w)")
      assert(g === refEncode(w, merges), s"ref mismatch for $w")
    }
  }

  test("round-trip + replay over the real sf0.001 vocabulary with trained merges") {
    VectorFunctions.register(spark)
    val words = Tables(spark, sf0001, "documents")
      .select(explode(filter(split($"text", " "), t => t =!= "")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"w").limit(1000)
      .as[(String, Long)].collect()
    val dict = words.map { case (w, n) => (w.map(_.toString).toArray, n) }
    val merges = graft.operators.Text.bpeMergeLoop(dict, 30)
      .map { case (_, l, r, _, _) => (l, r) }
    val rules = typedlit(merges.map { case (l, r) => s"$l $r" })
    val got = words.map(_._1).toSeq.toDF("w")
      .select($"w", VectorFunctions.bpe($"w", rules).as("t"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toSeq))
    got.foreach { case (w, t) =>
      assert(t.mkString === w, s"round-trip broke for '$w'")
      assert(t === refEncode(w, merges), s"replay mismatch for '$w'")
    }
    // the trained rules actually compress: at least one word got shorter
    assert(got.exists { case (w, t) => t.length < w.length })
  }
}
