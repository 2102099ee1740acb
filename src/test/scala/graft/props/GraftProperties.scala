package graft.props

import graft.dedup.MinHashLSH
import graft.importer.{ImportConfig, Importer}
import graft.sources.Writers
import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import java.nio.file.Files

/** ScalaCheck properties (SURVEY.md §5.2 item 4): randomized invariants the
  * golden suites can't cover — round-trips, ordering, idempotence, layout,
  * and the MinHash error bound. Sample counts are reduced because every
  * sample runs real Spark jobs.
  */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("GraftProperties")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val nameGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))
  private val rowGen = for {
    id <- Gen.choose(0L, 1000000L)
    name <- nameGen
    score <- Gen.choose(-1000000L, 1000000L).map(_ / 100.0) // finite, csv-stable
    flag <- Gen.oneOf(true, false)
  } yield (id, name, score, flag)

  property("csv->parquet round-trip preserves typed values") =
    forAll(Gen.nonEmptyListOf(rowGen).map(_.take(50))) { rows =>
      val s = spark; import s.implicits._
      val dir = Files.createTempDirectory("graft-prop-csv").toString
      val df = rows.toDF("id", "name", "score", "flag")
      Writers.csv(df, s"$dir/in")
      val schemaFile = s"$dir/schema"
      Files.writeString(java.nio.file.Paths.get(schemaFile),
        "id=Long\nname=String\nscore=Double\nflag=Boolean\n")
      val out = Importer.readCsvWriteParquet(ImportConfig(
        srcFile = s"$dir/in", destFile = s"$dir/out", schemaFile = Some(schemaFile)))(spark)
      val back = spark.read.parquet(s"$dir/out")
        .as[(Long, String, Double, Boolean)].collect().toSet
      back == rows.toSet
    }

  property("sort output is totally ordered") =
    forAll(Gen.listOf(Gen.choose(-1000L, 1000L))) { xs =>
      val s = spark; import s.implicits._
      xs.isEmpty || {
        val sorted = xs.toDF("x").sort("x").as[Long].collect().toSeq
        sorted == xs.sorted
      }
    }

  property("exact dedup is idempotent and keeps one row per key") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 20), nameGen))) { pairs =>
      val s = spark; import s.implicits._
      val df = pairs.toDF("k", "v")
      val once = df.select("k").distinct()
      val twice = once.distinct()
      once.count() == pairs.map(_._1).distinct.size &&
        twice.count() == once.count()
    }

  property("partition layout = distinct value set of the partition column") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.choose(0, 100)))) { rows =>
      val s = spark; import s.implicits._
      val dir = Files.createTempDirectory("graft-prop-part").toString + "/out"
      Writers.partitionedParquet(rows.toDF("part", "v"), dir, Seq("part"))
      val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
        .map(_.getName).toSet
      dirs == rows.map(r => s"part=${r._1}").toSet
    }

  private val docGen: Gen[(List[String], List[String])] = for {
    shared <- Gen.listOfN(30, Gen.identifier.map(_.take(8)))
    extraA <- Gen.listOfN(10, Gen.identifier.map(_.take(8)))
    extraB <- Gen.listOfN(10, Gen.identifier.map(_.take(8)))
  } yield (shared ++ extraA, shared ++ extraB)

  private val eventGen: Gen[List[(Long, Long)]] = Gen.nonEmptyListOf(
    Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 10000L))).map(_.take(60))

  property("as-of join: every match is the latest right row at or before left") =
    forAll(eventGen, eventGen) { (leftRows, rightRows) =>
      val s = spark; import s.implicits._
      import graft.operators.AsOf
      val left = leftRows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      val right = rightRows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "rid")
      val out = AsOf.asofJoin(left, right, "k", "t", "t", rightTieBreak = Some("rid"))
        .select($"k", $"t", $"matched.t".as("mt"))
        .collect()
      val byKey = rightRows.groupBy(_._1)
      out.forall { r =>
        val (k, t) = (r.getLong(0), r.getLong(1))
        val expected = byKey.getOrElse(k, Nil).map(_._2).filter(_ <= t)
        if (r.isNullAt(2)) expected.isEmpty
        else expected.nonEmpty && r.getLong(2) == expected.max
      }
    }

  property("simhash fingerprints: hamming is symmetric, zero iff equal tokens") =
    forAll(Gen.nonEmptyListOf(Gen.identifier.map(_.take(6))).map(_.take(20))) { tokens =>
      val s = spark; import s.implicits._
      import graft.dedup.SimHash
      val df = Seq((1L, tokens.mkString(" ")), (2L, tokens.reverse.mkString(" ")))
        .toDF("doc_id", "text")
      val fps = SimHash.fingerprints(df, "doc_id", "text")
        .orderBy("id").select("fp").as[Long].collect()
      // simhash is order-insensitive (bag of tokens): permuted doc -> same fp
      fps(0) == fps(1)
    }

  property("minhash signature agreement tracks exact shingle jaccard") =
    forAll(docGen) { case (tokensA, tokensB) =>
      val s = spark; import s.implicits._
      val df = Seq((1L, tokensA.mkString(" ")), (2L, tokensB.mkString(" ")))
        .toDF("doc_id", "text")
      val sigs = MinHashLSH.signatures(df, "doc_id", "text", k = 32, shingleWidth = 3)
        .orderBy("id").collect()
      val s1 = sigs(0).getSeq[Long](1)
      val s2 = sigs(1).getSeq[Long](1)
      val est = s1.zip(s2).count { case (a, b) => a == b }.toDouble / 32
      def shingleSet(t: List[String]) = t.sliding(3).map(_.mkString(" ")).toSet
      val (sa, sb) = (shingleSet(tokensA), shingleSet(tokensB))
      val exact = (sa intersect sb).size.toDouble / (sa union sb).size
      // k=32 => sigma ~ sqrt(j(1-j)/32) <= 0.09; 4-sigma bound
      math.abs(est - exact) <= 0.36
    }

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 12)
    vocab <- Gen.nonEmptyListOf(Gen.identifier.map(_.take(4))).map(_.take(8))
    docs <- Gen.listOfN(n, Gen.nonEmptyListOf(Gen.oneOf(vocab)).map(_.take(15)))
  } yield docs.zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) }

  property("GM1 container: typed decode inverts construction for arbitrary ids") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, Long.MaxValue / 64)).map(_.take(20))) { ids =>
      val s = spark; import s.implicits._
      import graft.multimodal.{MediaRow, Multimodal}
      val media = Multimodal.mediaTable(ids.distinct.toDF("doc_id"))
      val feats = Multimodal.decodeFeatures(media.as[MediaRow]).collect()
        .map(f => f.doc_id -> f).toMap
      ids.distinct.forall { id =>
        val f = feats(id)
        f.format == Multimodal.Formats((id % 4).toInt) &&
          f.width == (1 + id % 8).toInt * 64 &&
          f.height == (1 + id % 4).toInt * 64 &&
          f.n_bytes == 32 + id % 97 &&
          f.byte_sum == (0L until f.n_bytes).map(i => (id * 31 + i * 17) % 256).sum
      }
    }

  property("weighted sample: inclusion is weight-monotone and hash-deterministic") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 1000000L)).map(_.distinct.take(100))) { ids =>
      val s = spark; import s.implicits._
      // same ids with two weights: every id kept at weight w must also be
      // kept at weight 2w (inclusion probability is monotone in the weight),
      // and repeated evaluation is identical (pure hash, no RNG)
      val lo = ids.map(i => (i, 200L)).toDF("id", "w")
      val hi = ids.map(i => (i, 400L)).toDF("id", "w")
      def kept(df: org.apache.spark.sql.DataFrame): Set[Long] =
        graft.operators.TrainingOps.portableWeightedSample(df, "id", "w")
          .select($"id").as[Long].collect().toSet
      val keptLo = kept(lo)
      keptLo.subsetOf(kept(hi)) && kept(lo) == keptLo
    }

  property("prefix-filtered jaccard join = brute force (complete, exact)") =
    forAll(corpusGen) { docs =>
      val s = spark; import s.implicits._
      val df = docs.toDF("doc_id", "text")
      val got = graft.dedup.JaccardJoin.pairs(df, "doc_id", "text", 1L, 2L, shingleWidth = 3)
        .select($"id1", $"id2", $"inter").as[(Long, Long, Long)].collect().toSet
      def shingleSet(t: String): Set[String] = {
        val toks = t.split(" ").filter(_.nonEmpty).toList
        if (toks.size < 3) Set(toks.mkString(" "))
        else toks.sliding(3).map(_.mkString(" ")).toSet
      }
      val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
      val want = (for {
        i <- sets.keys; j <- sets.keys if i < j
        inter = (sets(i) & sets(j)).size
        if 3 * inter >= sets(i).size + sets(j).size
      } yield (i, j, inter.toLong)).toSet
      got == want
    }
}
