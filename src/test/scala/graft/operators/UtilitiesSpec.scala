package graft.operators

import graft.{Engine, SparkSpec, Tables}
import graft.sources.Writers
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Catalog facade, skew-salting, and writer utilities. */
class UtilitiesSpec extends SparkSpec {
  import spark.implicits._

  test("openCatalog exposes every table + custom functions to spark.sql") {
    val df = Engine.sql(spark, sf0001,
      """SELECT r_name, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
    assert(df.count() === 5)
    // ts2 view and graft_cosine both registered
    assert(spark.sql("SELECT max(ts2) FROM events_ts2").count() === 1)
    assert(spark.sql(
      "SELECT graft_cosine(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) FROM embeddings LIMIT 1")
      .collect()(0).getDouble(0) > 0.999999)
  }

  test("salted aggregation equals direct aggregation exactly") {
    val li = Tables(spark, sf0001, "lineitem")
    val direct = li.groupBy($"l_returnflag".as("key"))
      .agg(sum($"l_quantity".cast(org.apache.spark.sql.types.DecimalType(18, 4))).cast("double").as("sum_v"),
        count(lit(1)).as("cnt"))
      .orderBy($"key").collect().toSeq
    val salted = Skew.saltedSumCount(li, $"l_returnflag", $"l_quantity")
      .orderBy($"key").collect().toSeq
    assert(salted === direct) // decimal sums are associative -> bit-equal
  }

  test("saltedJoin equals the plain join row-for-row and actually spreads hot keys") {
    val ev = Tables(spark, sf0001, "events")
      .select($"event_id", $"user_id", $"value")
    val cust = Tables(spark, sf0001, "customer")
      .select($"c_custkey", $"c_mktsegment")
    val salted = Skew.saltedJoin(ev, $"user_id", $"event_id", cust, $"c_custkey")
      .select($"event_id", $"user_id", $"c_custkey", $"c_mktsegment")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val plain = ev.join(cust, $"user_id" === $"c_custkey")
      .select($"event_id", $"user_id", $"c_custkey", $"c_mktsegment")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(salted.toSeq === plain.toSeq)
    // spread: the hottest key's probe rows land in >1 salt slice
    val hot = ev.groupBy($"user_id").count().orderBy(desc("count"), $"user_id")
      .head.getLong(0)
    val slices = ev.filter($"user_id" === hot)
      .select(pmod($"event_id", lit(8)).as("s")).distinct().count()
    assert(slices > 1, s"hot key $hot not spread across salt slices")
  }

  test("saltedAgg: whitelist matches direct aggregation; misuse throws") {
    val li = Tables(spark, sf0001, "lineitem")
    val direct = li.groupBy($"l_returnflag".as("key"))
      .agg(sum($"l_quantity".cast(org.apache.spark.sql.types.DecimalType(18, 4))).cast("double").as("sum_v"),
        min($"l_quantity").as("min_v"), max($"l_quantity").as("max_v"))
      .orderBy($"key").collect().toSeq
    val salted = Skew.saltedAgg(li, $"l_returnflag", $"l_quantity", Seq("sum", "min", "max"))
      .orderBy($"key").collect().toSeq
    assert(salted === direct)
    // non-decomposable aggregates are rejected up front, not silently wrong
    val e = intercept[IllegalArgumentException] {
      Skew.saltedAgg(li, $"l_returnflag", $"l_quantity", Seq("sum", "median"))
    }
    assert(e.getMessage.contains("median"))
    intercept[IllegalArgumentException] {
      Skew.saltedAgg(li, $"l_returnflag", $"l_quantity", Seq("avg"))
    }
  }

  test("partitioned writer: bounded files, hive layout, sorted within files") {
    val out = Files.createTempDirectory("graft-writer").toString + "/out"
    Writers.partitionedParquet(
      Tables(spark, sf0001, "orders").withColumn("y", year($"o_orderdate")),
      out, partitionCols = Seq("y"), sortCols = Seq("o_orderkey"), maxRecordsPerFile = 100)
    val back = spark.read.parquet(out)
    assert(back.count() === Tables(spark, sf0001, "orders").count())
    // file bound respected: each parquet file has <= 100 records
    val files = back.select(input_file_name().as("f")).groupBy($"f").count().collect()
    assert(files.forall(_.getLong(1) <= 100))
    assert(files.length > back.count() / 100 - 1)
  }

  test("csv/json/orc round-trips preserve row counts") {
    val dir = Files.createTempDirectory("graft-sinks").toString
    val nation = Tables(spark, sf0001, "nation")
    Writers.csv(nation, s"$dir/csv"); Writers.json(nation, s"$dir/json"); Writers.orc(nation, s"$dir/orc")
    assert(spark.read.option("header", "true").csv(s"$dir/csv").count() === 25)
    assert(spark.read.json(s"$dir/json").count() === 25)
    assert(spark.read.orc(s"$dir/orc").count() === 25)
  }

  test("dynamic partition overwrite makes reprocessing idempotent") {
    // the 100 TB operations concern: re-running a day's batch must replace
    // that day's partitions, not append duplicates or truncate the table
    val out = Files.createTempDirectory("graft-dyn").toString + "/t"
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      val orders = Tables(spark, sf0001, "orders")
        .withColumn("y", year($"o_orderdate"))
      orders.write.partitionBy("y").mode("overwrite").parquet(out)
      val full = spark.read.parquet(out).count()
      // "reprocess" one partition: same rows, overwrite mode
      val oneYear = orders.filter($"y" === 1995)
      oneYear.write.partitionBy("y").mode("overwrite").parquet(out)
      val after = spark.read.parquet(out)
      assert(after.count() === full, "reprocessing a partition changed the total")
      assert(after.filter($"y" === 1995).count() === oneYear.count())
      assert(after.filter($"y" =!= 1995).count() === full - oneYear.count(),
        "untouched partitions must survive a dynamic overwrite")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("partition pruning: a partition-column filter reads only matching directories") {
    val out = Files.createTempDirectory("graft-prune").toString + "/t"
    Tables(spark, sf0001, "orders").withColumn("y", year($"o_orderdate"))
      .write.partitionBy("y").parquet(out)
    val pruned = spark.read.parquet(out).filter($"y" === 1995)
    // the scan must touch only y=1995 files — the property that makes a
    // date-partitioned 100 TB table cheap to query
    val files = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(files.forall(_.contains("y=1995")), s"unpruned files: ${files.filterNot(_.contains("y=1995")).take(3).toSeq}")
    assert(pruned.count() === Tables(spark, sf0001, "orders")
      .filter(year($"o_orderdate") === 1995).count())
  }

  test("schema evolution: mergeSchema unifies files written with added columns") {
    val dir = Files.createTempDirectory("graft-evolve").toString + "/t"
    val nation = Tables(spark, sf0001, "nation")
    nation.select($"n_nationkey", $"n_name").write.parquet(dir)
    nation.select($"n_nationkey", $"n_name", $"n_regionkey")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("n_nationkey", "n_name", "n_regionkey"))
    assert(merged.count() === 50)
    // rows from the old-schema files surface the new column as NULL
    assert(merged.filter($"n_regionkey".isNull).count() === 25)
  }

  test("ignoreCorruptFiles: a torn file degrades to a warning, not a failed job") {
    val dir = Files.createTempDirectory("graft-corrupt").toString + "/t"
    Tables(spark, sf0001, "nation").write.parquet(dir)
    // plant a torn/garbage file alongside the good ones
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-junk.parquet"),
      Array.fill(128)(0x42.toByte))
    val prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    try {
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
      assert(spark.read.parquet(dir).count() === 25)
    } finally spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)
  }

  test("q77 repetition invariants: ratios in (0,1], distinct <= total") {
    Text.q77DocRepetition(spark, sf0001).collect().foreach { r =>
      val (n, d) = (r.getLong(1), r.getLong(2))
      val (dr, ts) = (r.getDouble(3), r.getDouble(4))
      assert(d >= 1 && d <= n, s"doc ${r.getLong(0)}: distinct $d vs total $n")
      assert(dr > 0 && dr <= 1.0 && ts > 0 && ts <= 1.0)
      // the most frequent token accounts for at least the mean share
      assert(ts >= 1.0 / d - 1e-6)
    }
  }

  test("q81 pagerank invariants: floor rank, mass bound, total order") {
    val rows = Graph.q81CopurchaseRank(spark, sf0001).collect()
    assert(rows.length === 25)
    val ranks = rows.map(_.getLong(1))
    // every node keeps the teleport floor; damping bounds the total mass,
    // so no single rank can exceed the whole graph's injected mass
    assert(ranks.forall(_ >= 150000L))
    assert(ranks.forall(_ <= 1000000L * 2000))
    assert(ranks.sameElements(ranks.sortBy(-_)), "not rank-descending")
  }

  test("q82 tf-idf invariants: score >= tf, at most 5 per doc, rank dense") {
    val rows = Text.q82Tfidf(spark, sf0001).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, docRows) =>
      assert(docRows.length <= 5)
      assert(docRows.map(_.getLong(1)).sorted.sameElements(1L to docRows.length))
    }
    // tf*N/df >= tf because df <= N
    rows.foreach(r => assert(r.getDouble(4) >= r.getLong(3).toDouble - 1e-6))
  }

  test("q84 calendar fill: contiguous months, counts conserve") {
    val rows = Extras.q84RecursiveCte(spark, sf0001).collect()
    val months = rows.map(_.getString(0))
    assert(months.length >= 2)
    // contiguous: each successive month is the +1-month successor
    months.sliding(2).foreach { case Array(a, b) =>
      val next = java.time.LocalDate.parse(a).plusMonths(1)
      assert(next.toString === b, s"gap between $a and $b")
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total === Tables(spark, sf0001, "orders").count())
  }

  test("q132 trajectories: deterministic order, counts conserve per session") {
    val rows = Events.q132TrajectoryAssembly(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // n_events must equal the trajectory's token count for every session
    rows.foreach { r =>
      val n = r.getLong(2)
      val traj = r.getString(4)
      assert(traj.split(" ").length.toLong === n, s"token count != n_events: $r")
      assert(r.getLong(3) >= 0L)
    }
    // value pin: the busiest user's first session must equal an independent
    // driver-side reconstruction ordered by (epoch-second, event_id) — the
    // post-collect array_sort, not collect_list's arrival order, decides
    val u = rows.groupBy(_.getLong(0)).maxBy(_._2.map(_.getLong(2)).sum)._1
    val raw = Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", $"event_type",
        $"ts2".cast("long").as("es"))
      .where($"user_id" === u).collect()
      .map(r => (r.getLong(3), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    // replay the 30-min-gap sessionization on the driver
    var sess = 0L; var prev = Long.MinValue
    val firstSession = raw.takeWhile { case (es, _, _) =>
      if (prev == Long.MinValue || es - prev > 1800) sess += 1
      prev = es
      sess == 1
    }
    val expected = firstSession.map(_._3).mkString(" ")
    val got = rows.filter(r => r.getLong(0) == u && r.getLong(1) == 1L)
    assert(got.length === 1 && got(0).getString(4) === expected)
  }

  test("q133 quality blend: every doc scored once, blend in [0,1], decile consistent") {
    val rows = Text.q133QualityBlend(spark, sf0001).collect()
    assert(rows.length.toLong === Tables(spark, sf0001, "documents").count())
    rows.foreach { r =>
      val blend = r.getDouble(3)
      val decile = r.getLong(4)
      assert(blend >= 0.0 && blend <= 1.0, s"blend out of [0,1]: $r")
      // decile derives from the unrounded blend in [decile/10, (decile+1)/10)
      // (decile 9 also admits blend = 1.0); the ROUNDED blend can sit at most
      // 5e-5 past either bucket edge
      assert(decile >= 0L && decile <= 9L, s"decile out of range: $r")
      assert(decile.toDouble / 10 - 5e-5 <= blend && blend <= (decile + 1).toDouble / 10 + 5e-5,
        s"decile inconsistent with rounded blend: $r")
    }
  }

  test("q134 dup attribution: survivors+dups conserve, survivors = distinct vocab sets") {
    val rows = Text.q134DupAttribution(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) === r.getLong(1),
        s"n_survivors + dup_docs != n_docs: $r")
    }
    // total survivors across sources must equal the corpus' distinct
    // vocabulary-set count, computed independently
    val expected = Tables(spark, sf0001, "documents")
      .select(array_join(array_sort(array_distinct(
        filter(split($"text", " "), t => t =!= ""))), " ").as("fp"))
      .distinct().count()
    assert(rows.map(_.getLong(2)).sum === expected)
  }

  test("q135 datasheet: shares sum to 1, ttr bounded, totals cross-check") {
    val rows = Text.q135CorpusDatasheet(spark, sf0001).collect()
    val docs = Tables(spark, sf0001, "documents")
    assert(rows.map(_.getLong(1)).sum === docs.count())
    assert(rows.map(_.getLong(2)).sum ===
      docs.agg(sum($"n_chars")).collect()(0).getLong(0))
    assert(math.abs(rows.map(_.getDouble(7)).sum - 1.0) < 1e-2,
      "share_chars must sum to ~1 (each share rounded to 4 places)")
    rows.foreach { r =>
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0, s"ttr out of (0,1]: $r")
      assert(r.getDouble(6) >= 0.0, s"negative entropy: $r")
    }
  }

  test("q138 vocab coverage: monotone, exact at k=1, saturates at vocab size") {
    val rows = Text.q138VocabCoverage(spark, sf0001).collect()
    assert(rows.length === 6)
    // monotone nondecreasing in k, bounded by 1
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(3) + 1e-12, s"coverage not monotone: $a -> $b")
    }
    // k=1 covers exactly the most frequent token's occurrence count
    val topCount = Tables(spark, sf0001, "documents")
      .select(explode(filter(split($"text", " "), t => t =!= "")).as("t"))
      .groupBy($"t").count().agg(max($"count")).collect()(0).getLong(0)
    assert(rows.head.getLong(1) === topCount)
    // any k >= vocab_size covers everything
    val vocab = rows.head.getLong(2)
    rows.filter(_.getLong(0) >= vocab).foreach(r =>
      assert(r.getDouble(3) === 1.0, s"k >= vocab must cover all: $r"))
  }

  test("q139 cluster cap: min(3, size) survivors per cluster, singletons untouched") {
    val kept = Text.q139ClusterCap(spark, sf0001).collect()
    assert(kept.nonEmpty)
    kept.foreach(r => assert(r.getLong(3) >= 1L && r.getLong(3) <= 3L))
    // independent cluster sizes from the same fingerprint
    val sizes = Tables(spark, sf0001, "documents")
      .select(array_join(array_sort(array_distinct(
        filter(split($"text", " "), t => t =!= ""))), " ").as("fp"))
      .groupBy($"fp").count().collect().map(_.getLong(1))
    val expectedKept = sizes.map(n => math.min(3L, n)).sum
    assert(kept.length.toLong === expectedKept,
      s"kept ${kept.length} != sum of min(3, cluster_size) = $expectedKept")
    // every singleton survives with rank 1
    val singletons = sizes.count(_ == 1L).toLong
    assert(kept.count(r => r.getLong(2) == 1L && r.getLong(3) == 1L).toLong === singletons)
  }

  test("q141 group split: driver replay agrees, both splits populated") {
    val rows = Text.q141GroupSplit(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet === Set("train", "test"))
    assert(rows.map(_.getLong(2)).sum === Tables(spark, sf0001, "documents").count())
    // replay the whole assignment driver-side: fingerprint -> cluster key
    // (min doc_id) -> portable MINSTD bucket -> split; per-(split, source)
    // doc counts must match exactly (split is a pure function of the
    // cluster, so no cluster can straddle — this verifies the function)
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"source",
        array_join(array_sort(array_distinct(
          filter(split($"text", " "), t => t =!= ""))), " ").as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val clusterKey = docs.groupBy(_._3).map { case (fp, xs) => fp -> xs.map(_._1).min }
    def bucket(id: Long): Long = {
      val p = 2147483647L
      val h1 = ((id % p) * 48271L) % p
      (((h1 + 1L) * 16807L) % p) % 10000L
    }
    val expected = docs.groupBy { case (_, source, fp) =>
      (if (bucket(clusterKey(fp)) < 2000L) "test" else "train", source)
    }.map { case (k, xs) => k -> (xs.length.toLong, xs.map(x => clusterKey(x._3)).distinct.length.toLong) }
    rows.foreach { r =>
      val (nDocs, nClusters) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === nDocs && r.getLong(3) === nClusters,
        s"driver replay disagrees at (${r.getString(0)}, ${r.getString(1)})")
    }
    assert(rows.count(_.getString(0) == "test") > 0 && rows.count(_.getString(0) == "train") > 0)
  }

  test("q142 bm25: descending top-20, every hit contains a probe term") {
    val rows = Text.q142Bm25(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(1) > b.getDouble(1)
          || (a.getDouble(1) == b.getDouble(1) && a.getLong(0) < b.getLong(0)))
      case _ => ()
    }
    assert(rows.forall(_.getDouble(1) > 0.0))
    val withTerm = Tables(spark, sf0001, "documents")
      .filter($"text".rlike("\\b(spark|window|merge)\\b"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(withTerm(r.getLong(0)),
      s"doc ${r.getLong(0)} scored but contains no probe term"))
  }

  test("q143 denylist scrub: redaction count matches hits, no survivor tokens") {
    val rows = Text.q143DenylistScrub(spark, sf0001).collect()
    assert(rows.length === Tables(spark, sf0001, "documents").count())
    val deny = Set("customer", "vector", "secret")
    rows.foreach { r =>
      val hits = r.getLong(2)
      assert(hits <= r.getLong(1))
      val scrubbed = r.getString(3)
      assert(scrubbed.split(" ").filter(_.nonEmpty).forall(t => !deny(t)),
        s"doc ${r.getLong(0)}: denylist token survived scrubbing")
      assert("\\[REDACTED\\]".r.findAllIn(scrubbed).length.toLong === hits,
        s"doc ${r.getLong(0)}: redaction count != n_hits")
    }
  }

  test("q144 rrf fusion: ranks bounded by the top-100 cut, score replays from ranks") {
    val rows = Text.q144RrfFusion(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val ra = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rb = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(ra.nonEmpty || rb.nonEmpty)
      (ra.toSeq ++ rb.toSeq).foreach(x => assert(x >= 1L && x <= 100L))
      val expected = BigDecimal(
        ra.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
          + rb.map(x => 1.0 / (60.0 + x)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expected) < 1e-9,
        s"doc ${r.getLong(0)}: rrf_score ${r.getDouble(3)} != $expected from ranks $ra/$rb")
    }
  }

  test("q145 preference pairs: sides disjoint, count = sum floor(n/2), margin >= 0") {
    val rows = NorthStar.q145PreferencePairs(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val chosen = rows.map(_.getLong(2)).toSet
    val rejected = rows.map(_.getLong(3)).toSet
    assert(chosen.intersect(rejected).isEmpty,
      "a doc appears as both chosen and rejected")
    val perSource = Tables(spark, sf0001, "documents")
      .groupBy($"source").count().collect()
      .map(r => r.getLong(1) / 2L).sum
    assert(rows.length.toLong === perSource,
      s"${rows.length} pairs != sum of floor(n_source/2) = $perSource")
    rows.foreach { r =>
      assert(r.getLong(6) >= 0L && r.getLong(4) >= r.getLong(5),
        s"pair (${r.getString(0)}, ${r.getLong(1)}): chosen score below rejected")
    }
  }

  test("q136 chunk pairs: anchors full-width, 10-token overlap with positive") {
    val rows = Text.q136ChunkPairs(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val anchor = r.getString(2).split(" ")
      val positive = r.getString(3).split(" ")
      // anchors are never the last chunk, so always exactly chunkLen tokens
      assert(anchor.length === 40, s"anchor not full-width: $r")
      // stride 30 < chunkLen 40 → the pair shares the anchor's last 10
      // tokens as the positive's first tokens (fewer only if the positive
      // is a short final chunk)
      val overlap = math.min(10, positive.length)
      assert(anchor.slice(30, 30 + overlap).sameElements(positive.take(overlap)),
        s"anchor/positive overlap mismatch: $r")
    }
    // pair count per doc = n_chunks - 1 over the >1-chunk docs
    val expected = Tables(spark, sf0001, "documents")
      .select(size(filter(split($"text", " "), t => t =!= "")).as("n"))
      .collect().map(_.getInt(0))
      .map(n => if (n <= 40) 0L else (n - 40 + 29) / 30).sum
    assert(rows.length.toLong === expected)
  }

  test("q146 heavy hitters: sketch-then-verify equals exact full-shuffle answer") {
    val got = Text.q146HeavyHitters(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // exact twin: full token-frequency groupBy (the shuffle q146 avoids)
    val tokens = Tables(spark, sf0001, "documents")
      .select(explode(filter(split($"text", " "), t => t =!= "")).as("token"))
    val total = tokens.count()
    val exact = tokens.groupBy($"token").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .filter { case (_, c) => c * 50L > total }
      .sortBy { case (t, c) => (-c, t) }
    // the KSP sketch's candidate superset + exact gate must reproduce the
    // true heavy-hitter set exactly — false positives filtered, none missed
    assert(got.toSeq === exact.toSeq)
    assert(got.nonEmpty)
  }

  test("q147 split leakage: counts equal a brute-force audit of the pair relation") {
    val row = NorthStar.q147SplitLeakage(spark, sf0001).collect()(0)
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    def shingles(tk: Array[String]): Set[String] =
      if (tk.length < 3) Set(tk.mkString(" "))
      else tk.sliding(3).map(_.mkString(" ")).toSet
    val sh = docs.map { case (id, tk) => (id, shingles(tk)) }
    val pairs = for {
      i <- sh.indices; j <- (i + 1) until sh.length
      (idA, sA) = sh(i); (idB, sB) = sh(j)
      inter = (sA intersect sB).size
      if 3L * inter >= sA.size + sB.size
    } yield (math.min(idA, idB), math.max(idA, idB))
    val fp = docs.map { case (id, tk) => (id, tk.distinct.sorted.mkString(" ")) }
    val ck = fp.groupBy(_._2).iterator.flatMap { case (_, g) =>
      val m = g.map(_._1).min; g.map { case (id, _) => (id, m) }
    }.toMap
    def isTest(id: Long): Boolean = {
      val p = 2147483647L
      val h1 = ((id % p) * 48271L) % p
      (((h1 + 1L) * 16807L) % p) % 10000L < 2000L
    }
    val naive = pairs.count { case (a, b) => isTest(a) != isTest(b) }
    val cluster = pairs.count { case (a, b) => isTest(ck(a)) != isTest(ck(b)) }
    assert(row.getLong(0) === pairs.length.toLong)
    assert(row.getLong(1) === naive.toLong)
    assert(row.getLong(2) === cluster.toLong)
    assert(pairs.nonEmpty, "fixture has no near-dup pairs — audit vacuous")
  }

  test("q148 bigram LM: scores equal a brute-force add-one bigram model") {
    val got = Text.q148BigramLm(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val bi = docs.flatMap { case (id, tk) =>
      tk.iterator.zip(tk.iterator.drop(1)).map { case (a, b) => (id, a, b) }.toSeq
    }
    val cb = bi.groupBy(t => (t._2, t._3)).view.mapValues(_.length).toMap
    val cu = bi.groupBy(_._2).view.mapValues(_.length).toMap
    val v = docs.flatMap(_._2).distinct.length
    val expected = bi.groupBy(_._1).view.mapValues { g =>
      val n = g.length.toLong
      val s = g.iterator.map { case (_, a, b) =>
        math.log((cb((a, b)) + 1.0) / (cu(a) + v.toDouble)) / math.log(2.0)
      }.sum
      (n, BigDecimal(s / n).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    assert(got.nonEmpty && got.length === expected.size)
    got.foreach { case (id, n, avg) =>
      val (en, eavg) = expected(id)
      assert(n === en, s"doc $id: n_bigrams $n != $en")
      assert(math.abs(avg - eavg) <= 1e-4 + 1e-12,
        s"doc $id: avg_logp2 $avg != $eavg")
    }
  }

  test("q149 contamination coverage: doc set equals q119's, coverage equals interval merge") {
    val got = NorthStar.q149ContaminationCoverage(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty, "fixture has no contaminated docs — query vacuous")
    // any-hit membership (q119) and coverage > 0 (q149) select the same docs
    val q119Docs = NorthStar.q119BenchmarkDecontamination(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet === q119Docs)
    // brute-force: benchmark 8-gram set + merged-interval coverage per doc
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").filter(_.nonEmpty)))
    def wins(tk: Array[String]): Seq[(Int, String)] =
      if (tk.length < 8) Seq((0, tk.mkString(" ")))
      else tk.sliding(8).zipWithIndex.map { case (w, i) => (i, w.mkString(" ")) }.toSeq
    val bench = docs.filter(_._2 == "src0").flatMap(d => wins(d._3).map(_._2)).toSet
    got.foreach { case (id, nTok, nHit, covered, cov) =>
      val tk = docs.find(_._1 == id).get._3
      assert(nTok === tk.length.toLong)
      val hits = wins(tk).filter(w => bench(w._2))
      assert(nHit === hits.length.toLong)
      val L = math.min(8, tk.length)
      var end = 0L; var c = 0L
      hits.foreach { case (i, _) =>
        c += math.max(0L, i + L - math.max(end, i.toLong)); end = math.max(end, i + L)
      }
      assert(covered === c, s"doc $id: covered $covered != merged-interval $c")
      assert(math.abs(cov - BigDecimal(c.toDouble / tk.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("q150 eval quota: exactly B docs, Hamilton apportionment, MINSTD fill order") {
    val rows = NorthStar.q150EvalQuota(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 200, s"selected ${rows.length} docs, budget is 200")
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"lang", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val n = docs.length.toLong
    val cellN = docs.groupBy(d => (d._2, d._3)).view.mapValues(_.length.toLong).toMap
    val gotPerCell = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.length.toLong).toMap
    // every cell's count is within 1 of its exact share (the Hamilton bound)
    cellN.foreach { case (cell, cn) =>
      val exact = 200.0 * cn / n
      val got = gotPerCell.getOrElse(cell, 0L)
      assert(got <= cn, s"cell $cell: quota $got exceeds cell size $cn")
      assert(math.abs(got - exact) < 1.0,
        s"cell $cell: quota $got not within 1 of exact share $exact")
    }
    // fill order: each cell's picks are its MINSTD-first docs
    def h(id: Long): Long = {
      val p = 2147483647L
      ((((id % p) * 48271L) % p + 1L) * 16807L) % p % 10000L
    }
    rows.groupBy(r => (r._1, r._2)).foreach { case (cell, sel) =>
      val expected = docs.filter(d => (d._2, d._3) == cell)
        .sortBy(d => (h(d._1), d._1)).take(sel.length).map(_._1).toSet
      assert(sel.map(_._4).toSet === expected, s"cell $cell: wrong fill set")
      assert(sel.sortBy(_._3).map(_._4).toSeq ===
        sel.map(_._4).toSeq.sortBy(id => (h(id), id)), s"cell $cell: wrong rank order")
    }
  }

  test("q151 matryoshka top-k: both rankings equal a brute-force cosine on collected vectors") {
    val rows = Similarity.q151MatryoshkaTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val embs = Tables(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def top10(vecs: Array[(Long, Array[Double])], pv: Array[Double]) =
      vecs.map { case (id, v) => (id, r6(cos(v, pv))) }
        .sortBy { case (id, sc) => (-sc, id) }.take(10)
    val probes = embs.filter(_._1 < 5)
    assert(rows.length === probes.length * 10)
    probes.foreach { case (pid, pv) =>
      val fullSet = top10(embs, pv).map(_._1).toSet
      val e8 = embs.map { case (id, v) => (id, v.take(8)) }
      val expected = top10(e8, pv.take(8))
      val got = rows.filter(_._1 == pid).sortBy(_._2)
      got.zip(expected).zipWithIndex.foreach { case (((_, rk, id, s8, inF), (eid, es8)), i) =>
        assert(rk === i + 1L)
        assert(id === eid, s"probe $pid rank ${i + 1}: id $id != $eid")
        assert(math.abs(s8 - es8) < 1e-9)
        assert(inF === (if (fullSet(id)) 1L else 0L), s"probe $pid id $id: flag wrong")
      }
    }
    // the truncation must actually cost some agreement somewhere, or the
    // fixture makes the drift measurement vacuous
    assert(rows.exists(_._5 == 0L), "all truncated hits are in full top-10")
  }

  test("q154 lang rebalance: thresholds and accept counts equal integer brute force") {
    val rows = NorthStar.q154LangRebalance(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toLong
    val l = counts.size.toLong
    def h(id: Long): Long = {
      val p = 2147483647L
      ((((id % p) * 48271L) % p + 1L) * 16807L) % p % 10000L
    }
    assert(rows.length === counts.size)
    rows.foreach { case (lang, nb, t, na) =>
      assert(nb === counts(lang))
      assert(t === math.min(10000L, (10000L * n) / (l * counts(lang))),
        s"$lang: threshold $t wrong")
      val expected = docs.count { case (id, lg) => lg == lang && h(id) < t }.toLong
      assert(na === expected, s"$lang: n_after $na != $expected")
      assert(na <= nb)
    }
    // the rebalance must actually thin SOMETHING and keep a minority whole
    assert(rows.exists(r => r._4 < r._2), "no language was downsampled")
    assert(rows.exists(r => r._3 == 10000L && r._4 == r._2),
      "no minority language kept everything")
  }

  test("q160 PII redaction: nothing PII-shaped survives, every category hit once") {
    val emailRe = "[A-Za-z0-9._%-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b".r
    val phoneRe = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}".r
    val rows = Text.q160PiiRedaction(spark, sf0001).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (nE, nI, nP, clean) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      // we synthesized exactly one contact of each category per doc
      assert(nE === 1L && nI === 1L && nP === 1L, s"counts off: $r")
      assert(emailRe.findFirstIn(clean).isEmpty, s"email survived: $clean")
      assert(ipRe.findFirstIn(clean).isEmpty, s"ip survived: $clean")
      assert(phoneRe.findFirstIn(clean).isEmpty, s"phone survived: $clean")
      assert(clean.contains("<EMAIL>") && clean.contains("<IP>") && clean.contains("<PHONE>"))
    }
  }

  test("q161 gopher repetition: array-fold metrics equal a brute-force token replay") {
    val rows = Text.q161GopherRepetition(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.size === docs.length)
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.foreach { case (id, text) =>
      val tk = text.split(" ").filter(_.nonEmpty).toSeq
      val bi = tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val tri = tk.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      def runs(xs: Seq[String]) =
        if (xs.isEmpty) 0L
        else xs.foldLeft(("", 0L, 0L)) { case ((p, c, b), t) =>
          val c2 = if (t == p) c + 1 else 1L; (t, c2, math.max(b, c2))
        }._3
      val r = rows(id)
      assert(r.getLong(1) === tk.size.toLong)
      assert(r.getLong(2) === bi.size.toLong)
      assert(r.getDouble(3) === round6(1.0 - bi.distinct.size.toDouble / bi.size))
      assert(r.getDouble(4) === round6(
        bi.groupBy(identity).values.map(_.size).max.toDouble / bi.size))
      assert(r.getDouble(5) === round6(1.0 - tri.distinct.size.toDouble / tri.size))
      assert(r.getLong(6) === runs(tk))
    }
    // the corpus must exercise the filters: some doc repeats an n-gram
    assert(rows.values.exists(_.getDouble(3) > 0), "no duplicate bigram anywhere")
    assert(rows.values.exists(_.getLong(6) >= 2), "no consecutive repeat anywhere")
  }

  test("q166 BPE merges: hand-computed merges on the classic crafted corpus") {
    // the standard BPE teaching corpus: hug x10, pug x5, pun x12, bun x4, hugs x5
    val dir = Files.createTempDirectory("q166fix").toString
    try {
      val text = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun")
        ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")).mkString(" ")
      Seq((0L, text)).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = Text.q166BpeMerges(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      // initial pairs: (u,g)=20, (p,u)=17, (u,n)=16, (h,u)=15, (g,s)=5,
      // (b,u)=4 -> merge "ug"; then (p,u) falls to 12 (pug is now [p,ug]),
      // so (u,n)=16 leads; then (h,ug)=15
      assert(got.take(3).toSeq === Seq(
        (1L, "u", "g", "ug", 20L),
        (2L, "u", "n", "un", 16L),
        (3L, "h", "ug", "hug", 15L)))
      // full fixpoint invariants
      assert(got.map(_._1).toSeq === (1L to got.length).toSeq)
      got.foreach { case (_, l, r, m, f) => assert(m === l + r && f > 0) }
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  test("q166 BPE merges on the corpus: valid fixpoint, merges actually compose") {
    val got = Text.q166BpeMerges(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.length === 10)
    assert(got.map(_._1).toSeq === (1L to 10L).toSeq)
    got.foreach { case (_, l, r, m, f) => assert(m === l + r && f > 0) }
    // a later merge must build on an earlier one (multi-char side), or the
    // corpus would be trivially 1-char — the word-soup corpus composes
    assert(got.exists(g => g._2.length > 1 || g._3.length > 1))
  }

  test("q167 winnowing: selections equal a brute-force window-argmin replay") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      val tk = text.split(" ").filter(_.nonEmpty)
      val grams = tk.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toArray
      val keys = grams.zipWithIndex.map { case (g, i) =>
        (java.lang.Long.parseLong(md5hex(g).take(8), 16) % 1000000007L) * 1048576L +
          (1048575L - (i + 1L))
      }
      (0 to grams.length - 4).map { j =>
        val wmin = keys.slice(j, j + 4).min
        (id, 1048575L - (wmin % 1048576L), wmin / 1048576L)
      }.distinct
    }.distinct.sortBy(t => (t._1, t._2)).toSeq
    val got = Text.q167Winnowing(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // density sanity: winnowing selects ~2/(w+1) of windows, never all
    val perDoc = got.groupBy(_._1).view.mapValues(_.size).toMap
    docs.foreach { case (id, text) =>
      val ng = text.split(" ").count(_.nonEmpty) - 4
      if (ng >= 4) assert(perDoc(id) < ng, s"doc $id selected every gram")
    }
  }

  test("q169 winnow match: pairs replay from q167's fingerprint relation") {
    val sel = Text.q167Winnowing(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).distinct
    val df = sel.groupBy(_._2).view.mapValues(_.length).toMap
    val kept = sel.filter(t => df(t._2) <= 64)
    val sizes = kept.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val byFp = kept.groupBy(_._2)
    val shared = collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    byFp.values.foreach { ds =>
      val ids = ds.map(_._1).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length) shared((ids(i), ids(j))) += 1
    }
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = shared.toSeq.filter(_._2 >= 5).map { case ((a, b), sh) =>
      (a, b, sh, sizes(a), sizes(b), round6(sh.toDouble / math.min(sizes(a), sizes(b))))
    }.sortBy(t => (-t._3, t._1, t._2))
    val got = Text.q169WinnowMatch(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got === want)
    assert(got.nonEmpty, "no near-dup pair shares >= 5 fingerprints — vacuous")
    got.foreach { case (_, _, sh, na, nb, ov) =>
      assert(sh <= math.min(na, nb) && ov > 0 && ov <= 1.0)
    }
  }

  test("q170 SCD2: intervals chain, runs collapse, versions dense per user") {
    val rows = Events.q170Scd2(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        if (r.isNullAt(4)) null else r.getString(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, h) =>
      val hist = h.sortBy(_._2)
      assert(hist.map(_._2).toSeq === (1L to hist.length).toSeq, s"user $u versions not dense")
      hist.sliding(2).foreach {
        case Array((_, _, t1, _, to1), (_, _, t2, from2, _)) =>
          assert(t1 !== t2, s"user $u: consecutive identical types not collapsed")
          assert(to1 === from2, s"user $u: interval chain broken ($to1 != $from2)")
        case _ => ()
      }
      assert(hist.last._5 == null, s"user $u: current row must be open-ended")
      hist.init.foreach(r => assert(r._5 != null, s"user $u: closed row missing valid_to"))
    }
    // the stream must actually change types somewhere
    assert(rows.groupBy(_._1).values.exists(_.length > 1), "no user ever changed type")
  }

  test("q174 resample: interpolation equals a per-user brute-force replay") {
    val ev = Tables.events(spark, sf0001)
      .select($"user_id", $"ts2".cast("long"), $"value", $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      // left neighbor = max (es, eid) among events <= t; right = min strictly after
      val sorted = rows.map(r => (r._2, r._4, r._3)).sortBy(t => (t._1, t._2))
      val lo = sorted.map(_._1).min; val hi = sorted.map(_._1).max
      val loC = lo + (3600 - lo % 3600) % 3600
      val hiF = hi - hi % 3600
      (loC to hiF by 3600).flatMap { t =>
        val prev = sorted.filter(_._1 <= t).lastOption
        val next = sorted.filter(_._1 > t).headOption
        for (p <- prev; n <- next) yield {
          val v = p._3 + (n._3 - p._3) * ((t - p._1).toDouble / (n._1 - p._1))
          (u, t, math.floor(v * 1000000d).toLong)
        }
      }
    }.sortBy(t => (t._1, t._2))
    val got = Events.q174ResampleInterpolate(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q168 distribution drift: delta equals a brute-force replay, bounded by 2") {
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byLang = docs.groupBy(_._2)
    def round12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val got = Text.q168DistributionDrift(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq === byLang.keys.toSeq.sorted)
    got.foreach { case (lang, ta, tb, dd) =>
      val toks = byLang(lang).flatMap { case (id, _, text) =>
        text.split(" ").filter(_.nonEmpty).map(t => (t, id % 2))
      }
      val ca = toks.filter(_._2 == 0).groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val cb = toks.filter(_._2 == 1).groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val (sa, sb) = (ca.values.sum, cb.values.sum)
      assert(ta === sa && tb === sb)
      val sum = (ca.keySet ++ cb.keySet).toSeq.map { t =>
        val p = ca.getOrElse(t, 0L).toDouble / sa
        val q = cb.getOrElse(t, 0L).toDouble / sb
        round12((p - q) * (p - q) / (p + q))
      }.sum
      val want = sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(dd === want, s"$lang: $dd != $want")
      assert(dd >= 0.0 && dd <= 2.0)
    }
    assert(got.exists(_._4 > 0), "no drift measured anywhere — vacuous split")
  }

  test("q165 triangles: oriented count equals a brute-force adjacency replay") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triPerNode = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- edges; c <- adj(a) if c > b && adj(b).contains(c)) {
      triPerNode(a) += 1; triPerNode(b) += 1; triPerNode(c) += 1
    }
    val want = triPerNode.toSeq.sortBy { case (id, n) => (-n, id) }.take(20)
    val got = Graph.q165Triangles(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
    assert(want.head._2 > 0, "corpus has no triangles — vacuous")
  }

  test("q314 local clustering: coefficients equal a brute-force adjacency replay") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // co >= 2 frequent co-purchase edges (the q277 edge set)
    val pairCounts = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size).toMap
    val edges = pairCounts.filter(_._2 >= 2).keySet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val tri = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- edges; c <- adj(a) if c > b && adj(b).contains(c)) {
      tri(a) += 1; tri(b) += 1; tri(c) += 1
    }
    def cc(id: Long): Double = {
      val d = adj(id).size.toLong
      BigDecimal(2.0 * tri(id) / (d * (d - 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = adj.keys.toSeq.filter(id => adj(id).size >= 2)
      .map(id => (id, adj(id).size.toLong, tri(id), cc(id)))
      .sortBy { case (id, _, t, c) => (-c, -t, id) }.take(20)
    val got = Graph.q314LocalClustering(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === want)
    assert(want.head._4 > 0, "no positive clustering coefficient — vacuous")
    assert(adj.keys.exists(id => adj(id).size >= 2 && cc(id) < want.head._4),
      "all coefficients identical — ordering untested")
  }

  test("q338 consistent hashing: successor assignment, moved set and loads match a ring replay") {
    val p = 2147483647L
    def mh(x: Long): Long = (((x % p) * 48271L % p) + 1L) * 16807L % p
    val ring = (0L until 68L).map(rid => mh(rid) * 100L + rid).sorted
    val keys = Tables(spark, sf0001, "orders")
      .select($"o_orderkey").collect().map(r => mh(r.getLong(0)) * 100L + 99L)
    val succ = keys.map(h => ring.find(_ >= h).getOrElse(ring.head))
    val nodes = succ.map(sp => (sp % 100) / 4)
    val moved = succ.count(sp => sp % 100 >= 64).toLong
    val loads = nodes.groupBy(identity).view.mapValues(_.length.toLong)
    val r = Extras.q338ConsistentHashing(spark, sf0001).head()
    assert(r.getLong(0) === keys.length.toLong)
    assert(r.getLong(1) === moved, "moved count")
    assert(math.abs(r.getDouble(2) - moved.toDouble / keys.length) < 1e-6)
    assert(math.abs(r.getDouble(3) - 4.0 / 68.0) < 1e-6)
    assert(r.getLong(4) === loads.size.toLong, "node count")
    assert(r.getLong(5) === loads.values.max && r.getLong(6) === loads.values.min)
    assert(moved > 0, "new node claimed nothing — vacuous")
    // minimal disruption: keys NOT assigned to the new node keep their
    // old-ring successor
    val oldRing = (0L until 64L).map(rid => mh(rid) * 100L + rid).sorted
    keys.zip(succ).foreach { case (h, sp) =>
      if (sp % 100 < 64) {
        val old = oldRing.find(_ >= h).getOrElse(oldRing.head)
        assert(old === sp, "a non-moved key changed successor — not consistent")
      }
    }
  }

  test("q339 zipf slope: OLS over rounded logs matches a replay; slope negative") {
    val toks = Tables(spark, sf0001, "documents")
      .select($"text").collect().flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
    val top = toks.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, f) => (-f, t) }.take(1000)
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val pts = top.zipWithIndex.map { case ((_, f), i) =>
      (r6(math.log((i + 1).toDouble)), r6(math.log(f.toDouble)))
    }
    val n = pts.length
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxx = pts.map(t => t._1 * t._1).sum.toDouble
    val sxy = pts.map(t => t._1 * t._2).sum.toDouble
    val syy = pts.map(t => t._2 * t._2).sum.toDouble
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val slope = num / den
    val r = graft.operators.Text.q339ZipfSlope(spark, sf0001).head()
    assert(r.getLong(0) === n.toLong)
    assert(math.abs(r.getDouble(1) - slope) < 1e-5, "slope")
    assert(math.abs(r.getDouble(2) - (sy - slope * sx) / n) < 1e-4, "intercept")
    assert(math.abs(r.getDouble(3) - num * num / (den * (n * syy - sy * sy))) < 1e-5)
    assert(r.getDouble(1) < 0, "token frequencies not decreasing in rank — vacuous")
    // the synthetic corpus is a near-uniform vocab (shallow slope, weak
    // fit): pin only that the fit is non-degenerate, not natural-text -1
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
  }

  test("q343 mutual top-1: reciprocal best matches equal a brute-force replay") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val co = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val deg = li.map(t => (t._1, t._2)).distinct.groupBy(_._2)
      .view.mapValues(_.size.toLong).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nbrs = co.keys.toSeq.flatMap { case (a, b) =>
      val c = r6(co((a, b)).toDouble / math.sqrt((deg(a) * deg(b)).toDouble))
      Seq((a, b, co((a, b)), c), (b, a, co((a, b)), c))
    }
    val best = nbrs.groupBy(_._1).map { case (i, g) =>
      i -> g.minBy(t => (-t._4, t._2))
    }
    val want = best.values.toSeq
      .filter(t => t._1 < t._2)
      .filter(t => best.get(t._2).exists(m => m._2 == t._1))
      .map(t => (t._1, t._2, t._3, t._4))
      .sortBy(_._1)
    val got = Graph.q343MutualTop1(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === want)
    assert(want.nonEmpty, "no reciprocal best match — vacuous")
    assert(want.size < best.size / 2,
      "every best match mutual — the constraint filters nothing")
  }

  test("q345 A-ES sample: keys replay; weighting favors long docs vs uniform ranks") {
    val p = 2147483647L
    def u(id: Long): Double =
      ((((id % p) * 48271L % p) + 1L) * 16807L % p + 1L).toDouble / 2147483648.0
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val keyed = docs.map { case (id, w) => (id, w, r6(math.log(u(id)) / w)) }
    val want = keyed.sortBy(t => (-t._3, t._1)).take(100)
      .map(t => (t._1, t._3))
    val got = graft.operators.NorthStar.q345WeightedReservoir(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(got === want.toSeq)
    // the sample is genuinely weighted: mean length among selected exceeds
    // the corpus mean (long docs get keys nearer 0)
    if (docs.length > 100) {
      val sel = got.map(_._1).toSet
      val selMean = docs.filter(d => sel(d._1)).map(_._2).sum.toDouble / sel.size
      val allMean = docs.map(_._2).sum.toDouble / docs.length
      assert(selMean > allMean, "selection ignores weights — A-ES vacuous")
    }
  }

  test("q351 shapley attribution: lattice values match brute-force over all 6 orderings") {
    val ev = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"event_type",
        graft.Dsl.epochSec($"ts2")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val fp = ev.filter(_._2 == "purchase").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val masks = fp.map { case (u, t0) =>
      val touched = ev.filter(e => e._1 == u && e._3 < t0).map(_._2).toSet
      (if (touched("view")) 1 else 0) | (if (touched("click")) 2 else 0) |
        (if (touched("signup")) 4 else 0)
    }.toSeq
    def v(set: Int): Long = masks.count(t => (t & set) == t).toLong
    // brute-force Shapley: average marginal over the 6 channel orderings
    val perms = Seq(1, 2, 4).permutations.toSeq
    val phi = Seq(1, 2, 4).map { c =>
      val total = perms.map { ord =>
        val before = ord.takeWhile(_ != c).foldLeft(0)(_ | _)
        v(before | c) - v(before)
      }.sum
      c -> total // = 6·φ_c
    }.toMap
    val got = graft.operators.Events.q351ShapleyAttribution(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    val names = Map("view" -> 1, "click" -> 2, "signup" -> 4)
    assert(got.map(_._1).toSeq === names.keys.toSeq.sorted)
    got.foreach { case (ch, phi6, p, share) =>
      assert(phi6 === phi(names(ch)), s"$ch phi6")
      assert(math.abs(p - phi6 / 6.0) < 1e-6)
      val attributable = v(7) - v(0)
      if (attributable > 0)
        assert(math.abs(share - phi6 / 6.0 / attributable) < 1e-6, s"$ch share")
    }
    // efficiency axiom: shares sum to the attributable conversions
    assert(got.map(_._2).sum === (v(7) - v(0)) * 6,
      "Shapley efficiency violated: phi values must sum to v(C) - v(empty)")
    assert(got.map(_._2).exists(_ > 0), "no credit assigned — vacuous")
  }

  test("q358 rec diversity: per-probe ILD matches a brute-force pairwise replay") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val co = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val deg = li.distinct.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Long, b: Long): Double = {
      val c = co.getOrElse(if (a < b) (a, b) else (b, a), 0L)
      if (c == 0) 0.0 else r6(c.toDouble / math.sqrt((deg(a) * deg(b)).toDouble))
    }
    val probes = deg.toSeq.sortBy { case (i, dg) => (-dg, i) }.take(20).map(_._1)
    val want = probes.map { p =>
      val nbrs = deg.keys.filter(j => j != p && co.contains(if (p < j) (p, j) else (j, p)))
        .map(j => (j, cos(p, j))).toSeq
        .sortBy { case (j, c) => (-c, j) }.take(5).map(_._1)
      val pairsL = for (a <- nbrs; b <- nbrs if a < b) yield cos(a, b)
      val ild = r6(1.0 - pairsL.map(BigDecimal(_)).sum.toDouble / pairsL.length)
      (p, pairsL.length.toLong, ild)
    }.sortBy(_._1)
    val got = Graph.q358RecDiversity(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.filter(_._1 >= 0) === want)
    val overall = got.find(_._1 == -1L).get
    assert(overall._2 === want.length.toLong)
    assert(math.abs(overall._3
      - want.map(w => BigDecimal(w._3)).sum.toDouble / want.length) < 2e-6)
    assert(want.map(_._3).distinct.length > 1, "all lists equally diverse — vacuous")
  }

  test("q360 self-bleu: clipped precisions and the BLEU-2 combine replay per source") {
    val rows = Tables(spark, sf0001, "documents")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val ns = rows.map(_._1).distinct.length
    def gramCounts(f: Seq[String] => Seq[String]) =
      rows.flatMap { case (src, tk) => f(tk).map(g => (src, g)) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val uni = gramCounts(identity)
    val bi = gramCounts(tk => if (tk.length < 2) Nil
      else tk.sliding(2).map(_.mkString(" ")).toSeq)
    def tot(m: Map[(String, String), Long]) =
      m.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val (g1, g2) = (tot(uni), tot(bi))
    val got = graft.operators.Text.q360SelfBleu(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    val tt = uni.values.sum
    rows.map(_._1).distinct.foreach { src =>
      val u = uni.filter(_._1._1 == src)
      val b = bi.filter(_._1._1 == src)
      val t1 = u.values.sum; val t2 = b.values.sum
      val cl1 = u.map { case ((_, g), c) => math.min(c, g1(g) - c) }.sum
      val cl2 = b.map { case ((_, g), c) => math.min(c, g2(g) - c) }.sum
      val (gt1, gt2, gp1, gp2, gbp, gbleu) = got(src)
      assert(gt1 === t1 && gt2 === t2, s"$src totals")
      assert(math.abs(gp1 - cl1.toDouble / t1) < 1e-6, s"$src p1")
      assert(math.abs(gp2 - cl2.toDouble / t2) < 1e-6, s"$src p2")
      val rlen = (tt - t1).toDouble / (ns - 1)
      val bp = if (t1 >= rlen) 1.0 else math.exp(1.0 - rlen / t1)
      assert(math.abs(gbp - bp) < 1e-6, s"$src bp")
      val want = if (cl1 == 0 || cl2 == 0) 0.0
        else bp * math.exp(0.5 * (math.log(cl1.toDouble / t1)
          + math.log(cl2.toDouble / t2)))
      assert(math.abs(gbleu - want) < 1e-6, s"$src bleu")
    }
    assert(got.values.map(_._6).toSeq.distinct.length > 1,
      "every source equally templated — vacuous")
  }

  test("q347 assortativity: edge-degree correlation matches an exact-moment replay") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size).filter(_._2 >= 2).keySet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sym = edges.toSeq.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a)))
    }
    val m = sym.length.toDouble
    val sj = sym.map(_._1).sum.toDouble
    val sk = sym.map(_._2).sum.toDouble
    val sjk = sym.map(t => t._1 * t._2).sum.toDouble
    val sjj = sym.map(t => t._1 * t._1).sum.toDouble
    val skk = sym.map(t => t._2 * t._2).sum.toDouble
    val want = (sjk - sj * sk / m) /
      math.sqrt((sjj - sj * sj / m) * (skk - sk * sk / m))
    val got = Graph.q347DegreeAssortativity(spark, sf0001).head()
    assert(got.getLong(0) === deg.size.toLong)
    assert(got.getLong(1) === edges.size.toLong)
    assert(math.abs(got.getDouble(2) - want) < 1e-5, "assortativity")
    assert(math.abs(got.getDouble(2)) > 1e-4,
      "graph exactly non-assortative — fixture vacuous")
  }

  test("q349 dispersion: Juilland's D with zero-fill matches a per-source replay") {
    val rows = Tables(spark, sf0001, "documents")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val ns = rows.map(_._1).distinct.length
    val tf = rows.flatMap { case (src, text) =>
      text.split(" ").filter(_.nonEmpty).map(t => (t, src))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val byTok = tf.keys.map(_._1).toSeq.distinct.map { t =>
      val fs = tf.collect { case ((tok, _), f) if tok == t => f }.toSeq
      (t, fs.sum, fs.count(_ > 0).toLong, fs)
    }
    val want = byTok.sortBy { case (t, cf, _, _) => (-cf, t) }.take(50)
      .map { case (t, cf, df, fs) =>
        val mean = cf.toDouble / ns
        val vr = (fs.map(f => f * f).sum.toDouble - cf.toDouble * cf / ns) / ns
        val dd = BigDecimal(1.0 - math.sqrt(vr) / mean / math.sqrt(ns - 1.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (t, cf, df, dd)
      }
    val got = graft.operators.Text.q349Dispersion(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === want)
    assert(want.exists(_._3 < ns), "every top token in every source — zero-fill untested")
    assert(want.map(_._4).distinct.length > 1, "all D identical — vacuous")
  }

  test("q330 bloom FPR: bit set, probe verdicts and prediction match an exact replay") {
    val p = 2147483647L
    val mults = Seq(48271L, 69621L, 40692L, 62089L)
    def h(x: Long, i: Int): Long = {
      val h1 = ((x % p) * mults(i)) % p
      ((h1 + 1L) * 16807L) % p % 65536L
    }
    val members = Tables(spark, sf0001, "part")
      .select($"p_partkey").collect().map(_.getLong(0))
    val bits = members.flatMap(k => (0 until 4).map(i => h(k, i))).toSet
    val probes = (10000001L until 10005001L)
    val fps = probes.count(q => (0 until 4).forall(i => bits(h(q, i))))
    val fill = bits.size.toDouble / 65536.0
    val r = Extras.q330BloomFpr(spark, sf0001).head()
    assert(r.getLong(0) === members.length.toLong)
    assert(r.getLong(1) === bits.size.toLong, "bit set size")
    assert(math.abs(r.getDouble(2) - fill) < 1e-6)
    assert(r.getLong(3) === 5000L)
    assert(r.getLong(4) === fps.toLong, "false positives")
    assert(math.abs(r.getDouble(5) - fps.toDouble / 5000.0) < 1e-6)
    assert(math.abs(r.getDouble(6) - (fill * fill) * (fill * fill)) < 1e-6)
    // the probe join is non-vacuous: some probe must hit >=2 member bits
    val maxHits = probes.map(q => (0 until 4).count(i => bits(h(q, i)))).max
    assert(maxHits >= 2, "no probe collides with 2+ bits — join untested")
    assert(bits.size < 4 * members.length,
      "no hash collision among members — distinct untested")
  }

  test("q162 semantic dedup: verdicts equal a brute-force dominated-rule replay") {
    val emb = Tables(spark, sf0001, "embeddings")
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dp / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = emb.map { case (id, lab, v) =>
      val ws = emb.filter(o => o._2 == lab && o._1 < id && cos(o._3, v) >= 0.3).map(_._1)
      (id, lab.toLong, ws.isEmpty, if (ws.isEmpty) null else Long.box(ws.min))
    }
    val got = Similarity.q162SemanticDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) null else Long.box(r.getLong(3))))
    assert(got.toSeq === expected.toSeq)
    assert(got.exists(!_._3), "dedup gate never fired — vacuous threshold")
  }

  test("q163 curriculum: deterministic permutation, dense per-manifest positions") {
    val rows = NorthStar.q163Curriculum(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.map(_._4).sorted.toSeq === docs.map(_._1).sorted.toSeq) // permutation
    val p = 2147483647L
    def replay(id: Long, text: String) = {
      val nt = text.split(" ").count(_.nonEmpty)
      val diff = text.replace(" ", "").length.toLong * 1000L / nt
      val band = if (diff < 4350) 0L else if (diff < 4500) 1L else if (diff < 4650) 2L else 3L
      val h2 = ((id % p) * 48271L % p + 1L) * 16807L % p
      (band, h2 % 8L, (h2 + band + 1L) * 48271L % p, diff)
    }
    val exp = docs.map { case (id, t) => id -> replay(id, t) }.toMap
    rows.foreach { case (band, shard, _, id, diff) =>
      val (eb, es, _, ed) = exp(id)
      assert(band === eb && shard === es && diff === ed, s"doc $id mis-assigned")
    }
    // per-(band,shard) positions are 1..n in the MINSTD-shuffle order
    rows.groupBy(r => (r._1, r._2)).foreach { case ((b, sh), rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq, s"holes in ($b,$sh)")
      val ordered = rs.sortBy(_._3).map(_._4)
      val want = rs.map(_._4).sortBy(id => (exp(id)._3, id))
      assert(ordered.toSeq === want.toSeq, s"shuffle order wrong in ($b,$sh)")
    }
    assert(rows.map(_._1).distinct.length === 4, "a difficulty band is empty")
  }

  test("q208 degree distribution: histogram and tail slope match a replay") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.toSeq.groupBy(_._1).values.toSeq
      .flatMap(g => for (a <- g; b <- g if a._2 < b._2) yield (a._2, b._2)).distinct
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val hist = deg.values.groupBy(identity).map { case (d, v) => d -> v.size.toLong }
    val r = Graph.q208DegreeDist(spark, sf0001).head()
    assert(r.getLong(0) === deg.size.toLong)
    assert(r.getLong(1) === deg.values.max)
    assert(r.getLong(2) === deg.values.sum)
    assert(r.getLong(3) === hist.size.toLong)
    val pts = hist.toSeq.map { case (d, c) =>
      (BigDecimal(math.log(d.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(math.log(c.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getDouble(4) - want) < 1e-3, s"slope ${r.getDouble(4)} vs $want")
  }

  test("q209 source overlap: Jaccard matches a set replay; matrix covers all pairs") {
    val vocab = Tables(spark, sf0001, "documents")
      .select($"source", $"text").collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty).map(t => (r.getString(0), t)))
      .distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val got = Text.q209SourceOverlap(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    val sources = vocab.keys.toSeq.sorted
    val wantPairs = (for (a <- sources; b <- sources if a < b
      && (vocab(a) & vocab(b)).nonEmpty) yield (a, b)).toSet
    assert(got.keySet === wantPairs)
    got.foreach { case ((a, b), (inter, va, vb, jac, oc)) =>
      val i = (vocab(a) & vocab(b)).size.toLong
      assert(i === inter && vocab(a).size.toLong === va && vocab(b).size.toLong === vb, s"($a,$b)")
      assert(math.abs(jac - i.toDouble / (va + vb - i)) < 1e-6)
      assert(math.abs(oc - i.toDouble / math.min(va, vb)) < 1e-6)
    }
  }

  test("q206 cohort LTV: curves match a sequential cohort walk; monotone cumulative") {
    val evs = Tables.events(spark, sf0001)
      .select($"user_id", $"event_type", $"value",
        ($"ts2".cast("long") / 604800).cast("long").as("wk"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), BigDecimal(r.getDouble(2)).setScale(4), r.getLong(3)))
    val cohort = evs.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, g) => u -> g.map(_._4).min }
    val got = Events.q206CohortLtv(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (BigDecimal(r.getDouble(2)).setScale(4), BigDecimal(r.getDouble(3)).setScale(4), r.getLong(4))))
      .toMap
    assert(got.nonEmpty)
    val cells = evs.filter(e => e._2 == "purchase" && cohort.contains(e._1) && e._4 >= cohort(e._1))
      .groupBy(e => (cohort(e._1), e._4 - cohort(e._1)))
      .map { case (k, g) => k -> g.map(_._3).sum }
    assert(got.keySet === cells.keySet)
    cells.foreach { case (k, wkRev) => assert(got(k)._1 === wkRev, s"cell $k") }
    // cumulative equals running sum per cohort; sizes match signup cohorts
    got.groupBy(_._1._1).foreach { case (cw, rows) =>
      val ord = rows.toSeq.sortBy(_._1._2)
      var run = BigDecimal(0)
      ord.foreach { case (k, (wk, cum, users)) =>
        run += wk
        assert(cum === run, s"cum at $k")
        assert(users.toInt === cohort.values.count(_ == cw))
      }
    }
  }

  test("q207 RFM: per-user aggregates exact; scores are valid quintiles honoring the cuts") {
    val got = Events.q207Rfm(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.nonEmpty)
    val evs = Tables.events(spark, sf0001).filter($"event_type" === "purchase")
      .select($"user_id", $"value", ($"ts2".cast("long") / 86400).cast("long").as("day"))
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(4), r.getLong(2)))
    got.foreach { case (u, rec, freq, mon, rs, fs, ms) =>
      val g = evs.filter(_._1 == u)
      assert(rec === 20000L - g.map(_._3).max)
      assert(freq === g.length.toLong)
      assert(BigDecimal(mon).setScale(4) === g.map(_._2).sum)
      Seq(rs, fs, ms).foreach(sc => assert(sc >= 1 && sc <= 5))
    }
    // monotone: a strictly larger monetary total never gets a lower m_score
    val byMon = got.sortBy(_._4)
    assert(byMon.map(_._7).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    // recency is REVERSED: larger rec (staler) never gets a higher r_score
    val byRec = got.sortBy(_._2)
    assert(byRec.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q202 TWAP: matches a sequential interval-weighted replay") {
    val evs = Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", $"value", $"ts2".cast("long").as("es"),
        $"ts2".cast("date").cast("string").as("day"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), BigDecimal(r.getDouble(2)).setScale(4),
        r.getLong(3), r.getString(4)))
    val got = Events.q202Twap(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.nonEmpty)
    evs.groupBy(e => (e._1, e._5)).foreach { case (key, g) =>
      val ord = g.sortBy(e => (e._4, e._2))
      val iv = ord.zip(ord.drop(1)).map { case (a, b) => (a._3, b._4 - a._4) }
      val totalDt = iv.map(_._2).sum
      if (iv.nonEmpty && totalDt > 0) {
        val mass = iv.map { case (v, dt) => v * dt }.sum
        val (n, dt, twap) = got(key)
        assert(n === iv.length.toLong && dt === totalDt, s"$key intervals")
        assert(math.abs(twap - (mass / totalDt).toDouble) < 1e-5, s"$key twap")
      } else assert(!got.contains(key), s"$key should be filtered")
    }
  }

  test("q203 clamped balance: non-associative fold matches a sequential replay") {
    val evs = Tables.events(spark, sf0001)
      .filter($"event_type".isin("purchase", "error"))
      .select($"user_id", $"event_id", $"event_type", $"value", $"ts2".cast("long").as("es"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        BigDecimal(r.getDouble(3)).setScale(4), r.getLong(4)))
    val got = Events.q203ClampedBalance(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(got.nonEmpty)
    evs.groupBy(_._1).foreach { case (uid, g) =>
      var bal = BigDecimal(0); var hits = 0L
      g.sortBy(e => (e._5, e._2)).foreach { e =>
        val delta = if (e._3 == "purchase") e._4 else -e._4
        val next = bal + delta
        if (next < 0) { bal = BigDecimal(0); hits += 1 } else bal = next
      }
      val (gb, gh) = got(uid)
      assert(BigDecimal(gb).setScale(4) === bal && gh === hits, s"user $uid")
    }
    // clamping must actually fire somewhere, or the operator is untested
    assert(got.values.map(_._2).sum > 0, "no user ever hit the floor")
  }

  test("q204 Benford audit: digit extraction exact, shares partition the rows") {
    val prices = Tables(spark, sf0001, "orders")
      .select($"o_totalprice").collect().map(_.getDouble(0))
    val wantCounts = prices
      .map(p => (BigDecimal(p).setScale(4) * 100).toLongExact / 100)
      .map(_.toString.head.toString)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = Stats.q204Benford(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSet.subsetOf((1 to 9).map(_.toString).toSet))
    got.foreach { case (dg, n, share, expected, delta) =>
      assert(wantCounts(dg) === n, s"digit $dg count")
      assert(math.abs(share - n.toDouble / prices.length) < 1e-6)
      assert(math.abs(delta - (share - expected)) < 1e-5)
    }
    assert(got.map(_._2).sum === prices.length.toLong)
  }

  test("q198 CUSUM change point: argmax of the integer cumulative deviation") {
    val evs = Tables.events(spark, sf0001)
      .select($"event_type", ($"ts2".cast("long") / 3600).cast("long").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = Events.q198Changepoint(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got.foreach { case (tpe, cpHour, cusum, nHours, total) =>
      val hours = evs.filter(_._1 == tpe).groupBy(_._2).toSeq
        .map { case (h, v) => (h, v.length.toLong) }.sortBy(_._1)
      assert(hours.length.toLong === nHours && hours.map(_._2).sum === total)
      var run = 0L
      val cs = hours.zipWithIndex.map { case ((h, n), i) =>
        run += n
        (h, nHours * run - (i + 1) * total)
      }
      val want = cs.minBy { case (h, c) => (-math.abs(c), h) }
      assert((cpHour, cusum) === want, s"$tpe change point")
    }
  }

  test("q199 path trigrams: counts match a sequential sessionized walk") {
    val evs = Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", $"event_type", $"ts2".cast("long").as("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    evs.groupBy(_._1).values.foreach { g =>
      val ord = g.toSeq.sortBy(e => (e._4, e._2))
      var sess = Vector.empty[String]
      var lastEs = Long.MinValue
      def flush(): Unit = {
        sess.sliding(3).foreach { w =>
          if (w.length == 3) want(w.mkString(">")) += 1
        }
        sess = Vector.empty
      }
      ord.foreach { e =>
        if (lastEs != Long.MinValue && e._4 - lastEs > 1800) flush()
        sess :+= e._3; lastEs = e._4
      }
      flush()
    }
    val got = Events.q199PathTrigrams(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty && got.length <= 20)
    got.foreach { case (p, c) => assert(want(p) === c, s"path $p") }
    val floor = got.map(_._2).min
    assert(want.values.count(_ > floor) <= got.length,
      "a path with more occurrences than the cut was left out of the top-20")
  }

  test("q197 connected components: sizes match a union-find replay on the same edges") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // n.b. `Map.collect` over key tuples would REBUILD a map keyed by the
    // edge source and silently drop parallel edges — filter + keys instead
    val edges = li.toSeq.groupBy(_._1).values.toSeq
      .flatMap(g => for (a <- g; b <- g if a._2 < b._2) yield (a._2, b._2))
      .groupBy(identity).filter(_._2.size >= 3).keys.toSeq
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.toSeq.map(n => (find(n), n)).groupBy(_._1)
      .map { case (c, ns) => (ns.map(_._2).min, ns.size.toLong) } // canonical = min node
    val got = Graph.q197ConnectedComponents(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toMap === want)
    // sf0.001's frequent graph is one 189-node component (DuckDB-confirmed);
    // the 56-component structure is exercised by the sf0.01 oracle hash
    assert(got.map(_._2).sum === want.values.sum)
  }

  test("q195 ts features: dyadic EWMA, roll4 and lag1 match a sequential replay") {
    val rows = Events.q195TsFeatures(spark, sf0001).collect()
    val byUser = rows.groupBy(_.getLong(0))
    assert(byUser.nonEmpty)
    byUser.foreach { case (_, rs) =>
      // output is globally ordered; within a user rows are stream-ordered
      val cents = rs.map(r => math.round(r.getDouble(3) * 100))
      rs.zipWithIndex.foreach { case (r, i) =>
        // lag1
        if (i == 0) assert(r.isNullAt(4))
        else assert(math.abs(r.getDouble(4) - rs(i - 1).getDouble(3)) < 1e-9)
        // rolling mean of last <=4 (exact decimal -> double)
        val wnd = (math.max(0, i - 3) to i).map(j => BigDecimal(rs(j).getDouble(3)).setScale(4))
        assert(math.abs(r.getDouble(5) - (wnd.sum / wnd.length).toDouble) < 1e-9, s"roll4 at $i")
        // dyadic EWMA in integer arithmetic
        var num = 0L; var den = 0L
        for (k <- 0 to math.min(15, i)) {
          val wt = 1L << (15 - k)
          num += cents(i - k) * wt; den += wt
        }
        assert(r.getLong(6) === num && r.getLong(7) === den, s"ewma taps at $i")
        val want = BigDecimal(num.toDouble / den.toDouble / 100.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getDouble(8) - want) < 1e-9, s"ewma at $i")
      }
    }
  }

  test("q176 BFS: hop counts match an in-memory BFS over the same edges") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = li.toSeq.groupBy(_._1).values.toSeq
      .flatMap(g => for (a <- g; b <- g if a._2 != b._2) yield (a._2, b._2))
      .distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seeds = adj.keySet.toSeq.sorted.take(3)
    val dist = collection.mutable.Map(seeds.map(_ -> 0L): _*)
    var frontier = seeds.toSet
    for (h <- 1 to 3) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- dist.keySet
      frontier.foreach(n => dist(n) = h.toLong)
    }
    val got = Graph.q176BfsHops(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === dist.toMap)
    assert(got.values.toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
    assert(seeds.forall(s => got(s) == 0L))
  }

  test("q184 attribution: first/last-touch credit matches a sequential replay") {
    val evs = Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", $"event_type", $"value", $"ts2".cast("long").as("es"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        BigDecimal(r.getDouble(3)).setScale(4), r.getLong(4)))
    // replay: walk each user's stream in (es, event_id) order, keeping the
    // touches since the last purchase; each purchase credits first & last
    val first = collection.mutable.Map[String, (Long, BigDecimal)]().withDefaultValue((0L, BigDecimal(0)))
    val last = collection.mutable.Map[String, (Long, BigDecimal)]().withDefaultValue((0L, BigDecimal(0)))
    evs.groupBy(_._1).foreach { case (_, es) =>
      var touches = Vector.empty[String]
      es.sortBy(e => (e._5, e._2)).foreach {
        case (_, _, "purchase", v, _) =>
          if (touches.nonEmpty) {
            val f = first(touches.head); first(touches.head) = (f._1 + 1, f._2 + v)
            val l = last(touches.last); last(touches.last) = (l._1 + 1, l._2 + v)
          }
          touches = Vector.empty
        case (_, _, t, _, _) => touches :+= t
      }
    }
    val got = Events.q184Attribution(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDouble(2)).setScale(4),
        r.getLong(3), BigDecimal(r.getDouble(4)).setScale(4)))
    assert(got.nonEmpty)
    got.foreach { case (ch, fc, fv, lc, lv) =>
      assert((fc, fv) === first(ch), s"$ch first-touch")
      assert((lc, lv) === last(ch), s"$ch last-touch")
    }
    assert(got.map(_._2).sum === first.values.map(_._1).sum, "conversions lost")
  }

  test("q185 markov: transition counts match a lag replay, rows sum to 1 per source") {
    val evs = Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", $"event_type", $"ts2".cast("long").as("es"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ord = es.sortBy(e => (e._4, e._2)).map(_._3)
      ord.zip(ord.drop(1))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = Events.q185MarkovTransitions(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).distinct.length === got.length, "duplicate transition rows")
    got.foreach { case (k, cnt, _, _) => assert(want(k) === cnt, s"$k count") }
    assert(want.keySet === got.map(_._1).toSet)
    got.groupBy(_._1._1).foreach { case (prev, rows) =>
      val psum = rows.map(_._4).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"$prev row sums to $psum")
      val tot = rows.head._3
      assert(rows.map(_._2).sum === tot, s"$prev total")
    }
  }
  test("q210 Kaplan-Meier: at-risk, deaths and product-limit survival match a replay") {
    val months = Tables(spark, sf0001, "orders")
      .select($"o_custkey", (year($"o_orderdate") * 12 + month($"o_orderdate")).cast("long").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val per = months.groupBy(_._1).map { case (c, g) =>
      c -> (g.map(_._2).min, g.map(_._2).max) }
    val mmax = per.values.map(_._2).max
    val durs = per.values.toSeq.map { case (m0, ml) =>
      if (mmax - ml > 6) (ml - m0, true) else (mmax - m0, false) }
    val got = Stats.q210KaplanMeier(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    assert(got.map(_._1).toSet === durs.map(_._1).toSet)
    var surv = 1.0
    var atRisk = durs.length.toLong
    got.foreach { case (dur, nRisk, nDeaths, nCens, s5) =>
      assert(nRisk === atRisk, s"at-risk at $dur")
      assert(nDeaths === durs.count(x => x._1 == dur && x._2).toLong, s"deaths at $dur")
      assert(nCens === durs.count(x => x._1 == dur && !x._2).toLong, s"censored at $dur")
      if (nDeaths > 0) surv *= (nRisk - nDeaths).toDouble / nRisk
      assert(math.abs(s5 - surv) < 2e-4, s"survival at $dur: $s5 vs $surv")
      atRisk -= nDeaths + nCens
    }
    // survival is non-increasing and starts <= 1
    assert(got.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) >= w(1) - 1e-12))
  }

  test("q211 phrase search: the probe is the top trigram and counts match a scan replay") {
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val tris = docs.flatMap { case (_, t) => t.sliding(3).filter(_.length == 3).map(_.mkString(" ")) }
    val top = tris.groupBy(identity).map { case (k, v) => (k, v.size) }
      .toSeq.sortBy { case (k, n) => (-n, k) }.head._1
    val got = Text.q211PhraseSearch(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.forall(_._1 == top), s"probe phrase ${got.head._1} vs replay $top")
    val want = docs.map { case (id, t) =>
      id -> t.sliding(3).count(w => w.length == 3 && w.mkString(" ") == top).toLong
    }.filter(_._2 > 0).sortBy { case (id, n) => (-n, id) }.take(20)
    assert(got.map(r => (r._2, r._3)).toSeq === want.toSeq)
  }

  test("q212 survivorship: per-field golden record matches rule-by-rule replay") {
    val os = Tables(spark, sf0001, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderstatus", $"o_orderpriority",
        $"o_totalprice", $"o_orderdate".cast("date").cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        BigDecimal(r.getDouble(4)).setScale(4, BigDecimal.RoundingMode.HALF_UP), r.getString(5)))
    val got = Events.q212Survivorship(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getDouble(6), r.getDouble(7))))
      .toMap
    val byCust = os.groupBy(_._1)
    assert(got.keySet === byCust.keySet)
    byCust.foreach { case (c, g) =>
      val (n, first, last, st, pr, spend, mx) = got(c)
      assert(n === g.length.toLong)
      assert(first === g.map(_._6).min && last === g.map(_._6).max)
      val latest = g.maxBy(o => (o._6, o._2))
      assert(st === latest._3, s"cust $c last_status")
      val modal = g.groupBy(_._4).map { case (p, v) => (p, v.size) }
        .toSeq.sortBy { case (p, cnt) => (-cnt, p) }.head._1
      assert(pr === modal, s"cust $c mode_priority")
      assert(BigDecimal(spend).setScale(4, BigDecimal.RoundingMode.HALF_UP) === g.map(_._5).sum.setScale(4, BigDecimal.RoundingMode.HALF_UP))
      assert(BigDecimal(mx).setScale(4, BigDecimal.RoundingMode.HALF_UP) === g.map(_._5).max)
    }
  }

  test("q213 decayed top-k: integer-scaled decay matches an exact replay") {
    val om = Tables(spark, sf0001, "orders")
      .select($"o_orderkey", (year($"o_orderdate") * 12 + month($"o_orderdate")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val mmax = om.values.max
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2).toLong))
    val scores = li.groupBy(_._2).map { case (p, g) =>
      val s = g.map { case (ok, _, q) =>
        val age = math.min(mmax - om(ok), 12L)
        q * (1L << (12 - age).toInt)
      }.sum
      (p, s, g.length.toLong)
    }
    val want = scores.toSeq.sortBy { case (p, s, _) => (-s, p) }.take(25)
      .map { case (p, s, n) => (p, s.toDouble / 4096.0, n) }
    val res = Extras.q213DecayedTopk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(res.toSeq === want.toSeq)
  }
  test("q214 BPE fertility: aggregates match a Scala encode replay at sf0.001") {
    val docs = Tables(spark, sf0001, "documents")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val wc = docs.flatMap { case (src, ts) => ts.map(t => (src, t)) }
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val vocabAll = docs.flatMap(_._2).groupBy(identity).map { case (w, v) => (w, v.size.toLong) }
    val top = vocabAll.toSeq.sortBy { case (w, n) => (-n, w) }.take(1000)
    val merges = Text.bpeMergeLoop(
      top.map { case (w, n) => (w.map(_.toString).toArray, n) }.toArray, 30)
      .map { case (_, l, r, _, _) => (l, r) }
    def enc(w: String): Int = {
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
      syms.length
    }
    val got = Text.q214BpeFertility(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))))
      .toMap
    val bySrc = wc.groupBy(_._1._1)
    assert(got.keySet === bySrc.keySet)
    bySrc.foreach { case (src, cells) =>
      val nWords = cells.values.sum
      val nTok = cells.map { case ((_, w), n) => n * enc(w) }.sum
      val nChars = cells.map { case ((_, w), n) => n * w.length }.sum
      val (gw, gd, gt, fert, cpt) = got(src)
      assert(gw === nWords && gd === cells.size.toLong && gt === nTok, s"$src counts")
      assert(math.abs(fert - nTok.toDouble / nWords) < 1e-6, s"$src fertility")
      assert(math.abs(cpt - nChars.toDouble / nTok) < 1e-6, s"$src chars/token")
    }
  }

  test("q215 k-core: matches a peel-to-convergence replay and converges within the bound") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.toSeq.distinct.groupBy(_._1).values.toSeq
      .flatMap(g => for (a <- g; b <- g if a._2 < b._2) yield (a._2, b._2))
      .groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    var edges = pairs.flatMap(e => Seq(e, e.swap))
    var rounds = 0
    var stable = false
    while (!stable) {
      val deg = edges.groupBy(_._1).map { case (n, g) => n -> g.size }
      val keep = deg.filter(_._2 >= 3).keySet
      val ne = edges.filter(e => keep(e._1) && keep(e._2))
      rounds += 1
      stable = ne.size == edges.size
      edges = ne
    }
    assert(rounds <= 12, s"replay needed $rounds rounds — raise the declared bound")
    val want = edges.groupBy(_._1).map { case (n, g) => (n, g.size.toLong) }
      .toSeq.sortBy(_._1)
    val got = Graph.q215Kcore(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
    assert(got.forall(_._2 >= 3), "a sub-k node survived the peel")
  }

  test("q216 mutual information: contributions match an exact replay; MI is sane") {
    val evs = Tables.events(spark, sf0001)
      .select($"event_type", ($"ts2".cast("long") / 3600).cast("long") % 24)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nn = evs.length.toLong
    val cells = evs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nx = evs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val ny = evs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val got = Stats.q216MutualInfo(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got.keySet === nx.keySet)
    nx.foreach { case (t, n) =>
      val mine = cells.filter(_._1._1 == t)
      val pmis = mine.map { case ((_, h), c) =>
        BigDecimal(math.log(c.toDouble * nn / (n.toDouble * ny(h))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      val contrib = mine.zip(pmis).map { case (((_, _), c), p) => p * c }.sum.toDouble / nn
      val (gn, gc, gm, gmax, gmin) = got(t)
      assert(gn === n && gc === mine.size.toLong, s"$t marginals")
      assert(math.abs(gm - contrib) < 2e-6, s"$t contribution $gm vs $contrib")
      assert(math.abs(gmax - pmis.max.toDouble) < 2e-6 && math.abs(gmin - pmis.min.toDouble) < 2e-6)
    }
    // total MI over a contingency table is non-negative
    assert(got.values.map(_._3).sum > -1e-9)
  }
  test("q217 info-gain stump: gains match an exact entropy replay; best split per feature") {
    val os = Tables(spark, sf0001, "orders")
      .select(($"o_orderpriority" === "1-URGENT").cast("long"),
        $"o_orderstatus", month($"o_orderdate").cast("long"),
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val cmin = os.map(_._4).min; val cmax = os.map(_._4).max
    def xlx(c: Long): BigDecimal =
      if (c == 0L) BigDecimal(0)
      else BigDecimal(c) * BigDecimal(math.log(c.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def gain(l1: Long, l0: Long, r1: Long, r0: Long): Double = {
      val num = xlx(l1 + l0 + r1 + r0) - xlx(l1 + r1) - xlx(l0 + r0) -
        xlx(l1 + l0) - xlx(r1 + r0) + xlx(l1) + xlx(l0) + xlx(r1) + xlx(r0)
      BigDecimal(num.toDouble / (l1 + l0 + r1 + r0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def best(cells: Map[Long, (Long, Long)], numeric: Boolean): (String, Double, Long, Long, Long, Long) = {
      val keys = cells.keys.toSeq.sorted
      val splits =
        if (numeric) keys.init.map { t =>
          val (l1, l0) = keys.filter(_ <= t).map(cells).foldLeft((0L, 0L)) {
            case ((a, b), (c, d)) => (a + c, b + d) }
          val (p1, p0) = keys.map(cells).foldLeft((0L, 0L)) {
            case ((a, b), (c, d)) => (a + c, b + d) }
          (s"<=$t", l1, l0, p1 - l1, p0 - l0)
        }
        else keys.map { v =>
          val (l1, l0) = cells(v)
          val (p1, p0) = keys.map(cells).foldLeft((0L, 0L)) {
            case ((a, b), (c, d)) => (a + c, b + d) }
          (v.toString, l1, l0, p1 - l1, p0 - l0)
        }
      splits.map { case (sp, l1, l0, r1, r0) => (sp, gain(l1, l0, r1, r0), l1, l0, r1, r0) }
        .sortBy { case (sp, g, _, _, _, _) => (-g, sp) }.head
    }
    val priceCells = os.groupBy(o => ((o._4 - cmin) * 16) / (cmax - cmin + 1))
      .map { case (b, g) => b -> (g.count(_._1 == 1L).toLong, g.count(_._1 == 0L).toLong) }
    val monthCells = os.groupBy(_._3)
      .map { case (m, g) => m -> (g.count(_._1 == 1L).toLong, g.count(_._1 == 0L).toLong) }
    val statusCells = os.groupBy(_._2)
      .map { case (st, g) => st -> (g.count(_._1 == 1L).toLong, g.count(_._1 == 0L).toLong) }
    val got = Stats.q217InfoGainStump(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    assert(got.keySet === Set("price16", "month", "status"))
    Seq(("price16", best(priceCells, numeric = true)),
        ("month", best(monthCells, numeric = true))).foreach { case (f, (sp, g, l1, l0, r1, r0)) =>
      val (gsp, nl, nr, nlp, nrp, gg) = got(f)
      assert(gsp === sp, s"$f split")
      assert(nl === l1 + l0 && nr === r1 + r0 && nlp === l1 && nrp === r1, s"$f counts")
      assert(math.abs(gg - g) < 2e-6, s"$f gain $gg vs $g")
    }
    // categorical: same check over the one-vs-rest splits
    val stBest = statusCells.map { case (v, (c1, c0)) =>
      val p1 = statusCells.values.map(_._1).sum; val p0 = statusCells.values.map(_._2).sum
      (v, gain(c1, c0, p1 - c1, p0 - c0), c1, c0, p1 - c1, p0 - c0)
    }.toSeq.sortBy { case (sp, g, _, _, _, _) => (-g, sp) }.head
    val (gsp, nl, nr, nlp, nrp, gg) = got("status")
    assert(gsp === stBest._1 && nlp === stBest._3 && nrp === stBest._5)
    assert(nl === stBest._3 + stBest._4 && nr === stBest._5 + stBest._6)
    assert(math.abs(gg - stBest._2) < 2e-6)
    // every reported gain is non-negative (information never hurts)
    assert(got.values.forall(_._6 >= -1e-9))
  }

  test("q218 item-item cosine: scores match a set replay; top-5 per probe item") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val baskets = li.groupBy(_._2).map { case (p, g) => p -> g.map(_._1).toSet }
    val probes = baskets.toSeq.sortBy { case (p, b) => (-b.size, p) }.take(20).map(_._1)
    val got = Graph.q218ItemCosine(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).distinct.toSet === probes.toSet)
    got.groupBy(_._1).foreach { case (i, rows) =>
      val want = baskets.keys.filter(j => j != i && (baskets(i) & baskets(j)).nonEmpty)
        .map { j =>
          val co = (baskets(i) & baskets(j)).size.toLong
          val cos = BigDecimal(co.toDouble / math.sqrt((baskets(i).size.toLong * baskets(j).size).toDouble))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (j, co, cos)
        }.toSeq.sortBy { case (j, _, c) => (-c, j) }.take(5)
      val mine = rows.sortBy(_._2).map(r => (r._3, r._4, r._5)).toSeq
      assert(mine === want, s"probe $i")
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }
  test("q220 correlation matrix: r values match an exact moment replay") {
    val per = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_quantity".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val price = Tables(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val feats = per.toSeq.map { case (ok, g) =>
      (BigDecimal(price(ok)).setScale(4, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(g.size), BigDecimal(g.map(_._3).sum), BigDecimal(g.map(_._2).distinct.size))
    }
    val names = Seq("price", "lines", "qty", "parts")
    def f(t: (BigDecimal, BigDecimal, BigDecimal, BigDecimal), i: Int) =
      i match { case 0 => t._1; case 1 => t._2; case 2 => t._3; case _ => t._4 }
    val n = feats.length.toDouble
    def s1(i: Int) = feats.map(f(_, i)).sum.toDouble
    def s2(i: Int, j: Int) = feats.map(t => f(t, i) * f(t, j)).sum.toDouble
    val got = Stats.q220CorrMatrix(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val wantPairs = for { i <- 0 until 4; j <- 0 until 4 if i < j } yield (i, j)
    assert(got.keySet === wantPairs.map { case (i, j) => (names(i), names(j)) }.toSet)
    wantPairs.foreach { case (i, j) =>
      val r = (n * s2(i, j) - s1(i) * s1(j)) /
        (math.sqrt(n * s2(i, i) - s1(i) * s1(i)) * math.sqrt(n * s2(j, j) - s1(j) * s1(j)))
      val (gn, gr) = got((names(i), names(j)))
      assert(gn === feats.length.toLong)
      assert(math.abs(gr - r) < 2e-6, s"(${names(i)},${names(j)}): $gr vs $r")
    }
    // diagonal sanity via a self-check: every |r| <= 1
    assert(got.values.forall(v => math.abs(v._2) <= 1.0 + 1e-9))
  }

  test("q221 Adamic-Adar: scores match a set replay under the 2..64 part guard") {
    val cp = Tables(spark, sf0001, "lineitem")
      .join(Tables(spark, sf0001, "orders"), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byPart = cp.groupBy(_._2).map { case (p, g) => p -> g.map(_._1).toSet }
      .filter { case (_, cs) => cs.size >= 2 && cs.size <= 64 }
    val scores = collection.mutable.Map.empty[(Long, Long), (Long, BigDecimal)]
    byPart.foreach { case (_, cs) =>
      val w = BigDecimal(1.0 / math.log(cs.size.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      for (a <- cs; b <- cs if a < b) {
        val (c, ww) = scores.getOrElse((a, b), (0L, BigDecimal(0)))
        scores((a, b)) = (c + 1, ww + w)
      }
    }
    val want = scores.toSeq
      .map { case ((a, b), (c, w)) => (a, b, c, w.toDouble) }
      .sortBy { case (a, b, _, w) => (-w, a, b) }.take(20)
    val got = Graph.q221AdamicAdar(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === want)
  }

  test("q222 MMR rerank: matches an independent greedy replay; diversity beats raw top-5") {
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    def cos(a: Array[Double], b: Array[Double]) =
      r6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    val embs = Tables(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    val pv = embs(0L)
    val rels = embs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, pv)) }
      .sortBy { case (id, rl) => (-rl, id) }.take(20)
    var sel = Vector((rels.head._1, rels.head._2, rels.head._2))
    while (sel.length < 5) {
      val next = rels.filterNot(c => sel.exists(_._1 == c._1))
        .map { case (id, rl) =>
          val ms = sel.map(sl => cos(embs(id), embs(sl._1))).max
          (id, rl, r6(0.7 * rl - 0.3 * ms))
        }.minBy { case (id, _, m) => (-m, id) }
      sel :+= next
    }
    val want = sel.zipWithIndex.map { case ((id, rl, m), i) => (i + 1L, id, rl, m) }
    val got = Similarity.q222MmrRerank(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toVector
    assert(got === want)
    // the diversity term did WORK at some step: selection differs from raw
    // top-5 OR every candidate max-sim was tiny (then equality is fine)
    val raw5 = rels.take(5).map(_._1)
    val anyPenalty = got.map(_._2) != raw5.toVector
    val maxInterSim = rels.take(5).combinations(2).map { p => cos(embs(p(0)._1), embs(p(1)._1)) }.max
    assert(anyPenalty || maxInterSim < 0.5, "MMR never diverged and top-5 is highly self-similar")
  }
  test("q223 kNN eval: confusion matrix matches an independent float replay") {
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]) =
      BigDecimal.valueOf(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val rows = Tables(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding", $"label".cast("long")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getLong(2)))
    val confusion = collection.mutable.Map.empty[(Long, Long), Long]
    rows.filter(_._1 < 100).foreach { case (pid, pv, tl) =>
      val top5 = rows.filter(_._1 != pid)
        .map { case (id, v, lb) => (id, lb, cos(v, pv)) }
        .sortBy { case (id, _, sc) => (-sc, id) }.take(5)
      val pred = top5.groupBy(_._2).map { case (lb, g) => (lb, g.length) }
        .toSeq.sortBy { case (lb, c) => (-c, lb) }.head._1
      confusion((tl, pred)) = confusion.getOrElse((tl, pred), 0L) + 1
    }
    val got = Evaluation.q223KnnEval(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got === confusion.toMap)
    assert(got.values.sum === 100L)
  }

  test("q224 federated formats: csv/json/orc round-trip join equals the parquet join") {
    val direct = Tables(spark, sf0001, "supplier")
      .join(Tables(spark, sf0001, "nation"), $"s_nationkey" === $"n_nationkey")
      .join(Tables(spark, sf0001, "region"), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n"), sum($"s_acctbal".cast("decimal(18,4)")).cast("double").as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
      .sortBy(_._1)
    val got = Extras.q224FederatedFormats(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP))).toSeq
    assert(got === direct.toSeq)
    // staging directory cleaned up
    val leftovers = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_q224_"))
    assert(leftovers.isEmpty, s"staging dirs leaked: ${leftovers.mkString(",")}")
  }

  test("q225 schema evolution: mergeSchema read reconstructs v1 rows with NULL status") {
    val want = Tables(spark, sf0001, "orders")
      .select(when(pmod($"o_orderkey", lit(2)) === 0, lit("unknown"))
        .otherwise($"o_orderstatus").as("st"), $"o_totalprice")
      .groupBy($"st")
      .agg(count(lit(1)).as("n"), sum($"o_totalprice".cast("decimal(18,4)")).cast("double").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
      .sortBy(_._1)
    val got = Extras.q225SchemaEvolution(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP))).toSeq
    assert(got === want.toSeq)
    assert(got.exists(_._1 == "unknown"), "v1 generation never surfaced as NULL status")
    val leftovers = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_q225_"))
    assert(leftovers.isEmpty, s"staging dirs leaked: ${leftovers.mkString(",")}")
  }
  test("q226 max concurrency: sweep-line equals a brute-force per-second check") {
    val evs = Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", $"ts2".cast("long").as("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = evs.groupBy(_._1).values.flatMap { g =>
      val ordered = g.sortBy(e => (e._3, e._2))
      val buf = collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var st = ordered.head._3; var en = ordered.head._3
      ordered.tail.foreach { e =>
        if (e._3 - en > 1800) { buf += ((st, en)); st = e._3; en = e._3 }
        else en = e._3
      }
      buf += ((st, en))
      buf
    }.toSeq
    val got = Events.q226MaxConcurrency(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val days = sessions.flatMap { case (st, en) => (st / 86400) to (en / 86400) }.distinct.sorted
    assert(got.map(_._1).toSeq === days)
    got.foreach { case (day, nSess, maxC) =>
      val segs = sessions.flatMap { case (st, en) =>
        val t0 = math.max(st, day * 86400); val t1 = math.min(en, day * 86400 + 86399)
        if (t0 <= t1 && st / 86400 <= day && day <= en / 86400) Some((t0, t1)) else None
      }
      assert(nSess === segs.length.toLong, s"day $day session count")
      // brute force: evaluate concurrency at every segment start instant
      val brute = segs.map(_._1).distinct.map { t =>
        segs.count { case (a, b) => a <= t && t <= b }
      }.max
      assert(maxC === brute.toLong, s"day $day: $maxC vs brute $brute")
    }
  }

  test("q227 SAX motifs: words match an exact per-user replay") {
    val evs = Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", $"ts2".cast("long"),
        $"value".cast("decimal(18,4)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        BigDecimal(r.getDecimal(3))))
    def r(x: Double, sc: Int) = BigDecimal.valueOf(x)
      .setScale(sc, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val words = evs.groupBy(_._1).filter(_._2.length >= 8).map { case (_, g) =>
      val ordered = g.sortBy(e => (e._3, e._2)).map(_._4)
      val n = ordered.length
      val segs = ordered.zipWithIndex.groupBy { case (_, i) => i * 8 / n }
      val m3 = (0 until 8).map { sgi =>
        val vs = segs(sgi).map(_._1)
        BigDecimal(r((vs.sum / vs.length).toDouble, 3))
      }
      val s1 = m3.sum.toDouble
      val s2 = m3.map(x => x * x).sum.toDouble
      val mean = s1 / 8; val vr = s2 / 8 - (s1 / 8) * (s1 / 8)
      m3.map { m =>
        val z = if (vr <= 0) 0.0 else r((m.toDouble - mean) / math.sqrt(vr), 4)
        if (z < -0.6745) "a" else if (z < 0) "b" else if (z < 0.6745) "c" else "d"
      }.mkString
    }.toSeq
    val want = words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
      .toSeq.sortBy { case (w, n) => (-n, w) }.take(15)
    val got = Events.q227SaxMotifs(spark, sf0001).collect()
      .map(r0 => (r0.getString(0), r0.getLong(1))).toSeq
    assert(got === want)
    assert(got.forall(_._1.length == 8), "a SAX word is not 8 symbols")
  }
  test("q228 perplexity: held-out bits match an exact add-1 replay; unseen mass kept") {
    def bkt(id: Long): Long =
      ((((id % 2147483647L) * 48271L) % 2147483647L + 1L) * 16807L) % 2147483647L % 2L
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").filter(_.nonEmpty).toSeq))
      .filter(_._3.length >= 2)
    val train = docs.filter(d => bkt(d._1) == 0L)
    val heldOut = docs.filter(d => bkt(d._1) == 1L)
    val tb = train.flatMap(_._3.sliding(2).filter(_.length == 2).map(w => (w(0), w(1))))
    val cb = tb.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cu = tb.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val v = train.flatMap(_._3).distinct.length.toLong
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val bySource = heldOut.groupBy(_._2)
    val got = Text.q228PerplexityEval(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet === bySource.keySet)
    bySource.foreach { case (src, g) =>
      val eb = g.flatMap(_._3.sliding(2).filter(_.length == 2).map(w => (w(0), w(1))))
        .groupBy(identity).map { case (k, vv) => k -> vv.size.toLong }
      val n = eb.values.sum
      val sumTerm = eb.map { case ((w1, w2), m) =>
        val lp = r6(math.log(
          (cb.getOrElse((w1, w2), 0L) + 1).toDouble
            / (cu.getOrElse(w1, 0L) + v).toDouble) / math.log(2.0))
        lp * m
      }.sum
      val h = -sumTerm.toDouble / n
      val (gn, gb, gp) = got(src)
      assert(gn === n, s"$src n_bigrams")
      assert(math.abs(gb - h) < 2e-6, s"$src bits $gb vs $h")
      assert(math.abs(gp - math.pow(2.0, h)) < 2e-3, s"$src perplexity")
    }
  }

  test("q229 table fingerprint: detects any single-row mutation; counts exact") {
    val got = Extras.q229TableFingerprint(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.map(_._1).toSeq === Seq("customer", "lineitem", "orders"))
    val counts = Map(
      "customer" -> Tables(spark, sf0001, "customer").count(),
      "orders" -> Tables(spark, sf0001, "orders").count(),
      "lineitem" -> Tables(spark, sf0001, "lineitem").count())
    got.foreach { case (t, n, fp) =>
      assert(n === counts(t), s"$t rows")
      assert(BigInt(fp) > 0, s"$t fingerprint not a positive integer")
    }
    // order-independence: fingerprint of a reshuffled copy is identical
    import org.apache.spark.sql.functions.rand
    val o = Tables(spark, sf0001, "orders").orderBy(rand(7)).cache()
    o.count()
    val fp2 = o.agg(
      sum(conv(substring(md5(concat_ws("|",
        $"o_orderkey", $"o_custkey", $"o_orderstatus",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"),
        $"o_orderdate".cast("date").cast("string"), $"o_orderpriority")), 1, 8), 16, 10)
        .cast("long").cast("decimal(38,0)")).cast("decimal(38,0)").cast("string"))
      .head().getString(0)
    assert(fp2 === got.find(_._1 == "orders").get._3)
  }

  test("q230 calendar dim: inactive days zero-filled; quarter grids complete") {
    val got = Extras.q230CalendarDim(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4),
        BigDecimal(r.getDouble(5)).setScale(4, BigDecimal.RoundingMode.HALF_UP))))
    val orders = Tables(spark, sf0001, "orders")
      .select($"o_orderdate".cast("date").cast("string"), $"o_totalprice").collect()
      .map(r => (java.time.LocalDate.parse(r.getString(0)),
        BigDecimal(r.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
    val d0 = orders.map(_._1).min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val d1 = orders.map(_._1).max(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val allDays = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1)).toSeq
    val byQ = allDays.groupBy(dd => (dd.getYear.toLong, ((dd.getMonthValue - 1) / 3 + 1).toLong))
    assert(got.map(_._1).toSet === byQ.keySet)
    got.foreach { case ((yr, q), (nd, na, no, rev)) =>
      val days = byQ((yr, q))
      assert(nd === days.length.toLong, s"($yr,$q) calendar days")
      val mine = orders.filter(o => days.contains(o._1))
      assert(na === mine.map(_._1).distinct.length.toLong, s"($yr,$q) active days")
      assert(no === mine.length.toLong)
      assert(rev === mine.map(_._2).sum.setScale(4, BigDecimal.RoundingMode.HALF_UP))
    }
    assert(got.exists { case (_, (nd, na, _, _)) => na < nd },
      "no quarter has an inactive day - the zero-fill is untested")
  }
  test("q231 hash features: vector summaries match an exact signed-fold replay") {
    def h64(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(4)
      java.lang.Long.parseLong(md.map("%02x".format(_)).mkString, 16)
    }
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val got = Text.q231HashFeatures(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    docs.foreach { case (id, ts) =>
      val vec = new Array[Long](64)
      ts.groupBy(identity).foreach { case (t, g) =>
        val h = h64(t)
        val sgn = if ((h / 64) % 2 == 0) 1L else -1L
        vec((h % 64).toInt) += sgn * g.size
      }
      val nz = vec.zipWithIndex.filter(_._1 != 0)
      if (nz.nonEmpty) {
        val (nnz, l1, topDim, topAbs) = got(id)
        assert(nnz === nz.length.toLong, s"doc $id nnz")
        assert(l1 === nz.map(x => math.abs(x._1)).sum, s"doc $id l1")
        val best = nz.minBy { case (v, i) => (-math.abs(v), i) }
        assert(topDim === best._2.toLong && topAbs === math.abs(best._1), s"doc $id top")
      } else assert(!got.contains(id))
    }
  }

  test("q232 winsorize: cut points and clipped means match an exact replay") {
    val os = Tables(spark, sf0001, "orders")
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice".cast("decimal(18,4)"))
      .collect().map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
    val got = Stats.q232Winsorize(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))).toMap
    val byP = os.groupBy(_._1)
    assert(got.keySet === byP.keySet)
    byP.foreach { case (p, g) =>
      val sorted = g.sortBy(o => (o._3, o._2))
      val n = sorted.length
      val lo = sorted(((n * 5 + 99) / 100) - 1)._3
      val hi = sorted(((n * 95 + 99) / 100) - 1)._3
      val clipped = sorted.map(o => o._3.max(lo).min(hi))
      val (gn, g05, g95, gl, gh, mb, ma) = got(p)
      assert(gn === n.toLong)
      assert(g05 === lo.toDouble && g95 === hi.toDouble, s"$p cuts")
      assert(gl === sorted.count(_._3 < lo).toLong && gh === sorted.count(_._3 > hi).toLong)
      assert(math.abs(mb - (sorted.map(_._3).sum / n).toDouble) < 2e-6)
      assert(math.abs(ma - (clipped.sum / n).toDouble) < 2e-6)
    }
  }

  test("q233 bitmap overlap: popcount intersections equal exact distinct-id set math") {
    val su = Tables.events(spark, sf0001)
      .select($"event_type", $"user_id").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sets = su.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val segs = sets.keys.toSeq.sorted
    val want = (for (a <- segs; b <- segs if a < b) yield {
      val i = (sets(a) & sets(b)).size.toLong
      ((a, b), (sets(a).size.toLong, sets(b).size.toLong, i,
        BigDecimal(i.toDouble / (sets(a).size + sets(b).size - i))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }).filter(_._2._3 > 0).toMap
    val got = Events.q233BitmapOverlap(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (k, (na, nb, i, j)) =>
      val (gna, gnb, gi, gj) = got(k)
      assert(gna === na && gnb === nb && gi === i, s"pair $k")
      assert(math.abs(gj - j) < 2e-6)
    }
  }
  test("q234 rec holdout eval: hit rates match a leakage-free replay") {
    val orders = Tables(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_custkey",
        $"o_orderdate".cast("date").cast("string")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val seg = Tables(spark, sf0001, "customer")
      .select($"c_custkey", $"c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val byCust = orders.groupBy(_._2)
    val holdout = byCust.map { case (c, g) => c -> g.maxBy(o => (o._3, o._1))._1 }
    val trainOrders = orders.filterNot(o => holdout(o._2) == o._1)
    val liMap = li.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val trainItems = trainOrders.flatMap(o =>
      liMap.getOrElse(o._1, Set.empty).map(p => (o._1, p, o._2, o._3)))
    val pairKey = trainItems.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).toSeq.distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val deg = trainItems.map(t => (t._1, t._2)).distinct.groupBy(_._2)
      .map { case (k, v) => k -> v.size.toLong }
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val anchors = trainItems.groupBy(_._3).map { case (c, g) =>
      c -> g.maxBy(t => (t._4, t._1, t._2))._2 }
    val hitsBySeg = collection.mutable.Map.empty[String, (Long, Long)]
    anchors.foreach { case (c, a) =>
      val neigh = deg.keys.filter(j => j != a &&
        (pairKey.contains((math.min(a, j), math.max(a, j)))))
        .map { j =>
          val co = pairKey((math.min(a, j), math.max(a, j)))
          (j, r6(co.toDouble / math.sqrt((deg(a) * deg(j)).toDouble)))
        }.toSeq.sortBy { case (j, c0) => (-c0, j) }.take(5).map(_._1).toSet
      val hoParts = liMap.getOrElse(holdout(c), Set.empty)
      val hit = if ((neigh & hoParts).nonEmpty) 1L else 0L
      val sg = seg(c)
      val (n, h) = hitsBySeg.getOrElse(sg, (0L, 0L))
      hitsBySeg(sg) = (n + 1, h + hit)
    }
    val got = Graph.q234RecHoldoutEval(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === hitsBySeg.keySet)
    hitsBySeg.foreach { case (sg, (n, h)) =>
      val (gn, gh, gr) = got(sg)
      assert(gn === n && gh === h, s"segment $sg counts")
      assert(math.abs(gr - h.toDouble / n) < 2e-6)
    }
  }

  test("q277 brand modularity: contributions match a counting replay; total row is the exact sum") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brandOf = Tables(spark, sf0001, "part")
      .select($"p_partkey", $"p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val pe = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val sym = pe ++ pe.map(p => (p._2, p._1))
    val m2 = sym.size.toDouble
    val byBrand = sym.groupBy(t => brandOf(t._1)).map { case (b, es) =>
      val within = es.count(e => brandOf(e._2) == b).toLong
      val dm = es.size.toLong
      (b, within, dm,
        r6(within / m2 - (dm / m2) * (dm / m2)))
    }.toSeq.sortBy(_._1)
    val got = Graph.q277BrandModularity(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val (tot, per) = got.partition(_._1 == "(total)")
    assert(tot.length === 1 && per.length === byBrand.length)
    per.zip(byBrand).foreach { case ((b, w, dm, c), (wb, ww, wdm, wc)) =>
      assert(b === wb && w === ww && dm === wdm)
      assert(math.abs(c - wc.toDouble) < 2e-6, s"brand $b contribution")
    }
    assert(tot.head._2 === byBrand.map(_._2).sum)
    assert(tot.head._3 === byBrand.map(_._3).sum)
    assert(math.abs(tot.head._4
      - byBrand.map(_._4).foldLeft(BigDecimal(0))(_ + _).toDouble) < 2e-6)
    // degree masses across brands must account for every directed edge
    assert(byBrand.map(_._3).sum === sym.size.toLong)
  }

  test("q275 personalized pagerank: ranks match an integer replay; restart mass localizes on seeds") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet.toSeq
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val seeds = deg.toSeq.sortBy { case (n, d0) => (-d0, n) }.take(5)
      .map(_._1).toSet
    var rank: Map[Long, Long] =
      deg.map { case (n, _) => n -> (if (seeds(n)) 1000000L else 0L) }
    for (_ <- 1 to 3) {
      rank = edges.groupBy(_._2).map { case (dst, es) =>
        val s0 = es.map { case (src, _) => rank(src) / deg(src) }.sum
        dst -> ((if (seeds(dst)) 150000L else 0L) + 85L * s0 / 100L)
      }
    }
    val want = rank.toSeq.filter(_._2 > 0L)
      .sortBy { case (n, r) => (-r, n) }.take(25)
    val got = Graph.q275PersonalizedPagerank(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === want)
    // every seed receives the restart mass and must surface in the top-25
    assert(seeds.subsetOf(got.map(_._1).toSet),
      "seeds carry the restart mass - the ranking must localize on them")
  }

  test("q276 silhouette: label means match an exact centroid replay; scores in [-1,1]") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select($"vec_id".cast("long"), $"label".cast("long"),
        Similarity.asDouble($"embedding")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    def d8(x: Double) = BigDecimal.valueOf(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val cents = vecs.groupBy(_._2).map { case (l, g) =>
      l -> (0 until 64).map { j =>
        g.map(t => d8(t._3(j))).foldLeft(BigDecimal(0))(_ + _).toDouble / g.length
      }.toArray
    }
    def d2(a: Array[Double], b: Array[Double]) =
      r6(dot(a, a) - 2.0 * dot(a, b) + dot(b, b)).doubleValue
    case class Acc(var n: Long = 0, var s: BigDecimal = BigDecimal(0),
      var a: BigDecimal = BigDecimal(0), var b: BigDecimal = BigDecimal(0))
    val byLabel = collection.mutable.Map.empty[Long, Acc]
    vecs.foreach { case (_, l, v) =>
      val a = d2(v, cents(l))
      val b = cents.collect { case (l2, c) if l2 != l => d2(v, c) }.min
      val s = if (math.max(a, b) == 0.0) 0.0
        else r6((b - a) / math.max(a, b)).doubleValue
      val acc = byLabel.getOrElseUpdate(l, Acc())
      acc.n += 1; acc.s += r6(s); acc.a += r6(a); acc.b += r6(b)
    }
    val got = Similarity.q276Silhouette(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.length === byLabel.size)
    got.foreach { case (l, n, ms, ma, mb) =>
      val acc = byLabel(l)
      assert(n === acc.n, s"label $l n")
      assert(math.abs(ms - acc.s.toDouble / acc.n) < 2e-5, s"label $l sil")
      assert(math.abs(ma - acc.a.toDouble / acc.n) < 2e-5, s"label $l intra")
      assert(math.abs(mb - acc.b.toDouble / acc.n) < 2e-5, s"label $l inter")
      assert(ms >= -1.0 && ms <= 1.0)
    }
  }

  test("q272 capped fuzzy join: hierarchical blocking matches a replay; small-block pairs agree with q258") {
    def lev3(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val t = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(b.length)
    }
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def tok(t: String, i: Int): String = {
      val p = t.split(" ", -1); if (p.length > i) p(i) else ""
    }
    val heads = docs.map { case (id, t) =>
      (id, t.take(40), tok(t, 0), tok(t, 1), tok(t, 2)) }
    val sz = heads.groupBy(t => (t._3, t._4)).map { case (k, v) => k -> v.length }
    def pairs(g: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] =
      for (a <- g; b <- g if a._1 < b._1) yield
        (lev3(a._2, b._2).toLong, a._1, b._1,
          math.max(a._2.length, b._2.length).toLong)
    val small = heads.filter(t => sz((t._3, t._4)) <= 64)
      .groupBy(t => (t._3, t._4)).values
      .flatMap(g => pairs(g.toSeq.map(t => (t._1, t._2))))
    val big0 = heads.filter(t => sz((t._3, t._4)) > 64)
      .groupBy(t => (t._3, t._4, t._5)).values
      .flatMap(g => pairs(g.toSeq.map(t => (t._1, t._2))))
    val want = (small ++ big0).toSeq.sortBy(t => (t._1, t._2, t._3)).take(20)
    val got = Text.q272FuzzyJoinCapped(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === want.length)
    got.zip(want).foreach { case ((k1, k2, dist, sim), (wd, wa, wb, wl)) =>
      assert(k1 === wa && k2 === wb && dist === wd)
      assert(math.abs(sim - (1.0 - wd.toDouble / wl)) < 2e-6)
    }
    // on a corpus where NO block exceeds the cap, q272 degenerates to q258
    if (sz.values.forall(_ <= 64)) {
      val base = Text.q258FuzzyBlockedJoin(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.map(t => (t._1, t._2, t._3)).toSeq === base.toSeq,
        "cap never triggered, so the two operators must agree")
    }
  }

  test("q271 sql surface: the spark.sql text equals the equivalent DataFrame formulation") {
    val got = Relational.q271SqlSurface(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    // independent DataFrame-API formulation of the same declared semantics
    val cust = Tables(spark, sf0001, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val want = Tables(spark, sf0001, "orders")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(Tables(spark, sf0001, "lineitem"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate".cast("date").as("odate"))
      .agg(sum($"l_extendedprice".cast("decimal(12,4)")
        * (lit(1) - $"l_discount").cast("decimal(12,4)"))
        .cast("decimal(38,4)").cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey").limit(10)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2)))
    assert(got.length === 10)
    got.zip(want).zipWithIndex.foreach { case (((gk, gd, gr, grk), (wk, wd, wr)), i) =>
      assert(gk === wk && gd === wd && grk === i + 1L)
      assert(math.abs(gr - wr) < 1e-9)
    }
  }

  test("q269 frame dedup: repeated fingerprints match a GM1 byte replay") {
    val ids = Tables(spark, sf0001, "documents")
      .select($"doc_id").collect().map(_.getLong(0))
    val frames = ids.filter(_ % 4 == 3).flatMap { id =>
      val n = (32 + id % 97).toInt
      val body = Array.tabulate(n)(i => ((id * 31 + i * 17) % 256).toInt)
      val nFrames = math.max(n / 64, 1)
      (0 until nFrames).map { f =>
        val fp = (0 until 16).map(j => f"${body(f * 64 + j)}%02x").mkString
        (id, fp)
      }
    }
    val want = frames.groupBy(_._2).map { case (fp, g) =>
      (fp, g.length.toLong, g.map(_._1).distinct.length.toLong, g.map(_._1).min)
    }.filter(_._2 >= 2).toSeq
      .sortBy { case (fp, n, _, _) => (-n, fp) }.take(50)
    val got = graft.operators.NorthStar.q269FrameDedup(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
    assert(got.nonEmpty, "the 256-value byte cycle must collide somewhere")
  }

  test("q270 storage advisor: byte model and partition plan match a collected replay") {
    val target = 134217728L
    val specs = Seq(
      ("lineitem", Seq("l_returnflag", "l_linestatus"), 76L),
      ("orders", Seq("o_orderstatus", "o_orderpriority"), 32L),
      ("customer", Seq("c_name", "c_mktsegment"), 20L),
      ("documents", Seq("text", "lang", "source"), 16L))
    val want = specs.map { case (t, strCols, fixed) =>
      val rows = Tables(spark, sf0001, t).collect()
      val strBytes = rows.map(r =>
        strCols.map(c => r.getAs[String](c).length.toLong).sum).sum
      val total = strBytes + rows.length * (fixed + 4L * strCols.size)
      val rec = (total + target - 1) / target
      (t, rows.length.toLong, total,
        BigDecimal.valueOf(total.toDouble / rows.length)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).doubleValue,
        rec, rows.length / rec)
    }.sortBy(_._1)
    val got = graft.operators.Layout.q270StorageAdvisor(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === want)
    got.foreach { case (_, n, total, erb, rec, rpp) =>
      assert(rec >= 1L && rpp <= n)
      assert(total >= n, "every row carries at least its fixed width")
      assert(erb > 0.0)
    }
  }

  test("q262 fuzzy dedup clusters: sizes match a union-find replay over the blocked pairs") {
    def lev2(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val t = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(b.length)
    }
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def tok(t: String, i: Int): String = {
      val p = t.split(" ", -1); if (p.length > i) p(i) else ""
    }
    val heads = docs.map { case (id, t) => (id, t.take(40), tok(t, 0), tok(t, 1)) }
    val pairs = heads.groupBy(t => (t._3, t._4)).values.flatMap { g0 =>
      val g = g0.toSeq
      for (a <- g; b <- g if a._1 < b._1 && lev2(a._2, b._2) <= 16)
        yield (a._1, b._1)
    }.toSeq
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = members.groupBy(find).map { case (root, ms) => (root, ms.size.toLong) }
      .toSeq.sortBy { case (c, n) => (-n, c) }
    val got = Text.q262FuzzyDedupClusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === want)
    got.foreach { case (cluster, n) =>
      assert(n >= 2L, "clusters come from pairs, so >= 2 members")
      assert(members.contains(cluster), "canonical id must be a member")
    }
  }

  test("q263 bootstrap CI: replicate order statistics match the portable-hash replay") {
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val p = 2147483647L
    val cuts = Seq(3679L, 7358L, 9197L, 9810L, 9963L, 9994L, 9999L)
    def weight(id: Long, b: Long): Long = {
      val x = id * 100 + b
      val h1 = (x % p) * 48271 % p
      val h2 = (h1 + 1) * 16807 % p
      val bk = h2 % 10000
      val i = cuts.indexWhere(bk < _)
      if (i < 0) 7L else i.toLong
    }
    val means = (0L until 32L).map { b =>
      var sw = 0L; var swx = 0L
      docs.foreach { case (id, nc) =>
        val w = weight(id, b); sw += w; swx += w * nc
      }
      r6(swx.toDouble / sw.toDouble)
    }.sorted
    val pe = r6(docs.map(_._2).sum.toDouble / docs.length)
    val got = Stats.q263BootstrapCi(spark, sf0001).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(0) === 32L)
    assert(math.abs(r.getDouble(1) - pe) < 2e-6)
    assert(math.abs(r.getDouble(2) - means(1)) < 2e-6)
    assert(math.abs(r.getDouble(3) - means(15)) < 2e-6)
    assert(math.abs(r.getDouble(4) - means(30)) < 2e-6)
    assert(r.getDouble(2) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(4))
  }

  test("q260 power iteration: loadings match an exact-arithmetic replay; infinity norm is 1") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select($"vec_id".cast("long"), Similarity.asDouble($"embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def r9(x: Double) = BigDecimal.valueOf(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    var v = Array.fill(64)(0.125)
    var lambda = 0.0
    var loadings = Array.empty[Double]
    for (t <- 1 to 4) {
      val ws = vecs.map { case (_, x) => (x, r9(dot(x, v)).doubleValue) }
      val u = (0 until 64).map { j =>
        ws.map { case (x, w) => r9(w * x(j)) }.foldLeft(BigDecimal(0))(_ + _)
          .doubleValue
      }
      lambda = u.map(math.abs).max
      val nxt = u.map(uj => r9(uj / lambda).doubleValue).toArray
      if (t < 4) v = nxt else loadings = nxt
    }
    val got = Similarity.q260PowerIteration(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length === 64)
    got.zipWithIndex.foreach { case ((dim, loading, lam), i) =>
      assert(dim === i + 1L)
      assert(math.abs(loading - loadings(i)) < 1e-9, s"dim $dim")
      assert(math.abs(lam - lambda) < 1e-6)
    }
    assert(math.abs(got.map(t => math.abs(t._2)).max - 1.0) < 1e-9,
      "infinity-norm normalization must pin max |loading| to 1")
    assert(got.head._3 > 0.0)
  }

  test("q261 greedy max-cover: selection trace matches a replay; marginal gains non-increasing") {
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val grams = docs.map { case (id, t) =>
      val tk = t.split(" ").filter(_.nonEmpty)
      id -> tk.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    }.toMap
    val df = grams.values.flatten.groupBy(identity).map { case (g, v) => g -> v.size }
    val rare = df.filter(_._2 <= 64).keySet
    val rg = grams.map { case (id, gs) => id -> (gs & rare) }
      .filter(_._2.nonEmpty)
    var covered = Set.empty[String]
    val want = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var total = 0L
    for (t <- 1 to 8) {
      val (id, gain) = rg.view
        .map { case (id0, gs) => (id0, (gs -- covered).size.toLong) }
        .minBy { case (id0, g0) => (-g0, id0) }
      covered ++= rg(id)
      total += gain
      want += ((t.toLong, id, gain, total))
    }
    val got = Text.q261GreedyMaxcover(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want.toSeq)
    assert(got.map(_._3).sliding(2).forall(w => w.length < 2 || w(1) <= w(0)),
      "submodular greedy must have non-increasing marginal gains")
  }

  test("q258 fuzzy blocked join: top pairs match a brute-force replay restricted to blocks") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val t = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(b.length)
    }
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def tok(t: String, i: Int): String = {
      val parts = t.split(" ", -1)
      if (parts.length > i) parts(i) else ""
    }
    val heads = docs.map { case (id, t) => (id, t.take(40), tok(t, 0), tok(t, 1)) }
    val byBlock = heads.groupBy(t => (t._3, t._4))
    val want = byBlock.values.flatMap { g0 =>
      val g = g0.toSeq
      for (a <- g; b <- g if a._1 < b._1) yield {
        val d0 = lev(a._2, b._2)
        (d0.toLong, a._1, b._1, math.max(a._2.length, b._2.length))
      }
    }.toSeq.sortBy(t => (t._1, t._2, t._3)).take(20)
    val got = Text.q258FuzzyBlockedJoin(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === want.length)
    got.zip(want).foreach { case ((k1, k2, dist, sim), (wd, wa, wb, wl)) =>
      assert(k1 === wa && k2 === wb && dist === wd)
      assert(math.abs(sim - (1.0 - wd.toDouble / wl)) < 2e-6)
    }
    // blocking is a candidate FILTER: every returned pair shares the block key
    val headOf = heads.map(t => t._1 -> t).toMap
    got.foreach { case (k1, k2, _, _) =>
      assert(headOf(k1)._3 === headOf(k2)._3 && headOf(k1)._4 === headOf(k2)._4)
    }
  }

  test("q259 textrank: top keywords match an integer PageRank replay over the bigram graph") {
    val texts = Tables(spark, sf0001, "documents")
      .select($"text").collect().map(_.getString(0))
    val bg = texts.flatMap { t =>
      val tk = t.split(" ").filter(_.nonEmpty)
      tk.sliding(2).collect { case Array(l, r) if l != r => (l, r) }
    }
    val sym = bg ++ bg.map { case (l, r) => (r, l) }
    val edges = sym.groupBy(identity).filter(_._2.length >= 2).keys.toSeq
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var rank: Map[String, Long] = deg.map { case (k, _) => k -> 1000000L }
    for (_ <- 1 to 3) {
      rank = edges.groupBy(_._2).map { case (dst, es) =>
        val s0 = es.map { case (src, _) => rank(src) / deg(src) }.sum
        dst -> (150000L + 85L * s0 / 100L)
      }
    }
    val want = rank.toSeq.sortBy { case (t, r) => (-r, t) }.take(25)
    val got = Text.q259TextrankKeywords(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === want)
  }

  test("q256 bollinger: breakout counts match a rolling-window replay; bands never see the evaluated row") {
    val rows = Tables(spark, sf0001, "lineitem")
      .join(Tables(spark, sf0001, "part"),
        $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_extendedprice".cast("double"),
        unix_timestamp($"l_shipdate".cast("timestamp")), $"l_orderkey",
        $"l_linenumber".cast("long"), $"p_brand")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    def d4(x: Double) = BigDecimal.valueOf(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val bySeg = collection.mutable.Map.empty[String, (Long, Long, Long)]
    rows.groupBy(_._1).foreach { case (_, g) =>
      val series = g.sortBy(t => (t._3, t._4, t._5))
      for (i <- series.indices if i >= 20) {
        val win = series.slice(i - 20, i).map(_._2)
        val s1 = win.map(d4).sum.toDouble
        val s2 = win.map(x => d4(x) * d4(x)).sum.toDouble
        val mean = s1 / 20.0
        val sd = math.sqrt(math.max((s2 - s1 * s1 / 20.0) / 19.0, 0.0))
        val px = series(i)._2
        val up = if (px > mean + 2.0 * sd) 1L else 0L
        val dn = if (px < mean - 2.0 * sd) 1L else 0L
        val br = series(i)._6
        val (n, u, dd) = bySeg.getOrElse(br, (0L, 0L, 0L))
        bySeg(br) = (n + 1, u + up, dd + dn)
      }
    }
    val got = Events.q256BollingerBreakout(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got.keySet === bySeg.keySet)
    bySeg.foreach { case (br, (n, u, dn)) =>
      val (gn, gu, gd, gr) = got(br)
      assert(gn === n && gu === u && gd === dn, s"brand $br counts")
      assert(math.abs(gr - (u + dn).toDouble / n) < 2e-6, s"brand $br rate")
    }
  }

  test("q257 macro F1: per-class P/R/F1 and macro row match the confusion-matrix arithmetic") {
    val cm = Evaluation.q223KnnEval(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val classes = (cm.map(_._1) ++ cm.map(_._2)).distinct.sorted
    val per = classes.map { c =>
      val tp = cm.filter(t => t._1 == c && t._2 == c).map(_._3).sum
      val support = cm.filter(_._1 == c).map(_._3).sum
      val predicted = cm.filter(_._2 == c).map(_._3).sum
      val p = if (predicted == 0) 0.0 else r6(tp.toDouble / predicted)
      val r = if (support == 0) 0.0 else r6(tp.toDouble / support)
      val f1 = if (p + r == 0.0) 0.0 else r6(2.0 * p * r / (p + r))
      (c, tp, support, predicted, p, r, f1)
    }
    val got = Evaluation.q257MacroF1(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.length === per.length + 1)
    got.filter(_._1 >= 0).zip(per).foreach { case (g, w) =>
      assert(g._1 === w._1 && g._2 === w._2 && g._3 === w._3 && g._4 === w._4,
        s"class ${w._1} counts")
      assert(math.abs(g._5 - w._5) < 2e-6 && math.abs(g._6 - w._6) < 2e-6 &&
        math.abs(g._7 - w._7) < 2e-6, s"class ${w._1} metrics")
    }
    val mac = got.find(_._1 == -1L).get
    assert(mac._2 === per.map(_._2).sum && mac._3 === per.map(_._3).sum)
    val n = per.length.toDouble
    assert(math.abs(mac._5 - per.map(_._5).sum / n) < 2e-6)
    assert(math.abs(mac._7 - per.map(_._7).sum / n) < 2e-6)
    // micro sanity: diagonal mass == supports == predictions in total
    assert(mac._3 === mac._4)
  }

  test("q255 k-center coreset: selection order and radii match a greedy replay; radius non-increasing") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select($"vec_id".cast("long"), Similarity.asDouble($"embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    // same left-to-right fold as the codegen'd graft_dot
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def d2(a: Array[Double], b: Array[Double]): Double =
      r6(dot(a, a) - 2.0 * dot(a, b) + dot(b, b))
    val seed = vecs.minBy(_._1)
    var dist = vecs.map { case (id, v) => (id, v, d2(v, seed._2)) }
    val want = collection.mutable.ArrayBuffer((1L, seed._1, dist.map(_._3).max))
    for (t <- 2 to 8) {
      val sel = dist.minBy { case (id, _, dd) => (-dd, id) }
      dist = dist.map { case (id, v, dd) => (id, v, math.min(dd, d2(v, sel._2))) }
      want += ((t.toLong, sel._1, dist.map(_._3).max))
    }
    val got = Similarity.q255KcenterCoreset(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === 8)
    got.zip(want).foreach { case ((gs, gc, gr), (ws, wc, wr)) =>
      assert(gs === ws && gc === wc, s"step $ws center")
      assert(math.abs(gr - wr) < 1e-9, s"step $ws radius")
    }
    // covering radius can only shrink as centers are added
    assert(got.map(_._3).sliding(2).forall(w => w.length < 2 || w(1) <= w(0) + 1e-12))
    assert(got.map(_._2).distinct.length === 8, "centers must be distinct")
  }

  test("q253 ndcg/mrr: graded metrics match a leakage-free ranked replay") {
    val orders = Tables(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_custkey",
        $"o_orderdate".cast("date").cast("string")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val seg = Tables(spark, sf0001, "customer")
      .select($"c_custkey", $"c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val byCust = orders.groupBy(_._2)
    val holdout = byCust.map { case (c, g) => c -> g.maxBy(o => (o._3, o._1))._1 }
    val trainOrders = orders.filterNot(o => holdout(o._2) == o._1)
    val liMap = li.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val trainItems = trainOrders.flatMap(o =>
      liMap.getOrElse(o._1, Set.empty).map(p => (o._1, p, o._2, o._3)))
    val pairKey = trainItems.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).toSeq.distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val deg = trainItems.map(t => (t._1, t._2)).distinct.groupBy(_._2)
      .map { case (k, v) => k -> v.size.toLong }
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    def r9(x: Double) = BigDecimal.valueOf(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val disc = (1 to 5).map(k => k -> r9(1.0 / (math.log(k + 1) / math.log(2)))).toMap
    val rec = (1 to 5).map(k => k -> r9(1.0 / k)).toMap
    val anchors = trainItems.groupBy(_._3).map { case (c, g) =>
      c -> g.maxBy(t => (t._4, t._1, t._2))._2 }
    case class Acc(var n: Long = 0L, var ndcg: BigDecimal = BigDecimal(0),
      var rr: BigDecimal = BigDecimal(0))
    val bySeg = collection.mutable.Map.empty[String, Acc]
    anchors.foreach { case (c, a) =>
      val ranked = deg.keys.filter(j => j != a &&
        pairKey.contains((math.min(a, j), math.max(a, j))))
        .map { j =>
          val co = pairKey((math.min(a, j), math.max(a, j)))
          (j, r6(co.toDouble / math.sqrt((deg(a) * deg(j)).toDouble)))
        }.toSeq.sortBy { case (j, c0) => (-c0, j) }.take(5).map(_._1)
      val hoParts = liMap.getOrElse(holdout(c), Set.empty)
      // eval set = >=1 ranked rec AND >=1 held-out part (the declared rule)
      if (ranked.nonEmpty && hoParts.nonEmpty) {
        val rel = ranked.zipWithIndex.map { case (j, i) => (i + 1, hoParts(j)) }
        val dcg = rel.collect { case (rk, true) => disc(rk) }
          .foldLeft(BigDecimal(0))(_ + _)
        val nrel = math.min(hoParts.size, 5)
        val idcg = (1 to nrel).map(disc).foldLeft(BigDecimal(0))(_ + _)
        val ndcg6 = BigDecimal(r6((dcg.toDouble / idcg.toDouble)))
        val rr = rel.collectFirst { case (rk, true) => rec(rk) }
          .getOrElse(BigDecimal(0))
        val acc = bySeg.getOrElseUpdate(seg(c), Acc())
        acc.n += 1; acc.ndcg += ndcg6; acc.rr += rr
      }
    }
    val got = Graph.q253NdcgMrr(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet === bySeg.keySet)
    bySeg.foreach { case (sg, acc) =>
      val (gn, gndcg, gmrr) = got(sg)
      assert(gn === acc.n, s"segment $sg n_eval")
      assert(math.abs(gndcg - acc.ndcg.toDouble / acc.n) < 2e-6, s"segment $sg ndcg")
      assert(math.abs(gmrr - acc.rr.toDouble / acc.n) < 2e-6, s"segment $sg mrr")
    }
    // graded metrics are bounded and MRR >= per-rank floor of a hit-rate:
    // every metric lands in [0, 1]
    got.values.foreach { case (_, ndcg, mrr) =>
      assert(ndcg >= 0.0 && ndcg <= 1.0 && mrr >= 0.0 && mrr <= 1.0)
    }
  }

  test("q235 gains curve: positives-first tie rule; monotone gain; decile 10 reaches 1") {
    val evs = Tables.events(spark, sf0001)
      .select($"value".cast("decimal(18,4)"), ($"event_type" === "purchase").cast("long"))
      .collect().map(r => (BigDecimal(r.getDecimal(0)), r.getLong(1)))
    val n = evs.length.toLong
    val np = evs.map(_._2).sum
    val groups = evs.groupBy(_._1).map { case (v, g) =>
      (v, g.length.toLong, g.map(_._2).sum) }.toSeq.sortBy(-_._1)
    val got = Evaluation.q235GainsCurve(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq === (1L to 10L))
    got.foreach { case (dd, rank, cumPos, gain, lift) =>
      assert(rank === dd * n / 10)
      var cs = 0L; var cp = 0L; var want = -1L
      groups.foreach { case (_, cnt, pos) =>
        if (want < 0 && cs < rank && rank <= cs + cnt)
          want = cp + math.min(pos, rank - cs)
        cs += cnt; cp += pos
      }
      assert(cumPos === want, s"decile $dd")
      assert(math.abs(gain - cumPos.toDouble / np) < 2e-6)
      assert(math.abs(lift - cumPos.toDouble * n / (rank.toDouble * np)) < 2e-6)
    }
    assert(got.last._3 === np && math.abs(got.last._4 - 1.0) < 1e-9)
    assert(got.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) <= w(1) + 1e-12))
  }

  test("q236 seasonal naive: MAE/bias match an exact hold-out replay") {
    val hourly = Tables.events(spark, sf0001)
      .select($"event_type", ($"ts2".cast("long") / 3600).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val hmax = hourly.keys.map(_._2).max
    val train = hourly.filter(_._1._2 <= hmax - 24)
    val ev = hourly.filter(_._1._2 > hmax - 24)
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val stats = train.groupBy { case ((t, h), _) => (t, h % 24) }
      .map { case (k, g) => k -> (g.values.sum, g.size.toLong) }
    val got = Events.q236SeasonalNaiveEval(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val byType = ev.groupBy(_._1._1)
    assert(got.keySet === byType.keySet)
    byType.foreach { case (t, g) =>
      val terms = g.toSeq.map { case ((_, h), nn) =>
        val pred = stats.get((t, h % 24))
          .map { case (s0, c0) => s0.toDouble / c0 }.getOrElse(0.0)
        (r6(math.abs(nn.toDouble - pred)), r6(nn.toDouble - pred))
      }
      val (gn, mae, bias) = got(t)
      assert(gn === g.size.toLong)
      assert(math.abs(mae - terms.map(_._1).sum.toDouble / g.size) < 2e-4)
      assert(math.abs(bias - terms.map(_._2).sum.toDouble / g.size) < 2e-4)
    }
  }
  test("q237 weighted SSSP: distances match a Dijkstra replay; converged within the bound") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val pe = li.toSeq.groupBy(_._1).values.toSeq
      .flatMap(g => for (a <- g; b <- g if a._2 < b._2) yield (a._2, b._2))
      .groupBy(identity).filter(_._2.size >= 2)
      .map { case (k, v) => k -> v.size.toLong }
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val adj = collection.mutable.Map.empty[Long, List[(Long, BigDecimal)]]
      .withDefaultValue(Nil)
    pe.foreach { case ((u, v), co) =>
      val w = r6(1.0 / co.toDouble)
      adj(u) = (v, w) :: adj(u); adj(v) = (u, w) :: adj(v)
    }
    val src = pe.keys.flatMap(k => Seq(k._1, k._2)).min
    val dist = collection.mutable.Map(src -> BigDecimal(0))
    val pq = collection.mutable.PriorityQueue((BigDecimal(0), src))(
      Ordering.by[(BigDecimal, Long), (BigDecimal, Long)](t => (-t._1, -t._2)))
    while (pq.nonEmpty) {
      val (dd, u) = pq.dequeue()
      if (dist(u) == dd)
        adj(u).foreach { case (v, w) =>
          val nd = dd + w
          if (!dist.contains(v) || nd < dist(v)) { dist(v) = nd; pq.enqueue((nd, v)) }
        }
    }
    val got = Graph.q237WeightedSssp(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got.keySet === dist.keySet.toSet,
      "reachable set differs - 8 rounds may not have converged at sf0.001")
    dist.foreach { case (nn, dd) =>
      assert(math.abs(got(nn) - dd.toDouble) < 1e-9, s"node $nn")
    }
  }

  test("q238 Wilson CI: brackets the rate, inside [0,1], matches the closed form") {
    val os = Tables(spark, sf0001, "orders")
      .join(Tables(spark, sf0001, "customer"), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", ($"o_orderpriority" === "1-URGENT").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = Stats.q238WilsonCi(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    val byS = os.groupBy(_._1)
    assert(got.keySet === byS.keySet)
    byS.foreach { case (sg, g) =>
      val n = g.length.toDouble; val k = g.map(_._2).sum.toDouble
      val z = 1.96
      val denom = 1.0 + z * z / n
      val center = (k / n + z * z / (2.0 * n)) / denom
      val half = z * math.sqrt(k / n * (1.0 - k / n) / n + z * z / (4.0 * n * n)) / denom
      val (gn, gk, rate, lo, hi) = got(sg)
      assert(gn === g.length.toLong && gk === g.map(_._2).sum)
      assert(math.abs(rate - k / n) < 1e-6)
      assert(math.abs(lo - (center - half)) < 2e-6 && math.abs(hi - (center + half)) < 2e-6)
      assert(lo >= 0.0 - 1e-9 && hi <= 1.0 + 1e-9 && lo <= rate && rate <= hi)
    }
  }

  test("q239 rank movers: ranks within the top-100 set match a replay") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_quantity".cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val early = Tables(spark, sf0001, "orders")
      .select($"o_orderkey", ($"o_orderdate" < lit("1998-01-01").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val per = li.groupBy(_._2).map { case (p, g) =>
      val qa = g.filter(x => early(x._1)).map(_._3).sum
      val qb = g.filterNot(x => early(x._1)).map(_._3).sum
      (p, qa + qb, qa, qb)
    }.toSeq
    val top = per.sortBy { case (p, qt, _, _) => (-qt, p) }.take(100)
    val ra = top.sortBy { case (p, _, qa, _) => (-qa, p) }.zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val rb = top.sortBy { case (p, _, _, qb) => (-qb, p) }.zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val want = top.map { case (p, _, qa, qb) => (p, qa, qb, ra(p), rb(p), ra(p) - rb(p)) }
      .sortBy { case (p, _, _, _, _, dd) => (-math.abs(dd), p) }.take(20)
    val got = Extras.q239RankMovers(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === want)
  }
  test("q240 containment: asymmetric ratios match a set replay under the df guard") {
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val sh = docs.map { case (id, t) =>
      id -> t.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    }.toMap
    val df = sh.values.flatten.groupBy(identity).map { case (g, v) => g -> v.size }
    val rare = df.filter(_._2 <= 64).keySet
    val got = Text.q240ContainmentDedup(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val ids = sh.keys.toSeq
    val want = (for (a <- ids; b <- ids if a != b) yield {
      val inter = (sh(a) & sh(b) & rare).size.toLong
      val c = if (sh(a).nonEmpty)
        BigDecimal(inter.toDouble / sh(a).size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble else 0.0
      ((a, b), (inter, sh(a).size.toLong, c))
    }).filter(_._2._3 >= 0.5).toMap
    assert(got.keySet === want.keySet)
    assert(got.nonEmpty, "fixture carries no containment pair - vacuous")
    want.foreach { case (k, (i, sz, c)) =>
      val (gi, gsz, gc) = got(k)
      assert(gi === i && gsz === sz && math.abs(gc - c) < 1e-9, s"pair $k")
    }
  }

  test("q241 forward fill: LOCF audit matches a sequential replay") {
    val evs = Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", $"value".cast("decimal(18,4)"),
        $"ts2".cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2)), r.getLong(3)))
    val got = Events.q241ForwardFill(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val byUser = evs.groupBy(_._1)
    assert(got.keySet === byUser.keySet)
    byUser.foreach { case (u, g) =>
      val daily = g.groupBy(_._4 / 86400).map { case (day, rows) =>
        day -> rows.maxBy(r => (r._4, r._2))._3
      }
      val d0 = daily.keys.min; val d1 = daily.keys.max
      var lastV: Option[BigDecimal] = None
      var nFilled = 0L
      (d0 to d1).foreach { day =>
        daily.get(day) match {
          case Some(v) => lastV = Some(v)
          case None => nFilled += 1
        }
      }
      val (nd, no, nf, fv) = got(u)
      assert(nd === d1 - d0 + 1 && no === daily.size.toLong && nf === nFilled, s"user $u")
      assert(math.abs(fv - lastV.get.toDouble) < 1e-9, s"user $u final")
    }
    assert(got.values.exists(_._3 > 0), "no user had a gap - LOCF untested")
  }

  test("q242 nearest as-of: picks the closest candidate either side; probes kept whole") {
    val evs = Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", $"event_type", $"ts2".cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val errors = evs.filter(_._3 == "error")
    val purchases = evs.filter(_._3 == "purchase").groupBy(_._1)
    val got = Events.q242NearestAsof(spark, sf0001).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
    assert(got.keySet === errors.map(_._2).toSet, "an unmatched error row was dropped")
    errors.foreach { case (u, eid, _, te) =>
      val cands = purchases.getOrElse(u, Array.empty)
        .filter(p => math.abs(p._4 - te) <= 1800)
      if (cands.isEmpty) assert(got(eid).isEmpty, s"error $eid spurious match")
      else {
        val best = cands.minBy(p => (math.abs(p._4 - te), p._4, p._2))
        assert(got(eid) === Some((best._2, best._4 - te)), s"error $eid")
      }
    }
    assert(got.values.exists(_.isEmpty) && got.values.exists(_.nonEmpty),
      "fixture lacks both matched and unmatched errors - weak coverage")
  }
  test("q243 streaks: islands match a sequential run-length replay") {
    val days = Tables.events(spark, sf0001)
      .select($"user_id", ($"ts2".cast("long") / 86400).cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = Events.q243Streaks(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val byUser = days.groupBy(_._1)
    assert(got.keySet === byUser.keySet)
    byUser.foreach { case (u, g) =>
      val sorted = g.map(_._2).sorted
      val runs = collection.mutable.ArrayBuffer.empty[(Long, Long)] // (start, len)
      sorted.foreach { day =>
        if (runs.nonEmpty && runs.last._1 + runs.last._2 == day)
          runs(runs.length - 1) = (runs.last._1, runs.last._2 + 1)
        else runs += ((day, 1L))
      }
      val (ns, na, ls, lsd) = got(u)
      assert(ns === runs.length.toLong && na === sorted.length.toLong, s"user $u")
      val best = runs.maxBy(r => (r._2, r._1))
      assert(ls === best._2 && lsd === best._1, s"user $u best streak")
    }
    assert(got.values.exists(_._3 >= 2), "no user has a multi-day streak - vacuous")
  }

  test("q244 max drawdown: peak/trough match a sequential fold") {
    val evs = Tables.events(spark, sf0001)
      .filter($"event_type".isin("purchase", "error"))
      .select($"user_id", $"event_id", $"event_type",
        $"ts2".cast("long"), $"value".cast("decimal(18,4)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), BigDecimal(r.getDecimal(4))))
    val got = Events.q244MaxDrawdown(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    val byUser = evs.groupBy(_._1)
    assert(got.keySet === byUser.keySet)
    byUser.foreach { case (u, g) =>
      val ordered = g.sortBy(e => (e._4, e._2))
      var cum = BigDecimal(0); var peak = BigDecimal(0)
      var peakBal = BigDecimal(Long.MinValue); var maxDd = BigDecimal(Long.MinValue)
      var trough = 0L
      var first = true
      ordered.foreach { e =>
        val flow = if (e._3 == "purchase") e._5 else -e._5
        cum += flow
        peak = if (first) cum else peak.max(cum)
        first = false
        if (cum > peakBal) peakBal = cum
        val dd = peak - cum
        if (dd > maxDd) { maxDd = dd; trough = e._4 }
      }
      val (nf, pb, md, te) = got(u)
      assert(nf === ordered.length.toLong, s"user $u flows")
      assert(math.abs(pb - peakBal.toDouble) < 1e-6, s"user $u peak")
      assert(math.abs(md - maxDd.toDouble) < 1e-6, s"user $u drawdown")
      assert(te === trough, s"user $u trough")
    }
  }

  test("q245 share of parent: shares sum to 1 within region and overall") {
    val got = Relational.q245ShareOfParent(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length === 25)
    got.groupBy(_._1).foreach { case (reg, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, s"region $reg shares")
      val regRev = rows.map(_._3).sum
      rows.foreach { r =>
        assert(math.abs(r._4 - r._3 / regRev) < 1e-4, s"${r._2} region share")
      }
    }
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-4, "total shares")
    val totalRev = got.map(_._3).sum
    got.foreach { r => assert(math.abs(r._5 - r._3 / totalRev) < 1e-4) }
  }
  test("q246 conversion latency: exact discrete percentiles per weekly cohort") {
    val evs = Tables.events(spark, sf0001)
      .select($"user_id", $"event_type", $"ts2".cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val signups = evs.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, g) => u -> g.map(_._3).min }
    val delays = signups.flatMap { case (u, ts) =>
      val ps = evs.filter(e => e._1 == u && e._2 == "purchase" && e._3 >= ts)
      if (ps.isEmpty) None else Some((u, ts / 604800, ps.map(_._3 - ts).min))
    }.toSeq
    val got = Events.q246ConversionLatency(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val byC = delays.groupBy(_._2)
    assert(got.keySet === byC.keySet)
    byC.foreach { case (c, g) =>
      val sorted = g.sortBy(x => (x._3, x._1)).map(_._3)
      val n = sorted.length
      val (gn, p50, p90) = got(c)
      assert(gn === n.toLong)
      assert(p50 === sorted(((n * 50 + 99) / 100) - 1), s"cohort $c p50")
      assert(p90 === sorted(((n * 90 + 99) / 100) - 1), s"cohort $c p90")
    }
  }

  test("q247 YoY growth: same-month alignment matches a map replay") {
    val os = Tables(spark, sf0001, "orders")
      .select((year($"o_orderdate") * 12 + month($"o_orderdate")).cast("long"),
        $"o_totalprice".cast("decimal(18,4)")).collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDecimal(1))))
    val monthly = os.groupBy(_._1).map { case (m, g) =>
      m -> (g.length.toLong, g.map(_._2).sum) }
    val got = Relational.q247YoyGrowth(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val want = monthly.keys.filter(m => monthly.contains(m - 12)).toSet
    assert(got.keySet === want)
    want.foreach { m =>
      val (n, rev) = monthly(m); val (_, prior) = monthly(m - 12)
      val (gn, gr, gp, gg) = got(m)
      assert(gn === n)
      assert(math.abs(gr - rev.toDouble) < 1e-4 && math.abs(gp - prior.toDouble) < 1e-4)
      assert(math.abs(gg - (rev.toDouble / prior.toDouble - 1.0)) < 2e-6, s"month $m")
    }
  }

  test("q248 dup rate by source: involvement flags match the exact Jaccard kernel") {
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").filter(_.nonEmpty).toSeq))
    val sh = docs.map { case (id, _, t) =>
      id -> (if (t.length < 3) Set(t.mkString(" "))
             else t.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap
    val srcOf = docs.map(d => d._1 -> d._2).toMap
    val ids = docs.map(_._1)
    val pairs = for (a <- ids; b <- ids if a < b
      && 3L * (sh(a) & sh(b)).size >= sh(a).size + sh(b).size) yield (a, b)
    val cross = collection.mutable.Set.empty[Long]
    val intra = collection.mutable.Set.empty[Long]
    pairs.foreach { case (a, b) =>
      if (srcOf(a) != srcOf(b)) { cross += a; cross += b }
      else { intra += a; intra += b }
    }
    val got = NorthStar.q248DupRateBySource(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    val bySrc = docs.groupBy(_._2)
    assert(got.keySet === bySrc.keySet)
    bySrc.foreach { case (sc, g) =>
      val mine = g.map(_._1).toSet
      val dup = mine.filter(id => cross(id) || intra(id))
      val (nd, ndup, nc, ni, rate) = got(sc)
      assert(nd === g.length.toLong && ndup === dup.size.toLong, s"$sc totals")
      assert(nc === (mine & cross).size.toLong && ni === (mine & intra).size.toLong, s"$sc split")
      assert(math.abs(rate - dup.size.toDouble / g.length) < 1e-6)
    }
    assert(got.values.exists(_._2 > 0), "no source has any dup involvement - vacuous")
  }
  test("q249 behavior entropy: per-user H matches an exact count replay") {
    val evs = Tables.events(spark, sf0001)
      .select($"user_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def r6ln(c: Long) = BigDecimal(math.log(c.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val got = Stats.q249BehaviorEntropy(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val byU = evs.groupBy(_._1)
    assert(got.keySet === byU.keySet)
    byU.foreach { case (u, g) =>
      val counts = g.groupBy(_._2).map(_._2.size.toLong).toSeq
      val n = counts.sum
      val h = ((BigDecimal(n) * r6ln(n)) - counts.map(c => BigDecimal(c) * r6ln(c)).sum)
        .toDouble / n
      val (gn, gk, gh, gnorm) = got(u)
      assert(gn === n && gk === counts.length.toLong, s"user $u counts")
      assert(math.abs(gh - h) < 2e-4, s"user $u entropy")
      if (counts.length > 1)
        assert(math.abs(gnorm - h / math.log(counts.length.toDouble)) < 2e-4)
      else assert(gnorm === 0.0)
      assert(gh >= -1e-9 && gnorm <= 1.0 + 1e-6)
    }
  }

  test("q250 price elasticity: slope matches a bucketed log-log replay; negative demand curve") {
    val li = Tables(spark, sf0001, "lineitem")
      .select(($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long"),
        $"l_quantity".cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cmin = li.map(_._1).min; val cmax = li.map(_._1).max
    val pts = li.groupBy(x => (x._1 - cmin) * 16 / (cmax - cmin + 1))
      .map { case (_, g) =>
        val sc = g.map(_._1).sum; val n = g.size; val sq = g.map(_._2).sum
        (BigDecimal(math.log(sc.toDouble / n)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
          BigDecimal(math.log(sq.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      }.toSeq
    val k = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val want = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    val r = Stats.q250PriceElasticity(spark, sf0001).head()
    assert(r.getLong(0) === pts.length.toLong)
    assert(math.abs(r.getDouble(1) - want) < 2e-4, s"slope ${r.getDouble(1)} vs $want")
    assert(r.getDouble(3) >= -1e-9 && r.getDouble(3) <= 1.0 + 1e-9, "r2 out of range")
  }
  test("q251 nested roundtrip: exploded re-aggregate equals the flat relational truth") {
    val want = Tables(spark, sf0001, "orders")
      .join(Tables(spark, sf0001, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderstatus")
      .agg(countDistinct($"o_orderkey"), count(lit(1)),
        sum($"l_quantity".cast("long")),
        sum($"l_extendedprice".cast("decimal(18,4)")).cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        BigDecimal(r.getDouble(4)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
      .sortBy(_._1)
    val got = Extras.q251NestedRoundtrip(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        BigDecimal(r.getDouble(4)).setScale(4, BigDecimal.RoundingMode.HALF_UP))).toSeq
    assert(got === want.toSeq)
    val leftovers = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_q251_"))
    assert(leftovers.isEmpty, s"staging dirs leaked: ${leftovers.mkString(",")}")
  }

  test("q252 strict funnel: consecutive-triple detection matches a sequential scan") {
    val evs = Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", $"event_type", $"ts2".cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val perUser = evs.groupBy(_._1).flatMap { case (u, g) =>
      val seq0 = g.sortBy(e => (e._4, e._2))
      val hits = seq0.sliding(3).filter(w => w.length == 3 &&
        w(0)._3 == "view" && w(1)._3 == "click" && w(2)._3 == "purchase").toSeq
      if (hits.isEmpty) None
      else Some(u -> (hits.length.toLong, hits.map(_(2)._4).min))
    }
    val got = Events.q252StrictFunnel(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === perUser.keySet)
    perUser.foreach { case (u, (n, first)) =>
      val (gn, gf, gu) = got(u)
      assert(gn === n && gf === first, s"user $u")
      assert(gu === perUser.size.toLong)
    }
    assert(got.nonEmpty, "no strict conversion in the fixture - vacuous")
  }

  test("q287 reconciliation: header-vs-lines audit matches a sequential replay and is non-vacuous") {
    val lsums = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_extendedprice".cast("decimal(18,2)")).collect()
      .map(r => (r.getLong(0), r.getDecimal(1)))
      .groupBy(_._1).map { case (k, g) =>
        k -> g.map(x => BigDecimal(x._2)).sum
      }
    val hdrs = Tables(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice".cast("decimal(18,2)"))
      .collect().map(r => (r.getLong(0), r.getString(1), BigDecimal(r.getDecimal(2))))
    val want = hdrs.groupBy(_._2).map { case (st, g) =>
      val errs = g.flatMap(h => lsums.get(h._1).map(ls => (h._3 - ls).abs))
      st -> (g.length.toLong, errs.length.toLong,
        errs.count(_ <= BigDecimal("0.01")).toLong,
        errs.count(_ > BigDecimal("0.01")).toLong,
        if (errs.isEmpty) null else errs.max)
    }
    val got = Extras.q287Reconciliation(spark, sf0001).collect()
    assert(got.map(_.getString(0)).toSet === want.keySet)
    got.foreach { r =>
      val (no, nl, nm, nx, mx) = want(r.getString(0))
      assert(r.getLong(1) === no && r.getLong(2) === nl
        && r.getLong(3) === nm && r.getLong(4) === nx, s"status ${r.getString(0)}")
      if (mx != null)
        assert(math.abs(r.getDouble(5) - mx.toDouble) < 1e-9, s"max err ${r.getString(0)}")
    }
    // The synthetic headers are NOT derived from the lines — the audit must
    // honestly report mismatches, or the query is vacuous on this fixture.
    assert(got.map(_.getLong(4)).sum > 0, "no mismatches flagged - vacuous")
    assert(got.forall(r => r.getLong(3) + r.getLong(4) === r.getLong(2)),
      "matched + mismatched must partition the with-lines set")
  }

  test("q278 label propagation: labels match a 3-round synchronous replay; communities coarsen only within components") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pe = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val edges = pe ++ pe.map(p => (p._2, p._1))
    val nbrs = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lbl: Map[Long, Long] = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = nbrs.map { case (u, ns) =>
        val counts = ns.map(lbl).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        // mode with (count desc, label asc) total order
        u -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    val want = lbl.toSeq.sortBy(_._1)
    val got = Graph.q278LabelPropagation(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === want)
    // every final label is a node of the graph, and label propagation can
    // never join nodes across connected components
    val comp = {
      var c = nbrs.keys.map(n => n -> n).toMap
      var changed = true
      while (changed) {
        changed = false
        for ((u, ns) <- nbrs; v <- ns) {
          val m = math.min(c(u), c(v))
          if (c(u) != m || c(v) != m) { c = c + (u -> m) + (v -> m); changed = true }
        }
      }
      c
    }
    got.foreach { case (n, l) =>
      assert(nbrs.contains(l), s"label $l is not a graph node")
      assert(comp(n) === comp(l), s"node $n labeled across components")
    }
    assert(got.map(_._2).distinct.length < got.length,
      "LPA produced no merging at all - vacuous fixture")
  }

  test("q309 lexical diversity: type-token ratios replay and the adaptive threshold splits the corpus") {
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty).toSeq))
      .filter(_._3.nonEmpty)
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val ratios = docs.map { case (_, src, tk) =>
      (src, r6(tk.distinct.length.toDouble / tk.length)) }
    val mean = ratios.map(_._2).sum.toDouble / ratios.length
    val got = graft.operators.Text.queries("q309_lexical_diversity")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.map(_._2).sum === ratios.length.toLong)
    got.foreach { case (src, nd, nc, avg, thr) =>
      val g = ratios.filter(_._1 == src)
      assert(nd === g.length.toLong, s"$src doc count")
      assert(nc === g.count(_._2.toDouble < mean).toLong, s"$src templated count")
      assert(math.abs(avg - g.map(_._2).sum.toDouble / g.length) < 2e-6, s"$src avg")
      assert(math.abs(thr - mean) < 1e-4, s"$src threshold")
    }
    val totalFlagged = got.map(_._3).sum
    assert(totalFlagged > 0 && totalFlagged < ratios.length,
      "adaptive threshold must split the corpus (non-vacuous)")
  }

  test("q304 hits: two scaled-integer rounds replay exactly; tops are normalized") {
    val edges = Tables(spark, sf0001, "orders")
      .join(Tables(spark, sf0001, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey", $"l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet.toSeq
    var h = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      val a0 = edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => h(e._1)).sum }
      val am = a0.values.max
      a = a0.map { case (p, v) => p -> v * 1000000L / am }
      val h0 = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => a(e._2)).sum }
      val hm = h0.values.max
      h = h0.map { case (c, v) => c -> v * 1000000L / hm }
    }
    val wantA = a.toSeq.sortBy(t => (-t._2, t._1)).take(15)
    val wantH = h.toSeq.sortBy(t => (-t._2, t._1)).take(15)
    val got = Graph.q304Hits(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 30)
    assert(got.filter(_._1 == "authority").map(t => (t._2, t._3)).toSeq === wantA)
    assert(got.filter(_._1 == "hub").map(t => (t._2, t._3)).toSeq === wantH)
    // both sides carry their normalization witness: the argmax sits at 10^6
    assert(got.filter(_._1 == "authority").map(_._3).max === 1000000L)
    assert(got.filter(_._1 == "hub").map(_._3).max === 1000000L)
  }

  test("q305 v-optimal: exhaustive replay agrees on boundaries and per-segment SSE") {
    val vs = Tables.events(spark, sf0001).select($"value").collect()
      .map(_.getDouble(0))
    val lo = vs.min; val hi = vs.max
    def d4(x: Double) = BigDecimal.valueOf(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val binned = vs.groupBy(v => math.min(19L,
        math.floor((v - lo) / (hi - lo) * 20.0).toLong))
      .map { case (b, g) =>
        (b, g.length.toLong, g.map(d4).sum, g.map(v => d4(v) * d4(v)).sum) }
      .toSeq.sortBy(_._1)
    val bins = binned.map(_._1)
    val cn = binned.map(_._2).scanLeft(0L)(_ + _).drop(1)
    val cs1 = binned.map(_._3).scanLeft(BigDecimal(0))(_ + _).drop(1)
    val cs2 = binned.map(_._4).scanLeft(BigDecimal(0))(_ + _).drop(1)
    val m = bins.length
    def sse(n: Long, s1: Double, s2: Double) = s2 - s1 * s1 / n
    def segs(i: Int, j: Int, k: Int): Seq[(Long, Long, Double)] = Seq(
      (bins(i), cn(i), sse(cn(i), cs1(i).toDouble, cs2(i).toDouble)),
      (bins(j), cn(j) - cn(i), sse(cn(j) - cn(i), (cs1(j) - cs1(i)).toDouble,
        (cs2(j) - cs2(i)).toDouble)),
      (bins(k), cn(k) - cn(j), sse(cn(k) - cn(j), (cs1(k) - cs1(j)).toDouble,
        (cs2(k) - cs2(j)).toDouble)),
      (bins(m - 1), cn(m - 1) - cn(k), sse(cn(m - 1) - cn(k),
        (cs1(m - 1) - cs1(k)).toDouble, (cs2(m - 1) - cs2(k)).toDouble)))
    val best = (for {
      i <- 0 until m; j <- (i + 1) until m; k <- (j + 1) until m - 1
    } yield ((i, j, k), segs(i, j, k).map(_._3).sum))
      .minBy { case ((i, j, k), s) => (s, bins(i), bins(j), bins(k)) }
    val want = segs(best._1._1, best._1._2, best._1._3)
    val got = Stats.q305VoptimalHistogram(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 4)
    got.zip(want).foreach { case ((gb, gn, gs), (wb, wn, ws)) =>
      assert(gb === wb && gn === wn, s"segment bounds/counts: $got vs $want")
      assert(math.abs(gs - ws) < 1e-3, s"sse $gs vs $ws")
    }
    assert(want.map(_._3).sum > 0, "zero total SSE - vacuous")
  }

  test("q306 target encoding: shrinkage arithmetic replays; encoding sits between raw and prior") {
    val rows = Tables(spark, sf0001, "orders")
      .select($"o_orderpriority", ($"o_orderstatus" === "F").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val prior = rows.map(_._2).sum.toDouble / rows.length
    val got = Stats.q306TargetEncoding(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.map(_._1).toSeq === rows.map(_._1).distinct.sorted)
    got.foreach { case (pri, n, k, raw, enc) =>
      val g = rows.filter(_._1 == pri)
      assert(n === g.length.toLong && k === g.map(_._2).sum)
      assert(math.abs(raw - k.toDouble / n) < 2e-6)
      assert(math.abs(enc - (k + 50.0 * prior) / (n + 50.0)) < 2e-6)
      val (a, b) = (math.min(raw, prior), math.max(raw, prior))
      assert(enc >= a - 1e-9 && enc <= b + 1e-9,
        s"$pri encoding must sit between raw and prior")
    }
  }

  test("q290 ema: signal counts match a weighted-window replay with the exact embedded weights") {
    val rows = Tables(spark, sf0001, "lineitem")
      .join(Tables(spark, sf0001, "part"), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_extendedprice".cast("double"),
        unix_timestamp($"l_shipdate".cast("timestamp")), $"l_orderkey",
        $"l_linenumber".cast("long"), $"p_brand")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    val w = Events.emaWeights
    val wsum = Events.emaWeightSum
    val byBrand = collection.mutable.Map.empty[String, (Long, Long)]
    rows.groupBy(_._1).foreach { case (_, g) =>
      val series = g.sortBy(t => (t._3, t._4, t._5))
      for (i <- series.indices if i >= 19) {
        // same left-associated IEEE sum as the plan's reduce(_ + _)
        val terms = (0 until 20).map(j => series(i - j)._2 * w(j))
        val ema = terms.reduce(_ + _) / wsum
        val sig = if (series(i)._2 > ema * 1.02) 1L else 0L
        val br = series(i)._6
        val (n, s) = byBrand.getOrElse(br, (0L, 0L))
        byBrand(br) = (n + 1, s + sig)
      }
    }
    val got = Events.q290EmaSignal(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === byBrand.keySet)
    assert(byBrand.values.map(_._1).sum > 0, "no evaluated rows - vacuous")
    byBrand.foreach { case (br, (n, s)) =>
      val (gn, gs, gr) = got(br)
      assert(gn === n && gs === s, s"brand $br counts: got ($gn,$gs) want ($n,$s)")
      assert(math.abs(gr - s.toDouble / n) < 2e-6, s"brand $br rate")
    }
  }

  test("q321 trend break: signal counts match an exact-OLS extrapolation replay") {
    val rows = Tables(spark, sf0001, "lineitem")
      .join(Tables(spark, sf0001, "part"), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_extendedprice".cast("double"),
        unix_timestamp($"l_shipdate".cast("timestamp")), $"l_orderkey",
        $"l_linenumber".cast("long"), $"p_brand")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    val byBrand = collection.mutable.Map.empty[String, (Long, Long)]
    rows.groupBy(_._1).foreach { case (_, g) =>
      val series = g.sortBy(t => (t._3, t._4, t._5))
      for (i <- series.indices if i >= 20) {
        // identical left-associated trees to the plan's reduce(_ + _)
        val sy = (1 to 20).map(j => series(i - j)._2).reduce(_ + _)
        val sxy = (1 until 20).map(k => series(i - 1 - k)._2 * -k.toDouble)
          .reduce(_ + _)
        val b = (20.0 * sxy + 190.0 * sy) / 13300.0
        val f = (sy + 190.0 * b) / 20.0 + b
        val px = series(i)._2
        val sig = if (px > f * 1.02 || px < f * 0.98) 1L else 0L
        val br = series(i)._6
        val (n, s) = byBrand.getOrElse(br, (0L, 0L))
        byBrand(br) = (n + 1, s + sig)
      }
    }
    val got = Events.q321TrendBreak(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === byBrand.keySet)
    assert(byBrand.values.map(_._2).sum > 0, "no trend break anywhere - vacuous")
    assert(byBrand.values.exists(t => t._2 < t._1),
      "every row breaks trend - thresholds vacuous")
    byBrand.foreach { case (br, (n, s)) =>
      val (gn, gs, gr) = got(br)
      assert(gn === n && gs === s, s"brand $br counts: got ($gn,$gs) want ($n,$s)")
      assert(math.abs(gr - s.toDouble / n) < 2e-6, s"brand $br rate")
    }
  }

  test("q322 link prediction: jaccard scores match a brute-force capped-subgraph replay") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size).toMap
    val edges = pairCounts.filter(_._2 >= 2).keySet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size).toMap
    val e2 = edges.filter(e => deg(e._1) <= 64 && deg(e._2) <= 64)
    val adj = e2.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cand = collection.mutable.Map.empty[(Long, Long), Long]
    adj.foreach { case (_, ns) =>
      for (p1 <- ns; p2 <- ns if p1 < p2)
        cand((p1, p2)) = cand.getOrElse((p1, p2), 0L) + 1
    }
    val nonAdj = cand.filterNot { case ((a, b), _) => e2.contains((a, b)) }
    def row(p: ((Long, Long), Long)) = {
      val ((p1, p2), cn) = p
      val u = adj(p1).size + adj(p2).size - cn
      val jac = BigDecimal(cn.toDouble / u)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (p1, p2, cn, u.toLong, jac)
    }
    val want = nonAdj.toSeq.map(row)
      .sortBy { case (p1, p2, cn, _, j) => (-j, -cn, p1, p2) }.take(20)
    val got = Graph.q322LinkPrediction(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === want)
    assert(want.nonEmpty && want.head._5 > 0, "no predicted link — vacuous")
  }

  test("q462 rich club: phi matches a brute-force high-degree subgraph replay") {
    val li = graft.Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).distinct.toSeq).toSeq
    val edges = byOrder.flatMap(ps =>
      for (a <- ps; b <- ps if a != b) yield (a, b)).toSet
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = Graph.q462RichClub(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val k = r.getLong(1)
      val hi = deg.filter(_._2 > k).keySet
      val e = edges.count(p => hi(p._1) && hi(p._2)).toLong
      assert(r.getLong(2) == hi.size, s"pct ${r.getLong(0)} nodes")
      assert(r.getLong(3) == e, s"pct ${r.getLong(0)} edges")
      val phi = e.toDouble / (hi.size.toDouble * (hi.size - 1))
      assert(math.abs(r.getDouble(4) - phi) < 1e-6)
    }
    // density should not decrease from the 50th to the 90th percentile club
    // in a co-purchase graph with hubs; weak monotonic sanity: phi > 0
    assert(got.forall(_.getDouble(4) > 0))
  }

  test("q463 JaroWinkler expression: hand-checked pairs and DuckDB-variant semantics") {
    import graft.functions.JaroWinkler
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      JaroWinkler(Literal(a), Literal(b))
        .similarity(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    // the DuckDB/rapidfuzz threshold variant: NO prefix boost at jaro <= 0.7
    val low = jw("abcdzzzzzzzzzz", "abcdqqqqqqqqq")
    assert(math.abs(low - 0.5311355311355311) < 1e-12,
      s"below-threshold prefix must not boost: $low")
    // symmetric
    assert(jw("CRATE", "TRACE") == jw("TRACE", "CRATE"))
    // the query returns a full deterministic top-20 at sf0.001
    val got = Text.q463JaroWinklerPairs(spark, sf0001).collect()
    assert(got.length == 20)
    assert(got.forall(_.getDouble(2) >= 0.94))
    val ord = got.map(r => (-r.getDouble(2), r.getLong(0), r.getLong(1))).toSeq
    assert(ord == ord.sorted, "output must be (jw desc, k1, k2) ordered")
  }

  test("q510 multibyte JW: byte-walk equals DuckDB's recorded values") {
    // DuckDB's jaro_winkler_similarity walks UTF-8 BYTES (not codepoints)
    // — same as the expression. Values below recorded from DuckDB at pin
    // time; the q510 oracle re-checks them cross-engine every round. The
    // codepoint-walk values (in comments) differ, proving the battery
    // discriminates the two semantics.
    import graft.functions.JaroWinkler
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      JaroWinkler(Literal(a), Literal(b))
        .similarity(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(math.abs(jw("Иванов", "Иванова") - 0.971429) < 5e-7)
    assert(math.abs(jw("Пётр", "Петр") - 0.822222) < 5e-7)     // codepoint: 0.85
    assert(math.abs(jw("müller", "mueller") - 0.828571) < 5e-7) // codepoint: 0.804
    assert(math.abs(jw("山田太郎", "山田花子") - 0.833333) < 5e-7) // codepoint: 0.667
    assert(math.abs(jw("こんにちは", "こんばんは") - 0.903333) < 5e-7)
    assert(jw("ABC", "АВС") == 0.0) // Latin/Cyrillic confusables share no bytes
    assert(math.abs(jw("😀😁😂", "😀😂😁") - 0.983333) < 5e-7) // codepoint: 0.556
    assert(math.abs(jw("café", "cafe") - 0.848333) < 5e-7)
  }

  test("q511 NfcNormalize: composition, reordering, identity fast path") {
    import graft.functions.NfcNormalize
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    def nfc(s: String): String =
      NfcNormalize(Literal(s)).normalize(UTF8String.fromString(s)).toString
    assert(nfc("cafe\u0301") === "caf\u00E9", "combining acute must compose")
    assert(nfc("\u212B") === "\u00C5", "ANGSTROM SIGN singleton must map to \u00C5")
    assert(nfc("\u30AB\u3099") === "\u30AC", "voiced kana must compose")
    assert(nfc("q\u0307\u0323") === "q\u0323\u0307",
      "combining marks must canonically reorder (ccc 220 before 230)")
    assert(nfc("\uFB01le") === "\uFB01le", "NFC keeps compat ligatures (NFKC folds)")
    // ASCII fast path returns the SAME UTF8String instance (no copy)
    val ascii = UTF8String.fromString("plain ascii")
    assert(NfcNormalize(Literal("x")).normalize(ascii) eq ascii)
  }

  test("q518 NormalizeForMatch: NFKC+casefold battery, idempotency, ASCII fast path") {
    import graft.functions.NormalizeForMatch
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    def nfm(s: String): String =
      NormalizeForMatch(Literal(s)).normalize(UTF8String.fromString(s)).toString
    // compatibility folding (NFKC rung — invisible to NFC)
    assert(nfm("ﬁle") === "file", "fi ligature must fold")
    assert(nfm("ℕ²") === "n2", "double-struck N + superscript 2")
    assert(nfm("①②③") === "123", "circled digits")
    assert(nfm("㎞") === "km", "unit glyph km")
    assert(nfm("Ⅻ") === "xii", "roman numeral XII folds then cases")
    assert(nfm("ﾊﾟｰｾﾝﾄ") === "パーセント",
      "halfwidth katakana composes to fullwidth")
    assert(nfm("ＦＵＬＬ") === "full", "fullwidth Latin")
    // case folding rung (upper-then-lower round trip)
    assert(nfm("STRASSE") === "strasse")
    assert(nfm("straße") === "strasse", "sharp-s reaches ss via upper")
    assert(nfm("ΜΑΣ") === nfm("μασ"), "final/medial sigma must agree")
    assert(nfm("caf\u00E9") === nfm("cafe\u0301"), "canonical twins still agree")
    assert(nfm("㎛") === nfm("µm"), "micro-sign unit glyph = mu m")
    // idempotency: one more application is identity (spec-pinned contract)
    for (x <- Seq("ﬁle", "STRASSE", "straße", "ΜΑΣ", "İstanbul",
        "㎛", "ＦＵＬＬ", "mixed ﬃx ①"))
      assert(nfm(nfm(x)) === nfm(x), s"not idempotent on ${x}")
    // ASCII fast path: already-lowercase ASCII returns the SAME instance
    val ascii = UTF8String.fromString("plain ascii 123")
    assert(NormalizeForMatch(Literal("x")).normalize(ascii) eq ascii)
    assert(nfm("MiXeD Ascii") === "mixed ascii")
  }

  test("q518 match-norm dedup: brute-force replay at sf0.001") {
    import graft.functions.{NfcNormalize, NormalizeForMatch}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    def nfc(s: String): String =
      NfcNormalize(Literal(s)).normalize(UTF8String.fromString(s)).toString
    def nfm(s: String): String =
      NormalizeForMatch(Literal(s)).normalize(UTF8String.fromString(s)).toString
    val battery = Seq("office ﬁle pack", "office file pack",
      "STRASSE 12 BERLIN", "straße 12 berlin",
      "route ㎛ marker", "route µm marker",
      "ＦＵＬＬ width text", "full width text",
      "cafe\u0301 menu deux", "caf\u00E9 menu deux",
      "shared raw copy", "shared raw copy")
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq ++ battery
    def dup(key: String => String): Long =
      texts.groupBy(key).valuesIterator.map(_.size).filter(_ > 1).map(_.toLong).sum
    val (raw, nf, mt) = (dup(identity), dup(nfc), dup(nfm))
    val r = Text.q518MatchNormDedup(spark, sf0001).collect().head
    assert(r.getLong(0) === texts.size.toLong, "n_docs")
    assert(r.getLong(1) === raw, "raw_dup_docs")
    assert(r.getLong(2) === nf, "nfc_dup_docs")
    assert(r.getLong(3) === mt, "match_dup_docs")
    assert(r.getLong(4) === nf - raw, "nfc_only_dup_docs")
    assert(r.getLong(5) === mt - nf, "match_only_dup_docs")
    // the ladder is monotone and the battery makes every rung visible:
    // raw pair (2 docs), nfc adds the canonical twins, match adds the
    // four compat/case pairs (8 docs) the rungs below cannot see
    assert(raw >= 2 && nf >= raw + 2 && mt >= nf + 8,
      s"ladder degenerate: raw=$raw nfc=$nf match=$mt")
  }

  test("case folding: Spark/Java vs DuckDB divergence pinned (excluded from oracles)") {
    // upper/lower CANNOT join the multibyte oracle batteries: recorded
    // DuckDB (utf8proc) values at pin time: upper('ß') = 'ẞ' (U+1E9E,
    // capital sharp s) and lower('İstanbul') = 'istanbul' (dot dropped),
    // while Java/Spark expand 'ß' -> 'SS' and lower 'İ' -> 'i' + combining
    // dot (U+0307). Equal on ASCII; divergent on these multibyte cases —
    // any future case-insensitive multilingual op needs a shared folding
    // expression first (the q510/levenshtein lesson).
    import org.apache.spark.sql.functions.{lower, upper, lit}
    import spark.implicits._
    def f(c: org.apache.spark.sql.Column): String =
      Seq(1).toDF("x").select(c).collect().head.getString(0)
    assert(f(upper(lit("ß"))) === "SS")            // DuckDB: ẞ
    assert(f(lower(lit("\u0130stanbul"))) === "i\u0307stanbul") // DuckDB: istanbul
    assert(f(upper(lit("ascii"))) === "ASCII")          // ASCII: engines agree
  }

  test("q258/q262 levenshtein: Spark codepoint vs DuckDB byte divergence pinned") {
    // Spark's levenshtein counts CODEPOINT edits; DuckDB's counts BYTE
    // edits. Equal on ASCII — the q258/q262/q272 oracle corpus (part/
    // customer names) — divergent on multibyte: recorded DuckDB values at
    // pin time: levenshtein('é','e') = 2 (bytes), ('Иванов','Иванова') =
    // 2, ('山田太郎','山田花子') = 6. The byte-based path now EXISTS:
    // graft.functions.ByteLevenshtein (q517's oracle-checked scorer, test
    // above) — multibyte input to the edit-distance family goes through
    // it; Spark's builtin stays codepoint-only and ASCII-oracle-only.
    import org.apache.spark.sql.functions.{levenshtein, lit}
    import spark.implicits._
    def lev(a: String, b: String): Int =
      Seq(1).toDF("x").select(levenshtein(lit(a), lit(b))).collect().head.getInt(0)
    assert(lev("é", "e") === 1, "Spark levenshtein must count codepoints")
    assert(lev("Иванов", "Иванова") === 1) // DuckDB: 2 (UTF-8 bytes)
    assert(lev("山田太郎", "山田花子") === 2) // DuckDB: 6
    assert(lev("kitten", "sitting") === 3) // ASCII: engines agree
  }

  test("q512/q513 oracle precondition: documents corpus is ASCII-only (script tables agree)") {
    // The script counters (q512/q513 and streaming twins q514/q515) run
    // over the REAL documents table, so their oracle equality rests on
    // Java's \p{IsLatin}/\p{IsCyrillic} tables agreeing with DuckDB
    // RE2's \p{Latin}/\p{Cyrillic} for every corpus codepoint — JRE vs
    // utf8proc/RE2 Unicode-version skew on edge codepoints would flake
    // the oracle (r13 ADVICE). This pin makes the precondition explicit
    // (the StatsSpec 2^53-band pattern): at the oracle scales the corpus
    // is pure ASCII, where both script databases agree by construction
    // and can never drift. The deliberately-multibyte cases live in the
    // CURATED battery sources (scriptBattery/homoglyphBattery), whose
    // every codepoint is individually oracle-pinned. If multilingual text
    // ever enters the fixtures this fails loudly — the fix then is to
    // extend the pin to a known-agreement codepoint allowlist, not to
    // delete it.
    import org.apache.spark.sql.functions.{col, max, length, octet_length}
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val nonAscii = spark.read.parquet(s"$sf/documents.parquet")
        .where(octet_length(col("text")) =!= length(col("text")) ||
          col("text").rlike("[^\\x00-\\x7F]"))
        .count()
      assert(nonAscii === 0L,
        s"$sf/documents has $nonAscii non-ASCII rows — q512/q513 oracle " +
          "needs a script-table agreement audit before extending past ASCII")
    }
  }

  test("q517 ByteLevenshtein: byte-walk equals DuckDB's recorded values") {
    // DuckDB's levenshtein walks UTF-8 BYTES (pinned in the q258/q262
    // divergence test below); this expression is that semantic. Values
    // recorded from DuckDB 14-case battery at pin time; the q517 oracle
    // re-checks the equivalence cross-engine every round.
    import graft.functions.ByteLevenshtein
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    def lev(a: String, b: String): Int =
      ByteLevenshtein(Literal(a), Literal(b))
        .distance(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(lev("é", "e") === 2)                 // Spark builtin: 1
    assert(lev("Иванов", "Иванова") === 2)      // Spark builtin: 1
    assert(lev("山田太郎", "山田花子") === 6)     // Spark builtin: 2
    assert(lev("kitten", "sitting") === 3)      // ASCII: engines agree
    assert(lev("Пётр", "Петр") === 2)
    assert(lev("müller", "mueller") === 2)
    assert(lev("こんにちは", "こんばんは") === 3)
    assert(lev("😀😁😂", "😀😂😁") === 2)
    assert(lev("café", "cafe") === 2)
    assert(lev("", "") === 0)
    assert(lev("", "abc") === 3)
    assert(lev("abc", "") === 3)
    assert(lev("ABC", "АВС") === 6)             // confusables share no bytes
    assert(lev("straße", "strasse") === 2)
    assert(lev("ёлка", "елка") === 2)
  }

  test("q517 multibyte fuzzy join: exactly the battery pairs, brute-force replay") {
    import graft.functions.ByteLevenshtein
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val batt = Text.multibyteBattery(spark).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    def head40(t: String): String = t.codePoints().toArray.take(40)
      .foldLeft(new java.lang.StringBuilder)((sb, cp) => sb.appendCodePoint(cp))
      .toString
    def tok(t: String, i: Int): String = { val p = t.split(" ", -1); if (p.length > i) p(i) else "" }
    def bytes(x: String): Int = x.getBytes("UTF-8").length
    val expect = (for {
      (ka, ta) <- batt; (kb, tb) <- batt
      if ka < kb && tok(ta, 0) == tok(tb, 0) && tok(ta, 1) == tok(tb, 1)
      na = head40(ta); nb = head40(tb)
      if bytes(na) != na.codePointCount(0, na.length) ||
        bytes(nb) != nb.codePointCount(0, nb.length)
      d = ByteLevenshtein(Literal(na), Literal(nb))
        .distance(UTF8String.fromString(na), UTF8String.fromString(nb))
      mxl = math.max(bytes(na), bytes(nb))
      sim = BigDecimal(1.0 - d.toDouble / mxl)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    } yield (ka, kb, d.toLong, sim))
      .sortBy { case (k1, k2, d, _) => (d, k1, k2) }.take(20)
    assert(expect.size === 12, s"battery must yield 12 suspect pairs, got ${expect.size}")
    val got = Text.q517MultibyteFuzzyJoin(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // the ASCII corpus must contribute ZERO suspect pairs (its purity is
    // pinned above) — the audit rows are exactly the battery's
    assert(got === expect, s"q517 mismatch:\n got=$got\n want=$expect")
  }

  test("q519 token budget: brute-force replay at sf0.001") {
    val battery = Text.tokenBudgetBattery(spark).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ++ battery
    val cjkPat = java.util.regex.Pattern
      .compile("[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}]")
    def cjk(t: String): Long = {
      val m = cjkPat.matcher(t); var c = 0L; while (m.find()) c += 1; c
    }
    val expect = docs.groupBy(_._1).map { case (src, rows) =>
      val wt = rows.map(_._2.split(" ").count(_.nonEmpty).toLong).sum
      val cc = rows.map(r => cjk(r._2)).sum
      val nb = rows.map(_._2.getBytes("UTF-8").length.toLong).sum
      val est = wt + cc
      (src, rows.size.toLong, wt, cc, nb, est,
        BigDecimal(nb.toDouble / est.toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = Text.q519TokenBudget(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got === expect, s"q519 mismatch:\n got=$got\n want=$expect")
    // the battery must make the CJK counter non-degenerate
    assert(expect.find(_._1 == "_battery").exists(_._4 >= 20),
      "battery must contribute >=20 CJK codepoints")
  }

  test("q520 confusable skeleton: brute-force replay at sf0.001") {
    val battery = Text.confusableBattery(spark).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ++ battery
    val skelMap = Text.ConfusablesCyr.zip(Text.ConfusablesLat).toMap
    def skel(t: String): String = t.map(c => skelMap.getOrElse(c, c))
    val cyr = java.util.regex.Pattern.compile("\\p{IsCyrillic}")
    val latOnly = java.util.regex.Pattern.compile("^[A-Za-z]+$")
    val toks = docs.flatMap { case (s, t) =>
      t.split(" ").filter(_.nonEmpty).map(tok => (s, tok)) }
    val vocab = toks.map(_._2).filter(t => latOnly.matcher(t).matches()).toSet
    val expect = toks.groupBy(_._1).map { case (src, rows) =>
      val masq = rows.map(_._2).filter(t =>
        cyr.matcher(t).find() && latOnly.matcher(skel(t)).matches())
      val spoofs = masq.filter(t => vocab(skel(t)))
      (src, rows.size.toLong, masq.size.toLong, spoofs.size.toLong,
        if (spoofs.isEmpty) null
        else spoofs.map(t => t + "=>" + skel(t)).min)
    }.toSeq.sortBy(_._1)
    val got = Text.q520ConfusableSkeleton(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getString(4))).toSeq
    assert(got === expect, s"q520 mismatch:\n got=$got\n want=$expect")
    // the battery must light every rung: masquerading tokens exist, some
    // with vocabulary hits (confirmed spoofs), and real Russian stays out
    val b = expect.find(_._1 == "_battery").get
    assert(b._3 >= 5 && b._4 >= 4 && b._3 > b._4,
      s"battery rungs degenerate: masq=${b._3} vocab_hits=${b._4}")
  }

  test("q522 NFC dedup resolution: brute-force replay at sf0.001") {
    val battery = Text.nfcDedupBattery(spark).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ++ battery
    def nfc(s: String): String =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val expect = docs.groupBy(r => nfc(r._2)).values.flatMap { grp =>
      val survivor = grp.minBy(_._1)
      grp.filter(_._1 != survivor._1).map { r =>
        (r._1, survivor._1, if (r._2 == survivor._2) "exact" else "canonical")
      }
    }.toSeq.sortBy(_._1)
    val got = Text.q522NfcDedupResolve(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got === expect, s"q522 mismatch:\n got=$got\n want=$expect")
    // battery guarantees both kinds appear
    assert(expect.count(_._3 == "canonical") >= 2 &&
      expect.count(_._3 == "exact") >= 1, s"kinds degenerate: $expect")
  }

  test("q523 lang/script consistency: brute-force replay at sf0.001") {
    val battery = Text.langScriptBattery(spark).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ++ battery
    def has(t: String, pat: String): Boolean =
      java.util.regex.Pattern.compile(pat).matcher(t).find()
    def ok(lang: String, t: String): Boolean = lang match {
      case "en" | "es" | "de" | "fr" => has(t, "\\p{IsLatin}")
      case "zh" => has(t, "\\p{IsHan}")
      case "ru" => has(t, "\\p{IsCyrillic}")
      case "ja" => has(t, "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}]")
      case _ => true
    }
    val expect = docs.groupBy(_._2).map { case (lang, rows) =>
      val bad = rows.filterNot(r => ok(lang, r._3))
      (lang, rows.size.toLong, bad.size.toLong,
        if (bad.isEmpty) null else java.lang.Long.valueOf(bad.map(_._1).min),
        BigDecimal(bad.size.toDouble / rows.size.toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = Text.q523LangScriptConsistency(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3)),
        r.getDouble(4))).toSeq
    assert(got === expect, s"q523 mismatch:\n got=$got\n want=$expect")
    // corpus zh rows are romanized ASCII — the audit must see them ALL
    val zh = expect.find(_._1 == "zh").get
    assert(zh._3 == zh._2 - 1 && zh._3 >= 1,
      s"zh rung degenerate: $zh (only the battery positive is consistent)")
  }

  test("q463 on near-unique names: degenerate self-pairs must not clip real tiers") {
    // Regression: >=40 distinct cnt=1 names put >=40 jw=1.0 self-pair rows
    // in the top rank tier; each expands to ZERO key pairs, so the old
    // rank()<=40 cut discarded every real 0.94<=jw<1.0 tier and returned
    // empty. The fix drops na==nb rows with cnt<2 before ranking.
    import graft.functions.JaroWinkler
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val names = (0 until 45).map(i => f"block name variant $i%03d")
    val rows = names.zipWithIndex.map { case (nm, i) => (i.toLong + 1, nm) }
    val tmp = java.nio.file.Files.createTempDirectory("q463nu")
    try {
      import spark.implicits._
      rows.toDF("p_partkey", "p_name").repartition(1)
        .write.mode("overwrite").parquet(s"$tmp/part.parquet")
      def jw6(a: String, b: String): Double = {
        val raw = JaroWinkler(Literal(a), Literal(b))
          .similarity(UTF8String.fromString(a), UTF8String.fromString(b))
        BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val expect = (for {
        (ka, na) <- rows; (kb, nb) <- rows if ka < kb
        j = jw6(na, nb) if j >= 0.94
      } yield (ka, kb, j))
        .sortBy { case (k1, k2, j) => (-j, k1, k2) }.take(20)
      assert(expect.size == 20, s"test corpus must yield >=20 near-dup pairs, got ${expect.size}")
      val got = Text.q463JaroWinklerPairs(spark, tmp.toString).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == expect, s"near-unique top-20 mismatch:\n got=$got\n want=$expect")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("q491 UMass coherence: matches a doc-cooccurrence replay incl zero pairs") {
    val docs = graft.Tables(spark, sf0001, "documents")
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ").filter(_.nonEmpty).toSet))
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val got = Text.q491UmassCoherence(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      val src = row.getString(0)
      val mine = docs.filter(_._1 == src)
      val df = mine.flatMap(_._3).groupBy(identity).view.mapValues(_.size).toMap
      val top = df.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
      val pairs = for {
        ((wi, _), i) <- top.zipWithIndex
        ((wj, dj), j) <- top.zipWithIndex
        if i < j
      } yield (wi, wj, dj)
      assert(row.getLong(1) == pairs.size.toLong, s"n_pairs($src)")
      val c = pairs.map { case (wi, wj, dj) =>
        val dij = mine.count(d => d._3(wi) && d._3(wj))
        r(math.log((dij + 1.0) / dj), 8)
      }.sum
      assert(row.getDouble(2) == r(c.toDouble, 6).toDouble, s"coherence($src)")
    }
  }

  test("q488 Kneser-Ney: perplexity matches a bigram-count replay") {
    val docs = graft.Tables(spark, sf0001, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val bgOcc = docs.flatMap { case (src, ts) =>
      ts.sliding(2).filter(_.length == 2).map(p => (src, p(0), p(1)))
    }
    val cvw = bgOcc.groupBy(t => (t._2, t._3)).view.mapValues(_.length.toLong).toMap
    val cv = bgOcc.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n1v = cvw.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1w = cvw.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val bb = cvw.size.toLong
    def r8(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val got = Text.q488KneserNey(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val src = r.getString(0)
      val mine = bgOcc.filter(_._1 == src)
      assert(r.getLong(1) == mine.length.toLong, s"n_bigrams($src)")
      val bySrc = mine.groupBy(t => (t._2, t._3)).view.mapValues(_.length.toLong)
      val lsum = bySrc.toSeq.map { case ((v, w), cs) =>
        val p = (cvw((v, w)) - 0.75) / cv(v) +
          0.75 * n1v(v) / cv(v) * (n1w(w).toDouble / bb)
        r8(math.log(p)) * BigDecimal(cs)
      }.sum
      val ce = lsum.toDouble * -1.0 / mine.length
      assert(math.abs(r.getDouble(2) - ce) < 1e-5, s"cross_entropy($src)")
      assert(math.abs(r.getDouble(3) - math.exp(ce)) < 1e-2, s"perplexity($src)")
    }
  }

  test("q489 SRP distortion: sketch bits and distortion match a replay") {
    val embs = graft.Tables(spark, sf0001, "embeddings")
      .filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def quant(e: Array[Double]): Array[Long] =
      e.map(x => BigDecimal(x * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    def sign(p: Int, j: Int): Long =
      if (((p * 64L + j + 1L) * 2654435761L) % 1000003L % 2L == 0L) 1L else -1L
    def bits(eq: Array[Long]): Array[Long] =
      (0 until 63).map { p =>
        val dot = (0 until 64).map(j => eq(j) * sign(p, j)).sum
        if (dot >= 0L) 1L else 0L
      }.toArray
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def rd(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sk = embs.map { case (id, e) => (id, e, bits(quant(e))) }
    val dists = (for {
      (ia, ea, ba) <- sk; (ib, eb, bb2) <- sk if ia < ib
    } yield {
      val h = ba.zip(bb2).count { case (x, y) => x != y }
      rd(math.abs(rd(math.cos(math.Pi * h / 63.0), 8) - rd(cosine(ea, eb), 6)), 6)
    }).sorted
    val want = (dists.length.toLong,
      rd(dists.map(BigDecimal(_)).sum.toDouble / dists.length, 6),
      dists(math.ceil(0.9 * dists.length).toInt - 1),
      dists.last)
    val got = Similarity.q489SrpDistortion(spark, sf0001).collect()
    assert(got.length == 1)
    val g = (got(0).getLong(0), got(0).getDouble(1), got(0).getDouble(2),
      got(0).getDouble(3))
    assert(g == want, s"SRP distortion mismatch: got=$g want=$want")
  }

  test("q464 lexical richness: identities vs a token-frequency replay") {
    val tf = graft.Tables(spark, sf0001, "documents")
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bySrc = tf.groupBy(_._1._1)
    val got = Text.q464YulesK(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val fs = bySrc(r.getString(0)).values
      val n = fs.sum.toDouble
      val s2 = fs.map(f => f.toDouble * f).sum
      assert(r.getLong(1) == n.toLong, "n_tokens")
      assert(r.getLong(2) == fs.size.toLong, "v_types")
      assert(math.abs(r.getDouble(3) - 1e4 * (s2 - n) / (n * n)) < 1e-3, "K")
      assert(math.abs(r.getDouble(4) - (s2 - n) / (n * (n - 1))) < 1e-5, "D")
      assert(math.abs(r.getDouble(5) - math.log(fs.size) / math.log(n)) < 1e-5, "C")
    }
  }

  test("q471/q472/q473: entropy bounds, composition identities, knee replay") {
    // q471: H in [0, ln K]; peak period is q367's argmax
    val pows = Events.q367Periodogram(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val got471 = Events.q471SpectralEntropy(spark, sf0001).collect()
    assert(got471.nonEmpty)
    got471.foreach { r =>
      val k = r.getLong(1).toDouble
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= math.log(k) + 1e-9)
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1.0 + 1e-9)
      val mine = pows.filter(_._1 == r.getString(0))
      val want = mine.minBy(p => (-p._3, p._2))._2
      assert(r.getLong(2) == want, s"${r.getString(0)} peak")
    }
    // q472: H <= ln(states); perplexity = exp(H); H matches a replay from
    // the collected transition counts + the q371 stationary weights
    val pi = Events.q371MarkovStationary(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts2").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).values.flatMap { g =>
      g.sortBy(e => (e._4, e._2)).sliding(2).collect {
        case Array(a, b) => (a._3, b._3)
      }
    }.toSeq
    val byPrev = trans.groupBy(_._1)
    val wantH = byPrev.toSeq.flatMap { case (p, ts) =>
      val tot = ts.length.toDouble
      ts.groupBy(_._2).values.map { g =>
        pi(p) / 1.0e6 * (g.length / tot) * math.log(tot / g.length)
      }
    }.sum
    val r472 = Events.q472MarkovEntropyRate(spark, sf0001).collect().head
    assert(math.abs(r472.getDouble(3) - wantH) < 1e-3,
      s"H ${r472.getDouble(3)} vs $wantH")
    assert(math.abs(r472.getDouble(4) - math.exp(r472.getDouble(3))) < 1e-3)
    assert(r472.getLong(2) == trans.length, "transition count")
    // q473: knee maximizes share(r) - r/K on the collected curve
    val curve = graft.Tables(spark, sf0001, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(graft.Dsl.revenueTerm(col("l_extendedprice"), col("l_discount")))
        .cast("decimal(18,4)").as("rev"))
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDecimal(1))))
      .sortBy(t => (-t._2, t._1)).take(1000)
    val x = curve.map(_._2).sum
    val k = curve.length
    val gains = curve.scanLeft(BigDecimal(0))(_ + _._2).drop(1).zipWithIndex
      .map { case (cum, i) =>
        (cum.toDouble / x.toDouble - (i + 1).toDouble / k, i + 1L) }
    val (wantGain, wantRank) = gains.maxBy(g => (g._1, -g._2))
    val r473 = Extras.q473KneeDetection(spark, sf0001).collect().head
    assert(r473.getLong(0) == k)
    assert(r473.getLong(1) == wantRank, s"knee ${r473.getLong(1)} vs $wantRank")
    assert(math.abs(r473.getDouble(3) - wantGain) < 1e-5)
  }

  test("q478 LOF: matches an exact O(n^2) replay with identical tie-breaks") {
    val emb = graft.Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ids = emb.map(_._1)
    val vecs = emb.toMap
    val knn = ids.map { a =>
      a -> ids.filter(_ != a)
        .map(b => (r6(1.0 - cos(vecs(a), vecs(b))), b)).sorted.take(5)
    }.toMap
    val kdist = knn.view.mapValues(_.last._1).toMap
    val sreach = ids.map { a =>
      a -> knn(a).map { case (dd, b) => math.max(dd, kdist(b)) }.sum
    }.toMap
    val lof = ids.map { a =>
      a -> knn(a).map { case (_, b) => sreach(a) / sreach(b) }.sum / 5.0
    }.toMap
    val got = Similarity.q478Lof(spark, sf0001).collect()
    assert(got.length == 15)
    val want = ids.map(a => (a, lof(a))).sortBy(t => (-t._2, t._1)).take(15)
    got.zip(want).foreach { case (r, (id, l)) =>
      assert(r.getLong(0) == id, s"order: ${r.getLong(0)} vs $id")
      assert(math.abs(r.getDouble(1) - l) < 1e-4, s"lof($id)")
    }
  }
}
