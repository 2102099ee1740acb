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
}
