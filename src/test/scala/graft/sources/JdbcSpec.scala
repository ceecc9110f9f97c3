package graft.sources

import java.sql.DriverManager
import java.util.Properties

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Exercises the JDBC source/sink (DBInputFormat / DBOutputFormat
  * analog) against embedded Derby — an in-JVM database, no network.
  */
class JdbcSpec extends SparkSpec {

  private lazy val url: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  test("write + whole-table read round-trips through a real database") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"name_$i", i * 1.5)).toDF("id", "name", "score")
    Jdbc.write(df, url, "t_roundtrip", SaveMode.Overwrite)
    val back = Jdbc.read(spark, url, "t_roundtrip")
    assert(back.count() == 50)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq == Seq("id", "name", "score"))
    val got = back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val want = (1 to 50).map(i => (i.toLong, s"name_$i", i * 1.5)).toSet
    assert(got == want)
  }

  test("partitioned read splits on ranges and reads every row exactly once") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    Jdbc.write(df, url, "t_parts", SaveMode.Overwrite)
    // DBInputFormat.getSplits analog: 4 range-partitioned queries.
    // lower/upper only shape the stride — rows outside still arrive
    // (first/last partitions are unbounded), so use interior bounds
    // to prove that too.
    val part = Jdbc.readPartitioned(spark, url, "t_parts",
      partitionColumn = "id", lowerBound = 50, upperBound = 150,
      numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    // no partition is empty and none holds everything (real splits)
    val sizes = part.rdd.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(sizes.forall(_ > 0) && sizes.max < 200, sizes.mkString(","))
    assert(part.count() == 200)
    assert(part.agg(sum(col("id"))).collect().head.getLong(0) == (1 to 200).sum.toLong)
  }

  test("predicate pushdown reaches the remote query") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "bucket7")
    Jdbc.write(df, url, "t_push", SaveMode.Overwrite)
    val filtered = Jdbc.read(spark, url, "t_push").filter(col("bucket7") === 3)
    // the filter must appear as a pushed predicate in the scan, not a
    // Spark-side Filter over a full table fetch
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(bucket7,3)"), plan)
    assert(filtered.count() == (1 to 100).count(_ % 7 == 3))
  }

  test("typed columns round-trip: decimal, date, timestamp") {
    import spark.implicits._
    import java.sql.{Date, Timestamp}
    val df = Seq(
      (1L, BigDecimal("12345.67"), Date.valueOf("2024-02-29"),
        Timestamp.valueOf("2024-02-29 12:34:56")),
      (2L, BigDecimal("-0.01"), Date.valueOf("1999-12-31"),
        Timestamp.valueOf("2000-01-01 00:00:00"))
    ).toDF("id", "amount", "d", "ts")
    Jdbc.write(df, url, "t_typed", SaveMode.Overwrite)
    // decimal scale is the store's choice (Derby narrows Spark's
    // default 38,18) — compare numerically, not textually
    val back = Jdbc.read(spark, url, "t_typed")
      .collect().map(r => (r.getLong(0),
        BigDecimal(r.getDecimal(1)).underlying.stripTrailingZeros.toPlainString,
        r.getDate(2).toString, r.getTimestamp(3).toString)).toSet
    assert(back == Set(
      (1L, "12345.67", "2024-02-29", "2024-02-29 12:34:56.0"),
      (2L, "-0.01", "1999-12-31", "2000-01-01 00:00:00.0")))
  }

  test("append mode accumulates batches (DBOutputFormat reduce batches)") {
    import spark.implicits._
    val batch = (1 to 10).map(i => (i.toLong, "x")).toDF("id", "v")
    Jdbc.write(batch, url, "t_append", SaveMode.Overwrite)
    Jdbc.write(batch, url, "t_append", SaveMode.Append)
    assert(Jdbc.read(spark, url, "t_append").count() == 20)
  }

  override def withFixture(test: NoArgTest) = {
    // derby writes derby.log in CWD unless told otherwise; keep quiet
    System.setProperty("derby.stream.error.field",
      "java.lang.System.err")
    super.withFixture(test)
  }
}
