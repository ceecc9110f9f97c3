package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(dir: String): Set[String] = {
    val d = new java.io.File(dir)
    d.listFiles.filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).toSet
  }

  test("deleteKeys rewrites only hit files; misses stay byte-identical") {
    val out = Files.createTempDirectory("graft-redact").toString + "/t"
    // three files with disjoint key ranges
    (1L to 10L).map(i => (i, s"a$i")).toDF("id", "v")
      .coalesce(1).write.parquet(out)
    (11L to 20L).map(i => (i, s"b$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(out)
    (21L to 30L).map(i => (i, s"c$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(out)
    val before = dataFiles(out)
    assert(before.size == 3)

    val report = Redaction.deleteKeys(spark, out, "id", Seq(3L, 15L, 16L))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    // two hit files (ids 3 | 15,16), the third untouched
    assert(report.map(_._2).sorted.toSeq == Seq(1L, 2L), report.toSeq.toString)
    val untouched = before.intersect(dataFiles(out))
    assert(untouched.size == 1, s"expected exactly one untouched file, " +
      s"got $untouched")
    val back = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(back == (1L to 30L).filterNot(Set(3L, 15L, 16L))
      .map(i => (i, (if (i <= 10) "a" else if (i <= 20) "b" else "c") + i))
      .toSet)
    // idempotent: re-running the same request touches nothing
    assert(Redaction.deleteKeys(spark, out, "id", Seq(3L, 15L, 16L))
      .count() == 0)
    assert(Redaction.deleteKeys(spark, out, "id", Nil).count() == 0)
  }

  test("the hit-scan shape pushes the IN filter to the parquet reader") {
    // the mechanism deleteKeys' O(hit files) contract rides on:
    // key IN (...) must reach the scan (row-group stats / dictionary
    // / bloom pruning), and only the key column may be read
    val out = Files.createTempDirectory("graft-redact3").toString + "/t"
    (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v").write.parquet(out)
    val plan = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("id")
        .isInCollection(Seq(3L, 15L)))
      .groupBy(org.apache.spark.sql.functions.input_file_name())
      .count()
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(id"), plan)
    assert(plan.contains("ReadSchema: struct<id:bigint>"), plan)
  }

  test("a fully-deleted file is removed without replacement") {
    val out = Files.createTempDirectory("graft-redact2").toString + "/t"
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").coalesce(1).write.parquet(out)
    (3L to 8L).map(i => (i, s"z$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(out)
    val report = Redaction.deleteKeys(spark, out, "id", Seq(1L, 2L))
      .collect()
    assert(report.length == 1 && report(0).getLong(1) == 2L,
      report.toSeq.toString)
    assert(report(0).getBoolean(2), "emptied flag should be set")
    assert(dataFiles(out).size == 1)
    assert(spark.read.parquet(out).count() == 6)
    assert(!new java.io.File(out).listFiles
      .exists(_.getName.startsWith(".redact-tmp")))
  }
}
