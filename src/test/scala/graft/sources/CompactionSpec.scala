package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(dir: String): Set[String] = {
    val d = new java.io.File(dir)
    if (!d.exists) Set.empty
    else d.listFiles.filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).toSet
  }

  test("compact rewrites only violating partitions and preserves data") {
    val out = Files.createTempDirectory("graft-compact").toString + "/t"
    // p=1: five tiny files (violating); p=2: already one file (healthy)
    (1 to 10).map(i => (i.toLong, s"a$i")).toDF("id", "v")
      .repartition(5).write.parquet(s"$out/p=1")
    (11 to 14).map(i => (i.toLong, s"b$i")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$out/p=2")
    // empty shuffle partitions write no file, so the count is <= 5
    val before1 = dataFiles(s"$out/p=1")
    val before2 = dataFiles(s"$out/p=2")
    assert(before1.size >= 2 && before2.size == 1)

    val report = Compaction.compact(spark, out).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getInt(3), r.getBoolean(4))).toMap
    assert(report.keySet == Set("p=1", "p=2"))
    assert(report("p=1")._2 == before1.size && report("p=1")._3 == 1 &&
      report("p=1")._4, report.toString)
    assert(report("p=2") == ((report("p=2")._1, 1, 1, false)))

    // healthy partition byte-identical (same file names); violator 1 file
    assert(dataFiles(s"$out/p=2") == before2)
    assert(dataFiles(s"$out/p=1").size == 1)
    // no temp residue, no data change, partition column survives
    assert(!new java.io.File(out).listFiles
      .exists(_.getName.startsWith(".compact-tmp")))
    val back = spark.read.parquet(out)
      .select($"id", $"v", $"p".cast("int")).as[(Long, String, Int)]
      .collect().toSet
    assert(back == ((1 to 10).map(i => (i.toLong, s"a$i", 1)) ++
      (11 to 14).map(i => (i.toLong, s"b$i", 2))).toSet)
  }

  test("compact is idempotent and honors the bytes-derived file need") {
    val out = Files.createTempDirectory("graft-compact2").toString + "/t"
    (1 to 100).map(i => (i.toLong, "x" * 50)).toDF("id", "v")
      .repartition(4).write.parquet(out)
    assert(dataFiles(out).size == 4)
    // tiny target: need >= current file count -> nothing to rewrite
    val r0 = Compaction.compact(spark, out, targetBytes = 1L).collect()
    assert(r0.forall(!_.getBoolean(4)) && dataFiles(out).size == 4)
    // root-level (unpartitioned) compaction to one file
    val r1 = Compaction.compact(spark, out).collect()
    assert(r1.map(r => (r.getString(0), r.getInt(2), r.getInt(3),
      r.getBoolean(4))).toSeq == Seq(("", 4, 1, true)))
    // second run: healthy everywhere, untouched
    val files = dataFiles(out)
    val r2 = Compaction.compact(spark, out).collect()
    assert(r2.forall(!_.getBoolean(4)) && dataFiles(out) == files)
    assert(spark.read.parquet(out).count() == 100)
  }
}
