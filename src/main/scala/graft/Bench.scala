package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at
  * `SPARK_GRAFT_SF_DIR`, prints one JSON line for the driver
  * (`BENCH_r{N}.json`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.session(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, appName = "graft-bench")
    // warm the JVM/codegen/file-source paths so the first measured
    // query isn't charged for session startup
    Graft.table(spark, sfDir, "lineitem").limit(10).count()
    spark.range(100).selectExpr("sum(id)").collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // isolate queries: operators that persist derived indexes
      // (LSH banding, inverted indexes) must not distort successors
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
