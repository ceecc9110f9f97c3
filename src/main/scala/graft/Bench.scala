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
    // query isn't charged for session startup, and pre-JIT the heavy
    // operator kernels (shingling, signatures, window pair expansion,
    // cosine) on the tiny sf — janino codegen + C2 compilation swing
    // the heavy tail ±30% when paid inside the timed region. No data
    // from the measured sfDir is touched or cached here.
    Graft.table(spark, sfDir, "lineitem").limit(10).count()
    spark.range(100).selectExpr("sum(id)").collect()
    // best-effort: a missing warmup directory must not abort the
    // bench (measured queries have their own failure isolation).
    // The warmup's internal localCheckpoint blocks (KB-scale at this
    // sf) persist until ContextCleaner GC — negligible next to the
    // measured working sets.
    try {
      import org.apache.spark.sql.functions._
      val warmDocs = Graft.table(spark, "/root/testdata/sf0.001", "documents")
      functions.Dedup.minhashNearDups(warmDocs, col("doc_id"), col("text"),
        3, 16, 16, 0.5).count()
      functions.Dedup.simhashValidate(warmDocs, col("doc_id"), col("text"),
        4).count()
      functions.Dedup.connectedComponents(
        functions.Dedup.ngramJaccardPairs(warmDocs, col("doc_id"),
          col("text"), 3, 0.5)).count()
      val warmEmb = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
      functions.Similarity.bruteForcePairs(warmEmb, col("vec_id"),
        col("embedding"), 0.4).count()
      functions.Similarity.quantizedTopK(warmEmb, col("vec_id"),
        col("embedding"), warmEmb.filter(col("vec_id") < 2),
        col("vec_id"), col("embedding"), k = 3, overfetch = 2).count()
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] kernel warmup skipped: ${e.getMessage}")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // isolate queries: operators that persist derived indexes
      // (LSH banding, inverted indexes) must not distort successors
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
                 false
               }
      // a failed query must not read as a (fast) success: report -1
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":[${failed.mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
  }
}
