package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical delete-by-key for parquet table directories — the
  * "right to be forgotten" maintenance operator (the complement of
  * `TextAnalysis`' row-level PII scrub: that rewrites VALUES in
  * flight, this removes ROWS from storage). A deletion request is a
  * small key batch against a huge table, so the operator's contract
  * is file-level surgery: only files that CONTAIN a requested key
  * are rewritten; every other byte of the table is untouched.
  *
  * Shape at scale (the 100 TB contract):
  *  - The hit scan is `key IN (...)` over just the key column plus
  *    `input_file_name()` — the IN predicate reaches the parquet
  *    reader (PushedFilters), so row-group stats, dictionary pages
  *    and bloom filters (written by [[Bucketing.writeBucketed]])
  *    prune all but the candidate files; the scan reads key bytes
  *    from the pruned remainder, never full rows.
  *  - Each hit file is rewritten independently (read file → filter
  *    keys out → one replacement file), as concurrent Spark jobs
  *    (bounded pool). A file whose every row is deleted is removed
  *    without replacement. Partition-VALUE columns live in directory
  *    names, so per-file rewrite round-trips them untouched.
  *  - Cost is O(hit files), not O(table): with bucketed/bloom layout
  *    a k-key request touches at most k files.
  *
  * Crash consistency, same stance as [[Compaction.compact]]: the
  * replacement is written additively under a dot-prefixed temp dir
  * (invisible to readers), then swapped in per-file with delete-old
  * → move-new. The per-file window is the only exposure; a re-run
  * of the same request is idempotent (the keys are already gone from
  * every completed file, so it rewrites nothing).
  *
  * Returns one report row per hit file:
  * `(file, rows_removed, emptied)`.
  */
object Redaction {

  def deleteKeys(spark: SparkSession, path: String, key: String,
                 keys: Seq[Any], maxConcurrent: Int = 8): DataFrame = {
    require(maxConcurrent >= 1,
      s"maxConcurrent must be >= 1, got $maxConcurrent")
    import spark.implicits._
    val empty = Seq.empty[(String, Long, Boolean)]
      .toDF("file", "rows_removed", "emptied")
    if (keys.isEmpty) return empty
    val base = new Path(path)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(base), s"no such table directory: $path")
    // hit scan: IN-filter pushed to the parquet reader; only the key
    // column is materialized from the (pruned) candidate files
    val hits = spark.read.parquet(path)
      .filter(col(key).isInCollection(keys))
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    if (hits.isEmpty) return empty
    val tmpRoot = new Path(base,
      s".redact-tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(maxConcurrent, hits.length))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    import scala.concurrent.{Await, Future}
    try {
      val done = hits.zipWithIndex.map { case ((uri, removed), i) =>
        Future {
          val live = new Path(new java.net.URI(uri))
          val tmpDir = new Path(tmpRoot, s"f$i")
          spark.read.parquet(live.toString)
            .filter(!col(key).isInCollection(keys))
            .coalesce(1)
            .write.mode(SaveMode.Overwrite).parquet(tmpDir.toString)
          // a fully-deleted file writes a schema-only parquet; its
          // footer (driver-side metadata, no job) says 0 records —
          // drop it rather than litter the table with empty files
          val conf = spark.sessionState.newHadoopConf()
          val replacement = fs.listStatus(tmpDir).toSeq
            .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
              !s.getPath.getName.startsWith("."))
            .filter { s =>
              val r = org.apache.parquet.hadoop.ParquetFileReader.open(
                org.apache.parquet.hadoop.util.HadoopInputFile
                  .fromPath(s.getPath, conf))
              try r.getRecordCount > 0 finally r.close()
            }
          fs.delete(live, false)
          replacement.foreach(s => fs.rename(s.getPath,
            new Path(live.getParent, s.getPath.getName)))
          (uri, removed, replacement.isEmpty)
        }
      }
      Await.result(Future.sequence(done),
          scala.concurrent.duration.Duration.Inf)
        .toDF("file", "rows_removed", "emptied")
    } finally {
      pool.shutdown()
      fs.delete(tmpRoot, true)
    }
  }
}
