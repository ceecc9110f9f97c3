package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink (reference: src/mapred/org/apache/hadoop/mapred/
  * lib/db/DBInputFormat.java:1-398 + DBOutputFormat.java — SELECT with
  * ORDER BY/LIMIT/OFFSET chunking per split, batched INSERT per
  * reduce).
  *
  * Spark's JDBC relation supplies the same contract natively, with a
  * better split story at scale: instead of the reference's
  * LIMIT/OFFSET windows (each of which re-scans the prefix on most
  * engines — O(n²) server work across splits), partitioned reads push
  * range predicates `WHERE col >= lo AND col < hi` per partition, so
  * each executor's query is an index range scan. Predicates and
  * column pruning push into the remote query; writes batch inserts
  * per partition.
  */
object Jdbc {

  /** Whole-table (single-partition) read — DBInputFormat with one
    * split. Fine for dimension tables; use [[readPartitioned]] for
    * anything sized beyond one task.
    */
  def read(spark: SparkSession, url: String, table: String,
           props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read — DBInputFormat's getSplits with
    * range predicates instead of LIMIT/OFFSET. `numPartitions` tasks
    * each fetch `[lower + i·stride, lower + (i+1)·stride)` of
    * `partitionColumn` (first/last partitions unbounded, so rows
    * outside [lower, upper] are still read exactly once).
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long,
                      upperBound: Long, numPartitions: Int,
                      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)

  /** Batched-insert sink — DBOutputFormat. Each partition writes its
    * rows in one transaction of batched INSERTs.
    */
  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Append,
            props: Properties = new Properties()): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}
