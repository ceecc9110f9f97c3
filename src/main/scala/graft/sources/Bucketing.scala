package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The reference's map-side-join contract as bucketed tables
  * (reference: src/mapred/org/apache/hadoop/mapred/join/
  * CompositeInputFormat.java:62-86 — N inputs, same key class,
  * sorted, equal partition count, joined with zero shuffle).
  *
  * Spark equivalent: write both sides `bucketBy(n, key).sortBy(key)`;
  * a subsequent equi-join on the key plans a sort-merge join with NO
  * exchange on either side — the write-time layout replaces the
  * runtime shuffle, exactly the reference's pre-sorted copartitioned
  * fast path. At 100 TB this is the difference between shuffling both
  * fact tables per join and shuffling neither.
  */
object Bucketing {

  /** Write a bucketed+sorted table into the session catalog, with a
    * parquet bloom filter on the bucket key (the BloomMapFile analog
    * — reference: src/core/org/apache/hadoop/io/BloomMapFile.java:
    * probe the membership filter before touching the index). Bucket
    * pruning routes a point lookup to 1 of n buckets; the bloom then
    * skips that bucket's non-matching row groups without decoding
    * them — at 100 TB a membership probe otherwise scans every row
    * group of the bucket.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, bloom: Boolean = true): Unit = {
    val spark = df.sparkSession
    // the in-memory catalog dies with the JVM but the managed table's
    // warehouse directory survives — a fresh session's CREATE then
    // fails with LOCATION_ALREADY_EXISTS. Drop the catalog entry and
    // sweep any orphaned location so a rebuild is always idempotent.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val db = spark.catalog.currentDatabase
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val dir = new org.apache.hadoop.fs.Path(
      if (db == "default") s"$wh/${table.toLowerCase}"
      else s"$wh/$db.db/${table.toLowerCase}")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
    (if (bloom) w.option(s"parquet.bloom.filter.enabled#$key", "true") else w)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key. With matching
    * bucket counts Catalyst plans SMJ with no Exchange (verify with
    * `.explain`: no ShuffleExchange above either scan).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** Point lookup (reference: MapFileOutputFormat.getEntry:102 —
    * route the key to one partition's index): an equality filter on
    * the bucket key scans ONE bucket (`SelectedBucketsCount: 1 out
    * of n` in the plan), the reader-side analog of the reference's
    * partitioner-routed index lookup.
    */
  def lookup(spark: SparkSession, table: String, key: String, value: Any): DataFrame =
    lookupWithPlan(spark, table, key, value)._1

  /** [[lookup]] plus the executed-plan string of the pruned scan, so
    * callers (and the regression test) can assert the
    * `SelectedBucketsCount: 1 out of n` contract actually held.
    */
  def lookupWithPlan(spark: SparkSession, table: String, key: String,
                     value: Any): (DataFrame, String) = {
    // filter-only plans need bucketed scan forced on, or the planner
    // falls back to a full (all-buckets) scan. A point lookup is
    // small by definition, so execute it eagerly inside the scoped
    // conf (derived actions on a lazily-returned plan would re-plan
    // AFTER the conf is restored and lose the pruning) and hand back
    // a local result.
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    // the toggle is session-global: serialize concurrent lookups on
    // the session so two threads can't interleave read-prev/restore
    // and leave the conf stuck (or force bucketed scans on unrelated
    // concurrent queries mid-window)
    spark.synchronized {
      val prev = spark.conf.get(conf)
      spark.conf.set(conf, "false")
      try {
        val df = spark.table(table)
          .filter(org.apache.spark.sql.functions.col(key) === value)
        val rows = df.collect()
        val plan = df.queryExecution.executedPlan.toString
        (spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), df.schema), plan)
      } finally spark.conf.set(conf, prev)
    }
  }
}
