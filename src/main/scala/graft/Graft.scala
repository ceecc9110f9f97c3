package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table plumbing for the graft engine.
  *
  * The engine targets a large multi-executor cluster; locally it runs
  * `local[N]`. All scale-sensitive defaults (AQE on, shuffle partitions
  * sized to the cluster, not Spark's legacy 200) live here so every
  * entry point (Verify, Bench, tests) gets the same behavior.
  */
object Graft {

  /** Build a session with scale-appropriate defaults.
    *
    * On a real cluster `shufflePartitions` should be ~2-3x total cores
    * (AQE coalesces down); locally we match the core count.
    */
  def session(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = 32,
              appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as long (ns since
      // epoch) — ordering-compatible with the oracle's timestamp_ns
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Table names present in every /root/testdata/sf* directory. */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table from an sf directory. Parquet scans get column
    * pruning + predicate pushdown from Catalyst for free; callers
    * should select/filter as early as possible so both reach the scan.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
