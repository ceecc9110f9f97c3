package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The state-store backend is a config seam, not a semantic one: a
  * graded stateful streaming query must return IDENTICAL rows on the
  * heap-backed default and on RocksDB (same oracle), and the dial
  * must fail loud on a typo rather than silently run on heap.
  */
class StateBackendSpec extends SparkSpec {

  test("providerClass resolves dials, passes FQCNs, rejects typos") {
    assert(StateBackend.providerClass("rocksdb") == StateBackend.RocksDB)
    assert(StateBackend.providerClass("RocksDB") == StateBackend.RocksDB)
    assert(StateBackend.providerClass("heap") == StateBackend.Heap)
    assert(StateBackend.providerClass("default") == StateBackend.Heap)
    assert(StateBackend.providerClass("com.example.MyProvider") ==
      "com.example.MyProvider")
    val e = intercept[IllegalArgumentException] {
      StateBackend.providerClass("rocksdbb")
    }
    assert(e.getMessage.contains("rocksdbb"))
  }

  test("withProvider scopes the conf and restores the previous value") {
    val prev = spark.conf.getOption(StateBackend.ProviderConf)
    val prevLog = spark.conf.getOption(StateBackend.ChangelogConf)
    StateBackend.withProvider(spark, "rocksdb") {
      assert(spark.conf.get(StateBackend.ProviderConf) ==
        StateBackend.RocksDB)
      // rocksdb implies changelog checkpointing (deltas, not
      // per-batch SST snapshot uploads)
      assert(spark.conf.get(StateBackend.ChangelogConf) == "true")
    }
    assert(spark.conf.getOption(StateBackend.ProviderConf) == prev)
    assert(spark.conf.getOption(StateBackend.ChangelogConf) == prevLog)
    // heap selection leaves the changelog conf alone
    StateBackend.withProvider(spark, "heap") {
      assert(spark.conf.getOption(StateBackend.ChangelogConf) == prevLog)
    }
    // an explicit caller setting wins over the implied default
    StateBackend.withProvider(spark, "rocksdb") {
      spark.conf.set(StateBackend.ChangelogConf, "false")
      StateBackend.withProvider(spark, "rocksdb") {
        assert(spark.conf.get(StateBackend.ChangelogConf) == "false")
      }
      spark.conf.unset(StateBackend.ChangelogConf)
    }
  }

  test("selecting rocksdb routes native logging away from the JNI " +
       "callback (class logger pinned to ERROR)") {
    // the round-14 SIGSEGVs all share the frame LoggerJniCallback::
    // Logv on BGWorkCompaction threads: Spark derives the NATIVE log
    // threshold from this class's slf4j level, so ERROR here means
    // compaction WARN/INFO chatter is filtered in C++, before the
    // crash-prone JNI bridge
    StateBackend.withProvider(spark, "rocksdb") { () }
    val lvl = org.apache.logging.log4j.LogManager.getLogger(
      "org.apache.spark.sql.execution.streaming.state.RocksDB").getLevel
    assert(lvl == org.apache.logging.log4j.Level.ERROR, lvl.toString)
    val slf = org.slf4j.LoggerFactory.getLogger(
      "org.apache.spark.sql.execution.streaming.state.RocksDB")
    assert(!slf.isWarnEnabled && !slf.isInfoEnabled,
      "WARN/INFO must be disabled so createLogger derives ERROR_LEVEL")
  }

  test("graded q_stream_dedup returns identical rows on heap and " +
      "RocksDB state stores") {
    def run(provider: String) = StateBackend.withProvider(spark, provider) {
      SparkEntry.queries("q_stream_dedup")(spark, sf)
        .select(col("user_id"), col("event_type"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    }
    val heap = run("heap")
    val rocks = run("rocksdb")
    assert(heap.nonEmpty, "fixture must produce rows")
    assert(rocks == heap,
      s"state backend moved results: heap=${heap.size} rocks=${rocks.size}")
  }

  test("RocksDB provider actually engages (provider-specific metrics " +
      "present) and keeps a stateful aggregation exact") {
    StateBackend.withProvider(spark, "rocksdb") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-sbs").toString
      spark.range(500).select(
          expr("timestamp '2026-01-01 00:00:00'").as("ts"),
          (col("id") % 100).as("k"))
        .repartition(4).write.mode("overwrite").parquet(s"$dir/in")
      val src = spark.readStream.schema("ts timestamp, k bigint")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
      val dd = StreamDedup.withinWatermark(src, "ts", "3650 days",
        Seq("k"))
      val q = dd.writeStream.outputMode("append").format("memory")
        .queryName("sbs_rocks_sink")
        .option("checkpointLocation", s"$dir/ckpt").start()
      try {
        q.processAllAvailable()
        val s0 = q.lastProgress.stateOperators.head
        assert(s0.numRowsTotal == 100L, s"state rows ${s0.numRowsTotal}")
        import scala.jdk.CollectionConverters._
        assert(s0.customMetrics.asScala.keys.exists(_.startsWith("rocksdb")),
          s"expected rocksdb metrics, got ${s0.customMetrics.keySet()}")
      } finally q.stop()
      val got = spark.table("sbs_rocks_sink").select("k")
        .collect().map(_.getLong(0)).toSet
      assert(got == (0L until 100L).toSet)
    }
  }
}
