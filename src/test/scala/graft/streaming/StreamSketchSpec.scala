package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("per-window distinct estimate is exact and order-free below capacity") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val q = StreamSketch.perWindow(
        input.toDS().toDF("ts", "uid"), "ts", "10 minutes",
        "1 minute", col("uid"))
      .select(col("window_start"), col("distinct_est"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ssk_eq").start()
    try {
      // window [0, 60s): uids 0..39 each appearing 3 times, fed out
      // of order across three micro-batches; window [60s, 120s):
      // uids 0..9
      val w0 = for (rep <- 0 until 3; u <- 0 until 40)
        yield (ts(1000L * (rep + 1)), u.toLong)
      val w1 = (0 until 10).map(u => (ts(61000L), u.toLong))
      input.addData(w0.drop(70): _*)
      q.processAllAvailable()
      input.addData(w1: _*)
      q.processAllAvailable()
      input.addData(w0.take(70): _*)
      q.processAllAvailable()
      assert(spark.table("ssk_eq").count() == 0L, "window emitted early")
      input.addData((ts(2000000L), 999L))
      q.processAllAvailable()
      val got = spark.table("ssk_eq")
        .select(col("window_start"), col("distinct_est"))
        .as[(Long, Long)].collect().toMap
      assert(got == Map(0L -> 40L, 60L -> 10L), got.toString)
    } finally q.stop()
  }

  test("emitted sketches stay mergeable: cross-window union is exact") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val q = StreamSketch.perWindow(
        input.toDS().toDF("ts", "uid"), "ts", "1 minute",
        "1 minute", col("uid"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ssk_merge").start()
    try {
      // overlapping uid sets across two windows: 0..29 and 20..49
      input.addData((0 until 30).map(u => (ts(1000L), u.toLong)) ++
        (20 until 50).map(u => (ts(61000L), u.toLong)): _*)
      q.processAllAvailable()
      input.addData((ts(2000000L), 999L))
      q.processAllAvailable()
      val union = spark.table("ssk_merge")
        .filter(col("window_start") < 120L)
        .agg(call_function("theta_sketch_estimate",
          call_function("theta_union_agg", col("theta"), lit(20)))
          .as("d"))
        .as[Long].collect().head
      assert(union == 50L, s"union=$union")
    } finally q.stop()
  }
}
