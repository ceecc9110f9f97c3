package graft.streaming

import graft.SparkSpec
import graft.functions.Sampling
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import StreamSample._

class StreamSampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("draw is bit-identical to the batch expression's A-ES draw") {
    // the streaming kernel re-derives the md5 uniform + pow in Scala;
    // it must match the Column form EXACTLY (same md5, same division,
    // same StrictMath.pow) or the stream/batch equality contract is void
    val rows = (0 until 100).map(i => (s"k$i", 1.0 + i * 3.7))
    // batch draws via the public operator (k = all rows keeps everyone)
    val batchDraws = Sampling.weightedSample(rows.toDF("key", "w"),
        col("key"), col("w"), k = 100)
      .select(col("key"), col("draw"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { case (k, w) =>
      val d = StreamSample.draw(k, w, 42L)
      assert(d.isDefined)
      assert(java.lang.Double.doubleToLongBits(d.get) ==
        java.lang.Double.doubleToLongBits(batchDraws(k)),
        s"draw mismatch on $k: ${d.get} vs ${batchDraws(k)}")
    }
  }

  test("stream sample equals batch weightedSample across unordered micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (0 until 50).map(i => (s"doc$i", 1.0 + (i * 13 % 29)))
    val batchTop = Sampling.weightedSample(rows.toDF("key", "w"),
        col("key"), col("w"), k = 7)
      .select(col("key"), col("draw"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet

    val input = MemoryStream[Item]
    // delay 10 min: all three batches share ts=1s, and the watermark
    // moves to (max ts - delay) after each batch — a zero delay would
    // mark batches 2-3 late (at-or-below watermark) and Spark drops
    // late rows before the state op. The delay IS the disorder bound.
    val q = perWindow(input.toDS(), windowMillis = 60000L,
        watermark = "10 minutes", k = 7)
      .writeStream.outputMode("append").format("memory")
      .queryName("ss_eq").start()
    try {
      // three micro-batches, deliberately out of key order, all in
      // window [0, 60s)
      val items = rows.map { case (k, w) => Item(ts(1000L), k, w) }
      input.addData(items.drop(30): _*)
      q.processAllAvailable()
      input.addData(items.slice(10, 30): _*)
      q.processAllAvailable()
      input.addData(items.take(10): _*)
      q.processAllAvailable()
      assert(spark.table("ss_eq").count() == 0L, "window emitted early")
      // time moves on: close the window (past end 60s + delay 600s)
      input.addData(Item(ts(1000000L), null, 1.0))
      q.processAllAvailable()
      val got = spark.table("ss_eq")
        .collect().map(r => (r.getString(1), r.getDouble(3))).toSet
      assert(got == batchTop, s"stream=$got batch=$batchTop")
    } finally q.stop()
  }

  test("zero/negative/null weights and null keys never win") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Item]
    val q = perWindow(input.toDS(), windowMillis = 60000L,
        watermark = "0 seconds", k = 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("ss_zero").start()
    try {
      input.addData(
        Item(ts(1000L), "a", 2.0), Item(ts(1000L), "b", 1.0),
        Item(ts(1000L), "z", 0.0), Item(ts(1000L), "n", -3.0),
        Item(ts(1000L), null, 9.0), Item(ts(1000L), "c", 5.0))
      q.processAllAvailable()
      input.addData(Item(ts(300000L), null, 1.0))
      q.processAllAvailable()
      val got = spark.table("ss_zero").collect().map(_.getString(1)).toSet
      // k=5 but only 3 rows carry positive weight — result is smaller
      // than k, per the A-ES law (weight 0 = probability 0)
      assert(got == Set("a", "b", "c"), got.toString)
    } finally q.stop()
  }

  test("re-arriving keys occupy one slot; windows emit exactly once each") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Item]
    val q = perWindow(input.toDS(), windowMillis = 60000L,
        watermark = "0 seconds", k = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("ss_dupe").start()
    try {
      // window 0: 'a' arrives twice (replay/retry); window 1: 'x'
      input.addData(Item(ts(1000L), "a", 10.0), Item(ts(2000L), "b", 1.0))
      q.processAllAvailable()
      input.addData(Item(ts(3000L), "a", 10.0), Item(ts(65000L), "x", 1.0))
      q.processAllAvailable()
      input.addData(Item(ts(500000L), null, 1.0))
      q.processAllAvailable()
      val got = spark.table("ss_dupe")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      // window 0 emits a AND b (a once), window 1 emits x once
      assert(got.toSet == Set((0L, "a"), (0L, "b"), (60000L, "x")),
        got.mkString(","))
      assert(got.length == 3, s"duplicate emission: ${got.mkString(",")}")
    } finally q.stop()
  }
}
