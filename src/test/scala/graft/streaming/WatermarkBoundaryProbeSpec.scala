package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StreamHeavyHitters._

/** Pins the append-mode emission boundary the q_stream_heavy oracle
  * depends on: a window is emitted only when the watermark passes
  * STRICTLY beyond its end. The oracle closes windows with
  * `w_start + 86400 < max(t)` — if Spark ever emitted the
  * end == watermark window (a corpus whose max event second falls
  * exactly on a day boundary), the graded hash compare would
  * diverge. This spec fails first, with a readable name.
  */
class WatermarkBoundaryProbeSpec extends SparkSpec {
  import spark.implicits._
  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("a window whose end equals the final watermark is NOT emitted") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Item]
    val q = perWindow(input.toDS(), windowMillis = 60000L,
        watermark = "0 seconds", capacity = 4)
      .writeStream.outputMode("append").format("memory")
      .queryName("shh_boundary_eq").start()
    try {
      // max event time = 60000 -> watermark = 60000 = window 0's end
      input.addData(Item(ts(1000L), "a"), Item(ts(60000L), "b"))
      q.processAllAvailable()
      assert(spark.table("shh_boundary_eq").collect().isEmpty,
        "end == watermark must stay open (oracle uses strict <)")
    } finally q.stop()
  }

  test("one millisecond past the end closes the window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Item]
    val q = perWindow(input.toDS(), windowMillis = 60000L,
        watermark = "0 seconds", capacity = 4)
      .writeStream.outputMode("append").format("memory")
      .queryName("shh_boundary_gt").start()
    try {
      input.addData(Item(ts(1000L), "a"), Item(ts(60001L), "b"))
      q.processAllAvailable()
      val got = spark.table("shh_boundary_gt").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((0L, "a")), got.toString)
    } finally q.stop()
  }
}
