package graft.streaming

import graft.SparkSpec
import graft.functions.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import StreamCms._

class StreamCmsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("stream-side bucket is bit-identical to the batch Column form") {
    val items = (0 until 80).map(i => s"tok$i")
    val batch = items.toDF("w")
      .select(col("w"), Sketches.cmsBucket(col("w"), 0, 64).as("b0"),
        Sketches.cmsBucket(col("w"), 3, 64).as("b3"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    items.foreach { w =>
      assert(StreamCms.bucket(w, 0, 64) == batch(w)._1)
      assert(StreamCms.bucket(w, 3, 64) == batch(w)._2)
    }
  }

  test("streamed sketch equals the batch table across unordered micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val words = (0 until 200).map(i => s"w${i % 23}")
    val want = Sketches.cmsTable(words.toDF("w"), col("w"),
        depth = 3, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    val input = MemoryStream[Item]
    val q = perWindow(input.toDS(), windowMillis = 60000L,
        watermark = "10 minutes", depth = 3, width = 16)
      .writeStream.outputMode("append").format("memory")
      .queryName("scms_eq").start()
    try {
      val items = words.map(w => Item(ts(1000L), w))
      input.addData(items.drop(120): _*)
      q.processAllAvailable()
      input.addData(items.slice(40, 120): _*)
      q.processAllAvailable()
      input.addData(items.take(40): _*)
      q.processAllAvailable()
      assert(spark.table("scms_eq").count() == 0L, "window emitted early")
      input.addData(Item(ts(1000000L), "closer"))
      q.processAllAvailable()
      val got = spark.table("scms_eq").filter(col("windowStart") === 0L)
        .collect().map(r => (r.getInt(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      assert(got == want, s"stream=$got batch=$want")
    } finally q.stop()
  }

  test("windows emit exactly once, zero cells omitted, nulls excluded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Item]
    val q = perWindow(input.toDS(), windowMillis = 60000L,
        watermark = "0 seconds", depth = 2, width = 8)
      .writeStream.outputMode("append").format("memory")
      .queryName("scms_once").start()
    try {
      input.addData(Item(ts(1000L), "a"), Item(ts(1000L), "a"),
        Item(ts(2000L), null), Item(ts(65000L), "b"))
      q.processAllAvailable()
      input.addData(Item(ts(500000L), "closer"))
      q.processAllAvailable()
      val got = spark.table("scms_once")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3)))
      // window 0: 'a' twice -> 2 cells (depth 2) each cnt 2; nulls
      // never counted. window 1: 'b' once -> 2 cells cnt 1.
      val w0 = got.filter(_._1 == 0L)
      assert(w0.length == 2 && w0.forall(_._4 == 2L), got.mkString(","))
      val w1 = got.filter(_._1 == 60000L)
      assert(w1.length == 2 && w1.forall(_._4 == 1L), got.mkString(","))
      assert(got.length == 4, s"duplicate emission: ${got.mkString(",")}")
    } finally q.stop()
  }
}
