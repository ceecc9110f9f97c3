package graft.streaming

import graft.SparkSpec
import graft.functions.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StreamHeavyHitters._

class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("per-window sketch emits on watermark close with the MG guarantee") {
    implicit val sqlCtx = spark.sqlContext
    // window [0, 60s): 'hot' x30, 20 distinct 'tail' items -> n=50;
    // capacity 9 guarantees any count > 50/10 = 5 survives
    val w0 = (0 until 30).map(i => Item(ts(1000L + i), "hot")) ++
      (0 until 20).map(i => Item(ts(2000L + i), s"t$i"))
    val input = MemoryStream[Item]
    val q = perWindow(input.toDS(), windowMillis = 60000L,
        watermark = "5 seconds", capacity = 9)
      .writeStream.outputMode("append").format("memory")
      .queryName("shh_test").start()
    try {
      input.addData(w0: _*)
      q.processAllAvailable()
      // window still open (watermark at ~2s - 5s): nothing emitted
      assert(spark.table("shh_test").count() == 0L)
      // an event far in the future closes window 0
      input.addData(Item(ts(300000L), "later"))
      q.processAllAvailable()
      val got = spark.table("shh_test")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
      assert(got.forall(_._1 == 0L))
      assert(got.forall(_._4 == 50L), got.mkString(","))
      val hot = got.filter(_._2 == "hot")
      assert(hot.length == 1, s"hot must survive: ${got.mkString(",")}")
      // lower bound within n/(cap+1) = 5 of the true count 30
      assert(hot.head._3 <= 30L && hot.head._3 >= 25L, hot.head.toString)
    } finally q.stop()
  }

  test("streaming sketch state equals the batch kernel per window") {
    implicit val sqlCtx = spark.sqlContext
    val items = Seq("a", "a", "b", "a", "c", "b", "d", "a")
    val input = MemoryStream[Item]
    val q = perWindow(input.toDS(), windowMillis = 60000L,
        watermark = "1 second", capacity = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("shh_batch_eq").start()
    try {
      // two micro-batches splitting the same window: state must carry
      input.addData(items.take(4).zipWithIndex.map { case (s, i) =>
        Item(ts(1000L + i), s) }: _*)
      q.processAllAvailable()
      input.addData(items.drop(4).zipWithIndex.map { case (s, i) =>
        Item(ts(2000L + i), s) }: _*)
      q.processAllAvailable()
      input.addData(Item(ts(300000L), "later"))
      q.processAllAvailable()
      val streamed = spark.table("shh_batch_eq")
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      val (n, batchSketch) = Sketches.mgSketch(items.iterator, 3)
      assert(n == 8L)
      assert(streamed == batchSketch.toMap,
        s"streamed=$streamed batch=$batchSketch")
    } finally q.stop()
  }

  test("decide phase under decrement pressure recovers exact phi-heavy-hitters") {
    implicit val sqlCtx = spark.sqlContext
    // universe 105 items vs capacity 8: decrements fire constantly.
    // phi = 0.15 > 1/(8+1): the MG guarantee still promises every
    // item above n*0.15 survives, so candidates + exact recount must
    // equal the exact phi-heavy-hitters despite the undercounting.
    val heavy = Seq.tabulate(60)(i => Item(ts(1000L + i), s"h${i % 2}"))
    val tail = Seq.tabulate(103)(i => Item(ts(3000L + i), s"t$i"))
    val all = heavy ++ tail // n=163; heavy h0/h1 = 30 each (18.4%)
    val input = MemoryStream[Item]
    val q = perWindow(input.toDS(), windowMillis = 60000L,
        watermark = "0 seconds", capacity = 8)
      .writeStream.outputMode("append").format("memory")
      .queryName("shh_pressure").start()
    try {
      input.addData(all: _*)
      q.processAllAvailable()
      input.addData(Item(ts(300000L), "later"))
      q.processAllAvailable()
      val sink = spark.table("shh_pressure")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      // pressure evidence: far fewer survivors than distinct items,
      // and at least one survivor's lower bound undercounts
      assert(sink.length <= 8 && sink.length < 105,
        s"no pressure: ${sink.length} survivors")
      assert(sink.forall(_._3 == 163L))
      val exact = all.groupBy(_.item).view.mapValues(_.size.toLong).toMap
      assert(sink.exists { case (i, c, _) => c < exact(i) },
        s"no undercount observed: ${sink.mkString(",")}")
      // decide: exact recount of candidates at ceil(phi*n)
      val minCnt = math.ceil(0.15 * 163).toLong // = 25
      val decided = sink.map(_._1).distinct
        .map(i => i -> exact(i)).filter(_._2 >= minCnt).toMap
      val want = exact.filter(_._2 >= minCnt)
      assert(decided == want, s"decided=$decided want=$want")
      assert(want == Map("h0" -> 30L, "h1" -> 30L))
    } finally q.stop()
  }

  test("null items are excluded like the batch twin, not NPE'd") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Item]
    val q = perWindow(input.toDS(), windowMillis = 60000L,
        watermark = "1 second", capacity = 4)
      .writeStream.outputMode("append").format("memory")
      .queryName("shh_nulls").start()
    try {
      input.addData(Item(ts(1000L), "a"), Item(ts(1001L), null),
        Item(ts(1002L), "a"))
      q.processAllAvailable()
      input.addData(Item(ts(300000L), "later"))
      q.processAllAvailable()
      val got = spark.table("shh_nulls")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      // n counts the two non-null rows only; no null Hit row
      assert(got.toSet == Set(("a", 2L, 2L)), got.mkString(","))
    } finally q.stop()
  }
}
