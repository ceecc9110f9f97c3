package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec

class StateAdvisorSpec extends SparkSpec {
  import spark.implicits._

  private def runDedup(budget: Long,
                       batches: Seq[Seq[Long]]): Seq[StateAdvisor.Finding] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val got = new ConcurrentLinkedQueue[StateAdvisor.Finding]()
    val l = StateAdvisor.attach(spark, budget, f => { got.add(f); () })
    val input = MemoryStream[Long]
    val q = StreamDedup.exact(input.toDF().toDF("k"), Seq("k"))
      .writeStream.outputMode("append").format("noop").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // listener delivery is asynchronous; wait for a quiet bus
      val deadline = System.nanoTime() + 10_000_000_000L
      var last = -1
      while (System.nanoTime() < deadline && got.size != last) {
        last = got.size; Thread.sleep(300)
      }
    } finally { q.stop(); StateAdvisor.detach(spark, l) }
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq
  }

  test("fires once per run when heap state crosses the budget, " +
       "with the RocksDB prescription") {
    // any state at all exceeds a 1-byte budget; three batches still
    // produce exactly ONE finding for the run
    val fs = runDedup(1L, Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L)))
    assert(fs.size == 1, fs.toString)
    assert(fs.head.stateBytes > 1L)
    assert(fs.head.prescription.contains("rocksdb") ||
      fs.head.prescription.contains("RocksDB"))
  }

  test("stays silent under the budget") {
    val fs = runDedup(Long.MaxValue / 2, Seq(Seq(1L, 2L, 3L)))
    assert(fs.isEmpty, fs.toString)
  }

  test("rejects a non-positive budget") {
    intercept[IllegalArgumentException] {
      StateAdvisor.attach(spark, 0L)
    }
  }
}
