package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming state-pressure advisory — the streaming twin of
  * [[graft.meta.Advisor]]'s `object_agg_heap_state` rule. A batch
  * plan is diagnosed after it runs; a stream must be watched WHILE it
  * runs, because heap-provider state growth is a deferred OOM (the
  * q_stream_neardup-at-sf10 signature: the default provider OOM'd an
  * 8 GB JVM where RocksDB finished — SCALE.md round 14). Spark
  * already reports per-operator state residency in every progress
  * event; nothing in the default pipeline READS it against the heap.
  *
  * [[attach]] registers a [[StreamingQueryListener]] that, on each
  * progress event, sums the query's state-operator `memoryUsedBytes`
  * and emits ONE finding per query run the first time the total
  * crosses `budgetBytes` (default: a quarter of the JVM heap — state
  * must leave room for shuffle/sort/broadcast on the same executors).
  * The finding carries the measured bytes and prescribes the RocksDB
  * provider ([[StateBackend]]) or a tighter watermark TTL. One
  * finding per run, not per batch: the advisory is a routing signal,
  * not a metrics feed — the progress stream itself already has the
  * per-batch numbers.
  *
  * The RocksDB provider reports its own (bounded) `memoryUsedBytes`,
  * so a stream already on the scale path stays naturally under any
  * sane budget — no provider sniffing needed; the measured number IS
  * the discriminator. Listener delivery is asynchronous (Spark's
  * listener bus): a finding lands shortly after the crossing batch,
  * not inside it — this is an advisory, not a gate.
  */
object StateAdvisor {

  /** One advisory: state residency of `queryName`'s run crossed the
    * budget at `batchId` with `stateBytes` resident. */
  final case class Finding(queryName: String, runId: String,
                           batchId: Long, stateBytes: Long,
                           budgetBytes: Long) {
    def prescription: String =
      s"streaming state holds $stateBytes bytes on the heap (budget " +
        s"$budgetBytes): switch the query to the RocksDB state backend " +
        "(SPARK_GRAFT_STATE_PROVIDER=rocksdb / StateBackend.withProvider " +
        "— both also quiet RocksDB's crash-prone JNI log callback, see " +
        "StateBackend.quietNativeLogger) so residency is disk-bounded, " +
        "or tighten the watermark TTL so less state is live"
  }

  final class Listener(budgetBytes: Long, onFinding: Finding => Unit)
      extends StreamingQueryListener {
    // one finding per query RUN (a restart is a new run with fresh state)
    private val fired = ConcurrentHashMap.newKeySet[String]()
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      fired.remove(e.runId.toString); ()
    }
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val state = p.stateOperators.map(_.memoryUsedBytes).sum
      if (state > budgetBytes && fired.add(p.runId.toString))
        onFinding(Finding(Option(p.name).getOrElse(""),
          p.runId.toString, p.batchId, state, budgetBytes))
    }
  }

  /** Attach the advisory to every streaming query of `spark`; returns
    * the listener so the caller can [[detach]] it. `onFinding`
    * defaults to a stderr line in the `graft.<site>` convention.
    */
  def attach(spark: SparkSession,
             budgetBytes: Long = Runtime.getRuntime.maxMemory() / 4,
             onFinding: Finding => Unit = f => System.err.println(
               s"[graft.state_advisor] ${f.prescription} " +
                 s"(query=${f.queryName} batch=${f.batchId})"))
      : Listener = {
    require(budgetBytes > 0, s"budgetBytes must be positive: $budgetBytes")
    val l = new Listener(budgetBytes, onFinding)
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: Listener): Unit =
    spark.streams.removeListener(l)
}
