package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming form of the policy loop (SURVEY §0.1): the
  * reference runs it synchronously inside the NameNode on every file
  * open; here the access events are a stream and per-file EWMA state
  * lives in `flatMapGroupsWithState`.
  *
  * Scale shape: state is one (ewma, lastUpdate) pair per file key —
  * bounded, partitioned by key across executors, checkpointed by the
  * state store. The capacity sweep (a namespace-wide decision) is
  * batch work over the emitted heat snapshot (`Heat.replicationPlan`
  * per micro-batch via foreachBatch), mirroring how the reference
  * separates the per-access update from the monitor's sweep.
  */
object HeatStream {

  final case class Access(path: String, tsMs: Long)
  final case class HeatRecord(path: String, ewma: Double, lastUpdateMs: Long)

  /** Per-key EWMA updates with the reference's atime throttle.
    * Emits the post-batch heat per touched key (Update-mode style).
    */
  def heatUpdates(events: Dataset[Access],
                  cfg: ReplicationPolicy.Config = ReplicationPolicy.Config())
      : Dataset[HeatRecord] = {
    implicit val heatEnc = Encoders.product[HeatRecord]
    implicit val strEnc = Encoders.STRING
    events.groupByKey(_.path)
      .flatMapGroupsWithState[HeatRecord, HeatRecord](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (path: String, batch: Iterator[Access], state: GroupState[HeatRecord]) =>
          val prev = state.getOption.getOrElse(
            HeatRecord(path, 0.0, ReplicationPolicy.Unseeded))
          // within a micro-batch, apply accesses oldest-first
          var fs = ReplicationPolicy.FileState(
            path, blocks = 2, sizeBytes = 0L, rep = cfg.minRep,
            ewma = prev.ewma, lastUpdateMs = prev.lastUpdateMs)
          batch.toSeq.sortBy(_.tsMs).foreach { e =>
            fs = ReplicationPolicy.access(fs, e.tsMs, cfg)._1
          }
          val next = HeatRecord(path, fs.ewma, fs.lastUpdateMs)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** End-to-end streaming policy: heat updates -> per-micro-batch
    * replication plan appended to `planSink` (an in-memory or table
    * sink path owned by the caller's actuator).
    */
  def run(spark: SparkSession, events: Dataset[Access], queryName: String,
          cfg: ReplicationPolicy.Config = ReplicationPolicy.Config()) = {
    import org.apache.spark.sql.functions.col
    // unpersist the previous micro-batch's plan AND its upstream
    // localCheckpoint blocks — without this the cached blocks
    // accumulate for the stream's whole lifetime. The checkpoint
    // RDDs (created inside replicationPlan's globalRank) are not
    // released by DataFrame.unpersist; they are tracked by RDD id
    // via a before/after diff of the context's persistent-RDD map.
    // (That diff assumes no OTHER job persists RDDs concurrently in
    // this SparkContext during the batch — true for the policy
    // stream's intended one-query deployment.)
    var prevGen: Option[(org.apache.spark.sql.DataFrame, Set[Int])] = None
    var prevPrevGen: Option[(org.apache.spark.sql.DataFrame, Set[Int])] = None
    heatUpdates(events, cfg).writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[HeatRecord], _: Long) =>
        val sc = batch.sparkSession.sparkContext
        val before = sc.getPersistentRDDs.keySet
        // quantile re-tier of the touched files this micro-batch.
        // cache+count materializes every partition — foreachBatch
        // must consume the whole batch or the state store commit
        // validation fails (and the actuator would see partial plans).
        // caching the batch FIRST also makes replicationPlan's two
        // passes (partition histogram + output) read identical data.
        val heat = batch.toDF().cache()
        heat.count()
        val plan = Heat.replicationPlan(heat, col("path"), col("ewma"),
          cfg.minRep, cfg.maxRep).cache()
        plan.count()
        heat.unpersist()
        val newRdds = (sc.getPersistentRDDs.keySet -- before).toSet
        // global view: foreachBatch runs on a cloned session, so a
        // plain temp view would be invisible to the caller's session
        plan.createOrReplaceGlobalTempView(s"${queryName}_plan")
        // unpersist with ONE generation of grace: an actuator that
        // read the view just before the swap may still be scanning
        // the previous plan's cached blocks — dropping them mid-read
        // would force recomputation through localCheckpoint lineage
        // that is not guaranteed to survive executor loss. Two live
        // generations bound the cache at 2× one (tiny) plan plus its
        // checkpointed heat slice.
        prevPrevGen.foreach { case (p, ids) =>
          p.unpersist()
          ids.foreach(id =>
            sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
        }
        prevPrevGen = prevGen
        prevGen = Some((plan, newRdds))
        ()
      }
      .queryName(queryName)
      .start()
  }
}
