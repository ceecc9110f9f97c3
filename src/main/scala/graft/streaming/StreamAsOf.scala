package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the live twin of
  * [[graft.operators.Temporal.asOfJoin]]: measurement events pick up
  * the latest snapshot value of their key as the two streams flow.
  *
  * Semantics vs the batch join: state per key is ONLY the latest
  * snapshot (an O(1) pair, like the reference policy loop's per-file
  * EWMA — not a history). When both streams arrive per-key
  * time-ordered (the common ingest case), the output equals the
  * batch as-of join. A point arriving LATE against a newer snapshot
  * is enriched with the latest known snapshot anyway — `snapT` is
  * emitted so consumers can detect `snapT > t` staleness; the batch
  * operator is the exact backfill for those. (Keeping full snapshot
  * history per key would make state O(stream), which is the
  * watermarked-buffer variant this deliberately is not.)
  */
object StreamAsOf {

  final case class Point(key: Long, t: Long, tag: String)
  final case class Snapshot(key: Long, t: Long, value: Double)
  final case class Merged(key: Long, t: Long, isPoint: Boolean,
                          tag: String, value: Double)
  final case class Enriched(key: Long, t: Long, tag: String,
                            snapT: Option[Long], snapValue: Option[Double])
  // public: the state encoder's generated code instantiates it
  final case class Latest(t: Long, value: Double)

  def merged(points: Dataset[Point], snapshots: Dataset[Snapshot])
      : Dataset[Merged] = {
    implicit val enc = Encoders.product[Merged]
    points.map(p => Merged(p.key, p.t, isPoint = true, p.tag, 0.0))
      .union(snapshots.map(s =>
        Merged(s.key, s.t, isPoint = false, "", s.value)))
  }

  /** Enrich each point with its key's latest snapshot at or before
    * it (within-batch: exact as-of via a time sort; across batches:
    * latest-known state). Update output mode.
    */
  def enrich(points: Dataset[Point], snapshots: Dataset[Snapshot])
      : Dataset[Enriched] =
    enrichMerged(merged(points, snapshots))

  /** Default cold-key state TTL — matches [[HeatStream.DefaultStateTtlMs]]. */
  val DefaultStateTtlMs: Long = 7L * 24 * 3600 * 1000

  /** Default lateness allowance (watermark delay) — matches
    * [[HeatStream.DefaultAllowedLatenessMs]].
    */
  val DefaultAllowedLatenessMs: Long = 7L * 24 * 3600 * 1000

  // watermark carrier for the eviction timers (see enrichMerged)
  final case class MergedEt(key: Long, t: Long, isPoint: Boolean,
                            tag: String, value: Double,
                            et: java.sql.Timestamp)

  /** The single-stream form of [[enrich]]: callers that already hold
    * the tagged union (e.g. a file-source replay of an interleaved
    * point/snapshot log — the shape a CDC ingest actually has) skip
    * the two-source union. When the merged stream arrives globally
    * time-ordered (each micro-batch a time slice), the output equals
    * the batch as-of join exactly, because every snapshot with
    * `t <= point.t` is either in the same batch (the in-batch sort
    * sees it) or an earlier one (the per-key state carries it).
    *
    * State lifecycle: a key with no traffic (points OR snapshots)
    * for `stateTtlMs` of EVENT time — measured against the stream's
    * watermark (delay 0, tracking max(t) seen) — is evicted: its
    * latest-snapshot pair leaves the store, so an unbounded CDC
    * keyspace does not grow state forever. A point arriving for an
    * evicted key is enriched with `(None, None)` until a fresh
    * snapshot re-seeds it (the batch as-of join is the exact
    * backfill, as for late data). Event-time (not processing-time)
    * timeout is deliberate: a processing-time timeout makes
    * `FlatMapGroupsWithStateExec.shouldRunAnotherBatch` permanently
    * true — the engine reruns empty micro-batches forever and
    * `processAllAvailable()` never returns.
    *
    * `allowedLatenessMs` is the watermark delay, and it bounds the
    * operator's late-point tolerance: Spark's FMGWS DROPS input rows
    * older than the watermark, so a point (or snapshot) more than
    * this far behind the newest seen `t` is discarded rather than
    * enriched with latest-known state (the batch as-of join is the
    * backfill for those, as the scaladoc above already prescribes).
    * Net lifecycle: a key idle for `allowedLatenessMs + stateTtlMs`
    * of data time leaves the store.
    */
  def enrichMerged(union: Dataset[Merged],
                   stateTtlMs: Long = DefaultStateTtlMs,
                   allowedLatenessMs: Long = DefaultAllowedLatenessMs)
      : Dataset[Enriched] = {
    require(stateTtlMs > 0, s"stateTtlMs must be positive, got $stateTtlMs")
    require(allowedLatenessMs >= 0,
      s"allowedLatenessMs must be >= 0, got $allowedLatenessMs")
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    implicit val outEnc = Encoders.product[Enriched]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[Latest]
    implicit val etEnc = Encoders.product[MergedEt]
    union.withColumn("et", timestamp_millis(col("t")))
      .withWatermark("et", s"$allowedLatenessMs milliseconds")
      .as[MergedEt]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Latest, Enriched](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, batch: Iterator[MergedEt], state: GroupState[Latest]) =>
          if (state.hasTimedOut) {
            // cold-key eviction: forget the latest snapshot. A later
            // point for this key reads as unenriched until re-seeded.
            state.remove()
            Iterator.empty
          } else {
            var latest = state.getOption
            val out = Seq.newBuilder[Enriched]
            // snapshots before points at equal t — the batch join's
            // tie rule (an exactly-simultaneous snapshot is visible)
            val evs = batch.toSeq
            evs.sortBy(m => (m.t, m.isPoint)).foreach { m =>
              if (!m.isPoint) {
                if (latest.forall(_.t <= m.t)) latest = Some(Latest(m.t, m.value))
              } else {
                out += Enriched(key, m.t, m.tag,
                  latest.map(_.t), latest.map(_.value))
              }
            }
            latest.foreach(state.update)
            // only arm the eviction clock when state exists: a batch
            // of points for a never-seeded key leaves nothing to
            // evict. Points AND snapshots both count as traffic. The
            // timer must sit above the current watermark; a key
            // already past its deadline gets the soonest legal one.
            if (state.exists)
              state.setTimeoutTimestamp(math.max(
                evs.map(_.t).max + stateTtlMs,
                state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
