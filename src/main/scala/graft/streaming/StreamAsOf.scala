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

  /** The single-stream form of [[enrich]]: callers that already hold
    * the tagged union (e.g. a file-source replay of an interleaved
    * point/snapshot log — the shape a CDC ingest actually has) skip
    * the two-source union. When the merged stream arrives globally
    * time-ordered (each micro-batch a time slice), the output equals
    * the batch as-of join exactly, because every snapshot with
    * `t <= point.t` is either in the same batch (the in-batch sort
    * sees it) or an earlier one (the per-key state carries it).
    */
  def enrichMerged(union: Dataset[Merged]): Dataset[Enriched] = {
    implicit val outEnc = Encoders.product[Enriched]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[Latest]
    union.groupByKey(_.key)
      .flatMapGroupsWithState[Latest, Enriched](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, batch: Iterator[Merged], state: GroupState[Latest]) =>
          var latest = state.getOption
          val out = Seq.newBuilder[Enriched]
          // snapshots before points at equal t — the batch join's
          // tie rule (an exactly-simultaneous snapshot is visible)
          batch.toSeq.sortBy(m => (m.t, m.isPoint)).foreach { m =>
            if (!m.isPoint) {
              if (latest.forall(_.t <= m.t)) latest = Some(Latest(m.t, m.value))
            } else {
              out += Enriched(key, m.t, m.tag,
                latest.map(_.t), latest.map(_.value))
            }
          }
          latest.foreach(state.update)
          out.result().iterator
      }
  }
}
