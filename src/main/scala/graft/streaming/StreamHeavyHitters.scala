package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — the continuous twin of
  * [[graft.functions.Sketches.phiHeavyHitters]]: per tumbling event-
  * time window, a Misra-Gries sketch of the item stream, finalized
  * and emitted when the watermark closes the window.
  *
  * State per open window is ONE bounded map (≤ capacity entries) —
  * O(windows in flight · capacity), independent of stream volume,
  * and evicted on emission (event-time timeout). The update step is
  * the exact same kernel as the batch sketch
  * ([[graft.functions.Sketches.mgUpdate]]), so the guarantee carries
  * over per window: every item with count > n/(capacity+1) survives,
  * and emitted counts undercount by at most n/(capacity+1).
  *
  * Unlike the batch operator there is no second exact-count pass (the
  * window's rows are gone when it closes) — output counts are the
  * sketch's lower bounds, and the caller thresholds at
  * ⌈φ·n⌉ − n/(capacity+1) for a no-false-negative cut. The exact
  * batch form is the backfill/repair path, same contract as the
  * other streaming twins (StreamAsOf, StreamDedup).
  */
object StreamHeavyHitters {

  final case class Item(ts: java.sql.Timestamp, item: String)
  // public: the state encoder's generated code instantiates it
  final case class WinState(n: Long, counts: Map[String, Long])
  final case class Hit(windowStart: Long, item: String, minCount: Long,
                       n: Long)

  /** Tumbling-window sketching over a watermarked item stream.
    * Output mode: Append (rows emit exactly once, when the watermark
    * passes the window end).
    */
  def perWindow(events: Dataset[Item], windowMillis: Long,
                watermark: String, capacity: Int): Dataset[Hit] = {
    require(windowMillis > 0, s"windowMillis must be > 0, got $windowMillis")
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    implicit val outEnc = Encoders.product[Hit]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[WinState]
    events
      // match the batch twin: n counts non-null rows only, and a
      // null item/ts must not NPE the window-close sort or the
      // window-key lambda
      .filter((e: Item) => e.item != null && e.ts != null)
      .withWatermark("ts", watermark)
      .groupByKey(e => Math.floorDiv(e.ts.getTime, windowMillis) * windowMillis)
      .flatMapGroupsWithState[WinState, Hit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (windowStart: Long, batch: Iterator[Item],
         state: GroupState[WinState]) =>
          if (state.hasTimedOut) {
            // watermark passed the window end: finalize and evict
            val s = state.get
            state.remove()
            s.counts.toSeq.sortBy { case (k, c) => (-c, k) }.iterator
              .map { case (k, c) => Hit(windowStart, k, c, s.n) }
          } else {
            val m = mutable.HashMap.empty[String, Long]
            var n = 0L
            state.getOption.foreach { s => m ++= s.counts; n = s.n }
            batch.foreach { e =>
              graft.functions.Sketches.mgUpdate(m, e.item, capacity)
              n += 1
            }
            state.update(WinState(n, m.toMap))
            // fire when the watermark passes the window end; a late
            // batch (watermark already past) must still set a future
            // timestamp — emit at the next watermark move instead
            state.setTimeoutTimestamp(
              math.max(windowStart + windowMillis,
                state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
