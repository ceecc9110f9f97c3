package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming count-min sketch — the continuous twin of
  * [[graft.functions.Sketches.cmsTable]]: per tumbling event-time
  * window, the depth×width counter matrix of the item stream,
  * emitted as (windowStart, r, bucket, cnt) rows when the watermark
  * closes the window.
  *
  * Because the sketch is a pure SUM over items (every occurrence
  * increments the same md5-derived (r, bucket) cells), partial
  * sketches merge exactly by cell-wise addition, whatever the
  * micro-batch arrival order — the emitted table EQUALS the batch
  * operator over the window's rows, so the twin grades against the
  * batch derivation verbatim, like [[StreamSample]] and
  * [[StreamNearDup]].
  *
  * Scale shape: each input partition pre-aggregates its rows into a
  * LOCAL partial sketch map-side and forwards only its non-zero
  * cells (≤ depth·width rows per partition per micro-batch — cells,
  * not items) plus one max-event-time heartbeat (the watermark is
  * re-derived after the pre-aggregation, [[StreamSample]]'s
  * pattern). State per open window is one dense long array of
  * depth·width cells (4×1024 = 32 KB at the defaults) —
  * O(windows in flight · depth · width), independent of stream
  * volume AND key cardinality, evicted on emission. That
  * boundedness is the point: a continuous exact count table over an
  * unbounded key universe grows without limit; the sketch never
  * does, and still answers arbitrary point queries within the CMS
  * error law ([[graft.functions.Sketches.cmsEstimate]] probes the
  * emitted table unchanged).
  */
object StreamCms {

  final case class Item(ts: java.sql.Timestamp, item: String)
  /** A partial-sketch cell (r = −1 ⇒ watermark heartbeat). */
  final case class PartCell(ts: java.sql.Timestamp, windowStart: Long,
                            r: Int, bucket: Long, cnt: Long)
  final case class Cell(windowStart: Long, r: Int, bucket: Long, cnt: Long)
  // public: the state encoder's generated code instantiates it
  final case class CmsState(cells: Array[Long])

  /** The batch operator's bucket derivation, computed stream-side:
    * first 8 hex chars of md5("item:r") mod width — bit-identical to
    * [[graft.functions.Sketches.cmsBucket]]'s Column form.
    */
  private[streaming] def bucket(item: String, r: Int, width: Int): Long =
    graft.functions.Sketches.md5Prefix32(item + ":" + r) % width

  /** Tumbling-window sketching over an item stream (the watermark is
    * applied INSIDE, after the map-side pre-aggregation). Output
    * mode: Append (a window's cells emit exactly once, when the
    * watermark passes the window end; zero cells are omitted,
    * matching the batch table's sparse form).
    */
  def perWindow(events: Dataset[Item], windowMillis: Long,
                watermark: String, depth: Int, width: Int): Dataset[Cell] = {
    require(windowMillis > 0, s"windowMillis must be > 0, got $windowMillis")
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
    implicit val partEnc = Encoders.product[PartCell]
    implicit val outEnc = Encoders.product[Cell]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[CmsState]
    events
      .mapPartitions { it: Iterator[Item] =>
        val parts = scala.collection.mutable.HashMap
          .empty[Long, Array[Long]]
        var maxTs = Long.MinValue
        it.foreach { e =>
          if (e.ts != null && e.item != null) {
            maxTs = math.max(maxTs, e.ts.getTime)
            val w = Math.floorDiv(e.ts.getTime, windowMillis) * windowMillis
            val cells = parts.getOrElseUpdate(w,
              new Array[Long](depth * width))
            var r = 0
            while (r < depth) {
              cells(r * width + bucket(e.item, r, width).toInt) += 1L
              r += 1
            }
          }
        }
        val partial = parts.iterator.flatMap { case (w, cells) =>
          val ts = new java.sql.Timestamp(
            math.min(maxTs, w + windowMillis - 1))
          cells.iterator.zipWithIndex.filter(_._1 > 0L)
            .map { case (cnt, i) =>
              PartCell(ts, w, i / width, (i % width).toLong, cnt) }
        }
        if (maxTs == Long.MinValue) partial
        else partial ++ Iterator(PartCell(new java.sql.Timestamp(maxTs),
          Math.floorDiv(maxTs, windowMillis) * windowMillis, -1, 0L, 0L))
      }
      .withWatermark("ts", watermark)
      .groupByKey(_.windowStart)
      .flatMapGroupsWithState[CmsState, Cell](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (windowStart: Long, batch: Iterator[PartCell],
         state: GroupState[CmsState]) =>
          if (state.hasTimedOut) {
            val cells = state.get.cells
            state.remove()
            cells.iterator.zipWithIndex.filter(_._1 > 0L)
              .map { case (cnt, i) =>
                Cell(windowStart, i / width, (i % width).toLong, cnt) }
          } else {
            val cells = state.getOption.map(_.cells)
              .getOrElse(new Array[Long](depth * width))
            batch.foreach { c =>
              if (c.r >= 0) cells(c.r * width + c.bucket.toInt) += c.cnt
            }
            state.update(CmsState(cells))
            state.setTimeoutTimestamp(
              math.max(windowStart + windowMillis,
                state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
