package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming weighted sample — the continuous twin of
  * [[graft.functions.Sampling.weightedSample]]: per tumbling event-
  * time window, the top-`k` rows by the Efraimidis-Spirakis A-ES
  * draw `u^(1/w)` (u = the md5-derived uniform of `(key, seed)`),
  * emitted exactly once when the watermark closes the window.
  *
  * Because the draw is a PURE function of (key, seed) — no RNG, no
  * arrival-order dependence — the emitted sample is identical to
  * running the batch operator over the window's rows, whatever the
  * micro-batch arrival order: the state merge is just "keep the k
  * largest draws", which is associative, commutative, and
  * idempotent per key. That makes this the rare streaming twin whose
  * output is graded by the batch oracle VERBATIM.
  *
  * Scale shape: the draw and a per-partition top-k pre-thin are
  * map-side, BEFORE the stateful shuffle — each input partition
  * forwards at most k candidates per (window, micro-batch) plus one
  * max-event-time heartbeat row (the watermark is re-derived after
  * the thinning, so thinned-away rows must still advance it; one
  * heartbeat carrying the partition's max ts preserves the
  * per-partition maxima the watermark is computed from). The single
  * per-window state group therefore receives O(partitions · k) rows
  * per trigger, never the stream. State per open window is one
  * bounded list (≤ k entries of (key, weight, draw)) —
  * O(windows in flight · k), independent of volume, evicted on
  * emission. Zero/negative/null weights never enter (A-ES law:
  * weight 0 ⇒ probability 0), same contract as the batch form;
  * FP-equal draws tie-break on key ascending, also as in batch.
  */
object StreamSample {

  final case class Item(ts: java.sql.Timestamp, key: String, weight: Double)
  /** A thinned candidate (null `key` = watermark heartbeat). */
  final case class Cand(ts: java.sql.Timestamp, windowStart: Long,
                        key: String, weight: Double, draw: Double)
  final case class Pick(windowStart: Long, key: String, weight: Double,
                        draw: Double)
  // public: the state encoder's generated code instantiates it
  final case class TopState(picks: List[(String, Double, Double)])

  /** The exact batch draw: md5("key:seed") first 8 hex chars as a
    * 32-bit uniform, raised to 1/weight. Returns None for null keys
    * and non-positive weights (those rows never win).
    */
  def draw(key: String, weight: Double, seed: Long): Option[Double] = {
    if (key == null || weight.isNaN || weight <= 0.0) return None
    val u = graft.functions.Sketches.md5Prefix32(key + ":" + seed)
      .toDouble / 4294967296.0
    // StrictMath, not Math: Spark's Pow expression computes
    // StrictMath.pow, and the stream/batch draw must be bit-identical
    Some(StrictMath.pow(u, 1.0 / weight))
  }

  /** (draw desc, key asc) — the batch twin's ordering. */
  private def better(a: (String, Double, Double),
                     b: (String, Double, Double)): Boolean =
    a._3 > b._3 || (a._3 == b._3 && a._1 < b._1)

  /** Keep the k best of an already-materialized candidate list. */
  private def topK(cands: Seq[(String, Double, Double)],
                   k: Int): List[(String, Double, Double)] =
    cands.sortWith(better).take(k).toList

  /** Tumbling-window A-ES sampling over an item stream (the
    * watermark is applied INSIDE, after the map-side thinning).
    * Output mode: Append (each window's sample emits exactly once,
    * when the watermark passes the window end).
    */
  def perWindow(events: Dataset[Item], windowMillis: Long,
                watermark: String, k: Int,
                seed: Long = 42L): Dataset[Pick] = {
    require(windowMillis > 0, s"windowMillis must be > 0, got $windowMillis")
    require(k >= 1, s"k must be >= 1, got $k")
    implicit val candEnc = Encoders.product[Cand]
    implicit val outEnc = Encoders.product[Pick]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[TopState]
    events
      // map-side pre-thin: each input partition forwards at most k
      // candidates per window per micro-batch plus one heartbeat (a
      // narrow, stateless transform — the two-phase TakeOrdered
      // shape, streaming-legal). Draw-less rows (null key /
      // non-positive weight) die here, but their event time still
      // reaches the watermark via the heartbeat.
      .mapPartitions { it: Iterator[Item] =>
        val best = scala.collection.mutable.HashMap
          .empty[Long, List[(String, Double, Double)]]
        var maxTs = Long.MinValue
        it.foreach { e =>
          if (e.ts != null) {
            maxTs = math.max(maxTs, e.ts.getTime)
            draw(e.key, e.weight, seed).foreach { d =>
              val w = Math.floorDiv(e.ts.getTime, windowMillis) * windowMillis
              val cand = (e.key, e.weight, d)
              val cur = best.getOrElse(w, Nil)
              // insert-then-trim keeps the list ≤ k without
              // re-sorting the whole window on every row
              if (cur.size < k || better(cand, cur.last))
                best(w) = topK(cand :: cur, k)
            }
          }
        }
        val picks = best.iterator.flatMap { case (w, ps) =>
          ps.map { case (key, wt, d) =>
            Cand(new java.sql.Timestamp(math.min(maxTs, w + windowMillis - 1)),
              w, key, wt, d) }
        }
        if (maxTs == Long.MinValue) picks
        else picks ++ Iterator(Cand(new java.sql.Timestamp(maxTs),
          Math.floorDiv(maxTs, windowMillis) * windowMillis,
          null, 0.0, 0.0))
      }
      .withWatermark("ts", watermark)
      .groupByKey(_.windowStart)
      .flatMapGroupsWithState[TopState, Pick](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (windowStart: Long, batch: Iterator[Cand],
         state: GroupState[TopState]) =>
          if (state.hasTimedOut) {
            // watermark passed the window end: finalize and evict
            val s = state.get
            state.remove()
            s.picks.iterator.map { case (key, w, d) =>
              Pick(windowStart, key, w, d) }
          } else {
            val prev = state.getOption.map(_.picks).getOrElse(Nil)
            // heartbeats (null key) only open/refresh the window;
            // dedupe real candidates by key — the same key
            // re-arriving (retries, replays) must not occupy two
            // slots, and draws are deterministic so first-sighting
            // wins exactly
            val merged = (prev.iterator ++
                batch.filter(_.key != null)
                  .map(c => (c.key, c.weight, c.draw)))
              .toSeq.groupBy(_._1).valuesIterator.map(_.head).toSeq
            state.update(TopState(topK(merged, k)))
            // fire when the watermark passes the window end; if it
            // already has (late re-open), emit at the next move
            state.setTimeoutTimestamp(
              math.max(windowStart + windowMillis,
                state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
