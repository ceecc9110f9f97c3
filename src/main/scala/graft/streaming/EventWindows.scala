package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation over a (possibly streaming) event
  * frame — the streaming surface beyond the policy loop (SURVEY
  * §2.9: the reference has no stream processing; this is the
  * additive capability).
  *
  * Works identically on batch and streaming inputs (same plan
  * algebra); on a stream the watermark bounds state: windows older
  * than (max event time - watermark) are finalized and evicted —
  * state per key is O(active windows), not O(history).
  */
object EventWindows {

  // a group column named like a fixed output would make the final
  // select ambiguous — refuse with the offender named. (The window
  // column is resolved via cheap analysis of a one-column select.)
  private def requireGroupClear(events: DataFrame, group: Column,
                                reserved: Set[String]): Unit = {
    val g = events.select(group).columns.head
    require(!reserved.contains(g.toLowerCase),
      s"group column '$g' collides with a fixed output column " +
        s"(${reserved.mkString(", ")}) — alias it first")
  }

  /** Tumbling-window counts/sums per group. `tsName` names the
    * timestamp column — the watermark and the window are BOTH bound
    * to it (a separate Column parameter let the two silently diverge,
    * leaving watermark state that never evicts); `watermark` e.g.
    * "10 minutes"; `windowLen` e.g. "5 minutes".
    */
  def tumbling(events: DataFrame, tsName: String,
               group: Column, watermark: String, windowLen: String,
               value: Column): DataFrame = {
    requireGroupClear(events, group, Set("w_start", "w_end", "n", "total"))
    events
      .withWatermark(tsName, watermark)
      .groupBy(window(col(tsName), windowLen), group)
      .agg(count(lit(1)).as("n"), sum(value).as("total"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        group, col("n"), col("total"))
  }

  /** Gap-based session aggregation — the streaming twin of
    * [[graft.operators.Temporal.sessionize]]: on a stream, session
    * state is watermark-bounded (a session finalizes once the
    * watermark passes its close), so the backfill form and the live
    * form share one definition of "session". Boundary convention
    * (verified against data containing exact-gap pairs —
    * q_stream_sessions hash-matches its oracle at sf0.1, which has
    * two events exactly `gap` apart): `session_window` MERGES an
    * event arriving exactly `gap` after the previous one (the merge
    * test is newStart <= currentEnd on [t, t+gap) windows), i.e. a
    * new session starts only when the inter-event difference is
    * strictly greater than `gap` — the same convention as a lag-form
    * sessionizer breaking on `diff > gap`.
    */
  def sessions(events: DataFrame, tsName: String,
               group: Column, watermark: String, gap: String,
               value: Column): DataFrame = {
    requireGroupClear(events, group, Set("s_start", "s_end", "n", "total"))
    events
      .withWatermark(tsName, watermark)
      .groupBy(session_window(col(tsName), gap), group)
      .agg(count(lit(1)).as("n"), sum(value).as("total"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        group, col("n"), col("total"))
  }
}
