package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the continuous form of
  * `Dedup.exactDedup` for ingest pipelines: drop records whose key
  * was already seen, with state bounded by the watermark (keys older
  * than the watermark are evicted — O(active window) state, not
  * O(stream history)).
  *
  * Use the content fingerprint (`TextAnalysis.fingerprint`) as the
  * key column for document streams; the state store then holds
  * 16-byte digests, never documents.
  */
object StreamDedup {

  def withinWatermark(events: DataFrame, tsCol: String, watermark: String,
                      keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Unbounded-state variant (exact forever): only for keyspaces
    * known to fit the state store — prefer [[withinWatermark]].
    */
  def exact(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events.dropDuplicates(keyCols)
}
