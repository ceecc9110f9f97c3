package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

import scala.collection.concurrent.TrieMap

/** Job counters (reference: src/mapred/org/apache/hadoop/mapred/
  * Counters.java:53,135,370 — named counters aggregated from tasks,
  * the engine's only global-aggregate side channel).
  *
  * Spark-native form: `Dataset.observe` metrics — aggregated on the
  * fly during the job with no extra pass, delivered via listener.
  * Use for row counts / quarantine counts / bytes tallies alongside
  * the main result, exactly what MR counters were for.
  */
object Counters {

  // keyed by (sessionUUID, metric name): two sessions (or two
  // concurrent jobs in different sessions) using the same metric
  // name must not clobber each other's counters. Within ONE session,
  // concurrent queries sharing a name still last-write-win — scope
  // names per job there.
  private val results = TrieMap.empty[(String, String), Row]

  /** Attach named observed metrics to a DataFrame. Metrics surface in
    * [[lastObserved]] after an action completes.
    */
  def observed(df: DataFrame, name: String, metrics: (String, Column)*): DataFrame = {
    val spark = df.sparkSession
    // single lock: a mutable.Set read concurrent with += is unsafe,
    // so even the fast-path check must be inside the synchronized
    registered.synchronized {
      if (!registered.contains(spark)) {
        spark.listenerManager.register(listener)
        registered += spark
      }
    }
    val cols = metrics.map { case (n, c) => c.as(n) }
    df.observe(name, cols.head, cols.tail: _*)
  }

  private val registered = scala.collection.mutable.Set.empty[org.apache.spark.sql.SparkSession]

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val sid = sessionKey(qe.sparkSession)
      qe.observedMetrics.foreach { case (name, row) =>
        results((sid, name)) = row }
    }
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
  }

  // session identity within this JVM — SparkSession exposes no
  // public UUID, and object identity is exactly the scope the
  // listener registration uses
  private def sessionKey(s: org.apache.spark.sql.SparkSession): String =
    Integer.toHexString(System.identityHashCode(s))

  /** The most recent observed metrics row for `name`, if any action
    * has completed. (Listener delivery is asynchronous — tests call
    * `spark.sparkContext.listenerBus.waitUntilEmpty()` equivalent via
    * polling.)
    */
  def lastObserved(spark: org.apache.spark.sql.SparkSession,
                   name: String): Option[Row] =
    results.get((sessionKey(spark), name))
}
