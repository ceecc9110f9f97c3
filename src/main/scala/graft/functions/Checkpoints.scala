package graft.functions

import org.apache.spark.sql.DataFrame

/** The localCheckpoint lifecycle rule shared by the iterative
  * operators (connected-components closure, BPE training, IVF-PQ
  * index build): a pinned generation's blocks are freed EXPLICITLY
  * the moment a successor (or a smaller derived pin) supersedes it —
  * never while anything live still reads it, since a truncated
  * lineage cannot be recomputed after unpersisting.
  */
private[functions] object Checkpoints {

  /** Free a superseded localCheckpoint generation's blocks. */
  def drop(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
