package graft

/** Declared worst-case per-group aggregation-buffer size, in bytes,
  * for the engine's typed `Aggregator`s (`udaf(...)` — planned as
  * `ObjectHashAggregateExec` over unmanaged JVM object buffers that
  * Spark's spillable memory manager neither tracks nor spills).
  *
  * The [[graft.meta.Advisor]]'s `object_agg_heap_state` rule reads
  * this bound off the executed plan (groups × bound vs the heap
  * budget) to flag plans whose exact per-group state approaches the
  * heap — the q_uniq_capped-at-sf10 OOM signature, where a
  * 10⁶-entry cap × a handful of groups × one partial map per task
  * was several GB of untracked heap. Implement it on every engine
  * Aggregator whose buffer can grow with a cap or with data;
  * genuinely O(1) buffers declare their small constant.
  */
trait BufferBound {
  /** Worst-case serialized/in-memory footprint of ONE group's buffer,
    * bytes (estimate — order of magnitude is what the advisory needs). */
  def bufferBytesBound: Long
}
