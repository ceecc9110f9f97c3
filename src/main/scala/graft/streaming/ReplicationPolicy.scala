package graft.streaming

import scala.collection.mutable

/** The fork's dynamic-replication policy as a pure, deterministic
  * state machine (reference: src/hdfs/org/apache/hadoop/hdfs/server/
  * namenode/FSNamesystem.java:4389-4573 DynamicReplicationMonitor,
  * FSDirectory.java:1341-1386 EWMA atime).
  *
  * Semantics preserved:
  *  - EWMA heat: `new = (1-α)·old + α·now`, α=0.5 default
  *    (FSDirectory.java:1366-1373, FSNamesystem.java:428)
  *  - access-time update throttle: skip if `now <= ewma + precision`
  *    — inclusive, and measured against the stored EWMA-smoothed time,
  *    because the reference stores the EWMA *as* the atime and compares
  *    the new raw atime against it (30 s cap, FSDirectory.java:1352,
  *    throttle check at FSDirectory.java:1362)
  *  - tiered buckets minRep+1..maxRep with per-bucket minimum-EWMA
  *    tracking (FSNamesystem.java:4399)
  *  - promotion on access into the highest bucket whose min-EWMA the
  *    file meets, or any empty bucket (insertFileIntoNewSet,
  *    FSNamesystem.java:4488-4526); single-block files exempt
  *    (FSNamesystem.java:4427-4430)
  *  - demotion of the coldest half of every bucket by one level when
  *    used capacity exceeds `top` (80 %) (FSNamesystem.java:4453-4480)
  *  - deletion removes the file from the tier sets
  *    (deleteFileFromOldSet, FSNamesystem.java:4530-4545)
  *
  * This object is the single source of truth for the policy; the
  * batch (window-function) and streaming (flatMapGroupsWithState)
  * pipelines both delegate here, and the property tests drive this
  * directly.
  */
object ReplicationPolicy {

  final case class Config(
      alpha: Double = 0.5,           // dfs.dynamic.alpha
      minRep: Int = 3,               // dfs.replication
      maxRep: Int = 6,               // dfs.dynamic.max
      capacityTop: Double = 0.8,     // dfs.dynamic.top
      atimePrecisionMs: Long = 30000 // capped access-time precision
  )

  /** `lastUpdateMs` sentinel for "no access ever applied": a real
    * applied update can legitimately carry timestamp 0 (epoch), so
    * the unseeded marker must be a value no access can produce.
    */
  val Unseeded: Long = Long.MinValue

  final case class FileState(
      path: String,
      blocks: Int,
      sizeBytes: Long,
      rep: Int,
      ewma: Double,          // the heat score (EWMA of access time, ms)
      lastUpdateMs: Long)

  /** One EWMA access update with the precision throttle. Returns the
    * new state and whether the update actually applied.
    *
    * The throttle mirrors FSDirectory.java:1362 exactly: the stored
    * access time IS the EWMA, and the update is skipped when
    * `atime <= storedEwma + precision` (inclusive). Consequence the
    * reference shares: once a hot file's EWMA lags `now` by more than
    * the precision window, every access applies. Deviation (documented):
    * the reference seeds a new file's atime with its creation time; we
    * have no creation clock, so the first observed access seeds the
    * EWMA raw.
    */
  def access(s: FileState, nowMs: Long, cfg: Config): (FileState, Boolean) =
    if (s.lastUpdateMs != Unseeded && nowMs <= s.ewma + cfg.atimePrecisionMs)
      (s, false)
    else {
      val heat =
        if (s.lastUpdateMs == Unseeded) nowMs.toDouble
        else (1 - cfg.alpha) * s.ewma + cfg.alpha * nowMs
      (s.copy(ewma = heat, lastUpdateMs = nowMs), true)
    }

  /** Batch-closed form of the same recurrence: EWMA of xs (ordered
    * oldest→newest) = `α·Σ_{i≥2}(1-α)^{n-i}·x_i + (1-α)^{n-1}·x_1`.
    * Used by the window-function pipeline's oracle and tests.
    */
  def ewmaOf(xs: Seq[Double], alpha: Double): Double =
    xs match {
      case Seq() => 0.0
      case head +: tail =>
        tail.foldLeft(head)((acc, x) => (1 - alpha) * acc + alpha * x)
    }

  /** Whole-namespace policy state: per-rep-level buckets with
    * min-EWMA, mirroring `replicationSets` + `minAccessTimeFile`.
    */
  final class State(val cfg: Config, val clusterCapacityBytes: Long) {
    val files: mutable.LinkedHashMap[String, FileState] = mutable.LinkedHashMap.empty

    def usedBytes: Long = files.valuesIterator.map(f => f.sizeBytes * f.rep).sum

    private def bucket(level: Int): Iterator[FileState] =
      files.valuesIterator.filter(_.rep == level)

    private def bucketMinEwma(level: Int): Option[Double] = {
      val b = bucket(level).map(_.ewma)
      if (b.isEmpty) None else Some(b.min)
    }

    /** Record an access at `nowMs`; runs the EWMA update, then
      * `allocateReplication` (promotion + capacity sweep).
      */
    def recordAccess(path: String, nowMs: Long): Unit = {
      val s0 = files.getOrElse(path, return)
      val (s1, applied) = access(s0, nowMs, cfg)
      files(path) = s1
      if (applied) allocate(path)
    }

    def addFile(path: String, blocks: Int, sizeBytes: Long): Unit =
      files(path) = FileState(path, blocks, sizeBytes, cfg.minRep, 0.0, Unseeded)

    /** Delete hook (FSNamesystem.java:4530-4545). */
    def deleteFile(path: String): Unit = files.remove(path)

    /** allocateReplication (FSNamesystem.java:4425-4484): always
      * attempt the promotion (insertFileIntoNewSet), and THEN run the
      * capacity sweep when usage exceeds the top threshold — the two
      * are sequential in the reference, not alternatives, so an
      * accessed hot file still promotes under capacity pressure (the
      * sweep may immediately demote the coldest half around it).
      */
    def allocate(path: String): Unit = {
      val f = files(path)
      // single-block files are exempt (FSNamesystem.java:4427-4430)
      if (f.blocks <= 1) return
      promote(path)
      if (usedBytes > (clusterCapacityBytes * cfg.capacityTop).toLong)
        demoteSweep()
    }

    /** insertFileIntoNewSet (FSNamesystem.java:4488-4526): scan from
      * max down to rep+1, land in the highest bucket whose min-EWMA
      * the file meets, or the highest empty bucket on the way.
      */
    private def promote(path: String): Unit = {
      val f = files(path)
      var level = cfg.maxRep
      while (level > f.rep) {
        bucketMinEwma(level) match {
          case None =>
            files(path) = f.copy(rep = level); return
          case Some(minE) if f.ewma >= minE =>
            files(path) = f.copy(rep = level); return
          case _ => level -= 1
        }
      }
    }

    /** Capacity sweep (FSNamesystem.java:4456-4480): per bucket above
      * minRep, demote the coldest half (floor) one level.
      */
    def demoteSweep(): Unit =
      ((cfg.minRep + 1) to cfg.maxRep).foreach { level =>
        val b = bucket(level).toSeq.sortBy(f => (f.ewma, f.path))
        b.take(b.size / 2).foreach { f =>
          files(f.path) = f.copy(rep = f.rep - 1)
        }
      }

    /** The actionable output: path → target replication ≠ current
      * default — the `replication_plan` a storage actuator applies.
      */
    def plan(): Seq[(String, Int)] =
      files.valuesIterator.collect {
        case f if f.rep != cfg.minRep => (f.path, f.rep)
      }.toSeq
  }
}
