package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scan-time row filters from the reference's
  * `SequenceFileInputFilter` (reference: src/mapred/org/apache/hadoop/
  * mapred/SequenceFileInputFilter.java:103 RegexFilter, :148
  * PercentFilter, :198 MD5Filter).
  *
  * All three are plain `filter()` calls so Catalyst pushes them into
  * the parquet scan where the pushdown rules allow (regex stays as a
  * post-scan filter but still runs before any shuffle; the modulo
  * filters prune at the scan for stats-friendly layouts).
  */
object Filters {

  /** RegexFilter: keep records whose key matches (find semantics). */
  def regexFilter(df: DataFrame, key: Column, pattern: String): DataFrame =
    df.filter(key.rlike(pattern))

  /** PercentFilter: keep records where hash(key) % f == 0. The
    * reference uses Java `hashCode()`; for integral keys that is the
    * value itself, which keeps the predicate engine-portable and
    * oracle-checkable. Keys must be numeric(-castable): a
    * non-numeric key fails the ANSI cast loudly rather than silently
    * dropping every row.
    */
  def percentFilter(df: DataFrame, key: Column, frequency: Int): DataFrame = {
    require(frequency >= 1, s"frequency must be >= 1, got $frequency")
    df.filter(pmod(key.cast("long"), lit(frequency.toLong)) === 0)
  }

  /** MD5Filter: keep records whose MD5 falls in a 16^-nibbles slice —
    * deterministic content-hash sampling (reference samples
    * `MD5(key) % f == 0`; we take the leading hex nibbles, same
    * uniform-slice effect, portable across engines).
    */
  def md5Filter(df: DataFrame, key: Column, nibbles: Int = 1): DataFrame = {
    // md5 hex is exactly 32 chars: nibbles > 32 could never match
    // (silently empty), <= 0 matches everything (a sampling no-op) —
    // both are caller bugs, fail loudly like percentFilter
    require(nibbles >= 1 && nibbles <= 32,
      s"nibbles must be in [1, 32], got $nibbles")
    df.filter(substring(md5(key.cast("string")), 1, nibbles) ===
      lit("0" * nibbles))
  }
}
