package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bad-record handling (reference: src/mapred/org/apache/hadoop/
  * mapred/SkipBadRecords.java:51 + SortedRanges.java — skip mode
  * binary-searches and blacklists records that crash the user map
  * function).
  *
  * Spark has no skip mode; the idiomatic equivalent is a total
  * transform: evaluate the expression with failures captured as null
  * (`try_*` semantics), route failed rows to a quarantine side
  * output instead of killing the task. Unlike the reference's
  * re-execution binary search (O(attempts·log n) task restarts), this
  * is single-pass.
  */
object Resilient {

  /** Rows where `result` evaluated, with the result column attached;
    * pair with [[quarantine]] for the failed rows. The caller passes
    * a `try_`-style expression (e.g. `try_to_number`, `try_divide`,
    * or any expression wrapped to null on failure).
    */
  def applied(df: DataFrame, result: Column, as: String): DataFrame = {
    // case-insensitive: Spark's default resolver is, so a name
    // differing only in case would still be silently replaced
    require(!df.columns.exists(_.equalsIgnoreCase(as)),
      s"applied: output column '$as' already exists — withColumn would " +
        "silently replace the user's data")
    df.withColumn(as, result).filter(col(as).isNotNull)
  }

  /** Rows the transform failed on — the skip list, kept for audit
    * exactly like the reference's skipped-records counter/output.
    */
  def quarantine(df: DataFrame, result: Column): DataFrame = {
    val r = graft.Names.fresh("__r", df.columns)
    df.withColumn(r, result).filter(col(r).isNull).drop(r)
  }

  /** One-pass split: (good rows with result, quarantined rows).
    * The input is cached by the caller if both sides are consumed.
    */
  def trySplit(df: DataFrame, result: Column, as: String): (DataFrame, DataFrame) =
    (applied(df, result, as), quarantine(df, result))
}
