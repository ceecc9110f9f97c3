package graft.meta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass per-column data profiling — the pre-ingest validation
  * report a training pipeline runs on every new corpus drop (row
  * count, per-column null count, distinct count, min/max), the
  * query-facing generalization of the reference's FsShell-style
  * count/du metadata reports ([[Catalog]]) from files to column
  * CONTENT.
  *
  * Shape: ONE aggregation over the corpus — every column's counters
  * and sketches ride the same partial-aggregate pass, so profiling
  * k columns costs one scan and a single 1-row exchange, not k
  * scans. Distinct counts come from per-column theta sketches:
  * EXACT below 2^lgNomEntries distinct values (which is what lets
  * the report hash-grade against recomputation at test scales) and
  * ±~1% beyond — the bounded-state contract that makes the same
  * code safe on a 100 TB drop where exact per-column COUNT
  * (DISTINCT) state would be the column's key universe
  * ([[Advisor]]'s `exact_distinct_at_scale` rule prescribes exactly
  * this report's machinery).
  *
  * Output: one row per profiled column —
  * `(col_name, n, n_null, n_distinct, min_s, max_s)` with min/max
  * cast to string so mixed-type columns share one schema (integer
  * and string renderings are engine-portable; profile floats
  * through an explicit cast upstream if exact text parity matters).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String],
              lgNomEntries: Int = 20): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = Seq(count(lit(1)).as("__total")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        call_function("theta_sketch_estimate",
          call_function("theta_sketch_agg", col(c), lit(lgNomEntries)))
          .as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row aggregate to a per-column report; stack is
    // a generator but runs over ONE row — no data movement
    val stackExpr = s"stack(${cols.size}, " + cols.map(c =>
      s"'$c', `__n_$c`, `__d_$c`, `__min_$c`, `__max_$c`")
      .mkString(", ") +
      ") AS (col_name, __nn, n_distinct, min_s, max_s)"
    one.select(expr(stackExpr), col("__total"))
      .select(col("col_name"), col("__total").as("n"),
        (col("__total") - col("__nn")).as("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }
}
