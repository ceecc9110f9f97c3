package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification risk auditing — the third leg of the privacy
  * suite next to [[TextAnalysis.scrubPii]] (value scrubbing in
  * flight) and [[graft.sources.Redaction.deleteKeys]] (physical row
  * deletion): BEFORE a table is shared or exported, measure how
  * identifying its quasi-identifier combinations are.
  *
  * A row is k-anonymous when at least k rows share its
  * quasi-identifier tuple (Sweeney, "k-anonymity: a model for
  * protecting privacy", 2002); the operators here report the
  * equivalence classes that violate a chosen k, and the distribution
  * summary an auditor actually reads.
  *
  * Scale shape: one hash aggregation on the quasi-identifier columns
  * (map-side partial counts do the heavy lifting — the class count
  * table is O(distinct tuples), not O(rows)); the summary is a
  * second aggregation over that already-small table. No joins, no
  * windows, no driver materialization.
  */
object Privacy {

  /** Equivalence classes smaller than `k`: one row per violating
    * quasi-identifier tuple with its class size. The export gate is
    * `kAnonymityViolations(df, cols, k).isEmpty`; the rows name
    * exactly which tuples need generalizing or suppressing.
    */
  def kAnonymityViolations(df: DataFrame, quasi: Seq[Column],
                           k: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2 (k=1 is vacuous), got $k")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  /** Equivalence classes (by quasi-identifier tuple) whose SENSITIVE
    * column carries fewer than `l` distinct values — the l-diversity
    * complement of [[kAnonymityViolations]] (Machanavajjhala et al.,
    * "l-diversity: privacy beyond k-anonymity", 2006): a class can
    * be large yet still leak when everyone in it shares the same
    * sensitive value. Returns one row per violating tuple with
    * `(class_size, distinct_sensitive)`. Same single-aggregation
    * scale shape (distinct-count is a partial-aggregating
    * two-phase agg on (quasi, sensitive)).
    */
  def lDiversityViolations(df: DataFrame, quasi: Seq[Column],
                           sensitive: Column, l: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2 (l=1 is vacuous), got $l")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("distinct_sensitive"))
      .filter(col("distinct_sensitive") < l)
  }

  /** One-row audit summary over the equivalence classes:
    * `(n_classes, k_anonymity, n_rows_below_k, pct_rows_below_k)` —
    * `k_anonymity` is the dataset's actual k (the smallest class),
    * `n_rows_below_k` how many ROWS sit in classes under the
    * requested `k`. `pct` is rounded to 4 so the value is
    * engine-portable.
    */
  def kAnonymityReport(df: DataFrame, quasi: Seq[Column],
                       k: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2 (k=1 is vacuous), got $k")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("class_size"))
      .agg(
        count(lit(1)).as("n_classes"),
        min(col("class_size")).as("k_anonymity"),
        coalesce(sum(when(col("class_size") < k, col("class_size"))),
          lit(0L)).as("n_rows_below_k"),
        round(coalesce(sum(when(col("class_size") < k, col("class_size"))),
            lit(0L)).cast("double") * 100.0 /
          sum(col("class_size")).cast("double"), 4).as("pct_rows_below_k"))
  }
}
