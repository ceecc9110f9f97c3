package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch form of the fork's EWMA heat pipeline (reference:
  * FSDirectory.java:1341-1386): heat over an access log with window
  * functions, and a quantile-tier replication plan.
  *
  * Scale shape: one hash shuffle on the key; the window and the
  * final aggregation reuse that partitioning (no second exchange).
  * The EWMA recurrence is evaluated in closed form
  * (`ReplicationPolicy.ewmaOf`) so it is a single pass, not an
  * iterative join.
  */
object Heat {

  /** Per-key EWMA of `value` over rows ordered by `order` (oldest
    * first): `ewma = α·Σ_{i≥2}(1-α)^{n-i}·x_i + (1-α)^{n-1}·x_1`.
    */
  def ewmaBatch(df: DataFrame, key: Column, order: Seq[Column],
                value: Column, alpha: Double): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    val wAll = Window.partitionBy(key)
    val weighted = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__wx",
        when(col("__rn") === 1,
          value * pow(lit(1 - alpha), col("__n") - 1))
        .otherwise(lit(alpha) * value *
          pow(lit(1 - alpha), col("__n") - col("__rn"))))
    weighted.groupBy(key).agg(round(sum(col("__wx")), 4).as("ewma"))
  }

  /** Batch replication plan: tier by heat quantile — hottest tier
    * gets `maxRep`, coldest `minRep`. The *online* bucket semantics
    * (promotion thresholds, capacity sweep) live in
    * [[ReplicationPolicy.State]]; this is the scan-friendly batch
    * equivalent of a namespace-wide re-tiering, O(1) state per row
    * after one range-partitioned sort.
    */
  def replicationPlan(heat: DataFrame, key: Column, heatCol: Column,
                      minRep: Int = 3, maxRep: Int = 6): DataFrame = {
    val tiers = maxRep - minRep + 1
    val w = Window.orderBy(heatCol.desc, key.asc)
    heat.withColumn("__tile", ntile(tiers).over(w))
      .withColumn("target_rep", lit(maxRep + 1) - col("__tile"))
      .drop("__tile")
  }

  /** Scalable tiering: the global-window `ntile` above is exact but
    * single-partition (fine for heat tables up to ~10^7 files); this
    * variant computes approximate quantile cutoffs in one distributed
    * aggregation and assigns tiers by comparison — no global sort,
    * no single partition, at the cost of quantile-sketch error on
    * tier boundaries.
    */
  def replicationPlanByThreshold(heat: DataFrame, key: Column, heatCol: Column,
                                 minRep: Int = 3, maxRep: Int = 6): DataFrame = {
    val tiers = maxRep - minRep + 1
    val probs = (1 until tiers).map(i => i.toDouble / tiers)
    val cuts = heat.agg(
      percentile_approx(heatCol, lit(probs.toArray), lit(10000)).as("cuts"))
    // tier = count of cutoffs strictly below this heat -> minRep+tier
    heat.crossJoin(broadcast(cuts))
      .withColumn("target_rep",
        (lit(minRep) + size(filter(col("cuts"), c => c < heatCol))).cast("int"))
      .drop("cuts")
  }
}
