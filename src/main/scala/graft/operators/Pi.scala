package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Monte-Carlo π estimation over a 2-D Halton sequence (reference:
  * src/examples/org/apache/hadoop/examples/PiEstimator.java:71-131 —
  * sample i is the low-discrepancy point (halton₂(i), halton₃(i));
  * count samples inside the circle inscribed in the unit square;
  * π ≈ 4·inside/total).
  *
  * Parity claim, precisely: this matches the reference's DIRECT
  * digit-polynomial evaluation (the HaltonSequence constructor).
  * The reference job advances points incrementally
  * (HaltonSequence.nextPoint), whose base-carry step can drift ULPs
  * from the direct polynomial — a count difference would need a
  * sample within ~1e-15 of the circle boundary.
  *
  * The Halton coordinate is a finite digit polynomial
  * `x = Σ_j digit_j(i) · q_j` with `q_j = q_{j-1}/base` — evaluated
  * here as ONE generated arithmetic expression over the sample index,
  * identical in Spark SQL and ANSI/DuckDB SQL (only the integer-div
  * operator differs), so the oracle reproduces every double bit:
  * the coefficient literals are shortest-round-trip decimal strings
  * of the exact iterated-division doubles, and additions associate
  * left-to-right in digit order in both parsers.
  *
  * Scale shape: `spark.range(n)` partitions the index space across
  * the cluster (the reference's one-offset-per-mapper split), the
  * digit polynomial is per-row codegen'd arithmetic with no data
  * input at all, and the result is a single partial/final aggregate —
  * the canonical embarrassingly-parallel job, bounded only by CPU.
  */
object Pi {

  /** Digits needed to cover indexes ≤ n in the given base. */
  private def digitsFor(n: Long, base: Int): Int = {
    var (d, p) = (0, 1L)
    while (p <= n) { d += 1; p *= base }
    d
  }

  /** The Halton digit-polynomial for `idx` (a SQL expression string)
    * in `base`, as SQL arithmetic. `intDiv` is the engine's integer
    * division operator ("DIV" for Spark, "//" for DuckDB).
    */
  private[graft] def haltonExpr(idx: String, base: Int, digits: Int,
                                intDiv: String): String = {
    // q_j by iterated division — the reference's exact doubles
    // (1/3/3 is not the same double as 1/9); shortest-round-trip
    // literals reparse to identical bits in any IEEE engine
    val q = Iterator.iterate(1.0 / base)(_ / base).take(digits).toSeq
    val terms = (0 until digits).map { j =>
      val p = math.pow(base, j).toLong // exact for the digit counts used
      s"CAST((($idx) $intDiv $p) % $base AS DOUBLE) * ${q(j)}"
    }
    terms.mkString("(", " + ", ")")
  }

  /** Inside-the-circle predicate over generated x/y expressions. */
  private def insideExpr(idx: String, n: Long, intDiv: String): String = {
    val x = haltonExpr(idx, 2, digitsFor(n, 2), intDiv)
    val y = haltonExpr(idx, 3, digitsFor(n, 3), intDiv)
    s"(($x) - 0.5) * (($x) - 0.5) + (($y) - 0.5) * (($y) - 0.5) <= 0.25"
  }

  /** Estimate π from `n` Halton samples (indexes 1..n, as the
    * reference's sequence starting at offset 0 yields H(1)...H(n)).
    * Returns one row: (n_points, n_inside, pi_estimate).
    */
  def estimate(spark: SparkSession, n: Long): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    spark.range(1, n + 1)
      .select(expr(insideExpr("id", n, "DIV")).as("inside"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(when(col("inside"), 1L).otherwise(0L)).as("n_inside"))
      .select(col("n_points"), col("n_inside"),
        round(lit(4.0) * col("n_inside").cast("double")
          / col("n_points").cast("double"), 6).as("pi_estimate"))
  }

  /** The DuckDB oracle for [[estimate]] — same digit polynomial,
    * same literals, same association order.
    */
  def oracleSql(n: Long): String = {
    val inside = insideExpr("i", n, "//")
    s"""WITH pts AS (
       |  SELECT CASE WHEN $inside THEN 1 ELSE 0 END AS inside
       |  FROM (SELECT unnest(range(1, ${n + 1})) AS i))
       |SELECT count(*) AS n_points,
       |       CAST(sum(inside) AS BIGINT) AS n_inside,
       |       round(4.0 * CAST(sum(inside) AS DOUBLE)
       |             / CAST(count(*) AS DOUBLE), 6) AS pi_estimate
       |FROM pts""".stripMargin
  }
}
