package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — one `queries` entry (+ `oracleSql` when ANSI-SQL
  * expressible) per implemented operator from SURVEY.md §2.
  *
  * Parity rules used throughout (so Spark and the DuckDB oracle
  * hash-match bit-for-bit):
  *  - money/quantity sums go through DECIMAL(18,2) (exact, order-independent)
  *  - averages are computed from exact decimal sums, divided as doubles,
  *    then rounded — identical operand bits in both engines
  *  - every output column is explicitly aliased identically in both
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.table(s, dir, name)

  /** Flagship query on sf=0.001 (driver smoke-checks rows>0):
    * the Grep pipeline — the reference's own canonical example
    * (reference: src/examples/org/apache/hadoop/examples/Grep.java:57-84).
    */
  def entry(spark: SparkSession): DataFrame =
    TextOps.grep(
      t(spark, "/root/testdata/sf0.001", "documents"),
      col("text"), "s[a-z]+")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.2 map-side text operators -------------------------------
    "q_grep" -> ((s, dir) =>
      TextOps.grep(t(s, dir, "documents"), col("text"), "s[a-z]+")),

    "q_wordcount" -> ((s, dir) =>
      TextOps.wordCount(t(s, dir, "documents"), col("text"))),

    // ---- §2.4 aggregation (TPC-H Q1 shape over the aggregate lib) ---
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
               (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
                col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(28,4)")).as("sum_disc_price"),
          round(sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
                count(lit(1)), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))),
  )

  def oracleSql: Map[String, String] = Map(
    "q_grep" ->
      """SELECT m AS "match", count(*) AS cnt
        |FROM (SELECT unnest(regexp_extract_all(text, 's[a-z]+')) AS m
        |      FROM documents)
        |GROUP BY 1 ORDER BY cnt DESC, m ASC""".stripMargin,

    "q_wordcount" ->
      """SELECT w AS word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS w
        |      FROM documents)
        |WHERE length(w) > 0
        |GROUP BY 1""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price,
        |  sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      AS DECIMAL(28,4))) AS sum_disc_price,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |        / count(*), 4) AS avg_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
  )
}
