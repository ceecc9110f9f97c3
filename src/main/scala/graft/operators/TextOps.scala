package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Map-side text operators from the reference's mapper library
  * (reference: src/mapred/org/apache/hadoop/mapred/lib/RegexMapper.java:46,
  * TokenCountMapper.java:41, InverseMapper.java:37,
  * FieldSelectionMapReduce.java:47-264), re-expressed as DataFrame
  * combinators. Everything here stays inside whole-stage codegen
  * (built-in functions only, no UDFs), so the pattern scan and the
  * partial aggregation fuse into a single stage before the shuffle.
  */
object TextOps {

  /** Grep pipeline (reference: src/examples/org/apache/hadoop/examples/
    * Grep.java:57-84): scan -> regex extract (flatMap) -> partial+final
    * count -> global sort by count desc -> emitted. The reference runs
    * two MR jobs (count, then 1-reducer sort); here the sort is a
    * range-partitioned `orderBy` — scalable, no single-reducer funnel.
    *
    * @param text  column holding the line/document text
    * @param pattern Java regex; every match (group 0) is counted
    */
  def grep(df: DataFrame, text: Column, pattern: String): DataFrame =
    df.select(explode(regexp_extract_all(text, lit(pattern), lit(0))).as("match"))
      .groupBy(col("match"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("match").asc)

  /** Logalyzer analysis pass (reference: src/tools/.../Logalyzer.java:64
    * — LogRegexMapper emits the whole LINE once per regex occurrence,
    * LongSumReducer totals per line, LogComparator sorts the output on
    * `sortCols` (0-based column indices of the `sep`-split line,
    * string ascending)): lines matching `pattern`, with their
    * occurrence counts, column-sorted. Composition of the existing
    * kernels — a codegen'd per-row match count + one partial/final
    * aggregation on the line, then [[graft.operators.Sorting
    * .keyFieldSort]]'s range-partitioned sort (the reference funnels
    * through one reducer; this scales out).
    */
  def logalyze(df: DataFrame, line: Column, pattern: String,
               sortCols: Seq[Int], sep: String = "\t"): DataFrame = {
    require(sortCols.nonEmpty && sortCols.forall(_ >= 0),
      s"sortCols must be non-empty 0-based column indices, got $sortCols")
    val counted = df
      .select(line.as("line"),
        size(regexp_extract_all(line, lit(pattern), lit(0)))
          .cast("long").as("cnt"))
      .filter(col("cnt") > 0)
      .groupBy(col("line")).agg(sum(col("cnt")).as("cnt"))
    // the reference's 0-based columns in keyFieldSort's 1-based DSL
    val spec = sortCols.map(c => s"-k${c + 1},${c + 1}").mkString(" ")
    Sorting.keyFieldSort(counted, col("line"), spec, sep)
  }

  /** WordCount (reference: lib/TokenCountMapper.java:41 +
    * lib/LongSumReducer.java:39): whitespace tokenize -> (token, 1) ->
    * sum. Map-side partial aggregation is automatic (HashAggregate
    * partial/final around the shuffle).
    */
  def wordCount(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(text, "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** InverseMapper (reference: lib/InverseMapper.java:37): (k,v)->(v,k). */
  def inverse(df: DataFrame, key: String, value: String): DataFrame =
    df.select(col(value).as("key"), col(key).as("value"))

  /** Field-selection spec parser (reference:
    * lib/FieldSelectionMapReduce.java:47-137). A spec like
    * `"4,3,0-2,6-"` is a list of single indices and ranges; an
    * open-ended range `n-` means "field n through the last field".
    * Returns (start, end) pairs of 0-based indices, inclusive; a
    * `None` end marks an open-ended tail (expanded at plan build
    * time).
    */
  private[graft] def parseFieldSpec(spec: String): Seq[(Int, Option[Int])] =
    spec.split(",").filter(_.nonEmpty).toSeq.map { tok =>
      if (tok.endsWith("-")) (tok.dropRight(1).toInt, None)
      else if (tok.contains("-")) {
        val Array(a, b) = tok.split("-", 2)
        (a.toInt, Some(b.toInt))
      } else (tok.toInt, Some(tok.toInt))
    }

  /** FieldSelection (reference: lib/FieldSelectionMapReduce.java:138-198):
    * split `value` on `sep`, project the fields named by `spec`
    * (cut(1)-style; ranges inclusive). `maxFields` bounds open-ended
    * ranges — the reference expands them to the record's own width;
    * at scale a fixed schema width is required for a columnar plan,
    * so callers pass the corpus width.
    *
    * Output columns are `f0..fK` in spec order.
    */
  def fieldSelection(df: DataFrame, value: Column, spec: String,
                     sep: String = "\t", maxFields: Int = 16): DataFrame = {
    val parts = split(value, java.util.regex.Pattern.quote(sep))
    val idxs: Seq[Int] = parseFieldSpec(spec).flatMap {
      case (a, Some(b)) => a to b
      case (a, None)    => a until maxFields
    }
    // get() (not getItem): null-safe under ANSI — a record narrower
    // than the spec'd index yields null fields like cut(1), instead
    // of an INVALID_ARRAY_INDEX crash on the first ragged row
    val cols = idxs.zipWithIndex.map { case (fi, i) =>
      get(parts, lit(fi)).as(s"f$i") }
    df.select(cols: _*)
  }
}
