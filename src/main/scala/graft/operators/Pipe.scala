package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** External-process transform — Hadoop Streaming's capability
  * (reference: src/contrib/streaming/.../PipeMapRed.java:283-362,
  * PipeMapper.java, PipeReducer.java): records framed as
  * tab-separated lines over the child's stdin/stdout.
  *
  * `RDD.pipe` preserves the line protocol exactly: one input record
  * per stdin line, one output record per stdout line, the child
  * process is forked once per partition (like one per task in the
  * reference). Because an external process is opaque to Catalyst
  * (no pushdown, no codegen through it), pipe stages should sit
  * behind the narrowest possible projection.
  */
object Pipe {

  /** Pipe the given columns (tab-joined, like streaming's
    * `stream.map.output.field.separator`) through `command`; each
    * stdout line becomes a row in the single `value` column.
    */
  def pipe(df: DataFrame, command: String, cols: Column*): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val selected = if (cols.isEmpty) df else df.select(cols: _*)
    // concat_ws SKIPS nulls (shifting fields for the child); Hadoop
    // Streaming emits an empty field — coalesce each column to ""
    val lines = selected.select(
      concat_ws("\t", selected.columns.toIndexedSeq
        // backtick-quoted: a bare col("a.b") would parse the dot as
        // struct access and die on legal dotted column names
        .map(c => coalesce(col("`" + c.replace("`", "``") + "`")
          .cast("string"), lit(""))): _*).as("line"))
    lines.rdd.map(_.getString(0)).pipe(command).toDF("value")
  }

  /** Pipe then split stdout lines back into (key, value) on the first
    * tab — the PipeReducer output contract.
    */
  def pipeKV(df: DataFrame, command: String, cols: Column*): DataFrame =
    graft.sources.MultiIO.keyValueText(pipe(df, command, cols: _*), col("value"))

  /** ChainMapper/ChainReducer (reference: lib/Chain.java): compose
    * transforms with no intermediate materialization. Catalyst fuses
    * adjacent narrow transforms into one whole-stage-codegen'd stage
    * by construction — this combinator only preserves the reference's
    * API shape.
    */
  def chain(df: DataFrame, stages: (DataFrame => DataFrame)*): DataFrame =
    stages.foldLeft(df)((acc, f) => f(acc))
}
