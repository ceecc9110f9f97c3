package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Join family.
  *
  * The reference has two join stacks:
  *  - map-side merge join of pre-sorted copartitioned inputs with a
  *    composable expression DSL `inner/outer/override` (reference:
  *    src/mapred/org/apache/hadoop/mapred/join/CompositeInputFormat.java:62-176,
  *    InnerJoinRecordReader.java:41, OuterJoinRecordReader.java:41,
  *    OverrideRecordReader.java:93);
  *  - reduce-side tagged join with per-group cross product (reference:
  *    src/contrib/data_join/.../DataJoinMapperBase.java,
  *    DataJoinReducerBase.java:92-214).
  *
  * Here both collapse onto Catalyst joins: `JoinSelection` picks
  * broadcast-hash for small sides (use `broadcast()` to force),
  * sort-merge otherwise, and AQE re-plans skew at runtime. The
  * "pre-sorted copartitioned" fast path is bucketed tables — writing
  * both sides with `bucketBy(n, key).sortBy(key)` makes the SMJ
  * shuffle-free, the direct analog of CompositeInputFormat's contract.
  */
object Joins {

  /** N-way inner join on a shared key (DSL `inner(a, b, ...)`): emit
    * combined row iff *all* sources have the key.
    */
  def innerJoin(dfs: Seq[DataFrame], key: String): DataFrame =
    dfs.reduce(_.join(_, Seq(key), "inner"))

  /** N-way full-outer join (DSL `outer(a, b, ...)`): emit iff *any*
    * source has the key; absent slots are null — Spark's outer-join
    * null is exactly TupleWritable's unwritten-slot bitmask.
    */
  def outerJoin(dfs: Seq[DataFrame], key: String): DataFrame =
    dfs.reduce(_.join(_, Seq(key), "full_outer"))

  /** Override join (DSL `override(a, b, ...)`): per key, the value
    * columns come from the *rightmost* source that has the key.
    * Implemented as a fold of full-outer joins with rightmost-wins
    * `coalesce` per value column; each input must be unique per key
    * (the reference reads one record per source per key too).
    *
    * @param valueCols per-source value column names, positionally
    *        aligned: output column i is named `valueCols.head(i)`.
    */
  def overrideJoin(dfs: Seq[DataFrame], key: String,
                   valueCols: Seq[Seq[String]]): DataFrame = {
    require(dfs.nonEmpty && dfs.size == valueCols.size)
    val outNames = valueCols.head
    valueCols.zipWithIndex.foreach { case (vcs, i) =>
      require(vcs.size == outNames.size,
        s"overrideJoin: source $i has ${vcs.size} value columns, " +
          s"expected ${outNames.size} (positional alignment — zip would " +
          "silently drop the extras / die late on the missing)")
    }
    // presence flag per source: "rightmost source that HAS the key"
    // wins even when its value is null — a bare coalesce on the value
    // would silently resurrect an overridden value. The flag's name
    // is probed fresh (an output column named __has would otherwise
    // make the r.__has reference ambiguous)
    val has = graft.Names.fresh("__has",
      Seq(key), outNames, dfs.flatMap(_.columns))
    val normalized = dfs.zip(valueCols).map { case (df, vcs) =>
      df.select(col(key) +:
        (vcs.zip(outNames).map { case (c, o) => col(c).as(o) } :+
         lit(true).as(has)): _*)
    }
    val folded = normalized.reduce { (acc, next) =>
      val joined = acc.alias("l").join(next.alias("r"), Seq(key), "full_outer")
      val rHas = col(s"r.$has") === true
      joined.select(
        (col(key) +:
         outNames.map(c => when(rHas, col(s"r.$c")).otherwise(col(s"l.$c")).as(c))) :+
        lit(true).as(has): _*)
    }
    folded.drop(has)
  }

  /** Semi/anti joins — not named operators in the reference (hand-
    * rolled in reducers); first-class here. Broadcast the filter side
    * when it is small.
    */
  def semiJoin(df: DataFrame, filterDf: DataFrame, key: String): DataFrame =
    df.join(filterDf, Seq(key), "left_semi")

  def antiJoin(df: DataFrame, filterDf: DataFrame, key: String): DataFrame =
    df.join(filterDf, Seq(key), "left_anti")

  /** The composable join-expression DSL (reference:
    * join/CompositeInputFormat.java:62-86 + the shift-reduce parser
    * join/Parser.java:46-65): `inner(a, b, ...)`, `outer(a, b, ...)`,
    * `override(a, b, ...)`, `tbl(name)`, arbitrarily nested — e.g.
    * `"outer(inner(tbl(a), tbl(b)), tbl(c))"`.
    *
    * `resolve` maps a table name to a DataFrame whose first column is
    * the shared join key (the reference's "same key class" contract);
    * `override` uses the remaining columns positionally.
    */
  sealed trait JoinExpr
  final case class Tbl(name: String) extends JoinExpr
  final case class Composite(op: String, children: Seq[JoinExpr]) extends JoinExpr

  private[graft] def parseJoinExpr(s: String): JoinExpr = {
    val (e, rest) = parseOne(s.replaceAll("\\s+", ""))
    require(rest.isEmpty, s"trailing input: '$rest'")
    e
  }

  private def parseOne(s: String): (JoinExpr, String) = {
    val m = "^([a-zA-Z_][a-zA-Z0-9_]*)\\((.*)$".r
    s match {
      case m("tbl", rest) =>
        val end = rest.indexOf(')')
        require(end > 0, s"bad tbl ref near '$rest'")
        (Tbl(rest.substring(0, end)), rest.substring(end + 1))
      case m(op, rest0) if Set("inner", "outer", "override")(op) =>
        var rest = rest0
        val kids = Seq.newBuilder[JoinExpr]
        var done = false
        while (!done) {
          val (kid, r) = parseOne(rest)
          kids += kid
          if (r.startsWith(",")) rest = r.substring(1)
          else if (r.startsWith(")")) { rest = r.substring(1); done = true }
          else throw new IllegalArgumentException(s"expected , or ) near '$r'")
        }
        (Composite(op, kids.result()), rest)
      case _ => throw new IllegalArgumentException(s"cannot parse '$s'")
    }
  }

  /** Evaluate a join expression against a table resolver. The key is
    * the first column of every resolved table (renamed to the first
    * table's key name).
    */
  def compositeJoin(expr: String, resolve: String => DataFrame): DataFrame = {
    def eval(e: JoinExpr): DataFrame = e match {
      case Tbl(name) => resolve(name)
      case Composite(op, kids) =>
        val dfs = kids.map(eval)
        val key = dfs.head.columns.head
        val aligned = dfs.map { df =>
          df.withColumnRenamed(df.columns.head, key)
        }
        // inner/outer: sources sharing a value-column name would emit
        // duplicate output columns — unusable by name, and ambiguous
        // inside any surrounding expression. Reject with the
        // offenders named. (override is exempt: positional alignment
        // with rightmost-wins is exactly the shared-name case.)
        if (op != "override") {
          // the key name participates too: a source value column named
          // like the join key would otherwise die later with an opaque
          // AMBIGUOUS_REFERENCE inside the join itself
          val dupes = (key +: aligned.flatMap(_.columns.drop(1)))
            .groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
          require(dupes.isEmpty,
            s"compositeJoin '$op': column name(s) " +
              s"${dupes.mkString(", ")} appear in more than one source " +
              "(or collide with the join key) — alias them apart first " +
              "(the composed frame would carry ambiguous duplicate columns)")
        }
        op match {
          case "inner" => innerJoin(aligned, key)
          case "outer" => outerJoin(aligned, key)
          case "override" =>
            overrideJoin(aligned, key, aligned.map(_.columns.drop(1).toSeq))
        }
    }
    eval(parseJoinExpr(expr))
  }

  /** Reduce-side tagged join, faithfully: group both inputs by key,
    * buffer each side's records per group, emit the cross product —
    * `DataJoinReducerBase.joinAndCollect` as a `cogroup`. This is the
    * escape hatch for join logic Catalyst can't express (arbitrary
    * per-group code); for plain equi-joins prefer `innerJoin`, which
    * gets broadcast/SMJ/AQE instead of buffering groups in memory.
    *
    * Memory: like the reference, one group's records per side must fit
    * in an executor's heap. The shuffle is a single hash exchange per
    * side on the key.
    */
  def dataJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String): DataFrame = {
    val outSchema = StructType(left.schema.fields ++ right.schema.fields)
    val lIdx = left.schema.fieldIndex(leftKey)
    val rIdx = right.schema.fieldIndex(rightKey)
    // the key is grouped NATIVELY (single-field row encoder), not
    // stringified: int 1 and string "1" must not collide, and keys
    // shuffle as unsafe rows instead of boxed strings. Like the
    // reference (same key class on both sides), mismatched key types
    // are a caller error, not an implicit cast. Null keys are dropped
    // up front: an equi-join never matches null = null (Catalyst
    // parity), and the encoder field is forced nullable so a null on
    // either side cannot crash encoding before the filter.
    val lType = left.schema.fields(lIdx).dataType
    val rType = right.schema.fields(rIdx).dataType
    require(lType == rType,
      s"dataJoin key types must match: $leftKey is $lType, $rightKey is $rType")
    val keyEnc = Encoders.row(StructType(Seq(
      left.schema.fields(lIdx).copy(name = "k", nullable = true))))
    val keyedableL = left.filter(col(leftKey).isNotNull)
      .groupByKey((r: Row) => Row(r.get(lIdx)))(keyEnc)
    val keyedR = right.filter(col(rightKey).isNotNull)
      .groupByKey((r: Row) => Row(r.get(rIdx)))(keyEnc)
    val out = keyedableL.cogroup(keyedR) { (_, ls, rs) =>
      // buffer the (usually smaller) right side once, stream the left
      val rBuf = rs.toArray
      if (rBuf.isEmpty) Iterator.empty
      else ls.flatMap(l => rBuf.iterator.map(r => Row.fromSeq(l.toSeq ++ r.toSeq)))
    }(Encoders.row(outSchema))
    out.toDF()
  }
}
