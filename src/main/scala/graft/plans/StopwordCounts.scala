package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-language stopword-hit counts in one pass — the native form of
  * langId's interpreted fold
  * `aggregate(bpeishTokens(text), zeros, (acc, t) => acc + isin(...))`
  * and of qualityMetrics' `size(filter(bpeishTokens(text), isin(en)))`.
  *
  * The fold builds a Catalyst struct per TOKEN and evaluates
  * `langs × |stopwords|` string comparisons per token, interpreted
  * (HOF lambdas get no codegen) — measured 18.6 s for the langId
  * corpus pass at sf10. This expression reuses the exact
  * [[BpeishTokens.tokenize]] token stream (so token semantics are
  * identical by construction, including the non-ASCII slow path) and
  * counts membership via per-language hash sets: one tokenize plus
  * `langs` O(1) lookups per token. Output is `array<long>` of hit
  * counts in the given language order — the same integers the fold
  * produced, so every downstream argmax/ratio is value-identical.
  * StopwordCountsSpec pins expression-vs-chain equality.
  */
case class StopwordCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  require(sets.nonEmpty && sets.forall(_.nonEmpty),
    "StopwordCounts needs at least one non-empty word set")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "stopword_counts"
  override def nullable: Boolean = child.nullable

  // built once per JVM/instance on first use (executor side after
  // deserialization); UTF8String equals/hashCode are byte-wise
  @transient private lazy val lookups: Array[java.util.HashSet[UTF8String]] =
    sets.map { ws =>
      val h = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => h.add(UTF8String.fromString(w)): Unit)
      h
    }.toArray

  /** One tokenize + hash lookups. Called from generated code via a
    * reference object — keep the signature stable.
    */
  def count(s: UTF8String): ArrayData = {
    val toks = BpeishTokens.tokenize(s)
    val counts = new Array[Long](lookups.length)
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      val t = toks.getUTF8String(i)
      var j = 0
      while (j < lookups.length) {
        if (lookups(j).contains(t)) counts(j) += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(s: Any): Any = count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordCounts", this,
      classOf[StopwordCounts].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCounts =
    copy(child = newChild)
}

object StopwordCounts {

  /** Column form: hit counts for `sets`, in order. */
  def apply(text: Column, sets: Seq[Seq[String]]): Column =
    GraftColumnBridge.column(
      StopwordCounts(GraftColumnBridge.expression(text), sets))
}
