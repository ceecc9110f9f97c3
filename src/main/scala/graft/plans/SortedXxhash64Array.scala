package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Hash-and-sort in one native pass — the fused form of the rerank
  * set builder `sort_array(transform(arr, s => xxhash64(s)))` that
  * every candidate-verifying near-dup path pins per document
  * (minhash, prefix-Jaccard, prefix-containment).
  *
  * The `transform` lambda is interpreted (whole-stage codegen stops at
  * the HOF): each shingle is bound into a lambda variable, hashed
  * through an interpreted xxhash64 expression, and boxed into a fresh
  * array that `sort_array` then walks again. The sets are pinned once
  * per corpus but that pin IS the family's most expensive projection —
  * this expression hashes each element with [[XXH64.hashUTF8String]]
  * at seed 42 (exactly Spark's `xxhash64` on a string) into a primitive
  * long[] and sorts it, one static call inside codegen.
  *
  * Null elements hash to the seed itself (Spark's hash expressions
  * SKIP null children, leaving the seed — they do not yield null), so
  * a null element maps to 42L exactly as the legacy chain does; the
  * shingle arrays this fronts are containsNull=false anyway.
  * SigProjectionsSpec pins chain equality incl. fuzz.
  */
case class SortedXxhash64Array(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_xxhash64_array"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    SortedXxhash64Array.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.SortedXxhash64Array$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): SortedXxhash64Array = copy(child = newChild)
}

object SortedXxhash64Array {

  /** Column form. */
  def apply(arr: Column): Column =
    GraftColumnBridge.column(
      SortedXxhash64Array(GraftColumnBridge.expression(arr)))

  private val Seed = 42L

  /** Called from generated code — keep the signature stable. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) Seed
               else XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
      i += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}
