package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-row 64-bit SimHash — the projection form of
  * [[graft.functions.Dedup.simhashSignaturesFromTokens]]'s
  * explode_outer + groupBy(doc) + 64 sum-aggregates pipeline.
  *
  * The signature is a pure function of the document's token array:
  * per bit b, sum +1/-1 over the tokens' xxhash64 bit b, take the
  * sign. The aggregate form materialized every token as a row, paid
  * the skew-spreading repartition(id) plus the groupBy(doc) exchange,
  * and ran 64 separate sum buffers per doc — here one pass over the
  * array accumulates the 64 counters in registers, inside whole-stage
  * codegen.
  *
  * Exact value equality with the legacy pipeline: token hash =
  * [[XXH64.hashUTF8String]] at seed 42 (Spark's `xxhash64`); null
  * tokens contribute 0 to every bit-sum (the legacy `when(h isNull,
  * 0L)`); zero tokens (or a null/empty array) yield sig = 0 — the
  * legacy explode_outer emitted a single null-token row whose 64 sums
  * were all 0, none > 0. Callers coalesce(.., 0L) a nullable input to
  * keep the null-text row's sig at 0. SigProjectionsSpec pins all of
  * it (aggregate-form parity incl. the null-text row).
  */
case class SimhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    SimhashSig.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.SimhashSig$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

object SimhashSig {

  /** Column form. */
  def apply(tokens: Column): Column =
    GraftColumnBridge.column(
      SimhashSig(GraftColumnBridge.expression(tokens)))

  private val Seed = 42L

  /** Called from generated code — keep the signature stable. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
