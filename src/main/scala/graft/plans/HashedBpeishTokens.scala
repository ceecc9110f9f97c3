package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tokenize-and-hash in one native pass — the fused form of the LM
  * scorers' `transform(bpeishTokens(text), t => xxhash64(t))`
  * projection.
  *
  * The outer `transform` is an interpreted higher-order function:
  * whole-stage codegen stops at the lambda, every token is bound into
  * a lambda variable and hashed through an interpreted xxhash64
  * expression, and the result is re-boxed into a fresh array. The
  * scorers never look at the token TEXT downstream — the hash IS the
  * count key — so materializing a string array just to fold it into
  * longs is pure overhead on the hottest projection of the LM family
  * (the corpus tokenize pass, pinned once per scorer).
  *
  * This expression reuses [[BpeishTokens.tokenize]] verbatim (same
  * token boundaries by construction, including the non-ASCII slow
  * path) and hashes each token with [[XXH64.hashUTF8String]] at seed
  * 42 — the exact function Spark's `xxhash64` applies to a string —
  * so the emitted array<bigint> is value-identical to the legacy
  * chain, with zero interpreted frames and one direct static call in
  * generated code. HashedBpeishTokensSpec pins chain equality over
  * ASCII, Unicode, empties, and fuzz, plus interpreted-vs-codegen
  * agreement.
  */
case class HashedBpeishTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpeish_token_hashes"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    HashedBpeishTokens.tokenizeHashed(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.HashedBpeishTokens$$.MODULE$$.tokenizeHashed($c)")

  override protected def withNewChildInternal(newChild: Expression): HashedBpeishTokens =
    copy(child = newChild)
}

object HashedBpeishTokens {

  /** Column form. */
  def apply(text: Column): Column =
    GraftColumnBridge.column(
      HashedBpeishTokens(GraftColumnBridge.expression(text)))

  /** Spark's xxhash64 seed for the bare `xxhash64(col)` call. */
  private val Seed = 42L

  /** Tokenize via the shared one-pass tokenizer, hash each token with
    * the same function `xxhash64` applies to strings. Called from
    * generated code — keep the signature stable.
    */
  def tokenizeHashed(s: UTF8String): ArrayData = {
    val toks = BpeishTokens.tokenize(s)
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = XXH64.hashUTF8String(
        toks.getUTF8String(i), Seed)
      i += 1
    }
    new GenericArrayData(out)
  }
}
