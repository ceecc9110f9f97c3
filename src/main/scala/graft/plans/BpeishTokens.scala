package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass tokenizer — the native form of the engine's shared
  * `filter(split(lower(text), "[^a-z0-9']+"), length > 0)` chain.
  *
  * That chain is the hottest projection in the text family (measured
  * 20.5 s per corpus pass at sf10, and it fronts the LM scorers,
  * TF-IDF, heavy hitters, winnowing, …): per row it materializes a
  * lowered copy, runs java.util.regex over a String round-trip, and
  * then a higher-order filter walks the result again. This
  * expression produces the identical token array in ONE scan over
  * the UTF8String's bytes — ASCII lowering and run-splitting fused,
  * zero regex, zero String round-trip — and stays inside whole-stage
  * codegen (the generated code is a direct static call).
  *
  * Exactness: for pure-ASCII input the byte loop is equivalent by
  * construction (ASCII lower + runs of [a-z0-9']). Any row with a
  * non-ASCII byte takes the slow path, which replicates the original
  * chain literally — `UTF8String.toLowerCase` (Spark's own lower())
  * then `Pattern.split(.., -1)` with empties dropped — so Unicode
  * edge cases where case-mapping crosses into ASCII (U+212A KELVIN
  * SIGN lowers to 'k', U+0130 lowers to "i" + combining dot) keep
  * bit-identical behavior. BpeishTokensSpec pins expression-vs-chain
  * equality over ASCII, Unicode, and the crossing cases.
  */
case class BpeishTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpeish_tokens"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    BpeishTokens.tokenize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.BpeishTokens$$.MODULE$$.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeishTokens =
    copy(child = newChild)
}

object BpeishTokens {

  /** Column form. */
  def apply(text: Column): Column =
    GraftColumnBridge.column(
      BpeishTokens(GraftColumnBridge.expression(text)))

  private val NonToken = Pattern.compile("[^a-z0-9']+")

  /** One-pass ASCII tokenize; non-ASCII rows replicate the legacy
    * lower+regex chain exactly. Called from generated code — keep
    * the signature stable.
    */
  def tokenize(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    val src = s.getBytes // may alias the backing array — never mutate
    var i = 0
    while (i < n) {
      if ((src(i) & 0x80) != 0) return slowTokenize(s)
      i += 1
    }
    // lowered private copy (fromBytes below aliases it, so it must
    // be ours and immutable afterwards)
    val b = new Array[Byte](n)
    var j = 0
    while (j < n) {
      val c = src(j)
      b(j) = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
      j += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](8)
    var start = -1
    var k = 0
    while (k < n) {
      val c = b(k)
      val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        c == '\''
      if (isTok) { if (start < 0) start = k }
      else if (start >= 0) {
        out += UTF8String.fromBytes(b, start, k - start)
        start = -1
      }
      k += 1
    }
    if (start >= 0) out += UTF8String.fromBytes(b, start, n - start)
    new GenericArrayData(out.toArray)
  }

  private def slowTokenize(s: UTF8String): ArrayData = {
    // literal replication of filter(split(lower(text), re), len > 0):
    // UTF8String.toLowerCase IS Spark's lower(), and Spark's split
    // with the default -1 limit is Pattern.split(.., -1); the filter
    // drops the empties split keeps at the boundaries
    val parts = NonToken.split(s.toLowerCase.toString, -1)
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](parts.length)
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) out += UTF8String.fromString(parts(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
