package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass whitespace tokenizer — the native form of the engine's
  * `filter(split(text, "\\s+"), length > 0)` chain
  * ([[graft.functions.TextAnalysis.tokens]]), which fronts the
  * shingle/minhash family, qualityMetrics, chunking, and winnowing
  * (measured 6.7-7.4 s per corpus pass at sf10 vs 2.1-2.4 s for the
  * sibling [[BpeishTokens]] scan — the regex + String round-trip +
  * HOF filter is the cost, not the byte walk).
  *
  * Exactness, for EVERY input (no slow path needed): Java's `\s`
  * without UNICODE_CHARACTER_CLASS is exactly the six ASCII bytes
  * [ \t\n\x0B\f\r], and UTF-8 multi-byte sequences contain no byte
  * below 0x80, so "maximal runs of non-separator bytes" reproduces
  * `Pattern.split("\\s+", -1)` with empties dropped, byte for byte —
  * non-ASCII whitespace (U+00A0, U+2028, …) correctly does NOT split
  * in either form. Tokens alias the source bytes (no copy, no case
  * mapping). WhitespaceTokensSpec pins chain-vs-expression equality
  * over ASCII, Unicode, boundary and empty cases.
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "whitespace_tokens"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    WhitespaceTokens.tokenize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WhitespaceTokens$$.MODULE$$.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)
}

object WhitespaceTokens {

  /** Column form. */
  def apply(text: Column): Column =
    GraftColumnBridge.column(
      WhitespaceTokens(GraftColumnBridge.expression(text)))

  /** One-pass whitespace tokenize. Called from generated code — keep
    * the signature stable.
    */
  def tokenize(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    val src = s.getBytes // may alias the backing array — never mutate
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](8)
    var start = -1
    var i = 0
    while (i < n) {
      val c = src(i)
      val isSep = c == ' ' || (c >= '\t' && c <= '\r') // \t \n \x0B \f \r
      if (isSep) {
        if (start >= 0) {
          out += UTF8String.fromBytes(src, start, i - start)
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) out += UTF8String.fromBytes(src, start, n - start)
    new GenericArrayData(out.toArray)
  }
}
