package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token-duplication statistics in ONE pass over the
  * whitespace-token stream — the native form of tokenDupPerDoc's
  * explode + groupBy(doc, tok) + groupBy(doc) pipeline, which
  * shuffled the corpus's (doc, token-TEXT) pairs twice to compute
  * quantities that are pure per-row functions of the token array
  * (q_curation's dominant cost at sf10).
  *
  * Returns struct(n_tokens, n_distinct, tok_chars, distinct_chars):
  * occurrence count, distinct-token count, total token CHARS over
  * occurrences, and token chars over distinct tokens (chars =
  * UTF8String.numChars, i.e. Spark's length()). From these the
  * published repetition fractions derive exactly:
  * dup_token_frac = (n_tokens - n_distinct) / n_tokens and
  * dup_token_char_frac = (tok_chars - distinct_chars) / tok_chars.
  * Token stream = [[WhitespaceTokens.tokenize]], identical to
  * tokens() by construction. TokenStatsSpec pins equality against
  * the legacy aggregation.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = TokenStats.Schema
  override def prettyName: String = "token_stats"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    TokenStats.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TokenStats$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {

  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("tok_chars", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false)))

  /** Column form. */
  def apply(text: Column): Column =
    GraftColumnBridge.column(
      TokenStats(GraftColumnBridge.expression(text)))

  /** One tokenize + one hash-set pass. Called from generated code —
    * keep the signature stable.
    */
  def compute(s: UTF8String): InternalRow = {
    val toks = WhitespaceTokens.tokenize(s)
    val n = toks.numElements()
    val seen = new java.util.HashSet[UTF8String](math.max(16, n * 2))
    var nTok = 0L
    var nDis = 0L
    var chars = 0L
    var disChars = 0L
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val c = t.numChars().toLong
      nTok += 1
      chars += c
      if (seen.add(t)) { nDis += 1; disChars += c }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTok, nDis, chars, disChars))
  }
}
