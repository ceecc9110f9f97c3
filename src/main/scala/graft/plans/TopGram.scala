package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document most-frequent word n-gram in ONE pass — the native
  * form of repetitionReport's explode([[WordShingles]]) →
  * groupBy(doc, gram) → window-argmax pipeline, which shuffled the
  * corpus's (doc, gram-TEXT) pairs to compute a quantity that is a
  * pure per-row function of the text (q_repetition's dominant cost
  * at sf10).
  *
  * Returns struct(gram, cnt): the gram with the highest occurrence
  * count, ties broken toward the binary-LARGER gram — exactly the
  * legacy `row_number over (count desc, gram desc)` pick (Spark
  * string ordering is UTF8String byte order, which compareTo
  * reproduces). Gram stream = [[WordShingles.compute]] with
  * distinct=false, identical by construction, including the
  * fewer-than-n-tokens single-joined-shingle edge ("" for token-free
  * docs). TopGramSpec pins equality against the legacy aggregation.
  */
case class TopGram(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input and n >= 1, " +
        s"got ${child.dataType.simpleString}, n=$n")

  override def dataType: DataType = TopGram.Schema
  override def prettyName: String = "top_gram"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    TopGram.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TopGram$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TopGram =
    copy(child = newChild)
}

object TopGram {

  val Schema: StructType = StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** Column form. */
  def apply(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      TopGram(GraftColumnBridge.expression(text), n))

  /** One gram pass + hash-map counts + argmax. Called from generated
    * code — keep the signature stable.
    */
  def compute(s: UTF8String, n: Int): InternalRow = {
    val grams = WordShingles.compute(s, n, distinct = false)
    val m = grams.numElements()
    val counts = new java.util.HashMap[UTF8String, Long](math.max(16, m * 2))
    var i = 0
    while (i < m) {
      val g = grams.getUTF8String(i)
      counts.merge(g, 1L, (a, b) => a + b)
      i += 1
    }
    var bestG: UTF8String = null
    var bestC = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      // higher count wins; equal count -> binary-larger gram (the
      // legacy orderBy(count desc, gram desc) pick)
      if (c > bestC || (c == bestC &&
          (bestG == null || e.getKey.compareTo(bestG) > 0))) {
        bestC = c
        bestG = e.getKey
      }
    }
    new GenericInternalRow(Array[Any](bestG, bestC))
  }
}
