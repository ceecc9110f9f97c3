package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-row MinHash signature — the projection form of
  * [[graft.functions.Dedup.minhashSignature]]'s
  * explode + groupBy(doc) + numHashes min-aggregates pipeline.
  *
  * The signature is a pure function of the document's shingle array,
  * yet the aggregate form paid TWO exchanges per corpus to compute
  * it: the skew-spreading repartition(id) ahead of the explode
  * (shuffling the document text itself) and the groupBy(doc_id)
  * hash exchange after it, plus corpus-shingle-count exploded rows
  * through the aggregation machinery. At 100 TB those exchanges
  * carry the corpus twice for values 128 bytes wide per document.
  *
  * Element i equals `min(xxhash64(lit(i), shingle))` over the array:
  * Spark folds multi-argument xxhash64 left-to-right from seed 42, so
  * per hash index the seed is [[XXH64.hashInt]](i, 42) (lit(i) is an
  * IntegerType literal) and each shingle contributes
  * [[XXH64.hashUTF8String]](s, seed_i). A null element leaves the
  * running seed unchanged (Spark's hash expressions skip null
  * children), i.e. contributes seed_i itself — mirrored here; the
  * shingle arrays this fronts are containsNull=false anyway.
  *
  * An EMPTY array yields null (the legacy explode emitted no row, so
  * the doc vanished from the signature table) — callers filter nulls,
  * restoring row-for-row equality. SigProjectionsSpec pins the
  * aggregate-form parity (including the null-text row) and the
  * empty-array → null contract directly.
  */
case class MinhashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> and numHashes >= 1, " +
        s"got ${other.simpleString}, numHashes=$numHashes")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    MinhashSig.compute(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.MinhashSig$$.MODULE$$.compute($c, $numHashes);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {

  /** Column form. */
  def apply(shingles: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinhashSig(GraftColumnBridge.expression(shingles), numHashes))

  private val Seed = 42L

  /** Seeds are tiny and shared across every row of a corpus — cache
    * per numHashes (the engine uses one or two values per session).
    */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  private def seeds(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes, n => {
      val s = new Array[Long](n)
      var i = 0
      while (i < n) { s(i) = XXH64.hashInt(i, Seed); i += 1 }
      s
    })

  /** Called from generated code — keep the signature stable. Returns
    * null for an empty array (the aggregate form emitted no row).
    */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val sd = seeds(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        // a null element leaves the fold at seed_k — it "hashes to"
        // the seed itself, exactly like xxhash64(lit(k), null)
        var k = 0
        while (k < numHashes) {
          if (sd(k) < mins(k)) mins(k) = sd(k)
          k += 1
        }
      } else {
        val s = arr.getUTF8String(i)
        var k = 0
        while (k < numHashes) {
          val h = XXH64.hashUTF8String(s, sd(k))
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
