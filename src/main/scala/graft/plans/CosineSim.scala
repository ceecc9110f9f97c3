package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two `array<float>` columns.
  *
  * The composable form (`zip_with` + `aggregate`, see
  * [[graft.functions.Similarity.cosine]]) is interpreted per element
  * with boxed lambda dispatch; this expression is one fused primitive
  * loop inside whole-stage codegen — the per-(row, query) kernel of
  * brute-force similarity search, which at 100 TB dominates the scan.
  *
  * Accumulation is double, left-to-right, identical to the composable
  * form — results are bit-equal, so the two are interchangeable under
  * the correctness oracle.
  *
  * (The reference has no expression engine at all — scalar compute
  * lives in user map functions, SURVEY §2.8; this is the Spark-native
  * extension point for it: a Catalyst Expression, not a UDF.)
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must already be array<float|double> (the embeddings
  // contract); no implicit-cast machinery — AbstractDataType is
  // private[sql], so the contract is enforced by checkInputDataTypes
  // instead: misuse fails analysis, not execution (a non-array input
  // would ClassCastException at runtime; an array<int> would silently
  // read garbage bytes via getFloat)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> or array<double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // element accessor must match the stored type: reading a double
  // array with getFloat returns garbage bytes, not a cast
  private def elemIsDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // composable-form parity: zip_with over mismatched lengths pads
    // with null and the sum nulls out — so do we; same for null
    // elements
    if (a.numElements() != b.numElements()) return null
    val aD = elemIsDouble(left); val bD = elemIsDouble(right)
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aD) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bD) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na * nb)
    // zero-norm guard: 0/0 would be NaN, and Spark's double ordering
    // ranks NaN ABOVE every value — a zero vector (padding / failed
    // embedding) would win every top-k and pass every >= threshold
    // filter. Cosine with a zero vector is "no similarity": 0.0.
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getA = if (elemIsDouble(left)) s"$a.getDouble($i)"
                 else s"(double) $a.getFloat($i)"
      val getB = if (elemIsDouble(right)) s"$b.getDouble($i)"
                 else s"(double) $b.getFloat($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $getA;
         |    double $y = $getB;
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    double ${dot}_den = java.lang.Math.sqrt($na * $nb);
         |    ${ev.value} = ${dot}_den == 0.0 ? 0.0 : $dot / ${dot}_den;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column form. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      CosineSim(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
