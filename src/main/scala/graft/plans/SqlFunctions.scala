package graft.plans

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL-text surface for the native expressions: after
  * `SqlFunctions.registerAll(spark)`, `spark.sql` queries can call
  * `cosine_sim(a, b)`, `hyperplane_sig(v, bits)`,
  * `word_shingles(text, n, distinct)`, `sorted_intersect_count(a, b)`
  * and `int8_dot(a, b)` directly — the same extension
  * point `SparkSessionExtensions.injectFunction` serves at
  * session-build time, exposed for live sessions (the reference's
  * user-code hooks are job-conf class names, SURVEY §2.10; here the
  * hook is Catalyst's function registry).
  *
  * SQL null semantics are the raw expressions' (null input → null
  * result); the Column factories ([[graft.functions.Similarity]],
  * [[graft.functions.Dedup]]) additionally coalesce to match their
  * composable witnesses — use those from Scala.
  */
object SqlFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def boolArg(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  def registerAll(spark: SparkSession): Unit = {
    GraftColumnBridge.registerFunction(spark, "cosine_sim", {
      case Seq(a, b) => CosineSim(a, b)
      case args => throw new IllegalArgumentException(
        s"cosine_sim expects 2 arguments, got ${args.length}")
    })
    GraftColumnBridge.registerFunction(spark, "hyperplane_sig", {
      case Seq(v, bits) => HyperplaneSig(v, intArg(bits, "bits"))
      case args => throw new IllegalArgumentException(
        s"hyperplane_sig expects 2 arguments, got ${args.length}")
    })
    GraftColumnBridge.registerFunction(spark, "word_shingles", {
      case Seq(t, n) => WordShingles(t, intArg(n, "n"), distinct = false)
      case Seq(t, n, d) =>
        WordShingles(t, intArg(n, "n"), boolArg(d, "distinct"))
      case args => throw new IllegalArgumentException(
        s"word_shingles expects 2-3 arguments, got ${args.length}")
    })
    GraftColumnBridge.registerFunction(spark, "sorted_intersect_count", {
      case Seq(a, b) => SortedIntersectCount(a, b)
      case args => throw new IllegalArgumentException(
        s"sorted_intersect_count expects 2 arguments, got ${args.length}")
    })
    GraftColumnBridge.registerFunction(spark, "int8_dot", {
      case Seq(a, b) => Int8Dot(a, b)
      case args => throw new IllegalArgumentException(
        s"int8_dot expects 2 arguments, got ${args.length}")
    })
    GraftColumnBridge.registerFunction(spark, "unicode_normalize", {
      case Seq(t) => UnicodeNormalize(t, "NFC")
      case Seq(t, f) => UnicodeNormalize(t, f match {
        case Literal(v, _) if v != null => v.toString
        case other => throw new IllegalArgumentException(
          s"form must be a string literal, got $other")
      })
      case args => throw new IllegalArgumentException(
        s"unicode_normalize expects 1-2 arguments, got ${args.length}")
    })
  }
}
