package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class NamesSpec extends AnyFunSuite {

  test("fresh grows past exact, derived, and case-variant collisions") {
    assert(Names.fresh("__rn", Seq("a", "b")) == "__rn")
    assert(Names.fresh("__rn", Seq("__rn")) == "__rn_")
    // derived names: a column named "__rn_x" blocks "__rn" AND the
    // grown "__rn_" (it starts with both), so the probe grows twice
    assert(Names.fresh("__rn", Seq("__rn_x")) == "__rn__")
    // Spark resolves names case-insensitively by default, so a
    // case-variant user column must also block the prefix
    assert(Names.fresh("__rn", Seq("__RN")) == "__rn_")
    assert(Names.fresh("__rn", Seq("__Rn_Y", "__rn_")) == "__rn__")
    // multiple frames all probed
    assert(Names.fresh("__s", Seq("a"), Seq("__s")) == "__s_")
  }
}

class NamesSparkSpec extends SparkSpec {
  import spark.implicits._

  test("a case-variant user column survives an operator's scratch names") {
    // end-to-end: withColumn resolves case-insensitively, so without
    // the case-insensitive probe the user's "__DED_RN" would be
    // replaced and dropped by exactDedup's scratch column
    val df = Seq((1L, "dup", "keep1"), (2L, "dup", "keep2"))
      .toDF("id", "text", "__DED_RN")
    val kept = graft.functions.Dedup.exactDedup(df, $"id", $"text")
    assert(kept.columns.toSeq == Seq("id", "text", "__DED_RN"))
    assert(kept.select("__DED_RN").as[String].collect().toSeq == Seq("keep1"))
  }
}
