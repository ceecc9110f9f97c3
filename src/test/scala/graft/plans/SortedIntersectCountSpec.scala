package graft.plans

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.functions._

class SortedIntersectCountSpec extends SparkSpec {

  test("merge count equals size(array_intersect) on sorted distinct sets") {
    // real shingle sets: every ordered doc pair in a small corpus
    val docs = Graft.table(spark, sf, "documents").limit(60)
      .select(col("doc_id"),
        sort_array(graft.functions.Dedup.shingles(col("text"), 3)).as("sh"))
    val pairs = docs.alias("a").join(docs.alias("b"),
      col("a.doc_id") < col("b.doc_id"))
    val cmp = pairs.select(
      SortedIntersectCount(col("a.sh"), col("b.sh")).as("fast"),
      size(array_intersect(col("a.sh"), col("b.sh"))).as("ref"))
    assert(cmp.filter(col("fast") =!= col("ref")).count() == 0)
    assert(cmp.filter(col("fast") > 0).count() > 0) // non-vacuous
  }

  test("edge cases: empty, disjoint, identical, null") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq("a", "b", "c")), Some(Seq("b", "c", "d"))), // 2 common
      (Some(Seq.empty[String]), Some(Seq("x"))),            // empty side
      (Some(Seq("a")), Some(Seq("b"))),                     // disjoint
      (Some(Seq("a", "b")), Some(Seq("a", "b"))),           // identical
      (None, Some(Seq("a")))                                // null side
    ).toDF("x", "y")
    val got = df.select(SortedIntersectCount($"x", $"y")).collect()
    assert(got(0).getInt(0) == 2)
    assert(got(1).getInt(0) == 0)
    assert(got(2).getInt(0) == 0)
    assert(got(3).getInt(0) == 2)
    assert(got(4).isNullAt(0))
    // null ELEMENT: defined (null result), not an NPE
    val nullElem = Seq((Seq(Some("a"), None), Seq(Some("a"), Some("b"))))
      .toDF("x", "y")
    assert(nullElem.select(SortedIntersectCount($"x", $"y"))
      .collect().head.isNullAt(0))
  }
}
