package graft.plans

import graft.{Graft, SparkSpec}
import graft.functions.Dedup
import org.apache.spark.sql.functions._

class WordShinglesSpec extends SparkSpec {

  test("native shingles equal the composable form on real documents") {
    val docs = Graft.table(spark, sf, "documents")
    for (n <- Seq(1, 3, 5); distinct <- Seq(false, true)) {
      val native = if (distinct) Dedup.shingles(col("text"), n)
                   else Dedup.shinglesRaw(col("text"), n)
      val witness = if (distinct) Dedup.shinglesComposable(col("text"), n)
                    else Dedup.shinglesRawComposable(col("text"), n)
      val bad = docs.select(native.as("a"), witness.as("b"))
        .filter(not(col("a") === col("b")))
      assert(bad.count() == 0, s"n=$n distinct=$distinct diverged")
    }
  }

  test("native shingles edge cases mirror concat_ws semantics") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a b c d")),      // 2 shingles of 3
      (2L, Some("a b")),          // short doc -> one joined shingle
      (3L, Some("  \t ")),        // whitespace-only -> [""]
      (4L, Some("")),             // empty -> [""]
      (5L, None),                 // null -> [""]
      (6L, Some("x y x y x y")),  // duplicate shingles
      (7L, Some("a\u00A0b c d")),  // NBSP is NOT \s in Java regex
      (8L, Some("tab\tand\nnewline separated tokens"))
    ).toDF("id", "text")
    val rows = df.select(col("id"),
        Dedup.shinglesRaw(col("text"), 3).as("raw"),
        Dedup.shingles(col("text"), 3).as("dis"),
        Dedup.shinglesRawComposable(col("text"), 3).as("rawW"),
        Dedup.shinglesComposable(col("text"), 3).as("disW"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](3), s"raw mismatch id=${r.getLong(0)}")
      assert(r.getSeq[String](2) == r.getSeq[String](4), s"distinct mismatch id=${r.getLong(0)}")
    }
    assert(rows(0).getSeq[String](1) == Seq("a b c", "b c d"))
    assert(rows(1).getSeq[String](1) == Seq("a b"))
    assert(rows(2).getSeq[String](1) == Seq(""))
    assert(rows(4).getSeq[String](1) == Seq(""))
    assert(rows(5).getSeq[String](1) == Seq("x y x", "y x y", "x y x", "y x y"))
    assert(rows(5).getSeq[String](2) == Seq("x y x", "y x y"))
    // unicode edge: NBSP stays inside a token, exactly as split("\\s+")
    assert(rows(6).getSeq[String](1) == Seq("a\u00A0b c d"))
    assert(rows(7).getSeq[String](1).length == 3) // 5 tokens -> 3 shingles
  }
}
