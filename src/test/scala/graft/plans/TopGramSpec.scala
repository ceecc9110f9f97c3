package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native per-row top-gram pick must reproduce the legacy
  * explode + groupBy(doc, gram) + window row_number((cnt desc,
  * gram desc)) argmax exactly, including the tie-break.
  */
class TopGramSpec extends SparkSpec {
  import spark.implicits._

  private def legacyTop(df: org.apache.spark.sql.DataFrame, n: Int) = {
    import org.apache.spark.sql.expressions.Window
    val grams = df
      .select(col("doc_id"),
        explode(WordShingles(col("text"), n, distinct = false)).as("ng"))
      .groupBy(col("doc_id"), col("ng"))
      .agg(count(lit(1)).as("nc"))
    val byFreq = Window.partitionBy(col("doc_id"))
      .orderBy(col("nc").desc, col("ng").desc)
    grams.withColumn("__rn", row_number().over(byFreq))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("ng"), col("nc"))
  }

  private val corpus = Seq(
    (1L, "a b a b a b c"),           // "a b" x3 dominates
    (2L, "x y z"),                   // all grams unique -> tie on 1
    (3L, "one"),                     // fewer than n tokens
    (4L, ""),                        // token-free -> single "" gram
    (5L, "t t t t t"),               // "t t" x4
    (6L, "b a b a c c c c"),
    (7L, "汉 字 汉 字 汉"),
    (8L, "z a z a y b y b"))         // count tie between "z a","a z"..

  test("native pick equals the legacy window argmax, ties included") {
    for (n <- Seq(1, 2, 3)) {
      val df = corpus.toDF("doc_id", "text")
      val fast = df.select(col("doc_id"),
          TopGram(col("text"), n).as("t"))
        .collect()
        .map(r => r.getLong(0) ->
          (r.getStruct(1).getString(0), r.getStruct(1).getLong(1))).toMap
      val slow = legacyTop(df, n)
        .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2))))
        .toMap
      assert(fast == slow, s"n=$n fast=$fast slow=$slow")
    }
  }

  test("fuzz: 500 docs from a tiny vocabulary (dense count ties), " +
       "exact equality") {
    val rnd = new scala.util.Random(61)
    val vocab = Seq("a", "b", "c", "aa", "Z")
    val docs = (1L to 500L).map { i =>
      (i, (1 to (1 + rnd.nextInt(20)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val fast = df.select(col("doc_id"), TopGram(col("text"), 2).as("t"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getStruct(1).getString(0), r.getStruct(1).getLong(1))).toMap
    val slow = legacyTop(df, 2)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2))))
      .toMap
    assert(fast == slow)
  }

  test("null text yields null struct") {
    val r = Seq[(Long, String)]((1L, null))
      .toDF("doc_id", "text")
      .select(TopGram(col("text"), 2)).collect()
    assert(r(0).isNullAt(0))
  }
}
