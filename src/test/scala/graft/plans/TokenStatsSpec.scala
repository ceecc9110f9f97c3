package graft.plans

import graft.SparkSpec
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

/** The native per-row token stats must reproduce the legacy
  * explode + groupBy(doc, tok) + groupBy(doc) aggregation EXACTLY —
  * q_curation's oracle and repetitionReport's unigram columns derive
  * from that pipeline's semantics (incl. its implicit exclusion of
  * zero-token docs, which never produced an exploded row).
  */
class TokenStatsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-16 pipeline, verbatim. */
  private def legacyDupStats(df: org.apache.spark.sql.DataFrame) = {
    val base = df.filter($"text".isNotNull)
      .select($"doc_id", $"text".as("__text"))
    val tokCnt = base
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("__text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .withColumn("l", length(col("tok")).cast("long"))
    tokCnt.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_tokens"),
      round((sum(col("c")) - count(lit(1))).cast("double") /
        sum(col("c")), 4).as("dup_token_frac"),
      round(sum((col("c") - 1) * col("l")).cast("double") /
        sum(col("c") * col("l")), 4).as("dup_token_char_frac"))
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat the cat"),
    (2L, "all unique words here today"),
    (3L, "same same same same"),
    (4L, "  leading  trailing  "),
    (5L, ""),                    // zero tokens -> excluded
    (6L, "   \t\n"),             // whitespace only -> excluded
    (7L, null.asInstanceOf[String]), // null -> excluded
    (8L, "Case case CASE"),      // whitespace tokens keep case: distinct
    (9L, "汉字 汉字 mixed tokens 汉字"),
    (10L, "a bb ccc a bb a"),
    (11L, ("w1 w2 w3 " * 50).trim))

  test("tokenDupStats equals the legacy two-shuffle aggregation " +
       "row for row, including exclusions") {
    val df = corpus.toDF("doc_id", "text")
    val fast = TextAnalysis.tokenDupStats(df, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val slow = legacyDupStats(df)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(fast.keySet == slow.keySet,
      s"exclusions differ: fast=${fast.keySet} slow=${slow.keySet}")
    assert(!fast.contains(5L) && !fast.contains(6L) && !fast.contains(7L))
    fast.foreach { case (id, v) =>
      assert(v == slow(id), s"doc $id: fast=$v slow=${slow(id)}")
    }
  }

  test("hand-checked fractions") {
    val df = Seq((1L, "a bb a a")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenDupStats(df, $"doc_id", $"text").head
    // 4 tokens, 2 distinct -> dup_token_frac = 2/4
    assert(r.getLong(1) == 4L && r.getDouble(2) == 0.5)
    // chars: occurrences 1+2+1+1 = 5, distinct 1+2 = 3 -> (5-3)/5
    assert(r.getDouble(3) == 0.4)
  }

  test("fuzz: 500 random docs, exact equality with the legacy form") {
    val rnd = new scala.util.Random(26)
    val vocab = Seq("a", "bb", "the", "Zz", "汉", "w'1", "x-y", "9")
    val docs = (1L to 500L).map { i =>
      val n = rnd.nextInt(25)
      (i, if (n == 0 && i % 7 == 0) null
          else (1 to n).map(_ => vocab(rnd.nextInt(vocab.size)))
            .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val fast = TextAnalysis.tokenDupStats(df, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val slow = legacyDupStats(df)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(fast == slow)
  }
}
