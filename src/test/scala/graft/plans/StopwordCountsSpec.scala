package graft.plans

import graft.SparkSpec
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

/** The native stopword counter must produce the SAME integers as the
  * interpreted chains it replaces — langId's fold and qualityMetrics'
  * filter — on the same BpeishTokens token stream.
  */
class StopwordCountsSpec extends SparkSpec {
  import spark.implicits._

  private val langs = Seq("en", "de", "es", "fr")

  private def foldCounts(c: org.apache.spark.sql.Column) =
    aggregate(TextAnalysis.bpeishTokens(c),
      struct(langs.map(l => lit(0L).as(l)): _*),
      (acc, t) => struct(langs.map(l =>
        (acc.getField(l) + when(t.isin(TextAnalysis.stopwords(l): _*), 1L)
          .otherwise(0L)).as(l)): _*))

  private val cases = Seq(
    "the cat sat on the mat",
    "der hund und die katze",
    "el perro y la casa es grande",
    "le chat est sur la table",
    "no stopwords here whatsoever",
    "THE The the tHe",          // case folds via bpeish lowering
    "the, der. el! le?",        // punct-adjacent stopwords still hit
    "",
    "   ",
    "a to in is it of and the", // every en stopword once
    "the the the the the",      // repeated hits count each time
    "es ist un mix de the und le",  // multi-language overlap
    "Ünïcödé the wörds der höre",   // non-ASCII row (slow tokenize path)
    "汉字 the 汉字 und",
    ("the und el le " * 100).trim)

  test("native counts equal the langId fold on every case") {
    val rows = cases.toDF("t").select(
      StopwordCounts(col("t"), langs.map(TextAnalysis.stopwords)).as("fast"),
      foldCounts(col("t")).as("slow")).collect()
    rows.zip(cases).foreach { case (r, in) =>
      val fast = r.getSeq[Long](0)
      val slow = langs.indices.map(i => r.getStruct(1).getLong(i))
      assert(fast == slow, s"input=${in.take(50)} fast=$fast slow=$slow")
    }
  }

  test("single-set form equals qualityMetrics' filter+isin chain") {
    val en = TextAnalysis.stopwords("en")
    val rows = cases.toDF("t").select(
      get(StopwordCounts(col("t"), Seq(en)), lit(0)).as("fast"),
      size(filter(TextAnalysis.bpeishTokens(col("t")),
        t => t.isin(en: _*))).cast("long").as("slow")).collect()
    rows.zip(cases).foreach { case (r, in) =>
      assert(r.getLong(0) == r.getLong(1),
        s"input=${in.take(50)} fast=${r.getLong(0)} slow=${r.getLong(1)}")
    }
  }

  test("null text yields null counts; langId picks and nulls as before") {
    val df = Seq[(Integer, String)]((1, null), (2, "the cat"),
      (3, "12345 !!!")).toDF("i", "t")
    val r = df.select(
      StopwordCounts(col("t"), langs.map(TextAnalysis.stopwords)).as("c"),
      TextAnalysis.langId(col("t")).as("lang")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(r(1).getString(1) == "en")
    // zero evidence stays null, not a confident argmax of nothing
    assert(r(2).isNullAt(1))
  }

  test("fuzz: 1000 random stopword-dense strings, fold equality") {
    val rnd = new scala.util.Random(16)
    val vocab = langs.flatMap(TextAnalysis.stopwords) ++
      Seq("xyzzy", "Quux", "42", "汉", "café", "'", "the,", "DER.")
    val strs = (1 to 1000).map { _ =>
      (1 to rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val bad = strs.toDF("t").select(
        StopwordCounts(col("t"), langs.map(TextAnalysis.stopwords)).as("fast"),
        foldCounts(col("t")).as("slow"), col("t"))
      .collect()
      .filter { r =>
        r.getSeq[Long](0) != langs.indices.map(i => r.getStruct(1).getLong(i))
      }
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }
}
