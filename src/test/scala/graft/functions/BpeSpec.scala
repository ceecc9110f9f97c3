package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent in-memory reference (scan-and-skip form, NOT the
  // fold the operator uses — a genuinely different implementation) ----

  private def refMergeOnce(s: List[String], a: String,
                           b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
        out += a + b; i += 2
      } else { out += s(i); i += 1 }
    }
    out.toList
  }

  private def refPairCounts(vocab: Seq[(List[String], Long)])
      : Map[(String, String), Long] =
    vocab.flatMap { case (s, f) =>
      s.zip(s.drop(1)).map(p => p -> f)
    }.groupMapReduce(_._1)(_._2)(_ + _)

  private def refTrain(words: Map[String, Long],
                       n: Int): Seq[(String, String, Long)] = {
    var vocab = words.toSeq.map { case (w, f) =>
      (w.toList.map(_.toString), f) }
    val rules = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    var round = 0
    var done = false
    while (round < n && !done) {
      val counts = refPairCounts(vocab)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((l, r), cnt) =>
          (-cnt, l, r) }
        rules += ((a, b, c))
        vocab = vocab.map { case (s, f) => (refMergeOnce(s, a, b), f) }
        round += 1
      }
    }
    rules.toSeq
  }

  private val corpus = Seq(
    "low low low low low", "lower lower", "newest newest newest",
    "newest newest newest", "widest widest", "a", "")

  private def corpusWords: Map[String, Long] =
    corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  test("pairCounts equals the reference counts (weighted by word freq)") {
    val docs = corpus.toDF("text")
    val got = Bpe.pairCounts(docs, col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val want = refPairCounts(corpusWords.toSeq.map { case (w, f) =>
      (w.toList.map(_.toString), f) })
    assert(got == want, s"got=$got want=$want")
  }

  test("train learns the reference merge list, rules in rank order") {
    val docs = corpus.toDF("text")
    val got = Bpe.train(docs, col("text"), n = 6)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    val want = refTrain(corpusWords, 6)
    assert(got.toSeq == want, s"got=${got.toSeq} want=$want")
    // sanity on the corpus itself: 'es' (from newest/widest) and the
    // e-s-t fusion must appear early given the frequencies
    assert(got.map(r => r._1 + r._2).contains("es"))
  }

  test("mergeOnce is left-to-right greedy, non-overlapping") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "b", "a", "b"),
      Seq("x"), Seq.empty[String]).toDF("s")
    val got = df.select(Bpe.mergeOnce(col("s"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("aa", "a"))
    assert(got(1) == Seq("a", "b", "a", "b"))
    val got2 = df.select(Bpe.mergeOnce(col("s"), "a", "b").as("m"))
      .collect().map(_.getSeq[String](0))
    assert(got2(1) == Seq("ab", "ab"))
    assert(got2(2) == Seq("x"))
    assert(got2(3) == Seq.empty[String])
  }

  test("applyMerges applies rules in order, each exhaustively") {
    // fuzz against the reference on random letter strings
    val rnd = new scala.util.Random(19)
    val words = (0 until 60).map(_ =>
      (1 to (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString)
    val rules = Seq(("a", "b"), ("b", "c"), ("ab", "c"), ("a", "a"))
    val got = words.toDF("w")
      .select(col("w"), Bpe.applyMerges(col("w"), rules).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      val want = rules.foldLeft(w.toList.map(_.toString)) {
        case (s, (a, b)) => refMergeOnce(s, a, b) }
      assert(got(w) == want, s"word $w: ${got(w)} vs $want")
    }
  }

  test("fixture smoke: documents pair counts are substantial and stable") {
    val docs = graft.Graft.table(spark, sf, "documents")
    val top = Bpe.pairCounts(docs, col("text"))
      .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
      .limit(3).collect()
    assert(top.length == 3)
    assert(top(0).getLong(2) > top(2).getLong(2) ||
      top(0).getLong(2) >= top(2).getLong(2)) // ordered
    assert(top(0).getLong(2) > 100L, s"suspiciously small: ${top(0)}")
  }
}
