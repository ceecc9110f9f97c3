package graft.functions

import graft.SparkSpec
import graft.plans.{MinhashSig, SimhashSig, SortedXxhash64Array}
import org.apache.spark.sql.functions._

/** The three per-row signature/set projections must be VALUE-IDENTICAL
  * to the aggregate/HOF pipelines they replace — the minhash family's
  * oracle equality (q_minhash_lsh == q_ngram_jaccard's exact pair set)
  * rides on the signatures and rerank sets being bit-for-bit the same.
  */
class SigProjectionsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "one two",
    "single",
    "",
    "   ",
    "repeat repeat repeat repeat",
    "Unicode wörds ünïcödé 汉字 here",
    "a b c d e f g h i j k l m n o p",
    "punct!@# and $%^ tokens",
    ("lorem ipsum dolor sit amet " * 30).trim)

  private def docs = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")
    .unionByName(Seq((1000L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))

  test("SortedXxhash64Array equals sort_array(transform(.., xxhash64))") {
    val shingled = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.Dedup.shingles(col("text"), 3).as("arr"))
    val bad = shingled.select(
        SortedXxhash64Array(col("arr")).as("fast"),
        sort_array(transform(col("arr"), s => xxhash64(s))).as("slow"))
      .collect()
      .filter(r => r.getSeq[Long](0) != r.getSeq[Long](1))
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("SortedXxhash64Array: null array propagates, null element " +
       "hashes to the seed like the legacy chain") {
    val df = Seq(Tuple1(Seq[String]("a", null, "b")),
                 Tuple1(null.asInstanceOf[Seq[String]]))
      .toDF("arr")
    val r = df.select(
        SortedXxhash64Array(col("arr")).as("fast"),
        sort_array(transform(col("arr"), s => xxhash64(s))).as("slow"))
      .collect()
    assert(r(0).getSeq[Long](0) == r(0).getSeq[Long](1))
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
  }

  test("minhashSignature projection equals the explode+agg witness " +
       "row-for-row") {
    for (numHashes <- Seq(4, 16)) {
      val fast = graft.functions.Dedup.minhashSignature(
        docs, col("doc_id"), col("text"), 3, numHashes)
      val slow = graft.functions.Dedup.minhashSignatureAgg(
        docs, col("doc_id"), col("text"), 3, numHashes)
      val f = fast.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val s = slow.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(f == s, s"numHashes=$numHashes fast=$f slow=$s")
      // null text shingles to [""] (WordShingles' concat_ws semantics),
      // so the null-text doc keeps a row in BOTH forms, sharing the
      // empty-doc signature
      assert(f.contains(1000L) && f(1000L) == f(4L))
    }
  }

  test("simhash projection equals the explode+64-agg witness, " +
       "including empty and null docs") {
    val toks = graft.functions.TextAnalysis.bpeishTokens(col("text"))
    val fast = graft.functions.Dedup.simhashSignaturesFromTokens(
      docs, col("doc_id"), toks)
    val slow = graft.functions.Dedup.simhashSignaturesAgg(
      docs, col("doc_id"), toks)
    val f = fast.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = slow.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f == s, s"fast=$f slow=$s")
    // null text and whitespace-only text keep rows with sig=0 in both
    assert(f(1000L) == 0L && f(4L) == 0L && f(5L) == 0L)
  }

  test("simhash projection equals the ad-hoc HOF form simhash64") {
    val nonNull = docs.filter(col("text").isNotNull)
    val both = nonNull.select(
      coalesce(SimhashSig(
        graft.functions.TextAnalysis.bpeishTokens(col("text"))), lit(0L))
        .as("fast"),
      graft.functions.Dedup.simhash64(col("text")).as("slow"))
    val bad = both.collect().filter(r => r.getLong(0) != r.getLong(1))
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("MinhashSig of an EMPTY array is null (documented contract)") {
    // shinglesRaw can never produce an empty array (null/empty text
    // coalesces to [""]), so this contract is not reachable through
    // the operator pipeline — pin it directly (r16 ADVICE).
    val r = spark.range(1)
      .select(
        MinhashSig(array().cast("array<string>"), 4).as("sig"),
        MinhashSig(array(lit("a")), 4).as("sig1"))
      .head()
    assert(r.isNullAt(0), "empty array must yield a NULL signature")
    assert(!r.isNullAt(1) && r.getSeq[Long](1).size == 4)
  }

  test("random fuzz: 500 docs, minhash + simhash + sorted-set equality") {
    val rnd = new scala.util.Random(13)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "wörd", "x1", "''",
      "kelvin", "data", "spark")
    val strs = (1 to 500).map { _ =>
      val len = rnd.nextInt(30)
      (1 to len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val d = strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val mf = graft.functions.Dedup.minhashSignature(
      d, col("doc_id"), col("text"), 2, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val ms = graft.functions.Dedup.minhashSignatureAgg(
      d, col("doc_id"), col("text"), 2, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(mf == ms)
    val toks = graft.functions.TextAnalysis.bpeishTokens(col("text"))
    val sf = graft.functions.Dedup.simhashSignaturesFromTokens(
      d, col("doc_id"), toks)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ss = graft.functions.Dedup.simhashSignaturesAgg(
      d, col("doc_id"), toks)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sf == ss)
  }
}
