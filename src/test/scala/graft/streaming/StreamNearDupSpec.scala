package graft.streaming

import graft.SparkSpec
import graft.functions.Dedup
import org.apache.spark.sql.functions._

class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different words appear in this one text"),
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "unrelated content about spark streaming state stores"),
    (6L, ""), (7L, null.asInstanceOf[String]))

  private def runStream(batches: Seq[Seq[(Long, String)]],
                        threshold: Double = 0.5,
                        maxBucket: Int = 4096,
                        maxPairsPerTrigger: Int = 1 << 16,
                        site: String = "stream_neardup",
                        ledger: Boolean = false): Seq[(Long, Long, Double)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val pairs = StreamNearDup.pairs(input.toDF().toDF("doc_id", "text"),
      col("doc_id"), col("text"), shingleN = 3, numHashes = 16,
      bands = 16, threshold = threshold, maxBucket = maxBucket,
      maxPairsPerTrigger = maxPairsPerTrigger, site = site,
      ledger = ledger)
    val name = s"snd_sink_${System.nanoTime()}"
    val q = pairs.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    } finally q.stop()
  }

  private def batchPairs(rows: Seq[(Long, String)],
                         threshold: Double = 0.5): Set[(Long, Long, Double)] =
    Dedup.minhashNearDups(rows.toDF("doc_id", "text"), col("doc_id"),
        col("text"), shingleN = 3, numHashes = 16, bands = 16,
        threshold = threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  test("streamed pairs equal the batch operator, exactly once, " +
       "across batch splits and arrival orders") {
    val expected = batchPairs(corpus)
    assert(expected.map(p => (p._1, p._2)) ==
      Set((1L, 2L), (1L, 4L), (2L, 4L)), expected.toString)
    for (split <- Seq(
        Seq(corpus),                          // single batch
        Seq(corpus.take(3), corpus.drop(3)),  // pair 1-4 across batches
        Seq(corpus.reverse.take(4), corpus.reverse.drop(4)))) { // reversed
      val got = runStream(split)
      assert(got.toSet == expected, s"split=$split got=$got")
      assert(got.size == got.toSet.size,
        s"duplicate emissions (multi-band leak): $got")
    }
  }

  test("identical docs share all 16 bands yet emit one pair row") {
    // docs 1 and 4 are identical -> co-present in every band's
    // bucket; the min-band rule must emit from band 0 only
    val got = runStream(Seq(Seq(corpus(0)), Seq(corpus(3))))
    assert(got == Seq((1L, 4L, 1.0)), got.toString)
  }

  test("maxBucket caps state: the bucket stops pairing at the cap") {
    // three identical docs in one batch; cap=2 admits the first two
    // (docId order), so only the (1,4) pair forms
    val got = runStream(
      Seq(Seq((1L, "aa bb cc dd"), (4L, "aa bb cc dd"), (9L, "aa bb cc dd"))),
      maxBucket = 2)
    assert(got == Seq((1L, 4L, 1.0)), got.toString)
  }

  test("maxPairsPerTrigger budgets emission per bucket-trigger: " +
       "excess OWNED candidates drop and the metrics count them") {
    // four identical docs in ONE batch: every band's bucket sees
    // 1+2+3 = 6 candidate pairs, but only band 0 OWNS them (first-
    // shared-band rule) and only owners charge the budget. Budget 2
    // reranks the first two owned pairs (docId order, newest state
    // first) and drops the remaining 4 — in band 0's group alone;
    // the other 15 groups pay only the signature walk, charge
    // nothing, and never exhaust. The drop is permanent — exactly
    // the documented degrade.
    val four = Seq((1L, "aa bb cc dd"), (2L, "aa bb cc dd"),
      (3L, "aa bb cc dd"), (4L, "aa bb cc dd"))
    val got = runStream(Seq(four), maxPairsPerTrigger = 2,
      site = "snd_budget")
    assert(got.toSet == Set((1L, 2L, 1.0), (2L, 3L, 1.0)), got.toString)
    val m = StreamNearDup.emissionMetrics("snd_budget").get
    // owned-only charging: 4 drops in the one owning group — NOT
    // 4 x 16 groups (non-owners no longer debit the budget)
    assert(m.droppedCandidates.value == 4L, m.droppedCandidates.value)
    assert(m.exhaustedBucketTriggers.value == 1L,
      m.exhaustedBucketTriggers.value)
    // state still grew past the budget: a NEW batch pairs doc 5
    // against all four held docs (budget resets per trigger)
    val twoBatches = runStream(Seq(four, Seq((5L, "aa bb cc dd"))),
      maxPairsPerTrigger = 4, site = "snd_budget2")
    assert(twoBatches.toSet.map((p: (Long, Long, Double)) => (p._1, p._2))
      .contains((4L, 5L)), twoBatches.toString)
    // an ample budget drops nothing and matches the batch operator
    val ample = runStream(Seq(four), site = "snd_ample")
    assert(ample.toSet == batchPairs(four), ample.toString)
    val ma = StreamNearDup.emissionMetrics("snd_ample").get
    assert(ma.droppedCandidates.value == 0L)
    assert(ma.exhaustedBucketTriggers.value == 0L)
  }

  test("ledger=true populates the phase accumulators (sig walk on " +
      "every candidate, rerank only on owned ones); off they stay 0") {
    val four = Seq((1L, "aa bb cc dd"), (2L, "aa bb cc dd"),
      (3L, "aa bb cc dd"), (4L, "aa bb cc dd"))
    runStream(Seq(four), site = "snd_ledger", ledger = true)
    val m = StreamNearDup.emissionMetrics("snd_ledger").get
    // 16 bands x 6 candidate walks, 6 owned reranks: both timed
    assert(m.sigWalkNanos.value > 0L, m.sigWalkNanos.value)
    assert(m.rerankNanos.value > 0L, m.rerankNanos.value)
    runStream(Seq(four), site = "snd_noledger")
    val off = StreamNearDup.emissionMetrics("snd_noledger").get
    assert(off.sigWalkNanos.value == 0L && off.rerankNanos.value == 0L,
      "hot loop must carry no timing when ledger is off")
    // identical output either way
    assert(runStream(Seq(four), site = "snd_l2", ledger = true).toSet ==
      batchPairs(four))
  }

  test("watermark form pairs within ttl and evicts idle buckets") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val hour = 3600L * 1000
    val pairs = StreamNearDup.pairsWithinWatermark(
      input.toDF().toDF("doc_id", "text", "ts"),
      col("doc_id"), col("text"), col("ts"), ttlMs = hour,
      shingleN = 3, numHashes = 16, bands = 16, threshold = 0.5)
    val name = s"snd_wm_${System.nanoTime()}"
    val q = pairs.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      // timestamps start above epoch 0: a row AT the initial
      // watermark (0) is dropped as late by the stateful operator
      // t=1h: doc 1; t=1.5h: doc 2 (same text) -> pair emitted
      input.addData((1L, "aa bb cc dd ee", hour))
      q.processAllAvailable()
      input.addData((2L, "aa bb cc dd ee", hour + hour / 2))
      q.processAllAvailable()
      // watermark advances far past every bucket's ttl -> eviction
      input.addData((99L, "zz yy xx ww vv", 10 * hour))
      q.processAllAvailable()
      // doc 3 (same text as 1/2) after eviction: no partner in state
      input.addData((3L, "aa bb cc dd ee", 10 * hour + 1))
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((1L, 2L)), got.toString)
    } finally q.stop()
  }
}
