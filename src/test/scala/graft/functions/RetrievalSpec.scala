package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark spark spark engine"),       // tf(spark)=3, dl=4
    (2L, "spark engine engine engine"),     // tf(spark)=1, dl=4
    (3L, "engine engine"),                  // no query term
    (4L, "spark")                           // tf=1, shortest doc
  ).toDF("doc_id", "text")

  /** Reference scorer with the same formula/rounding. */
  private def expected(queryTf: Map[Long, Map[String, Long]],
                       dls: Map[Long, Long], nDocs: Long,
                       k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val avgdl = dls.values.sum.toDouble / nDocs
    val dfs = queryTf.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    queryTf.map { case (id, tfs) =>
      val s = tfs.map { case (t, tf) =>
        val idf = math.log(
          (nDocs.toDouble - dfs(t).toDouble + 0.5) / (dfs(t).toDouble + 0.5)
            + 1.0)
        idf * (tf.toDouble * (k1 + 1.0)) /
          (tf.toDouble + k1 * (1.0 - b + b * dls(id).toDouble / avgdl))
      }.sum
      id -> BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
  }

  test("bm25TopK matches the hand formula and ranks by tf") {
    val got = Retrieval.bm25TopK(corpus, $"doc_id", $"text", Seq("spark"))
      .as[(Int, Long, Double)].collect()
    val want = expected(
      Map(1L -> Map("spark" -> 3L), 2L -> Map("spark" -> 1L),
        4L -> Map("spark" -> 1L)),
      dls = Map(1L -> 4L, 2L -> 4L, 3L -> 2L, 4L -> 1L), nDocs = 4)
    assert(got.map(_._2).toSeq == Seq(1L, 4L, 2L),
      "tf=3 first; among tf=1 the shorter doc (less length-normalized " +
        "penalty) outranks")
    got.foreach { case (_, id, score) =>
      assert(math.abs(score - want(id)) < 1e-9, s"doc $id: $score vs ${want(id)}")
    }
    assert(got.map(_._1).toSeq == Seq(1, 2, 3), "rank is 1-based, dense")
    // doc 3 has no query term — absent, not zero-scored
    assert(!got.exists(_._2 == 3L))
  }

  test("bm25TopK k cutoff and deterministic doc_id tie-break") {
    val ties = Seq.tabulate(6)(i => (i.toLong, "spark")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(ties, $"doc_id", $"text", Seq("spark"), k = 4)
      .as[(Int, Long, Double)].collect()
    assert(got.length == 4)
    assert(got.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L),
      "equal scores break ties on ascending doc_id")
  }

  test("bm25TopK lowercases query terms (tokenizer is case-insensitive)") {
    val got = Retrieval.bm25TopK(corpus, $"doc_id", $"text", Seq("SPARK"))
      .as[(Int, Long, Double)].collect()
    assert(got.map(_._2).toSet == Set(1L, 2L, 4L))
  }

  test("tfidfTopTerms scores tf·ln(N/df) and ranks per doc") {
    // N=4; df(spark)=3 (docs 1,2,4), df(engine)=3 (docs 1,2,3) →
    // both idfs are ln(4/3); a term in every doc would score 0
    val got = Retrieval.tfidfTopTerms(corpus, $"doc_id", $"text", k = 2)
      .as[(Long, Int, String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: spark tf=3 → 3·ln(4/3) ≈ 0.8630; engine tf=1 → ln(4/3)
    val d1 = got(1L)
    assert(d1.map(t => (t._3, t._4, t._5)).toSeq ==
      Seq(("spark", 3L, r4(3 * math.log(4.0 / 3.0))),
          ("engine", 1L, r4(math.log(4.0 / 3.0)))))
    // doc 2: engine tf=3 → 3·ln(2) beats spark tf=1 → ln(4/3)
    assert(got(2L).map(_._3).toSeq == Seq("engine", "spark"))
    // doc 4 has one term → one row, rank 1
    assert(got(4L).map(t => (t._2, t._3)).toSeq == Seq((1, "spark")))
  }

  test("invertedIndex: df counts all docs, postings capped and sorted") {
    val df = Seq.tabulate(7)(i => (i.toLong, "spark common"))
      .toDF("doc_id", "text")
      .union(Seq((7L, "rare")).toDF("doc_id", "text"))
    val got = Retrieval.invertedIndex(df, $"doc_id", $"text",
        maxPostings = 3)
      .as[(String, Long, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got("spark") == ((7L, "0,1,2")),
      "df counts every doc; postings stop at the cap, ascending")
    assert(got("common") == ((7L, "0,1,2")))
    assert(got("rare") == ((1L, "7")))
  }

  test("invertedIndex counts a repeated term once per doc") {
    val df = Seq((3L, "x x x"), (1L, "x y")).toDF("doc_id", "text")
    val got = Retrieval.invertedIndex(df, $"doc_id", $"text")
      .as[(String, Long, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got("x") == ((2L, "1,3")))
    assert(got("y") == ((1L, "1")))
  }

  test("tfidfTopTerms breaks score ties on ascending term") {
    val df = Seq((1L, "b a"), (2L, "c d")).toDF("doc_id", "text")
    // within doc 1 both terms have tf=1, df=1 → identical scores
    val got = Retrieval.tfidfTopTerms(df, $"doc_id", $"text", k = 1)
      .as[(Long, Int, String, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._3).toSeq == Seq("a", "c"))
  }

  test("search index artifact: sharded build, bucket-pruned probes") {
    val docs = Seq(
      (1L, "spark joins data"), (2L, "spark windows"),
      (3L, "data quality"), (4L, "spark data spark")).toDF("doc_id", "text")
    Retrieval.buildSearchIndex(docs, $"doc_id", $"text",
      "ret_search_idx", shards = 8, maxPostings = 2)
    // probes answer exactly what a fresh index build would
    val got = Retrieval.probeSearchIndex(spark, "ret_search_idx",
        Seq("spark", "data", "missing"))
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "spark" -> ((3L, "1,2")),   // df counts docs, postings capped at 2
      "data" -> ((3L, "1,3"))),   // absent term -> no row
      got.toString)
    // the probe path is shard-routed: one bucket of eight, the
    // reference's HashingDistributionPolicy economics
    val (_, plan) = graft.sources.Bucketing.lookupWithPlan(
      spark, "ret_search_idx", "term", "spark")
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan)
  }

  test("updatable index: insert/delete/update equals rebuild-from-scratch") {
    def probeAll(tbl: String) =
      Retrieval.probeUpdatableIndex(spark, tbl,
          Seq("spark", "data", "fresh", "marker", "windows", "quality"),
          maxPostings = 2)
        .as[(String, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val base = Seq(
      (1L, "spark joins data"), (2L, "spark windows"),
      (3L, "data quality"), (4L, "spark data spark")).toDF("doc_id", "text")
    Retrieval.buildUpdatableIndex(base, $"doc_id", $"text",
      "ret_upd_idx", shards = 4)
    // delete 2, update 3 (new terms), insert 5, and UPDATE an absent
    // doc 6 (must degrade to insert — the DocumentAndOp semantic)
    val delta = Seq(
      ("delete", 2L, null.asInstanceOf[String]),
      ("update", 3L, "marker quality"),
      ("insert", 5L, "fresh data"),
      ("update", 6L, "fresh marker")).toDF("op", "doc_id", "text")
    Retrieval.updateSearchIndex(spark, "ret_upd_idx", delta,
      $"op", $"doc_id", $"text", shards = 4)
    val got = probeAll("ret_upd_idx")
    // the rebuild oracle: same probe over a fresh index on the
    // post-delta corpus
    val rebuilt = Seq(
      (1L, "spark joins data"), (3L, "marker quality"),
      (4L, "spark data spark"), (5L, "fresh data"),
      (6L, "fresh marker")).toDF("doc_id", "text")
    Retrieval.buildUpdatableIndex(rebuilt, $"doc_id", $"text",
      "ret_upd_idx_oracle", shards = 4)
    assert(got == probeAll("ret_upd_idx_oracle"), got.toString)
    // spot-check the merge semantics directly
    assert(got("spark") == ((2L, "1,4")), "deleted doc 2 must vanish")
    assert(got("quality") == ((1L, "3")), "updated doc keeps new terms only")
    assert(!got.contains("windows"), "doc 2's postings died with it")
    assert(got("fresh") == ((2L, "5,6")), "insert + absent-update land")
    // a second delta on the SAME index: re-insert a deleted doc —
    // the newer insert must beat the older tombstone
    Retrieval.updateSearchIndex(spark, "ret_upd_idx",
      Seq(("insert", 2L, "spark returns")).toDF("op", "doc_id", "text"),
      $"op", $"doc_id", $"text", shards = 4)
    assert(probeAll("ret_upd_idx")("spark") == ((3L, "1,2")),
      "re-inserted doc must come back live")
    // fail-loud on a typo'd op
    val e = intercept[Exception] {
      Retrieval.updateSearchIndex(spark, "ret_upd_idx",
        Seq(("upsert", 9L, "x")).toDF("op", "doc_id", "text"),
        $"op", $"doc_id", $"text", shards = 4)
    }
    assert(e.getMessage != null)
    // compaction folds the segments + tombstones into one clean
    // generation: probes identical, ledger empty, duplicates gone
    val before = probeAll("ret_upd_idx")
    Retrieval.compactSearchIndex(spark, "ret_upd_idx", shards = 4)
    assert(probeAll("ret_upd_idx") == before, "compaction changed answers")
    assert(spark.table("ret_upd_idx__deletes").count() == 0)
    // one live row per (term, doc_id) — superseded generations folded
    val dup = spark.table("ret_upd_idx").groupBy("term", "doc_id")
      .count().filter(col("count") > 1).count()
    assert(dup == 0, "compacted index still holds superseded postings")
    // and the compacted index remains updatable
    Retrieval.updateSearchIndex(spark, "ret_upd_idx",
      Seq(("delete", 1L, null.asInstanceOf[String]))
        .toDF("op", "doc_id", "text"),
      $"op", $"doc_id", $"text", shards = 4)
    assert(probeAll("ret_upd_idx")("spark") == ((2L, "2,4")),
      "post-compaction delete must apply")
  }

  /** Jobs launched while `body` runs (quiet-period poll — listener
    * delivery is asynchronous).
    */
  private def countJobs(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var last = -1; var quiet = 0
      val deadline = System.nanoTime() + 10_000_000_000L
      while (quiet < 3 && System.nanoTime() < deadline) {
        Thread.sleep(50)
        val c = n.get()
        if (c == last) quiet += 1 else { quiet = 0; last = c }
      }
      n.get()
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("warm probe pre-flight is job-free: the generation-stamped " +
      "cache replaces the per-probe ledger count") {
    val base = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"), (3L, "beta gamma"))
      .toDF("doc_id", "text")
    Retrieval.buildUpdatableIndex(base, $"doc_id", $"text",
      "ret_cache_idx", shards = 2)
    Retrieval.updateSearchIndex(spark, "ret_cache_idx",
      Seq(("delete", 3L, null.asInstanceOf[String]))
        .toDF("op", "doc_id", "text"),
      $"op", $"doc_id", $"text", shards = 2)
    def probe() = Retrieval.probeUpdatableIndex(spark, "ret_cache_idx",
      Seq("alpha", "beta")).collect()
    val warmRows = probe() // settle plans/caches once
    // warm path: the mutators above primed the cache — no count job
    val warm = countJobs(probe())
    // cold path: an out-of-band writer invalidates; the next probe
    // pays the count + generation read exactly once, then re-warms
    Retrieval.invalidateLedgerCount(spark, "ret_cache_idx")
    val cold = countJobs(probe())
    assert(cold > warm,
      s"cold probe must pay the pre-flight jobs (warm=$warm cold=$cold)")
    assert(countJobs(probe()) == warm, "cache must re-warm after a miss")
    // the cached count is exact: with 1 standing tombstone, an
    // update adding 1 more must trip a cap of 1 via the CACHED prior
    val e = intercept[IllegalStateException] {
      Retrieval.updateSearchIndex(spark, "ret_cache_idx",
        Seq(("delete", 2L, null.asInstanceOf[String]))
          .toDF("op", "doc_id", "text"),
        $"op", $"doc_id", $"text", shards = 2, maxTombstones = 1L)
    }
    assert(e.getMessage.contains("compactSearchIndex"), e.getMessage)
    assert(probe().toSeq == warmRows.toSeq, "results must not move")
  }

  test("tombstone ledger is bounded: guard fires, compaction is the remedy") {
    val base = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"),
      (3L, "beta gamma"), (4L, "alpha delta")).toDF("doc_id", "text")
    Retrieval.buildUpdatableIndex(base, $"doc_id", $"text",
      "ret_ledger_idx", shards = 2)
    def del(ids: Long*) =
      ids.map(i => ("delete", i, null.asInstanceOf[String]))
        .toDF("op", "doc_id", "text")
    // first delete fits the cap of 1
    Retrieval.updateSearchIndex(spark, "ret_ledger_idx", del(1L),
      $"op", $"doc_id", $"text", shards = 2, maxTombstones = 1L)
    // second batch would make 2 tombstones: pre-flight throws BEFORE
    // any write, prescribing compaction — the batch must not apply
    val e = intercept[IllegalStateException] {
      Retrieval.updateSearchIndex(spark, "ret_ledger_idx", del(2L),
        $"op", $"doc_id", $"text", shards = 2, maxTombstones = 1L)
    }
    assert(e.getMessage.contains("compactSearchIndex"), e.getMessage)
    assert(spark.table("ret_ledger_idx__deletes").count() == 1,
      "failed batch must not have written tombstones")
    assert(spark.table("ret_ledger_idx__gen").count() == 2,
      "failed batch must not have claimed a generation")
    // the same batch under a raised cap applies (deliberate override)
    Retrieval.updateSearchIndex(spark, "ret_ledger_idx", del(2L),
      $"op", $"doc_id", $"text", shards = 2, maxTombstones = 2L)
    // a probe over an overgrown ledger fails the same way...
    val p = intercept[IllegalStateException] {
      Retrieval.probeUpdatableIndex(spark, "ret_ledger_idx",
        Seq("alpha"), maxTombstones = 1L)
    }
    assert(p.getMessage.contains("compactSearchIndex"))
    // ...and maxTombstones <= 0 opts out of the guard entirely
    assert(Retrieval.probeUpdatableIndex(spark, "ret_ledger_idx",
      Seq("alpha"), maxTombstones = 0L).count() > 0)
    // compaction folds the ledger away even when it is past the
    // broadcast bound (shuffle-join path), and unblocks the pipeline
    Retrieval.compactSearchIndex(spark, "ret_ledger_idx", shards = 2,
      broadcastLedgerRows = 0L)
    assert(spark.table("ret_ledger_idx__deletes").count() == 0)
    val got = Retrieval.probeUpdatableIndex(spark, "ret_ledger_idx",
        Seq("alpha"), maxTombstones = 1L)
      .as[(String, Long, String)].collect().head
    assert(got == (("alpha", 1L, "4")), got.toString)
  }
}
