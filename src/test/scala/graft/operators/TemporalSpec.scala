package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.operators.Temporal._

/** Plan-shape helpers: count exchange NODES in the physical tree
  * (descending through the AQE wrapper) instead of regexing the plan
  * string — node class names and toString formats drift across Spark
  * versions, the tree does not.
  */
object PlanShape {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
  import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

  private def walk(p: SparkPlan)(hit: SparkPlan => Int): Int = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case x => x
    }
    hit(inner) + inner.children.map(walk(_)(hit)).sum
  }

  def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    walk(df.queryExecution.executedPlan) {
      case _: ShuffleExchangeLike => 1; case _ => 0
    }

  def broadcasts(df: org.apache.spark.sql.DataFrame): Int =
    walk(df.queryExecution.executedPlan) {
      case _: BroadcastExchangeLike => 1; case _ => 0
    }
}

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin attaches the latest right payload at or before each left time") {
    val left = Seq(
      (1L, 100L, "l1"), // before any snapshot -> null
      (1L, 200L, "l2"), // exactly at snapshot t=200 -> tie matches
      (1L, 350L, "l3"), // between 200 and 400 -> 200's payload
      (1L, 450L, "l4"), // after 400 -> 400's payload
      (2L, 999L, "l5")  // key with no snapshots at all -> null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 200L, 20.0),
      (1L, 400L, 40.0)
    ).toDF("k", "t", "v")
    val out = asOfJoin(left, $"k", $"t", right, $"k", $"t", $"v", "snap")
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out == Map("l1" -> null, "l2" -> 20.0, "l3" -> 20.0,
      "l4" -> 40.0, "l5" -> null))
  }

  test("asOfJoin preserves the left schema and rejects a clashing output column") {
    val left = Seq((1L, 10L, "x", 7)).toDF("k", "t", "s", "extra")
    val right = Seq((1L, 5L, 1.5)).toDF("k", "t", "v")
    val out = asOfJoin(left, $"k", $"t", right, $"k", $"t", $"v", "snap")
    assert(out.columns.toSeq == Seq("k", "t", "s", "extra", "snap"))
    assert(out.collect().head.getDouble(4) == 1.5)
    intercept[IllegalArgumentException] {
      asOfJoin(left, $"k", $"t", right, $"k", $"t", $"v", "extra")
    }
  }

  test("asOfJoin follows SQL semantics on null payloads, keys and times") {
    // a matched right row whose PAYLOAD is null wins over an earlier
    // non-null one — ASOF picks the latest preceding ROW, it does not
    // skip back to the latest non-null value
    val left = Seq((1L, 300L, "a"), (2L, 50L, "b"), (3L, 10L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (Option(1L), Option(100L), Option(5.0)),
      (Option(1L), Option(200L), None),         // latest for k=1: null payload
      (Option(1L), None, Option(9.0)),          // null time: never matches
      (None, Option(1L), Option(7.0))           // null key: never matches
    ).toDF("k", "t", "v")
    val out = asOfJoin(left, $"k", $"t", right, $"k", $"t", $"v", "snap")
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out == Map("a" -> null, "b" -> null, "c" -> null))
    // null-key / null-time LEFT rows surface with a null match, not
    // a spurious pairing with other null rows
    val nullLeft = Seq((Option.empty[Long], Option(500L), "x"),
      (Option(1L), Option.empty[Long], "y")).toDF("k", "t", "tag")
    val out2 = asOfJoin(nullLeft, $"k", $"t", right, $"k", $"t", $"v", "snap")
      .collect().map(r => r.getString(2) -> r.isNullAt(3)).toMap
    assert(out2 == Map("x" -> true, "y" -> true))
  }

  test("asOfJoin matches a per-row max-subquery reference on seeded random data") {
    val rnd = new scala.util.Random(42)
    val left = (0 until 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    // unique (k, t) on the right — the operator's tie contract
    val right = rnd.shuffle((0 until 200).toList).take(120).map(i =>
      ((i % 5).toLong, (i * 7 + 3).toLong, i * 1.0))
      .toDF("k", "t", "v")
    val got = asOfJoin(left, $"k", $"t", right, $"k", $"t", $"v", "snap")
      .select($"lid", $"snap")
    // reference: explicit inequality join + latest-wins window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lid").orderBy($"rt".desc)
    val ref = left.join(right.toDF("k", "rt", "v"), Seq("k"), "left_outer")
      .withColumn("ok", $"rt" <= $"t")
      .withColumn("v2", when($"ok", $"v"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"lid")
          .orderBy(when($"ok", $"rt").desc_nulls_last)))
      .filter($"rn" === 1)
      .select($"lid", $"v2".as("snap"))
    val g = got.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val e = ref.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(g == e)
  }

  test("rangeJoin emits each covering pair exactly once across bucket spans") {
    val points = Seq((1L, 5L), (2L, 100L), (3L, 250L), (4L, 999L))
      .toDF("pid", "t")
    val ivals = Seq(
      (10L, 0L, 10L),     // 1 bucket (width 100), covers t=5
      (20L, 50L, 260L),   // spans buckets 0..2: covers 100 and 250
      (30L, 100L, 100L),  // degenerate single instant: covers 100 only
      (40L, 260L, 240L)   // end < start: matches nothing
    ).toDF("iid", "s", "e")
    val out = rangeJoin(points, $"t", ivals, $"s", $"e", bucket = 100L)
      .select($"pid", $"iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a multi-bucket interval must match once per point, not once per
    // shared bucket (the point lives in exactly one bucket)
    assert(out == Set((1L, 10L), (2L, 20L), (2L, 30L), (3L, 20L)))
  }

  test("rangeJoin pre-flight refuses a dense timeline, prescribes the " +
       "sweep, and is overridable") {
    val points = (1L to 200L).map(Tuple1(_)).toDF("t")
    // every interval covers the whole timeline: one bucket at width
    // 1000 -> candidate bound = 200 points x 50 intervals = 10000
    val ivals = Seq.fill(50)((1L, 200L)).toDF("s", "e")
    val ex = intercept[IllegalStateException] {
      rangeJoin(points, $"t", ivals, $"s", $"e", bucket = 1000L,
        maxCandidates = 100L)
    }
    assert(ex.getMessage.contains("pre-flight") &&
      ex.getMessage.contains("rangeJoinCount"), ex.getMessage)
    // explicit unguarded run still works (the deliberate-override path)
    assert(rangeJoin(points, $"t", ivals, $"s", $"e", bucket = 1000L,
      maxCandidates = -1L).count() == 10000L)
    // under the budget the gate is silent and the result identical
    assert(rangeJoin(points, $"t", ivals, $"s", $"e", bucket = 1000L,
      maxCandidates = 20000L).count() == 10000L)
    // the bound counts CANDIDATES (bucket co-residents), not output:
    // dropped over-long intervals are excluded from it like the join
    val longIval = Seq((Long.MinValue, Long.MaxValue)).toDF("s", "e")
    assert(rangeJoin(points, $"t", longIval, $"s", $"e", bucket = 1000L,
      maxBuckets = 10, maxCandidates = 100L).count() == 0L)
  }

  test("rangeJoin drops intervals longer than maxBuckets and rejects column overlap") {
    val points = Seq((1L, 500L)).toDF("pid", "t")
    val ivals = Seq((10L, 0L, 1000000L), (20L, 450L, 550L)).toDF("iid", "s", "e")
    val out = rangeJoin(points, $"t", ivals, $"s", $"e",
        bucket = 100L, maxBuckets = 50)
      .select($"iid").collect().map(_.getLong(0)).toSet
    assert(out == Set(20L), "the 10001-bucket interval must be dropped by the guard")
    intercept[IllegalArgumentException] {
      rangeJoin(points, $"t", points, $"t", $"t", bucket = 100L)
    }
  }

  test("rangeJoin bucket floor-div is exact at huge bucket widths") {
    // regression: floor(t/b) over a plain decimal division rounds
    // HALF_UP at scale 17 first, so t = b - 1 with b = 1e18 landed in
    // bucket 1 instead of 0 — the single-bucket interval [0, b-1]
    // appeared to span two buckets and a maxBuckets = 1 cap dropped
    // it. The pmod floor-div form keeps the span exact.
    val b = 1000000000000000000L
    val points = Seq((1L, b - 1)).toDF("pid", "t")
    val ivals = Seq((10L, 0L, b - 1)).toDF("iid", "s", "e")
    val out = rangeJoin(points, $"t", ivals, $"s", $"e",
        bucket = b, maxBuckets = 1)
      .select($"pid", $"iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L)))
  }

  test("rangeJoin survives sentinel open-ended intervals (Long.Min/Max bounds)") {
    // the exact case the maxBuckets guard exists for: an interval
    // encoded as "beginning of time .. forever". Long bucket math
    // overflowed under ANSI before the decimal floorDiv fix — the
    // job died before the guard could count the interval as dropped
    val points = Seq((1L, 500L)).toDF("pid", "t")
    val ivals = Seq(
      (10L, Long.MinValue, Long.MaxValue),  // sentinel: dropped, not fatal
      (20L, 450L, 550L)
    ).toDF("iid", "s", "e")
    for (bucket <- Seq(1L, 100L)) {
      // maxBuckets = 200 keeps the 101-bucket valid interval at
      // bucket=1 while the sentinel interval (~2^64 buckets) drops
      val out = rangeJoin(points, $"t", ivals, $"s", $"e",
          bucket = bucket, maxBuckets = 200)
        .select($"iid").collect().map(_.getLong(0)).toSet
      assert(out == Set(20L), s"bucket=$bucket: $out")
    }
  }

  test("rangeJoin bucket math stays exact at nanos magnitude (> 2^53)") {
    // epoch-nanos scale: double arithmetic rounds these longs to
    // multiples of 256, which would misplace bucket boundaries; the
    // floorDiv form must keep the pair set exact
    val base = 1704067200000000000L // 2024-01-01 in nanos
    val points = Seq((1L, base + 1L), (2L, base + 999L), (3L, base + 1001L))
      .toDF("pid", "t")
    val ivals = Seq((10L, base, base + 1000L)).toDF("iid", "s", "e")
    val got = rangeJoin(points, $"t", ivals, $"s", $"e",
        bucket = 1000L)
      .select($"pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L), got.toString)
  }

  test("rangeJoin matches a plain inequality join on seeded random data") {
    val rnd = new scala.util.Random(7)
    val points = (0 until 400).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("pid", "t")
    val ivals = (0 until 150).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i.toLong, s, s + rnd.nextInt(800).toLong)
    }.toDF("iid", "s", "e")
    val got = rangeJoin(points, $"t", ivals, $"s", $"e", bucket = 128L)
      .select($"pid", $"iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ref = points.join(ivals, $"t" >= $"s" && $"t" <= $"e")
      .select($"pid", $"iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == ref)
  }

  test("asOfJoin plans exactly one shuffle (union-and-sweep, not a range join)") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "s")
    val right = Seq((1L, 5L, 1.5)).toDF("k", "t", "v")
    val df = asOfJoin(left, $"k", $"t", right, $"k", $"t", $"v", "snap")
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = PlanShape.shuffles(df)
    assert(exchanges == 1, s"expected the single union exchange, got $exchanges:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      "as-of must never plan a pairwise join")
  }

  test("retentionCohorts plans exactly two shuffles (user fold, matrix rollup)") {
    val df = Seq((1L, 10L), (1L, 110L), (2L, 50L)).toDF("u", "t")
    val m = retentionCohorts(df, $"u", $"t", bucket = 100L)
    val exchanges = PlanShape.shuffles(m)
    assert(exchanges == 2,
      s"expected user + (cohort, period) exchanges, got $exchanges:\n" +
        m.queryExecution.executedPlan)
    // and the matrix itself: u1 cohort 0 active in {0, 1}; u2 cohort 0
    val got = m.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L))
  }

  test("sessionize splits on gap strictly greater than the threshold") {
    val df = Seq(
      (1L, 0L), (1L, 100L), (1L, 200L),   // gaps 100 == gap -> same session
      (1L, 301L),                          // gap 101 > 100 -> new session
      (1L, 350L),
      (2L, 0L), (2L, 500L)                 // key 2: gap 500 -> two sessions
    ).toDF("k", "t")
    val out = sessionize(df, $"k", $"t", gap = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 0L) -> 0L, (1L, 100L) -> 0L, (1L, 200L) -> 0L,
      (1L, 301L) -> 1L, (1L, 350L) -> 1L, (2L, 0L) -> 0L, (2L, 500L) -> 1L))
  }

  test("sessionSummary aggregates bounds, counts and exact sums per session") {
    val df = Seq(
      (1L, 0L, 1.5), (1L, 50L, 2.5), (1L, 500L, 4.0)
    ).toDF("k", "t", "v")
    val out = sessionSummary(df, $"k", $"t", gap = 100L,
        $"v".cast("decimal(18,2)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out == Map(
      (1L, 0L) -> (0L, 50L, 2L, 4.0),
      (1L, 1L) -> (500L, 500L, 1L, 4.0)))
  }

  test("activeIntervalCount matches rangeJoin counting incl. boundaries and zeros") {
    val points = Seq((1L, 100L), (2L, 150L), (3L, 200L), (4L, 999L))
      .toDF("pid", "t")
    val ivals = Seq((100L, 200L), (150L, 150L), (0L, 120L))
      .toDF("s", "e")
    val out = activeIntervalCount(points, $"t", ivals, $"s", $"e")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // t=100: [100,200] + [0,120] (start-inclusive); t=150: all except
    // [0,120], incl the degenerate [150,150]; t=200: end-inclusive;
    // t=999: covered by nothing -> 0, NOT dropped
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("activeIntervalCount equals the rangeJoin reference on randomized data") {
    val rnd = new scala.util.Random(4207)
    val points = (1 to 400).map(i => (i.toLong, rnd.nextInt(1000).toLong))
    val ivals = (1 to 120).map { _ =>
      val s = rnd.nextInt(1000).toLong; (s, s + rnd.nextInt(200).toLong)
    }
    val pDf = points.toDF("pid", "t")
    val iDf = ivals.toDF("s", "e")
    val sweep = activeIntervalCount(pDf, $"t", iDf, $"s", $"e")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ref = points.map { case (id, t) =>
      id -> ivals.count { case (s, e) => s <= t && t <= e }.toLong
    }.toMap
    assert(sweep == ref)
    // every point surfaces exactly once, zero-coverage included
    assert(sweep.size == points.size)
  }

  test("rangeJoinCount delegates to the sweep and keeps zero-coverage points") {
    val points = Seq((1L, 100L), (2L, 150L), (3L, 200L), (4L, 999L))
      .toDF("pid", "t")
    val ivals = Seq((100L, 200L), (150L, 150L), (0L, 120L))
      .toDF("s", "e")
    val out = rangeJoinCount(points, $"t", ivals, $"s", $"e")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // same answer as rangeJoin + groupBy count on covered points,
    // PLUS pid=4 at count 0 (which the pair form silently drops)
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
    val pairForm = rangeJoin(points, $"t", ivals, $"s", $"e", bucket = 50L)
      .groupBy($"pid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairForm == out.filter(_._2 > 0L))
    // no bucket dial: open-ended sentinel intervals are COUNTED by
    // the sweep (rangeJoin's maxBuckets guard would drop them)
    val open = Seq((Long.MinValue, Long.MaxValue)).toDF("s", "e")
    val cov = rangeJoinCount(points, $"t", open, $"s", $"e")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cov.values.forall(_ == 1L))
  }

  test("rangeJoin surfaces the candidate-pair population as an observed metric") {
    import org.apache.spark.sql.util.QueryExecutionListener
    import org.apache.spark.sql.execution.QueryExecution
    val seen = scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.Row]()
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (n, r) => seen(n) = r }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val aqePrev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // mid-plan observations are not traversed through AQE's
      // re-planned stages (same caveat as boundedGroupPairs')
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // one bucket [0,100): 3 points × 2 intervals = 6 candidates,
      // but only 2 true pairs survive the between-filter — exactly
      // the candidates-vs-output gap the metric exists to expose
      val points = Seq((1L, 10L), (2L, 50L), (3L, 90L)).toDF("pid", "t")
      val ivals = Seq((5L, 12L), (45L, 55L)).toDF("s", "e")
      val n = rangeJoin(points, $"t", ivals, $"s", $"e", bucket = 100L,
          observeCandidates = true)
        .count()
      assert(n == 2L)
      val deadline = System.nanoTime() + 10_000_000_000L
      var m = Option.empty[org.apache.spark.sql.Row]
      while (m.isEmpty && System.nanoTime() < deadline) {
        m = seen.collectFirst {
          case (k, r) if k.startsWith("graft.range_join.cand.") &&
            r.getAs[Long]("candidate_pairs") == 6L => r
        }
        if (m.isEmpty) Thread.sleep(50)
      }
      assert(m.isDefined, s"no range_join.cand metric with 6 candidates in $seen")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqePrev)
      spark.listenerManager.unregister(listener)
    }
  }

  test("activeIntervalCount null/invalid handling and prefix-offset exactness") {
    // force many range partitions so the broadcast-offset path (not a
    // single local prefix) is what's being asserted
    val points = (1 to 300).map(i => (i.toLong, Option(i.toLong * 10)))
      .toDF("pid", "t")
    val ivals = Seq((Option(0L), Option(3000L)),       // covers all
      (Option(500L), Option(400L)),                    // inverted: dropped
      (Option.empty[Long], Option(100L)),              // null start: dropped
      (Option(100L), Option.empty[Long])               // null end: dropped
    ).toDF("s", "e")
    val out = activeIntervalCount(points, $"t", ivals, $"s", $"e",
        partitions = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.size == 300 && out.values.forall(_ == 1L))
    // a null query time yields a NULL count (unknown, not 0)
    val nullPt = Seq((9L, Option.empty[Long])).toDF("pid", "t")
    val rows = activeIntervalCount(nullPt, $"t", ivals, $"s", $"e").collect()
    assert(rows.length == 1 && rows.head.isNullAt(2))
    // output-column clash rejected
    intercept[IllegalArgumentException] {
      activeIntervalCount(points.withColumnRenamed("pid", "n_active"),
        $"t", ivals, $"s", $"e")
    }
  }

  test("activeIntervalCount handles sentinel open-ended intervals exactly") {
    // rangeJoin must DROP open-ended intervals (they would replicate
    // into every bucket); the sweep carries them as ordinary boundary
    // events — one +1 at the dawn of time, one -1 at the end — with
    // plain long arithmetic (no decimal guard needed: nothing is
    // multiplied or divided, only compared and summed)
    val points = Seq((1L, Long.MinValue), (2L, -5L), (3L, 0L),
      (4L, Long.MaxValue)).toDF("pid", "t")
    val ivals = Seq(
      (Long.MinValue, Long.MaxValue), // forever: covers every point
      (Long.MinValue, -1L),           // open start
      (0L, Long.MaxValue)             // open end
    ).toDF("s", "e")
    val out = activeIntervalCount(points, $"t", ivals, $"s", $"e")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("activeIntervalCount on empty inputs: empty points out, zero counts") {
    val points = Seq((1L, 50L)).toDF("pid", "t")
    val ivals = Seq((0L, 100L)).toDF("s", "e")
    // no intervals -> every point counts 0 (LEFT reading, not dropped)
    val noIv = activeIntervalCount(points, $"t", ivals.limit(0), $"s", $"e")
      .collect()
    assert(noIv.length == 1 && noIv.head.getLong(2) == 0L)
    // no points -> empty result, schema intact
    val noPts = activeIntervalCount(points.limit(0), $"t", ivals, $"s", $"e")
    assert(noPts.columns.toSeq == Seq("pid", "t", "n_active"))
    assert(noPts.count() == 0L)
  }

  test("activeIntervalCount plans no pairwise join and one post-sweep exchange") {
    // the whole point of the sweep: candidate pairs never exist in
    // the plan. The range exchange is sealed inside the checkpointed
    // scan; downstream there is exactly one hash exchange (the
    // pid-window's) plus the offsets broadcast.
    val points = Seq((1L, 100L)).toDF("pid", "t")
    val ivals = Seq((0L, 200L)).toDF("s", "e")
    val df = activeIntervalCount(points, $"t", ivals, $"s", $"e")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"sweep must never plan a pairwise join:\n$plan")
    val exchanges = PlanShape.shuffles(df)
    assert(exchanges == 1,
      s"expected only the pid-window exchange, got $exchanges:\n$plan")
    assert(PlanShape.broadcasts(df) >= 1,
      "partition offsets must broadcast, not shuffle")
  }

  test("funnel: strict ordering, windowed attrition, first-touch anchoring") {
    val e = Seq(
      // u1 completes all three inside the window
      ("u1", 10L, "view"), ("u1", 15L, "click"), ("u1", 20L, "purchase"),
      // u2's click precedes its first view — ordering fails
      ("u2", 5L, "click"), ("u2", 10L, "view"),
      // u3's click is AT the view instant — strictly-after fails
      ("u3", 10L, "view"), ("u3", 10L, "click"),
      // u4's purchase misses the window (100 > 15 + 10)
      ("u4", 10L, "view"), ("u4", 15L, "click"), ("u4", 100L, "purchase"),
      // u5: first-touch anchors at view@0, whose window (0,10] holds
      // no click — the later view@40 must NOT re-anchor
      ("u5", 0L, "view"), ("u5", 40L, "view"), ("u5", 45L, "click")
    ).toDF("u", "t", "s")
    val got = funnel(e, $"u", $"t", $"s",
      Seq("view", "click", "purchase"), window = 10L)
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1, "view", 5L), (2, "click", 2L),
      (3, "purchase", 1L)), got.toSeq.toString)
  }

  test("funnel: window <= 0 disables the per-step deadline") {
    val e = Seq(
      ("a", 0L, "view"), ("a", 1000000L, "click"),
      ("b", 0L, "click")) // never views — counted nowhere
      .toDF("u", "t", "s")
    val got = funnel(e, $"u", $"t", $"s", Seq("view", "click"))
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1, "view", 1L), (2, "click", 1L)))
    // degenerate single-step funnel is the per-type reach count
    val one = funnel(e, $"u", $"t", $"s", Seq("click"))
      .as[(Int, String, Long)].collect()
    assert(one.toSeq == Seq((1, "click", 2L)))
  }

  test("funnel rejects empty or repeated step lists") {
    val e = Seq(("a", 0L, "view")).toDF("u", "t", "s")
    intercept[IllegalArgumentException] {
      funnel(e, $"u", $"t", $"s", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      funnel(e, $"u", $"t", $"s", Seq("view", "view"))
    }
  }
}
