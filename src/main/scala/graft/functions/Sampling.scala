package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and shard packing for training-data
  * pipelines.
  *
  * The reference ships samplers as split-planning helpers
  * (src/mapred/org/apache/hadoop/mapred/lib/InputSampler.java:88 —
  * RandomSampler / SplitSampler / IntervalSampler feeding
  * TotalOrderPartitioner); a data pipeline needs the same decisions
  * as *content* operators: which rows enter a training mix, at what
  * per-source rate, and how the survivors are packed into shards.
  *
  * Everything here is hash-deterministic, never `rand()`:
  * a sample must be reproducible across retries, speculative task
  * re-execution, and engines (the md5-prefix predicate is plain SQL,
  * so an external engine can re-derive the exact sample). All
  * operators are single-pass column expressions or one-exchange
  * window plans with no driver state — except [[mixByWeight]], which
  * eagerly gathers one count per group value (the mix dimension —
  * languages/sources, not a high-cardinality key) to derive its
  * rates.
  */
object Sampling {

  /** Decision hash in [0, 16^8): the first 8 hex chars of
    * md5(key ":" seed), compared lexicographically — hex digits
    * order like the number they encode, so a string threshold is a
    * numeric threshold and every engine with md5() agrees on the
    * sample.
    */
  private def decisionHex(key: Column, seed: Long): Column =
    substring(md5(concat(key.cast("string"), lit(":" + seed))), 1, 8)

  /** `rate` as an 8-hex-char threshold (rate 1.0 ⇒ above any hash). */
  private def rateThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    // 16^8 * rate, clamped; f"%08x" keeps the lexicographic compare
    // aligned with the numeric one
    val n = math.min((rate * 4294967296.0).toLong, 4294967296L)
    if (n >= 4294967296L) "g" /* > every hex digit string */
    else f"$n%08x"
  }

  /** Deterministic Bernoulli sample: keep a row iff the hash of its
    * `key` falls under `rate`. Map-side only — fuses into the scan,
    * no shuffle, stable under retries. Different `seed`s draw
    * independent samples (held-out splits, A/B slices).
    *
    * Rows with a NULL key are never sampled in, at any rate (a null
    * key hashes to null and fails the threshold compare) — the same
    * subset behavior [[hashSplit]] documents; use [[hashSplit]] when
    * every row must land somewhere.
    */
  def hashSample(df: DataFrame, key: Column, rate: Double,
                 seed: Long = 42L): DataFrame =
    df.filter(keepHash(key, rate, seed))

  /** The [[hashSample]] membership predicate as a reusable column —
    * lets an operator restrict several relations to the SAME
    * deterministic stratum map-side (no membership join), e.g. a
    * sampled validation witness filtering both its brute-force side
    * and the blocked output it audits.
    */
  def keepHash(key: Column, rate: Double, seed: Long = 42L): Column =
    decisionHex(key, seed) < lit(rateThreshold(rate))

  /** Deterministic two-way split: ([[hashSample]]'s kept set, its
    * complement) — the train/test split whose membership survives
    * reruns, engine changes and incremental re-ingestion (a row's
    * side is a pure function of its key and the seed, so new data
    * lands on a side without reshuffling old rows).
    *
    * A null key hashes to null; a bare filter would drop the row
    * from BOTH sides — silent loss in an operator whose contract is
    * an exact partition. Null keys land deterministically in the
    * complement (they are not "sampled in" at any rate, matching
    * [[hashSample]]'s subset behavior).
    */
  def hashSplit(df: DataFrame, key: Column, rate: Double,
                seed: Long = 42L): (DataFrame, DataFrame) = {
    val in = coalesce(decisionHex(key, seed) < lit(rateThreshold(rate)),
      lit(false))
    (df.filter(in), df.filter(!in))
  }

  /** Per-stratum deterministic rates (the training-mix weights:
    * "keep 50% of en, 10% of everything else"). `default` applies to
    * strata absent from `rates`. Same scan-speed shape as
    * [[hashSample]] — the stratum only switches the threshold.
    */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           rates: Map[String, Double], default: Double,
                           seed: Long = 42L): DataFrame = {
    val threshold = rates.foldLeft(lit(rateThreshold(default))) {
      case (acc, (s, r)) => when(stratum === s, lit(rateThreshold(r))).otherwise(acc)
    }
    df.filter(decisionHex(key, seed) < threshold)
  }

  /** Re-mix a corpus toward target group weights by deterministic
    * downsampling — the "rebalance the training mix to 60% en /
    * 25% de / 15% zh" step. Scales the mix to the largest total the
    * data supports: with `c = min over weighted groups of n_g / w_g`,
    * each group keeps at `rate_g = min(1, c·w_g / n_g)` (the
    * scarcest-relative-to-its-weight group keeps ~everything, the
    * rest downsample to match). Groups without a weight are dropped.
    * No upsampling — a group can't contribute rows it doesn't have;
    * repeat-epoch upsampling is a training-loader concern, not a
    * corpus transform.
    *
    * Membership is [[hashSample]]'s hash-threshold per group, so the
    * mix is reproducible row-for-row and an external engine can
    * re-derive it from the group counts alone. Null group or null
    * key ⇒ dropped. Driver state is one count per distinct group
    * value (the mix dimension — languages, sources — not a
    * high-cardinality key), gathered in one aggregation pass and
    * BOUNDED by `maxGroups` (same fail-loud contract as
    * [[graft.functions.Dedup.defaultMaxCandidates]]): a caller who
    * passes a high-cardinality column as the group gets an error
    * naming the misuse, not a driver-sized collect. The collect
    * itself is limited to `maxGroups + 1` rows, so even the failing
    * path never materializes the full group set on the driver.
    */
  val defaultMaxGroups: Int = 1 << 16

  def mixByWeight(df: DataFrame, key: Column, group: Column,
                  weights: Map[String, Double],
                  seed: Long = 42L,
                  maxGroups: Int = defaultMaxGroups): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    weights.foreach { case (g, w) =>
      require(w > 0, s"weight for '$g' must be > 0, got $w") }
    require(maxGroups > 0, s"maxGroups must be > 0, got $maxGroups")
    val collected = df.groupBy(group.cast("string").as("__g"))
      .agg(count(lit(1)).as("__n"))
      .limit(maxGroups + 1)
      .collect()
    if (collected.length > maxGroups)
      throw new IllegalArgumentException(
        s"mixByWeight: group column has more than $maxGroups " +
          s"distinct values — this is a mix DIMENSION (languages, " +
          s"sources), not a key; pass a coarser group or raise " +
          s"maxGroups deliberately")
    val counts = collected
      .flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1)))
      .toMap
    val present = weights.filter { case (g, _) => counts.getOrElse(g, 0L) > 0L }
    if (present.isEmpty) df.filter(lit(false))
    else {
      val c = present.map { case (g, w) => counts(g).toDouble / w }.min
      val threshold = present.foldLeft(lit(rateThreshold(0.0))) {
        case (acc, (g, w)) =>
          val rate = math.min(1.0, c * w / counts(g).toDouble)
          when(group.cast("string") === g, lit(rateThreshold(rate)))
            .otherwise(acc)
      }
      df.filter(decisionHex(key, seed) < threshold)
    }
  }

  /** Deterministic weighted sample without replacement (Efraimidis-
    * Spirakis A-ES): draw key u^(1/w) per row with u the md5-derived
    * uniform in [0, 1), keep the `k` largest keys — each subset's
    * inclusion probability is exactly the weighted-sampling law, yet
    * the draw is a pure function of (row key, seed): reproducible
    * across retries, engines, and cluster sizes, like every sampler
    * here. Rows with null/zero/negative weight never win — their draw
    * is null and they are dropped before the top-k, even when fewer
    * than `k` positive-weight rows exist (the result is then smaller
    * than `k`, per the A-ES law where weight 0 means probability 0).
    * A null row-key likewise draws null and is dropped. Ties
    * (FP-equal draws) break on the row key ascending.
    *
    * Scale shape: the draw is map-side; the top-k is a single
    * TakeOrderedAndProject — O(k) per partition, O(k) driver, no
    * shuffle of the corpus. Returns the full schema plus the draw
    * (`__wkey` renamed `draw`) for auditability.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
                     seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("draw"),
      "weightedSample appends a 'draw' column; rename the input's " +
        "existing 'draw' first (a silent duplicate column would break " +
        "downstream by-name selection)")
    val u = conv(decisionHex(key, seed), 16, 10).cast("double") /
      lit(4294967296.0)
    val w = weight.cast("double")
    val draw = when(key.isNull || w.isNull || w <= 0.0,
        lit(null).cast("double"))
      .otherwise(pow(u, lit(1.0) / w))
    val p = graft.Names.fresh("__ws", df.columns)
    df.withColumn(s"${p}_draw", draw)
      .filter(col(s"${p}_draw").isNotNull)
      .orderBy(col(s"${p}_draw").desc, key.asc)
      .limit(k)
      .withColumnRenamed(s"${p}_draw", "draw")
  }

  /** Deterministic fixed-size-per-stratum sample: the `k` rows of
    * each stratum with the smallest decision hashes — a reproducible
    * stand-in for per-key reservoir sampling (the reservoir's "k
    * uniform survivors" with none of its sequential state). One hash
    * exchange on the stratum + per-group sort.
    *
    * Scale note: a single stratum's rows all land in one window
    * partition. For strata of ~10⁹+ rows pre-thin with
    * [[hashSample]] at a generous rate (any rate keeping ≥ k rows
    * per stratum preserves the result EXACTLY: the kept set is the
    * k smallest hashes, and a hash-threshold pre-filter only drops
    * rows above the threshold).
    */
  def perStratumSample(df: DataFrame, key: Column, stratum: Column,
                       k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // tie-break on the key, then on a hash of the whole row: md5
    // prefixes could collide, and two rows sharing the same key value
    // would otherwise be ordered by shuffle arrival — a retry could
    // return a different surviving row at the k boundary. With the
    // full-row hash the order is content-deterministic (two fully
    // identical rows are interchangeable, so their tie is harmless).
    // Spark's hash functions reject MapType (no canonical entry
    // order), so the row hash covers only hashable columns — rows
    // identical everywhere but a map column still tie, which narrows
    // the guarantee instead of throwing on map-carrying schemas.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    // backtick-quoted: a bare col("a.b") parses the dot as struct
    // field access, so a top-level column literally named "a.b"
    // would throw (or silently hash another column's nested field)
    val tieCols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => col("`" + f.name.replace("`", "``") + "`"))
    val rowTie =
      if (tieCols.isEmpty) lit(0L)
      else xxhash64(struct(tieCols.toIndexedSeq: _*))
    val w = Window.partitionBy(stratum)
      .orderBy(decisionHex(key, seed).asc, key.asc, rowTie.asc)
    val rn = graft.Names.fresh("__rn", df.columns)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }

  /** Pack rows into budgeted shards: within each `part`, rows are
    * laid out in `order` and shard id = floor(exclusive-prefix-sum
    * (weight) / budget) — a row opens in the shard its starting
    * offset falls in. The training-export step: "documents into
    * ~N-token shards, deterministic order, no shard boundary
    * splitting a document". A shard holds at least `budget` total
    * weight's worth of offsets and overflows by at most its last
    * row's weight; a row heavier than the whole budget gets a shard
    * to itself. (Strict greedy packing — close the shard when the
    * NEXT row would overflow — is a sequential recurrence, not a
    * prefix sum; this offset form computes the same shard count ±1
    * per part and distributes.)
    *
    * One exchange on `part` + per-partition sort — shards are
    * assigned partition-locally, so parts scale out; a part's rows
    * do funnel through one task (pick `part` = the export bucket,
    * e.g. language × date, not a global constant).
    *
    * `order` must be a TOTAL order within each part (e.g. end with a
    * unique id): with ties the prefix sum depends on which tied row
    * a retry happens to sort first, and the shard assignment stops
    * being reproducible — the same contract violation `rand()`
    * sampling has.
    */
  def packByBudget(df: DataFrame, part: Column, order: Seq[Column],
                   weight: Column, budget: Long, as: String = "shard"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(order.nonEmpty, "order must have at least one column")
    val w = Window.partitionBy(part).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // exclusive prefix sum: the first row of a part packs into shard
    // 0 even if it alone blows the budget. The shard id divides with
    // IntegralDivide (exact integral quotient, same form as
    // Temporal's bucket math): Column `/` is double division, which
    // rounds once the cumulative weight per part passes 2^53 — real
    // at 100 TB token budgets. Prefix sums are non-negative, so
    // integral division equals the floor the docstring promises.
    // The weight accumulates in DECIMAL: a double sum re-introduces
    // the 2^53 rounding, and a per-row long cast (a prior fix for
    // that) truncated fractional weights to 0 — all rows of a
    // sub-1.0-weight corpus landed in shard 0. decimal(27,6) keeps
    // fractional weights to micro-unit granularity and sums exactly.
    val dec = "decimal(27,6)"
    val prefix = coalesce(sum(weight.cast(dec)).over(w), lit(0).cast(dec))
    df.withColumn(as, {
      import org.apache.spark.sql.GraftColumnBridge.{column, expression}
      import org.apache.spark.sql.catalyst.expressions.IntegralDivide
      column(IntegralDivide(expression(prefix),
        expression(lit(budget).cast(dec))))
    })
  }

  /** Deterministic global shuffle — reproducible training order. The
    * sort key is the decision hash of the row `key` (seeded), so the
    * permutation is a pure function of content + seed: stable across
    * retries, engines, and cluster sizes, unlike `orderBy(rand())`.
    * Emits the explicit `rank` so consumers (shard writers, curriculum
    * samplers) can range-select without re-sorting; ties (duplicate
    * keys) break on the key itself.
    *
    * Scale shape: [[graft.streaming.Heat.globalRank]] — one
    * range-exchange on the hash (pivots sampled exactly like
    * TotalOrderPartitioner), partition-local row_number, broadcast
    * per-partition offsets. No zero-partition window, no
    * single-reducer funnel; driver state is O(partitions) longs.
    */
  def deterministicShuffle(df: DataFrame, key: Column, seed: Long,
                           as: String = "rank"): DataFrame = {
    // the output and scratch names must not silently replace user
    // columns (withColumn overwrites): grow the scratch name until
    // free, refuse an occupied output name outright
    require(!df.columns.contains(as),
      s"deterministicShuffle: output column '$as' already exists — " +
        "pass a free name via `as`")
    val shuf = graft.Names.fresh("__shuf", df.columns)
    val hashed = df.withColumn(shuf, decisionHex(key, seed))
    graft.streaming.Heat
      .globalRank(hashed, Seq(col(shuf), key.cast("string")), as)
      .drop(shuf)
  }

  /** Deterministic k-fold assignment: a `fold` column in [0, k) that
    * is a pure function of (key, seed) — the cross-validation /
    * mutually-exclusive-shard generalization of [[hashSplit]]. Every
    * engine with md5() re-derives the same folds; new rows land in a
    * fold without moving old ones; fold f at k folds is EXACTLY the
    * set difference of the nested [[hashSample]] thresholds (fold 0
    * == hashSample at rate 1/k, same seed), so a 2-fold split agrees
    * with [[hashSplit]].
    *
    * Map-side only — a CASE over k-1 hex-threshold compares fused
    * into the scan, no shuffle. k is capped: a CASE is a linear
    * branch scan per row, fine for fold counts (5/10/100), wrong for
    * thousands (use a partitioner then). Null keys hash to null,
    * match no threshold, and land deterministically in the LAST fold
    * ([[hashSplit]]'s complement-side contract).
    */
  def kFold(df: DataFrame, key: Column, k: Int, seed: Long = 42L,
            as: String = "fold"): DataFrame = {
    require(k >= 2 && k <= 1024, s"k must be in [2, 1024], got $k")
    require(!df.columns.contains(as),
      s"kFold: output column '$as' already exists — pass a free name")
    val hex = decisionHex(key, seed)
    val first = when(hex < lit(rateThreshold(1.0 / k)), lit(0))
    val chain = (2 until k).foldLeft(first)((c, i) =>
      c.when(hex < lit(rateThreshold(i.toDouble / k)), lit(i - 1)))
    df.withColumn(as, chain.otherwise(lit(k - 1)))
  }

  /** Global quantile gate: keep exactly `floor(frac * n)` rows — the
    * top fraction of the corpus under `order` (score descending plus
    * a deterministic tie-break, supplied by the caller). The
    * quality-filtering step of a curation pipeline stated as a RANK
    * cut rather than a score threshold: "keep the best 20%" holds by
    * construction whatever the score distribution looks like, where
    * a fixed threshold drifts with every re-crawl.
    *
    * The kept rows come back with their 1-based global rank in column
    * `as` — the downstream curriculum order for free.
    *
    * Scale shape: [[graft.streaming.Heat.globalRank]] — one
    * range-exchange on the order key (pivots sampled exactly like the
    * reference's TotalOrderPartitioner + InputSampler,
    * src/mapred/org/apache/hadoop/mapred/lib/InputSampler.java:88),
    * partition-local row_number, O(partitions) driver longs for the
    * offsets. The alternative everyone writes first —
    * `percent_rank() OVER (ORDER BY score)` — funnels the entire
    * corpus through ONE window partition; this never does. The cutoff
    * itself is one driver long derived from the already-collected
    * partition histogram, so no second pass over the data. Like
    * [[graft.streaming.Heat.replicationPlan]], the rank kernel pins
    * its exchange with an eager localCheckpoint — the gate runs the
    * upstream plan once, and a lost executor re-runs the gate
    * wholesale.
    */
  def topFraction(df: DataFrame, order: Seq[Column], frac: Double,
                  as: String = "rnk"): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0,
      s"frac must be in [0,1], got $frac")
    val (ranked, n, pid) =
      graft.streaming.Heat.globalRankWithCount(df, order, as)
    val keep = math.floor(frac * n).toLong
    ranked.filter(col(as) <= keep).drop(pid)
  }
}
