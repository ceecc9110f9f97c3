package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine top-k: the exact baseline. Queries are
  *    broadcast (they are small by construction); scoring is a
  *    map-side zip_with/aggregate against every corpus vector; the
  *    only shuffle is the per-query top-k (rank bounded by k).
  *  - LSH-bucketed ANN: random-hyperplane signatures bucket the
  *    corpus once (a write-time artifact at scale); queries probe
  *    their own bucket plus (multiprobe) buckets within a small
  *    signature Hamming radius — corpus scan count drops by ~2^bits.
  *
  * All arithmetic is double-accumulated regardless of the stored
  * float32 — deterministic across engines and partitionings.
  */
object Similarity {

  /** Cosine similarity — native codegen'd expression (one fused
    * primitive loop; see [[graft.plans.CosineSim]]). Bit-equal to
    * [[cosineComposable]].
    */
  def cosine(a: Column, b: Column): Column = graft.plans.CosineSim(a, b)

  /** The same cosine as composable built-ins (`zip_with`+`aggregate`,
    * double accumulation, left-to-right) — kept as the portable
    * reference implementation and parity witness for the native form.
    */
  def cosineComposable(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val den = sqrt(dot(a, a) * dot(b, b))
    // mismatched lengths first: the native expression returns null
    // there, and without this guard a zero-norm side would win (the
    // den === 0 branch fires before the null numerator is consulted,
    // yielding 0.0 where the native form says null)
    when(size(a) =!= size(b), lit(null).cast("double"))
      // zero-norm guard, matching the native expression: 0.0, not NaN
      .when(den === lit(0.0), lit(0.0))
      .otherwise(dot(a, b) / den)
  }

  /** Brute-force cosine top-k: for each query vector, the k most
    * similar corpus vectors. `queries` must be small (it is crossed
    * with the corpus) — it is broadcast explicitly. Ranking is on the
    * *rounded* score with id tie-break, so results are stable under
    * float noise and engine differences.
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                     queries: DataFrame, queryId: Column, queryVec: Column,
                     k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("vec_id"), corpusVec.as("cv"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", round(cosine(col("cv"), col("qv")), 4))
      .filter(col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"),
        col("rnk").cast("int").as("rnk"))
  }

  /** Random-hyperplane LSH signature: bit j = sign of dot(v, h_j),
    * where h_j's components are deterministic ±1 derived from
    * xxhash64(j, dim_index) parity — reproducible across runs and
    * engines with no stored model. Native codegen'd expression (one
    * fused bits×dim loop, [[graft.plans.HyperplaneSig]]); equal to
    * [[hyperplaneSigComposable]].
    */
  def hyperplaneSig(vec: Column, bits: Int): Column =
    graft.plans.HyperplaneSig(vec, bits)

  /** The signature as composable built-ins — the parity witness for
    * the native expression. Do NOT use in bulk paths: the nested
    * higher-order form is interpreted and re-evaluates the inner dot
    * product per bit (the 20× anti-pattern measured on MinHash,
    * BASELINE.md).
    */
  def hyperplaneSigComposable(vec: Column, bits: Int): Column = {
    val planes = sequence(lit(0), lit(bits - 1))
    aggregate(
      zip_with(planes, sequence(lit(0), lit(bits - 1)), (b, pos) => {
        val dotv = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
            x.cast("double") *
            when(xxhash64(b, i).bitwiseAND(1) === 0, 1.0).otherwise(-1.0)),
          lit(0.0), (acc, v) => acc + v)
        when(dotv > 0, call_function("shiftleft", lit(1L), pos)).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** XOR masks of Hamming weight <= radius over `bits` bits — the
    * multiprobe neighborhood, enumerated driver-side (tiny: Σ C(bits,i)).
    */
  private def probeMasks(bits: Int, radius: Int): Seq[Long] = {
    def combos(start: Int, left: Int): Seq[Long] =
      if (left == 0) Seq(0L)
      else (start until bits).flatMap(b =>
        combos(b + 1, left - 1).map(m => m | (1L << b)))
    (0 to radius).flatMap(r => combos(0, r))
  }

  /** ANN via hyperplane buckets: corpus bucketed by signature; each
    * query scans its own bucket plus — multiprobe — every bucket
    * within signature-Hamming `probeRadius` (near-misses land in
    * adjacent buckets, so probing them recovers most of the recall a
    * single bucket loses). Probe count is Σ C(bits, <=radius), a
    * driver-side constant. At scale, write the corpus partitioned /
    * bucketed by `sig` once and this becomes a bucket-pruned scan per
    * query batch.
    */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, bits: Int = 8, probeRadius: Int = 1): DataFrame = {
    val c = corpus.select(corpusId.as("vec_id"), corpusVec.as("cv"),
      hyperplaneSig(corpusVec, bits).as("sig"))
    val masks = probeMasks(bits, probeRadius)
    // each corpus vector lives in exactly one bucket and the probed
    // signatures are distinct, so no candidate is scored twice
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"),
        hyperplaneSig(queryVec, bits).as("qsig"))
      .withColumn("sig", explode(array(masks.map(m =>
        col("qsig").bitwiseXOR(lit(m))): _*)))
    val scored = c.join(broadcast(q), Seq("sig"))
      .withColumn("cos", round(cosine(col("cv"), col("qv")), 4))
      .filter(col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"),
        col("rnk").cast("int").as("rnk"))
  }

  /** Self-validating ANN gate (the SortValidator / TeraValidate
    * pattern, reference src/test/.../SortValidator.java — validate an
    * output property when golden output isn't expressible): per-query
    * recall@k of `ann` against the exact top-k, emitted as
    * (query_id, recall_ok). The oracle states the floor as a
    * constant: every query must clear it, so a recall regression
    * hash-mismatches instead of passing silently.
    */
  def annRecallGate(ann: DataFrame, exact: DataFrame, k: Int,
                    floor: Double): DataFrame = {
    val a = ann.select(col("query_id"), col("vec_id"))
    val e = exact.select(col("query_id"), col("vec_id"))
    val matched = e.join(a, Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("__m"))
    // denominator = the exact side's PER-QUERY row count, not k: on a
    // corpus smaller than k+1 the exact top-k has fewer than k rows,
    // and dividing by k would fail a perfect ANN (4/10 < floor while
    // ANN matched all 4 true neighbors)
    val exactN = e.groupBy(col("query_id")).agg(count(lit(1)).as("__n"))
    exactN
      .join(matched, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        (coalesce(col("__m"), lit(0L)).cast("double") / col("__n") >= floor)
          .as("recall_ok"))
  }

  /** kNN label prediction — classification by retrieval, the
    * standard downstream consumer of an embedding index: each query
    * vector takes the majority label of its k nearest corpus
    * vectors (exact cosine; swap in the IVF/quantized paths for the
    * index-backed form). Ties break deterministically toward the
    * smaller label. Output: (query_id, pred_label, n_votes).
    *
    * Same scale shape as [[bruteForceTopK]] — queries broadcast,
    * map-side scoring, per-query state bounded by k; the label rides
    * the scoring row so no join back to the corpus is needed.
    */
  def knnPredict(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                 label: Column,
                 queries: DataFrame, queryId: Column, queryVec: Column,
                 k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val c = corpus.filter(label.isNotNull)
      .select(corpusId.as("vec_id"), corpusVec.as("cv"), label.as("lbl"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val neighbors = c.crossJoin(broadcast(q))
      .withColumn("cos", round(cosine(col("cv"), col("qv")), 4))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("__rn", row_number().over(wTop))
      .filter(col("__rn") <= k)
    val wVote = Window.partitionBy(col("query_id"))
      .orderBy(col("n_votes").desc, col("lbl").asc)
    neighbors
      .groupBy(col("query_id"), col("lbl"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("__vr", row_number().over(wVote))
      .filter(col("__vr") === 1)
      .select(col("query_id"), col("lbl").as("pred_label"),
        col("n_votes"))
  }

  /** Hard-negative mining for contrastive training: per query, the
    * `k` most-similar corpus vectors with a DIFFERENT label — the
    * near-misses a retrieval model must learn to push away. Same
    * broadcast-queries shape as [[bruteForceTopK]] with the label
    * disagreement pushed below the cross join (filtered before the
    * rank window buffers anything); unlabeled rows drop on both
    * sides (no label, no agreement to test).
    */
  def hardNegatives(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                    corpusLabel: Column,
                    queries: DataFrame, queryId: Column, queryVec: Column,
                    queryLabel: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val c = corpus.filter(corpusLabel.isNotNull)
      .select(corpusId.as("vec_id"), corpusVec.as("cv"),
        corpusLabel.as("lbl"))
    val q = queries.filter(queryLabel.isNotNull)
      .select(queryId.as("query_id"), queryVec.as("qv"),
        queryLabel.as("qlbl"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("lbl") =!= col("qlbl"))
      .withColumn("cos", round(cosine(col("cv"), col("qv")), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"),
        col("rnk").cast("int").as("rnk"))
  }

  /** Per-label prototype vectors (class centroids up to scale) in
    * integer micro-units: each component is the SUM over the label's
    * vectors of `round(x * unit)` — exact 64-bit integer arithmetic,
    * so the result is order-independent and engine-portable (a
    * float-mean prototype is neither: FP summation order varies per
    * run and per engine). Cosine is scale-invariant, so the un-divided
    * sum ranks identically to the mean — division never happens and
    * exactness is free. Returns (lbl, proto: array<double>).
    *
    * Scale shape: posexplode + one hash exchange on (lbl, pos) with
    * map-side partial sums (the [[Ivf.index]] centroid idiom), then
    * an O(labels) re-assembly — no per-vector state anywhere.
    */
  def labelPrototypes(corpus: DataFrame, vec: Column, label: Column,
                      unit: Double = 1e6): DataFrame =
    corpus.filter(label.isNotNull && vec.isNotNull)
      .select(label.as("lbl"), posexplode(vec))
      .select(col("lbl"), col("pos"),
        round(col("col").cast("double") * unit).cast("long").as("mq"))
      .groupBy(col("lbl"), col("pos"))
      .agg(sum(col("mq")).as("s"))
      .groupBy(col("lbl"))
      .agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"))
      .select(col("lbl"),
        transform(col("ps"), x => x.getField("s").cast("double")).as("proto"))

  /** Nearest-class-mean classification: assign each query to the
    * [[labelPrototypes]] prototype with the highest cosine (ties →
    * smaller label). The O(labels) classifier that needs no
    * per-vector scan at query time — the 100 TB counterpart of
    * [[knnPredict]] when labels are few and queries are many.
    */
  def prototypePredict(corpus: DataFrame, vec: Column, label: Column,
                       queries: DataFrame, queryId: Column,
                       queryVec: Column, unit: Double = 1e6): DataFrame = {
    val protos = labelPrototypes(corpus, vec, label, unit)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("lbl").asc)
    queries.select(queryId.as("query_id"),
        transform(queryVec, x => x.cast("double")).as("qv"))
      .crossJoin(broadcast(protos))
      .withColumn("cos", round(cosine(col("proto"), col("qv")), 4))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("query_id"), col("lbl").as("pred_label"), col("cos"))
  }

  /** Embedding drift monitor: per label, the cosine between the two
    * snapshots' [[labelPrototypes]] — the "did my embedding
    * distribution move between dumps" check a production pipeline
    * alarms on (cos near 1 = stable; a drop flags upstream model or
    * corpus change for that class). Labels present in only one
    * snapshot report null drift (nothing to compare — appearance/
    * disappearance is its own signal, visible in the full-outer
    * row). Exact integer prototype sums make the drift value
    * engine-portable like the prototypes themselves.
    */
  def prototypeDrift(oldCorpus: DataFrame, newCorpus: DataFrame,
                     vec: Column, label: Column,
                     unit: Double = 1e6): DataFrame = {
    val o = labelPrototypes(oldCorpus, vec, label, unit)
      .select(col("lbl"), col("proto").as("po"))
    val n = labelPrototypes(newCorpus, vec, label, unit)
      .select(col("lbl"), col("proto").as("pn"))
    o.join(n, Seq("lbl"), "full_outer")
      .select(col("lbl"),
        when(col("po").isNull || col("pn").isNull,
          lit(null).cast("double"))
          .otherwise(round(cosine(col("po"), col("pn")), 4))
          .as("drift_cos"))
  }

  /** Scalar (int8) quantization of an embedding vector: per-vector
    * max-abs scaling to the symmetric byte range [-127, 127].
    * Returns a struct:
    *  - `q`     — `array<tinyint>`, round(x / scale);
    *  - `scale` — double, max|x| / 127 (1.0 for the all-zero vector,
    *    whose quantized form is all zeros anyway);
    *  - `inv_norm` — double, 1 / ‖v‖ of the ORIGINAL float vector,
    *    so approximate cosine needs no float reads at query time:
    *    cos ≈ int8dot(qa, qb) · scale_a · scale_b · inv_norm_a ·
    *    inv_norm_b.
    *
    * This is the INDEX-TIME step — run once per corpus row and
    * persisted as columns (the whole point: the stored index is ~4×
    * smaller than the float column, and query-time scans never touch
    * the floats until the exact rerank). The one-pass `transform` /
    * `aggregate` here are interpreted per element, which is
    * acceptable write-path cost; the query-time kernel is the native
    * codegen'd [[graft.plans.Int8Dot]].
    */
  def quantize(vec: Column): Column = {
    val absMax = array_max(transform(vec, x => abs(x.cast("double"))))
    val scale = when(absMax > 0.0, absMax / 127.0).otherwise(lit(1.0))
    val norm = sqrt(aggregate(vec,
      lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    // the per-element division reads the scale from a zip_with
    // ARGUMENT (evaluated once per row), never from the lambda body:
    // an interpreted-HOF lambda body gets no CSE, so referencing the
    // array_max subtree there would recompute max-abs per element —
    // O(dim²) per row, the documented hyperplaneSigComposable
    // anti-pattern
    struct(
      zip_with(vec, array_repeat(scale, size(vec)),
        (x, s) => round(x.cast("double") / s).cast("byte")).as("q"),
      scale.as("scale"),
      // ANSI division throws on a zero denominator — the all-zero
      // vector gets inv_norm 0.0, so its approximate score is 0,
      // matching its exact cosine (0.0 by the zero-norm guard in
      // CosineSim/cosineComposable); neither ranks
      when(norm > 0.0, lit(1.0) / norm).otherwise(lit(0.0)).as("inv_norm"))
  }

  /** Approximate-then-exact top-k over a quantized corpus: rank ALL
    * corpus vectors per query by the int8 approximate cosine (the
    * 4×-smaller scan), keep `k · overfetch` candidates, then rerank
    * just those with exact float cosine and keep k. With enough
    * overfetch the output EQUALS [[bruteForceTopK]] (the true top-k
    * survive the approximate cut — quantization error is ~1% of the
    * score at 64 dims) at a quarter of the scan/shuffle bytes.
    *
    * Scale shape: the approximate stage shuffles only
    * (query_id, vec_id, score) triples — never a vector of either
    * form; survivors (k·overfetch per query) join back to the float
    * column for the rerank. Null vectors are excluded up front. At
    * corpus scale, persist [[quantize]]'s struct as index columns so
    * this reads no floats at all until the rerank.
    */
  def quantizedTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                    queries: DataFrame, queryId: Column, queryVec: Column,
                    k: Int, overfetch: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(overfetch >= 1, s"overfetch must be >= 1, got $overfetch")
    val c = corpus.filter(corpusVec.isNotNull)
      .select(corpusId.as("vec_id"), quantize(corpusVec).as("cq"))
    val q = queries.filter(queryVec.isNotNull)
      .select(queryId.as("query_id"), quantize(queryVec).as("qq"))
    val approx = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (graft.plans.Int8Dot(col("cq.q"), col("qq.q")).cast("double") *
          col("cq.scale") * col("qq.scale") *
          col("cq.inv_norm") * col("qq.inv_norm")).as("ascore"))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("vec_id").asc)
    val cands = approx
      .withColumn("__rn", row_number().over(wApprox))
      .filter(col("__rn") <= k * overfetch)
      .select(col("query_id"), col("vec_id"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cands
      .join(corpus.select(corpusId.as("vec_id"), corpusVec.as("cv")),
        Seq("vec_id"))
      .join(broadcast(queries.select(queryId.as("query_id"),
        queryVec.as("qv"))), Seq("query_id"))
      .withColumn("cos", round(cosine(col("cv"), col("qv")), 4))
      .withColumn("rnk", row_number().over(wExact))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"),
        col("rnk").cast("int").as("rnk"))
  }

  /** Exact embedding-cosine near-duplicate pairs: all pairs above the
    * threshold — the O(n²) exact baseline (oracle-checkable). At
    * corpus scale use [[embeddingNearDups]] (LSH-blocked) or the IVF
    * path; this exists to measure their recall and to handle
    * dim-table-sized inputs exactly.
    */
  def bruteForcePairs(corpus: DataFrame, id: Column, vec: Column,
                      threshold: Double): DataFrame = {
    val c = corpus.select(id.as("vec_id"), vec.as("v"))
    // the non-equi self-join plans as a nested loop with one task per
    // streamed-side partition — a dim-sized corpus usually arrives as
    // ONE parquet split, serializing the O(n²) kernel; spread the
    // streamed side across the cluster first (the broadcast side is
    // the whole corpus by declared contract: exact baseline for
    // dim-table-sized inputs only)
    val a = c.repartition(c.sparkSession.sparkContext.defaultParallelism)
      .alias("a")
    val b = c.alias("b")
    a.join(broadcast(b), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(cosine(col("a.v"), col("b.v")), 4))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cos"))
  }

  /** Exact embedding-cosine pairs restricted to a deterministic
    * hash-sampled stratum: every pair with at least ONE endpoint in
    * a `witnessSize`-vector stratum, each graded with exact cosine
    * against the FULL corpus. The sublinear form of
    * [[bruteForcePairs]] — cost is O(witnessSize · n) map-side (the
    * stratum broadcasts; the corpus streams), never O(n²), so the
    * weak-similarity regime (thresholds no LSH blocks efficiently)
    * stays exactly auditable at any corpus size.
    *
    * One-sided membership matters: witness pairs survive at
    * ~witnessSize · pairDensity — CONSTANT as the corpus grows — where
    * a both-endpoints stratum decays as rate² and goes vacuous at
    * exactly the scales a sublinear witness exists for (the
    * [[Dedup.simhashValidate]] argument). Membership is a pure
    * md5 hash of the id (engine-portable, stable under retries), so
    * a pair missed here is missed at every scale — the gate's bite
    * does not dilute, only its cost stops scaling quadratically.
    */
  def stratumPairs(corpus: DataFrame, id: Column, vec: Column,
                   threshold: Double, witnessSize: Int = 500,
                   seed: Long = 42L): DataFrame = {
    require(witnessSize >= 1, s"witnessSize must be >= 1, got $witnessSize")
    // pin the (id, vec) projection: the count, the stratum filter and
    // the streamed side must all read the SAME materialized table —
    // re-reading `corpus` would re-run its upstream three times
    val vecs = corpus.select(id.as("vec_id"), vec.as("v")).localCheckpoint()
    val n = vecs.count()
    val rate = math.min(1.0, witnessSize.toDouble / math.max(n, 1L))
    val strat = vecs.filter(Sampling.keepHash(col("vec_id"), rate, seed))
      .select(col("vec_id").as("sid"), col("v").as("sv"))
    // a skinny corpus often arrives as one split; spread the streamed
    // side so the O(witnessSize · n) kernel parallelizes (the
    // broadcast side is the bounded stratum, NOT the corpus)
    val c = vecs.repartition(vecs.sparkSession.sparkContext.defaultParallelism)
    c.join(broadcast(strat), col("vec_id") =!= col("sid"))
      .withColumn("cos", round(cosine(col("v"), col("sv")), 4))
      .filter(col("cos") >= threshold)
      // canonicalize: a stratum-stratum pair appears once from each
      // endpoint's perspective; least/greatest + distinct collapses it
      .select(least(col("vec_id"), col("sid")).as("id_a"),
        greatest(col("vec_id"), col("sid")).as("id_b"), col("cos"))
      .distinct()
  }

  /** Embedding-cosine near-duplicate pairs over banded LSH buckets
    * (the embedding variant of [[Dedup.minhashNearDups]]): one
    * `bits`-bit hyperplane signature per vector, split into
    * `bits / bandBits` bands; vectors sharing ANY band's bits are
    * candidates, reranked with exact cosine. Banding is the standard
    * recall amplifier — per-band collision for a pair at angle θ is
    * (1 - θ/π)^bandBits, and missing ALL L bands decays as
    * (1 - p^b)^L, so true near-dups (θ small) are recovered with
    * high probability while the candidate count stays bucket-local.
    *
    * Pair generation carries the same skew guard as the text LSH
    * path ([[Dedup]]): per-bucket membership is counted *before*
    * anything is buffered, degenerate buckets (> maxBucket members —
    * e.g. many near-zero vectors collapsing to one signature) are
    * dropped with an observed metric, and surviving buckets expand
    * to pairs in one exchange with no self-join.
    */
  def embeddingNearDups(corpus: DataFrame, id: Column, vec: Column,
                        threshold: Double, bits: Int = 64,
                        maxBucket: Int = 4096,
                        bandBits: Int = 16): DataFrame = {
    require(bandBits >= 1 && bandBits <= 63 && bits % bandBits == 0,
      s"bandBits ($bandBits) must be in [1, 63] and divide bits ($bits)")
    val nBands = bits / bandBits
    // bucket-key space per band is 2^bandBits — the scale dial: wider
    // bands = more buckets (needed as the corpus grows past
    // 2^bandBits · maxBucket vectors) but lower per-band collision
    // probability p^bandBits, compensated by more bands. 64/16 keeps
    // near-identical pairs (p ≈ 0.99/bit) at recall ≈ 0.999 with a
    // 65536-key space; for corpora where even that saturates, block
    // by IVF cluster instead (Ivf) — partition-count there scales
    // with data, not with signature width.
    val vecs = corpus.select(id.as("vec_id"), vec.as("v")).localCheckpoint()
    // signatures derive from the PINNED table — reading `corpus` here
    // would re-execute the whole upstream a second time (the pin
    // exists precisely so every downstream reads materialized blocks)
    val banded = vecs
      .select(col("vec_id"), hyperplaneSig(col("v"), bits).as("sig"))
      .select(col("vec_id"), posexplode(array(
        Dedup.bitChunks(col("sig"), Seq.fill(nBands)(bandBits)): _*)))
      .toDF("vec_id", "band", "bkey")
    // candidates carry ids only — the float payload does not ride the
    // banding exchange nBands times, and each surviving pair is
    // reranked exactly once after the id-level distinct (the
    // minhashNearDups shape; the pinned `vecs` serves both rerank
    // joins, since aliased subtrees defeat exchange reuse)
    val cands = Dedup.boundedGroupPairs(banded,
        Seq(col("band"), col("bkey")), col("vec_id"), maxBucket,
        "embed_buckets")
      .toDF("id_a", "id_b")
      .distinct()
    // shuffle-hash-build the pinned vector side (same reason as
    // Dedup.rerankExact): cands is pair-expansion output whose size
    // the planner estimates linearly — broadcasting it is a GB-scale
    // driver collect once blocking saturates; the vecs side is the
    // honestly-bounded per-partition build
    cands
      .join(vecs.select(col("vec_id").as("id_a"), col("v").as("va"))
        .hint("shuffle_hash"), Seq("id_a"))
      .join(vecs.select(col("vec_id").as("id_b"), col("v").as("vb"))
        .hint("shuffle_hash"), Seq("id_b"))
      // raw-cosine gate before the per-row BigDecimal round — same
      // exactness argument as semDedup (HALF_UP can promote at most
      // 5e-5 below the threshold; the rounded filter still decides)
      .withColumn("__cos", cosine(col("va"), col("vb")))
      .filter(col("__cos") >= threshold - 1e-4)
      .withColumn("cos", round(col("__cos"), 4))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** SemDeDup-style semantic deduplication (cluster-partitioned
    * embedding near-dup + keep-one): k-means-cluster the corpus
    * ([[Ivf.index]] — deterministic centroids), compare pairs only
    * WITHIN each cluster, close the ≥-threshold pair graph
    * transitively ([[Dedup.connectedComponents]]), and keep each
    * class's smallest id plus every unpaired vector. Returns the
    * kept ids (one `vec_id` column).
    *
    * Scale shape: the clustering replaces the O(n²) global compare
    * with nlist × O((n/nlist)²) cluster-local compares — `nlist` is
    * THE dial (size clusters so the within-cluster quadratic is
    * tractable; the published recipe scales nlist with corpus size).
    * The self-join shuffles on `cluster`, so a mega-cluster is a
    * skew key — AQE splits the probe side, and a corpus whose
    * vectors collapse into one cluster needs a larger nlist, not a
    * bigger executor. Approximation contract: a near-dup pair split
    * across clusters is NOT found — inherent to the method; the
    * graded query runs on a corpus whose planted twins provably
    * co-cluster, and the banded-LSH path ([[embeddingNearDups]])
    * covers the no-false-negative regime.
    */
  def semDedup(corpus: DataFrame, id: Column, vec: Column,
               nlist: Int, threshold: Double, iters: Int = 2): DataFrame = {
    // pin the assignment once: the pair self-join reads it twice and
    // the kept-id anti-join a third time — unpinned, each would
    // re-run the whole Lloyd refinement
    val indexed = Ivf.index(corpus, id, vec, nlist, iters)._1
      .localCheckpoint()
    val a = indexed.select(col("cluster"), col("vec_id").as("id_a"),
      col("v").as("va"))
    val b = indexed.select(col("cluster"), col("vec_id").as("id_b"),
      col("v").as("vb"))
    // the raw-cosine gate runs BEFORE the 4-decimal round: round()
    // on a double is a per-row BigDecimal round-trip, and the
    // within-cluster expansion evaluates it ~1.7e9 times at sf10
    // (measured bound, Profile --semdedup) when almost every pair
    // fails the threshold. A margin of 1e-4 keeps strictly more
    // than HALF_UP rounding can promote (x rounds to >= t only if
    // x >= t - 5e-5), so the rounded filter still decides — the
    // gate is pure plumbing, zero semantic effect.
    val pairs = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__cos", cosine(col("va"), col("vb")))
      .filter(col("__cos") >= threshold - 1e-4)
      .withColumn("cos", round(col("__cos"), 4))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))
    val drops = Dedup.connectedComponents(pairs)
      .filter(col("doc_id") =!= col("class_rep"))
      .select(col("doc_id").as("vec_id"))
    indexed.select(col("vec_id")).join(drops, Seq("vec_id"), "left_anti")
  }
}
