package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) approximate nearest neighbor — the
  * memory-compression scale path for similarity search: split each
  * (unit-normalized) vector into `m` subvectors, k-means each
  * subspace into `ksub` centroids, and store per vector only the
  * `m`-byte code word of nearest-centroid ids. At dim 64 / m 8 the
  * index is 32× smaller than the float corpus (vs 4× for the int8
  * scalar path in [[Similarity.quantizedTopK]]) — the difference
  * between a RAM-resident and a disk-bound candidate scan at 100 TB.
  *
  * Query scoring is ADC (asymmetric distance computation): the query
  * stays float, one `m × ksub` dot-product table is built per query
  * (against the tiny codebook), and each candidate's approximate
  * cosine is `m` table lookups ([[graft.plans.PqAdc]], codegen'd —
  * no float multiply on the scan). Survivors of the approximate cut
  * are reranked with exact float cosine, same contract as the int8
  * and IVF paths.
  *
  * Deterministic by construction, like [[Ivf]]: centroid seeds are
  * the subvectors of the `ksub` lowest-id vectors, Lloyd refinement
  * is a fixed number of DataFrame rounds, assignment ties break on
  * the lower cluster id — same codebook every run, no RNG.
  *
  * Scale shape: training touches the corpus `iters` times; each pass
  * assigns with ONE codegen'd kernel per row ([[graft.plans.PqEncode]]
  * — the m·ksub·dsub-double codebook rides into the plan as a
  * literal), and the only corpus shuffle is the per-(sub, cluster,
  * pos) mean, bounded by m·ksub·dsub rows out. Encoding is one more
  * map-side kernel pass, shuffle-free; at production scale persist
  * the (vec_id, codes) index and reuse it across query batches (the
  * codebook rides alongside, m·ksub rows). The ADC scan shuffles
  * only (query_id, vec_id, score) triples — never a vector, never a
  * code word.
  */
object Pq {

  /** Unit-normalize (so dot = cosine); the all-zero vector maps to
    * itself (inv_norm 0), scoring 0 against everything — the same
    * zero-norm contract as [[Similarity.quantizedTopK]]'s quantize.
    * The inverse norm rides a zip_with ARGUMENT (array_repeat), not
    * the lambda body — an interpreted-HOF body gets no CSE, so
    * referencing the norm subtree there would recompute the
    * whole-vector fold per element (the documented anti-pattern).
    */
  private def unit(vec: Column): Column = {
    val v = transform(vec, x => x.cast("double"))
    val n2 = aggregate(v, lit(0.0), (acc, x) => acc + x * x)
    val inv = when(sqrt(n2) > 0.0, lit(1.0) / sqrt(n2)).otherwise(lit(0.0))
    zip_with(v, array_repeat(inv, size(v)), (x, s) => x * s)
  }

  /** Double-cast, optionally unit-normalized — `normalize = false`
    * is the RESIDUAL mode ([[IvfPq]]): residual vectors are
    * differences whose magnitude carries the signal, so they must
    * not be re-projected onto the sphere.
    */
  private[functions] def prep(vec: Column, normalize: Boolean): Column =
    if (normalize) unit(vec) else transform(vec, x => x.cast("double"))

  /** Dot product of two equal-length double arrays (in-order fold —
    * deterministic FP). Query-side only; the corpus side never
    * touches an interpreted fold.
    */
  private[functions] def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, c) => x * c), lit(0.0), (acc, e) => acc + e)

  /** Sub-major flattening of a driver-side codebook — the layout
    * [[graft.plans.PqEncode]] and the query tables index by
    * `(sub·ksub + cluster)·dsub`. Input must carry all m·ksub
    * (sub, cluster) pairs; output rides into the plan as ONE literal
    * array (m·ksub·dsub doubles — ~1k values at the defaults).
    */
  private def flatten(cents: Seq[(Int, Int, Seq[Double])]): Seq[Double] =
    cents.sortBy { case (s, c, _) => (s, c) }.flatMap(_._3)

  /** (vec_id, sub, sv): the corpus exploded into its m subvectors.
    * dim must be divisible by m (slices are size(v)/m; a trailing
    * remainder would silently vanish — callers pick m | dim). Used
    * only on the QUERY side (a handful of rows); the corpus-side
    * assignment is the native [[graft.plans.PqEncode]] kernel.
    */
  private def subRows(c: DataFrame, m: Int): DataFrame = {
    val dsub = size(col("v")).cast("int") / m
    c.select(col("vec_id"), posexplode(
        array((0 until m).map(s => slice(col("v"), dsub * s + 1, dsub)): _*)))
      .withColumnRenamed("pos", "sub").withColumnRenamed("col", "sv")
  }

  private def codebookDf(c: DataFrame,
                         cents: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    val spark = c.sparkSession
    import spark.implicits._
    cents.toDF("sub", "cluster", "cv")
  }

  /** Train the codebook: (sub, cluster, cv) with m·ksub rows.
    * Corpus vectors are unit-normalized first (PQ for cosine).
    */
  def train(corpus: DataFrame, id: Column, vec: Column, m: Int, ksub: Int,
            iters: Int = 2, normalize: Boolean = true): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(ksub >= 1 && ksub <= 256,
      s"ksub must be in [1, 256] (codes are unsigned bytes), got $ksub")
    val c = corpus.filter(vec.isNotNull)
      .select(id.as("vec_id"), prep(vec, normalize).as("v"))
    // deterministic seeds: the ksub lowest-id vectors, sliced
    // driver-side — cluster i of every subspace comes from the
    // (i+1)-th lowest id (works for any orderable id type)
    val seedVecs = c.orderBy(col("vec_id")).limit(ksub)
      .select(col("v")).collect().map(_.getSeq[Double](0))
    require(seedVecs.length == ksub,
      s"train: corpus has only ${seedVecs.length} vectors for ksub=$ksub " +
        "centroids per subspace — shrink ksub instead (the codebook " +
        "must not silently hold fewer codes than callers size tables for)")
    val dim = seedVecs.head.size
    require(dim % m == 0, s"train: dim $dim is not divisible by m=$m")
    val dsub = dim / m
    var cents: Seq[(Int, Int, Seq[Double])] = for {
      sub <- 0 until m; k <- 0 until ksub
    } yield (sub, k, seedVecs(k).slice(sub * dsub, (sub + 1) * dsub))
    (1 to iters).foreach { _ =>
      // assignment is ONE native kernel per row (no explode, no
      // crossJoin, no interpreted fold); the per-(sub, cluster)
      // element-wise mean is one exchange bounded by m·ksub·dsub
      // rows out
      val codes = c.select(col("v"),
        graft.plans.PqEncode(col("v"), typedlit(flatten(cents)), m, ksub)
          .as("codes"))
      val updated = codes.select(col("codes"), posexplode(col("v")))
        .select(
          (col("pos") / dsub).cast("int").as("sub"),
          pmod(col("pos"), lit(dsub)).as("j"),
          element_at(col("codes"), (col("pos") / dsub).cast("int") + 1)
            .cast("int").bitwiseAND(255).as("cluster"),
          col("col").as("x"))
        .groupBy(col("sub"), col("cluster"), col("j"))
        .agg(avg(col("x")).as("mu"))
        .groupBy(col("sub"), col("cluster"))
        .agg(array_sort(collect_list(struct(col("j"), col("mu")))).as("pm"))
        .select(col("sub"), col("cluster"),
          transform(col("pm"), x => x.getField("mu")).as("cv"))
      // m·ksub rows — driver-safe between iterations. An emptied
      // cluster (seed duplicates drained by the tie-break) keeps its
      // previous centroid: the codebook never shrinks (code bytes
      // index it positionally)
      val fresh = updated.collect().map(r =>
        ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2))).toMap
      cents = cents.map { case (s, k, old) =>
        (s, k, fresh.getOrElse((s, k), old)) }
    }
    codebookDf(c, cents)
  }

  /** Encode the corpus against a trained codebook:
    * (vec_id, codes array<tinyint>) — codes[sub] is the nearest
    * centroid id in subspace `sub`, stored as an unsigned byte. One
    * map-side [[graft.plans.PqEncode]] kernel per row: no shuffle at
    * all — at production scale write this out as the persistent
    * index and reuse it across query batches.
    */
  def encode(corpus: DataFrame, id: Column, vec: Column,
             codebook: DataFrame, m: Int,
             normalize: Boolean = true): DataFrame =
    corpus.filter(vec.isNotNull)
      .select(id.as("vec_id"),
        encodeExpr(codebook, m, normalize)(vec).as("codes"))

  /** The encode kernel as a reusable column function — lets a caller
    * that already carries other columns (e.g. [[IvfPq.index]]'s
    * `cluster`) encode IN PLACE instead of paying a vec_id join to
    * re-attach them to [[encode]]'s two-column output.
    */
  private[functions] def encodeExpr(codebook: DataFrame, m: Int,
                                    normalize: Boolean): Column => Column = {
    val rows = codebook.orderBy(col("sub"), col("cluster")).collect()
    require(rows.nonEmpty && rows.length % m == 0,
      s"encode: codebook has ${rows.length} rows, not a multiple of m=$m")
    val ksub = rows.length / m
    val flat = rows.toSeq.flatMap(_.getSeq[Double](2))
    vec => graft.plans.PqEncode(prep(vec, normalize), typedlit(flat),
      m, ksub)
  }

  /** Per-query flattened ADC table: (query_id, table array<double>)
    * with table[sub·ksub + cluster] = dot(query_sub, centroid).
    * Built against the broadcast codebook — m·ksub rows per query,
    * assembled in slot order (in-order fold downstream in
    * [[graft.plans.PqAdc]] keeps the FP deterministic).
    */
  def queryTables(queries: DataFrame, queryId: Column, queryVec: Column,
                  codebook: DataFrame, m: Int, ksub: Int,
                  normalize: Boolean = true): DataFrame = {
    val q = queries.filter(queryVec.isNotNull)
      .select(queryId.as("query_id"), prep(queryVec, normalize).as("v"))
      .withColumnRenamed("query_id", "vec_id")
    subRows(q, m)
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(codebook), Seq("sub"))
      .select(col("query_id"),
        (col("sub") * ksub + col("cluster")).as("slot"),
        dot(col("sv"), col("cv")).as("qd"))
      .groupBy(col("query_id"))
      .agg(array_sort(collect_list(struct(col("slot"), col("qd")))).as("sd"))
      .select(col("query_id"),
        transform(col("sd"), x => x.getField("qd")).as("table"))
  }

  /** Approximate-then-exact top-k over a PQ-encoded corpus: rank all
    * corpus code words per query by the ADC score (the 32×-smaller
    * scan), keep `k · overfetch` candidates, rerank just those with
    * exact float cosine and keep k. Output schema matches
    * [[Similarity.quantizedTopK]]: (query_id, vec_id, cos, rnk) —
    * rows that appear carry EXACT cosines; what PQ approximates is
    * only which rows survive the cut (gate with
    * [[Similarity.annRecallGate]] against brute force).
    */
  def adcTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, m: Int = 8, ksub: Int = 16, overfetch: Int = 4,
              iters: Int = 2): DataFrame = {
    val cb = train(corpus, corpusId, corpusVec, m, ksub, iters)
    val encoded = encode(corpus, corpusId, corpusVec, cb, m)
    adcTopKIndexed(encoded, cb, corpus, corpusId, corpusVec,
      queries, queryId, queryVec, k, m, ksub, overfetch)
  }

  /** The probe half of [[adcTopK]] against a PREBUILT index — the
    * build-once/probe-many shape a 100 TB deployment runs: `encoded`
    * is [[encode]]'s (vec_id, codes) table and `codebook` is
    * [[train]]'s output, both typically read back from parquet (byte
    * and double columns round-trip binary-exact, so a persisted
    * index probes identically to a fresh one). Only the code words
    * are scanned until the rerank joins the float column for the few
    * survivors.
    */
  def adcTopKIndexed(encoded: DataFrame, codebook: DataFrame,
                     corpus: DataFrame, corpusId: Column, corpusVec: Column,
                     queries: DataFrame, queryId: Column, queryVec: Column,
                     k: Int, m: Int, ksub: Int,
                     overfetch: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(overfetch >= 1, s"overfetch must be >= 1, got $overfetch")
    val tables = queryTables(queries, queryId, queryVec, codebook, m, ksub)
    val approx = encoded.crossJoin(broadcast(tables))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        graft.plans.PqAdc(col("codes"), col("table"), ksub).as("ascore"))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("vec_id").asc)
    val cands = approx
      .withColumn("__rn", row_number().over(wApprox))
      .filter(col("__rn") <= k * overfetch)
      .select(col("query_id"), col("vec_id"))
    rerank(cands, corpus, corpusId, corpusVec, queries, queryId, queryVec, k)
  }

  /** Shared rerank tail of the quantized paths ([[adcTopKIndexed]],
    * [[IvfPq.topK]]): exact float cosine over the (query_id, vec_id)
    * candidate pairs, keep k — rows that appear carry EXACT cosines.
    * Survivors join back to the float column; queries broadcast.
    */
  private[functions] def rerank(cands: DataFrame,
                                corpus: DataFrame, corpusId: Column,
                                corpusVec: Column, queries: DataFrame,
                                queryId: Column, queryVec: Column,
                                k: Int): DataFrame = {
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cands
      .join(corpus.select(corpusId.as("vec_id"), corpusVec.as("cv")),
        Seq("vec_id"))
      .join(broadcast(queries.select(queryId.as("query_id"),
        queryVec.as("qv"))), Seq("query_id"))
      .withColumn("cos", round(Similarity.cosine(col("cv"), col("qv")), 4))
      .withColumn("rnk", row_number().over(wExact))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"),
        col("rnk").cast("int").as("rnk"))
  }
}
