package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design notes (the 100 TB contract):
  *  - exact dedup is one hash-partitioned aggregation on a 16-byte
  *    digest — never on the raw text (shuffle carries digests, not
  *    documents)
  *  - MinHash-LSH shuffles (band, bucket) pairs — candidate
  *    generation never compares across buckets, so the self-join is
  *    bucket-local; band width trades recall vs. bucket size
  *  - all hash functions are seed-parameterized `xxhash64` (codegen'd,
  *    no UDF); signatures are fixed-width arrays, not sets
  *  - pair outputs are canonicalized (idA < idB) so downstream
  *    components (union-find, keep-one) see each pair once
  */
object Dedup {

  /** Word n-gram shingles of a document, with duplicates (cheap form:
    * element_at concatenation, no per-shingle array slice). Use when
    * the consumer is duplicate-insensitive (min-hash) or dedupes
    * post-explode (Jaccard inverted index).
    */
  def shinglesRaw(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    .otherwise(array(concat_ws(" ", toks)))
  }

  /** Word n-gram shingles of a document, distinct (set semantics, for
    * per-doc arrays fed to `array_intersect` reranking).
    */
  def shingles(text: Column, n: Int): Column =
    array_distinct(shinglesRaw(text, n))

  /** Exact dedup: group by content fingerprint, keep the smallest id.
    * Returns (fingerprint, keep_id, dup_cnt) — the keep/kill decision
    * per duplicate class.
    */
  def exactDupClasses(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(text).as("fp"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Exact dedup, filter form: keep one row per fingerprint (the
    * min-id row), preserving the full schema. Window-free variant of
    * dropDuplicates with a *deterministic* survivor.
    */
  def exactDedup(df: DataFrame, id: Column, text: Column): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(text)).orderBy(id.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Spread a skinny-but-compute-heavy input across the cluster: a
    * small parquet scan arrives in few partitions; hash-repartition
    * on the id so (a) the per-row shingle/hash work parallelizes and
    * (b) the downstream groupBy(id) needs no second exchange.
    */
  private def spread(df: DataFrame, id: Column): DataFrame =
    df.repartition(id)

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min of `xxhash64(seed, shingle)` over the doc's shingles.
    * One row per doc, signature = fixed-width array<long>.
    *
    * Shape: explode shingles once, then `numHashes` codegen'd `min`
    * aggregates with map-side partial aggregation — NOT a nested
    * higher-order expression (interpreted HOFs re-evaluate the
    * shingle pipeline per seed; the agg form evaluates it once per
    * row and combines before the shuffle).
    */
  def minhashSignature(df: DataFrame, id: Column, text: Column,
                       shingleN: Int = 3, numHashes: Int = 32): DataFrame = {
    // raw (duplicated) shingles: min() is duplicate-insensitive, so
    // the O(n^2) interpreted array_distinct is pure waste here
    val inv = spread(df, id)
      .select(id.as("doc_id"), explode(shinglesRaw(text, shingleN)).as("s"))
    val aggs = (0 until numHashes).map(i => min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    inv.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands of
    * `sig.length / bands` rows each; bucket key = hash of the band
    * slice. Docs sharing any (band, bucket) are candidates.
    * Returns candidate pairs (id_a < id_b), distinct.
    *
    * Pair generation is bucket-local: group each (band, bucket)'s
    * members and emit the pairs from the sorted member list — one
    * exchange, no self-join. (The join form either recomputes the
    * whole signature pipeline per side — exchange reuse doesn't fire
    * across differently-aliased subtrees — or persists an index whose
    * cached blocks leak past the query.) `maxBucket` drops degenerate
    * buckets (a collapsed band hash would contribute O(n²) junk
    * pairs); at working LSH parameters real buckets hold a handful of
    * docs.
    */
  def lshCandidates(sigs: DataFrame, bands: Int,
                    maxBucket: Int = 4096): DataFrame = {
    val rowsPerBand = floor(size(col("sig")) / bands).cast("int")
    val banded = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, concat_ws(",",
            transform(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand),
              x => x.cast("string")))))))
      .toDF("doc_id", "band", "bucket")
    pairsFromGroups(
      banded.groupBy(col("band"), col("bucket"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")).between(2, maxBucket)),
      "ids")
      .toDF("id_a", "id_b")
      .distinct()
  }

  /** Expand each group's sorted member array into its ordered pairs
    * (i < j) without a self-join: posexplode the left element, then
    * explode the tail slice after it. The group array is the only
    * per-row memory (bounded by the caller's bucket cap); emitted
    * pairs stream out of the same stage — no exchange, no persisted
    * intermediate.
    */
  private def pairsFromGroups(grouped: DataFrame, idsCol: String): DataFrame =
    grouped
      .select(col(idsCol), posexplode(col(idsCol)))
      .select(col("col").as("__a"),
        explode(slice(col(idsCol), col("pos") + 2,
          greatest(size(col(idsCol)) - col("pos") - 1, lit(0)))).as("__b"))

  /** MinHash near-dup end-to-end: signature -> LSH candidates ->
    * exact Jaccard rerank on the candidates only (never all pairs).
    */
  def minhashNearDups(df: DataFrame, id: Column, text: Column,
                      shingleN: Int = 3, numHashes: Int = 32,
                      bands: Int = 8, threshold: Double = 0.7): DataFrame = {
    val docs = spread(df, id).select(id.as("doc_id"), shingles(text, shingleN).as("sh"))
    val cands = lshCandidates(minhashSignature(df, id, text, shingleN, numHashes), bands)
    val a = docs.alias("da")
    val b = docs.alias("db")
    cands.join(a, col("id_a") === col("da.doc_id"))
      .join(b, col("id_b") === col("db.doc_id"))
      .withColumn("inter", size(array_intersect(col("da.sh"), col("db.sh"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("da.sh")) + size(col("db.sh")) - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact n-gram Jaccard pairs via shingle-inverted-index self-join —
    * the oracle-checkable (LSH-free) near-dup: pairs sharing >= 1
    * shingle, scored exactly. The shingle join IS the blocking — all
    *-pairs never materializes; skew guard: drop shingles appearing in
    * more than `maxDf` docs (stopword shingles would quadratically
    * blow up a 100 TB run).
    */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
                        shingleN: Int = 3, threshold: Double = 0.5,
                        maxDf: Int = 1000): DataFrame = {
    // raw shingles exploded, then a distributed distinct — cheaper
    // than per-row interpreted array_distinct; n_sh (distinct shingle
    // count per doc) via window on the dedup'd index
    val inv = spread(df, id)
      .select(id.as("doc_id"), explode(shinglesRaw(text, shingleN)).as("s"))
      .dropDuplicates("doc_id", "s")
      .withColumn("n_sh",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))).cast("int"))
    // group the inverted index by shingle: the group size IS the
    // document-frequency prune, and the member list is the pair
    // source — one exchange, no self-join, no persisted index.
    // Per-shingle memory is bounded by maxDf struct entries.
    val grouped = inv.groupBy(col("s"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh"))))
        .as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
    grouped
      .select(col("ds"), posexplode(col("ds")))
      .select(col("col.doc_id").as("id_a"), col("col.n_sh").as("na"),
        explode(slice(col("ds"), col("pos") + 2,
          greatest(size(col("ds")) - col("pos") - 1, lit(0)))).as("y"))
      .select(col("id_a"), col("na"),
        col("y.doc_id").as("id_b"), col("y.n_sh").as("nb"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over tokens: per bit, sum +1/-1 of each token
    * hash's bit, take the sign. Column-expression form — fine for
    * ad-hoc use on a few rows; bulk pipelines should use
    * [[simhashSignatures]] (explode+agg, codegen'd).
    */
  def simhash64(text: Column): Column = {
    val toks = TextAnalysis.bpeishTokens(text)
    val hashes = transform(toks, t => xxhash64(t))
    val bits = transform(sequence(lit(0), lit(63)), b =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc +
          when(call_function("shiftright", h, b).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L))
        > 0, lit(1L)).otherwise(lit(0L)))
    aggregate(
      zip_with(bits, sequence(lit(0), lit(63)),
        (bit, pos) => call_function("shiftleft", bit, pos)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Bulk SimHash: one row per doc. Explode tokens, hash once, then
    * 64 codegen'd bit-sums with map-side partial aggregation, then
    * assemble the sign bits. Same result as [[simhash64]], built for
    * corpus scale (the HOF form re-parses the text per bit).
    */
  def simhashSignatures(df: DataFrame, id: Column, text: Column): DataFrame =
    simhashSignaturesFromTokens(df, id, TextAnalysis.bpeishTokens(text))

  /** Signature computation over a pre-tokenized column (lets callers
    * that already materialized tokens avoid re-tokenizing).
    */
  def simhashSignaturesFromTokens(df: DataFrame, id: Column,
                                  tokens: Column): DataFrame = {
    // explode_outer: zero-token docs keep a row (null token) so they
    // still get a signature (sig=0, matching simhash64 on empty)
    val tok = spread(df, id)
      .select(id.as("doc_id"),
        explode_outer(tokens).as("t"))
      .select(col("doc_id"),
        when(col("t").isNotNull, xxhash64(col("t"))).as("h"))
    val aggs = (0 until 64).map { b =>
      sum(when(col("h").isNull, 0L)
        .when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L))
        .as(s"b$b")
    }
    tok.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("sig"))
  }

  /** SimHash near-dup candidates: block on 4 x 16-bit chunks (two
    * near-identical docs differ in few bits, so some chunk collides),
    * then exact Hamming rerank within blocks.
    */
  def simhashNearDups(df: DataFrame, id: Column, text: Column,
                      maxHamming: Int = 3, maxBucket: Int = 4096): DataFrame = {
    // empty/punctuation-only docs all share sig=0 — pairing them is
    // degenerate (k empty docs -> k²/2 hamming-0 pairs); exact dedup
    // handles identical-empty duplicates, so exclude them here.
    // Tokenize once into a column; filter and signatures share it.
    val nonEmpty = df
      .withColumn("__toks", TextAnalysis.bpeishTokens(text))
      .filter(size(col("__toks")) > 0)
    val sigs = simhashSignaturesFromTokens(nonEmpty, id, col("__toks"))
    val chunked = sigs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("sig"), c * 16).bitwiseAND(0xFFFFL))))
      .toDF("doc_id", "sig", "chunk", "ckey")
    // chunk-local pair expansion (same shape as lshCandidates): one
    // exchange instead of a self-join that would recompute the
    // 64-aggregate signature pipeline for both sides
    chunked.groupBy(col("chunk"), col("ckey"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig"))))
        .as("ds"))
      .filter(size(col("ds")).between(2, maxBucket))
      .select(col("ds"), posexplode(col("ds")))
      .select(col("col.doc_id").as("id_a"), col("col.sig").as("sig_a"),
        explode(slice(col("ds"), col("pos") + 2,
          greatest(size(col("ds")) - col("pos") - 1, lit(0)))).as("y"))
      .select(col("id_a"), col("y.doc_id").as("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
