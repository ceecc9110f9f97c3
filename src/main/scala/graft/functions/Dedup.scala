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

  /** Word n-gram shingles of a document, distinct. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks))))
  }

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

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min of `xxhash64(seed, shingle)` over the doc's shingles.
    * One row per doc, signature = fixed-width array<long>.
    */
  def minhashSignature(df: DataFrame, id: Column, text: Column,
                       shingleN: Int = 3, numHashes: Int = 32): DataFrame = {
    val sh = shingles(text, shingleN)
    val sig = transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(sh, s => xxhash64(seed, s))))
    df.select(id.as("doc_id"), sig.as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands of
    * `sig.length / bands` rows each; bucket key = hash of the band
    * slice. Docs sharing any (band, bucket) are candidates.
    * Returns candidate pairs (id_a < id_b), distinct.
    */
  def lshCandidates(sigs: DataFrame, bands: Int): DataFrame = {
    val rowsPerBand = floor(size(col("sig")) / bands).cast("int")
    val banded = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, concat_ws(",",
            transform(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand),
              x => x.cast("string")))))))
      .toDF("doc_id", "band", "bucket")
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** MinHash near-dup end-to-end: signature -> LSH candidates ->
    * exact Jaccard rerank on the candidates only (never all pairs).
    */
  def minhashNearDups(df: DataFrame, id: Column, text: Column,
                      shingleN: Int = 3, numHashes: Int = 32,
                      bands: Int = 8, threshold: Double = 0.7): DataFrame = {
    val docs = df.select(id.as("doc_id"), shingles(text, shingleN).as("sh"))
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
    val docs = df.select(id.as("doc_id"), shingles(text, shingleN).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val inv = docs.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("s"))
    val keep = inv.groupBy(col("s")).agg(count(lit(1)).as("df_cnt"))
      .filter(col("df_cnt") <= maxDf)
    val pruned = inv.join(keep, Seq("s"), "left_semi")
    val a = pruned.alias("a")
    val b = pruned.alias("b")
    a.join(b, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over tokens: per bit, sum +1/-1 of each token
    * hash's bit, take the sign. Pure column expressions: 64 bit-sums
    * via transform over a literal 0..63 sequence, then bit-assembly.
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

  /** SimHash near-dup candidates: block on 4 x 16-bit chunks (two
    * near-identical docs differ in few bits, so some chunk collides),
    * then exact Hamming rerank within blocks.
    */
  def simhashNearDups(df: DataFrame, id: Column, text: Column,
                      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(id.as("doc_id"), simhash64(text).as("sig"))
    val chunked = sigs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("sig"), c * 16).bitwiseAND(0xFFFFL))))
      .toDF("doc_id", "sig", "chunk", "ckey")
    val a = chunked.alias("a")
    val b = chunked.alias("b")
    val ham = bit_count(col("a.sig").bitwiseXOR(col("b.sig")))
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        ham.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
