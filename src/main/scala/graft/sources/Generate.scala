package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine deterministic corpus generation — the RandomTextWriter /
  * RandomWriter role (reference: src/examples/org/apache/hadoop/
  * examples/RandomTextWriter.java:82 — a map-only job, each mapper
  * synthesizing its share of random word sequences; gridmix-style
  * soak and bench corpora are built from it). As an engine operator
  * the generator must be callable from a Spark job (the harness-side
  * tools/gen_sf.py cannot), DISTRIBUTED (one `spark.range` narrow
  * stage, no shuffle, scales to any row count by partition count)
  * and DETERMINISTIC — same (rows, seed, dials) → same corpus on any
  * cluster size, so a soak test is reproducible and a generated
  * fixture can be oracle-checked.
  *
  * Randomness is counter-based rather than stateful (the Spark-
  * native substitute for the reference's per-mapper `Random`): every
  * drawn value is a pure hash of (seed, row id, draw tag) — rows are
  * independent, partitioning is irrelevant to content, and there is
  * no RNG object whose sequence would couple rows. The portable form
  * uses the engine-neutral md5-prefix idiom the sampling family
  * established, so an external engine (or the DuckDB oracle)
  * regenerates the corpus bit-for-bit; `portable = false` swaps in
  * xxhash64 for cheap bulk generation when nothing outside Spark
  * re-derives it.
  */
object Generate {

  /** Uniform 32-bit draw for (seed, id, tag): the md5-prefix idiom
    * (portable) or xxhash64 folded to 32 bits (fast — nonnegative so
    * `% n` stays a uniform residue either way).
    */
  private def draw(seed: Long, tag: String, portable: Boolean) = {
    val key = concat_ws(":", lit(seed), col("id"), lit(tag))
    if (portable)
      conv(substring(md5(key), 1, 8), 16, 10).cast("long")
    else
      pmod(xxhash64(key), lit(1L << 32))
  }

  /** Same draw keyed additionally by an in-row counter column (the
    * per-word draw).
    */
  private def drawAt(seed: Long, tag: String, i: org.apache.spark.sql.Column,
                     portable: Boolean) = {
    val key = concat_ws(":", lit(seed), col("id"), lit(tag), i)
    if (portable)
      conv(substring(md5(key), 1, 8), 16, 10).cast("long")
    else
      pmod(xxhash64(key), lit(1L << 32))
  }

  /** Generate `rows` documents of whitespace-joined synthetic words:
    * (doc_id, text). Each document draws its word count uniformly
    * from [minWords, maxWords] and each word from a `vocab`-sized
    * vocabulary (`w0`…`w{vocab-1}`). `skewed = true` draws each word
    * as the MIN of two independent vocabulary draws — an integer-only
    * skew (P(idx) ∝ vocab − idx, linearly favoring low ids) that
    * gives the corpus heavy hitters for sketch / dedup soak tests
    * without any floating-point in the pipeline (pow-based Zipf would
    * hang reproducibility on libm-vs-StrictMath last-bit agreement).
    *
    * Scale shape: `spark.range(rows, numPartitions)` → one map-side
    * projection, no exchange, no driver state; 10⁹ rows is just more
    * partitions. All expressions are built-in codegen'd columns.
    */
  /** The word-sequence column shared by [[randomText]] and
    * [[randomKv]]: word count uniform in [minWords, maxWords] drawn
    * under `nTag`, each word under `(wTag, position)` — distinct tag
    * pairs give statistically independent columns off the same row
    * id with zero extra scans. Skew is the min-of-two-draws integer
    * form (second draw tagged `wTag + "2"`, which keeps
    * [[randomText]]'s historical "w"/"w2" tags bit-stable).
    */
  private def wordsExpr(seed: Long, nTag: String, wTag: String,
                        minWords: Int, maxWords: Int, vocab: Int,
                        skewed: Boolean, portable: Boolean)
      : org.apache.spark.sql.Column = {
    require(minWords >= 0 && maxWords >= minWords,
      s"need 0 <= minWords <= maxWords, got [$minWords, $maxWords]")
    require(vocab >= 1, s"vocab must be >= 1, got $vocab")
    val nWords = (lit(minWords) +
      pmod(draw(seed, nTag, portable), lit(maxWords - minWords + 1L)))
      .cast("int")
    def wordIdx(i: org.apache.spark.sql.Column) = {
      val d1 = pmod(drawAt(seed, wTag, i, portable), lit(vocab.toLong))
      if (!skewed) d1
      else least(d1,
        pmod(drawAt(seed, wTag + "2", i, portable), lit(vocab.toLong)))
    }
    array_join(
      when(nWords > 0, transform(sequence(lit(1), nWords),
        i => concat(lit("w"), wordIdx(i))))
        .otherwise(array().cast("array<string>")),
      " ")
  }

  private def rangeBase(spark: SparkSession, rows: Long,
                        numPartitions: Int) = {
    require(rows >= 0, s"rows must be >= 0, got $rows")
    if (numPartitions > 0) spark.range(0L, rows, 1L, numPartitions)
    else spark.range(rows)
  }

  def randomText(spark: SparkSession, rows: Long, minWords: Int = 10,
                 maxWords: Int = 100, vocab: Int = 1000, seed: Long = 42L,
                 skewed: Boolean = false, numPartitions: Int = 0,
                 portable: Boolean = true): DataFrame =
    rangeBase(spark, rows, numPartitions)
      .select(col("id").as("doc_id"),
        wordsExpr(seed, "n", "w", minWords, maxWords, vocab, skewed,
          portable).as("text"))

  /** Key/value corpus — the RandomWriter/gridmix input shape
    * (reference: src/benchmarks/gridmix/README:28-71 sizes every job
    * family's input as `(k, v) = (a-b words, c-d words)`
    * SequenceFiles; src/examples/.../RandomWriter.java:57 is the
    * generator behind them). One `spark.range` narrow projection
    * emits (id, k, v) with independently-drawn key and value word
    * sequences — no join of two generated frames, no shuffle, same
    * determinism/portability dials as [[randomText]]. `skewed`
    * applies to BOTH columns (heavy keys are what make a grouped
    * soak interesting; heavy value words are what make compression
    * realistic).
    */
  def randomKv(spark: SparkSession, rows: Long,
               keyMinWords: Int = 5, keyMaxWords: Int = 5,
               valueMinWords: Int = 100, valueMaxWords: Int = 100,
               vocab: Int = 1000, seed: Long = 42L,
               skewed: Boolean = false, numPartitions: Int = 0,
               portable: Boolean = true): DataFrame =
    rangeBase(spark, rows, numPartitions)
      .select(col("id"),
        wordsExpr(seed, "kn", "kw", keyMinWords, keyMaxWords, vocab,
          skewed, portable).as("k"),
        wordsExpr(seed, "vn", "vw", valueMinWords, valueMaxWords, vocab,
          skewed, portable).as("v"))
}
