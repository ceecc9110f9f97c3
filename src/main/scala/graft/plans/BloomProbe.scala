package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column bindings for Spark's bloom-filter expressions — the same
  * machinery Catalyst injects for runtime shuffle pruning
  * (InjectRuntimeFilter), exposed for an ENGINE-LEVEL use: summarize
  * a huge standing corpus into a compact bitmap once, then prefilter
  * incremental deltas map-side with a codegen'd probe.
  *
  * The reference ships the identical idea as file metadata:
  * BloomMapFile keys its membership test with a per-file bloom so a
  * reader skips files that cannot contain the key
  * (src/core/org/apache/hadoop/io/BloomMapFile.java:46); this is that
  * test as a COLUMN over any relation, not just a sorted map file.
  *
  * Both sides hash through the same seeded [[XxHash64]], so a filter
  * built by [[agg]] and a probe by [[mightContain]] always agree.
  * The aggregate is TypedImperative (no whole-stage codegen for the
  * build — one pass, partial filters OR-merged across partitions);
  * the probe IS codegen'd (`BloomFilterMightContain.doGenCode`), which
  * is where the row volume lives.
  */
object BloomProbe {

  /** Aggregate a column into serialized bloom-filter bytes.
    * `numBits` fixes the bitmap size (use
    * `BloomFilter.optimalNumOfBits(items, fpp)`); memory is
    * `numBits / 8` bytes on the driver and per partial — independent
    * of row count, which is the whole point.
    */
  def agg(value: Column, expectedItems: Long, numBits: Long): Column = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(numBits > 0, s"numBits must be > 0, got $numBits")
    GraftColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(GraftColumnBridge.expression(value))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Membership probe against [[agg]]'s bytes. `bloom` must be a
    * CONSTANT column (a `lit(bytes)` — Catalyst requires the filter
    * side foldable so codegen can deserialize it once per task, not
    * per row). False ⇒ definitely absent; true ⇒ present or a
    * false positive at the built fpp.
    */
  def mightContain(bloom: Column, value: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(GraftColumnBridge.expression(bloom),
        new XxHash64(Seq(GraftColumnBridge.expression(value)))))
}
