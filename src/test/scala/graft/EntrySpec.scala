package graft

/** Pins the driver's smoke contract: entry() returns rows. */
class EntrySpec extends SparkSpec {
  test("entry() flagship query returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query has either an oracle or a documented rows-only check") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
    val rowsOnly = qs -- os
    // keep the rows-only set intentional and small
    assert(rowsOnly == Set("q_minhash_lsh", "q_simhash", "q_embed_ann",
      "q_embed_ivf"), s"unexpected rows-only queries: $rowsOnly")
  }
}
