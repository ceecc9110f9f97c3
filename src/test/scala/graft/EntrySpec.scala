package graft

/** Pins the driver's smoke contract: entry() returns rows. */
class EntrySpec extends SparkSpec {
  test("entry() flagship query returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query has an oracle — no rows-only holes") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
    // round 3: the former rows-only set (minhash_lsh, simhash,
    // embed_ann, embed_ivf) now carries real oracles — minhash via
    // provable equality with the exact Jaccard set, simhash/ann via
    // self-validating witness outputs with constant oracles, ivf via
    // nprobe=nlist equality with brute force. Keep it that way.
    assert(qs == os, s"rows-only queries (need an oracle): ${qs -- os}")
  }
}
