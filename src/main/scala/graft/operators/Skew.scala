package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys.
  *
  * First line of defense is AQE's skew-join splitting (on by default
  * in [[graft.Graft.session]]). This salted join is the explicit
  * fallback for the pathological case AQE can't fix: a build side
  * that must be replicated because one probe key carries a huge
  * fraction of all rows (the reference had only speculative execution
  * here — SURVEY §4).
  */
object Skew {

  /** Salted equi-join: the probe (large, skewed) side gets a
    * deterministic salt in [0, salts); the build side is replicated
    * once per salt value; the join key becomes (key, salt). Row
    * multiplicity is preserved exactly — each probe row joins its
    * single salted replica.
    *
    * Cost model: build side × salts extra rows shuffled, in exchange
    * for the hot key fanning out over `salts` reducers.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // right/full outer would emit each unmatched build row once per
    // salt replica — probe-side join types only
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(normalized),
      s"saltedJoin preserves multiplicity only for probe-side join types, got $joinType")
    // deterministic salt: stable under retries/speculation (a random
    // salt would break exactly-once row semantics on task rerun)
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.map(col).toIndexedSeq: _*)), lit(salts))
        .cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
