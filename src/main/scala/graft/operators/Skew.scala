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

  /** Salt = hash of (row content, per-partition row position): the
    * row hash alone is CONSTANT across identical duplicate rows —
    * exactly the shape a hot key often has (probe projected to the
    * join key, repeated events) — which would land the whole hot key
    * on one reducer while still paying the build×salts replication.
    * monotonically_increasing_id breaks those ties; for a
    * deterministic scan (file source, same splits) it is stable
    * under retry/speculation, and ANY salt assignment yields the
    * same join result — determinism here is about reproducible
    * execution, not correctness.
    */
  private[operators] def saltExpr(probe: DataFrame, salts: Int): Column =
    pmod(xxhash64(struct(
      probe.columns.map(col).toIndexedSeq :+ monotonically_increasing_id(): _*)),
      lit(salts)).cast("int")

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
    val saltCol = graft.Names.fresh("__salt", probe.columns, build.columns)
    val salted = probe.withColumn(saltCol, saltExpr(probe, salts))
    val replicated = build.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, saltCol), joinType).drop(saltCol)
  }
}
