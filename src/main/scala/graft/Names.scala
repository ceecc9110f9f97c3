package graft

/** Scratch-column naming, shared by every operator that temporarily
  * widens a user DataFrame (salted joins, quarantine probes, as-of
  * tags, global ranks). `withColumn` silently REPLACES an existing
  * column and the operator's final `drop` would then delete user
  * data — so scratch names must be proven fresh against every frame
  * they touch, not assumed.
  */
private[graft] object Names {

  /** A prefix no column in any of `cols` starts with. Both the
    * returned prefix itself and any `prefix_suffix` name derived
    * from it are then guaranteed fresh in all the given frames
    * (startsWith is deliberately stronger than exact equality: one
    * probe covers a whole family of derived names). The probe is
    * CASE-INSENSITIVE: Spark resolves column names case-
    * insensitively by default (spark.sql.caseSensitive=false), so a
    * user column differing only in case would still be replaced by
    * withColumn — freshness must hold under the resolver's equality,
    * not the JVM string's.
    */
  def fresh(seed: String, cols: Iterable[String]*): String = {
    var p = seed.toLowerCase
    while (cols.exists(_.exists(_.toLowerCase.startsWith(p)))) p += "_"
    p
  }
}
