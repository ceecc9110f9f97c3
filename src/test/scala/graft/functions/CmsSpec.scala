package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def est(items: Seq[String], probes: Seq[String], depth: Int,
                  width: Int): Map[String, Long] = {
    val df = items.toDF("w")
    val table = Sketches.cmsTable(df, col("w"), depth, width)
    Sketches.cmsEstimate(table, probes.toDF("k"), col("k"), depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimates never undercount, and are exact without collisions") {
    // 26 distinct items in a wide sketch: collisions effectively
    // impossible in at least one of 4 rows -> estimates exact
    val items = ('a' to 'z').flatMap(c => Seq.fill(c - 'a' + 1)(c.toString))
    val got = est(items, Seq("a", "m", "z", "absent"), depth = 4,
      width = 4096)
    assert(got("a") == 1L && got("m") == 13L && got("z") == 26L)
    assert(got("absent") == 0L)
  }

  test("lower bound holds under forced collisions (width 2)") {
    val items = Seq.fill(40)("hot") ++ (0 until 60).map(i => s"t$i")
    val exact = Map("hot" -> 40L) ++ (0 until 60).map(i => s"t$i" -> 1L)
    val got = est(items, exact.keys.toSeq, depth = 3, width = 2)
    exact.foreach { case (k, c) =>
      assert(got(k) >= c, s"undercount on $k: ${got(k)} < $c")
    }
    // width 2 forces heavy collisions: the total mass bound still
    // caps every estimate at n
    assert(got.values.forall(_ <= 100L))
  }

  test("sketch of a union equals the elementwise sum of sketches") {
    val xs = (0 until 50).map(i => s"x${i % 7}")
    val ys = (0 until 30).map(i => s"y${i % 5}")
    def tbl(items: Seq[String]) =
      Sketches.cmsTable(items.toDF("w"), col("w"), depth = 3, width = 16)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    val merged = tbl(xs ++ ys)
    val a = tbl(xs); val b = tbl(ys)
    val summed = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == summed)
  }

  test("fast (xxhash64) path keeps every sketch law") {
    val items = Seq.fill(40)("hot") ++ (0 until 60).map(i => s"t$i")
    val df = items.toDF("w")
    val table = Sketches.cmsTable(df, col("w"), depth = 3, width = 16,
      portable = false)
    assert(table.count() <= 3L * 16L)
    assert(table.agg(sum("cnt")).collect()(0).getLong(0) == 300L) // n*depth
    val got = Sketches.cmsEstimate(table, items.distinct.toDF("k"),
        col("k"), depth = 3, width = 16, portable = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("hot") >= 40L)
    (0 until 60).foreach(i => assert(got(s"t$i") >= 1L))
    // mixing hash families must NOT silently work: a portable-probe
    // of a fast table still returns values (no crash) but the caller
    // owns the pairing — the laws above are the per-family contract
  }

  test("table is bounded by depth*width rows; null items are excluded") {
    val items = (0 until 5000).map(i => s"k$i")
    val n = Sketches.cmsTable(items.toDF("w"), col("w"), depth = 4,
      width = 32).count()
    assert(n <= 4L * 32L, s"table has $n rows")
    val withNull = Sketches.cmsTable(
      Seq(Some("a"), None, Some("b")).toDF("w"), col("w"), 2, 8)
    assert(withNull.agg(sum("cnt")).collect()(0).getLong(0) == 4L) // 2 items x 2 rows
  }
}
