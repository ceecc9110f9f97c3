package graft.meta

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile: one row per column with exact counters below sketch capacity") {
    val df = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), None),
      (3L, Some("a"), Some(30L)),
      (4L, None, Some(10L))).toDF("id", "s", "v")
    val got = Profiler.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
    assert(got("v") == ((4L, 1L, 2L, "10", "30")))
  }

  test("profile is one aggregation pass: a single scan in the plan") {
    val df = (1L to 100L).map(i => (i, s"x$i")).toDF("a", "b")
    val plan = Profiler.profile(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    // every column's counters ride one aggregate — profiling must
    // not re-scan per column
    assert(plan.split("LocalTableScan|Scan ").length <= 2, plan)
  }

  test("profile rejects an empty column list") {
    val df = Seq(1L).toDF("x")
    intercept[IllegalArgumentException] {
      Profiler.profile(df, Seq.empty)
    }
  }

  test("profile handles hostile column names (quotes, backticks, dots)") {
    // the stack()-SQL form broke on any of these; the Column-API
    // unpivot must treat the name as an opaque string
    val df = Seq((1L, "a"), (2L, "b"))
      .toDF("it's.a `quoted` name", "__p_0")
    val got = Profiler.profile(df,
      Seq("it's.a `quoted` name", "__p_0"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("it's.a `quoted` name") == 2L)
    assert(got("__p_0") == 2L) // no collision with internal aliases
  }

  test("profileTopK: exact per-column top-k with deterministic ties") {
    val df = Seq("a", "a", "a", "b", "b", "c", "c", "d")
      .zipWithIndex.map { case (s, i) => (s, (i % 3).toLong) }
      .toDF("s", "m")
    val got = Profiler.profileTopK(df, Seq("s", "m"), k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    assert(got(("s", 1)) == (("a", 3L)))
    assert(got(("s", 2)) == (("b", 2L))) // b beats c on item tiebreak
    assert(got(("m", 1)) == (("0", 3L)))
    assert(got(("m", 2)) == (("1", 3L))) // "1" < "2" string order
  }

  test("profileTopK: nulls are not items; counts stay exact under " +
      "the Misra-Gries decrement path") {
    // capacity 2 over 4 distinct values forces decrements in pass 1;
    // pass 2's exact count must still rank the true heavy hitter first
    val vals = Seq.fill(40)("hot") ++ Seq("x", "y", "z") ++
      Seq.fill(3)(null.asInstanceOf[String])
    val df = vals.map(Tuple1(_)).toDF("v").repartition(2)
    val top = Profiler.profileTopK(df, Seq("v"), k = 1, capacity = 2)
      .collect()
    assert(top.length == 1)
    assert(top.head.getString(2) == "hot" && top.head.getLong(3) == 40L)
  }

  test("profileQuantiles: exact below the KLL buffer, one pass, one " +
      "row per column") {
    val df = (1L to 100L).map(i => (i, i * 2)).toDF("a", "b")
    val got = Profiler.profileQuantiles(df, Seq("a", "b"), Seq(0.5))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // 100 values sit inside the k=200 buffer -> the sketch is exact;
    // the p50 of 1..100 is 50 or 51 depending on the rank convention
    assert(got("a")._1 == 100L && got("a")._2 >= 50.0 &&
      got("a")._2 <= 51.0, got("a").toString)
    assert(got("b")._2 >= 100.0 && got("b")._2 <= 102.0,
      got("b").toString)
    val plan = Profiler.profileQuantiles(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(plan.split("LocalTableScan|Scan ").length <= 2, plan)
  }

  test("drift flags null-rate jumps, distinct blowups, and range " +
      "shifts between two profile reports") {
    val before = Seq(
      (1L, Some("a"), Some(10L)), (2L, Some("b"), Some(10L)),
      (3L, Some("a"), Some(10L)), (4L, Some("b"), Some(10L)))
      .toDF("id", "s", "v")
    // after: half the s values null (rate 0 -> 0.5), v cardinality
    // 1 -> 4 (past the 2x ratio), id range extended
    val after = Seq(
      (1L, None, Some(10L)), (2L, None, Some(21L)),
      (3L, Some("a"), Some(31L)), (9L, Some("b"), Some(41L)))
      .toDF("id", "s", "v")
    val cols = Seq("id", "s", "v")
    val got = Profiler.drift(
      Profiler.profile(before, cols), Profiler.profile(after, cols))
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(got("s") == ((true, false, false)), got("s").toString)
    assert(got("v") == ((false, true, true)), got("v").toString)
    assert(got("id") == ((false, false, true)), got("id").toString)
  }

  test("drift handles a column present on only one side") {
    val a = Seq((1L, "x")).toDF("id", "only_before")
    val b = Seq((1L, "y")).toDF("id", "only_after")
    val got = Profiler.drift(
      Profiler.profile(a, Seq("id", "only_before")),
      Profiler.profile(b, Seq("id", "only_after")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    // new column: zero before-counts, distinct blowup fires
    assert(got("only_after") == ((0L, 1L, true)))
    // removed column: zero after-counts, no blowup
    assert(got("only_before") == ((1L, 0L, false)))
  }

  test("profileQuantiles rejects quantiles that collide after percent " +
      "rounding") {
    val df = Seq(1L, 2L, 3L).toDF("x")
    // 0.5 and 0.504 both alias to p50 — must fail loud, not produce
    // an ambiguous/shadowed column
    val e = intercept[IllegalArgumentException] {
      Profiler.profileQuantiles(df, Seq("x"), Seq(0.5, 0.504))
    }
    assert(e.getMessage.contains("collide"), e.getMessage)
    // distinct integer percents keep working
    assert(Profiler.profileQuantiles(df, Seq("x"), Seq(0.25, 0.5))
      .count() == 1L)
  }

  test("profileTopK rejects bad arguments") {
    val df = Seq(1L).toDF("x")
    intercept[IllegalArgumentException] {
      Profiler.profileTopK(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Profiler.profileTopK(df, Seq("x"), k = 0)
    }
    intercept[IllegalArgumentException] {
      Profiler.profileTopK(df, Seq("x"), k = 5, capacity = 3)
    }
  }
}
