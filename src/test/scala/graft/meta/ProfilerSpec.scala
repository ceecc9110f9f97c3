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
}
