package graft.functions

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("mgSketch is exact when capacity covers the distinct items") {
    val xs = Seq("a", "b", "a", "c", "a", "b")
    val (n, m) = Sketches.mgSketch(xs.iterator, capacity = 8)
    assert(n == 6)
    assert(m.toMap == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("mgSketch survivor guarantee and lower-bound counts under decrement") {
    val rnd = new Random(42)
    // 3 hot items dominate a long uniform tail; capacity 8 << distinct
    val hot = Seq.fill(400)("hot1") ++ Seq.fill(350)("hot2") ++
      Seq.fill(300)("hot3")
    val tail = (0 until 600).map(i => s"t$i")
    val xs = rnd.shuffle(hot ++ tail)
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (n, m) = Sketches.mgSketch(xs.iterator, capacity = 8)
    assert(n == xs.size)
    // any item with count > n/(cap+1) must survive
    val bound = n / 9.0
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(m.contains(k), s"$k (count ${truth(k)}) must survive")
    }
    // survivor counts are lower bounds within n/(cap+1) of the truth
    m.foreach { case (k, est) =>
      assert(est <= truth(k), s"$k overestimated: $est > ${truth(k)}")
      assert(truth(k) - est <= bound.toLong + 1)
    }
  }

  test("phiHeavyHitters equals exact GROUP BY HAVING on a skewed corpus") {
    val rnd = new Random(7)
    val hot = (0 until 10).flatMap(h => Seq.fill(500 - 20 * h)(s"hot$h"))
    val tail = (0 until 3000).map(i => s"t${i % 1500}")
    val data = rnd.shuffle(hot ++ tail)
    val df = data.toDF("item").repartition(4)
    val phi = 0.04 // > 1/(30+1) ≈ 0.032, the sketch guarantee bound
    val got = Sketches.phiHeavyHitters(df, $"item", phi, capacity = 30)
      .as[(String, Long)].collect().toSet
    val n = data.size
    val thr = math.ceil(phi * n).toLong
    val want = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toSet
    assert(want.nonEmpty, "fixture must produce heavy hitters")
    assert(got == want)
  }

  test("phiHeavyHitters rejects phi below the sketch guarantee") {
    val df = Seq("a").toDF("item")
    intercept[IllegalArgumentException] {
      Sketches.phiHeavyHitters(df, $"item", phi = 0.01, capacity = 20)
    }
  }

  test("phiHeavyHitters ignores null items") {
    val df = Seq(Some("a"), Some("a"), Some("a"), None).toDF("item")
    val got = Sketches.phiHeavyHitters(df, $"item", phi = 0.6, capacity = 4)
      .as[(String, Long)].collect().toSet
    // n counts the 3 non-null rows only: ceil(0.6*3)=2 <= 3
    assert(got == Set(("a", 3L)))
  }

  test("sketchPanel: theta distinct and KLL quantiles exact below capacity") {
    // 3 groups, known distincts and medians; everything is below the
    // sketches' exactness windows, so estimates must be EXACT
    val rows = for {
      g <- Seq("a", "b", "c"); i <- 0 until 120
    } yield (g, (i % (g(0) - 'a' + 2) * 10).toLong, i.toDouble)
    val df = rows.toDF("src", "k", "v")
    val panel = Sketches.sketchPanel(df, $"src", $"k", $"v")
    val got = panel.select($"group", $"n",
        call_function("theta_sketch_estimate", $"theta").cast("long"),
        call_function("hll_sketch_estimate", $"hll").cast("long"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // distinct k per group: a -> {0,10}, b -> {0,10,20}, c -> 4 values
    assert(got("a") == ((120L, 2L, 2L)))
    assert(got("b") == ((120L, 3L, 3L)))
    assert(got("c") == ((120L, 4L, 4L)))
  }

  test("panelRollup merges groups without rescanning: exact global answers") {
    val df = (0 until 300)
      .map(i => (s"g${i % 3}", (i % 57).toLong, i.toDouble))
      .toDF("src", "k", "v")
    val panel = Sketches.sketchPanel(df, $"src", $"k", $"v")
    val row = Sketches.panelRollup(panel, Seq(0.5, 0.95)).collect().head
    assert(row.getAs[Long]("n") == 300L)
    assert(row.getAs[Long]("distinct_theta") == 57L)
    assert(row.getAs[Long]("distinct_hll") == 57L)
    // v = 0..299 retained exactly (n < kllK buffer): p50/p95 are
    // actual data values at those ranks
    val p50 = row.getAs[Double]("p50")
    val p95 = row.getAs[Double]("p95")
    assert(p50 >= 145.0 && p50 <= 155.0, s"p50=$p50")
    assert(p95 >= 280.0 && p95 <= 290.0, s"p95=$p95")
  }

  test("panelRollup of two disjoint-half panels equals the whole-corpus rollup") {
    val df = (0 until 400)
      .map(i => (s"g${i % 4}", (i % 83).toLong, i.toDouble)).toDF("src", "k", "v")
    val whole = Sketches.panelRollup(
      Sketches.sketchPanel(df, $"src", $"k", $"v")).collect().head
    val parts = Sketches.panelRollup(
      Sketches.sketchPanel(df.filter($"v" < 200), $"src", $"k", $"v")
        .unionByName(
          Sketches.sketchPanel(df.filter($"v" >= 200), $"src", $"k", $"v")))
      .collect().head
    // theta union of exact sketches is exact — identical estimates
    assert(whole.getAs[Long]("distinct_theta") ==
      parts.getAs[Long]("distinct_theta"))
    assert(whole.getAs[Long]("n") == parts.getAs[Long]("n"))
  }

  test("panelRollupBy re-groups a finer panel exactly (vs a direct build)") {
    val df = (0 until 360)
      .map(i => (s"s${i % 3}", s"l${i % 4}", (i % 41).toLong, i.toDouble))
      .toDF("src", "lang", "k", "v")
    val fine = Sketches.sketchPanelBy(df,
      Seq(col("src"), col("lang")), $"k", $"v")
    val regrouped = Sketches.panelRollupBy(fine, Seq(col("lang")))
      .select($"lang", $"n", $"distinct_theta")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // direct per-lang build: same n and (exact-mode) theta distinct
    val direct = Sketches.sketchPanel(df, $"lang", $"k", $"v")
      .select($"group", $"n",
        call_function("theta_sketch_estimate", $"theta").cast("long"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(regrouped == direct, s"regrouped=$regrouped direct=$direct")
  }

  test("theta_intersection_agg over per-group sketches is exact N-way AND") {
    // groups: g0 = {0..59}, g1 = {30..89}, g2 = {50..109};
    // 3-way intersection = {50..59} (10), union = {0..109} (110)
    val df = (Seq.tabulate(60)(i => ("g0", i.toLong)) ++
      Seq.tabulate(60)(i => ("g1", (i + 30).toLong)) ++
      Seq.tabulate(60)(i => ("g2", (i + 50).toLong))).toDF("g", "id")
    val got = df.groupBy($"g")
      .agg(call_function("theta_sketch_agg", $"id", lit(20)).as("sk"))
      .agg(
        call_function("theta_sketch_estimate",
          call_function("theta_intersection_agg", $"sk")).as("both"),
        call_function("theta_sketch_estimate",
          call_function("theta_union_agg", $"sk", lit(20))).as("any"))
      .as[(Long, Long)].collect().head
    assert(got == ((10L, 110L)), got.toString)
  }

  test("thetaOverlap: exact set algebra below capacity, no join in the plan") {
    val a = (0 until 150).map(_.toLong).toDF("id")
    val b = (100 until 300).map(_.toLong).toDF("id")
    val got = Sketches.thetaOverlap(a, b, $"id")
      .select(col("n_a").cast("long"), col("n_b").cast("long"),
        col("n_both").cast("long"), col("n_either").cast("long"),
        col("n_a_only").cast("long"), col("n_b_only").cast("long"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((150L, 200L, 50L, 300L, 100L, 150L)))
    // the whole overlap is two single-row aggregations + a 1x1 cross
    // product — no shuffle join of the key universes
    val plan = Sketches.thetaOverlap(a, b, $"id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
