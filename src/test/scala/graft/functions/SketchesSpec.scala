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
}
