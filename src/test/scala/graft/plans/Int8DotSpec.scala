package graft.plans

import graft.{Graft, SparkSpec}
import graft.functions.Similarity
import org.apache.spark.sql.functions._

class Int8DotSpec extends SparkSpec {
  import spark.implicits._

  /** Composable witness: the same dot as `aggregate`/`zip_with` over
    * long-cast elements (zip_with pads mismatched lengths with null
    * and the sum nulls out — matching the native null semantics).
    */
  private def composable(a: org.apache.spark.sql.Column,
                         b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)

  test("native Int8Dot equals the composable form on random byte arrays") {
    // Seq[Byte], not Array[Byte]: the Array form encodes as BINARY,
    // not array<tinyint>
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(64)
      (Seq.fill(n)((rnd.nextInt(255) - 127).toByte),
       Seq.fill(n)((rnd.nextInt(255) - 127).toByte))
    }
    val df = rows.toDF("a", "b")
    df.select(Int8Dot($"a", $"b").as("native"),
        composable($"a", $"b").as("witness"))
      .collect().foreach { r =>
        assert(r.getLong(0) == r.getLong(1), s"$r")
      }
  }

  test("Int8Dot nulls on mismatch/null element, zero on empty arrays") {
    val mismatched = Seq((Seq(1.toByte), Seq(1.toByte, 2.toByte)))
      .toDF("a", "b")
    assert(mismatched.select(Int8Dot($"a", $"b")).collect().head.isNullAt(0))
    val withNullElem = Seq((Seq(Some(1.toByte), None), Seq(Some(2.toByte), Some(3.toByte))))
      .toDF("a", "b")
    assert(withNullElem.select(Int8Dot($"a", $"b")).collect().head.isNullAt(0))
    val empty = Seq((Seq.empty[Byte], Seq.empty[Byte])).toDF("a", "b")
    assert(empty.select(Int8Dot($"a", $"b")).collect().head.getLong(0) == 0L)
    val nullSide = Seq((Option.empty[Seq[Byte]], Some(Seq(1.toByte))))
      .toDF("a", "b")
    assert(nullSide.select(Int8Dot($"a", $"b")).collect().head.isNullAt(0))
  }

  test("Int8Dot rejects non-byte arrays at analysis time") {
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Int8Dot($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("int8_dot"))
  }

  test("quantize stays in [-127, 127], preserves sign, zero vector is safe") {
    val df = Seq(
      Seq(0.5f, -1.0f, 0.0f, 0.25f),
      Seq(0.0f, 0.0f, 0.0f, 0.0f)).toDF("v")
    val rows = df.select(Similarity.quantize($"v").as("z"))
      .select($"z.q", $"z.scale", $"z.inv_norm").collect()
    val q0 = rows(0).getSeq[Byte](0)
    assert(q0.forall(b => b >= -127 && b <= 127))
    assert(q0(0) > 0 && q0(1) < 0 && q0(2) == 0)
    assert(q0(1) == -127) // the max-abs element hits the range edge
    val q1 = rows(1).getSeq[Byte](0)
    assert(q1.forall(_ == 0) && rows(1).getDouble(1) == 1.0)
  }

  test("quantized approximate cosine tracks exact cosine within 3%") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 100).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "v")
    val q = lit(rows.head._2)
    val got = df.filter($"id" > 0).select(
      Similarity.cosine($"v", q).as("exact"),
      (Int8Dot(Similarity.quantize($"v").getField("q"),
               Similarity.quantize(q).getField("q")).cast("double") *
        Similarity.quantize($"v").getField("scale") *
        Similarity.quantize(q).getField("scale") *
        Similarity.quantize($"v").getField("inv_norm") *
        Similarity.quantize(q).getField("inv_norm")).as("approx"))
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.03,
        s"exact ${r.getDouble(0)} vs approx ${r.getDouble(1)}")
    }
  }

  test("quantizedTopK equals bruteForceTopK on real embeddings") {
    val e = Graft.table(spark, sf, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val quant = Similarity.quantizedTopK(e, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), k = 5, overfetch = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(quant == exact)
  }
}
