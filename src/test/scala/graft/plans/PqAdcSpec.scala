package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqAdcSpec extends SparkSpec {
  import spark.implicits._

  private val KSUB = 16

  /** Composable witness: the same lookup-sum via zip_with over the
    * code word and its position sequence, element_at into the table
    * (1-based), in-order fold — matches the native FP exactly.
    */
  private def composable(codes: org.apache.spark.sql.Column,
                         table: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(codes, sequence(lit(0), size(codes) - 1),
        (code, sub) => element_at(table,
          sub * KSUB + code.cast("int").bitwiseAND(255) + 1)),
      lit(0.0), (acc, v) => acc + v)

  test("native PqAdc equals the composable form on random code words") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 200).map { _ =>
      val m = 1 + rnd.nextInt(16)
      (Seq.fill(m)(rnd.nextInt(KSUB).toByte),
       Seq.fill(m * KSUB)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("codes", "table")
    df.select(PqAdc($"codes", $"table", KSUB).as("native"),
        composable($"codes", $"table").as("witness"))
      .collect().foreach { r =>
        assert(r.getDouble(0) == r.getDouble(1), s"$r")
      }
  }

  test("codes are unsigned: byte -1 reads slot 255") {
    // one subspace, ksub 256: code byte -1 must index table[255]
    val table = (0 until 256).map(_.toDouble)
    val df = Seq((Seq((-1).toByte), table)).toDF("codes", "table")
    val got = df.select(PqAdc($"codes", $"table", 256)).collect().head
    assert(got.getDouble(0) == 255.0)
  }

  test("PqAdc nulls on null element, out-of-range code, null side; 0.0 on empty") {
    val nullElem = Seq((Seq(Option.empty[Byte]), Seq(1.0, 2.0)))
      .toDF("codes", "table")
    assert(nullElem.select(PqAdc($"codes", $"table", KSUB))
      .collect().head.isNullAt(0))
    // code 3 with a 2-entry table: idx 3 out of range -> null, not OOB
    val short = Seq((Seq(3.toByte), Seq(1.0, 2.0))).toDF("codes", "table")
    assert(short.select(PqAdc($"codes", $"table", KSUB))
      .collect().head.isNullAt(0))
    val nullSide = Seq((Option.empty[Seq[Byte]], Some(Seq(1.0))))
      .toDF("codes", "table")
    assert(nullSide.select(PqAdc($"codes", $"table", KSUB))
      .collect().head.isNullAt(0))
    val empty = Seq((Seq.empty[Byte], Seq(1.0))).toDF("codes", "table")
    assert(empty.select(PqAdc($"codes", $"table", KSUB))
      .collect().head.getDouble(0) == 0.0)
  }

  test("PqEncode matches an independent argmin on random vectors/codebooks") {
    // reference: plain Scala L2 argmin with the same first-wins tie
    // rule — no shared code with PqEncode.compute's loop
    def ref(v: Seq[Double], cb: Seq[Double], m: Int, ksub: Int): Seq[Int] = {
      val dsub = v.size / m
      (0 until m).map { sub =>
        (0 until ksub).minBy { c =>
          val d = (0 until dsub).map { j =>
            val diff = v(sub * dsub + j) - cb((sub * ksub + c) * dsub + j)
            diff * diff
          }.sum
          (d, c)
        }
      }
    }
    val rnd = new scala.util.Random(23)
    val m = 4; val ksub = 8; val dsub = 3
    val rows = (0 until 150).map { _ =>
      (Seq.fill(m * dsub)(rnd.nextDouble() * 2 - 1),
       Seq.fill(m * ksub * dsub)(rnd.nextDouble() * 2 - 1))
    }
    val got = rows.toDF("v", "cb")
      .select(PqEncode($"v", $"cb", m, ksub).as("codes"))
      .collect().map(_.getSeq[Byte](0).map(_ & 0xFF))
    rows.zip(got).foreach { case ((v, cb), codes) =>
      assert(codes == ref(v, cb, m, ksub), s"v=$v")
    }
  }

  test("PqEncode nulls on a null element, throws on structural mismatch") {
    val nullElem = Seq((Seq(Some(1.0), None, Some(2.0), Some(0.5)),
      Seq.fill(8)(0.1))).toDF("v", "cb")
    assert(nullElem.select(PqEncode($"v", $"cb", 2, 2))
      .collect().head.isNullAt(0))
    val badDim = Seq((Seq(1.0, 2.0, 3.0), Seq.fill(8)(0.1))).toDF("v", "cb")
    val e1 = intercept[Exception] {
      badDim.select(PqEncode($"v", $"cb", 2, 2)).collect()
    }
    assert(e1.getMessage.contains("not divisible"))
    val badCb = Seq((Seq(1.0, 2.0), Seq.fill(7)(0.1))).toDF("v", "cb")
    val e2 = intercept[Exception] {
      badCb.select(PqEncode($"v", $"cb", 2, 2)).collect()
    }
    assert(e2.getMessage.contains("codebook"))
  }

  test("PqAdc rejects wrong input types at analysis time") {
    val df = Seq((Seq(1, 2), Seq(3.0, 4.0))).toDF("codes", "table")
    val e = intercept[Exception] {
      df.select(PqAdc($"codes", $"table", KSUB)).collect()
    }
    assert(e.getMessage.contains("pq_adc"))
  }
}
