package graft.plans

import graft.{Graft, SparkSpec}
import graft.functions.Similarity
import org.apache.spark.sql.functions._

class HyperplaneSigSpec extends SparkSpec {

  test("native HyperplaneSig equals the composable form on real embeddings") {
    val e = Graft.table(spark, sf, "embeddings").limit(200)
    for (bits <- Seq(1, 4, 8, 16, 64)) {
      val both = e.select(
        Similarity.hyperplaneSig(col("embedding"), bits).as("native"),
        Similarity.hyperplaneSigComposable(col("embedding"), bits).as("composable"))
      both.collect().foreach { r =>
        assert(r.getLong(0) == r.getLong(1),
          s"bits=$bits: ${r.getLong(0)} != ${r.getLong(1)}")
      }
    }
  }

  test("HyperplaneSig null/empty/double-array semantics mirror the composable form") {
    import spark.implicits._
    val floats = Seq(
      (1L, Some(Seq(Some(1.0f), Some(-2.0f), Some(0.5f)))),
      (2L, Some(Seq(Some(1.0f), None, Some(0.5f)))), // null element -> sig 0
      (3L, Some(Seq.empty[Option[Float]])),          // empty -> sig 0
      (4L, None)                                     // null vector -> sig 0
    ).toDF("id", "v")
    val rows = floats.select(col("id"),
        Similarity.hyperplaneSig(col("v"), 8).as("n"),
        Similarity.hyperplaneSigComposable(col("v"), 8).as("c"))
      .orderBy("id").collect()
    assert(rows(0).getLong(1) == rows(0).getLong(2))
    assert(rows(1).getLong(1) == 0L && rows(1).getLong(2) == 0L)
    assert(rows(2).getLong(1) == 0L && rows(2).getLong(2) == 0L)
    assert(rows(3).getLong(1) == 0L && rows(3).getLong(2) == 0L)

    val doubles = Seq((1L, Seq(0.25, -1.5, 3.0, 0.0))).toDF("id", "v")
    val dr = doubles.select(
      Similarity.hyperplaneSig(col("v"), 12).as("n"),
      Similarity.hyperplaneSigComposable(col("v"), 12).as("c")).collect().head
    assert(dr.getLong(0) == dr.getLong(1))
  }

  test("HyperplaneSig signature distance tracks cosine similarity") {
    import spark.implicits._
    // a vector, a tiny perturbation, and its negation: the perturbed
    // copy must land strictly closer in signature space than the
    // antipode (which flips every hyperplane side)
    val v = Array(0.9f, -0.3f, 0.7f, 0.1f, -0.8f, 0.4f, 0.2f, -0.6f)
    val near = v.map(x => x + 0.001f)
    val anti = v.map(x => -x)
    val df = Seq((0L, v.toSeq), (1L, near.toSeq), (2L, anti.toSeq)).toDF("id", "v")
    val sigs = df.select(col("id"), Similarity.hyperplaneSig(col("v"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(1L)) < ham(sigs(0L), sigs(2L)))
    assert(ham(sigs(0L), sigs(2L)) == 16) // antipode flips all 16 bits
  }
}
