package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  /** dim 32 float vectors with a seeded generator. */
  private def randVec(rnd: scala.util.Random, dim: Int = 32): Seq[Float] =
    Seq.fill(dim)(rnd.nextFloat() * 2 - 1)

  test("codebook is deterministic, m·ksub rows of dim/m-length centroids") {
    val e = graft.Graft.table(spark, sf, "embeddings").limit(200)
    val cb1 = Pq.train(e, col("vec_id"), col("embedding"), m = 8, ksub = 8,
      iters = 1)
    val cb2 = Pq.train(e, col("vec_id"), col("embedding"), m = 8, ksub = 8,
      iters = 1)
    val c1 = cb1.collect().map(r =>
      (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val c2 = cb2.collect().map(r =>
      (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    assert(c1 == c2)
    assert(c1.size == 64)
    assert(c1.values.forall(_.size == 8)) // dim 64 / m 8
  }

  test("encode emits one m-byte code word per vector, codes within ksub") {
    val e = graft.Graft.table(spark, sf, "embeddings").limit(200)
    val cb = Pq.train(e, col("vec_id"), col("embedding"), m = 8, ksub = 8,
      iters = 1)
    val codes = Pq.encode(e, col("vec_id"), col("embedding"), cb, m = 8)
      .collect()
    assert(codes.length == 200)
    codes.foreach { r =>
      val cw = r.getSeq[Byte](1)
      assert(cw.size == 8, s"code word ${cw.size} wide")
      assert(cw.forall(b => (b & 0xFF) < 8), s"code out of range: $cw")
    }
  }

  test("planted near-identical pairs are retrieved top-1 (strong structure)") {
    val rnd = new scala.util.Random(7)
    // 5 planted (query, twin) pairs + 90 random background vectors
    val planted = (0 until 5).flatMap { i =>
      val v = randVec(rnd)
      val twin = v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f)
      Seq((i.toLong, v), (100L + i, twin))
    }
    val background = (0 until 90).map(i => (200L + i, randVec(rnd)))
    val corpus = (planted ++ background).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 5)
    val got = Pq.adcTopK(corpus, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"),
        k = 1, m = 8, ksub = 8, overfetch = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 5).foreach { i =>
      assert(got(i.toLong) == 100L + i,
        s"query $i retrieved ${got(i.toLong)}, wanted twin ${100 + i}")
    }
  }

  test("returned cosines are EXACT (match brute force on shared pairs)") {
    val e = graft.Graft.table(spark, sf, "embeddings").limit(150)
    val queries = e.filter(col("vec_id") < 3)
    val pq = Pq.adcTopK(e, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"),
        k = 5, m = 8, ksub = 8, overfetch = 8, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Similarity.bruteForceTopK(e, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = pq.keySet & exact.keySet
    assert(shared.nonEmpty, "no overlap between PQ and brute force at all")
    shared.foreach { k =>
      assert(pq(k) == exact(k), s"cos mismatch on $k: ${pq(k)} vs ${exact(k)}")
    }
  }

  test("null vectors are excluded; the zero vector scores 0 and is safe") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 40).map(i => (i.toLong, Some(randVec(rnd, 16)))) ++
      Seq((40L, Some(Seq.fill(16)(0.0f))), (41L, Option.empty[Seq[Float]]))
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0L)
    val got = Pq.adcTopK(corpus, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"),
      k = 3, m = 4, ksub = 8, overfetch = 4, iters = 1).collect()
    assert(got.length == 3)
    assert(!got.exists(_.getLong(1) == 41L), "null vector ranked")
    // the zero vector's exact cosine is 0 — it may appear only with cos 0
    got.filter(_.getLong(1) == 40L).foreach(r =>
      assert(r.getDouble(2) == 0.0))
  }

  test("persisted index probes identically to the in-memory one") {
    val e = graft.Graft.table(spark, sf, "embeddings").limit(150)
    val queries = e.filter(col("vec_id") < 3)
    val cb = Pq.train(e, col("vec_id"), col("embedding"), m = 8, ksub = 8,
      iters = 1)
    val encoded = Pq.encode(e, col("vec_id"), col("embedding"), cb, m = 8)
    val dir = java.nio.file.Files.createTempDirectory("pq-index").toString
    encoded.write.parquet(s"$dir/codes")
    cb.write.parquet(s"$dir/codebook")
    def run(enc: org.apache.spark.sql.DataFrame,
            book: org.apache.spark.sql.DataFrame) =
      Pq.adcTopKIndexed(enc, book, e, col("vec_id"), col("embedding"),
          queries, col("vec_id"), col("embedding"),
          k = 5, m = 8, ksub = 8, overfetch = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
    val mem = run(encoded, cb)
    val disk = run(spark.read.parquet(s"$dir/codes"),
      spark.read.parquet(s"$dir/codebook"))
    assert(mem == disk, s"mem=$mem disk=$disk")
    assert(mem.nonEmpty)
  }

  test("train fails loudly when the corpus is smaller than ksub") {
    val tiny = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pq.train(tiny, col("vec_id"), col("embedding"), m = 2, ksub = 8,
        iters = 1)
    }
    assert(e.getMessage.contains("shrink ksub"))
  }
}
