package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private def randVec(rnd: scala.util.Random, dim: Int = 32): Seq[Float] =
    Seq.fill(dim)(rnd.nextFloat() * 2 - 1)

  test("index is deterministic; codes are m bytes, clusters within nlist") {
    val e = graft.Graft.table(spark, sf, "embeddings").limit(200)
    def build() = {
      val (idx, _, _) = IvfPq.index(e, col("vec_id"), col("embedding"),
        nlist = 8, m = 8, ksub = 8)
      idx.collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getSeq[Byte](2).toList)).toMap
    }
    val a = build(); val b = build()
    assert(a == b)
    assert(a.size == 200)
    a.values.foreach { case (cluster, codes) =>
      assert(cluster >= 0 && cluster < 8)
      assert(codes.size == 8)
      assert(codes.forall(c => (c & 0xFF) < 8))
    }
  }

  test("nprobe = nlist with exhaustive overfetch equals brute force") {
    // all clusters probed + candidates >= corpus: the approximate cut
    // keeps everything, so the exact rerank IS brute-force top-k —
    // provable equality, not a recall floor
    val e = graft.Graft.table(spark, sf, "embeddings").limit(150)
    val queries = e.filter(col("vec_id") < 3)
    val (idx, cents, cb) = IvfPq.index(e, col("vec_id"), col("embedding"),
      nlist = 8, m = 8, ksub = 8)
    val got = IvfPq.topK(idx, cents, cb, e, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"),
        k = 5, m = 8, ksub = 8, nprobe = 8, overfetch = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val exact = Similarity.bruteForceTopK(e, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    assert(got == exact, s"got=$got exact=$exact")
  }

  test("planted near-identical pairs are retrieved top-1 through the pruned probe") {
    val rnd = new scala.util.Random(31)
    val planted = (0 until 5).flatMap { i =>
      val v = randVec(rnd)
      val twin = v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f)
      Seq((i.toLong, v), (100L + i, twin))
    }
    val background = (0 until 120).map(i => (200L + i, randVec(rnd)))
    val corpus = (planted ++ background).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 5)
    val (idx, cents, cb) = IvfPq.index(corpus, col("vec_id"),
      col("embedding"), nlist = 8, m = 8, ksub = 8)
    // a twin lands in the SAME cluster as its query (cos ~0.99997),
    // so even nprobe=2 must find it at rank 1
    val got = IvfPq.topK(idx, cents, cb, corpus, col("vec_id"),
        col("embedding"), queries, col("vec_id"), col("embedding"),
        k = 1, m = 8, ksub = 8, nprobe = 2, overfetch = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 5).foreach { i =>
      assert(got(i.toLong) == 100L + i,
        s"query $i retrieved ${got.get(i.toLong)}, wanted twin ${100 + i}")
    }
  }

  test("persisted index round-trips binary-exact and probes partition-pruned") {
    val e = graft.Graft.table(spark, sf, "embeddings").limit(200)
    val queries = e.filter(col("vec_id") < 3)
    val (idx, cents, cb) = IvfPq.index(e, col("vec_id"), col("embedding"),
      nlist = 8, m = 8, ksub = 8)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq")
    try {
      IvfPq.writeIndex(idx, cents, cb, tmp.toString)
      // one directory per cluster under index/
      val dirs = new java.io.File(tmp.toString + "/index").listFiles()
        .filter(_.getName.startsWith("cluster=")).map(_.getName).toSet
      assert(dirs.size > 1, s"expected several cluster dirs, got $dirs")
      val (dIdx, dCents, dCb) = IvfPq.readIndex(spark, tmp.toString)
      // binary-exact round trip: codes, centroids, codebook
      def codes(df: org.apache.spark.sql.DataFrame) =
        df.select("vec_id", "cluster", "codes").collect()
          .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Byte](2).toList))
          .toMap
      assert(codes(dIdx) == codes(idx))
      assert(dCents.collect().map(r => r.getInt(0) -> r.getSeq[Double](1))
        .toMap == cents.collect().map(r => r.getInt(0) -> r.getSeq[Double](1))
        .toMap)
      // the disk probe equals the in-memory probe row-for-row
      def run(i: org.apache.spark.sql.DataFrame,
              c: org.apache.spark.sql.DataFrame,
              b: org.apache.spark.sql.DataFrame) =
        IvfPq.topK(i, c, b, e, col("vec_id"), col("embedding"),
            queries, col("vec_id"), col("embedding"),
            k = 5, m = 8, ksub = 8, nprobe = 3, overfetch = 8)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getInt(3))).toSet
      assert(run(dIdx, dCents, dCb) == run(idx, cents, cb))
      // partition pruning reaches the code scan: a literal cluster
      // filter is a PartitionFilter (static form), and the probe
      // join's cluster key is eligible for dynamic pruning
      val one = spark.read.parquet(tmp.toString + "/index")
        .filter(col("cluster") === 0)
      val plan = one.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
        plan.take(800))
      // dynamic case: the executed probe plan carries a
      // dynamicpruning subquery on the index scan's cluster column
      val probePlan = IvfPq.topK(dIdx, dCents, dCb, e, col("vec_id"),
          col("embedding"), queries, col("vec_id"), col("embedding"),
          k = 5, m = 8, ksub = 8, nprobe = 3, overfetch = 8)
        .queryExecution.executedPlan.toString
      assert(probePlan.contains("dynamicpruning") ||
        probePlan.contains("DynamicPruning"), probePlan.take(1200))
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }

  test("pruned probe scans exactly its nprobe clusters' population") {
    val e = graft.Graft.table(spark, sf, "embeddings").limit(200)
    val queries = e.filter(col("vec_id") < 2)
    val (idx, cents, cb) = IvfPq.index(e, col("vec_id"), col("embedding"),
      nlist = 8, m = 8, ksub = 8)
    val sizes = idx.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val myCluster = idx.filter(col("vec_id") < 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // re-derive each query's probed clusters independently (unit
    // vector · centroid, top 2 by (dot desc, cluster asc))
    val cvs = cents.collect().map(r => r.getInt(0) -> r.getSeq[Double](1))
    val qs = e.filter(col("vec_id") < 2)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    def probed(q: Seq[Double]): Seq[Int] = {
      val n = math.sqrt(q.map(x => x * x).sum)
      val u = q.map(_ / n)
      cvs.map { case (c, cv) =>
        (u.zip(cv).map { case (a, b) => a * b }.sum, c) }
        .sortBy { case (d, c) => (-d, c) }.take(2).map(_._2).toSeq
    }
    // k = corpus size with overfetch 1: the approximate cut keeps
    // every scanned row, so the OUTPUT size per query equals the
    // probed clusters' population (minus the query itself when its
    // own cluster is probed) — a direct measurement that only
    // nprobe clusters were scanned
    val got = IvfPq.topK(idx, cents, cb, e, col("vec_id"),
        col("embedding"), queries, col("vec_id"), col("embedding"),
        k = 200, m = 8, ksub = 8, nprobe = 2, overfetch = 1)
      .groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    qs.foreach { case (qid, q) =>
      val ps = probed(q)
      val want = ps.map(sizes).sum -
        (if (ps.contains(myCluster(qid))) 1L else 0L)
      assert(got(qid) == want,
        s"query $qid scanned ${got(qid)} rows, probed clusters $ps hold $want")
      assert(want < 200L, "degenerate: probe covers the whole corpus")
    }
  }
}
