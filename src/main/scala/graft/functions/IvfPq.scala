package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ — the composition that runs billion-scale ANN in practice:
  * [[Ivf]]'s coarse quantizer prunes WHICH vectors are scanned
  * (nprobe of nlist clusters), and [[Pq]] compresses WHAT is scanned
  * (m one-byte codes per vector, encoding the RESIDUAL v − centroid
  * rather than v itself). The two attack independent axes — scan
  * population and scan bytes — and multiply: nprobe/nlist of the
  * corpus read at 16 B/vector.
  *
  * Residual encoding is what makes the composition more accurate
  * than flat PQ at the same code budget: within a cluster the
  * residuals are small and centered, so the (shared, single)
  * residual codebook spends its ksub^m cells on a tighter
  * distribution. Scoring splits exactly along the decomposition:
  * dot(q, v) = dot(q, c) + dot(q, v − c); the first term is computed
  * exactly per probed cluster (nlist-bounded), the second is the
  * standard ADC lookup over the residual code word
  * ([[graft.plans.PqAdc]]). Survivors rerank with exact float
  * cosine, same contract as every quantized path.
  *
  * Deterministic end to end (both trainers seed from lowest ids and
  * run fixed Lloyd rounds). Scale shape: the index is
  * (vec_id, cluster, codes) — write it `partitionBy("cluster")` like
  * [[Ivf.writePartitioned]] and a probe becomes a partition-pruned
  * 16 B/vector scan; the probe join ships only the (query, cluster,
  * qc-dot, table) rows (nprobe · ~2 KB per query, broadcast), and
  * the scan shuffles only (query_id, vec_id, score) triples.
  */
object IvfPq {

  /** Build the index: returns (index (vec_id, cluster, codes),
    * centroids (cluster, cv), residual codebook (sub, cluster, cv)).
    * Corpus vectors are unit-normalized before clustering (cosine
    * semantics); residuals are NOT re-normalized.
    */
  def index(corpus: DataFrame, id: Column, vec: Column, nlist: Int,
            m: Int, ksub: Int, ivfIters: Int = 1,
            pqIters: Int = 2): (DataFrame, DataFrame, DataFrame) = {
    require(nlist >= 1, s"nlist must be >= 1, got $nlist")
    val u = corpus.filter(vec.isNotNull)
      .select(id.as("vec_id"), Pq.prep(vec, normalize = true).as("uv"))
    val (assigned, cents) = Ivf.index(u, col("vec_id"), col("uv"),
      k = nlist, iters = ivfIters)
    // residuals against the assigned centroid — the frame the PQ
    // codebook is trained on and the code words encode. Pinned:
    // Pq.train reads it once per Lloyd round and encode once more,
    // and each read would otherwise replay the assignment join and
    // the per-element subtraction over the whole corpus
    // Residual as a PURE PROJECTION (the r15 assignment-as-projection
    // idiom): the nlist-row centroid table folds into one literal
    // array indexed by the (0-based) cluster id, so the subtraction
    // needs NO join at all. The former broadcast-join form measured
    // 85 s at sf10 against 8 s for the assignment alone (the join
    // re-planned the HOF-heavy stream side out of its split
    // projections); this form is join-free and keeps the assignment
    // and subtraction in their own stages (cluster is non-cheap and
    // referenced twice, so CollapseProject leaves the split alone).
    val centLit = array(cents.orderBy(col("cluster")).collect().map(r =>
      array(r.getSeq[Double](1).map(lit): _*)): _*)
    val resid = assigned
      .select(col("vec_id"), col("cluster"),
        zip_with(col("v"), element_at(centLit, col("cluster") + 1),
          (x, c) => x - c).as("rv"))
      .localCheckpoint()
    val codebook = Pq.train(resid, col("vec_id"), col("rv"), m, ksub,
      iters = pqIters, normalize = false)
    // pin the SMALL artifact (m bytes + cluster per vector), then
    // free the corpus-sized residual generation — the returned index
    // must not keep float-width blocks alive through its lineage.
    // The encode kernel runs IN PLACE over the pinned residuals
    // (r17): the old Pq.encode call dropped `cluster` and a vec_id
    // join (two exchanges) re-attached it.
    val out = resid.select(col("vec_id"), col("cluster"),
        Pq.encodeExpr(codebook, m, normalize = false)(col("rv"))
          .as("codes"))
      .localCheckpoint()
    Checkpoints.drop(resid)
    (out, cents, codebook)
  }

  /** Persist the full IVF-PQ artifact set — the build-once/probe-many
    * layout a 100 TB deployment runs: the code index written
    * `partitionBy("cluster")` (so a probe is a partition-pruned
    * m B/vector scan — [[Ivf.writePartitioned]]'s contract on the
    * compressed codes), plus the nlist-row centroid table and the
    * m·ksub-row residual codebook as plain parquet. Byte/double
    * columns round-trip binary-exact, so a probe through
    * [[readIndex]] scores identically to a fresh [[index]] build
    * (IvfPqSpec pins set equality; q_embed_ivfpq_disk grades the
    * recall gate through the round trip).
    */
  def writeIndex(index: DataFrame, centroids: DataFrame,
                 codebook: DataFrame, path: String): Unit = {
    index.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cluster").parquet(s"$path/index")
    centroids.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/centroids")
    codebook.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/codebook")
  }

  /** Read back [[writeIndex]]'s three artifacts as
    * (index, centroids, codebook) — feed them straight to [[topK]].
    * The index read keeps `cluster` as a partition column, so
    * [[topK]]'s probe join prunes cluster directories dynamically
    * (only the probed nprobe clusters' files are scanned).
    */
  def readIndex(spark: org.apache.spark.sql.SparkSession,
                path: String): (DataFrame, DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/index"),
      spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/codebook"))

  /** Probe: top-k per query scanning only the `nprobe` nearest
    * clusters' code words, scoring dot(q, c) + ADC(residual codes),
    * exact-cosine rerank of the `k · overfetch` survivors. Output
    * schema matches [[Pq.adcTopK]]: (query_id, vec_id, cos, rnk).
    */
  def topK(index: DataFrame, centroids: DataFrame, codebook: DataFrame,
           corpus: DataFrame, corpusId: Column, corpusVec: Column,
           queries: DataFrame, queryId: Column, queryVec: Column,
           k: Int, m: Int, ksub: Int, nprobe: Int,
           overfetch: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    require(overfetch >= 1, s"overfetch must be >= 1, got $overfetch")
    val qU = queries.filter(queryVec.isNotNull)
      .select(queryId.as("query_id"), Pq.prep(queryVec, normalize = true)
        .as("qv"))
    // nprobe nearest centroids per query, carrying the exact
    // dot(q, c) term of the score decomposition
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qc").desc, col("cluster").asc)
    val probes = qU.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("cluster"),
        Pq.dot(col("qv"), col("cv")).as("qc"))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe).drop("__rn")
    // residual ADC tables: the query is already unit — the table is
    // dot(q_sub, residual-centroid_sub), cluster-independent
    val tables = Pq.queryTables(qU, col("query_id"), col("qv"),
      codebook, m, ksub, normalize = false)
    val probeT = probes.join(tables, Seq("query_id"))
    val approx = index.join(broadcast(probeT), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (col("qc") +
          graft.plans.PqAdc(col("codes"), col("table"), ksub))
          .as("ascore"))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("vec_id").asc)
    val cands = approx
      .withColumn("__rn", row_number().over(wApprox))
      .filter(col("__rn") <= k * overfetch)
      .select(col("query_id"), col("vec_id"))
    Pq.rerank(cands, corpus, corpusId, corpusVec,
      queries, queryId, queryVec, k)
  }
}
