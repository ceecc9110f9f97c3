package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the
  * centroid-partitioned scale path for similarity search: cluster
  * the corpus once (index build), then probe only the `nprobe`
  * clusters nearest each query.
  *
  * Deterministic by construction: centroid seeds are the lowest-id
  * vectors, Lloyd refinement is a fixed number of DataFrame
  * iterations, ties broken on cluster id — same index every run,
  * no RNG, no stored model beyond the (small) centroid table.
  *
  * Scale shape: assignment is a broadcast of k centroids against a
  * map-side [[Similarity.cosine]] scan; the only corpus shuffle is
  * the element-wise centroid recomputation (posexplode + avg, one
  * hash exchange per iteration). At production scale the assigned
  * corpus is written partitioned by `cluster`, making a probe a
  * partition-pruned scan — same contract as `Bucketing.lookup`.
  */
object Ivf {

  /** Centroids as a small DataFrame (cluster, cv: array<double>). */
  private def centroidDf(df: DataFrame, centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    centroids.toDF("cluster", "cv")
  }

  /** Assign each vector to its nearest centroid (max cosine, ties →
    * higher cluster id — deterministic).
    *
    * Shuffle-free: the centroids are already a driver-side Seq
    * between Lloyd rounds, so they fold into ONE constant array
    * column and the per-vector argmax is a plain projection —
    * `array_max` over (cos, cluster) structs, lexicographic struct
    * order giving exactly the old `max(struct(cos, cluster))`
    * tie-break. The previous form (crossJoin(broadcast) +
    * groupBy(vec_id)) materialized k rows PER VECTOR through the
    * join and re-shuffled the whole corpus (vector payload included)
    * once per assignment pass just to reduce them back — measured at
    * sf10 (1M × 64-d corpus, k=122, three passes inside semDedup's
    * index build) that shuffle was most of q_semdedup's 130.8 s.
    */
  private def assign(c: DataFrame,
                     centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val centArr = array(centroids.map { case (cid, cv) =>
      struct(lit(cid).as("cluster"), array(cv.map(lit): _*).as("cv"))
    }: _*)
    c.withColumn("cluster",
      array_max(transform(centArr, ct =>
          struct(Similarity.cosine(col("v"), ct.getField("cv")).as("cos"),
            ct.getField("cluster").as("cluster"))))
        .getField("cluster"))
  }

  /** Build the IVF index: returns the corpus tagged with `cluster`
    * plus the centroid table. `k` centroids, `iters` Lloyd rounds.
    */
  def index(corpus: DataFrame, id: Column, vec: Column, k: Int,
            iters: Int = 2): (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    val c = corpus.select(id.as("vec_id"),
      transform(vec, x => x.cast("double")).as("v"))
    // deterministic seeds: the k lowest-id vectors
    var cents = c.orderBy(col("vec_id")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
    // the loop keeps stale centroids alive precisely so the index
    // never silently shrinks below k (callers size nprobe against
    // k) — seeding from a corpus SMALLER than k would shrink it
    // before the loop gets a say; fail loudly instead
    require(cents.size == k,
      s"index: corpus has only ${cents.size} vectors for k=$k clusters " +
        "— callers size nprobe against k; shrink k instead")
    (1 to iters).foreach { _ =>
      // element-wise mean per cluster: one exchange on (cluster, pos)
      val updated = assign(c, cents)
        .select(col("cluster"), posexplode(col("v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cluster"), transform(col("pm"), x => x.getField("m")).as("cv"))
      // k rows — safe to bring to the driver between iterations.
      // A cluster that received no members this round (possible when
      // seed vectors duplicate: the assignment tie-break drains one
      // of them) emits no mean row — KEEP its previous centroid
      // instead of silently shrinking the index below k (callers
      // size nprobe against k)
      val newCents = updated.collect().map(r =>
        (r.getInt(0), r.getSeq[Double](1))).toMap
      cents = cents.map { case (cid, old) =>
        (cid, newCents.getOrElse(cid, old)) }
    }
    (assign(c, cents), centroidDf(c, cents))
  }

  /** Persist the indexed corpus partitioned by `cluster` — the
    * production index layout the module doc promises: each cluster
    * is its own directory, so a probe becomes a partition-pruned
    * scan (statically when the probed clusters are literal, via
    * dynamic partition pruning when they come out of [[topK]]'s
    * probe join). Rebuild = rewrite; the centroid table is tiny and
    * travels separately.
    */
  def writePartitioned(indexed: DataFrame, path: String): Unit =
    indexed.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cluster").parquet(path)

  /** Probe: top-k per query scanning only the `nprobe` nearest
    * clusters per query.
    */
  def topK(indexed: DataFrame, centroids: DataFrame,
           queries: DataFrame, queryId: Column, queryVec: Column,
           k: Int, nprobe: Int): DataFrame = {
    // fail fast like every sibling ranked API: k or nprobe <= 0
    // would silently return an empty frame ("no neighbors found")
    require(k >= 1, s"k must be >= 1, got $k")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val q = queries.select(queryId.as("query_id"),
      transform(queryVec, x => x.cast("double")).as("qv"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cluster").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("ccos", Similarity.cosine(col("qv"), col("cv")))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("cluster"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    indexed.join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(Similarity.cosine(col("v"), col("qv")), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"),
        col("rnk").cast("int").as("rnk"))
  }
}
