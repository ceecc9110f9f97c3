package graft.meta

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The filesystem-metadata surface as Datasets (SURVEY §1): the
  * namespace (`INodeFile`/`INodeDirectory`, reference:
  * src/hdfs/.../namenode/INode.java:99-311) becomes a `files`
  * DataFrame; FsShell analytics (`ls/du/dus/count`, reference:
  * src/core/org/apache/hadoop/fs/FsShell.java:1282-1425) become
  * aggregations over it.
  *
  * At 100 TB the namespace itself is big data (billions of inodes) —
  * every operation here is a distributed transform, never a driver
  * walk; `du`-style rollups are one shuffle on the parent prefix.
  */
object Catalog {

  val fileSchema: StructType = StructType.fromDDL(
    "path STRING, is_dir BOOLEAN, len BIGINT, replication INT, " +
    "block_size BIGINT, mtime TIMESTAMP, atime TIMESTAMP, " +
    "owner STRING, perm STRING")

  /** Parent directory of a path column (both '/' rooted). */
  def parent(path: Column): Column =
    when(path === "/", lit(null).cast("string"))
      .otherwise(regexp_replace(path, "/[^/]+$", ""))

  /** Path depth (number of components). */
  def depth(path: Column): Column =
    size(filter(split(path, "/"), p => length(p) > 0))

  /** Strip trailing slashes (keeping root itself) so "/a" and "/a/"
    * address the same directory across ls/du/count — du already
    * normalized; the others silently returned nothing for "/a/".
    */
  private def normDir(dir: String): String = {
    val d = dir.replaceAll("/+$", "")
    if (d.isEmpty) "/" else d
  }

  /** `ls <dir>`: direct children of a directory. */
  def ls(files: DataFrame, dir: String): DataFrame = {
    val d = normDir(dir)
    files.filter(parent(col("path")) === (if (d == "/") "" else d))
      .orderBy(col("path"))
  }

  /** `du <dir>` (per direct child, recursive sizes): one aggregation
    * keyed by the child prefix.
    */
  def du(files: DataFrame, dir: String): DataFrame = {
    // normalize like ls/countSummary: "/a//" must mean "/a", not a
    // prefix no path can start with (silently empty result)
    val d = normDir(dir)
    val prefix = if (d == "/") "/" else d + "/"
    val rest = expr(s"substring(path, ${prefix.length + 1})")
    files
      .filter(col("path").startsWith(prefix) && !col("is_dir"))
      .withColumn("child",
        concat(lit(prefix), split(rest, "/").getItem(0)))
      .groupBy(col("child"))
      .agg(sum(col("len")).as("length"), count(lit(1)).as("n_files"))
      .orderBy(col("child"))
  }

  /** `count <dir>`: (dirs, files, bytes) under a prefix. */
  def countSummary(files: DataFrame, dir: String): DataFrame = {
    val d = normDir(dir)
    val prefix = if (d == "/") "/" else d + "/"
    files.filter(col("path") === d || col("path").startsWith(prefix))
      .agg(
        sum(when(col("is_dir"), 1L).otherwise(0L)).as("dir_count"),
        sum(when(col("is_dir"), 0L).otherwise(1L)).as("file_count"),
        sum(when(col("is_dir"), 0L).otherwise(col("len"))).as("content_size"))
  }

  /** Replication-weighted usage — the capacity input of the policy
    * sweep (`FSNamesystem.getCapacityUsed` analog).
    */
  def usedBytes(files: DataFrame): DataFrame =
    files.filter(!col("is_dir"))
      .agg(sum(col("len") * col("replication")).as("used_bytes"))

  /** Block catalog: files → one row per 64 MiB-style block (reference:
    * BlocksMap.java; file = ordered block list, SURVEY §1). The block
    * table is derived, not stored — `sequence` + `explode` keeps it a
    * narrow transform.
    */
  def blocksOf(files: DataFrame, blockSize: Long): DataFrame =
    files.filter(!col("is_dir") && col("len") > 0)
      .withColumn("n_blocks",
        ceil(col("len").cast("double") / blockSize).cast("int"))
      .select(col("path"), col("replication"),
        posexplode(when(col("n_blocks") > 0,
          sequence(lit(0), col("n_blocks") - 1))))
      .withColumnRenamed("pos", "block_idx")
      .drop("col")
      .withColumn("block_id", xxhash64(col("path"), col("block_idx")))

  /** fsck-style report (reference: NamenodeFsck / FsShell fsck): block
    * totals and replication health per top-level directory — one
    * aggregation over the derived block table.
    */
  def fsck(files: DataFrame, blockSize: Long, minRep: Int = 3): DataFrame =
    blocksOf(files, blockSize)
      // two-component prefix only when it is a PROPER ANCESTOR (a
      // third component follows) — without the trailing "/" anchor a
      // depth-2 file like /logs/app.log grouped under its own full
      // path, reported as if it were a directory. Shallower paths
      // fall back to their parent so nothing aggregates under an
      // empty group.
      .withColumn("dir", coalesce(
        nullif(regexp_extract(col("path"), "^(/[^/]+/[^/]+)/", 1), lit("")),
        // a root-level file's parent is "" — report it under "/",
        // not an unnamed empty-string directory
        nullif(parent(col("path")), lit("")), lit("/")))
      .groupBy(col("dir"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("replication") < minRep, 1L).otherwise(0L))
          .as("under_replicated"),
        round(sum(col("replication")).cast("double") / count(lit(1)), 4)
          .as("avg_replication"))

  /** `setrep <rep> <path-prefix>` (reference: FsShell setrep →
    * setReplication): a pure transform producing the updated
    * namespace; pair with [[usedBytes]] to preview capacity impact
    * before an actuator applies it.
    */
  def setRep(files: DataFrame, pathPrefix: String, rep: Int): DataFrame =
    files.withColumn("replication",
      when(col("path").startsWith(pathPrefix) && !col("is_dir"), lit(rep))
        .otherwise(col("replication")))

  /** One DistCh operation: the reference's `path:owner:group:perm`
    * tuple (DistCh.java:64 — "The values of owner, group and
    * permission can be empty", empty = leave unchanged; permission
    * is an octal number). `group` applies only when the namespace
    * carries a `group` column (the base [[fileSchema]] models
    * owner+perm).
    */
  final case class ChOp(path: String, owner: Option[String] = None,
                        group: Option[String] = None,
                        perm: Option[String] = None) {
    perm.foreach(p => require(p.matches("[0-7]{3,4}"),
      s"permission must be a 3-4 digit octal number, got '$p'"))
  }

  /** DistCh (reference: src/tools/org/apache/hadoop/tools/
    * DistCh.java:55 — "A Map-reduce program to recursively change
    * files properties such as owner, group and permission"): apply
    * each op to every inode at or under its `path` (tree semantics —
    * `/a` matches `/a` and `/a/...`, never `/abc`). A pure transform
    * over the namespace DataFrame — row count and every untouched
    * column conserved.
    *
    * Overlap semantics: ops apply in ORDER, later ops win — a
    * deterministic refinement of the reference, whose per-tree map
    * tasks run the overlapping ops in unspecified order. Unlike the
    * reference there is no per-op FAIL counter: a prefix matching
    * nothing simply changes nothing (compose with [[ls]] to
    * pre-check existence).
    *
    * Scale shape: the whole batch folds into one map-side projection
    * (chained `when`s, no shuffle, no driver iteration over files) —
    * a billion-inode namespace re-permissions in a single narrow
    * stage.
    */
  def distCh(files: DataFrame, ops: Seq[ChOp]): DataFrame = {
    require(ops.nonEmpty, "distCh needs at least one op")
    def hit(op: ChOp): Column =
      col("path") === op.path ||
        col("path").startsWith(op.path.stripSuffix("/") + "/")
    ops.foldLeft(files) { (df, op) =>
      val withOwner = op.owner.fold(df)(o =>
        df.withColumn("owner",
          when(hit(op), lit(o)).otherwise(col("owner"))))
      val withGroup = op.group.filter(_ => df.columns.contains("group"))
        .fold(withOwner)(g =>
          withOwner.withColumn("group",
            when(hit(op), lit(g)).otherwise(col("group"))))
      op.perm.fold(withGroup)(p =>
        withGroup.withColumn("perm",
          when(hit(op), lit(p)).otherwise(col("perm"))))
    }
  }

  /** Balancer plan (reference: src/hdfs/org/apache/hadoop/hdfs/
    * server/balancer/Balancer.java — compute cluster-average
    * utilization, classify each datanode against a ± `threshold`
    * band, and size what must move off/onto it). Replica placement is
    * modeled deterministically: replica `r` of block `i` of a file
    * lands on node `md5(path#i#r) mod nNodes` (HDFS placement is
    * pseudo-random; a content hash makes the model reproducible
    * across engines and retries).
    *
    * Returns one row per node: (node, used_bytes, util,
    * node_class ∈ over/above/below/under, bytes_to_move) — `over`
    * nodes must shed down to avg+threshold, `under` nodes must gain
    * up to avg-threshold; the middle band is balanced (the
    * reference's four DatanodeInfo lists).
    *
    * Scale shape: the replica table is a narrow map-side explode of
    * the namespace (no text, three small columns); usage is one hash
    * aggregation keyed by node (O(nodes) rows out); the average is a
    * one-row broadcast. Nothing driver-side scales with files.
    */
  def balancerPlan(files: DataFrame, blockSize: Long, nNodes: Int,
                   nodeCapacity: Long, threshold: Double = 0.1): DataFrame = {
    require(nNodes >= 1 && nodeCapacity > 0 && threshold >= 0)
    val replicas = files.filter(!col("is_dir") && col("len") > 0)
      .withColumn("n_blocks",
        ceil(col("len").cast("double") / blockSize).cast("int"))
      .select(col("path"), col("len"), col("replication"),
        posexplode(when(col("n_blocks") > 0,
          sequence(lit(0), col("n_blocks") - 1))))
      .withColumnRenamed("pos", "block_idx")
      .withColumn("bytes",
        least(lit(blockSize), col("len") - col("block_idx") * blockSize))
      .select(col("path"), col("block_idx"), col("bytes"),
        explode(when(col("replication") > 0,
          sequence(lit(0), col("replication") - 1))).as("r"))
      .withColumn("node",
        conv(substring(md5(concat(col("path"), lit("#"),
          col("block_idx").cast("string"), lit("#"),
          col("r").cast("string"))), 1, 6), 16, 10).cast("long")
          % nNodes)
    val usage = replicas.groupBy(col("node"))
      .agg(sum(col("bytes")).as("used_bytes"))
    val nodes = files.sparkSession.range(nNodes).toDF("node")
      .join(usage, Seq("node"), "left_outer")
      .withColumn("used_bytes", coalesce(col("used_bytes"), lit(0L)))
    val avg = nodes.agg((sum(col("used_bytes")).cast("double")
      / (lit(nNodes.toLong) * nodeCapacity).cast("double")).as("avg_util"))
    nodes.crossJoin(broadcast(avg))
      .withColumn("util",
        col("used_bytes").cast("double") / nodeCapacity)
      .select(col("node"), col("used_bytes"),
        round(col("util"), 4).as("util"),
        when(col("util") > col("avg_util") + threshold, "over")
          .when(col("util") > col("avg_util"), "above")
          .when(col("util") >= col("avg_util") - threshold, "below")
          .otherwise("under").as("node_class"),
        // floor = the reference's (long) cast truncation
        // (Balancer.java computes (long)((util-avg-threshold)*cap) —
        // the argument is positive here, so floor IS that truncation)
        when(col("util") > col("avg_util") + threshold,
          floor((col("util") - col("avg_util") - threshold) * nodeCapacity)
            .cast("long"))
          .when(col("util") < col("avg_util") - threshold,
            floor((col("avg_util") - threshold - col("util")) * nodeCapacity)
              .cast("long"))
          .otherwise(lit(0L)).as("bytes_to_move"))
  }

  /** A synthetic namespace over the documents corpus (for tests and
    * driver queries: each doc = a file under /corpus/<source>/).
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      concat(lit("/corpus/"), col("source"), lit("/doc_"), col("doc_id"))
        .as("path"),
      lit(false).as("is_dir"),
      col("n_chars").cast("long").as("len"),
      lit(3).as("replication"))
}
