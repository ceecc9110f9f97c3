package graft.operators

import graft.SparkSpec
import graft.sources.{Bucketing, MultiIO}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans with no shuffle exchange (map-side join contract)") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (500 to 1500).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bk_left", "k", 4)
    Bucketing.writeBucketed(right, "bk_right", "k", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "bk_left", "bk_right", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 501)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

class LookupAndPruningSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("bucketed point lookup scans one bucket (MapFile getEntry analog)") {
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    Bucketing.writeBucketed(df, "bk_lookup", "k", 8)
    val prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      // auto-bucketed-scan turns OFF bucketed reading for filter-only
      // plans, which also disables bucket pruning — force it on for
      // the point-lookup path
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val raw = spark.table("bk_lookup").filter($"k" === 42L)
      val plan = raw.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan)
      // and lookup's OWN executed plan must carry the pruning too
      val (_, lookupPlan) = Bucketing.lookupWithPlan(spark, "bk_lookup", "k", 42L)
      assert(lookupPlan.contains("SelectedBucketsCount: 1 out of 8"), lookupPlan)
    } finally
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
    // lookup executes eagerly under the scoped conf and returns a
    // local result — session conf untouched afterwards
    val q = Bucketing.lookup(spark, "bk_lookup", "k", 42L)
    assert(q.collect().map(_.getString(1)).toSeq == Seq("v42"))
    assert(spark.conf.get(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled") == prev)
  }

  test("bucketed write carries a parquet bloom filter on the key (BloomMapFile analog)") {
    // many row groups: small row-group size so one bucket spans
    // several, making row-group skipping meaningful
    val df = (1 to 20000).map(i => (i.toLong, s"payload_$i" * 8)).toDF("k", "v")
    val prev = spark.conf.getOption("spark.hadoop.parquet.block.size")
    try {
      spark.conf.set("spark.hadoop.parquet.block.size", (64 * 1024).toString)
      Bucketing.writeBucketed(df, "bk_bloom", "k", 2)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.hadoop.parquet.block.size", v)
      case None => spark.conf.unset("spark.hadoop.parquet.block.size")
    }
    val loc = new java.net.URI(spark.sql("DESCRIBE EXTENDED bk_bloom")
      .filter($"col_name" === "Location").collect().head.getString(1))
    val files = new java.io.File(loc).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    var groups = 0
    var mightContain42 = 0
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try reader.getRowGroups.asScala.foreach { block =>
        val colMeta = block.getColumns.asScala
          .find(_.getPath.toDotString == "k").get
        val bloom = reader.getBloomFilterDataReader(block)
          .readBloomFilter(colMeta)
        assert(bloom != null, s"no bloom filter on k in ${f.getName}")
        groups += 1
        if (bloom.findHash(bloom.hash(42L))) mightContain42 += 1
      } finally reader.close()
    }
    // the probe key lives in exactly one row group; blooms must rule
    // out (almost) all others — that's the row-group skip a reader
    // performs before decoding anything
    assert(groups > 4, s"want several row groups, got $groups")
    assert(mightContain42 < groups / 2,
      s"bloom prunes nothing: $mightContain42 of $groups row groups match")
  }

  test("partitioned write enables partition pruning on read") {
    val base = java.nio.file.Files.createTempDirectory("graft-pp").toString + "/t"
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "tag")
    MultiIO.partitionedWrite(df, base, Seq("tag"))
    val q = spark.read.parquet(base).filter($"tag" === "a")
    val scan = q.queryExecution.executedPlan.toString
    // partition filter, not a data filter: pruned at planning
    assert(scan.contains("PartitionFilters") && scan.contains("tag"), scan)
    assert(q.count() == 2)
  }

  test("noop sink discards output (NullOutputFormat)") {
    Seq(1, 2, 3).toDF("n").write.mode("overwrite").format("noop").save()
  }
}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin result equals plain join (row multiplicity preserved)") {
    // skewed probe: key 1 dominates
    val probe = ((1 to 500).map(_ => (1L, "hot")) ++ Seq((2L, "a"), (3L, "b")))
      .toDF("k", "pv")
    val build = Seq((1L, "B1"), (2L, "B2"), (4L, "B4")).toDF("k", "bv")
    val plain = probe.join(build, Seq("k")).groupBy($"k").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = Skew.saltedJoin(probe, build, "k", salts = 8).groupBy($"k").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted == plain && plain(1L) == 500L)
  }

  test("saltedJoin fans IDENTICAL duplicate hot rows across salts") {
    import org.apache.spark.sql.functions._
    // the hot key's rows are exact duplicates — the common shape
    // (probe projected to the join key, repeated events). A salt
    // derived from row content alone is constant across them, so the
    // whole hot key would land on ONE reducer while still paying
    // build-side replication; the per-partition row position in the
    // salt breaks the tie
    val probe = (1 to 512).map(_ => (1L, "hot")).toDF("k", "pv")
      .repartition(4)
    val nSalts = probe.select(Skew.saltExpr(probe, 8).as("s"))
      .agg(countDistinct($"s")).head().getLong(0)
    assert(nSalts > 1, s"identical duplicates landed on $nSalts salt(s)")
    // and the join built on it stays multiplicity-exact
    val build = Seq((1L, "B")).toDF("k", "bv")
    assert(Skew.saltedJoin(probe, build, "k", salts = 8).count() == 512L)
  }

  test("saltedJoin rejects build-side outer join types") {
    val probe = Seq((1L, "x")).toDF("k", "pv")
    val build = Seq((1L, "B")).toDF("k", "bv")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(probe, build, "k", salts = 4, joinType = "full_outer")
    }
  }

  test("saltedJoin outer semantics preserved") {
    val probe = Seq((1L, "x"), (9L, "y")).toDF("k", "pv")
    val build = Seq((1L, "B")).toDF("k", "bv")
    val got = Skew.saltedJoin(probe, build, "k", salts = 4, joinType = "left")
      .collect().map(r => (r.getLong(0), r.getAs[String]("bv"))).toSet
    assert(got == Set((1L, "B"), (9L, null)))
  }
}

class SortValidatorSpec extends SparkSpec {
  import spark.implicits._

  test("validateSorted accepts a range-partitioned global sort") {
    val li = graft.Graft.table(spark, sf, "lineitem")
    val sorted = Sorting.totalOrderSort(li.repartition(8),
      col("l_orderkey").asc, col("l_linenumber").asc)
    val (ok, n) = Sorting.validateSorted(sorted, Seq("l_orderkey", "l_linenumber"))
    assert(ok && n == li.count())
  }

  test("terasort pipeline: generate -> total-order sort -> validate (TeraValidate)") {
    import spark.implicits._
    // TeraGen-shaped records: 10-byte key + rowid + filler
    // (reference: terasort/TeraGen.java:50-53)
    val rows = spark.range(100000).select(
      substring(md5($"id".cast("string")), 1, 10).as("key"),
      $"id".as("rowid"),
      substring(md5(($"id" + 1).cast("string")), 1, 10).as("filler"))
    val sorted = Sorting.totalOrderSort(rows.repartition(8), col("key").asc,
      col("rowid").asc)
    val (ok, n) = Sorting.validateSorted(sorted, Seq("key", "rowid"))
    assert(ok && n == 100000)
    // permutation check: sorted output is the same multiset
    assert(sorted.agg(sum($"rowid")).collect().head.getLong(0) ==
      rows.agg(sum($"rowid")).collect().head.getLong(0))
  }

  test("validateSorted rejects unsorted and numerically-misordered data") {
    val unsorted = Seq(5L, 1L, 3L).toDF("k")
    assert(!Sorting.validateSorted(unsorted.coalesce(1), Seq("k"))._1)
    // 2 < 10 numerically but "10" < "2" lexicographically — must be
    // judged numerically for a bigint column
    val numeric = Seq(2L, 10L).toDF("k").coalesce(1)
    assert(Sorting.validateSorted(numeric, Seq("k"))._1)
  }
}

class PipelinePlanSpec extends SparkSpec {
  import spark.implicits._

  test("mixByWeight plans as a scan-fused filter: zero exchanges") {
    val df = (0 until 200).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "g")
    val out = graft.functions.Sampling.mixByWeight(df, $"id", $"g",
      Map("en" -> 0.5, "de" -> 0.5))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"mix must stay map-side after the one counts job:\n$plan")
  }

  test("chunkByTokens plans with no exchange (map-side explode)") {
    val df = (0 until 50).map(i => (i.toLong, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val out = graft.functions.TextAnalysis.chunkByTokens(
      df, $"doc_id", $"text", chunkSize = 4, stride = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"chunking must stay map-side:\n$plan")
  }

  test("repetitionReport plans with no exchange and no window: the " +
      "whole report is a per-row projection") {
    // round 16 replaced the explode + groupBy(doc, gram) + window
    // argmax pipeline (whose plan this test used to pin via its
    // WindowGroupLimit pruning) with native per-row expressions
    // (TokenStats, TopGram) — the stronger property is that NOTHING
    // shuffles. A file-backed source keeps constant folding from
    // collapsing the plan to a LocalTableScan, so the assertion
    // audits the real scan pipeline.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-repscale").toString
    (0 until 100).map(i => (i.toLong, s"a b c d$i e"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val out = graft.functions.TextAnalysis.repetitionReport(
      spark.read.parquet(dir), $"doc_id", $"text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"per-doc report must stay map-side:\n$plan")
    assert(out.count() == 100)
  }

  test("quantizedTopK shuffles score triples, not vectors") {
    val rnd = new scala.util.Random(3)
    val emb = (0 until 200).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    // AQE hides the shuffle nodes behind AdaptiveSparkPlanExec
    // (collect doesn't traverse its captured input plan) — audit the
    // static plan
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val out = graft.functions.Similarity.quantizedTopK(
        emb, col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") < 3), col("vec_id"), col("embedding"),
        k = 5, overfetch = 4)
      // the one shuffle exchange carries (query_id, vec_id, ascore) —
      // no array column survives into it
      val shuffles = out.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.nonEmpty)
      shuffles.foreach { e =>
        // contains, not startsWith: a vector smuggled inside a
        // struct (quantize's struct<q:array<tinyint>,...>) must
        // also trip this
        val types = e.child.output.map(_.dataType.simpleString)
        assert(!types.exists(_.contains("array")),
          s"vector crossed the shuffle: ${e.child.output}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}

class Round5PlanSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
  import org.apache.spark.sql.execution.window.WindowExec

  private def withStaticPlan[A](body: => A): A = {
    // AQE hides shuffles behind AdaptiveSparkPlanExec; audit static
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try { spark.conf.set("spark.sql.adaptive.enabled", "false"); body }
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("segmentDedup shuffles text exactly once (the reassembly join)") {
    withStaticPlan {
      val df = (0 until 100).map(i => (i.toLong, "a b c d e f g h i j"))
        .toDF("doc_id", "text")
      val out = graft.functions.Dedup.segmentDedup(df, $"doc_id", $"text", 4)
      val shuffles = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      val carryingTokens = shuffles.filter(_.child.output.exists(a =>
        a.dataType.typeName.startsWith("array")))
      assert(carryingTokens.length <= 1,
        s"token arrays crossed ${carryingTokens.length} exchanges — " +
          "winner election must move digests and ints only")
      // winner election exchanges carry no strings longer than a digest
      assert(shuffles.nonEmpty)
    }
  }

  test("tfidf / unigramLogProb / invertedIndex window only partitioned") {
    val df = (0 until 60).map(i => (i.toLong, s"w$i common words here"))
      .toDF("doc_id", "text")
    Seq(
      graft.functions.Retrieval.tfidfTopTerms(df, $"doc_id", $"text", 2),
      graft.functions.TextAnalysis.unigramLogProb(df, $"doc_id", $"text"),
      graft.functions.Retrieval.invertedIndex(df, $"doc_id", $"text", 5)
    ).foreach { out =>
      val globalWindows = out.queryExecution.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.isEmpty,
        s"un-partitioned window funnel: $globalWindows")
    }
  }

  test("pi estimator plans one exchange: the final one-row aggregate") {
    withStaticPlan {
      val out = graft.operators.Pi.estimate(spark, 10000L)
      val shuffles = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.length == 1,
        s"generator job must shuffle only partial-agg rows:\n$shuffles")
    }
  }

  test("balancerPlan never shuffles paths — node usage rows only") {
    withStaticPlan {
      val files = (0 until 50).map(i => (s"/d/f$i", false, 1000L, 3))
        .toDF("path", "is_dir", "len", "replication")
      val out = graft.meta.Catalog.balancerPlan(files, 256L, 4, 100000L)
      val shuffles = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      val carryingPath = shuffles.filter(_.child.output.exists(
        _.name == "path"))
      assert(carryingPath.isEmpty,
        "the replica table must collapse to (node, bytes) before any " +
          s"exchange: $carryingPath")
    }
  }
}

class LayoutSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.Layout

  test("interleave places bit i of column j at position i*k+j") {
    // bx=3 (011), by=5 (101), bits=3, k=2:
    // z = x0 + y0<<1 + x1<<2 + y1<<3 + x2<<4 + y2<<5
    //   = 1  + 2     + 4     + 0     + 0     + 32    = 39
    val got = Seq((3L, 5L)).toDF("bx", "by")
      .select(Layout.interleave(Seq(col("bx"), col("by")), 3))
      .as[Long].head()
    assert(got == 39L, s"interleave(3,5,bits=3) = $got, want 39")
  }

  test("z-order files are 2-D tiles; single-column sort gives slivers") {
    val dirZ = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val dirX = java.nio.file.Files.createTempDirectory("graft-xsort").toString
    try {
      // full 256x256 grid, one row per cell
      val grid = spark.range(256L * 256L)
        .select((col("id") % 256).as("x"),
          floor(col("id") / 256).cast("long").as("y"))
      Layout.zorderWrite(grid, dirZ, Seq("x", "y"), bits = 8, outFiles = 64)
      grid.repartitionByRange(64, col("x")).sortWithinPartitions(col("x"))
        .write.mode("overwrite").parquet(dirX)

      // pure reorganization: exact multiset preserved
      val back = spark.read.parquet(dirZ)
      assert(back.count() == 65536L)
      assert(back.select(sum(col("x") * 65536L + col("y"))).as[Long].head() ==
        grid.select(sum(col("x") * 65536L + col("y"))).as[Long].head())

      val zBoxes = Layout.fileBoxes(spark, dirZ, "x", "y").collect()
      val xBoxes = Layout.fileBoxes(spark, dirX, "x", "y").collect()
      // range sampling can leave a boundary partition empty (no file
      // written) — the locality contract needs MANY tiles, not exactly 64
      assert(zBoxes.length >= 48 && xBoxes.length >= 48,
        s"expected ~64 files, got z=${zBoxes.length} x=${xBoxes.length}")
      def extents(r: org.apache.spark.sql.Row): (Long, Long) =
        (r.getLong(2) - r.getLong(1), r.getLong(4) - r.getLong(3))

      // locality: the TYPICAL z-file bounding box is a local tile in
      // BOTH dims (ideal 32x32 for 64 files). Median, not max: an
      // unaligned curve segment that straddles a high-bit quadrant
      // boundary legitimately spans half the domain in one dim — the
      // known z-curve worst case, rare by construction (1/4 of
      // boundary crossings per level), and harmless to pruning
      // because only a few of the 64 files pay it.
      def med(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
      val exs = zBoxes.toSeq.map(r => extents(r)._1)
      val eys = zBoxes.toSeq.map(r => extents(r)._2)
      assert(med(exs) <= 96 && med(eys) <= 96,
        s"typical z-file bounding box not local: median x-extent " +
          s"${med(exs)}, median y-extent ${med(eys)}")
      xBoxes.foreach { r =>
        assert(extents(r)._2 >= 250,
          "x-sorted file unexpectedly local in y (test premise broken)")
      }

      // a 64x64 corner box touches few z-tiles but EVERY x-sliver
      // whose x-range intersects (16 of 64)
      def overlaps(r: org.apache.spark.sql.Row): Boolean =
        r.getLong(1) <= 63 && r.getLong(2) >= 0 &&
          r.getLong(3) <= 63 && r.getLong(4) >= 0
      val zHit = zBoxes.count(overlaps)
      val xHit = xBoxes.count(overlaps)
      assert(zHit < xHit,
        s"z-order prunes no better than 1-D sort: z=$zHit x=$xHit of 64")
      assert(zHit <= 12, s"z-order corner-box overlap too wide: $zHit of 64")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dirZ)); rm(new java.io.File(dirX))
    }
  }
}
