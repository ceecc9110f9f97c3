package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.Sampling._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0L until n).toDF("id")

  test("hashSample is deterministic, seed-sensitive, and rate-monotone") {
    val df = ids(4000)
    val s1 = hashSample(df, $"id", 0.25).collect().map(_.getLong(0)).toSet
    val s2 = hashSample(df, $"id", 0.25).collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same seed must re-derive the same sample")
    val other = hashSample(df, $"id", 0.25, seed = 7L)
      .collect().map(_.getLong(0)).toSet
    assert(s1 != other, "different seeds must draw different samples")
    // a lower rate's sample is a SUBSET of a higher rate's (same
    // seed): thresholds nest, so training splits can be grown
    // without resampling rows already in
    val s5 = hashSample(df, $"id", 0.5).collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s5))
    // empirical rate lands near the nominal one (md5 uniformity)
    assert(math.abs(s1.size / 4000.0 - 0.25) < 0.05, s"got ${s1.size}/4000")
    assert(hashSample(df, $"id", 0.0).count() == 0)
    assert(hashSample(df, $"id", 1.0).count() == 4000)
  }

  test("hashSplit partitions exactly: two sides, no overlap, no loss") {
    val df = ids(2000)
    val (a, b) = hashSplit(df, $"id", 0.5)
    val sa = a.collect().map(_.getLong(0)).toSet
    val sb = b.collect().map(_.getLong(0)).toSet
    assert(sa.intersect(sb).isEmpty)
    assert(sa.size + sb.size == 2000)
    // the in-side IS hashSample at the same rate/seed
    assert(sa == hashSample(df, $"id", 0.5).collect().map(_.getLong(0)).toSet)
    // a null key must not vanish from both sides (the exact-partition
    // contract): it lands deterministically in the complement
    val withNull = Seq(Option(1L), Option(2L), None).toDF("id")
    val (na, nb) = hashSplit(withNull, $"id", 0.5)
    assert(na.count() + nb.count() == 3)
    assert(nb.filter($"id".isNull).count() == 1)
  }

  test("stratifiedHashSample applies per-stratum rates and the default") {
    val df = (0L until 3000).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("id", "lang")
    val out = stratifiedHashSample(df, $"id", $"lang",
      Map("en" -> 0.8, "de" -> 0.2), default = 0.05)
    val byLang = out.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLang("en") / 1000.0 - 0.8) < 0.08, byLang.toString)
    assert(math.abs(byLang("de") / 1000.0 - 0.2) < 0.08, byLang.toString)
    assert(byLang.getOrElse("fr", 0L) / 1000.0 < 0.12, byLang.toString)
    // a stratum's members are exactly hashSample at that stratum's
    // rate — the stratified form only switches the threshold
    val en = out.filter($"lang" === "en").select($"id")
      .collect().map(_.getLong(0)).toSet
    val plain = hashSample(df.filter($"lang" === "en"), $"id", 0.8)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(en == plain)
  }

  test("perStratumSample keeps exactly min(k, |stratum|) deterministic rows") {
    val df = (0L until 500).map(i => (i, s"s${i % 4}")).toDF("id", "st")
      .union(Seq((9999L, "tiny")).toDF("id", "st"))
    val out = perStratumSample(df, $"id", $"st", k = 30)
    val sizes = out.groupBy($"st").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Seq("s0", "s1", "s2", "s3").forall(sizes(_) == 30L), sizes.toString)
    assert(sizes("tiny") == 1L, "undersized stratum keeps all its rows")
    val again = perStratumSample(df, $"id", $"st", k = 30)
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      again.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // pre-thinning at a rate that keeps >= k rows preserves the
    // result exactly (the documented huge-stratum recipe): the kept
    // set is the k smallest hashes, below any generous threshold
    val thinned = perStratumSample(
      hashSample(df, $"id", 0.9), $"id", $"st", k = 5)
    val full = perStratumSample(df, $"id", $"st", k = 5)
    assert(thinned.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      full.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("packByBudget: shard starts stay inside budget windows, heavy rows survive") {
    val df = Seq(
      ("a", 1L, 600L), ("a", 2L, 600L), ("a", 3L, 600L), ("a", 4L, 600L),
      ("a", 5L, 5000L), // heavier than the whole budget
      ("a", 6L, 100L),
      ("b", 1L, 10L)
    ).toDF("part", "ord", "w")
    val out = packByBudget(df, $"part", Seq($"ord"), $"w", budget = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val a = out.filter(_._1 == "a").sortBy(_._2).map(_._4)
    // offsets 0,600,1200,1800,2400,7400 / 1000 -> shards 0,0,1,1,2,7
    assert(a.toSeq == Seq(0L, 0L, 1L, 1L, 2L, 7L), a.mkString(","))
    assert(out.filter(_._1 == "b").map(_._4).toSeq == Seq(0L),
      "each part packs independently from shard 0")
    // invariant: a shard's total weight <= budget + its last row's
    // weight (the documented overflow bound)
    val byShard = out.filter(_._1 == "a").groupBy(_._4).view
      .mapValues(_.map(_._3).sum)
    byShard.foreach { case (shard, total) =>
      val maxW = out.filter(r => r._1 == "a" && r._4 == shard).map(_._3).max
      assert(total <= 1000L + maxW, s"shard $shard total $total")
    }
  }

  test("perStratumSample survives dotted column names in the row tie-break") {
    // regression: a bare col("a.b") parses the dot as struct access
    // — a top-level column literally named "meta.lang" threw
    val df = Seq((1L, "en", "x"), (2L, "en", "y"), (3L, "de", "z"))
      .toDF("doc_id", "lang", "meta.lang")
    val got = perStratumSample(df, $"doc_id", $"lang", k = 1)
    assert(got.count() == 2L)
  }

  test("perStratumSample works on schemas carrying map columns") {
    // regression: the whole-row tie-break hashed every column, and
    // Spark's hash functions reject MapType — any metadata-map
    // schema threw AnalysisException instead of sampling
    val df = Seq((1L, "en", Map("k" -> "v")), (2L, "en", Map("k" -> "w")),
        (3L, "de", Map.empty[String, String]))
      .toDF("doc_id", "lang", "meta")
    val got = perStratumSample(df, $"doc_id", $"lang", k = 1)
    assert(got.count() == 2L) // one per stratum
    assert(got.columns.toSeq == Seq("doc_id", "lang", "meta"))
  }

  test("packByBudget: fractional weights accumulate instead of truncating") {
    // regression: a per-row long cast (guarding double 2^53 rounding)
    // truncated sub-1.0 weights to 0 — the prefix sum never advanced
    // and every row of the part landed in shard 0
    val df = (1 to 30).map(i => ("a", i.toLong, 0.9)).toDF("part", "ord", "w")
    val out = packByBudget(df, $"part", Seq($"ord"), $"w", budget = 9L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // prefix 0.9*(i-1): rows 1..11 -> shard 0 (prefix < 9 up to 9.0
    // exclusive... row 11 has prefix 9.0 -> shard 1)
    assert(out(1L) == 0L && out(10L) == 0L, out.toString)
    assert(out(11L) == 1L, out.toString)
    assert(out.values.toSet.size > 1, "sharding must progress")
  }

  test("packByBudget: a multi-column order disambiguates ties deterministically") {
    // two rows tie on the primary order key with very different
    // weights — the id tie-break makes the assignment a function of
    // the data, not of which tied row a task happens to sort first
    val df = Seq(
      ("a", 5L, 1L, 600L), ("a", 5L, 2L, 5000L), ("a", 7L, 3L, 600L)
    ).toDF("part", "prio", "id", "w")
    val out = packByBudget(df, $"part", Seq($"prio", $"id"), $"w",
        budget = 1000L)
      .collect().map(r => r.getLong(2) -> r.getLong(4)).toMap
    // offsets: id1 -> 0, id2 -> 600, id3 -> 5600
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 5L), out.toString)
  }

  test("mixByWeight lands near the target mix and is a subset") {
    val rows = (0 until 4000).map(i =>
      (i.toLong, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "zh"))
    // counts: en 1000, de 1000, zh 2000
    val df = rows.toDF("id", "g")
    val out = mixByWeight(df, $"id", $"g",
      Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.25))
      .as[(Long, String)].collect()
    val byG = out.groupBy(_._2).view.mapValues(_.length).toMap
    // binding group: en (1000/0.5 = 2000 is the min c) -> rate_en
    // is exactly 1.0 (all kept), de/zh sample at 0.5 / 0.25
    assert(byG("en") == 1000)
    assert(math.abs(byG("de") - 500) < 80, byG.toString)
    assert(math.abs(byG("zh") - 500) < 80, byG.toString)
    // subset of the input, deterministic across calls
    val again = mixByWeight(df, $"id", $"g",
      Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.25))
      .as[(Long, String)].collect()
    assert(out.toSet == again.toSet)
    assert(out.toSet.subsetOf(rows.toSet))
  }

  test("mixByWeight drops unweighted groups, null keys and null groups") {
    val df = Seq((Some(1L), Some("en")), (Some(2L), Some("xx")),
      (None, Some("en")), (Some(3L), None))
      .toDF("id", "g")
    val out = mixByWeight(df, $"id", $"g", Map("en" -> 1.0))
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }

  test("mixByWeight with no weighted group present returns empty") {
    val df = Seq((1L, "en")).toDF("id", "g")
    assert(mixByWeight(df, $"id", $"g", Map("zh" -> 1.0)).count() == 0L)
  }

  test("mixByWeight fails loud on a high-cardinality group column") {
    // 100 distinct groups over a cap of 10: the guard must fire
    // BEFORE a driver-sized collect (the collect is limited to
    // maxGroups + 1 rows), naming the misuse
    val df = (0L until 100L).map(i => (i, s"g$i")).toDF("id", "g")
    val e = intercept[IllegalArgumentException] {
      mixByWeight(df, $"id", $"g", Map("g1" -> 1.0), maxGroups = 10)
    }
    assert(e.getMessage.contains("maxGroups"), e.getMessage)
    // a deliberate raise (or the roomy default) keeps working
    val ok = mixByWeight(df, $"id", $"g", Map("g1" -> 1.0),
      maxGroups = 200)
    assert(ok.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("deterministicShuffle is a complete permutation, stable by seed") {
    val df = (0L until 200L).toDF("id")
    val a = deterministicShuffle(df, $"id", seed = 1L)
      .as[(Long, Long)].collect().sortBy(_._2)
    assert(a.map(_._2).toSeq == (1L to 200L), "ranks are a dense 1..n")
    assert(a.map(_._1).sorted.toSeq == (0L until 200L), "every row kept once")
    val b = deterministicShuffle(df, $"id", seed = 1L)
      .as[(Long, Long)].collect().sortBy(_._2)
    assert(a.toSeq == b.toSeq, "same seed, same permutation")
    val c = deterministicShuffle(df, $"id", seed = 2L)
      .as[(Long, Long)].collect().sortBy(_._2)
    assert(a.map(_._1).toSeq != c.map(_._1).toSeq, "new seed, new order")
    // the order is the md5 order — independently recomputable
    val byHash = (0L until 200L).sortBy(i =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:1".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString, i.toString))
    assert(a.map(_._1).toSeq == byHash)
  }

  test("deterministicShuffle is partition-count invariant") {
    val df = (0L until 100L).toDF("id")
    val one = deterministicShuffle(df.repartition(1), $"id", seed = 9L)
      .as[(Long, Long)].collect().sortBy(_._2).map(_._1).toSeq
    val many = deterministicShuffle(df.repartition(13), $"id", seed = 9L)
      .as[(Long, Long)].collect().sortBy(_._2).map(_._1).toSeq
    assert(one == many)
  }

  test("kFold partitions completely; fold 0 IS hashSample at 1/k") {
    val df = ids(4000)
    val folds = kFold(df, $"id", k = 5)
      .as[(Long, Int)].collect()
    assert(folds.length == 4000, "every row gets exactly one fold")
    val byFold = folds.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byFold.keySet == Set(0, 1, 2, 3, 4))
    // rough balance (md5 uniformity)
    byFold.values.foreach(s =>
      assert(math.abs(s.size - 800) < 120, s"fold size ${s.size}"))
    // threshold nesting: fold 0 is exactly the 1/k hash sample
    val sample = hashSample(df, $"id", 0.2).as[Long].collect().toSet
    assert(byFold(0) == sample)
    // folds 0..1 together are exactly the 2/k sample
    val s2 = hashSample(df, $"id", 0.4).as[Long].collect().toSet
    assert(byFold(0) ++ byFold(1) == s2)
  }

  test("kFold: null keys land in the last fold; bad k rejected") {
    val df = Seq(Option(1L), Option(2L), None).toDF("id")
    val got = kFold(df, $"id", k = 3).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getInt(1))
      .toMap
    assert(got(-1L) == 2, s"null key must take fold k-1, got ${got(-1L)}")
    intercept[IllegalArgumentException] { kFold(df, $"id", k = 1) }
    intercept[IllegalArgumentException] {
      kFold(df.withColumnRenamed("id", "fold"), $"fold", k = 3)
    }
  }

  test("topFraction keeps exactly floor(frac*n) best rows, ranked") {
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "score")
    val got = topFraction(df, Seq($"score".desc, $"id"), frac = 0.25)
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(got.length == 25)
    // best score first: id 100 at rank 1 down to id 76 at rank 25
    assert(got.map(_._1).toSeq == (100L to 76L by -1L).toSeq)
    assert(got.map(_._3).toSeq == (1L to 25L).toSeq,
      "survivors carry their 1-based global rank")
  }

  test("topFraction tie-break makes the cut deterministic") {
    // constant score: only the caller's tie-break orders the cut
    val df = (1L to 50L).map(i => (i, 7L)).toDF("id", "score")
    val a = topFraction(df.repartition(11), Seq($"score".desc, $"id"), 0.2)
      .as[(Long, Long, Long)].collect().sortBy(_._3).map(_._1).toSeq
    val b = topFraction(df.repartition(3), Seq($"score".desc, $"id"), 0.2)
      .as[(Long, Long, Long)].collect().sortBy(_._3).map(_._1).toSeq
    assert(a == b && a == (1L to 10L).toSeq, s"got $a")
  }

  test("weightedSample: edge weights, determinism, and the O(k) plan") {
    val df = Seq((1L, Option(5L)), (2L, Option(0L)), (3L, None),
      (4L, Option(-3L)), (5L, Option(100L))).toDF("id", "w")
    // k >= positive-weight rows: zero/negative/null-weight rows are
    // dropped outright — the sample is SMALLER than k, never padded
    val four = weightedSample(df, $"id", $"w", k = 4)
      .select($"id", $"draw").collect()
    val byId = four.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId.keySet == Set(1L, 5L), byId.toString)
    assert(byId.values.forall(_ > 0.0))
    // deterministic: same call, same sample
    val again = weightedSample(df, $"id", $"w", k = 4)
      .select($"id").as[Long].collect().toSet
    assert(again == byId.keySet)
    // scale contract: orderBy+limit must plan TakeOrderedAndProject
    // (O(k) per partition), never a global sort exchange. Needs a df
    // with > k surviving rows: on the 5-row edge fixture only 2
    // positive-weight rows survive, EliminateLimits drops the limit
    // (child maxRows <= k) and no top-k node can appear
    val wide = (1L to 40L).map(i => (i, Option(i))).toDF("id", "w")
    val plan = weightedSample(wide, $"id", $"w", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("topFraction edges: frac 0 keeps none, frac 1 keeps all, bad frac rejected") {
    val df = (1L to 20L).map(i => (i, i)).toDF("id", "score")
    assert(topFraction(df, Seq($"score".desc, $"id"), 0.0).count() == 0)
    val all = topFraction(df, Seq($"score".desc, $"id"), 1.0)
      .as[(Long, Long, Long)].collect()
    assert(all.length == 20)
    assert(all.map(_._3).sorted.toSeq == (1L to 20L).toSeq)
    intercept[IllegalArgumentException] {
      topFraction(df, Seq($"score".desc), 1.5)
    }
  }
}
