package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Packing, Sampling, TextAnalysis}

class CurationSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("duplicateClusters: a-b + b-c chain collapses to one cluster, min-id survivor") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(ids, "doc_id", pairs)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out === Array(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true)))
  }

  test("duplicateClusters converges on a longer chain within maxIters") {
    val n = 8L
    val ids = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(ids, "doc_id", pairs)
    assert(out.filter(col("cluster_root") === 1L).count() === n)
    assert(out.filter(col("is_survivor")).count() === 1L)
  }

  test("duplicateClusters distributed path matches union-find path") {
    val ids = (1L to 20L).toDF("doc_id")
    // two chains + an isolated pair: {1..5}, {10,11,12}, {15,16}
    val pairs = ((1L until 5L).map(i => (i, i + 1)) ++
      Seq((10L, 11L), (11L, 12L), (15L, 16L))).toDF("id_a", "id_b")
    val fast = Dedup.duplicateClusters(ids, "doc_id", pairs)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // driverMaxEdges = 0 forces the distributed star-contraction path
    val dist = Dedup.duplicateClusters(ids, "doc_id", pairs, driverMaxEdges = 0)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(fast === dist)
    assert(fast.filter(_._2 == 1L).length === 5)
  }

  test("duplicateClusters star contraction matches union-find on random graphs") {
    // Seeded random graphs stress shapes a hand-picked chain can't:
    // multi-branch trees, cycles, dense clumps, many singletons.
    for (seed <- Seq(7, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 120
      val ids = (1L to n.toLong).toDF("doc_id")
      val pairs = Seq.fill(90)(
        (rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
        .filter { case (a, b) => a != b }
        .toDF("id_a", "id_b")
      val fast = Dedup.duplicateClusters(ids, "doc_id", pairs)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val dist = Dedup.duplicateClusters(ids, "doc_id", pairs, driverMaxEdges = 0)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(fast === dist, s"seed=$seed")
    }
  }

  test("triangleStats: K4, path, triangle-with-pendant, dup/reversed edges") {
    import graft.operators.Graphs
    def stats(pairs: Seq[(Long, Long)]) =
      Graphs.triangleStats(pairs.toDF("id_a", "id_b"))
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles")
        .as[(Long, Long, Long, Long)].head()
    // K4: 6 edges, 4 triangles, 12 wedges (4 vertices × C(3,2)).
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(stats(k4) === ((4L, 6L, 12L, 4L)))
    // Path 1-2-3: one wedge, no triangle.
    assert(stats(Seq((1L, 2L), (2L, 3L))) === ((3L, 2L, 1L, 0L)))
    // Triangle + pendant, with duplicate and reversed restatements of
    // the same edges — canonicalization must collapse them.
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (2L, 1L), (3L, 4L))
    assert(stats(tri) === ((4L, 4L, 5L, 1L))) // wedges: 1+1+C(3,2)+0 = 5
  }

  test("pageRank: hand-computed path values, symmetry, hub dominance, partition invariance") {
    import graft.operators.Graphs
    // Path 1-2-3, one iteration, scale 1e9: share(u) = ((1e9 div 100)·85) div deg(u)
    //   → endpoints contribute 850000000, the middle 425000000 per edge;
    //   r1 = 150000000 + Σ shares, exactly.
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val r1 = Graphs.pageRank(path, iterations = 1)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(r1 === Array((1L, 575000000L), (2L, 1850000000L), (3L, 575000000L)))
    // K4 is vertex-transitive: all ranks identical after any iterations.
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toDF("id_a", "id_b")
    assert(Graphs.pageRank(k4, 3).select("rank").distinct().count() === 1L)
    // Star: the center outranks every leaf, leaves tie.
    val star = (2L to 6L).map(i => (1L, i)).toDF("id_a", "id_b")
    val sr = Graphs.pageRank(star, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((2L to 6L).forall(i => sr(1L) > sr(i)))
    assert((3L to 6L).forall(i => sr(i) === sr(2L)))
    // Bit-identical under repartitioning — the integer-arithmetic claim.
    val rnd = new scala.util.Random(11)
    val rand = Seq.fill(60)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }.toDF("id_a", "id_b")
    val a = Graphs.pageRank(rand, 3).orderBy("id").collect().toSeq
    val b = Graphs.pageRank(rand.repartition(7), 3).orderBy("id").collect().toSeq
    assert(a === b)
    // Reliable-checkpoint variant: refuses without a checkpoint dir,
    // and with one it is bit-identical to the localCheckpoint path —
    // the materialization strategy must never change the fixed point.
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      intercept[IllegalArgumentException] {
        Graphs.pageRank(rand, 3, checkpointEvery = 2)
      }
    }
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    val c = Graphs.pageRank(rand, 3, checkpointEvery = 2).orderBy("id").collect().toSeq
    assert(a === c)
  }

  test("adamicAdar: path, cycle diagonals, triangle exclusion, hub cap") {
    import graft.operators.Graphs
    def aa(pairs: Seq[(Long, Long)], cap: Int = 0) =
      Graphs.adamicAdar(pairs.toDF("id_a", "id_b"), cap)
        .orderBy("x", "y").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // Path 1-2-3: (1,3) share center 2 with deg 2 → floor(1e6/ln 2).
    val w2 = math.floor(1000000.0 / math.log(2.0)).toLong
    assert(aa(Seq((1L, 2L), (2L, 3L))) === Array((1L, 3L, 1L, w2)))
    // C4 cycle: both diagonals score 2·w2; adjacent pairs are excluded.
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(aa(c4) === Array((1L, 3L, 2L, 2 * w2), (2L, 4L, 2L, 2 * w2)))
    // Triangle: every co-neighbored pair is already an edge → empty.
    assert(aa(Seq((1L, 2L), (2L, 3L), (3L, 1L))).isEmpty)
    // Star with a deg-4 center: capping centers at deg ≤ 3 removes all
    // wedges; uncapped, each leaf pair scores floor(1e6/ln 4).
    val star = (2L to 5L).map(i => (1L, i))
    val w4 = math.floor(1000000.0 / math.log(4.0)).toLong
    assert(aa(star).forall(t => t._3 === 1L && t._4 === w4) && aa(star).length === 6)
    assert(aa(star, cap = 3).isEmpty)
    // DEFAULT cap (hub-heavy graph): a degree-1001 hub is excluded as a
    // center unless the caller explicitly asks for the exact run — the
    // deg² wedge guard must be on by default.
    val hub = (2L to 1002L).map(i => (1L, i)).toDF("id_a", "id_b")
    assert(Graphs.adamicAdar(hub).count() === 0L)
    assert(Graphs.adamicAdar(hub, maxCenterDeg = 0).count() === 1001L * 1000L / 2L)
  }

  test("duplicateClusters ignores pairs touching ids outside the id set") {
    // pairs (1,9),(9,2) chain through ghost node 9, which is NOT in ids:
    // 1 and 2 must stay separate clusters and 9 must not appear at all.
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 9L), (9L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    for (threshold <- Seq(2000000, 0)) { // union-find AND distributed path
      val out = Dedup.duplicateClusters(ids, "doc_id", pairs, driverMaxEdges = threshold)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(out === Array((1L, 1L, true), (2L, 2L, true), (3L, 2L, false)),
        s"driverMaxEdges=$threshold")
    }
  }

  test("duplicateClusters union-find handles string ids") {
    val ids = Seq("a", "b", "c", "d").toDF("doc_id")
    val pairs = Seq(("c", "b")).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(ids, "doc_id", pairs)
      .orderBy("id").collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(out === Array(("a", "a", true), ("b", "b", true),
      ("c", "b", false), ("d", "d", true)))
  }

  test("trainValTestSplit: deterministic, complete, ~80/10/10") {
    val df = (1L to 1000L).toDF("id")
    val split = Sampling.trainValTestSplit(df, "id")
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 1000L)
    assert(counts("train") > 700L && counts("train") < 900L)
    // identical assignment on re-run (no rand())
    val again = Sampling.trainValTestSplit(df, "id")
    assert(split.collect().toSet === again.collect().toSet)
  }

  test("balancedSample caps every class and is deterministic") {
    val df = (1L to 300L).map(i => (i, (i % 3).toInt)).toDF("id", "label")
    val sampled = Sampling.balancedSample(df, "label", "id", perClass = 10)
    val counts = sampled.groupBy("label").count().collect().map(_.getLong(1))
    assert(counts.forall(_ === 10L))
    assert(sampled.collect().toSet === Sampling.balancedSample(df, "label", "id", 10).collect().toSet)
  }

  test("packAssignments: exclusive offsets, start-pack ownership, straddling docs") {
    // token stream: 10 | 5 | 2000 | 50 | 3000 → cut every 1024
    val docs = Seq((0L, 10), (1L, 5), (2L, 2000), (3L, 50), (4L, 3000))
      .toDF("doc_id", "n_tokens")
    val out = Packing.packAssignments(docs, "doc_id", col("n_tokens"),
        budget = 1024, groupSize = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // start offsets: 0, 10, 15, 2015, 2065 → packs 0, 0, 0, 1, 2
    assert(out === Array((0L, 0L, 0L), (1L, 10L, 0L), (2L, 15L, 0L),
      (3L, 2015L, 1L), (4L, 2065L, 2L)))
  }

  test("packAssignments: two-phase cumsum is groupSize-invariant") {
    val docs = (0L until 100L).map(i => (i, (i % 7).toInt + 1))
      .toDF("doc_id", "n_tokens")
    def run(g: Int) = Packing.packAssignments(docs, "doc_id",
        col("n_tokens"), budget = 16, groupSize = g)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    // one group (plain cumsum) ≡ many groups (distributed path)
    assert(run(1000) === run(3))
  }

  test("lengthBucketedBatches: batches stay inside length bands, waste math exact") {
    // Lengths 10,11,12,13 land in band 1; 25,29 in band 2; batchSize=2.
    val docs = Seq(
      (1L, 10L), (2L, 11L), (3L, 12L), (4L, 13L), (5L, 25L), (6L, 29L),
    ).toDF("doc_id", "len")
    val out = Packing.lengthBucketedBatches(docs, "doc_id", col("len"),
        batchSize = 2, bucketWidth = 10)
      .orderBy("bucket", "batch_in_bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(out === Array(
      // band 1: (10,11) pad to 11 → waste 1/22; (12,13) pad to 13 → 1/26
      (1L, 0L, 2L, 11L, 21L, 22L, 0.0455),
      (1L, 1L, 2L, 13L, 25L, 26L, 0.0385),
      // band 2: (25,29) pad to 29 → waste 4/58
      (2L, 0L, 2L, 29L, 54L, 58L, 0.069)))
  }

  test("mixtureSample: quotas follow weights, selection is hash-deterministic") {
    val df = (0L until 100L).map(i => (i, s"s${i % 2}")).toDF("id", "src")
    // weights: s0 → 1, s1 → 3 ⇒ quotas of 40 total: 10 and 30
    val out = Sampling.mixtureSample(df, "src", "id",
      when(col("src") === "s0", 1).otherwise(3), totalRows = 40)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc === Map("s0" -> 10L, "s1" -> 30L))
    // deterministic: same rows on re-run
    assert(out.select("id").collect().map(_.getLong(0)).toSet ===
      Sampling.mixtureSample(df, "src", "id",
        when(col("src") === "s0", 1).otherwise(3), totalRows = 40)
        .select("id").collect().map(_.getLong(0)).toSet)
  }

  test("tokenBudgetSelect: maximal prefix, bandWidth-invariant, matches naive walk") {
    // Deterministic pseudo-random scores/sizes (no RNG state in tests).
    val docs = (1L to 400L).map { i =>
      (i, (i * 7919) % 5000, 10 + (i * 104729) % 90)
    }.toDF("doc_id", "score", "n_tokens")
    val budget = 6000L
    // Naive reference: single global walk in (score desc, id) order.
    val walk = docs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, s, _) => (-s, id) }
    var cum = 0L
    val expected = walk.iterator.map { case (id, s, nt) =>
      cum += nt; (id, s, nt, cum)
    }.takeWhile(_._4 <= budget).toSeq
    for (bw <- Seq(1, 97, 1000, 100000)) {
      val got = Packing.tokenBudgetSelect(docs, "doc_id", col("score"),
          col("n_tokens"), budget, bandWidth = bw)
        .orderBy(col("score").desc, col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq === expected, s"bandWidth=$bw")
    }
    // Maximal prefix: the next document in the walk would not have fit.
    val next = walk(expected.size)
    assert(expected.last._4 + next._3 > budget)
  }

  test("epochShuffle: reproducible per seed, per-shard positions dense, seeds decorrelate") {
    val df = (1L to 300L).toDF("doc_id")
    val a = Sampling.epochShuffle(df, "doc_id", seed = 7, nShards = 4)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    val b = Sampling.epochShuffle(df.repartition(5), "doc_id", seed = 7, nShards = 4)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(a === b, "same seed must reproduce the exact layout, any partitioning")
    // Every row lands exactly once; positions are 1..count within a shard.
    assert(a.map(_._1).toSeq === (1L to 300L))
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.size), s"shard $shard")
    }
    val c = Sampling.epochShuffle(df, "doc_id", seed = 8, nShards = 4)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(a.toSeq !== c.toSeq, "a different seed must produce a different layout")
  }

  test("prioritySample: exactly k rows, reproducible, matches local reference math") {
    val df = (1L to 500L).map(i => (i, 1L + (i * 31L) % 100L)).toDF("doc_id", "w")
    val got = Sampling.prioritySample(df, "doc_id", col("w"), k = 50, seed = 3)
      .select("doc_id", "priority").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 50)
    // Local replay of the integer priority math.
    val P = 2147483647L
    val ref = (1L to 500L).map { i =>
      val w = 1L + (i * 31L) % 100L
      val u = (i % P * 2654435761L + 3L * 48271L) % P % 1000000L + 1L
      (i, w * 1000000L / u)
    }.sortBy { case (id, pr) => (-pr, id) }.take(50)
    assert(got.toSeq === ref.map { case (id, pr) => (id, pr) })
    val again = Sampling.prioritySample(df.repartition(7), "doc_id", col("w"), 50, seed = 3)
      .select("doc_id").collect().map(_.getLong(0))
    assert(again.toSet === got.map(_._1).toSet, "partitioning must not change the sample")
  }

  test("prioritySamplePerGroup: per-stratum cap, same draw as the global sampler") {
    val df = (1L to 300L).map(i => (i, s"s${i % 3}", 1L + (i * 31L) % 100L))
      .toDF("doc_id", "src", "w")
    val got = Sampling.prioritySamplePerGroup(df, "src", "doc_id", col("w"),
        kPerGroup = 7, seed = 3)
      .select("doc_id", "src", "priority").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length === 21)
    assert(got.groupBy(_._2).forall(_._2.length === 7))
    // Within each stratum the kept rows are the top-7 by the same integer
    // priority math the global sampler uses.
    val P = 2147483647L
    val ref = (1L to 300L).map { i =>
      val w = 1L + (i * 31L) % 100L
      val u = (i % P * 2654435761L + 3L * 48271L) % P % 1000000L + 1L
      (i, s"s${i % 3}", w * 1000000L / u)
    }.groupBy(_._2).flatMap { case (_, rows) =>
      rows.sortBy { case (id, _, pr) => (-pr, id) }.take(7)
    }.toSet
    assert(got.toSet === ref)
  }

  test("pmiCollocations: bound pair beats independent fillers, exact PMI math") {
    // "aa bb" always adjacent (8 docs); "cc"/"dd" co-occur never.
    val docs = ((1 to 8).map(i => (i.toLong, "aa bb")) ++
      (9 to 12).map(i => (i.toLong, "cc dd")) ++
      (13 to 16).map(i => (i.toLong, "dd cc"))).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .pmiCollocations(docs, "text", minCount = 1)
      .orderBy(col("pmi").desc, col("gram")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // N = 32 tokens, B = 16 bigrams. aa bb: c_xy=8, c_aa=c_bb=8 →
    // pmi = ln(8·32²/(16·8·8)) = ln(8). cc dd / dd cc: c_xy=4,
    // c_cc=c_dd=8 → ln(4·32²/(16·8·8)) = ln(4).
    assert(out.map(_._1).toSeq === Seq("aa bb", "cc dd", "dd cc"))
    assert(out(0)._3 === math.rint(math.log(8) * 1e6) / 1e6)
    assert(out(1)._3 === math.rint(math.log(4) * 1e6) / 1e6)
  }

  test("mergeDailySalesPartials: order-grain batch merge == full recompute, bit-identical") {
    import graft.operators.Aggregations
    val orders = (1L to 60L).map { k =>
      (k, java.sql.Timestamp.valueOf(s"2024-01-${k % 5 + 1} 00:00:00"), s"P${k % 3}")
    }.toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = (1L to 180L).map { i =>
      val k = i % 60 + 1
      (k, (i % 7 + 1).toDouble, 100.0 + (i * 7 % 900) / 100.0, (i % 10) / 100.0)
    }.toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    val full = Aggregations.dailySalesSummary(orders, li)
      .orderBy("sale_date", "platform").collect()
    // Three batches split on the ORDER grain (the additivity contract).
    val merged = Aggregations.mergeDailySalesPartials((0L to 2L).map { b =>
      Aggregations.dailySalesSummary(
        orders.filter(pmod(col("o_orderkey"), lit(3)) === b),
        li.filter(pmod(col("l_orderkey"), lit(3)) === b))
    }).orderBy("sale_date", "platform").collect()
    assert(merged.toSeq === full.toSeq) // bit-identical, incl. the doubles
    // Merging a single partial is the identity.
    val one = Aggregations.mergeDailySalesPartials(
      Seq(Aggregations.dailySalesSummary(orders, li)))
      .orderBy("sale_date", "platform").collect()
    assert(one.toSeq === full.toSeq)
  }

  test("repeatFactorOversample: quota math exact, deterministic remainder docs") {
    // s0: 4 docs, weight 3; s1: 4 docs, weight 1 ⇒ quotas of 40: 30 and 10.
    val df = (0L until 8L).map(i => (i, s"s${i % 2}", if (i % 2 == 0) 3L else 1L))
      .toDF("id", "src", "w")
    val out = Sampling.repeatFactorOversample(df, "src", "id", col("w"), totalRows = 40)
      .select("id", "src", "copies", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc === Map("s0" -> 30, "s1" -> 10))
    // s0: base 30 div 4 = 7, remainder 2 ⇒ copies ∈ {7, 8}, two of each×…
    val s0Copies = out.filter(_._2 == "s0").groupBy(_._1).view
      .mapValues(_.map(_._4).sorted.toSeq).toMap
    assert(s0Copies.values.map(_.size).toSeq.sorted === Seq(7, 7, 8, 8))
    s0Copies.values.foreach(idxs => assert(idxs === (1L to idxs.size)))
    // Deterministic: identical on re-run.
    val again = Sampling.repeatFactorOversample(df.repartition(3), "src", "id",
        col("w"), totalRows = 40)
      .select("id", "src", "copies", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(t => (t._2, t._1, t._4)).toSeq ===
      out.sortBy(t => (t._2, t._1, t._4)).toSeq)
  }

  test("prioritySample rejects non-positive weights") {
    val df = Seq((1L, 0L)).toDF("doc_id", "w")
    val e = intercept[Exception] {
      Sampling.prioritySample(df, "doc_id", col("w"), k = 1).collect()
    }
    assert(e.getMessage.contains("prioritySample"))
  }

  test("tfidf ranks rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common rare_one rare_one"),
      (2L, "common filler filler"),
      (3L, "common other words"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", perDoc = 1)
      .filter(col("doc_id") === 1L).head()
    // rare_one: tf=2, df=1 → 2·(ln(4/2)+1)≈3.39; common: tf=1, df=3 → 1.0
    assert(out.getString(2) === "rare_one")
  }

  private def waterfill(rows: Seq[(String, Long, Long)], bm: Long, em: Long) =
    Sampling.tokenBudgetWaterfill(
        rows.toDF("source", "avail", "w"), "source", "avail", "w",
        budgetMilli = bm, epochsMilli = em)
      .select(col("source"), col("allocated_tokens"), col("capped"),
        col("share_ppm"), col("epochs_milli_used"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("tokenBudgetWaterfill: capped prefix saturates, rest absorbs at the water level") {
    // A(100,w1) B(100,w1) C(1000,w2), budget 25% of 1200 = 300, caps at
    // 0.5 epochs: A=B=50 (capped — 50·remaining_w ≤ remaining·1), C
    // uncapped takes the entire remaining 200. Exact by hand.
    val out = waterfill(Seq(("A", 100L, 1L), ("B", 100L, 1L), ("C", 1000L, 2L)),
      bm = 250, em = 500)
    assert(out === Seq(
      ("A", 50L, true, 166666L, 500L),
      ("B", 50L, true, 166666L, 500L),
      ("C", 200L, false, 666666L, 200L)))
  }

  test("tokenBudgetWaterfill: high-weight source saturates first, freed budget flows on") {
    // A(100,w10) caps at its full availability despite the 10× weight;
    // B(1000,w1) absorbs the remaining 450 of b=550.
    val out = waterfill(Seq(("A", 100L, 10L), ("B", 1000L, 1L)),
      bm = 500, em = 1000)
    assert(out === Seq(
      ("A", 100L, true, 181818L, 1000L),
      ("B", 450L, false, 818181L, 450L)))
  }

  test("tokenBudgetWaterfill: budget beyond all caps leaves the surplus unallocated") {
    val out = waterfill(Seq(("A", 100L, 10L), ("B", 1000L, 1L)),
      bm = 1000, em = 500)
    // b = 1100 but caps total 550 — every source capped, nothing invents
    // tokens past its repeat cap.
    assert(out === Seq(
      ("A", 50L, true, 45454L, 500L),
      ("B", 500L, true, 454545L, 500L)))
  }

  test("clusterSplitAudit: zero cluster leakage by construction, naive leakage measured") {
    // idBucket: 15→69 (train), 16→83 (val), 1→14, 2→28 (train). The
    // near-dup pair (15,16) therefore straddles train/val under the
    // naive per-id split, but rides its cluster root 15 into train
    // under the cluster-aware split.
    val ids = Seq(15L, 16L, 1L, 2L).toDF("doc_id")
    val pairs = Seq((15L, 16L)).toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(ids, "doc_id", pairs)
    val out = Sampling.clusterSplitAudit(clusters, pairs).collect()
    // All four docs land in train (roots 15, 1, 2 hash below 80) — one
    // output row carrying both whole-corpus leak constants.
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("split") === "train")
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("n_clusters") === 3L)
    assert(r.getAs[Long]("n_survivors") === 3L)
    // The structural guarantee, and the contamination the naive split
    // would have shipped: (15,16) split across train/val.
    assert(r.getAs[Long]("leak_pairs_cluster") === 0L)
    assert(r.getAs[Long]("leak_pairs_naive") === 1L)
    // Split of every doc in a cluster equals the ROOT's split: recompute
    // directly and cross-check the per-split doc counts.
    val rootSplit = clusters
      .withColumn("split",
        when(Sampling.idBucket(col("cluster_root"), 100) < 80, "train")
          .when(Sampling.idBucket(col("cluster_root"), 100) < 90, "val")
          .otherwise("test"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") === rootSplit(r.getAs[String]("split")))
    }
  }

  test("survivorByScore: highest score wins, ties to smaller id, moved flags the override") {
    val ids = (1L to 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(ids, "doc_id", pairs)
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L), (5L, 2L))
      .toDF("id", "score")
    val out = Dedup.survivorByScore(clusters, scores)
      .orderBy("cluster_root").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out === Array(
      // {1,2,3}: scores 5/9/9 — the 9-tie breaks to id 2, overriding
      // the min-id default (moved).
      (1L, 3L, 2L, 9L, true),
      (4L, 1L, 4L, 1L, false),
      (5L, 1L, 5L, 2L, false)))
  }

  test("oovAudit: hand-computed vocabulary curve, unseen words count as OOV") {
    // idBucket: 1→14, 2→28 (train, <80); 16→83 (eval). Train tokens:
    // a a b | a c → vocab ranks a(1), b(2), c(3) by (freq desc, tok asc).
    // Eval doc: a b d x → 4 tokens; d/x are never-in-train OOV.
    val docs = Seq((1L, "a a b"), (2L, "a c"), (16L, "a b d x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.oovAudit(docs, "doc_id", "text",
        vocabSizes = Seq(1, 2)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out === Array(
      // (V, n_train_tokens, n_eval_tokens, n_vocab_words, n_oov, oov_ppm)
      (1L, 5L, 4L, 3L, 3L, 750000L),  // top-1 = {a}: b,d,x are OOV
      (2L, 5L, 4L, 3L, 2L, 500000L))) // top-2 = {a,b}: d,x are OOV
  }

  test("partitionModularity: assortative two-cluster graph and anti-assortative edge") {
    import graft.operators.Graphs
    // 1,2 → A; 3,4 → B; edges (1,2) intra-A, (3,4) intra-B, (1,3) cross.
    // m=3, m2=6: d_A=d_B=3, e2=2 each → contrib = (6·2−9)·1e9/36,
    // Q = (6·4−18)·1e9/36 = 1/6 in ppb.
    val attrs = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("id", "part")
    val pairs = Seq((1L, 2L), (3L, 4L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Graphs.partitionModularity(pairs, attrs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out === Array(
      ("A", 3L, 1L, 83333333L, 3L, 166666666L),
      ("B", 3L, 1L, 83333333L, 3L, 166666666L)))
    // Single cross-partition edge: Q = −1/2 — the sign-split division
    // path (both parts' numerators negative) must round like DuckDB.
    val neg = Graphs.partitionModularity(
        Seq((1L, 2L)).toDF("id_a", "id_b"),
        Seq((1L, "A"), (2L, "B")).toDF("id", "part")).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(5)))
    assert(neg === Array(
      ("A", -250000000L, -500000000L), ("B", -250000000L, -500000000L)))
  }

  test("ragChunks: offsets, tail rule, and replayable fingerprints by hand") {
    val text100 = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, text100),                                  // 100 toks → 2 chunks
      (2L, "solo doc"),                               // short → 1 chunk
      (3L, (1 to 64).map(i => s"x$i").mkString(" ")), // exactly window → 1
      (4L, (1 to 65).map(i => s"y$i").mkString(" ")), // one past → 2
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ragChunks(df, "doc_id", "text",
        window = 64, stride = 48)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // Tail rule: chunk at start 96 for doc 1 would contribute zero new
    // tokens (chunk [48,100) already reaches EOF) — it must not exist.
    assert(out === Array(
      (1L, 0L, 0L, 64L), (1L, 1L, 48L, 52L),
      (2L, 0L, 0L, 2L),
      (3L, 0L, 0L, 64L),
      (4L, 0L, 0L, 64L), (4L, 1L, 48L, 17L)))
    // Fingerprint replay straight from the spec: first 15 md5 hex digits
    // of the space-joined chunk.
    val chunk0 = (1 to 64).map(i => s"w$i").mkString(" ")
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(chunk0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val fp = java.lang.Long.parseLong(hex.take(15), 16)
    val got = TextAnalysis.ragChunks(df.filter(col("doc_id") === 1L),
        "doc_id", "text").orderBy("chunk_idx").collect()
    assert(got.head.getAs[Long]("chunk_fp") === fp)
    assert(got.head.getAs[Long]("n_chars") === chunk0.length.toLong)
  }

  test("vocabGrowth: exact prefix accumulation on a hand corpus") {
    val docs = Seq(
      (0L, "a b c"), (1L, "a b d"), (2L, "a e"), (3L, "f"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs, "doc_id", "text", n = 1,
        fracsMilli = Seq(250, 500, 1000), bandWidth = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // Cutoffs are interpolated doc_id order statistics over {0,1,2,3}:
    // p250 → 0.75 (doc 0 only), p500 → 1.5 (docs 0,1), p1000 → 3 (all).
    assert(out === Array(
      (250L, 1L, 3L, 3L, 1000L),
      (500L, 2L, 6L, 4L, 1500L),
      (1000L, 4L, 9L, 6L, 1500L)))
  }

  test("mixtureDiversity: Simpson family by hand, null categories ignored") {
    val df = Seq(("s1", "en"), ("s1", "en"), ("s1", "de"), ("s1", "fr"),
      ("s2", "en"), ("s2", "en"), ("s2", null))
      .toDF("source", "lang")
    val out = Sampling.mixtureDiversity(df, col("source"), col("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // s1: n=4, counts {2,1,1}: Σc²=6 → λ=6/16=375000 ppm, dominant 1/2,
    // effective 16/6 = 2.666; s2: monoculture → λ=1, effective exactly 1.
    assert(out === Array(
      ("s1", 4L, 3L, 500000L, 375000L, 625000L, 2666L),
      ("s2", 2L, 1L, 1000000L, 1000000L, 0L, 1000L)))
  }

  test("chunkDedupAudit: aligned shared windows flagged, unique docs clean") {
    // Docs 1 and 2 share their FIRST 8 tokens verbatim and then diverge;
    // with window 8 / stride 6 the head chunk [0,8) is byte-identical in
    // both (aligned at start 0) while every later chunk differs. Doc 3
    // is disjoint: zero duplicated chunks.
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, shared + " " + (1 to 6).map(i => s"a$i").mkString(" ")),
      (2L, shared + " " + (1 to 6).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 14).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDedupAudit(df, "doc_id", "text",
        window = 8, stride = 6)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 14 tokens → kmax = (14-3)/6 = 1 → chunks at 0 and 6 → 2 chunks/doc.
    assert(out === Array((1L, 2L, 1L, 500L), (2L, 2L, 1L, 500L),
      (3L, 2L, 0L, 0L)))
  }

  test("passageLeakAudit: planted cross-split verbatim window is caught") {
    // Pick doc ids landing in specific split buckets via the SAME hash
    // the operator uses — the fixture controls the split without mocking.
    def bucket(id: Long): Long = ((id % 2147483647L) * 2654435761L) % 2147483647L % 100L
    val ids = (0L to 400L)
    val trainId = ids.find(bucket(_) < 80).get
    val testId = ids.find(bucket(_) >= 90).get
    val valId = ids.find(i => bucket(i) >= 80 && bucket(i) < 90).get
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (trainId, shared + " " + (1 to 4).map(i => s"t$i").mkString(" ")),
      // test doc: same FIRST window as train → its chunk 0 leaks.
      (testId, shared + " " + (1 to 4).map(i => s"e$i").mkString(" ")),
      // val doc: disjoint text → zero leak.
      (valId, (1 to 12).map(i => s"v$i").mkString(" ")),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.passageLeakAudit(df, "doc_id", "text",
        window = 8, stride = 6)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // 12 tokens → chunks at 0 and 6 → 2 chunks per eval doc; the test
    // doc's head window is verbatim in train, its tail is not.
    assert(out === Array(
      ("test", 2L, 1L, 1L, 1L, 500000L),
      ("val", 2L, 1L, 0L, 0L, 0L)))
  }

  test("boilerplateAudit: verbatim banner flagged, unique tails score clean") {
    // Six docs share a verbatim 3-bigram banner; each doc adds a unique
    // 2-bigram tail. minDocs=5 marks exactly the banner grams.
    val docs = (1 to 6).map(i =>
      (i.toLong, s"the same banner here unique$i words")).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateAudit(docs, "doc_id", "text",
        n = 2, minDocs = 5L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 6 tokens → 5 bigrams; "the same","same banner","banner here" are in
    // all 6 docs; "here uniqueN","uniqueN words" are singletons.
    assert(out === (1 to 6).map(i => (i.toLong, 5L, 3L, 600L)).toArray)
  }
}
