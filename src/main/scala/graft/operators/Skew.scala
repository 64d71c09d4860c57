package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological (one
  * hot key owning a large fraction of rows — e.g. a null-like sentinel id
  * or a mega-customer at 100 TB).
  *
  * First resort is AQE's runtime skew-join splitting
  * (spark.sql.adaptive.skewJoin.enabled, on by default); this operator is
  * the explicit fallback for cases AQE can't fix — e.g. when the skewed
  * side must aggregate after the join, or the planner lacks stats.
  *
  * Technique: salt the LEFT (skewed) side with a deterministic per-row
  * salt in [0, factor), replicate the RIGHT side `factor` times, and join
  * on (key, salt) — the hot key's rows spread over `factor` reducers.
  * Results are identical to the unsalted join (tested), cost is factor×
  * replication of the right side, so keep it for broadcast-size rights.
  */
object Skew {

  /** Join types that preserve correctness under right-side replication:
    * right rows never surface unmatched, so the factor-1 surplus replicas
    * are invisible. right/full outer joins would emit spurious
    * null-extended rows per unmatched replica.
    */
  private val SupportedJoinTypes =
    Set("inner", "left", "leftouter", "left_outer", "cross",
      "leftsemi", "left_semi", "leftanti", "left_anti")

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    require(SupportedJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports left-preserving joins only, got '$joinType' " +
        "(a replicated right side would emit spurious unmatched rows)")
    // Deterministic salt: hash of the whole left row modulo factor —
    // stable across retries (monotonically_increasing_id is not).
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(factor)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Key-distribution skew report — the diagnostic that DECIDES whether a
    * join needs [[saltedJoin]] (or AQE skew splitting) before it runs:
    * per-key counts reduced to ONE row of shape statistics — key count,
    * row count, hottest key's rows, exact p50/p99 of per-key counts
    * (×1000, integer-interpolated — [[Stats.orderStatsPermille]]),
    * skew_ratio as exact ppm of max/mean (~10⁶ = uniform, ≫10⁶ = salt
    * it), and the ppm row share of the 10 hottest keys. All-BIGINT
    * output: nothing float crosses the driver hash (round-8 rule).
    *
    * Scale shape: one shuffle to the per-key counts (map-side partial
    * aggregation — the frame is |keys|-sized, not |rows|); the order
    * stats ride the banded two-phase prefix sum over count values; the
    * top-10 goes through orderBy+limit, which plans as TakeOrdered (per-
    * partition top-10 + driver merge, never a full sort shuffle); the
    * summary frames are one row and cross-join for free.
    */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val summary = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    val qs = Stats.orderStatsPermille(counts, lit(0), col("cnt"),
        Seq(500, 990), bandWidth = 1000L)
      .select(col("p500_x1000").as("p50_cnt_x1000"),
        col("p990_x1000").as("p99_cnt_x1000"))
    val top10 = counts.orderBy(col("cnt").desc, col(keyCol)).limit(10)
      .agg(sum(col("cnt")).as("top10_rows"))
    summary.crossJoin(broadcast(qs)).crossJoin(broadcast(top10))
      .withColumn("skew_ratio_ppm", expr(
        "(cast(max_cnt as decimal(38,0)) * n_keys * 1000000) div n_rows"))
      .withColumn("top10_share_ppm", expr(
        "(cast(top10_rows as decimal(38,0)) * 1000000) div n_rows"))
      .select(col("n_keys"), col("n_rows"), col("max_cnt"),
        col("p50_cnt_x1000"), col("p99_cnt_x1000"),
        col("skew_ratio_ppm"), col("top10_share_ppm"))
  }

  /** Consistent-hash ring placement of a hash60 key, as one Column: the
    * clockwise-distance argmin over DISTINCT ring positions is exactly
    * the sorted-ring SUCCESSOR of h (the smallest position ≥ h, wrapping
    * to the global minimum) — the same lookup a production router
    * binary-searches, and since round 12 it IS that binary search:
    * [[graft.functions.RingSuccessor]], a native codegen'd expression
    * doing O(log |ring|) long compares per lookup. Two prior
    * formulations were measured and rejected on the same 600k rows at
    * sf0.1: array_min over a literal array of (dist, shard) structs
    * allocates ~|ring| UnsafeRow structs per row and drops out of
    * whole-stage codegen inside Generate/grouping/cache stages (22–25s);
    * filter+array_min+array_position over a flat foldable array is three
    * interpreted O(|ring|) HOF passes per lookup (Spark HOFs never enter
    * codegen) and made q186 the suite's most expensive query (6–7s).
    * All three agree row-for-row (PropertySpec pins the lookup against
    * the definitional argmin; tiebreak on equal positions keeps the
    * lowest shard id).
    */
  private def ringAssign(h: org.apache.spark.sql.Column,
      ring: Seq[(Long, Int)]): org.apache.spark.sql.Column =
    graft.functions.RingSuccessor.ring_successor(h, ring)

  /** Test hook for [[ringAssign]] (kept private so the ring contract
    * stays internal): PropertySpec pins the successor lookup against the
    * definitional clockwise-distance argmin on arbitrary keys.
    */
  private[graft] def ringAssignForTest(h: org.apache.spark.sql.Column,
      ring: Seq[(Long, Int)]): org.apache.spark.sql.Column =
    ringAssign(h, ring)

  /** Reshard-movement audit: when a keyed store grows from `oldShards` to
    * `newShards`, how much data MOVES under plain mod-hash placement vs a
    * consistent-hash ring (Karger et al. 1997)? Mod placement reassigns
    * ~(old/new) of ALL keys (h % N and h % (N+1) agree only by accident);
    * the ring reassigns only the arc the new shard claims — ~1/new of
    * keys. At 100 TB that is the difference between rewriting ~89% of
    * the store and ~11% when going 8 → 9 shards, and this audit measures
    * BOTH exactly on the actual key population (measured here: 896666
    * vs 106166 ppm — the theory to 3 digits).
    *
    * The ring is `vnodes` virtual points per shard at deterministic
    * md5-60-bit positions (hash60("s&lt;i&gt;:v&lt;j&gt;") — the
    * [[graft.functions.HyperLogLog.hash60]] discipline, so any engine
    * replays every placement); a key lands on the ring point minimizing
    * the clockwise distance (pt − h) mod 2^60, shard-id tiebreak.
    * Growing the ring ADDS points without moving existing ones — the
    * property the whole audit demonstrates.
    *
    * Scale shape: placement is [[ringAssign]]'s per-row successor lookup
    * over one foldable constant array — primitive comparisons, no join,
    * no shuffle before the one-row summary aggregate (map-side partial).
    */
  def reshardAudit(df: DataFrame, keyCol: org.apache.spark.sql.Column,
      oldShards: Int, newShards: Int, vnodes: Int = 16): DataFrame = {
    require(oldShards >= 1 && newShards > oldShards,
      s"reshardAudit: need 1 <= oldShards < newShards, got ($oldShards, $newShards)")
    require(vnodes >= 1, s"reshardAudit: vnodes must be >= 1, got $vnodes")
    val ringNew: Seq[(Long, Int)] = for {
      i <- 0 until newShards; j <- 0 until vnodes
    } yield (graft.functions.HyperLogLog.hash60(s"s$i:v$j"), i)
    val ringOld = ringNew.filter(_._2 < oldShards)
    val asg = df.select(keyCol.cast("string").as("key"))
      .filter(col("key").isNotNull)
      .select(Dedup.auditableTokenHash(col("key")).as("h"))
      .select(
        (col("h") % oldShards).as("mod_old"),
        (col("h") % newShards).as("mod_new"),
        ringAssign(col("h"), ringOld).as("shard_old"),
        ringAssign(col("h"), ringNew).as("shard_new"))
    asg.agg(
        count(lit(1)).as("n_keys"),
        sum(when(col("mod_old") =!= col("mod_new"), 1L).otherwise(0L))
          .as("moved_mod"),
        sum(when(col("shard_old") =!= col("shard_new"), 1L).otherwise(0L))
          .as("moved_ring"))
      .select(col("n_keys"), col("moved_mod"), col("moved_ring"),
        expr("(moved_mod * 1000000) div n_keys").as("moved_mod_ppm"),
        expr("(moved_ring * 1000000) div n_keys").as("moved_ring_ppm"))
  }

  /** Placement-balance audit — the other half of the [[reshardAudit]]
    * tradeoff: mod-hash placement balances near-perfectly but moves
    * ~(old/new) of the store on every reshard; a consistent-hash ring
    * moves only ~1/new but balances only as well as its virtual-node
    * count lets it (Karger et al. 1997; Dynamo, DeCandia et al. 2007 §4.2
    * introduced vnodes exactly for this). One ring point per shard leaves
    * shard load proportional to an arbitrary arc length (multiples of the
    * mean are routine); v points per shard average v arcs, tightening the
    * spread roughly as 1/sqrt(v). This audit measures the actual max/mean
    * per-shard load, exactly, for mod and for each requested vnode count
    * on the store's own row population (measured on the lineitem PK at
    * 9 shards: mod 1.06x, 1-vnode ring 2.78x, 16-vnode ring 1.52x) — the
    * number that decides whether a 100 TB reshard buys balanced executors
    * or a straggler shard 3x the mean.
    *
    * Row semantics, not distinct-key: shard load is rows (bytes) stored,
    * so a repeated key weighs what it stores. Ring positions and the
    * per-row argmin are the [[reshardAudit]] machinery verbatim — same
    * hash60 positions, so the two audits describe the SAME ring.
    *
    * Scale shape: every placement is a per-row projection (a codegen'd
    * binary search over the constant ring; mod is one modulo) evaluated
    * inside whole-stage codegen, feeding ONE ungrouped aggregation of |strategies|·|shards|
    * conditional sums (map-side partials; the only exchange moves one
    * partial row per task). The per-(strategy, shard) counts melt out of
    * the one-row result; the roll-ups run on that bounded frame, never
    * on the data.
    */
  def ringBalance(df: DataFrame, keyCol: org.apache.spark.sql.Column,
      shards: Int, vnodeOptions: Seq[Int] = Seq(1, 16)): DataFrame = {
    require(shards >= 1, s"ringBalance: shards must be >= 1, got $shards")
    require(vnodeOptions.nonEmpty && vnodeOptions.forall(_ >= 1),
      s"ringBalance: vnode counts must be >= 1, got $vnodeOptions")
    def ring(vn: Int): Seq[(Long, Int)] = for {
      i <- 0 until shards; j <- 0 until vn
    } yield (graft.functions.HyperLogLog.hash60(s"s$i:v$j"), i)
    // The [[ringAssign]] successor lookups run in a plain projection
    // feeding ONE ungrouped aggregate of |strategies|x|shards|
    // conditional sums. The per-(strategy, shard) counts melt out of the
    // ONE-row result; empty shards surface as cnt 0 rows and are
    // filtered so shards_used/min keep their groupBy semantics.
    require(shards <= 64,
      s"ringBalance: shards must be <= 64 (the conditional-sum melt is " +
        s"|strategies|x|shards| aggregate expressions), got $shards")
    val placed = df.select(keyCol.cast("string").as("key"))
      .filter(col("key").isNotNull)
      .select(Dedup.auditableTokenHash(col("key")).as("h"))
      .select((col("h") % shards).as("s_mod") +:
        vnodeOptions.map(vn =>
          ringAssign(col("h"), ring(vn)).as(s"s_v$vn")): _*)
    val strategyCols = ("mod", "s_mod") +:
      vnodeOptions.map(vn => (s"ring_v$vn", s"s_v$vn"))
    val sums = for ((name, c) <- strategyCols; s <- 0 until shards)
      yield sum(when(col(c) === s.toLong, 1L).otherwise(0L))
        .as(s"c_${name}_$s")
    val oneRow = placed.agg(sums.head, sums.tail: _*)
    val melt = for ((name, _) <- strategyCols; s <- 0 until shards)
      yield struct(lit(name).as("strategy"), lit(s.toLong).as("shard"),
        col(s"c_${name}_$s").as("cnt"))
    oneRow.select(explode(array(melt: _*)).as("a"))
      .select(col("a.strategy").as("strategy"), col("a.shard").as("shard"),
        col("a.cnt").as("cnt"))
      .filter(col("cnt") > 0)
      .groupBy(col("strategy"))
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("shards_used"),
        max(col("cnt")).as("max_rows"),
        min(col("cnt")).as("mn"))
      .select(col("strategy"), col("n_rows"),
        lit(shards.toLong).as("n_shards"), col("shards_used"),
        col("max_rows"),
        // an empty shard never surfaces from groupBy: report min 0 so the
        // imbalance read can't hide a dead shard behind the used-shard min
        when(col("shards_used") < shards, 0L).otherwise(col("mn"))
          .as("min_rows"),
        expr(s"(max_rows * $shards * 1000000) div n_rows")
          .as("max_over_mean_ppm"))
  }
}
