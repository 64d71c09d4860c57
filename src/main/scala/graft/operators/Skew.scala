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
}
