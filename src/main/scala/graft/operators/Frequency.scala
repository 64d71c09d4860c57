package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.functions.MisraGries

/** Frequency-analysis operators built on bounded sketches. The exact
  * alternative (`groupBy(key).count()` over the full stream, as q54 does
  * for the top-k table) shuffles one row per DISTINCT key — fine for a
  * bounded vocabulary, but at 100 TB a key column like raw tokens, URLs or
  * user ids can hold billions of distinct values, and the full-vocabulary
  * shuffle (plus the hash map each reducer must hold) becomes the
  * bottleneck. The sketch path never materializes the vocabulary.
  */
object Frequency {

  /** Exact heavy hitters — every key whose frequency strictly exceeds
    * n/k — computed in two passes without ever grouping by the full key
    * space:
    *
    *   1. CANDIDATES: a [[graft.functions.MisraGries]] summary of width k
    *      per task, merged associatively (map-side partial aggregation —
    *      the shuffle carries ≤ k counters per task, not the vocabulary).
    *      The merged key set provably contains every key with frequency
    *      > n/(k+1) ⊇ all heavy hitters; it may also contain false
    *      positives, which is why pass 2 exists.
    *   2. RECOUNT: exact counts for the ≤ k candidates only, via a
    *      broadcast semi-join (rows with non-candidate keys never enter
    *      the aggregation), then the exact `freq · k > n` cut.
    *
    * The result is therefore EXACT and deterministic — independent of row
    * order, partitioning and sketch merge order, which only affect the
    * transient false-positive set. Returns (key, freq), one row per heavy
    * hitter.
    *
    * `keyCol` rows with NULL keys are ignored (they are not a key; n
    * counts non-null rows only). The source is read twice (sketch +
    * recount), so pass a [[CacheScope]] when upstream is expensive —
    * at scale prefer re-reading columnar storage over caching 100 TB.
    */
  def heavyHitters(df: DataFrame, keyCol: Column, k: Int,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(k >= 2, s"heavyHitters: k must be >= 2, got $k")
    val keyed = scope.cached(df.select(keyCol.as("key")).filter(col("key").isNotNull))
    val candidates = keyed
      .agg(MisraGries.misra_gries(col("key"), k).as("cands"))
      .select(explode(col("cands")).as("key"))
    val total = keyed.agg(count(lit(1)).as("n_total"))
    keyed
      .join(broadcast(candidates), Seq("key"), "left_semi")
      .groupBy(col("key")).agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") * k > col("n_total"))
      .select(col("key"), col("freq"))
  }

  /** Per-stratum [[heavyHitters]]: the n/k cut applied WITHIN each group —
    * "which tokens dominate each source/language/domain", the per-domain
    * boilerplate-detection shape. Same two passes, grouped: the sketch runs
    * as a grouped aggregate (one k-counter summary per group per task on
    * the shuffle — the group count, not the vocabulary, bounds state), the
    * candidate table is |groups|·k rows (broadcast), and the recount
    * aggregates only (group, candidate-key) pairs.
    */
  def heavyHittersPerGroup(df: DataFrame, groupCol: Column, keyCol: Column,
      k: Int, scope: CacheScope = CacheScope.session): DataFrame = {
    require(k >= 2, s"heavyHittersPerGroup: k must be >= 2, got $k")
    val keyed = scope.cached(df.select(groupCol.as("grp"), keyCol.as("key"))
      .filter(col("key").isNotNull))
    val candidates = keyed.groupBy(col("grp"))
      .agg(MisraGries.misra_gries(col("key"), k).as("cands"))
      .select(col("grp"), explode(col("cands")).as("key"))
    val totals = keyed.groupBy(col("grp")).agg(count(lit(1)).as("n_total"))
    keyed
      .join(broadcast(candidates), Seq("grp", "key"), "left_semi")
      .groupBy(col("grp"), col("key")).agg(count(lit(1)).as("freq"))
      .join(broadcast(totals), Seq("grp"))
      .filter(col("freq") * k > col("n_total"))
      .select(col("grp"), col("key"), col("freq"))
  }
}
