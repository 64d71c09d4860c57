package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Candidate-pair generation for record linkage.
  *
  * [[sortedNeighborhoodPairs]] is the classic sorted-neighborhood method
  * (Hernández & Stolfo 1995, public): sort all records by a blocking key
  * and emit every pair within a sliding window of `window` positions.
  * Where equality blocking (q119's first-token blocks) misses pairs whose
  * block key itself is dirty, the sorted neighborhood catches anything
  * that SORTS nearby — typos past the first token, prefix variants —
  * at a guaranteed bounded cost of ≤ n·window pairs.
  */
object Blocking {

  /** All (id_a, id_b) pairs within `window` positions of each other in
    * the (key, id) sort order, with their key strings and position
    * distance. Deterministic: the total order is (key, id), so the pair
    * set is a pure function of the data.
    *
    * Scale shape — no global sort, no single-partition data window:
    * global positions come from the two-phase banded prefix sum (the
    * q76/q91 discipline) with bands = the key's first `bandChars`
    * characters (band order IS key order, so band-local ranks + bounded
    * per-band offsets compose to the exact global rank). Pairing is an
    * EQUI-join on the position bucket `pos div window`: the left side
    * fans out to its own and the next bucket, the right side sits in its
    * own bucket only, so every qualifying pair (0 < Δpos ≤ window) meets
    * in exactly one bucket — never a positional NLJ, never a pair dedup.
    * The per-band offsets frame is #bands-sized (bounded by the key
    * alphabet, data-independent) — its single-partition window is the
    * same bounded phase-2 every banded prefix sum in this repo runs.
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, keyCol: Column,
      window: Int, bandChars: Int = 1): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(bandChars >= 1, "bandChars must be >= 1")
    // NULL keys coalesce to '' instead of vanishing: substring(NULL) is a
    // NULL band that no equi-join below would ever match, so null-keyed
    // records — in linkage, exactly the dirty rows worth pairing — would
    // silently drop out of the candidate set. With '' they sort first and
    // pair with their positional neighbors like any other record.
    val keyed = df.select(col(idCol).as("id"), coalesce(keyCol, lit("")).as("k"))
      .withColumn("band", substring(col("k"), 1, bandChars))
    val wLocal = Window.partitionBy(col("band")).orderBy(col("k"), col("id"))
    val local = keyed.withColumn("lpos", row_number().over(wLocal).cast("long"))
    val wBand = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("band")).agg(count(lit(1)).as("n"))
      .select(col("band"), coalesce(sum(col("n")).over(wBand), lit(0L)).as("off"))
    // band joins with <=> for the same reason as Stats.orderStatsPermille's
    // cum join: a plain equi-join lets InferFiltersFromConstraints push an
    // isnotnull(substring(k,1,n)) predicate into THIS branch's scan only,
    // de-canonicalizing the shared `keyed` subtree and silently disabling
    // AQE exchange/stage reuse (band is never null — k is coalesced to ''
    // above — so the semantics are identical).
    val pos = local.join(broadcast(offsets.withColumnRenamed("band", "band_o")),
        col("band") <=> col("band_o"))
      .select(col("id"), col("k"), (col("off") + col("lpos")).as("pos"))
    val aSide = pos
      .select(col("id").as("id_a"), col("k").as("k_a"), col("pos").as("pos_a"))
      .withColumn("bkt", explode(array(expr(s"pos_a div $window"),
        expr(s"pos_a div $window + 1"))))
    val bSide = pos.select(col("id").as("id_b"), col("k").as("k_b"),
      col("pos").as("pos_b"), expr(s"pos div $window").as("bkt"))
    aSide.join(bSide, Seq("bkt"))
      .filter(col("pos_b") > col("pos_a") &&
        col("pos_b") - col("pos_a") <= window)
      .select(col("id_a"), col("id_b"), col("k_a"), col("k_b"),
        (col("pos_b") - col("pos_a")).as("dist"))
  }

  /** Entity-resolution quality audit: linkage needs match-quality metrics
    * the way ANN has recall gates. Ground truth is the canonical
    * sorted-token name key — word-permuted names are TRUE matches that
    * Jaro-Winkler (order-sensitive) can score low and first-token
    * blocking can even fail to pair, so both the blocking stage
    * (truth_in_candidates vs n_truth = pair completeness) and the scorer
    * (per-threshold precision/recall) get audited against a label
    * neither of them computes.
    *
    * `records` must carry (id, name). One pass over the blocked pair
    * stream computes every threshold's conditional sums; the per-
    * threshold report explodes from the ONE aggregate row — threshold-
    * count-independent shuffles. All-BIGINT output (ppm integral
    * division), ordered by threshold.
    *
    * `spread` re-partitions the probe side before the self-join (pass
    * e.g. QueryDef.spreadIfNarrow when the input is one parquet split —
    * the Jaro-Winkler scoring is compute-bound and must not run on one
    * core).
    */
  def erAudit(records: DataFrame, thresholds: Seq[Long],
      spread: DataFrame => DataFrame = identity): DataFrame =
    erAuditWithTruth(
      records.select(col("id"), col("name"),
        concat_ws(" ", sort_array(split(col("name"), " "))).as("truth_key")),
      thresholds, spread)

  /** [[erAudit]] with a CALLER-SUPPLIED ground truth: `records` must
    * carry (id, name, truth_key) where equal truth_key = same entity.
    * The sorted-token default above audits permutation noise; a
    * perturbed-fixture truth (e.g. typo twins keyed by their source id)
    * audits realistic character noise, where the block key itself is
    * dirty and pair completeness genuinely degrades.
    */
  def erAuditWithTruth(records: DataFrame, thresholds: Seq[Long],
      spread: DataFrame => DataFrame = identity): DataFrame = {
    require(thresholds.nonEmpty, "at least one score threshold")
    val p = records.select(col("id"), col("name"),
        col("truth_key").as("ck"))
      .withColumn("blk", split(col("name"), " ").getItem(0))
    val nTruth = p.groupBy(col("ck")).agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2")).as("n_truth"))
    val cand = spread(
        p.select(col("blk"), col("id").as("id_a"),
          col("name").as("name_a"), col("ck").as("ck_a")))
      .join(p.select(col("blk"), col("id").as("id_b"),
        col("name").as("name_b"), col("ck").as("ck_b")), Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(Stats.micro(graft.functions.JaroWinklerSim
          .jaro_winkler(col("name_a"), col("name_b"))).cast("long").as("jw"),
        (col("ck_a") === col("ck_b")).as("is_true"))
    val perT = thresholds.flatMap { t =>
      Seq(sum(when(col("jw") >= t, 1L).otherwise(0L)).as(s"pred_$t"),
        sum(when(col("jw") >= t && col("is_true"), 1L).otherwise(0L)).as(s"tp_$t"))
    }
    val one = cand.agg(count(lit(1)).as("n_candidates"),
      (sum(when(col("is_true"), 1L).otherwise(0L)).as("truth_in_candidates") +: perT): _*)
    one.crossJoin(broadcast(nTruth))
      .select(col("n_candidates"), col("truth_in_candidates"), col("n_truth"),
        explode(array(thresholds.map { t =>
          struct(lit(t).as("threshold"), col(s"pred_$t").as("n_predicted"),
            col(s"tp_$t").as("tp"))
        }: _*)).as("r"))
      .select(col("r.threshold").as("threshold"), col("n_candidates"),
        col("truth_in_candidates"), col("n_truth"),
        col("r.n_predicted").as("n_predicted"), col("r.tp").as("tp"),
        (col("r.n_predicted") - col("r.tp")).as("fp"),
        (col("n_truth") - col("r.tp")).as("fn"),
        when(col("r.n_predicted") > 0,
          expr("(r.tp * 1000000) div r.n_predicted")).as("precision_ppm"),
        when(col("n_truth") > 0,
          expr("(r.tp * 1000000) div n_truth")).as("recall_ppm"))
      .orderBy(col("threshold"))
  }
}
