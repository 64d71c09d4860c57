package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining-data preparation: concatenate
  * documents in id order into one token stream and cut it every `budget`
  * tokens; a document belongs to the pack where it STARTS (the standard
  * concat-and-chunk packing used to fill fixed-length context windows;
  * the reference pipeline has no analogue — this is part of the
  * training-data operator set layered on the same engine).
  *
  * The global running token offset is a prefix sum. A naive
  * `sum(...).over(Window.orderBy(id))` moves the ENTIRE corpus into one
  * partition — the canonical window-function scale trap. Instead the sum
  * runs in two phases, the distributed-prefix-sum shape:
  *   1. local cumulative sums inside id-range groups of `groupSize` docs
  *      (window partitioned by group — parallel, no global ordering);
  *   2. one tiny single-partition window over the PER-GROUP TOTALS
  *      (corpus_size / groupSize rows, e.g. 1e9 docs / 1e5 = 1e4 rows)
  *      to produce each group's starting offset, broadcast back.
  * Only the group-totals frame — smaller than the data by a factor of
  * `groupSize` — ever sits in a single partition; recurse the same trick
  * if even that outgrows one task.
  */
object Packing {

  /** Per-document pack assignment: (doc_id, n_tokens, start_offset,
    * pack_id), where start_offset is the exclusive prefix sum of
    * `nTokens` in `idCol` order and pack_id = floor(start_offset/budget).
    *
    * `idCol` is the ordering grain and must be UNIQUE: with duplicate
    * ids the relative order of the duplicates (and therefore which pack
    * each lands in) is partition-order-dependent. The window uses a ROWS
    * frame so even then every document is counted exactly once — a RANGE
    * frame would sum id-peers together and corrupt the duplicates'
    * offsets outright.
    */
  def packAssignments(docs: DataFrame, idCol: String, nTokens: Column,
      budget: Int, groupSize: Int = 1024): DataFrame = {
    require(budget > 0 && groupSize > 0, "budget and groupSize must be positive")
    val base = docs
      .select(col(idCol).as("doc_id"), nTokens.cast("long").as("n_tokens"))
      .withColumn("grp", floor(col("doc_id") / groupSize))
    // Phase 1: exclusive cumsum within each id-range group.
    val wLocal = Window.partitionBy(col("grp")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("local_cum",
      coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)) - col("n_tokens"))
    // Phase 2: exclusive cumsum over group totals (bounded: one row per
    // group), broadcast back as each group's base offset.
    val wGrp = Window.orderBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("grp"))
      .agg(sum(col("n_tokens")).as("grp_tokens"))
      .withColumn("grp_offset", coalesce(sum(col("grp_tokens")).over(wGrp), lit(0L)))
      .select(col("grp"), col("grp_offset"))
    // grp joins with <=> (semantically identical — doc_id is a non-null
    // key, so floor(doc_id/groupSize) is never null): a plain equi-join
    // infers isnotnull(FLOOR(doc_id/groupSize)) into this branch's scan
    // only, de-canonicalizing the shared `base` subtree and silently
    // disabling AQE exchange reuse (the q79/q89 3-scan bug shape).
    local.join(broadcast(offsets.withColumnRenamed("grp", "grp_o")),
        col("grp") <=> col("grp_o"))
      .withColumn("start_offset", col("grp_offset") + col("local_cum"))
      .withColumn("pack_id", floor(col("start_offset") / budget))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"), col("pack_id"))
  }

  /** Pack-level summary: docs per pack, token mass, id span. Every pack
    * except the last holds exactly `budget` tokens of the concatenated
    * stream; `pack_tokens` (the mass of documents STARTING there) varies
    * around it because documents straddle cut points.
    */
  def packSummary(docs: DataFrame, idCol: String, nTokens: Column,
      budget: Int, groupSize: Int = 1024): DataFrame =
    packAssignments(docs, idCol, nTokens, budget, groupSize)
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))

  /** Padding-aware length-bucketed batching — the PADDED twin of the
    * concat-and-chunk packer above, for training loops that pad each
    * batch to its longest sequence instead of concatenating: group
    * similar-length documents so the pad waste (batch_size × max_len −
    * Σ len) stays small.
    *
    * Scale shape: a globally length-sorted batch assignment is a total
    * order — the same single-partition trap as the naive prefix sum — so
    * lengths are first coarsened into FIXED-WIDTH buckets
    * (floor(len/bucketWidth): deterministic, engine-replayable, no
    * quantile estimation), and batches form WITHIN each bucket via a
    * bucket-partitioned window ordered by (len, doc_id). Each window
    * partition holds one length-band, batches never cross bands, and the
    * worst-case per-doc padding is bounded by bucketWidth − 1 regardless
    * of corpus size. Buckets parallelize across the cluster; no global
    * ordering ever materializes.
    *
    * Returns one row per batch: bucket, batch_in_bucket, n_docs,
    * max_len, sum_len, padded_tokens (= n_docs × max_len), waste_frac
    * (rounded; 0 for a perfectly homogeneous batch). The trailing batch
    * of each bucket may run short — its n_docs < batchSize.
    */
  def lengthBucketedBatches(docs: DataFrame, idCol: String, nTokens: Column,
      batchSize: Int, bucketWidth: Int): DataFrame = {
    require(batchSize > 0 && bucketWidth > 0,
      "batchSize and bucketWidth must be positive")
    val base = docs
      .select(col(idCol).as("doc_id"), nTokens.cast("long").as("n_tokens"))
      .withColumn("bucket", floor(col("n_tokens") / bucketWidth))
    val wBucket = Window.partitionBy(col("bucket"))
      .orderBy(col("n_tokens"), col("doc_id"))
    base
      .withColumn("rn", row_number().over(wBucket))
      .withColumn("batch_in_bucket", floor((col("rn") - 1) / batchSize))
      .groupBy(col("bucket"), col("batch_in_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_len"),
        sum(col("n_tokens")).as("sum_len"))
      .withColumn("padded_tokens", col("n_docs") * col("max_len"))
      .withColumn("waste_frac",
        round((col("padded_tokens") - col("sum_len")) / col("padded_tokens"), 4))
  }

  /** Corpus selection under a global token budget: walk the corpus in
    * descending `score` order (ties broken by id) and keep documents
    * while the running token total stays ≤ `budget` — the "take the best
    * B tokens" step that ends most curation pipelines (quality-classifier
    * selection, dedup-survivor capping).
    *
    * `score` must be an INTEGRAL column (quantize upstream — e.g.
    * density · 1e6 via integral division) so the order, and therefore the
    * selected set, is bit-reproducible across engines and re-runs.
    *
    * The running total is a prefix sum over a GLOBAL order — the
    * single-partition window trap again — so it runs two-phase like
    * [[packAssignments]], but banded by score instead of id-range:
    *   1. rows are coarsened into score bands (floor(score/bandWidth));
    *      within each band a band-partitioned window computes the local
    *      inclusive cumsum in (score desc, id) order — parallel across
    *      bands;
    *   2. one tiny window over the per-band totals (score_range/bandWidth
    *      rows) produces each band's starting offset, broadcast back.
    * Bands follow the global order because every score in a higher band
    * sorts before every score in a lower one.
    *
    * Returns (doc_id, score, n_tokens, cum_tokens) for the selected
    * documents, cum_tokens inclusive. A single document larger than the
    * remaining budget stops the walk at its band position (standard
    * greedy prefix semantics: selection is the maximal prefix whose
    * inclusive sum fits).
    *
    * Caveat: parallelism is one task per OCCUPIED band, so a degenerate
    * score distribution (everything in one band — e.g. a constant score)
    * collapses phase 1 to a single partition. Pick `bandWidth` well under
    * the score spread (spread/bandWidth ≥ cluster parallelism); for a
    * constant-score corpus the order is id-only anyway — use
    * [[packAssignments]]'s id-range grouping instead.
    */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, score: Column,
      nTokens: Column, budget: Long, bandWidth: Int = 1000): DataFrame = {
    require(budget > 0 && bandWidth > 0, "budget and bandWidth must be positive")
    val base = docs.select(col(idCol).as("doc_id"),
      score.cast("long").as("score"), nTokens.cast("long").as("n_tokens"))
      .withColumn("band", floor(col("score") / bandWidth))
    // Phase 1: inclusive cumsum inside each score band, in global-order
    // direction (score desc, id).
    val wBand = Window.partitionBy(col("band"))
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("local_cum", sum(col("n_tokens")).over(wBand))
    // Phase 2: exclusive cumsum over per-band totals, walking bands in
    // descending order (higher band = earlier in the global walk).
    val wTot = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("band"))
      .agg(sum(col("n_tokens")).as("band_tokens"))
      .withColumn("band_offset", coalesce(sum(col("band_tokens")).over(wTot), lit(0L)))
      .select(col("band"), col("band_offset"))
    // band joins with <=> (score is cast from a non-null column, so
    // floor(score/bandWidth) is never null — semantics identical): stops
    // InferFiltersFromConstraints pushing isnotnull(FLOOR(score/w)) into
    // one branch of the shared `base` subtree, which would break subtree
    // canonicalization and AQE exchange reuse (the Stats 3-scan shape).
    local.join(broadcast(offsets.withColumnRenamed("band", "band_o")),
        col("band") <=> col("band_o"))
      .withColumn("cum_tokens", col("band_offset") + col("local_cum"))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("score"), col("n_tokens"), col("cum_tokens"))
  }
}
