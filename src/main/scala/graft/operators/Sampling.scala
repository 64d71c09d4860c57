package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-splitting and sampling operators for training-data pipelines.
  * All assignment is DETERMINISTIC (multiplicative integer hashing of the
  * id), never `rand()`: re-running a 100 TB split must land every row in
  * the same bucket, and the split must survive retries, re-partitioning
  * and incremental appends.
  */
object Sampling {

  /** Knuth-style multiplicative hash of an integer id onto [0, buckets):
    * pure integer arithmetic, reproducible in any engine. The id is
    * reduced mod P BEFORE the multiply so the product stays under 2^63
    * for any 64-bit id (ANSI overflow-safe).
    */
  def idBucket(id: Column, buckets: Int): Column = {
    val P = 2147483647L
    pmod(pmod(pmod(id, lit(P)) * lit(2654435761L), lit(P)), lit(buckets.toLong))
  }

  /** Deterministic train/validation/test split by id hash. Fractions are
    * percentages of the 100-bucket hash space.
    */
  def trainValTestSplit(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val b = idBucket(col(idCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Class-balanced subsample: deterministically keep up to `perClass` rows
    * per label, ranked by id hash (not by id, which would bias toward
    * early records).
    */
  def balancedSample(df: DataFrame, labelCol: String, idCol: String,
      perClass: Int): DataFrame = {
    val w = Window.partitionBy(col(labelCol))
      .orderBy(idBucket(col(idCol), 1000000), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= perClass)
      .drop("sample_rank")
  }

  /** Mixture-weighted subsample: hit a target data-mixture by source.
    * Each source gets quota = floor(totalRows · weight / Σweights) rows,
    * chosen deterministically by id hash within the source (so re-runs,
    * retries and incremental appends pick the same rows).
    *
    * `weight` must be constant within a source (it is aggregated with
    * max). Scale shape: the per-source weight table and the quota table
    * are |sources|-sized — aggregated small, broadcast back; the only
    * full-data shuffle is the per-source ranking window, partitioned by
    * source (salt the window via [[balancedSample]]-style sub-keys if one
    * source dominates the corpus).
    */
  def mixtureSample(df: DataFrame, sourceCol: String, idCol: String,
      weight: Column, totalRows: Long): DataFrame = {
    val srcW = df.groupBy(col(sourceCol)).agg(max(weight).as("wt"))
    val total = srcW.agg(sum(col("wt")).as("tw"))
    val quotas = srcW.crossJoin(broadcast(total))
      .withColumn("quota",
        floor(lit(totalRows.toDouble) * col("wt") / col("tw")))
      .select(col(sourceCol), col("quota"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(idBucket(col(idCol), 1000000), col(idCol))
    df.join(broadcast(quotas), Seq(sourceCol))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= col("quota"))
      .drop("sample_rank")
  }
}
