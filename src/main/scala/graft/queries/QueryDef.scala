package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a named DataFrame query over a
  * scale-factor directory, plus (when SQL-expressible) the equivalent ANSI
  * SQL the driver runs in DuckDB as the correctness oracle.
  *
  * Contract notes (driver gate):
  *  - Column names must match between the Spark result and the oracle SQL —
  *    alias every computed column identically on both sides.
  *  - Aggregates over doubles are computed through DECIMAL (exact, engine-
  *    order-independent) and cast back to DOUBLE, so both engines produce
  *    bit-identical values regardless of summation order.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {

  /** Spread a compute-heavy narrow pass across the configured parallelism
    * ONLY when the scan provides too few splits to saturate it (a tiny
    * test table reads as ONE parquet split, so a per-row-expensive fold
    * would run in one task — 13s vs ~1s measured on q50 at sf0.1). At
    * production scale the scan is already parallel — well past the
    * threshold — and this is the IDENTITY: no shuffle of row bodies ever
    * happens. The threshold is scan-splits×2 ≤ shuffle.partitions:
    * anything above that parallelizes fine without redistribution.
    * Checking costs one file-listing pass (no data read).
    */
  def spreadIfNarrow(df: DataFrame): DataFrame = {
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }
}
