package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's statistics / data-quality / mart aggregations (SURVEY
  * §2.4), each a single partial-aggregated Spark job.
  */
object Aggregations {

  /** Exact decimal-routed sum of a double column, surfaced as double —
    * engine- and partition-order-independent (see QueryDef).
    */
  def dsum(c: Column, precision: Int = 18, scale: Int = 2): Column =
    sum(c.cast(DecimalType(precision, scale))).cast(DoubleType)

  /** A1 load statistics (tiktok_shop_staging_loader.py:155-203). */
  def loadStats(df: DataFrame, pk: String, tsCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("total_records"),
      countDistinct(col(pk)).as(s"unique_$pk"),
      min(col(tsCol)).as(s"min_$tsCol"),
      max(col(tsCol)).as(s"max_$tsCol"))

  /** A2 staging summary (misa_crm_loader.py:325-382): per-group rowcount,
    * distinct entities, recency count relative to a cutoff.
    */
  def stagingSummary(df: DataFrame, groupCol: String, idCol: String,
      tsCol: String, recentCutoff: Column): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("total_records"),
        countDistinct(col(idCol)).as("unique_ids"),
        max(col(tsCol)).cast(DateType).as("last_loaded_day"),
        sum(when(col(tsCol) >= recentCutoff, 1L).otherwise(0L)).as("recent_records"))

  /** A3 data-quality gate (production_etl_orchestrator.py:264-327): one
    * count per table, pass iff ≥ minNonEmpty tables have rows. Counts run
    * as parallel jobs; parquet row-group metadata makes each a metadata-only
    * scan.
    */
  def qualityCounts(spark: SparkSession, sfDir: String, tables: Seq[String]): DataFrame = {
    import graft.core.Tables
    val counts = tables.map { t =>
      Tables.load(spark, sfDir, t)
        .agg(count(lit(1)).as("row_cnt"))
        .select(lit(t).as("table_name"), col("row_cnt"))
    }
    counts.reduce(_.unionByName(_)).withColumn("non_empty", col("row_cnt") > 0)
  }

  def qualityGatePassed(counts: DataFrame, minNonEmpty: Int): Boolean =
    counts.filter(col("non_empty")).count() >= minNonEmpty

  /** A7 dormant data-mart spec (create_future_platforms_schemas.sql:173-202):
    * daily_sales_summary — GROUP BY (day, platform) with order counts, summed
    * revenue/quantity and average order value. `platform` is the grouping
    * dimension column; revenue is computed at line grain.
    */
  def dailySalesSummary(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val joined = lineitem.join(orders,
      lineitem("l_orderkey") === orders("o_orderkey"), "inner")
    joined
      .groupBy(to_date(col("o_orderdate")).as("sale_date"),
        col("o_orderpriority").as("platform"))
      .agg(
        countDistinct(col("o_orderkey")).as("total_orders"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))))
          .cast(DoubleType).as("total_revenue"),
        dsum(col("l_quantity")).as("total_quantity"))
      .withColumn("avg_order_value", col("total_revenue") / col("total_orders"))
  }
}
