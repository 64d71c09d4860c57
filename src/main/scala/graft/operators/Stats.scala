package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributional statistics for data-quality gates. The family
  * discipline (shared with the moment/OLS/chi-square queries): every
  * data-sized reduction happens in exact integer/DECIMAL arithmetic so
  * the result is independent of partitioning and engine summation order;
  * floating point appears only in final, identical-operand scalar steps
  * (IEEE +,−,×,÷,sqrt are correctly rounded — deterministic; only
  * transcendentals carry libm risk, and none is used here).
  */
object Stats {

  /** Two-sample Kolmogorov–Smirnov test: D = sup_x |F_a(x) − F_b(x)| —
    * the standard "did this batch's distribution drift from the
    * reference corpus" gate (feature drift, scraper regressions, mixture
    * shifts), sensitive to ANY distributional difference, not just the
    * mean/variance the z-score and moment gates watch.
    *
    * Exactness: at every distinct pooled value, D's numerator is the
    * integer |ca·n_b − cb·n_a| (ca, cb = cumulative counts ≤ x), so
    * `d_num` is exact and max() is order-independent. The reported
    * `d` = d_num/(n_a·n_b) and the α=0.05 decision (critical value
    * c = 1.3581, the large-sample Smirnov approximation) are computed
    * from exact integers by identical-operand IEEE double ops.
    *
    * Scale: counts-per-distinct-value is one keyed aggregation. The
    * cumulative counts are a prefix sum in VALUE order — run as the
    * two-phase distributed shape (the Packing discipline): a window
    * inside fixed-width value bands plus one tiny window over the
    * per-band totals (#bands = value range / bandWidth, bounded and
    * data-independent), never a global single-partition sort. Products
    * route through DECIMAL(38,0) so n_a·n_b stays exact far past int64.
    *
    * `value` must be numeric with exact equality semantics (int /
    * decimal; binning floats first is the caller's call).
    */
  def ksTwoSample(df: DataFrame, value: Column, side: Column,
      sideA: String, sideB: String, bandWidth: Int): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val vals = df.select(value.as("v"), side.as("s"))
      .filter(col("s").isin(sideA, sideB))
    val byV = vals.groupBy(col("v")).agg(
      sum(when(col("s") === sideA, 1L).otherwise(0L)).as("da"),
      sum(when(col("s") === sideB, 1L).otherwise(0L)).as("db"))
      .withColumn("band", floor(col("v") / bandWidth))
    // Phase 1: inclusive cumsum inside each value band.
    val wLocal = Window.partitionBy(col("band")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = byV
      .withColumn("la", sum(col("da")).over(wLocal))
      .withColumn("lb", sum(col("db")).over(wLocal))
    // Phase 2: band base offsets from the bounded per-band totals frame.
    val wBand = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = byV.groupBy(col("band"))
      .agg(sum(col("da")).as("ta"), sum(col("db")).as("tb"))
      .select(col("band"),
        coalesce(sum(col("ta")).over(wBand), lit(0L)).as("oa"),
        coalesce(sum(col("tb")).over(wBand), lit(0L)).as("ob"))
    val n = vals.agg(
      sum(when(col("s") === sideA, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("s") === sideB, 1L).otherwise(0L)).as("n_b"))
    val dec = "cast(%s as decimal(38,0))"
    local.join(broadcast(offsets), Seq("band"))
      .select((col("oa") + col("la")).as("ca"), (col("ob") + col("lb")).as("cb"))
      .crossJoin(broadcast(n))
      .agg(max(abs(expr(dec.format("ca") + " * " + dec.format("n_b")) -
        expr(dec.format("cb") + " * " + dec.format("n_a")))).as("d_num"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        round(col("d_num").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6).as("d"),
        (col("d_num").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")) >
          lit(1.3581) * sqrt((col("n_a") + col("n_b")).cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double"))))
          .as("reject_05"))
  }
}
