package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy governance audits a training-data release runs beside the PII
  * scrub (see [[TextAnalysis.piiScan]]): measurement, not enforcement —
  * the release decision needs the number before the mitigation.
  */
object Privacy {

  /** k-anonymity audit (Sweeney) over quasi-identifier columns: a record
    * whose QI combination is shared by fewer than k corpus rows is
    * re-identifiable at that k. Per requested k: how many QI equivalence
    * classes and rows fall below k, and the corpus row fraction as exact
    * ppm. All-BIGINT output, ordered by k.
    *
    * Scale shape: ONE |classes|-sized hash aggregate (map-side partial)
    * reduces the corpus; every threshold's conditional sums ride ONE
    * aggregate over that frame, and the per-k report rows explode from
    * the single aggregate row — k-count-independent shuffles, nothing
    * row-sized past the first aggregation.
    *
    * `qi` columns must carry stable names (alias computed buckets, e.g.
    * `floor(col("n_chars") / 500).as("len_bucket")`).
    */
  def kAnonymityAudit(df: DataFrame, qi: Seq[Column], ks: Seq[Long]): DataFrame = {
    require(qi.nonEmpty, "at least one quasi-identifier column")
    require(ks.nonEmpty && ks.forall(_ >= 2), "thresholds must be >= 2")
    val proj = df.select(qi: _*)
    val classes = proj.groupBy(proj.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("cnt"))
    val perK = ks.flatMap { k =>
      Seq(sum(when(col("cnt") < k, 1L).otherwise(0L)).as(s"g_$k"),
        sum(when(col("cnt") < k, col("cnt")).otherwise(0L)).as(s"r_$k"))
    }
    val one = classes.agg(count(lit(1)).as("n_classes"),
      (sum(col("cnt")).as("n_rows") +: perK): _*)
    one.select(col("n_classes"), col("n_rows"),
        explode(array(ks.map { k =>
          struct(lit(k).as("k"), col(s"g_$k").as("classes_below_k"),
            col(s"r_$k").as("rows_below_k"))
        }: _*)).as("t"))
      .select(col("t.k").as("k"), col("n_classes"), col("n_rows"),
        col("t.classes_below_k").as("classes_below_k"),
        col("t.rows_below_k").as("rows_below_k"),
        expr("(t.rows_below_k * 1000000) div n_rows").as("rows_below_ppm"))
      .orderBy(col("k"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): k-anonymity is
    * defeated by a homogeneous class — if every record sharing a QI
    * combination carries the SAME sensitive value, group size protects
    * nothing. A class is l-diverse when its records span at least l
    * distinct sensitive values; per requested l: classes and rows below
    * l, and the corpus row fraction as exact ppm. All-BIGINT, ordered
    * by l.
    *
    * Scale shape: ONE (QI, sensitive)-keyed hash aggregate reduces the
    * corpus, ONE QI-keyed aggregate over that (both map-side partial,
    * pair-count-sized not row-sized), then every threshold's conditional
    * sums ride ONE aggregate whose single row explodes into the per-l
    * report — l-count-independent shuffles. The distinct count is exact
    * via the pre-aggregation, never a countDistinct expansion.
    */
  def lDiversityAudit(df: DataFrame, qi: Seq[Column], sensitive: Column,
      ls: Seq[Long]): DataFrame = {
    require(qi.nonEmpty, "at least one quasi-identifier column")
    require(ls.nonEmpty && ls.forall(_ >= 2), "thresholds must be >= 2")
    val proj = df.select((qi :+ sensitive.as("__s")): _*)
    val qiCols = proj.columns.dropRight(1).map(col).toIndexedSeq
    // (QI, s) pairs first: |pairs| ≤ |classes|·|sensitive domain|, and the
    // second aggregate's ndv is an exact count over already-distinct keys.
    val pairs = proj.groupBy((qiCols :+ col("__s")): _*)
      .agg(count(lit(1)).as("cnt"))
    val classes = pairs.groupBy(qiCols: _*)
      .agg(count(lit(1)).as("ndv"), sum(col("cnt")).as("cnt"))
    val perL = ls.flatMap { l =>
      Seq(sum(when(col("ndv") < l, 1L).otherwise(0L)).as(s"g_$l"),
        sum(when(col("ndv") < l, col("cnt")).otherwise(0L)).as(s"r_$l"))
    }
    val one = classes.agg(count(lit(1)).as("n_classes"),
      (sum(col("cnt")).as("n_rows") +: perL): _*)
    one.select(col("n_classes"), col("n_rows"),
        explode(array(ls.map { l =>
          struct(lit(l).as("l"), col(s"g_$l").as("classes_below_l"),
            col(s"r_$l").as("rows_below_l"))
        }: _*)).as("t"))
      .select(col("t.l").as("l"), col("n_classes"), col("n_rows"),
        col("t.classes_below_l").as("classes_below_l"),
        col("t.rows_below_l").as("rows_below_l"),
        expr("(t.rows_below_l * 1000000) div n_rows").as("rows_below_ppm"))
      .orderBy(col("l"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007): l-diversity
    * is defeated by skewed diversity — a class can span l sensitive
    * values yet reveal plenty when its distribution diverges from the
    * corpus-wide one. Per QI class, the total variation distance between
    * the class's sensitive-value distribution and the global one,
    * as exact ppm; per requested threshold t: classes and rows whose
    * TVD exceeds t. Ordered by threshold.
    *
    * Exact-integer TVD without densifying the (class × sensitive-domain)
    * grid: with class counts c_s (Σ = m), global counts g_s (Σ = N),
    *   TVD = ½ Σ_s |c_s/m − g_s/N|
    *       = [ Σ_{s∈class} |c_s·N − g_s·m| + m·(N − Σ_{s∈class} g_s) ]
    *         / (2·m·N)
    * — the second term folds every sensitive value ABSENT from the class
    * into one closed form, so only observed (class, s) pairs are ever
    * materialized. Products ride DECIMAL(38,0) (c_s·N and 2·m·N overflow
    * BIGINT past ~3×10⁹ rows); the final ppm is an integral division
    * back to BIGINT.
    *
    * Scale shape: ONE (QI, s) aggregate (pair-sized), ONE broadcast join
    * against the |sensitive domain|-sized global frame + the one-row
    * total, ONE QI-keyed aggregate to per-class TVD, then the threshold
    * report explodes from ONE final aggregate row.
    */
  def tClosenessAudit(df: DataFrame, qi: Seq[Column], sensitive: Column,
      thresholdsPpm: Seq[Long]): DataFrame = {
    require(qi.nonEmpty, "at least one quasi-identifier column")
    require(thresholdsPpm.nonEmpty && thresholdsPpm.forall(t => t >= 0 && t <= 1000000),
      "thresholds are ppm in [0, 1000000]")
    val proj = df.select((qi :+ sensitive.as("__s")): _*)
    val qiCols = proj.columns.dropRight(1).map(col).toIndexedSeq
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pairs = proj.groupBy((qiCols :+ col("__s")): _*)
      .agg(count(lit(1)).as("c_s"))
    val glob = pairs.groupBy(col("__s")).agg(sum(col("c_s")).as("g_s"))
    val tot = glob.agg(sum(col("g_s")).as("n_total"))
    // m (class size) per pair via a QI-partitioned whole-partition window:
    // the window's hash partitioning already satisfies the following
    // groupBy's distribution, so the class aggregate adds NO exchange.
    val m = sum(col("c_s")).over(
      org.apache.spark.sql.expressions.Window.partitionBy(qiCols: _*))
    val perClass = pairs
      .join(broadcast(glob), "__s")
      .crossJoin(broadcast(tot))
      .withColumn("m", m)
      .groupBy(qiCols: _*)
      .agg(first(col("m")).as("m"), first(col("n_total")).as("n_total"),
        sum(abs(col("c_s").cast(dec) * col("n_total")
          - col("g_s").cast(dec) * col("m"))).as("present_dev"),
        sum(col("g_s")).as("g_present"))
      .select(col("m"), col("n_total"),
        // absent-values closed form: every s the class never exhibits
        // contributes |0 − g_s·m| = g_s·m, totalling m·(N − Σ_present g_s).
        // `div` (IntegralDivide) is the EXACT truncating quotient on
        // decimals — never `/`, whose decimal result scale can round the
        // 6th fractional digit up and break the integer hash contract.
        expr("""CAST(((present_dev
                 + CAST(m AS DECIMAL(38,0)) * (n_total - g_present))
                 * 1000000)
               div (CAST(m AS DECIMAL(38,0)) * n_total * 2) AS BIGINT)""")
          .as("tvd_ppm"))
    val perT = thresholdsPpm.flatMap { t =>
      Seq(sum(when(col("tvd_ppm") > t, 1L).otherwise(0L)).as(s"g_$t"),
        sum(when(col("tvd_ppm") > t, col("m")).otherwise(0L)).as(s"r_$t"))
    }
    val one = perClass.agg(count(lit(1)).as("n_classes"),
      (sum(col("m")).as("n_rows") +:
        max(col("tvd_ppm")).as("max_tvd_ppm") +: perT): _*)
    one.select(col("n_classes"), col("n_rows"), col("max_tvd_ppm"),
        explode(array(thresholdsPpm.map { t =>
          struct(lit(t).as("t_ppm"), col(s"g_$t").as("classes_above_t"),
            col(s"r_$t").as("rows_above_t"))
        }: _*)).as("r"))
      .select(col("r.t_ppm").as("t_ppm"), col("n_classes"), col("n_rows"),
        col("max_tvd_ppm"),
        col("r.classes_above_t").as("classes_above_t"),
        col("r.rows_above_t").as("rows_above_t"),
        expr("(r.rows_above_t * 1000000) div n_rows").as("rows_above_ppm"))
      .orderBy(col("t_ppm"))
  }
}
