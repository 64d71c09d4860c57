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
}
