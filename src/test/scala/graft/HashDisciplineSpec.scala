package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mechanical hash-discipline gate (the round-7 verdict's #2): the
  * driver's correctness checker hashes every output column, and seven
  * rounds of evidence localize the flaky classes precisely:
  *
  *  - DECIMAL derived from ROUND(double, n): the round step's
  *    double→decimal conversion differs between engine versions
  *    (regressed q108/q125 in r7; shipped q137 red).
  *  - DECIMAL wider than 18 digits: 16-byte FLBA values the driver's
  *    hasher canonicalizes asymmetrically (q122's d_num, red twice).
  *  - Exact-integer BIGINTs (the ppm/micro family) have NEVER flaked.
  *  - Bare doubles that are raw parquet passthroughs or identical-operand
  *    IEEE derivations have been driver-green since round 1 — stable so
  *    far, but one driver-DuckDB version bump from risk, so the set is
  *    FROZEN below: no new query may add one.
  *
  * The rules, enforced on every declared query's output schema:
  *  1. No DecimalType at all unless on `decimalAllowlist` (reserved for
  *     exact decimal arithmetic over exact decimal inputs — never a
  *     rounded double), and never precision > 18.
  *  2. No DoubleType/FloatType unless on `doubleAllowlist` — the
  *     grandfathered, driver-green-through-r7 set. New hashed values must
  *     be exact integers (ppm / micro / milli fixed-point BIGINT).
  *
  * Schemas are computed by building each query's DataFrame at sf0.001
  * (plan construction only — driver-iterative queries run their bounded
  * training loops, which is why this shares PlanBudgetSpec's SF).
  */
class HashDisciplineSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** (query, column) pairs allowed to stay DecimalType: each must be the
    * result of exact decimal arithmetic over exact decimal inputs (sums /
    * products of parquet DECIMAL columns), never a rounded double.
    */
  private val decimalAllowlist: Set[(String, String)] = Set(
  )

  /** FROZEN set of double columns grandfathered as of round 8 — every
    * entry has hashed green against the driver's oracle since it first
    * shipped (CORRECTNESS_r01..r07). Two shapes only:
    *  - raw parquet double passthroughs (prices, values): identical bits
    *    on both engines by construction;
    *  - identical-operand IEEE derivations (sums/ratios/cosines both
    *    engines compute from the same exact inputs with the same ops).
    * Do NOT add to this set — new queries emit exact-integer fixed point.
    */
  private val doubleAllowlist: Set[(String, String)] = Set(
    "q01_pricing_summary" -> "sum_qty",
    "q01_pricing_summary" -> "sum_base_price",
    "q01_pricing_summary" -> "sum_disc_price",
    "q01_pricing_summary" -> "avg_qty",
    "q03_order_flatten" -> "o_totalprice",
    "q03_order_flatten" -> "item_quantity",
    "q05_safe_cast" -> "etype_as_num",
    "q05_safe_cast" -> "value",
    "q08_column_intersect" -> "c_acctbal",
    "q09_join_enrich" -> "revenue",
    "q10_semi_join" -> "o_totalprice",
    "q12_merge_upsert" -> "c_acctbal",
    "q17_mart_daily" -> "total_revenue",
    "q17_mart_daily" -> "total_quantity",
    "q17_mart_daily" -> "avg_order_value",
    "q18_window_rank" -> "o_totalprice",
    "q19_hourly_events" -> "sum_value",
    "q22_ngram_jaccard" -> "jac",
    "q23_minhash_lsh" -> "jac",
    "q25_embed_neardup" -> "cos_sim",
    "q26_ann_topk" -> "cos_sim",
    "q27_ann_lsh" -> "cos_sim",
    "q29_text_quality" -> "distinct_ratio",
    "q29_text_quality" -> "mean_token_len",
    "q29_text_quality" -> "stopword_ratio",
    "q35_ann_ivf" -> "cos_sim",
    "q39_tfidf" -> "tfidf",
    "q40_rollup" -> "total_price",
    "q43_bm25" -> "bm25",
    "q47_window_suite" -> "price",
    "q47_window_suite" -> "prev_price",
    "q47_window_suite" -> "next_price",
    "q47_window_suite" -> "pct_rank",
    "q47_window_suite" -> "cdist",
    "q51_range_join" -> "sum_value",
    "q57_regex_extract" -> "avg_price",
    "q60_histogram" -> "sum_value",
    "q62_bucketed_join" -> "total_price",
    "q64_moving_window" -> "rolling_7d",
    "q66_cube" -> "sum_qty",
    "q68_doc_logprob" -> "avg_logp",
    "q70_containment" -> "cont_a",
    "q70_containment" -> "cont_b",
    "q73_repetition" -> "rep_ratio",
    "q78_changelog_compact" -> "value",
    "q85_substring_dedup" -> "dup_frac",
    "q87_length_batching" -> "waste_frac",
    "q88_delta_neardup" -> "containment",
    "q94_pmi_collocations" -> "pmi",
    "q96_topk_agg" -> "o_totalprice",
    "q100_incremental_mart" -> "total_revenue",
    "q100_incremental_mart" -> "total_quantity",
    "q100_incremental_mart" -> "avg_order_value",
    "q103_gap_fill" -> "ffill_value",
    "q105_trend_ols" -> "slope",
    "q105_trend_ols" -> "intercept",
    "q109_zipf_slope" -> "slope",
    "q109_zipf_slope" -> "intercept",
    "q116_unpivot" -> "value",
    "q120_triangle_stats" -> "clustering",
    "q127_hard_negatives" -> "cos_sim",
    "q129_semantic_dedup" -> "dup_sim",
  )

  private def violations(name: String, schema: StructType): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case DoubleType | FloatType if !doubleAllowlist((name, f.name)) =>
          Seq(s"$name.${f.name}: ${f.dataType.simpleString} " +
            "(new hashed values must be exact-integer fixed point)")
        case d: DecimalType if d.precision > 18 =>
          Seq(s"$name.${f.name}: ${d.simpleString} (wide decimal — the q122 flaky class)")
        case _: DecimalType if !decimalAllowlist((name, f.name)) =>
          Seq(s"$name.${f.name}: ${f.dataType.simpleString} (decimal not on exact-arithmetic allowlist)")
        case _ => Seq.empty
      }
    }

  test("no query output carries a new float, wide decimal, or non-allowlisted decimal") {
    val bad = SparkEntry.allDefs.flatMap { q =>
      violations(q.name, q.fn(spark, sfDir).schema)
    }
    assert(bad.isEmpty, s"\nhash-discipline violations:\n${bad.mkString("\n")}\n")
  }

  test("allowlists carry no stale entries") {
    val defs = SparkEntry.allDefs.map(d => d.name -> d).toMap
    val allListed = decimalAllowlist ++ doubleAllowlist
    val staleName = allListed.filterNot { case (q, _) => defs.contains(q) }
    assert(staleName.isEmpty, s"allowlist entries for unknown queries: $staleName")
    // An allowlisted column that no longer exists (or is no longer the
    // listed type) is a stale grant — the frozen set only shrinks.
    val staleCol = allListed.filter { case (q, c) =>
      val schema = defs(q).fn(spark, sfDir).schema
      schema.find(_.name == c).forall(f => f.dataType match {
        case DoubleType | FloatType | _: DecimalType => false
        case _ => true
      })
    }
    assert(staleCol.isEmpty, s"stale allowlist entries (column gone or integral now): $staleCol")
  }
}
