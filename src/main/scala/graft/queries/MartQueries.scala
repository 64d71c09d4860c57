package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Aggregations, Flatten}

/** Mart / analytics capability queries (SURVEY §2.4 A5, A7 + the windowed
  * shapes Spark gives for free once SQL is exposed).
  */
object MartQueries {

  val defs: Seq[QueryDef] = Seq(

    // ----------------------------------------------------------------
    // A7 dormant data-mart spec (create_future_platforms_schemas.sql:
    // 173-202): daily_sales_summary GROUP BY (day, platform).
    QueryDef(
      "q17_mart_daily",
      (spark, dir) =>
        Aggregations.dailySalesSummary(
            Tables.orders(spark, dir), Tables.lineitem(spark, dir))
          .orderBy(col("sale_date"), col("platform")),
      Some("""SELECT CAST(o_orderdate AS DATE) AS sale_date,
             |o_orderpriority AS platform,
             |COUNT(DISTINCT o_orderkey) AS total_orders,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_quantity,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) / COUNT(DISTINCT o_orderkey) AS avg_order_value
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1, 2 ORDER BY sale_date, platform""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // Incremental-mart maintenance: two disjoint order-grain batches each
    // build a q17 partial, and the merge must be BIT-IDENTICAL to the
    // full recompute — which is exactly what the oracle computes (it is
    // q17's full-mart SQL verbatim). The pattern a 100 TB mart needs:
    // each cycle aggregates only its new orders; the standing mart folds
    // in mart-sized partials instead of re-scanning fact history.
    QueryDef(
      "q100_incremental_mart",
      (spark, dir) => {
        val orders = Tables.orders(spark, dir)
        val li = Tables.lineitem(spark, dir)
        val batches = Seq(0, 1).map { b =>
          Aggregations.dailySalesSummary(
            orders.filter(pmod(col("o_orderkey"), lit(2)) === b),
            li.filter(pmod(col("l_orderkey"), lit(2)) === b))
        }
        Aggregations.mergeDailySalesPartials(batches)
          .orderBy(col("sale_date"), col("platform"))
      },
      Some("""SELECT CAST(o_orderdate AS DATE) AS sale_date,
             |o_orderpriority AS platform,
             |COUNT(DISTINCT o_orderkey) AS total_orders,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_quantity,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) / COUNT(DISTINCT o_orderkey) AS avg_order_value
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1, 2 ORDER BY sale_date, platform""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // Window ranking (falls out free from Spark SQL — SURVEY §2.4 note):
    // top-3 orders per priority class by price, deterministic tie-break.
    QueryDef(
      "q18_window_rank",
      (spark, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(spark, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
             |SELECT o_orderpriority, o_orderkey, o_totalprice,
             |ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             |  ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |FROM orders) WHERE rn <= 3
             |ORDER BY o_orderpriority, rn""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // q18's top-3-per-group, AGGREGATE-shaped: the native TopKByOrd
    // aggregate keeps a k-bounded pool per group per task, so the
    // shuffle carries ≤ k pairs per group per task — the 100 TB path,
    // where q18's ranking window would sort the whole fact table to
    // discard all but 3 rows per group. Same answer, same oracle shape.
    QueryDef(
      "q96_topk_agg",
      (spark, dir) =>
        Tables.orders(spark, dir)
          .groupBy(col("o_orderpriority"))
          .agg(graft.functions.TopKByOrd.top_k_by(
            col("o_totalprice"), col("o_orderkey"), 3).as("top"))
          .select(col("o_orderpriority"), posexplode(col("top")))
          .select(col("o_orderpriority"), (col("pos") + 1).as("rn"),
            col("col.id").as("o_orderkey"), col("col.ord").as("o_totalprice"))
          .orderBy(col("o_orderpriority"), col("rn")),
      Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
             |SELECT o_orderpriority, o_orderkey, o_totalprice,
             |ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             |  ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |FROM orders) WHERE rn <= 3
             |ORDER BY o_orderpriority, rn""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // §2.7 micro-batch windowed aggregation, batch form (the Structured
    // Streaming twin lives in graft.streaming and is exercised in tests):
    // hourly tumbling window per event_type.
    QueryDef(
      "q19_hourly_events",
      (spark, dir) =>
        Tables.events(spark, dir)
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            Aggregations.dsum(col("value"), 18, 6).as("sum_value"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("hour"), col("event_type")),
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             |COUNT(*) AS n_events,
             |CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             |COUNT(DISTINCT user_id) AS n_users
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // A5 validation invariants as a single-row reconciliation report
    // (misa_crm_transformer.py:388-447): the flatten preserves order count,
    // item count, and emits exactly Σ max(items,1) rows.
    QueryDef(
      "q20_validation",
      (spark, dir) => {
        val orders = Tables.orders(spark, dir)
        val li = Tables.lineitem(spark, dir)
        val nested = orders.join(
          li.groupBy(col("l_orderkey"))
            .agg(collect_list(struct(col("l_linenumber"))).as("line_items")),
          col("o_orderkey") === col("l_orderkey"), "left")
        val flat = Flatten.flattenOuter(nested, "line_items", "item", Seq("o_orderkey"))
        flat.agg(
          countDistinct(col("o_orderkey")).as("distinct_orders_out"),
          sum(when(col("item").isNotNull, 1L).otherwise(0L)).as("item_rows_out"),
          count(lit(1)).as("total_rows_out"))
          .crossJoin(orders.agg(count(lit(1)).as("orders_in")))
          .crossJoin(li.agg(count(lit(1)).as("items_in")))
          .select(col("orders_in"), col("distinct_orders_out"),
            col("items_in"), col("item_rows_out"), col("total_rows_out"))
      },
      Some("""SELECT
             |(SELECT COUNT(*) FROM orders) AS orders_in,
             |(SELECT COUNT(DISTINCT o_orderkey) FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey) AS distinct_orders_out,
             |(SELECT COUNT(*) FROM lineitem) AS items_in,
             |(SELECT COUNT(l_linenumber) FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey) AS item_rows_out,
             |(SELECT COUNT(*) FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey) AS total_rows_out""".stripMargin),
    ),
  )
}
