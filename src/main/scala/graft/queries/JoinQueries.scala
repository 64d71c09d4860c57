package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.operators.Relational

/** Join-family capability queries (SURVEY §2.3: J1–J4 + L4/L5 as pure
  * transforms). Small dimensions are broadcast explicitly — at 100 TB the
  * fact side never shuffles for a dimension join.
  */
object JoinQueries {

  val defs: Seq[QueryDef] = Seq(

    // ----------------------------------------------------------------
    // J2 star-schema enrichment (docs/MISA_CRM_SCHEMA_DESIGN.md:96-111):
    // revenue per nation in one region+year. lineitem⋈orders is the only
    // shuffle; customer/nation/region are broadcast.
    QueryDef(
      "q09_join_enrich",
      (spark, dir) => {
        val li = Tables.lineitem(spark, dir)
        val o = Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1995-01-01") &&
            col("o_orderdate") < lit("1997-01-01"))
        val c = Tables.customer(spark, dir)
        val n = Tables.nation(spark, dir)
        val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(
            sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))))
              .cast(DoubleType).as("revenue"),
            count(lit(1)).as("line_count"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
             |COUNT(*) AS line_count
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // J1 semi-join (the S1→S2 id-search-then-detail shape): orders having at
    // least one max-quantity line. left_semi never duplicates or widens rows.
    QueryDef(
      "q10_semi_join",
      (spark, dir) => {
        val hot = Tables.lineitem(spark, dir)
          .filter(col("l_quantity") >= 50).select(col("l_orderkey"))
        Tables.orders(spark, dir)
          .join(hot, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 50)
             |ORDER BY o_orderkey""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // J4/L4 anti-join dedup (tiktok_shop_staging_loader.py:128-153):
    // incoming minus already-loaded keys. Here: customers with no recent
    // orders (the "not yet loaded this window" set).
    QueryDef(
      "q11_anti_join",
      (spark, dir) =>
        Relational.dedupAppend(
            incoming = Tables.customer(spark, dir),
            existing = Tables.orders(spark, dir)
              .filter(col("o_orderdate") >= lit("2001-01-01"))
              .select(col("o_custkey").as("c_custkey")),
            keys = Seq("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
             |  AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
             |ORDER BY c_custkey""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // J3/L5 MERGE upsert (run_historical_backfill.py:86-183) as a pure
    // transform: source rows win on match, insert on no-match, untouched
    // target rows survive.
    QueryDef(
      "q12_merge_upsert",
      (spark, dir) => {
        val base = Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val target = base.filter(col("c_custkey") % 2 === 0)
        val source = base.filter(col("c_custkey") % 3 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + lit(100.0))
        Relational.mergeUpsert(target, source, Seq("c_custkey"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
             |CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
             |CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal
             |FROM (SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
             |      FROM customer WHERE c_custkey % 3 = 0) s
             |FULL OUTER JOIN
             |     (SELECT c_custkey, c_name, c_acctbal
             |      FROM customer WHERE c_custkey % 2 = 0) t
             |ON s.c_custkey = t.c_custkey
             |ORDER BY c_custkey""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // Skew-salted join: the explicit fallback for hot keys AQE can't
    // split. The salted plan spreads each key over `factor` reducers
    // (left side salted by row hash, right side replicated factor×); the
    // oracle is the PLAIN join — salting must be result-invisible.
    QueryDef(
      "q52_skew_salted_join",
      (spark, dir) => {
        val ev = Tables.events(spark, dir)
        val userTier = ev.select(col("user_id")).distinct()
          .withColumn("tier", pmod(col("user_id"), lit(5)))
        graft.operators.Skew
          .saltedJoin(ev, userTier, Seq("user_id"), factor = 8)
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("tier"))
      },
      Some("""WITH tiers AS (SELECT DISTINCT user_id, user_id % 5 AS tier FROM events)
             |SELECT tier, COUNT(*) AS n_events, COUNT(DISTINCT e.user_id) AS n_users
             |FROM events e JOIN tiers t ON e.user_id = t.user_id
             |GROUP BY tier ORDER BY tier""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // Array-aggregation: collect_set → sort_array → array_join keeps the
    // output a flat STRING (the driver's comparer cannot sort raw array
    // columns), with deterministic element order.
    QueryDef(
      "q53_collect_set",
      (spark, dir) =>
        Tables.events(spark, dir)
          .groupBy(col("user_id"))
          .agg(
            array_join(sort_array(collect_set(col("event_type"))), ",")
              .as("event_types"),
            count(lit(1)).as("n_events"))
          .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
             |COUNT(*) AS n_events
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // Bucketed CO-LOCATED join under the gate: both sides written
    // bucketed+sorted on the join key (one shuffle each at WRITE time),
    // then the merge-hinted join runs with NO exchange on either side —
    // the 100 TB shape where the staging table is bucketed on its PK so
    // every subsequent key join/merge skips the fact-table shuffle.
    // (BucketingSpec asserts the zero-exchange property directly.)
    QueryDef(
      "q62_bucketed_join",
      (spark, dir) => {
        val o = Tables.orders(spark, dir)
          .select(col("o_custkey").as("custkey"), col("o_totalprice"))
        val c = Tables.customer(spark, dir)
          .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
        graft.sources.Sinks.bucketedTable(o, "graft_q62_orders", Seq("custkey"), 8)
        graft.sources.Sinks.bucketedTable(c, "graft_q62_customer", Seq("custkey"), 8)
        spark.table("graft_q62_orders").hint("merge")
          .join(spark.table("graft_q62_customer"), Seq("custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            graft.operators.Aggregations.dsum(col("o_totalprice"), 18, 2)
              .as("total_price"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    ),
  )
}
