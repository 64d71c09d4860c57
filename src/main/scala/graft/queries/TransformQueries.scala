package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{SafeCasts, Tables}
import graft.operators.EtlMeta

/** Scalar-transform capability queries (SURVEY §2.2: T5–T10, T14, T15). */
object TransformQueries {

  val defs: Seq[QueryDef] = Seq(

    // ----------------------------------------------------------------
    // T6/T7 null-safe casts + T14 JSON access: pull a field out of the
    // events.props JSON string and try_cast it; try_cast garbage → null,
    // never error (the reference's _safe_float/_safe_int contract).
    QueryDef(
      "q05_safe_cast",
      (spark, dir) =>
        Tables.events(spark, dir).select(
          col("event_id"),
          SafeCasts.safeLong(get_json_object(col("props"), "$.k")).as("k_val"),
          SafeCasts.safeDouble(col("event_type")).as("etype_as_num"),
          col("value"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
             |TRY_CAST(event_type AS DOUBLE) AS etype_as_num,
             |value
             |FROM events ORDER BY event_id""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // T9 NVARCHAR(n) length clamp (tiktok_shop_staging_loader.py:276-288).
    QueryDef(
      "q06_string_clamp",
      (spark, dir) =>
        SafeCasts.clampStrings(
            Tables.documents(spark, dir).select(col("doc_id"), col("text")),
            Map("text" -> 40))
          .withColumn("clamped_len", length(col("text")).cast(LongType))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, substr(text, 1, 40) AS text,
             |length(substr(text, 1, 40)) AS clamped_len
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // T5 ETL lineage stamping, deterministic variant (batch-constant id;
    // tiktok_shop_transformer.py:169-177).
    QueryDef(
      "q07_etl_stamp",
      (spark, dir) =>
        EtlMeta.stampDeterministic(
            Tables.nation(spark, dir), batchId = "r1-batch-001", source = "graft")
          .orderBy(col("n_nationkey")),
      Some("""SELECT n_nationkey, n_name, n_regionkey,
             |'r1-batch-001' AS etl_batch_id, 'graft' AS etl_source
             |FROM nation ORDER BY n_nationkey""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // T15 column-intersection projection (misa_crm_loader.py:159-175):
    // the target schema asks for a column the frame doesn't have — it is
    // skipped, not an error.
    QueryDef(
      "q08_column_intersect",
      (spark, dir) =>
        SafeCasts.intersectColumns(
            Tables.customer(spark, dir),
            target = Seq("c_custkey", "c_name", "c_acctbal", "c_phone_not_present"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // S11 request signing as a Catalyst expression (auth.py:32-65): hex
    // HMAC-SHA256 over a per-row request path. DuckDB has no HMAC, so the
    // oracle is a partial one: the expected digests were precomputed with
    // an INDEPENDENT implementation (Python stdlib hmac/hashlib) over the
    // same nation rows and pinned as a VALUES fixture joined to the live
    // table — nation is the fixed 25-row TPC-H dimension at every SF, so
    // the fixture is scale-independent. The ScalaTest suite additionally
    // pins the RFC 4231 test vectors.
    QueryDef(
      "q34_hmac_sign",
      (spark, dir) =>
        Tables.nation(spark, dir).select(
          col("n_nationkey"),
          graft.functions.HmacSha256.hmac_sha256(
            lit("graft-secret"),
            concat(lit("/api/orders/search?nation="), col("n_name"))).as("signature"))
          .orderBy(col("n_nationkey")),
      Some("""SELECT n.n_nationkey, f.signature
             |FROM nation n JOIN (VALUES
             |(0, '4db59882357dfe3689aa6617270cbcae79dda1df2c0034beba2c91fbaa98cdca'),
             |(1, '2d4b8204233f3f31a245ff48a66ba8874e4636c192a91556cb774186cc6b419b'),
             |(2, 'c417fb323804afeb2b6719df2971129db29e1b65cda7687a665b003aba228430'),
             |(3, '409f9577094dff952b39062c4fb35a0b65813f706dd200435a6187fffb6a727f'),
             |(4, '6323e138a71e024aacb470e2b3aac4c313229969e0a7961aebc7cadbc6dd8e98'),
             |(5, '91ea85dfc314f6f9fc6e2d5147b01fb918534cb1a8fcd85816ba2910b8b29e76'),
             |(6, 'e0d6eef6e570dedcfa3caf5fa6f16d539ea32abe5d2d894b2113be48c8f6d1d4'),
             |(7, 'f387b5fdeea8ee139d551df2741bfdcb1656d63fd207b7f334053bc74a28e1b5'),
             |(8, 'a28215d6f67a9adfa258f461871842d118cc46ddda85add25728566959a9cf53'),
             |(9, '269f759ba4ee3c14a1caf5f38da0a1f8aec2211f68b7413676df14cd633118ba'),
             |(10, 'c18b3b32222281033da094dabe8137c050d897a9155379227a6c20c1282773c2'),
             |(11, 'd5411d881d70cdfb11e6972ddf19b21427cc4e0aa15dc5f9808dffea52c7edb0'),
             |(12, '9fcee364179a087c1ec561efed537c39dbec112b8525584239060d23d0c4abb6'),
             |(13, '8665ec31a771a652c895cdaf5f9d52141e8ef740e254019644b061bf622ae499'),
             |(14, '0354d33df360d36cd05ebcc0e8c42d44357ff69ab7dcef50ebdb8b16537181f4'),
             |(15, '7ad64b72865828efb6685526bebbbacf1ed78720077ef3acfd9a278d2164701b'),
             |(16, '174f64d70481b118fcca8a56517f7de8feb5682cd4b2832e95877260fc47d2ef'),
             |(17, 'dd9981f0010d06c5430c6562ea423dc57a78a48ff11a5ec0e1c8d3490f7f32f8'),
             |(18, '4d792ef2463a432887f43365cb492858684b8930ca886bb1844d4af45ec9b4cc'),
             |(19, '10c993ca4cfc8dbbe8ddec47e893439db061ee008e1324d1b9ff44731617a49a'),
             |(20, '973483761c36dbf63e86f8026130f87b21adbf6d927273e91a4410705c9107cb'),
             |(21, 'cce9964cbd90275751fa5c661802a8f0746125282fbe18e1542cf9e549f143f1'),
             |(22, '1c509c74bef06d9afb8e3ab25495b824a187c9832cbb409c95bdcdabca42f2ea'),
             |(23, '499c804aa7c43c7267fe53783786154e8160c7e3a7dbd7820752febc550a8d4c'),
             |(24, 'a163edd5a6562769e32ad987993611164e0447493328dc7ff063728158909096')
             |) AS f(n_nationkey, signature) ON n.n_nationkey = f.n_nationkey
             |ORDER BY n.n_nationkey""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // Regex extraction + conditional classification: pull the leading
    // adjective out of p_name, bucket by it. Spark regexp_extract and
    // DuckDB regexp_extract agree on group semantics and both return ''
    // on no-match; the decimal-routed avg keeps the money column exact.
    QueryDef(
      "q57_regex_extract",
      (spark, dir) =>
        Tables.part(spark, dir)
          .select(
            regexp_extract(col("p_name"), "^([a-z]+) ", 1).as("adjective"),
            col("p_retailprice"))
          .groupBy(col("adjective"))
          .agg(count(lit(1)).as("n_parts"),
            (graft.operators.Aggregations.dsum(col("p_retailprice"), 18, 2)
              / count(lit(1))).as("avg_price"))
          .orderBy(col("adjective")),
      Some("""SELECT regexp_extract(p_name, '^([a-z]+) ', 1) AS adjective,
             |COUNT(*) AS n_parts,
             |CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
             |FROM part GROUP BY adjective ORDER BY adjective""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // JSON round-trip (S9 parity under the gate): build the JSON string
    // by CONCAT of integer/string fields — identical bytes in both
    // engines (double rendering differs between engines, so no doubles
    // in the payload) — then parse fields back out and aggregate on
    // them. Spark get_json_object ≡ DuckDB json_extract_string (both
    // return NULL for missing paths, string values unquoted).
    QueryDef(
      "q61_json_parse",
      (spark, dir) => {
        val js = concat(lit("""{"u":"""), col("user_id"),
          lit(""","t":""""), col("event_type"), lit(""""}"""))
        Tables.events(spark, dir)
          .select(js.as("js"))
          .select(
            get_json_object(col("js"), "$.t").as("parsed_type"),
            get_json_object(col("js"), "$.u").cast("long").as("parsed_user"),
            get_json_object(col("js"), "$.missing").as("absent"))
          .groupBy(col("parsed_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("parsed_user")).as("n_users"),
            count(col("absent")).as("n_absent"))
          .orderBy(col("parsed_type"))
      },
      Some("""WITH j AS (SELECT '{"u":' || user_id || ',"t":"' || event_type || '"}' AS js FROM events),
             |p AS (SELECT json_extract_string(js, '$.t') AS parsed_type,
             |    CAST(json_extract_string(js, '$.u') AS BIGINT) AS parsed_user,
             |    json_extract_string(js, '$.missing') AS absent
             |  FROM j)
             |SELECT parsed_type, COUNT(*) AS n,
             |COUNT(DISTINCT parsed_user) AS n_users, COUNT(absent) AS n_absent
             |FROM p GROUP BY parsed_type ORDER BY parsed_type""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // Schema evolution: union an "old-schema" batch (no priority column)
    // with a "new-schema" batch (extra column) via
    // unionByName(allowMissingColumns) — absent columns NULL-fill, and
    // the aggregation below must treat the filled NULLs first-class.
    // This is the staging-evolution shape (a feed adds a column
    // mid-history) without any manual column plumbing.
    QueryDef(
      "q63_schema_evolution",
      (spark, dir) => {
        val o = Tables.orders(spark, dir)
        val oldBatch = o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"))
        val newBatch = o.filter(col("o_orderkey") % 2 =!= 0)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
        oldBatch.unionByName(newBatch, allowMissingColumns = true)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("o_orderpriority")).as("n_with_priority"),
            countDistinct(col("o_orderpriority")).as("n_priorities"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH u AS (
             |  SELECT o_orderkey, o_orderstatus, NULL AS o_orderpriority
             |    FROM orders WHERE o_orderkey % 2 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_orderstatus, o_orderpriority
             |    FROM orders WHERE o_orderkey % 2 <> 0)
             |SELECT o_orderstatus, COUNT(*) AS n_rows,
             |COUNT(o_orderpriority) AS n_with_priority,
             |COUNT(DISTINCT o_orderpriority) AS n_priorities
             |FROM u GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
    ),
  )
}
