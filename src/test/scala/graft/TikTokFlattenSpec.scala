package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.SchemaRegistry
import graft.operators.{EtlMeta, Flatten, TikTokFlatten}

/** Golden test for the flagship TikTok flatten per FIXTURES.md §1: cases
  * (a) N>1 items, (b) 1 item, (c) empty/missing line_items → null-item row,
  * (d) garbage numerics → null, (e) over-length strings → clamped,
  * (f) null order_id → rejected.
  */
class TikTokFlattenSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private val longName = "x" * 600

  private val docs = Seq(
    // (a) two items, full money fields, sales attributes
    s"""{"order_id":"o1","order_status":"UNPAID","create_time":1619611561,
       |"order_amount":{"currency":"VND","total_amount":"125000","tax_amount":"0"},
       |"recipient_address":{"name":"David Kong","city":"SJ","zipcode":"95110"},
       |"line_items":[
       |  {"product_id":"p1","product_name":"$longName","sku_id":"s1",
       |   "sku_info":{"sku_name":"Iphone","sales_attributes":[{"name":"Color","value":"Red"}]},
       |   "quantity":"1","unit_price":"0.01","is_gift":false},
       |  {"product_id":"p2","product_name":"small","sku_id":"s2",
       |   "quantity":"garbage","unit_price":""}
       |]}""".stripMargin.replace("\n", ""),
    // (b) one item
    """{"order_id":"o2","order_status":"PAID","create_time":1619611562,
      |"line_items":[{"product_id":"p3","sku_id":"s3","quantity":"2","unit_price":"5.50"}]}"""
      .stripMargin.replace("\n", ""),
    // (c) empty line_items
    """{"order_id":"o3","order_status":"CANCELLED","create_time":1619611563,"line_items":[]}""",
    // (c') missing line_items
    """{"order_id":"o4","order_status":"UNPAID","create_time":1619611564}""",
    // (f) null order_id → rejected
    """{"order_status":"UNPAID","create_time":1619611565}""",
  )

  lazy val flat = TikTokFlatten.flatten(
    TikTokFlatten.parseOrders(spark, docs),
    EtlMeta.Batch("test-batch", "tiktok_shop"))

  test("row grain: one per line item, null-item row for empty/missing, null-PK rejected") {
    assert(flat.count() === 5) // o1×2 + o2 + o3 + o4; null-order_id dropped
    val nullItems = flat.filter(col("item_id").isNull)
      .select("order_id").collect().map(_.getString(0)).sorted
    assert(nullItems === Array("o3", "o4"))
  }

  test("column contract: 18 order + 10 amount + 10 recipient + 12 item(incl attrs) + 4 etl") {
    assert(flat.columns.length === 54)
    assert(flat.columns.contains("total_amount"))
    assert(flat.columns.contains("recipient_zipcode"))
    assert(flat.columns.contains("item_sku_sales_attributes"))
    assert(flat.columns.count(_.startsWith("etl_")) === 4)
  }

  test("money strings cast to decimal; garbage numerics → null (d)") {
    val o1 = flat.filter(col("order_id") === "o1" && col("item_id") === "p1").head()
    assert(o1.getDecimal(o1.fieldIndex("total_amount")).toPlainString === "125000.0000")
    assert(o1.getDecimal(o1.fieldIndex("item_unit_price")).toPlainString === "0.0100")
    val p2 = flat.filter(col("item_id") === "p2").head()
    assert(p2.isNullAt(p2.fieldIndex("item_quantity"))) // "garbage"
    assert(p2.isNullAt(p2.fieldIndex("item_unit_price"))) // ""
  }

  test("epoch seconds stay BIGINT (deferred conversion)") {
    assert(flat.schema("create_time").dataType ===
      org.apache.spark.sql.types.LongType)
  }

  test("over-length strings clamped to DDL max (e)") {
    val p1 = flat.filter(col("item_id") === "p1").head()
    assert(p1.getString(p1.fieldIndex("item_name")).length === 500)
  }

  test("sales_attributes re-serialized as JSON string (T14)") {
    val p1 = flat.filter(col("item_id") === "p1").head()
    assert(p1.getString(p1.fieldIndex("item_sku_sales_attributes")) ===
      """[{"name":"Color","value":"Red"}]""")
  }

  test("etl metadata is batch-constant") {
    assert(flat.select("etl_batch_id").distinct().count() === 1)
    assert(flat.head().getString(flat.columns.indexOf("etl_source")) === "tiktok_shop")
  }
}

/** MISA sale-order prefix-flatten + registry normalization (T11-T13). */
class MisaTransformSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private val saleOrders = Seq(
    """{"id":98765,"sale_order_no":"SO-1","sale_order_amount":"12500000",
      |"sale_order_date":"2025-08-01T03:15:00Z","is_use_currency":false,
      |"sale_order_product_mappings":[
      |  {"id":111,"product_code":"SP001","price":"250000","amount":"10","mass":"0.5"},
      |  {"id":112,"product_code":"SP002","price":"not-a-number","amount":"2"}]}"""
      .stripMargin.replace("\n", ""),
    """{"id":98766,"sale_order_no":"SO-2","sale_order_amount":"99",
      |"sale_order_date":"bad date","sale_order_product_mappings":[]}"""
      .stripMargin.replace("\n", ""),
  )

  test("prefix-flatten + castColumns spec: order_/item_ columns, coerced types, invariants") {
    import spark.implicits._
    val raw = spark.read.json(spark.createDataset(saleOrders))
    val flat = Flatten.prefixFlatten(raw, "sale_order_product_mappings")
    val normalized = SchemaRegistry.normalize(flat, SchemaRegistry.misaSaleOrders)

    assert(normalized.count() === 3) // 2 items + 1 zero-item row
    assert(normalized.columns.contains("order_sale_order_no"))
    assert(normalized.columns.contains("item_product_code"))
    assert(normalized.schema("order_sale_order_amount").dataType ===
      org.apache.spark.sql.types.DoubleType)
    assert(normalized.schema("order_sale_order_date").dataType ===
      org.apache.spark.sql.types.TimestampType)

    val rows = normalized.orderBy(col("order_id"), col("item_id")).collect()
    val i112 = rows.find(r => !r.isNullAt(r.fieldIndex("item_id")) &&
      r.getLong(r.fieldIndex("item_id")) === 112L).get
    assert(i112.isNullAt(i112.fieldIndex("item_price"))) // 'not-a-number' → null
    val o2 = rows.find(r => r.getLong(r.fieldIndex("order_id")) === 98766L).get
    assert(o2.isNullAt(o2.fieldIndex("order_sale_order_date"))) // 'bad date' → null
    assert(o2.getInt(o2.fieldIndex("total_items_in_order")) === 0)
  }
}
