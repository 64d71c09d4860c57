package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.SafeCasts

/** The reference's flagship transform — TikTok Shop order flatten
  * (tiktok_shop_transformer.py:22-195, SURVEY §2.2 T1–T6, T14): nested order
  * documents → one row per (order, line_item), ~55 flat columns per
  * create_tiktok_shop_orders_table.sql:15-83.
  *
  * One narrow Spark stage: scan → explode_outer → project/cast → stamp.
  * Money strings cast through DECIMAL(18,4) (the DDL contract), epoch
  * seconds stay BIGINT (the reference defers conversion,
  * tiktok_shop_staging_loader.py:266-273), sales_attributes re-serialize
  * to a JSON string (T14).
  */
object TikTokFlatten {

  /** Input document schema per the API sample
    * (docs/Tai_lieu_tham_khao_moi_nhat_tu_Tiktok.txt:2460-2600 via
    * FIXTURES.md §1). Money fields arrive as STRINGS — cast on projection.
    */
  val inputSchema: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("order_status", StringType),
    StructField("buyer_message", StringType),
    StructField("cancel_reason", StringType),
    StructField("cancel_user", StringType),
    StructField("collection_time", LongType),
    StructField("create_time", LongType),
    StructField("update_time", LongType),
    StructField("delivery_due_time", LongType),
    StructField("delivery_time", LongType),
    StructField("fulfillment_type", StringType),
    StructField("order_line_type", StringType),
    StructField("payment_method", StringType),
    StructField("payment_method_name", StringType),
    StructField("remark", StringType),
    StructField("request_cancel_reason", StringType),
    StructField("split_or_combine_tag", StringType),
    StructField("warehouse_id", StringType),
    StructField("order_amount", StructType(Seq(
      StructField("currency", StringType),
      StructField("original_shipping_fee", StringType),
      StructField("original_total_product_price", StringType),
      StructField("seller_discount", StringType),
      StructField("shipping_fee", StringType),
      StructField("shipping_fee_platform_discount", StringType),
      StructField("shipping_fee_seller_discount", StringType),
      StructField("subtotal_after_seller_discounts", StringType),
      StructField("tax_amount", StringType),
      StructField("total_amount", StringType)))),
    StructField("recipient_address", StructType(Seq(
      StructField("detail", StringType),
      StructField("region_code", StringType),
      StructField("state", StringType),
      StructField("city", StringType),
      StructField("town", StringType),
      StructField("district", StringType),
      StructField("zipcode", StringType),
      StructField("name", StringType),
      StructField("phone", StringType),
      StructField("phone_number", StringType)))),
    StructField("line_items", ArrayType(StructType(Seq(
      StructField("product_id", StringType),
      StructField("product_name", StringType),
      StructField("sku_id", StringType),
      StructField("sku_info", StructType(Seq(
        StructField("sku_image", StringType),
        StructField("sku_name", StringType),
        StructField("sales_attributes", ArrayType(StructType(Seq(
          StructField("name", StringType),
          StructField("value", StringType)))))))),
      StructField("quantity", StringType),
      StructField("unit_price", StringType),
      StructField("currency", StringType),
      StructField("is_gift", BooleanType),
      StructField("platform_discount", StringType),
      StructField("seller_discount", StringType)))))))

  /** DDL max lengths for the 7 clamped string columns
    * (tiktok_shop_staging_loader.py:276-288).
    */
  val stringMaxLens: Map[String, Int] = Map(
    "order_id" -> 50, "order_status" -> 50, "buyer_message" -> 500,
    "item_name" -> 500, "item_sku_name" -> 500,
    "recipient_name" -> 200, "recipient_address_detail" -> 500)

  /** Parse raw JSON order documents (the S9 XCom/JSON-blob handoff shape). */
  def parseOrders(spark: SparkSession, jsonDocs: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.schema(inputSchema).json(spark.createDataset(jsonDocs))
  }

  /** The full flatten: one row per line item, zero-item orders keep one
    * all-null-item row. Null-order_id rows are REJECTED here (the
    * reference's pre-load validation, tiktok_shop_staging_loader.py:226-230).
    */
  def flatten(orders: DataFrame, batch: EtlMeta.Batch): DataFrame = {
    val money = (c: org.apache.spark.sql.Column) => SafeCasts.safeMoney(c)
    val exploded = orders
      .filter(col("order_id").isNotNull)
      .select(col("*"), explode_outer(col("line_items")).as("item"))
    val projected = exploded.select(
      // 18 order scalars (T2)
      col("order_id"), col("order_status"), col("buyer_message"),
      col("cancel_reason"), col("cancel_user"), col("collection_time"),
      col("create_time"), col("update_time"), col("delivery_due_time"),
      col("delivery_time"), col("fulfillment_type"), col("order_line_type"),
      col("payment_method"), col("payment_method_name"), col("remark"),
      col("request_cancel_reason"), col("split_or_combine_tag"), col("warehouse_id"),
      // 10 order_amount money fields (T2, null-safe decimal casts)
      col("order_amount.currency").as("currency"),
      money(col("order_amount.original_shipping_fee")).as("original_shipping_fee"),
      money(col("order_amount.original_total_product_price")).as("original_total_product_price"),
      money(col("order_amount.seller_discount")).as("seller_discount"),
      money(col("order_amount.shipping_fee")).as("shipping_fee"),
      money(col("order_amount.shipping_fee_platform_discount")).as("shipping_fee_platform_discount"),
      money(col("order_amount.shipping_fee_seller_discount")).as("shipping_fee_seller_discount"),
      money(col("order_amount.subtotal_after_seller_discounts")).as("subtotal_after_seller_discounts"),
      money(col("order_amount.tax_amount")).as("tax_amount"),
      money(col("order_amount.total_amount")).as("total_amount"),
      // 10 recipient fields (T3)
      col("recipient_address.detail").as("recipient_address_detail"),
      col("recipient_address.region_code").as("recipient_region_code"),
      col("recipient_address.state").as("recipient_state"),
      col("recipient_address.city").as("recipient_city"),
      col("recipient_address.town").as("recipient_town"),
      col("recipient_address.district").as("recipient_district"),
      col("recipient_address.zipcode").as("recipient_zipcode"),
      col("recipient_address.name").as("recipient_name"),
      col("recipient_address.phone").as("recipient_phone"),
      col("recipient_address.phone_number").as("recipient_phone_number"),
      // 12 item fields (T4, null-safe numeric casts)
      col("item.product_id").as("item_id"),
      col("item.product_name").as("item_name"),
      col("item.sku_id").as("item_sku_id"),
      col("item.sku_info.sku_image").as("item_sku_image"),
      col("item.sku_info.sku_name").as("item_sku_name"),
      SafeCasts.safeLong(col("item.quantity")).as("item_quantity"),
      money(col("item.unit_price")).as("item_unit_price"),
      col("item.currency").as("item_currency"),
      col("item.is_gift").as("item_is_gift"),
      money(col("item.platform_discount")).as("item_platform_discount"),
      money(col("item.seller_discount")).as("item_seller_discount"),
      // nested attributes → JSON string (T14)
      to_json(col("item.sku_info.sales_attributes")).as("item_sku_sales_attributes"))
    EtlMeta.stamp(SafeCasts.clampStrings(projected, stringMaxLens), batch)
  }
}
