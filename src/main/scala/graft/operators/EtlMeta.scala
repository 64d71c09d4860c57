package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ETL lineage stamping — every staging row in the reference carries
  * `etl_batch_id, etl_created_at, etl_updated_at[, etl_source]`
  * (tiktok_shop_transformer.py:169-177; misa_crm_transformer.py:37-53).
  *
  * The batch id is batch-CONSTANT (uuid4 per transformer instance, not per
  * row), so it is a `lit`, not the nondeterministic `uuid()` expression —
  * this also keeps re-runs of a failed batch identifiable and the column
  * perfectly run-length-encodable in parquet at 100 TB.
  */
object EtlMeta {

  final case class Batch(batchId: String, source: String)

  def newBatch(source: String): Batch =
    Batch(java.util.UUID.randomUUID().toString, source)

  def stamp(df: DataFrame, batch: Batch): DataFrame =
    df.withColumn("etl_batch_id", lit(batch.batchId))
      .withColumn("etl_source", lit(batch.source))
      .withColumn("etl_created_at", current_timestamp())
      .withColumn("etl_updated_at", current_timestamp())

  /** Deterministic variant for oracle-checked queries and golden tests:
    * fixed batch id, no wall-clock columns.
    */
  def stampDeterministic(df: DataFrame, batchId: String, source: String): DataFrame =
    df.withColumn("etl_batch_id", lit(batchId))
      .withColumn("etl_source", lit(source))
}
