package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.functions.HmacSha256

/** SQL exposure (SURVEY §7.2 phase 6): register the table universe as temp
  * views + the engine's custom functions, so the full surface is queryable
  * with `spark.sql` — grouping sets / rollup / window functions fall out of
  * Spark SQL for free once views exist (SURVEY §2.4 note).
  */
object GraftSession {

  /** Register every test table as a temp view plus graft SQL functions. */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    Tables.All.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
    // events needs the ns→µs normalization — re-register over the adapter.
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    HmacSha256.register(spark)
  }

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(query)
  }
}
