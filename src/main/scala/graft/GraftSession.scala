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
    // events FIRST: its adapter sets the nanosAsLong conf that a plain
    // load of events.parquet needs — a fresh session would otherwise die
    // on PARQUET_TYPE_ILLEGAL in the generic loop below.
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    Tables.All.filterNot(_ == "events").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
    HmacSha256.register(spark)
  }

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(query)
  }
}
