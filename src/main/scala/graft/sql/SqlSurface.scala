package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, TextAnalysis}

/** The engine's capabilities as a SQL surface.
  *
  * The reference exposes its pipelines to analysts as SQL over staging
  * tables (the DDL under sql/staging; the marts in sql/marts are plain
  * SELECTs) —
  * here the equivalent posture is: register the staging tables AND the
  * flagship operator outputs as temp views, inject the scalar/aggregate
  * functions ([[graft.GraftExtensions]]: hmac_sha256, jaro_winkler,
  * dot_product, simhash64, minhash_signature, misra_gries), and every
  * curation/dedup/text pipeline becomes composable `spark.sql` — no
  * Scala API in sight.
  *
  * Views are LAZY DataFrames: registering costs nothing; a SQL query
  * over `near_dup_pairs` plans the same inverted-index join the Scala
  * call sites get, with Catalyst free to push filters/prune columns into
  * it. At cluster scale the same registrations would be `CREATE VIEW`
  * over the catalog — nothing else changes.
  */
object SqlSurface {

  /** Register every staging table under its bare name (`events` through
    * the normalizing accessor — same view of the data the operators get).
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    Tables.All.foreach {
      case "events" => Tables.events(spark, sfDir).createOrReplaceTempView("events")
      case t => Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /** Register the flagship operator outputs as views over the staging
    * tables (call after [[registerTables]]):
    *
    *  - `doc_quality`    — per-doc quality metrics (q29's operator)
    *  - `doc_lang`       — per-doc n-gram language ID (q28)
    *  - `doc_tokens`     — per-doc token counts (q30)
    *  - `near_dup_pairs` — exact 3-gram Jaccard ≥ 0.5 pairs (q22)
    *  - `dup_clusters`   — connected components + survivor flag (q36)
    *
    * Each is the SAME plan the Scala API produces — SQL over these views
    * composes with pushdown into the operator plans.
    */
  def registerCapabilities(spark: SparkSession, sfDir: String,
      n: Int = 3, jaccard: Double = 0.5): Unit = {
    val docs = Tables.documents(spark, sfDir)
    TextAnalysis.qualityMetrics(docs, "text")
      .createOrReplaceTempView("doc_quality")
    docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_id"))
      .createOrReplaceTempView("doc_lang")
    TextAnalysis.tokenCounts(docs, "text")
      .createOrReplaceTempView("doc_tokens")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", lit(1), n, jaccard)
    pairs.createOrReplaceTempView("near_dup_pairs")
    Dedup.duplicateClusters(docs.select(col("doc_id")), "doc_id",
        pairs.select(col("id_a"), col("id_b")))
      .createOrReplaceTempView("dup_clusters")
  }
}
