package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Staging sinks over partitioned parquet — the engine's substrate for the
  * reference's 6 SQL Server staging tables (SURVEY §2.6 L1–L8). A JDBC
  * deployment swaps `format("parquet").save(path)` for
  * `format("jdbc").option("dbtable", t)` — the mode semantics are identical.
  *
  * Scale notes:
  *  - every writer takes `partitionBy` (load-date partitioning is the
  *    parquet analogue of the reference's ~25 date/key indexes): retention
  *    and incremental reads then prune partitions instead of scanning.
  *  - dedupAppend/mergeUpsert read the CURRENT target; at 100 TB the target
  *    must be key- or date-partitioned so the rewrite touches only affected
  *    partitions. The pure-transform halves live in operators.Relational
  *    and are partition-agnostic.
  */
object Sinks {

  /** L1 append (database.py:212-247). */
  def append(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** L2/L3 truncate-insert / replace (tiktok_shop_staging_loader.py:93-101):
    * on parquet both collapse to overwrite.
    */
  def truncateInsert(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  private[graft] def targetExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** L4 incremental append with PK dedup (tiktok_shop_staging_loader.py:
    * 128-153): in-batch dropDuplicates + anti-join against the target's
    * keys, then append. Returns rows actually appended.
    */
  def dedupAppend(spark: SparkSession, df: DataFrame, path: String,
      keys: Seq[String], partitionBy: Seq[String] = Nil): Long = {
    val fresh =
      if (targetExists(spark, path))
        Relational.dedupAppend(df, spark.read.parquet(path), keys)
      else df.dropDuplicates(keys)
    // The anti-join must resolve before the append starts mutating the
    // target directory it reads from.
    val materialized = fresh.cache()
    val n = materialized.count()
    if (n > 0) append(materialized, path, partitionBy)
    materialized.unpersist()
    n
  }

  /** L5 MERGE upsert (run_historical_backfill.py:86-183): set-based merge
    * then atomic-swap rewrite (write to `path.tmp`, swap directories) —
    * the plain-parquet realization of MERGE INTO; Delta would replace the
    * swap with a transactional commit.
    */
  def mergeUpsert(spark: SparkSession, source: DataFrame, path: String,
      keys: Seq[String]): Unit = {
    if (!targetExists(spark, path)) { truncateInsert(source, path); return }
    val merged = Relational.mergeUpsert(
      spark.read.parquet(path).select(source.columns.map(col).toIndexedSeq: _*),
      source, keys)
    val tmp = path + ".tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    swapInto(spark, tmp, path)
  }

  /** Backup-ordered directory swap: current → `.old`, `.tmp` → current,
    * then drop `.old`. Every rename result is CHECKED, and at no point is
    * the data unrecoverable: a crash between the renames leaves the full
    * previous table at `.old` (and the new one at `.tmp`) — unlike
    * delete-then-rename, which has a window where the only copy is gone.
    * Delta/Iceberg would replace this with a transactional commit; neither
    * is on this classpath.
    */
  private def swapInto(spark: SparkSession, tmp: String, path: String): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val hTmp = new org.apache.hadoop.fs.Path(tmp)
    val hOld = new org.apache.hadoop.fs.Path(path + ".old")
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(hOld, true)
    if (fs.exists(hPath)) {
      require(fs.rename(hPath, hOld), s"swap: rename $path -> $hOld failed")
    }
    require(fs.rename(hTmp, hPath), s"swap: rename $tmp -> $path failed")
    fs.delete(hOld, true)
  }

  /** Bucketed staging table: pre-shuffles once at write time on the join/
    * merge key so every subsequent key join or MERGE against this table is
    * CO-LOCATED — no Exchange on the bucketed side. This is the 100 TB
    * answer to "the L5 merge shuffles the whole target every cycle": the
    * target is bucketed on its PK, only the incoming batch shuffles.
    * (bucketBy requires the table catalog, hence saveAsTable.)
    */
  def bucketedTable(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Partition-scoped MERGE upsert — the SURVEY §7.4.4 answer to "the
    * full-outer rewrite must not touch 100 TB": the target is partitioned
    * on `partitionCol`; only partitions PRESENT IN THE SOURCE are read
    * (partition pruning), merged, and swapped — every other partition's
    * files are untouched. Requires the partition value to be derivable
    * from the row (true for load-date partitioning where the business key
    * embeds the date, or any stable row→partition mapping).
    */
  def mergeUpsertPartitioned(spark: SparkSession, source: DataFrame,
      path: String, keys: Seq[String], partitionCol: String): Unit = {
    if (!targetExists(spark, path)) {
      truncateInsert(source, path, partitionBy = Seq(partitionCol)); return
    }
    val affected = source.select(partitionCol).distinct()
      .collect().map(_.get(0))
    val target = spark.read.parquet(path)
      .filter(col(partitionCol).isInCollection(affected.toSeq))
      .select(source.columns.map(col).toIndexedSeq: _*)
    val merged = Relational.mergeUpsert(target, source, keys)
    affected.foreach { pv =>
      val partPath = s"$path/$partitionCol=$pv"
      val tmp = partPath + ".tmp"
      merged.filter(col(partitionCol) === pv).drop(partitionCol)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
      swapInto(spark, tmp, partPath)
    }
  }

  /** L7 retention delete (misa_crm_loader.py:384-427) as keep-filter
    * rewrite; on date-partitioned storage, drop whole partitions instead.
    */
  def retentionDelete(spark: SparkSession, path: String, tsCol: String,
      cutoff: Column): Long = {
    val kept = Relational.retain(spark.read.parquet(path), tsCol, cutoff)
    val tmp = path + ".tmp"
    kept.write.mode(SaveMode.Overwrite).parquet(tmp)
    swapInto(spark, tmp, path)
    spark.read.parquet(path).count()
  }
}
