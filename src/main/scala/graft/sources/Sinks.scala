package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Staging sinks over partitioned parquet — the engine's substrate for the
  * reference's 6 SQL Server staging tables (SURVEY §2.6 L1–L8). A JDBC
  * deployment swaps `format("parquet").save(path)` for
  * `format("jdbc").option("dbtable", t)` — the mode semantics are identical;
  * [[jdbcAppend]]/[[jdbcTruncateInsert]]/[[jdbcReplace]] are that realized
  * path (round-tripped against embedded Derby in SinksAndSourcesSpec).
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

  // ------------------------------------------------------------- JDBC path

  /** Core JDBC writer (database.py:212-247's executemany loop, realized as
    * Spark's JDBC sink): O5 write batching maps to the `batchsize` option
    * (the reference inserts in 1000-row chunks — same default), and each
    * Spark partition opens one connection, so write parallelism is the
    * frame's partitioning — `df.repartition(n)` IS the connection-pool
    * size. Numeric/decimal/timestamp types map per the target's dialect.
    */
  def jdbcWrite(df: DataFrame, url: String, table: String, mode: SaveMode,
      batchSize: Int = 1000, truncate: Boolean = false,
      options: Map[String, String] = Map.empty): Unit = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    df.write.mode(mode).format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .option("truncate", truncate.toString)
      .options(options)
      .save()
  }

  /** L1 append over JDBC — INSERT without touching existing rows; creates
    * the table on first load (the reference's create-if-missing DDL
    * bootstrap, database.py:122-154).
    */
  def jdbcAppend(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000): Unit =
    jdbcWrite(df, url, table, SaveMode.Append, batchSize)

  /** L2 truncate-insert over JDBC — TRUNCATE TABLE then INSERT, preserving
    * the table's DDL (indexes, grants), exactly the reference's
    * truncate-before-load contract (tiktok_shop_staging_loader.py:93-101).
    */
  def jdbcTruncateInsert(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000): Unit =
    jdbcWrite(df, url, table, SaveMode.Overwrite, batchSize, truncate = true)

  /** L3 replace over JDBC — DROP + CREATE + INSERT: the schema-resetting
    * variant (new frame schema wins; any DDL on the old table is gone).
    */
  def jdbcReplace(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000): Unit =
    jdbcWrite(df, url, table, SaveMode.Overwrite, batchSize, truncate = false)

  /** JDBC read-back (parallelized reads would add partitionColumn/bounds). */
  def jdbcTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  // ----------------------------------------------------------- parquet path

  /** Crash recovery for the backup-ordered swap: a crash between the two
    * renames leaves the table at `path.old` and nothing at `path` — every
    * entry point probes through here so the backup is restored before any
    * decision (like truncateInsert-on-missing) can destroy it.
    */
  private def recoverSwap(spark: SparkSession, path: String): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val hOld = new org.apache.hadoop.fs.Path(path + ".old")
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath) && fs.exists(hOld)) {
      require(fs.rename(hOld, hPath), s"swap recovery: rename $hOld -> $path failed")
    }
  }

  private[graft] def targetExists(spark: SparkSession, path: String): Boolean = {
    recoverSwap(spark, path)
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
    // localCheckpoint, not cache: the anti-join must fully resolve before
    // the append mutates the directory it reads from. Cached blocks lost
    // mid-append would RECOMPUTE through the half-written target (silent
    // row loss); a checkpoint severs lineage so block loss fails loudly
    // instead.
    val materialized = fresh.localCheckpoint(true)
    val n = materialized.count()
    if (n > 0) append(materialized, path, partitionBy)
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
    val target = requireSameColumns(spark.read.parquet(path), source, path)
    val merged = Relational.mergeUpsert(
      target.select(source.columns.map(col).toIndexedSeq: _*), source, keys)
    val tmp = path + ".tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    swapInto(spark, tmp, path)
  }

  /** MERGE schema contract: target and source must carry the SAME column
    * set. Projecting the target to `source.columns` would otherwise
    * silently drop target-only columns from the rewritten table (and, in
    * the partition-scoped variant, leave touched and untouched partitions
    * with divergent schemas) — fail loudly on drift instead.
    */
  private def requireSameColumns(target: DataFrame, source: DataFrame,
      path: String): DataFrame = {
    val t = target.columns.toSet
    val s = source.columns.toSet
    require(t == s,
      s"mergeUpsert($path): target/source schema drift — " +
        s"target-only=${(t -- s).toSeq.sorted.mkString(",")} " +
        s"source-only=${(s -- t).toSeq.sorted.mkString(",")}")
    target
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
    recoverSwap(spark, path) // never clobber a backup that is the only copy
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
      buckets: Int): Unit = {
    // Default-database simple names only: the orphan-location cleanup
    // below assumes the <warehouse>/<table> managed layout.
    require(!table.contains("."),
      s"bucketedTable takes a simple (default-database) table name, got '$table'")
    val spark = df.sparkSession
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val fs = new org.apache.hadoop.fs.Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dropWithLocation(name: String): Unit = {
      // A managed-table location can survive from a PREVIOUS session
      // whose in-memory catalog is gone (the catalog entry dies with the
      // session, the warehouse directory does not) — creating the "new"
      // table would then fail with LOCATION_ALREADY_EXISTS.
      spark.sql(s"DROP TABLE IF EXISTS `$name`")
      val loc = new org.apache.hadoop.fs.Path(warehouse, name.toLowerCase)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    // Write-then-swap, mirroring swapInto's discipline: the NEW data
    // lands fully in a temp table while the old table stays intact and
    // readable (a self-referential rebuild — bucketedTable(table ∪ batch,
    // table, ...) — reads the old files untouched). Only after a
    // successful write does the old table drop; a crash between drop and
    // rename leaves the data recoverable under the __tmp name.
    val tmp = table + "__tmp"
    dropWithLocation(tmp)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(tmp)
    dropWithLocation(table)
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
  }

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
    val affected = source.select(partitionCol).distinct().collect().map(_.get(0))
    val nonNull = affected.filter(_ != null).toSeq
    // Null partition values must be read too — isInCollection never
    // matches null, which would silently drop the target's null partition.
    val partFilter =
      if (affected.contains(null))
        col(partitionCol).isInCollection(nonNull) || col(partitionCol).isNull
      else col(partitionCol).isInCollection(nonNull)
    val target = requireSameColumns(spark.read.parquet(path), source, path)
      .filter(partFilter)
      .select(source.columns.map(col).toIndexedSeq: _*)
    val merged = Relational.mergeUpsert(target, source, keys)
    // Materialize the merge ONCE into a partitioned tmp dir BEFORE any
    // swap mutates `path`: executing the lazy plan per-partition inside
    // the loop would re-scan target files earlier iterations already
    // renamed. Spark's writer also Hive-escapes partition directory names
    // (and emits __HIVE_DEFAULT_PARTITION__ for null), so swapping by the
    // EMITTED directory names is correct for any partition value.
    val tmpRoot = path + ".merge-tmp"
    merged.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol).parquet(tmpRoot)
    val hTmpRoot = new org.apache.hadoop.fs.Path(tmpRoot)
    val fs = hTmpRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(hTmpRoot).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol=")).foreach { s =>
      swapInto(spark, s.getPath.toString, s"$path/${s.getPath.getName}")
    }
    fs.delete(hTmpRoot, true)
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
    // Metadata-only count: a bare count() over parquet reads row-group
    // footers, not data pages.
    spark.read.parquet(path).count()
  }

  /** Small-file compaction (the OPTIMIZE half of table maintenance; the
    * other half — clustering — is ZOrder.writeZOrdered). Incremental
    * appends leave a table with per-batch file counts; at 100 TB the
    * resulting listing + footer overhead dominates small scans. This
    * rewrites each leaf directory into ceil(total_bytes/targetFileBytes)
    * files via `coalesce` — a NARROW merge of input splits, no shuffle,
    * no re-sort (it preserves whatever clustering the files already
    * have) — then swaps atomically through the same crash-safe rename as
    * the other sinks. No-op (returns unchanged counts) when already at
    * or under the target file count.
    *
    * Hive-partitioned tables (`k=v` subdirectories — the load-date
    * layout this module defaults to) are compacted PER PARTITION:
    * partition pruning and the directory-derived partition column are
    * preserved because each leaf rewrite stays inside its own
    * directory. At scale, partitions compact independently — run this
    * only over partitions the last ingest touched.
    *
    * Returns (filesBefore, filesAfter) summed over leaves.
    */
  def compactFiles(spark: SparkSession, path: String,
      targetFileBytes: Long): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    recoverSwap(spark, path)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partitions = fs.listStatus(hPath)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    if (partitions.nonEmpty) {
      val results = partitions.map(p =>
        compactFlatDir(spark, fs, p.getPath.toString, targetFileBytes))
      (results.map(_._1).sum, results.map(_._2).sum)
    } else compactFlatDir(spark, fs, path, targetFileBytes)
  }

  private def compactFlatDir(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, dir: String,
      targetFileBytes: Long): (Int, Int) = {
    val hDir = new org.apache.hadoop.fs.Path(dir)
    val dataFiles = fs.listStatus(hDir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    if (dataFiles.length <= nOut) return (dataFiles.length, dataFiles.length)
    val tmp = dir + ".tmp"
    // Read the leaf's files directly (not the table root): the partition
    // column lives in the directory name, not the files, so a same-leaf
    // rewrite preserves it.
    spark.read.parquet(dataFiles.map(_.getPath.toString).toIndexedSeq: _*)
      .coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    swapInto(spark, tmp, dir)
    val after = fs.listStatus(hDir)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (dataFiles.length, after)
  }
}
