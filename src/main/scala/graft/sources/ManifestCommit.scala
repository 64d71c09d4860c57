package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table transactional commit for multi-sink cycles.
  *
  * The reference wraps each staging MERGE in a SQL Server transaction
  * (run_historical_backfill.py:86-183), so a crashed cycle never leaves
  * SOME tables advanced and others stale. The per-table parquet sinks in
  * [[Sinks]] are each atomic via backup-ordered renames, but a cycle
  * writing six tables had no cross-table atomicity. Delta/Iceberg would
  * provide it; neither is on the classpath, so this is the minimal
  * honest equivalent of their core idea — an atomically published
  * manifest pointer over immutable data:
  *
  *  - Data is only ever ADDED, as immutable delta directories under
  *    `root/<table>/.graft-delta-<uuid>` (dot-prefixed: invisible to any
  *    reader that lists the table path directly — uncommitted data can
  *    never leak into a scan).
  *  - A manifest (`root/_graft_manifest/manifest-v<N>.json`, JSON-lines
  *    `{"table":..,"delta":..}`) names every delta dir of every table at
  *    version N. Manifest files are immutable once visible.
  *  - COMMIT is one atomic filesystem rename of the fully-written
  *    manifest from a hidden temp name to `manifest-v<N+1>.json`.
  *    Readers resolve MAX(version) — so a crash anywhere before that
  *    rename leaves version N intact and every staged delta of the torn
  *    cycle unreferenced and invisible; no recovery step is ever needed
  *    on the read path.
  *
  * Scale: the manifest carries directory NAMES, not file lists — O(tables
  * × cycles) strings, trivially driver-sized for years of 10-minute
  * cycles; [[compactTable]] folds a table's delta list back to one
  * directory (itself a transactional commit) long before that matters.
  * Readers pass the delta list to one multi-path parquet scan, so a
  * table read stays a single distributed scan regardless of delta count.
  *
  * Concurrency contract: ONE writer at a time (the reference's cycles
  * are strictly serialized by the orchestrator). A racing second
  * committer loses the `rename` (atomic create-if-absent on HDFS-like
  * stores) and fails loudly rather than clobbering. [[vacuum]] deletes
  * unreferenced deltas and must only run while no cycle is staging.
  */
object ManifestCommit {

  final case class Manifest(version: Long, tables: Map[String, Seq[String]])

  private val ManifestDir = "_graft_manifest"
  private val ManifestName = raw"manifest-v(\d{12})\.json".r

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, version: Long): Path =
    new Path(s"$root/$ManifestDir/" + f"manifest-v$version%012d.json")

  /** Every committed version number, ascending (empty for a virgin root). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(s"$root/$ManifestDir")
    val hfs = fs(spark, root)
    if (!hfs.exists(dir)) return Nil
    hfs.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case ManifestName(v) => Some(v.toLong)
      case _ => None
    }).sorted
  }

  private def readManifest(hfs: FileSystem, root: String, v: Long): Manifest = {
    val in = hfs.open(manifestPath(root, v))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    // JSON-lines, builder-written (see publish): one {"table","delta"}
    // object per line. Parsed with the same minimal discipline it is
    // written with — no library dependency, no ambiguity (both fields
    // are UUID/identifier strings with no escapes).
    val entries = body.linesIterator.filter(_.nonEmpty).map { line =>
      val kv = raw""""table":"([^"]*)","delta":"([^"]*)"""".r
      kv.findFirstMatchIn(line) match {
        case Some(m) => (m.group(1), m.group(2))
        case None => throw new IllegalStateException(
          s"corrupt manifest line in v$v: $line")
      }
    }.toSeq
    Manifest(v, entries.groupBy(_._1).map { case (t, es) => t -> es.map(_._2) })
  }

  /** Latest committed manifest, or None for a virgin root. */
  def currentManifest(spark: SparkSession, root: String): Option[Manifest] =
    versions(spark, root).lastOption
      .map(readManifest(fs(spark, root), root, _))

  /** The manifest AT a specific committed version — time travel. Every
    * manifest file is immutable once visible, so any version that
    * [[vacuum]] has not yet reclaimed reads exactly as it committed
    * (vacuum keeps only the current one; retention is the operator's
    * policy knob, as in any snapshot store).
    */
  def manifestAt(spark: SparkSession, root: String,
      version: Long): Option[Manifest] = {
    val hfs = fs(spark, root)
    if (hfs.exists(manifestPath(root, version)))
      Some(readManifest(hfs, root, version))
    else None
  }

  private def tableFrom(spark: SparkSession, root: String,
      m: Manifest, table: String): Option[DataFrame] =
    m.tables.get(table).filter(_.nonEmpty)
      .map(deltas => spark.read.parquet(deltas.map(d => s"$root/$d"): _*))

  /** The committed view of `table`: one multi-path parquet scan over its
    * delta directories. None when the table has no committed data.
    */
  def readTable(spark: SparkSession, root: String,
      table: String): Option[DataFrame] =
    currentManifest(spark, root).flatMap(tableFrom(spark, root, _, table))

  /** [[readTable]] as of a historical version (time travel): the exact
    * table state readers saw when `version` was current.
    */
  def readTableAt(spark: SparkSession, root: String, table: String,
      version: Long): Option[DataFrame] =
    manifestAt(spark, root, version).flatMap(tableFrom(spark, root, _, table))

  /** Write `df` as a new IMMUTABLE delta directory for `table`; returns
    * the root-relative delta path to hand to [[commit]]. Invisible to
    * every reader until a manifest referencing it is committed.
    */
  def stageDelta(spark: SparkSession, df: DataFrame, root: String,
      table: String): String = {
    val rel = s"$table/.graft-delta-${java.util.UUID.randomUUID()}"
    df.write.mode("error").parquet(s"$root/$rel")
    rel
  }

  /** Write version `version`'s manifest to a hidden temp file and
    * atomically rename it into place — THE commit point. rename is
    * atomic create-if-absent on HDFS-like stores: a concurrent committer
    * racing to the same version loses the rename and fails here — it
    * must re-read and retry, never overwrite.
    */
  private[graft] def publish(hfs: FileSystem, root: String, version: Long,
      tables: Map[String, Seq[String]]): Long = {
    val dir = new Path(s"$root/$ManifestDir")
    hfs.mkdirs(dir)
    val tmp = new Path(dir, s".graft-tmp-${java.util.UUID.randomUUID()}")
    val out = hfs.create(tmp, false)
    try {
      val body = (for ((t, ds) <- tables.toSeq.sortBy(_._1); d <- ds)
        yield s"""{"table":"$t","delta":"$d"}""").mkString("\n")
      out.write(body.getBytes("UTF-8"))
    } finally out.close()
    val target = manifestPath(root, version)
    // Guard BEFORE publishing: fast, loud failure for the realistic
    // serialized racer (a torn orchestrator double-committing) on any
    // store.
    if (hfs.exists(target)) {
      hfs.delete(tmp, false)
      throw new IllegalStateException(
        s"manifest version $version already committed by another writer " +
          "— losing commit aborted, nothing was published; re-read the " +
          "current manifest and retry")
    }
    if (hfs.getScheme == "file") {
      // POSIX rename(2) silently OVERWRITES an existing destination (and
      // Files.move+ATOMIC_MOVE maps to rename), so on the local store two
      // TRULY concurrent writers could both pass the exists() check and
      // the later rename would clobber the winner. link(2) is the atomic
      // create-if-absent primitive POSIX does provide: hard-linking the
      // temp file onto the target fails with EEXIST if any other writer
      // got there first — the window is closed, not just narrowed.
      val q = (p: Path) => java.nio.file.Paths.get(
        hfs.makeQualified(p).toUri.getPath)
      try java.nio.file.Files.createLink(q(target), q(tmp))
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          hfs.delete(tmp, false)
          throw new IllegalStateException(
            s"manifest version $version lost the publish race to a " +
              "concurrent writer — nothing was published; re-read the " +
              "current manifest and retry")
      }
      hfs.delete(tmp, false)
    } else {
      // HDFS-like stores: rename is atomic create-if-absent already.
      require(hfs.rename(tmp, target),
        s"manifest commit lost the rename to version $version " +
          "(concurrent committer?) — nothing was published")
    }
    version
  }

  /** Atomically publish version current+1 = current manifest plus the
    * staged deltas (table → newly staged delta paths). ALL tables in
    * `staged` become visible together or not at all. Returns the new
    * version.
    */
  def commit(spark: SparkSession, root: String,
      staged: Map[String, Seq[String]]): Long = {
    val prev = currentManifest(spark, root)
    val merged = (prev.map(_.tables).getOrElse(Map.empty).toSeq ++ staged.toSeq)
      .groupBy(_._1).map { case (t, es) => t -> es.flatMap(_._2) }
    publish(fs(spark, root), root, prev.map(_.version).getOrElse(0L) + 1L, merged)
  }

  /** Replace `table`'s delta list with ONE compacted directory — itself
    * a transactional commit (readers see either the old list or the new
    * single delta, never both). Old dirs become unreferenced; [[vacuum]]
    * reclaims them.
    */
  def compactTable(spark: SparkSession, root: String, table: String,
      numFiles: Int = 1): Option[Long] =
    readTable(spark, root, table).map { df =>
      val rel = stageDelta(spark, df.repartition(numFiles), root, table)
      val prev = currentManifest(spark, root).get
      publish(fs(spark, root), root, prev.version + 1L,
        prev.tables.updated(table, Seq(rel)))
    }

  /** Row-level compaction: transactionally replace `table`'s contents
    * with `fold(currentRows)` as ONE delta. For tables whose rows form a
    * semilattice summary (e.g. sketch register rows merged by
    * element-wise max), the per-commit append-only history can be folded
    * to its summary without changing any read: the fold must be pure,
    * associative and idempotent over the rows, so replacing the list is
    * replay-safe — a crash between publish and the next append loses
    * nothing, and re-folding a folded table is a no-op. Readers see the
    * old rows or the folded rows, never both; old delta dirs become
    * unreferenced and [[vacuum]] reclaims them.
    */
  def compactTableWith(spark: SparkSession, root: String, table: String)(
      fold: DataFrame => DataFrame): Option[Long] =
    readTable(spark, root, table).map { df =>
      val rel = stageDelta(spark, fold(df), root, table)
      val prev = currentManifest(spark, root).get
      publish(fs(spark, root), root, prev.version + 1L,
        prev.tables.updated(table, Seq(rel)))
    }

  /** Delete every delta directory the CURRENT manifest does not
    * reference (torn cycles, compacted-away generations) and every
    * superseded manifest file. Only safe while no cycle is staging —
    * an in-flight writer's staged deltas are indistinguishable from a
    * torn cycle's. Returns the number of paths deleted.
    */
  def vacuum(spark: SparkSession, root: String): Int = {
    val hfs = fs(spark, root)
    val rootPath = new Path(root)
    if (!hfs.exists(rootPath)) return 0
    currentManifest(spark, root) match {
      case None => 0
      case Some(m) =>
        val live = m.tables.valuesIterator.flatten.toSet
        var deleted = 0
        hfs.listStatus(rootPath)
          .filter(s => s.isDirectory && s.getPath.getName != ManifestDir)
          .foreach { t =>
            hfs.listStatus(t.getPath)
              .filter(_.getPath.getName.startsWith(".graft-delta-"))
              .foreach { d =>
                val rel = s"${t.getPath.getName}/${d.getPath.getName}"
                if (!live.contains(rel)) {
                  hfs.delete(d.getPath, true); deleted += 1
                }
              }
          }
        val mdir = new Path(s"$root/$ManifestDir")
        hfs.listStatus(mdir).foreach { s =>
          s.getPath.getName match {
            case ManifestName(v) if v.toLong < m.version =>
              hfs.delete(s.getPath, false); deleted += 1
            case n if n.startsWith(".graft-tmp-") =>
              hfs.delete(s.getPath, false); deleted += 1
            case _ => ()
          }
        }
        deleted
    }
  }
}
