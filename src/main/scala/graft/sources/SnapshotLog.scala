package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot (time-travel) reads over a [[ParquetBatchSink]] directory —
  * the lakehouse read primitive the sink's two-phase commit was missing:
  * "read the table as of version N", surviving compaction.
  *
  * Design (the Delta/Iceberg metadata layer in miniature, file-list
  * manifests instead of JSON actions):
  *  - every committed version is a manifest under `_graft_log/`
  *    (`v00001.manifest`, ...) listing EXACTLY the data files that make
  *    up that snapshot, one name per line;
  *  - an APPEND commit writes manifest N+1 = manifest N's files + the
  *    files the append added (the sink's job commit names them);
  *  - a COMPACTION commit rewrites the live set into fewer files and
  *    writes manifest N+1 = the compacted files ONLY — the replaced
  *    originals stay on disk untouched, which is precisely what keeps
  *    versions 1..N readable after the rewrite (contrast
  *    `Maintenance.compact`, which swaps in place and keeps no history);
  *  - a manifest is written tmp-then-ATOMIC_MOVE, and always LAST — a
  *    crash mid-compaction leaves data files with no manifest pointing
  *    at them: every committed version still reads exactly as before,
  *    and [[vacuum]] sweeps the orphans (same marker-last discipline as
  *    the ingest-layout fingerprints);
  *  - [[vacuum]] deletes data files referenced ONLY by versions below
  *    `retainFrom` (and their manifests) — the storage-cost knob that
  *    bounds history, run explicitly like Delta's VACUUM.
  *
  * Scale shape: manifests are O(files) metadata text; no data is ever
  * copied at commit time; a snapshot read plans a plain multi-file
  * parquet scan (pushdown/pruning intact). Local-FS atomic moves stand
  * in for the object-store rename a cluster deployment routes through
  * its committer, as with ParquetBatchSink itself.
  */
object SnapshotLog {
  import scala.jdk.CollectionConverters._

  private def logDir(dir: String) = java.nio.file.Paths.get(dir, "_graft_log")

  private def manifestPath(dir: String, v: Int) =
    logDir(dir).resolve(f"v$v%05d.manifest")

  /** All committed versions, ascending (empty if none). */
  def versions(dir: String): Seq[Int] = {
    val ld = logDir(dir)
    if (!java.nio.file.Files.isDirectory(ld)) Seq.empty
    else {
      val st = java.nio.file.Files.list(ld)
      try st.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
        .map(_.stripPrefix("v").stripSuffix(".manifest").toInt)
        .toSeq.sorted
      finally st.close()
    }
  }

  def latestVersion(dir: String): Int = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"snapshot log at $dir has no committed version")
    vs.max
  }

  /** The data files of version `v` (names relative to `dir`). */
  def manifest(dir: String, v: Int): Seq[String] = {
    val p = manifestPath(dir, v)
    require(java.nio.file.Files.exists(p),
      s"no version $v at $dir (have ${versions(dir).mkString(",")})" +
        " — vacuumed or never committed")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Commit `files` as version `v` — tmp write + atomic move, the LAST
    * step of any append/compaction so a crash before it leaves every
    * committed version intact. */
  private def commitManifest(dir: String, v: Int,
                             files: Seq[String]): Unit = {
    require(v == versions(dir).lastOption.getOrElse(0) + 1,
      s"version $v is not the next version at $dir")
    java.nio.file.Files.createDirectories(logDir(dir))
    val tmp = logDir(dir).resolve(f"v$v%05d.tmp")
    java.nio.file.Files.write(tmp,
      (files.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, manifestPath(dir, v),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def dataFiles(dir: String): Set[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("."))
      .map(_.getName).toSet
  }

  /** Append `df` through the sink's two-phase commit and commit the
    * next version = previous files + exactly the files this append
    * moved in. Returns the new version number. */
  def appendVersion(df: DataFrame, dir: String): Int = {
    val before = dataFiles(dir)
    df.write.format("graft.sources.ParquetBatchSink")
      .option("path", dir).mode(SaveMode.Append).save()
    val added = (dataFiles(dir) -- before).toSeq
    require(added.nonEmpty, "append committed no files")
    val prev = versions(dir).lastOption.map(manifest(dir, _)).getOrElse(Seq())
    val v = versions(dir).lastOption.getOrElse(0) + 1
    commitManifest(dir, v, prev ++ added)
    v
  }

  /** Read the table exactly as of version `v`: a plain multi-file
    * parquet scan over the manifest's files. */
  def readVersion(s: SparkSession, dir: String, v: Int): DataFrame = {
    val files = manifest(dir, v).map(f => s"$dir/$f")
    s.read.parquet(files: _*)
  }

  /** The data-file rewrite HALF of a compaction: read the latest
    * snapshot, rewrite it into ~targetBytes files under distinct
    * `compact-v<next>-` names, move them into the table directory, and
    * return their names WITHOUT committing. Factored out so the
    * crash-mid-compaction spec can stop exactly here — data files in
    * place, no manifest — and prove every committed version still
    * reads identically. */
  private[graft] def writeCompacted(s: SparkSession, dir: String,
                                    targetBytes: Long): Seq[String] = {
    val cur = latestVersion(dir)
    val files = manifest(dir, cur)
    val totalBytes = files.map(f =>
      new java.io.File(dir, f).length()).sum
    val nFiles = math.max(1,
      math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = dir + s"_snapcompact_tmp"
    readVersion(s, dir, cur).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val parts = Option(new java.io.File(tmp).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("."))
    val moved = parts.zipWithIndex.map { case (f, i) =>
      val name = f"compact-v${cur + 1}%05d-p$i%05d.parquet"
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(dir, name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      name
    }.toSeq
    Option(new java.io.File(tmp).listFiles()).foreach(_.foreach(_.delete()))
    new java.io.File(tmp).delete()
    moved
  }

  /** Compact the latest snapshot into ~targetBytes files as a NEW
    * version (replaced originals stay on disk so every prior version
    * keeps reading). Returns the new version number. */
  def compactVersion(s: SparkSession, dir: String,
                     targetBytes: Long = 128L * 1024 * 1024): Int = {
    val moved = writeCompacted(s, dir, targetBytes)
    val v = latestVersion(dir) + 1
    commitManifest(dir, v, moved)
    v
  }

  /** Roll the table back to version `v` — committed as a NEW version
    * whose manifest is a copy of `v`'s (the Delta RESTORE shape):
    * history stays linear and intact, nothing is deleted, and the
    * files are shared, so the rollback is O(manifest) metadata. The
    * restored version must still be on disk (not vacuumed). */
  def restoreVersion(dir: String, v: Int): Int = {
    val files = manifest(dir, v) // fails loud if vacuumed
    val next = latestVersion(dir) + 1
    commitManifest(dir, next, files)
    next
  }

  /** Drop history below `retainFrom`: delete manifests of older
    * versions and every data file no RETAINED manifest references —
    * incl. orphans from a crashed compaction (data files moved in, no
    * manifest committed). Reads of vacuumed versions then fail loud in
    * [[manifest]]. */
  def vacuum(dir: String, retainFrom: Int): Unit = {
    val vs = versions(dir)
    require(vs.contains(retainFrom),
      s"retainFrom=$retainFrom is not a committed version at $dir")
    val keep = vs.filter(_ >= retainFrom)
    val referenced = keep.flatMap(manifest(dir, _)).toSet
    (dataFiles(dir) -- referenced).foreach { f =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(dir, f))
    }
    vs.filter(_ < retainFrom).foreach { v =>
      java.nio.file.Files.delete(manifestPath(dir, v))
    }
  }
}
