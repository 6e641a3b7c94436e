package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Table-maintenance operators a 100 TB parquet lake needs continuously:
  * small-files compaction and sort-clustered rewrites for data skipping.
  *
  * Streaming ingest (micro-batch appends) and fine-grained upserts leave
  * thousands of KB-sized part files per partition; scans then pay one
  * task + one footer read per file and lose row-group-statistics
  * locality. Compaction rewrites a directory into ~targetBytes files;
  * clustering additionally range-partitions + sorts by a key so parquet
  * row-group min/max statistics become selective (the poor man's
  * Z-order for one key — scans with a pushed filter on that key skip
  * whole row groups / files).
  */
object Maintenance {

  final case class CompactionStats(filesBefore: Int, filesAfter: Int,
                                   rows: Long)

  private def parquetFiles(dir: String): Array[java.io.File] =
    Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  /** Rewrite `dir` into ceil(totalBytes / targetBytes) files (possibly
    * sorted by `clusterBy`), atomically-ish: write to a sibling temp dir,
    * move the ORIGINALS to a sibling backup dir, move the compacted files
    * in, and only then drop the backup. A crash mid-swap therefore never
    * loses data — the originals survive in `<dir>_compact_bak` until the
    * compacted files are all in place — and the swap touches exactly the
    * file list captured up front, so a file appended after the capture is
    * left alone (it simply misses this compaction round; concurrent
    * appends DURING the swap window are unsupported, as with any
    * non-transactional table format). If a prior run crashed mid-swap,
    * the next compact() refuses to start while its backup dir is
    * non-empty — the stranded originals are never deleted by a run that
    * did not park them. Local-FS moves stand in for the object-store
    * rename a cluster deployment would route through its committer.
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              clusterBy: Option[String] = None): CompactionStats = {
    import org.apache.spark.sql.functions.col
    // A non-empty backup dir means a PRIOR compact() crashed mid-swap and
    // its originals are stranded there; `dir` may hold a partial mix of
    // original and compacted files, so no automated merge is safe (moving
    // the bak files back could double rows already swapped in). Abort and
    // leave the bak untouched — this run must never delete files it did
    // not park itself.
    val stalePath = java.nio.file.Paths.get(dir + "_compact_bak")
    val stale = Option(stalePath.toFile.listFiles()).getOrElse(Array.empty)
    require(stale.isEmpty,
      s"compact($dir): stale backup ${stalePath} holds ${stale.length} " +
        "file(s) from a crashed prior compaction; reconcile manually " +
        "(restore or discard the backup) before compacting again")
    val before = parquetFiles(dir)
    val totalBytes = before.map(_.length).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val shaped = clusterBy match {
      // range-partition THEN sort within: each output file owns a
      // contiguous key range and its row groups carry tight min/max
      case Some(k) => df.repartitionByRange(nFiles, col(k))
        .sortWithinPartitions(col(k))
      case None => df.repartition(nFiles)
    }
    val tmp = dir + "_compact_tmp"
    shaped.write.mode(SaveMode.Overwrite).parquet(tmp)
    // swap: park the originals in a backup dir (recoverable until the
    // compacted files are in place), move compacted files in, THEN drop
    // the backup — only the `before` list is ever touched
    val bak = java.nio.file.Paths.get(dir + "_compact_bak")
    java.nio.file.Files.createDirectories(bak)
    before.foreach { f =>
      java.nio.file.Files.move(f.toPath, bak.resolve(f.getName))
    }
    parquetFiles(tmp).foreach { f =>
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(dir, f.getName))
    }
    Option(bak.toFile.listFiles()).foreach(_.foreach(_.delete()))
    bak.toFile.delete()
    Option(new java.io.File(tmp).listFiles()).foreach(_.foreach(_.delete()))
    new java.io.File(tmp).delete()
    CompactionStats(before.length, parquetFiles(dir).length, rows)
  }
}
