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
    swapRewrite(spark, dir, targetBytes) { (df, nFiles) =>
      clusterBy match {
        // range-partition THEN sort within: each output file owns a
        // contiguous key range and its row groups carry tight min/max
        case Some(k) => df.repartitionByRange(nFiles, col(k))
          .sortWithinPartitions(col(k))
        case None => df.repartition(nFiles)
      }
    }
  }

  /** Z-order (Morton-curve) clustered rewrite over TWO keys — what a
    * single-key sort cannot give: `compact(clusterBy = a)` makes row
    * groups selective for `a` only, while scans at 100 TB filter on more
    * than one dimension (time AND entity, say). Each key is normalized
    * to a 16-bit code via its global [min, max] (one tiny aggregate
    * broadcast back into the plan), the codes' bits interleave into one
    * 32-bit z-value, and files are range-partitioned + sorted by it —
    * so every output file owns a 2-D tile and its row-group min/max
    * stats are tight on BOTH columns (the Delta/Iceberg OPTIMIZE ZORDER
    * layout). Linear min/max normalization stands in for the rank-based
    * code a production rewrite uses under skew — same plan shape, swap
    * the bounds aggregate for approx quantiles.
    */
  def compactZOrder(spark: SparkSession, dir: String,
                    c1: String, c2: String,
                    targetBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    import org.apache.spark.sql.functions._
    swapRewrite(spark, dir, targetBytes) { (df, nFiles) =>
      val bounds = df.agg(
        min(col(c1).cast("double")).as("lo1"),
        max(col(c1).cast("double")).as("hi1"),
        min(col(c2).cast("double")).as("lo2"),
        max(col(c2).cast("double")).as("hi2"))
      def code(c: String, lo: String, hi: String) =
        s"CAST(IF($hi = $lo, 0.0, " +
          s"(CAST($c AS DOUBLE) - $lo) * 65535.0 / ($hi - $lo)) AS INT)"
      val interleave =
        """aggregate(sequence(0, 15), 0L, (acc, i) -> acc
          |  + shiftleft(CAST(shiftright(nx, i) & 1 AS BIGINT),
          |              CAST(2 * i AS INT))
          |  + shiftleft(CAST(shiftright(ny, i) & 1 AS BIGINT),
          |              CAST(2 * i + 1 AS INT)))""".stripMargin
      df.crossJoin(broadcast(bounds))
        .withColumn("nx", expr(code(c1, "lo1", "hi1")))
        .withColumn("ny", expr(code(c2, "lo2", "hi2")))
        .withColumn("zval", expr(interleave))
        .repartitionByRange(nFiles, col("zval"))
        .sortWithinPartitions(col("zval"))
        .drop("nx", "ny", "zval", "lo1", "hi1", "lo2", "hi2")
    }
  }

  /** The shared crash-safe rewrite: size the output, apply `shape`,
    * write to a temp sibling, swap via a backup dir. See [[compact]]'s
    * original contract — a crash mid-swap never loses data, and a run
    * never deletes files it did not park itself.
    */
  private def swapRewrite(spark: SparkSession, dir: String,
                          targetBytes: Long)(
      shape: (org.apache.spark.sql.DataFrame, Int) =>
        org.apache.spark.sql.DataFrame): CompactionStats = {
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
    val shaped = shape(df, nFiles)
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
