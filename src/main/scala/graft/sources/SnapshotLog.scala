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

  /** Manifest name: `v00001.manifest`, or `v00001-b000000.manifest`
    * for a version committed by a streaming micro-batch — the batchId
    * rides the SAME atomic rename as the version commit, which is what
    * makes the streamed append exactly-once (a separate batch marker
    * would open a crash window between the two writes). */
  private val ManifestName = """v(\d+)(?:-b(\d+))?\.manifest""".r

  private def manifestNames(dir: String): Seq[String] = {
    val ld = logDir(dir)
    if (!java.nio.file.Files.isDirectory(ld)) Seq.empty
    else {
      val st = java.nio.file.Files.list(ld)
      try st.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => ManifestName.pattern.matcher(n).matches())
        .toSeq
      finally st.close()
    }
  }

  private def manifestPath(dir: String, v: Int): java.nio.file.Path = {
    val name = manifestNames(dir).collectFirst {
      case n @ ManifestName(vv, _) if vv.toInt == v => n
    }.getOrElse(f"v$v%05d.manifest")
    logDir(dir).resolve(name)
  }

  /** All committed versions, ascending (empty if none). */
  def versions(dir: String): Seq[Int] =
    manifestNames(dir)
      .collect { case ManifestName(v, _) => v.toInt }.sorted

  /** The (batchId, version) pairs committed by streamed appends. */
  private def batchVersions(dir: String): Map[Long, Int] =
    manifestNames(dir).collect {
      case ManifestName(v, b) if b != null => b.toLong -> v.toInt
    }.toMap

  def latestVersion(dir: String): Int = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"snapshot log at $dir has no committed version")
    vs.max
  }

  /** The manifest entries of version `v`: plain data-file names, plus
    * `dv:<column>:<file>` deletion-vector entries (merge-on-read
    * deletes — see [[deleteWhereMoR]]). */
  def manifest(dir: String, v: Int): Seq[String] = {
    val p = manifestPath(dir, v)
    require(java.nio.file.Files.exists(p),
      s"no version $v at $dir (have ${versions(dir).mkString(",")})" +
        " — vacuumed or never committed")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** A manifest's plain data-file names (deletion vectors excluded). */
  private[graft] def dataEntries(lines: Seq[String]): Seq[String] =
    lines.filterNot(_.startsWith("dv:"))

  /** A manifest's (column, dvFile) deletion-vector entries. */
  private[graft] def dvEntries(lines: Seq[String]): Seq[(String, String)] =
    lines.collect { case l if l.startsWith("dv:") =>
      val rest = l.stripPrefix("dv:")
      val i = rest.indexOf(':')
      (rest.substring(0, i), rest.substring(i + 1))
    }

  /** Every file name a manifest references (data + deletion vectors) —
    * what [[vacuum]] must retain. */
  private def referencedFiles(lines: Seq[String]): Seq[String] =
    dataEntries(lines) ++ dvEntries(lines).map(_._2)

  /** Commit `lines` as version `v` — tmp write + atomic move, the LAST
    * step of any append/compaction so a crash before it leaves every
    * committed version intact. Line ORDER is semantic and preserved:
    * a `dv:` deletion-vector entry masks only the data files listed
    * BEFORE it, so rows re-inserted by a later append stay visible. */
  private def commitManifest(dir: String, v: Int, lines: Seq[String],
                             batchId: Option[Long] = None): Unit = {
    require(v == versions(dir).lastOption.getOrElse(0) + 1,
      s"version $v is not the next version at $dir")
    java.nio.file.Files.createDirectories(logDir(dir))
    val name = batchId match {
      case Some(b) => f"v$v%05d-b$b%06d.manifest"
      case None    => f"v$v%05d.manifest"
    }
    val tmp = logDir(dir).resolve(f"v$v%05d.tmp")
    java.nio.file.Files.write(tmp,
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, logDir(dir).resolve(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Evaluate an ordered manifest-line sequence into a DataFrame:
    * data-file runs are scanned and unioned; each `dv:` entry
    * anti-joins its deleted-key file against everything accumulated
    * SO FAR — files appended after the deletion vector are outside its
    * scope (the Iceberg sequence-number rule), so a re-inserted key is
    * visible again without waiting for a compaction. */
  private def readLines(s: SparkSession, dir: String, lines: Seq[String],
                        mergeSchema: Boolean): DataFrame = {
    var acc: DataFrame = null
    var pending = Vector.empty[String]
    def read(fs: Seq[String]): DataFrame = {
      val paths = fs.map(f => s"$dir/$f")
      if (mergeSchema) s.read.option("mergeSchema", "true").parquet(paths: _*)
      else s.read.parquet(paths: _*)
    }
    def flush(): Unit = if (pending.nonEmpty) {
      val g = read(pending)
      acc = if (acc == null) g
            else acc.unionByName(g, allowMissingColumns = true)
      pending = Vector.empty
    }
    lines.foreach {
      case l if l.startsWith("dv:") =>
        flush()
        if (acc != null) {
          val Seq((column, file)) = dvEntries(Seq(l))
          val keys = s.read.parquet(s"$dir/$file")
          acc = acc.join(keys, acc(column) === keys("dk"), "left_anti")
        }
      case f => pending :+= f
    }
    flush()
    require(acc != null, s"manifest at $dir has no data files")
    acc
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

  /** EXACTLY-ONCE streamed appends: one committed version per
    * micro-batch, `foreachBatch` over the sink + manifest layer. The
    * crash matrix the batch-tagged manifests close:
    *  - crash after the sink's job commit but BEFORE the manifest
    *    commit → the moved data files are referenced by nothing; the
    *    replayed trigger appends afresh and commits, the first
    *    attempt's files stay invisible orphans until [[vacuum]];
    *  - crash AFTER the manifest commit but before the checkpoint
    *    commit → the replayed trigger finds its own batchId already
    *    committed (the id rides the manifest's atomic rename) and
    *    no-ops — never a duplicate append;
    *  - a fresh checkpoint over an old store restarts batch numbering
    *    below the committed high-water mark → fail loud (the
    *    mergeApplyStream stale-generation discipline). */
  def appendStream(stream: DataFrame, dir: String,
                   checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendVersionForBatch(batch, dir, batchId); ()
      }
      .start()

  /** One streamed-append trigger (factored for the replay spec).
    * Returns the version serving this batch — freshly committed, or
    * the already-committed one on a post-commit replay. */
  private[graft] def appendVersionForBatch(batch: DataFrame, dir: String,
                                           batchId: Long): Int = {
    val committed = batchVersions(dir)
    // the high-water mark is max(tagged manifests, the vacuum-persisted
    // BATCH_HWM) — retention may have deleted old tagged manifests, and
    // without the persisted mark a replayed batch would re-append
    val maxB = math.max(committed.keys.foldLeft(-1L)(math.max),
      batchHighWater(dir))
    // a crashed trigger replays only the LAST batch, so the no-op
    // branch is exactly batchId == the committed high-water mark; any
    // batchId BELOW it (committed or not) means a fresh checkpoint is
    // running over an old store — fail loud, never fork the history
    // (the mergeApplyStream generation discipline). A vacuumed tagged
    // manifest leaves no version to return; the latest version already
    // CONTAINS the replayed batch's rows, so it serves.
    if (batchId == maxB) committed.getOrElse(batchId, latestVersion(dir))
    else {
      require(batchId > maxB,
        s"snapshot log at $dir already holds batch > $batchId " +
          "— stale generation; clear the store or keep the original " +
          "checkpoint")
      val before = dataFiles(dir)
      batch.write.format("graft.sources.ParquetBatchSink")
        .option("path", dir).mode(SaveMode.Append).save()
      val added = (dataFiles(dir) -- before).toSeq
      val prev = versions(dir).lastOption
        .map(manifest(dir, _)).getOrElse(Seq())
      val v = versions(dir).lastOption.getOrElse(0) + 1
      commitManifest(dir, v, prev ++ added, Some(batchId))
      v
    }
  }

  /** Read the table exactly as of version `v`: a plain multi-file
    * parquet scan over the manifest's files. `mergeSchema` is the
    * SCHEMA-EVOLUTION read: appends may carry new columns (the sink
    * writes whatever schema each batch has), and the merged read
    * unions the file schemas with NULLs where an older file predates a
    * column — the Delta/Iceberg column-add semantics over plain
    * parquet. Off by default: schema merging reads every file's
    * footer at planning time, the usual Spark trade. */
  def readVersion(s: SparkSession, dir: String, v: Int,
                  mergeSchema: Boolean = false): DataFrame =
    readLines(s, dir, manifest(dir, v), mergeSchema)

  /** The data-file rewrite HALF of a compaction: read the latest
    * snapshot, rewrite it into ~targetBytes files under distinct
    * `compact-v<next>-` names, move them into the table directory, and
    * return their names WITHOUT committing. Factored out so the
    * crash-mid-compaction spec can stop exactly here — data files in
    * place, no manifest — and prove every committed version still
    * reads identically. */
  private[graft] def writeCompacted(s: SparkSession, dir: String,
                                    targetBytes: Long,
                                    clusterBy: Option[String] = None)
      : Seq[String] = {
    val cur = latestVersion(dir)
    val files = dataEntries(manifest(dir, cur))
    val totalBytes = files.map(f =>
      new java.io.File(dir, f).length()).sum
    val nFiles = math.max(1,
      math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = dir + s"_snapcompact_tmp"
    val src = readVersion(s, dir, cur)
    val shaped = clusterBy match {
      // range-partition THEN sort within (Maintenance.compact's
      // clustering): each compacted file owns a contiguous key range,
      // so [[readVersionWhere]]'s footer-stats pruning keeps biting
      // AFTER the rewrite — an unclustered repartition would smear
      // every key range across every file and silently turn the
      // skipping read into a full scan
      case Some(k) => src
        .repartitionByRange(nFiles, org.apache.spark.sql.functions.col(k))
        .sortWithinPartitions(org.apache.spark.sql.functions.col(k))
      case None => src.repartition(nFiles)
    }
    shaped.write.mode(SaveMode.Overwrite).parquet(tmp)
    moveRewrite(s, dir, tmp, "compact", cur + 1, keepOneIfAllEmpty = true)
  }

  /** Compact the latest snapshot into ~targetBytes files as a NEW
    * version (replaced originals stay on disk so every prior version
    * keeps reading); `clusterBy` keeps the rewrite range-clustered so
    * data skipping survives it. Returns the new version number. */
  def compactVersion(s: SparkSession, dir: String,
                     targetBytes: Long = 128L * 1024 * 1024,
                     clusterBy: Option[String] = None): Int = {
    val moved = writeCompacted(s, dir, targetBytes, clusterBy)
    val v = latestVersion(dir) + 1
    commitManifest(dir, v, moved)
    v
  }

  /** Per-file (min, max) of a LONG column straight off the parquet
    * FOOTER — O(1) metadata per file, no data IO: the row-group
    * statistics the writer already embedded, folded across blocks. */
  private def footerRange(s: SparkSession, dir: String, file: String,
                          column: String): Option[(Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(s"$dir/$file"),
      s.sessionState.newHadoopConf())
    val r = ParquetFileReader.open(in)
    try {
      val ranges = r.getFooter.getBlocks.asScala.flatMap { b =>
        b.getColumns.asScala
          .find(_.getPath.toDotString == column)
          .flatMap { c =>
            val st = c.getStatistics
            if (st == null || !st.hasNonNullValue) None
            else (st.genericGetMin, st.genericGetMax) match {
              case (lo: java.lang.Long, hi: java.lang.Long) =>
                Some((lo.longValue, hi.longValue))
              case _ => None
            }
          }
      }
      if (ranges.isEmpty) None
      else Some((ranges.map(_._1).min, ranges.map(_._2).max))
    } finally r.close()
  }

  /** MANIFEST-LEVEL DATA SKIPPING — the Delta/Iceberg file-pruning
    * read: plan the snapshot scan from per-file footer [min, max] of
    * `column` and hand Spark ONLY the files that can intersect
    * [lo, hi]; files whose stats are unavailable are read
    * (conservative), and the predicate is still applied to the scanned
    * rows, so pruning is semantically invisible — row-group pruning
    * inside the surviving files then proceeds as usual. At 100 TB this
    * is the difference between the driver planning against O(files)
    * footer metadata and a scan that opens every file of the snapshot:
    * a range-clustered table answers a narrow range from the one file
    * group that owns it. Returns (frame, filesRead, filesTotal) so a
    * caller/spec can pin that the pruning actually bit. */
  def readVersionWhere(s: SparkSession, dir: String, v: Int,
                       column: String, lo: Long, hi: Long)
      : (DataFrame, Int, Int) = {
    val lines = manifest(dir, v)
    val files = dataEntries(lines)
    val keptSet = files.filter { f =>
      footerRange(s, dir, f, column) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None           => true
      }
    }.toSet
    val kept = keptSet.toSeq
    val df =
      if (kept.isEmpty)
        readVersion(s, dir, v).limit(0)
      // the pruned read keeps manifest ORDER (dv entries still mask
      // exactly the pruned files committed before them)
      else readLines(s, dir,
        lines.filter(l => l.startsWith("dv:") || keptSet.contains(l)),
        mergeSchema = false)
    (df.filter(org.apache.spark.sql.functions.col(column).between(lo, hi)),
      kept.size, files.size)
  }

  /** Footer row count — used to drop zero-row rewrite outputs: an
    * empty parquet file carries no column stats, so committing one
    * would make every later stats-planned operation conservatively
    * rewrite/scan it forever. */
  private def footerRowCount(s: SparkSession, path: String): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), s.sessionState.newHadoopConf()))
    try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally r.close()
  }

  /** The shared rewrite-commit tail of compaction / COW delete /
    * merge: collect the tmp write's part files, drop zero-row outputs
    * (no stats — every later stats-planned operation would
    * conservatively scan/rewrite them forever), keep one if EVERYTHING
    * is empty and nothing else carries the schema, and move each under
    * a distinct versioned name (clearing a crashed prior attempt's
    * same-named orphans — ATOMIC_MOVE onto an existing target is
    * implementation-specific). */
  private def moveRewrite(s: SparkSession, dir: String, tmp: String,
                          prefix: String, v: Int,
                          keepOneIfAllEmpty: Boolean): Seq[String] = {
    val allParts = Option(new java.io.File(tmp).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("."))
    val nonEmpty = allParts
      .filter(f => footerRowCount(s, f.getAbsolutePath) > 0)
    val parts =
      if (nonEmpty.isEmpty && keepOneIfAllEmpty) allParts.take(1)
      else nonEmpty
    val moved = parts.zipWithIndex.map { case (f, i) =>
      val name = f"$prefix-v$v%05d-p$i%05d.parquet"
      val target = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.deleteIfExists(target)
      java.nio.file.Files.move(f.toPath, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      name
    }.toSeq
    Option(new java.io.File(tmp).listFiles())
      .foreach(_.foreach(_.delete()))
    new java.io.File(tmp).delete()
    moved
  }

  /** MERGE INTO at file granularity — q100's three-clause arbitration
    * PERSISTED through the snapshot log (the write half the batch
    * merge operator computes but never stores): a file is touched iff
    * its footer [min, max] can contain a SOURCE key (per-key range
    * probe, not the interval hull — inserts far outside the table
    * touch nothing); touched files rewrite through a full-outer
    * arbitration with the source (matched-update / matched-delete /
    * not-matched-insert), untouched files share verbatim into the new
    * manifest as the implicit 'kept' clause. Target shape (keyCol:
    * long, balCol: double); source shape (key, amt, action). Returns
    * (newVersion, filesRewritten, filesKept). */
  def mergeInto(s: SparkSession, dir: String, source: DataFrame,
                keyCol: String, balCol: String): (Int, Int, Int) = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val cur = latestVersion(dir)
    val lines = manifest(dir, cur)
    // ONE materialization of the source feed: the probe and the
    // rewrite join both consume it, and without the checkpoint the
    // whole feed pipeline would compute twice — and a nondeterministic
    // feed could even disagree with its own probe (round-17 review)
    val src = source.localCheckpoint()
    val ranged = dataEntries(lines)
      .map(f => f -> footerRange(s, dir, f, keyCol))
    // per-key probe of the O(files) footer ranges: an O(files) control
    // read, the same planning metadata every stats-driven op here uses
    val rangesDf = ranged.collect { case (f, Some((mn, mx))) =>
      (f, mn, mx) }.toDF("f", "mn", "mx")
    val probed = src.select(col("key")).distinct()
      .join(broadcast(rangesDf),
        col("key") >= col("mn") && col("key") <= col("mx"))
      .select($"f").distinct().as[String].collect().toSet
    val touchedSet = ranged.collect {
      case (f, None) => f                    // no stats: conservative
      case (f, Some(_)) if probed.contains(f) => f
    }.toSet
    val untouched = dataEntries(lines).filterNot(touchedSet.contains)
    val v = cur + 1
    val slice =
      if (touchedSet.isEmpty) readVersion(s, dir, cur).limit(0)
      else readLines(s, dir,
        lines.filter(l => l.startsWith("dv:") || touchedSet.contains(l)),
        mergeSchema = false)
    // the arbitration (operators.Extras.mergeArbitrate's algebra,
    // restated over the touched slice — ALL FOUR actions, incl. the
    // 'replace' the CDC sequential-apply collapse emits, so persisting
    // that feed through mergeInto stays correct, round-17 review):
    // unmatched target rows pass, 'replace' restarts the balance,
    // matched upserts accumulate, deletes drop, unmatched source
    // upserts insert
    val tmp = dir + "_snapmerge_tmp"
    slice.select(col(keyCol).as("key"), col(balCol).as("bal"))
      .join(src, Seq("key"), "full_outer")
      .filter(col("action").isNull || col("action") =!= "delete")
      .select(col("key").as(keyCol),
        when(col("action").isNull, col("bal"))
          .when(col("action") === "replace", col("amt"))
          .when(col("bal").isNotNull, col("bal") + col("amt"))
          .otherwise(col("amt")).as(balCol))
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val moved = moveRewrite(s, dir, tmp, "merge", v,
      keepOneIfAllEmpty = untouched.isEmpty)
    commitManifest(dir, v,
      lines.filterNot(touchedSet.contains) ++ moved)
    (v, touchedSet.size, untouched.size)
  }

  /** COPY-ON-WRITE DELETE of a key range — the lakehouse row-delete
    * over immutable parquet: footer stats split the live file set into
    * TOUCHED (range intersects — rewritten without the deleted rows)
    * and UNTOUCHED (shared verbatim into the new manifest, zero IO);
    * the commit is the usual atomic manifest rename, so a crash
    * mid-rewrite leaves orphans and an intact table, and every prior
    * version still reads the deleted rows (time travel is the undo).
    * At 100 TB this is the difference between rewriting the table and
    * rewriting the handful of files a range predicate touches — the
    * same planning metadata [[readVersionWhere]] scans by. Returns
    * (newVersion, filesRewritten, filesKept). */
  def deleteWhere(s: SparkSession, dir: String, column: String,
                  lo: Long, hi: Long): (Int, Int, Int) = {
    val cur = latestVersion(dir)
    val lines = manifest(dir, cur)
    val (touched, untouched) = dataEntries(lines).partition { f =>
      footerRange(s, dir, f, column) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None           => true // no stats: conservatively rewrite
      }
    }
    val touchedSet = touched.toSet
    val v = cur + 1
    val rewritten =
      if (touched.isEmpty) Seq.empty[String]
      else {
        val tmp = dir + "_snapdelete_tmp"
        // a NULL key is NOT in [lo, hi]: the predicate must be
        // not-TRUE (Delta/Iceberg DELETE WHERE semantics), or the
        // three-valued filter would silently erase NULL-key rows from
        // every rewritten file (round-17 review). The touched files
        // are read with their applicable deletion vectors (the ordered
        // subsequence), so a COW rewrite after a MoR delete never
        // resurrects MoR-deleted rows.
        readLines(s, dir,
            lines.filter(l => l.startsWith("dv:") || touchedSet.contains(l)),
            mergeSchema = false)
          .filter(!org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.col(column).between(lo, hi),
            org.apache.spark.sql.functions.lit(false)))
          .write.mode(SaveMode.Overwrite).parquet(tmp)
        // keep one empty file only when the delete emptied EVERYTHING
        // and nothing untouched carries the schema (round-17 review)
        moveRewrite(s, dir, tmp, "delete", v,
          keepOneIfAllEmpty = untouched.isEmpty)
      }
    // untouched lines keep their order (and their masking dv entries);
    // the rewritten files append at the END — after every dv, since
    // their rows already have all deletions applied
    commitManifest(dir, v,
      lines.filterNot(touchedSet.contains) ++ rewritten)
    (v, touched.size, untouched.size)
  }

  /** MERGE-ON-READ DELETE of a key range — the deletion-vector
    * alternative to [[deleteWhere]]'s copy-on-write (Delta deletion
    * vectors / Iceberg equality deletes): NO data file is rewritten;
    * the matched keys (computed from the stats-pruned files only, with
    * prior deletions applied) are written as one tiny key file and the
    * new manifest appends a `dv:<column>:<file>` entry — every read
    * from then on anti-joins it against the files committed BEFORE it,
    * so a later append can re-insert a key and stay visible, and a
    * compaction materializes the vector away. Write cost O(matched
    * keys) instead of O(touched files); read cost one broadcast-sized
    * anti-join per vector — the COW/MoR trade, selectable per
    * workload. Returns (newVersion, filesScanned). */
  def deleteWhereMoR(s: SparkSession, dir: String, column: String,
                     lo: Long, hi: Long): (Int, Int) = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val cur = latestVersion(dir)
    val lines = manifest(dir, cur)
    val touched = dataEntries(lines).filter { f =>
      footerRange(s, dir, f, column) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None           => true
      }
    }
    val v = cur + 1
    if (touched.isEmpty) {
      commitManifest(dir, v, lines) // nothing matches: a no-op version
      (v, 0)
    } else {
      val touchedSet = touched.toSet
      val keys = readLines(s, dir,
          lines.filter(l => l.startsWith("dv:") || touchedSet.contains(l)),
          mergeSchema = false)
        .filter(coalesce(col(column).between(lo, hi), lit(false)))
        .select(col(column).as("dk")).distinct()
      val tmp = dir + "_snapdv_tmp"
      keys.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = Option(new java.io.File(tmp).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("."))
        .headOption
      val nKeys = part.map(f => footerRowCount(s, f.getAbsolutePath))
        .getOrElse(0L)
      if (nKeys == 0) {
        Option(new java.io.File(tmp).listFiles())
          .foreach(_.foreach(_.delete()))
        new java.io.File(tmp).delete()
        commitManifest(dir, v, lines) // stats intersected, no row matched
        (v, touched.size)
      } else {
        val name = f"dv-v$v%05d.parquet"
        val target = java.nio.file.Paths.get(dir, name)
        java.nio.file.Files.deleteIfExists(target) // crashed prior attempt
        java.nio.file.Files.move(part.get.toPath, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        Option(new java.io.File(tmp).listFiles())
          .foreach(_.foreach(_.delete()))
        new java.io.File(tmp).delete()
        commitManifest(dir, v, lines :+ s"dv:$column:$name")
        (v, touched.size)
      }
    }
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
    // PERSIST the streamed-batch high-water mark BEFORE deleting any
    // batch-tagged manifest: the exactly-once no-op/stale checks in
    // [[appendVersionForBatch]] read the mark from the tagged
    // manifests, and vacuuming them away would let a replayed
    // micro-batch re-append its rows (round-17 review). Written
    // tmp + atomic move; a crash after the write and before the
    // deletions just leaves both sources agreeing.
    val bvs = batchVersions(dir)
    if (bvs.nonEmpty) {
      val hwm = math.max(bvs.keys.max, batchHighWater(dir))
      val tmp = logDir(dir).resolve("BATCH_HWM.tmp")
      java.nio.file.Files.write(tmp, hwm.toString.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, logDir(dir).resolve("BATCH_HWM"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val keep = vs.filter(_ >= retainFrom)
    val referenced = keep.flatMap(v => referencedFiles(manifest(dir, v))).toSet
    (dataFiles(dir) -- referenced).foreach { f =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(dir, f))
    }
    vs.filter(_ < retainFrom).foreach { v =>
      java.nio.file.Files.delete(manifestPath(dir, v))
    }
  }

  /** The persisted streamed-batch high-water mark (−1 if never
    * written) — survives [[vacuum]] where the batch-tagged manifests
    * may not. */
  private def batchHighWater(dir: String): Long = {
    val p = logDir(dir).resolve("BATCH_HWM")
    if (!java.nio.file.Files.exists(p)) -1L
    else new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .trim.toLong
  }
}
