package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot (time-travel) reads over a [[ParquetBatchSink]] directory —
  * the lakehouse read primitive the sink's two-phase commit was missing:
  * "read the table as of version N", surviving compaction.
  *
  * Design (the Delta/Iceberg metadata layer in miniature, file-list
  * manifests instead of JSON actions):
  *  - every committed version is a manifest under `_graft_log/`
  *    (`v00001.manifest`, ...); a FULL manifest lists EXACTLY the data
  *    files that make up that snapshot, one name per line; a DELTA
  *    manifest (header `#delta`) lists only `+name`/`-name` edits
  *    against version N−1, and a full CHECKPOINT manifest is forced
  *    every [[CheckpointEvery]] versions so resolving any version costs
  *    one O(files) read plus at most K−1 O(edit) reads — without the
  *    checkpoints the log itself would grow O(versions × files), the
  *    scale bottleneck of a naive file-list log (Delta's checkpoint /
  *    Iceberg's manifest-list idea, in miniature);
  *  - an APPEND commit's delta is `+` lines for the files the sink's
  *    job commit added;
  *  - a COMPACTION commit rewrites the live set into fewer files and
  *    commits a full manifest of the compacted files ONLY — the
  *    replaced originals stay on disk untouched, which is precisely
  *    what keeps versions 1..N readable after the rewrite (contrast
  *    `Maintenance.compact`, which swaps in place and keeps no history);
  *  - the version commit is a tmp write + atomic hard-link CLAIM of the
  *    bare `vNNNNN.manifest` name (create-if-absent — the putIfAbsent
  *    protocol Delta requires of its log store), and always LAST: of
  *    two racing writers committing the same version exactly ONE wins
  *    and the loser fails loud with a conflict, cross-process, because
  *    link creation is atomic on the filesystem — a streamed append's
  *    batchId rides the manifest BODY (`#batch=` header), never the
  *    name, so differently-tagged commits of one version still collide
  *    on the claim (the round-17 duplicate-version hole);
  *  - every rewrite (compaction / COW delete / merge / deletion
  *    vector) writes its output under names carrying a per-attempt
  *    random token, so two concurrent rewriters can NEVER overwrite
  *    each other's data files — the loser of the manifest claim leaves
  *    unreferenced orphans, exactly what a crashed attempt leaves, and
  *    [[vacuum]] sweeps both (immutable uniquely-named data + one
  *    atomic metadata commit: the lakehouse concurrency discipline);
  *  - a crash mid-compaction leaves data files with no manifest
  *    pointing at them: every committed version still reads exactly as
  *    before, and [[vacuum]] sweeps the orphans (same marker-last
  *    discipline as the ingest-layout fingerprints);
  *  - [[vacuum]] deletes data files referenced ONLY by versions below
  *    `retainFrom` (and their manifests) — the storage-cost knob that
  *    bounds history, run explicitly like Delta's VACUUM. If the
  *    retention boundary is a delta manifest, vacuum first MATERIALIZES
  *    it to a full manifest so every retained chain still resolves.
  *
  * Scale shape: manifests are O(files) metadata text at checkpoints and
  * O(edits) between; no data is ever copied at commit time; a snapshot
  * read plans a plain multi-file parquet scan (pushdown/pruning
  * intact). Local-FS atomic link/rename stands in for the object-store
  * putIfAbsent a cluster deployment routes through its committer, as
  * with ParquetBatchSink itself.
  */
object SnapshotLog {
  import scala.jdk.CollectionConverters._

  /** A full checkpoint manifest is forced once every this many
    * versions; between checkpoints commits may be O(edit) deltas. */
  private val CheckpointEvery = 10

  private def logDir(dir: String) = java.nio.file.Paths.get(dir, "_graft_log")

  /** Manifest name: `v00001.manifest`. The legacy `-b000000` batchId
    * suffix is still READ (stores written before the header format),
    * but never written: the batchId now rides the `#batch=` body
    * header so racing commits of one version collide on the bare
    * name's atomic claim regardless of their batch tags. */
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
    // fast path: every post-header-format commit claims the bare name —
    // one stat instead of a directory listing (the listing fallback
    // covers legacy batch-suffixed names only)
    val bare = logDir(dir).resolve(f"v$v%05d.manifest")
    if (java.nio.file.Files.exists(bare)) bare
    else {
      val name = manifestNames(dir).collectFirst {
        case n @ ManifestName(vv, _) if vv.toInt == v => n
      }.getOrElse(f"v$v%05d.manifest")
      logDir(dir).resolve(name)
    }
  }

  /** All committed versions, ascending (empty if none). */
  def versions(dir: String): Seq[Int] =
    manifestNames(dir)
      .collect { case ManifestName(v, _) => v.toInt }.sorted

  /** A TYPED per-file column statistic — the stats-in-log currency for
    * the column types a plain long range can't carry (round-19 verdict
    * #1: a real 100 TB table prunes on event-TIME first, and before
    * this every timestamp/string/double predicate fell to a
    * conservative full read on stats-planned paths). `min`/`max` are
    * ENCODED text:
    *  - `ts`  — epoch MICROS as decimal text (exact; MILLIS/NANOS
    *    footer stats normalize conservatively: floor(min), ceil(max));
    *  - `dbl` — `java.lang.Double.toString` (exact round-trip; floats
    *    widen; columns whose footer min/max is NaN carry no stat);
    *  - `str` — Delta-style truncation: min = 32-char prefix (a prefix
    *    is <= the full string, a sound lower bound), max = 32-char
    *    prefix with the last char BUMPED (>= every string under the
    *    prefix, a sound upper bound). Only kept when the footer
    *    min/max are pure ASCII: parquet orders binary stats by
    *    UNSIGNED BYTE, probes compare Java strings by UTF-16 char, and
    *    the two agree on bounds exactly when the stored bounds are
    *    ASCII (any file value beyond a differing ASCII byte stays on
    *    the same side in both orders) — non-ASCII bounds drop to the
    *    conservative read instead of risking a wrong prune.
    * Bounds may be conservative (truncation), never tighter than the
    * data — pruning on them is semantically invisible, like the long
    * ranges. */
  private[graft] final case class TypedRange(tag: String,
                                             min: String, max: String) {
    def canIntersectTs(lo: Long, hi: Long): Boolean =
      max.toLong >= lo && min.toLong <= hi
    def canIntersectDbl(lo: Double, hi: Double): Boolean =
      max.toDouble >= lo && min.toDouble <= hi
    def canIntersectStr(lo: String, hi: String): Boolean =
      max >= lo && min <= hi
    def canIntersectDec(lo: java.math.BigDecimal,
                        hi: java.math.BigDecimal): Boolean =
      new java.math.BigDecimal(max).compareTo(lo) >= 0 &&
        new java.math.BigDecimal(min).compareTo(hi) <= 0
  }

  /** One commit's freshly-collected per-file stats: the LONG ranges
    * (`#range:` headers — ints widen) and the typed ranges (`#tstat:`
    * headers), both from ONE footer pass at commit time. */
  private[graft] final case class FileStats(
      ranges: Map[(String, String), (Long, Long)],
      typed: Map[(String, String), TypedRange])
  private[graft] object FileStats {
    val empty: FileStats = FileStats(Map.empty, Map.empty)
  }

  /** One parsed manifest: batch tag, delta flag, body lines, stats
    * ranges (long + typed), this version's CDC change files, and the
    * table schema as of this version (JSON; every post-r19 commit
    * carries it, so schema resolution is O(1) log text — the Delta
    * schema-in-log idea; legacy manifests resolve None and readers
    * fall back to parquet footers). */
  private[graft] final case class Manifest(
      batch: Option[Long], isDelta: Boolean, body: Seq[String],
      ranges: Map[(String, String), (Long, Long)],
      tranges: Map[(String, String), TypedRange],
      cdc: Seq[String], schemaJson: Option[String])

  /** Manifest-file READ counter — spec observability for the
    * log-maintenance-cost claim (cache hits don't count; only actual
    * file IO). */
  private[graft] val manifestFileReads =
    new java.util.concurrent.atomic.AtomicLong

  /** Parsed-manifest cache, validated by (mtime, size) stat: committed
    * manifests are immutable (vacuum's boundary materialization
    * rewrites one to an equivalent FULL form — mtime is preserved but
    * the size changes, so the cache re-reads). Bounded LRU so a
    * long-lived process over many stores stays O(1) memory. */
  private val manifestCache =
    new java.util.LinkedHashMap[(String, Int), (Long, Long, Manifest)](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Int), (Long, Long, Manifest)])
          : Boolean = size() > 1024
    }

  /** One manifest file, parsed (through the stat-validated cache). */
  private def readManifestFile(dir: String, v: Int): Manifest = {
    val p = manifestPath(dir, v)
    require(java.nio.file.Files.exists(p),
      s"no version $v at $dir (have ${versions(dir).mkString(",")})" +
        " — vacuumed or never committed")
    val mtime = java.nio.file.Files.getLastModifiedTime(p).toMillis
    val size = java.nio.file.Files.size(p)
    manifestCache.synchronized {
      Option(manifestCache.get((dir, v))) match {
        case Some((mt, sz, m)) if mt == mtime && sz == size => return m
        case _ => ()
      }
    }
    manifestFileReads.incrementAndGet()
    val raw = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    val (headers, body) = raw.partition(_.startsWith("#"))
    val headerBatch = headers.collectFirst {
      case h if h.startsWith("#batch=") => h.stripPrefix("#batch=").toLong
    }
    // legacy stores carried the batchId in the file NAME
    val nameBatch = p.getFileName.toString match {
      case ManifestName(_, b) if b != null => Some(b.toLong)
      case _                               => None
    }
    val ranges = headers.collect {
      case h if h.startsWith("#range:") =>
        // POSITIONAL parse: file = first token (our own names, never
        // ':'), min/max = last two, column = middle tokens REJOINED —
        // a user column whose dotted path contains ':' round-trips
        // instead of failing a fixed 4-way destructure and rendering
        // the committed store unreadable (round-18 advice #1)
        val toks = h.stripPrefix("#range:").split(":")
        require(toks.length >= 4, s"malformed range header: $h")
        (toks.head, toks.slice(1, toks.length - 2).mkString(":")) ->
          (toks(toks.length - 2).toLong, toks(toks.length - 1).toLong)
    }.toMap
    // typed stats: fixed 5-token layout after the prefix — tag, then
    // base64url(file/col/min/max), so a ':' or newline in a column
    // name or a STRING bound can never corrupt the parse (the
    // positional-rejoin trick above doesn't extend to bounds that are
    // themselves arbitrary text)
    val tranges = headers.collect {
      case h if h.startsWith("#tstat:") =>
        val toks = h.stripPrefix("#tstat:").split(":")
        require(toks.length == 5, s"malformed tstat header: $h")
        def dec(x: String) = new String(
          java.util.Base64.getUrlDecoder.decode(x), "UTF-8")
        (dec(toks(1)), dec(toks(2))) ->
          TypedRange(toks(0), dec(toks(3)), dec(toks(4)))
    }.toMap
    val cdc = headers.collect {
      case h if h.startsWith("#cdc:") => h.stripPrefix("#cdc:")
    }
    val schemaJson = headers.collectFirst {
      case h if h.startsWith("#schema=") => h.stripPrefix("#schema=")
    }
    val m = Manifest(headerBatch.orElse(nameBatch),
      headers.contains("#delta"), body, ranges, tranges, cdc, schemaJson)
    manifestCache.synchronized {
      manifestCache.put((dir, v), (mtime, size, m))
    }
    m
  }

  /** The max batchId tagged on manifests of versions BELOW `belowV` —
    * what [[vacuum]] must capture before deleting those manifests
    * (tags on RETAINED manifests stay readable by [[latestBatch]]).
    * ALWAYS consulted, never skipped on a persisted BATCH_HWM: the
    * mark is written after the claim, so a crash (or a racing-writer
    * interleave) can leave it one batch LOW — trusting it alone would
    * delete the tagged manifest and let a replayed trigger re-append
    * (review finding, r19). Cost: batchIds rise with versions, so the
    * max tag among the deleted versions is on the NEWEST tagged one —
    * scan DESCENDING and stop at the first tag, O(untagged suffix)
    * reads on a streamed store (one, in the common all-tagged case). */
  private def maxBatchBelow(dir: String, belowV: Int): Long =
    versions(dir).filter(_ < belowV).reverseIterator
      .map(v => readManifestFile(dir, v).batch)
      .collectFirst { case Some(b) => b }
      .getOrElse(-1L)

  /** Test hook: evict a store's parsed manifests so a spec can measure
    * the FRESH-PROCESS manifest-read cost of an operation. */
  private[graft] def dropCachedManifests(dir: String): Unit =
    manifestCache.synchronized {
      val it = manifestCache.keySet().iterator()
      while (it.hasNext) if (it.next()._1 == dir) it.remove()
    }

  /** The NEWEST batch-tagged manifest's (batchId, version) — batchIds
    * rise with versions (each trigger commits a later version), so
    * the high-water batch is on the newest tagged manifest: scan
    * versions DESCENDING and stop at the first tag. O(untagged tail)
    * per trigger instead of O(versions) full-log reads (review:
    * batchVersions per trigger went quadratic on a long-lived
    * stream). */
  private def latestBatch(dir: String): Option[(Long, Int)] =
    versions(dir).reverseIterator
      .map(v => readManifestFile(dir, v).batch.map(_ -> v))
      .collectFirst { case Some(bv) => bv }

  def latestVersion(dir: String): Int = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"snapshot log at $dir has no committed version")
    vs.max
  }

  /** A version's commit time = its manifest's mtime (stamped by the
    * atomic claim; [[versionAsOf]]'s clock) — what the change feed
    * stamps on `_change_timestamp`. */
  private[graft] def commitTimeMillis(dir: String, v: Int): Long =
    java.nio.file.Files.getLastModifiedTime(manifestPath(dir, v)).toMillis

  /** Apply a delta manifest's `+name`/`-name` edits to the previous
    * version's resolved line list: removals drop their lines wherever
    * they sit (order of the kept lines is preserved — a `dv:` entry
    * keeps masking exactly the files committed before it), additions
    * append at the END in delta order (exactly where every commit here
    * appends, after every existing dv). */
  private def applyDelta(prev: Seq[String], edits: Seq[String]): Seq[String] = {
    val removed = edits.collect {
      case e if e.startsWith("-") => e.substring(1) }.toSet
    val added = edits.collect { case e if e.startsWith("+") => e.substring(1) }
    require(removed.size + added.size == edits.size,
      s"malformed delta edits: ${edits.filterNot(e =>
        e.startsWith("+") || e.startsWith("-"))}")
    prev.filterNot(removed.contains) ++ added
  }

  /** The manifest entries of version `v`, RESOLVED (delta chains are
    * applied onto their checkpoint base): plain data-file names, plus
    * `dv:<column>:<file>` deletion-vector entries (merge-on-read
    * deletes — see [[deleteWhereMoR]]). Cost: one O(files) checkpoint
    * read + at most [[CheckpointEvery]]−1 O(edit) delta reads. */
  def manifest(dir: String, v: Int): Seq[String] = {
    val m = readManifestFile(dir, v)
    if (!m.isDelta) m.body
    else applyDelta(manifest(dir, v - 1), m.body)
  }

  /** Per-(file, column) [min, max] ranges as of version `v`, resolved
    * like [[manifest]] (a checkpoint carries the full live map, a
    * delta adds its new files' entries) — the LOG-EMBEDDED statistics
    * every stats-planned operation here consults BEFORE falling back
    * to a parquet footer: at 100 TB the difference between the driver
    * planning a delete/merge/skipping read from O(files) log TEXT and
    * opening O(files) remote footers per operation (the Delta
    * stats-in-log idea). Entries for files no longer live are simply
    * never consulted. Legacy stores (no `#range:` headers) resolve to
    * an empty map and every probe falls back to the footer. */
  private[graft] def fileRanges(dir: String, v: Int)
      : Map[(String, String), (Long, Long)] = {
    val m = readManifestFile(dir, v)
    if (!m.isDelta || v <= 1) m.ranges
    else fileRanges(dir, v - 1) ++ m.ranges
  }

  /** Typed sibling of [[fileRanges]]: per-(file, column) [[TypedRange]]
    * stats as of version `v`, resolved through the same
    * checkpoint/delta chain. */
  private[graft] def fileTypedRanges(dir: String, v: Int)
      : Map[(String, String), TypedRange] = {
    val m = readManifestFile(dir, v)
    if (!m.isDelta || v <= 1) m.tranges
    else fileTypedRanges(dir, v - 1) ++ m.tranges
  }

  /** The table schema as of version `v`, straight off the manifest's
    * `#schema=` header (O(1) log text — no footer opens); None on
    * stores written before the header existed (readers fall back to
    * parquet footers). */
  private[graft] def tableSchema(dir: String, v: Int)
      : Option[org.apache.spark.sql.types.StructType] =
    readManifestFile(dir, v).schemaJson.map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** This version's CDC change files (`#cdc:` headers) — the explicit
    * row-level change record a DML commit writes alongside its
    * manifest; empty for appends/compactions/legacy versions. */
  private[graft] def cdcFiles(dir: String, v: Int): Seq[String] =
    readManifestFile(dir, v).cdc

  /** A version's OWN manifest-header LONG ranges — covers exactly the
    * files that version contributes to the change feed (its appended
    * data files ride its delta's headers, its CDC change files are
    * kept live for this purpose; a checkpoint's map contains them
    * too). The feed's file-pruning source: O(1) log text per file,
    * zero footer IO. */
  private[sources] def versionStats(dir: String, v: Int)
      : Map[(String, String), (Long, Long)] =
    readManifestFile(dir, v).ranges

  /** Delta-chain length ending at version `v` (0 if `v` is a full
    * checkpoint manifest) — what the commit path consults to force a
    * checkpoint every [[CheckpointEvery]] versions. */
  private def deltaDepth(dir: String, v: Int): Int =
    if (v < 1) 0
    else if (!readManifestFile(dir, v).isDelta) 0 // full: chain ends
    else 1 + deltaDepth(dir, v - 1)

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

  /** Commit version `v` — tmp write + ATOMIC CLAIM of the bare
    * manifest name, the LAST step of any append/compaction so a crash
    * before it leaves every committed version intact. The claim is a
    * hard-link creation (create-if-absent): of two writers racing the
    * same version — in-process or CROSS-PROCESS — exactly one wins;
    * the loser gets a conflict error and its data files stay
    * unreferenced orphans for [[vacuum]].
    *
    * `lines` is always the FULL resolved list; when `delta` is given
    * and the chain since the last checkpoint is short enough, only the
    * O(edit) delta body is written (the full list is still what
    * [[manifest]] resolves to — asserted here at commit time, so a
    * divergent delta can never be committed). Line ORDER is semantic
    * and preserved: a `dv:` deletion-vector entry masks only the data
    * files listed BEFORE it, so rows re-inserted by a later append
    * stay visible. */
  private[graft] def commitManifest(dir: String, v: Int, lines: Seq[String],
                                    batchId: Option[Long] = None,
                                    delta: Option[Seq[String]] = None,
                                    stats: FileStats = FileStats.empty,
                                    cdc: Seq[String] = Seq.empty,
                                    schema: Option[
                                      org.apache.spark.sql.types.StructType]
                                      = None): Unit = {
    require(v == versions(dir).lastOption.getOrElse(0) + 1,
      s"version $v is not the next version at $dir")
    java.nio.file.Files.createDirectories(logDir(dir))
    val asDelta = delta.isDefined && v > 1 &&
      deltaDepth(dir, v - 1) + 1 < CheckpointEvery
    if (asDelta) {
      val check = applyDelta(manifest(dir, v - 1), delta.get)
      require(check == lines,
        s"delta for version $v does not resolve to its full line list")
    }
    // a delta records only ITS files' ranges; a checkpoint carries the
    // whole live map forward (restricted to this version's files), so
    // range resolution never has to walk past a checkpoint — mirroring
    // the file-list contract exactly. A version's OWN CDC change files
    // keep their stats too: the change feed prunes its file list by
    // key range off these headers (a tailed 100 TB store serves a
    // range-scoped sync from the few change files that can intersect).
    val live = dataEntries(lines).toSet ++ cdc
    val allRanges =
      if (asDelta) stats.ranges
      else (if (v > 1) fileRanges(dir, v - 1) else
        Map.empty[(String, String), (Long, Long)]) ++ stats.ranges
    val rangeHeaders = allRanges.toSeq
      .filter { case ((f, _), _) => live.contains(f) }
      .sortBy(_._1)
      .map { case ((f, c), (mn, mx)) => s"#range:$f:$c:$mn:$mx" }
    val allTyped =
      if (asDelta) stats.typed
      else (if (v > 1) fileTypedRanges(dir, v - 1) else
        Map.empty[(String, String), TypedRange]) ++ stats.typed
    val tstatHeaders = typedHeaders(allTyped, live)
    // the table schema rides EVERY manifest (an O(columns) JSON line):
    // an explicit schema (appends merge theirs in) or the previous
    // version's, carried forward — so schema resolution at any version
    // is one header read, never a footer storm
    val schemaJson = schema.map(_.json).orElse(
      if (v > 1) readManifestFile(dir, v - 1).schemaJson else None)
    val headers = batchId.map(b => s"#batch=$b").toSeq ++
      (if (asDelta) Seq("#delta") else Seq.empty) ++
      cdc.map(f => s"#cdc:$f") ++
      schemaJson.map(j => s"#schema=$j").toSeq ++
      rangeHeaders ++ tstatHeaders
    val body = headers ++ (if (asDelta) delta.get else lines)
    val token = java.util.UUID.randomUUID().toString.take(8)
    val tmp = logDir(dir).resolve(f"v$v%05d.$token.tmp")
    java.nio.file.Files.write(tmp,
      (body.mkString("\n") + "\n").getBytes("UTF-8"))
    val target = logDir(dir).resolve(f"v$v%05d.manifest")
    try java.nio.file.Files.createLink(target, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        java.nio.file.Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"version $v at $dir was concurrently committed by another " +
            "writer — this commit lost the claim; its files are " +
            "unreferenced orphans (vacuum sweeps them)")
    }
    java.nio.file.Files.deleteIfExists(tmp)
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

  /** The previous table schema extended with an append's NEW columns
    * (matched by name; an existing field keeps its type — the
    * column-add evolution the mergeSchema read implements, stated in
    * log text). */
  private def evolvedSchema(prev: Option[org.apache.spark.sql.types.StructType],
                            df: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    prev match {
      case None => df
      case Some(p) =>
        val have = p.fieldNames.toSet
        org.apache.spark.sql.types.StructType(
          p.fields ++ df.fields.filterNot(f => have.contains(f.name)))
    }

  // ---- COLUMN MAPPING (rename/drop schema evolution) ----------------
  //
  // Delta's column-mapping idea in miniature: the schema-in-log fields
  // carry a STABLE PHYSICAL name (StructField metadata key
  // "graft.physical") naming the column as written in the parquet
  // files; the field's own name is the LOGICAL, user-visible one.
  // RENAME changes only the logical name (history reads through the
  // new name with data intact — no file is rewritten); DROP removes
  // the field (reads project the physical column away); a column ADDED
  // in mapped mode gets a fresh version-suffixed physical, so reusing
  // a dropped column's NAME can never resurrect the dropped data.
  // Stores start UNMAPPED (physical == logical, no metadata — the
  // pre-r20 behavior, byte-identical schemas); the first rename/drop
  // upgrades every field to an explicit physical.

  private val PhysicalKey = "graft.physical"

  private[graft] def physicalName(f: org.apache.spark.sql.types.StructField)
      : String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  private[graft] def isMapped(sc: org.apache.spark.sql.types.StructType)
      : Boolean = sc.fields.exists(_.metadata.contains(PhysicalKey))

  private def withPhysical(f: org.apache.spark.sql.types.StructField,
                           phys: String)
      : org.apache.spark.sql.types.StructField =
    f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(f.metadata).putString(PhysicalKey, phys).build())

  /** Every field with an EXPLICIT physical (the mapped-mode upgrade;
    * idempotent). */
  private def upgradeToMapped(sc: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      sc.fields.map(f => withPhysical(f, physicalName(f))))

  /** The head schema, REQUIRED (rename/drop need schema-in-log). */
  private def headSchemaRequired(dir: String, v: Int)
      : org.apache.spark.sql.types.StructType =
    tableSchema(dir, v).getOrElse(throw new IllegalStateException(
      s"store at $dir carries no #schema= header at version $v — " +
        "column mapping needs schema-in-log (commit one append first)"))

  /** Translate a caller's LOGICAL column name to the PHYSICAL one the
    * files (and the stats headers) use — identity on unmapped stores
    * and unknown names. */
  private def toPhysical(dir: String, v: Int, column: String): String =
    tableSchema(dir, v) match {
      case Some(sc) if isMapped(sc) =>
        sc.fields.find(_.name == column).map(physicalName).getOrElse(column)
      case _ => column
    }

  /** RENAME a column — a METADATA-ONLY commit (empty delta, same file
    * list): the field keeps its physical name, so every retained
    * version's data reads through the new logical name with zero file
    * IO, stats keep resolving (they are keyed physical), and the
    * change feed surfaces the column under the new name across the
    * whole tailed range. Returns the new version. */
  def renameColumn(s: SparkSession, dir: String,
                   oldName: String, newName: String): Int = {
    val cur = latestVersion(dir)
    val sc = upgradeToMapped(headSchemaRequired(dir, cur))
    require(sc.fieldNames.contains(oldName),
      s"no column '$oldName' at $dir (have ${sc.fieldNames.mkString(",")})")
    require(!sc.fieldNames.contains(newName),
      s"column '$newName' already exists at $dir")
    val renamed = org.apache.spark.sql.types.StructType(sc.fields.map(f =>
      if (f.name == oldName) f.copy(name = newName) else f))
    val v = cur + 1
    commitManifest(dir, v, manifest(dir, cur), delta = Some(Seq.empty),
      schema = Some(renamed))
    v
  }

  /** DROP a column — metadata-only, like [[renameColumn]]: the
    * physical column stays in the files (history is intact; time
    * travel to a pre-drop version still reads it) and every read at or
    * after this version projects it away. A column ADDED later under
    * the same logical name gets a FRESH physical, so the dropped data
    * can never silently resurrect. Returns the new version. */
  def dropColumn(s: SparkSession, dir: String, name: String): Int = {
    val cur = latestVersion(dir)
    val sc = upgradeToMapped(headSchemaRequired(dir, cur))
    require(sc.fieldNames.contains(name),
      s"no column '$name' at $dir (have ${sc.fieldNames.mkString(",")})")
    require(sc.fields.length > 1,
      s"cannot drop the last column of $dir")
    val dropped = org.apache.spark.sql.types.StructType(
      sc.fields.filterNot(_.name == name))
    val v = cur + 1
    commitManifest(dir, v, manifest(dir, cur), delta = Some(Seq.empty),
      schema = Some(dropped))
    v
  }

  /** Mapped-mode read projection: the version's schema decides the
    * columns — each logical field reads its physical column (NULL
    * where every kept file predates it), dropped physicals project
    * away. Identity on unmapped stores. */
  private def projectLogical(dir: String, v: Int, df: DataFrame): DataFrame =
    tableSchema(dir, v) match {
      case Some(sc) if isMapped(sc) =>
        val have = df.columns.toSet
        df.select(sc.fields.toSeq.map { f =>
          val p = physicalName(f)
          if (have.contains(p)) org.apache.spark.sql.functions.col(p).as(f.name)
          else org.apache.spark.sql.functions.lit(null)
            .cast(f.dataType).as(f.name)
        }: _*)
      case _ => df
    }

  private def headIsMapped(dir: String, v: Int): Boolean =
    tableSchema(dir, v).exists(isMapped)

  /** Mapped-mode WRITE translation: each logical df column writes
    * under its schema physical; a NEW column gets a fresh
    * version-suffixed physical (`<name>_g<version>`), so re-adding a
    * dropped column's name can never resurrect the dropped files'
    * data. Identity (and no assignments) on unmapped stores. */
  private def translateForWrite(df: DataFrame,
                                prev: Option[org.apache.spark.sql.types.StructType],
                                nominal: Int)
      : (DataFrame, Map[String, String]) =
    prev match {
      case Some(p) if isMapped(p) =>
        val physBy = p.fields.map(f => f.name -> physicalName(f)).toMap
        val newPhys = df.schema.fieldNames.filterNot(physBy.contains)
          .map(n => n -> s"${n}_g$nominal").toMap
        (df.select(df.columns.toSeq.map(c => org.apache.spark.sql.functions
           .col(c).as(physBy.getOrElse(c, newPhys(c)))): _*), newPhys)
      case _ => (df, Map.empty)
    }

  /** The evolved logical schema of an append on a possibly-mapped
    * head. `newPhys` is what the staged files were written with; if a
    * RACING commit mapped/evolved the schema incompatibly since
    * staging (same logical under a different physical), committing
    * would silently NULL this append's column — fail loud for a
    * re-run instead. */
  private def evolvedForAppend(prev: Option[org.apache.spark.sql.types.StructType],
                               df: org.apache.spark.sql.types.StructType,
                               newPhys: Map[String, String],
                               dir: String)
      : org.apache.spark.sql.types.StructType =
    prev match {
      case Some(p) if isMapped(p) =>
        val physBy = p.fields.map(f => f.name -> physicalName(f)).toMap
        df.fields.filter(f => physBy.contains(f.name)).foreach { f =>
          val staged = newPhys.getOrElse(f.name, physBy(f.name))
          require(physBy(f.name) == staged,
            s"concurrent schema evolution at $dir: column '${f.name}' " +
              s"now maps to physical '${physBy(f.name)}' but this append " +
              s"staged it as '$staged' — re-run the append")
        }
        org.apache.spark.sql.types.StructType(
          p.fields ++ df.fields.filterNot(f => physBy.contains(f.name))
            .map { f =>
              val phys = newPhys.getOrElse(f.name, f.name)
              require(!p.fields.exists(g => physicalName(g) == phys),
                s"concurrent schema evolution at $dir: physical '$phys' " +
                  "is already taken — re-run the append")
              withPhysical(f, phys)
            })
      case _ => evolvedSchema(prev, df)
    }
  // -------------------------------------------------------------------

  private def dataFiles(dir: String): Set[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("."))
      .map(_.getName).toSet
  }

  /** Append `df` and commit the next version = previous files +
    * exactly the files this append staged in (an O(edit) delta
    * manifest between checkpoints). Returns the new version number.
    *
    * MULTI-WRITER SAFE end to end: the data files stage under a
    * per-attempt unique token (each writer attributes exactly its own
    * files — a directory-diff attribution would swallow a concurrent
    * writer's files), and the commit AUTO-RETRIES on a lost claim: an
    * append only ADDS files, so it commutes with whatever claimed the
    * contested version (another append, a compaction, a delete — none
    * of them reference the not-yet-committed files); losing just
    * means recompute against the new head and re-claim (Delta's
    * append conflict resolution). Rewrites (compaction/delete/merge)
    * deliberately do NOT retry: their touched set was planned against
    * the old head and must be re-planned by the caller. */
  def appendVersion(df: DataFrame, dir: String): Int = {
    val s = df.sparkSession
    // first append into a fresh table: the staged move needs the
    // directory (the sink used to create it implicitly — review #6)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val tmp = dir + "_snapappend_tmp" + rewriteToken()
    val nominal = versions(dir).lastOption.getOrElse(0) + 1
    // mapped stores write PHYSICAL column names (identity otherwise)
    val (toWrite, newPhys) = translateForWrite(df,
      versions(dir).lastOption.flatMap(tableSchema(dir, _)), nominal)
    toWrite.write.mode(SaveMode.Overwrite).parquet(tmp)
    val added = moveRewrite(s, dir, tmp, "append", nominal,
      keepOneIfAllEmpty = true)
    require(added.nonEmpty, "append committed no files")
    val stats = collectStats(s, dir, added)
    var attempt = 0
    while (true) {
      val prevV = versions(dir).lastOption
      val prev = prevV.map(manifest(dir, _)).getOrElse(Seq())
      val v = prevV.getOrElse(0) + 1
      // on a RETRY the staged files' embedded nominal version may now
      // be <= the committed head, which drops them out of vacuum's
      // in-flight guard — a zero-grace vacuum racing this window can
      // sweep them; verify before claiming so the failure is a loud
      // re-run, never a committed version pointing at missing files
      require(added.forall(f => java.nio.file.Files.exists(
          java.nio.file.Paths.get(dir, f))),
        s"staged append files at $dir were swept (a zero-grace vacuum " +
          "raced this writer's claim retry) — re-run the append")
      try {
        commitManifest(dir, v, prev ++ added,
          delta = Some(added.map("+" + _)), stats = stats,
          schema = Some(evolvedForAppend(
            prevV.flatMap(tableSchema(dir, _)), df.schema, newPhys, dir)))
        verifyClaimOrRollback(dir, v, added)
        return v
      } catch {
        case e: Exception if attempt < 10 && e.getMessage != null && (
            e.getMessage.contains("concurrently committed") ||
            e.getMessage.contains("not the next version")) =>
          attempt += 1 // lost the race: re-read the head and re-claim
      }
    }
    -1 // unreachable
  }

  /** EXACTLY-ONCE streamed appends: one committed version per
    * micro-batch, `foreachBatch` over the staged-append + manifest
    * layer. The crash matrix the batch-tagged manifests close:
    *  - crash after the staged files move in but BEFORE the manifest
    *    commit → the moved data files are referenced by nothing; the
    *    replayed trigger appends afresh and commits, the first
    *    attempt's files stay invisible orphans until [[vacuum]];
    *  - crash AFTER the manifest commit but before the checkpoint
    *    commit → the replayed trigger finds its own batchId already
    *    committed (the id rides the manifest's atomic claim, as a
    *    `#batch=` body header) and no-ops — never a duplicate append;
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
    val newest = latestBatch(dir)
    // the high-water mark is max(newest tagged manifest, the vacuum-
    // persisted BATCH_HWM) — retention may have deleted old tagged
    // manifests, and without the persisted mark a replayed batch would
    // re-append
    val maxB = math.max(newest.map(_._1).getOrElse(-1L),
      batchHighWater(dir))
    // a crashed trigger replays only the LAST batch, so the no-op
    // branch is exactly batchId == the committed high-water mark; any
    // batchId BELOW it (committed or not) means a fresh checkpoint is
    // running over an old store — fail loud, never fork the history
    // (the mergeApplyStream generation discipline). A vacuumed tagged
    // manifest leaves no version to return; the latest version already
    // CONTAINS the replayed batch's rows, so it serves.
    if (batchId == maxB)
      newest.collect { case (b, v) if b == batchId => v }
        .getOrElse(latestVersion(dir))
    else {
      require(batchId > maxB,
        s"snapshot log at $dir already holds batch > $batchId " +
          "— stale generation; clear the store or keep the original " +
          "checkpoint")
      // unique-token staging, like appendVersion: a directory-diff
      // attribution would swallow a CONCURRENT batch appender's files
      // into this version's manifest and then double-commit them on
      // its retry (round-18 review #1)
      val s = batch.sparkSession
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val tmp = dir + "_snapappend_tmp" + rewriteToken()
      val nominal = versions(dir).lastOption.getOrElse(0) + 1
      val (toWrite, newPhys) = translateForWrite(batch,
        versions(dir).lastOption.flatMap(tableSchema(dir, _)), nominal)
      toWrite.write.mode(SaveMode.Overwrite).parquet(tmp)
      val added = moveRewrite(s, dir, tmp, "append", nominal,
        keepOneIfAllEmpty = true)
      val prevV = versions(dir).lastOption
      val prev = prevV.map(manifest(dir, _)).getOrElse(Seq())
      val v = prevV.getOrElse(0) + 1
      commitManifest(dir, v, prev ++ added, Some(batchId),
        delta = Some(added.map("+" + _)),
        stats = collectStats(s, dir, added),
        schema = Some(evolvedForAppend(
          prevV.flatMap(tableSchema(dir, _)), batch.schema, newPhys, dir)))
      // persist the streamed-batch high-water mark AT COMMIT TIME (not
      // just at vacuum): with it, vacuum never has to walk every
      // manifest for the max tag — O(1) instead of O(versions) log
      // reads (round-18 verdict #6). Written AFTER the claim: a crash
      // in between leaves the mark stale-low, which the tagged-manifest
      // scan already covers.
      persistBatchHighWater(dir, batchId)
      v
    }
  }

  /** Persist the batch high-water mark if it raises the stored value.
    * The read-then-move is NOT atomic: two racing writers can
    * interleave so the lower value lands last. That is safe here —
    * the mark is an advisory MAX layered under two authoritative
    * fallbacks: [[appendVersionForBatch]] takes max(mark, newest
    * tagged manifest), and [[vacuum]] re-captures any tag about to be
    * deleted via [[maxBatchBelow]] before persisting — so a
    * momentarily-lowered mark can never admit a replayed batch. */
  private val hwmLock = new Object
  private def persistBatchHighWater(dir: String, batchId: Long): Unit =
    // in-process writers serialize on the lock and RE-READ inside it,
    // so two same-JVM streamed writers can never regress the mark
    // (round-19 advice #4); cross-process the read-then-move stays
    // racy but monotone-in-practice, under the two authoritative
    // fallbacks documented above
    hwmLock.synchronized {
      if (batchId > batchHighWater(dir)) {
        val tmp = logDir(dir).resolve(s"BATCH_HWM.${rewriteToken()}.tmp")
        java.nio.file.Files.write(tmp, batchId.toString.getBytes("UTF-8"))
        java.nio.file.Files.move(tmp, logDir(dir).resolve("BATCH_HWM"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

  /** TIMESTAMP AS OF resolution: the largest version whose manifest
    * was committed at or before `tsMillis` (commit time = the manifest
    * file's mtime, stamped by the atomic claim itself — no separate
    * clock to drift). Fails loud for a timestamp before the first
    * commit, like Delta's. */
  def versionAsOf(dir: String, tsMillis: Long): Int = {
    val vs = versions(dir).filter { v =>
      java.nio.file.Files.getLastModifiedTime(manifestPath(dir, v))
        .toMillis <= tsMillis
    }
    require(vs.nonEmpty,
      s"no version at $dir committed at or before $tsMillis " +
        s"(earliest: ${versions(dir).headOption.getOrElse(-1)})")
    vs.max
  }

  /** Read the table as of a wall-clock instant — [[versionAsOf]] +
    * [[readVersion]]. */
  def readVersionAsOf(s: SparkSession, dir: String, tsMillis: Long,
                      mergeSchema: Boolean = false): DataFrame =
    readVersion(s, dir, versionAsOf(dir, tsMillis), mergeSchema)

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
    // a MAPPED store's read always merges file schemas (files span
    // physical generations by construction) and projects through the
    // version's logical schema; unmapped stores keep the exact
    // pre-mapping path
    if (headIsMapped(dir, v))
      projectLogical(dir, v,
        readLines(s, dir, manifest(dir, v), mergeSchema = true))
    else readLines(s, dir, manifest(dir, v), mergeSchema)

  /** The data-file rewrite HALF of a compaction: read the latest
    * snapshot, rewrite it into ~targetBytes files under distinct
    * per-attempt names, move them into the table directory, and
    * return their names WITHOUT committing. Factored out so the
    * crash-mid-compaction spec can stop exactly here — data files in
    * place, no manifest — and prove every committed version still
    * reads identically. The read MERGES file schemas: on a
    * schema-evolved store the compacted output materializes the
    * evolved column (NULLs where a file predated it) instead of
    * nondeterministically dropping it (round-17 advice #1). */
  private[graft] def writeCompacted(s: SparkSession, dir: String,
                                    targetBytes: Long,
                                    clusterBy: Option[String] = None,
                                    atVersion: Option[Int] = None)
      : Seq[String] = {
    val cur = atVersion.getOrElse(latestVersion(dir))
    val files = dataEntries(manifest(dir, cur))
    val totalBytes = files.map(f =>
      new java.io.File(dir, f).length()).sum
    val nFiles = math.max(1,
      math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = dir + s"_snapcompact_tmp" + rewriteToken()
    val src = readVersion(s, dir, cur, mergeSchema = true)
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
    * data skipping survives it. Commits a full checkpoint manifest
    * (its content is the whole live set anyway). Returns the new
    * version number. */
  def compactVersion(s: SparkSession, dir: String,
                     targetBytes: Long = 128L * 1024 * 1024,
                     clusterBy: Option[String] = None): Int = {
    val cur = latestVersion(dir)
    val lines = manifest(dir, cur)
    val moved = writeCompacted(s, dir, targetBytes, clusterBy, Some(cur))
    // commit with RE-PLAN on a lost claim: an interleaved APPEND
    // always commutes with a compaction (no predicate scope — the
    // compacted set plus the appended file equals either serial
    // order); an interleaved rewrite or MoR delete fails loud for a
    // caller re-plan (its effect is not in the compacted output).
    commitRewriteGeneral(s, dir, cur, lines,
      dataEntries(lines).toSet, moved, appendScope = None,
      stats = collectStats(s, dir, moved), cdc = Seq.empty,
      dropBaseDvs = true, forceFull = true)
  }

  /** Z-ORDER key of two LONG columns: each value min-max-normalizes to
    * 16 bits and the bits INTERLEAVE (a15 b15 a14 b14 ...), so sorting
    * by the key walks the Z space-filling curve — a range-partitioned
    * rewrite then gives every file a bounded footer [min, max] in BOTH
    * dimensions, and [[readVersionWhere]] prunes on EITHER column
    * (linear clustering buys pruning on one column by smearing the
    * other across every file; the multi-dimensional trade Delta's
    * OPTIMIZE ZORDER BY makes). Stated entirely with builtin
    * expressions (normalize, shift, mask, or) — stays inside
    * whole-stage codegen, no UDF. NULLs normalize to 0 (first curve
    * cell): conservative for pruning, invisible for correctness (the
    * read-side predicate still applies). */
  private def zorderKey(a: org.apache.spark.sql.Column, aMin: Long, aMax: Long,
                        b: org.apache.spark.sql.Column, bMin: Long, bMax: Long)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    def norm(c: org.apache.spark.sql.Column, lo: Long, hi: Long) = {
      val span = math.max(1L, hi - lo)
      // double-scaled (a raw (v-lo)*65535 overflows LONG on wide keys),
      // clamped to the 16-bit lattice
      least(greatest(
        ((coalesce(c, lit(lo)) - lit(lo)).cast("double") / lit(span.toDouble)
          * lit(65535.0)).cast("long"), lit(0L)), lit(65535L))
    }
    val ra = norm(a, aMin, aMax)
    val rb = norm(b, bMin, bMax)
    (0 until 16).map { i =>
      shiftleft(shiftright(ra, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(rb, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** Compact the latest snapshot Z-ORDERED on two LONG columns: the
    * rewrite range-partitions + sorts by [[zorderKey]], so data
    * skipping bites on BOTH columns after the rewrite. Same commit
    * shape as [[compactVersion]] (full checkpoint manifest, replaced
    * originals stay on disk for time travel). Returns the new
    * version. */
  def compactVersionZOrder(s: SparkSession, dir: String,
                           colA: String, colB: String,
                           targetBytes: Long = 128L * 1024 * 1024): Int = {
    import org.apache.spark.sql.functions._
    val cur = latestVersion(dir)
    val files = dataEntries(manifest(dir, cur))
    val totalBytes = files.map(f => new java.io.File(dir, f).length()).sum
    val nFiles = math.max(1,
      math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val src = readVersion(s, dir, cur, mergeSchema = true)
    // column bounds: one tiny agg — O(1) driver-side control values.
    // An empty (or all-null) snapshot has no curve to order by: the
    // rewrite degrades to a plain repartition so the compaction still
    // commits (delete-everything then z-order must not fail).
    val r = src.agg(min(col(colA)), max(col(colA)),
                    min(col(colB)), max(col(colB))).head
    val shaped =
      if (r.isNullAt(0) || r.isNullAt(2)) src.repartition(nFiles)
      else {
        val z = zorderKey(col(colA), r.getLong(0), r.getLong(1),
                          col(colB), r.getLong(2), r.getLong(3))
        src.withColumn("_graft_z", z)
          .repartitionByRange(nFiles, col("_graft_z"))
          .sortWithinPartitions(col("_graft_z"))
          .drop("_graft_z")
      }
    val tmp = dir + "_snapzorder_tmp" + rewriteToken()
    shaped.write.mode(SaveMode.Overwrite).parquet(tmp)
    val moved = moveRewrite(s, dir, tmp, "zorder", cur + 1,
      keepOneIfAllEmpty = true)
    // same re-plan contract as compactVersion: interleaved appends
    // commute, anything else fails loud
    val lines = manifest(dir, cur)
    commitRewriteGeneral(s, dir, cur, lines,
      dataEntries(lines).toSet, moved, appendScope = None,
      stats = collectStats(s, dir, moved), cdc = Seq.empty,
      dropBaseDvs = true, forceFull = true)
  }

  /** Footer-open counter — spec observability for the stats-in-log
    * claim: a probe that finds its range in the manifest headers never
    * opens a footer, and the spec pins the count at zero. */
  private[graft] val footerProbes = new java.util.concurrent.atomic.AtomicLong

  /** Render a typed-range map as sorted `#tstat:` headers. Layout:
    * `#tstat:<tag>:<b64(file)>:<b64(col)>:<b64(min)>:<b64(max)>` —
    * base64url keeps arbitrary column names and STRING bounds (which
    * may contain ':' or newlines) from corrupting the line format. */
  private def typedHeaders(typed: Map[(String, String), TypedRange],
                           live: Set[String]): Seq[String] = {
    def enc(x: String) = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(x.getBytes("UTF-8"))
    typed.toSeq
      .filter { case ((f, _), _) => live.contains(f) }
      .sortBy(_._1)
      .map { case ((f, c), r) =>
        s"#tstat:${r.tag}:${enc(f)}:${enc(c)}:${enc(r.min)}:${enc(r.max)}"
      }
  }

  /** Raw per-row-group stat, pre-encoding — folded across a file's
    * blocks, then encoded once into the header currency. */
  private sealed trait RawStat
  private final case class RawLong(lo: Long, hi: Long) extends RawStat
  private final case class RawTs(lo: Long, hi: Long) extends RawStat
  private final case class RawDbl(lo: Double, hi: Double) extends RawStat
  private final case class RawStr(lo: String, hi: String) extends RawStat
  private final case class RawDec(lo: java.math.BigDecimal,
                                  hi: java.math.BigDecimal) extends RawStat

  /** Extract one column chunk's raw stat by PHYSICAL + LOGICAL type:
    * INT64/INT32 (plain or int-annotated) → long; INT64 timestamps →
    * epoch micros (unit-normalized conservatively); DOUBLE/FLOAT →
    * double (NaN bounds dropped — parquet NaN stats are unreliable);
    * BINARY strings → raw UTF-8 text, ASCII-gated at encode time.
    * Anything else (INT96, decimals, nested) → None: conservative
    * read, never a wrong prune. */
  private def rawStatOf(
      c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData)
      : Option[RawStat] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val st = c.getStatistics
    if (st == null || !st.hasNonNullValue) return None
    val ann = c.getPrimitiveType.getLogicalTypeAnnotation
    (st.genericGetMin, st.genericGetMax) match {
      case (lo: java.lang.Long, hi: java.lang.Long) =>
        ann match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit match {
              case TimeUnit.MICROS => Some(RawTs(lo, hi))
              case TimeUnit.MILLIS =>
                Some(RawTs(lo * 1000L, hi * 1000L))
              case TimeUnit.NANOS => // floor min, ceil max: conservative
                Some(RawTs(Math.floorDiv(lo, 1000L),
                  Math.floorDiv(hi + 999L, 1000L)))
            }
          case null => Some(RawLong(lo, hi))
          case _: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
            Some(RawLong(lo, hi))
          case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            Some(RawDec(java.math.BigDecimal.valueOf(lo, d.getScale),
              java.math.BigDecimal.valueOf(hi, d.getScale)))
          case _ => None
        }
      case (lo: java.lang.Integer, hi: java.lang.Integer)
          if ann == null ||
            ann.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation] =>
        Some(RawLong(lo.longValue, hi.longValue))
      case (lo: java.lang.Integer, hi: java.lang.Integer)
          if ann.isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation] =>
        val sc = ann.asInstanceOf[
          LogicalTypeAnnotation.DecimalLogicalTypeAnnotation].getScale
        Some(RawDec(java.math.BigDecimal.valueOf(lo.longValue, sc),
          java.math.BigDecimal.valueOf(hi.longValue, sc)))
      case (lo: java.lang.Double, hi: java.lang.Double) =>
        if (lo.isNaN || hi.isNaN) None
        else Some(RawDbl(lo, hi))
      case (lo: java.lang.Float, hi: java.lang.Float) =>
        if (lo.isNaN || hi.isNaN) None
        else Some(RawDbl(lo.doubleValue, hi.doubleValue))
      case (lo: org.apache.parquet.io.api.Binary,
            hi: org.apache.parquet.io.api.Binary)
          if ann != null &&
            ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        Some(RawStr(new String(lo.getBytes, "UTF-8"),
          new String(hi.getBytes, "UTF-8")))
      case _ => None
    }
  }

  private def foldRaw(a: RawStat, b: RawStat): Option[RawStat] = (a, b) match {
    case (RawLong(l1, h1), RawLong(l2, h2)) =>
      Some(RawLong(math.min(l1, l2), math.max(h1, h2)))
    case (RawTs(l1, h1), RawTs(l2, h2)) =>
      Some(RawTs(math.min(l1, l2), math.max(h1, h2)))
    case (RawDbl(l1, h1), RawDbl(l2, h2)) =>
      Some(RawDbl(math.min(l1, l2), math.max(h1, h2)))
    case (RawStr(l1, h1), RawStr(l2, h2)) =>
      Some(RawStr(if (l1 <= l2) l1 else l2, if (h1 >= h2) h1 else h2))
    case (RawDec(l1, h1), RawDec(l2, h2)) =>
      Some(RawDec(if (l1.compareTo(l2) <= 0) l1 else l2,
        if (h1.compareTo(h2) >= 0) h1 else h2))
    case _ => None // mixed physical types across blocks: no stat
  }

  /** Fold a block list's raw stats into one, None on any mismatch. */
  private def foldRaws(raws: Seq[RawStat]): Option[RawStat] =
    raws.headOption.flatMap(h =>
      raws.tail.foldLeft(Option(h)) { (acc, r) =>
        acc.flatMap(foldRaw(_, r))
      })

  /** Delta-style string-bound truncation length. */
  private val StrStatLen = 32

  /** Smallest string `>= every string with this prefix`: truncate,
    * then BUMP the rightmost bumpable char and drop what follows; a
    * prefix of all-U+FFFF chars has no bump — no stat. */
  private[graft] def bumpedUpperBound(s: String): Option[String] = {
    if (s.length <= StrStatLen) return Some(s)
    val p = s.substring(0, StrStatLen).toCharArray
    var i = p.length - 1
    while (i >= 0 && p(i) == '\uffff') i -= 1
    if (i < 0) None
    else Some(new String(p, 0, i) + (p(i) + 1).toChar)
  }

  /** Encode a folded raw stat into the header currency; None = not
    * encodable (non-ASCII string bounds, unbumpable prefix). */
  private def encodeRaw(r: RawStat): Option[Either[(Long, Long), TypedRange]] =
    r match {
      case RawLong(lo, hi) => Some(Left((lo, hi)))
      case RawTs(lo, hi) =>
        Some(Right(TypedRange("ts", lo.toString, hi.toString)))
      case RawDbl(lo, hi) =>
        Some(Right(TypedRange("dbl", lo.toString, hi.toString)))
      case RawDec(lo, hi) =>
        Some(Right(TypedRange("dec", lo.toPlainString, hi.toPlainString)))
      case RawStr(lo, hi) =>
        if (!lo.forall(_ < 0x80) || !hi.forall(_ < 0x80)) None
        else bumpedUpperBound(hi).map(up =>
          Right(TypedRange("str",
            lo.substring(0, math.min(lo.length, StrStatLen)), up)))
    }

  /** Per-file footer stat of ONE column (any supported type) — the
    * FALLBACK path for legacy stores whose manifests predate the stat
    * headers; O(1) metadata per file. */
  private def footerStat(s: SparkSession, dir: String, file: String,
                         column: String)
      : Option[Either[(Long, Long), TypedRange]] = {
    footerProbes.incrementAndGet()
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(s"$dir/$file"),
      s.sessionState.newHadoopConf())
    val r = ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks.asScala
      val raws = blocks.flatMap(b =>
        b.getColumns.asScala
          .find(_.getPath.toDotString == column)
          .flatMap(rawStatOf))
      // a block without a stat for the column leaves the file's bound
      // unknowable — no stat (the all-blocks rule collectStats applies)
      if (raws.size != blocks.size) None
      else foldRaws(raws.toSeq).flatMap(encodeRaw)
    } finally r.close()
  }

  /** The log-first LONG range probe every stats-planned operation
    * routes through: manifest-header ranges (log text, zero file IO)
    * first, parquet footer as the legacy fallback. */
  private def rangeOf(s: SparkSession, dir: String,
                      known: Map[(String, String), (Long, Long)],
                      file: String, column: String): Option[(Long, Long)] =
    known.get((file, column)).orElse(
      footerStat(s, dir, file, column).collect { case Left(r) => r })

  /** Log-first TYPED probe (timestamp/double/string), footer fallback;
    * a stat of the wrong tag resolves None (conservative). */
  private def typedRangeOf(s: SparkSession, dir: String,
                           known: Map[(String, String), TypedRange],
                           file: String, column: String,
                           tag: String): Option[TypedRange] =
    known.get((file, column)).orElse(
        footerStat(s, dir, file, column).collect { case Right(r) => r })
      .filter(_.tag == tag)

  /** ALL stat-bearing column [min, max] ranges of freshly WRITTEN
    * files — long AND typed, one footer open per file, paid ONCE at
    * commit time (locally, next to the write), so every later skipping
    * read / delete / merge probe plans from the log without touching
    * storage. */
  private def collectStats(s: SparkSession, dir: String,
                           files: Seq[String]): FileStats = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val longs = scala.collection.mutable.Map[(String, String), (Long, Long)]()
    val typed = scala.collection.mutable.Map[(String, String), TypedRange]()
    files.foreach { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$dir/$f"),
        s.sessionState.newHadoopConf()))
      try {
        val nBlocks = r.getFooter.getBlocks.size()
        r.getFooter.getBlocks.asScala
          .flatMap(b => b.getColumns.asScala.flatMap(c =>
            rawStatOf(c).map(c.getPath.toDotString -> _)))
          .groupBy(_._1)
          .foreach { case (col, raws) =>
            // a column missing a stat in ANY block has no sound file
            // bound; a fold across mixed types yields none
            if (raws.size == nBlocks)
              foldRaws(raws.map(_._2).toSeq).flatMap(encodeRaw).foreach {
                case Left(lr)  => longs((f, col)) = lr
                case Right(tr) => typed((f, col)) = tr
              }
          }
      } finally r.close()
    }
    FileStats(longs.toMap, typed.toMap)
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
    val phys = toPhysical(dir, v, column)
    val known = fileRanges(dir, v)
    prunedVersionRead(s, dir, v,
      f => rangeOf(s, dir, known, f, phys)
        .forall { case (mn, mx) => mx >= lo && mn <= hi },
      org.apache.spark.sql.functions.col(phys).between(lo, hi))
  }

  /** [[readVersionWhere]] for a TIMESTAMP column, bounds in epoch
    * MICROS (inclusive) — prunes off the `ts` typed stats; the row
    * predicate compares against `timestamp_micros` literals, so the
    * pruned read stays semantically invisible. */
  def readVersionWhereTs(s: SparkSession, dir: String, v: Int,
                         column: String, loMicros: Long, hiMicros: Long)
      : (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
    val phys = toPhysical(dir, v, column)
    val known = fileTypedRanges(dir, v)
    prunedVersionRead(s, dir, v,
      f => typedRangeOf(s, dir, known, f, phys, "ts")
        .forall(_.canIntersectTs(loMicros, hiMicros)),
      col(phys).between(timestamp_micros(lit(loMicros)),
        timestamp_micros(lit(hiMicros))))
  }

  /** [[readVersionWhere]] for a STRING column (inclusive bounds) —
    * prunes off the `str` typed stats (truncated/bumped: conservative,
    * never tighter than the data). */
  def readVersionWhereStr(s: SparkSession, dir: String, v: Int,
                          column: String, lo: String, hi: String)
      : (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    val phys = toPhysical(dir, v, column)
    val known = fileTypedRanges(dir, v)
    prunedVersionRead(s, dir, v,
      f => typedRangeOf(s, dir, known, f, phys, "str")
        .forall(_.canIntersectStr(lo, hi)),
      col(phys).between(lit(lo), lit(hi)))
  }

  /** [[readVersionWhere]] for a DOUBLE/FLOAT column (inclusive
    * bounds) — prunes off the `dbl` typed stats. */
  def readVersionWhereDbl(s: SparkSession, dir: String, v: Int,
                          column: String, lo: Double, hi: Double)
      : (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    val phys = toPhysical(dir, v, column)
    val known = fileTypedRanges(dir, v)
    prunedVersionRead(s, dir, v,
      f => typedRangeOf(s, dir, known, f, phys, "dbl")
        .forall(_.canIntersectDbl(lo, hi)),
      col(phys).between(lit(lo), lit(hi)))
  }

  /** [[readVersionWhere]] for a DECIMAL column (inclusive bounds;
    * INT32/INT64-backed decimals — precision <= 18; wider decimals
    * carry no stat and read conservatively) — prunes off the `dec`
    * typed stats, exact unscaled comparison. */
  def readVersionWhereDec(s: SparkSession, dir: String, v: Int,
                          column: String, lo: java.math.BigDecimal,
                          hi: java.math.BigDecimal)
      : (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    val phys = toPhysical(dir, v, column)
    val known = fileTypedRanges(dir, v)
    prunedVersionRead(s, dir, v,
      f => typedRangeOf(s, dir, known, f, phys, "dec")
        .forall(_.canIntersectDec(lo, hi)),
      col(phys).between(lit(lo), lit(hi)))
  }

  /** The shared pruned-read core: `keepFile` decides per data file off
    * the stats (a file with NO resolvable stat must come back true —
    * conservative read); the row predicate is still applied to the
    * scanned rows, so pruning is semantically invisible. Returns
    * (frame, filesRead, filesTotal) so a caller/spec can pin that the
    * pruning actually bit. */
  private def prunedVersionRead(s: SparkSession, dir: String, v: Int,
                                keepFile: String => Boolean,
                                rowPred: org.apache.spark.sql.Column)
      : (DataFrame, Int, Int) = {
    val lines = manifest(dir, v)
    val files = dataEntries(lines)
    val keptSet = files.filter(keepFile).toSet
    val mapped = headIsMapped(dir, v)
    val df =
      if (keptSet.isEmpty)
        readVersion(s, dir, v).limit(0)
      // the pruned read keeps manifest ORDER (dv entries still mask
      // exactly the pruned files committed before them); on a mapped
      // store the row predicate binds to the PHYSICAL column, so it
      // applies BEFORE the logical projection
      else {
        val raw = readLines(s, dir,
          lines.filter(l => l.startsWith("dv:") || keptSet.contains(l)),
          mergeSchema = mapped)
        if (mapped) projectLogical(dir, v, raw.filter(rowPred))
        else raw
      }
    if (mapped) (df, keptSet.size, files.size)
    else (df.filter(rowPred), keptSet.size, files.size)
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

  /** Per-attempt random token for rewrite outputs: data files are
    * IMMUTABLE and uniquely named, so two concurrent rewriters (or a
    * crashed attempt and its retry) can never overwrite each other —
    * the round-17 advice #2 hole, where `deleteIfExists` on a
    * deterministic target name let the loser of a commit race destroy
    * the winner's just-committed data. Losers/crashes leave orphans;
    * [[vacuum]] sweeps them. */
  private def rewriteToken(): String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Close (best-effort) the check-then-claim window against a
    * zero-grace vacuum (round-19 advice #2): the pre-claim existence
    * check can still race a sweep, so RE-VERIFY after the claim; on a
    * miss, roll the claim back — delete this writer's own just-claimed
    * manifest (it is necessarily the head: the claim just won) — and
    * fail loud. Safe because a concurrent zero-grace vacuum already
    * violates the no-live-writers contract documented at [[vacuum]];
    * a loud rolled-back re-run beats a committed version referencing
    * missing files. Residual: a reader observing the manifest in the
    * instants before rollback — graceMillis = 0 REMAINS a
    * no-live-writers contract; this guard only makes its violation
    * detected-and-undone instead of silent corruption. */
  private def verifyClaimOrRollback(dir: String, v: Int,
                                    staged: Seq[String]): Unit = {
    val missing = staged.filterNot(f => java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, f)))
    if (missing.nonEmpty) {
      java.nio.file.Files.deleteIfExists(manifestPath(dir, v))
      manifestCache.synchronized { manifestCache.remove((dir, v)); () }
      throw new IllegalStateException(
        s"claimed version $v at $dir references swept files " +
          s"${missing.take(3).mkString(",")} — a zero-grace vacuum " +
          "raced this writer; the claim was rolled back, re-run the " +
          "operation")
    }
  }

  /** The shared rewrite-commit tail of compaction / COW delete /
    * merge: collect the tmp write's part files, drop zero-row outputs
    * (no stats — every later stats-planned operation would
    * conservatively scan/rewrite them forever), keep one if EVERYTHING
    * is empty and nothing else carries the schema, and move each under
    * a distinct per-attempt name (never overwriting: committed data is
    * immutable). */
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
    val token = rewriteToken()
    val moved = parts.sortBy(_.getName).zipWithIndex.map { case (f, i) =>
      val name = f"$prefix-v$v%05d-$token-p$i%05d.parquet"
      val target = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.move(f.toPath, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      name
    }.toSeq
    Option(new java.io.File(tmp).listFiles())
      .foreach(_.foreach(_.delete()))
    new java.io.File(tmp).delete()
    moved
  }

  /** Write a DML commit's ROW-LEVEL change record (Delta's
    * `_change_data/` idea): `changes` carries the affected rows in
    * table columns plus `_change_type` ∈ insert | delete |
    * update_preimage | update_postimage. The files ride the version's
    * manifest as `#cdc:` headers — per-version metadata, not table
    * content — so the change feed can emit the row-level effect of a
    * delete/merge instead of silence, and a replica tailing the feed
    * stays byte-equal through the FULL DML surface. Cost: one extra
    * O(changed rows) write per DML commit, zero on the read-the-table
    * path. Written BEFORE the manifest claim (commit-last discipline);
    * a lost claim leaves them as orphans for [[vacuum]]. */
  private def writeChangeFiles(s: SparkSession, dir: String, v: Int,
                               changes: DataFrame): Seq[String] = {
    val tmp = dir + "_snapcdc_tmp" + rewriteToken()
    changes.write.mode(SaveMode.Overwrite).parquet(tmp)
    moveRewrite(s, dir, tmp, "cdc", v, keepOneIfAllEmpty = false)
  }

  /** MERGE INTO at file granularity — q100's three-clause arbitration
    * PERSISTED through the snapshot log (the write half the batch
    * merge operator computes but never stores): a file is touched iff
    * its footer [min, max] can contain a SOURCE key (per-key range
    * probe, not the interval hull — inserts far outside the table
    * touch nothing); touched files rewrite through a full-outer
    * arbitration with the source (matched-update / matched-delete /
    * not-matched-insert), untouched files share verbatim into the new
    * manifest as the implicit 'kept' clause. Target shape: `keyCol`
    * long, `balCol` double; any OTHER columns the touched files carry
    * ride the rewrite untouched (mergeSchema read — an evolved column
    * is never dropped; inserts get NULLs for it). Source shape (key,
    * amt, action). Returns (newVersion, filesRewritten, filesKept). */
  def mergeInto(s: SparkSession, dir: String, source: DataFrame,
                keyCol: String, balCol: String): (Int, Int, Int) = {
    import org.apache.spark.sql.functions._
    import graft.operators.Merge
    // the arbitration (operators.Extras.mergeArbitrate's algebra,
    // restated over the touched slice — ALL FOUR actions, incl. the
    // 'replace' the CDC sequential-apply collapse emits, so persisting
    // that feed through mergeInto stays correct): unmatched target
    // rows pass, 'replace' restarts the balance, matched upserts
    // accumulate, deletes drop, unmatched source upserts insert
    mergeIntoClauses(s, dir, source, keyCol, balCol,
      matched = Seq(
        Merge.delete("delete", col("action") === "delete"),
        Merge.update("replace", col("action") === "replace",
          "bal" -> col("amt")),
        Merge.update("update", lit(true),
          "bal" -> (col("bal") + col("amt")))),
      notMatched = Seq(
        Merge.insert("insert", col("action") =!= "delete",
          "bal" -> col("amt"))))
  }

  /** [[mergeInto]] with CONDITIONAL matched clauses — the
    * `WHEN MATCHED AND <predicate> THEN ...` surface of a real MERGE
    * INTO, with first-match-wins clause ordering (q110's batch
    * algebra, persisted):
    *   1. WHEN MATCHED AND action = 'delete'  THEN DELETE
    *   2. WHEN MATCHED AND bal < 0            THEN UPDATE SET bal = amt
    *   3. WHEN MATCHED                        THEN UPDATE SET bal = bal + amt
    *   4. WHEN NOT MATCHED AND action <> 'delete' THEN INSERT (amt)
    * Clause 2 SHADOWS clause 3 for delinquent balances — the ordering
    * semantics a single-CASE arbitration can't fake. Same file
    * granularity and column preservation as [[mergeInto]]. */
  def mergeIntoConditional(s: SparkSession, dir: String, source: DataFrame,
                           keyCol: String, balCol: String): (Int, Int, Int) = {
    import org.apache.spark.sql.functions._
    import graft.operators.Merge
    mergeIntoClauses(s, dir, source, keyCol, balCol,
      matched = Seq(
        Merge.delete("delete", col("action") === "delete"),
        Merge.update("reset", col("bal") < 0, "bal" -> col("amt")),
        Merge.update("update", lit(true),
          "bal" -> (col("bal") + col("amt")))),
      notMatched = Seq(
        Merge.insert("insert", col("action") =!= "delete",
          "bal" -> col("amt"))))
  }

  /** The GENERAL persisted MERGE: caller-supplied first-match-wins
    * clause ladders (conditions + SET/INSERT maps over the canonical
    * `key`/`bal` + source-column shape — see
    * [[graft.operators.Merge.mergeClauses]]) executed at FILE
    * granularity through the snapshot log: the per-key range probe
    * picks the touched files, untouched files share verbatim, the
    * commit is an O(edit) delta with row-level CDC. [[mergeInto]] and
    * [[mergeIntoConditional]] are two configurations of this. */
  def mergeIntoClauses(s: SparkSession, dir: String, source: DataFrame,
                       keyCol: String, balCol: String,
                       matched: Seq[graft.operators.Merge.MergeClause],
                       notMatched: Seq[graft.operators.Merge.MergeClause])
      : (Int, Int, Int) =
    mergeIntoArbitrated(s, dir, source, keyCol, balCol) { (tgt, src) =>
      graft.operators.Merge.mergeClauses(tgt, src, "key",
        matched, notMatched)
    }

  /** The shared file-granularity machinery of the merge family: the
    * per-key footer probe picks the touched files, `arbitrate` (over a
    * slice whose columns are `key`, `bal`, then any extra columns the
    * files carry) produces the rewritten rows, untouched files share
    * verbatim, and the commit is an O(edit) delta manifest. */
  private def mergeIntoArbitrated(s: SparkSession, dir: String,
                                  source: DataFrame,
                                  keyCol0: String, balCol0: String)
                                 (arbitrate: (DataFrame, DataFrame) => DataFrame)
      : (Int, Int, Int) = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val cur = latestVersion(dir)
    val keyCol = toPhysical(dir, cur, keyCol0)
    val balCol = toPhysical(dir, cur, balCol0)
    val lines = manifest(dir, cur)
    // ONE materialization of the source feed: the probe and the
    // rewrite join both consume it, and without the checkpoint the
    // whole feed pipeline would compute twice — and a nondeterministic
    // feed could even disagree with its own probe (round-17 review)
    val src = source.localCheckpoint()
    val known = fileRanges(dir, cur)
    val ranged = dataEntries(lines)
      .map(f => f -> rangeOf(s, dir, known, f, keyCol))
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
    // the slice MERGES file schemas (round-17 advice #1): an evolved
    // column some touched files carry must survive the rewrite, not be
    // dropped because schema inference sampled a pre-evolution file
    val slice =
      if (touchedSet.isEmpty) readVersion(s, dir, cur).limit(0)
      else readLines(s, dir,
        lines.filter(l => l.startsWith("dv:") || touchedSet.contains(l)),
        mergeSchema = true)
    val extras = slice.columns.toSeq
      .filterNot(c => c == keyCol || c == balCol)
    require(!extras.exists(Set("key", "bal", "amt", "action")),
      s"target columns collide with the merge-source shape: $extras")
    val shaped = slice.select(
      (Seq(col(keyCol).as("key"), col(balCol).as("bal")) ++
        extras.map(col)): _*)
    // ONE materialization of the arbitrated output: the rewrite write
    // and the CDC diff below both consume it
    val out = arbitrate(shaped, src).localCheckpoint()
    val tmp = dir + "_snapmerge_tmp" + rewriteToken()
    out.select((Seq(col("key").as(keyCol), col("bal").as(balCol)) ++
        extras.map(col)): _*)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val moved = moveRewrite(s, dir, tmp, "merge", v,
      keepOneIfAllEmpty = untouched.isEmpty)
    // row-level CDC: the merge's LOGICAL effect as an old-vs-new diff
    // of the touched slice on the merge key (unique, by the merge
    // contract) — inserts (new side only), deletes (old side only),
    // update pre/post images (both sides, values differ); untouched
    // rows compare null-safe-equal and emit nothing, so a clause
    // ladder change can never silently alter what counts as a change.
    // One extra O(touched slice) join at DML time, zero read-path cost.
    val vals = "bal" +: extras
    def packed(df: DataFrame, as: String) =
      df.select(col("key"), struct(vals.map(col): _*).as(as))
    def image(side: String, tpe: String)(rows: DataFrame) =
      rows.select((Seq(col("key").as(keyCol),
        col(s"$side.bal").as(balCol)) ++
        extras.map(c => col(s"$side.$c").as(c)) :+
        lit(tpe).as("_change_type")): _*)
    val dj = packed(shaped, "_o")
      .join(packed(out, "_n"), Seq("key"), "full_outer")
    val changed = dj.filter(col("_o").isNotNull && col("_n").isNotNull &&
      !(col("_o") <=> col("_n")))
    val changes =
      image("_n", "insert")(dj.filter(col("_o").isNull))
        .unionByName(image("_o", "delete")(dj.filter(col("_n").isNull)))
        .unionByName(image("_o", "update_preimage")(changed))
        .unionByName(image("_n", "update_postimage")(changed))
    val cdcF = writeChangeFiles(s, dir, v, changes)
    // commit with RE-PLAN on a lost claim (round-19 verdict #3 —
    // deletes already re-planned; a merge racing a DISJOINT append
    // now lands too): an interleaved append commutes iff its file's
    // key range is disjoint from the SOURCE-KEY HULL — outside it no
    // appended row can match any source key, so the merge's rewritten
    // slice, its inserts, and its CDC diff are all unchanged by the
    // interleave (the hull is conservative: an in-hull append between
    // source keys fails loud even though it might commute). One O(1)
    // agg on the already-checkpointed source.
    val hull = src.agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.col("key")),
      org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("key"))).head
    val (hLo, hHi) =
      if (hull.isNullAt(0)) (0L, -1L) // empty source: all appends commute
      else (hull.getLong(0), hull.getLong(1))
    val committed = commitRewriteGeneral(s, dir, cur, lines, touchedSet,
      moved, appendScope = Some((keyCol, hLo, hHi)),
      stats = collectStats(s, dir, moved ++ cdcF), cdc = cdcF,
      dropBaseDvs = false, forceFull = false)
    (committed, touchedSet.size, untouched.size)
  }

  /** Commit a predicate-scoped REWRITE with RE-PLAN on a lost claim —
    * the other half of multi-writer (appends already auto-retry;
    * round-18 verdict #5). The retry lands IFF every interleaved
    * commit COMMUTES with this rewrite (Delta's conflict matrix):
    *  - none of the rewrite's touched files were removed (two rewrites
    *    of the same data: write-write conflict, fail loud);
    *  - no deletion-vector entry appeared (it would re-scope the
    *    rewrite's already-computed output rows);
    *  - no interleaved data file CAN intersect the rewrite's predicate
    *    per the head's range stats (unknown range = conservative
    *    conflict) — a disjoint append slots in verbatim and the result
    *    equals either serial order.
    * Failing loud hands the caller a full re-plan; committing blind
    * would erase or resurrect rows the rewrite never saw. */
  /** Test seam: runs after a rewrite's output is staged and before its
    * manifest claim — exactly the window a concurrent commit can win.
    * The re-plan spec uses it to interleave deterministic rivals. */
  private[graft] var onBeforeRewriteCommit: () => Unit = () => ()

  private def commitRewriteOrReplan(s: SparkSession, dir: String,
                                    basedOn: Int,
                                    plannedBase: Seq[String],
                                    touchedSet: Set[String],
                                    appended: Seq[String],
                                    column: String, lo: Long, hi: Long,
                                    stats: FileStats,
                                    cdc: Seq[String]): Int =
    commitRewriteGeneral(s, dir, basedOn, plannedBase, touchedSet,
      appended, Some((column, lo, hi)), stats, cdc,
      dropBaseDvs = false, forceFull = false)

  /** The general re-plan core. `appendScope` = the predicate scope an
    * interleaved APPEND must be range-disjoint from to commute —
    * None means EVERY append commutes (a compaction has no predicate:
    * its output plus the interleaved file equals either serial
    * order). `dropBaseDvs` removes the base's deletion-vector lines
    * from the committed manifest (a compaction materializes them into
    * its output — the dv-unchanged conflict check still guarantees no
    * NEW vector slipped in). `forceFull` commits a checkpoint manifest
    * (compaction's convention — its delta would be O(files) anyway). */
  private def commitRewriteGeneral(s: SparkSession, dir: String,
                                   basedOn: Int,
                                   plannedBase: Seq[String],
                                   touchedSet: Set[String],
                                   appended: Seq[String],
                                   appendScope: Option[(String, Long, Long)],
                                   stats: FileStats,
                                   cdc: Seq[String],
                                   dropBaseDvs: Boolean,
                                   forceFull: Boolean): Int = {
    onBeforeRewriteCommit()
    var attempt = 0
    var base = plannedBase
    var baseV = basedOn
    val stagedNames = appended.map {
      case l if l.startsWith("dv:") => dvEntries(Seq(l)).head._2
      case f                        => f
    } ++ cdc
    while (true) {
      // the claim is pinned to the version the CURRENT base was read
      // at — never a freshly-read head number over a stale base, which
      // would let a rival that committed inside the planning window be
      // silently dropped from the new manifest
      val v = baseV + 1
      // a retry's outputs carry a nominal version a rival has already
      // claimed, which drops them out of vacuum's in-flight guard —
      // verify they survived before claiming (loud re-plan beats a
      // committed version pointing at swept files)
      require(stagedNames.forall(f => java.nio.file.Files.exists(
          java.nio.file.Paths.get(dir, f))),
        s"staged rewrite outputs at $dir were swept (a zero-grace " +
          "vacuum raced this writer's claim retry) — re-run the operation")
      val dropped = base.filter(l => touchedSet.contains(l) ||
        (dropBaseDvs && l.startsWith("dv:")))
      try {
        commitManifest(dir, v,
          base.filterNot(dropped.contains) ++ appended,
          delta = if (forceFull) None
                  else Some(dropped.sorted.map("-" + _) ++
                    appended.map("+" + _)),
          stats = stats, cdc = cdc)
        verifyClaimOrRollback(dir, v, stagedNames)
        return v
      } catch {
        case e: Exception if attempt < 10 && e.getMessage != null && (
            e.getMessage.contains("concurrently committed") ||
            e.getMessage.contains("not the next version")) =>
          attempt += 1
          val head = versions(dir).last
          val headLines = manifest(dir, head)
          val headData = dataEntries(headLines).toSet
          require(touchedSet.subsetOf(headData),
            s"concurrent rewrite conflict at $dir: a racing commit " +
              "rewrote files this operation touched — re-plan it")
          require(dvEntries(headLines).toSet ==
              dvEntries(plannedBase).toSet,
            s"concurrent MoR delete at $dir conflicts with this " +
              "rewrite — re-plan it")
          val newFiles = headData -- dataEntries(plannedBase).toSet
          appendScope.foreach { case (column, lo, hi) =>
            val known = fileRanges(dir, head)
            newFiles.foreach { f =>
              val disjoint = rangeOf(s, dir, known, f, column)
                .exists { case (mn, mx) => mx < lo || mn > hi }
              require(disjoint,
                s"concurrent append at $dir may contain rows matching " +
                  "this rewrite's predicate — re-plan it")
            }
          }
          base = headLines
          baseV = head
      }
    }
    -1 // unreachable
  }

  /** COPY-ON-WRITE DELETE of a key range — the lakehouse row-delete
    * over immutable parquet: footer stats split the live file set into
    * TOUCHED (range intersects — rewritten without the deleted rows)
    * and UNTOUCHED (shared verbatim into the new manifest, zero IO);
    * the commit is the usual atomic manifest claim, so a crash
    * mid-rewrite leaves orphans and an intact table, and every prior
    * version still reads the deleted rows (time travel is the undo).
    * At 100 TB this is the difference between rewriting the table and
    * rewriting the handful of files a range predicate touches — the
    * same planning metadata [[readVersionWhere]] scans by. Returns
    * (newVersion, filesRewritten, filesKept). */
  def deleteWhere(s: SparkSession, dir: String, column0: String,
                  lo: Long, hi: Long): (Int, Int, Int) = {
    val cur = latestVersion(dir)
    val column = toPhysical(dir, cur, column0) // mapped stores: files/stats key physical
    val lines = manifest(dir, cur)
    val known = fileRanges(dir, cur)
    val (touched, untouched) = dataEntries(lines).partition { f =>
      rangeOf(s, dir, known, f, column) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None           => true // no stats: conservatively rewrite
      }
    }
    val touchedSet = touched.toSet
    val v = cur + 1
    val (rewritten, cdc) =
      if (touched.isEmpty) (Seq.empty[String], Seq.empty[String])
      else {
        val tmp = dir + "_snapdelete_tmp" + rewriteToken()
        // a NULL key is NOT in [lo, hi]: the predicate must be
        // not-TRUE (Delta/Iceberg DELETE WHERE semantics), or the
        // three-valued filter would silently erase NULL-key rows from
        // every rewritten file (round-17 review). The touched files
        // are read with their applicable deletion vectors (the ordered
        // subsequence), so a COW rewrite after a MoR delete never
        // resurrects MoR-deleted rows. The read MERGES file schemas
        // (round-17 advice #1): an evolved column is preserved through
        // the rewrite, never silently dropped.
        val slice = readLines(s, dir,
          lines.filter(l => l.startsWith("dv:") || touchedSet.contains(l)),
          mergeSchema = true)
        val hit = org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.col(column).between(lo, hi),
          org.apache.spark.sql.functions.lit(false))
        // row-level CDC: the deleted rows, as full-row preimages — the
        // explicit change record that lets the feed cover deletes
        // instead of emitting nothing for a rewrite version
        val cdcF = writeChangeFiles(s, dir, v, slice.filter(hit)
          .withColumn("_change_type",
            org.apache.spark.sql.functions.lit("delete")))
        slice.filter(!hit).write.mode(SaveMode.Overwrite).parquet(tmp)
        // keep one empty file only when the delete emptied EVERYTHING
        // and nothing untouched carries the schema (round-17 review)
        (moveRewrite(s, dir, tmp, "delete", v,
          keepOneIfAllEmpty = untouched.isEmpty), cdcF)
      }
    // untouched lines keep their order (and their masking dv entries);
    // the rewritten files append at the END — after every dv, since
    // their rows already have all deletions applied. The commit
    // RE-PLANS on a lost claim when the interleaved commits commute
    // (e.g. an append outside [lo, hi]); conflicting histories fail
    // loud for a caller-level re-plan.
    val committed = commitRewriteOrReplan(s, dir, cur, lines, touchedSet,
      rewritten, column, lo, hi,
      stats = collectStats(s, dir, rewritten ++ cdc), cdc = cdc)
    (committed, touched.size, untouched.size)
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
  def deleteWhereMoR(s: SparkSession, dir: String, column0: String,
                     lo: Long, hi: Long): (Int, Int) = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val cur = latestVersion(dir)
    val column = toPhysical(dir, cur, column0)
    val lines = manifest(dir, cur)
    val known = fileRanges(dir, cur)
    val touched = dataEntries(lines).filter { f =>
      rangeOf(s, dir, known, f, column) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None           => true
      }
    }
    val v = cur + 1
    if (touched.isEmpty) {
      // nothing matches: a no-op version (an EMPTY delta — O(1) log text)
      (commitRewriteOrReplan(s, dir, cur, lines, Set.empty, Seq.empty,
        column, lo, hi, FileStats.empty, Seq.empty), 0)
    } else {
      val touchedSet = touched.toSet
      // mergeSchema, like every other DML slice read (round-17 advice
      // #1): the CDC delete PREIMAGES below must carry an evolved
      // column's real values, not lose it to whichever footer schema
      // inference sampled. ONE materialization feeds both the dv-keys
      // write and the change-file write (review: two jobs re-scanned
      // the touched files).
      val matched = readLines(s, dir,
          lines.filter(l => l.startsWith("dv:") || touchedSet.contains(l)),
          mergeSchema = true)
        .filter(coalesce(col(column).between(lo, hi), lit(false)))
        .localCheckpoint()
      val keys = matched.select(col(column).as("dk")).distinct()
      val tmp = dir + "_snapdv_tmp" + rewriteToken()
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
        // stats intersected, no row matched: a no-op version
        (commitRewriteOrReplan(s, dir, cur, lines, Set.empty, Seq.empty,
          column, lo, hi, FileStats.empty, Seq.empty), touched.size)
      } else {
        val name = f"dv-v$v%05d-${rewriteToken()}.parquet"
        val target = java.nio.file.Paths.get(dir, name)
        java.nio.file.Files.move(part.get.toPath, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        Option(new java.io.File(tmp).listFiles())
          .foreach(_.foreach(_.delete()))
        new java.io.File(tmp).delete()
        // row-level CDC: MoR moves no bytes, but the LOGICAL deletes
        // are exactly the matched rows — record them so the feed's
        // coverage doesn't depend on the COW/MoR storage choice
        val cdcF = writeChangeFiles(s, dir, v,
          matched.withColumn("_change_type", lit("delete")))
        // commute-checked retry, like the COW path: an interleaved
        // disjoint append lands BEFORE the dv line, which is safe only
        // because its rows cannot match the vector's key range
        (commitRewriteOrReplan(s, dir, cur, lines, Set.empty,
          Seq(s"dv:$column:$name"), column, lo, hi,
          collectStats(s, dir, cdcF), cdcF), touched.size)
      }
    }
  }

  /** Roll the table back to version `v` — committed as a NEW version
    * whose manifest is a copy of `v`'s (the Delta RESTORE shape):
    * history stays linear and intact, nothing is deleted, and the
    * files are shared, so the rollback is O(manifest) metadata
    * (committed as a full checkpoint: a restore's content has no
    * relation to its predecessor's, so a delta would be degenerate).
    * The restored version must still be on disk (not vacuumed). */
  def restoreVersion(dir: String, v: Int): Int = {
    val files = manifest(dir, v) // fails loud if vacuumed
    val next = latestVersion(dir) + 1
    // ranges AND schema travel with the restore from the RESTORED
    // version's resolution (the head's map may have dropped files
    // replaced since; the head's schema may have evolved past v's)
    commitManifest(dir, next, files,
      stats = FileStats(fileRanges(dir, v), fileTypedRanges(dir, v)),
      schema = tableSchema(dir, v))
    next
  }

  /** [[restoreVersion]] WITH row-level CDC — a restore CHANGES the
    * logical table (unlike a compaction), so a tailed store should
    * prefer this overload: the change record derives from the
    * manifest FILE DIFF (files are immutable, so a head-only file's
    * visible rows are exactly the restore's deletes and a
    * restored-only file's its inserts) — O(differing files) IO, never
    * a table diff. Guard: a file SHARED by both manifests must sit
    * under the same applicable deletion vectors on both sides;
    * diverging dv contexts would need a per-row content diff, so this
    * fails loud with the escape hatch (compact first — compaction
    * materializes vectors away). */
  def restoreVersion(s: SparkSession, dir: String, v: Int): Int = {
    import org.apache.spark.sql.functions.lit
    val head = latestVersion(dir)
    val restored = manifest(dir, v)
    val headLines = manifest(dir, head)
    // the dv context of a plain file = the dv entries AFTER it in its
    // manifest (a vector masks only files committed before it)
    def dvContext(lines: Seq[String]): Map[String, Set[String]] = {
      var pending = Vector.empty[String]
      val out = scala.collection.mutable.Map[String, Set[String]]()
      lines.reverse.foreach {
        case l if l.startsWith("dv:") => pending :+= l
        case f                        => out(f) = pending.toSet
      }
      out.toMap
    }
    val hCtx = dvContext(headLines)
    val rCtx = dvContext(restored)
    val shared = hCtx.keySet & rCtx.keySet
    val diverged = shared.filter(f => hCtx(f) != rCtx(f))
    require(diverged.isEmpty,
      s"restore CDC at $dir: files ${diverged.take(3).mkString(",")} sit " +
        "under different deletion vectors at the head and the restored " +
        "version — a file diff can't state their row changes; compact " +
        "the head first (vectors materialize away), then restore")
    val next = head + 1
    def visible(lines: Seq[String], keep: Set[String]): Option[DataFrame] =
      if (keep.isEmpty) None
      else Some(readLines(s, dir,
        lines.filter(l => l.startsWith("dv:") || keep.contains(l)),
        mergeSchema = true))
    val dels = visible(headLines, hCtx.keySet -- rCtx.keySet)
      .map(_.withColumn("_change_type", lit("delete")))
    val ins = visible(restored, rCtx.keySet -- hCtx.keySet)
      .map(_.withColumn("_change_type", lit("insert")))
    val changes = (dels, ins) match {
      case (Some(d), Some(i)) =>
        Some(d.unionByName(i, allowMissingColumns = true))
      case (d, i) => d.orElse(i)
    }
    val cdcF = changes.map(writeChangeFiles(s, dir, next, _))
      .getOrElse(Seq.empty)
    commitManifest(dir, next, restored,
      stats = FileStats(fileRanges(dir, v), fileTypedRanges(dir, v)),
      schema = tableSchema(dir, v), cdc = cdcF)
    next
  }

  /** Drop history below `retainFrom`: delete manifests of older
    * versions and every data file no RETAINED manifest references —
    * incl. orphans from a crashed compaction (data files moved in, no
    * manifest committed). Reads of vacuumed versions then fail loud in
    * [[manifest]]. If `retainFrom` is a delta manifest, it is first
    * MATERIALIZED to a full checkpoint (its chain is about to be
    * deleted) with its ORIGINAL commit mtime preserved (the
    * [[versionAsOf]] clock — review #3); every retained delta chains
    * down through it, so all retained versions keep resolving.
    *
    * `graceMillis` protects IN-FLIGHT writers (review #2, Delta's
    * VACUUM retention threshold): an unreferenced data file younger
    * than the grace may be a concurrent append's staged-but-not-yet-
    * committed output — deleting it would let the append's commit
    * succeed and point a committed version at missing files. Default
    * 10 minutes; pass 0 only when no writer can be live (tests,
    * offline maintenance). Stale commit tmp litter in `_graft_log/`
    * is swept under the same grace. Vacuum is a single-writer
    * maintenance operation (like Delta's). */
  def vacuum(dir: String, retainFrom: Int,
             graceMillis: Long = 10L * 60 * 1000): Unit = {
    val vs = versions(dir)
    require(vs.contains(retainFrom),
      s"retainFrom=$retainFrom is not a committed version at $dir")
    // PERSIST the streamed-batch high-water mark BEFORE deleting any
    // batch-tagged manifest: the exactly-once no-op/stale checks in
    // [[appendVersionForBatch]] read the mark from the tagged
    // manifests, and vacuuming them away would let a replayed
    // micro-batch re-append its rows (round-17 review). The persisted
    // mark (written at commit time since r19) is combined with — never
    // trusted over — the deleted range's own newest tag: the mark
    // lands AFTER the claim, so a crash in that window leaves it one
    // batch low, and deleting the tagged manifest on the mark's word
    // alone would let the replayed trigger re-append (r19 review).
    // maxBatchBelow stops at the first tag scanning down, so the
    // combined read cost stays O(1) on a streamed store.
    val hwm = math.max(batchHighWater(dir),
      maxBatchBelow(dir, retainFrom))
    if (hwm >= 0) persistBatchHighWater(dir, hwm)
    // materialize the retention boundary BEFORE deleting its chain: a
    // delta at retainFrom resolves through manifests below it — its
    // file list AND its range map both flatten into the checkpoint;
    // the boundary's OWN per-version headers (batch tag, CDC change
    // files, schema) travel verbatim
    val boundary = readManifestFile(dir, retainFrom)
    if (boundary.isDelta) {
      val full = manifest(dir, retainFrom)
      val live = dataEntries(full).toSet ++ boundary.cdc
      val rangeHeaders = fileRanges(dir, retainFrom).toSeq
        .filter { case ((f, _), _) => live.contains(f) }
        .sortBy(_._1)
        .map { case ((f, c), (mn, mx)) => s"#range:$f:$c:$mn:$mx" }
      val tstatHeaders =
        typedHeaders(fileTypedRanges(dir, retainFrom), live)
      val headers = boundary.batch.map(b => s"#batch=$b").toSeq ++
        boundary.cdc.map(f => s"#cdc:$f") ++
        boundary.schemaJson.map(j => s"#schema=$j").toSeq ++
        rangeHeaders ++ tstatHeaders
      val target = manifestPath(dir, retainFrom)
      // the manifest's mtime IS its commit time (versionAsOf's clock):
      // the materialized checkpoint must keep it, or the retention
      // boundary becomes unreachable by timestamp (review #3). The
      // stamp goes on the TMP file so it TRAVELS WITH the atomic move —
      // a crash between move and a post-move stamp would leave the
      // boundary with a fresh mtime, silently shifting TIMESTAMP AS OF
      // resolution for that version (round-18 advice #2)
      val commitTime = java.nio.file.Files.getLastModifiedTime(target)
      val tmp = logDir(dir).resolve(
        f"v$retainFrom%05d.${rewriteToken()}.tmp")
      // the parsed-manifest cache validates by (mtime, size) and this
      // rewrite deliberately PRESERVES mtime (the versionAsOf clock):
      // if the materialized FULL form happened to hit the delta's
      // exact byte length, a warm process would keep serving the
      // stale delta parse and resolve through base manifests this
      // vacuum is deleting — pad with a comment line until the sizes
      // provably differ, and evict this process's own entry outright
      // (round-19 advice #1)
      val oldSize = java.nio.file.Files.size(target)
      var body = (headers ++ full).mkString("\n") + "\n"
      while (body.getBytes("UTF-8").length.toLong == oldSize)
        body += "#materialized\n"
      java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
      java.nio.file.Files.setLastModifiedTime(tmp, commitTime)
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      manifestCache.synchronized {
        manifestCache.remove((dir, retainFrom)); ()
      }
    }
    val keep = vs.filter(_ >= retainFrom)
    // retained references = every kept version's resolved data + dv
    // files PLUS each kept version's own CDC change files (per-version
    // headers, not part of the resolved content)
    val referenced = keep.flatMap(v =>
      referencedFiles(manifest(dir, v)) ++ cdcFiles(dir, v)).toSet
    val cutoff = System.currentTimeMillis() - graceMillis
    def oldEnough(p: java.nio.file.Path): Boolean =
      java.nio.file.Files.getLastModifiedTime(p).toMillis <= cutoff
    // a data file whose embedded nominal version is ABOVE the newest
    // committed version can only belong to an IN-FLIGHT writer (staged
    // and moved in, claim not yet made) — never delete it, whatever the
    // grace: vacuum(grace = 0) racing a live append must not let the
    // append's subsequent commit reference deleted files (round-18
    // advice #3). A crashed future-version orphan stays until some
    // later commit passes its version, which is the safe direction.
    // RESIDUAL: a writer RETRYING a lost claim carries a nominal
    // version a rival already committed, so this guard no longer
    // covers it — the retry paths re-verify their staged files exist
    // before claiming (loud re-run), and the default grace remains the
    // real live-writer protection; graceMillis = 0 stays a
    // no-live-writers contract.
    val latestCommitted = vs.max
    val VersionedName = """.*-v(\d+)-.*""".r
    def maybeInFlight(f: String): Boolean = f match {
      case VersionedName(v) => v.toInt > latestCommitted
      case _                => false
    }
    (dataFiles(dir) -- referenced).foreach { f =>
      val p = java.nio.file.Paths.get(dir, f)
      if (oldEnough(p) && !maybeInFlight(f)) java.nio.file.Files.delete(p)
    }
    vs.filter(_ < retainFrom).foreach { v =>
      java.nio.file.Files.delete(manifestPath(dir, v))
    }
    // crashed commit attempts leave uniquely-named tmp files in the
    // log dir that retries no longer overwrite — sweep the stale ones
    // under the same grace (review #7)
    val st = java.nio.file.Files.list(logDir(dir))
    try st.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".tmp"))
      .filter(oldEnough)
      .foreach(java.nio.file.Files.delete)
    finally st.close()
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
