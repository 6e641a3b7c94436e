package graft

import org.apache.spark.sql.functions._

/** Storage-layout techniques the 100 TB design depends on: date-partitioned
  * sinks with partition pruning, and bucketed tables whose joins need no
  * shuffle (the co-located join).
  */
class StorageLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("DSv2 sink: write round-trips through the two-phase commit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2sink").toString
    val src = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts", $"event_type", $"value")
    src.write.format("graft.sources.ParquetBatchSink")
      .option("path", dir).mode("append").save()
    // staging swept, only committed part files remain
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.forall(_.endsWith(".parquet")), files.mkString(","))
    assert(!files.exists(_.startsWith("_staging")), "staging dir not swept")
    val back = spark.read.parquet(dir)
    assert(back.count() === src.count())
    val a = src.orderBy($"event_id").collect().map(_.toString)
    val b = back.orderBy($"event_id").collect().map(_.toString)
    assert(a.sameElements(b), "round-trip changed rows")
  }

  test("DSv2 sink: successive appends accumulate (no file-name collisions)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2app").toString
    val src = Tables.nation(spark, sf).select($"n_nationkey", $"n_name")
    src.write.format("graft.sources.ParquetBatchSink")
      .option("path", dir).mode("append").save()
    src.write.format("graft.sources.ParquetBatchSink")
      .option("path", dir).mode("append").save()
    // (partition, task) ids repeat across jobs — only per-job-unique file
    // names keep the second commit from replacing the first job's files
    assert(spark.read.parquet(dir).count() === 2 * src.count())
  }

  test("DSv2 sink: job abort leaves the sink untouched") {
    import graft.sources.{ParquetBatchWrite, ParquetSinkCommit}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2abort").toString
    val schema = StructType(Seq(StructField("x", LongType)))
    val write = new ParquetBatchWrite(schema, dir, "q-abort-test")
    val factory = write.createBatchWriterFactory(null)
    val w = factory.createWriter(0, 0L)
    w.write(InternalRow(1L))
    val msg = w.commit().asInstanceOf[ParquetSinkCommit]
    assert(new java.io.File(s"$dir/_staging_q-abort-test/${msg.file}").exists(),
      "task commit must leave the staged file for the job commit")
    write.abort(Array(msg)) // driver decides the job failed
    val left = new java.io.File(dir).listFiles()
    assert(left == null || left.isEmpty,
      s"aborted job leaked files: ${left.map(_.getName).mkString(",")}")
  }

  test("compaction: small files rewritten to target size, rows preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    Tables.events(spark, sf).repartition(40) // simulate micro-batch litter
      .write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).orderBy($"event_id").collect()
    val stats = operators.Maintenance.compact(spark, dir,
      targetBytes = 512L * 1024 * 1024)
    assert(stats.filesBefore === 40)
    assert(stats.filesAfter === 1, s"expected 1 compacted file: $stats")
    val after = spark.read.parquet(dir).orderBy($"event_id").collect()
    assert(after.sameElements(before), "compaction changed the data")
  }

  test("compaction: refuses to run over a crashed prior swap's backup") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cbak").toString
    Tables.nation(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(dir)
    // simulate a crash mid-swap: a prior run parked an original in bak
    val bak = new java.io.File(dir + "_compact_bak")
    bak.mkdirs()
    val stranded = new java.io.File(bak, "part-orig-00000.parquet")
    java.nio.file.Files.write(stranded.toPath, Array[Byte](1, 2, 3))
    val e = intercept[IllegalArgumentException] {
      operators.Maintenance.compact(spark, dir)
    }
    assert(e.getMessage.contains("stale backup"), e.getMessage)
    // the stranded original — possibly the only copy of its rows — must
    // survive an aborted run untouched
    assert(stranded.exists() && stranded.length() === 3)
    stranded.delete(); bak.delete()
    // once the operator clears the backup, compaction proceeds normally
    val stats = operators.Maintenance.compact(spark, dir)
    assert(stats.filesBefore === 4 && stats.filesAfter >= 1)
  }

  test("sort-clustered rewrite: row-group stats become selective for key filters") {
    import scala.jdk.CollectionConverters._
    // how many row groups a pushed user_id=7 filter must read: a row
    // group is skippable iff its footer [min,max] excludes the key
    def groupsContaining(dir: String, key: Long): (Int, Int) = {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      var total = 0; var containing = 0
      files.foreach { f =>
        val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          new org.apache.hadoop.conf.Configuration(false)))
        try rdr.getFooter.getBlocks.asScala.foreach { b =>
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == "user_id").get.getStatistics
          total += 1
          val mn = st.genericGetMin.asInstanceOf[java.lang.Long]
          val mx = st.genericGetMax.asInstanceOf[java.lang.Long]
          if (mn <= key && key <= mx) containing += 1
        } finally rdr.close()
      }
      (containing, total)
    }
    val base = Tables.events(spark, sf)
    val unsorted = java.nio.file.Files.createTempDirectory("graft_uns").toString
    base.repartition(8).write.mode("overwrite").parquet(unsorted)
    val clustered = java.nio.file.Files.createTempDirectory("graft_cls").toString
    base.repartition(8).write.mode("overwrite").parquet(clustered)
    operators.Maintenance.compact(spark, clustered,
      targetBytes = 24L * 1024, clusterBy = Some("user_id"))
    val (uc, ut) = groupsContaining(unsorted, 7L)
    val (cc, ct) = groupsContaining(clustered, 7L)
    // random layout: every row group spans the whole key range — zero
    // skipping; clustered: the key lives in a small fraction of groups
    assert(uc === ut, s"random layout unexpectedly skippable ($uc/$ut)")
    assert(ct > 1 && cc <= math.max(1, ct / 4),
      s"clustered layout not selective: $cc of $ct row groups contain the key")
    // and the data is intact
    assert(spark.read.parquet(clustered).count() === base.count())
  }

  test("partitioned sink: date filter prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf)
      .withColumn("event_date", to_date($"ts"))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)

    val read = spark.read.parquet(dir)
      .filter($"event_date" === "2024-01-05")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(600))
    assert(plan.contains("event_date"), "partition column not in filters")
    // pruning actually works: only that day's rows are read
    val expected = Tables.events(spark, sf)
      .filter(to_date($"ts") === "2024-01-05").count()
    assert(read.count() === expected && expected > 0)
  }

  test("dynamic partition pruning: selective dim filter prunes fact partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.events(spark, sf)
      .withColumn("event_date", to_date($"ts"))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = Tables.events(spark, sf)
      .select(to_date($"ts").as("event_date"), $"event_type").distinct()
      .filter($"event_type" === "purchase" && dayofmonth($"event_date") === 3)
    val joined = fact.join(dim, Seq("event_date"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      "no dynamic partition pruning in plan:\n" + plan.take(800))
    assert(joined.count() > 0)
  }

  test("bucketed tables: equi-join on the bucket key plans without exchange") {
    // default warehouse dir (./spark-warehouse, gitignored) — the
    // warehouse conf is static and can't move per-test. A previous JVM's
    // orphaned table dirs conflict with the fresh in-memory catalog:
    // drop + delete locations first.
    Seq("ev_bucketed_a", "ev_bucketed_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val ev = Tables.events(spark, sf).select($"event_id", $"user_id", $"value")
    ev.write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("ev_bucketed_a")
    ev.groupBy($"user_id").agg(sum($"value").as("total"))
      .write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("ev_bucketed_b")

    val joined = spark.table("ev_bucketed_a")
      .join(spark.table("ev_bucketed_b"), "user_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join still shuffles:\n" + plan.take(1000))
    assert(joined.count() === ev.count())
  }

  test("z-order rewrite: row groups are selective on BOTH keys; " +
       "single-key sort only on its own") {
    import scala.jdk.CollectionConverters._
    def groupsContaining(dir: String, colName: String, key: Long): (Int, Int) = {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      var total = 0; var containing = 0
      files.foreach { f =>
        val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          new org.apache.hadoop.conf.Configuration(false)))
        try rdr.getFooter.getBlocks.asScala.foreach { b =>
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == colName).get.getStatistics
          total += 1
          val mn = st.genericGetMin.asInstanceOf[java.lang.Long]
          val mx = st.genericGetMax.asInstanceOf[java.lang.Long]
          if (mn <= key && key <= mx) containing += 1
        } finally rdr.close()
      }
      (containing, total)
    }
    // the full 200x200 grid: a and b independent by construction
    val grid = spark.range(40000).select(
      ($"id" % 200).as("a"), expr("(id div 200) % 200").as("b"),
      $"id".as("payload"))
    def freshDir(): String = {
      val d = java.nio.file.Files.createTempDirectory("graft_z").toString
      grid.repartition(8).write.mode("overwrite").parquet(d)
      d
    }
    val zdir = freshDir()
    operators.Maintenance.compactZOrder(spark, zdir, "a", "b",
      targetBytes = 24L * 1024)
    val sdir = freshDir()
    operators.Maintenance.compact(spark, sdir,
      targetBytes = 24L * 1024, clusterBy = Some("a"))
    val (za, zt) = groupsContaining(zdir, "a", 7L)
    val (zb, _) = groupsContaining(zdir, "b", 7L)
    val (sa, st) = groupsContaining(sdir, "a", 7L)
    val (sb, _) = groupsContaining(sdir, "b", 7L)
    assert(zt > 4, s"too few row groups ($zt) for a meaningful check")
    // z-order: a 1-D stripe crosses O(sqrt(files)) 2-D tiles — both
    // columns must skip most groups
    assert(za <= zt / 2 && zb <= zt / 2,
      s"z-order not selective on both keys: a=$za/$zt b=$zb/$zt")
    // single-key sort: selective on its own key, blind on the other
    assert(sa <= st / 4, s"single-key sort not selective on a: $sa/$st")
    assert(sb >= st * 3 / 4,
      s"expected single-key layout blind on b, got $sb/$st")
    // and the data survives both rewrites
    assert(spark.read.parquet(zdir).count() === 40000L)
    assert(spark.read.parquet(sdir).count() === 40000L)
  }
}
