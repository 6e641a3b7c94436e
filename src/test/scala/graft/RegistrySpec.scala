package graft

/** Contract tests: every registered query runs; oracle keys are valid. */
class RegistrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys all correspond to registered queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }

  test("every registered query executes and yields a schema on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).limit(1).collect(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every query is oracle-checked; q72 is the lone documented exception") {
    // q72_tablesample: engine-specific RNG is structurally un-oracle-able
    // (adjudicated in round 8/9 VERDICTs); its Sample operator gets a hard
    // DuckDB row via q81_sample_integrity instead. ANY other query missing
    // an oracle would silently downgrade the driver's check to rows-only —
    // fail here first.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set("q72_tablesample"),
      s"queries without a DuckDB oracle: $noOracle")
  }

  test("table loaders deliver their canonical logical schemas") {
    // The round-9 incident: the driver regenerated events.parquet with a
    // different physical ts encoding and the loader shipped the raw type
    // downstream, failing 29 queries at ANALYSIS time with no test
    // naming the cause. This pins the loader CONTRACT — whatever the
    // fixture's physical encoding, Tables.* must normalize to these
    // logical types — so the next regeneration either normalizes
    // cleanly or fails right here, naming the table and column.
    import org.apache.spark.sql.types._
    val expect: Seq[(String, Map[String, DataType])] = Seq(
      "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
        "user_id" -> LongType, "event_type" -> StringType,
        "value" -> DoubleType, "props" -> StringType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType,
        "n_chars" -> LongType),
      "embeddings" -> Map("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
      "lineitem" -> Map("l_orderkey" -> LongType,
        "l_extendedprice" -> DoubleType, "l_quantity" -> DoubleType),
      "orders" -> Map("o_orderkey" -> LongType,
        "o_totalprice" -> DoubleType))
    val problems = expect.flatMap { case (table, cols) =>
      val schema = (table match {
        case "events"     => Tables.events(spark, sf)
        case "documents"  => Tables.documents(spark, sf)
        case "embeddings" => Tables.embeddings(spark, sf)
        case "lineitem"   => Tables.lineitem(spark, sf)
        case "orders"     => Tables.orders(spark, sf)
      }).schema
      cols.flatMap { case (c, t) =>
        schema.find(_.name == c) match {
          case None => Some(s"$table.$c: column missing (fixture drift?)")
          case Some(f) if !compatible(f.dataType, t) =>
            Some(s"$table.$c: ${f.dataType} (loader must normalize to $t)")
          case _ => None
        }
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("normalizeTs yields identical instants across all three encodings") {
    // The round-9 bug class, pinned on VALUES: the same instants stored
    // as raw nanos longs, as TIMESTAMP_NTZ, and as TIMESTAMP must
    // normalize to one identical TIMESTAMP column (ns is truncated to
    // µs, NTZ is reinterpreted under the UTC session tz).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val micros = Seq(1704067200000000L, 1704067201234567L, 0L)
    val asNanos = micros.map(_ * 1000L + 999L).toDF("ts") // sub-µs truncates
    val asNtz = micros.toDF("us")
      .select(timestamp_micros($"us").cast("timestamp_ntz").as("ts"))
    val asUtc = micros.toDF("us").select(timestamp_micros($"us").as("ts"))
    val results = Seq(asNanos, asNtz, asUtc).map { df =>
      val out = Tables.normalizeTs(df)
      assert(out.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType)
      out.select(unix_micros($"ts")).as[Long].collect().toSeq.sorted
    }
    assert(results(0) === micros.sorted, "nanos path must truncate ns->us")
    assert(results(1) === micros.sorted, "NTZ path must be identity under UTC")
    assert(results(2) === micros.sorted, "timestamp path must pass through")
  }

  // ArrayType containsNull may differ between fixture generations —
  // element type is what queries depend on
  private def compatible(actual: org.apache.spark.sql.types.DataType,
      want: org.apache.spark.sql.types.DataType): Boolean =
    (actual, want) match {
      case (a: org.apache.spark.sql.types.ArrayType,
            w: org.apache.spark.sql.types.ArrayType) =>
        a.elementType == w.elementType
      case _ => actual == want
    }

  test("query names are unique across modules") {
    // Map construction would silently drop duplicates; assert uniqueness on
    // the authoritative module list itself (SparkEntry.modules) so the test
    // cannot drift when a module is added.
    val allNames = SparkEntry.modules.flatMap(_.queries.keys)
    val dups = allNames.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names across modules: $dups")
    assert(allNames.size === SparkEntry.queries.size)
  }
}
