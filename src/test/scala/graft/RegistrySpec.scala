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
