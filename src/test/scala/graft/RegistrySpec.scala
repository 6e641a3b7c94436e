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

  test("query names are unique across modules") {
    // Map construction would silently drop duplicates; detect via size sum
    val mods = Seq(
      operators.Relational.queries, operators.Windows.queries,
      operators.SetOps.queries, operators.Scalars.queries,
      operators.TemporalJoins.queries, weather.WeatherPipeline.queries,
      datapipe.Dedup.queries, datapipe.Similarity.queries,
      datapipe.TextAnalysis.queries, datapipe.Multimodal.queries,
      operators.AdvancedAggs.queries, operators.Nested.queries,
      operators.Extras.queries,
      operators.TypedOps.queries, streaming.Streaming.queries)
    assert(mods.map(_.size).sum === SparkEntry.queries.size)
  }
}
