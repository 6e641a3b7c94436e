package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module registries. Each module pairs every query
  * with a DuckDB-runnable oracle SQL (where SQL-expressible), so the
  * driver's t2 correctness gate covers the whole operator inventory.
  */
object SparkEntry {
  /** The single source of truth for the module inventory. Exposed to tests
    * so RegistrySpec derives its uniqueness check from this list instead of
    * maintaining a parallel hand-written copy that can rot (round-5 verdict:
    * the copy omitted IncrementalDedup and the suite went red unnoticed). */
  private[graft] val modules: Seq[QueryModule] = Seq(
    QueryModule(operators.Relational.queries, operators.Relational.oracleSql),
    QueryModule(operators.Windows.queries, operators.Windows.oracleSql),
    QueryModule(operators.SetOps.queries, operators.SetOps.oracleSql),
    QueryModule(operators.Scalars.queries, operators.Scalars.oracleSql),
    QueryModule(operators.TemporalJoins.queries, operators.TemporalJoins.oracleSql),
    QueryModule(weather.WeatherPipeline.queries, weather.WeatherPipeline.oracleSql),
    QueryModule(datapipe.Dedup.queries, datapipe.Dedup.oracleSql),
    QueryModule(datapipe.IncrementalDedup.queries, datapipe.IncrementalDedup.oracleSql),
    QueryModule(datapipe.Similarity.queries, datapipe.Similarity.oracleSql),
    QueryModule(datapipe.VectorIndex.queries, datapipe.VectorIndex.oracleSql),
    QueryModule(datapipe.TextAnalysis.queries, datapipe.TextAnalysis.oracleSql),
    QueryModule(datapipe.Multimodal.queries, datapipe.Multimodal.oracleSql),
    QueryModule(operators.AdvancedAggs.queries, operators.AdvancedAggs.oracleSql),
    QueryModule(operators.Nested.queries, operators.Nested.oracleSql),
    QueryModule(operators.Extras.queries, operators.Extras.oracleSql),
    QueryModule(operators.TypedOps.queries, operators.TypedOps.oracleSql),
    QueryModule(streaming.Streaming.queries, streaming.Streaming.oracleSql)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.queries("q01_pricing_summary")(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = modules.flatMap(_.oracle).toMap
}

final case class QueryModule(
  queries: Map[String, (SparkSession, String) => DataFrame],
  oracle: Map[String, String])
