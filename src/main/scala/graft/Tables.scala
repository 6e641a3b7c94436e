package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loaders + cross-engine determinism helpers.
  *
  * Every query in this library is verified against a DuckDB oracle by
  * hash-comparing result values (driver contract, see SURVEY.md §5).
  * Floating-point SUM/AVG are order-dependent, and Spark's shuffle makes
  * the order nondeterministic — so all summed measures go through exact
  * DECIMAL arithmetic (input columns carry <=4 decimal digits, so the
  * double->decimal cast is unambiguous) and only the final result is cast
  * back to DOUBLE. This makes results bit-identical across engines AND
  * across cluster sizes: the same convention that makes the oracle match
  * on local[32] makes re-runs reproducible on a 1000-executor cluster.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects. Read nanos as long (legacy conf) and floor-divide to
    * micros — the same truncation DuckDB applies casting ns->us, so
    * time comparisons agree across engines.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

object Dets {
  /** Exact decimal view of a measure column (inputs have <=4 frac digits). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent exact sum of a double measure, surfaced as DOUBLE. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Sum of an already-decimal expression, surfaced as DOUBLE. */
  def dsumDec(c: Column): Column = sum(c).cast("double")

  /** Deterministic average: exact decimal sum / group count, in DOUBLE. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  /** Portable 60-bit positive hash: identical SQL exists in DuckDB
    * (`CAST('0x' || substring(md5(s),1,15) AS BIGINT)`), so hash-driven
    * operators (minhash, simhash, LSH buckets) stay oracle-checkable.
    * Collision space 2^60 is ample for bucketing/sketching at 100 TB
    * (not for exact identity — pair it with a verify step).
    */
  def phash(c: Column): Column =
    graft.functions.PortableHashExpr.graft_phash(c)

  /** SQL fragment computing phash(expr) in DuckDB. */
  def phashSql(expr: String): String =
    s"CAST('0x' || substring(md5($expr), 1, 15) AS BIGINT)"
}
