package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format breadth: CSV and JSON round-trips with explicit
  * schemas (never inferSchema — SURVEY §1.2's fixed-schema rule).
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)
    .select($"doc_id", $"lang", $"n_chars")
  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("n_chars", LongType)))

  test("CSV round-trip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.orderBy($"doc_id").collect().toSeq ===
           docs.orderBy($"doc_id").collect().toSeq)
  }

  test("JSON-lines round-trip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.orderBy($"doc_id").collect().toSeq ===
           docs.orderBy($"doc_id").collect().toSeq)
  }
}
