package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Nested-type surface: struct construction/field access and table-
  * generating functions (explode/posexplode) — the lateral-view family.
  *
  * Scale note: posexplode is a narrow (no-shuffle) row multiplier; the
  * down-stream aggregate pairs it with partial aggregation so fan-out
  * never crosses the wire unaggregated.
  */
object Nested {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Struct build + nested field access round-trip.
    "q44_struct_nested" -> { (s, d) =>
      import s.implicits._
      T.documents(s, d)
        .withColumn("meta", struct($"lang", $"n_chars"))
        .select($"doc_id", $"meta",
                $"meta.lang".as("meta_lang"),
                ($"meta.n_chars" * 2).as("twice_chars"))
        .orderBy($"doc_id")
    },

    // posexplode (LATERAL VIEW): word stream with positions, re-aggregated.
    "q45_posexplode" -> { (s, d) =>
      import s.implicits._
      T.documents(s, d)
        .filter($"doc_id" % 25 === 0)
        .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "word")))
        .filter($"pos" < 10)
        .orderBy($"doc_id", $"pos")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q44_struct_nested" ->
      """SELECT doc_id,
        |  struct_pack(lang := lang, n_chars := n_chars) AS meta,
        |  lang AS meta_lang,
        |  n_chars * 2 AS twice_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q45_posexplode" ->
      """SELECT doc_id, CAST(u.pos AS INT) AS pos, u.word AS word FROM (
        |  SELECT doc_id, unnest(list_transform(range(0, least(len(words), 10)),
        |    i -> struct_pack(pos := i, word := words[i+1]))) AS u
        |  FROM (SELECT doc_id, string_split(text, ' ') AS words
        |        FROM documents WHERE doc_id % 25 = 0))
        |ORDER BY doc_id, pos""".stripMargin
  )
}
