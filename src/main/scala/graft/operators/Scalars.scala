package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface: date/time, string, math, conditional/null,
  * array, and JSON functions — all Spark built-ins (codegen'd; no UDFs,
  * per SURVEY §2.2's "Functions, not UDFs" rule).
  *
  * Cross-engine determinism: only functions with bit-identical semantics
  * in DuckDB are oracle-checked (sqrt is IEEE-exact; exp/ln are libm-
  * dependent and excluded from hash-checked outputs). Float folds over
  * arrays fix the accumulation order (left fold from 0.0) so Spark and
  * the oracle perform the identical IEEE operation sequence.
  */
object Scalars {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_scalar_datetime" -> { (s, d) =>
      import s.implicits._
      T.orders(s, d)
        .filter($"o_orderkey" % 20 === 0)
        .select(
          $"o_orderkey",
          year($"o_orderdate").as("yr"),
          month($"o_orderdate").as("mo"),
          dayofmonth($"o_orderdate").as("dy"),
          quarter($"o_orderdate").as("qtr"),
          dayofweek($"o_orderdate").as("dow"),
          date_trunc("month", $"o_orderdate").as("month_start"),
          datediff($"o_orderdate", lit("1995-01-01").cast("timestamp")).as("days_since"),
          ($"o_orderdate" + expr("INTERVAL 30 DAYS")).as("plus30"),
          unix_timestamp($"o_orderdate").as("epoch_s"))
        .orderBy($"o_orderkey")
    },

    "q24_scalar_string" -> { (s, d) =>
      import s.implicits._
      T.part(s, d)
        .select(
          $"p_partkey",
          length($"p_name").as("name_len"),
          upper($"p_brand").as("brand_up"),
          lower($"p_type").as("type_lo"),
          substring($"p_name", 1, 6).as("name_pfx"),
          concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
          lpad($"p_size".cast("string"), 4, "0").as("size_pad"),
          regexp_replace($"p_name", " ", "_").as("name_us"),
          regexp_extract($"p_name", "^(\\w+)", 1).as("first_word"),
          $"p_name".contains("widget").as("is_widget"),
          // joined to a scalar: the driver's row-sort can't order list cells
          array_join(split($"p_name", " "), ",").as("name_words"))
        .orderBy($"p_partkey")
    },

    "q25_scalar_math" -> { (s, d) =>
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_orderkey" % 50 === 0)
        .select(
          $"l_orderkey", $"l_linenumber",
          abs($"l_quantity" - 25.0).as("abs_dev"),
          floor($"l_extendedprice").as("price_floor"),
          ceil($"l_extendedprice").as("price_ceil"),
          sqrt($"l_quantity").as("qty_sqrt"),
          ($"l_quantity" * $"l_quantity").as("qty_sq"),
          ($"l_orderkey" % 7).as("key_mod7"),
          signum($"l_discount" - 0.05).as("disc_sign"),
          greatest($"l_quantity", lit(10.0)).as("qty_hi"),
          least($"l_quantity", lit(10.0)).as("qty_lo"))
        .orderBy($"l_orderkey", $"l_linenumber", $"qty_sq", $"price_floor")
    },

    "q26_scalar_conditional" -> { (s, d) =>
      import s.implicits._
      T.events(s, d)
        .select(
          $"event_id",
          when($"value" < 50, "low").when($"value" < 150, "mid")
            .otherwise("high").as("band"),
          coalesce(nullif($"event_type", lit("error")), lit("ERR")).as("type_or_err"),
          greatest($"value", lit(100.0)).as("val_hi"),
          least($"value", lit(100.0)).as("val_lo"),
          ($"value" > 100 && $"event_type" === "purchase").as("big_purchase"),
          isnull(nullif($"event_type", lit("click"))).as("is_click"))
        .orderBy($"event_id")
    },

    "q27_scalar_array" -> { (s, d) =>
      import s.implicits._
      T.embeddings(s, d)
        .select(
          $"vec_id",
          size($"embedding").as("dim"),
          element_at($"embedding", 1).cast("double").as("e0"),
          expr("""aggregate(transform(embedding, x -> CAST(x AS DOUBLE)),
                 |          CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)""".stripMargin)
            .as("l2sq"),
          element_at($"embedding", 2).cast("double").as("h2"),
          element_at($"embedding", 3).cast("double").as("h3"),
          element_at($"embedding", 4).cast("double").as("h4"),
          expr("array_max(transform(embedding, x -> CAST(x AS DOUBLE)))").as("vmax"),
          expr("array_min(transform(embedding, x -> CAST(x AS DOUBLE)))").as("vmin"))
        .orderBy($"vec_id")
    },

    "q28_scalar_json" -> { (s, d) =>
      import s.implicits._
      T.events(s, d)
        // single from_json parse, fields projected from the struct
        // (get_json_object would re-parse the document per extraction)
        .withColumn("j", from_json($"props",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))))
        .select(
          $"event_id",
          $"j.k".cast("string").as("k_str"),
          $"j.k".as("k_int"),
          ($"j.k" > 50).as("k_big"))
        .orderBy($"event_id")
    },

    // ANSI-SAFE ARITHMETIC — Spark 4 runs ANSI mode ON, which at
    // 100 TB means ONE malformed row kills a six-hour job (division by
    // zero, a bad cast, an overflow are ERRORS, not silent NULLs). The
    // production answer is the try_* family: the error becomes a NULL
    // the pipeline can quarantine and count instead of a dead job.
    // Planted failures exercise every lane non-vacuously: zero
    // denominators (every event_id ≡ 0 mod 5), unparseable strings
    // (every ≡ 0 mod 3 row carries the event TYPE, not a number), a
    // guaranteed long overflow (Long.MaxValue × den ≥ 2), and an
    // out-of-bounds array index (1-based idx cycles 1..4 over a
    // 2-element array — 3 and 4 miss; index 0 stays an ERROR even
    // under try_element_at, Spark's documented contract). The oracle states the
    // same semantics in DuckDB's terms (NULLIF denominators, TRY_CAST,
    // a HUGEINT-guarded overflow check, native out-of-bounds-NULL
    // indexing) — two engines forced to agree on every quarantined row.
    // Sampled at event_id ≡ 0 (mod 23) — q98's discipline (the demo
    // doesn't need the whole sorted table; at full output the sort
    // dominated the bill, round-16 advice). 23 is coprime to 5, 3, and
    // 4, so the sampled ids still cycle through EVERY residue class
    // each plant keys on — all four lanes keep firing both ways.
    "q99_try_functions" -> { (s, d) =>
      import s.implicits._
      T.events(s, d)
        .filter($"event_id" % 23 === 0)
        .withColumn("den", $"event_id" % 5)
        .withColumn("str",
          when($"event_id" % 3 === 0, $"event_type")
            .otherwise($"event_id".cast("string")))
        .select($"event_id",
          try_divide($"user_id", $"den").as("safe_div"),
          try_to_number($"str", lit("999999999")).cast("long")
            .as("parsed"),
          try_multiply(lit(Long.MaxValue), $"den").as("safe_mul"),
          try_element_at(array($"user_id", $"event_id"),
            ($"event_id" % 4 + 1).cast("int")).as("safe_elem"))
        .orderBy($"event_id")
    },

    // VARIANT — the typed semi-structured path (Spark 4's answer to
    // schema-on-read JSON at scale): q28's from_json needs the schema
    // UP FRONT and one struct per shape; an event stream with drifting
    // payloads gets ONE parse_json into the binary variant encoding,
    // then O(1) typed path extraction per field — no re-parse per
    // extraction (get_json_object's cost), no schema migration when a
    // producer adds a field. The document here is assembled from
    // columns + the raw props payload nested VERBATIM (ints/strings
    // only — embedding engine-formatted doubles in a string would pin
    // float printing, not variant semantics); extraction covers nested
    // object paths, array indexing, a missing path (NULL, not error),
    // and a widening int→double cast. The oracle reads the same
    // document through DuckDB's JSON operators — two different
    // semi-structured engines forced to the same typed values.
    "q98_variant" -> { (s, d) =>
      import s.implicits._
      T.events(s, d)
        .filter($"event_id" % 25 === 0)
        .withColumn("js", concat(
          lit("{\"meta\":{\"type\":\""), $"event_type",
          lit("\",\"uid\":"), $"user_id".cast("string"),
          lit("},\"ids\":["), $"user_id".cast("string"),
          lit(","), $"event_id".cast("string"),
          lit("],\"p\":"), $"props", lit("}")))
        .withColumn("v", parse_json($"js"))
        .select($"event_id",
          variant_get($"v", "$.meta.type", "string").as("v_type"),
          variant_get($"v", "$.meta.uid", "bigint").as("v_uid"),
          variant_get($"v", "$.ids[1]", "bigint").as("v_second_id"),
          variant_get($"v", "$.p.k", "bigint").as("v_pk"),
          variant_get($"v", "$.meta.missing", "bigint").as("v_missing"),
          variant_get($"v", "$.ids[0]", "double").as("v_uid_dbl"))
        .orderBy($"event_id")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q23_scalar_datetime" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
        |  CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS dy,
        |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qtr,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since,
        |  o_orderdate + INTERVAL 30 DAY AS plus30,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders WHERE o_orderkey % 20 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "q24_scalar_string" ->
      """SELECT p_partkey,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  upper(p_brand) AS brand_up,
        |  lower(p_type) AS type_lo,
        |  substring(p_name, 1, 6) AS name_pfx,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  regexp_replace(p_name, ' ', '_', 'g') AS name_us,
        |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  contains(p_name, 'widget') AS is_widget,
        |  array_to_string(string_split(p_name, ' '), ',') AS name_words
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q25_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25.0) AS abs_dev,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  l_quantity * l_quantity AS qty_sq,
        |  l_orderkey % 7 AS key_mod7,
        |  CAST(CASE WHEN l_discount - 0.05 > 0 THEN 1.0
        |       WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS DOUBLE) AS disc_sign,
        |  greatest(l_quantity, 10.0) AS qty_hi,
        |  least(l_quantity, 10.0) AS qty_lo
        |FROM lineitem WHERE l_orderkey % 50 = 0
        |ORDER BY l_orderkey, l_linenumber, qty_sq, price_floor""".stripMargin,

    "q26_scalar_conditional" ->
      """SELECT event_id,
        |  CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid'
        |       ELSE 'high' END AS band,
        |  COALESCE(NULLIF(event_type, 'error'), 'ERR') AS type_or_err,
        |  greatest(value, 100.0) AS val_hi,
        |  least(value, 100.0) AS val_lo,
        |  value > 100 AND event_type = 'purchase' AS big_purchase,
        |  NULLIF(event_type, 'click') IS NULL AS is_click
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q27_scalar_array" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS e0,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(embedding, x -> CAST(x AS DOUBLE))),
        |    (a, x) -> a + x * x) AS l2sq,
        |  CAST(embedding[2] AS DOUBLE) AS h2,
        |  CAST(embedding[3] AS DOUBLE) AS h3,
        |  CAST(embedding[4] AS DOUBLE) AS h4,
        |  list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vmax,
        |  list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vmin
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,

    "q28_scalar_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  CAST(json_extract_string(props, '$.k') AS INT) > 50 AS k_big
        |FROM events
        |ORDER BY event_id""".stripMargin,

    // q99: the same quarantine semantics in DuckDB's dialect. The
    // try_to_number('999999999') lane parses ONLY all-digit strings ≤ 9
    // digits — mirrored as a regex-guarded TRY_CAST; decimal division
    // both sides; overflow guarded through HUGEINT.
    "q99_try_functions" ->
      """SELECT event_id,
        |  user_id / NULLIF(event_id % 5, 0) AS safe_div,
        |  CASE WHEN regexp_matches(str, '^[0-9]{1,9}$')
        |       THEN TRY_CAST(str AS BIGINT) ELSE NULL END AS parsed,
        |  CASE WHEN abs(CAST(9223372036854775807 AS HUGEINT)
        |             * (event_id % 5)) > 9223372036854775807
        |       THEN NULL
        |       ELSE CAST(9223372036854775807 * CAST(event_id % 5 AS HUGEINT)
        |            AS BIGINT) END AS safe_mul,
        |  ([user_id, event_id])[CAST(event_id % 4 + 1 AS INT)] AS safe_elem
        |FROM (SELECT event_id, user_id,
        |        CASE WHEN event_id % 3 = 0 THEN event_type
        |             ELSE CAST(event_id AS VARCHAR) END AS str
        |      FROM events WHERE event_id % 23 = 0) z
        |ORDER BY event_id""".stripMargin,

    "q98_variant" ->
      """SELECT event_id,
        |  js->>'$.meta.type' AS v_type,
        |  CAST(js->'$.meta.uid' AS BIGINT) AS v_uid,
        |  CAST(js->'$.ids[1]' AS BIGINT) AS v_second_id,
        |  CAST(js->'$.p.k' AS BIGINT) AS v_pk,
        |  CAST(js->'$.meta.missing' AS BIGINT) AS v_missing,
        |  CAST(js->'$.ids[0]' AS DOUBLE) AS v_uid_dbl
        |FROM (
        |  SELECT event_id,
        |    '{"meta":{"type":"' || event_type || '","uid":' ||
        |    CAST(user_id AS VARCHAR) || '},"ids":[' ||
        |    CAST(user_id AS VARCHAR) || ',' || CAST(event_id AS VARCHAR) ||
        |    '],"p":' || props || '}' AS js
        |  FROM events WHERE event_id % 25 = 0) z
        |ORDER BY event_id""".stripMargin
  )
}
